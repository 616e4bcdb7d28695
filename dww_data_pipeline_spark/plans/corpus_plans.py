"""Corpus-statistics + embedding-column operators (north-star
LLM-pipeline surface, round 2): vocabulary building, n-gram frequency,
per-dimension embedding statistics, int8 embedding quantization.

These are the bread-and-butter jobs of a training-data pipeline at
100 TB:

* vocabulary / n-gram counts — one explode + hash aggregate; the
  shuffle carries (token, partial count), never documents, and
  partial (map-side) aggregation collapses each partition's counts
  before the exchange. Top-k ordering is deterministic (count desc,
  token asc).
* per-dimension embedding stats — posexplode to (dim, value) with a
  64-way aggregate; the shuffle is |dims| × |partitions| partial rows
  regardless of corpus size. Sums are fixed-point integers so
  partition order can't change the result.
* int8 quantization — pure per-row column math (no shuffle at all):
  min-max scale each vector to [-128, 127], the standard storage
  compression before ANN serving. All arithmetic is forced to DOUBLE
  in an explicit order so the oracle computes bit-identical values.

Reference analogue: the reference has no corpus/vector surface (its
analytics stop at jump/density aggregates, dwwApi.js); these extend
the engine per the north-star mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dww_data_pipeline_spark.plans.registry import REGISTRY, register
from dww_data_pipeline_spark.sources.catalog import load_table

from dww_data_pipeline_spark.plans.text_exprs import (
    SQL_TOKS as _SQL_TOKS,
    exploded_kgrams,
    spark_tokens as _spark_tokens,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "v1_vocabulary_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents
    )
    SELECT tok, COUNT(*) AS n_occ, COUNT(DISTINCT doc_id) AS doc_freq
    FROM toks GROUP BY tok
    ORDER BY n_occ DESC, tok
    LIMIT 100
    """,
    description="Vocabulary build: token -> occurrence count + document "
    "frequency, top-100 (count desc, token asc — deterministic). One "
    "explode + partial-agg; the shuffle carries (token, count) pairs, "
    "never text (north-star corpus statistics)",
)
def v1_vocabulary_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(_spark_tokens(F.col("text"))).alias("tok"))
    return (
        toks.groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.count_distinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.col("n_occ").desc(), "tok")
        .limit(100)
    )


@register(
    "v2_bigram_topk",
    oracle=f"""
    WITH grams AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len({_SQL_TOKS}) - 1),
                    i -> {_SQL_TOKS}[i] || ' ' || {_SQL_TOKS}[i+1])) AS gram
      FROM documents
    )
    SELECT gram, COUNT(*) AS n_occ
    FROM grams GROUP BY gram
    ORDER BY n_occ DESC, gram
    LIMIT 50
    """,
    description="Bigram frequency top-50: 2-word shingles via zipped "
    "shifted slices (token array materialized once behind a generator "
    "barrier — no per-element re-tokenization), then the same "
    "(gram, count) shuffle discipline as v1",
)
def v2_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        exploded_kgrams(d, "text", 2)
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .orderBy(F.col("n_occ").desc(), "gram")
        .limit(50)
    )


@register(
    "e1_embedding_dim_stats",
    oracle="""
    WITH flat AS (
      SELECT unnest(range(len(embedding))) AS dim,
             unnest(embedding) AS val
      FROM embeddings
    )
    SELECT dim,
           COUNT(*) AS n,
           CAST(MIN(val) AS DOUBLE) AS min_val,
           CAST(MAX(val) AS DOUBLE) AS max_val,
           CAST(SUM(CAST(floor(CAST(val AS DOUBLE) * 100000000) AS BIGINT))
                AS DOUBLE) / 100000000 AS sum_val
    FROM flat GROUP BY dim
    """,
    description="Per-dimension embedding statistics (count/min/max/sum): "
    "posexplode to (dim, value), 64-group aggregate — the shuffle is "
    "|dims| x |partitions| partial rows regardless of corpus size; sums "
    "are fixed-point (floor(val*1e8) summed as BIGINT) so 1000 executors "
    "summing in any order agree (north-star embedding-column ops)",
)
def e1_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    flat = e.select(F.posexplode("embedding").alias("dim", "val"))
    return flat.groupBy(F.col("dim").cast("long").alias("dim")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("val").cast("double").alias("min_val"),
        F.max("val").cast("double").alias("max_val"),
        # fixed-point sum: floor(value * 1e8) as BIGINT, summed exactly,
        # then one double division. Decimal casts are NOT portable here:
        # DuckDB rounds the double's true binary expansion while the
        # JVM rounds its shortest decimal representation, and the two
        # disagree on values a hair below a short decimal. Double
        # multiply + floor is bit-identical on every engine and the
        # integer sum is partition-order independent.
        (
            F.sum(
                F.floor(F.col("val").cast("double") * 100000000).cast("long")
            ).cast("double")
            / 100000000
        ).alias("sum_val"),
    )


@register(
    "e2_embedding_quantize_int8",
    oracle="""
    WITH base AS (
      SELECT vec_id, embedding,
             list_min(embedding) AS mn, list_max(embedding) AS mx
      FROM embeddings
    )
    SELECT vec_id,
           unnest(range(len(embedding))) AS dim,
           CASE WHEN mx = mn THEN 0
                ELSE CAST(floor((CAST(unnest(embedding) AS DOUBLE)
                                 - CAST(mn AS DOUBLE)) * 255
                                / (CAST(mx AS DOUBLE) - CAST(mn AS DOUBLE)))
                          AS BIGINT) - 128
           END AS q
    FROM base
    """,
    description="int8 min-max quantization of embedding vectors "
    "(standard pre-ANN storage compression): pure per-row column math, "
    "zero shuffle; arithmetic forced to DOUBLE in one explicit order so "
    "any engine computes identical codes; q = floor((v-mn)*255/(mx-mn)) "
    "- 128 with the constant-vector guard",
)
def e2_embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    mn = F.array_min("embedding")
    mx = F.array_max("embedding")
    base = e.select(
        "vec_id",
        "embedding",
        mn.cast("double").alias("mn"),
        mx.cast("double").alias("mx"),
    )
    flat = base.select(
        "vec_id", "mn", "mx", F.posexplode("embedding").alias("dim", "val")
    )
    q = (
        F.when(F.col("mx") == F.col("mn"), F.lit(0).cast("long"))
        .otherwise(
            F.floor(
                (F.col("val").cast("double") - F.col("mn"))
                * 255
                / (F.col("mx") - F.col("mn"))
            ).cast("long")
            - 128
        )
    )
    return flat.select(
        "vec_id", F.col("dim").cast("long").alias("dim"), q.alias("q")
    )


@register(
    "v3_tfidf_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents WHERE doc_id < 50
    ), tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok
    ), df AS (
      SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok
    ), n AS (
      SELECT COUNT(DISTINCT doc_id) AS n FROM toks
    ), scored AS (
      SELECT tf.doc_id, tf.tok,
             CAST(tf.tf * n.n AS DOUBLE) / df.df AS score
      FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
    )
    SELECT doc_id, tok, score FROM (
      SELECT doc_id, tok, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, tok) AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
    description="tf-idf top terms per document with a LINEAR idf "
    "(tf * N / df — integer-derived, so cross-engine exact; log-idf "
    "differs per libm): tf and df from one token explode, df joined "
    "back (broadcast at scale: vocabulary << corpus), per-doc top-3 "
    "via window with deterministic tiebreak",
)
def v3_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    toks = d.select("doc_id", F.explode(_spark_tokens(F.col("text"))).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("tok").agg(F.count_distinct("doc_id").alias("df"))
    n = toks.agg(F.count_distinct("doc_id").alias("n"))
    scored = (
        tf.join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            ((F.col("tf") * F.col("n")).cast("double") / F.col("df")).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "tok")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "tok", "score")
    )


@register(
    "e3_embedding_normalize",
    oracle="""
    WITH base AS (
      SELECT vec_id,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
             embedding
      FROM embeddings
    )
    SELECT vec_id,
           unnest(range(len(embedding))) AS dim,
           CASE WHEN nrm > 0
                THEN round(CAST(unnest(embedding) AS DOUBLE) / nrm, 6)
                ELSE 0.0 END AS nval
    FROM base
    """,
    description="L2 vector normalization (unit-length embeddings — the "
    "prerequisite for cosine == dot at serving time): zero-shuffle "
    "column math, sequential-order norm sum so engines agree, "
    "zero-norm guard",
)
def e3_embedding_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    # widen each float to double BEFORE squaring (the library norm()
    # multiplies float32-first, which differs from the oracle's
    # double-first product by an ulp — enough to flip a round-at-6dp
    # tie); same sequential sum order as list_sum
    nrm = F.sqrt(
        F.aggregate(
            F.transform(
                F.col("embedding"), lambda x: x.cast("double") * x.cast("double")
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    base = e.select("vec_id", "embedding", nrm.alias("nrm"))
    flat = base.select("vec_id", "nrm", F.posexplode("embedding").alias("dim", "val"))
    nval = F.when(
        F.col("nrm") > 0, F.round(F.col("val").cast("double") / F.col("nrm"), 6)
    ).otherwise(F.lit(0.0))
    return flat.select(
        "vec_id", F.col("dim").cast("long").alias("dim"), nval.alias("nval")
    )


@register(
    "t11_token_rarity_score",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents
    ), model AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY tok
    ), scored AS (
      SELECT t.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tok,
             CAST(SUM(m.n) AS BIGINT) AS freq_sum,
             CAST(MIN(m.n) AS BIGINT) AS rarest_freq
      FROM toks t JOIN model m ON t.tok = m.tok
      GROUP BY t.doc_id
    )
    SELECT doc_id, n_tok,
           CAST(freq_sum AS DOUBLE) / CAST(n_tok AS DOUBLE)
             AS mean_token_freq,
           rarest_freq
    FROM scored
    """,
    description="Corpus-model quality scoring (the CCNet two-pass shape): "
    "pass 1 builds the unigram frequency model from the corpus itself "
    "(token -> count, partial-agg shuffle of counts only); pass 2 "
    "broadcasts the model back onto documents and scores each doc by "
    "mean and min token corpus-frequency — low mean = off-distribution "
    "text, the rarity signal quality filters threshold on. All "
    "arithmetic integer/DECIMAL so partition order cannot change a "
    "value (north-star text-quality scoring)",
)
def t11_token_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(_spark_tokens(F.col("text"))).alias("tok"))
    model = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    # the unigram model is vocabulary-sized (bounded, zipf-truncated in
    # practice) — broadcast it; the big side never shuffles
    scored = (
        toks.join(F.broadcast(model), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum("n").alias("freq_sum"),
            F.min("n").alias("rarest_freq"),
        )
    )
    return scored.select(
        "doc_id",
        "n_tok",
        (F.col("freq_sum").cast("double") / F.col("n_tok").cast("double")).alias(
            "mean_token_freq"
        ),
        "rarest_freq",
    )


@register(
    "e5_embedding_gram",
    oracle="""
    SELECT i.i AS i, j.j AS j,
           CAST(SUM(CAST(floor(CAST(embedding[i.i + 1] AS DOUBLE)
                               * CAST(embedding[j.j + 1] AS DOUBLE)
                               * 1e8) AS BIGINT)) AS BIGINT) AS s_fp
    FROM embeddings
    CROSS JOIN generate_series(0, 63) AS i(i)
    CROSS JOIN generate_series(0, 63) AS j(j)
    GROUP BY 1, 2
    """,
    description="EMBEDDING GRAM MATRIX (PCA / whitening prep): the "
    "64x64 second-moment matrix sum(x_i * x_j) over all vectors, "
    "accumulated in fixed-point (floor(prod * 1e8) as BIGINT — exact "
    "and partition-order-proof, see the float-sum parity rule). "
    "Arrow-vectorized partial aggregation (operators/similarity."
    "gram_fixed_point): each PARTITION folds its vectors into one "
    "4096-cell int64 accumulator via numpy outer products, so the "
    "exchange carries 4096 rows per partition regardless of corpus "
    "size and the final reduce is trivial — the driver-side "
    "eigendecomposition then runs on a 64x64 matrix.",
)
def e5_embedding_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dww_data_pipeline_spark.operators.similarity import gram_fixed_point

    e = _t(spark, sf_dir, "embeddings")
    return gram_fixed_point(e, "embedding", dim=64).select(
        F.floor(F.col("pos") / 64).cast("long").alias("i"),
        F.pmod(F.col("pos"), F.lit(64)).cast("long").alias("j"),
        "s_fp",
    )


@register(
    "e6_pca_project",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_vecs,
           0 AS orth_max_err_u,
           0 AS desc_violations,
           CAST(0 AS BIGINT) AS bessel_violations,
           1 AS capture_ok,
           0 AS eig_residual_u
    FROM embeddings
    """,
    description="PCA QUALITY CONTRACT, oracle-checked (the dq7/dq11 "
    "contract pattern — eigh itself is not SQL-expressible, so the "
    "oracle asserts the mathematical contract the projection must "
    "EARN): top-8 eigh PCA over the exact 64x64 fixed-point Gram, "
    "graded on orthonormality residual (micro-units, must be 0), "
    "eigenvalue-descent violations (0), per-vector Bessel violations "
    "sum_p pc_p^2 <= |x|^2 counted DISTRIBUTED over the literal-"
    "folded projection (0), top-8 variance capture >= 8/64 of the "
    "trace (1), and the eigenpair residual max_p |G c_p - l_p c_p| / "
    "l_p in micro-units (0 — spectrum-independent, unlike a power-"
    "iteration agreement gate, which the sf0.01 eigengap defeats). "
    "Two-phase scale shape unchanged: one dim^2 partial-agg exchange, "
    "driver eigh on the bounded artifact, plan-time literal "
    "projection, one scan for the Bessel count. The per-vector "
    "projection surface stays available as operators.pca_project "
    "(pytest-verified); e9 remains the hash-checked dominant-"
    "component twin.",
)
def e6_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dww_data_pipeline_spark.operators.similarity import (
        pca_project,
        pca_quality,
    )

    e = _t(spark, sf_dir, "embeddings")
    q = pca_quality(e, "embedding", k=8, dim=64)
    out = pca_project(e, q["components"], "embedding")
    dv = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm2 = F.aggregate(dv, F.lit(0.0), lambda a, x: a + x * x)
    sumsq = None
    for p in range(8):
        t = F.col(f"pc{p}") * F.col(f"pc{p}")
        sumsq = t if sumsq is None else sumsq + t
    bessel_bad = sumsq > norm2 * (1.0 + 1e-9) + 1e-9
    return out.agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.lit(int(q["orth_max_err_u"])).alias("orth_max_err_u"),
        F.lit(int(q["desc_violations"])).alias("desc_violations"),
        F.sum(F.when(bessel_bad, 1).otherwise(0))
        .cast("long")
        .alias("bessel_violations"),
        F.lit(int(q["capture_ok"])).alias("capture_ok"),
        F.lit(int(q["eig_residual_u"])).alias("eig_residual_u"),
    )


# ---------------------------------------------------------------------------
# dq22_embedding_psi — POPULATION STABILITY INDEX over embedding
# space: the production drift gate between an embedding-dependent
# artifact (ANN index, semantic-dedup clusters, quality classifier)
# and the corpus it was built on.  dq4 monitors a scalar column's
# distribution and s19/st20 monitor the coarse-quantizer's CELL
# assignment; PSI monitors the embedding DISTRIBUTION itself,
# per dimension: quantize each value into 16 fixed [-2,2) bins
# (deterministic floor arithmetic — e2's discipline), histogram the
# BASE corpus (vec_id%4!=3) vs the ARRIVED quarter, Laplace-smooth
# (add-1), and psi_d = Σ_b (p_b - q_b)·ln(p_b/q_b) with the industry
# alarm threshold 0.25 on the 6dp-rounded value.
#
# Float determinism: the 16 per-bin terms sum in BIN ORDER on both
# engines (Spark: sort_array over the collected (bin, term) structs
# then a left fold; DuckDB: list_sum over list(term ORDER BY bin)) —
# IEEE addition is deterministic given identical operands and order,
# so the only cross-engine surface is libm ln() itself (the t34/t22
# entropy precedent, held across every differential run).
#
# Scale shape: ONE posexplode pass → (side, dim, bin) partial-agg
# histogram (the shuffle carries <= 2·64·16 partial rows per
# partition, never vectors); the 1024-cell grid and all PSI math are
# dimension-bounded.  No collects.
# ---------------------------------------------------------------------------

_PSI_BINS = 16
_PSI_ALARM = 0.25


def _psi_bin(col):
    return (
        F.least(
            F.greatest(
                F.floor((col.cast("double") + 2.0) * 4.0), F.lit(0)
            ),
            F.lit(_PSI_BINS - 1),
        )
    ).cast("long")


_PSI_BIN_SQL = (
    "CAST(least(greatest(floor((CAST({v} AS DOUBLE) + 2) * 4), 0), "
    f"{_PSI_BINS - 1}) AS BIGINT)"
)


def embedding_bin_counts(e: DataFrame, side_col) -> DataFrame:
    """(side, dim, bin, c) histogram of the quantized embedding table
    — the shared core of dq22, st22, and the streaming monitor
    (streaming/drift_ingest.py stream_embedding_bins).  ``side_col``
    labels each vector's population (0 = base, 1+ = arrival group)."""
    flat = e.select(
        side_col.alias("side"),
        F.posexplode("embedding").alias("dim", "val"),
    )
    return (
        flat.select(
            "side", "dim", _psi_bin(F.col("val")).alias("bin")
        )
        .groupBy("side", "dim", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def psi_from_counts(
    counts: DataFrame, n_dims: int = 64, alarm: float = _PSI_ALARM
) -> DataFrame:
    """Per-(side, dim) PSI of every arrival side (side >= 1) vs the
    base histogram (side = 0), Laplace-smoothed, summed in bin order.
    Emits (side, dim, psi, alarm)."""
    spark = counts.sparkSession
    sides = counts.filter(F.col("side") >= 1).select("side").distinct()
    dims = spark.range(n_dims).select(F.col("id").cast("int").alias("dim"))
    bins = spark.range(_PSI_BINS).select(F.col("id").cast("int").alias("bin"))
    grid = sides.crossJoin(F.broadcast(dims)).crossJoin(F.broadcast(bins))
    cb = counts.filter(F.col("side") == 0).select(
        "dim", "bin", F.col("c").alias("cb")
    )
    ca = counts.filter(F.col("side") >= 1).select(
        "side", "dim", "bin", F.col("c").alias("ca")
    )
    z = F.lit(0).cast("long")
    pq = (
        grid.join(cb, ["dim", "bin"], "left")
        .join(ca, ["side", "dim", "bin"], "left")
        .select(
            "side",
            "dim",
            "bin",
            F.coalesce("cb", z).alias("cb"),
            F.coalesce("ca", z).alias("ca"),
        )
    )
    td = pq.groupBy("side", "dim").agg(
        F.sum("cb").alias("nb"), F.sum("ca").alias("na")
    )
    p = (F.col("cb") + 1.0) / (F.col("nb") + F.lit(float(_PSI_BINS)))
    q = (F.col("ca") + 1.0) / (F.col("na") + F.lit(float(_PSI_BINS)))
    term = (p - q) * F.log(p / q)
    terms = (
        pq.join(td, ["side", "dim"])
        .select("side", "dim", "bin", term.alias("term"))
        .groupBy("side", "dim")
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("bin", "term"))
                    ),
                    lambda s: s["term"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("s")
        )
    )
    return terms.select(
        "side",
        F.col("dim").cast("long").alias("dim"),
        F.round("s", 6).alias("psi"),
        (F.round("s", 6) > F.lit(alarm)).alias("alarm"),
    )


def _psi_oracle(side_sql: str, side_out: str) -> str:
    """Shared dq22/st22 oracle body: ``side_sql`` labels each vector
    (0 = base, >=1 = arrival group); emits ({side_out}, dim, psi,
    alarm) for every side >= 1."""
    v = _PSI_BIN_SQL.format(v="val")
    b = _PSI_BINS
    return f"""WITH flat AS (
  SELECT {side_sql} AS side,
         unnest(generate_series(0, 63)) AS dim,
         unnest(embedding) AS val
  FROM embeddings
), cnt AS (
  SELECT side, dim, {v} AS bin, CAST(COUNT(*) AS BIGINT) AS c
  FROM flat GROUP BY 1, 2, 3
), sides AS (SELECT DISTINCT side FROM cnt WHERE side >= 1),
grid AS (
  SELECT s.side, d.d AS dim, bn.b AS bin
  FROM sides s, unnest(generate_series(0, 63)) d(d),
       unnest(generate_series(0, {b - 1})) bn(b)
), pq AS (
  SELECT g.side, g.dim, g.bin,
         COALESCE(cb.c, 0) AS cb, COALESCE(ca.c, 0) AS ca
  FROM grid g
  LEFT JOIN cnt cb ON cb.side = 0 AND cb.dim = g.dim AND cb.bin = g.bin
  LEFT JOIN cnt ca ON ca.side = g.side AND ca.dim = g.dim
                  AND ca.bin = g.bin
), td AS (
  SELECT side, dim, CAST(SUM(cb) AS BIGINT) AS nb,
         CAST(SUM(ca) AS BIGINT) AS na
  FROM pq GROUP BY side, dim
), terms AS (
  SELECT p.side, p.dim, p.bin,
         ((p.cb + 1.0) / (t.nb + {b}.0) - (p.ca + 1.0) / (t.na + {b}.0))
         * ln(((p.cb + 1.0) / (t.nb + {b}.0))
              / ((p.ca + 1.0) / (t.na + {b}.0))) AS term
  FROM pq p JOIN td t ON t.side = p.side AND t.dim = p.dim
), psi AS (
  SELECT side, dim,
         list_sum(list(term ORDER BY bin)) AS s
  FROM terms GROUP BY side, dim
)
SELECT CAST(side AS BIGINT) AS {side_out},
       CAST(dim AS BIGINT) AS dim,
       round(s, 6) AS psi,
       round(s, 6) > {_PSI_ALARM} AS alarm
FROM psi"""


@register(
    "dq22_embedding_psi",
    oracle="SELECT dim, psi, alarm FROM ("
    + _psi_oracle("CASE WHEN vec_id % 4 = 3 THEN 1 ELSE 0 END", "side")
    + ")",
    description="EMBEDDING-SPACE DRIFT GATE (registered r12 as "
    "dq17_embedding_psi; renamed r13 per advice — dq17 belongs to "
    "dq17_pk_uniqueness): per-dimension Population "
    "Stability Index between the base corpus (vec_id%4!=3 — the "
    "population every embedding-dependent artifact trained on) and "
    "the arrived quarter — 16 fixed [-2,2) bins (e2's deterministic "
    "floor arithmetic), add-1 Laplace smoothing, psi = "
    "Σ(p-q)·ln(p/q) summed in BIN ORDER on both engines (ordered "
    "fold / list_sum(list ORDER BY)), industry alarm at 0.25 on the "
    "6dp value. Complements dq4 (scalar columns) and s19/st20 (cell "
    "assignment) with the distribution itself. One posexplode pass "
    "-> (side, dim, bin) partial-agg histogram; all PSI math is "
    "dimension-bounded; no collects (north-star data-quality "
    "monitoring)",
)
def dq22_embedding_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    counts = embedding_bin_counts(
        e,
        F.when(F.col("vec_id") % 4 == 3, 1).otherwise(0).cast("int"),
    )
    return psi_from_counts(counts).select("dim", "psi", "alarm")


# The query shipped in round 12 under the name below (proven in
# CORRECTNESS_r12 / timed in BENCH_LOCAL_r12); the rename to dq22 freed
# the dq17 index for dq17_pk_uniqueness.  The old name stays registered
# as an alias — same builder, same oracle — so the r12-declared surface
# never loses a name (driver contract: declared queries may be added,
# never removed).
register(
    "dq17_embedding_psi",
    oracle=REGISTRY["dq22_embedding_psi"].oracle,
    description="Alias of dq22_embedding_psi (the name this query was "
    "registered and proven under in round 12); see dq22 for the full "
    "description.",
)(dq22_embedding_psi)


@register(
    "st22_stream_embedding_psi",
    oracle=_psi_oracle(
        "CASE WHEN vec_id % 4 = 3 "
        "THEN CAST((vec_id % 16) // 4 AS INT) + 1 ELSE 0 END",
        "batch",
    ),
    description="EMBEDDING-PSI MONITORING AT INGEST (dq22's streaming "
    "twin, the st19/st20 pattern applied to distribution drift): "
    "each arriving micro-batch (s19's quarter in 4 steps) gets "
    "per-dimension PSI vs the frozen base histogram, batch-LOCALLY — "
    "per-vector (dim, bin) rows depend only on the fixed bin edges "
    "and the vector itself (st13 contract: union-of-batches == "
    "one-shot for any chopping, parity-tested against "
    "streaming/drift_ingest.py's stream_embedding_bins foreachBatch "
    "path), and per-batch histograms are additive over those rows. "
    "Emits (batch, dim, psi, alarm) — 4x64 rows, same ordered-fold "
    "float discipline as dq22",
)
def st22_stream_embedding_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    counts = embedding_bin_counts(
        e,
        F.expr(
            "CASE WHEN vec_id % 4 = 3 "
            "THEN CAST((vec_id % 16) DIV 4 AS INT) + 1 ELSE 0 END"
        ),
    )
    return psi_from_counts(counts).withColumnRenamed("side", "batch").select(
        "batch", "dim", "psi", "alarm"
    )
