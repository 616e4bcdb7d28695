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

from dww_data_pipeline_spark.plans.registry import register
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
