"""Corpus-curation and warehouse-maintenance query surface (round 4).

North-star LLM-pipeline operators beyond the dedup/text families:

* d14 — CHUNK-level exact dedup (the boilerplate-removal pass training
  pipelines run *inside* documents, not just across them — the
  span-dedup idea of Lee et al., "Deduplicating Training Data Makes
  Language Models Better", arXiv:2107.06499, re-expressed as pure
  relational algebra);
* t18 — BM25 retrieval (Robertson/Spärck Jones probabilistic ranking;
  the retrieval scorer used to mine topical subsets out of a corpus);
* j11 — KEYLESS range join via time-binning (the equi-join rewrite
  that keeps a predicate-only join off BroadcastNestedLoopJoin);
* ext_scd2 — slowly-changing-dimension (type 2) history from a change
  log (validity intervals via lead(), the CDC compaction shape);
* dq6 — numeric column profile (min/max/mean/median/p95 per column,
  fixed-point means so the hash compare is partition-order-proof);
* dq7 — approximate-distinct accuracy gate (each engine checks its own
  HLL sketch against the exact count — the CONTRACT is compared, not
  sketch bits, which are engine-specific by construction).

The reference has none of these (its analytics tier is the w/a
families); they are graded as first-class north-star components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dww_data_pipeline_spark.plans.registry import register
from dww_data_pipeline_spark.plans.text_exprs import SQL_TOKS as _SQL_TOKS_CURATION
from dww_data_pipeline_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# d14 — chunk-level exact dedup.
#
# Documents are word-soup without repeated spans at any sf, so the
# corpus is widened deterministically: every doc_id % 3 == 0 document
# is prefixed with a fixed 16-word boilerplate (the license-header /
# nav-bar pattern web corpora actually contain). The operator then
# splits every document into 16-word chunks, fingerprints each chunk,
# keeps the globally FIRST occurrence of every fingerprint
# (min (doc_id, chunk_idx)), and reassembles the surviving text.
#
# Scale shape: the only shuffle carries (fingerprint, doc_id,
# chunk_idx, chunk); the window over fingerprint is a single
# hash-partitioned sort. No self-join — first-occurrence-wins is a
# rank, not a pairwise compare, so it stays O(n log n) at 100 TB.
# ---------------------------------------------------------------------------

_BOILER = (
    "the quick data spark pipeline dedup chunk boiler plate token "
    "window batch shuffle join scan filter"
)
_CHUNK_W = 16

_D14_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN '{_BOILER}' || ' ' || text
              ELSE text END AS text
  FROM documents
), d AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM corpus
), chunks AS (
  SELECT doc_id, chunk_idx,
         array_to_string(
           toks[(chunk_idx * {_CHUNK_W} + 1):((chunk_idx + 1) * {_CHUNK_W})],
           ' ') AS chunk
  FROM (
    SELECT doc_id, toks,
           unnest(range(0, CAST(ceil(CAST(len(toks) AS DOUBLE)
                                     / {_CHUNK_W}) AS BIGINT))) AS chunk_idx
    FROM d
  )
), ranked AS (
  SELECT doc_id, chunk_idx, chunk,
         row_number() OVER (PARTITION BY md5(chunk)
                            ORDER BY doc_id, chunk_idx) AS rn
  FROM chunks
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       COALESCE(string_agg(CASE WHEN rn = 1 THEN chunk END, ' '
                           ORDER BY chunk_idx), '') AS kept_text
FROM ranked
GROUP BY doc_id
"""


@register(
    "d14_chunk_dedup",
    oracle=_D14_ORACLE,
    description="CHUNK-LEVEL exact dedup (span dedup à la Lee et al. "
    "2107.06499): split every document into 16-word chunks, fingerprint, "
    "keep only the globally FIRST occurrence of each chunk, reassemble "
    "the surviving text per document — removes repeated boilerplate "
    "INSIDE documents that doc-level dedup (d1/d2) cannot see. "
    "First-wins is a rank over the fingerprint (one shuffle + one "
    "windowed sort), never a pairwise join",
)
def d14_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    corpus_text = F.when(
        F.col("doc_id") % 3 == 0, F.concat(F.lit(_BOILER), F.lit(" "), F.col("text"))
    ).otherwise(F.col("text"))
    toks = F.split(corpus_text, " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(float(_CHUNK_W))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(toks, i * _CHUNK_W + 1, _CHUNK_W), " "),
    )
    exploded = d.select("doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk"))
    w = Window.partitionBy(F.md5("chunk")).orderBy("doc_id", "chunk_idx")
    ranked = exploded.withColumn("rn", F.row_number().over(w))
    kept = F.when(F.col("rn") == 1, F.struct("chunk_idx", "chunk"))
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum((F.col("rn") > 1).cast("long")).alias("n_removed"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(kept)), lambda r: r["chunk"]
            ),
            " ",
        ).alias("kept_text"),
    )


# ---------------------------------------------------------------------------
# t18 — BM25 retrieval.
#
# Okapi BM25 (k1=1.2, b=0.75) over the documents table for a fixed
# in-vocabulary query-term set; top-5 docs per term. Both sides
# evaluate the identical expression tree on integer-valued doubles
# (tf, df, dl are counts; their sums are exact in binary64), so the
# rounded score hash-matches.
#
# Scale shape: token postings are filtered to the query terms BEFORE
# the tf aggregation (the predicate reaches the explode), so the
# shuffle carries only matching postings; corpus stats (N, avgdl) and
# per-term df are broadcast as one-row/tiny frames.
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "window", "hash")
_K1, _B = 1.2, 0.75

_T18_ORACLE = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(len(toks) AS DOUBLE)) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS avgdl
  FROM d
), tok AS (
  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl, unnest(toks) AS term FROM d
), tf AS (
  SELECT doc_id, term, dl, CAST(COUNT(*) AS DOUBLE) AS tf
  FROM tok
  WHERE term IN ('spark', 'window', 'hash')
  GROUP BY doc_id, term, dl
), df AS (
  SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term
), scored AS (
  SELECT tf.term, tf.doc_id,
         round(
           ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * ({_K1} + 1.0))
           / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * tf.dl / stats.avgdl)),
           6) AS score
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN stats
)
SELECT term, doc_id, score, rank FROM (
  SELECT term, doc_id, score,
         row_number() OVER (PARTITION BY term
                            ORDER BY score DESC, doc_id) AS rank
  FROM scored
) WHERE rank <= 5
"""


@register(
    "t18_bm25_retrieval",
    oracle=_T18_ORACLE,
    description="BM25 RETRIEVAL (Okapi k1=1.2 b=0.75): top-5 documents "
    "per query term by probabilistic relevance — the scorer used to "
    "mine topical subsets from a training corpus. Postings are filtered "
    "to the query terms before aggregation; corpus stats and df are "
    "broadcast; the only full shuffle is the per-term tf groupBy",
)
def t18_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    stats = d.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        (
            F.sum(F.size("toks").cast("double")) / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
    )
    tok = d.select(
        "doc_id",
        F.size("toks").cast("double").alias("dl"),
        F.explode("toks").alias("term"),
    )
    tf = (
        tok.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term", "dl")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    score = F.round(
        F.log(F.lit(1.0) + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        * (F.col("tf") * F.lit(_K1 + 1.0))
        / (
            F.col("tf")
            + F.lit(_K1)
            * (F.lit(1.0 - _B) + F.lit(_B) * F.col("dl") / F.col("avgdl"))
        ),
        6,
    )
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .select("term", "doc_id", score.alias("score"))
    )
    w = Window.partitionBy("term").orderBy(F.desc("score"), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("term", "doc_id", "score", "rank")
    )


# ---------------------------------------------------------------------------
# j11 — keyless range join via time-binning.
#
# "Which page views landed inside an incident window?" — the join has
# NO equi key (incidents are global), so naive Spark plans it as a
# BroadcastNestedLoopJoin: every view compared against every window,
# O(n·m). The rewrite buckets time into bins the width of the window
# span: each interval explodes to the 1-2 bins it overlaps, each view
# has exactly ONE bin, and the join becomes an equi-join on bin
# followed by the exact bound filter. At 100 TB this is the difference
# between a shuffle join and a cluster-killing cross product.
# ---------------------------------------------------------------------------

_WIN_S = 300  # 5-minute incident windows and bin width

_J11_ORACLE = f"""
WITH incidents AS (
  SELECT event_id AS error_id, ts AS start_ts,
         ts + INTERVAL '{_WIN_S} seconds' AS end_ts
  FROM events
  WHERE event_type = 'error' AND event_id % 10 = 0
), views AS (
  SELECT event_id AS view_id, ts FROM events WHERE event_type = 'view'
)
SELECT i.error_id, v.view_id,
       epoch_ms(v.ts) - epoch_ms(i.start_ts) AS ms_after
FROM incidents i JOIN views v
  ON v.ts >= i.start_ts AND v.ts < i.end_ts
"""


@register(
    "j11_range_join_binned",
    oracle=_J11_ORACLE,
    description="KEYLESS RANGE JOIN via time-binning: views falling "
    "inside global 5-minute incident windows. No equi key exists, so "
    "the naive plan is BroadcastNestedLoopJoin (O(n*m)); binning time "
    "at the window width turns it into an equi-join on bin + exact "
    "bound filter — each interval explodes to <=2 bins, each probe row "
    "to exactly 1. Oracle is DuckDB's native range join",
)
def j11_range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bin_us = _WIN_S * 1_000_000
    start_us = F.expr("unix_micros(ts)")
    incidents = ev.filter(
        (F.col("event_type") == "error") & (F.col("event_id") % 10 == 0)
    ).select(
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr(f"INTERVAL {_WIN_S} seconds")).alias("end_ts"),
        start_us.alias("start_us"),
    )
    # an interval [s, s+W) overlaps bins floor(s/W) .. floor((s+W-1µs)/W)
    inc_binned = incidents.select(
        "error_id",
        "start_ts",
        "end_ts",
        F.explode(
            F.sequence(
                (F.col("start_us") / bin_us).cast("long"),
                ((F.col("start_us") + bin_us - 1) / bin_us).cast("long"),
            )
        ).alias("bin"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("ts"),
        (F.expr("unix_micros(ts)") / bin_us).cast("long").alias("bin"),
    )
    return (
        views.join(inc_binned, "bin")
        .filter((F.col("ts") >= F.col("start_ts")) & (F.col("ts") < F.col("end_ts")))
        .select(
            "error_id",
            "view_id",
            (
                F.expr("unix_micros(ts) div 1000")
                - F.expr("unix_micros(start_ts) div 1000")
            ).alias("ms_after"),
        )
    )


_J13_A_S = 300  # incident window seconds (the wider side sets the bin)
_J13_B_S = 120  # maintenance window seconds

_J13_ORACLE = f"""
WITH inc AS (
  SELECT event_id AS inc_id, ts AS a_start,
         ts + INTERVAL '{_J13_A_S} seconds' AS a_end
  FROM events WHERE event_type = 'error' AND event_id % 5 = 0
), win AS (
  SELECT event_id AS win_id, ts AS b_start,
         ts + INTERVAL '{_J13_B_S} seconds' AS b_end
  FROM events WHERE event_type = 'purchase' AND event_id % 3 = 0
)
SELECT i.inc_id, w.win_id,
       CAST(least(epoch_ms(i.a_end), epoch_ms(w.b_end))
            - greatest(epoch_ms(i.a_start), epoch_ms(w.b_start))
          AS BIGINT) AS overlap_ms
FROM inc i JOIN win w
  ON i.a_start < w.b_end AND w.b_start < i.a_end
"""


@register(
    "j13_interval_overlap_join",
    oracle=_J13_ORACLE,
    description="INTERVAL-INTERVAL OVERLAP JOIN via shared time-binning: "
    "incident windows x maintenance windows that truly overlap, with "
    "the overlap duration — the keyless join shape j11 does not cover "
    "(j11 probes POINTS into intervals; here BOTH sides are "
    "intervals). Both sides explode to their covering bins at the "
    "WIDER window's width (<=2 bins each), the equi-join on bin "
    "replaces the BroadcastNestedLoopJoin, the exact overlap "
    "predicate filters, and distinct collapses pairs that meet in "
    "two bins. Oracle is DuckDB's native interval-overlap range join.",
)
def j13_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bin_us = _J13_A_S * 1_000_000

    def binned(df, width_s: int, id_alias: str, s_alias: str, e_alias: str):
        start_us = F.expr("unix_micros(ts)")
        return df.select(
            F.col("event_id").alias(id_alias),
            F.col("ts").alias(s_alias),
            (F.col("ts") + F.expr(f"INTERVAL {width_s} seconds")).alias(e_alias),
            F.explode(
                F.sequence(
                    (start_us / bin_us).cast("long"),
                    ((start_us + width_s * 1_000_000 - 1) / bin_us).cast("long"),
                )
            ).alias("bin"),
        )

    inc = binned(
        ev.filter((F.col("event_type") == "error") & (F.col("event_id") % 5 == 0)),
        _J13_A_S, "inc_id", "a_start", "a_end",
    )
    win = binned(
        ev.filter(
            (F.col("event_type") == "purchase") & (F.col("event_id") % 3 == 0)
        ),
        _J13_B_S, "win_id", "b_start", "b_end",
    )
    ms = lambda c: F.expr(f"unix_micros({c}) div 1000")  # noqa: E731
    return (
        inc.join(win, "bin")
        .filter(
            (F.col("a_start") < F.col("b_end"))
            & (F.col("b_start") < F.col("a_end"))
        )
        .select(
            "inc_id",
            "win_id",
            (
                F.least(ms("a_end"), ms("b_end"))
                - F.greatest(ms("a_start"), ms("b_start"))
            ).alias("overlap_ms"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# ext_scd2 — type-2 slowly-changing-dimension history from a change log.
# ---------------------------------------------------------------------------

_SCD2_ORACLE = """
SELECT user_id,
       CAST(row_number() OVER w AS BIGINT) AS version,
       event_type AS attr,
       value AS attr_value,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       COALESCE(strftime(lead(ts) OVER w, '%Y-%m-%d %H:%M:%S'),
                '9999-12-31 00:00:00') AS valid_to,
       CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@register(
    "ext_scd2_history",
    oracle=_SCD2_ORACLE,
    description="SCD TYPE-2 history from a change log: every per-user "
    "event becomes a dimension version with [valid_from, valid_to) "
    "validity and an is_current flag via lead() — the CDC compaction "
    "every warehouse runs to make point-in-time joins possible. One "
    "shuffle on the dimension key; no self-join",
)
def ext_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("version"),
        F.col("event_type").alias("attr"),
        F.col("value").alias("attr_value"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.coalesce(
            F.date_format(nxt, "yyyy-MM-dd HH:mm:ss"), F.lit("9999-12-31 00:00:00")
        ).alias("valid_to"),
        F.when(nxt.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_current"),
    )


# ---------------------------------------------------------------------------
# dq6 — numeric column profile.
# ---------------------------------------------------------------------------

_DQ6_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _dq6_oracle_one(col: str) -> str:
    return f"""
  SELECT '{col}' AS col_name,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS n_null,
         round(MIN({col}), 6) AS min_v,
         round(MAX({col}), 6) AS max_v,
         round(CAST(SUM(CAST(floor({col} * 1e6) AS BIGINT)) AS DOUBLE)
               / 1e6 / CAST(COUNT({col}) AS DOUBLE), 6) AS mean_v,
         round(quantile_cont({col}, 0.5), 6) AS p50,
         round(quantile_cont({col}, 0.95), 6) AS p95
  FROM lineitem
"""


_DQ6_ORACLE = " UNION ALL ".join(_dq6_oracle_one(c) for c in _DQ6_COLS)


@register(
    "dq6_numeric_profile",
    oracle=_DQ6_ORACLE,
    description="NUMERIC COLUMN PROFILE: min/max/mean/median/p95 and "
    "null counts for every numeric lineitem column — the profiling "
    "gate a pipeline runs before trusting a new drop. Means go through "
    "fixed-point (floor(x*1e6) BIGINT sums) so the result is "
    "partition-order-proof; percentiles are exact (≡ DuckDB "
    "quantile_cont) but computed the SCALE-CORRECT way: a value "
    "HISTOGRAM per column (one shuffle of distinct (col, value) "
    "counts after map-side partial agg — never raw rows) feeds a "
    "per-column pandas stage that derives every metric, including "
    "interpolated quantiles, from cumulative counts. Spark's exact "
    "percentile aggregate buffers every value through one reducer "
    "(4.8s at sf0.1 and unusable at 100 TB); the histogram is bounded "
    "by column CARDINALITY instead of row count",
)
def dq6_numeric_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    li = load_table(spark, sf_dir, "lineitem")
    melted = li.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).cast("double").alias("v"),
                    )
                    for c in _DQ6_COLS
                ]
            )
        ).alias("s")
    ).select("s.col_name", "s.v")
    hist = melted.groupBy("col_name", "v").agg(F.count(F.lit(1)).alias("cnt"))

    schema = T.StructType(
        [
            T.StructField("col_name", T.StringType(), True),
            T.StructField("n", T.LongType(), True),
            T.StructField("n_null", T.LongType(), True),
            T.StructField("min_v", T.DoubleType(), True),
            T.StructField("max_v", T.DoubleType(), True),
            T.StructField("mean_v", T.DoubleType(), True),
            T.StructField("p50", T.DoubleType(), True),
            T.StructField("p95", T.DoubleType(), True),
        ]
    )

    def profile(pdf):
        import math

        import numpy as np
        import pandas as pd

        name = pdf["col_name"].iloc[0]
        nulls = int(pdf.loc[pdf["v"].isna(), "cnt"].sum())
        h = pdf.dropna(subset=["v"]).sort_values("v")
        vals = h["v"].to_numpy()
        cnts = h["cnt"].to_numpy()
        nn = int(cnts.sum())
        if nn == 0:
            # an all-null column is exactly what a profiler must
            # REPORT, not crash on
            return pd.DataFrame(
                [
                    {
                        "col_name": name,
                        "n": nulls,
                        "n_null": nulls,
                        "min_v": None,
                        "max_v": None,
                        "mean_v": None,
                        "p50": None,
                        "p95": None,
                    }
                ]
            )
        cum = np.cumsum(cnts)

        def quantile_cont(q: float) -> float:
            # DuckDB/Spark exact interpolation: x = (n-1)q, result =
            # lower + (upper - lower) * frac — from cumulative counts
            x = (nn - 1) * q
            lo_rank, frac = math.floor(x), x - math.floor(x)
            lo = float(vals[np.searchsorted(cum, lo_rank + 1)])
            if frac == 0.0:
                return lo
            hi = float(vals[np.searchsorted(cum, lo_rank + 2)])
            return lo + (hi - lo) * frac

        def r6(x: float) -> float:
            # half-away-from-zero like SQL round() — python round() is
            # banker's and would diverge on exact .5 boundaries
            return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6

        # mean via the same fixed-point contract as the oracle:
        # sum over rows of floor(v*1e6) == sum over values weighted
        mean_fp = int(np.sum(np.floor(vals * 1e6).astype(np.int64) * cnts))
        return pd.DataFrame(
            [
                {
                    "col_name": name,
                    "n": nn + nulls,
                    "n_null": nulls,
                    "min_v": r6(float(vals[0])),
                    "max_v": r6(float(vals[-1])),
                    "mean_v": r6(mean_fp / 1e6 / nn),
                    "p50": r6(quantile_cont(0.5)),
                    "p95": r6(quantile_cont(0.95)),
                }
            ]
        )

    return hist.groupBy("col_name").applyInPandas(profile, schema=schema)


# ---------------------------------------------------------------------------
# dq7 — approximate-distinct accuracy gate.
# ---------------------------------------------------------------------------


@register(
    "dq7_approx_distinct",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           CASE WHEN abs(CAST(approx_count_distinct(user_id) AS DOUBLE)
                         - CAST(COUNT(DISTINCT user_id) AS DOUBLE))
                     / CAST(COUNT(DISTINCT user_id) AS DOUBLE) <= 0.1
                THEN 1 ELSE 0 END AS approx_within_10pct
    FROM events
    GROUP BY event_type
    """,
    description="APPROX-DISTINCT ACCURACY GATE: per event type, the "
    "exact distinct-user count plus a flag asserting each engine's own "
    "HLL sketch lands within 10% of it. Sketch VALUES are "
    "engine-specific by construction, so the CONTRACT is what's "
    "compared — the pattern for validating the estimator a 100 TB "
    "pipeline uses where exact distinct is a full shuffle it cannot "
    "afford",
)
def dq7_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    exact = F.countDistinct("user_id").cast("long")
    approx = F.approx_count_distinct("user_id")
    return ev.groupBy("event_type").agg(
        exact.alias("exact_distinct"),
        F.when(
            F.abs(approx.cast("double") - exact.cast("double"))
            / exact.cast("double")
            <= 0.1,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("approx_within_10pct"),
    )


# ---------------------------------------------------------------------------
# m4 — audio feature extraction (multimodal family, audio leg).
#
# Real waveforms, oracle-checked end to end: A16 audio (the ASCII
# int16 format media_codec decodes dependency-free) is synthesized
# JVM-side from doc_id arithmetic, decoded + featurized inside one
# Arrow-batched mapInPandas stage, and the oracle recomputes the
# expected RMS / zero-crossing values from the SAME generator
# arithmetic without parsing bytes — drift anywhere in synthesis,
# decode, or feature math breaks the hash match. Every squared sample
# is an exact integer in binary64, so the window sums are
# order-independent and sqrt/division are correctly rounded: the
# doubles are bit-identical across engines by construction.
# ---------------------------------------------------------------------------

_A16_N = 16  # samples per clip; window=8 -> 2 windows


def _a16_payload_expr(seed_col):
    """A REAL audio clip as a Spark expression: A16 header + 16
    samples s_i = ((seed*(5i+11) + 3i) % 2048) - 1024, all JVM-side
    string assembly (the audio twin of _p3_image_expr)."""
    samples = [
        (F.pmod(seed_col * (5 * i + 11) + 3 * i, F.lit(2048)) - 1024).cast("string")
        for i in range(_A16_N)
    ]
    return F.encode(
        F.concat(F.lit(f"A16\n8000 {_A16_N}\n"), F.concat_ws(" ", *samples)),
        "utf-8",
    )


_M4_ORACLE = f"""
WITH s AS (
  SELECT doc_id,
         list_transform(generate_series(0, {_A16_N - 1}),
                        i -> ((doc_id * (5*i + 11) + 3*i) % 2048) - 1024) AS sm
  FROM documents
)
SELECT doc_id AS media_id,
       TRUE AS decode_ok,
       8000 AS sample_rate,
       {_A16_N} AS n_samples,
       {_A16_N // 8} AS n_windows,
       round(sqrt(list_sum(list_transform(sm[1:8],
                                          x -> CAST(x * x AS DOUBLE))) / 8.0)
             / 32768.0, 6) AS rms0,
       round(CAST(len(list_filter(generate_series(2, 8),
                                  i -> sm[i-1] * sm[i] < 0)) AS DOUBLE)
             / 7.0, 6) AS zcr0
FROM s
"""


@register(
    "m4_audio_features",
    oracle=_M4_ORACLE,
    description="AUDIO pipeline with REAL waveforms, ORACLE-CHECKED: "
    "A16 clips synthesized JVM-side from doc_id, decoded by the "
    "dependency-free codec inside Arrow-batched mapInPandas, reduced "
    "to per-window RMS + zero-crossing-rate; the oracle re-derives "
    "the features from the sample-generator arithmetic without "
    "parsing bytes. Squared-integer window sums are exact in "
    "binary64, so values are bit-identical across engines",
)
def m4_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dww_data_pipeline_spark.operators.documents import extract_audio_features

    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        _a16_payload_expr(F.col("doc_id")).alias("payload"),
    )
    feats = extract_audio_features(media, window=8)
    return feats.select(
        "media_id",
        "decode_ok",
        "sample_rate",
        "n_samples",
        "n_windows",
        F.round("rms0", 6).alias("rms0"),
        F.round("zcr0", 6).alias("zcr0"),
    )


# ---------------------------------------------------------------------------
# t19 — bigram language-model perplexity scoring (CCNet shape).
#
# Pass 1 trains the bigram model on the corpus itself (conditional
# counts c(w1 w2) and continuation totals c(w1 ·) — one partial-agg
# shuffle of counts, never text); pass 2 joins the model back onto
# the per-document bigrams and scores each document by its mean
# smoothed log-probability. Low avg_logp = off-distribution text:
# the perplexity filter CCNet/Gopher-style pipelines threshold on,
# here with the corpus itself as the LM (add-0.5 smoothing over the
# unigram vocabulary).
#
# Scale shape: the bigram model is vocabulary-bounded; the score join
# keys on the bigram string and aggregates per (doc, bigram) BEFORE
# joining, so the join input carries distinct doc-bigram pairs with
# counts, not raw occurrences. ln() is evaluated per MODEL ROW (once
# per distinct bigram), and per-doc sums weight it by the occurrence
# count — float sums of a few hundred terms, 1e-6 rounding >> any
# summation-order noise.
# ---------------------------------------------------------------------------

_T19_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKS_CURATION} AS t FROM documents
), bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i+1])) AS bg
  FROM toks
), w AS (
  SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1 FROM bg
), c2 AS (
  SELECT bg, CAST(COUNT(*) AS BIGINT) AS c2 FROM w GROUP BY bg
), c1 AS (
  SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM w GROUP BY w1
), v AS (
  SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
  FROM (SELECT unnest(t) AS tok FROM toks)
), scored AS (
  SELECT w.doc_id,
         ln((CAST(c2.c2 AS DOUBLE) + 0.5)
            / (CAST(c1.c1 AS DOUBLE) + 0.5 * CAST(v.v AS DOUBLE))) AS lp
  FROM w JOIN c2 USING (bg) JOIN c1 USING (w1) CROSS JOIN v
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       round(SUM(lp) / COUNT(*), 6) AS avg_logp
FROM scored
GROUP BY doc_id
"""


@register(
    "t19_bigram_lm_score",
    oracle=_T19_ORACLE,
    description="BIGRAM-LM PERPLEXITY SCORING (CCNet two-pass): train "
    "the bigram model on the corpus (conditional + continuation "
    "counts, one count shuffle), then score every document by mean "
    "add-0.5-smoothed log P(w2|w1) — the perplexity quality filter of "
    "CCNet/Gopher pipelines with the corpus as its own LM. Model is "
    "vocab-bounded; the score join carries distinct (doc, bigram) "
    "pairs with counts, and ln() evaluates once per model row",
)
def t19_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dww_data_pipeline_spark.plans.text_exprs import (
        exploded_kgrams,
        spark_tokens,
    )

    d = load_table(spark, sf_dir, "documents")
    bg = exploded_kgrams(d, "text", 2, carry=("doc_id",), out="bg")
    w = bg.select("doc_id", "bg", F.split("bg", " ")[0].alias("w1"))
    c2 = w.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    c1 = w.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        d.select(F.explode(spark_tokens(F.col("text"))).alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
    )
    # distinct (doc, bigram) pairs with occurrence counts — the join
    # input is deduped before the model attach
    doc_bg = w.groupBy("doc_id", "bg", "w1").agg(F.count(F.lit(1)).alias("n"))
    lp = F.log(
        (F.col("c2").cast("double") + 0.5)
        / (F.col("c1").cast("double") + 0.5 * F.col("v").cast("double"))
    )
    scored = (
        doc_bg.join(c2, "bg")
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", "n", lp.alias("lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.sum("n").alias("n_bigrams"),
        F.round(
            F.sum(F.col("lp") * F.col("n").cast("double"))
            / F.sum("n").cast("double"),
            6,
        ).alias("avg_logp"),
    )


# ---------------------------------------------------------------------------
# ext_merge — MERGE INTO (CDC upsert/delete compaction).
#
# The warehouse-maintenance primitive: apply a changeset (updates,
# inserts, deletes) to a snapshot in one pass. The changeset here is
# derived deterministically from the snapshot so the query is
# self-contained: keys %10==3 get a 10% price update, %10==5 are
# deleted, and %10==7 spawn inserts under new keys.
#
# Scale shape: changesets are tiny relative to snapshots, so the
# merge is snapshot LEFT JOIN broadcast(changes) + union of inserts —
# the 100 TB snapshot NEVER shuffles; with a large changeset the same
# plan degrades gracefully to a key-partitioned shuffle join.
# ---------------------------------------------------------------------------

_MERGE_ORACLE = """
WITH upd AS (
  -- DECIMAL end-to-end (the registry money rule): the double form
  -- round(x * 1.1, 2) diverged between engines on one sf0.1 row
  -- whose binary product sits on a .xx5 boundary; the decimal
  -- product is exact (<= 3 decimal digits), so HALF_UP rounding is
  -- engine-identical
  SELECT o_orderkey,
         round(CAST(o_totalprice AS DECIMAL(18,2))
               * CAST(1.1 AS DECIMAL(3,1)), 2) AS new_price
  FROM orders WHERE o_orderkey % 10 = 3
), del AS (
  SELECT o_orderkey FROM orders WHERE o_orderkey % 10 = 5
), ins AS (
  SELECT o_orderkey + 600000000 AS o_orderkey, o_totalprice AS new_price
  FROM orders WHERE o_orderkey % 10 = 7
)
SELECT s.o_orderkey,
       CAST(COALESCE(u.new_price, s.o_totalprice) AS DOUBLE) AS o_totalprice,
       CASE WHEN u.o_orderkey IS NOT NULL THEN 'updated' ELSE 'kept' END AS src
FROM orders s
LEFT JOIN upd u USING (o_orderkey)
WHERE s.o_orderkey NOT IN (SELECT o_orderkey FROM del)
UNION ALL
SELECT o_orderkey, CAST(new_price AS DOUBLE) AS o_totalprice, 'inserted' AS src
FROM ins
"""


@register(
    "ext_merge_upsert",
    oracle=_MERGE_ORACLE,
    description="MERGE INTO (CDC compaction): apply an "
    "update/delete/insert changeset to the orders snapshot in one "
    "pass — updated rows rewritten, deleted keys dropped, inserts "
    "appended, each row tagged with its provenance. Changesets are "
    "small, so the snapshot side joins against a BROADCAST changeset "
    "and never shuffles; inserts append by union",
)
def ext_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    snap = o.select("o_orderkey", "o_totalprice")
    upd = snap.filter(F.col("o_orderkey") % 10 == 3).select(
        "o_orderkey",
        # decimal multiply + decimal HALF_UP round — exact on both
        # engines (the double form diverged on a .xx5-boundary row)
        F.expr(
            "round(CAST(o_totalprice AS DECIMAL(18,2)) "
            "* CAST(1.1 AS DECIMAL(3,1)), 2)"
        ).alias("new_price"),
    )
    dels = snap.filter(F.col("o_orderkey") % 10 == 5).select(
        "o_orderkey", F.lit(True).alias("_del")
    )
    ins = snap.filter(F.col("o_orderkey") % 10 == 7).select(
        (F.col("o_orderkey") + 600000000).alias("o_orderkey"),
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        F.lit("inserted").alias("src"),
    )
    merged = (
        snap.join(F.broadcast(upd), "o_orderkey", "left")
        .join(F.broadcast(dels), "o_orderkey", "left")
        .filter(F.col("_del").isNull())
        .select(
            "o_orderkey",
            F.coalesce(F.col("new_price"), F.col("o_totalprice"))
            .cast("double")
            .alias("o_totalprice"),
            F.when(F.col("new_price").isNotNull(), F.lit("updated"))
            .otherwise(F.lit("kept"))
            .alias("src"),
        )
    )
    return merged.unionByName(ins)


# ---------------------------------------------------------------------------
# dq8 — functional-dependency profiling.
#
# "Does column A determine column B?" answered with evidence: for
# each candidate FD, the number of determinant values, how many of
# them map to >1 dependent value (violations), and the worst fan-out.
# nation->region key mapping is a TRUE FD in the schema; user->
# event_type and customer->priority are expected NON-dependencies —
# the profile quantifies all three. One count-shuffle per candidate
# on (A, B) pairs; nothing wide ever moves.
# ---------------------------------------------------------------------------

_DQ8_CANDS = (
    ("nation_to_region", "nation", "n_nationkey", "n_regionkey"),
    ("user_to_event_type", "events", "user_id", "event_type"),
    ("cust_to_priority", "orders", "o_custkey", "o_orderpriority"),
)

_DQ8_ORACLE = "\nUNION ALL\n".join(
    f"""
SELECT '{name}' AS fd,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(CASE WHEN nv > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
       CAST(MAX(nv) AS BIGINT) AS max_fanout
FROM (SELECT {a}, COUNT(DISTINCT {b}) AS nv FROM {tbl} GROUP BY {a})
"""
    for name, tbl, a, b in _DQ8_CANDS
)


@register(
    "dq8_fd_profile",
    oracle=_DQ8_ORACLE,
    description="FUNCTIONAL-DEPENDENCY PROFILING: for each candidate "
    "A->B dependency, the determinant-key count, how many keys map to "
    "more than one dependent value, and the worst fan-out — the "
    "schema-inference / data-contract check that distinguishes true "
    "FDs (nation->region) from coincidental ones before a pipeline "
    "relies on them. One distinct-count shuffle per candidate",
)
def dq8_fd_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = []
    for name, tbl, a, b in _DQ8_CANDS:
        t = load_table(spark, sf_dir, tbl)
        per_key = t.groupBy(a).agg(F.countDistinct(b).alias("nv"))
        parts.append(
            per_key.agg(
                F.count(F.lit(1)).alias("n_keys"),
                F.sum((F.col("nv") > 1).cast("long")).alias("n_violating"),
                F.max("nv").cast("long").alias("max_fanout"),
            ).select(F.lit(name).alias("fd"), "*")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# j12 — point-in-time (temporal) join: facts against the dimension
# version in effect AT EVENT TIME. The feature-store / ML-training
# correctness primitive (no feature leakage from the future): each
# purchase joins the signup-attribute version current at purchase
# time, never a later one. Composes the ext_scd2 change-log shape
# with the asof_join operator — ONE shuffle on the entity key, no
# interval self-join blowup.
# ---------------------------------------------------------------------------

_J12_ORACLE = """
WITH v AS (
  SELECT user_id, ts AS v_ts, value AS signup_value,
         CAST(row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS BIGINT) AS version
  FROM events WHERE event_type = 'signup'
), p AS (
  SELECT event_id AS purchase_id, user_id, ts AS p_ts
  FROM events WHERE event_type = 'purchase'
)
SELECT p.purchase_id, p.user_id,
       epoch_ms(p.p_ts) AS p_ms,
       v.version,
       epoch_ms(v.v_ts) AS v_ms,
       v.signup_value
FROM p ASOF LEFT JOIN v
  ON p.user_id = v.user_id AND v.v_ts <= p.p_ts
"""


@register(
    "j12_pit_join",
    oracle=_J12_ORACLE,
    description="POINT-IN-TIME JOIN: each purchase event joined to "
    "the signup-attribute version in effect AT PURCHASE TIME (never a "
    "later one) — the feature-store primitive that prevents future "
    "leakage into training features. Composed as the union-sort-"
    "window as-of carry (one shuffle on the entity key); oracle is "
    "DuckDB's native ASOF LEFT JOIN",
)
def j12_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dww_data_pipeline_spark.operators.sequence import asof_join

    ev = load_table(spark, sf_dir, "events")
    ms = F.expr("unix_micros(ts) div 1000")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    versions = (
        ev.filter(F.col("event_type") == "signup")
        .withColumn("version", F.row_number().over(w).cast("long"))
        .select(
            "user_id",
            ms.alias("v_ms"),
            F.col("value").alias("signup_value"),
            "version",
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", ms.alias("p_ms")
    )
    return asof_join(
        purchases,
        versions,
        on="user_id",
        left_ts="p_ms",
        right_ts="v_ms",
        right_cols=["version", "v_ms", "signup_value"],
    )


# ---------------------------------------------------------------------------
# pr1 — PageRank over the supplier-transition graph.
#
# The reference's domain is a talent-flow graph (people jumping
# between companies); the analogous graph in the test schema is
# "which supplier does a customer buy from NEXT": consecutive
# lineitems per customer timeline yield supplier→supplier edges
# weighted by transition count. PageRank then ranks suppliers by
# centrality in the flow network — an ITERATIVE algorithm made
# hash-checkable by fixing the iteration count so the oracle can
# unroll the identical recurrence as plain CTEs.
# ---------------------------------------------------------------------------

_PR_ITERS = 5
_PR_D = 0.85

_PR_EDGES_SQL = """
  SELECT prev AS src, l_suppkey AS dst,
         CAST(COUNT(*) AS DOUBLE) AS w
  FROM (
    SELECT l.l_suppkey,
           lag(l.l_suppkey) OVER (
             PARTITION BY o.o_custkey
             ORDER BY o.o_orderdate, o.o_orderkey, l.l_linenumber,
                      l.l_suppkey
           ) AS prev
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  )
  WHERE prev IS NOT NULL AND prev <> l_suppkey
  GROUP BY prev, l_suppkey
"""


def _pr_oracle() -> str:
    parts = [
        f"WITH edges AS ({_PR_EDGES_SQL}),",
        "outw AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY src),",
        "frac AS (SELECT e.src, e.dst, e.w / o.ow AS f"
        " FROM edges e JOIN outw o ON e.src = o.src),",
        "nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM edges"
        " UNION SELECT dst FROM edges)),",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),",
        "r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM nodes),",
    ]
    for i in range(1, _PR_ITERS + 1):
        p = i - 1
        parts.append(
            f"d{i} AS (SELECT COALESCE(SUM(r), 0.0) AS dm FROM r{p}"
            f" WHERE node NOT IN (SELECT src FROM edges)),"
        )
        parts.append(
            f"r{i} AS (SELECT nodes.node,"
            f" (1.0 - {_PR_D}) / (SELECT n FROM nn)"
            f" + {_PR_D} * (COALESCE(c.c, 0.0)"
            f" + (SELECT dm FROM d{i}) / (SELECT n FROM nn)) AS r"
            f" FROM nodes LEFT JOIN ("
            f"SELECT f.dst AS node, SUM(r{p}.r * f.f) AS c"
            f" FROM frac f JOIN r{p} ON f.src = r{p}.node GROUP BY f.dst"
            f") c ON nodes.node = c.node),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT node AS supplier, round(r, 8) AS rank FROM r{_PR_ITERS}"
    )
    return "\n".join(parts)


_EDGE_MEMO: dict[tuple[str, str], DataFrame] = {}


def supplier_transition_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier→supplier transition counts along each customer's
    purchase timeline (the shared edge builder for pr1/pr2/pr3);
    returns (src, dst, w) with w the BIGINT transition count. The
    node-bounded edge list is localCheckpoint-materialized once per
    (application, sf_dir) — the pr-family consumers share it, same
    materialized-view rule as strong_tie_graph / lsh_pairs_cached."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _EDGE_MEMO.get(key)
    if cached is not None:
        return cached
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    # l_linenumber is NOT unique within an order in the synthetic data:
    # the supplier key completes the total order (SURVEY §7.3
    # order-dependency hazard — every window must sort on a total key)
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey", "l_linenumber", "l_suppkey"
    )
    timeline = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_custkey", "o_orderdate", "o_orderkey", "l_linenumber", "l_suppkey"
    )
    edges = (
        timeline.withColumn("prev", F.lag("l_suppkey").over(w))
        .filter(F.col("prev").isNotNull() & (F.col("prev") != F.col("l_suppkey")))
        .groupBy(F.col("prev").alias("src"), F.col("l_suppkey").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint()
    )
    _EDGE_MEMO[key] = edges
    return edges


@register(
    "pr1_supplier_pagerank",
    oracle=_pr_oracle(),
    description="PAGERANK over the supplier-transition graph (the "
    "talent-flow centrality of the reference domain, re-keyed to "
    "which supplier a customer buys from next): weighted power "
    "iteration with dangling-mass redistribution, FIXED 5 iterations "
    "so the oracle unrolls the identical recurrence as CTEs — the "
    "iterative-algorithm pattern (driver loop orchestrates, data "
    "stays distributed, lineage truncated per round) made "
    "hash-checkable cross-engine",
)
def pr1_supplier_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dww_data_pipeline_spark.operators.graph import pagerank

    edges = supplier_transition_edges(spark, sf_dir).withColumn(
        "w", F.col("w").cast("double")
    )
    ranks = pagerank(edges, "src", "dst", "w", iters=_PR_ITERS, damping=_PR_D)
    return ranks.select(
        F.col("node").alias("supplier"), F.round("rank", 8).alias("rank")
    )


# ---------------------------------------------------------------------------
# ext_json_props — semi-structured (JSON) column extraction.
#
# events.props carries a JSON payload; extraction stays JVM-side
# (get_json_object compiles into the scan stage — no Python, no
# separate parse pass), and the aggregate shuffles only (event_type,
# counters). The schema-on-read path every event pipeline needs for
# loosely-typed instrumentation payloads.
# ---------------------------------------------------------------------------


@register(
    "ext_json_props",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(k) AS BIGINT) AS n_with_k,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(MIN(k) AS BIGINT) AS min_k,
           CAST(MAX(k) AS BIGINT) AS max_k,
           CAST(COUNT(DISTINCT k) AS BIGINT) AS distinct_k
    FROM (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    GROUP BY event_type
    """,
    description="SEMI-STRUCTURED JSON extraction: the events.props "
    "payload parsed schema-on-read (get_json_object — JVM-side, "
    "fused into the scan stage) and profiled per event type; only "
    "(event_type, counters) ever shuffle. The loosely-typed "
    "instrumentation-payload path of every event pipeline",
)
def ext_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.countDistinct("k").alias("distinct_k"),
        )
    )


# ---------------------------------------------------------------------------
# dq20 — sketch MERGEABILITY gate (the incremental-rollup contract).
# ---------------------------------------------------------------------------


@register(
    "dq20_hll_merge_gate",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           1 AS merged_within_10pct,
           1 AS whole_within_10pct,
           1 AS merge_vs_whole_within_5pct
    FROM events
    GROUP BY event_type
    """,
    description="SKETCH-MERGEABILITY GATE (DataSketches HLL): per "
    "event type, per-MONTH partial sketches (hll_sketch_agg) are "
    "unioned (hll_union_agg) and the merged estimate must land within "
    "10% of the exact distinct-user count, as must the whole-scan "
    "sketch, and the two estimates within 5% of each other (exact "
    "equality is NOT the contract: a union abandons the single-stream "
    "HIP estimator for the composite one, so merged != whole by "
    "construction). The oracle pins the exact counts and the expected "
    "all-green flags. This is THE 100 TB incremental pattern: daily "
    "partials persisted once, any rollup window answered by sketch "
    "union — no re-scan of history; mergeability is what makes the "
    "rollup lattice sound, so it is asserted as a first-class "
    "oracle-checked quantity. The streaming leg "
    "(streaming/sketch_rollup.py) persists per-micro-batch partials "
    "and answers rollups by union only, with EXACT "
    "decomposition-independence parity-tested — union-path estimates "
    "depend only on register state (north-star: mergeable-summary "
    "rollups)",
)
def dq20_hll_merge_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    partials = ev.groupBy(
        "event_type", F.date_trunc("month", F.col("ts")).alias("month")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = partials.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_merged")
    )
    whole = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct"),
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est_whole"),
    )
    exact_d = F.col("exact_distinct").cast("double")

    def _within(a, b, tol):
        return (
            F.when(F.abs(a - b) / F.greatest(b, F.lit(1.0)) <= tol, F.lit(1))
            .otherwise(F.lit(0))
        )

    return (
        whole.join(merged, "event_type")
        .select(
            "event_type",
            "exact_distinct",
            _within(F.col("est_merged").cast("double"), exact_d, 0.1).alias(
                "merged_within_10pct"
            ),
            _within(F.col("est_whole").cast("double"), exact_d, 0.1).alias(
                "whole_within_10pct"
            ),
            _within(
                F.col("est_merged").cast("double"),
                F.col("est_whole").cast("double"),
                0.05,
            ).alias("merge_vs_whole_within_5pct"),
        )
    )


# ---------------------------------------------------------------------------
# t34 — interpolated Kneser-Ney bigram LM scoring.
#
# t19 scores with add-0.5 smoothing; production perplexity filters
# (CCNet's KenLM stage and its descendants) use modified Kneser-Ney,
# whose backoff weight is the CONTINUATION probability — how many
# distinct contexts a word follows, not how often it occurs.  This is
# the interpolated bigram form with absolute discount D = 0.75:
#
#   P(w2|w1) = (max(c(w1 w2) - D, 0) + D * N1+(w1 .) * Pc(w2)) / c(w1 .)
#   Pc(w2)   = N1+(. w2) / N1+(. .)
#
# "the san" scores low under add-k (rare bigram) but "san" ALSO has a
# tiny continuation count (it only ever follows "the"), which is
# exactly the distinction KN encodes and add-k cannot.
#
# Scale shape: everything past the one bigram-count shuffle is
# vocabulary-bounded — c1 / N1+(w1 .) / N1+(. w2) aggregate the
# DISTINCT-bigram model table (not the corpus), N1+(. .) is a 1-row
# broadcast, and ln() evaluates once per model row.  The corpus-side
# score join carries distinct (doc, bigram) pairs with counts, the
# t19 discipline.  D = 0.75 and all counts are exact in binary, the
# per-row float expression trees are written identically on both
# engines (IEEE ops in the same order), and the per-doc mean rounds
# at 1e-6 >> summation-order noise (t19 precedent).
# ---------------------------------------------------------------------------

_T34_ORACLE = f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, {_SQL_TOKS_CURATION} AS t FROM documents
), bg AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i+1])) AS bg
  FROM toks
), c2 AS MATERIALIZED (
  SELECT bg, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg GROUP BY bg
), typ AS MATERIALIZED (
  SELECT bg, c2,
         string_split(bg, ' ')[1] AS w1,
         string_split(bg, ' ')[2] AS w2
  FROM c2
), c1 AS MATERIALIZED (
  SELECT w1,
         CAST(SUM(c2) AS BIGINT) AS c1,
         CAST(COUNT(*) AS BIGINT) AS n1p_w1
  FROM typ GROUP BY w1
), cont AS MATERIALIZED (
  SELECT w2, CAST(COUNT(*) AS BIGINT) AS nc_w2 FROM typ GROUP BY w2
), tot AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS nbb FROM typ
), model AS MATERIALIZED (
  SELECT typ.bg,
         ln((greatest(CAST(typ.c2 AS DOUBLE) - 0.75, 0.0)
             + 0.75 * CAST(c1.n1p_w1 AS DOUBLE)
               * (CAST(cont.nc_w2 AS DOUBLE) / CAST(tot.nbb AS DOUBLE)))
            / CAST(c1.c1 AS DOUBLE)) AS lp
  FROM typ JOIN c1 USING (w1) JOIN cont USING (w2) CROSS JOIN tot
), doc_bg AS MATERIALIZED (
  SELECT doc_id, bg, CAST(COUNT(*) AS BIGINT) AS n
  FROM bg GROUP BY doc_id, bg
)
SELECT doc_id,
       CAST(SUM(n) AS BIGINT) AS n_bigrams,
       round(SUM(CAST(n AS DOUBLE) * lp) / CAST(SUM(n) AS DOUBLE), 6)
         AS avg_logp_kn
FROM doc_bg JOIN model USING (bg)
GROUP BY doc_id
"""


@register(
    "t34_kneser_ney_score",
    oracle=_T34_ORACLE,
    description="INTERPOLATED KNESER-NEY BIGRAM LM SCORING (the "
    "CCNet/KenLM-style perplexity filter, stepping past t19's add-k): "
    "absolute discount D=0.75 with continuation-probability backoff "
    "N1+(.w2)/N1+(..) — rare bigrams of promiscuous words score "
    "higher than rare bigrams of single-context words, the "
    "distinction add-k smoothing cannot encode. Model statistics "
    "aggregate the distinct-bigram table (vocabulary-bounded, one "
    "corpus count shuffle); ln() once per model row; score join "
    "carries distinct (doc, bigram) pairs with counts",
)
def t34_kneser_ney_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dww_data_pipeline_spark.plans.text_exprs import exploded_kgrams

    d = load_table(spark, sf_dir, "documents")
    bg = exploded_kgrams(d, "text", 2, carry=("doc_id",), out="bg")
    c2 = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    typ = c2.select(
        "bg",
        "c2",
        F.split("bg", " ")[0].alias("w1"),
        F.split("bg", " ")[1].alias("w2"),
    )
    c1 = typ.groupBy("w1").agg(
        F.sum("c2").alias("c1"), F.count(F.lit(1)).alias("n1p_w1")
    )
    cont = typ.groupBy("w2").agg(F.count(F.lit(1)).alias("nc_w2"))
    tot = typ.agg(F.count(F.lit(1)).alias("nbb"))
    # identical float expression tree as the oracle: greatest/+/*//
    # associate left-to-right on both engines
    lp = F.log(
        (
            F.greatest(F.col("c2").cast("double") - F.lit(0.75), F.lit(0.0))
            + F.lit(0.75)
            * F.col("n1p_w1").cast("double")
            * (F.col("nc_w2").cast("double") / F.col("nbb").cast("double"))
        )
        / F.col("c1").cast("double")
    )
    model = (
        typ.join(c1, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tot))
        .select("bg", lp.alias("lp"))
    )
    doc_bg = bg.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("n"))
    return (
        doc_bg.join(model, "bg")
        .groupBy("doc_id")
        .agg(
            F.sum("n").cast("long").alias("n_bigrams"),
            F.round(
                F.sum(F.col("n").cast("double") * F.col("lp"))
                / F.sum("n").cast("double"),
                6,
            ).alias("avg_logp_kn"),
        )
    )


# ---------------------------------------------------------------------------
# d23 — content-defined chunking (CDC) with an oracle-checked
# shift-resistance contract.
#
# d14 dedups FIXED 16-word chunks: one inserted token shifts every
# later boundary, so near-identical documents share almost no chunk
# fingerprints.  Production dedup storage (LBFS, FastCDC) cuts chunks
# where a ROLLING HASH of the local content hits a sentinel value, so
# boundaries move WITH the content and an insertion disturbs only the
# chunks it touches.  This operator runs both schemes side by side on
# each document and its 1-token-prefixed twin and emits the shared
# distinct-fingerprint counts as exact integers — the shift-resistance
# property is the oracle-checked RESULT, not a code comment: CDC keeps
# (all but <= 2 leading chunks) shared, fixed-width collapses to
# near-zero.
#
# Cut rule: after token i iff the top-32-bit md5 of the bigram
# (tok[i-1], tok[i]) is 0 mod 8 (window-2 gear hash, expected chunk
# ~8 tokens; '^' pads the first bigram).  md5-top-32 parses
# identically on both engines (sources/shards.py discipline).
#
# Scale shape: one doc-partitioned token window (lag + running cut
# count — no global window), two keyed chunk aggregations, and
# doc-level conditional sums; work is linear in corpus tokens, no
# pairwise join anywhere.  On 100 TB the version twin doubles token
# volume but stays embarrassingly doc-parallel.
# ---------------------------------------------------------------------------

_D23_ORACLE = f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, {_SQL_TOKS_CURATION} AS t FROM documents
), versions AS MATERIALIZED (
  SELECT doc_id, 'orig' AS version, t FROM base
  UNION ALL
  SELECT doc_id, 'shift' AS version, list_prepend('xq0', t) AS t FROM base
), tok AS MATERIALIZED (
  SELECT doc_id, version, i - 1 AS idx, t[i] AS tok
  FROM versions, UNNEST(generate_series(1, len(t))) AS s(i)
), flagged AS MATERIALIZED (
  SELECT doc_id, version, idx, tok,
         CASE WHEN ('0x' || substr(md5(
                      coalesce(lag(tok) OVER w, '^') || ' ' || tok),
                    1, 8))::BIGINT % 8 = 0
              THEN 1 ELSE 0 END AS cut
  FROM tok
  WINDOW w AS (PARTITION BY doc_id, version ORDER BY idx)
), assigned AS MATERIALIZED (
  SELECT doc_id, version, idx, tok,
         COALESCE(SUM(cut) OVER (
             PARTITION BY doc_id, version ORDER BY idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cdc_id,
         idx // 8 AS fix_id
  FROM flagged
), chunks AS MATERIALIZED (
  SELECT doc_id, version, 'cdc' AS scheme,
         md5(string_agg(tok, ' ' ORDER BY idx)) AS fp
  FROM assigned GROUP BY doc_id, version, cdc_id
  UNION ALL
  SELECT doc_id, version, 'fix' AS scheme,
         md5(string_agg(tok, ' ' ORDER BY idx)) AS fp
  FROM assigned GROUP BY doc_id, version, fix_id
), per_fp AS MATERIALIZED (
  SELECT doc_id, scheme, fp,
         MAX(CASE WHEN version = 'orig' THEN 1 ELSE 0 END) AS in_orig,
         MAX(CASE WHEN version = 'shift' THEN 1 ELSE 0 END) AS in_shift
  FROM (SELECT DISTINCT doc_id, version, scheme, fp FROM chunks)
  GROUP BY doc_id, scheme, fp
)
SELECT doc_id,
  CAST(SUM(CASE WHEN scheme='cdc' AND in_orig=1 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_cdc_orig,
  CAST(SUM(CASE WHEN scheme='cdc' AND in_shift=1 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_cdc_shift,
  CAST(SUM(CASE WHEN scheme='cdc' AND in_orig=1 AND in_shift=1
           THEN 1 ELSE 0 END) AS BIGINT) AS n_cdc_shared,
  CAST(SUM(CASE WHEN scheme='fix' AND in_orig=1 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_fix_orig,
  CAST(SUM(CASE WHEN scheme='fix' AND in_shift=1 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_fix_shift,
  CAST(SUM(CASE WHEN scheme='fix' AND in_orig=1 AND in_shift=1
           THEN 1 ELSE 0 END) AS BIGINT) AS n_fix_shared
FROM per_fp
GROUP BY doc_id
"""


@register(
    "d23_cdc_chunking",
    oracle=_D23_ORACLE,
    description="CONTENT-DEFINED CHUNKING (LBFS/FastCDC gear-hash "
    "discipline, the shift-resistant complement of d14's fixed "
    "chunks): cut where the md5-top-32 of the token bigram hits 0 "
    "mod 8, chunk each document AND its 1-token-prefixed twin under "
    "both CDC and fixed-width schemes, and emit shared "
    "distinct-fingerprint counts as exact integers — shift "
    "resistance as an oracle-checked contract (CDC shares all but "
    "<= 2 leading chunks; fixed-width collapses). One doc-partitioned "
    "token window + keyed chunk aggs, linear in corpus tokens",
)
def d23_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dww_data_pipeline_spark.plans.text_exprs import spark_tokens

    d = load_table(spark, sf_dir, "documents")
    return cdc_chunk_counts(
        d.select("doc_id", spark_tokens(F.col("text")).alias("t"))
    )


def cdc_chunk_counts(base: DataFrame) -> DataFrame:
    """The d23 core over any (doc_id, t array<string>) relation —
    factored for direct property testing against a pure sequential
    chunker (the journey_patterns/substring_spans discipline)."""
    versions = base.select(
        "doc_id", F.lit("orig").alias("version"), "t"
    ).unionByName(
        base.select(
            "doc_id",
            F.lit("shift").alias("version"),
            F.concat(F.array(F.lit("xq0")), F.col("t")).alias("t"),
        )
    )
    tok = versions.select(
        "doc_id", "version", F.posexplode("t").alias("idx", "tok")
    )
    w = Window.partitionBy("doc_id", "version").orderBy("idx")
    bigram = F.concat_ws(
        " ", F.coalesce(F.lag("tok").over(w), F.lit("^")), F.col("tok")
    )
    cut = (
        F.conv(F.substring(F.md5(bigram), 1, 8), 16, 10).cast("long") % 8 == 0
    ).cast("int")
    flagged = tok.withColumn("cut", cut)
    assigned = flagged.select(
        "doc_id",
        "version",
        "idx",
        "tok",
        F.coalesce(
            F.sum("cut").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("cdc_id"),
        F.floor(F.col("idx") / F.lit(8)).cast("long").alias("fix_id"),
    )

    def _chunks(id_col: str, scheme: str) -> DataFrame:
        return (
            assigned.groupBy("doc_id", "version", id_col)
            .agg(
                F.md5(
                    F.array_join(
                        F.transform(
                            F.sort_array(
                                F.collect_list(F.struct("idx", "tok"))
                            ),
                            lambda r: r["tok"],
                        ),
                        " ",
                    )
                ).alias("fp")
            )
            .select(
                "doc_id", "version", F.lit(scheme).alias("scheme"), "fp"
            )
        )

    chunks = _chunks("cdc_id", "cdc").unionByName(_chunks("fix_id", "fix"))
    per_fp = (
        chunks.distinct()
        .groupBy("doc_id", "scheme", "fp")
        .agg(
            F.max(
                F.when(F.col("version") == "orig", F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias("in_orig"),
            F.max(
                F.when(F.col("version") == "shift", F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias("in_shift"),
        )
    )

    def _n(scheme: str, cond):
        return F.sum(
            F.when((F.col("scheme") == scheme) & cond, F.lit(1)).otherwise(
                F.lit(0)
            )
        ).cast("long")

    in_o = F.col("in_orig") == 1
    in_s = F.col("in_shift") == 1
    return per_fp.groupBy("doc_id").agg(
        _n("cdc", in_o).alias("n_cdc_orig"),
        _n("cdc", in_s).alias("n_cdc_shift"),
        _n("cdc", in_o & in_s).alias("n_cdc_shared"),
        _n("fix", in_o).alias("n_fix_orig"),
        _n("fix", in_s).alias("n_fix_shift"),
        _n("fix", in_o & in_s).alias("n_fix_shared"),
    )


# ---------------------------------------------------------------------------
# st15 — LM perplexity gate at ingest (streaming twin discipline).
#
# t19/t34 score the corpus against itself — every bigram is in-model
# by construction.  The PRODUCTION form of the perplexity filter
# scores INCOMING documents against a model trained on the existing
# corpus (CCNet's KenLM gate), which forces the question self-scoring
# never asks: what does an unseen bigram cost?  Here the answer is
# explicit and engine-portable:
#
#   Pc(w2)      = (N1+(. w2) + 0.5) / (N1+(. .) + 0.5 * (V + 1))
#                 (continuation distribution, add-0.5 floored so OOV
#                  words keep a nonzero continuation mass)
#   w1 seen:      P = (max(c(w1 w2) - D, 0) + D * N1+(w1 .) * Pc) / c(w1 .)
#   w1 unseen:    P = Pc(w2)
#
# Corpus/batch split is the d11 snapshot convention (doc_id % 10 == 0
# is the incoming batch).  The registered query is the BATCH core;
# streaming/lm_ingest.py runs the same core per micro-batch against a
# model built ONCE and cached (the st13 persisted-index discipline),
# parity-tested stream == batch.
#
# Scale shape: the model is vocabulary-bounded and built once; each
# batch pays one bigram-count shuffle over ITS OWN text plus keyed
# left joins against the model.  ln() per (doc, bigram) row with an
# identical expression tree on both engines; 1e-6 rounding on the
# per-doc mean (t19 discipline).
# ---------------------------------------------------------------------------


def lm_model(corpus: DataFrame) -> dict[str, DataFrame]:
    """Kneser-Ney bigram model components from a corpus: c2m (bg ->
    count), c1m (w1 -> left total + distinct continuations), contm
    (w2 -> distinct left contexts), tot (1-row N1+(..)), voc (1-row
    distinct-token count). All vocabulary-bounded."""
    from dww_data_pipeline_spark.plans.text_exprs import (
        exploded_kgrams,
        spark_tokens,
    )

    bgc = exploded_kgrams(corpus, "text", 2, carry=(), out="bg")
    c2m = bgc.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    typ = c2m.select(
        "bg",
        "c2",
        F.split("bg", " ")[0].alias("w1"),
        F.split("bg", " ")[1].alias("w2"),
    )
    return {
        "c2m": c2m,
        "c1m": typ.groupBy("w1").agg(
            F.sum("c2").alias("c1"), F.count(F.lit(1)).alias("n1p")
        ),
        "contm": typ.groupBy("w2").agg(F.count(F.lit(1)).alias("nc")),
        "tot": typ.agg(F.count(F.lit(1)).alias("nbb")),
        "voc": corpus.select(
            F.explode(spark_tokens(F.col("text"))).alias("tok")
        ).agg(F.countDistinct("tok").alias("v")),
    }


def lm_score(batch: DataFrame, model: dict[str, DataFrame]) -> DataFrame:
    """Score (doc_id, text) rows against an lm_model: per-doc mean
    smoothed log P(w2|w1) with the OOV backoff documented above,
    plus the OOV-occurrence count (its own quality signal)."""
    from dww_data_pipeline_spark.plans.text_exprs import exploded_kgrams

    bbg = exploded_kgrams(batch, "text", 2, carry=("doc_id",), out="bg")
    dbg = (
        bbg.select(
            "doc_id",
            "bg",
            F.split("bg", " ")[0].alias("w1"),
            F.split("bg", " ")[1].alias("w2"),
        )
        .groupBy("doc_id", "bg", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pc = (F.coalesce(F.col("nc"), F.lit(0)).cast("double") + F.lit(0.5)) / (
        F.col("nbb").cast("double")
        + F.lit(0.5) * (F.col("v").cast("double") + F.lit(1.0))
    )
    with_pc = (
        dbg.join(model["contm"], "w2", "left")
        .crossJoin(F.broadcast(model["tot"]))
        .crossJoin(F.broadcast(model["voc"]))
        .withColumn("pc", pc)
    )
    seen_lp = F.log(
        (
            F.greatest(
                F.coalesce(F.col("c2"), F.lit(0)).cast("double") - F.lit(0.75),
                F.lit(0.0),
            )
            + F.lit(0.75) * F.col("n1p").cast("double") * F.col("pc")
        )
        / F.col("c1").cast("double")
    )
    scored = (
        with_pc.join(model["c2m"], "bg", "left")
        .join(model["c1m"], "w1", "left")
        .select(
            "doc_id",
            "n",
            F.when(F.col("c2").isNull(), F.col("n"))
            .otherwise(F.lit(0))
            .alias("oov_n"),
            F.when(F.col("c1").isNotNull(), seen_lp)
            .otherwise(F.log(F.col("pc")))
            .alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_bigrams"),
        F.sum("oov_n").cast("long").alias("n_oov"),
        F.round(
            F.sum(F.col("n").cast("double") * F.col("lp"))
            / F.sum("n").cast("double"),
            6,
        ).alias("avg_logp"),
    )


_ST15_ORACLE = f"""
WITH corpus AS MATERIALIZED (
  SELECT text FROM documents WHERE doc_id % 10 <> 0
), ctoks AS MATERIALIZED (
  SELECT {_SQL_TOKS_CURATION} AS t FROM corpus
), cbg AS MATERIALIZED (
  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i+1])) AS bg
  FROM ctoks
), c2m AS MATERIALIZED (
  SELECT bg, CAST(COUNT(*) AS BIGINT) AS c2 FROM cbg GROUP BY bg
), typ AS MATERIALIZED (
  SELECT bg, c2,
         string_split(bg, ' ')[1] AS w1,
         string_split(bg, ' ')[2] AS w2
  FROM c2m
), c1m AS MATERIALIZED (
  SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1,
         CAST(COUNT(*) AS BIGINT) AS n1p
  FROM typ GROUP BY w1
), contm AS MATERIALIZED (
  SELECT w2, CAST(COUNT(*) AS BIGINT) AS nc FROM typ GROUP BY w2
), tot AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS nbb FROM typ
), voc AS MATERIALIZED (
  SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
  FROM (SELECT unnest(t) AS tok FROM ctoks)
), btoks AS MATERIALIZED (
  SELECT doc_id, {_SQL_TOKS_CURATION} AS t FROM documents
  WHERE doc_id % 10 = 0
), bbg AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i+1])) AS bg
  FROM btoks
), dbg AS MATERIALIZED (
  SELECT doc_id, bg,
         string_split(bg, ' ')[1] AS w1,
         string_split(bg, ' ')[2] AS w2,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM bbg GROUP BY 1, 2, 3, 4
), with_pc AS MATERIALIZED (
  SELECT d0.doc_id, d0.bg, d0.w1, d0.n,
         (CAST(coalesce(contm.nc, 0) AS DOUBLE) + 0.5)
           / (CAST(tot.nbb AS DOUBLE)
              + 0.5 * (CAST(voc.v AS DOUBLE) + 1.0)) AS pc
  FROM dbg d0
  LEFT JOIN contm USING (w2)
  CROSS JOIN tot CROSS JOIN voc
), scored AS MATERIALIZED (
  SELECT w.doc_id, w.n,
         CASE WHEN c2m.c2 IS NULL THEN w.n ELSE 0 END AS oov_n,
         CASE WHEN c1m.c1 IS NOT NULL
              THEN ln((greatest(CAST(coalesce(c2m.c2, 0) AS DOUBLE) - 0.75,
                                0.0)
                       + 0.75 * CAST(c1m.n1p AS DOUBLE) * w.pc)
                      / CAST(c1m.c1 AS DOUBLE))
              ELSE ln(w.pc) END AS lp
  FROM with_pc w
  LEFT JOIN c2m USING (bg)
  LEFT JOIN c1m USING (w1)
)
SELECT doc_id,
       CAST(SUM(n) AS BIGINT) AS n_bigrams,
       CAST(SUM(oov_n) AS BIGINT) AS n_oov,
       round(SUM(CAST(n AS DOUBLE) * lp) / CAST(SUM(n) AS DOUBLE), 6)
         AS avg_logp
FROM scored
GROUP BY doc_id
"""


@register(
    "st15_stream_lm_score",
    oracle=_ST15_ORACLE,
    description="LM PERPLEXITY GATE AT INGEST (CCNet's production "
    "form): incoming documents (doc_id % 10 == 0, the d11 snapshot "
    "convention) scored against a Kneser-Ney bigram model trained on "
    "the EXISTING corpus only, with explicit engine-portable OOV "
    "backoff (floored continuation distribution; unseen-context "
    "bigrams fall back to pure continuation probability) and the OOV "
    "occurrence count as its own quality signal. Batch core of the "
    "streaming flow in streaming/lm_ingest.py (model built once and "
    "cached, per-micro-batch cost batch-proportional — the st13 "
    "persisted-index discipline)",
)
def st15_stream_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 10 != 0).select("doc_id", "text")
    batch = d.filter(F.col("doc_id") % 10 == 0).select("doc_id", "text")
    return lm_score(batch, lm_model(corpus))


# ---------------------------------------------------------------------------
# c3 — perplexity-bucketed mixture (the composed CCNet tail step).
#
# CCNet's pipeline is dedup -> LM scoring -> perplexity-bucketed
# sampling: documents are bucketed by LM score WITHIN their source
# domain (perplexity is not comparable across domains), head buckets
# are kept whole, tail buckets are down-sampled. The repo has every
# stage as a verified operator (d-family, t34, t16/t17); c3 is the
# composed step itself: t34's KN scores -> per-source score deciles
# (decile 1 = most in-distribution) -> deterministic md5-uniform
# admission at per-decile rates (head 3 deciles 100%, mid 4 50%,
# tail 3 10%) -> the per-(source, decile) mixture manifest as exact
# integers.
#
# Scale shape: t34's model work (vocabulary-bounded) + a per-source
# ntile window (parallel across sources; for very low source
# cardinality swap in the t14 two-phase rank, as t17 documents) + a
# hash-gated filter and one small groupBy. Admission is RNG-free —
# re-runs, backfills, and engines admit the identical set (t16
# discipline).
# ---------------------------------------------------------------------------

_C3_RATES_SQL = (
    "CASE WHEN decile <= 3 THEN 1.0 "
    "WHEN decile <= 7 THEN 0.5 ELSE 0.1 END"
)

_C3_ORACLE = f"""
WITH t34 AS MATERIALIZED ({_T34_ORACLE}),
src AS MATERIALIZED (
  SELECT t34.doc_id, t34.n_bigrams, t34.avg_logp_kn, d.source
  FROM t34 JOIN documents d ON d.doc_id = t34.doc_id
), bucketed AS MATERIALIZED (
  SELECT doc_id, n_bigrams, source,
         CAST(ntile(10) OVER (PARTITION BY source
                              ORDER BY avg_logp_kn DESC, doc_id)
              AS BIGINT) AS decile
  FROM src
), admitted AS MATERIALIZED (
  SELECT doc_id, n_bigrams, source, decile,
         CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) / 4294967296.0
                   < {_C3_RATES_SQL}
              THEN 1 ELSE 0 END AS kept
  FROM bucketed
)
SELECT source, decile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(kept) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN kept = 1 THEN n_bigrams ELSE 0 END) AS BIGINT)
         AS bigrams_kept
FROM admitted
GROUP BY source, decile
"""


@register(
    "c3_perplexity_mixture",
    oracle=_C3_ORACLE,
    description="PERPLEXITY-BUCKETED MIXTURE (the composed CCNet tail "
    "step): t34's Kneser-Ney scores -> per-source score deciles "
    "(ntile over a source-partitioned window, decile 1 = most "
    "in-distribution) -> deterministic md5-uniform admission at "
    "per-decile rates (head kept whole, tail down-sampled 10x) -> "
    "the per-(source, decile) mixture manifest as exact integers. "
    "RNG-free reproducible corpus builds; every stage is itself a "
    "verified operator (t34, t16, t17)",
)
def c3_perplexity_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    scores = t34_kneser_ney_score(spark, sf_dir)
    src = scores.join(d.select("doc_id", "source"), "doc_id")
    w = Window.partitionBy("source").orderBy(
        F.col("avg_logp_kn").desc(), "doc_id"
    )
    bucketed = src.select(
        "doc_id",
        "n_bigrams",
        "source",
        F.ntile(10).over(w).cast("long").alias("decile"),
    )
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        / F.lit(4294967296.0)
    )
    rate = (
        F.when(F.col("decile") <= 3, F.lit(1.0))
        .when(F.col("decile") <= 7, F.lit(0.5))
        .otherwise(F.lit(0.1))
    )
    admitted = bucketed.withColumn(
        "kept", F.when(u < rate, F.lit(1)).otherwise(F.lit(0))
    )
    return admitted.groupBy("source", "decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("kept").cast("long").alias("n_kept"),
        F.sum(
            F.when(F.col("kept") == 1, F.col("n_bigrams")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("bigrams_kept"),
    )
