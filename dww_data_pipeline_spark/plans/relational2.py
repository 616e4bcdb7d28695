"""Second relational batch: remaining SURVEY §2 operators (O6 depth
limit, P5 sentinel filter, W7 empty-group removal, A7 merge-sum,
F14/F19/F20 scalar suite, intersect/except) plus TPC-H-style classics
and analytic extensions (rollup) that round out the engine surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dww_data_pipeline_spark.functions.strings import clean_blacklist, zzz_tag
from dww_data_pipeline_spark.plans.registry import register
from dww_data_pipeline_spark.sources.catalog import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _dec(col, prec: int = 18, scale: int = 2):
    return col.cast(f"decimal({prec},{scale})")


@register(
    "o6_depth_limit",
    oracle="""
    SELECT o_orderkey, o_custkey
    FROM orders
    ORDER BY o_orderdate, o_orderkey
    LIMIT 100
    """,
    description="O6 depth limit: first N of an ordered scan (reference "
    "filmographyDepth GetWeta.py:81-86); deterministic via total order",
)
def o6_depth_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy("o_orderdate", "o_orderkey").limit(100).select("o_orderkey", "o_custkey")
    )


@register(
    "p5_sentinel_filter",
    oracle="""
    WITH tagged AS (
      SELECT c_custkey,
             CASE WHEN c_acctbal < 0 THEN 'zzz_baddata:' || c_name ELSE c_name END AS name
      FROM customer
    )
    SELECT c_custkey, name FROM tagged WHERE NOT contains(name, 'zzz_')
    """,
    description="P5/F7 sentinel-prefix tagging + exclusion filter "
    "(reference GetWeta.py:161-164, dwwFront.js:206,365-369)",
)
def p5_sentinel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    name = F.when(F.col("c_acctbal") < 0, zzz_tag(F.col("c_name"))).otherwise(
        F.col("c_name")
    )
    return (
        c.select("c_custkey", name.alias("name"))
        .filter(~F.col("name").contains("zzz_"))
    )


@register(
    "w7_empty_group_removal",
    oracle="""
    SELECT o_custkey,
           COUNT(*) AS n_urgent,
           string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS orderkeys
    FROM orders
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_custkey
    """,
    description="W7 empty-after-filter group removal: entities with no "
    "surviving rows vanish from the nested output (reference "
    "dwwApi.js:296-312) — natural consequence of filter→groupBy",
)
def w7_empty_group_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_urgent"),
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list("o_orderkey")), lambda x: x.cast("string")
                ),
            ).alias("orderkeys"),
        )
    )


@register(
    "a7_merge_sum_by_cleaned_key",
    oracle="""
    SELECT trim(regexp_replace(
             regexp_replace(
               regexp_replace(lower(p_name), '(?i)small', '', 'g'),
               '(?i)large', '', 'g'),
             '\\s+', ' ', 'g')) AS cleaned,
           COUNT(*) AS merged_rows,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM part
    GROUP BY 1
    """,
    description="A7/A8+F4: rows merged under a blacklist-cleaned key with "
    "count/sum folding (reference dwwFront.js:84-102, 159-176)",
)
def a7_merge_sum_by_cleaned_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return (
        p.groupBy(clean_blacklist(F.col("p_name"), ["small", "large"]).alias("cleaned"))
        .agg(
            F.count(F.lit(1)).alias("merged_rows"),
            F.sum(_dec(F.col("p_retailprice"))).cast("double").alias("total_price"),
        )
    )


@register(
    "set_intersect_except",
    oracle="""
    SELECT nationkey, 'both' AS which FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT
      SELECT s_nationkey FROM supplier
    )
    UNION ALL
    SELECT nationkey, 'customer_only' AS which FROM (
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT
      SELECT s_nationkey FROM supplier
    )
    """,
    description="Set ops beyond the reference's union: INTERSECT / EXCEPT "
    "(U3's verified/unverified split as true set operators)",
)
def set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    both = c.intersect(s).withColumn("which", F.lit("both"))
    only = c.subtract(s).withColumn("which", F.lit("customer_only"))  # set EXCEPT
    return both.unionByName(only)


@register(
    "f_geo_interp_suite",
    oracle="""
    WITH pts AS (
      SELECT s_suppkey,
             CAST((s_suppkey * 13) % 360 - 180 AS DOUBLE) AS lon1,
             CAST((s_suppkey * 29) % 360 - 180 AS DOUBLE) AS lon2,
             epoch_ms(TIMESTAMP '2000-01-01 00:00:00') AS start_ms,
             epoch_ms(TIMESTAMP '2000-12-31 00:00:00') AS end_ms
      FROM supplier
    )
    SELECT s_suppkey,
           CASE WHEN lon2 - lon1 > 180 THEN lon2 - lon1 - 360
                WHEN lon2 - lon1 < -180 THEN lon2 - lon1 + 360
                ELSE lon2 - lon1 END AS wrapped_dlon,
           strftime(to_timestamp((start_ms + ((end_ms - start_ms) * 5 / 10)) // 1000),
                    '%Y-%m-%d') AS midpoint_date,
           round(ln(CAST(s_suppkey + 1 AS DOUBLE)) / ln(3.0), 6) AS log3_meter
    FROM pts
    """,
    description="F19 ±180 longitude wrap + F14 linear time interpolation + "
    "F20 log-3 density meter (reference pathCreator.js:178-199, :148-160, "
    "uiElements.js:423-426)",
)
def f_geo_interp_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dww_data_pipeline_spark.functions.dates import lerp_date
    from dww_data_pipeline_spark.functions.geo import wrap_lon_diff

    s = _t(spark, sf_dir, "supplier")
    lon1 = ((F.col("s_suppkey") * 13) % 360 - 180).cast("double")
    lon2 = ((F.col("s_suppkey") * 29) % 360 - 180).cast("double")
    start_ms = F.lit(946684800000).cast("long")  # 2000-01-01 UTC
    end_ms = F.lit(978220800000).cast("long")  # 2000-12-31 UTC
    return s.select(
        "s_suppkey",
        wrap_lon_diff(lon1, lon2).alias("wrapped_dlon"),
        lerp_date(start_ms, end_ms, F.lit(5), F.lit(10)).alias("midpoint_date"),
        F.round(
            F.log((F.col("s_suppkey") + 1).cast("double")) / F.log(F.lit(3.0)), 6
        ).alias("log3_meter"),
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    description="TPC-H Q3-shape shipping priority: selective dim filter → "
    "two fact joins → agg → top-k (classic relational stress query)",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(
                _dec(F.col("l_extendedprice")) * (F.lit(1) - _dec(F.col("l_discount"), 18, 4))
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        )
    )


@register(
    "ext_rollup_counts",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    description="Analytic extension beyond the reference: ROLLUP hierarchy "
    "totals (subtotal + grand-total rows) — no reference counterpart "
    "(SURVEY §2.4 notes its absence); COALESCE'd for portable NULL labels",
)
def ext_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(_dec(F.col("l_quantity"))).cast("double").alias("sum_qty"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "cnt",
            "sum_qty",
        )
    )


@register(
    "ext_approx_distinct",
    oracle="""
    SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts
    FROM lineitem GROUP BY l_returnflag
    """,
    description="Approximate aggregates extension: the query surfaces the "
    "EXACT distinct count (oracle-checkable); the approx_count_distinct "
    "variant is asserted within 5% in tests/test_plans.py (HLL sketches "
    "have no cross-engine oracle)",
)
def ext_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct(F.col("l_partkey")).alias("exact_parts")
    )


@register(
    "j10_full_outer",
    oracle="""
    WITH neg AS (
      SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS acctbal
      FROM customer WHERE c_acctbal < 0
    ), cnt AS (
      SELECT o_custkey, COUNT(*) AS n_urgent
      FROM orders WHERE o_orderpriority = '1-URGENT'
      GROUP BY o_custkey
    )
    SELECT COALESCE(c_custkey, o_custkey) AS custkey, acctbal, n_urgent
    FROM neg FULL JOIN cnt ON c_custkey = o_custkey
    """,
    description="J-family completion: FULL OUTER join preserving both "
    "unmatched sides (negative-balance customers vs urgent-order "
    "counts) with COALESCE key recovery — the join type the "
    "reference's nested loops could not express",
)
def j10_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < 0)
        .select("c_custkey", F.col("c_acctbal").cast("double").alias("acctbal"))
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_urgent"))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "full_outer").select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        "acctbal",
        "n_urgent",
    )


@register(
    "ext_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    description="GROUPING SETS extension: explicit grouping-set list "
    "(status-only, priority-only, grand total) — generalizes "
    "ROLLUP/CUBE; one pass, no self-union of separate aggregates",
)
def ext_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("v_orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
        FROM v_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "dq1_null_profile",
    oracle="""
    WITH neg AS (
      SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS acctbal
      FROM customer WHERE c_acctbal < 0
    ), cnt AS (
      SELECT o_custkey, COUNT(*) AS n_urgent
      FROM orders WHERE o_orderpriority = '1-URGENT'
      GROUP BY o_custkey
    ), fo AS (
      SELECT COALESCE(c_custkey, o_custkey) AS custkey, acctbal, n_urgent
      FROM neg FULL JOIN cnt ON c_custkey = o_custkey
    )
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS null_acctbal,
           CAST(SUM(CASE WHEN n_urgent IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS null_n_urgent
    FROM fo
    """,
    description="Data-quality null profile: per-column null counts over "
    "a table with genuine nulls (the full-outer join output) — one "
    "conditional-aggregate pass, the completeness report every "
    "pipeline emits before training",
)
def dq1_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    fo = j10_full_outer(spark, sf_dir)
    return fo.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("acctbal").isNull(), 1).otherwise(0)).alias("null_acctbal"),
        F.sum(F.when(F.col("n_urgent").isNull(), 1).otherwise(0)).alias(
            "null_n_urgent"
        ),
    )


@register(
    "dq2_rule_violations",
    oracle="""
    SELECT
      CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END)
           AS BIGINT) AS bad_quantity,
      CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END)
           AS BIGINT) AS bad_discount,
      CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
           AS BIGINT) AS bad_price,
      CAST(SUM(CASE WHEN l_quantity >= 45 THEN 1 ELSE 0 END)
           AS BIGINT) AS near_cap_quantity
    FROM lineitem
    """,
    description="Data-quality rule report: violation counts for "
    "domain-range rules in ONE scan (conditional aggregates, no "
    "per-rule passes) — the validation gate a pipeline runs before "
    "promoting a batch to gold",
)
def dq2_rule_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    def _viol(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).alias(name)
    return li.agg(
        _viol((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), "bad_quantity"),
        _viol((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1), "bad_discount"),
        _viol(F.col("l_extendedprice") <= 0, "bad_price"),
        _viol(F.col("l_quantity") >= 45, "near_cap_quantity"),
    )


@register(
    "dq3_referential_orphans",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM lineitem l
       WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        AS orphan_lineitems,
      (SELECT COUNT(*) FROM orders o
       WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        AS orphan_orders,
      (SELECT COUNT(*) FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                         AND o.o_orderpriority = '1-URGENT'))
        AS customers_no_urgent
    FROM (SELECT 1) one
    """,
    description="Referential-integrity audit: orphan fact rows per FK "
    "edge via anti-joins (lineitem->orders, orders->customer) plus a "
    "business-rule anti-join — three LeftAnti counts combined into one "
    "report row",
)
def dq3_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    orphan_li = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_lineitems"))
    )
    orphan_o = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_orders"))
    )
    no_urgent = (
        c.join(
            o.filter(F.col("o_orderpriority") == "1-URGENT"),
            c.c_custkey == F.col("o_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("customers_no_urgent"))
    )
    return orphan_li.crossJoin(F.broadcast(orphan_o)).crossJoin(
        F.broadcast(no_urgent)
    )


@register(
    "dq4_distribution_drift",
    oracle="""
    WITH w1 AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS a
      FROM events WHERE ts < TIMESTAMP '2024-01-16' GROUP BY event_type
    ), w2 AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS b
      FROM events WHERE ts >= TIMESTAMP '2024-01-16' GROUP BY event_type
    ), j AS (
      SELECT COALESCE(w1.event_type, w2.event_type) AS event_type,
             COALESCE(a, 0) AS a, COALESCE(b, 0) AS b
      FROM w1 FULL OUTER JOIN w2 ON w1.event_type = w2.event_type
    ), tot AS (
      SELECT CAST(SUM(a) AS BIGINT) AS n1, CAST(SUM(b) AS BIGINT) AS n2 FROM j
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(abs(a * n2 - b * n1)) AS BIGINT) AS drift_num,
           CAST(CAST(SUM(abs(a * n2 - b * n1)) AS DOUBLE)
                / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS DOUBLE) AS l1_drift
    FROM j, tot GROUP BY n1, n2
    """,
    description="Data-quality gate: event-type distribution DRIFT between "
    "two ingest windows (L1 / total-variation distance) — the monitor a "
    "continuously-fed training pipeline runs to catch upstream mix "
    "shifts. Cross-products keep the arithmetic INTEGER-exact until one "
    "final double division, so partition order cannot move the metric "
    "(north-star data-quality; composes with dq1-dq3)",
)
def dq4_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    w1 = ev.filter(F.col("ts") < cut).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("a")
    )
    w2 = ev.filter(F.col("ts") >= cut).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("b")
    )
    j = (
        w1.join(w2, "event_type", "full_outer")
        .select(
            "event_type",
            F.coalesce("a", F.lit(0).cast("long")).alias("a"),
            F.coalesce("b", F.lit(0).cast("long")).alias("b"),
        )
    )
    tot = j.agg(
        F.sum("a").alias("n1"), F.sum("b").alias("n2")
    )
    return (
        j.crossJoin(F.broadcast(tot))
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            F.sum(F.abs(F.col("a") * F.col("n2") - F.col("b") * F.col("n1"))).alias(
                "drift_num"
            ),
            (
                F.sum(
                    F.abs(F.col("a") * F.col("n2") - F.col("b") * F.col("n1"))
                ).cast("double")
                / (F.first("n1").cast("double") * F.first("n2").cast("double"))
            ).alias("l1_drift"),
        )
    )


@register(
    "dq5_skew_profile",
    oracle="""
    WITH c AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id
    ), t AS (
      SELECT CAST(SUM(n_events) AS BIGINT) AS total FROM c
    )
    SELECT user_id, n_events,
           CAST(n_events AS DOUBLE) / CAST(total AS DOUBLE) AS share
    FROM c, t
    ORDER BY n_events DESC, user_id
    LIMIT 20
    """,
    description="SKEW PROFILE: heavy-hitter diagnosis for a join/agg "
    "key — top-20 user_ids by event count with their share of the "
    "total, the report that decides whether a key needs salting "
    "(operators/skew.py) or AQE skew-join handling before a 100 TB "
    "run. One partial-agg shuffle on the key; the total joins back as "
    "a broadcast literal, and the top-k is a TakeOrdered, never a "
    "global single-partition sort.",
)
def dq5_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    total = counts.agg(F.sum("n_events").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "user_id",
            "n_events",
            (F.col("n_events").cast("double") / F.col("total").cast("double")).alias(
                "share"
            ),
        )
        .orderBy(F.desc("n_events"), "user_id")
        .limit(20)
    )
