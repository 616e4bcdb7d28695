"""Hostile-skew study for journey-string analytics (round-6 verdict
ask #8): where does ev17's per-user collect_list journey build break,
and what do the mitigations cost?

    python tools/skew_study.py [sf_dir] [--hot 10000,100000,1000000,4000000]

ev17 collapses each user's events to ONE string via
collect_list(struct) -> sort_array -> transform -> array_join, then
counts regex patterns over it.  The struct list and the journey
string both live inside a single task for that user's group — a user
with 10^6 events is a ~10^6-char string built from ~10^6 48-byte
structs in one reduce task, which no partitioning strategy can split
(the GROUP is the unit of work).  This harness measures that path
directly: the sf0.1 events table plus ONE synthetic hot user with K
events, K swept over --hot, timing

  * ``full``     — journey_patterns() exactly as registered (uncapped)
  * ``capped``   — the mitigation: slice the sorted struct array to
                   the first CAP events before building the string.
                   Semantics change honestly documented: patterns are
                   counted over the user's first CAP events (a
                   bounded behavioural window), not the whole tail.
  * ``automaton`` — the st14 discipline on batch data: no string is
                   ever built; the pattern automaton folds over the
                   per-user event sequence with O(1) state via
                   aggregate(), emitting the same three counters.

Output: one JSON line per (K, variant) with wall seconds and the hot
user's journey length; paste the table into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

_HOT_USER = 999_999_999
_CAP = 100_000


def hostile_events(spark, sf_dir: str, k: int):
    from pyspark.sql import functions as F

    from dww_data_pipeline_spark.sources.catalog import load_table

    base = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    # deterministic v/v/e/e/p cycle: dense error bursts AND v->p arcs
    cycle = F.array(
        F.lit("view"), F.lit("view"), F.lit("error"), F.lit("error"),
        F.lit("purchase"),
    )
    hot = spark.range(k).select(
        F.lit(_HOT_USER).cast("long").alias("user_id"),
        (
            F.to_timestamp(F.lit("2030-01-01 00:00:00"))
            + F.make_interval(secs=F.col("id").cast("double"))
        ).alias("ts"),
        (F.lit(2_000_000_000) + F.col("id")).alias("event_id"),
        F.element_at(cycle, ((F.col("id") % 5) + 1).cast("int")).alias(
            "event_type"
        ),
    )
    return base.unionByName(hot)


def capped_patterns(ev, cap: int):
    """ev17's journey build with the sorted event list sliced to the
    first ``cap`` events — the bounded-window mitigation."""
    from pyspark.sql import functions as F

    ev = ev.filter(F.col("event_type").isNotNull() & F.col("ts").isNotNull())
    journey = F.array_join(
        F.transform(
            F.slice(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col("ts"),
                            F.col("event_id"),
                            F.substring("event_type", 1, 1).alias("c"),
                        )
                    )
                ),
                1,
                cap,
            ),
            lambda x: x["c"],
        ),
        "",
    )
    return (
        ev.groupBy("user_id")
        .agg(journey.alias("journey"))
        .select(
            "user_id",
            F.length("journey").cast("long").alias("journey_len"),
            F.regexp_count("journey", F.lit("v[^p]*p")).cast("long").alias(
                "n_view_to_purchase"
            ),
            F.regexp_count("journey", F.lit("ee+")).cast("long").alias(
                "n_error_bursts"
            ),
        )
    )


def automaton_patterns(ev):
    """No journey string at all: the st14 automaton folded over the
    sorted per-user initials with aggregate() — state is (in_arc,
    prev_error, arcs, bursts), O(1) per user regardless of length.

    The struct list still materializes per user (sorting needs it),
    but the O(len) string build + regex scans are replaced by one
    O(len) fold with constant state — and on a stream this same
    automaton runs in applyInPandasWithState with NO per-user
    materialization at all (streaming/journey.py), which is the true
    scale path this study motivates."""
    from pyspark.sql import functions as F

    ev = ev.filter(F.col("event_type").isNotNull() & F.col("ts").isNotNull())
    chars = F.transform(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("ts"),
                    F.col("event_id"),
                    F.substring("event_type", 1, 1).alias("c"),
                )
            )
        ),
        lambda x: x["c"],
    )
    # state: named_struct(in_arc int, prev_e int, arcs long, bursts long)
    fold = F.aggregate(
        chars,
        F.expr(
            "named_struct('in_arc', 0, 'prev_e', 0,"
            " 'arcs', CAST(0 AS BIGINT), 'bursts', CAST(0 AS BIGINT))"
        ),
        lambda acc, c: F.struct(
            F.when(c == "p", F.lit(0))
            .when(c == "v", F.lit(1))
            .otherwise(acc["in_arc"])
            .alias("in_arc"),
            F.when(c == "e", acc["prev_e"] + 1).otherwise(F.lit(0)).alias(
                "prev_e"
            ),
            (
                acc["arcs"]
                + F.when((c == "p") & (acc["in_arc"] == 1), F.lit(1)).otherwise(
                    F.lit(0)
                ).cast("long")
            ).alias("arcs"),
            (
                acc["bursts"]
                + F.when((c == "e") & (acc["prev_e"] == 1), F.lit(1)).otherwise(
                    F.lit(0)
                ).cast("long")
            ).alias("bursts"),
        ),
    )
    return (
        ev.groupBy("user_id")
        .agg(fold.alias("s"))
        .select(
            "user_id",
            F.col("s.arcs").alias("n_view_to_purchase"),
            F.col("s.bursts").alias("n_error_bursts"),
        )
    )


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from dww_data_pipeline_spark.plans.web_plans import journey_patterns
    from dww_data_pipeline_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    hots = [10_000, 100_000, 1_000_000, 4_000_000]
    for i, a in enumerate(sys.argv[1:]):
        if a.startswith("--hot="):
            hots = [int(x) for x in a.split("=", 1)[1].split(",")]
        elif a == "--hot":
            if i + 2 >= len(sys.argv):
                sys.exit("usage: skew_study.py [sf_dir] --hot N[,N...]")
            hots = [int(x) for x in sys.argv[i + 2].split(",")]

    spark = get_spark("skew-study")
    # sanity: the three variants agree on the REAL (unskewed) data
    real = hostile_events(spark, sf_dir, 0)
    a = {
        r["user_id"]: (r["n_view_to_purchase"], r["n_error_bursts"])
        for r in journey_patterns(real)
        .select("user_id", "n_view_to_purchase", "n_error_bursts")
        .collect()
    }
    b = {
        r["user_id"]: (r["n_view_to_purchase"], r["n_error_bursts"])
        for r in capped_patterns(real, _CAP).collect()
    }
    c = {
        r["user_id"]: (r["n_view_to_purchase"], r["n_error_bursts"])
        for r in automaton_patterns(real).collect()
    }
    assert a == b == c, "variant disagreement on real data"
    print(f"# variants agree on {len(a)} real users", flush=True)

    for k in hots:
        ev = hostile_events(spark, sf_dir, k).localCheckpoint()
        for variant, fn in (
            ("full", lambda e: journey_patterns(e).drop("journey")),
            ("capped", lambda e: capped_patterns(e, _CAP)),
            ("automaton", automaton_patterns),
        ):
            t0 = time.perf_counter()
            try:
                df = fn(ev)
                row = (
                    df.filter(F.col("user_id") == _HOT_USER)
                    .collect()
                )
                sec = round(time.perf_counter() - t0, 3)
                hot = row[0].asDict() if row else {}
                print(
                    json.dumps(
                        {
                            "hot_events": k,
                            "variant": variant,
                            "sec": sec,
                            "hot_row": {
                                kk: vv
                                for kk, vv in hot.items()
                                if kk != "user_id"
                            },
                        }
                    ),
                    flush=True,
                )
            except Exception as exc:  # noqa: BLE001 — the breakpoint IS the result
                sec = round(time.perf_counter() - t0, 3)
                print(
                    json.dumps(
                        {
                            "hot_events": k,
                            "variant": variant,
                            "sec": sec,
                            "error": f"{type(exc).__name__}: {str(exc)[:200]}",
                        }
                    ),
                    flush=True,
                )
        ev.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
