"""Local differential harness — mimics the driver's correctness gate.

Runs every registry query on Spark and its DuckDB oracle on the same
parquet tables, then compares row count, column names, and
order-insensitive values (columns sorted by name, rows sorted).

Usage:  python tools/diffcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd


def duck_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # An in-memory DuckDB cannot spill (no temp dir) and defaults its
    # memory limit to ~80% of RAM — while the 32-thread Spark JVM
    # holds the same box.  The round-9 sweep hit hard "Out of Memory
    # Error: Failed to allocate block" failures on oracles that pass
    # green in isolation.  Cap the pool well below the JVM's share and
    # give the allocator a spill path so a heavy MATERIALIZED chain
    # degrades to disk instead of failing the sweep.
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET memory_limit='24GB'")
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def values_match(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if len(a) != len(b):
        return False, f"row count {len(a)} vs {len(b)}"
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} vs {list(b.columns)}"
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if x != y:
                    return False, f"col {c} row {i}: {x!r} != {y!r} (float, diff={x-y:.3e})"
            elif str(x) != str(y):
                return False, f"col {c} row {i}: {x!r} != {y!r}"
    return True, "ok"


# Retries are a correctness-relevant signal, not just plumbing: a
# genuinely flaky query masked by a silent rerun is indistinguishable
# from a hypervisor stall. Every retry is printed AND accumulated here
# so sweeps can record them in the DIFFCHECK_r{N}.json artifact.
RETRIES: list[str] = []


def run_spark_side(q, spark, sf_dir: str) -> pd.DataFrame:
    """Execute the Spark side with ONE retry on infrastructure
    exceptions only. A transient environment event (observed once: a
    contiguous 5-query failure window that passed on immediate rerun
    — suspected tmp-cleanup/hypervisor stall) must not read as a
    correctness failure; a VALUE mismatch is computed downstream and
    never retried. The first-attempt exception is always printed and
    recorded in RETRIES so masked failures remain auditable."""
    try:
        return q.spark(spark, sf_dir).toPandas()
    except Exception as e:  # noqa: BLE001
        first = f"{q.name}: {type(e).__name__}: {str(e).splitlines()[0][:200]}"
        RETRIES.append(first)
        print(f"RETRY {first}", flush=True)
        return q.spark(spark, sf_dir).toPandas()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, ".")
    from dww_data_pipeline_spark.plans.registry import REGISTRY, _load_all
    from dww_data_pipeline_spark.session import get_spark

    _load_all()
    spark = get_spark("diffcheck")
    con = duck_conn(sf_dir)

    failures = []
    for name, q in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        try:
            sdf = run_spark_side(q, spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if q.oracle is None:
            n = len(sdf)
            status = "OK " if n >= 0 else "??"
            print(f"{status} {name}: rows-only ({n} rows)")
            continue
        try:
            ddf = con.execute(q.oracle).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        ok, why = values_match(canon(sdf), canon(ddf))
        if ok:
            print(f"OK  {name}: {len(sdf)} rows")
        else:
            failures.append(name)
            print(f"FAIL {name}: {why}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
