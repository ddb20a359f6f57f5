"""End-to-end driver simulation: builds a PLAIN SparkSession (mirroring
the verify driver's own session, not our tuned one), imports
__spark_entry__, smoke-checks entry(), and cross-checks every
queries()/oracle_sql() pair against DuckDB at sf0.01 — the exact surface
CORRECTNESS_r{N}.json grades."""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from tests.conftest import compare_query_to_oracle  # noqa: E402


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-mimic")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = entrymod.entry(spark).collect()
    print(f"SMOKE entry(): {len(rows)} rows", flush=True)
    assert len(rows) > 0

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    failures = 0
    for name, fn in sorted(qs.items()):
        if name not in oracles:
            n = fn(spark, sf).count()
            print(f"PASS {name}: rows-only ({n})", flush=True)
            continue
        try:
            ok, msg = compare_query_to_oracle(spark, sf, name, fn, oracles[name])
        except Exception as e:
            ok, msg = False, f"{name}: EXC {type(e).__name__}: {str(e)[:200]}"
        print(("PASS " if ok else "FAIL ") + msg, flush=True)
        failures += 0 if ok else 1
    print(f"{failures} failures / {len(qs)} queries", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
