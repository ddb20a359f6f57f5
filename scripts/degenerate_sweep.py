"""Degenerate-input sweep: run every registered query against a
zero-row copy of the fixture tables (exact schemas, no data) and report
any crash or invalid result.

Rationale: at 100 TB a partition, a filter, or an entire date range
being empty is an everyday event, not an edge case — an operator that
throws on empty input (head()[0] on no rows, max() fed to a required
arg, division by a zero count) is a production incident. The ADVICE
audits keep probing exactly this class (one-arm A/B, empty buckets), so
we sweep the whole surface preemptively.

Usage:
    PYTHONPATH=/root/repo python scripts/degenerate_sweep.py [name_filter ...]

Writes nothing; prints PASS/FAIL per query and a summary line.
"""

from __future__ import annotations

import os
import sys
import tempfile
import traceback

import pyarrow.parquet as pq


def make_empty_sf_dir(base_sf: str, out_dir: str) -> None:
    """Write a zero-row parquet per fixture table, schema copied from
    ``base_sf`` so every query plans identically."""
    for fname in sorted(os.listdir(base_sf)):
        if not fname.endswith(".parquet"):
            continue
        schema = pq.read_schema(os.path.join(base_sf, fname))
        pq.write_table(schema.empty_table(), os.path.join(out_dir, fname))


def main() -> int:
    filters = sys.argv[1:]
    from bishe_gpu_database_spark.registry import REGISTRY, _ensure_loaded
    from bishe_gpu_database_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark("degenerate-sweep")
    base_sf = os.environ.get("SPARK_GRAFT_BASE_SF", "/root/testdata/sf0.001")

    with tempfile.TemporaryDirectory(prefix="sf_empty_") as empty_dir:
        make_empty_sf_dir(base_sf, empty_dir)
        names = [
            n
            for n in sorted(REGISTRY)
            if not filters or any(f in n for f in filters)
        ]
        failures: dict[str, str] = {}
        for name in names:
            try:
                df = REGISTRY[name].fn(spark, empty_dir)
                rows = df.collect()
                print(f"PASS {name}: {len(rows)} rows", flush=True)
            except Exception as e:  # noqa: BLE001 — sweep must see every failure
                failures[name] = f"{type(e).__name__}: {e}"
                print(f"FAIL {name}: {type(e).__name__}: {e}", flush=True)
                if os.environ.get("SPARK_GRAFT_SWEEP_TRACE"):
                    traceback.print_exc()
        print(
            f"# degenerate sweep: {len(names) - len(failures)}/{len(names)} pass,"
            f" failures: {sorted(failures)}"
        )
        return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
