"""Full-surface parity artifact: run EVERY registered query against its
DuckDB oracle at sf0.01 (the driver's correctness-gate scale) and write
PARITY.json with per-query rows/schema/hash booleans — the committed
evidence that the whole registered surface is green, beyond the driver's
50-query per-round sample.

Run: PYTHONPATH=/root/repo python scripts/parity_artifact.py
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")

from bishe_gpu_database_spark.registry import REGISTRY, _ensure_loaded  # noqa: E402
from tests.conftest import compare_structured  # noqa: E402


def check_one(spark, sf_dir: str, name: str, fn, sql: str | None) -> dict:
    """Delegate to the canonical comparator in tests/conftest.py (one
    implementation for the pytest gate and this committed artifact)."""
    try:
        r = compare_structured(spark, sf_dir, fn, sql)
    except Exception as e:  # noqa: BLE001
        return {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": f"{type(e).__name__}: {str(e)[:200]}",
        }
    return {k: v for k, v in r.items() if not k.startswith("_")}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/PARITY.json"
    _ensure_loaded()
    # A PLAIN session, mirroring the verify driver's own (no tuned configs).
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("parity-artifact")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    t_start = time.time()
    for name, spec in sorted(REGISTRY.items()):
        t0 = time.perf_counter()
        results[name] = check_one(spark, sf_dir, name, spec.fn, spec.oracle)
        dt = time.perf_counter() - t0
        r = results[name]
        status = (
            "PASS"
            if r["hash_match"]
            else ("ROWS" if r["err"] == "no_oracle" and r["spark_rows"] is not None else "FAIL")
        )
        print(f"{status} [{dt:5.1f}s] {name}", flush=True)
    n_hash = sum(1 for r in results.values() if r["hash_match"])
    n_rows_only = sum(1 for r in results.values() if r["err"] == "no_oracle")
    n_fail = len(results) - n_hash - n_rows_only
    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(results),
        "n_hash_checked_pass": n_hash,
        "n_rows_only": n_rows_only,
        "n_fail": n_fail,
        "wall_seconds": round(time.time() - t_start, 1),
    }
    with open(out_path, "w") as f:
        json.dump({"summary": summary, "queries": results}, f, indent=1, default=str)
    print(json.dumps(summary), flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
