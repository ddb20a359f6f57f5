"""Local driver-mimic: run every registered query against its DuckDB
oracle and print a pass/fail line each. Usage:
    python scripts/parity_check.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import sys
import time
import traceback

from bishe_gpu_database_spark.registry import REGISTRY, _ensure_loaded
from bishe_gpu_database_spark.session import get_spark
from tests.conftest import compare_query_to_oracle


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:]
    _ensure_loaded()
    spark = get_spark("parity")
    failures = 0
    for name, spec in sorted(REGISTRY.items()):
        if names and not any(f in name for f in names):
            continue
        t0 = time.perf_counter()
        try:
            if spec.oracle is None:
                n = spec.fn(spark, sf_dir).count()
                ok, msg = True, f"{name}: rows-only ({n} rows)"
            else:
                ok, msg = compare_query_to_oracle(spark, sf_dir, name, spec.fn, spec.oracle)
        except Exception as e:
            ok, msg = False, f"{name}: EXC {type(e).__name__}: {str(e)[:300]}"
            if "-v" in sys.argv:
                traceback.print_exc()
        dt = time.perf_counter() - t0
        print(f"{'PASS' if ok else 'FAIL'} [{dt:5.1f}s] {msg}", flush=True)
        failures += 0 if ok else 1
    print(f"\n{failures} failures / {len(REGISTRY)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
