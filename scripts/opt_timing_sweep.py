"""Full-surface timing sweep for the optimization round: time EVERY
registered query at $SPARK_GRAFT_SF_DIR (noop sink, best of N) so the
expensive non-headline paths are found by measurement, not guess
(optimization guide §1: measure first).

Usage: PYTHONPATH=/root/repo python scripts/opt_timing_sweep.py out.json [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from bishe_gpu_database_spark.registry import REGISTRY, _ensure_loaded  # noqa: E402
from bishe_gpu_database_spark.session import get_spark  # noqa: E402


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/opt_timing_sweep.json"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = sys.argv[3:]  # optional subset
    _ensure_loaded()
    spark = get_spark("opt-timing-sweep")
    spark.range(1).count()
    results: dict[str, dict] = {}
    names = only or sorted(REGISTRY)
    for i, name in enumerate(names):
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        times = []
        err = None
        for _ in range(runs):
            t0 = time.perf_counter()
            try:
                df = REGISTRY[name].fn(spark, sf_dir)
                try:
                    df.write.format("noop").mode("overwrite").save()
                except Exception:
                    df.collect()  # sinks/DDL-shaped queries
                times.append(round(time.perf_counter() - t0, 3))
            except Exception as e:
                err = f"{type(e).__name__}: {str(e)[:120]}"
                break
        results[name] = {"best": min(times) if times else None, "times": times, "err": err}
        print(f"[{i + 1}/{len(names)}] {name}: {results[name]['best']} {err or ''}", flush=True)
    with open(out, "w") as fh:
        json.dump({"sf_dir": sf_dir, "results": results}, fh, indent=1)
    top = sorted(
        ((v["best"], k) for k, v in results.items() if v["best"] is not None),
        reverse=True,
    )
    print("\nTOP 30 by best-of-N wall:")
    for s, k in top[:30]:
        print(f"{s:8.3f}  {k}")


if __name__ == "__main__":
    main()
