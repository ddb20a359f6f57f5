"""Empirical scaling probe: time representative queries across the three
fixture scale factors (100× data span) and print the cost ratio per 10×.

Run: PYTHONPATH=/root/repo python scripts/scale_probe.py

A query whose wall time grows ~linearly (ratio ≲ 10 per 10× data, and in
practice far below while fixed job overhead dominates) validates its
SCALE.md contract; anything super-linear is a red flag. Results are
pasted into SCALE.md's "Empirical scaling" section.
"""

from __future__ import annotations

import time

from bishe_gpu_database_spark.registry import REGISTRY, _ensure_loaded
from bishe_gpu_database_spark.session import get_spark

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
PROBES = [
    "q1_pricing_summary",       # scan + partial agg
    "q3_shipping_priority",     # 3-way join tree
    "join_sortmerge_large",     # fact-fact shuffle join
    "window_running_frame",     # window sort
    "dedup_minhash_lsh_pairs",  # map-heavy signatures + band join
    "text_bigram_lm_score",     # two co-partitioned text shuffles
    "agg_ntile_scalable",       # distributed global rank
    "events_ohlc_minute",       # map-combined argmin/argmax agg
    "events_concurrency_sweep", # ±1 sweep line (2× point fan-out + window)
    "timeseries_twap",          # lead() segments + decimal agg
    "quality_table_checksum",   # two full-scan commutative folds
    "skyline_pareto",           # level collapse + tiny global window
]


def main() -> None:
    _ensure_loaded()
    spark = get_spark("scale_probe")
    spark.range(1).count()
    # Warm relayout + codegen at every SF first so the timed pass is
    # steady-state execution, not ingest or JIT.
    for sf in SFS:
        for name in PROBES:
            try:
                REGISTRY[name].fn(spark, sf).write.format("noop").mode("overwrite").save()
            except Exception as e:
                print(f"# warmup {name}@{sf}: {e}")
    rows = []
    for name in PROBES:
        times = []
        for sf in SFS:
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                REGISTRY[name].fn(spark, sf).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            times.append(best)
        r1 = times[1] / times[0]
        r2 = times[2] / times[1]
        rows.append((name, *times, r1, r2))
        print(
            f"| `{name}` | {times[0]:.2f} | {times[1]:.2f} | {times[2]:.2f} "
            f"| {r1:.1f}× | {r2:.1f}× |",
            flush=True,
        )
    worst = max(r[5] for r in rows)
    print(f"# worst 0.01→0.1 (10× data) cost ratio: {worst:.1f}×")


if __name__ == "__main__":
    main()
