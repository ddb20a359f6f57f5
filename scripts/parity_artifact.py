"""Full-surface parity artifact: run EVERY registered query against its
DuckDB oracle at sf0.01 (the driver's correctness-gate scale) and write
PARITY.json with per-query rows/schema/hash booleans — the committed
evidence that the whole registered surface is green, beyond the driver's
50-query per-round sample.

Run: PYTHONPATH=/root/repo python scripts/parity_artifact.py
"""

from __future__ import annotations

import json
import os
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
    # A PLAIN session, mirroring the verify driver's own (no tuned configs)
    # — note a plain session already plans shuffles at Spark's default 200
    # partitions, so every committed PARITY run is width-200 evidence.
    # SPARK_GRAFT_SHUFFLE_PARTITIONS widens it further (the wide-parity
    # sweep runs the full surface at 2000 — the 1000-executor rule-of-
    # thumb width — to pin that no result depends on partition count).
    width = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
    builder = (
        SparkSession.builder.master("local[8]")
        .appName("parity-artifact")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    if width:
        builder = builder.config("spark.sql.shuffle.partitions", width)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    skipped_width_pinned: list[str] = []
    t_start = time.time()
    for name, spec in sorted(REGISTRY.items()):
        # Stateful STREAMING width is a deploy-time parameter by design:
        # Spark persists spark.sql.shuffle.partitions into a stateful
        # query's checkpoint (state store count == partition count, and
        # state cannot be repartitioned later), so a 2000-wide override
        # would spin up 2000 state-store instances per stateful operator
        # on this 8-core box — hours of per-task store open/commit
        # overhead measuring a deployment mistake, not the engine. The
        # wide sweep pins BATCH width-independence; the streaming
        # runtimes are recorded as width-pinned-by-design. The runtime
        # side of the same contract is enforced at startup by
        # streams.assert_checkpoint_width (r8): resuming a stateful
        # checkpoint under a different session width fails loudly with
        # remediation instead of silently keeping the old width.
        if width and name.startswith("stream_runtime_"):
            skipped_width_pinned.append(name)
            print(f"SKIP [width-pinned stateful streaming] {name}", flush=True)
            continue
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
    if width:
        summary["shuffle_partitions"] = int(width)
        summary["skipped_width_pinned_streaming"] = skipped_width_pinned
    with open(out_path, "w") as f:
        json.dump({"summary": summary, "queries": results}, f, indent=1, default=str)
    print(json.dumps(summary), flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
