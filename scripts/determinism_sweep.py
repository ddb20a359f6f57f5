"""Determinism sweep: run every registered query TWICE on the same
input and assert the normalized (column-sorted, row-sorted) result is
bit-identical across runs.

Rationale: the round driver's correctness gate value-hashes each result;
a query whose output varies run-to-run (unseeded randomness, time
dependence, nondeterministic tie-breaks surfacing through a LIMIT,
float summation-order drift crossing the 9-sig-digit format) would flake
the gate even though a single-run oracle comparison passes. This sweep
certifies the surface is replay-stable — the same property a 100 TB
job retry depends on (a recomputed lost partition must reproduce its
bytes, or downstream consumers see torn data).

Usage:
    PYTHONPATH=/root/repo python scripts/determinism_sweep.py [out.json] [name_filter ...]
"""

from __future__ import annotations

import json
import sys
import time

from bishe_gpu_database_spark.registry import REGISTRY, _ensure_loaded
from bishe_gpu_database_spark.session import get_spark
from tests.conftest import normalize_rows


def run_once(spark, sf_dir: str, name: str):
    df = REGISTRY[name].fn(spark, sf_dir)
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return normalize_rows(cols, rows)


def main() -> int:
    # Default WRITES the artifact (r8): two r8 sweeps ran green but left
    # DETERMINISM.json stale because the old default was print-only —
    # an unfiltered run is artifact-grade and must record itself; only
    # FILTERED runs (ad-hoc debugging) skip the write.
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    filters = sys.argv[2:]
    if out_path is None and not filters:
        out_path = "/root/repo/DETERMINISM.json"
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    _ensure_loaded()
    spark = get_spark("determinism-sweep")
    names = [
        n for n in sorted(REGISTRY) if not filters or any(f in n for f in filters)
    ]
    t0 = time.time()
    failures: dict[str, str] = {}
    for name in names:
        try:
            c1, r1 = run_once(spark, sf_dir, name)
            c2, r2 = run_once(spark, sf_dir, name)
        except Exception as e:  # noqa: BLE001 — sweep must see every failure
            failures[name] = f"err: {type(e).__name__}: {e}"
            print(f"FAIL {name}: {failures[name]}", flush=True)
            continue
        if c1 != c2:
            failures[name] = f"columns differ: {c1} vs {c2}"
        elif r1 != r2:
            diffs = [(a, b) for a, b in zip(r1, r2) if a != b][:2]
            failures[name] = (
                f"{len(r1)} vs {len(r2)} rows; first diffs {diffs}"
                if len(r1) != len(r2)
                else f"values differ; first diffs {diffs}"
            )
        if name in failures:
            print(f"FAIL {name}: {failures[name]}", flush=True)
        else:
            print(f"PASS {name}: {len(r1)} rows stable", flush=True)
    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(names),
        "n_stable": len(names) - len(failures),
        "n_fail": len(failures),
        "failures": failures,
        "wall_seconds": round(time.time() - t0, 1),
    }
    print(f"# determinism sweep: {json.dumps(summary['n_stable'])}/{len(names)}"
          f" stable, failures: {sorted(failures)}")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(summary, fh, indent=1)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
