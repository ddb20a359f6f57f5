"""r5 verdict item 3: break the foreachBatch ingest floor into parts.

BENCH_r05/r06 show ~22 txn/s through the streaming drain vs ~68-83 txn/s
for the identical run_batch() called directly — 13.7s for a 2x150-txn
availableNow drain, ~3.9s/trigger of unexplained overhead. This script
times each component in one session:

  a. run_batch() direct (the batch-mode figure, for reference)
  b. inside-process() time per trigger: isEmpty / run_batch /
     eager localCheckpoint of the carried state
  c. whole-stream wall time (availableNow start -> awaitTermination)
  d. an EMPTY-pipeline stream (foreachBatch body = pass) over the same
     two files — the pure Structured-Streaming trigger machinery floor
  e. the SHIPPED streams.aria_foreach_batch (r7 lazy state carry: the
     per-trigger eager pin was redundant with run_batch's own entry
     checkpoint and double-materialized the state)

First run's finding (r6, contended box — splits, not absolutes):
trigger machinery is ~0.5s/trigger (NOT the floor); run_batch inside
the stream costs the same as direct; the eager state pin was the
~1.5-2s/trigger overhead the r5 verdict asked to explain. r7: the
driver-sim drain fast path (engine.py:_drain_sim) then removed the
per-epoch job+plan-construction cost itself — the shipped 2x150-txn
drain measured 100-160 txn/s, and the SUSTAINED probe (f) held ~107
txn/s across 10 consecutive state-carrying triggers.

r8 (r7 verdict item 1): a per-step profile of the r7 path attributed
the remaining ~1s/trigger to per-trigger Spark JOBS — the full-table
re-materialization (~0.5-0.6s), tail key-existence probes (~0.35s when
any never-seen key appeared), and separate tid/count/sim collects —
against a ~0.22s/trigger noop trigger-machinery floor. The shipped
driver now carries engine.StreamDrainState (LSM-memtable shape: base
checkpointed once, ONE bounded batch collect per trigger, schedule AND
install winners in Python, driver memtable flushed at a threshold,
whole-key-set prefetch for small tables): the same sustained probe
measures 531 txn/s on a quiet box (~356 contended; 0.28 s/trigger vs
the 0.22 s noop floor — repo overhead ~0.06 s/trigger) — the section (b)/(c)
instrumentation below keeps the r7-era eager-checkpoint shape
deliberately, as the baseline the shipped path is compared against.

Run: PYTHONPATH=/root/repo python scripts/foreachbatch_breakdown.py
"""

from __future__ import annotations

import json
import shutil
import tempfile
import time

from bishe_gpu_database_spark.aria.engine import run_batch
from bishe_gpu_database_spark.aria.workload import gen_kv, gen_ops
from bishe_gpu_database_spark.session import get_spark


def main() -> None:
    spark = get_spark("foreachbatch_breakdown")
    spark.range(1).count()
    kv = gen_kv(spark, n_keys=2000)
    d = tempfile.mkdtemp(prefix="fb_breakdown_")
    out: dict = {}
    try:
        batches = []
        for i in range(2):
            ops = gen_ops(
                spark, n_txns=150, max_ops=30, n_keys=2000, write_pct=40,
                seed=f"bench_mb{i}",
            )
            ops.coalesce(1).write.mode("overwrite").parquet(f"{d}/b{i}")
            batches.append(ops)
        schema = batches[0].schema

        # (a) direct run_batch on each batch's parquet-backed frame, warm.
        run_batch(kv, batches[0], reorder=True)  # warm codegen
        direct = []
        for i in range(2):
            ops = spark.read.schema(schema).parquet(f"{d}/b{i}")
            t0 = time.perf_counter()
            run_batch(kv, ops, reorder=True)
            direct.append(round(time.perf_counter() - t0, 3))
        out["direct_run_batch_sec"] = direct

        # (b+c) instrumented foreachBatch drain (same shape as
        # streams.aria_foreach_batch, with timers).
        state = {"kv": kv.localCheckpoint()}
        inner: list[dict] = []

        def process(batch_df, batch_id):
            t0 = time.perf_counter()
            if batch_df.isEmpty():
                return
            t1 = time.perf_counter()
            new_kv, stats = run_batch(state["kv"], batch_df, reorder=True)
            t2 = time.perf_counter()
            state["kv"] = new_kv.localCheckpoint(eager=True)
            t3 = time.perf_counter()
            inner.append(
                {
                    "batch_id": batch_id,
                    "is_empty_sec": round(t1 - t0, 3),
                    "run_batch_sec": round(t2 - t1, 3),
                    "state_checkpoint_sec": round(t3 - t2, 3),
                    "epochs": len(stats),
                }
            )

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/*")
        )
        t0 = time.perf_counter()
        q = stream.writeStream.foreachBatch(process).trigger(availableNow=True).start()
        q.awaitTermination()
        wall = time.perf_counter() - t0
        out["stream_wall_sec"] = round(wall, 3)
        out["inner"] = inner
        inner_total = sum(
            r["is_empty_sec"] + r["run_batch_sec"] + r["state_checkpoint_sec"]
            for r in inner
        )
        out["inner_total_sec"] = round(inner_total, 3)
        out["trigger_machinery_sec"] = round(wall - inner_total, 3)

        # (d) pure trigger floor: identical stream, no-op body.
        def noop(batch_df, batch_id):
            pass

        stream2 = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/*")
        )
        t0 = time.perf_counter()
        q2 = stream2.writeStream.foreachBatch(noop).trigger(availableNow=True).start()
        q2.awaitTermination()
        out["noop_stream_wall_sec"] = round(time.perf_counter() - t0, 3)

        # (e) the shipped driver with the r7 lazy state carry.
        from bishe_gpu_database_spark.streaming.streams import aria_foreach_batch

        stream3 = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/*")
        )
        t0 = time.perf_counter()
        _, log = aria_foreach_batch(spark, kv, stream3, reorder=True)
        shipped = time.perf_counter() - t0
        out["shipped_lazy_carry_sec"] = round(shipped, 3)
        out["shipped_txn_per_sec"] = round(150 * len(log) / shipped, 1)

        # (f) SUSTAINED ingest (r7): 10 x 150-txn files through the
        # shipped driver, state carried across all 10 triggers — pins
        # that throughput holds as the carried-state lineage and trigger
        # count grow (the lazy carry re-checkpoints per trigger, so
        # per-trigger cost must stay flat, not accumulate).
        for i in range(2, 10):
            gen_ops(
                spark, n_txns=150, max_ops=30, n_keys=2000, write_pct=40,
                seed=f"bench_mb{i}",
            ).coalesce(1).write.mode("overwrite").parquet(f"{d}/b{i}")
        stream4 = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/*")
        )
        t0 = time.perf_counter()
        _, log10 = aria_foreach_batch(spark, kv, stream4, reorder=True)
        sustained = time.perf_counter() - t0
        out["sustained_10x150"] = {
            "n_batches": len(log10),
            "wall_sec": round(sustained, 3),
            "txn_per_sec": round(150 * len(log10) / sustained, 1),
            "per_batch_epochs": [len(e["epochs"]) for e in log10],
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
