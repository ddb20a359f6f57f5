"""Aria deterministic concurrency control as set-oriented DataFrame jobs.

Reference semantics reproduced (spec, not the C++ quirks — SURVEY.md §2.1):

- Execute: each transaction reads a snapshot of the table and stages its
  writes privately (ref: src/database/ycsb/TrancM_func.cuh:21-63). Missing
  keys are silently skipped (ref: TrancM_func.cuh:32-34). DataFrames are
  immutable, so "read the pre-epoch version" is automatic.
- Reserve: per-key read/write reservations where the smallest Tid wins the
  atomicCAS race (ref: src/cuda/metadatahelper.cuh:36-90). All races
  settled ≡ ``groupBy(k).agg(min(tid))`` — no atomics needed.
- Commit (dependency analysis): RAW iff some read key has a smaller
  writer; WAR iff some written key has a smaller reader; WAW iff some
  written key has a smaller writer (ref: TrancM_func.cuh:125-164).
- Install: plain Aria aborts on ``waw ∨ raw``
  (ref: TrancM_func.cuh:207-227); with deterministic reordering, on
  ``waw ∨ (raw ∧ war)`` (ref: TrancM_func.cuh:181-205). Committed writes
  overwrite the table; WAW-freedom guarantees at most one committed
  writer per key. Within a transaction, the last write (max seq) to a key
  wins — the ordered per-key replay of the reference's Key-Op-Chain
  (ref: src/database/ycsb/key_op_chain.cuh:161-189).
- Collect: aborted transactions are compacted, re-numbered 1…m, and
  retried next epoch (ref: src/database/ycsb/TransctionManager.cuh:165-185).
  Tid 1 always commits, so the batch drains in ≤ n epochs.

Scale: one epoch = two shuffles of the ops table (by k, then by tid) plus
one shuffle of the delta for install. The KV table itself co-partitions
on k across epochs; ``localCheckpoint`` truncates the iterative lineage
(the Spark analogue of the reference's per-epoch device↔host memcpy,
ref: src/cuda/hashTable.cuh:165-200).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


@dataclass
class AriaEpochResult:
    kv: DataFrame  # table after install
    verdicts: DataFrame  # tid, raw, war, waw, committed
    aborted_ops: DataFrame  # ops of aborted txns (same schema as input ops)


def analyze_dependencies(
    ops: DataFrame, kv: DataFrame, *, insert_missing: bool = False
) -> DataFrame:
    """Execute + Reserve + Commit: per-tid (raw, war, waw) flags.

    ``ops`` columns: tid, seq, k, is_update, new_* staged values.
    ``kv`` columns:  k, <value columns>.

    ``insert_missing=True`` is the reference's op-parallel Execute, which
    inserts absent keys on the fly instead of skipping the op
    (ref: src/database/ycsb/operation_parallel.cuh:72-83): every op then
    participates in reservation/dependency analysis.
    """
    # Execute: snapshot probe. Ops on missing keys are skipped (left join
    # + found filter) exactly like the reference's failed hash probe.
    if insert_missing:
        found = ops
    else:
        probed = ops.join(kv.select("k", F.lit(True).alias("_found")), "k", "left")
        found = probed.filter(F.col("_found").isNotNull())

    # Reserve: all settled CAS races at once. Every op reads; updates write
    # (read set append ref: TrancM_func.cuh:43-45, write set :55-57).
    res = found.groupBy("k").agg(
        F.min("tid").alias("rts"),
        F.min(F.when(F.col("is_update"), F.col("tid"))).alias("wts"),
    )

    # Commit: dependency flags. "A smaller Tid reserved it" ≡ min-over-key < my tid.
    joined = found.join(res, "k")
    return joined.groupBy("tid").agg(
        F.max(
            F.when(F.col("wts").isNotNull() & (F.col("wts") < F.col("tid")), True).otherwise(False)
        ).alias("raw"),
        F.max(
            F.when(F.col("is_update") & (F.col("rts") < F.col("tid")), True).otherwise(False)
        ).alias("war"),
        F.max(
            F.when(
                F.col("is_update") & F.col("wts").isNotNull() & (F.col("wts") < F.col("tid")),
                True,
            ).otherwise(False)
        ).alias("waw"),
    )


def aria_epoch(
    kv: DataFrame,
    ops: DataFrame,
    *,
    reorder: bool = True,
    insert_missing: bool = False,
) -> AriaEpochResult:
    """One Aria epoch: Execute → Commit → Install, returning the new table
    and per-transaction verdicts. Value columns are inferred from kv
    (everything but k); ops must carry matching ``new_<col>`` columns.
    ``insert_missing`` switches Execute to the reference's op-parallel
    insert-on-miss variant (see analyze_dependencies)."""
    value_cols = [c for c in kv.columns if c != "k"]

    flags = analyze_dependencies(ops, kv, insert_missing=insert_missing)
    abort_cond = (
        (F.col("waw") | (F.col("raw") & F.col("war")))
        if reorder
        else (F.col("waw") | F.col("raw"))
    )
    verdicts = flags.withColumn("committed", ~abort_cond)

    committed_tids = verdicts.filter(F.col("committed")).select("tid")

    # Install: staged writes of committed txns. WAW-freedom ⇒ one committed
    # writer per key; within it, last write (max seq) wins. The key must
    # exist in the snapshot (missing-key ops were skipped at Execute).
    writes = ops.filter(F.col("is_update")).join(
        F.broadcast(committed_tids), "tid", "left_semi"
    )
    if not insert_missing:
        # Only pre-existing keys are writable (missing-key ops skipped at
        # Execute); with insert_missing the write creates the key.
        writes = writes.join(kv.select("k"), "k", "left_semi")
    w = W.partitionBy("k").orderBy(F.col("tid").asc(), F.col("seq").desc())
    last_writes = (
        writes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("k", *[F.col(f"new_{c}").alias(c) for c in value_cols])
    )
    new_kv = kv.join(last_writes, "k", "left_anti").unionByName(last_writes)

    aborted_ops = ops.join(
        F.broadcast(verdicts.filter(~F.col("committed")).select("tid")), "tid", "left_semi"
    )
    return AriaEpochResult(kv=new_kv, verdicts=verdicts, aborted_ops=aborted_ops)


def run_batch(
    kv: DataFrame,
    ops: DataFrame,
    *,
    reorder: bool = True,
    insert_missing: bool = False,
    max_epochs: int = 64,
) -> tuple[DataFrame, list[dict]]:
    """Drain a batch: run epochs until no transaction remains, re-numbering
    aborted Tids densely 1…m each round (ref: TransctionManager.cuh:176-184,
    outer loop ref: src/database/ycsb/db.h:104-109).

    Returns (final kv DataFrame, per-epoch stats). ``localCheckpoint``
    truncates lineage each epoch so the plan doesn't grow with iterations.
    """
    value_cols = [c for c in kv.columns if c != "k"]
    stats: list[dict] = []
    ops = ops.localCheckpoint()
    kv = kv.localCheckpoint()
    n_txns = ops.select("tid").distinct().count()
    for epoch in range(1, max_epochs + 1):
        if n_txns == 0:
            break
        # Commit verdicts first, ONE job: flags are ≤ one row per in-flight
        # transaction (batch capacity, ref: TransctionManager.cuh:15), so
        # the Collect-phase compaction happens driver-side, like the
        # reference's host re-numbering (ref: TransctionManager.cuh:176-184).
        flags = analyze_dependencies(ops, kv, insert_missing=insert_missing)
        abort_cond = (
            (F.col("waw") | (F.col("raw") & F.col("war")))
            if reorder
            else (F.col("waw") | F.col("raw"))
        )
        verd = {r["tid"]: not r["abort"] for r in
                flags.withColumn("abort", abort_cond).select("tid", "abort").collect()}
        aborted_tids = sorted(tid for tid, committed in verd.items() if not committed)
        committed_tids = [t for t, c in verd.items() if c]
        n_aborted = len(aborted_tids)

        # Install from the LITERAL committed-tid list — the verdict subtree
        # (two shuffles) is not recomputed for the table materialization.
        writes = ops.filter(F.col("is_update") & F.col("tid").isin(committed_tids))
        if not insert_missing:
            writes = writes.join(kv.select("k"), "k", "left_semi")
        w = W.partitionBy("k").orderBy(F.col("tid").asc(), F.col("seq").desc())
        last_writes = (
            writes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("k", *[F.col(f"new_{c}").alias(c) for c in value_cols])
        )
        kv = kv.join(last_writes, "k", "left_anti").unionByName(last_writes)

        stats.append(
            {
                "epoch": epoch,
                "n_txns": n_txns,
                "n_committed": n_txns - n_aborted,
                "n_aborted": n_aborted,
            }
        )
        if n_aborted == 0:
            break
        # More epochs coming: materialize the installed table so the next
        # epoch's snapshot probe reads a flat relation (lineage truncation,
        # the analogue of the reference's per-epoch device↔host memcpy).
        # On the final epoch the lazy plan is returned as-is — the caller
        # pays one evaluation, not an extra checkpoint job.
        kv = kv.localCheckpoint()
        renum = {old: i + 1 for i, old in enumerate(aborted_tids)}
        renum_col = F.element_at(
            F.create_map(*[F.lit(x) for kvp in renum.items() for x in kvp]),
            F.col("tid"),
        )
        # The remap column is a literal-map lookup; checkpointing here
        # truncates both the lineage and the nested remap expression —
        # without it each epoch re-evaluates every prior epoch's
        # element_at(create_map(...)) per row (measured ~20% slower).
        ops = (
            ops.filter(F.col("tid").isin(aborted_tids))
            .withColumn("tid", renum_col)
            .localCheckpoint()
        )
        n_txns = n_aborted
    return kv, stats
