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
    # Execute: snapshot probe. Ops on missing keys are skipped exactly like
    # the reference's failed hash probe. Join direction is the scale
    # contract: the TABLE is the unbounded side (100 TB design point) while
    # the ops batch is capacity-bounded (ref: TransctionManager.cuh:15), so
    # the batch is broadcast and the table streams — no table-sized shuffle,
    # and the epoch loop (which runs this with AQE off) can never fall back
    # to a sort-merge join of the whole key set. kv keys are unique (it is
    # the keyed table), so the inner join returns each found op once.
    if insert_missing:
        # NULL keys can slip in from caller-constructed ops; the probe
        # branch drops them via the equi-join, and the reference has no
        # NULL key either — keep both branches' semantics identical
        # (the per-key window below would otherwise group all NULLs
        # into one phantom key and conflict them against each other).
        found = ops.filter(F.col("k").isNotNull())
    else:
        found = kv.select("k").join(F.broadcast(ops), "k", "inner")

    # Reserve: all settled CAS races at once. Every op reads; updates write
    # (read set append ref: TrancM_func.cuh:43-45, write set :55-57).
    # Per-key minima as unbounded window aggregates over ONE shuffle on k —
    # the groupBy(k)+re-join formulation costs a second pass over the same
    # shuffle; the epoch loop runs this every epoch, so stage count is the
    # latency budget (batches are capacity-bounded, never large).
    wk = W.partitionBy("k")
    joined = found.withColumn("rts", F.min("tid").over(wk)).withColumn(
        "wts", F.min(F.when(F.col("is_update"), F.col("tid"))).over(wk)
    )

    # Commit: dependency flags. "A smaller Tid reserved it" ≡ min-over-key < my tid.
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
        # Execute); with insert_missing the write creates the key. Same
        # broadcast direction as the probe: stream the table, broadcast
        # the bounded batch.
        writes = kv.select("k").join(F.broadcast(writes), "k", "inner")
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

    Per-epoch cost is proportional to the BATCH, never the table: the
    snapshot probe in analyze_dependencies reads only key EXISTENCE, and
    (without insert_missing) the committed writes can never create or
    drop a key — so the probe side is the base key set, constant across
    epochs, and the install maintains a small latest-value DELTA —
    accumulated LAZILY (installs cost zero jobs during the drain) and
    checkpointed every few epochs only to bound plan depth — that is
    merged over the base table exactly once at the end.
    The reference, by contrast, round-trips the WHOLE table through the
    GPU every epoch (ref: src/database/ycsb/db.h:111-125) — the delta
    formulation is what survives a 100 TB table: epoch cost = two
    shuffles of the ops batch + a delta-sized merge, table size only
    paid on the final snapshot read.
    """
    value_cols = [c for c in kv.columns if c != "k"]
    ops0 = ops.localCheckpoint()
    base = kv.localCheckpoint()
    # Size the drain's exchanges to the BATCH, not the cluster: capacity is
    # bounded (the reference caps in-flight txns at 200, ref:
    # TransctionManager.cuh:15), so the per-epoch flags job moves a few
    # thousand op rows — at the session default (one shuffle partition per
    # core) epoch latency is pure task-scheduling overhead. ~512 rows per
    # partition keeps a giant batch parallel while a reference-sized one
    # plans a handful of tasks. Restored after the loop so the final
    # table-sized merge (and every other query on the session) still plans
    # at cluster width; shuffle.partitions is read at action time, and the
    # returned merged plan is evaluated by the caller after restore.
    spark = ops0.sparkSession
    n_op_rows = ops0.count()
    drain_parts = max(1, min(spark.sparkContext.defaultParallelism, n_op_rows // 4096))
    # AQE's per-stage re-planning is pure latency once the exchanges are
    # already batch-sized (~0.5 s/epoch on local[32]); off for the loop,
    # restored for the table-sized final merge where coalescing/skew
    # handling earn their keep.
    drain_conf = {
        "spark.sql.shuffle.partitions": str(drain_parts),
        "spark.sql.adaptive.enabled": "false",
    }
    saved_conf = {k: spark.conf.get(k) for k in drain_conf}
    # Key existence is all Execute's probe needs, and it is invariant:
    # updates overwrite existing keys only (missing-key ops are skipped,
    # ref: TrancM_func.cuh:32-34). With insert_missing, analyze_
    # dependencies ignores the table entirely (every op participates).
    base_keys = base.select("k")
    # Collect-phase bookkeeping lives on the driver (the reference's host
    # compaction, ref: TransctionManager.cuh:176-184): ``cur`` maps each
    # still-aborted ORIGINAL tid to its dense re-numbered tid for the next
    # epoch. Each epoch's ops view is then ops0 + one literal-map remap —
    # never a chain of per-epoch rewrites, so no per-epoch ops job exists.
    cur = {r[0]: r[0] for r in ops0.select("tid").distinct().collect()}
    for k_, v_ in drain_conf.items():
        spark.conf.set(k_, v_)
    try:
        stats, delta = _drain_loop(
            ops0,
            base_keys,
            value_cols,
            cur,
            reorder=reorder,
            insert_missing=insert_missing,
            max_epochs=max_epochs,
        )
    finally:
        for k_, v_ in saved_conf.items():
            spark.conf.set(k_, v_)
    if delta is None:
        return base, stats
    return base.join(delta, "k", "left_anti").unionByName(delta), stats


def _drain_loop(
    ops0: DataFrame,
    base_keys: DataFrame,
    value_cols: list[str],
    cur: dict,
    *,
    reorder: bool,
    insert_missing: bool,
    max_epochs: int,
) -> tuple[list[dict], DataFrame | None]:
    """The epoch loop proper (see run_batch). Runs with batch-sized
    shuffle partitions; returns (per-epoch stats, lazy install delta)."""
    stats: list[dict] = []
    delta: DataFrame | None = None
    for epoch in range(1, max_epochs + 1):
        if not cur:
            break
        n_txns = len(cur)
        if epoch == 1:
            ops_e = ops0  # identity remap
        else:
            remap_col = F.element_at(
                F.create_map(*[F.lit(x) for kvp in cur.items() for x in kvp]),
                F.col("tid"),
            )
            ops_e = ops0.filter(F.col("tid").isin(list(cur.keys()))).withColumn(
                "tid", remap_col
            )
        # Commit verdicts, the epoch's ONE job: flags are ≤ one row per
        # in-flight transaction (batch capacity, ref:
        # TransctionManager.cuh:15), collected to the driver.
        flags = analyze_dependencies(ops_e, base_keys, insert_missing=insert_missing)
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
        # Everything below stays LAZY: the delta is only ever read by the
        # final merged plan (or by the next epoch's anti-join, itself lazy),
        # so installs cost zero jobs during the drain.
        writes = ops_e.filter(F.col("is_update") & F.col("tid").isin(committed_tids))
        if not insert_missing:
            # Stream the table-sized key set, broadcast the bounded batch
            # (same direction as the Execute probe).
            writes = base_keys.join(F.broadcast(writes), "k", "inner")
        w = W.partitionBy("k").orderBy(F.col("tid").asc(), F.col("seq").desc())
        last_writes = (
            writes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("k", *[F.col(f"new_{c}").alias(c) for c in value_cols])
        )
        # Delta merge: this epoch's committed writes overwrite any earlier
        # epoch's version of the same key (newest epoch wins). Depth grows
        # one union per epoch over the checkpointed ops0 — bounded by the
        # drain length, evaluated once.
        if delta is None:
            delta = last_writes
        else:
            delta = last_writes.unionByName(
                delta.join(last_writes.select("k"), "k", "left_anti")
            )

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
        # Bound the lazy delta's plan depth: one union+anti-join subtree
        # accrues per epoch, so flatten every 8 epochs (a drain runs up
        # to max_epochs=64; unbounded nesting would hand the caller a
        # 64-deep plan whose first evaluation replays every install).
        if epoch % 8 == 0:
            delta = delta.localCheckpoint()
        rank = {old: i + 1 for i, old in enumerate(aborted_tids)}
        cur = {orig: rank[c] for orig, c in cur.items() if c in rank}
    return stats, delta
