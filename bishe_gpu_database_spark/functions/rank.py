"""Scale-safe GLOBAL rank and prefix sums: partition-offset row_number.

A global ``row_number()/ntile()/sum() OVER (ORDER BY ...)`` plans
``Exchange SinglePartition`` + Sort — the entire input funnels through ONE
task, the canonical 100 TB scale-killer (the r3 verdict found three of
them; this helper is the shared fix, and the plan sweep now red-flags the
pattern). The scalable formulation is the one ``agg_ntile_scalable``
pioneered:

1. ``repartitionByRange`` + ``sortWithinPartitions`` on the sort key —
   Spark's distributed sort machinery (range boundaries from a
   driver-side sample);
2. (pid, local rank) decoded from ``monotonically_increasing_id()`` —
   zero extra operators: no Window node, no second sort, no re-exchange;
3. add per-partition offsets: a #partitions-row aggregate, collected to
   the driver (the same ~32-row footprint Spark's own range sampler
   ships) and broadcast back as a literal lookup.

Rank and prefix sums depend only on the TOTAL ORDER of the key columns,
not on where the sampled range boundaries land, so results are
deterministic and hash-gateable as long as the caller supplies a tie-free
key (every caller appends a unique id column). ``localCheckpoint`` pins
the sampled boundaries so the offsets and the local ranks observe the
SAME partitioning (exchange reuse is not guaranteed under
``spark.sql.exchange.reuse=false``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order: list[Column],
    *,
    rank_col: str = "rk",
    total_col: str | None = None,
    running: dict[str, str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a 1-based global ``rank_col`` (row_number over the total
    order given by ``order``) WITHOUT a single-partition exchange; plus,
    optionally, the grand total row count (``total_col``) and exact
    global RUNNING SUMS (``running``: {input column → output column},
    inclusive of the current row — the distributed prefix-sum).

    ``order`` must define a TOTAL order (include a unique tie-break
    column); each element may carry ``.asc()``/``.desc()``. All other
    columns of ``df`` are preserved.
    """
    running = running or {}
    if num_partitions is None:
        # One range partition per core by default — the offsets map stays
        # #cores-sized on the driver, and ranks are total-order-determined
        # so the partition count never affects results (only parallelism).
        num_partitions = max(
            32, df.sparkSession.sparkContext.defaultParallelism
        )
    # Range-partition on the sort key, sort INSIDE each partition, then
    # read (pid, local row index) straight out of
    # monotonically_increasing_id() — documented layout: partition id in
    # the upper 31 bits, a 0-based per-partition counter in the lower 33
    # (caps at 2^33 ≈ 8.6e9 rows per partition — three orders of
    # magnitude above a sane partition). This makes the WHOLE rank one
    # range shuffle: no Window, no per-partition sort node, and no
    # re-exchange after the checkpoint (a Window.partitionBy(pid) would
    # hash-shuffle the full input a second time, because the checkpointed
    # RDD does not advertise its partitioning to Catalyst).
    keyed = df.repartitionByRange(num_partitions, *order).sortWithinPartitions(*order)
    # The checkpoint pins BOTH nondeterminisms — the sampled range
    # boundaries and the id assignment — so the offsets job and every
    # downstream read observe one frozen layout.
    parts = keyed.withColumn("_gr_mid", F.monotonically_increasing_id()).localCheckpoint()
    pid = F.shiftright(F.col("_gr_mid"), 33).cast("int")
    local_rk = F.col("_gr_mid") % F.lit(1 << 33).cast("bigint")  # 0-based
    # #partitions rows on the driver — the same order of magnitude the
    # range sampler itself already collects; NOT a single-partition window.
    aggs = [F.count(F.lit(1)).alias("_cnt")] + [
        F.sum(src).alias(f"_sum_{src}") for src in running
    ]
    cnts = {
        r["_pid"]: r
        for r in parts.select(pid.alias("_pid"), *running).groupBy("_pid").agg(*aggs).collect()
    }
    total = sum(r["_cnt"] for r in cnts.values())
    # cumulative EXCLUSIVE offsets per partition, in pid order
    offsets: dict[int, tuple] = {}
    acc_cnt = 0
    acc_sums = {src: 0 for src in running}
    for p in sorted(cnts):
        offsets[p] = (acc_cnt, dict(acc_sums))
        acc_cnt += cnts[p]["_cnt"]
        for src in running:
            acc_sums[src] += cnts[p][f"_sum_{src}"] or 0

    def lookup(values: dict[int, int]) -> Column:
        if not values:
            return F.lit(0)
        pairs = [F.lit(x) for p in sorted(values) for x in (p, values[p])]
        return F.element_at(F.create_map(*pairs), pid)

    out = parts.withColumn(
        rank_col,
        (local_rk + 1 + lookup({p: o[0] for p, o in offsets.items()})).cast("bigint"),
    )
    if running:
        # Exact running sums still need the in-partition prefix (a window
        # PARTITIONED by pid — parallel, but it does re-exchange the
        # checkpointed rows by pid since the RDD's layout is opaque to
        # Catalyst). Callers use this on already-aggregated inputs
        # (vocab tables), where that exchange is metadata-sized.
        w = W.partitionBy(pid).orderBy("_gr_mid")
        wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
        for src, dst in running.items():
            out = out.withColumn(
                dst,
                F.sum(src).over(wrun)
                + lookup({p: o[1][src] for p, o in offsets.items()}),
            )
    if total_col is not None:
        out = out.withColumn(total_col, F.lit(total).cast("bigint"))
    return out.drop("_gr_mid")


def ntile_from_rank(rank_col: str, total_col: str, k: int) -> Column:
    """Exact SQL ``ntile(k)`` re-derived from a global (rank, n) pair:
    base = n div k buckets of equal size, the first n mod k buckets one
    row larger. Pure integer arithmetic; the WHEN guard keeps the
    base = 0 (n < k) branch division-free."""
    rk, n = rank_col, total_col
    return F.expr(
        f"""
        CASE WHEN {rk} <= ({n} % {k}) * ({n} DIV {k} + 1)
             THEN CAST(({rk} - 1) DIV ({n} DIV {k} + 1) + 1 AS INT)
             ELSE CAST(({n} % {k})
                       + (({rk} - ({n} % {k}) * ({n} DIV {k} + 1)) - 1)
                         DIV ({n} DIV {k}) + 1 AS INT)
        END
        """
    )
