"""Deterministic YCSB-shaped workload generation (FIXTURES.md §B).

Mirrors the reference's generators — keys U(1, keys_max), ops/txn
U(0, max_ops), P(write)=0.4, 10×10-char values
(ref: src/database/ycsb/Transction_y.h:17-26, src/cuda/kv.cuh:64-78,
defaults ref: src/database/common/Transction.h:24-33) — but derives every
draw from md5 of (seed, id) instead of RNG state, so the workload is
bit-identical regardless of partitioning, engine, or retry. This replaces
the reference's host `default_random_engine` + device `curandState`
(ref: src/database/common/random.h:8-20, src/cuda/cudarand.cuh:12-55).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_VALUE_FIELDS = 10  # ycsb::Value's char[10][10] (ref: src/cuda/kv.cuh:48-63)


def _parts(spark: SparkSession, n_rows: int, per_part: int = 512) -> int:
    """Partition count sized to the data: tiny batches (the reference's
    200-txn capacity, ref: src/database/ycsb/TransctionManager.cuh:15)
    plan a handful of tasks instead of one per core — per-epoch job
    latency is task overhead, not compute, at batch scale. Values are
    partition-invariant so this never affects results."""
    return max(1, min(spark.sparkContext.defaultParallelism, n_rows // per_part))


def _h48(*cols) -> F.Column:
    """48-bit deterministic hash of the concatenated inputs (portable)."""
    return F.conv(F.substring(F.md5(F.concat_ws("|", *cols)), 1, 12), 16, 10).cast("bigint")


def value_field(tag: F.Column, j: int) -> F.Column:
    """One 10-char printable field, deterministic in its tag."""
    return F.substring(F.md5(F.concat_ws("#", tag, F.lit(str(j)))), 1, 10)


def gen_kv(spark: SparkSession, n_keys: int, seed: str = "kv0") -> DataFrame:
    """The keyed table: k ∈ 1…n_keys (0 is the reference's tombstone,
    ref: src/cuda/hashTable.cuh:12), f0…f9 deterministic 10-char strings."""
    df = spark.range(1, n_keys + 1, 1, _parts(spark, n_keys)).select(
        F.col("id").alias("k")
    )
    tag = F.concat_ws("_", F.lit(seed), F.col("k"))
    return df.select(
        "k", *[value_field(tag, j).alias(f"f{j}") for j in range(N_VALUE_FIELDS)]
    )


def gen_ops(
    spark: SparkSession,
    n_txns: int = 150,
    max_ops: int = 30,
    n_keys: int = 20000,
    write_pct: int = 40,
    seed: str = "ops0",
    skew: bool = False,
) -> DataFrame:
    """One transaction batch in exploded per-op form (FIXTURES.md ycsb_ops):
    tid, seq, k, is_update, new_f0…new_f9 (staged write value, pre-drawn so
    retries re-stage the same bytes).

    ``skew=True`` draws keys power-law-hot instead of uniform — the
    contention axis of the real YCSB spec (zipfian request distribution)
    that the reference's generator omits (uniform only,
    ref: src/database/ycsb/Transction_y.h:21). The draw squares a
    uniform: k = ⌊n_keys · u²⌋ + 1 with u = h/2⁴⁸, computed in exact
    integer arithmetic (h² ⌊·⌋-divided by 2⁹⁶ in two 48-bit steps) so it
    stays deterministic and partition-invariant. Density ∝ 1/√k-shaped:
    a hot head (key 1 drawn ~100× the uniform rate at 20k keys) with a
    long tail — enough contention to multiply aborts without degenerating
    to a single key."""
    txns = spark.range(1, n_txns + 1, 1, _parts(spark, n_txns * max_ops)).select(
        F.col("id").alias("tid")
    )
    op_count = _h48(F.lit(seed), F.lit("cnt"), F.col("tid")) % (max_ops + 1)
    # The reference draws ops/txn U(0, max_ops) — zero-op transactions are
    # legal and trivially commit (ref: src/database/ycsb/
    # Transction_y.h:17-21). Spark's sequence(0, -1) infers step -1 and
    # yields [0, -1] (two phantom ops!), so the empty case must be
    # explicit: sequence under a WHEN, explode drops the empty array.
    ops = txns.withColumn(
        "seq",
        F.explode(
            F.when(
                op_count > 0, F.sequence(F.lit(0), op_count.cast("int") - 1)
            ).otherwise(F.array().cast("array<int>"))
        ),
    )
    h = _h48(F.lit(seed), F.lit("key"), F.col("tid"), F.col("seq"))
    if skew:
        # u² in exact integers: (h² · n_keys) / 2⁹⁶ staged as
        # ((h·h DIV 2⁴⁸) · n_keys) DIV 2⁴⁸ — every intermediate < 2⁶³
        # for n_keys ≤ 2¹⁵ after the first floor-divide. h < 2⁴⁸ ⇒
        # h·h needs 96 bits, so split h first: h = hi·2²⁴ + lo.
        hi = F.shiftright(h, 24)
        lo = h % F.lit(1 << 24)
        # h² DIV 2⁴⁸ = hi² + (2·hi·lo) DIV 2²⁴ (dropping lo²/2⁴⁸ < 1 can
        # undershoot the true floor by 1 — harmless for a workload
        # distribution, still deterministic). All pure int64 bit shifts:
        # every intermediate < 2⁶³ (usq < 2⁴⁸, n_keys ≤ 2¹⁵ assumed).
        usq = hi * hi + F.shiftright(2 * hi * lo, 24)
        key = F.shiftright(usq * F.lit(n_keys), 48) % n_keys + 1
    else:
        key = h % n_keys + 1
    is_upd = (_h48(F.lit(seed), F.lit("wr"), F.col("tid"), F.col("seq")) % 100) < write_pct
    ops = ops.select("tid", "seq", key.alias("k"), is_upd.alias("is_update"))
    wtag = F.concat_ws("_", F.lit(seed), F.lit("val"), F.col("tid"), F.col("seq"))
    return ops.select(
        "tid",
        "seq",
        "k",
        "is_update",
        *[
            F.when(F.col("is_update"), value_field(wtag, j)).alias(f"new_f{j}")
            for j in range(N_VALUE_FIELDS)
        ],
    )


def kv_checksum(kv: DataFrame) -> int:
    """Order-insensitive content hash of the table (sum of row hashes)."""
    row_hash = _h48(*[F.col(c).cast("string") for c in kv.columns])
    return kv.select(F.sum(row_hash).alias("cs")).collect()[0]["cs"] or 0
