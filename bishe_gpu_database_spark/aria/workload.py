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
) -> DataFrame:
    """One transaction batch in exploded per-op form (FIXTURES.md ycsb_ops):
    tid, seq, k, is_update, new_f0…new_f9 (staged write value, pre-drawn so
    retries re-stage the same bytes)."""
    txns = spark.range(1, n_txns + 1, 1, _parts(spark, n_txns * max_ops)).select(
        F.col("id").alias("tid")
    )
    op_count = _h48(F.lit(seed), F.lit("cnt"), F.col("tid")) % (max_ops + 1)
    ops = (
        txns.withColumn("seq", F.explode(F.sequence(F.lit(0), op_count.cast("int") - 1)))
    )
    key = _h48(F.lit(seed), F.lit("key"), F.col("tid"), F.col("seq")) % n_keys + 1
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
