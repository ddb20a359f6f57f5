"""Custom Python DataSource (Spark 4 API): the reference's YCSB-shaped
table generator as a first-class Spark source.

The reference bulk-loads its table from an in-process random generator
(ref: src/database/ycsb/db.h:42-53, src/cuda/kv.cuh:64-78); here the same
shape is a pluggable ``spark.read.format("ycsb")`` source. Rows are
derived from md5 of (seed, key) — identical to aria.workload.gen_kv and
to plain ANSI SQL, so the source is both partition-invariant and
oracle-checkable.

Scale: partition planning is metadata-only (key ranges); each partition
generates its own rows executor-side — the same "every worker generates
its slice" pattern any synthetic-benchmark source (TPC-H dbgen, dsdgen)
uses on a cluster. No driver materialization, no shuffle.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from bishe_gpu_database_spark.aria.workload import N_VALUE_FIELDS

SCHEMA = "k bigint, " + ", ".join(f"f{j} string" for j in range(N_VALUE_FIELDS))


def _field(seed: str, k: int, j: int) -> str:
    """f_j = substr(md5('<seed>_<k>#<j>'), 1, 10) — the exact expression
    aria.workload.value_field computes JVM-side and the DuckDB oracle
    computes in SQL."""
    return hashlib.md5(f"{seed}_{k}#{j}".encode()).hexdigest()[:10]


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class YcsbReader(DataSourceReader):
    def __init__(self, options):
        self.n_keys = int(options.get("n_keys", 1000))
        self.seed = options.get("seed", "kv0")
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self):
        per = max(1, -(-self.n_keys // self.n_parts))
        return [
            _Range(lo, min(lo + per, self.n_keys + 1))
            for lo in range(1, self.n_keys + 1, per)
        ]

    def read(self, partition: _Range):
        for k in range(partition.start, partition.end):
            yield (k, *[_field(self.seed, k, j) for j in range(N_VALUE_FIELDS)])


class YcsbDataSource(DataSource):
    """``spark.read.format("ycsb").option("n_keys", …).option("seed", …)``
    — keys 1…n_keys (0 is the reference's tombstone,
    ref: src/cuda/hashTable.cuh:12) with 10 deterministic 10-char fields
    (ycsb::Value's char[10][10], ref: src/cuda/kv.cuh:48-63)."""

    @classmethod
    def name(cls) -> str:
        return "ycsb"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> YcsbReader:
        return YcsbReader(self.options)


# ---------------------------------------------------------------------------
# Streaming: deterministic transaction batches (the reference's
# generate→execute loop, ref: src/database/ycsb/db.h:60-66 + main.cu:48-57,
# as an unbounded source; each micro-batch is one Aria batch).
# ---------------------------------------------------------------------------

OPS_SCHEMA = (
    "tid int, seq int, k bigint, is_update boolean, "
    + ", ".join(f"new_f{j} string" for j in range(N_VALUE_FIELDS))
)


def _h48_int(*parts) -> int:
    return int(hashlib.md5("|".join(str(p) for p in parts).encode()).hexdigest()[:12], 16)


def txn_batch_rows(
    batch: int, n_txns: int, max_ops: int, n_keys: int, write_pct: int, seed: str
):
    """One deterministic batch of exploded transaction ops — same
    md5-derivation style as aria.workload.gen_ops, parameterized by the
    batch number so every micro-batch differs but replays identically."""
    rows = []
    bseed = f"{seed}_b{batch}"
    for tid in range(1, n_txns + 1):
        n_ops = _h48_int(bseed, "cnt", tid) % (max_ops + 1)
        for seq in range(n_ops):
            k = _h48_int(bseed, "key", tid, seq) % n_keys + 1
            is_upd = (_h48_int(bseed, "wr", tid, seq) % 100) < write_pct
            if is_upd:
                vals = [
                    hashlib.md5(f"{bseed}_val_{tid}_{seq}#{j}".encode()).hexdigest()[:10]
                    for j in range(N_VALUE_FIELDS)
                ]
            else:
                vals = [None] * N_VALUE_FIELDS
            rows.append((tid, seq, k, is_upd, *vals))
    return rows


class YcsbTxnStreamReader(SimpleDataSourceStreamReader):
    """SimpleDataSourceStreamReader: offset = batch number. Bounded by
    ``max_batches`` so availableNow drains cleanly; replay between
    offsets is exact (pure function of the batch number)."""

    def __init__(self, options):
        self.n_txns = int(options.get("n_txns", 20))
        self.max_ops = int(options.get("max_ops", 5))
        self.n_keys = int(options.get("n_keys", 100))
        self.write_pct = int(options.get("write_pct", 40))
        self.seed = options.get("seed", "txn0")
        self.max_batches = int(options.get("max_batches", 3))

    def initialOffset(self):
        return {"batch": 0}

    def read(self, start):
        b = start["batch"]
        if b >= self.max_batches:
            return iter([]), {"batch": b}
        rows = txn_batch_rows(
            b, self.n_txns, self.max_ops, self.n_keys, self.write_pct, self.seed
        )
        return iter(rows), {"batch": b + 1}

    def readBetweenOffsets(self, start, end):
        for b in range(start["batch"], end["batch"]):
            yield from txn_batch_rows(
                b, self.n_txns, self.max_ops, self.n_keys, self.write_pct, self.seed
            )

    def commit(self, end):
        pass


class YcsbTxnStreamDataSource(DataSource):
    """``spark.readStream.format("ycsb_txns")`` — unbounded deterministic
    transaction-batch source; one micro-batch per Aria batch."""

    @classmethod
    def name(cls) -> str:
        return "ycsb_txns"

    def schema(self) -> str:
        return OPS_SCHEMA

    def simpleStreamReader(self, schema) -> YcsbTxnStreamReader:
        return YcsbTxnStreamReader(self.options)
