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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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
