"""The reference's literal KV-table operator surface, Spark-first.

SURVEY.md §2.1 rows #1-#7: point lookup, batched probe, insert
(upsert-on-empty), update, delete, full scan, and "rehash" — each a
DataFrame operation over a keyed table:

- point/batch probe  ≡ HashTable::contain linear-probe search
  (ref: src/cuda/hashTable.cuh:94-110) → filter / broadcast-hash join
- insert/upsert      ≡ HashTable::insert probe-to-empty + copy
  (ref: src/cuda/hashTable.cuh:120-154) → anti-join + union
- update             ≡ the (stubbed) Table::update, realized through the
  install path (ref: src/database/common/table.cuh:97-99) → MERGE-shaped
  join + coalesce
- delete             ≡ the (stubbed) HashTable::_delete
  (ref: src/cuda/hashTable.cuh:112-114) → anti-join
- full scan          ≡ show_all_table / kernel_show_table
  (ref: src/cuda/hashTable.cuh:202-206, TrancM_func.cuh:10-18) → select
- rehash/resize      ≡ reshape_on_host parallel re-insert
  (ref: src/cuda/hashTable.cuh:208-242) → repartition(n, k): placement
  is the shuffle hash, the atomicAdd row counter is count()

The registered queries exercise each against a KV view of the fixture
tables so every row of the §2.1 inventory is oracle-checked.

Scale: the KV table hash-partitions on k; probes of small key sets
broadcast (no shuffle of the table); upsert/delete shuffle only the
delta when the table is bucketed by k on storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bishe_gpu_database_spark.operators.relational import t
from bishe_gpu_database_spark.registry import register


class KVTable:
    """A keyed mutable table as an immutable DataFrame + functional
    mutations (each returns the successor table, like the reference's
    per-epoch table versions)."""

    def __init__(self, df: DataFrame, key: str = "k"):
        self.df = df
        self.key = key

    # -- reads ------------------------------------------------------------
    def point_lookup(self, key_value) -> DataFrame:
        """#1: single-key probe (partition-prunable filter)."""
        return self.df.filter(F.col(self.key) == F.lit(key_value))

    def batch_probe(self, keys: DataFrame, how: str = "inner") -> DataFrame:
        """#1 batched: probe a key set — broadcast-hash join when the probe
        side is small (the GPU per-thread probe, one task per partition)."""
        return self.df.join(F.broadcast(keys), self.key, how)

    def scan(self, *cols: str) -> DataFrame:
        """#6: full scan (narrow, no shuffle)."""
        return self.df.select(*(cols or self.df.columns))

    def count(self) -> int:
        """#22: diagnostics row count (the atomicAdd counter)."""
        return self.df.count()

    # -- writes (functional) ----------------------------------------------
    def upsert(self, rows: DataFrame) -> "KVTable":
        """#3: insert-or-replace; new rows win on key collision."""
        kept = self.df.join(rows.select(self.key), self.key, "left_anti")
        return KVTable(kept.unionByName(rows), self.key)

    def insert_if_absent(self, rows: DataFrame) -> "KVTable":
        """#3 strict insert-on-empty: existing keys keep their row."""
        fresh = rows.join(self.df.select(self.key), self.key, "left_anti")
        return KVTable(self.df.unionByName(fresh), self.key)

    def update_merge(self, updates: DataFrame, value_cols: list[str]) -> "KVTable":
        """#4: MERGE-update matching keys; non-matching update rows are
        dropped (the reference's update requires presence)."""
        upd = updates.select(
            self.key, *[F.col(c).alias(f"_new_{c}") for c in value_cols]
        )
        merged = self.df.join(upd, self.key, "left")
        out = merged.select(
            self.key,
            *[
                F.coalesce(F.col(f"_new_{c}"), F.col(c)).alias(c)
                for c in value_cols
            ],
            *[c for c in self.df.columns if c != self.key and c not in value_cols],
        )
        return KVTable(out.select(*self.df.columns), self.key)

    def delete(self, keys: DataFrame) -> "KVTable":
        """#5: delete-by-key (anti-join)."""
        return KVTable(self.df.join(keys.select(self.key), self.key, "left_anti"), self.key)

    def rehash(self, n_partitions: int) -> "KVTable":
        """#7: re-place every row by key hash — repartition(n, k)."""
        return KVTable(self.df.repartition(n_partitions, self.key), self.key)


def _customer_kv(spark: SparkSession, sf_dir: str) -> KVTable:
    c = t(spark, sf_dir, "customer")
    return KVTable(
        c.select(
            F.col("c_custkey").alias("k"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("acctbal"),
            F.col("c_mktsegment").alias("segment"),
        )
    )


@register(
    "kv_point_lookup",
    oracle="""
    SELECT c_custkey AS k, c_name AS name, c_acctbal AS acctbal, c_mktsegment AS segment
    FROM customer WHERE c_custkey = 42
    """,
)
def kv_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.1 #1: point probe."""
    return _customer_kv(spark, sf_dir).point_lookup(42)


@register(
    "kv_batch_probe",
    oracle="""
    SELECT c.c_custkey AS k, c.c_mktsegment AS segment, count(*) AS n_hits
    FROM customer c
    JOIN (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 280000) p
      ON c.c_custkey = p.o_custkey
    GROUP BY 1, 2
    """,
)
def kv_batch_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.1 #1 batched + #9's Execute probe shape: ops⋈table broadcast
    hash join (probe side = high-value order custkeys)."""
    kv = _customer_kv(spark, sf_dir)
    probes = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 280000)
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    return kv.batch_probe(probes).groupBy("k", "segment").agg(F.count(F.lit(1)).alias("n_hits"))


@register(
    "kv_upsert",
    oracle="""
    WITH delta AS (
      SELECT s_suppkey AS k, s_name AS name, s_acctbal AS acctbal, 'SUPPLIER' AS segment
      FROM supplier
    ),
    merged AS (
      SELECT c_custkey AS k, c_name AS name, c_acctbal AS acctbal, c_mktsegment AS segment
      FROM customer WHERE c_custkey NOT IN (SELECT k FROM delta)
      UNION ALL
      SELECT * FROM delta
    )
    SELECT segment, count(*) AS n_rows,
           CAST(SUM(CAST(acctbal AS DECIMAL(12,4))) AS DOUBLE) AS sum_bal
    FROM merged GROUP BY segment
    """,
)
def kv_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.1 #3: upsert — supplier rows replace customer rows on key
    collision; checked via the post-image aggregate."""
    kv = _customer_kv(spark, sf_dir)
    delta = t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("k"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("SUPPLIER").alias("segment"),
    )
    out = kv.upsert(delta)
    return out.df.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("acctbal").cast("decimal(12,4)")).cast("double").alias("sum_bal"),
    )


@register(
    "kv_update_merge",
    oracle="""
    SELECT c_custkey AS k,
           CAST(CASE WHEN c_custkey % 10 = 0
                     THEN CAST(c_acctbal AS DECIMAL(12,4)) * CAST(1.1 AS DECIMAL(6,4))
                     ELSE CAST(c_acctbal AS DECIMAL(12,4)) END AS DOUBLE) AS acctbal
    FROM customer
    """,
)
def kv_update_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.1 #4: MERGE-update — +10%% balance for every 10th key; untouched
    keys keep their value (coalesce path)."""
    kv = _customer_kv(spark, sf_dir)
    updates = (
        kv.df.filter(F.col("k") % 10 == 0)
        .select(
            "k",
            (F.col("acctbal").cast("decimal(12,4)") * F.lit(1.1).cast("decimal(6,4)"))
            .cast("double")
            .alias("acctbal"),
        )
    )
    out = kv.update_merge(updates, ["acctbal"])
    return out.df.select(
        "k",
        F.when(F.col("k") % 10 == 0, F.col("acctbal"))
        .otherwise(F.col("acctbal").cast("decimal(12,4)").cast("double"))
        .alias("acctbal"),
    )


@register(
    "kv_delete",
    oracle="""
    SELECT count(*) AS n_remaining,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))) AS DOUBLE) AS sum_bal
    FROM customer
    WHERE c_custkey NOT IN (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
)
def kv_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.1 #5: delete-by-key-set (every customer with a finished order)."""
    kv = _customer_kv(spark, sf_dir)
    doomed = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    out = kv.delete(doomed)
    return out.df.agg(
        F.count(F.lit(1)).alias("n_remaining"),
        F.sum(F.col("acctbal").cast("decimal(12,4)")).cast("double").alias("sum_bal"),
    )


@register(
    "kv_full_scan",
    oracle="""
    SELECT c_custkey AS k, c_mktsegment AS segment FROM customer
    """,
)
def kv_full_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.1 #6: full scan with projection (column-pruned at the source)."""
    return _customer_kv(spark, sf_dir).scan("k", "segment")


@register(
    "kv_insert_if_absent",
    oracle="""
    SELECT count(*) AS n_rows
    FROM (
      SELECT c_custkey AS k FROM customer
      UNION ALL
      SELECT s_suppkey + 100000 AS k FROM supplier
      WHERE s_suppkey + 100000 NOT IN (SELECT c_custkey FROM customer)
    )
    """,
)
def kv_insert_if_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.1 #3 strict probe-to-empty insert: offset supplier keys are all
    absent → all inserted; existing rows never replaced."""
    kv = _customer_kv(spark, sf_dir)
    fresh = t(spark, sf_dir, "supplier").select(
        (F.col("s_suppkey") + 100000).alias("k"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("SUPPLIER").alias("segment"),
    )
    out = kv.insert_if_absent(fresh)
    return out.df.agg(F.count(F.lit(1)).alias("n_rows"))


@register(
    "kv_rehash_scan",
    oracle="""
    SELECT c_mktsegment AS segment, count(*) AS n_rows
    FROM customer GROUP BY c_mktsegment
    """,
)
def kv_rehash_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.1 #7: rehash/resize — repartition(n, k) re-places every row by
    key hash exactly like the reference's parallel re-insert kernel
    (ref: src/cuda/hashTable.cuh:208-242); the post-rehash aggregate
    verifies no row was lost or duplicated (the kernel's atomicAdd row
    counter, ref: src/cuda/hashTable_gpuFunc.cuh:11)."""
    kv = _customer_kv(spark, sf_dir).rehash(16)
    return kv.df.groupBy(F.col("segment")).agg(F.count(F.lit(1)).alias("n_rows"))
