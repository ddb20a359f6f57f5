"""SparkSession construction and fixture-table loading.

The reference holds its one table in a process-global registry
(ref: src/database/common/database.h:10-22); here the SparkSession catalog
plays that role and every fixture parquet becomes a named temp view.

Scale notes (local[32] is the test rig; design target is a 1000-executor
cluster on ~100 TB):
- AQE on: runtime shuffle-partition coalescing, skew-join splitting, and
  dynamic broadcast decisions replace any hand-tuned plan.
- ``spark.sql.shuffle.partitions`` is a *default*; at cluster scale it is
  overridden per-deploy (rule of thumb: 2-3x total cores, ~128 MB of
  shuffle data per partition).
- Timestamps pinned to UTC so results hash identically against the
  DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(app_name: str = "bishe_gpu_database_spark") -> SparkSession:
    """Build (or reuse) the session with scale-oriented defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Width override for cluster-shape testing: a 1000-executor deploy
    # plans 2000+ shuffle partitions, and results must not depend on the
    # partition count (the wide-parity sweep runs the full surface at
    # 200 to pin that).
    width = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", width)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # GPU path (the north-star deployment shape): when a RAPIDS Accelerator
    # jar is provided, register the plugin and let it claim whatever plan
    # nodes it supports — everything here is DataFrame/SQL-declarative, so
    # the same logical plans run columnar-on-GPU without code changes.
    # Off by default: this container has no GPU; correctness never depends
    # on it (the DuckDB oracle gates the CPU plans).
    rapids_jar = os.environ.get("SPARK_RAPIDS_PLUGIN_JAR", "")
    if rapids_jar:
        builder = (
            builder.config("spark.jars", rapids_jar)
            .config("spark.plugins", "com.nvidia.spark.SQLPlugin")
            .config("spark.rapids.sql.enabled", "true")
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture parquet in ``sf_dir`` and register temp views.

    Column pruning and predicate pushdown reach the parquet scan because
    the frames stay lazy — nothing is materialized here.
    """
    tables: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            df.createOrReplaceTempView(name)
            tables[name] = df
    return tables
