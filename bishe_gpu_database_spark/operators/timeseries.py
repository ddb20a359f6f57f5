"""Time-series operators over the ``events`` stream-shaped table:
hypertable-style multi-resolution rollups and gap filling.

These generalize the reference engine's epoch clock (its only notion of
time is the epoch counter driving the Execute/Commit loop,
src/database/ycsb/TransctionManager.cuh:115-185) into the continuous-
aggregate surface a timeseries store exposes. Both operators are pure
built-in expressions — the rollup is one Expand + hash aggregate, the
gap fill one sequence/explode plus a window — so they stay inside
whole-stage codegen and scale with the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bishe_gpu_database_spark.operators.relational import dec, t
from bishe_gpu_database_spark.registry import register


@register(
    "rollup_time_hierarchy",
    oracle="""
    SELECT event_type,
           CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY GROUPING SETS ((event_type), (event_type, day), (event_type, day, hour))
    """,
)
def rollup_time_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution continuous-aggregate rollup (hour → day → total
    per event type) in ONE pass: GROUPING SETS compiles to a single
    Expand + hash aggregate, so the fact scan happens once no matter how
    many resolutions are materialized. At 100 TB this is the hypertable
    pattern: coarse tiers are tiny and serve dashboards; the hour tier
    partitions by day for pruning."""
    e = t(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("DAY", "ts").cast("date").alias("day"),
        F.date_trunc("HOUR", "ts").alias("hour"),
        "value",
    )
    e.createOrReplaceTempView("ev_rollup")
    return spark.sql(
        """
        SELECT event_type, day, hour,
               count(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value
        FROM ev_rollup
        GROUP BY GROUPING SETS ((event_type), (event_type, day), (event_type, day, hour))
        """
    )


@register(
    "timeseries_gap_fill",
    oracle="""
    WITH hourly AS (
      SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
             count(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2
    ),
    spine AS (
      SELECT event_type, unnest(generate_series(hmin, hmax, INTERVAL 1 HOUR)) AS hour
      FROM (SELECT event_type, min(hour) AS hmin, max(hour) AS hmax
            FROM hourly GROUP BY 1)
    )
    SELECT s.event_type, s.hour,
           COALESCE(h.n_events, 0) AS n_events,
           (h.n_events IS NULL) AS gap_filled,
           last_value(h.sum_value IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried_sum
    FROM spine s LEFT JOIN hourly h
      ON s.event_type = h.event_type AND s.hour = h.hour
    """,
)
def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling with last-observation-carried-forward: build the dense
    hourly spine per event type (sequence + explode — no driver loop),
    left-join the observed hourly aggregate, and carry the last non-null
    value with an IGNORE NULLS running window. The spine is generated
    from each series' own min/max, so empty hours appear with
    n_events=0 and the carried value — the timeseries `locf(time_bucket_
    gapfill(...))` idiom. Scales as one join on (series, bucket): the
    spine is rows-per-series × hours, tiny next to the fact table."""
    e = t(spark, sf_dir, "events")
    hourly = (
        e.select("event_type", F.date_trunc("HOUR", "ts").alias("hour"), "value")
        .groupBy("event_type", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
    )
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("hour").alias("hmin"), F.max("hour").alias("hmax"))
        .select(
            "event_type",
            F.explode(
                F.sequence("hmin", "hmax", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.col("n_events").isNull().alias("gap_filled"),
            F.last("sum_value", ignorenulls=True).over(w).alias("carried_sum"),
        )
    )
