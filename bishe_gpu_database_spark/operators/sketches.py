"""Sketch-accelerated exact queries: Bloom-filter join pre-filtering and
count-min-sketch heavy-hitter detection, plus a log2 value histogram.

The pattern both sketches share is the one that matters at 100 TB: a
fixed-size, mergeable summary (512 bitmap words / 1024 counters) is built
with one bounded shuffle, broadcast back, and used as a MAP-SIDE filter so
the expensive exact pass only ever touches rows the sketch could not rule
out. Sketches here are never the answer — they are admission control for
the exact computation, so every query below is bit-exact and hash-gated
against a plain-SQL DuckDB oracle (the oracle never sees the sketch).

The reference has no sketch machinery; its closest structure is the
open-addressing hash placement (ref: src/cuda/hashTable.cuh:24-28,
`hashKey`), which is the same "key → bounded cell" idea these sketches
generalize. Driver-mandated analytics surface (SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bishe_gpu_database_spark.operators.relational import dec, dsum, t
from bishe_gpu_database_spark.registry import register

_BLOOM_BITS = 1 << 15  # 32768 bits = 512 x 64-bit words


def _bloom_pos(key, seed: int) -> F.Column:
    """Deterministic bit position in [0, _BLOOM_BITS) for one hash seed.
    Only Spark ever evaluates this (the oracle is sketch-free), so the
    engine-native xxhash64 is fine — it is partition- and order-invariant."""
    return F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(_BLOOM_BITS))


@register(
    "join_bloom_prefilter",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE)
             AS urgent_revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY l_returnflag
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter–pre-filtered fact⋈dim join: the filtered dim keys are
    folded into a 32k-bit Bloom filter held as ≤512 (word, bits) rows —
    built with one bounded shuffle (`bit_or` merge is associative, so the
    partial aggregation combines map-side) — and the fact table probes the
    broadcast filter with two hash functions BEFORE the exact join. Rows
    failing either bit test never reach the join shuffle; Bloom filters
    have no false negatives, so the surviving exact join returns exactly
    the plain-join answer (which is what the oracle computes). This is
    Spark's runtime row-level bloom pruning (spark.sql.optimizer.runtime.
    bloomFilter) made explicit and deterministic: at 100 TB the fact
    shuffle shrinks by the dim's selectivity for the cost of one broadcast
    of 4 KB. Precedent: same shape as agg_bitmap_distinct's bitmap-segment
    shuffle."""
    li = t(spark, sf_dir, "lineitem")
    dim = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    # Build: explode each key to its 2 bit positions, OR-merge per word.
    positions = dim.select(
        F.explode(
            F.array(_bloom_pos(F.col("o_orderkey"), 1), _bloom_pos(F.col("o_orderkey"), 2))
        ).alias("pos")
    )
    words = positions.groupBy((F.col("pos") / 64).cast("int").alias("word")).agg(
        F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))")).alias(
            "bits"
        )
    )
    # Probe: two broadcast lookups + bit tests, all map-side on the fact.
    probed = li.withColumn("_p1", _bloom_pos(F.col("l_orderkey"), 1)).withColumn(
        "_p2", _bloom_pos(F.col("l_orderkey"), 2)
    )
    w1 = words.select(F.col("word").alias("_w1"), F.col("bits").alias("_b1"))
    w2 = words.select(F.col("word").alias("_w2"), F.col("bits").alias("_b2"))
    candidates = (
        probed.join(F.broadcast(w1), (F.col("_p1") / 64).cast("int") == F.col("_w1"))
        .join(F.broadcast(w2), (F.col("_p2") / 64).cast("int") == F.col("_w2"))
        .filter(
            (
                F.expr("shiftright(_b1, CAST(pmod(_p1, 64) AS INT))").bitwiseAND(F.lit(1))
                == 1
            )
            & (
                F.expr("shiftright(_b2, CAST(pmod(_p2, 64) AS INT))").bitwiseAND(F.lit(1))
                == 1
            )
        )
    )
    # Exact join on the survivors only; false positives die here.
    return (
        candidates.join(F.broadcast(dim), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            dsum(dec("l_extendedprice"), "urgent_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_CM_DEPTH = 4
_CM_WIDTH = 256
_HH_THRESHOLD = 40


@register(
    "agg_countmin_heavyhitters",
    oracle=f"""
    SELECT l_partkey, count(*) AS n_items
    FROM lineitem
    GROUP BY l_partkey
    HAVING count(*) >= {_HH_THRESHOLD}
    """,
)
def agg_countmin_heavyhitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch–gated exact heavy hitters (parts appearing ≥{_HH_THRESHOLD}
    times). Pass 1 builds the d×w = {_CM_DEPTH}×{_CM_WIDTH} counter matrix — the
    shuffle carries at most {_CM_DEPTH * _CM_WIDTH} cells regardless of data size,
    and counts combine map-side. Each key's estimate = min over rows of its
    cell counter, which can only OVER-estimate, so `estimate ≥ T` yields a
    candidate superset with zero false negatives. Pass 2 exactly counts the
    candidate keys only (broadcast semi-join keeps it map-side until the
    final small aggregate), so the answer equals the oracle's full
    GROUP BY … HAVING — but at 100 TB the exact shuffle carries only the
    rows of candidate keys instead of every (key, count) group."""
    li = t(spark, sf_dir, "lineitem").select("l_partkey")
    cells = (
        li.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"),
                            F.pmod(F.xxhash64(F.col("l_partkey"), F.lit(100 + r)), F.lit(_CM_WIDTH)).alias("c"),
                        )
                        for r in range(_CM_DEPTH)
                    ]
                )
            ).alias("cell")
        )
        .groupBy(F.col("cell.r").alias("r"), F.col("cell.c").alias("c"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    keys = li.distinct()
    probes = keys.select(
        "l_partkey",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        F.pmod(F.xxhash64(F.col("l_partkey"), F.lit(100 + r)), F.lit(_CM_WIDTH)).alias("c"),
                    )
                    for r in range(_CM_DEPTH)
                ]
            )
        ).alias("cell"),
    ).select("l_partkey", F.col("cell.r").alias("r"), F.col("cell.c").alias("c"))
    estimates = (
        probes.join(F.broadcast(cells), ["r", "c"])
        .groupBy("l_partkey")
        .agg(F.min("n").alias("est"))
    )
    candidates = estimates.filter(F.col("est") >= _HH_THRESHOLD).select("l_partkey")
    return (
        li.join(F.broadcast(candidates), "l_partkey", "left_semi")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .filter(F.col("n_items") >= _HH_THRESHOLD)
    )


@register(
    "events_histogram_log2",
    oracle="""
    WITH c AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents FROM events
    )
    SELECT CASE WHEN cents <= 0 THEN 0
                ELSE length(bin(cents)) END AS log2_bucket,
           count(*) AS n_events,
           min(cents) AS min_cents,
           max(cents) AS max_cents
    FROM c
    GROUP BY ALL
    """,
)
def events_histogram_log2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed value histogram — the long-tailed-distribution
    profile (latencies, document lengths, token counts) in one partial-agg
    pass. The bucket is `length(bin(cents))` = ⌊log2⌋+1 computed in exact
    integer arithmetic on BOTH engines (no floating log whose last ulp
    could flip a boundary value into the wrong bucket). The shuffle
    carries one row per occupied bucket (≤64) per map task — histogram
    cardinality is bounded by the value's bit width, not the data."""
    ev = t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    bucket = F.when(cents <= 0, F.lit(0)).otherwise(F.length(F.bin(cents)))
    return (
        ev.select(cents.alias("cents"), bucket.alias("log2_bucket"))
        .groupBy("log2_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
    )
