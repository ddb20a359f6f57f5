"""Sketch-accelerated exact queries: Bloom-filter join pre-filtering and
count-min-sketch point-frequency gating, plus a log2 value histogram.

The pattern both sketches share is the one that matters at 100 TB: a
fixed-size, mergeable summary (512 bitmap words / 1024 counters) is built
with one bounded shuffle, broadcast back, and used as a MAP-SIDE filter so
the expensive exact pass only ever touches rows the sketch could not rule
out. Sketches here are never the answer — they are admission control for
the exact computation, so every query below is bit-exact and hash-gated
against a plain-SQL DuckDB oracle (the oracle never sees the sketch).

The build/probe stages are module-level helpers shared by the operators
AND the invariant tests in tests/test_sketch_ops.py, so the tests
exercise the shipped pipeline rather than a copy.

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


def bloom_build(keys: DataFrame, key_col: str) -> DataFrame:
    """Fold a key set into ≤512 (word, bits) rows — the Bloom filter as a
    DataFrame. `bit_or` merges associatively, so the partial aggregation
    combines map-side and the shuffle is bounded by the filter size."""
    positions = keys.select(
        F.explode(
            F.array(_bloom_pos(F.col(key_col), 1), _bloom_pos(F.col(key_col), 2))
        ).alias("pos")
    )
    return positions.groupBy((F.col("pos") / 64).cast("int").alias("word")).agg(
        F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))")).alias(
            "bits"
        )
    )


def bloom_probe(fact: DataFrame, key_col: str, words: DataFrame) -> DataFrame:
    """Map-side Bloom test: keep fact rows whose key hits BOTH hash
    positions in the broadcast filter. No false negatives, so downstream
    exact logic sees a superset of the true matches."""
    probed = fact.withColumn("_p1", _bloom_pos(F.col(key_col), 1)).withColumn(
        "_p2", _bloom_pos(F.col(key_col), 2)
    )
    w1 = words.select(F.col("word").alias("_w1"), F.col("bits").alias("_b1"))
    w2 = words.select(F.col("word").alias("_w2"), F.col("bits").alias("_b2"))
    return (
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
        .drop("_p1", "_p2", "_w1", "_b1", "_w2", "_b2")
    )


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
    """Bloom-filter–pre-filtered fact⋈dim join: the filtered dim keys fold
    into a 32k-bit Bloom filter (bloom_build, one bounded shuffle) and the
    fact table probes the broadcast filter with two hash functions BEFORE
    the exact join (bloom_probe, all map-side). Rows failing either bit
    test never reach the join shuffle; Bloom filters have no false
    negatives, so the surviving exact join returns exactly the plain-join
    answer (which is what the oracle computes). This is Spark's runtime
    row-level bloom pruning (spark.sql.optimizer.runtime.bloomFilter)
    made explicit and deterministic: at 100 TB the fact shuffle shrinks
    by the dim's selectivity for the cost of one 4 KB broadcast."""
    li = t(spark, sf_dir, "lineitem")
    dim = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    words = bloom_build(dim, "o_orderkey")
    candidates = bloom_probe(li, "l_orderkey", words)
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
_WATCHLIST_MAX = 60  # the monitored key range (a fixed point-query set)


def _cm_probes(df: DataFrame, key_col: str) -> DataFrame:
    """One row per (key row, sketch row r) with its cell column c."""
    return df.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        F.pmod(
                            F.xxhash64(F.col(key_col), F.lit(100 + r)), F.lit(_CM_WIDTH)
                        ).alias("c"),
                    )
                    for r in range(_CM_DEPTH)
                ]
            )
        ).alias("_cell"),
    ).select("*", F.col("_cell.r").alias("r"), F.col("_cell.c").alias("c")).drop("_cell")


def cm_build(df: DataFrame, key_col: str) -> DataFrame:
    """The d×w count-min counter matrix — at most _CM_DEPTH×_CM_WIDTH
    rows regardless of data size; counts combine map-side."""
    return _cm_probes(df.select(key_col), key_col).groupBy("r", "c").agg(
        F.count(F.lit(1)).alias("n")
    )


def cm_estimate(keys: DataFrame, key_col: str, cells: DataFrame) -> DataFrame:
    """Point-frequency estimates for a key set: min over the sketch rows
    of each key's cell counters. Can only OVER-estimate — `est >= T` is a
    zero-false-negative gate."""
    return (
        _cm_probes(keys, key_col)
        .join(F.broadcast(cells), ["r", "c"])
        .groupBy(key_col)
        .agg(F.min("n").alias("est"))
    )


@register(
    "agg_countmin_heavyhitters",
    oracle=f"""
    SELECT l_partkey, count(*) AS n_items
    FROM lineitem
    WHERE l_partkey <= {_WATCHLIST_MAX}
    GROUP BY l_partkey
    HAVING count(*) >= {_HH_THRESHOLD}
    """,
)
def agg_countmin_heavyhitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch–gated exact point frequencies: which keys of a
    fixed WATCHLIST (parts 1…{_WATCHLIST_MAX} — the monitored skus/users/
    shards) appear ≥{_HH_THRESHOLD} times. Pass 1 builds the d×w =
    {_CM_DEPTH}×{_CM_WIDTH} counter matrix (cm_build — the shuffle
    carries at most {_CM_DEPTH * _CM_WIDTH} cells regardless of data
    size). The watchlist's estimates are min-of-cells lookups against the
    broadcast sketch; estimates can only OVER-count, so `est ≥ T` keeps a
    candidate superset with zero false negatives, and the exact pass
    counts ONLY candidate-key rows (broadcast semi-join, map-side until
    one small aggregate). The answer equals the oracle's plain
    GROUP BY … HAVING over the watchlist — but at 100 TB the sketch
    answers the frequent-or-not question for ANY monitored key without a
    key-cardinality shuffle, and the exact verification shuffles only the
    rows of plausible keys."""
    li = t(spark, sf_dir, "lineitem").select("l_partkey")
    cells = cm_build(li, "l_partkey")
    watchlist = spark.range(1, _WATCHLIST_MAX + 1).select(
        F.col("id").alias("l_partkey")
    )
    estimates = cm_estimate(watchlist, "l_partkey", cells)
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


@register(
    "agg_approx_topk",
    oracle="""
    SELECT l_suppkey AS item, count(*) AS n
    FROM lineitem GROUP BY 1
    ORDER BY n DESC, item ASC LIMIT 10
    """,
)
def agg_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via Spark 4's native approx_top_k (space-saving
    sketch): mergeable fixed-size per-partition summaries, so the
    shuffle carries maxItemsTracked counters per map task instead of
    every distinct key. Run here in its EXACT regime — maxItemsTracked
    (10000) ≥ distinct suppliers at every fixture SF, where the sketch
    provably degenerates to an exact histogram — so the result is
    hash-gated against a plain GROUP BY oracle, with a deterministic
    (count DESC, item ASC) re-rank replacing the sketch's unspecified
    tie order. At 100 TB key cardinality exceeds the tracked budget and
    the same plan returns ±error heavy hitters with UNCHANGED shuffle
    bytes — the knob trades exactness for a hard memory bound, same
    story as agg_countmin_heavyhitters' candidate pass."""
    t(spark, sf_dir, "lineitem").select("l_suppkey").createOrReplaceTempView(
        "_atk_lineitem"
    )
    return spark.sql(
        """
        WITH sk AS (
          SELECT approx_top_k(l_suppkey, 10000, 10000) AS tk FROM _atk_lineitem
        ),
        flat AS (SELECT inline(tk) FROM sk)
        SELECT CAST(item AS BIGINT) AS item, count AS n
        FROM flat ORDER BY n DESC, item ASC LIMIT 10
        """
    )
