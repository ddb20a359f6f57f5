"""Invariant tests for sketch-gated operators beyond the oracle gate:
the oracle proves the ANSWER is exact; these prove the SKETCH actually
does its job (admission control). They call the SAME build/probe helpers
the operators use (bloom_build/bloom_probe, cm_build/cm_estimate), so a
bug introduced in the shipped pipeline fails here, not just in a copy.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bishe_gpu_database_spark.operators.relational import t
from bishe_gpu_database_spark.operators.sketches import (
    bloom_build,
    bloom_probe,
    cm_build,
    cm_estimate,
)
from tests.conftest import SF_SMALL


def test_bloom_prefilter_actually_filters(spark):
    """The broadcast Bloom stage must pass strictly fewer fact rows than
    the full fact table (else it is dead weight), while never dropping a
    row the exact join needs (no false negatives)."""
    li = t(spark, SF_SMALL, "lineitem")
    dim = (
        t(spark, SF_SMALL, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    candidates = bloom_probe(li, "l_orderkey", bloom_build(dim, "o_orderkey"))
    n_fact = li.count()
    n_cand = candidates.count()
    n_true = li.join(dim, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi").count()
    assert n_true <= n_cand < n_fact  # superset of the truth, real filtering
    # ~20% selectivity dim + 32k-bit filter => candidates within 2x truth
    assert n_cand <= max(2 * n_true, n_true + 64)


def test_bloom_no_false_negatives_rowwise(spark):
    """Every fact row whose key IS in the dim set must survive the probe
    (row-level check, stronger than the count comparison above)."""
    li = t(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_linenumber")
    dim = (
        t(spark, SF_SMALL, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    candidates = bloom_probe(li, "l_orderkey", bloom_build(dim, "o_orderkey"))
    true_rows = li.join(dim, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
    missed = true_rows.exceptAll(
        candidates.select("l_orderkey", "l_linenumber")
    ).count()
    assert missed == 0


def test_countmin_estimates_never_undercount(spark):
    """CM estimates are upper bounds: for every key, est >= true count —
    the property that makes `est >= T` a zero-false-negative gate."""
    li = t(spark, SF_SMALL, "lineitem").select("l_partkey")
    cells = cm_build(li, "l_partkey")
    truth = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("true_n"))
    est = cm_estimate(truth.select("l_partkey"), "l_partkey", cells)
    joined = est.join(truth, "l_partkey")
    assert joined.filter(F.col("est") < F.col("true_n")).count() == 0
    assert joined.count() == truth.count()


def test_ewma_weights_telescope_to_one(spark):
    """For every window length, the integer weights must sum to exactly
    128 (the x128 fixed-point of a weight-1 smoother) — the telescoping
    that makes the EWMA an average, not a drifting sum."""
    for n in range(1, 9):
        ws = [2 ** (6 - i) for i in range(n - 1)] + [2 ** (8 - n) if n > 1 else 128]
        assert sum(ws) == 128, (n, ws)
    # consequently every smoothed value lies in [128*min, 128*max]
    from bishe_gpu_database_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    df = REGISTRY["timeseries_ewma_halflife"].fn(spark, SF_SMALL)
    cents = t(spark, SF_SMALL, "events").select(
        F.round(F.col("value") * 100).cast("bigint").alias("cents")
    )
    lo, hi = cents.agg(F.min("cents"), F.max("cents")).first()
    n_bad = df.filter(
        (F.col("ewma_cents_x128") < 128 * lo) | (F.col("ewma_cents_x128") > 128 * hi)
    ).count()
    assert n_bad == 0


def test_phash_band_join_catches_all_close_pairs(spark):
    """Pigeonhole: any pair within Hamming distance 3 of a 4-banded
    60-bit hash must agree on at least one full band, so the band join
    cannot miss it. Verified exhaustively against the brute-force pairs."""
    from bishe_gpu_database_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    got = {
        (r["doc_a"], r["doc_b"])
        for r in REGISTRY["multimodal_phash_dedup"].fn(spark, SF_SMALL).collect()
    }
    ph = t(spark, SF_SMALL, "documents").select(
        "doc_id",
        F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("bigint").alias("phash"),
    )
    a, b = ph.alias("a"), ph.alias("b")
    brute = {
        (r["doc_a"], r["doc_b"])
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash"))).alias("h"),
        )
        .filter(F.col("h") <= 3)
        .collect()
    }
    assert brute <= got
