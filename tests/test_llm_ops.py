"""Semantic tests for the LLM-pipeline operators beyond oracle parity:
approx-distinct error bounds, LSH recall vs brute force, simhash
locality, dedup idempotence, multimodal batch shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from bishe_gpu_database_spark.operators import dedup, multimodal, similarity
from bishe_gpu_database_spark.operators.dedup import dedup_exact
from bishe_gpu_database_spark.operators.relational import agg_approx_distinct, t
from tests.conftest import SF_SMALL


def test_approx_distinct_error_bound(spark):
    """The query now self-reports the HLL bound check (within_bound) and
    carries the exact count; both must hold against an independently
    computed exact distinct."""
    rows = {
        r["l_returnflag"]: r for r in agg_approx_distinct(spark, SF_SMALL).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in t(spark, SF_SMALL, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    for flag, n in exact.items():
        assert rows[flag]["n_exact"] == n
        assert rows[flag]["within_bound"] is True


def test_minhash_lsh_candidates_have_high_jaccard(spark):
    """LSH candidate pairs should overlap heavily with true high-Jaccard
    pairs: every candidate's exact Jaccard must be > 0 and the max-Jaccard
    exact pair should be recalled (banding guarantees for sim ≥ ~0.9)."""
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.dedup_ngram_jaccard(spark, SF_SMALL).collect()
    }
    cands = {
        (r["doc_a"], r["doc_b"]) for r in dedup.dedup_minhash_lsh_pairs(spark, SF_SMALL).collect()
    }
    if exact:
        top_pair = max(exact, key=exact.get)
        if exact[top_pair] >= 0.9:
            assert top_pair in cands
    # no degenerate everything-matches blowup
    n_docs = t(spark, SF_SMALL, "documents").count()
    assert len(cands) < n_docs * 5


def test_simhash_locality(spark):
    """Identical texts → identical simhash (trivially); distinct texts →
    fingerprints spread across many values (not collapsed)."""
    sh = dedup.dedup_simhash(spark, SF_SMALL)
    n_distinct = sh.select("simhash16").distinct().count()
    assert n_distinct > 10


def test_dedup_exact_idempotent(spark):
    out = dedup_exact(spark, SF_SMALL)
    assert out.count() == out.select("fingerprint").distinct().count()


def test_lsh_bucket_join_recall(spark):
    """Bucketed candidate generation (equi-join on bucket) must recall the
    top brute-force cosine pairs whose vectors share all 8 hyperplane
    signs with decent probability; we assert the join is well-formed and
    produces pairs only within equal buckets."""
    buckets = similarity.ann_lsh_buckets(spark, SF_SMALL)
    a = buckets.select(F.col("vec_id").alias("va"), F.col("bucket").alias("ba"))
    b = buckets.select(F.col("vec_id").alias("vb"), F.col("bucket").alias("bb"))
    pairs = a.join(b, (F.col("ba") == F.col("bb")) & (F.col("va") < F.col("vb")))
    n_pairs = pairs.count()
    n = buckets.count()
    assert 0 < n_pairs < n * (n - 1) / 2  # bucketing actually partitions


def test_multimodal_decode_batch_shape(spark):
    feats = multimodal.multimodal_decode_features(spark, SF_SMALL)
    rows = feats.collect()
    assert len(rows) == t(spark, SF_SMALL, "documents").count()
    for r in rows[:20]:
        assert 1 <= r["width"] <= 640 and 1 <= r["height"] <= 480
        assert r["mean_px"] > 0
