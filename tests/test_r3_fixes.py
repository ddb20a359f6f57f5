"""Regression tests for the round-3 ADVICE.md fixes: the sequence-gap
audit must surface FULLY-empty buckets (previously the largest gap class
produced no row at all), and the A/B test must return a loud FALSE
verdict — never a silent NULL — when every user lands in one arm."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL  # noqa: F401  (fixture dir used by siblings)


def _synthetic_dir(spark, tmp_path, name, df):
    d = str(tmp_path / "sfdir")
    os.makedirs(d, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, f"{name}.parquet"))
    return d


def test_sequence_gaps_surfaces_fully_empty_buckets(spark, tmp_path):
    """Keys 0..999 and 3000..3010: buckets 1 and 2 hold ZERO keys and must
    each surface as a row with present=0 and missing = full bucket width —
    the r2 implementation emitted no row for them (ADVICE.md, medium)."""
    from bishe_gpu_database_spark.operators.quality import quality_sequence_gaps

    keys = list(range(0, 1000)) + list(range(3000, 3011))
    df = spark.createDataFrame([(k,) for k in keys], "l_orderkey bigint")
    d = _synthetic_dir(spark, tmp_path, "lineitem", df)
    out = {r["bucket"]: r for r in quality_sequence_gaps(spark, d).collect()}
    assert set(out) == {1, 2}
    for b in (1, 2):
        assert out[b]["present"] == 0
        assert out[b]["expected"] == 1000
        assert out[b]["missing"] == 1000


def test_sequence_gaps_no_gaps_yields_empty(spark, tmp_path):
    from bishe_gpu_database_spark.operators.quality import quality_sequence_gaps

    df = spark.createDataFrame([(k,) for k in range(500, 2500)], "l_orderkey bigint")
    d = _synthetic_dir(spark, tmp_path, "lineitem", df)
    assert quality_sequence_gaps(spark, d).count() == 0


def test_ab_test_single_arm_false_not_null(spark, tmp_path):
    """One user => one populated arm. The verdict must be a deterministic
    FALSE (gated), not NULL, and the empty arm's counts must read 0
    (ADVICE.md, low: degenerate assignment previously yielded NULLs)."""
    from bishe_gpu_database_spark.operators.mining import events_ab_test

    ts = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, ts, 7, "purchase", 1.0, "{}")],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    d = _synthetic_dir(spark, tmp_path, "events", df)
    r = events_ab_test(spark, d).collect()[0]
    assert r["significant_95"] is False
    # exactly one arm populated, the other zero-filled
    assert sorted([r["n0"], r["n1"]]) == [0, 1]
    assert r["c0"] is not None and r["c1"] is not None


def test_ab_test_overflow_safe_at_large_counts(spark):
    """The significance inequality must evaluate in DECIMAL(38,0), not
    64-bit: with 1e8 users/arm and a 1000-ppm rate gap the old BIGINT form
    overflows (ANSI: throws). Evaluate the exact production expression on
    a literal row at that scale and check the verdict is sane."""
    row = spark.sql(
        """
        SELECT coalesce(
          CAST(r0 - r1 AS DECIMAL(38,0)) * (r0 - r1) * n0 * n1 * 10000
            > CAST(38416 AS DECIMAL(38,0)) * pp * (1000000 - pp) * (n0 + n1),
          false) AS significant_95
        FROM (SELECT CAST(100000000 AS BIGINT) AS n0,
                     CAST(100000000 AS BIGINT) AS n1,
                     CAST(51000 AS BIGINT) AS r0,
                     CAST(50000 AS BIGINT) AS r1,
                     CAST(50500 AS BIGINT) AS pp)
        """
    ).collect()[0]
    # z ~ 32 at this scale: decisively significant; the unfixed form
    # raises ARITHMETIC_OVERFLOW here instead.
    assert row["significant_95"] is True


def test_prefix_filter_join_equals_bruteforce(spark):
    """Prefix filtering must be lossless: its pair set at tau=0.3 equals
    the brute-force shingle-join pairs filtered to jaccard >= 0.3."""
    from bishe_gpu_database_spark.operators.dedup import (
        dedup_ngram_jaccard,
        dedup_prefix_filter_join,
    )

    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_prefix_filter_join(spark, SF_SMALL).collect()
    }
    want = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_ngram_jaccard(spark, SF_SMALL).collect()
        if r["jaccard"] >= 0.3
    }
    assert got == want and len(got) > 0


def test_bpe_pair_counts_conserve_mass(spark):
    """Every reported pair count must equal an independent corpus-side
    recount (explode words directly, no vocab collapse)."""
    from bishe_gpu_database_spark.functions.text import tokens
    from bishe_gpu_database_spark.operators.pipeline import pipeline_bpe_pair_counts
    from bishe_gpu_database_spark.operators.relational import t

    got = {
        r["pair"]: r["n_occurrences"]
        for r in pipeline_bpe_pair_counts(spark, SF_SMALL).collect()
    }
    assert len(got) == 20
    d = t(spark, SF_SMALL, "documents").select("text")
    w = d.select(F.explode(tokens(F.col("text"))).alias("w")).filter(
        F.length("w") >= 2
    )
    direct = {
        r["pair"]: r["n"]
        for r in w.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("w") - 1),
                    lambda i: F.substring(F.col("w"), i, F.lit(2)),
                )
            ).alias("pair")
        )
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for pair, n in got.items():
        assert direct[pair] == n, (pair, n, direct.get(pair))


def test_seasonal_profile_index_centers_on_million(spark):
    """The event-weighted mean of the seasonal index is 1e6 by
    construction (cell_avg/global_avg weighted by cell size), and counts
    partition the corpus."""
    from bishe_gpu_database_spark.operators.relational import t
    from bishe_gpu_database_spark.operators.timeseries import (
        timeseries_seasonal_profile,
    )

    rows = timeseries_seasonal_profile(spark, SF_SMALL).collect()
    n_total = t(spark, SF_SMALL, "events").count()
    assert sum(r["n_events"] for r in rows) == n_total
    weighted = sum(r["seasonal_ppm"] * r["n_events"] for r in rows) / n_total
    assert abs(weighted - 1_000_000) < 200  # truncation slack only
    for r in rows:
        assert 0 <= r["dow"] <= 6 and 0 <= r["hour"] <= 23


def test_sliding_median_matches_python_rolling(spark):
    """Recompute the 5-row rolling doubled-median in plain Python over
    the same (ts, event_id) order and compare every row."""
    from bishe_gpu_database_spark.operators.relational import (
        t,
        window_median_sliding,
    )

    got = {
        (r["event_type"], r["event_id"]): (r["n_in_frame"], r["median_2x_cents"])
        for r in window_median_sliding(spark, SF_SMALL).collect()
    }
    ev = sorted(
        t(spark, SF_SMALL, "events")
        .select("event_type", "ts", "event_id", F.round(F.col("value") * 100).cast("bigint").alias("cents"))
        .collect(),
        key=lambda r: (r["event_type"], r["ts"], r["event_id"]),
    )
    by_type: dict = {}
    for r in ev:
        hist = by_type.setdefault(r["event_type"], [])
        hist.append(r["cents"])
        win = sorted(hist[-5:])
        n = len(win)
        want = (n, win[(n - 1) // 2] + win[n // 2])
        assert got[(r["event_type"], r["event_id"])] == want


def test_mv_rewrite_conserves_base_totals(spark):
    """The MV-answered month rollup must conserve the base table's global
    count and cent total exactly (aggregation compositionality)."""
    from bishe_gpu_database_spark.operators.relational import t
    from bishe_gpu_database_spark.sources.formats import mv_rewrite_monthly

    rows = mv_rewrite_monthly(spark, SF_SMALL).collect()
    od = t(spark, SF_SMALL, "orders")
    base = od.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents"),
    ).collect()[0]
    assert sum(r["n_orders"] for r in rows) == base["n"]
    assert sum(r["cents_total"] for r in rows) == base["cents"]
    months = [r["month"] for r in rows]
    assert len(months) == len(set(months))
    assert all(m.day == 1 for m in months)
