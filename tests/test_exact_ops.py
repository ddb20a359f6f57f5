"""Independent-reference tests for the exact-arithmetic operators: the
DuckDB oracle proves Spark and DuckDB agree; these prove the shared
formula agrees with a THIRD, straightforward implementation (pure
Python / numpy), guarding against both engines encoding the same
mistake."""

from __future__ import annotations

import math
import re

import numpy as np
from pyspark.sql import functions as F

from bishe_gpu_database_spark.operators.relational import t
from bishe_gpu_database_spark.registry import REGISTRY, _ensure_loaded
from tests.conftest import SF_SMALL


def _tokens(text: str) -> list[str]:
    return [w for w in re.sub(r"\s+", " ", text.lower()).strip().split(" ") if w]


def test_bm25_matches_float_reference(spark):
    """The integer-rational BM25 (k1=1.2, b=0.75) must equal the textbook
    float formula to ~1e-6 relative (the rational form IS the same
    number, modulo the final rounding both engines apply)."""
    _ensure_loaded()
    got = {r["doc_id"]: r["bm25"] for r in
           REGISTRY["text_bm25_topk"].fn(spark, SF_SMALL).collect()}
    docs = {r["doc_id"]: _tokens(r["text"]) for r in
            t(spark, SF_SMALL, "documents").select("doc_id", "text").collect()}
    terms = ["spark", "vector", "stream"]
    N = len(docs)
    avgdl = sum(len(ts) for ts in docs.values()) / N
    df = {q: sum(1 for ts in docs.values() if q in ts) for q in terms}
    k1, b = 1.2, 0.75
    for doc_id, spark_score in got.items():
        ts = docs[doc_id]
        ref = 0.0
        for q in terms:
            tf = ts.count(q)
            if tf == 0:
                continue
            idf = (N - df[q] + 0.5) / (df[q] + 0.5)
            ref += round(idf * tf * (k1 + 1)
                         / (tf + k1 * (1 - b + b * len(ts) / avgdl)), 6)
        assert math.isclose(spark_score, ref, rel_tol=1e-9, abs_tol=1e-6), (
            doc_id, spark_score, ref)


def test_ewma_matches_python_fold(spark):
    """The x128 integer EWMA must EXACTLY equal a direct Python fold of
    the weight table over each user's trailing window."""
    _ensure_loaded()
    got = {r["event_id"]: (r["n_window"], r["ewma_cents_x128"]) for r in
           REGISTRY["timeseries_ewma_halflife"].fn(spark, SF_SMALL).collect()}
    ev = sorted(
        t(spark, SF_SMALL, "events")
        .select("event_id", "user_id", "ts",
                F.round(F.col("value") * 100).cast("bigint").alias("cents"))
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    by_user: dict[int, list] = {}
    for r in ev:
        hist = by_user.setdefault(r["user_id"], [])
        hist.append(r["cents"])
        win = hist[-8:][::-1]  # newest first
        n = len(win)
        ws = [2 ** (6 - i) for i in range(n - 1)] + [2 ** (8 - n) if n > 1 else 128]
        ref = sum(c * w for c, w in zip(win, ws))
        assert got[r["event_id"]] == (n, ref), (r["event_id"], got[r["event_id"]], ref)


def test_linreg_and_moments_match_numpy(spark):
    """Exact-moment OLS/correlation and skewness/kurtosis must match
    numpy computed from the raw points (tolerance: the operators round
    to 6 decimals)."""
    _ensure_loaded()
    li = (
        t(spark, SF_SMALL, "lineitem")
        .select("l_returnflag",
                F.col("l_quantity").cast("bigint").alias("x"),
                F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"))
        .collect()
    )
    groups: dict[str, list] = {}
    for r in li:
        groups.setdefault(r["l_returnflag"], []).append((r["x"], r["y"]))
    lin = {r["l_returnflag"]: r for r in
           REGISTRY["agg_linreg_exact"].fn(spark, SF_SMALL).collect()}
    mom = {r["l_returnflag"]: r for r in
           REGISTRY["agg_moments_exact"].fn(spark, SF_SMALL).collect()}
    for flag, pts in groups.items():
        x = np.array([p[0] for p in pts], dtype=float)
        y = np.array([p[1] for p in pts], dtype=float)
        slope, intercept = np.polyfit(x, y, 1)
        corr = np.corrcoef(x, y)[0, 1]
        assert math.isclose(lin[flag]["slope_cents_per_qty"], slope,
                            rel_tol=1e-6, abs_tol=1e-4)
        assert math.isclose(lin[flag]["intercept_cents"], intercept,
                            rel_tol=1e-6, abs_tol=1e-2)
        assert math.isclose(lin[flag]["corr_xy"], corr, rel_tol=1e-6, abs_tol=1e-6)
        var = x.var()  # population
        skew = ((x - x.mean()) ** 3).mean() / var ** 1.5
        kurt = ((x - x.mean()) ** 4).mean() / var ** 2
        assert math.isclose(mom[flag]["variance_pop"], var, rel_tol=1e-9, abs_tol=1e-6)
        assert math.isclose(mom[flag]["skewness_pop"], skew, rel_tol=1e-6, abs_tol=1e-6)
        assert math.isclose(mom[flag]["kurtosis_pop"], kurt, rel_tol=1e-6, abs_tol=1e-6)


def test_simpson_matches_python(spark):
    """Simpson diversity: exact rational vs direct Python count."""
    _ensure_loaded()
    got = {r["doc_id"]: r for r in
           REGISTRY["text_simpson_diversity"].fn(spark, SF_SMALL).collect()}
    docs = t(spark, SF_SMALL, "documents").select("doc_id", "text").collect()
    from collections import Counter

    for r in docs:
        ts = _tokens(r["text"])
        n = len(ts)
        if n < 2:
            assert r["doc_id"] not in got
            continue
        c = Counter(ts)
        num = sum(v * (v - 1) for v in c.values())
        row = got[r["doc_id"]]
        assert row["n_tokens"] == n and row["n_distinct"] == len(c)
        assert math.isclose(row["simpson"], round(num / (n * (n - 1)), 6),
                            rel_tol=0, abs_tol=1e-9)
