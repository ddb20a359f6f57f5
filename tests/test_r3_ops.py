"""Property tests for the round-3 operator additions, driving the
PRODUCTION functions (not re-pasted pipelines): the FastSS edit-distance
join's deletion-neighborhood completeness (including the insert/delete
cases the fixture's fixed-length names never exercise), the geo
grid-bucket join's equivalence to brute force on adversarial point sets
(cell-boundary straddlers), and the fixed-point power iteration's
Rayleigh-monotonicity / exact-recurrence contract."""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from bishe_gpu_database_spark.operators.geo import _CELL, _D, _bucketed_candidates


def _synthetic_dir(spark, tmp_path, name, df):
    d = str(tmp_path / "sfdir")
    os.makedirs(d, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, f"{name}.parquet"))
    return d


def _brute_lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[lb]


def test_fastss_complete_vs_bruteforce_mixed_lengths(spark, tmp_path):
    """Random strings of varying length through the PRODUCTION
    dedup_editdist_fastss (via a synthetic customer table): its result
    must equal the brute-force ed<=1 pair set — substitutions,
    insertions, deletions, and identical strings all covered."""
    from bishe_gpu_database_spark.operators.dedup import dedup_editdist_fastss

    rng = random.Random(7)
    base = ["".join(rng.choice("abc") for _ in range(rng.randint(3, 8))) for _ in range(40)]
    # Seed guaranteed near-pairs of every edit kind.
    base += ["hello", "hallo", "hell", "helloo", "hello"]
    df = spark.createDataFrame(
        [(i, n, "BUILDING", 0, 0.0) for i, n in enumerate(base)],
        "c_custkey bigint, c_name string, c_mktsegment string, "
        "c_nationkey int, c_acctbal double",
    )
    d = _synthetic_dir(spark, tmp_path, "customer", df)
    got = {(r.u, r.v) for r in dedup_editdist_fastss(spark, d).collect()}
    expected = {
        (i, j)
        for i in range(len(base))
        for j in range(i + 1, len(base))
        if _brute_lev(base[i], base[j]) <= 1
    }
    assert got == expected
    assert expected, "fixture must contain at least one near pair"


def test_geo_neighbor_bucketing_complete_on_boundaries(spark):
    """Points placed straddling cell boundaries (distance exactly _D,
    _D±1, across a corner) through the production _bucketed_candidates —
    must produce exactly the brute-force Chebyshev-ball pairs in both
    directed and undirected modes."""
    rng = random.Random(11)
    pts = [(i, rng.randrange(0, 4 * _CELL), rng.randrange(0, 4 * _CELL)) for i in range(60)]
    # Adversarial straddlers around the cell seam at x = _CELL.
    nid = len(pts)
    for dx, dy in [(_D, 0), (_D + 1, 0), (_D, _D), (0, _D + 1), (-_D, _D)]:
        pts.append((nid, _CELL - 1, _CELL - 1))
        pts.append((nid + 1, _CELL - 1 + dx, _CELL - 1 + dy))
        nid += 2
    df = spark.createDataFrame(pts, "k int, x long, y long").localCheckpoint()
    expected = {
        (a[0], b[0])
        for i, a in enumerate(pts)
        for b in pts[i + 1 :]
        if abs(a[1] - b[1]) <= _D and abs(a[2] - b[2]) <= _D
    }
    got = {(r.u, r.v) for r in _bucketed_candidates(df, directed=False).collect()}
    assert got == expected
    assert expected, "fixture must contain neighbor pairs"
    got_directed = {
        (r.u, r.v) for r in _bucketed_candidates(df, directed=True).collect()
    }
    assert got_directed == expected | {(v, u) for (u, v) in expected}


def test_geo_neighbor_pairs_emitted_once(spark):
    """Each qualifying pair appears exactly once (the 3x3 probe explosion
    joins a unique home cell per partner)."""
    from bishe_gpu_database_spark.operators.geo import geo_neighbor_pairs

    df = geo_neighbor_pairs(spark, "/root/testdata/sf0.01")
    n = df.count()
    nd = df.select("u", "v").distinct().count()
    assert n == nd


def test_pca_power_rayleigh_monotone_and_exact(spark):
    """The fixed-point power iteration must (a) reproduce the exact
    integer recurrence bit-for-bit and (b) satisfy the power-method
    invariant: the Rayleigh quotient R(q_k) = qGq/qq is non-decreasing
    across iterations."""
    import numpy as np

    from bishe_gpu_database_spark.operators.similarity import embedding_pca_power3

    sf = "/root/testdata/sf0.001"
    rows = spark.read.parquet(f"{sf}/embeddings.parquet").select("embedding").collect()
    V = np.floor(np.array([r.embedding for r in rows], dtype=np.float64) * 1048576).astype(
        np.int64
    )
    G = (V.astype(np.float64).T @ V.astype(np.float64))

    def rayleigh(q):
        qf = q.astype(np.float64)
        return (qf @ G @ qf) / (qf @ qf)

    q = np.full(64, 1048576, dtype=np.int64)
    rs = [rayleigh(q)]
    for _ in range(3):
        dots = V @ q
        sd = np.max(np.abs(dots)) // 2**20 + 1
        dots = np.sign(dots) * (np.abs(dots) // sd)
        w = V.T @ dots
        sw = np.max(np.abs(w)) // 2**20 + 1
        q = np.sign(w) * (np.abs(w) // sw)
        rs.append(rayleigh(q))
    # (b) invariant: strictly improving on this fixture, non-decreasing always
    assert all(rs[i + 1] >= rs[i] for i in range(3)), rs
    assert rs[3] > rs[0], rs
    # (a) the distributed result equals the exact integer recurrence
    got = {
        r.dim: r.q_fx for r in embedding_pca_power3(spark, sf).collect()
    }
    want = {i + 1: int(q[i]) for i in range(64)}
    assert got == want
