"""Aria engine correctness: DataFrame implementation vs the serial
Python oracle (SURVEY.md §5.2 items 2-3), both install policies."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bishe_gpu_database_spark.aria.engine import aria_epoch, run_batch
from bishe_gpu_database_spark.aria.workload import gen_kv, gen_ops
from tests.serial_oracle import Op, drain

N_KEYS = 200
N_TXNS = 40
MAX_OPS = 8


def _collect_workload(spark, seed: str):
    kv_df = gen_kv(spark, N_KEYS, seed=f"kv_{seed}")
    ops_df = gen_ops(
        spark, n_txns=N_TXNS, max_ops=MAX_OPS, n_keys=N_KEYS + 50, write_pct=40, seed=f"ops_{seed}"
    )
    # n_keys+50 in ops => some ops target missing keys (the reference
    # silently skips those, ref: src/database/ycsb/TrancM_func.cuh:32-34).
    kv = {r["k"]: tuple(r[f"f{j}"] for j in range(10)) for r in kv_df.collect()}
    ops = [
        Op(
            r["tid"],
            r["seq"],
            r["k"],
            r["is_update"],
            tuple(r[f"new_f{j}"] for j in range(10)) if r["is_update"] else None,
        )
        for r in ops_df.collect()
    ]
    return kv_df, ops_df, kv, ops


def _kv_as_dict(kv_df):
    return {r["k"]: tuple(r[f"f{j}"] for j in range(10)) for r in kv_df.collect()}


@pytest.mark.parametrize("reorder", [False, True])
@pytest.mark.parametrize("seed", ["s1", "s2"])
def test_drain_matches_serial_oracle(spark, reorder, seed):
    kv_df, ops_df, kv, ops = _collect_workload(spark, seed)
    expect_kv, expect_stats = drain(kv, ops, reorder=reorder)
    got_kv_df, got_stats = run_batch(kv_df, ops_df, reorder=reorder)
    assert got_stats == expect_stats
    assert _kv_as_dict(got_kv_df) == expect_kv


@pytest.mark.parametrize("reorder", [False, True])
def test_drain_insert_missing_matches_serial_oracle(spark, reorder):
    """The op-parallel insert-on-miss variant (ref: src/database/ycsb/
    operation_parallel.cuh:72-83): writes to absent keys create them."""
    kv_df, ops_df, kv, ops = _collect_workload(spark, f"ins_{reorder}")
    expect_kv, expect_stats = drain(kv, ops, reorder=reorder, insert_missing=True)
    got_kv_df, got_stats = run_batch(kv_df, ops_df, reorder=reorder, insert_missing=True)
    assert got_stats == expect_stats
    assert _kv_as_dict(got_kv_df) == expect_kv
    # The workload targets keys beyond the table, so inserts DID happen.
    assert len(expect_kv) > N_KEYS


@pytest.mark.parametrize("reorder", [False, True])
def test_single_epoch_verdicts_match_oracle(spark, reorder):
    from tests.serial_oracle import epoch as serial_epoch

    kv_df, ops_df, kv, ops = _collect_workload(spark, "s3")
    _, committed, aborted = serial_epoch(kv, ops, reorder=reorder)
    res = aria_epoch(kv_df, ops_df, reorder=reorder)
    got = {r["tid"]: r["committed"] for r in res.verdicts.collect()}
    # Txns absent from verdicts had no found ops → trivially committed.
    all_tids = sorted({o.tid for o in ops})
    got_committed = sorted(t for t in all_tids if got.get(t, True))
    assert got_committed == committed


def test_tid1_always_commits_and_drain_bounded(spark):
    kv_df = gen_kv(spark, 20, seed="tiny")
    # Pathological contention: every txn writes key 1.
    n = 8
    rows = [(tid, 0, 1, True) + tuple(f"v{tid}_{j}" for j in range(10)) for tid in range(1, n + 1)]
    ops_df = spark.createDataFrame(
        rows,
        "tid int, seq int, k bigint, is_update boolean, "
        + ", ".join(f"new_f{j} string" for j in range(10)),
    )
    final_kv, stats = run_batch(kv_df, ops_df, reorder=True)
    # One committer (the min tid) per epoch → exactly n epochs.
    assert len(stats) == n
    assert all(s["n_committed"] == 1 for s in stats)
    # Last committed writer wins: tid n (renumbered each epoch, original last).
    row = final_kv.filter(F.col("k") == 1).collect()[0]
    assert row["f0"] == f"v{n}_0"


def test_snapshot_read_semantics(spark):
    """Reads see the pre-epoch snapshot, never in-epoch writes
    (ref: Storage is written but never re-read within Execute,
    src/database/ycsb/TrancM_func.cuh:24-60)."""
    kv_df = spark.createDataFrame(
        [(1, *[f"old{j}" for j in range(10)])],
        "k bigint, " + ", ".join(f"f{j} string" for j in range(10)),
    )
    # tid 1 writes k=1; tid 2 reads k=1 → RAW for tid 2, aborts (plain).
    rows = [
        (1, 0, 1, True) + tuple(f"new{j}" for j in range(10)),
        (2, 0, 1, False) + tuple([None] * 10),
    ]
    ops_df = spark.createDataFrame(
        rows,
        "tid int, seq int, k bigint, is_update boolean, "
        + ", ".join(f"new_f{j} string" for j in range(10)),
    )
    res = aria_epoch(kv_df, ops_df, reorder=False)
    verdicts = {r["tid"]: r["committed"] for r in res.verdicts.collect()}
    assert verdicts == {1: True, 2: False}
    res2 = aria_epoch(kv_df, ops_df, reorder=True)
    verdicts2 = {r["tid"]: r["committed"] for r in res2.verdicts.collect()}
    # With reordering, the pure read (no WAR) commits reading the snapshot.
    assert verdicts2 == {1: True, 2: True}


@pytest.mark.parametrize("reorder", [False, True])
def test_skewed_workload_drain_matches_oracle_with_more_contention(spark, reorder):
    """The power-law (YCSB-zipfian-shaped) key distribution must (a)
    still drain to the exact serial-oracle state — determinism is
    distribution-independent — and (b) produce strictly more aborts
    than the uniform draw of the same batch shape, proving the skew
    actually concentrates reservations on hot keys."""
    kv_df = gen_kv(spark, N_KEYS, seed="kv_zipf")

    def load(skew: bool):
        ops_df = gen_ops(
            spark, n_txns=N_TXNS, max_ops=MAX_OPS, n_keys=N_KEYS, write_pct=40,
            seed="ops_zipf", skew=skew,
        )
        ops = [
            Op(
                r["tid"], r["seq"], r["k"], r["is_update"],
                tuple(r[f"new_f{j}"] for j in range(10)) if r["is_update"] else None,
            )
            for r in ops_df.collect()
        ]
        return ops_df, ops

    kv = {r["k"]: tuple(r[f"f{j}"] for j in range(10)) for r in kv_df.collect()}
    skew_df, skew_ops = load(True)
    expect_kv, expect_stats = drain(kv, skew_ops, reorder=reorder)
    got_kv_df, got_stats = run_batch(kv_df, skew_df, reorder=reorder)
    assert got_stats == expect_stats
    assert _kv_as_dict(got_kv_df) == expect_kv

    uni_df, uni_ops = load(False)
    _, uni_stats = drain(kv, uni_ops, reorder=reorder)
    aborts = lambda st: sum(e["n_aborted"] for e in st)  # noqa: E731
    assert aborts(expect_stats) > aborts(uni_stats), (
        aborts(expect_stats), aborts(uni_stats),
    )
