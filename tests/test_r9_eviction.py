"""r9 regression suite for StreamDrainState's key-existence cache
bounds (r8 verdict wrong-answer + ADVICE medium):

1. max_known eviction must NOT drop committed updates to
   previously-cached keys — the r8 code cleared known_exist wholesale
   when the bound tripped, so a key cached in an earlier trigger
   vanished from existence mid-batch and its committed write was
   silently skipped (reproduced: final A1 where the run_batch oracle
   gives A2). The fix evicts only keys OUTSIDE the current batch.
2. The all_keys_cached branch must not grow known_missing without
   bound over a long-lived stream probing ever-fresh absent keys.

Both are pinned by the exact verdict scenario plus a hypothesis
property test driving random multi-trigger workloads with tiny
max_known / key_cache_bound against the run_batch fold oracle — the
test class that would have caught the original bug."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bishe_gpu_database_spark.aria.engine import (
    StreamDrainState,
    run_batch,
    stream_drain_step,
)

KV_SCHEMA = "k bigint, " + ", ".join(f"f{j} string" for j in range(10))
OPS_SCHEMA = (
    "tid int, seq int, k bigint, is_update boolean, "
    + ", ".join(f"new_f{j} string" for j in range(10))
)


def _kv_df(spark, keys):
    return spark.createDataFrame(
        [(k, *(f"init{k}_{j}" for j in range(10))) for k in keys], KV_SCHEMA
    )


def _ops_df(spark, ops):
    """ops: list of (tid, seq, k, is_update, tag) — tag names the staged
    value so assertions can spot which write won."""
    rows = [
        (tid, seq, k, upd, *((f"{tag}_{j}" for j in range(10)) if upd else [None] * 10))
        for tid, seq, k, upd, tag in ops
    ]
    return spark.createDataFrame(rows, OPS_SCHEMA)


def _table_dict(df):
    return {r["k"]: tuple(r[f"f{j}"] for j in range(10)) for r in df.collect()}


def test_max_known_eviction_keeps_current_batch_keys(spark):
    """The r8 verdict repro, verbatim: base {1,2,3}, key_cache_bound=0
    (force the broadcast-probe path), max_known=2 (trip eviction on
    trigger 2), update key 1 to A1 in trigger 1, then touch keys 1+2+3
    with key 1 updated to A2 in trigger 2. Final state must equal the
    run_batch fold (key 1 = A2), not the memtable's stale A1."""
    kv = _kv_df(spark, [1, 2, 3])
    state = StreamDrainState(kv, key_cache_bound=0, max_known=2)
    t1 = _ops_df(spark, [(1, 0, 1, True, "A1")])
    t2 = _ops_df(
        spark,
        [(1, 0, 2, False, ""), (1, 1, 3, False, ""), (2, 0, 1, True, "A2")],
    )
    expect_kv = kv
    for ops in (t1, t2):
        stats_stream = stream_drain_step(state, ops, reorder=True)
        expect_kv, stats_batch = run_batch(expect_kv, ops, reorder=True)
        assert stats_stream == stats_batch
    got = _table_dict(state.table())
    want = _table_dict(expect_kv)
    assert got[1][0] == "A2_0", f"eviction dropped the trigger-2 write: {got[1][0]}"
    assert got == want


def test_max_known_eviction_bounds_cache_between_batches(spark):
    """Distinct-key triggers against a large-table (probe-path) state
    with max_known=4: the cache must stay bounded by (batch keys +
    max_known slack) instead of accumulating every key ever probed —
    while every trigger still matches the run_batch fold."""
    kv = _kv_df(spark, range(1, 31))
    state = StreamDrainState(kv, key_cache_bound=0, max_known=4)
    expect_kv = kv
    for i in range(5):
        keys = [1 + 6 * i, 2 + 6 * i, 3 + 6 * i]  # 3 fresh keys per trigger
        ops = _ops_df(
            spark, [(1, s, k, True, f"t{i}k{k}") for s, k in enumerate(keys)]
        )
        stats_stream = stream_drain_step(state, ops, reorder=True)
        expect_kv, stats_batch = run_batch(expect_kv, ops, reorder=True)
        assert stats_stream == stats_batch
        assert len(state.known_exist) + len(state.known_missing) <= 4 + len(keys)
    # the large-key-universe regime (base count > key_cache_bound): every
    # trigger of fresh keys costs exactly ONE broadcast probe job, and the
    # all-keys prefetch never engages (r8 verdict item 5).
    assert not state.all_keys_cached
    assert state.probe_jobs == 5
    assert _table_dict(state.table()) == _table_dict(expect_kv)


def test_all_keys_cached_known_missing_stays_empty(spark):
    """ADVICE medium: with the whole (small) key set prefetched,
    probing a stream of never-seen ABSENT keys must not grow
    known_missing — existence is answered by known_exist membership
    alone, and results still match the fold."""
    kv = _kv_df(spark, [1, 2, 3])
    state = StreamDrainState(kv)  # default bound >> 3 -> prefetch path
    expect_kv = kv
    for i in range(3):
        absent = 100 + 10 * i
        ops = _ops_df(
            spark,
            [(1, 0, absent, True, f"ghost{i}"), (2, 0, 1, True, f"t{i}")],
        )
        stats_stream = stream_drain_step(state, ops, reorder=True)
        expect_kv, stats_batch = run_batch(expect_kv, ops, reorder=True)
        assert stats_stream == stats_batch
        assert state.all_keys_cached
        assert not state.known_missing, "known_missing grew on the cached path"
    assert _table_dict(state.table()) == _table_dict(expect_kv)
    assert state.table().count() == 3  # ghost keys never created


# --- hypothesis: random multi-trigger workloads, tiny cache bounds ----

N_KEYS = 8

trigger_strategy = st.lists(  # one trigger = list of txns = list of ops
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=N_KEYS + 3),  # some keys absent
            st.booleans(),
        ),
        min_size=1,
        max_size=3,
    ),
    min_size=1,
    max_size=3,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    triggers=st.lists(trigger_strategy, min_size=2, max_size=3),
    max_known=st.integers(min_value=0, max_value=5),
    cache_all=st.booleans(),
    reorder=st.booleans(),
)
def test_bounded_cache_stream_matches_run_batch_fold(
    spark, triggers, max_known, cache_all, reorder
):
    kv = _kv_df(spark, range(1, N_KEYS + 1))
    state = StreamDrainState(
        kv,
        key_cache_bound=(10**9 if cache_all else 0),
        max_known=max_known,
        flush_threshold=3,  # also exercise mid-stream flushes
    )
    expect_kv = kv
    for ti, trig in enumerate(triggers):
        rows = [
            (tid0 + 1, seq, k, upd, f"x{ti}_{tid0}_{seq}")
            for tid0, txn in enumerate(trig)
            for seq, (k, upd) in enumerate(txn)
        ]
        ops = _ops_df(spark, rows)
        stats_stream = stream_drain_step(state, ops, reorder=reorder)
        expect_kv, stats_batch = run_batch(expect_kv, ops, reorder=reorder)
        assert stats_stream == stats_batch, f"schedule diverged at trigger {ti}"
    assert _table_dict(state.table()) == _table_dict(expect_kv)
