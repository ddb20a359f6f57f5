"""r6: skew-adaptive window_distinct_sliding (collapse-by-instant hot
path) must be bit-identical to the exact per-event cold path at every
gate setting — the r5 verdict's headline ask. r7 made the gate
data-aware (size AND instant-duplication), so forcing the hot path now
means zeroing both thresholds."""

from __future__ import annotations

from bishe_gpu_database_spark.operators.timeseries import window_distinct_sliding


def _result_map(df):
    return {r["event_id"]: (r["event_type"], r["n_active_users_1h"]) for r in df.collect()}


def test_window_distinct_sliding_hot_path_identical(spark, sf_dir):
    """hot_cell_rows=1 + dup_factor=0 forces EVERY (type, hour) cell
    through the collapse-by-instant path; a mid size threshold (still
    dup_factor=0) mixes hot and cold cells in one run. Both must equal
    the default (all-cold at fixture scale: cells are small and
    instants are near-unique)."""
    base = _result_map(window_distinct_sliding(spark, sf_dir))
    assert len(base) == 1000  # sf0.001 events
    all_hot = _result_map(
        window_distinct_sliding(spark, sf_dir, hot_cell_rows=1, dup_factor=0)
    )
    assert all_hot == base
    mixed = _result_map(
        window_distinct_sliding(spark, sf_dir, hot_cell_rows=60, dup_factor=0)
    )
    assert mixed == base


def test_window_distinct_sliding_dup_gate_routes_hot(spark, sf_dir):
    """The duplication gate alone (hot_cell_rows=1, dup_factor=2) must
    route only genuinely duplicated cells hot — and stay bit-identical
    either way. At fixture scale instants are near-unique, so this run
    is mostly-cold with at most incidental hot cells; equality with the
    all-cold default is the invariant that matters."""
    base = _result_map(window_distinct_sliding(spark, sf_dir))
    gated = _result_map(
        window_distinct_sliding(spark, sf_dir, hot_cell_rows=1, dup_factor=2)
    )
    assert gated == base
