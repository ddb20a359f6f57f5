"""r6: skew-adaptive window_distinct_sliding (collapse-by-instant hot
path) must be bit-identical to the exact per-event cold path at every
threshold — the r5 verdict's headline ask."""

from __future__ import annotations

from bishe_gpu_database_spark.operators.timeseries import window_distinct_sliding


def _result_map(df):
    return {r["event_id"]: (r["event_type"], r["n_active_users_1h"]) for r in df.collect()}


def test_window_distinct_sliding_hot_path_identical(spark, sf_dir):
    """hot_cell_rows=1 forces EVERY (type, hour) cell through the
    collapse-by-instant path; a mid threshold mixes hot and cold cells in
    one run. Both must equal the default (all-cold at fixture scale)."""
    base = _result_map(window_distinct_sliding(spark, sf_dir))
    assert len(base) == 1000  # sf0.001 events
    all_hot = _result_map(window_distinct_sliding(spark, sf_dir, hot_cell_rows=1))
    assert all_hot == base
    mixed = _result_map(window_distinct_sliding(spark, sf_dir, hot_cell_rows=60))
    assert mixed == base
