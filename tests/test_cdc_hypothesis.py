"""Property-based CDC merge testing (hypothesis): random snapshots and
changelogs, the DataFrame merge must match a pure-Python oracle — every
draw probes compaction ordering (duplicate versions per key), delete-of-
absent-key, insert/update/delete interleavings, and empty sides."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bishe_gpu_database_spark.operators.cdc import apply_changelog, compact_changelog

N_KEYS = 8  # tiny domain → every key sees competing ops

snap_strategy = st.dictionaries(
    st.integers(min_value=1, max_value=N_KEYS),
    st.integers(min_value=-1000, max_value=1000),
    max_size=N_KEYS,
)
change_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=N_KEYS + 3),  # some keys absent from snap
        st.sampled_from(["U", "D"]),
        st.integers(min_value=-1000, max_value=1000),
    ),
    max_size=12,
)


def _oracle(snap: dict, changes: list) -> dict:
    """Serial application: last op per key wins (list order = version)."""
    latest = {}
    for i, (k, op, val) in enumerate(changes):
        latest[k] = (op, val)
    out = {}
    for k, bal in snap.items():
        if k not in latest:
            out[k] = (bal, "kept")
    for k, (op, val) in latest.items():
        if op == "D":
            continue
        out[k] = (val, "updated" if k in snap else "inserted")
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(snap=snap_strategy, changes=change_strategy)
def test_merge_matches_serial_oracle(spark, snap, changes):
    expect = _oracle(snap, changes)

    snap_df = spark.createDataFrame(
        [(k, v) for k, v in snap.items()] or [(None, None)],
        "k bigint, bal_cents bigint",
    ).filter("k IS NOT NULL")
    ch_df = spark.createDataFrame(
        [(k, op, val, i) for i, (k, op, val) in enumerate(changes)]
        or [(None, None, None, None)],
        "k bigint, op string, new_bal_cents bigint, ver bigint",
    ).filter("k IS NOT NULL")

    got = {
        r["k"]: (r["bal_cents"], r["action"])
        for r in apply_changelog(snap_df, compact_changelog(ch_df)).collect()
    }
    assert got == expect
