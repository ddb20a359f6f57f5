"""Property-based Aria testing (hypothesis): random tiny workloads, the
DataFrame engine must match the serial Python oracle on BOTH install
policies and BOTH execute modes — every draw is a fresh adversarial case
for reservation/dependency logic (duplicate keys in a txn, read-write
mixes, missing keys, singleton epochs)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bishe_gpu_database_spark.aria.engine import run_batch
from tests.serial_oracle import Op, drain

N_KEYS = 12  # tiny domain → heavy contention → interesting conflicts

op_strategy = st.tuples(
    st.integers(min_value=1, max_value=N_KEYS + 4),  # key (some missing)
    st.booleans(),  # is_update
)

txn_strategy = st.lists(op_strategy, min_size=1, max_size=4)
batch_strategy = st.lists(txn_strategy, min_size=1, max_size=6)


def _to_ops(batch) -> list[Op]:
    ops = []
    for tid0, txn in enumerate(batch):
        for seq, (k, upd) in enumerate(txn):
            val = tuple(f"v{tid0 + 1}_{seq}_{j}" for j in range(10)) if upd else None
            ops.append(Op(tid0 + 1, seq, k, upd, val))
    return ops


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batch=batch_strategy, reorder=st.booleans(), insert_missing=st.booleans())
def test_engine_matches_serial_oracle_on_random_batches(
    spark, batch, reorder, insert_missing
):
    ops = _to_ops(batch)
    kv = {k: tuple(f"init{k}_{j}" for j in range(10)) for k in range(1, N_KEYS + 1)}

    expect_kv, expect_stats = drain(
        dict(kv), list(ops), reorder=reorder, insert_missing=insert_missing
    )

    kv_rows = [(k, *v) for k, v in kv.items()]
    kv_df = spark.createDataFrame(
        kv_rows, "k bigint, " + ", ".join(f"f{j} string" for j in range(10))
    )
    op_rows = [
        (o.tid, o.seq, o.k, o.is_update, *(o.new_value or [None] * 10)) for o in ops
    ]
    ops_df = spark.createDataFrame(
        op_rows,
        "tid int, seq int, k bigint, is_update boolean, "
        + ", ".join(f"new_f{j} string" for j in range(10)),
    )

    got_kv_df, got_stats = run_batch(
        kv_df, ops_df, reorder=reorder, insert_missing=insert_missing
    )
    assert got_stats == expect_stats
    got_kv = {r["k"]: tuple(r[f"f{j}"] for j in range(10)) for r in got_kv_df.collect()}
    assert got_kv == expect_kv

    # Same draw through the DISTRIBUTED epoch loop (the default takes the
    # r7 driver-sim fast path at these sizes): both engine paths must
    # match the oracle — and hence each other — on every adversarial case.
    dist_kv_df, dist_stats = run_batch(
        kv_df, ops_df, reorder=reorder, insert_missing=insert_missing,
        driver_sim_threshold=0,
    )
    assert dist_stats == expect_stats
    dist_kv = {r["k"]: tuple(r[f"f{j}"] for j in range(10)) for r in dist_kv_df.collect()}
    assert dist_kv == expect_kv
