"""r4 self-audit (VERDICT r3 item 8): degenerate-input and blind-spot
assertions over the newest machinery — the partition-offset global rank,
the exact ntile re-derivation, the CDC merge's presence test, the drain
schedule's zero-op semantics, the workload generator's empty-sequence
regression, and the M4 composite tie-break.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bishe_gpu_database_spark.aria.workload import gen_ops
from bishe_gpu_database_spark.functions.rank import global_rank, ntile_from_rank
from bishe_gpu_database_spark.operators.cdc import apply_changelog


def test_global_rank_empty_input(spark):
    """Empty input → empty output, no driver-side crash on the offsets
    collect (the n=0 path builds a lit(0) offset, not element_at({}))."""
    df = spark.createDataFrame([], "v bigint, id bigint")
    out = global_rank(
        df, [F.col("v").asc(), F.col("id").asc()], rank_col="rk", total_col="n"
    )
    assert out.collect() == []


def test_global_rank_matches_local_sort_with_ties_and_negatives(spark):
    rows = [(5, 1), (5, 2), (-3, 3), (0, 4), (5, 5), (-3, 6), (7, 7)]
    df = spark.createDataFrame(rows, "v int, id int")
    got = {
        r["id"]: (r["rk"], r["n"], r["cum"])
        for r in global_rank(
            df,
            [F.col("v").desc(), F.col("id").asc()],
            rank_col="rk",
            total_col="n",
            running={"v": "cum"},
        ).collect()
    }
    expected_order = sorted(rows, key=lambda r: (-r[0], r[1]))
    cum = 0
    for rank, (v, rid) in enumerate(expected_order, start=1):
        cum += v
        assert got[rid] == (rank, len(rows), cum), (rid, got[rid])


def test_ntile_from_rank_matches_spark_ntile(spark):
    """Exactness across the bucket-size edge cases: n < k, n = k,
    n % k ∈ {0, 1, k-1}, and n = 1."""
    from pyspark.sql import Window as W

    for n, k in [(1, 4), (3, 5), (5, 5), (12, 5), (11, 5), (14, 5), (40, 4)]:
        df = spark.range(1, n + 1).select(F.col("id").cast("bigint").alias("rk"))
        df = df.withColumn("n", F.lit(n).cast("bigint"))
        mine = {
            r["rk"]: r["nt"]
            for r in df.select("rk", ntile_from_rank("rk", "n", k).alias("nt")).collect()
        }
        theirs = {
            r["rk"]: r["nt"]
            for r in df.select(
                "rk", F.ntile(k).over(W.orderBy("rk")).alias("nt")
            ).collect()
        }
        assert mine == theirs, (n, k, mine, theirs)


def test_apply_changelog_null_balance_is_updated_not_inserted(spark):
    """A snapshot key whose balance is legitimately NULL must classify as
    'updated' when the changelog touches it — presence is row existence,
    not balance non-NULLness (r4 audit find)."""
    snap = spark.createDataFrame([(1, None), (2, 100)], "k int, bal_cents int")
    latest = spark.createDataFrame(
        [(1, "U", 55), (3, "U", 77)], "k int, op string, new_bal_cents int"
    )
    out = {r["k"]: (r["bal_cents"], r["action"]) for r in
           apply_changelog(snap, latest).collect()}
    assert out[1] == (55, "updated")
    assert out[2] == (100, "kept")
    assert out[3] == (77, "inserted")


def test_gen_ops_zero_op_txns_emit_no_ops(spark):
    """sequence(0, -1) regression: tids drawing op_count = 0 (23, 114,
    130 under the default seed) must contribute ZERO ops — Spark's
    step-inference would otherwise fabricate seq ∈ {0, -1} phantom ops,
    diverging from the reference's U(0, max_ops) semantics."""
    ops = gen_ops(spark, n_txns=150, max_ops=30, n_keys=2000, write_pct=40)
    zero_op = ops.filter(F.col("tid").isin([23, 114, 130])).count()
    assert zero_op == 0
    assert ops.filter(F.col("seq") < 0).count() == 0
    assert ops.select("tid").distinct().count() == 147


def test_drain_schedule_excludes_zero_op_txns(spark):
    """Zero-op transactions never enter the epoch loop (they trivially
    commit with no reservations); epoch 1 must carry exactly the 147
    op-bearing tids and every tid must eventually commit exactly once."""
    from bishe_gpu_database_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    rows = REGISTRY["aria_drain_schedule"].fn(spark, "unused").collect()
    epoch1 = [r for r in rows if r["epoch"] == 1]
    assert len(epoch1) == 147
    assert not any(r["tid"] in (23, 114, 130) for r in rows)
    commits = [r["tid"] for r in rows if r["committed"]]
    assert len(commits) == 147 and len(set(commits)) == 147


def test_m4_composite_tiebreak_is_value_deterministic(spark):
    """Duplicate (series, timestamp) points: v_first/v_last must break
    the tie by VALUE (min cents first, max cents last), not by
    encounter order (r3 ADVICE on timeseries_downsample_m4)."""
    df = spark.createDataFrame(
        [("a", 10, 9), ("a", 10, 3), ("a", 20, 5), ("a", 20, 7)],
        "event_type string, tsu long, cents long",
    )
    ordk = "CAST(tsu AS DECIMAL(38,0)) * 1000000 + cents"
    (r,) = (
        df.groupBy("event_type")
        .agg(
            F.expr(f"min_by(cents, {ordk})").alias("v_first"),
            F.expr(f"max_by(cents, {ordk})").alias("v_last"),
        )
        .collect()
    )
    assert (r["v_first"], r["v_last"]) == (3, 7)


def test_drain_schedule_oracle_shallow_unroll_fails_loudly(spark):
    """The unroll-depth guard: an oracle unrolled SHALLOWER than the
    actual drain must produce FEWER rows (epochs past the unroll vanish),
    so the parity row-count gate catches a too-short unroll — it can
    never silently agree. Also pins the engine's drain length (9 epochs
    on the default workload) so an unnoticed drain-length change shows up
    here before it shows up as an oracle truncation."""
    import duckdb

    from bishe_gpu_database_spark.aria.queries import _drain_schedule_oracle
    from bishe_gpu_database_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    engine_rows = REGISTRY["aria_drain_schedule"].fn(spark, "unused").collect()
    n_epochs = max(r["epoch"] for r in engine_rows)
    assert n_epochs == 9
    shallow = duckdb.connect().execute(_drain_schedule_oracle(4)).fetchall()
    full = duckdb.connect().execute(_drain_schedule_oracle()).fetchall()
    assert len(shallow) < len(engine_rows) == len(full)
