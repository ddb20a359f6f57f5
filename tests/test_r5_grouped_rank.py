"""r5: grouped partition-offset rank/prefix-sum (functions.rank.grouped_rank)
— the fix for the r4 verdict's low-cardinality-window disease — plus the
hardened global_rank (broadcast-join offsets above 1k partitions, loud
id-layout bounds)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from bishe_gpu_database_spark.functions.rank import (
    _MAP_LITERAL_MAX_PARTS,
    _PID_BITS,
    global_rank,
    grouped_rank,
)


def _fixture_df(spark, n=5000, seed=7, null_x=False):
    """null_x: make x NULL-heavy (~40%), with group 'a' all-NULL in a long
    doc_id prefix — the r5-advice axis (running sums over an all-NULL
    in-partition prefix must match plain Window semantics)."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        g = rng.choice(["a", "b", "c", None])
        v = rng.randint(0, 50)
        x = rng.randint(0, 9)
        if null_x and (rng.random() < 0.4 or (g == "a" and v < 40)):
            x = None  # group 'a': all-NULL prefix under the (v, id) order
        rows.append((g, v, i, x))
    return spark.createDataFrame(rows, "g string, v int, id long, x int")


def test_grouped_rank_matches_window_semantics(spark):
    """rank, per-group count, and inclusive running sum must equal the
    classic Window.partitionBy formulation — including NULL group keys,
    heavy ties in the order prefix, and several range partitions."""
    df = _fixture_df(spark)
    out = grouped_rank(
        df,
        ["g"],
        [F.col("v").asc(), F.col("id").asc()],
        rank_col="rk",
        count_col="n",
        running={"x": "cumx"},
        num_partitions=16,
    )
    got = {(r["g"], r["id"]): (r["rk"], r["n"], r["cumx"]) for r in out.collect()}
    w = W.partitionBy("g").orderBy(F.col("v").asc(), F.col("id").asc())
    exp_df = (
        df.withColumn("rk", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(W.partitionBy("g")))
        .withColumn(
            "cumx", F.sum("x").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        )
    )
    exp = {(r["g"], r["id"]): (r["rk"], r["n"], r["cumx"]) for r in exp_df.collect()}
    assert got == exp


def test_grouped_rank_multi_column_group_and_determinism(spark):
    df = _fixture_df(spark, n=2000, seed=11).withColumn("h", F.col("x") % 3)
    args = (df, ["g", "h"], [F.col("v").asc(), F.col("id").asc()])
    out1 = {
        (r["g"], r["h"], r["id"]): r["rk"]
        for r in grouped_rank(*args, rank_col="rk", num_partitions=8).collect()
    }
    out2 = {
        (r["g"], r["h"], r["id"]): r["rk"]
        for r in grouped_rank(*args, rank_col="rk", num_partitions=64).collect()
    }
    w = W.partitionBy("g", "h").orderBy(F.col("v").asc(), F.col("id").asc())
    exp = {
        (r["g"], r["h"], r["id"]): r["rk"]
        for r in df.withColumn("rk", F.row_number().over(w)).collect()
    }
    # identical across partition counts AND equal to the window oracle
    assert out1 == exp and out2 == exp


def test_grouped_rank_empty_input(spark):
    df = _fixture_df(spark, n=50).filter("v < -1")
    out = grouped_rank(df, ["g"], [F.col("id")], rank_col="rk", count_col="n")
    assert out.count() == 0
    assert {"rk", "n"} <= set(out.columns)


def test_grouped_rank_partition_id_overflow_raises(spark):
    df = _fixture_df(spark, n=10)
    with pytest.raises(ValueError, match="partition-id field"):
        grouped_rank(df, ["g"], [F.col("id")], num_partitions=1 << _PID_BITS)
    with pytest.raises(ValueError, match="partition-id field"):
        global_rank(df, [F.col("id")], num_partitions=1 << _PID_BITS)


def test_global_rank_broadcast_offsets_path_identical(spark):
    """Forcing 2k partitions (> _MAP_LITERAL_MAX_PARTS) switches the
    offsets from a create_map literal to a broadcast join; ranks and
    running sums must be bit-identical to the literal path (r4 verdict
    item 7)."""
    assert 2000 > _MAP_LITERAL_MAX_PARTS
    df = spark.createDataFrame(
        [(i % 97, i, i % 5) for i in range(4000)], "v int, id long, x int"
    )
    order = [F.col("v").asc(), F.col("id").asc()]
    big = {
        r["id"]: (r["rk"], r["cx"])
        for r in global_rank(
            df, order, rank_col="rk", running={"x": "cx"}, num_partitions=2000
        ).collect()
    }
    small = {
        r["id"]: (r["rk"], r["cx"])
        for r in global_rank(
            df, order, rank_col="rk", running={"x": "cx"}, num_partitions=32
        ).collect()
    }
    assert big == small and len(big) == 4000


def test_median_sliding_block_replication_exact(spark, sf_dir):
    """window_median_sliding with tiny 8-row blocks forces hundreds of
    block-boundary replications; results must equal the 512-row default
    (whose blocks rarely split at fixture scale)."""
    from bishe_gpu_database_spark.operators.relational import window_median_sliding

    tiny = {
        (r["event_type"], r["event_id"]): (r["n_in_frame"], r["median_2x_cents"])
        for r in window_median_sliding(spark, sf_dir, block_rows=8).collect()
    }
    default = {
        (r["event_type"], r["event_id"]): (r["n_in_frame"], r["median_2x_cents"])
        for r in window_median_sliding(spark, sf_dir).collect()
    }
    assert tiny == default and len(tiny) > 0


def test_grouped_rank_totals_match_window(spark):
    df = _fixture_df(spark, n=1500, seed=23)
    out = grouped_rank(
        df,
        ["g"],
        [F.col("v").asc(), F.col("id").asc()],
        rank_col="rk",
        running={"x": "runx"},
        totals={"x": "totx"},
        num_partitions=8,
    )
    got = {(r["g"], r["id"]): (r["runx"], r["totx"]) for r in out.collect()}
    w = W.partitionBy("g").orderBy(F.col("v").asc(), F.col("id").asc())
    exp_df = df.withColumn(
        "runx", F.sum("x").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    ).withColumn("totx", F.sum("x").over(W.partitionBy("g")))
    exp = {(r["g"], r["id"]): (r["runx"], r["totx"]) for r in exp_df.collect()}
    assert got == exp


def test_grouped_rank_blocks_forward_replication_lead(spark):
    """The fwd=3 block replication must make lead(1..3) over
    (group, block) identical to lead over the bare group — the
    dedup_sorted_neighborhood shape, forced across many tiny blocks."""
    from bishe_gpu_database_spark.functions.rank import grouped_rank_blocks

    df = _fixture_df(spark, n=800, seed=31)
    pts = grouped_rank_blocks(
        df,
        ["g"],
        [F.col("v").asc(), F.col("id").asc()],
        rank_col="rk",
        block_rows=8,
        fwd=3,
    )
    wb = W.partitionBy("g", "_blk").orderBy("rk")
    got_df = (
        pts.select(
            "g", "id",
            *[F.lead("id", d).over(wb).alias(f"s{d}") for d in (1, 2, 3)],
            "_native",
        )
        .filter(F.col("_native"))
    )
    got = {(r["g"], r["id"]): (r["s1"], r["s2"], r["s3"]) for r in got_df.collect()}
    wg = W.partitionBy("g").orderBy(F.col("v").asc(), F.col("id").asc())
    exp_df = df.select(
        "g", "id", *[F.lead("id", d).over(wg).alias(f"s{d}") for d in (1, 2, 3)]
    )
    exp = {(r["g"], r["id"]): (r["s1"], r["s2"], r["s3"]) for r in exp_df.collect()}
    assert got == exp and len(got) == 800


def test_grouped_rank_blocks_back_and_fwd_validation(spark):
    from bishe_gpu_database_spark.functions.rank import grouped_rank_blocks

    df = _fixture_df(spark, n=10)
    with pytest.raises(ValueError, match="must be <"):
        grouped_rank_blocks(df, ["g"], [F.col("id")], block_rows=8, back=5, fwd=3)


def test_grouped_rank_null_running_sums_match_window(spark):
    """r5 advice (high): a group whose in-partition prefix is all-NULL
    must NOT null out the cross-partition running-sum offset; conversely
    the sum must stay NULL until the group's first non-null value. Forced
    with 64 range partitions so group 'a''s long all-NULL prefix spans
    many partition boundaries, under every partition-count regime."""
    df = _fixture_df(spark, n=4000, seed=13, null_x=True)
    w = W.partitionBy("g").orderBy(F.col("v").asc(), F.col("id").asc())
    exp_df = df.withColumn(
        "cumx", F.sum("x").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    ).withColumn("totx", F.sum("x").over(W.partitionBy("g")))
    exp = {(r["g"], r["id"]): (r["cumx"], r["totx"]) for r in exp_df.collect()}
    for nparts in (4, 64):
        out = grouped_rank(
            df,
            ["g"],
            [F.col("v").asc(), F.col("id").asc()],
            rank_col="rk",
            running={"x": "cumx"},
            totals={"x": "totx"},
            num_partitions=nparts,
        )
        got = {(r["g"], r["id"]): (r["cumx"], r["totx"]) for r in out.collect()}
        assert got == exp, f"NULL running-sum divergence at {nparts} partitions"


def test_global_rank_null_running_sums_match_window(spark):
    """Same NULL axis for global_rank — including the broadcast-join
    offsets path (2000 > _MAP_LITERAL_MAX_PARTS) — against the
    single-partition window oracle."""
    rng = random.Random(17)
    rows = [
        (i, None if (i < 500 or rng.random() < 0.3) else rng.randint(0, 9))
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "id long, x int")
    w = W.orderBy(F.col("id").asc()).rowsBetween(W.unboundedPreceding, W.currentRow)
    exp = {r["id"]: r["cx"] for r in df.withColumn("cx", F.sum("x").over(w)).collect()}
    for nparts in (8, 2000):
        got = {
            r["id"]: r["cx"]
            for r in global_rank(
                df, [F.col("id").asc()], running={"x": "cx"}, num_partitions=nparts
            ).collect()
        }
        assert got == exp, f"NULL running-sum divergence at {nparts} partitions"


def test_grouped_rank_overflow_guard_survives_optimizer(spark):
    """r5 advice (low): the 2^33 id-counter overflow assert must survive
    Catalyst column pruning — the old .alias()+.drop() form compiled to
    NOTHING. The guard now rides a Filter on the aggregated max, which
    pruning cannot remove: assert_true must appear in the optimized plan."""
    df = _fixture_df(spark, n=100)
    out = grouped_rank(df, ["g"], [F.col("id").asc()], rank_col="rk")
    optimized = out._jdf.queryExecution().optimizedPlan().toString()
    # Catalyst lowers assert_true to `if (cond) null else raise_error(...)`
    assert "raise_error" in optimized and "id-counter bound" in optimized, (
        "overflow guard pruned from the optimized plan:\n" + optimized[:2000]
    )
    # and it must not disturb results
    assert out.count() == 100


def test_grouped_rank_2k_partitions_identical(spark):
    """Cluster-scale partition counts: 2000 range partitions (far above
    the 32-core default) must yield bit-identical grouped ranks and
    running sums — the cells table grows to #groups + #partitions rows
    and the broadcast join must keep pace (companion to the global_rank
    2k-partition test, r4 verdict item 7)."""
    df = _fixture_df(spark, n=3000, seed=41)
    args = dict(rank_col="rk", running={"x": "cx"})
    big = {
        (r["g"], r["id"]): (r["rk"], r["cx"])
        for r in grouped_rank(
            df, ["g"], [F.col("v").asc(), F.col("id").asc()],
            num_partitions=2000, **args
        ).collect()
    }
    small = {
        (r["g"], r["id"]): (r["rk"], r["cx"])
        for r in grouped_rank(
            df, ["g"], [F.col("v").asc(), F.col("id").asc()],
            num_partitions=8, **args
        ).collect()
    }
    assert big == small and len(big) == 3000
