"""r10 optimization-round internals: the new code paths this round
introduced must be pinned by focused tests (round rule: add a test when
an optimization changes an operator's internals).

- ``stream_state_width``: the data-derived stateful-exchange width for
  the fixture-replay streaming runtimes (env override > derived > cap).
- ``run_batch``'s rewritten fast path: the two existence-probe branches
  (full-key prefetch under ``_KEY_PREFETCH_BOUND`` vs bounded broadcast
  probe above it) must produce identical drains — the same table, the
  same schedule.
"""

from __future__ import annotations

import pytest

from bishe_gpu_database_spark.aria import engine
from bishe_gpu_database_spark.aria.engine import run_batch
from bishe_gpu_database_spark.aria.workload import gen_kv, gen_ops


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_state_width_derivation(spark, monkeypatch, tmp_path):
    from bishe_gpu_database_spark.streaming.streams import stream_state_width

    monkeypatch.delenv("SPARK_GRAFT_STREAM_PARTITIONS", raising=False)
    session_w = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # A few-KB source derives ONE state partition (the fixture case).
    (tmp_path / "events.parquet").write_bytes(b"x" * 1024)
    assert stream_state_width(spark, str(tmp_path)) == 1

    # A source past one 64 MB chunk derives ceil(size/64MB), capped at
    # the session width (sparse file keeps the test cheap).
    big = tmp_path / "big"
    big.mkdir()
    with open(big / "events.parquet", "wb") as fh:
        fh.truncate(200 << 20)  # 200 MB -> ceil = 4 partitions
    assert stream_state_width(spark, str(big)) == min(session_w, 4)

    # Missing source: fall back to the session width (no guess).
    assert stream_state_width(spark, str(tmp_path / "nope")) == session_w

    # Explicit deployment override wins outright.
    monkeypatch.setenv("SPARK_GRAFT_STREAM_PARTITIONS", "17")
    assert stream_state_width(spark, str(tmp_path)) == 17


def test_stream_state_width_restores_session_conf(spark, tmp_path):
    """_drain_to_memory must restore spark.sql.shuffle.partitions even
    though the drain runs at the derived width."""
    from pyspark.sql import functions as F

    from bishe_gpu_database_spark.streaming.streams import _drain_to_memory

    before = spark.conf.get("spark.sql.shuffle.partitions")
    src = tmp_path / "stream_src"
    src.mkdir()
    spark.range(5).select(
        F.col("id").alias("k"), F.col("id").cast("double").alias("v")
    ).coalesce(1).write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema("k bigint, v double").parquet(str(src))
    dd = stream.dropDuplicates(["k"])  # stateful, append-legal
    out = _drain_to_memory(
        spark,
        dd.select("k"),
        "r10_width_restore_probe",
        state_width=2,
    )
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    assert len(out.collect()) == 5


@pytest.mark.parametrize("reorder", [True, False])
def test_fastpath_probe_branches_agree(spark, monkeypatch, reorder):
    """Full-key prefetch (table count <= bound) vs bounded broadcast
    probe (bound forced to 0) must drain identically."""
    kv = gen_kv(spark, n_keys=300)
    # Key domain 2x the table so the probe genuinely drops misses.
    ops = gen_ops(
        spark, n_txns=25, max_ops=8, n_keys=600, write_pct=60, seed="r10pb"
    )
    kv_prefetch, stats_prefetch = run_batch(kv, ops, reorder=reorder)
    monkeypatch.setattr(engine, "_KEY_PREFETCH_BOUND", 0)
    kv_probe, stats_probe = run_batch(kv, ops, reorder=reorder)
    assert stats_prefetch == stats_probe
    assert _rows(kv_prefetch) == _rows(kv_probe)


def test_fastpath_empty_ops(spark):
    """A zero-op batch drains to the unchanged table with no epochs on
    the single-collect fast path."""
    kv = gen_kv(spark, n_keys=20)
    ops = gen_ops(spark, n_txns=5, max_ops=4, n_keys=20, seed="r10e").filter(
        "tid < 0"
    )
    out, stats = run_batch(kv, ops, reorder=True)
    assert stats == []
    assert _rows(out) == _rows(kv)
