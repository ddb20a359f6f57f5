"""r8: startup width guard for stateful streaming checkpoints.

Spark persists ``spark.sql.shuffle.partitions`` into a stateful query's
checkpoint (state-store count == partition count; state cannot be
repartitioned later) and on restart silently KEEPS the checkpointed
width. A user who widened the session to scale out therefore gets the
old width with no warning — the failure mode behind the wide parity
sweep's width-pinned-by-design skip list (PARITY_WIDE2000.json).
``streams.assert_checkpoint_width`` turns that into a loud startup
error with remediation."""

from __future__ import annotations

import pytest

from bishe_gpu_database_spark.streaming.streams import (
    CheckpointWidthMismatch,
    assert_checkpoint_width,
    run_tumbling_runtime,
)


def test_width_guard_fires_on_mismatch_and_passes_on_match(spark, sf_dir, tmp_path):
    ckpt = str(tmp_path / "ckpt_tumbling")
    width0 = spark.conf.get("spark.sql.shuffle.partitions")

    # fresh checkpoint: nothing pinned yet, guard is a no-op
    assert assert_checkpoint_width(spark, ckpt) is None

    # first run commits offsets that pin the session width
    run_tumbling_runtime(spark, sf_dir, checkpoint_location=ckpt)
    assert assert_checkpoint_width(spark, ckpt) == int(width0)

    # deliberately mismatch the session width: the guard must fail with
    # remediation BEFORE the query would start
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(int(width0) + 7))
        with pytest.raises(CheckpointWidthMismatch, match="fresh checkpoint"):
            assert_checkpoint_width(spark, ckpt)
        # the runtime helper itself runs the guard when resuming
        with pytest.raises(CheckpointWidthMismatch):
            run_tumbling_runtime(spark, sf_dir, checkpoint_location=ckpt)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", width0)

    # width restored: resume is allowed again
    assert assert_checkpoint_width(spark, ckpt) == int(width0)
