"""The optional real-codec decode path (r3 verdict item 7).

``decode_features`` must run the SAME Arrow/mapInPandas plumbing for all
three codec modes; only the per-payload callable differs. In a container
without PIL, 'auto' must be byte-identical to 'stub'; with PIL installed
the 'real' assertions run (importorskip) against an in-memory PNG.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bishe_gpu_database_spark.operators.multimodal import (
    _fake_decode,
    decode_features,
    select_decoder,
)
from bishe_gpu_database_spark.operators.relational import t
from tests.conftest import SF_SMALL


def _payload_df(spark):
    return (
        t(spark, SF_SMALL, "documents")
        .filter(F.col("doc_id") < 30)
        .select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    )


def test_stub_decode_contract(spark):
    rows = decode_features(_payload_df(spark), codec="stub").collect()
    assert len(rows) == 30
    for r in rows:
        assert 1 <= r["width"] <= 640 and 1 <= r["height"] <= 480
        assert r["mean_px"] >= 0.0


def test_auto_equals_stub_without_pil(spark):
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present: auto resolves to the real codec here")
    except ImportError:
        pass
    stub = {(r["doc_id"], r["width"], r["height"], r["mean_px"])
            for r in decode_features(_payload_df(spark), codec="stub").collect()}
    auto = {(r["doc_id"], r["width"], r["height"], r["mean_px"])
            for r in decode_features(_payload_df(spark), codec="auto").collect()}
    assert stub == auto
    assert select_decoder("auto") is _fake_decode


def test_real_codec_decodes_png(spark):
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    img = PIL_Image.new("L", (5, 3), color=200)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))], "doc_id bigint, payload binary")
    (r,) = decode_features(df, codec="real").collect()
    assert (r["width"], r["height"]) == (5, 3)
    assert r["mean_px"] == pytest.approx(200.0)
