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


# ---- r5: the codec switch extended to resize / frame-sample / audio ----


def test_resize_auto_equals_stub_without_pil(spark):
    from bishe_gpu_database_spark.operators.multimodal import (
        _fake_resize,
        resize_payloads,
        select_resizer,
    )

    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present: auto resolves to the real codec here")
    except ImportError:
        pass
    stub = {tuple(r) for r in resize_payloads(_payload_df(spark), codec="stub").collect()}
    auto = {tuple(r) for r in resize_payloads(_payload_df(spark), codec="auto").collect()}
    assert stub == auto and len(stub) == 30
    assert select_resizer("auto") is _fake_resize


def test_frames_auto_equals_stub_without_pil(spark):
    from bishe_gpu_database_spark.operators.multimodal import (
        _fake_frames,
        sample_frames,
        select_frame_sampler,
    )

    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present: auto resolves to the real codec here")
    except ImportError:
        pass
    stub = {tuple(r) for r in sample_frames(_payload_df(spark), codec="stub").collect()}
    auto = {tuple(r) for r in sample_frames(_payload_df(spark), codec="auto").collect()}
    assert stub == auto and len(stub) == 90  # 30 docs x 3 frames
    assert select_frame_sampler("auto") is _fake_frames


def test_real_resize_png(spark):
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    from bishe_gpu_database_spark.operators.multimodal import resize_payloads

    img = PIL_Image.new("L", (128, 64), color=10)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()))], "doc_id bigint, payload binary"
    )
    (r,) = resize_payloads(df, target_w=64, codec="real").collect()
    assert r["new_w"] == 64 and r["new_bytes"] > 0


def test_real_frames_gif(spark):
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    from bishe_gpu_database_spark.operators.multimodal import sample_frames

    frames = [PIL_Image.new("L", (4, 4), color=c) for c in (0, 80, 160, 240)]
    buf = io.BytesIO()
    frames[0].save(buf, format="GIF", save_all=True, append_images=frames[1:])
    df = spark.createDataFrame(
        [(7, bytearray(buf.getvalue()))], "doc_id bigint, payload binary"
    )
    rows = sample_frames(df, n_frames=3, codec="real").collect()
    assert 1 <= len(rows) <= 3
    assert all(0 <= r["frame_checksum"] < 97 for r in rows)


def _wav_bytes(n_samples: int, sr: int) -> bytes:
    """A real PCM16 mono WAV, built with stdlib wave — no codec libs."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(bytes(2 * n_samples))
    return buf.getvalue()


def test_real_audio_wav_header(spark):
    """The real audio path RUNS in this container (stdlib wave): a
    8000-sample 16 kHz WAV yields floor((8000-400)/160)+1 = 48 windows
    with true micro-second starts."""
    from bishe_gpu_database_spark.operators.multimodal import audio_windows

    df = spark.createDataFrame(
        [(1, bytearray(_wav_bytes(8000, 16000)))], "doc_id bigint, payload binary"
    )
    rows = sorted(audio_windows(df, codec="real").collect(), key=lambda r: r["win_id"])
    assert len(rows) == (8000 - 400) // 160 + 1 == 48
    assert rows[0]["start_us"] == 0 and rows[1]["start_us"] == 160 * 1_000_000 // 16000
    assert all(r["n_win_samples"] == 400 for r in rows)


def test_real_audio_respects_sample_rate(spark):
    """At 8 kHz the 25 ms window is 200 samples and the 10 ms hop is 80 —
    the window math follows the PROBED rate, not the stub constant."""
    from bishe_gpu_database_spark.operators.multimodal import audio_windows

    df = spark.createDataFrame(
        [(2, bytearray(_wav_bytes(2000, 8000)))], "doc_id bigint, payload binary"
    )
    rows = audio_windows(df, codec="real").collect()
    assert len(rows) == (2000 - 200) // 80 + 1
    assert all(r["n_win_samples"] == 200 for r in rows)


def test_audio_auto_mixed_corpus(spark):
    """'auto' parses the WAV payload for real and falls back to the stub
    for the text payload — per-payload tolerance, both rows survive."""
    from bishe_gpu_database_spark.operators.multimodal import audio_windows

    text_payload = bytes(range(256)) * 4  # 1024 'samples' for the stub
    df = spark.createDataFrame(
        [
            (1, bytearray(_wav_bytes(800, 16000))),
            (2, bytearray(text_payload)),
        ],
        "doc_id bigint, payload binary",
    )
    rows = audio_windows(df, codec="auto").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == (800 - 400) // 160 + 1  # real WAV header
    assert len(by_doc[2]) == (1024 - 400) // 160 + 1  # stub bytes-as-samples


def test_audio_stub_matches_registered_query(spark):
    from bishe_gpu_database_spark.operators.multimodal import (
        audio_windows,
        multimodal_audio_windows,
    )
    from tests.conftest import SF_SMALL

    via_query = {tuple(r) for r in multimodal_audio_windows(spark, SF_SMALL).collect()}
    via_lib = {
        tuple(r)
        for r in audio_windows(
            __import__(
                "bishe_gpu_database_spark.operators.relational", fromlist=["t"]
            ).t(spark, SF_SMALL, "documents").select(
                "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
            ),
            codec="stub",
        ).collect()
    }
    assert via_query == via_lib and len(via_query) > 0
