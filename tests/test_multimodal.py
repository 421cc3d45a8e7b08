"""Multimodal plumbing tests: schema, Arrow batching, determinism."""

import pytest

from sea_serpent_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    rows = [(1, "hello world"), (2, "spark engine"), (3, "")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return M.attach_binary(df, mime="text/plain")


def test_attach_binary_schema(media):
    schema = dict(media.dtypes)
    assert schema["content"] == "binary"
    assert schema["media_meta"].startswith("struct<mime:string")


def test_extract_features_deterministic(media):
    out1 = {r["doc_id"]: r for r in M.extract_features(media).collect()}
    out2 = {r["doc_id"]: r for r in M.extract_features(media).collect()}
    assert out1[1]["content_hash"] == out2[1]["content_hash"]
    assert out1[1]["feature"] == out2[1]["feature"]
    assert out1[1]["byte_len"] == len(b"hello world")
    assert len(out1[1]["feature"]) == 8
    assert all(0.0 <= v <= 1.0 for v in out1[1]["feature"])


def test_extract_features_is_arrow_batched(media):
    plan = (
        M.extract_features(media)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # mapInPandas shows up as MapInPandas (Arrow), not row-wise BatchEvalPython
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_decode_image_stub_raises():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\x89PNG...")


def test_frame_sample_plan(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(1, 3500), (2, 0)], ["doc_id", "dur"])
    df = df.withColumn(
        "media_meta",
        F.struct(
            F.lit("video/mp4").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.col("dur").cast("long").alias("duration_ms"),
            F.lit("h264").alias("codec"),
        ),
    )
    out = M.frame_sample_plan(df, every_ms=1000).collect()
    frames = [(r["doc_id"], r["frame_idx"], r["frame_ts_ms"]) for r in out]
    assert (1, 0, 0) in frames and (1, 3, 3000) in frames
    assert (2, 0, 0) in frames
    assert len([f for f in frames if f[0] == 1]) == 4


# ---------------------------------------------------------------------------
# round 9: REAL container-header decode (pure stdlib)
# ---------------------------------------------------------------------------

def test_sniff_media_parses_real_headers():
    import io
    import struct
    import wave

    assert M.sniff_media(M.png_bytes(33, 47)) == (
        "image/png", 33, 47, None, "png"
    )
    assert M.sniff_media(M.gif_bytes(5, 9)) == (
        "image/gif", 5, 9, None, "gif"
    )
    assert M.sniff_media(M.bmp_bytes(64, 2)) == (
        "image/bmp", 64, 2, None, "bmp"
    )
    assert M.sniff_media(M.wav_bytes(8 * 77)) == (
        "audio/wav", None, None, 77, "pcm"
    )
    # the generated WAV is a real file: the stdlib wave module reads it
    wf = wave.open(io.BytesIO(M.wav_bytes(8 * 77)))
    assert (wf.getnframes(), wf.getframerate(), wf.getnchannels()) == (
        616, 8000, 1
    )
    # JPEG SOF scan on a handcrafted marker stream (SOI, APP0, SOF0, EOI)
    jpeg = (
        b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 4) + b"JF"
        + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", 13, 21) + b"\x01\x11\x00" + b"\xff\xd9"
    )
    assert M.sniff_media(jpeg) == ("image/jpeg", 21, 13, None, "jpeg")


def test_sniff_media_rejects_garbage_safely():
    none = (None, None, None, None, None)
    assert M.sniff_media(None) == none
    assert M.sniff_media(b"") == none
    assert M.sniff_media(b"plain text, not media") == none
    # truncated headers must not raise
    assert M.sniff_media(b"\x89PNG\r\n\x1a\n" + b"trunc") == none
    assert M.sniff_media(b"RIFF\x04\x00\x00\x00WAVE") == none
    assert M.sniff_media(b"\xff\xd8\xff\xd9") == none  # SOI+EOI, no SOF


def test_attach_media_meta_end_to_end(spark):
    """Synthesized real containers round-trip: the Arrow-batched sniffer
    parses back exactly the dims/durations the generator encoded."""
    import pyspark.sql.functions as F

    ids = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    out = M.attach_media_meta(M.synthesize_test_media(ids)).select(
        "doc_id", "media_meta.*"
    )
    for r in out.collect():
        i = r["doc_id"]
        kind = i % 4
        if kind == 3:
            assert r["mime"] == "audio/wav" and r["codec"] == "pcm"
            assert r["duration_ms"] == 1 + i % 100
            assert r["width"] is None and r["height"] is None
        else:
            assert r["mime"] == ["image/png", "image/gif", "image/bmp"][kind]
            assert r["width"] == 1 + i % 64
            assert r["height"] == 1 + (i * 7) % 64
            assert r["duration_ms"] is None


def test_attach_binary_meta_fallback(media):
    """UTF-8 text payloads are not recognized containers: media_meta
    carries the fallback mime and typed NULLs (never garbage dims)."""
    metas = {r["doc_id"]: r["media_meta"] for r in media.collect()}
    assert metas[1]["mime"] == "text/plain"
    assert metas[1]["width"] is None and metas[1]["duration_ms"] is None


def test_attach_media_meta_is_arrow_batched(spark):
    import pyspark.sql.functions as F

    ids = spark.range(0, 10).select(F.col("id").alias("doc_id"))
    plan = (
        M.attach_media_meta(M.synthesize_test_media(ids))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
