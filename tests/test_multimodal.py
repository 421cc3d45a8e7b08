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
