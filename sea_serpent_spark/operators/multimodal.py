"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Beyond-reference extension. The reference's type system has image/file URL
columns (utils.py:31-32); here they generalize to Spark-native binary
payload columns with a metadata struct, and the decode / feature-extract /
resize / frame-sample stages run as Arrow-batched ``mapInPandas`` pipelines
— the correct shape for 100 TB: batches stream through Python workers with
columnar transfer, partitioning preserved, no driver involvement.

The actual codec calls are STUBBED (this container has no image/audio
libraries): ``decode_image``/``decode_audio`` raise NotImplementedError
behind an import-try, and ``fake_decode`` produces deterministic
pseudo-features from the bytes so the Spark-side plumbing (schema,
batching, UDF signatures) is real and testable end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: metadata struct carried next to every binary payload
MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("codec", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_binary(df: DataFrame, text_col: str = "text",
                  mime: str = "application/octet-stream") -> DataFrame:
    """Deterministic binary payload column from an existing text column
    (test substitute for reading real media files) + metadata struct."""
    return df.withColumn("content", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("string").alias("codec"),
        ),
    )


def decode_image(data: bytes):
    """Real image decode — STUB: no imaging library in this container.

    Production: ``from PIL import Image; Image.open(io.BytesIO(data))``
    inside the mapInPandas worker; the Spark-side pipeline is unchanged."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - always taken here
        raise NotImplementedError(
            "image decoding requires an imaging library not present in "
            "this environment; use fake_decode for plumbing tests"
        ) from e


def fake_decode(data: bytes, dim: int = 8) -> list[float]:
    """Deterministic pseudo-feature vector from content bytes (sha256-
    seeded) — stands in for a real decoder+encoder so batching, schema
    and partitioning behavior are exercised for real."""
    h = hashlib.sha256(data or b"").digest()
    return [h[i] / 255.0 for i in range(dim)]


def extract_features(
    df: DataFrame, content_col: str = "content", id_col: str = "doc_id",
    dim: int = 8, batch_note: bool = False,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas streams column batches through the Python worker —
    the only Python stage in the engine, used exactly where SURVEY §2.8
    prescribes the pandas escape. Output schema is fixed (FEATURE_SCHEMA)
    so downstream joins/aggregations plan normally."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf[content_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "byte_len": content.map(
                        lambda b: len(b) if b is not None else 0
                    ).astype("int64"),
                    "content_hash": content.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": content.map(lambda b: fake_decode(b, dim)),
                }
            )

    from .util import fan_out

    # fan_out: media extraction is CPU-bound per row, and a small file
    # count must not bound worker parallelism (one split = one Python
    # worker otherwise — the same posture as the text/pair operators)
    return fan_out(df.select(id_col, content_col)).mapInPandas(
        _extract, schema=FEATURE_SCHEMA
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000,
                      id_col: str = "doc_id") -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp, derived from metadata only (decode stubbed). Demonstrates
    the explode-by-schedule shape used for real frame extraction."""
    n_frames = F.greatest(
        (F.col("media_meta.duration_ms") / every_ms).cast("int"), F.lit(0)
    )
    return df.select(
        id_col,
        F.explode(
            F.sequence(F.lit(0), n_frames)
        ).alias("frame_idx"),
    ).withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
