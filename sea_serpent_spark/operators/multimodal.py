"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Beyond-reference extension. The reference's type system has image/file URL
columns (utils.py:31-32); here they generalize to Spark-native binary
payload columns with a metadata struct, and the decode / feature-extract /
resize / frame-sample stages run as Arrow-batched ``mapInPandas`` pipelines
— the correct shape for 100 TB: batches stream through Python workers with
columnar transfer, partitioning preserved, no driver involvement.

Pixel/sample decoding is STUBBED (this container has no image/audio
libraries): ``decode_image``/``decode_audio`` raise NotImplementedError
behind an import-try, and ``fake_decode`` produces deterministic
pseudo-features from the bytes so the Spark-side plumbing (schema,
batching, UDF signatures) is real and testable end-to-end.

Container METADATA decoding is REAL: :func:`sniff_media` parses
PNG / GIF / BMP / JPEG headers (dimensions) and RIFF/WAVE chunk lists
(PCM duration) with pure-stdlib ``struct`` — no imaging library needed,
because the numbers live in the container header, not the pixel data.
``attach_media_meta`` runs it as an Arrow-batched pandas UDF, so
``media_meta`` carries real width/height/duration for those formats
(and typed NULLs, never garbage, for everything else).
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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
    (test substitute for reading real media files) + metadata struct.
    ``media_meta`` is populated by the REAL header sniffer
    (:func:`attach_media_meta`): recognized containers get actual
    dimensions/duration; anything else (like these UTF-8 payloads) gets
    the ``mime`` fallback and typed NULLs."""
    return attach_media_meta(
        df.withColumn("content", F.encode(F.col(text_col), "UTF-8")),
        fallback_mime=mime,
    )


# ---------------------------------------------------------------------------
# REAL container-header metadata (pure stdlib — no imaging library)
# ---------------------------------------------------------------------------

#: JPEG start-of-frame markers that carry dimensions (every SOFn except
#: the arithmetic/huffman table markers C4, C8, CC). ITU-T T.81 §B.2.2.
_JPEG_SOF = {
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
}


def _sniff_jpeg(b: bytes):
    """Walk JPEG marker segments to the first SOFn frame header —
    height/width are big-endian uint16 at offsets 3/5 of its payload
    (ITU-T T.81 Table B.2)."""
    i = 2
    n = len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:  # desynchronized — not a parseable stream
            return None
        marker = b[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers carry no length
            continue
        if marker == 0xD9:  # EOI before any frame header
            return None
        (seglen,) = struct.unpack(">H", b[i + 2:i + 4])
        if marker in _JPEG_SOF and i + 9 <= n:
            h, w = struct.unpack(">HH", b[i + 5:i + 9])
            return ("image/jpeg", w, h, None, "jpeg")
        if marker == 0xDA:  # SOS — entropy data follows, no SOF seen
            return None
        i += 2 + seglen
    return None


def _sniff_wav(b: bytes):
    """Walk RIFF chunks: ``fmt `` gives the byte rate, ``data`` the
    payload size; duration_ms = data_size · 1000 / byte_rate (RIFF/WAVE,
    Microsoft multimedia spec)."""
    byte_rate = None
    data_size = None
    codec = None
    i = 12
    n = len(b)
    while i + 8 <= n:
        cid = b[i:i + 4]
        (size,) = struct.unpack("<I", b[i + 4:i + 8])
        if cid == b"fmt " and i + 24 <= n:
            fmt_tag, _ch, _rate, byte_rate = struct.unpack(
                "<HHII", b[i + 8:i + 20]
            )
            codec = "pcm" if fmt_tag == 1 else f"wav_fmt_{fmt_tag}"
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if byte_rate and data_size is not None:
        return (
            "audio/wav", None, None,
            (data_size * 1000) // byte_rate, codec,
        )
    return None


def sniff_media(data) -> tuple:
    """→ (mime, width, height, duration_ms, codec) parsed from the
    container header, or all-None when the payload is not a recognized
    container. Pure stdlib ``struct`` against the published container
    specs — PNG (RFC 2083 §3.1/§4.1.1: 8-byte signature then IHDR with
    big-endian dims), GIF (GIF89a spec: little-endian logical screen
    descriptor), BMP (BITMAPINFOHEADER: signed little-endian dims,
    height negative for top-down), JPEG (SOFn scan), WAV (RIFF chunk
    walk). Header parsing needs no codec library — only pixel/sample
    DECODING does (that part stays behind :func:`decode_image`)."""
    none = (None, None, None, None, None)
    if not data:
        return none
    b = bytes(data)
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 \
                and b[12:16] == b"IHDR":
            w, h = struct.unpack(">II", b[16:24])
            return ("image/png", w, h, None, "png")
        if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            w, h = struct.unpack("<HH", b[6:10])
            return ("image/gif", w, h, None, "gif")
        if b[:2] == b"BM" and len(b) >= 26:
            w, h = struct.unpack("<ii", b[18:26])
            return ("image/bmp", abs(w), abs(h), None, "bmp")
        if b[:3] == b"\xff\xd8\xff":
            return _sniff_jpeg(b) or none
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            return _sniff_wav(b) or none
    except (struct.error, IndexError):  # truncated header
        return none
    return none


def attach_media_meta(
    df: DataFrame,
    content_col: str = "content",
    fallback_mime: str | None = None,
) -> DataFrame:
    """Populate ``media_meta`` (MEDIA_META struct) from each payload's
    REAL container header via :func:`sniff_media`, as an Arrow-batched
    pandas UDF (one Python pass per batch — the prescribed §2.8 escape;
    header sniffing is a few byte compares per row, so the batch is
    I/O-bound on the Arrow transfer, which is the floor).
    Unrecognized payloads get ``fallback_mime`` and typed NULLs."""
    fb = fallback_mime

    @F.pandas_udf(MEDIA_META)
    def _meta(content: pd.Series) -> pd.DataFrame:
        rows = [sniff_media(b) for b in content]
        out = pd.DataFrame(
            rows,
            columns=["mime", "width", "height", "duration_ms", "codec"],
        )
        if fb is not None:
            out["mime"] = out["mime"].fillna(fb)
        return out

    return df.withColumn("media_meta", _meta(F.col(content_col)))


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


def png_bytes(w: int, h: int) -> bytes:
    """A COMPLETE valid PNG (8-bit grayscale, zero pixels): signature +
    IHDR + zlib-compressed IDAT + IEND, each chunk CRC'd per RFC 2083
    §3.2 — stdlib ``struct`` + ``zlib`` only."""

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload)) + typ + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(w) for _ in range(h))  # filter-0 rows
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def gif_bytes(w: int, h: int) -> bytes:
    """Minimal GIF89a: header + logical screen descriptor + trailer."""
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00" + b"\x3b"


def bmp_bytes(w: int, h: int) -> bytes:
    """A complete valid 24-bit BMP (zeroed pixels, 4-byte row padding
    per the BITMAPINFOHEADER spec)."""
    row = (w * 3 + 3) // 4 * 4
    pix = row * h
    header = b"BM" + struct.pack("<IHHI", 54 + pix, 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, pix, 2835, 2835, 0, 0
    )
    return header + dib + bytes(pix)


def wav_bytes(n_samples: int, rate: int = 8000) -> bytes:
    """A complete valid 16-bit mono PCM RIFF/WAVE of silence."""
    data = bytes(2 * n_samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def synthesize_test_media(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """→ [id_col, content]: one REAL media container per row, format
    cycling by ``id % 4`` (png, gif, bmp, wav) with dimensions derived
    from the id — ``width = 1 + id % 64``, ``height = 1 + (id·7) % 64``,
    wav duration ``1 + id % 100`` ms (8 samples/ms at 8 kHz · 16-bit
    mono). The arithmetic is deliberately closed-form so an external
    oracle can predict, in SQL, exactly what :func:`sniff_media` must
    parse OUT of the generated headers — an end-to-end bytes-level check
    of the real parsers, not a fixture comparison."""

    @F.pandas_udf(T.BinaryType())
    def _gen(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            w, h = 1 + i % 64, 1 + (i * 7) % 64
            kind = i % 4
            if kind == 0:
                out.append(png_bytes(w, h))
            elif kind == 1:
                out.append(gif_bytes(w, h))
            elif kind == 2:
                out.append(bmp_bytes(w, h))
            else:
                out.append(wav_bytes(8 * (1 + i % 100)))
        return pd.Series(out)

    return df.select(F.col(id_col), _gen(F.col(id_col)).alias("content"))


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
