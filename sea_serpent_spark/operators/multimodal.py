"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Beyond-reference extension. The reference's type system has image/file URL
columns (utils.py:31-32); here they generalize to Spark-native binary
payload columns with a metadata struct, and the decode / feature-extract /
resize / frame-sample stages run as Arrow-batched ``mapInPandas`` pipelines
— the correct shape for 100 TB: batches stream through Python workers with
columnar transfer, partitioning preserved, no driver involvement.

Media decoding is REAL, pure stdlib (r9):

- METADATA: :func:`sniff_media` parses PNG / GIF / BMP / JPEG headers
  (dimensions) and RIFF/WAVE chunk lists (PCM duration) with ``struct``;
  ``attach_media_meta`` runs it as an Arrow-batched pandas UDF, so
  ``media_meta`` carries real width/height/duration (typed NULLs,
  never garbage, for unrecognized payloads).
- CONTENT: :func:`decode_image` decodes PNG (zlib inflate + all five
  RFC 2083 scanline filters), BMP (bottom-up padded rows), GIF
  (full variable-width LZW + interlace, :func:`_lzw_decode`), and JPEG
  — BOTH baseline-sequential AND progressive (huffman + dequant + 8×8
  IDCT + YCbCr→RGB; progressive scans with spectral selection,
  successive approximation, and EOB runs accumulate into a
  coefficient store, :func:`_decode_jpeg` — r10);
  :func:`decode_audio` reads PCM 8/16/24/32-bit and 32-bit IEEE-float
  WAV samples (r12), mono or multi-channel, via the ``wave`` module
  plus a direct RIFF walk for the float format it rejects. :func:`extract_media_content` streams them through
  ``mapInPandas``.

Lossless/hierarchical/arithmetic-coded JPEG stay out of scope
(NotImplementedError); ``fake_decode`` remains as the deterministic
feature-vector stand-in for the embedding-model stage a real pipeline
would plug in.
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
            codec = {
                1: "pcm", 3: "pcm_float", 6: "alaw", 7: "ulaw",
            }.get(fmt_tag, f"wav_fmt_{fmt_tag}")
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


def decode_image(data: bytes) -> tuple[int, int, int, bytes]:
    """REAL pixel decode, pure stdlib + numpy —
    → (width, height, channels, pixel bytes, row-major, top-down).

    - PNG: zlib inflate + full scanline UNFILTERING (all five filter
      types of RFC 2083 §6: none/sub/up/average/paeth) for 8-bit
      gray/RGB/gray+alpha/RGBA, non-interlaced (:func:`_decode_png`).
    - BMP: bottom-up padded 24-bit rows re-ordered to top-down BGR
      (:func:`_decode_bmp`).
    - GIF: full variable-width LZW + palette mapping
      (:func:`_decode_gif` / :func:`_lzw_decode`).
    - JPEG: sequential AND progressive JFIF from scratch — huffman
      entropy decode (incl. progressive spectral selection, successive
      approximation, and EOBn runs), dequantize, 8×8 IDCT, chroma
      upsample, YCbCr→RGB, and 4-component Adobe CMYK/YCCK (APP14
      transform byte, inverted samples, un-ink to RGB — r13)
      (:func:`_decode_jpeg`). Lossless/hierarchical/arithmetic
      variants raise NotImplementedError (vanishingly rare in scraped
      corpora; a PIL-backed decoder drops into the same mapInPandas
      worker unchanged).

    Unrecognized containers raise ValueError."""
    b = bytes(data or b"")
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n":
            return _decode_png(b)
        if b[:2] == b"BM":
            return _decode_bmp(b)
        if b[:6] in (b"GIF87a", b"GIF89a"):
            return _decode_gif(b)
        if b[:3] == b"\xff\xd8\xff":
            return _decode_jpeg(b)
    except (struct.error, zlib.error, IndexError, KeyError,
            ZeroDivisionError) as e:
        # truncated/corrupted container (the common scrape defect) —
        # surface ONE clean error type, never a raw codec exception
        # (found by the hypothesis fuzz over valid-prefix + garbage)
        raise ValueError(f"corrupt or truncated container: {e}") from e
    raise ValueError("unrecognized image container")


#: Decode-size guard: a corrupt (or hostile) header can declare
#: 65535×65535 and demand multi-GB coefficient/pixel allocations in the
#: Python worker before ANY pixel data is validated — the r10
#: corruption fuzz thrashed on exactly this. 2^26 px = 64 megapixels,
#: far above any sane training-corpus image; raise it deliberately if
#: a pipeline really decodes gigapixel media.
MAX_DECODE_PIXELS = 1 << 26


def _check_dims(w: int, h: int) -> None:
    if w <= 0 or h <= 0 or w * h > MAX_DECODE_PIXELS:
        raise ValueError(
            f"refusing to decode a {w}x{h} image "
            f"(cap MAX_DECODE_PIXELS={MAX_DECODE_PIXELS})"
        )


def _paeth(a: int, b: int, c: int) -> int:
    """PNG paeth predictor (RFC 2083 §6.6)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


#: Adam7 pass geometry (RFC 2083 §2.6): (x0, y0, dx, dy) per pass —
#: pass p covers pixels (x0 + i·dx, y0 + j·dy).
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(
    raw: bytes, offset: int, w: int, h: int, channels: int, depth: int
) -> tuple[bytearray, int]:
    """Unfilter one (sub)image of ``h`` scanlines starting at byte
    ``offset`` of the inflated stream. Returns (packed scanline bytes
    without filter markers, bytes consumed). Filtering operates on the
    PACKED bytes; at sub-byte depths the filter distance is one byte
    (RFC 2083 §6.3: bpp rounds up to 1)."""
    if w == 0 or h == 0:
        return bytearray(), 0
    stride = (w * channels * depth + 7) // 8
    bpp = max(1, channels * depth // 8)
    need = h * (stride + 1)
    if offset + need > len(raw):
        raise ValueError("PNG scanline data size mismatch")
    out = bytearray(h * stride)
    prev = bytearray(stride)
    for y in range(h):
        base = offset + y * (stride + 1)
        f = raw[base]
        line = bytearray(raw[base + 1:base + 1 + stride])
        if f == 1:  # sub
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif f == 2:  # up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif f == 3:  # average
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # paeth
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                ul = prev[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + _paeth(left, prev[x], ul)) & 0xFF
        elif f != 0:
            raise ValueError(f"unknown PNG filter {f}")
        out[y * stride:(y + 1) * stride] = line
        prev = line
    return out, need


def _png_row_samples(
    rows: bytearray, w: int, h: int, channels: int, depth: int
) -> bytearray:
    """Packed scanline bytes → one sample value per byte (MSB-first bit
    unpack for depths 1/2/4; pass-through for 8; big-endian HIGH byte
    for 16 — the standard 16→8 reduction, exact on the v·257 values a
    widened 8-bit source produces)."""
    if depth == 8:
        return rows
    if depth == 16:
        return rows[0::2]  # scanlines are contiguous; stride is even
    stride = (w * channels * depth + 7) // 8
    per_byte = 8 // depth
    mask = (1 << depth) - 1
    out = bytearray(w * channels * h)
    n = w * channels  # samples per row
    for y in range(h):
        base = y * stride
        ob = y * n
        for i in range(n):
            byte = rows[base + i // per_byte]
            shift = 8 - depth * (i % per_byte + 1)
            out[ob + i] = (byte >> shift) & mask
    return out


def _decode_png(b: bytes) -> tuple[int, int, int, bytes]:
    """Pure-stdlib PNG decode: chunk walk → IDAT inflate → per-scanline
    unfilter → sample unpack → palette/alpha mapping. Covers every
    valid IHDR combination (round 11): bit depths 1/2/4/8/16 (16-bit
    samples reduce to their high byte), color types 0/2/3/4/6 (3 =
    PLTE palette, with tRNS → RGBA), and both non-interlaced and Adam7
    layouts (each of the 7 passes is an independently filtered
    sub-image whose pixels scatter to (x0+i·dx, y0+j·dy)). Spec-invalid
    depth/type combinations raise ValueError — corrupt, not
    unsupported; no NotImplementedError remains in the PNG path."""
    i = 8
    w = h = None
    ctype = depth = interlace = None
    idat = bytearray()
    plte = trns = None
    while i + 8 <= len(b):
        (ln,) = struct.unpack(">I", b[i:i + 4])
        typ = b[i + 4:i + 8]
        payload = b[i + 8:i + 8 + ln]
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
        elif typ == b"PLTE":
            if ln % 3 or ln == 0:
                raise ValueError("PNG PLTE length not a multiple of 3")
            plte = payload
        elif typ == b"tRNS":
            trns = payload
        elif typ == b"IDAT":
            idat += payload
        elif typ == b"IEND":
            break
        i += 12 + ln
    if w is None:
        raise ValueError("PNG without IHDR")
    _check_dims(w, h)
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"invalid PNG bit depth {depth}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"invalid PNG color type {ctype}")
    if depth < 8 and ctype not in (0, 3):
        raise ValueError(f"PNG depth {depth} invalid for color type {ctype}")
    if depth == 16 and ctype == 3:
        raise ValueError("PNG depth 16 invalid for palette color type")
    if ctype == 3 and plte is None:
        raise ValueError("palette PNG without PLTE chunk")
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        rows, used = _png_unfilter(raw, 0, w, h, channels, depth)
        if used != len(raw):
            raise ValueError("PNG scanline data size mismatch")
        samp = _png_row_samples(rows, w, h, channels, depth)
    elif interlace == 1:
        samp = bytearray(w * h * channels)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx if w > x0 else 0
            ph = (h - y0 + dy - 1) // dy if h > y0 else 0
            rows, used = _png_unfilter(raw, pos, pw, ph, channels, depth)
            pos += used
            if pw and ph:
                prows = _png_row_samples(rows, pw, ph, channels, depth)
                for j in range(ph):
                    src = j * pw * channels
                    for k in range(pw):
                        dst = ((y0 + j * dy) * w + x0 + k * dx) * channels
                        samp[dst:dst + channels] = prows[
                            src + k * channels:src + (k + 1) * channels
                        ]
        if pos != len(raw):
            raise ValueError("PNG scanline data size mismatch")
    else:
        raise ValueError(f"unknown PNG interlace method {interlace}")
    if ctype == 3:
        # palette indices → RGB (or RGBA when tRNS is present)
        n_entries = len(plte) // 3
        och = 4 if trns else 3
        out = bytearray(w * h * och)
        for p, idx in enumerate(samp):
            if idx >= n_entries:
                raise ValueError(f"PNG palette index {idx} out of range")
            out[p * och:p * och + 3] = plte[idx * 3:idx * 3 + 3]
            if och == 4:
                out[p * och + 3] = trns[idx] if idx < len(trns) else 255
        return w, h, och, bytes(out)
    if depth < 8:
        # grayscale sub-byte samples scale to full 8-bit range
        mx = (1 << depth) - 1
        samp = bytearray((v * 255) // mx for v in samp)
    return w, h, channels, bytes(samp)


def _bmp_palette(b: bytes, bpp: int) -> tuple[bytes, int]:
    """(BGRA color table bytes, entry count) after the info header —
    entry count = biClrUsed, or 2^bpp when 0."""
    (bi_size,) = struct.unpack("<I", b[14:18])
    (clr_used,) = struct.unpack("<I", b[46:50])
    n_colors = clr_used if clr_used else (1 << bpp)
    pal_off = 14 + bi_size
    pal = b[pal_off:pal_off + 4 * n_colors]
    if len(pal) < 4 * n_colors:
        raise ValueError("truncated BMP color table")
    return pal, n_colors


def _decode_bmp_rle(
    b: bytes, off: int, w: int, h: int, bpp: int
) -> tuple[int, int, int, bytes]:
    """BI_RLE8 / BI_RLE4 run decode (r12 — the last common legacy BMP
    gap). Encoded runs (count, value) repeat a byte (RLE8) or two
    alternating nibbles (RLE4); escape 00 introduces end-of-line /
    end-of-bitmap / delta (cursor jump; skipped pixels stay index 0
    per the de-facto decoder convention) / absolute literal runs
    (word-aligned). RLE bitmaps are bottom-up by spec (a negative
    height is rejected). Corrupt streams raise ValueError — runs that
    cross a row boundary, cursor escapes past the bitmap, indices
    outside the color table, or data ending before end-of-bitmap."""
    pal, n_colors = _bmp_palette(b, bpp)
    idx = bytearray(w * h)  # top-down index grid; unwritten = 0
    x = 0
    y = 0  # row counted from the BOTTOM (storage order)
    i = off
    n = len(b)
    done = False
    while not done:
        if i + 2 > n:
            raise ValueError("truncated BMP RLE data")
        cnt, val = b[i], b[i + 1]
        i += 2
        if cnt:  # encoded run of `cnt` pixels
            if y >= h or x + cnt > w:
                raise ValueError("BMP RLE run outside the bitmap")
            row = (h - 1 - y) * w
            if bpp == 8:
                idx[row + x:row + x + cnt] = bytes([val]) * cnt
            else:
                for k in range(cnt):
                    idx[row + x + k] = (
                        (val >> 4) if k % 2 == 0 else (val & 0x0F)
                    )
            x += cnt
        elif val == 0:  # end of line
            x = 0
            y += 1
        elif val == 1:  # end of bitmap
            done = True
        elif val == 2:  # delta: skip (dx, dy) pixels
            if i + 2 > n:
                raise ValueError("truncated BMP RLE delta")
            x += b[i]
            y += b[i + 1]
            i += 2
            if x > w or y > h:
                raise ValueError("BMP RLE delta outside the bitmap")
        else:  # absolute mode: `val` literal pixels, word-aligned
            if y >= h or x + val > w:
                raise ValueError("BMP RLE run outside the bitmap")
            nbytes = val if bpp == 8 else (val + 1) // 2
            need = (nbytes + 1) // 2 * 2
            if i + need > n:
                raise ValueError("truncated BMP RLE absolute run")
            row = (h - 1 - y) * w
            if bpp == 8:
                idx[row + x:row + x + val] = b[i:i + val]
            else:
                for k in range(val):
                    byte = b[i + k // 2]
                    idx[row + x + k] = (
                        (byte >> 4) if k % 2 == 0 else (byte & 0x0F)
                    )
            x += val
            i += need
    out = bytearray(w * h * 3)
    for p in range(w * h):
        v = idx[p]
        if v >= n_colors:
            raise ValueError("BMP pixel index outside the color table")
        q = 4 * v
        out[3 * p:3 * p + 3] = pal[q:q + 3]
    return w, h, 3, bytes(out)


def _expand_bits(v: int, width: int) -> int:
    """``width``-bit channel value → 8 bits by bit replication —
    ``(v << 3) | (v >> 2)`` for 5-bit, the same convention the RGB555
    path uses, generalized to any mask width (repeat the field until
    ≥8 bits, keep the top 8)."""
    if width >= 8:
        return v >> (width - 8)
    x, bits = v, width
    while bits < 8:
        x = (x << width) | v
        bits += width
    return x >> (bits - 8)


def _decode_bmp(b: bytes) -> tuple[int, int, int, bytes]:
    """BITMAPINFOHEADER BMP: bottom-up 4-byte-padded rows → top-down
    pixel bytes. 24-bit direct BGR, palettized 1/4/8-bit (r11 — the
    legacy web-scrape formats): MSB-first index unpack, mapped through
    the BGRA color table after the header (entry count = biClrUsed, or
    2^bpp when 0), RLE8/RLE4 run compression (r12,
    :func:`_decode_bmp_rle`), and BI_BITFIELDS 16/32-bit with
    arbitrary contiguous channel masks (r13 — canonical 565 included;
    channels expand to 8 bits by bit replication, :func:`_expand_bits`).
    Channel order follows the container (BGR) in all paths. Only
    JPEG/PNG-in-BMP passthrough (BI_JPEG/BI_PNG) remains out of
    scope."""
    (off,) = struct.unpack("<I", b[10:14])
    w, h = struct.unpack("<ii", b[18:26])
    (bpp,) = struct.unpack("<H", b[28:30])
    (compression,) = struct.unpack("<I", b[30:34])
    if compression == 3:
        # BI_BITFIELDS: per-channel masks in the 3 DWORDs at byte 54
        # (directly after a 40-byte BITMAPINFOHEADER; V4/V5 headers
        # place their mask fields at the same absolute offset)
        if bpp not in (16, 32):
            raise ValueError(
                f"BMP BI_BITFIELDS requires 16/32-bit pixels, got {bpp}"
            )
        if len(b) < 66:
            raise ValueError("truncated BMP BITFIELDS masks")
        masks = struct.unpack("<III", b[54:66])  # R, G, B
        fields = []
        for m in masks:
            if m == 0:
                fields.append((0, 0))
                continue
            shift = (m & -m).bit_length() - 1
            width = (m >> shift).bit_length()
            if (m >> shift) != (1 << width) - 1 or m >> shift + width:
                raise ValueError(
                    f"non-contiguous BMP channel mask 0x{m:08X}"
                )
            fields.append((shift, width))
        topdown = h < 0
        h = abs(h)
        _check_dims(w, h)
        nbytes = bpp // 8
        row = (w * nbytes + 3) // 4 * 4
        if off + row * h > len(b) or off < 0:
            raise ValueError("truncated BMP pixel data")
        out = bytearray(w * 3 * h)
        for y in range(h):
            src = y if topdown else h - 1 - y
            base = off + src * row
            orow = y * w * 3
            for x in range(w):
                q = base + nbytes * x
                px = int.from_bytes(b[q:q + nbytes], "little")
                for ci, (shift, width) in enumerate(fields):
                    val = (
                        0
                        if width == 0
                        else _expand_bits(
                            (px >> shift) & ((1 << width) - 1), width
                        )
                    )
                    # masks are R,G,B; container order is BGR
                    out[orow + 3 * x + (2 - ci)] = val
        return w, h, 3, bytes(out)
    if compression in (1, 2):
        if (compression == 1) != (bpp == 8) or (
            compression == 2
        ) != (bpp == 4):
            raise ValueError(
                f"BMP RLE{8 if compression == 1 else 4} requires "
                f"bpp {8 if compression == 1 else 4}, got {bpp}"
            )
        if h < 0:
            raise ValueError(
                "top-down BMPs cannot be RLE-compressed"
            )
        _check_dims(w, h)
        if off < 0 or off > len(b):
            raise ValueError("truncated BMP pixel data")
        return _decode_bmp_rle(b, off, w, h, bpp)
    if compression in (4, 5):
        # BI_JPEG / BI_PNG: the pixel payload IS a complete JPEG/PNG
        # stream (r13) — hand it to the real decoder; the embedded
        # container carries its own dimensions and orientation, and
        # consistency with the BMP header is the embedded stream's
        # problem per spec (printer passthrough format)
        payload = b[off:]
        magic = (
            b"\xff\xd8\xff" if compression == 4
            else b"\x89PNG\r\n\x1a\n"
        )
        if not payload.startswith(magic):
            raise ValueError(
                "BMP BI_JPEG/BI_PNG payload does not start with the "
                "embedded container's magic"
            )
        return (
            _decode_jpeg(payload) if compression == 4
            else _decode_png(payload)
        )
    if compression != 0:
        raise NotImplementedError(
            f"BMP compression {compression} unsupported "
            "(BI_RGB / BI_RLE8 / BI_RLE4 / BI_BITFIELDS / "
            "BI_JPEG / BI_PNG)"
        )
    topdown = h < 0
    h = abs(h)
    _check_dims(w, h)
    if bpp in (1, 4, 8):
        pal, n_colors = _bmp_palette(b, bpp)
        row = (w * bpp + 31) // 32 * 4
        if off + row * h > len(b) or off < 0:
            raise ValueError("truncated BMP pixel data")
        per_byte = 8 // bpp
        mask = (1 << bpp) - 1
        out = bytearray(w * 3 * h)
        for y in range(h):
            src = y if topdown else h - 1 - y
            base = off + src * row
            orow = y * w * 3
            for x in range(w):
                v = (
                    b[base + x // per_byte]
                    >> (8 - bpp * (x % per_byte + 1))
                ) & mask
                if v >= n_colors:
                    raise ValueError(
                        "BMP pixel index outside the color table"
                    )
                q = 4 * v
                out[orow + 3 * x:orow + 3 * x + 3] = pal[q:q + 3]
        return w, h, 3, bytes(out)
    if bpp == 32:
        # BGRX/BGRA (BI_RGB 32-bit — ubiquitous screenshot format):
        # rows are naturally 4-byte aligned; the 4th byte (alpha or
        # padding) is dropped — output stays 3-channel BGR like the
        # other BMP paths (r12)
        row = w * 4
        if off + row * h > len(b) or off < 0:
            raise ValueError("truncated BMP pixel data")
        out = bytearray(w * 3 * h)
        for y in range(h):
            src = y if topdown else h - 1 - y
            base = off + src * row
            orow = y * w * 3
            for x in range(w):
                q = base + 4 * x
                out[orow + 3 * x:orow + 3 * x + 3] = b[q:q + 3]
        return w, h, 3, bytes(out)
    if bpp == 16:
        # RGB555 little-endian (BI_RGB 16-bit default): 5 bits per
        # channel expanded to 8 by the standard (v << 3) | (v >> 2)
        # round-trip-exact scaling (r12)
        row = (w * 2 + 3) // 4 * 4
        if off + row * h > len(b) or off < 0:
            raise ValueError("truncated BMP pixel data")
        out = bytearray(w * 3 * h)
        for y in range(h):
            src = y if topdown else h - 1 - y
            base = off + src * row
            orow = y * w * 3
            for x in range(w):
                (px,) = struct.unpack(
                    "<H", b[base + 2 * x:base + 2 * x + 2]
                )
                r5 = (px >> 10) & 0x1F
                g5 = (px >> 5) & 0x1F
                b5 = px & 0x1F
                # container order is BGR, matching the other paths
                out[orow + 3 * x] = (b5 << 3) | (b5 >> 2)
                out[orow + 3 * x + 1] = (g5 << 3) | (g5 >> 2)
                out[orow + 3 * x + 2] = (r5 << 3) | (r5 >> 2)
        return w, h, 3, bytes(out)
    if bpp != 24:
        raise NotImplementedError(
            f"BMP bpp {bpp} unsupported (1/4/8 palette, 16, 24, or 32)"
        )
    row = (w * 3 + 3) // 4 * 4
    if off + row * h > len(b) or off < 0:
        # must be checked up front: a short source slice assigned into
        # the bytearray RESIZES it (shrinks + memmove), and a corrupted
        # height turned that into a quadratic near-hang (r10 fuzz)
        raise ValueError("truncated BMP pixel data")
    out = bytearray(w * 3 * h)
    for y in range(h):
        src = y if topdown else h - 1 - y
        start = off + src * row
        out[y * w * 3:(y + 1) * w * 3] = b[start:start + w * 3]
    return w, h, 3, bytes(out)


def _decode_gif(b: bytes) -> tuple[int, int, int, bytes]:
    """Pure-stdlib GIF decode: global color table + full variable-width
    LZW (GIF89a spec appendix F — code widths grow
    ``min_code_size``+1 → 12 bits, CLEAR resets the dictionary), first
    image block, non-interlaced. Palette indices are mapped through the
    color table → (w, h, 3, RGB bytes)."""
    w, h = struct.unpack("<HH", b[6:10])
    flags = b[10]
    i = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = b[i:i + 3 * n]
        i += 3 * n
    while i < len(b):
        blk = b[i]
        if blk == 0x21:  # extension: label + sub-blocks
            i += 2
            while i < len(b) and b[i] != 0:
                i += 1 + b[i]
            i += 1
        elif blk == 0x2C:  # image descriptor
            ix, iy, iw, ih = struct.unpack("<HHHH", b[i + 1:i + 9])
            _check_dims(iw, ih)
            lflags = b[i + 9]
            i += 10
            ct = gct
            if lflags & 0x80:
                n = 2 << (lflags & 0x07)
                ct = b[i:i + 3 * n]
                i += 3 * n
            mcs = b[i]
            i += 1
            data = bytearray()
            while i < len(b) and b[i] != 0:
                ln = b[i]
                data += b[i + 1:i + 1 + ln]
                i += 1 + ln
            idx = _lzw_decode(bytes(data), mcs, iw * ih)
            if ct is None:
                raise ValueError("GIF image without a color table")
            if lflags & 0x40:  # interlaced: 4-pass row order (r10)
                idx = _gif_deinterlace(idx, iw, ih)
            n_colors = len(ct) // 3
            out = bytearray(iw * ih * 3)
            for p, v in enumerate(idx):
                if v >= n_colors:
                    # a short ct slice would RESIZE the bytearray (the
                    # same near-hang shape as the BMP case — r10 fuzz)
                    raise ValueError(
                        "GIF pixel index outside the color table"
                    )
                out[3 * p:3 * p + 3] = ct[3 * v:3 * v + 3]
            return iw, ih, 3, bytes(out)
        elif blk == 0x3B:  # trailer before any image
            break
        else:
            raise ValueError(f"unknown GIF block 0x{blk:02x}")
    raise ValueError("GIF contains no image data")


def _gif_deinterlace(idx: bytes, w: int, h: int) -> bytes:
    """Reorder interlaced GIF rows to top-down: the stream stores rows
    in four passes — every 8th from 0, every 8th from 4, every 4th
    from 2, every 2nd from 1 (GIF89a spec appendix E)."""
    out = bytearray(len(idx))
    src = 0
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        for y in range(start, h, step):
            out[y * w:(y + 1) * w] = idx[src:src + w]
            src += w
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, limit: int) -> bytes:
    """GIF-flavor LZW: LSB-first bit stream, CLEAR/END codes, dict caps
    at 4096 with code width growing at each power of two."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([c]) for c in range(clear)] + [b"", b""]
        width = min_code_size + 1

    width = min_code_size + 1
    reset()
    acc = bits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == end:
                return bytes(out[:limit])
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < 4096:
                    table.append(prev + entry[:1])
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
                if len(table) < 4096:
                    table.append(entry)
            else:
                raise ValueError("corrupt LZW stream")
            out += entry
            prev = entry
            # the decoder's table lags the encoder's by ONE entry (the
            # encoder adds the boundary entry before emitting the next
            # code, the decoder on reading it) — so the width grows at
            # 2^width − 1, not 2^width
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
            if len(out) >= limit:
                return bytes(out[:limit])
    return bytes(out[:limit])


def _lzw_encode_literal(indices: bytes, min_code_size: int = 8) -> bytes:
    """A VALID (if uncompressed) GIF LZW stream: every pixel emitted as
    a literal code, with CLEAR re-issued before the dictionary growth
    would widen codes past ``min_code_size``+1 bits — the classic
    'uncompressed GIF' technique; any spec decoder reads it back."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    room = (1 << width) - (clear + 2) - 1  # codes addable before widening
    acc = bits = 0
    out = bytearray()

    def emit(code: int):
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    emit(clear)
    since_clear = 0
    for px in indices:
        if since_clear >= room:
            emit(clear)
            since_clear = 0
        emit(px)
        since_clear += 1
    emit(end)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# JPEG baseline-sequential decoder (ITU-T T.81), from scratch — the same
# route as the GIF LZW: huffman entropy decode + dequant + 8×8 IDCT +
# YCbCr→RGB, no imaging library. Scope: SOF0/SOF1, 8-bit, 1 or 3
# components, any sampling factors (nearest-neighbor chroma upsample),
# restart intervals. Progressive (SOF2) and the other frame types raise
# NotImplementedError.
# ---------------------------------------------------------------------------

#: zig-zag scan order (T.81 Figure 5): _JPEG_ZIGZAG[k] = natural index of
#: the k-th zig-zag coefficient.
_JPEG_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)


def _jpeg_huff_table(counts, values) -> dict:
    """DHT (bits[1..16], values) → {(length, code): value} per the
    canonical code assignment of T.81 Annex C."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            if k >= len(values):
                raise ValueError("huffman table value underrun")
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _JpegBits:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    byte-stuffing removal; stops at any real marker (T.81 §B.1.1.5)."""

    __slots__ = ("b", "i", "acc", "n", "marker")

    def __init__(self, b: bytes, i: int):
        self.b = b
        self.i = i
        self.acc = 0
        self.n = 0
        self.marker = None

    def _fill(self):
        b, i = self.b, self.i
        if i >= len(b):
            raise ValueError("JPEG entropy data truncated")
        byte = b[i]
        if byte == 0xFF:
            nxt = b[i + 1] if i + 1 < len(b) else None
            if nxt == 0x00:  # stuffed literal FF
                self.i = i + 2
            else:  # a real marker terminates the entropy segment
                self.marker = nxt
                raise ValueError("JPEG entropy data ran into a marker")
        else:
            self.i = i + 1
        self.acc = (self.acc << 8) | byte
        self.n += 8

    def take(self, k: int) -> int:
        while self.n < k:
            self._fill()
        self.n -= k
        out = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1
        return out

    def huff(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.take(1)
            v = table.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid huffman code in JPEG stream")

    def align_restart(self) -> None:
        """Byte-align and consume one RSTn marker."""
        self.acc = 0
        self.n = 0
        b = self.b
        i = self.i
        while i + 1 < len(b) and not (
            b[i] == 0xFF and 0xD0 <= b[i + 1] <= 0xD7
        ):
            i += 1
        if i + 1 >= len(b):
            raise ValueError("missing JPEG restart marker")
        self.i = i + 2


def _jpeg_extend(v: int, s: int) -> int:
    """RECEIVE/EXTEND (T.81 §F.2.2.1): map an s-bit magnitude code to
    its signed coefficient value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _idct_basis():
    """8×8 DCT-II basis matrix M with M[u, x] = c(u)/2 · cos((2x+1)uπ/16)
    — IDCT(F) = Mᵀ·F·M (the orthonormal form of T.81 A.3.3)."""
    import math

    import numpy as np

    m = np.zeros((8, 8))
    for u in range(8):
        cu = (1.0 / math.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
    return m


_IDCT_M = None


def _skip_to_marker(b: bytes, pos: int) -> int:
    """Position of the next real marker (0xFF + non-stuffing,
    non-restart byte) at or after ``pos``."""
    n = len(b)
    i = pos
    while i + 1 < n:
        if b[i] == 0xFF and b[i + 1] not in (0x00, 0xFF) and not (
            0xD0 <= b[i + 1] <= 0xD7
        ):
            return i
        i += 1
    return n


class _JpegState:
    """Per-image decode state shared across scans: the zig-zag
    coefficient store (progressive scans each contribute a piece),
    per-scan DC predictors, and the EOB run counter."""

    __slots__ = ("coefs", "pred", "eobrun")

    def __init__(self, shapes):
        import numpy as np

        self.coefs = [
            np.zeros((by, bx, 64), dtype=np.int32) for by, bx in shapes
        ]
        self.pred = []
        self.eobrun = 0


def _decode_block_ac_first(bits, act, coef, Ss, Se, Al, st) -> None:
    """Progressive AC initial scan for one block (T.81 G.1.2.2):
    run/size symbols with EOBn run-length codes; new coefficients land
    shifted by the successive-approximation low bit ``Al``."""
    if st.eobrun > 0:
        st.eobrun -= 1
        return
    k = Ss
    while k <= Se:
        rs = bits.huff(act)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r < 15:  # EOBn: 2^r - 1 + r extra bits further blocks
                st.eobrun = (1 << r) - 1
                if r:
                    st.eobrun += bits.take(r)
                return
            k += 16  # ZRL
            continue
        k += r
        if k > Se:
            raise ValueError("JPEG AC run past spectral band")
        coef[_JPEG_ZIGZAG[k]] = _jpeg_extend(bits.take(s), s) << Al
        k += 1


def _decode_block_ac_refine(bits, act, coef, Ss, Se, Al, st) -> None:
    """Progressive AC refinement for one block (T.81 G.1.2.3 /
    the libjpeg decode_mcu_AC_refine logic): already-nonzero
    coefficients receive correction bits; new ±1<<Al coefficients are
    placed after skipping ``r`` zero-history positions."""
    p1 = 1 << Al
    m1 = -1 << Al
    zz = _JPEG_ZIGZAG
    k = Ss
    if st.eobrun == 0:
        while k <= Se:
            rs = bits.huff(act)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r < 15:
                    st.eobrun = 1 << r
                    if r:
                        st.eobrun += bits.take(r)
                    break  # finish this block in the eobrun branch
                # r == 15: pass over 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("bad JPEG AC refine size")
                newval = p1 if bits.take(1) else m1
            while k <= Se:
                z = zz[k]
                if coef[z] != 0:
                    if bits.take(1) and not (coef[z] & p1):
                        coef[z] += p1 if coef[z] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= Se:
                coef[zz[k]] = newval
            k += 1
    if st.eobrun > 0:
        while k <= Se:  # correction bits for the remaining nonzeros
            z = zz[k]
            if coef[z] != 0:
                if bits.take(1) and not (coef[z] & p1):
                    coef[z] += p1 if coef[z] >= 0 else m1
            k += 1
        st.eobrun -= 1


def _decode_jpeg(b: bytes) -> tuple[int, int, int, bytes]:
    """Sequential AND progressive JFIF decoder — see
    :func:`decode_image`. All scans accumulate into a per-component
    zig-zag coefficient store; dequantization and the IDCT run once at
    the end, so a progressive file's spectral-selection and
    successive-approximation passes compose exactly like a sequential
    file's single pass."""
    import numpy as np

    global _IDCT_M
    if _IDCT_M is None:
        _IDCT_M = _idct_basis()

    qt: dict[int, "np.ndarray"] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    progressive = False
    lossless = False
    lossless_planes: list = []
    precision = 8
    dri = 0
    state = None
    saw_scan = False
    adobe_transform = None  # APP14: 0=CMYK/RGB, 1=YCbCr, 2=YCCK
    i = 2
    n = len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:
            raise ValueError("desynchronized JPEG marker stream")
        m = b[i + 1]
        if m == 0xFF:
            i += 1
            continue
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        if m == 0xD9:
            break
        (ln,) = struct.unpack(">H", b[i + 2:i + 4])
        seg = b[i + 4:i + 2 + ln]
        if m == 0xDB:  # DQT — one or more tables per segment
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq == 0:
                    vals = list(seg[p + 1:p + 65])
                    p += 65
                else:
                    vals = list(
                        struct.unpack(">64H", seg[p + 1:p + 129])
                    )
                    p += 129
                if len(vals) != 64:
                    raise ValueError("truncated JPEG quant table")
                natural = np.zeros(64, dtype=np.int32)
                for k, zz in enumerate(_JPEG_ZIGZAG):
                    natural[zz] = vals[k]
                qt[tq] = natural.reshape(8, 8)
        elif m == 0xC4:  # DHT — one or more tables per segment
            p = 0
            while p + 17 <= len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                counts = seg[p + 1:p + 17]
                total = sum(counts)
                values = seg[p + 17:p + 17 + total]
                huff[(tc, th)] = _jpeg_huff_table(counts, values)
                p += 17 + total
        elif m in (0xC0, 0xC1, 0xC2, 0xC3):  # seq/prog/lossless frame
            lossless = m == 0xC3
            if lossless:
                # lossless allows 2-16 bit samples (T.81 B.2.2)
                if not 2 <= seg[0] <= 16:
                    raise ValueError(
                        f"bad lossless JPEG precision {seg[0]}"
                    )
            elif seg[0] not in (8, 12):
                # DCT paths ride the same huffman+IDCT code (r13):
                # level shift 2^(P-1), clamp to 2^P-1, scale back to
                # the byte output — T.81 allows only 8/12 here
                raise NotImplementedError(
                    f"JPEG precision {seg[0]} unsupported (8/12-bit)"
                )
            precision = seg[0]
            progressive = m == 0xC2
            hgt, wdt = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for k in range(nc):
                cid = seg[6 + 3 * k]
                hv = seg[7 + 3 * k]
                comps.append((cid, hv >> 4, hv & 0x0F, seg[8 + 3 * k]))
            if hgt == 0 or wdt == 0 or not comps:
                raise ValueError("empty JPEG frame")
            _check_dims(wdt, hgt)
            if len(comps) not in (1, 3, 4):
                raise NotImplementedError(
                    f"{len(comps)}-component JPEG unsupported "
                    "(grayscale / YCbCr / CMYK-YCCK)"
                )
            if lossless and len(comps) != 1:
                # color lossless has no defined transform (RGB vs raw
                # CFA is metadata-dependent) — out of scope
                raise NotImplementedError(
                    "multi-component lossless JPEG unsupported"
                )
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            if hmax == 0 or vmax == 0 or any(
                c[1] == 0 or c[2] == 0 for c in comps
            ):
                raise ValueError("zero JPEG sampling factor")
            mcus_x = (wdt + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (hgt + 8 * vmax - 1) // (8 * vmax)
            frame = (hgt, wdt, comps, hmax, vmax, mcus_x, mcus_y)
            state = _JpegState(
                [(mcus_y * vs, mcus_x * hs) for _, hs, vs, _ in comps]
            )
        elif m in _JPEG_SOF:  # hierarchical / arithmetic
            raise NotImplementedError(
                "only sequential, progressive, and lossless huffman "
                "JPEG supported"
            )
        elif m == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", seg[:2])
        elif m == 0xEE and seg[:5] == b"Adobe" and len(seg) >= 12:
            # APP14 Adobe transform byte — the 4-component color-space
            # discriminator (r13): 2 = YCCK, else inverted CMYK
            adobe_transform = seg[11]
        elif m == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG scan before frame header")
            ns = seg[0]
            smap = []
            for k in range(ns):
                smap.append(
                    (seg[1 + 2 * k], seg[2 + 2 * k] >> 4,
                     seg[2 + 2 * k] & 0x0F)
                )
            Ss, Se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            AhAl = seg[3 + 2 * ns]
            Ah, Al = AhAl >> 4, AhAl & 0x0F
            if lossless:
                # lossless SOS: Ss = predictor selector, Al = point
                # transform (T.81 H.1) — decoded samples land in
                # lossless_planes, no coefficient store
                end = _decode_jpeg_lossless_scan(
                    b, i + 2 + ln, frame, smap, Ss, Al, huff, dri,
                    precision, lossless_planes,
                )
                saw_scan = True
                i = end
                continue
            if not progressive:
                Ss, Se, Ah, Al = 0, 63, 0, 0
            end = _decode_jpeg_scan(
                b, i + 2 + ln, frame, smap, Ss, Se, Ah, Al,
                qt, huff, dri, state, progressive, precision,
            )
            saw_scan = True
            i = end
            continue
        i += 2 + ln
    if frame is None or not saw_scan:
        raise ValueError("JPEG missing SOF/SOS")
    hgt, wdt, comps, hmax, vmax, mcus_x, mcus_y = frame
    if lossless:
        plane = lossless_planes[0]
        # scale the P-bit samples to the byte output: >> for deep
        # samples (exact when they are whole 8-bit levels), << with
        # bit replication low bits zero for shallow ones
        if precision >= 8:
            out8 = (plane >> (precision - 8)).astype(np.uint8)
        else:
            out8 = np.clip(
                plane << (8 - precision), 0, 255
            ).astype(np.uint8)
        return wdt, hgt, 1, out8[:hgt, :wdt].tobytes()
    mt = _IDCT_M.T
    full = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        q = qt.get(tq)
        if q is None:
            raise ValueError("JPEG component references missing "
                             "quant table")
        cblocks = state.coefs[ci]
        by_n, bx_n, _ = cblocks.shape
        plane = np.zeros((by_n * 8, bx_n * 8), dtype=np.uint8)
        # level shift / clamp at the FRAME's sample precision, then
        # scale to the byte output (>>4 for 12-bit — exact for values
        # that are whole 8-bit levels, the usual provenance)
        level = 1 << (precision - 1)
        maxval = (1 << precision) - 1
        for by in range(by_n):
            for bx in range(bx_n):
                block = (
                    cblocks[by, bx].reshape(8, 8) * q
                ).astype(float)
                px = mt @ block @ _IDCT_M
                px = np.clip(np.rint(px) + level, 0, maxval)
                if precision > 8:
                    px = px.astype(np.int32) >> (precision - 8)
                plane[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = (
                    px.astype(np.uint8)
                )
        if hs != hmax or vs != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // vs, axis=0),
                hmax // hs, axis=1,
            )
        full.append(plane[:hgt, :wdt])
    if len(full) == 1:
        return wdt, hgt, 1, full[0].tobytes()

    def _ycc_to_rgb(p0, p1, p2):
        y = p0.astype(float)
        cb = p1.astype(float) - 128.0
        cr = p2.astype(float) - 128.0
        rgb = np.stack(
            [
                y + 1.402 * cr,
                y - 0.344136 * cb - 0.714136 * cr,
                y + 1.772 * cb,
            ],
            axis=-1,
        )
        return np.clip(np.rint(rgb), 0, 255)

    if len(full) == 4:
        # Adobe 4-component JPEG (r13): samples are stored INVERTED
        # (255−C … 255−K — the Adobe convention every CMYK JPEG in the
        # wild uses). YCCK (transform 2) additionally routes the
        # inverted CMY through the YCbCr transform. RGB out via the
        # multiplicative un-ink formula R = (255−C)(255−K)/255, which
        # on inverted samples is simply s_C·s_K/255.
        if adobe_transform is None:
            # No APP14: spec-plain CMYK is NOT inverted, so decoding
            # with the Adobe convention would pass wrong colors
            # silently — refuse like the other unsupported variants
            # (r14, ADVICE).
            raise NotImplementedError(
                "4-component JPEG without Adobe APP14 marker "
                "(non-Adobe CMYK) is not supported"
            )
        if adobe_transform == 2:
            cmy = _ycc_to_rgb(full[0], full[1], full[2])
        else:
            cmy = np.stack(
                [f.astype(float) for f in full[:3]], axis=-1
            )
        k = full[3].astype(float)[..., None]
        rgb = np.clip(np.rint(cmy * k / 255.0), 0, 255).astype(np.uint8)
        return wdt, hgt, 3, rgb.tobytes()
    rgb = _ycc_to_rgb(full[0], full[1], full[2]).astype(np.uint8)
    return wdt, hgt, 3, rgb.tobytes()


def _decode_jpeg_lossless_scan(
    b, pos, frame, smap, predictor, pt, huff, dri, precision, planes,
) -> int:
    """Decode ONE lossless (SOF3) scan — single component, raster
    order, one sample per MCU (T.81 annex H): huffman SSSS category +
    EXTENDed difference bits against the selected predictor (1-7 from
    Ra/Rb/Rc neighbors; first sample — and the first after every
    restart — predicted with 2^(P-Pt-1); the rest of row 0 with Ra,
    column 0 with Rb). Samples accumulate mod 2^16 and are shifted
    back by the point transform. → the byte position of the
    terminating marker; the decoded int32 plane is appended to
    ``planes``."""
    import numpy as np

    hgt, wdt = frame[0], frame[1]
    if len(smap) != 1:
        raise NotImplementedError(
            "multi-component lossless JPEG unsupported"
        )
    if not 1 <= predictor <= 7:
        raise ValueError(f"bad lossless predictor {predictor}")
    table = huff.get((0, smap[0][1]))
    if table is None:
        raise ValueError("lossless scan references missing "
                         "huffman table")
    bits = _JpegBits(b, pos)
    default = 1 << (precision - pt - 1)
    plane = np.zeros((hgt, wdt), dtype=np.int32)
    count = 0
    reset = True
    for y in range(hgt):
        for x in range(wdt):
            if dri and count and count % dri == 0:
                bits.align_restart()
                reset = True
            s = bits.huff(table)
            if s > 16:
                raise ValueError("bad lossless JPEG category")
            if s == 16:  # the special all-ones 16-bit difference
                diff = 32768
            elif s:
                diff = _jpeg_extend(bits.take(s), s)
            else:
                diff = 0
            if reset:
                px = default
                reset = False
            elif y == 0:
                px = int(plane[0, x - 1])
            elif x == 0:
                px = int(plane[y - 1, 0])
            else:
                ra = int(plane[y, x - 1])
                rb = int(plane[y - 1, x])
                rc = int(plane[y - 1, x - 1])
                if predictor == 1:
                    px = ra
                elif predictor == 2:
                    px = rb
                elif predictor == 3:
                    px = rc
                elif predictor == 4:
                    px = ra + rb - rc
                elif predictor == 5:
                    px = ra + ((rb - rc) >> 1)
                elif predictor == 6:
                    px = rb + ((ra - rc) >> 1)
                else:
                    px = (ra + rb) >> 1
            plane[y, x] = (px + diff) & 0xFFFF
            count += 1
    planes.append(plane << pt)
    return _skip_to_marker(b, bits.i)


def _decode_jpeg_scan(
    b, pos, frame, smap, Ss, Se, Ah, Al, qt, huff, dri, state,
    progressive, precision=8,
) -> int:
    """Decode ONE entropy-coded scan into the coefficient store;
    → the byte position of the marker terminating the scan.

    Interleaved scans (>1 component — always DC in progressive files)
    walk MCUs; single-component scans walk that component's OWN
    data-unit grid (T.81 A.2.2 — NOT the MCU-padded grid). Restart
    intervals reset the DC predictors and the EOB run."""
    hgt, wdt, comps, hmax, vmax, mcus_x, mcus_y = frame
    tables = {cs: (td, ta) for cs, td, ta in smap}
    order = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        if cid in tables:
            order.append(ci)
    if len(order) != len(smap):
        raise ValueError("JPEG scan names unknown component ids")
    bits = _JpegBits(b, pos)
    state.pred = [0] * len(comps)
    state.eobrun = 0

    def _restart():
        bits.align_restart()
        state.pred = [0] * len(comps)
        state.eobrun = 0

    def _dc(ci, coef, dct):
        if Ah == 0:  # initial DC scan (baseline's too, Al=0 then)
            s = bits.huff(dct)
            # T.81 table F.1: DC categories 0-11 at 8-bit sample
            # precision, 0-15 at 12-bit
            if s > (11 if precision == 8 else 15):
                raise ValueError("bad JPEG DC category")
            diff = _jpeg_extend(bits.take(s), s)
            state.pred[ci] += diff
            coef[0] = state.pred[ci] << Al
        else:  # DC refinement: one correction bit
            if bits.take(1):
                coef[0] |= 1 << Al

    def _seq_ac(coef, act):
        k = 1
        while k < 64:
            rs = bits.huff(act)
            r, sz = rs >> 4, rs & 0x0F
            if sz == 0:
                if r != 15:
                    break  # EOB
                k += 16
                continue
            k += r
            if k > 63:
                raise ValueError("JPEG AC run overflow")
            coef[_JPEG_ZIGZAG[k]] = _jpeg_extend(bits.take(sz), sz)
            k += 1

    if len(order) > 1:  # interleaved: MCU walk
        if progressive and Ss != 0:
            raise ValueError("interleaved progressive AC scan")
        done = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if dri and done and done % dri == 0:
                    _restart()
                for ci in order:
                    cid, hs, vs, tq = comps[ci]
                    td, ta = tables[cid]
                    dct = huff.get((0, td))
                    if dct is None and not (progressive and Ah > 0):
                        raise ValueError("missing JPEG DC table")
                    for by in range(vs):
                        for bx in range(hs):
                            coef = state.coefs[ci][
                                my * vs + by, mx * hs + bx
                            ]
                            _dc(ci, coef, dct)
                            if not progressive:
                                act = huff.get((1, ta))
                                if act is None:
                                    raise ValueError(
                                        "missing JPEG AC table"
                                    )
                                _seq_ac(coef, act)
                done += 1
    else:  # single component: its own data-unit grid
        ci = order[0]
        cid, hs, vs, tq = comps[ci]
        td, ta = tables[cid]
        cw = (wdt * hs + 8 * hmax - 1) // (8 * hmax)
        ch = (hgt * vs + 8 * vmax - 1) // (8 * vmax)
        done = 0
        for by in range(ch):
            for bx in range(cw):
                if dri and done and done % dri == 0:
                    _restart()
                coef = state.coefs[ci][by, bx]
                if Ss == 0:
                    dct = huff.get((0, td))
                    if dct is None and Ah == 0:
                        raise ValueError("missing JPEG DC table")
                    _dc(ci, coef, dct)
                    if not progressive:
                        act = huff.get((1, ta))
                        if act is None:
                            raise ValueError("missing JPEG AC table")
                        _seq_ac(coef, act)
                else:
                    act = huff.get((1, ta))
                    if act is None:
                        raise ValueError("missing JPEG AC table")
                    if Ah == 0:
                        _decode_block_ac_first(
                            bits, act, coef, Ss, Se, Al, state
                        )
                    else:
                        _decode_block_ac_refine(
                            bits, act, coef, Ss, Se, Al, state
                        )
                done += 1
    return _skip_to_marker(b, bits.i)


def jpeg_bytes_lossless(
    w: int, h: int, pattern: bool = False, predictor: int = 1,
    precision: int = 8, dri: int = 0,
) -> bytes:
    """A COMPLETE valid LOSSLESS (SOF3) JPEG of the FULL-resolution
    pattern — pixel(x, y) = :func:`_pattern_px`(x, y), scaled to
    ``precision`` by << (P−8) — encoded with the given predictor
    (1-7) and optional restart interval, mirroring T.81 annex H
    exactly: any spec decoder reproduces every sample bit-exactly
    (the format is lossless by construction, no flat-block trick
    needed). Used to pin :func:`_decode_jpeg`'s lossless path."""
    if not 1 <= predictor <= 7:
        raise ValueError("predictor must be 1-7")
    shift = max(0, precision - 8)

    def sample(x: int, y: int) -> int:
        return (_pattern_px(x, y) if pattern else 0) << shift

    if precision > 8:  # deep samples: categories up to 16
        dc_counts = [0, 0, 0, 0, 17] + [0] * 11
        dc_vals = list(range(17))
    else:
        dc_counts = [0, 0, 0, 12] + [0] * 12
        dc_vals = list(range(12))
    dc_codes = _jpeg_huff_table(bytes(dc_counts), bytes(dc_vals))
    enc_dc = {v: lc for lc, v in dc_codes.items()}

    out = bytearray()
    acc = [0, 0]

    def emit(code: int, nbits: int):
        acc[0] = (acc[0] << nbits) | code
        acc[1] += nbits
        while acc[1] >= 8:
            acc[1] -= 8
            byte = (acc[0] >> acc[1]) & 0xFF
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
        acc[0] &= (1 << acc[1]) - 1

    def pad():
        if acc[1]:
            fill = 8 - acc[1]
            emit((1 << fill) - 1, fill)

    default = 1 << (precision - 1)
    vals = [[sample(x, y) for x in range(w)] for y in range(h)]
    count = 0
    reset = True
    rst = 0
    for y in range(h):
        for x in range(w):
            if dri and count and count % dri == 0:
                pad()
                out.extend((0xFF, 0xD0 + rst % 8))
                rst += 1
                reset = True
            if reset:
                px = default
                reset = False
            elif y == 0:
                px = vals[0][x - 1]
            elif x == 0:
                px = vals[y - 1][0]
            else:
                ra, rb = vals[y][x - 1], vals[y - 1][x]
                rc = vals[y - 1][x - 1]
                px = {
                    1: ra, 2: rb, 3: rc, 4: ra + rb - rc,
                    5: ra + ((rb - rc) >> 1),
                    6: rb + ((ra - rc) >> 1),
                    7: (ra + rb) >> 1,
                }[predictor]
            # differences are taken mod 2^16 (T.81 H.1.2.1 — samples
            # accumulate mod 2^16 on decode); the wrapped value
            # 32768 ≡ -32768 is category 16, which carries NO extra
            # magnitude bits (r14, ADVICE — previously desynced any
            # precision-16 stream)
            diff = ((vals[y][x] - px + 32768) & 0xFFFF) - 32768
            if diff == -32768:
                ln, code = enc_dc[16]
                emit(code, ln)
            else:
                s_ = (
                    diff.bit_length() if diff >= 0
                    else (-diff).bit_length()
                )
                ln, code = enc_dc[s_]
                emit(code, ln)
                if s_:
                    emit(
                        diff if diff >= 0 else diff + (1 << s_) - 1, s_
                    )
            count += 1
    pad()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes((0xFF, marker)) + struct.pack(
            ">H", len(payload) + 2
        ) + payload

    sof = seg(
        0xC3,
        bytes((precision,)) + struct.pack(">HH", h, w)
        + b"\x01\x01\x11\x00",
    )
    dht = seg(0xC4, b"\x00" + bytes(dc_counts) + bytes(dc_vals))
    parts = [b"\xff\xd8", sof, dht]
    if dri:
        parts.append(seg(0xDD, struct.pack(">H", dri)))
    parts.append(seg(
        0xDA, b"\x01\x01\x00" + bytes((predictor, 0, 0))
    ))
    return b"".join(parts) + bytes(out) + b"\xff\xd9"


def jpeg_bytes(
    w: int, h: int, pattern: bool = False, cmyk: bool = False,
    precision: int = 8,
) -> bytes:
    """A COMPLETE valid baseline-sequential grayscale JPEG with
    EXACTLY-decodable content: quant table all ones, every 8×8 block
    FLAT with value :func:`_pattern_px`(bx, by) (bx/by = block grid
    coordinates), so each block is a pure DC term — DC = 8·(v−128),
    dequant ×1, IDCT of a DC-only block is exactly flat v. Lossy
    format, lossless construction: any spec decoder (including
    :func:`_decode_jpeg`) reproduces pixel(x, y) =
    ``_pattern_px(x // 8, y // 8)`` bit-exactly, giving the q53 oracle a
    closed-form pixel sum. ``pattern=False`` writes all-zero blocks.

    ``cmyk=True`` (r13) emits a 4-component Adobe (APP14 transform 0)
    file instead: inverted-CMY channels all carry the pattern value
    and inverted-K is a flat 255, so the un-ink conversion
    s·255/255 reproduces pixel(x, y) = pattern on ALL THREE RGB
    channels — decoded sum is exactly 3× the grayscale file's.

    ``precision=12`` (r13) emits an EXTENDED-sequential (SOF1) file:
    samples are the pattern value << 4 (whole 8-bit levels at 12-bit
    precision), DC = 8·(v₁₂ − 2048), categories up to 15 per T.81
    table F.1 — the decoder's scale-back >>4 reproduces the 8-bit
    pattern bit-exactly, so the q53 closed form is unchanged."""
    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    bw = (w + 7) // 8
    bh = (h + 7) // 8
    ncomp = 4 if cmyk else 1
    # custom DHT: DC categories as fixed-width codes (the all-ones
    # code of each width stays unused per T.81 §C.2); AC needs only
    # EOB. 12-bit needs categories up to 15 → 16 len-5 codes.
    if precision == 12:
        dc_counts = [0, 0, 0, 0, 16] + [0] * 11
        dc_vals = list(range(16))
    else:
        dc_counts = [0, 0, 0, 12] + [0] * 12
        dc_vals = list(range(12))
    ac_counts = [0, 1] + [0] * 14
    ac_vals = [0x00]
    dc_codes = _jpeg_huff_table(bytes(dc_counts), bytes(dc_vals))
    ac_codes = _jpeg_huff_table(bytes(ac_counts), bytes(ac_vals))
    enc_dc = {v: lc for lc, v in dc_codes.items()}
    enc_ac = {v: lc for lc, v in ac_codes.items()}

    out = bytearray()
    acc = [0, 0]  # bit accumulator, count

    def emit(code: int, nbits: int):
        acc[0] = (acc[0] << nbits) | code
        acc[1] += nbits
        while acc[1] >= 8:
            acc[1] -= 8
            byte = (acc[0] >> acc[1]) & 0xFF
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)  # byte stuffing
        acc[0] &= (1 << acc[1]) - 1

    level = 1 << (precision - 1)
    shift = precision - 8
    preds = [0] * ncomp
    for my in range(bh):
        for mx in range(bw):
            v = _pattern_px(mx, my) if pattern else 0
            # interleaved MCU = one block per component, each with its
            # OWN DC predictor; CMYK stores pattern on C/M/Y, 255 on K
            for ci in range(ncomp):
                cv = 255 if (cmyk and ci == 3) else v
                dc = 8 * ((cv << shift) - level)
                diff = dc - preds[ci]
                preds[ci] = dc
                s = (
                    diff.bit_length()
                    if diff >= 0
                    else (-diff).bit_length()
                )
                ln, code = enc_dc[s]
                emit(code, ln)
                if s:
                    emit(
                        diff if diff >= 0 else diff + (1 << s) - 1, s
                    )
                ln, code = enc_ac[0x00]  # EOB: 63 zero AC coefficients
                emit(code, ln)
    if acc[1]:  # pad the final byte with 1-bits (T.81 §F.1.2.3)
        pad = 8 - acc[1]
        emit((1 << pad) - 1, pad)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes((0xFF, marker)) + struct.pack(
            ">H", len(payload) + 2
        ) + payload

    dqt = seg(0xDB, b"\x00" + bytes([1] * 64))
    sof = seg(
        0xC1 if precision == 12 else 0xC0,  # 12-bit: extended seq.
        bytes((precision,)) + struct.pack(">HH", h, w)
        + bytes((ncomp,))
        + b"".join(
            bytes((cid, 0x11, 0)) for cid in range(1, ncomp + 1)
        ),
    )
    dht = seg(
        0xC4,
        b"\x00" + bytes(dc_counts) + bytes(dc_vals)
        + b"\x10" + bytes(ac_counts) + bytes(ac_vals),
    )
    sos = seg(
        0xDA,
        bytes((ncomp,))
        + b"".join(bytes((cid, 0)) for cid in range(1, ncomp + 1))
        + b"\x00\x3f\x00",
    )
    app14 = (
        seg(0xEE, b"Adobe" + struct.pack(">HHHB", 101, 0, 0, 0))
        if cmyk
        else b""
    )
    return (
        b"\xff\xd8" + app14 + dqt + sof + dht + sos
        + bytes(out) + b"\xff\xd9"
    )


def _ulaw_decode(c: int) -> int:
    """ITU G.711 µ-law byte → 16-bit linear (bias 0x84 expansion —
    the exact inverse every telephony encoder uses)."""
    c = ~c & 0xFF
    sign = c & 0x80
    e = (c >> 4) & 7
    m = c & 0x0F
    v = (((m << 3) + 0x84) << e) - 0x84
    return -v if sign else v


def _alaw_decode(c: int) -> int:
    """ITU G.711 A-law byte → 16-bit linear (0x55 toggle + segment
    expansion; a SET sign bit means POSITIVE — the opposite of
    µ-law's convention)."""
    c ^= 0x55
    sign = c & 0x80
    e = (c >> 4) & 7
    m = c & 0x0F
    v = (m << 4) + 8 if e == 0 else ((m << 4) + 0x108) << (e - 1)
    return v if sign else -v


#: fmt-tag → per-byte decoder for the 8-bit companded G.711 formats
_G711 = {6: _alaw_decode, 7: _ulaw_decode}


def _decode_wav_ext(b: bytes) -> tuple[int, list[int]] | None:
    """Non-PCM RIFF/WAVE the stdlib ``wave`` module rejects, walked
    chunk-by-chunk: IEEE float32 (fmt tag 3 — samples normalized
    [-1, 1], returned via the standard float↔PCM16 convention
    round(f · 32768)) and the G.711 companded telephony formats
    (tag 6 A-law, tag 7 µ-law — r13; 8-bit codes expanded to 16-bit
    linear by the ITU formulas). All WAV variants share one output
    type. Returns None when the payload is none of these."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    rate = None
    bits = None
    tag = None
    data = None
    i = 12
    n = len(b)
    while i + 8 <= n:
        cid = b[i:i + 4]
        (size,) = struct.unpack("<I", b[i + 4:i + 8])
        if cid == b"fmt " and i + 24 <= n:
            tag, _ch, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", b[i + 8:i + 24]
            )
        elif cid == b"data":
            data = b[i + 8:i + 8 + size]
        i += 8 + size + (size & 1)
    if tag not in (3, 6, 7) or rate is None or data is None:
        return None
    if tag in _G711:
        if bits != 8:
            raise ValueError(
                f"G.711 WAV bits {bits} unsupported (8 only)"
            )
        dec = _G711[tag]
        return rate, [dec(c) for c in data]
    if bits != 32:
        raise ValueError(f"float WAV bits {bits} unsupported (32 only)")
    cnt = len(data) // 4
    return rate, [
        int(round(f * 32768.0))
        for f in struct.unpack(f"<{cnt}f", data[:4 * cnt])
    ]


def decode_audio(data: bytes) -> tuple[int, list[int]]:
    """REAL audio decode for RIFF/WAVE — → (sample_rate, samples as
    ints, channel-interleaved). PCM 8-bit (unsigned, re-centered to
    signed), 16-bit, 24-bit, and 32-bit via the stdlib ``wave``
    module, plus 32-bit IEEE float (r12, the standard float↔PCM16
    convention) and G.711 µ-law/A-law telephony WAV (r13, ITU
    expansion to 16-bit linear) via :func:`_decode_wav_ext`.
    Truncated/corrupt input raises ValueError (one clean error
    type)."""
    import io
    import wave

    try:
        wf = wave.open(io.BytesIO(bytes(data)))
        width = wf.getsampwidth()
        frames = wf.readframes(wf.getnframes())
    except (wave.Error, EOFError, struct.error,
            RuntimeError, OSError) as e:
        try:
            fl = _decode_wav_ext(bytes(data))
        except ValueError:
            raise  # informative (float WAV, unsupported bit depth)
        except Exception:
            fl = None  # corrupt even as float WAV — fall through
        if fl is not None:
            return fl
        # the stdlib wave module leaks bare RuntimeError/OSError on some
        # corrupted chunk layouts (found by fuzzing) — normalize them
        raise ValueError(f"corrupt or truncated WAV: {e}") from e
    # slice to the sample-aligned prefix: a corrupt chunk size can hand
    # back a ragged byte count, and an exact-size unpack would leak
    # struct.error (r10 corruption fuzz)
    cnt = len(frames) // width
    if width == 1:  # 8-bit WAV is unsigned — center to signed
        return wf.getframerate(), [v - 128 for v in frames[:cnt]]
    if width == 2:
        return wf.getframerate(), list(
            struct.unpack(f"<{cnt}h", frames[:2 * cnt])
        )
    if width == 3:  # 24-bit signed little-endian
        out = []
        for j in range(cnt):
            v = int.from_bytes(frames[3 * j:3 * j + 3], "little")
            out.append(v - (1 << 24) if v & 0x800000 else v)
        return wf.getframerate(), out
    if width == 4:
        return wf.getframerate(), list(
            struct.unpack(f"<{cnt}i", frames[:4 * cnt])
        )
    raise ValueError(f"WAV sample width {width} unsupported")


def _pattern_px(x: int, y: int) -> int:
    """The deterministic test pixel: closed-form in (x, y) so an
    external SQL oracle can recompute exact pixel SUMS of generated
    images (251 is prime and < 255, so the mod actually wraps)."""
    return (x + 3 * y) % 251


def png_bytes(
    w: int, h: int, pattern: bool = False,
    color_type: int = 0, interlace: int = 0,
) -> bytes:
    """A COMPLETE valid PNG: signature + IHDR (+ PLTE) + zlib-compressed
    IDAT + IEND, each chunk CRC'd per RFC 2083 §3.2 — stdlib ``struct``
    + ``zlib`` only. ``pattern`` fills pixels with :func:`_pattern_px`
    instead of zeros. Round-11 variants: ``color_type=3`` stores the
    same byte values as indices into a 256-entry grayscale palette
    (palette[i] = (i,i,i) — decoded RGB sum = 3 × Σ pattern, mirroring
    the GIF generator); ``interlace=1`` stores the Adam7 pass layout
    (same pixels, pass-ordered storage — decoded sum unchanged)."""
    if color_type not in (0, 3):
        raise ValueError("generator supports color types 0 and 3")

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload)) + typ + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    def px(x: int, y: int) -> int:
        return _pattern_px(x, y) if pattern else 0

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, interlace)
    if interlace == 0:
        raw = b"".join(
            b"\x00" + bytes(px(x, y) for x in range(w)) for y in range(h)
        )
    else:  # Adam7: one independently-filtered sub-image per pass
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            xs = range(x0, w, dx)
            if not xs:
                continue  # zero-width pass has no scanlines
            for y in range(y0, h, dy):
                parts.append(b"\x00" + bytes(px(x, y) for x in xs))
        raw = b"".join(parts)
    body = chunk(b"IHDR", ihdr)
    if color_type == 3:
        body += chunk(
            b"PLTE", bytes(v for i in range(256) for v in (i, i, i))
        )
    return (
        b"\x89PNG\r\n\x1a\n"
        + body
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def gif_bytes(w: int, h: int, pattern: bool = False) -> bytes:
    """GIF89a. Plain: header + logical screen descriptor + trailer
    (metadata-only — enough for the sniffer). ``pattern``: a COMPLETE
    image — 256-entry grayscale global color table (palette[i] =
    (i,i,i)), image descriptor, and :func:`_lzw_encode_literal` pixel
    data of :func:`_pattern_px` in ≤255-byte sub-blocks — every spec
    decoder (including :func:`_decode_gif`) reads it back; RGB pixel
    sum = 3 × Σ pattern, same closed form as the BMP."""
    head = b"GIF89a" + struct.pack("<HH", w, h)
    if not pattern:
        return head + b"\x00\x00\x00" + b"\x3b"
    # flags: GCT present, 8-bit color resolution, 256-entry table
    head += bytes((0xF7, 0, 0))
    gct = bytes(v for i in range(256) for v in (i, i, i))
    desc = b"\x2C" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    idx = bytes(
        _pattern_px(x, y) for y in range(h) for x in range(w)
    )
    lzw = _lzw_encode_literal(idx, 8)
    blocks = bytearray([8])  # min LZW code size
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += b"\x00"
    return head + gct + desc + bytes(blocks) + b"\x3b"


def _rle_encode_row(vals: list[int], bpp: int) -> bytearray:
    """One row of palette indices → BMP RLE8/RLE4 encoded bytes
    (without the end-of-line escape): runs of ≥2 equal values become
    encoded runs, literal stretches of ≥3 become word-aligned absolute
    runs, leftovers become single-pixel encoded runs — exercising every
    mode the decoder implements."""
    out = bytearray()

    def _emit_abs(lit: list[int]) -> None:
        while lit:
            chunk, rest = lit[:255], lit[255:]
            if len(chunk) >= 3:
                out.append(0)
                out.append(len(chunk))
                if bpp == 8:
                    out.extend(chunk)
                    if len(chunk) % 2:
                        out.append(0)  # word alignment
                else:
                    nb = bytearray()
                    for k, v in enumerate(chunk):
                        if k % 2 == 0:
                            nb.append(v << 4)
                        else:
                            nb[-1] |= v
                    if len(nb) % 2:
                        nb.append(0)
                    out.extend(nb)
            else:
                for v in chunk:
                    out.append(1)
                    out.append((v << 4) if bpp == 4 else v)
            lit = rest

    i = 0
    lit: list[int] = []
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        run = min(j - i, 255)
        if run >= 2:
            _emit_abs(lit)
            lit = []
            out.append(run)
            v = vals[i]
            out.append(((v << 4) | v) if bpp == 4 else v)
            i += run
        else:
            lit.append(vals[i])
            i += 1
    _emit_abs(lit)
    return out


def bmp_bytes(
    w: int, h: int, pattern: bool = False, variant: int = 0
) -> bytes:
    """A complete valid BITMAPINFOHEADER BMP. ``variant`` selects the
    storage layout so every path of :func:`_decode_bmp` is
    hash-checkable: 0 = 24-bit BI_RGB (4-byte row padding, bottom-up),
    1 = 8-bit palettized BI_RGB, 2 = 8-bit BI_RLE8, 3 = 4-bit BI_RLE4,
    4 = 16-bit BI_BITFIELDS with the canonical 565 masks (r13).
    ``pattern`` sets pixel (x, y) to :func:`_pattern_px` on all three
    channels — variants 0–2 use a 256-entry grayscale palette (or
    direct gray), so pixel sum = 3 × Σ pattern; variant 3 is limited
    to 16 colors, palette[i] = (i, i, i), index = pattern % 16 → sum =
    3 × Σ (pattern % 16); variant 4 quantizes the pattern to 5/6/5
    bits, so sum = Σ (2·rep5(v ≫ 3) + rep6(v ≫ 2)) with repN the bit-
    replication expansion (the q53 oracle mirrors the cycle)."""
    if variant == 4:
        # 16-bit BI_BITFIELDS, canonical 565 masks after the header
        row = (w * 2 + 3) // 4 * 4
        pix = row * h
        off = 14 + 40 + 12
        header = b"BM" + struct.pack("<IHHI", off + pix, 0, 0, off)
        dib = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 16, 3, pix, 2835, 2835, 0, 0
        )
        masks = struct.pack("<III", 0xF800, 0x07E0, 0x001F)
        body = bytearray(pix)
        for yy in range(h):  # bottom-up storage order
            y = h - 1 - yy
            base = yy * row
            for x in range(w):
                v = _pattern_px(x, y) if pattern else 0
                px = ((v >> 3) << 11) | ((v >> 2) << 5) | (v >> 3)
                body[base + 2 * x:base + 2 * x + 2] = struct.pack(
                    "<H", px
                )
        return header + dib + masks + bytes(body)
    if variant == 0:
        row = (w * 3 + 3) // 4 * 4
        pix = row * h
        header = b"BM" + struct.pack("<IHHI", 54 + pix, 0, 0, 54)
        dib = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, pix, 2835, 2835, 0, 0
        )
        if not pattern:
            return header + dib + bytes(pix)
        body = bytearray(pix)
        for yy in range(h):  # bottom-up storage order
            y = h - 1 - yy
            base = yy * row
            for x in range(w):
                v = _pattern_px(x, y)
                body[base + 3 * x:base + 3 * x + 3] = bytes((v, v, v))
        return header + dib + bytes(body)
    bpp = 4 if variant == 3 else 8
    ncol = 16 if variant == 3 else 256
    pal = bytes(v for i in range(ncol) for v in (i, i, i, 0))  # BGRA

    def px(x: int, y: int) -> int:
        v = _pattern_px(x, y) if pattern else 0
        return v % 16 if variant == 3 else v

    if variant == 1:  # palettized, uncompressed
        row = (w * bpp + 31) // 32 * 4
        body = bytearray(row * h)
        for yy in range(h):
            y = h - 1 - yy
            for x in range(w):
                body[yy * row + x] = px(x, y)
        compression = 0
    else:  # RLE8 / RLE4
        body = bytearray()
        for yy in range(h):
            y = h - 1 - yy
            body += _rle_encode_row([px(x, y) for x in range(w)], bpp)
            body += b"\x00\x00"  # end of line
        body = body[:-2] + b"\x00\x01"  # last EOL → end of bitmap
        compression = 1 if variant == 2 else 2
    off = 14 + 40 + len(pal)
    header = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, compression, len(body),
        2835, 2835, ncol, 0,
    )
    return header + dib + pal + bytes(body)


def wav_bytes(
    n_samples: int, rate: int = 8000, pattern: bool = False,
    variant: int = 0,
) -> bytes:
    """A complete valid RIFF/WAVE of ``n_samples`` FRAMES. ``variant``
    selects the storage format so every :func:`decode_audio` path is
    hash-checkable: 0 = 16-bit PCM mono, 1 = 8-bit PCM mono (unsigned,
    128-centered), 2 = 32-bit IEEE float mono (values v/32768 — the
    float↔PCM16 convention, lossless for the pattern's ±100 range),
    3 = 16-bit PCM STEREO (both channels carry the frame value →
    decoded sum doubles; duration is unchanged, byte rate scales with
    block align), 4 = G.711 µ-LAW mono (r13 — the pattern here is at
    the CODE level, byte i = (11·i) mod 256, because the ±100 sample
    pattern is not µ-law-representable: the decoded sum is then
    Σ ulaw_decode((11·i) mod 256), a closed form the oracle replays;
    silence = code 0xFF, which decodes to exactly 0). ``pattern``
    writes frame i = (i % 201) − 100 instead of silence."""
    vals = [
        ((i % 201) - 100) if pattern else 0 for i in range(n_samples)
    ]
    if variant == 4:
        data = bytes(
            (11 * i) % 256 if pattern else 0xFF
            for i in range(n_samples)
        )
        width, channels, tag = 1, 1, 7
    elif variant == 1:
        data = bytes(v + 128 for v in vals)
        width, channels, tag = 1, 1, 1
    elif variant == 2:
        data = struct.pack(
            f"<{n_samples}f", *(v / 32768.0 for v in vals)
        )
        width, channels, tag = 4, 1, 3
    elif variant == 3:
        data = struct.pack(
            f"<{2 * n_samples}h",
            *(v for v in vals for _ in (0, 1)),
        )
        width, channels, tag = 2, 2, 1
    else:
        data = struct.pack(f"<{n_samples}h", *vals)
        width, channels, tag = 2, 1, 1
    block = width * channels
    fmt = struct.pack(
        "<HHIIHH", tag, channels, rate, rate * block, block, 8 * width
    )
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def synthesize_test_media(
    df: DataFrame, id_col: str = "doc_id", pattern: bool = False
) -> DataFrame:
    """→ [id_col, content]: one REAL media container per row, format
    cycling by ``id % 5`` (png, gif, bmp, wav, jpeg) with dimensions
    derived from the id — ``width = 1 + id % 64``,
    ``height = 1 + (id·7) % 64``, wav duration ``1 + id % 100`` ms
    (8 samples/ms at 8 kHz · 16-bit mono). The arithmetic is
    deliberately closed-form so an external oracle can predict, in SQL,
    exactly what :func:`sniff_media` must parse OUT of the generated
    headers — and, with ``pattern=True``, exactly what the content
    decoders must sum OUT of the pixel/sample data (the JPEG is built
    from flat DC-only blocks, so the lossy format decodes losslessly —
    see :func:`jpeg_bytes`). An end-to-end bytes-level check of the
    real parsers, not a fixture comparison."""

    pat = pattern

    @F.pandas_udf(T.BinaryType())
    def _gen(ids: pd.Series) -> pd.Series:
        return pd.Series([_media_bytes(int(i), pat) for i in ids])

    return df.select(F.col(id_col), _gen(F.col(id_col)).alias("content"))


def _media_bytes(i: int, pat: bool) -> bytes:
    """One synthesized media container for id ``i`` — the closed-form
    generation rule shared by :func:`synthesize_test_media` and the
    fused synthesize+parse operators below (r15)."""
    w, h = 1 + i % 64, 1 + (i * 7) % 64
    kind = i % 5
    if kind == 0:
        # PNG sub-variant cycles on the NEXT digit so every
        # storage layout the decoder supports is hash-checked:
        # gray / palette / Adam7-gray / Adam7-palette (r11)
        variant = (i // 5) % 4
        return png_bytes(
            w, h, pattern=pat,
            color_type=3 if variant in (1, 3) else 0,
            interlace=1 if variant >= 2 else 0,
        )
    elif kind == 1:
        return gif_bytes(w, h, pattern=pat)
    elif kind == 2:
        # BMP sub-variant cycles on the NEXT digit (the PNG
        # pattern): 24-bit / 8-bit palette / RLE8 / RLE4 /
        # 565-BITFIELDS — every storage layout _decode_bmp
        # supports is hash-checked (r12-r13; RLE4's 16-color
        # limit folds the pattern mod 16, BITFIELDS quantizes
        # it to 5/6/5 bits — both mirrored by the oracle)
        return bmp_bytes(w, h, pattern=pat, variant=(i // 5) % 5)
    elif kind == 3:
        # WAV sub-variant cycles on the NEXT digit (r12-r13):
        # PCM16 / PCM8 / float32 / stereo16 / G.711 µ-law —
        # every decode_audio path hash-checked; stereo doubles
        # the decoded sum, µ-law sums the ITU expansion of its
        # code-level pattern, duration is variant-invariant
        return wav_bytes(
            8 * (1 + i % 100), pattern=pat, variant=(i // 5) % 5
        )
    else:
        # JPEG sub-variant cycles on the NEXT digit (r13):
        # 8-bit grayscale / 4-component Adobe CMYK / 12-bit
        # extended-sequential grayscale / LOSSLESS (SOF3) —
        # CMYK decodes to the same block pattern on all three
        # RGB channels (sum ×3), 12-bit scales back to the
        # identical 8-bit pattern (×1), lossless carries the
        # FULL-resolution pattern (pixel(x,y) = pattern(x,y),
        # not the block grid) — all mirrored by the oracle
        variant = (i // 5) % 4
        if variant == 3:
            return jpeg_bytes_lossless(w, h, pattern=pat, predictor=1)
        return jpeg_bytes(
            w, h, pattern=pat, cmyk=variant == 1,
            precision=12 if variant == 2 else 8,
        )


def synthesize_media_meta(
    df: DataFrame, id_col: str = "doc_id", pattern: bool = False
) -> DataFrame:
    """FUSED :func:`synthesize_test_media` → :func:`attach_media_meta`
    (r15, guide §4: pass only the columns the function needs). The
    two-operator formulation ships every synthesized container across
    the Python→JVM Arrow boundary only to ship it straight back into a
    second Python worker pass that parses its header; fused, the only
    Arrow traffic is ids in, meta structs out — the media bytes never
    leave the worker. Output identical by construction
    (``sniff_media(gen(id))`` composed in-process)."""
    pat = pattern

    @F.pandas_udf(MEDIA_META)
    def _gen_meta(ids: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [sniff_media(_media_bytes(int(i), pat)) for i in ids],
            columns=["mime", "width", "height", "duration_ms", "codec"],
        )

    return df.select(
        F.col(id_col), _gen_meta(F.col(id_col)).alias("media_meta")
    )


def synthesize_media_content(
    df: DataFrame, id_col: str = "doc_id", pattern: bool = True
) -> DataFrame:
    """FUSED :func:`synthesize_test_media` →
    :func:`extract_media_content` (r15): generate AND decode inside one
    ``mapInPandas`` pass — ids in, (mime, dims, sums) out, media bytes
    never cross the Arrow boundary. Decode semantics are byte-identical
    to ``extract_media_content`` (same sniff/decode calls, same NULL
    handling for undecodable payloads)."""
    pat = pattern

    def _gen_ex(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for rid in pdf[id_col]:
                b = _media_bytes(int(rid), pat)
                mime = sniff_media(b)[0]
                w = h = ch = nv = vs = None
                try:
                    if mime in ("image/png", "image/bmp", "image/gif",
                                "image/jpeg"):
                        w, h, ch, px = decode_image(b)
                        arr = np.frombuffer(px, dtype=np.uint8)
                        nv, vs = int(arr.size), int(
                            arr.sum(dtype=np.int64)
                        )
                    elif mime == "audio/wav":
                        _, samples = decode_audio(b)
                        a = np.asarray(samples, dtype=np.int64)
                        nv, vs = int(a.size), int(a.sum())
                except (NotImplementedError, ValueError):
                    pass  # undecodable/corrupt payload — stats stay NULL
                rows.append((int(rid), mime, w, h, ch, nv, vs))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "mime", "width", "height",
                    "channels", "n_values", "vsum",
                ],
            )

    from .util import fan_out

    return fan_out(df.select(id_col)).mapInPandas(
        _gen_ex, schema=CONTENT_SCHEMA
    )


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


CONTENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_values", T.LongType()),
        T.StructField("vsum", T.LongType()),
    ]
)


def extract_media_content(
    df: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """REAL content decode over binary payloads, Arrow-batched
    (mapInPandas): PNG/BMP pixels via :func:`decode_image` (numpy sum
    over the decoded bytes), WAV PCM16 samples via
    :func:`decode_audio`. One row per input with
    (mime, width, height, channels, n_values, vsum); GIF decodes via
    the pure-python LZW in :func:`_decode_gif`. Payloads the stdlib
    cannot decode (JPEG, content-less containers) or that are not media
    keep their sniffed mime and NULL stats — typed NULLs, never
    garbage.
    ``vsum`` (Σ pixel bytes / Σ samples) is exact integer arithmetic,
    so generated patterned media is verifiable by a SQL oracle."""

    def _ex(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for rid, b in zip(pdf[id_col], pdf[content_col]):
                mime = sniff_media(b)[0]
                w = h = ch = nv = vs = None
                try:
                    if mime in ("image/png", "image/bmp", "image/gif",
                                "image/jpeg"):
                        w, h, ch, px = decode_image(b)
                        arr = np.frombuffer(px, dtype=np.uint8)
                        nv, vs = int(arr.size), int(
                            arr.sum(dtype=np.int64)
                        )
                    elif mime == "audio/wav":
                        _, samples = decode_audio(b)
                        a = np.asarray(samples, dtype=np.int64)
                        nv, vs = int(a.size), int(a.sum())
                except (NotImplementedError, ValueError):
                    pass  # undecodable/corrupt payload — stats stay NULL
                rows.append((int(rid), mime, w, h, ch, nv, vs))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "mime", "width", "height",
                    "channels", "n_values", "vsum",
                ],
            )

    from .util import fan_out

    return fan_out(df.select(id_col, content_col)).mapInPandas(
        _ex, schema=CONTENT_SCHEMA
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
