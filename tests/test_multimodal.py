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


# ---------------------------------------------------------------------------
# round 9b: REAL pixel/sample decode (stdlib zlib + struct + wave)
# ---------------------------------------------------------------------------

def test_decode_png_bmp_wav_patterned_roundtrip():
    w, h = 33, 47
    exp = sum(M._pattern_px(x, y) for x in range(w) for y in range(h))
    wp, hp, ch, px = M.decode_image(M.png_bytes(w, h, pattern=True))
    assert (wp, hp, ch) == (w, h, 1) and sum(px) == exp
    wb, hb, chb, pxb = M.decode_image(M.bmp_bytes(w, h, pattern=True))
    assert (wb, hb, chb) == (w, h, 3) and sum(pxb) == 3 * exp
    rate, samples = M.decode_audio(M.wav_bytes(8 * 77, pattern=True))
    assert rate == 8000 and len(samples) == 616
    assert sum(samples) == sum((i % 201) - 100 for i in range(616))
    # zero-content variants decode to zero sums
    assert sum(M.decode_image(M.png_bytes(5, 5))[3]) == 0
    assert sum(M.decode_image(M.bmp_bytes(5, 5))[3]) == 0


def test_decode_png_all_filter_types():
    """The unfilter loop must handle every RFC 2083 filter, not just
    the filter-0 rows our own encoder writes: re-encode a known image
    with each row cycling through none/sub/up/average/paeth and decode
    it back bit-for-bit."""
    import struct
    import zlib

    def png_with_filters(w, h, pixels, filters):
        def chunk(t, p):
            return (
                struct.pack(">I", len(p)) + t + p
                + struct.pack(">I", zlib.crc32(t + p) & 0xFFFFFFFF)
            )

        raw = bytearray()
        prev = bytes(w)
        for y in range(h):
            line = bytes(pixels[y * w:(y + 1) * w])
            f = filters[y % len(filters)]
            enc = bytearray(line)
            if f == 1:
                for x in range(w - 1, 0, -1):
                    enc[x] = (enc[x] - line[x - 1]) & 0xFF
            elif f == 2:
                for x in range(w):
                    enc[x] = (enc[x] - prev[x]) & 0xFF
            elif f == 3:
                for x in range(w):
                    left = line[x - 1] if x else 0
                    enc[x] = (enc[x] - ((left + prev[x]) >> 1)) & 0xFF
            elif f == 4:
                for x in range(w):
                    left = line[x - 1] if x else 0
                    ul = prev[x - 1] if x else 0
                    enc[x] = (
                        enc[x] - M._paeth(left, prev[x], ul)
                    ) & 0xFF
            raw += bytes([f]) + bytes(enc)
            prev = line
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )

    w, h = 13, 10
    pixels = [(x * 7 + y * 31) % 256 for y in range(h) for x in range(w)]
    got = M.decode_image(png_with_filters(w, h, pixels, [0, 1, 2, 3, 4]))
    assert got[:3] == (w, h, 1)
    assert list(got[3]) == pixels


def test_decode_unsupported_raises():
    import struct

    import pytest as _pytest

    # JPEG content (DCT+huffman) stays behind the imaging-library stub
    jpeg = (
        b"\xff\xd8" + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", 2, 2) + b"\x01\x11\x00" + b"\xff\xd9"
    )
    with _pytest.raises(NotImplementedError):
        M.decode_image(jpeg)
    # a content-less GIF (header+trailer only) has no image to decode
    with _pytest.raises(ValueError):
        M.decode_image(M.gif_bytes(3, 3))


def test_decode_gif_lzw_roundtrip():
    """The generator's spec-valid literal LZW stream AND a real
    compressing encoder's stream (width growth 9→12 bits, 4096-cap
    CLEAR resets, the KwKwK case) both decode exactly."""
    for (w, h) in ((1, 1), (33, 47), (64, 64)):
        wd, hd, ch, px = M.decode_image(M.gif_bytes(w, h, pattern=True))
        exp = 3 * sum(
            M._pattern_px(x, y) for x in range(w) for y in range(h)
        )
        assert (wd, hd, ch) == (w, h, 3) and sum(px) == exp

    def lzw_encode_full(indices, mcs=8):
        clear, end = 1 << mcs, (1 << mcs) + 1
        out = bytearray()
        buf = {"acc": 0, "bits": 0}
        state = {"width": mcs + 1}

        def em(code):
            buf["acc"] |= code << buf["bits"]
            buf["bits"] += state["width"]
            while buf["bits"] >= 8:
                out.append(buf["acc"] & 0xFF)
                buf["acc"] >>= 8
                buf["bits"] -= 8

        def fresh():
            state["width"] = mcs + 1
            return {bytes([c]): c for c in range(clear)}, end + 1

        em(clear)
        table, nxt = fresh()
        wbuf = b""
        for cc in bytes(indices):
            t = wbuf + bytes([cc])
            if t in table:
                wbuf = t
                continue
            em(table[wbuf])
            if nxt < 4096:
                table[t] = nxt
                nxt += 1
                if nxt == (1 << state["width"]) and state["width"] < 12:
                    state["width"] += 1
            else:
                em(clear)
                table, nxt = fresh()
            wbuf = bytes([cc])
        if wbuf:
            em(table[wbuf])
        em(end)
        if buf["bits"]:
            out.append(buf["acc"] & 0xFF)
        return bytes(out)

    import random

    rng = random.Random(7)
    for data in (
        bytes(rng.randrange(256) for _ in range(4000)) + bytes(2000),
        bytes(3) * 3000 + b"\x07" * 3000,
        bytes(rng.randrange(256) for _ in range(20000)),  # cap resets
        b"\x01" * 8,  # KwKwK
    ):
        assert M._lzw_decode(lzw_encode_full(data), 8, len(data)) == data


def test_extract_media_content_end_to_end(spark):
    import pyspark.sql.functions as F

    ids = spark.range(0, 16).select(F.col("id").alias("doc_id"))
    out = {
        r["doc_id"]: r
        for r in M.extract_media_content(
            M.synthesize_test_media(ids, pattern=True)
        ).collect()
    }
    for i in range(16):
        r = out[i]
        kind = i % 4
        w, h = 1 + i % 64, 1 + (i * 7) % 64
        if kind == 0:
            exp = sum(M._pattern_px(x, y) for x in range(w) for y in range(h))
            assert (r["width"], r["height"], r["channels"]) == (w, h, 1)
            assert r["vsum"] == exp and r["n_values"] == w * h
        elif kind == 2:
            exp = sum(M._pattern_px(x, y) for x in range(w) for y in range(h))
            assert r["vsum"] == 3 * exp and r["channels"] == 3
        elif kind == 3:
            n = 8 * (1 + i % 100)
            assert r["vsum"] == sum((j % 201) - 100 for j in range(n))
            assert r["n_values"] == n
        else:  # gif: pure-python LZW decode, grayscale palette → RGB
            exp = sum(M._pattern_px(x, y) for x in range(w) for y in range(h))
            assert r["mime"] == "image/gif"
            assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
            assert r["vsum"] == 3 * exp


# ---------------------------------------------------------------------------
# fuzz: scraped-data robustness — decoders must fail CLEANLY on garbage
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=400))
def test_sniff_media_never_raises(data):
    out = M.sniff_media(data)
    assert isinstance(out, tuple) and len(out) == 5


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=400))
def test_decode_image_fails_cleanly_on_garbage(data):
    """Arbitrary bytes → either a clean decode (if they accidentally
    form a valid container) or ValueError/NotImplementedError — never
    an unhandled IndexError/struct.error/zlib crash."""
    try:
        M.decode_image(data)
    except (ValueError, NotImplementedError):
        pass


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=300))
def test_decoders_on_corrupted_valid_prefixes(data):
    """A REAL container header followed by garbage must also fail
    cleanly (truncation/corruption mid-file is the common scrape
    defect)."""
    for prefix in (
        M.png_bytes(5, 4, pattern=True)[:30],
        M.bmp_bytes(5, 4, pattern=True)[:40],
        M.gif_bytes(5, 4, pattern=True)[:25],
    ):
        try:
            M.decode_image(prefix + data)
        except (ValueError, NotImplementedError):
            pass
    try:
        M.decode_audio(M.wav_bytes(16, pattern=True)[:30] + data)
    except (ValueError, NotImplementedError):
        pass  # wave.Error et al. are converted to ValueError
