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


def test_decode_image_rejects_unknown_container():
    with pytest.raises(ValueError):
        M.decode_image(b"\x89PNG...")  # bad signature, not a container
    with pytest.raises(ValueError):
        M.decode_image(b"definitely not media")


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
        kind = i % 5
        if kind == 3:
            # r12-r13 variant cycle: float32 sniffs pcm_float, the
            # G.711 variant sniffs ulaw
            want = {2: "pcm_float", 4: "ulaw"}.get((i // 5) % 5, "pcm")
            assert r["mime"] == "audio/wav" and r["codec"] == want
            assert r["duration_ms"] == 1 + i % 100
            assert r["width"] is None and r["height"] is None
        else:
            assert r["mime"] == [
                "image/png", "image/gif", "image/bmp", None, "image/jpeg"
            ][kind]
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

    # a JPEG frame header with no scan data is corrupt, not unsupported
    jpeg = (
        b"\xff\xd8" + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", 2, 2) + b"\x01\x11\x00" + b"\xff\xd9"
    )
    with _pytest.raises(ValueError):
        M.decode_image(jpeg)
    # progressive (SOF2) is SUPPORTED since r10; a progressive frame
    # with no scan is corrupt, not unsupported
    prog = (
        b"\xff\xd8" + b"\xff\xc2" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", 2, 2) + b"\x01\x11\x00" + b"\xff\xd9"
    )
    with _pytest.raises(ValueError):
        M.decode_image(prog)
    # lossless (SOF3) is SUPPORTED since r13 — a scan-less lossless
    # frame is corrupt like the other supported processes (the
    # malformed 2-byte component spec here trips the sampling guard)
    lossless_frame = (
        b"\xff\xd8" + b"\xff\xc3" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", 2, 2) + b"\x01\x11\x00" + b"\xff\xd9"
    )
    with _pytest.raises(ValueError):
        M.decode_image(lossless_frame)
    # arithmetic-coded (SOF9) stays unsupported
    frame = (
        b"\xff\xd8" + b"\xff\xc9" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", 2, 2) + b"\x01\x11\x00" + b"\xff\xd9"
    )
    with _pytest.raises(NotImplementedError):
        M.decode_image(frame)
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

    ids = spark.range(0, 20).select(F.col("id").alias("doc_id"))
    out = {
        r["doc_id"]: r
        for r in M.extract_media_content(
            M.synthesize_test_media(ids, pattern=True)
        ).collect()
    }
    for i in range(20):
        r = out[i]
        kind = i % 5
        w, h = 1 + i % 64, 1 + (i * 7) % 64
        if kind == 0:
            # r11: PNG sub-variant cycles by (i//5)%4 — palette layouts
            # (1, 3) decode through the grayscale PLTE to RGB (×3)
            exp = sum(M._pattern_px(x, y) for x in range(w) for y in range(h))
            ch = 3 if ((i // 5) % 4) in (1, 3) else 1
            assert (r["width"], r["height"], r["channels"]) == (w, h, ch)
            assert r["vsum"] == ch * exp and r["n_values"] == ch * w * h
        elif kind == 2:
            # r12-r13: BMP sub-variant cycles by (i//5)%5 — 24-bit /
            # 8-bit palette / RLE8 carry the full pattern; RLE4's
            # 16-color palette folds it mod 16; 565-BITFIELDS
            # quantizes to 5/6/5 bits with bit-replication expansion
            variant = (i // 5) % 5
            if variant == 3:
                exp = 3 * sum(
                    M._pattern_px(x, y) % 16
                    for x in range(w) for y in range(h)
                )
            elif variant == 4:
                def rep(u, nb):
                    return (u << (8 - nb)) | (u >> (2 * nb - 8))
                exp = sum(
                    2 * rep(M._pattern_px(x, y) >> 3, 5)
                    + rep(M._pattern_px(x, y) >> 2, 6)
                    for x in range(w) for y in range(h)
                )
            else:
                exp = 3 * sum(
                    M._pattern_px(x, y)
                    for x in range(w) for y in range(h)
                )
            assert r["vsum"] == exp and r["channels"] == 3
        elif kind == 3:
            # r12-r13: WAV sub-variant cycles by (i//5)%5 — PCM16/
            # PCM8/float32 decode identically; stereo doubles sum and
            # count; µ-law sums the ITU expansion of its code pattern
            n = 8 * (1 + i % 100)
            variant = (i // 5) % 5
            if variant == 4:
                want = sum(
                    M._ulaw_decode((11 * j) % 256) for j in range(n)
                )
                ch = 1
            else:
                want = sum((j % 201) - 100 for j in range(n))
                ch = 2 if variant == 3 else 1
                want *= ch
            assert r["vsum"] == want
            assert r["n_values"] == ch * n
        elif kind == 4:
            # jpeg: r13 sub-variant cycles by (i//5)%4 — 8-bit gray
            # DCT / Adobe CMYK (same block pattern ×3 channels) /
            # 12-bit extended-sequential (scales back bit-exactly) /
            # lossless SOF3 (FULL-resolution pattern)
            variant = (i // 5) % 4
            if variant == 3:
                exp = sum(
                    M._pattern_px(x, y)
                    for x in range(w) for y in range(h)
                )
                ch = 1
            else:
                exp = sum(
                    M._pattern_px(x // 8, y // 8)
                    for x in range(w) for y in range(h)
                )
                ch = 3 if variant == 1 else 1
            assert r["mime"] == "image/jpeg"
            assert (r["width"], r["height"], r["channels"]) == (w, h, ch)
            assert r["vsum"] == ch * exp and r["n_values"] == ch * w * h
        else:  # gif: pure-python LZW decode, grayscale palette → RGB
            exp = sum(M._pattern_px(x, y) for x in range(w) for y in range(h))
            assert r["mime"] == "image/gif"
            assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
            assert r["vsum"] == 3 * exp


def test_decode_refuses_absurd_dimensions():
    """A corrupt/hostile header declaring a multi-gigapixel image must
    raise BEFORE allocating coefficient/pixel buffers (the r10
    corruption fuzz thrashed on a flipped dimension byte)."""
    import struct

    import pytest as _pytest

    # JPEG claiming 65535x65535
    jb = bytearray(M.jpeg_bytes(8, 8, pattern=True))
    sof = jb.find(b"\xff\xc0")
    jb[sof + 5:sof + 9] = struct.pack(">HH", 65535, 65535)
    with _pytest.raises(ValueError, match="refusing"):
        M.decode_image(bytes(jb))
    # PNG IHDR claiming 2^30 x 2^30
    pb = bytearray(M.png_bytes(4, 4, pattern=True))
    pb[16:24] = struct.pack(">II", 1 << 30, 1 << 30)
    with _pytest.raises(ValueError):
        M.decode_image(bytes(pb))
    # GIF image descriptor claiming 65535x65535 (descriptor sits right
    # after the 13-byte header + 768-byte global color table; a find()
    # would hit palette byte 0x2C first)
    gb = bytearray(M.gif_bytes(4, 4, pattern=True))
    d = 13 + 768
    assert gb[d] == 0x2C
    gb[d + 5:d + 9] = struct.pack("<HH", 65535, 65535)
    with _pytest.raises(ValueError):
        M.decode_image(bytes(gb))
    # BMP claiming 65535x65535
    bb = bytearray(M.bmp_bytes(4, 4, pattern=True))
    bb[18:26] = struct.pack("<ii", 65535, 65535)
    with _pytest.raises(ValueError):
        M.decode_image(bytes(bb))


def test_decode_rejects_truncated_bmp_and_bad_gif_palette():
    """Two quadratic-resize near-hangs from the r10 corruption fuzz:
    a BMP whose (corrupted) height points past the pixel data, and a
    GIF pixel index outside the color table — both previously assigned
    short slices into the output bytearray, shrinking and memmoving it
    per pixel/row. Both must raise promptly instead."""
    import struct
    import time

    import pytest as _pytest

    bb = bytearray(M.bmp_bytes(10, 6, pattern=True))
    bb[24] = 8  # height byte 2 → h ≈ 524k, within the pixel cap
    t0 = time.time()
    with _pytest.raises(ValueError):
        M.decode_image(bytes(bb))
    assert time.time() - t0 < 1.0

    # GIF with a 2-color local table but 8-bit pattern indices
    head = b"GIF89a" + struct.pack("<HH", 4, 4) + bytes((0, 0, 0))
    desc = b"\x2C" + struct.pack("<HHHH", 0, 0, 4, 4) + b"\x80"
    lct = bytes((0, 0, 0, 255, 255, 255))  # 2 entries
    idx = bytes((0, 1, 2, 3) * 4)  # indices 2/3 are out of range
    lzw = M._lzw_encode_literal(idx, 8)
    blocks = bytearray([8])
    blocks += bytes([len(lzw)]) + lzw + b"\x00"
    with _pytest.raises(ValueError):
        M.decode_image(head + desc + lct + bytes(blocks) + b"\x3b")


def test_decode_gif_interlaced():
    """Interlaced GIFs (the 0x40 descriptor flag) deinterlace through
    the 4-pass row order — decoded pixels equal the logical top-down
    image, bit for bit."""
    import struct

    def interlaced_gif(w, h):
        head = b"GIF89a" + struct.pack("<HH", w, h) + bytes((0xF7, 0, 0))
        gct = bytes(v for i in range(256) for v in (i, i, i))
        desc = b"\x2C" + struct.pack("<HHHH", 0, 0, w, h) + b"\x40"
        rows = [
            bytes(M._pattern_px(x, y) for x in range(w))
            for y in range(h)
        ]
        order = [
            y
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
            for y in range(start, h, step)
        ]
        idx = b"".join(rows[y] for y in order)
        lzw = M._lzw_encode_literal(idx, 8)
        blocks = bytearray([8])
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            blocks += bytes([len(chunk)]) + chunk
        blocks += b"\x00"
        return head + gct + desc + bytes(blocks) + b"\x3b"

    for (w, h) in ((3, 1), (7, 5), (16, 16), (13, 29)):
        wd, hd, ch, px = M.decode_image(interlaced_gif(w, h))
        exp = bytes(
            v
            for y in range(h)
            for x in range(w)
            for v in [M._pattern_px(x, y)] * 3
        )
        assert (wd, hd, ch) == (w, h, 3)
        assert bytes(px) == exp


# ---------------------------------------------------------------------------
# round 10: baseline JPEG decode (from-scratch huffman + IDCT)
# ---------------------------------------------------------------------------

def test_decode_jpeg_patterned_roundtrip():
    """The generator's flat-DC-block construction decodes LOSSLESSLY:
    pixel(x, y) == pattern(x//8, y//8) bit-for-bit."""
    for (w, h) in ((1, 1), (8, 8), (33, 47), (64, 64), (9, 17)):
        jb = M.jpeg_bytes(w, h, pattern=True)
        assert M.sniff_media(jb) == ("image/jpeg", w, h, None, "jpeg")
        wd, hd, ch, px = M.decode_image(jb)
        assert (wd, hd, ch) == (w, h, 1)
        exp = bytes(
            M._pattern_px(x // 8, y // 8)
            for y in range(h) for x in range(w)
        )
        assert bytes(px) == exp
    assert sum(M.decode_image(M.jpeg_bytes(10, 10))[3]) == 0


def _encode_jpeg_independent(planes, w, h, samplings, dri=0):
    """An INDEPENDENT full baseline encoder (forward DCT + quant-1 +
    huffman with its own 256-symbol AC table + optional subsampling and
    restart markers) — pins the decoder's entropy/zigzag/IDCT/upsample
    plumbing against a second implementation of the standard, not
    against the engine's own generator."""
    import struct

    import numpy as np

    mb = M._idct_basis()
    zz = M._JPEG_ZIGZAG
    dc_counts = [0, 0, 0, 12] + [0] * 12
    dc_vals = list(range(12))
    ac_counts = [0] * 16
    ac_counts[7] = 255
    ac_counts[8] = 1
    ac_vals = list(range(256))
    enc_dc = {
        v: lc for lc, v in M._jpeg_huff_table(
            bytes(dc_counts), bytes(dc_vals)
        ).items()
    }
    enc_ac = {
        v: lc for lc, v in M._jpeg_huff_table(
            bytes(ac_counts), bytes(ac_vals)
        ).items()
    }
    out = bytearray()
    st = {"acc": 0, "n": 0}

    def emit(code, nbits):
        st["acc"] = (st["acc"] << nbits) | code
        st["n"] += nbits
        while st["n"] >= 8:
            st["n"] -= 8
            byte = (st["acc"] >> st["n"]) & 0xFF
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
        st["acc"] &= (1 << st["n"]) - 1

    def align_pad():
        if st["n"]:
            pad = 8 - st["n"]
            emit((1 << pad) - 1, pad)

    def cat(v):
        v = int(v)
        return v.bit_length() if v >= 0 else (-v).bit_length()

    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)
    mcx = (w + 8 * hmax - 1) // (8 * hmax)
    mcy = (h + 8 * vmax - 1) // (8 * vmax)
    padded = []
    for p, (hs, vs) in zip(planes, samplings):
        ph, pw = mcy * vs * 8, mcx * hs * 8
        canvas = np.zeros((ph, pw), dtype=float)
        canvas[: p.shape[0], : p.shape[1]] = p
        # replicate edges so padded blocks stay mild (keeps DC diffs
        # within baseline's 11 categories)
        canvas[p.shape[0]:, : p.shape[1]] = p[-1:, :]
        canvas[:, p.shape[1]:] = canvas[:, p.shape[1] - 1:p.shape[1]]
        padded.append(canvas)
    pred = [0] * len(planes)
    done = 0
    rst = 0
    for my in range(mcy):
        for mx in range(mcx):
            if dri and done and done % dri == 0:
                align_pad()
                out.append(0xFF)
                out.append(0xD0 + rst % 8)
                rst += 1
                pred = [0] * len(planes)
            for ci, (hs, vs) in enumerate(samplings):
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        blk = padded[ci][y0:y0 + 8, x0:x0 + 8] - 128.0
                        coef = np.rint(mb @ blk @ mb.T).astype(int)
                        zzc = [coef.flat[zz[k]] for k in range(64)]
                        diff = zzc[0] - pred[ci]
                        pred[ci] = zzc[0]
                        s = cat(diff)
                        ln, code = enc_dc[s]
                        emit(code, ln)
                        if s:
                            emit(
                                diff if diff >= 0
                                else diff + (1 << s) - 1, s,
                            )
                        run = 0
                        for k in range(1, 64):
                            v = zzc[k]
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                ln, code = enc_ac[0xF0]  # ZRL
                                emit(code, ln)
                                run -= 16
                            s = cat(v)
                            ln, code = enc_ac[(run << 4) | s]
                            emit(code, ln)
                            emit(v if v >= 0 else v + (1 << s) - 1, s)
                            run = 0
                        if run:
                            ln, code = enc_ac[0x00]  # EOB
                            emit(code, ln)
            done += 1
    align_pad()

    def seg(marker, payload):
        return bytes((0xFF, marker)) + struct.pack(
            ">H", len(payload) + 2
        ) + payload

    nc = len(planes)
    sof_comps = b"".join(
        bytes((ci + 1, (hs << 4) | vs, 0))
        for ci, (hs, vs) in enumerate(samplings)
    )
    sos_comps = b"".join(bytes((ci + 1, 0x00)) for ci in range(nc))
    parts = [b"\xff\xd8", seg(0xDB, b"\x00" + bytes([1] * 64))]
    if dri:
        parts.append(seg(0xDD, struct.pack(">H", dri)))
    parts += [
        seg(0xC0, b"\x08" + struct.pack(">HH", h, w)
            + bytes((nc,)) + sof_comps),
        seg(0xC4, b"\x00" + bytes(dc_counts) + bytes(dc_vals)
            + b"\x10" + bytes(ac_counts) + bytes(ac_vals)),
        seg(0xDA, bytes((nc,)) + sos_comps + b"\x00\x3f\x00"),
        bytes(out), b"\xff\xd9",
    ]
    return b"".join(parts)


def test_decode_jpeg_general_grayscale_with_ac():
    """Real AC coefficients (smooth gradient → many nonzero ACs, runs,
    EOBs) through the independent encoder must decode within the
    quant-1 rounding envelope."""
    import numpy as np

    w, h = 21, 14
    plane = np.array(
        [[30 + ((5 * x + 3 * y + (x * y) % 7) % 180) for x in range(w)]
         for y in range(h)], dtype=float,
    )
    jb = _encode_jpeg_independent([plane], w, h, [(1, 1)])
    wd, hd, ch, px = M.decode_image(jb)
    assert (wd, hd, ch) == (w, h, 1)
    got = np.frombuffer(px, dtype=np.uint8).reshape(h, w).astype(float)
    assert np.abs(got - plane).max() <= 6.0


def test_decode_jpeg_color_and_subsampling():
    """3-component YCbCr, 4:4:4 and a 2×1-subsampled variant — the
    chroma upsample + color conversion path."""
    import numpy as np

    w, h = 16, 12
    y = np.array(
        [[40 + (7 * x + 11 * yy) % 170 for x in range(w)]
         for yy in range(h)], dtype=float,
    )
    cb = np.full((h, w), 140.0)
    cr = np.full((h, w), 120.0)
    jb = _encode_jpeg_independent(
        [y, cb, cr], w, h, [(1, 1), (1, 1), (1, 1)]
    )
    wd, hd, ch, px = M.decode_image(jb)
    assert (wd, hd, ch) == (w, h, 3)
    rgb = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3).astype(float)
    exp_r = np.clip(np.rint(y + 1.402 * (cr - 128)), 0, 255)
    exp_g = np.clip(
        np.rint(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)), 0, 255
    )
    exp_b = np.clip(np.rint(y + 1.772 * (cb - 128)), 0, 255)
    assert np.abs(rgb[:, :, 0] - exp_r).max() <= 8.0
    assert np.abs(rgb[:, :, 1] - exp_g).max() <= 8.0
    assert np.abs(rgb[:, :, 2] - exp_b).max() <= 8.0

    # 2×1 luma sampling (4:2:2-style): chroma stored at half width
    cb2 = np.full((h, w // 2), 150.0)
    cr2 = np.full((h, w // 2), 110.0)
    jb2 = _encode_jpeg_independent(
        [y, cb2, cr2], w, h, [(2, 1), (1, 1), (1, 1)]
    )
    wd, hd, ch, px = M.decode_image(jb2)
    assert (wd, hd, ch) == (w, h, 3)
    rgb2 = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3).astype(float)
    exp_r2 = np.clip(np.rint(y + 1.402 * (110.0 - 128)), 0, 255)
    assert np.abs(rgb2[:, :, 0] - exp_r2).max() <= 8.0


def test_decode_jpeg_restart_intervals():
    """DRI/RSTn: predictors reset and the bit reader re-aligns at every
    restart marker."""
    import numpy as np

    w, h = 40, 24  # 5×3 = 15 MCUs, restart every 2
    plane = np.array(
        [[60 + (x * 3 + y * 5) % 120 for x in range(w)]
         for y in range(h)], dtype=float,
    )
    jb = _encode_jpeg_independent([plane], w, h, [(1, 1)], dri=2)
    wd, hd, ch, px = M.decode_image(jb)
    assert (wd, hd, ch) == (w, h, 1)
    got = np.frombuffer(px, dtype=np.uint8).reshape(h, w).astype(float)
    assert np.abs(got - plane).max() <= 6.0


def _encode_jpeg_progressive(plane, w, h, scans):
    """An INDEPENDENT progressive (SOF2) grayscale encoder: forward DCT
    + quant-1 coefficients delivered through the caller's scan script —
    spectral selection (Ss..Se bands), successive approximation (first
    pass sends v/2^Al, refinement passes send correction bits), EOBn
    run codes, ZRL-in-refinement, the works (T.81 G.1.2 encode side).
    Exists to pin the decoder against a second implementation; the
    engine has no progressive encoder."""
    import struct

    import numpy as np

    mb = M._idct_basis()
    zz = M._JPEG_ZIGZAG
    dc_counts = [0, 0, 0, 12] + [0] * 12
    dc_vals = list(range(12))
    ac_counts = [0] * 16
    ac_counts[7] = 255
    ac_counts[8] = 1
    ac_vals = list(range(256))
    enc_dc = {
        v: lc for lc, v in M._jpeg_huff_table(
            bytes(dc_counts), bytes(dc_vals)
        ).items()
    }
    enc_ac = {
        v: lc for lc, v in M._jpeg_huff_table(
            bytes(ac_counts), bytes(ac_vals)
        ).items()
    }
    bw, bh = (w + 7) // 8, (h + 7) // 8
    canvas = np.zeros((bh * 8, bw * 8), dtype=float)
    canvas[:h, :w] = plane
    canvas[h:, :w] = plane[-1:, :]
    canvas[:, w:] = canvas[:, w - 1:w]
    blocks = []  # zig-zag int coefficients per block, raster order
    for by in range(bh):
        for bx in range(bw):
            blk = canvas[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
            coef = np.rint(mb @ blk @ mb.T).astype(int)
            blocks.append([int(coef.flat[zz[k]]) for k in range(64)])

    out = bytearray()
    st = {"acc": 0, "n": 0}

    def emit(code, nbits):
        if nbits == 0:
            return
        st["acc"] = (st["acc"] << nbits) | code
        st["n"] += nbits
        while st["n"] >= 8:
            st["n"] -= 8
            byte = (st["acc"] >> st["n"]) & 0xFF
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
        st["acc"] &= (1 << st["n"]) - 1

    def pad():
        if st["n"]:
            k = 8 - st["n"]
            emit((1 << k) - 1, k)

    def cat(v):
        v = int(v)
        return v.bit_length() if v >= 0 else (-v).bit_length()

    def approx(v, al):
        return v >> al if v >= 0 else -((-v) >> al)

    def scan_bits(Ss, Se, Ah, Al):
        if Ss == 0 and Ah == 0:  # DC first (at precision Al)
            # DC uses the ARITHMETIC shift (libjpeg/T.81 G.1.2.1): the
            # refinement OR of bit Al then reconstructs negatives in
            # two's complement; python's >> on ints IS the floor shift
            pred = 0
            for zc in blocks:
                dc = zc[0] >> Al
                diff = dc - pred
                pred = dc
                s = cat(diff)
                ln, code = enc_dc[s]
                emit(code, ln)
                if s:
                    emit(diff if diff >= 0 else diff + (1 << s) - 1, s)
        elif Ss == 0:  # DC refinement: bit Al of each block's DC
            for zc in blocks:
                emit((zc[0] >> Al) & 1, 1)
        elif Ah == 0:  # AC first
            eobrun = 0

            def flush_eob():
                nonlocal eobrun
                if eobrun:
                    r = eobrun.bit_length() - 1
                    ln, code = enc_ac[r << 4]
                    emit(code, ln)
                    emit(eobrun - (1 << r), r)
                    eobrun = 0

            for zc in blocks:
                vals = [approx(zc[k], Al) for k in range(64)]
                last = 0
                for k in range(Ss, Se + 1):
                    if vals[k]:
                        last = k
                if not any(vals[k] for k in range(Ss, Se + 1)):
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                r = 0
                for k in range(Ss, Se + 1):
                    v = vals[k]
                    if v == 0:
                        r += 1
                        continue
                    while r > 15:
                        ln, code = enc_ac[0xF0]
                        emit(code, ln)
                        r -= 16
                    s = cat(v)
                    ln, code = enc_ac[(r << 4) | s]
                    emit(code, ln)
                    emit(v if v >= 0 else v + (1 << s) - 1, s)
                    r = 0
                    if k == last:
                        break
                if last < Se:
                    eobrun += 1
            flush_eob()
        else:  # AC refinement (T.81 G.1.2.3 encode side)
            eobrun = 0
            be: list = []  # correction bits riding the pending EOB run

            def flush_eob():
                nonlocal eobrun
                if eobrun:
                    r = eobrun.bit_length() - 1
                    ln, code = enc_ac[r << 4]
                    emit(code, ln)
                    emit(eobrun - (1 << r), r)
                    eobrun = 0
                for bit in be:
                    emit(bit, 1)
                del be[:]

            band = range(Ss, Se + 1)
            for zc in blocks:
                av = [approx(zc[k], Al) for k in band]
                absv = [abs(a) for a in av]
                # index AFTER the last newly-significant coefficient
                eob = 0
                for j, t in enumerate(absv):
                    if t == 1:
                        eob = j + 1
                if eob == 0:  # nothing new: whole block rides the run
                    eobrun += 1
                    be.extend(t & 1 for t in absv if t > 1)
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                r = 0
                br: list = []  # corrections since the last symbol
                for j in range(eob):
                    t = absv[j]
                    if t == 0:
                        r += 1
                        continue
                    if t > 1:  # history-nonzero → correction bit
                        br.append(t & 1)
                        continue
                    # newly significant (t == 1)
                    while r > 15:
                        flush_eob()
                        ln, code = enc_ac[0xF0]
                        emit(code, ln)
                        for bit in br:
                            emit(bit, 1)
                        br = []
                        r -= 16
                    flush_eob()
                    ln, code = enc_ac[(r << 4) | 1]
                    emit(code, ln)
                    emit(1 if av[j] > 0 else 0, 1)
                    for bit in br:
                        emit(bit, 1)
                    br = []
                    r = 0
                if eob <= len(absv) - 1:  # tail → EOB run + corrections
                    eobrun += 1
                    be.extend(
                        absv[j] & 1
                        for j in range(eob, len(absv))
                        if absv[j] > 1
                    )
                    if eobrun == 0x7FFF:
                        flush_eob()
            flush_eob()

    def seg(marker, payload):
        return bytes((0xFF, marker)) + struct.pack(
            ">H", len(payload) + 2
        ) + payload

    parts = [
        b"\xff\xd8",
        seg(0xDB, b"\x00" + bytes([1] * 64)),
        seg(0xC2, b"\x08" + struct.pack(">HH", h, w)
            + b"\x01" + b"\x01\x11\x00"),
        seg(0xC4, b"\x00" + bytes(dc_counts) + bytes(dc_vals)
            + b"\x10" + bytes(ac_counts) + bytes(ac_vals)),
    ]
    body = bytearray()
    for (Ss, Se, Ah, Al) in scans:
        body += seg(
            0xDA,
            b"\x01" + b"\x01\x00"
            + bytes((Ss, Se, (Ah << 4) | Al)),
        )
        out.clear()
        st["acc"] = st["n"] = 0
        scan_bits(Ss, Se, Ah, Al)
        pad()
        body += bytes(out)
    return b"".join(parts) + bytes(body) + b"\xff\xd9"


def test_decode_jpeg_progressive_spectral_selection():
    """Spectral-selection-only progressive (DC scan + two AC band
    scans, Ah=Al=0) must decode identically to the same coefficients
    delivered sequentially."""
    import numpy as np

    w, h = 21, 14
    plane = np.array(
        [[30 + ((5 * x + 3 * y + (x * y) % 7) % 180) for x in range(w)]
         for y in range(h)], dtype=float,
    )
    seq = M.decode_image(_encode_jpeg_independent([plane], w, h, [(1, 1)]))
    prog = M.decode_image(
        _encode_jpeg_progressive(
            plane, w, h,
            [(0, 0, 0, 0), (1, 31, 0, 0), (32, 63, 0, 0)],
        )
    )
    assert prog[:3] == (w, h, 1) == seq[:3]
    assert bytes(prog[3]) == bytes(seq[3])


def test_decode_jpeg_progressive_successive_approximation():
    """Full progressive script: DC first at Al=1 + DC refinement, AC
    first at Al=1 in two bands + AC refinements (correction bits, EOB
    runs, newly-significant placement) — decodes identically to the
    sequential encoding of the same coefficients."""
    import numpy as np

    rng = np.random.RandomState(7)
    for (w, h) in ((16, 16), (13, 22)):
        plane = np.clip(
            120 + 60 * np.sin(np.arange(h)[:, None] / 3.0)
            + 50 * np.cos(np.arange(w)[None, :] / 2.0)
            + rng.randint(-20, 20, size=(h, w)),
            0, 255,
        ).astype(float)
        seq = M.decode_image(
            _encode_jpeg_independent([plane], w, h, [(1, 1)])
        )
        prog = M.decode_image(
            _encode_jpeg_progressive(
                plane, w, h,
                [
                    (0, 0, 0, 1),
                    (1, 5, 0, 1),
                    (6, 63, 0, 1),
                    (0, 0, 1, 0),
                    (1, 5, 1, 0),
                    (6, 63, 1, 0),
                ],
            )
        )
        assert prog[:3] == (w, h, 1) == seq[:3]
        assert bytes(prog[3]) == bytes(seq[3])


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
    import numpy as _np

    prog_prefix = _encode_jpeg_progressive(
        _np.full((4, 5), 90.0), 5, 4,
        [(0, 0, 0, 1), (1, 63, 0, 1), (0, 0, 1, 0), (1, 63, 1, 0)],
    )[:80]
    for prefix in (
        M.png_bytes(5, 4, pattern=True)[:30],
        M.bmp_bytes(5, 4, pattern=True)[:40],
        M.bmp_bytes(5, 4, pattern=True, variant=4)[:50],  # BITFIELDS
        M.gif_bytes(5, 4, pattern=True)[:25],
        M.jpeg_bytes(5, 4, pattern=True)[:60],
        M.jpeg_bytes(5, 4, pattern=True, cmyk=True)[:70],   # r13
        M.jpeg_bytes(5, 4, pattern=True, precision=12)[:60],  # r13
        prog_prefix,
    ):
        try:
            M.decode_image(prefix + data)
        except (ValueError, NotImplementedError):
            pass
    for wav_prefix in (
        M.wav_bytes(16, pattern=True)[:30],
        M.wav_bytes(16, pattern=True, variant=4)[:30],  # r13 µ-law
    ):
        try:
            M.decode_audio(wav_prefix + data)
        except (ValueError, NotImplementedError):
            pass  # wave.Error et al. are converted to ValueError


# ---------------------------------------------------------------------------
# round 11: palette (PLTE/tRNS), Adam7 interlace, sub-byte depths
# ---------------------------------------------------------------------------

def _png_chunk(t, p):
    import struct
    import zlib

    return (
        struct.pack(">I", len(p)) + t + p
        + struct.pack(">I", zlib.crc32(t + p) & 0xFFFFFFFF)
    )


def _raw_png(w, h, depth, ctype, raw, extra=b"", interlace=0):
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    return (
        b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr) + extra
        + _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b"")
    )


def test_decode_png_palette():
    """Type-3 PNG: indices map through PLTE; the grayscale palette
    makes RGB sum = 3 x pattern (same closed form as GIF/BMP)."""
    for w, h in [(1, 1), (7, 5), (33, 47)]:
        exp = sum(M._pattern_px(x, y) for x in range(w) for y in range(h))
        wp, hp, ch, px = M.decode_image(
            M.png_bytes(w, h, pattern=True, color_type=3)
        )
        assert (wp, hp, ch) == (w, h, 3) and sum(px) == 3 * exp
    # palette without PLTE chunk is corrupt, not unsupported
    import pytest

    bad = _raw_png(2, 1, 8, 3, b"\x00\x00\x01")
    with pytest.raises(ValueError):
        M.decode_image(bad)
    # out-of-range palette index is corrupt too
    bad = _raw_png(
        1, 1, 8, 3, b"\x00\x05", extra=_png_chunk(b"PLTE", bytes((1, 2, 3)))
    )
    with pytest.raises(ValueError):
        M.decode_image(bad)


def test_decode_png_palette_trns_alpha():
    """tRNS on a palette PNG yields RGBA; entries beyond the tRNS
    length default to opaque (RFC 2083 4.2.1)."""
    plte = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90])
    png = _raw_png(
        3, 1, 8, 3, b"\x00\x00\x01\x02",
        extra=_png_chunk(b"PLTE", plte) + _png_chunk(b"tRNS", bytes([0, 128])),
    )
    w, h, ch, px = M.decode_image(png)
    assert (w, h, ch) == (3, 1, 4)
    assert list(px) == [10, 20, 30, 0, 40, 50, 60, 128, 70, 80, 90, 255]


def test_decode_png_adam7_bit_identical():
    """Adam7 stores the same pixels pass-ordered: decode must be
    bit-identical to the sequential layout, for gray AND palette, at
    shapes exercising empty passes (w or h below pass origins)."""
    for w, h in [(1, 1), (2, 2), (3, 2), (5, 1), (1, 9), (8, 8), (9, 10),
                 (33, 47)]:
        seq = M.decode_image(M.png_bytes(w, h, pattern=True))
        lace = M.decode_image(M.png_bytes(w, h, pattern=True, interlace=1))
        assert seq == lace
        seq = M.decode_image(M.png_bytes(w, h, pattern=True, color_type=3))
        lace = M.decode_image(
            M.png_bytes(w, h, pattern=True, color_type=3, interlace=1)
        )
        assert seq == lace


def test_decode_png_subbyte_depths():
    """Depths 1/2/4 (gray: scaled to 8-bit; palette: direct indices),
    including strides that end mid-byte."""
    # 4-bit gray 3x2: samples 0..5 packed two-per-byte MSB-first
    png = _raw_png(3, 2, 4, 0, b"\x00\x01\x20\x00\x34\x50")
    w, h, ch, px = M.decode_image(png)
    assert (w, h, ch) == (3, 2, 1)
    assert list(px) == [v * 255 // 15 for v in range(6)]
    # 1-bit gray 9x1: bits cross the byte boundary
    png = _raw_png(9, 1, 1, 0, bytes([0, 0b10101010, 0b10000000]))
    assert list(M.decode_image(png)[3]) == [255, 0] * 4 + [255]
    # 2-bit palette 4x1: indices 0..3 in one byte
    plte = bytes(v for i in range(4) for v in (i * 3, i * 3 + 1, i * 3 + 2))
    png = _raw_png(
        4, 1, 2, 3, bytes([0, 0b00011011]), extra=_png_chunk(b"PLTE", plte)
    )
    w, h, ch, px = M.decode_image(png)
    assert (w, h, ch) == (4, 1, 3)
    assert list(px) == list(plte)


def test_decode_png_16bit_high_byte():
    """16-bit samples reduce to their big-endian high byte — exact on
    widened 8-bit values (v·257), covering gray, RGB, and the filtered
    2-bytes-per-sample stride."""
    import struct

    # gray 3x1: samples 0x0000, 0x1234, 0xFFFF → 0x00, 0x12, 0xFF
    raw = b"\x00" + struct.pack(">HHH", 0x0000, 0x1234, 0xFFFF)
    w, h, ch, px = M.decode_image(_raw_png(3, 1, 16, 0, raw))
    assert (w, h, ch) == (3, 1, 1) and list(px) == [0x00, 0x12, 0xFF]
    # RGB 2x2 with a SUB-filtered second row (bpp = 6 at 16-bit RGB)
    row0 = [v * 257 for v in (10, 20, 30, 40, 50, 60)]
    row1 = [v * 257 for v in (15, 25, 35, 45, 55, 65)]
    enc1 = struct.pack(">6H", *row1)
    sub = bytearray(enc1)
    for x in range(6, 12):  # subtract the left pixel's bytes
        sub[x] = (sub[x] - enc1[x - 6]) & 0xFF
    raw = b"\x00" + struct.pack(">6H", *row0) + b"\x01" + bytes(sub)
    w, h, ch, px = M.decode_image(_raw_png(2, 2, 16, 2, raw))
    assert (w, h, ch) == (2, 2, 3)
    assert list(px) == [10, 20, 30, 40, 50, 60, 15, 25, 35, 45, 55, 65]
    # spec-invalid combos are corrupt, not unsupported
    import pytest

    with pytest.raises(ValueError):
        M.decode_image(_raw_png(2, 1, 3, 0, bytes(3)))  # depth 3
    with pytest.raises(ValueError):  # 16-bit palette
        M.decode_image(
            _raw_png(1, 1, 16, 3, bytes(3),
                     extra=_png_chunk(b"PLTE", bytes((1, 2, 3))))
        )


def test_synthesize_png_variants_cycle(spark):
    """doc_id % 5 == 0 rows cycle gray/palette/Adam7 by (doc_id//5)%4 —
    all four storage layouts land in q53's hash-checked pix rows."""
    import pyspark.sql.functions as F

    ids = spark.range(0, 40, 5).select(F.col("id").alias("doc_id"))
    rows = M.extract_media_content(
        M.synthesize_test_media(ids, pattern=True)
    ).collect()
    by_id = {r["doc_id"]: r for r in rows}
    for i in range(0, 40, 5):
        w, h = 1 + i % 64, 1 + (i * 7) % 64
        exp = sum(M._pattern_px(x, y) for x in range(w) for y in range(h))
        mult = 3 if ((i // 5) % 4) in (1, 3) else 1
        r = by_id[i]
        assert r["mime"] == "image/png"
        assert (r["width"], r["height"]) == (w, h)
        assert r["vsum"] == mult * exp, (i, r["vsum"], mult * exp)


def test_decode_bmp_palettized():
    """1/4/8-bit palettized BMPs (r11): MSB-first index unpack through
    the BGRA color table, bottom-up rows, 4-byte row padding."""
    import struct

    def bmp(w, h, bpp, palette, rows_of_indices, clr_used=0):
        n = clr_used or (1 << bpp)
        pal = b"".join(
            bytes((c[0], c[1], c[2], 0)) for c in palette
        ) + bytes(4 * (n - len(palette)))
        row_bytes = (w * bpp + 31) // 32 * 4
        body = bytearray()
        for r in reversed(rows_of_indices):  # bottom-up storage
            packed = bytearray(row_bytes)
            for x, v in enumerate(r):
                shift = 8 - bpp * (x % (8 // bpp) + 1)
                packed[x // (8 // bpp)] |= v << shift
            body += packed
        off = 54 + 4 * n
        header = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
        dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0,
                          len(body), 2835, 2835, clr_used, 0)
        return header + dib + pal + bytes(body)

    # 8-bit 3x2, four colors (stored BGR like the 24-bit path)
    palette = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (1, 2, 3)]
    img = bmp(3, 2, 8, palette, [[0, 1, 2], [3, 0, 1]])
    w, h, ch, px = M.decode_image(img)
    assert (w, h, ch) == (3, 2, 3)
    assert list(px) == [10, 20, 30, 40, 50, 60, 70, 80, 90,
                        1, 2, 3, 10, 20, 30, 40, 50, 60]
    # 4-bit 5x1 (stride ends mid-byte)
    img = bmp(5, 1, 4, palette, [[3, 2, 1, 0, 2]])
    w, h, ch, px = M.decode_image(img)
    assert (w, h, ch) == (5, 1, 3)
    assert list(px) == [1, 2, 3, 70, 80, 90, 40, 50, 60,
                        10, 20, 30, 70, 80, 90]
    # 1-bit 9x1 (crosses a byte), two colors, biClrUsed=2
    img = bmp(9, 1, 1, palette[:2], [[1, 0, 1, 0, 1, 0, 1, 0, 1]],
              clr_used=2)
    w, h, ch, px = M.decode_image(img)
    assert (w, h, ch) == (9, 1, 3)
    assert list(px[:6]) == [40, 50, 60, 10, 20, 30]
    # out-of-table index is corrupt, not unsupported
    import pytest

    img = bmp(1, 1, 8, palette[:2], [[5]], clr_used=2)
    with pytest.raises(ValueError):
        M.decode_image(img)
    # BITFIELDS on a palettized bpp is corrupt (r13 decodes BITFIELDS
    # for 16/32-bit only — see test_decode_bmp_bitfields); BI_JPEG is
    # a passthrough as of r13 (wrong magic here → corrupt); unknown
    # compression ids stay NotImplementedError
    img = bytearray(bmp(3, 2, 8, palette, [[0, 1, 2], [3, 0, 1]]))
    img[30] = 3  # BI_BITFIELDS
    with pytest.raises(ValueError, match="BITFIELDS"):
        M.decode_image(bytes(img))
    img[30] = 4  # BI_JPEG with non-JPEG payload
    with pytest.raises(ValueError, match="magic"):
        M.decode_image(bytes(img))
    img[30] = 6  # beyond any defined BI_* id
    with pytest.raises(NotImplementedError, match="compression"):
        M.decode_image(bytes(img))


def test_decode_bmp_rle():
    """RLE8/RLE4 run decode (r12): encoded runs, absolute literal runs
    (word-aligned), end-of-line, delta cursor jumps (skipped pixels =
    palette entry 0), end-of-bitmap; generator round-trip for every
    variant; corrupt streams raise ValueError, never hang."""
    import struct

    import pytest

    # generator round-trip: RLE8 (variant 2) and RLE4 (variant 3)
    # reproduce the exact pattern sums of the uncompressed layouts
    for variant in (2, 3):
        for w, h in [(1, 1), (7, 5), (64, 33), (255, 2)]:
            img = M.bmp_bytes(w, h, pattern=True, variant=variant)
            W, H, ch, px = M.decode_image(img)
            assert (W, H, ch) == (w, h, 3)
            fold = (lambda v: v % 16) if variant == 3 else (lambda v: v)
            assert sum(px) == 3 * sum(
                fold(M._pattern_px(x, y))
                for y in range(h) for x in range(w)
            )

    # hand-built RLE8 with delta + absolute + alternating-nibble RLE4
    pal = bytes(v for i in range(256) for v in (i, i, i, 0))
    off = 14 + 40 + len(pal)

    def rle_bmp(w, h, bpp, compression, body):
        hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
        dib = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, bpp, compression,
            len(body), 2835, 2835, 256, 0,
        )
        return hdr + dib + pal + bytes(body)

    # 4x2 RLE8: bottom row = [5,5,<skip>,<skip>] via delta, top = 4x7;
    # absolute run [9,8,6] exercises the word-aligned literal path
    body = bytes([2, 5, 0, 2, 2, 0, 0, 0, 1, 7, 0, 3, 9, 8, 6, 0, 0, 1])
    W, H, ch, px = M.decode_image(rle_bmp(4, 2, 8, 1, body))
    assert [px[i] for i in range(0, 24, 3)] == [7, 9, 8, 6, 5, 5, 0, 0]
    # RLE4 encoded run alternates hi/lo nibbles: 5 pixels of 0xA3
    body4 = bytes([5, 0xA3, 0, 1])
    W, H, ch, px = M.decode_image(rle_bmp(5, 1, 4, 2, body4))
    assert [px[i] for i in range(0, 15, 3)] == [10, 3, 10, 3, 10]

    # corrupt: truncated stream, run past row end, delta off-bitmap,
    # index past the table, RLE with a top-down height — all ValueError
    for w, h, bpp, comp, bad in [
        (4, 2, 8, 1, bytes([2, 5])),
        (4, 2, 8, 1, bytes([200, 1])),
        (4, 2, 8, 1, bytes([0, 2, 200, 200, 0, 1])),
        (4, 2, 4, 2, bytes([0, 0])),
    ]:
        with pytest.raises(ValueError):
            M.decode_image(rle_bmp(w, h, bpp, comp, bad))
    with pytest.raises(ValueError):  # RLE8 must be bpp 8
        M.decode_image(rle_bmp(4, 2, 4, 1, bytes([0, 1])))
    neg = bytearray(rle_bmp(4, 2, 8, 1, bytes([0, 1])))
    neg[22:26] = struct.pack("<i", -2)  # top-down + RLE is invalid
    with pytest.raises(ValueError):
        M.decode_image(bytes(neg))


def test_decode_wav_variants():
    """r12: 8-bit (unsigned→centered), float32 (float↔PCM16
    convention), and stereo PCM16 decode — plus 24-bit via a
    hand-built file; bad float bit depth raises ValueError."""
    import pytest
    import struct as _s

    vals = [(i % 201) - 100 for i in range(40)]
    for variant in range(4):
        rate, samples = M.decode_audio(
            M.wav_bytes(40, pattern=True, variant=variant)
        )
        assert rate == 8000
        if variant == 3:  # stereo: L=R=frame value, interleaved
            assert samples == [v for v in vals for _ in (0, 1)]
        else:
            assert samples == vals
    # 24-bit PCM (wave module path)
    data = b"".join(
        (v & 0xFFFFFF).to_bytes(3, "little") for v in vals
    )
    fmt = _s.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    wav24 = (b"RIFF" + _s.pack("<I", 36 + len(data)) + b"WAVE"
             + b"fmt " + _s.pack("<I", 16) + fmt
             + b"data" + _s.pack("<I", len(data)) + data)
    rate, samples = M.decode_audio(wav24)
    assert samples == vals
    # float WAV with unsupported 64-bit depth → ValueError
    f64 = _s.pack("<40d", *(v / 32768.0 for v in vals))
    fmt = _s.pack("<HHIIHH", 3, 1, 8000, 8000 * 8, 8, 64)
    wavf64 = (b"RIFF" + _s.pack("<I", 36 + len(f64)) + b"WAVE"
              + b"fmt " + _s.pack("<I", 16) + fmt
              + b"data" + _s.pack("<I", len(f64)) + f64)
    with pytest.raises(ValueError, match="32 only"):
        M.decode_audio(wavf64)


def test_decode_bmp_16_and_32_bit():
    """r12: 32-bit BGRX (4th byte dropped) and 16-bit RGB555 (5→8-bit
    scaling (v<<3)|(v>>2)) decode, bottom-up and top-down."""
    import struct

    def bmp(w, h, bpp, body):
        hdr = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        dib = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(body),
            2835, 2835, 0, 0,
        )
        return hdr + dib + bytes(body)

    # 2x2 32-bit, bottom-up: rows stored bottom first, BGRX
    body = bytes(
        [1, 2, 3, 255, 4, 5, 6, 0]      # bottom row: px(0,1), px(1,1)
        + [7, 8, 9, 128, 10, 11, 12, 7]  # top row: px(0,0), px(1,0)
    )
    w, h, ch, px = M.decode_image(bmp(2, 2, 32, body))
    assert (w, h, ch) == (2, 2, 3)
    assert list(px) == [7, 8, 9, 10, 11, 12, 1, 2, 3, 4, 5, 6]

    # 3x1 16-bit RGB555: white, pure red, mid gray (16 → (16<<3)|(16>>2)=132)
    vals = [(0x7FFF), (0x1F << 10), (16 << 10) | (16 << 5) | 16]
    body = struct.pack("<3H", *vals) + b"\x00\x00"  # row pad to 8 bytes
    w, h, ch, px = M.decode_image(bmp(3, 1, 16, body))
    assert (w, h, ch) == (3, 1, 3)
    assert list(px[0:3]) == [255, 255, 255]
    assert list(px[3:6]) == [0, 0, 255]      # BGR: red last
    assert list(px[6:9]) == [132, 132, 132]

    # truncated 32-bit body is corrupt, not a crash
    import pytest

    with pytest.raises(ValueError):
        M.decode_image(bmp(4, 4, 32, bytes(8)))


def test_decode_bmp_bitfields():
    """r13: BI_BITFIELDS decode — canonical 565 (generator variant 4
    round-trip), arbitrary contiguous masks on 16- and 32-bit pixels
    (bit-replication expansion), zero masks → zero channel, and
    non-contiguous masks rejected."""
    import struct

    import pytest

    # generator round-trip: 565 quantization folded per the closed form
    def rep5(u):
        return (u << 3) | (u >> 2)

    def rep6(u):
        return (u << 2) | (u >> 4)

    for w, h in [(1, 1), (7, 5), (64, 33)]:
        img = M.bmp_bytes(w, h, pattern=True, variant=4)
        W, H, ch, px = M.decode_image(img)
        assert (W, H, ch) == (w, h, 3)
        assert sum(px) == sum(
            2 * rep5(M._pattern_px(x, y) >> 3)
            + rep6(M._pattern_px(x, y) >> 2)
            for y in range(h) for x in range(w)
        )
    # sniff still parses dims from a BITFIELDS container
    assert M.sniff_media(M.bmp_bytes(9, 4, variant=4))[:3] == (
        "image/bmp", 9, 4,
    )

    def bf_bmp(w, h, bpp, masks, body):
        off = 14 + 40 + 12
        hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
        dib = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, bpp, 3, len(body),
            2835, 2835, 0, 0,
        )
        return hdr + dib + struct.pack("<III", *masks) + bytes(body)

    # 32-bit with 8888 masks in a NON-BGRX order (RGBA layout:
    # R=0x000000FF G=0x0000FF00 B=0x00FF0000) — mask-driven, not
    # position-driven
    body = struct.pack("<I", (10) | (20 << 8) | (30 << 16))
    w, h, ch, px = M.decode_image(
        bf_bmp(1, 1, 32, (0x000000FF, 0x0000FF00, 0x00FF0000), body)
    )
    assert list(px) == [30, 20, 10]  # container BGR order

    # 16-bit 4/4/4 masks: 4-bit channels replicate (v<<4)|v
    body = struct.pack("<H", (0xF << 8) | (0x8 << 4) | 0x1) + b"\x00\x00"
    _, _, _, px = M.decode_image(
        bf_bmp(1, 1, 16, (0x0F00, 0x00F0, 0x000F), body)
    )
    assert list(px) == [0x11, 0x88, 0xFF]

    # zero mask → that channel is 0 everywhere
    body = struct.pack("<H", 0xFFFF) + b"\x00\x00"
    _, _, _, px = M.decode_image(
        bf_bmp(1, 1, 16, (0xF800, 0x07E0, 0), body)
    )
    assert list(px) == [0, 255, 255]

    # non-contiguous mask rejected
    with pytest.raises(ValueError):
        M.decode_image(
            bf_bmp(1, 1, 16, (0xA800, 0x07E0, 0x001F), bytes(4))
        )
    # BITFIELDS on a palettized bpp rejected
    with pytest.raises(ValueError):
        M.decode_image(bf_bmp(1, 1, 8, (0xF800, 0x07E0, 0x001F), bytes(4)))
    # truncated pixel data
    with pytest.raises(ValueError):
        M.decode_image(
            bf_bmp(4, 4, 16, (0xF800, 0x07E0, 0x001F), bytes(4))
        )


def test_decode_jpeg_cmyk():
    """r13: 4-component Adobe JPEG — APP14 transform 0 un-inks
    inverted CMYK to RGB (fixture: pattern on C/M/Y, flat 255 K →
    RGB = pattern ×3 channels, bit-exact); transform 2 (YCCK) routes
    the inverted CMY through the YCbCr transform; a 4-component file
    WITHOUT an Adobe marker refuses cleanly (r14 — spec-plain CMYK is
    not inverted, so decoding it with the Adobe convention would pass
    wrong colors silently)."""
    w, h = 29, 18
    exp = sum(
        M._pattern_px(x // 8, y // 8)
        for x in range(w) for y in range(h)
    )
    W, H, ch, px = M.decode_image(M.jpeg_bytes(w, h, pattern=True,
                                               cmyk=True))
    assert (W, H, ch) == (w, h, 3) and sum(px) == 3 * exp
    assert sum(M.decode_image(M.jpeg_bytes(5, 5, cmyk=True))[3]) == 0
    # sniff parses dims from the 4-component SOF
    assert M.sniff_media(M.jpeg_bytes(9, 4, cmyk=True))[:3] == (
        "image/jpeg", 9, 4,
    )
    raw = M.jpeg_bytes(8, 8, pattern=True, cmyk=True)
    # YCCK: flip the APP14 transform byte; gray CMY planes (Cb=Cr at
    # v... not flat) just needs to decode without error and differ
    b = bytearray(raw)
    b[b.find(b"Adobe") + 11] = 2
    W, H, ch, _ = M.decode_image(bytes(b))
    assert (W, H, ch) == (8, 8, 3)
    # no Adobe marker at all → clean refusal, never silent wrong colors
    app14_at = raw.find(b"\xff\xee")
    seglen = int.from_bytes(raw[app14_at + 2:app14_at + 4], "big")
    stripped = raw[:app14_at] + raw[app14_at + 2 + seglen:]
    with pytest.raises(NotImplementedError, match="APP14"):
        M.decode_image(stripped)


def test_decode_bmp_embedded_jpeg_png():
    """r13: BI_JPEG/BI_PNG passthrough — the BMP payload is a complete
    JPEG/PNG stream handed to the real decoder; wrong-magic payloads
    are corrupt, not unsupported. Closes the last BMP guard."""
    import struct

    import pytest

    def wrap(inner: bytes, compression: int, w: int, h: int) -> bytes:
        hdr = b"BM" + struct.pack("<IHHI", 54 + len(inner), 0, 0, 54)
        dib = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 0, compression, len(inner),
            2835, 2835, 0, 0,
        )
        return hdr + dib + inner

    w, h = 17, 9
    exp = sum(
        M._pattern_px(x // 8, y // 8) for x in range(w) for y in range(h)
    )
    jb = M.jpeg_bytes(w, h, pattern=True)
    W, H, ch, px = M.decode_image(wrap(jb, 4, w, h))
    assert (W, H, ch) == (w, h, 1) and sum(px) == exp
    pexp = sum(M._pattern_px(x, y) for x in range(w) for y in range(h))
    pb = M.png_bytes(w, h, pattern=True)
    W, H, ch, px = M.decode_image(wrap(pb, 5, w, h))
    assert (W, H, ch) == (w, h, 1) and sum(px) == pexp
    # wrong magic → ValueError (corrupt), never a raw codec error
    with pytest.raises(ValueError, match="magic"):
        M.decode_image(wrap(b"garbage", 4, w, h))
    with pytest.raises(ValueError, match="magic"):
        M.decode_image(wrap(jb, 5, w, h))  # JPEG under BI_PNG tag
    # unknown compression id still NotImplementedError
    with pytest.raises(NotImplementedError, match="compression"):
        M.decode_image(wrap(jb, 6, w, h))


def test_decode_jpeg_12bit():
    """r13: 12-bit extended-sequential JPEG — samples at whole 8-bit
    levels scale back bit-exactly (>>4); DC categories up to 15 are
    accepted at 12-bit precision; other precisions stay
    NotImplementedError."""
    import pytest

    w, h = 29, 18
    exp = sum(
        M._pattern_px(x // 8, y // 8)
        for x in range(w) for y in range(h)
    )
    b12 = M.jpeg_bytes(w, h, pattern=True, precision=12)
    W, H, ch, px = M.decode_image(b12)
    assert (W, H, ch) == (w, h, 1) and sum(px) == exp
    assert sum(M.decode_image(M.jpeg_bytes(5, 5, precision=12))[3]) == 0
    assert M.sniff_media(b12)[:3] == ("image/jpeg", w, h)
    bad = bytearray(b12)
    bad[bad.find(b"\xff\xc1") + 4] = 10
    with pytest.raises(NotImplementedError, match="precision"):
        M.decode_image(bytes(bad))
    with pytest.raises(ValueError):
        M.jpeg_bytes(4, 4, precision=10)


def test_decode_wav_g711():
    """r13: µ-law/A-law RIFF/WAVE decode via the ITU expansion —
    round-trips a reference software ENCODER (independent of the
    decode tables), hits the format extremes, and keeps the one-
    clean-error contract."""
    import struct

    import pytest

    def wav(tag, data, rate=8000, bits=8):
        fmt = struct.pack("<HHIIHH", tag, 1, rate, rate, 1, bits)
        return (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )

    # independent reference encoders (ITU G.711 segment search)
    def ulaw_encode(v):
        BIAS = 0x84
        sign = 0x80 if v < 0 else 0
        v = min(abs(v), 32635) + BIAS
        e = 7
        for i in range(7, -1, -1):
            if v & (0x4000 >> (7 - i)):
                e = i
                break
        m = (v >> (e + 3)) & 0x0F
        return ~(sign | (e << 4) | m) & 0xFF

    def alaw_encode(v):
        sign = 0x80 if v >= 0 else 0
        v = min(abs(v), 32767)
        if v < 256:
            code = v >> 4
        else:
            e = 7
            while not v & (0x4000 >> (7 - e)):
                e -= 1
            code = (e << 4) | ((v >> (e + 3)) & 0x0F)
        return (sign | code) ^ 0x55

    vals = [0, 1, 8, 100, -100, 1000, -1000, 32124, -32124, 5000]
    codes = bytes(ulaw_encode(v) for v in vals)
    rate, got = M.decode_audio(wav(7, codes))
    assert rate == 8000
    # companded: decode(encode(v)) lands within the segment's step
    for v, g in zip(vals, got):
        assert abs(g - v) <= max(8, abs(v) // 16), (v, g)
    # exact level check: the µ-law code for silence decodes to 0
    assert M.decode_audio(wav(7, bytes([ulaw_encode(0)])))[1] == [0]
    # A-law round-trip
    codes = bytes(alaw_encode(v) for v in vals)
    _, got = M.decode_audio(wav(6, codes))
    for v, g in zip(vals, got):
        assert abs(g - v) <= max(16, abs(v) // 16), (v, g)
    # max-magnitude codes decode to the ITU table extremes
    assert max(M._ulaw_decode(c) for c in range(256)) == 32124
    assert max(M._alaw_decode(c) for c in range(256)) == 32256
    # wrong bit width for a companded tag → clean error
    with pytest.raises(ValueError, match="G.711"):
        M.decode_audio(wav(7, b"\x00\x00", bits=16))
    # unknown tag still one clean error type
    with pytest.raises(ValueError):
        M.decode_audio(wav(42, b"\x00\x00"))


def test_decode_jpeg_lossless():
    """r13: lossless (SOF3) JPEG — huffman SSSS + EXTEND differences
    against predictors 1-7, first-sample/row-0/column-0 rules,
    restart-interval prediction resets, 12-bit samples scaled back —
    every variant reproduces the FULL-resolution pattern bit-exactly
    (the format is lossless by nature). Multi-component lossless and
    bad predictors stay clean errors."""
    import pytest

    w, h = 23, 17
    exp = [M._pattern_px(x, y) for y in range(h) for x in range(w)]
    for pred in range(1, 8):
        b = M.jpeg_bytes_lossless(w, h, pattern=True, predictor=pred)
        W, H, ch, px = M.decode_image(b)
        assert (W, H, ch) == (w, h, 1) and list(px) == exp, pred
    # 12-bit samples scale back bit-exactly
    b12 = M.jpeg_bytes_lossless(w, h, pattern=True, precision=12)
    assert list(M.decode_image(b12)[3]) == exp
    # 16-bit samples (r14): the very first diff is 0 − 2^15 ≡ category
    # 16, which carries NO extra magnitude bits (T.81), and inter-
    # sample diffs of pattern<<8 wrap mod 2^16 — both round-trip
    # bit-exactly now (previously any precision-16 stream desynced)
    b16 = M.jpeg_bytes_lossless(w, h, pattern=True, precision=16)
    assert list(M.decode_image(b16)[3]) == exp
    assert sum(M.decode_image(
        M.jpeg_bytes_lossless(5, 5, precision=16))[3]) == 0
    for pred16 in (2, 4, 7):
        bp = M.jpeg_bytes_lossless(
            w, h, pattern=True, precision=16, predictor=pred16)
        assert list(M.decode_image(bp)[3]) == exp, pred16
    # restart intervals reset prediction mid-scan
    bd = M.jpeg_bytes_lossless(w, h, pattern=True, predictor=4, dri=37)
    assert list(M.decode_image(bd)[3]) == exp
    assert sum(M.decode_image(M.jpeg_bytes_lossless(5, 5))[3]) == 0
    assert M.sniff_media(b12)[:3] == ("image/jpeg", w, h)
    # multi-component lossless: clean NotImplementedError
    raw = bytearray(M.jpeg_bytes_lossless(4, 4, pattern=True))
    sof_at = raw.find(b"\xff\xc3")
    # grow the SOF payload to 3 components (rewrite length + ncomp)
    three = (
        bytes(raw[:sof_at + 2])
        + int.to_bytes(8 + 3 * 3 + 3, 2, "big")  # wrong but parsed len
    )
    import struct as _s
    payload = raw[sof_at + 4:sof_at + 4 + 6]  # precision + dims + nc
    sof3 = (
        b"\xff\xc3" + _s.pack(">H", 2 + 6 + 9)
        + payload[:5] + b"\x03"
        + b"\x01\x11\x00\x02\x11\x00\x03\x11\x00"
    )
    doctored = raw[:sof_at] + sof3 + raw[sof_at + 4 + 9:]
    with pytest.raises(NotImplementedError, match="lossless"):
        M.decode_image(bytes(doctored))
    # bad predictor id in the SOS: clean ValueError
    bad = bytearray(M.jpeg_bytes_lossless(4, 4, pattern=True))
    sos_at = bad.find(b"\xff\xda")
    bad[sos_at + 7] = 0  # Ss = predictor 0
    with pytest.raises(ValueError, match="predictor"):
        M.decode_image(bytes(bad))


def test_fused_synthesize_parse_parity(spark):
    """r15: the fused synthesize+parse operators (one Python eval node,
    media bytes never cross the Arrow boundary) are row-identical to
    the two-operator composition they replace."""
    import pyspark.sql.functions as F

    ids = spark.range(0, 60).select(F.col("id").alias("doc_id"))
    meta_old = (
        M.attach_media_meta(M.synthesize_test_media(ids))
        .select("doc_id", "media_meta.*").collect()
    )
    meta_new = (
        M.synthesize_media_meta(ids)
        .select("doc_id", "media_meta.*").collect()
    )
    assert sorted(meta_old) == sorted(meta_new)
    pix_old = M.extract_media_content(
        M.synthesize_test_media(ids, pattern=True)
    ).collect()
    pix_new = M.synthesize_media_content(ids, pattern=True).collect()
    assert sorted(pix_old, key=lambda r: r["doc_id"]) == sorted(
        pix_new, key=lambda r: r["doc_id"]
    )
    # one Python eval node per fused plan (the point of the fusion)
    plan = (
        M.synthesize_media_content(ids, pattern=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("ArrowEvalPython") + plan.count("MapInPandas") == 1
