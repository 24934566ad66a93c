"""Pure-Python media header sniff (l8f decode path)."""

from __future__ import annotations

from lens_warehouse_spark.llm.multimodal import (
    _synth_media_blob,
    decode_image,
    sniff_media,
)


def test_sniff_each_synthetic_format():
    for doc_id, fmt in [(100, "png"), (101, "gif"), (102, "bmp"), (103, "jpeg")]:
        got_fmt, w, h = sniff_media(_synth_media_blob(doc_id, "x"))
        assert got_fmt == fmt
        assert w == doc_id % 640 + 1
        assert h == doc_id % 480 + 1


def test_sniff_audio_doc_and_unknown():
    assert sniff_media(b"RIFF\x00\x00\x00\x00WAVEfmt ")[0] == "wav"
    assert sniff_media(b"OggS\x00\x02")[0] == "ogg"
    assert sniff_media(b"%PDF-1.7\n")[0] == "pdf"
    assert sniff_media(b"just some text")[0] == "unknown"
    assert sniff_media(b"") == ("unknown", None, None)


def test_sniff_truncated_headers_do_not_raise():
    # Magic present but header cut short: degrade, never throw.
    assert sniff_media(b"\x89PNG\r\n\x1a\n\x00")[0] == "unknown"
    assert sniff_media(b"GIF89a")[0] == "unknown"
    assert sniff_media(b"\xff\xd8\xff") == ("jpeg", None, None)


def test_decode_image_fallback_matches_sniff():
    blob = _synth_media_blob(7, "x")
    assert decode_image(blob) == sniff_media(blob) or decode_image(blob)[0] == "gif"


def test_decode_image_never_raises_on_garbage():
    """decode_image must fall back to sniff on ANY decode failure, not
    just missing PIL: the pipeline feeds text rows and truncated
    header-only blobs through it inside a mapInPandas task."""
    for blob in (b"just some text", b"\x89PNG\r\n\x1a\n" + b"\x00" * 4, b""):
        fmt, _, _ = decode_image(blob)
        assert isinstance(fmt, str)


def test_sniff_jpeg_fill_bytes_before_marker():
    """Spec-legal 0xFF fill bytes before a marker must not desync the
    segment walk (a fill byte consumed as a length jumped past SOF)."""
    import struct

    blob = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        + b"\xff"  # fill byte before the SOF marker
        + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", 480, 640) + b"\x03" + b"\x00" * 9
    )
    assert sniff_media(blob) == ("jpeg", 640, 480)


def test_sniff_jpeg_stops_at_sos():
    """Entropy-coded data after SOS must not be parsed as segments — a
    fake 0xFF 0xC0 byte pair inside scan data is not an SOF."""
    import struct

    blob = (
        b"\xff\xd8"
        + b"\xff\xda" + struct.pack(">H", 4) + b"\x01\x00"  # SOS
        + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"      # fake SOF bytes
        + struct.pack(">HH", 9, 9) + b"\x03" + b"\x00" * 9
    )
    assert sniff_media(blob) == ("jpeg", None, None)


def test_sniff_bmp_core_header_and_prose():
    """OS/2 BITMAPCOREHEADER stores 16-bit dims; 'BM'-prefixed prose is
    not a bitmap (the DIB size field is validated)."""
    import struct

    core = (
        b"BM" + b"\x00" * 12 + struct.pack("<I", 12) + struct.pack("<HH", 100, 200)
    )
    assert sniff_media(core) == ("bmp", 100, 200)
    assert sniff_media(b"BMW cars are documented here at length")[0] == "unknown"


def test_l8_byte_len_counts_utf8_bytes(spark, tmp_path_factory):
    """byte_len must be utf-8 BYTES (len of the blob), and the frame
    hash must cover the first 32 CHARACTERS — both diverge from char
    counts only on non-ASCII text, which the testdata never contains."""
    import os

    from lens_warehouse_spark import registry

    registry.load_all()
    d = tmp_path_factory.mktemp("unicode_sf")
    rows = [(1, "café au lait", "fr", "web", 12), (2, "plain ascii", "en", "web", 11)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(d), "documents.parquet")
    )
    out = {
        r.doc_id: r.byte_len
        for r in registry.QUERIES["l8_multimodal_features"](spark, str(d)).collect()
    }
    assert out == {1: 13, 2: 11}  # 'é' is 2 utf-8 bytes

    import duckdb

    oracle = dict(
        duckdb.sql(
            f"SELECT doc_id, CAST(strlen(text) AS BIGINT) FROM "
            f"'{d}/documents.parquet/*.parquet'"
        ).fetchall()
    )
    assert oracle == out


def test_l8e_asset_bytes_utf8_boundary(spark, tmp_path_factory):
    """l8e's asset_bytes must be utf-8 BYTES matching the oracle's
    strlen: a 512-char doc with one 2-byte char is 513 bytes and must
    survive the >512 filter, while the all-ASCII 512-char twin must
    not — char-count semantics would drop both."""
    import os

    import duckdb

    from lens_warehouse_spark import registry

    registry.load_all()
    d = tmp_path_factory.mktemp("l8e_unicode_sf")
    rows = [
        (1, "a" * 512, "en", "web", 512),        # 512 bytes -> filtered
        (2, "é" + "a" * 511, "fr", "web", 512),  # 513 bytes -> kept
        (3, "b" * 600, "en", "web", 600),        # 600 bytes -> kept
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(d), "documents.parquet")
    )
    out = {
        r.doc_id: r.asset_bytes
        for r in registry.QUERIES["l8e_blob_manifest_join"](spark, str(d)).collect()
    }
    assert out == {2: 513, 3: 600}

    oracle_sql = registry.ORACLES["l8e_blob_manifest_join"]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{d}/documents.parquet/*.parquet'"
    )
    oracle = {
        doc_id: bytes_
        for doc_id, _node, bytes_, _n in con.execute(oracle_sql).fetchall()
    }
    assert oracle == out


# ---------------------------------------------------------------------------
# Round-7 real pixel codec (decode_pixels / resize_pixels): the honest
# upgrade of the resize stub — P6 PPM and 24-bit BI_RGB BMP are
# uncompressed byte layouts numpy alone can decode; everything else
# still raises NotImplementedError.
# ---------------------------------------------------------------------------
def _bmp_bytes(px, top_down=False):
    """Reference 24-bit BI_RGB encoder (BGR, 4-byte row padding,
    bottom-up unless top_down) — built here so the decoder is tested
    against an independent construction, not its own inverse."""
    import struct

    import numpy as np

    h, w = px.shape[0], px.shape[1]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[..., ::-1].reshape(h, w * 3)  # RGB -> BGR
    body = rows.tobytes() if top_down else rows[::-1].tobytes()
    off = 54
    header = (
        b"BM"
        + struct.pack("<IHHI", off + len(body), 0, 0, off)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0,
            len(body), 2835, 2835, 0, 0,
        )
    )
    return header + body


def _pattern(h, w):
    import numpy as np

    y, x, c = np.indices((h, w, 3))
    return ((y * 31 + x * 7 + c * 3) % 256).astype(np.uint8)


def test_decode_pixels_bmp_bottomup_and_topdown():
    from lens_warehouse_spark.llm.multimodal import decode_pixels

    import numpy as np

    px = _pattern(5, 3)  # w=3 -> stride 12 != w*3=9, exercises padding
    for td in (False, True):
        out = decode_pixels(_bmp_bytes(px, top_down=td))
        assert out.shape == (5, 3, 3)
        assert np.array_equal(out, px), f"top_down={td}"


def test_ppm_roundtrip_and_resize_rule():
    from lens_warehouse_spark.llm.multimodal import (
        decode_pixels,
        encode_ppm,
        resize_pixels,
    )

    import numpy as np

    px = _pattern(7, 11)
    assert np.array_equal(decode_pixels(encode_ppm(px)), px)
    small = resize_pixels(px, 4, 3)
    assert small.shape == (3, 4, 3)
    # nearest rule: src = floor(dst * src_dim / dst_dim), checked
    # against an explicit loop
    for j in range(3):
        for i in range(4):
            assert (small[j, i] == px[(j * 7) // 3, (i * 11) // 4]).all()


def test_real_resize_image_end_to_end():
    from lens_warehouse_spark.llm.multimodal import (
        decode_pixels,
        real_resize_image,
    )

    import numpy as np

    px = _pattern(9, 6)
    out = decode_pixels(real_resize_image(_bmp_bytes(px), 4, 4))
    assert out.shape == (4, 4, 3)
    ys, xs = (np.arange(4) * 9) // 4, (np.arange(4) * 6) // 4
    assert np.array_equal(out, px[np.ix_(ys, xs)])


def test_decode_pixels_error_paths():
    import pytest

    from lens_warehouse_spark.llm.multimodal import decode_pixels

    with pytest.raises(ValueError):  # GIF routes to the real decoder
        decode_pixels(b"GIF89a" + b"\x00" * 24)  # (r9): garbage body
    with pytest.raises(ValueError):  # PNG decodes for real now (r8) —
        decode_pixels(b"\x89PNG\r\n\x1a\n" + b"\x00" * 24)  # garbage body
    with pytest.raises(ValueError):  # truncated PPM body
        decode_pixels(b"P6\n4 4\n255\n\x00\x00")
    with pytest.raises(ValueError):  # malformed header
        decode_pixels(b"P6garbage")
    with pytest.raises(ValueError):  # flipping a 24-bit header to 8-bit
        bad = bytearray(_bmp_bytes(_pattern(2, 2)))  # leaves no palette
        bad[28] = 8  # room: ValueError, not a mis-decode (r9)
        decode_pixels(bytes(bad))
    with pytest.raises(NotImplementedError):  # RLE-compressed BMP
        bad = bytearray(_bmp_bytes(_pattern(2, 2)))
        bad[30] = 1  # BI_RLE8
        decode_pixels(bytes(bad))
    with pytest.raises(ValueError):  # truncated BMP body
        decode_pixels(_bmp_bytes(_pattern(4, 4))[:-8])


def _wav_bytes(samples, rate=8000, ch=1, extra_chunk=False):
    """Independent PCM16 WAV construction via struct.pack (the l8h
    corpus builds its blobs in SQL hex — this one exists so the chunk
    walk is also tested against a third construction, including an
    unknown odd-sized chunk that must be skipped word-aligned)."""
    import struct

    import numpy as np

    data = np.asarray(samples, dtype="<i2").tobytes()
    chunks = b""
    if extra_chunk:
        chunks += b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad
    chunks += b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, ch, rate, rate * 2 * ch, 2 * ch, 16
    )
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_decode_audio_roundtrip_and_chunk_walk():
    import numpy as np

    from lens_warehouse_spark.llm.multimodal import decode_audio

    smp = [0, 1, -1, 32767, -32768, 12345, -12345]
    for extra in (False, True):
        rate, ch, out = decode_audio(_wav_bytes(smp, extra_chunk=extra))
        assert (rate, ch) == (8000, 1)
        assert np.array_equal(out, np.array(smp, dtype=np.int16))


def test_decode_audio_error_paths():
    import pytest

    from lens_warehouse_spark.llm.multimodal import decode_audio

    with pytest.raises(ValueError):
        decode_audio(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):  # truncated data chunk
        decode_audio(_wav_bytes([1, 2, 3])[:-2])
    with pytest.raises(NotImplementedError):  # non-PCM fmt
        import struct

        b = bytearray(_wav_bytes([1, 2]))
        i = b.index(b"fmt ") + 8
        b[i : i + 2] = struct.pack("<H", 3)  # IEEE float
        decode_audio(bytes(b))
    with pytest.raises(ValueError):  # no data chunk at all
        import struct

        fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        decode_audio(b"RIFF" + struct.pack("<I", 4 + len(fmt)) + b"WAVE" + fmt)


def _y4m_bytes(lumas, chroma=128):
    """Independent y4m construction (struct-free: it's a text+raw
    format): n frames of (h, w) luma + constant 4:2:0 chroma."""
    import numpy as np

    arr = np.asarray(lumas, dtype=np.uint8)
    n, h, w = arr.shape
    out = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode()
    c = bytes([chroma]) * ((w // 2) * (h // 2))
    for f in range(n):
        out += b"FRAME\n" + arr[f].tobytes() + c + c
    return out


def test_decode_y4m_roundtrip_and_sampling():
    import numpy as np

    from lens_warehouse_spark.llm.multimodal import decode_y4m

    rng = np.random.default_rng(7)
    lumas = rng.integers(0, 256, size=(5, 4, 6), dtype=np.uint8)
    w, h, out = decode_y4m(_y4m_bytes(lumas))
    assert (w, h) == (6, 4)
    assert np.array_equal(out, lumas)
    assert np.array_equal(out[::2], lumas[[0, 2, 4]])


def test_decode_y4m_error_paths():
    import numpy as np
    import pytest

    from lens_warehouse_spark.llm.multimodal import decode_y4m

    lumas = np.zeros((2, 4, 4), dtype=np.uint8)
    good = _y4m_bytes(lumas)
    with pytest.raises(ValueError):
        decode_y4m(b"AVI1 not y4m")
    with pytest.raises(ValueError):  # truncated final frame
        decode_y4m(good[:-3])
    with pytest.raises(NotImplementedError):  # 4:2:2 chroma
        decode_y4m(good.replace(b"C420", b"C422", 1))
    with pytest.raises(ValueError):  # odd width under 4:2:0
        decode_y4m(good.replace(b"W4", b"W5", 1))
    with pytest.raises(ValueError):  # corrupted FRAME marker
        decode_y4m(good.replace(b"FRAME", b"FRUME", 1))


# --------------------------------------------------------------------------
# l8j: real PNG decode (r8). The test encoder below is a THIRD
# construction, independent of both the SQL synthesizer (stored-deflate
# blocks, forward-filtered in SQL) and the decoder: it uses REAL
# zlib.compress output (dynamic-Huffman deflate, which the stored-block
# SQL path never produces) and applies filters with its own numpy code.
# --------------------------------------------------------------------------
def _png_pack_bits(vals, depth):
    """(h, w) d-bit values -> (h, stride) packed bytes, MSB-first."""
    import numpy as np

    h, w = vals.shape
    per = 8 // depth
    pad = (-w) % per
    v = np.concatenate(
        [vals.astype(np.int64), np.zeros((h, pad), np.int64)], axis=1
    ).reshape(h, -1, per)
    out = np.zeros(v.shape[:2], np.int64)
    for j in range(per):
        out |= v[:, :, j] << (8 - depth * (j + 1))
    return out


def _png_mode(px, palette, depth=None):
    """(ctype, depth, bpp, byte-plane (h, w*bpp or stride) int64) for
    any input: uint8/uint16 gray (h,w), gray+alpha (h,w,2), RGB/RGBA
    (h,w,3|4), palette indices (h,w) when ``palette`` is given, or
    sub-byte packed gray/palette when ``depth`` in (1, 2, 4)."""
    import numpy as np

    h, w = px.shape[:2]
    if depth in (1, 2, 4):
        ctype = 3 if palette is not None else 0
        return ctype, depth, 1, _png_pack_bits(px.reshape(h, w), depth)
    if palette is not None:
        return 3, 8, 1, px.reshape(h, w).astype(np.int64)
    ch = 1 if px.ndim == 2 else px.shape[2]
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    if px.dtype == np.uint16:
        arr = px.reshape(h, w * ch).astype(np.int64)
        flat = np.empty((h, w * ch * 2), np.int64)
        flat[:, 0::2] = arr >> 8
        flat[:, 1::2] = arr & 0xFF
        return ctype, 16, ch * 2, flat
    return ctype, 8, ch, px.reshape(h, -1).astype(np.int64)


def _encode_png(px, filters=None, level=6, interlace=False, palette=None,
                depth=None):
    """Minimal test-side PNG encoder covering every decoder mode:
    gray / gray+alpha / RGB / RGBA at 8 or 16 bits (dtype-driven) and
    8-bit palette (pass indices + ``palette``), with a chosen per-row
    filter list (default all-zero). With ``interlace`` the image is
    split into the seven Adam7 passes, each filtered independently
    (filters then apply per pass-row)."""
    import struct
    import zlib

    import numpy as np

    h, w = px.shape[:2]
    ctype, depth, bpp, _flat = _png_mode(px, palette, depth)
    if interlace:
        body = bytearray()
        fi = 0
        for x0, y0, dx, dy in [
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        ]:
            sub = px[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            sh = sub.shape[0]
            fl = (filters or [0] * 1000)[fi : fi + sh]
            fl = list(fl) + [0] * (sh - len(fl))
            fi += sh
            inner = _encode_png(
                np.ascontiguousarray(sub), fl, level=0, palette=palette,
                depth=depth if depth in (1, 2, 4) else None,
            )
            # strip container: keep only the filtered scanline bytes
            body += zlib.decompress(_png_idat(inner))
        ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 1)
        return _png_container(
            ihdr, zlib.compress(bytes(body), level), palette
        )
    filters = filters if filters is not None else [0] * h
    stride = _flat.shape[1]  # w*bpp, or the packed sub-byte stride
    flat = _flat
    out = bytearray()
    for y in range(h):
        ft = filters[y]
        cur = flat[y]
        left = np.concatenate([np.zeros(bpp, np.int64), cur[:-bpp]])
        up = flat[y - 1] if y else np.zeros(stride, np.int64)
        upl = (
            np.concatenate([np.zeros(bpp, np.int64), flat[y - 1][:-bpp]])
            if y
            else np.zeros(stride, np.int64)
        )
        if ft == 0:
            pred = np.zeros(stride, np.int64)
        elif ft == 1:
            pred = left
        elif ft == 2:
            pred = up
        elif ft == 3:
            pred = (left + up) // 2
        else:
            p = left + up - upl
            pa, pb, pc = abs(p - left), abs(p - up), abs(p - upl)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upl)
            )
        out.append(ft)
        out += ((cur - pred) % 256).astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    return _png_container(ihdr, zlib.compress(bytes(out), level), palette)


def _png_container(ihdr_payload, idat_payload, palette=None):
    import struct
    import zlib

    def chunk(t, d):
        return (
            struct.pack(">I", len(d))
            + t
            + d
            + struct.pack(">I", zlib.crc32(t + d))
        )

    plte = (
        chunk(b"PLTE", palette.astype("uint8").tobytes())
        if palette is not None
        else b""
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr_payload)
        + plte
        + chunk(b"IDAT", idat_payload)
        + chunk(b"IEND", b"")
    )


def _png_idat(blob):
    """Extract the (single) IDAT payload from a test-built PNG."""
    import struct

    pos = 8
    while pos + 12 <= len(blob):
        ln, typ = struct.unpack_from(">I4s", blob, pos)
        if typ == b"IDAT":
            return blob[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
    raise AssertionError("no IDAT in test PNG")


def test_png_roundtrip_all_filters_rgb_and_rgba():
    import numpy as np

    from lens_warehouse_spark.llm.multimodal import decode_png

    rng = np.random.default_rng(42)
    for ch in (3, 4):
        px = rng.integers(0, 256, size=(7, 5, ch), dtype=np.uint8)
        for filters in ([0] * 7, [1] * 7, [2] * 7, [3] * 7, [4] * 7,
                        [0, 1, 2, 3, 4, 3, 1]):
            blob = _encode_png(px, filters)
            got = decode_png(blob)
            assert got.shape == px.shape
            assert (got == px).all(), f"ch={ch} filters={filters}"


def test_png_multiple_idat_chunks_and_sniff_agree():
    import struct
    import zlib

    import numpy as np

    from lens_warehouse_spark.llm.multimodal import decode_png, sniff_media

    px = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
    blob = _encode_png(px, [4, 2, 0, 1, 3, 4])
    fmt, w, h = sniff_media(blob)
    assert (fmt, w, h) == ("png", 4, 6)
    # split the IDAT payload into two chunks: decoders must concat
    sig, rest = blob[:8], blob[8:]
    ln = struct.unpack(">I", rest[:4])[0]
    ihdr, rest = rest[: 12 + ln], rest[12 + ln :]
    ln = struct.unpack(">I", rest[:4])[0]
    idat_data, iend = rest[8 : 8 + ln], rest[12 + ln :]
    mid = len(idat_data) // 2

    def chunk(t, d):
        return (
            struct.pack(">I", len(d))
            + t
            + d
            + struct.pack(">I", zlib.crc32(t + d))
        )

    split = (
        sig
        + ihdr
        + chunk(b"IDAT", idat_data[:mid])
        + chunk(b"IDAT", idat_data[mid:])
        + iend
    )
    assert (decode_png(split) == px).all()


def test_png_error_paths():
    import numpy as np
    import pytest

    from lens_warehouse_spark.llm.multimodal import decode_png

    px = np.zeros((3, 3, 3), dtype=np.uint8)
    blob = bytearray(_encode_png(px))
    # corrupt one IDAT payload byte -> chunk CRC must catch it
    blob[-20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(blob))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")
    # hand-built grayscale (color type 0) decodes since r9
    import struct
    import zlib

    def chunk(t, d):
        return (
            struct.pack(">I", len(d))
            + t
            + d
            + struct.pack(">I", zlib.crc32(t + d))
        )

    gray = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00\x01\x02\x00\x03\x04"))
        + chunk(b"IEND", b"")
    )
    assert (decode_png(gray) == np.array([[1, 2], [3, 4]])).all()
    # truncated chunk length field
    with pytest.raises(ValueError):
        decode_png(bytes(_encode_png(px))[:20])


def test_decode_pixels_routes_png_and_resize_works():
    """decode_pixels now treats PNG as a first-class pixel source
    (alpha dropped for the 3-channel resize path)."""
    import numpy as np

    from lens_warehouse_spark.llm.multimodal import (
        decode_pixels,
        real_resize_image,
    )

    rng = np.random.default_rng(7)
    rgba = rng.integers(0, 256, size=(6, 5, 4), dtype=np.uint8)
    got = decode_pixels(_encode_png(rgba, [0, 1, 2, 3, 4, 2]))
    assert got.shape == (6, 5, 3)
    assert (got == rgba[..., :3]).all()
    out = real_resize_image(_encode_png(rgba), 3, 3)
    assert out[:2] == b"P6"


# --------------------------------------------------------------------------
# l8k: real GIF decode (r8). Test-side REAL LZW compressor (dictionary
# build, variable width, clear-on-full) — the third construction: the
# SQL synthesizer only ever emits the fixed-width degenerate stream, so
# these tests are what prove the decoder handles genuine LZW.
# --------------------------------------------------------------------------
def _lzw_encode(data: bytes, min_code_size: int) -> bytes:
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    code_size = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    bits = []

    def emit(code, width):
        for b in range(width):
            bits.append((code >> b) & 1)

    emit(clear, code_size)
    cur = b""
    for byte in data:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], code_size)
        table[nxt] = next_code
        next_code += 1
        # mirror the decoder: width grows once the table holds
        # 1 << code_size entries (decoder is one entry behind, so
        # compare against its post-insert size = next_code - 1 ... the
        # round-trip tests below pin this convention empirically)
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code == 4096:  # table full: reset, like real encoders
            emit(clear, code_size)
            code_size = min_code_size + 1
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
        cur = bytes([byte])
    if cur:
        emit(table[cur], code_size)
    emit(end, code_size)
    out = bytearray()
    for i in range(0, len(bits), 8):
        out.append(sum(b << j for j, b in enumerate(bits[i : i + 8])))
    return bytes(out)


def test_lzw_roundtrip_random_and_repetitive():
    import numpy as np

    from lens_warehouse_spark.llm.multimodal import lzw_decode

    rng = np.random.default_rng(3)
    cases = [
        b"",
        b"\x00",
        bytes(rng.integers(0, 256, 50, dtype=np.uint8)),
        bytes(rng.integers(0, 4, 5000, dtype=np.uint8)),  # compressible
        b"ab" * 3000,  # deep dictionary chains
        bytes(rng.integers(0, 256, 20000, dtype=np.uint8)),  # forces 12-bit + clear
    ]
    for data in cases:
        assert lzw_decode(_lzw_encode(data, 8), 8) == data, len(data)


def test_lzw_kwkwk_pattern():
    """The classic cScSc case: decoder receives a code one beyond its
    table and must synthesize prev + prev[0]."""
    from lens_warehouse_spark.llm.multimodal import lzw_decode

    data = b"ababababab"
    assert lzw_decode(_lzw_encode(data, 8), 8) == data


def _gif_bytes(
    idx,
    palette,
    min_code_size=8,
    extension=False,
    interlace=False,
    local_palette=None,
):
    """Independent Python GIF construction with REAL LZW compression.
    ``interlace`` stores rows in 4-pass order and sets the flag;
    ``local_palette`` (256x3) rides in the image descriptor while the
    GLOBAL table keeps the decoy ``palette`` — a decoder using the
    wrong table cannot match."""
    import struct

    h, w = idx.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0xF7, 0, 0])  # 256-entry GCT
    out += palette.astype("uint8").tobytes()
    if extension:  # graphic control extension the walker must skip
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    iflags = (0x40 if interlace else 0) | (0x87 if local_palette is not None else 0)
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([iflags])
    if local_palette is not None:
        out += local_palette.astype("uint8").tobytes()
    if interlace:
        order = (
            list(range(0, h, 8))
            + list(range(4, h, 8))
            + list(range(2, h, 4))
            + list(range(1, h, 2))
        )
        idx = idx[order]
    out += bytes([min_code_size])
    data = _lzw_encode(idx.tobytes(), min_code_size)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_decode_real_lzw_roundtrip():
    import numpy as np

    from lens_warehouse_spark.llm.multimodal import decode_gif, sniff_media

    rng = np.random.default_rng(11)
    palette = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (9, 13), dtype=np.uint8)
    blob = _gif_bytes(idx, palette, extension=True)
    fmt, w, h = sniff_media(blob)
    assert (fmt, w, h) == ("gif", 13, 9)
    got = decode_gif(blob)
    assert got.shape == (9, 13, 3)
    assert (got == palette[idx]).all()


def test_gif_decode_error_paths():
    import numpy as np
    import pytest

    from lens_warehouse_spark.llm.multimodal import decode_gif

    palette = np.zeros((256, 3), dtype=np.uint8)
    idx = np.zeros((3, 3), dtype=np.uint8)
    good = _gif_bytes(idx, palette)
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"PNG nope")
    with pytest.raises(ValueError):
        decode_gif(good[:11])  # truncated LSD


def test_gif_interlace_and_local_palette_roundtrip():
    """r9: interlaced row order and local-color-table GIFs decode for
    real. The local table rides with a DECOY global table, so reading
    the wrong one cannot match; the interlaced image uses a gradient
    so any row mis-placement flips pixels."""
    import numpy as np

    from lens_warehouse_spark.llm.multimodal import decode_gif

    rng = np.random.default_rng(17)
    idx = (np.indices((11, 7)).sum(axis=0) * 13 % 256).astype(np.uint8)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    got = decode_gif(_gif_bytes(idx, pal, interlace=True))
    assert (got == pal[idx]).all()
    decoy = np.zeros((256, 3), dtype=np.uint8)
    got = decode_gif(_gif_bytes(idx, decoy, local_palette=pal))
    assert (got == pal[idx]).all()
    got = decode_gif(
        _gif_bytes(idx, decoy, local_palette=pal, interlace=True)
    )
    assert (got == pal[idx]).all()


# --------------------------------------------------------------------------
# l8l: real baseline JPEG decode (r8). Test-side REAL encoder: forward
# DCT, quantization, zigzag run-length, VARIABLE-length Huffman (the
# spec's luminance DC table + a custom 1/3-bit AC table built here),
# MSB-first packing WITH 0xFF00 byte stuffing — everything the SQL
# synthesizer's degenerate path never produces.
# --------------------------------------------------------------------------
_DC_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_SYMBOLS = list(range(12))


def _canonical_codes(counts, symbols):
    codes = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


def _jpeg_bytes(px, q):
    """Encode a grayscale (h, w) uint8 image (dims multiples of 8)."""
    import struct

    import numpy as np

    from lens_warehouse_spark.llm.multimodal import (
        _JPEG_ZIGZAG,
        _idct_matrix,
    )

    h, w = px.shape
    m = _idct_matrix()  # orthonormal: forward DCT is m.T @ B @ m
    qnat = np.asarray(q, dtype=np.int32)  # natural order
    blocks = []
    for y0 in range(0, h, 8):
        for x0 in range(0, w, 8):
            b = px[y0 : y0 + 8, x0 : x0 + 8].astype(np.float64) - 128.0
            s = m.T @ b @ m
            blocks.append(np.round(s.reshape(64) / qnat).astype(np.int32))
    # symbol streams
    def cat_of(v):
        return int(v).bit_length() if v else 0

    dc_codes = _canonical_codes(_DC_COUNTS, _DC_SYMBOLS)
    # custom AC table: most frequent symbol gets a 1-bit code
    from collections import Counter

    ac_syms = Counter()
    events = []
    prev_dc = 0
    for nat in blocks:
        zz = np.empty(64, dtype=np.int32)
        for zi, ni in enumerate(_JPEG_ZIGZAG):
            zz[zi] = nat[ni]
        diff = int(zz[0]) - prev_dc
        prev_dc = int(zz[0])
        blk_ev = [("dc", cat_of(abs(diff)), diff)]
        i, run = 1, 0
        while i < 64:
            v = int(zz[i])
            if v == 0:
                run += 1
            else:
                while run >= 16:
                    blk_ev.append(("ac", 0xF0, 0))
                    run -= 16
                size = cat_of(abs(v))
                blk_ev.append(("ac", (run << 4) | size, v))
                run = 0
            i += 1
        if run:
            blk_ev.append(("ac", 0x00, 0))
        events.append(blk_ev)
        for kind, sym, _v in blk_ev:
            if kind == "ac":
                ac_syms[sym] += 1
    ranked = [s for s, _ in ac_syms.most_common()]
    assert len(ranked) <= 4, "test image needs <= 4 AC symbols"
    ac_counts = [0] * 16
    ac_counts[0] = 1  # one 1-bit code
    ac_counts[2] = len(ranked) - 1  # rest at 3 bits (Kraft: 1/2+3/8<=1)
    ac_codes = _canonical_codes(ac_counts, ranked)

    bits = []

    def emit(length, code):
        for b in range(length - 1, -1, -1):
            bits.append((code >> b) & 1)

    def emit_val(v, size):
        if size == 0:
            return
        enc = v if v >= 0 else v + (1 << size) - 1
        for b in range(size - 1, -1, -1):
            bits.append((enc >> b) & 1)

    for blk_ev in events:
        for kind, sym, v in blk_ev:
            if kind == "dc":
                ln, code = dc_codes[sym]
                emit(ln, code)
                emit_val(v, sym)
            else:
                ln, code = ac_codes[sym]
                emit(ln, code)
                if sym not in (0x00, 0xF0):
                    emit_val(v, sym & 0x0F)
    while len(bits) % 8:
        bits.append(1)
    raw = bytearray()
    for i in range(0, len(bits), 8):
        byte = sum(b << (7 - j) for j, b in enumerate(bits[i : i + 8]))
        raw.append(byte)
        if byte == 0xFF:
            raw.append(0x00)  # stuffing

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = b"\xff\xd8"
    if int(qnat.max()) > 255:  # r9: 16-bit table (DQT precision 1)
        zz_q = b"".join(
            struct.pack(">H", int(qnat[ni])) for ni in _JPEG_ZIGZAG
        )
        out += seg(0xDB, b"\x10" + zz_q)
    else:
        zz_q = bytes(int(qnat[ni]) for ni in _JPEG_ZIGZAG)
        out += seg(0xDB, b"\x00" + zz_q)
    out += seg(0xC4, b"\x00" + bytes(_DC_COUNTS) + bytes(_DC_SYMBOLS))
    out += seg(0xC4, b"\x10" + bytes(ac_counts) + bytes(ranked))
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    out += seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")
    out += bytes(raw) + b"\xff\xd9"
    # reference pixels: dequant + IDCT of the encoder's own coefficients
    ref = np.zeros((h, w), dtype=np.uint8)
    prev_dc = 0
    bi = 0
    for y0 in range(0, h, 8):
        for x0 in range(0, w, 8):
            nat = blocks[bi] * qnat
            bi += 1
            s = nat.reshape(8, 8).astype(np.float64)
            ref[y0 : y0 + 8, x0 : x0 + 8] = np.clip(
                np.round(m @ s @ m.T + 128), 0, 255
            ).astype(np.uint8)
    return out, ref


def test_jpeg_decode_real_encoder_roundtrip():
    import numpy as np

    from lens_warehouse_spark.llm.multimodal import decode_jpeg_gray

    rng = np.random.default_rng(5)
    # smooth image: base gradient + mild noise -> few AC symbols but
    # nonzero AC coefficients and varied DC categories
    y, x = np.indices((16, 24))
    px = ((y * 6 + x * 3) % 200 + 20).astype(np.uint8)
    q = np.full(64, 64, dtype=np.int32)  # coarse -> few distinct AC syms
    q[0] = 8
    blob, ref = _jpeg_bytes(px, q)
    got = decode_jpeg_gray(blob)
    assert got.shape == ref.shape
    assert (got == ref).all()


def test_jpeg_decode_stuffed_bytes_and_negative_dc():
    import numpy as np

    from lens_warehouse_spark.llm.multimodal import decode_jpeg_gray

    # alternating dark/bright 8x8 tiles force sign-flipping DC diffs;
    # a fine quant table drives long code runs -> stuffed 0xFF bytes
    tiles = []
    for i in range(8):
        tiles.append(np.full((8, 8), 255 if i % 2 else 0, dtype=np.uint8))
    px = np.hstack(tiles[:4])
    px = np.vstack([px, np.hstack(tiles[4:])])
    q = np.full(64, 255, dtype=np.int32)
    q[0] = 1  # max DC resolution -> large categories, dense 1-bits
    blob, ref = _jpeg_bytes(px, q)
    assert b"\xff\x00" in blob[20:]  # stuffing actually exercised
    assert (decode_jpeg_gray(blob) == ref).all()


def test_jpeg_decode_error_paths():
    import pytest

    from lens_warehouse_spark.llm.multimodal import decode_jpeg_gray

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_gray(b"notajpeg")
    import struct

    import numpy as np

    q = np.full(64, 16, dtype=np.int32)
    blob, _ = _jpeg_bytes(np.zeros((8, 8), dtype=np.uint8), q)
    # SOF3 (lossless): honest NotImplementedError
    loss = blob.replace(b"\xff\xc0", b"\xff\xc3")
    with pytest.raises(NotImplementedError, match="extended|lossless"):
        decode_jpeg_gray(loss)
    # SOF2 decodes for real since r9 — but a baseline SOS relabeled
    # progressive is malformed (a DC scan claiming the full band)
    prog = blob.replace(b"\xff\xc0", b"\xff\xc2")
    with pytest.raises(ValueError, match="spectral"):
        decode_jpeg_gray(prog)
    # truncated scan
    with pytest.raises(ValueError):
        decode_jpeg_gray(blob[:-8] + b"\xff\xd9")


# --------------------------------------------------------------------------
# Hypothesis property coverage for the r8 codecs: arbitrary shapes,
# pixel contents and filter choices round-trip exactly. Pure-Python
# fast path (no Spark session).
# --------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 10),
    ch=st.sampled_from([3, 4]),
    seed=st.integers(0, 2**31 - 1),
    data=st.data(),
)
def test_png_roundtrip_property(w, h, ch, seed, data):
    import numpy as np

    from lens_warehouse_spark.llm.multimodal import decode_png

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    filters = data.draw(
        st.lists(st.integers(0, 4), min_size=h, max_size=h), label="filters"
    )
    assert (decode_png(_encode_png(px, filters)) == px).all()


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 16),
    h=st.integers(1, 12),
    nlevels=st.integers(1, 256),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_property(w, h, nlevels, seed):
    """Low-cardinality index streams drive LZW into deep dictionary
    chains; full-cardinality ones stress literal paths — both must
    round-trip through the real compressor + the decoder."""
    import numpy as np

    from lens_warehouse_spark.llm.multimodal import decode_gif

    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, nlevels, (h, w), dtype=np.uint8)
    got = decode_gif(_gif_bytes(idx, palette))
    assert (got == palette[idx]).all()


@settings(max_examples=30, deadline=None)
@given(
    bw=st.integers(1, 3),
    bh=st.integers(1, 3),
    qdc=st.sampled_from([1, 8, 16, 64]),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_decode_property(bw, bh, qdc, seed):
    """Random images through the real encoder: decoded pixels must
    equal the encoder's own dequant+IDCT reference exactly. The coarse
    AC quant keeps the symbol alphabet within the 4-code test table."""
    import numpy as np

    from lens_warehouse_spark.llm.multimodal import decode_jpeg_gray

    rng = np.random.default_rng(seed)
    # smooth random field: random corners, bilinear blend -> small ACs
    h, w = bh * 8, bw * 8
    yy, xx = np.indices((h, w), dtype=np.float64)
    c = rng.integers(0, 256, 4)
    px = (
        c[0] * (1 - yy / h) * (1 - xx / w)
        + c[1] * (1 - yy / h) * (xx / w)
        + c[2] * (yy / h) * (1 - xx / w)
        + c[3] * (yy / h) * (xx / w)
    ).astype(np.uint8)
    q = np.full(64, 255, dtype=np.int32)
    q[0] = qdc
    try:
        blob, ref = _jpeg_bytes(px, q)
    except AssertionError:
        return  # >4 distinct AC symbols: outside the test table's reach
    assert (decode_jpeg_gray(blob) == ref).all()


def test_s21_gzip_multiblock_and_unicode(spark, tmp_path_factory):
    """The stored-deflate path must split texts past the 65535-byte
    block cap into multiple blocks (sf0.01 never exercises this), and
    byte counts must be UTF-8 bytes. stdlib gzip verifies each
    member's CRC-32 + ISIZE, so a mis-assembled container fails loudly
    rather than producing wrong stats."""
    import os

    from lens_warehouse_spark import registry

    registry.load_all()
    d = tmp_path_factory.mktemp("gzip_sf")
    big = ("word " * 20000).strip()  # ~100k bytes -> 2 stored blocks
    rows = [
        (1, big, "en", "web", len(big)),
        (2, "café au lait", "fr", "web", 12),  # 13 utf-8 bytes
        (3, "", "en", "web", 0),  # empty text -> empty member
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(d), "documents.parquet")
    )
    out = {
        r.doc_id: (r.n_bytes, r.n_tokens)
        for r in registry.QUERIES["s21_gzip_text_scan"](spark, str(d)).collect()
    }
    assert out[1] == (len(big.encode()), 20000)
    assert out[2] == (13, 3)
    assert out[3] == (0, 1)  # ''.split(' ') == [''] on both engines


# --------------------------------------------------------------------------
# l8m: real TIFF decode (r8). Independent Python encoder exercising
# everything the SQL synthesizer deliberately avoids: big-endian MM
# files, RGB (3 samples, out-of-line BitsPerSample), single-strip
# INLINE strip tables (value-in-field rule), and WhiteIsZero.
# --------------------------------------------------------------------------
def _tiff_packbits_encode(data):
    """Real PackBits: repeat runs >= 3 become (257-n, byte); literals
    chunked at 128."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit = i
        while (
            i < n
            and i - lit < 128
            and not (i + 2 < n and data[i] == data[i + 1] == data[i + 2])
        ):
            i += 1
        out += bytes([i - lit - 1]) + data[lit:i]
    return bytes(out)


def _tiff_lzw_encode(data):
    """Real TIFF LZW: MSB-first packing, ClearCode 256 / EOI 257,
    EARLY code-width change (encoder grows when its table size —
    the next code to assign — reaches 2^width, per TIFF6 p.61 /
    libtiff: "code 511 should be written with 10 bits"), clear at
    the 4094-entry cap."""
    bits = []

    def emit(code, width):
        for i in range(width - 1, -1, -1):
            bits.append((code >> i) & 1)

    table = {bytes([i]): i for i in range(256)}
    nxt, width = 258, 9
    emit(256, 9)  # initial clear
    cur = b""
    for byte in data:
        cand = cur + bytes([byte])
        if cand in table:
            cur = cand
            continue
        emit(table[cur], width)
        table[cand] = nxt
        nxt += 1
        # EARLY change (libtiff convention): once the table holds an
        # entry with code 2^width - 1, every following code — which
        # may BE that entry — is written in width+1 bits. nxt is the
        # table size after the append, so grow at nxt == 2^width.
        if nxt == (1 << width) and width < 12:
            width += 1
        if nxt >= 4094:
            emit(256, width)  # clear
            table = {bytes([i]): i for i in range(256)}
            nxt, width = 258, 9
        cur = bytes([byte])
    if cur:
        emit(table[cur], width)
    emit(257, width)  # EOI
    while len(bits) % 8:
        bits.append(0)
    return bytes(
        sum(b << (7 - j) for j, b in enumerate(bits[i : i + 8]))
        for i in range(0, len(bits), 8)
    )


def _tiff_bytes(
    px,
    big_endian=False,
    white_is_zero=False,
    rows_per_strip=None,
    compression=1,
    predictor=1,
    palette=None,
):
    import struct
    import zlib

    import numpy as np

    e = ">" if big_endian else "<"
    h, w = px.shape[:2]
    spp = 1 if px.ndim == 2 else px.shape[2]
    rps = rows_per_strip or h
    n_strips = (h + rps - 1) // rps
    body = (255 - px) if white_is_zero else px
    if predictor == 2:  # horizontal differencing per channel, mod 256
        d = body.astype(np.int64).copy()
        d[:, 1:] = d[:, 1:] - body.astype(np.int64)[:, :-1]
        body = (d % 256).astype(np.uint8)
    entries = []  # (tag, type, count, values)
    entries.append((256, 3, 1, [w]))
    entries.append((257, 3, 1, [h]))
    entries.append((258, 3, spp, [8] * spp))
    entries.append((259, 3, 1, [compression]))
    photo = 3 if palette is not None else (0 if white_is_zero else 1)
    entries.append((262, 3, 1, [photo]))
    entries.append((277, 3, 1, [spp]))
    entries.append((278, 3, 1, [rps]))
    if predictor != 1:
        entries.append((317, 3, 1, [predictor]))
    if palette is not None:  # ColorMap: 16-bit, all-R then all-G then all-B
        cmap = (palette.astype(np.uint32) * 257).astype(np.uint16)
        entries.append((320, 3, 768, list(cmap.T.reshape(-1))))
    # strip tables appended later once offsets are known
    tsize = {3: 2, 4: 4}
    tfmt = {3: "H", 4: "I"}
    n = len(entries) + 2
    ifd_off = 8
    after_ifd = ifd_off + 2 + 12 * n + 4
    # out-of-line pool starts after the IFD
    pool = bytearray()
    pool_base = after_ifd

    def value_field(typ, vals):
        total = tsize[typ] * len(vals)
        if total <= 4:
            raw = struct.pack(e + tfmt[typ] * len(vals), *vals)
            return raw + b"\x00" * (4 - total)
        off = pool_base + len(pool)
        pool.extend(struct.pack(e + tfmt[typ] * len(vals), *vals))
        return struct.pack(e + "I", off)

    # strip geometry: data goes after the pool; two passes since the
    # pool grows as we add the strip tables themselves. Compressed
    # strips are built FIRST so their real byte sizes drive the offsets.
    strip_rows = [min(rps, h - i * rps) for i in range(n_strips)]
    flat_body = body.reshape(h, -1)
    strip_blobs = []
    row = 0
    for r in strip_rows:
        raw = flat_body[row : row + r].tobytes()
        row += r
        if compression == 1:
            strip_blobs.append(raw)
        elif compression == 5:
            strip_blobs.append(_tiff_lzw_encode(raw))
        elif compression in (8, 32946):
            strip_blobs.append(zlib.compress(raw))
        elif compression == 32773:
            strip_blobs.append(_tiff_packbits_encode(raw))
        else:
            raise AssertionError(f"test encoder: compression {compression}")
    strip_sizes = [len(sb) for sb in strip_blobs]
    # reserve pool space for every out-of-line value: existing entries
    # past 4 bytes (e.g. RGB BitsPerSample, 3 SHORTs) plus the strip
    # tables if their LONG arrays don't fit inline
    probe = sum(
        tsize[typ] * len(vals)
        for _tag, typ, _cnt, vals in entries
        if tsize[typ] * len(vals) > 4
    )
    if 4 * n_strips > 4:
        probe += 8 * n_strips  # offsets + counts arrays
    data_base = pool_base + probe
    offsets = []
    acc = data_base
    for sz in strip_sizes:
        offsets.append(acc)
        acc += sz
    entries.append((273, 4, n_strips, offsets))
    entries.append((279, 4, n_strips, strip_sizes))
    entries.sort(key=lambda t: t[0])
    out = bytearray()
    out += (b"MM" if big_endian else b"II") + struct.pack(e + "HI", 42, ifd_off)
    out += struct.pack(e + "H", n)
    fields = b"".join(
        struct.pack(e + "HHI", tag, typ, cnt) + value_field(typ, vals)
        for tag, typ, cnt, vals in entries
    )
    out += fields + struct.pack(e + "I", 0)
    assert len(out) == after_ifd
    out += pool
    assert len(out) == data_base, (len(out), data_base)
    for sb in strip_blobs:
        out += sb
    return bytes(out)


def test_tiff_decode_variants():
    import numpy as np

    from lens_warehouse_spark.llm.multimodal import decode_tiff

    rng = np.random.default_rng(17)
    gray = rng.integers(0, 256, (7, 5), dtype=np.uint8)
    rgb = rng.integers(0, 256, (6, 4, 3), dtype=np.uint8)
    # little-endian single-strip (INLINE strip tables: count 1 fits)
    assert (decode_tiff(_tiff_bytes(gray)) == gray).all()
    # big-endian multi-strip
    assert (decode_tiff(_tiff_bytes(gray, big_endian=True, rows_per_strip=3)) == gray).all()
    # RGB (out-of-line BitsPerSample), both endiannesses
    assert (decode_tiff(_tiff_bytes(rgb)) == rgb).all()
    assert (decode_tiff(_tiff_bytes(rgb, big_endian=True)) == rgb).all()
    # WhiteIsZero files must come back inverted to BlackIsZero pixels
    assert (decode_tiff(_tiff_bytes(gray, white_is_zero=True)) == gray).all()


def test_tiff_compressed_strips_roundtrip():
    """r9: the strip compressions a real archive actually contains —
    LZW (MSB-first, EARLY width change: the off-by-one that silently
    corrupts a GIF-style decoder), Deflate (both codes), PackBits —
    each multi-strip (per-strip codec reset) and each also paired with
    the horizontal-differencing predictor, gray and RGB."""
    import numpy as np

    from lens_warehouse_spark.llm.multimodal import decode_tiff

    rng = np.random.default_rng(29)
    # smooth-ish content: runs for PackBits, dictionary hits for LZW
    base = np.add.outer(np.arange(11) * 3, np.arange(17) * 2) % 200
    gray = (base + rng.integers(0, 3, base.shape)).astype(np.uint8)
    rgb = np.stack([gray, gray[::-1], gray % 97], axis=-1).astype(np.uint8)
    for comp in (5, 8, 32946, 32773):
        for pred in (1, 2):
            for img in (gray, rgb):
                blob = _tiff_bytes(
                    img, rows_per_strip=4, compression=comp, predictor=pred
                )
                got = decode_tiff(blob)
                assert got.shape == img.shape, (comp, pred, img.shape)
                assert (got == img).all(), (comp, pred, img.shape)
    # LZW with enough data to force code-width growth past 9 bits
    big = rng.integers(0, 256, (40, 70), dtype=np.uint8)
    assert (decode_tiff(_tiff_bytes(big, compression=5)) == big).all()
    # big-endian + compression + predictor together
    assert (
        decode_tiff(
            _tiff_bytes(
                gray, big_endian=True, rows_per_strip=3,
                compression=8, predictor=2,
            )
        )
        == gray
    ).all()


def test_tiff_lzw_early_change_matches_real_convention():
    """r10 (ADVICE): pin the LZW early-change offset to the REAL TIFF
    convention — TIFF6 p.61 / libtiff: the encoder switches to 10 bits
    when code 511 is ADDED to its table (so code 511 itself is written
    with 10 bits); the decoder, one entry behind, switches when ITS
    table reaches 511/1023/2047 entries. Three teeth:

    1. a frozen stream (CRC-pinned so encoder drift can't silently
       co-vary with the decoder) that crosses ALL THREE width
       boundaries (final table size 2707 > 2048),
    2. an independent mini-decoder written directly from the spec
       sentence, parameterized by the growth offset — the real
       convention (off=1) must decode; the repo's old bug (off=2)
       and the GIF convention (off=0) must BOTH desync on the same
       bytes, proving the fixture discriminates,
    3. bit-position assertion: the first 10-bit read happens exactly
       when the decoder table holds 511 entries.
    """
    import random
    import zlib

    from lens_warehouse_spark.llm.multimodal import _tiff_lzw

    rng = random.Random(20260815)
    data = bytes(rng.randrange(256) for _ in range(2500))
    assert zlib.crc32(data) == 0xC0F102FC  # seeded-rng stability guard
    enc = _tiff_lzw_encode(data)
    # Freeze the exact encoded bytes: if the encoder's width schedule
    # ever drifts, this CRC breaks instead of the decoder test
    # silently passing against a matching-buggy stream.
    assert zlib.crc32(enc) == 0x690890F9
    assert _tiff_lzw(enc) == data

    def spec_decode(blob, off):
        """Minimal TIFF-LZW decoder from the spec text; grows width
        when table size == 2^width - off. off=1 is the TIFF6/libtiff
        early change; off=0 is GIF; off=2 was the pre-r10 bug."""
        table, width, out, prev = None, 9, bytearray(), None
        bitpos, total = 0, len(blob) * 8
        transitions = []  # (bitpos, table_size) at each width change
        while bitpos + width <= total:
            code = 0
            for _ in range(width):
                code = (code << 1) | ((blob[bitpos >> 3] >> (7 - (bitpos & 7))) & 1)
                bitpos += 1
            if code == 257:
                break
            if code == 256:
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width, prev = 9, None
                continue
            if prev is None:
                if code >= 256:
                    raise ValueError("first code not literal")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError(f"code {code} beyond table ({len(table)})")
            out += entry
            prev = entry
            if len(table) == (1 << width) - off and width < 12:
                transitions.append((bitpos, len(table)))
                width += 1
        return bytes(out), transitions

    got, transitions = spec_decode(enc, off=1)
    assert got == data
    # all three boundaries crossed, at exactly 511/1023/2047 entries
    assert [t[1] for t in transitions] == [511, 1023, 2047]
    # the wrong conventions must fail on the same bytes — either a
    # desync error or corrupted output; never a silent match
    for wrong_off in (0, 2):
        try:
            wrong, _ = spec_decode(enc, off=wrong_off)
            assert wrong != data, f"off={wrong_off} silently matched"
        except ValueError:
            pass


def test_tiff_decode_error_paths():
    import numpy as np
    import pytest

    from lens_warehouse_spark.llm.multimodal import decode_tiff

    gray = np.zeros((4, 4), dtype=np.uint8)
    good = bytearray(_tiff_bytes(gray))
    with pytest.raises(ValueError, match="header"):
        decode_tiff(b"notatiff")
    with pytest.raises(ValueError):
        decode_tiff(bytes(good[:30]))  # truncated IFD
    # flip Compression (tag 259) to 7 (TIFF-embedded JPEG, genuinely
    # unsupported — 1/5/8/32773/32946 decode for real since r9):
    # honest NotImplementedError
    import struct

    n = struct.unpack_from("<H", good, 8)[0]
    for i in range(n):
        off = 10 + 12 * i
        if struct.unpack_from("<H", good, off)[0] == 259:
            struct.pack_into("<H", good, off + 8, 7)
    with pytest.raises(NotImplementedError, match="compression"):
        decode_tiff(bytes(good))


# --------------------------------------------------------------------------
# l8o: real COLOR baseline JPEG decode (r9). Test-side REAL color
# encoder: per-plane forward DCT + quantization with SEPARATE luma and
# chroma quant tables (DQT ids 0/1 — pins per-component table
# selection), interleaved 4:2:0 / 4:4:4 MCU emission with per-component
# DC predictors, variable-length Huffman, stuffing. The reference image
# is the encoder's own dequant+IDCT planes pushed through the module's
# replication upsample + YCbCr->RGB — so the test pins the entropy/MCU/
# predictor/table machinery end to end (the color matrix itself is
# pinned value-exactly by the l8o DuckDB oracle).
# --------------------------------------------------------------------------
def _jpeg_color_bytes(yp, cbp, crp, hs, vs, qy, qc):
    """Encode planes (Y at (h, w), Cb/Cr at (h/vs, w/hs), all block-
    aligned) as an interleaved baseline color JPEG. Returns (blob,
    expected_rgb)."""
    import struct

    from collections import Counter

    import numpy as np

    from lens_warehouse_spark.llm.multimodal import (
        _JPEG_ZIGZAG,
        _idct_matrix,
        _ycbcr_to_rgb,
    )

    h, w = yp.shape
    m = _idct_matrix()
    comps = [  # (plane, hs, vs, quant, dqt_id, dht_id)
        (yp, hs, vs, np.asarray(qy, np.int32), 0, 0),
        (cbp, 1, 1, np.asarray(qc, np.int32), 1, 1),
        (crp, 1, 1, np.asarray(qc, np.int32), 1, 1),
    ]

    def cat_of(v):
        return int(v).bit_length() if v else 0

    # quantize all blocks in MCU-interleaved order, collecting events
    mcux, mcuy = w // (8 * hs), h // (8 * vs)
    events = []  # (dht_id, kind, sym, val)
    preds = [0, 0, 0]
    qblocks = [[] for _ in comps]  # per-comp natural-order coeff blocks
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (pl, chs, cvs, q, _dq, dh) in enumerate(comps):
                for by in range(cvs):
                    for bx in range(chs):
                        y0 = (my * cvs + by) * 8
                        x0 = (mx * chs + bx) * 8
                        b = pl[y0 : y0 + 8, x0 : x0 + 8].astype(np.float64) - 128.0
                        nat = np.round((m.T @ b @ m).reshape(64) / q).astype(
                            np.int32
                        )
                        qblocks[ci].append((y0, x0, nat))
                        zz = np.empty(64, np.int32)
                        for zi, ni in enumerate(_JPEG_ZIGZAG):
                            zz[zi] = nat[ni]
                        diff = int(zz[0]) - preds[ci]
                        preds[ci] = int(zz[0])
                        events.append((dh, "dc", cat_of(abs(diff)), diff))
                        i, run = 1, 0
                        while i < 64:
                            v = int(zz[i])
                            if v == 0:
                                run += 1
                            else:
                                while run >= 16:
                                    events.append((dh, "ac", 0xF0, 0))
                                    run -= 16
                                events.append(
                                    (dh, "ac", (run << 4) | cat_of(abs(v)), v)
                                )
                                run = 0
                            i += 1
                        if run:
                            events.append((dh, "ac", 0x00, 0))
    # build per-dht-id tables (same construction, separate ids)
    dc_codes = {i: _canonical_codes(_DC_COUNTS, _DC_SYMBOLS) for i in (0, 1)}
    ac_counts_by, ac_codes, ac_ranked = {}, {}, {}
    for tid in (0, 1):
        syms = Counter(s for d, k, s, _ in events if d == tid and k == "ac")
        ranked = [s for s, _ in syms.most_common()]
        assert 1 <= len(ranked) <= 4, "test image needs 1..4 AC symbols"
        counts = [0] * 16
        counts[0] = 1
        if len(ranked) > 1:
            counts[2] = len(ranked) - 1
        ac_counts_by[tid] = counts
        ac_ranked[tid] = ranked
        ac_codes[tid] = _canonical_codes(counts, ranked)

    bits = []

    def emit(length, code):
        for b in range(length - 1, -1, -1):
            bits.append((code >> b) & 1)

    def emit_val(v, size):
        if size:
            enc = v if v >= 0 else v + (1 << size) - 1
            for b in range(size - 1, -1, -1):
                bits.append((enc >> b) & 1)

    for tid, kind, sym, v in events:
        if kind == "dc":
            ln, code = dc_codes[tid][sym]
            emit(ln, code)
            emit_val(v, sym)
        else:
            ln, code = ac_codes[tid][sym]
            emit(ln, code)
            if sym not in (0x00, 0xF0):
                emit_val(v, sym & 0x0F)
    while len(bits) % 8:
        bits.append(1)
    raw = bytearray()
    for i in range(0, len(bits), 8):
        byte = sum(b << (7 - j) for j, b in enumerate(bits[i : i + 8]))
        raw.append(byte)
        if byte == 0xFF:
            raw.append(0x00)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = b"\xff\xd8"
    for tid, q in ((0, comps[0][3]), (1, comps[1][3])):
        zz_q = bytes(int(q[ni]) for ni in _JPEG_ZIGZAG)
        out += seg(0xDB, bytes([tid]) + zz_q)
    for tid in (0, 1):
        out += seg(0xC4, bytes([tid]) + bytes(_DC_COUNTS) + bytes(_DC_SYMBOLS))
        out += seg(
            0xC4,
            bytes([0x10 | tid])
            + bytes(ac_counts_by[tid])
            + bytes(ac_ranked[tid]),
        )
    out += seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, (hs << 4) | vs, 0])
        + bytes([2, 0x11, 1])
        + bytes([3, 0x11, 1]),
    )
    out += seg(0xDA, b"\x03" + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00")
    out += bytes(raw) + b"\xff\xd9"

    # expected: rebuild planes from the encoder's own coefficients,
    # then the module's upsample+convert path
    recon = []
    for ci, (pl, chs, cvs, q, _dq, _dh) in enumerate(comps):
        rp = np.zeros_like(pl)
        for y0, x0, nat in qblocks[ci]:
            s = (nat * q).reshape(8, 8).astype(np.float64)
            rp[y0 : y0 + 8, x0 : x0 + 8] = np.clip(
                np.round(m @ s @ m.T + 128), 0, 255
            ).astype(np.uint8)
        if (chs, cvs) != (hs, vs):
            rp = np.repeat(np.repeat(rp, vs // cvs, axis=0), hs // chs, axis=1)
        recon.append(rp[:h, :w])
    return out, _ycbcr_to_rgb(*recon)


def _smooth_plane(shape, seed, lo=30, hi=220):
    import numpy as np

    rng = np.random.default_rng(seed)
    hh, ww = shape
    yy, xx = np.indices(shape, dtype=np.float64)
    c = rng.integers(lo, hi, 4)
    px = (
        c[0] * (1 - yy / hh) * (1 - xx / ww)
        + c[1] * (1 - yy / hh) * (xx / ww)
        + c[2] * (yy / hh) * (1 - xx / ww)
        + c[3] * (yy / hh) * (xx / ww)
    )
    return np.clip(np.round(px), 0, 255).astype(np.uint8)


def test_jpeg_color_420_real_encoder_roundtrip():
    import numpy as np

    from lens_warehouse_spark.llm.multimodal import decode_jpeg

    q = np.full(64, 64, np.int32)
    q[0] = 8
    qc = np.full(64, 96, np.int32)
    qc[0] = 16
    yp = _smooth_plane((16, 32), 11)
    cbp = _smooth_plane((8, 16), 12)
    crp = _smooth_plane((8, 16), 13)
    blob, ref = _jpeg_color_bytes(yp, cbp, crp, 2, 2, q, qc)
    got = decode_jpeg(blob)
    assert got.shape == (16, 32, 3) == ref.shape
    assert (got == ref).all()


def test_jpeg_color_444_real_encoder_roundtrip():
    import numpy as np

    from lens_warehouse_spark.llm.multimodal import decode_jpeg

    q = np.full(64, 64, np.int32)
    q[0] = 8
    yp = _smooth_plane((24, 16), 21)
    cbp = _smooth_plane((24, 16), 22)
    crp = _smooth_plane((24, 16), 23)
    blob, ref = _jpeg_color_bytes(yp, cbp, crp, 1, 1, q, q)
    got = decode_jpeg(blob)
    assert got.shape == (24, 16, 3)
    assert (got == ref).all()


def test_jpeg_color_error_paths_and_gray_wrapper():
    import numpy as np
    import pytest

    from lens_warehouse_spark.llm.multimodal import (
        decode_jpeg,
        decode_jpeg_gray,
    )

    q = np.full(64, 64, np.int32)
    blob, _ = _jpeg_color_bytes(
        _smooth_plane((16, 16), 1),
        _smooth_plane((8, 8), 2),
        _smooth_plane((8, 8), 3),
        2,
        2,
        q,
        q,
    )
    # the gray surface must refuse color, not mis-decode it
    with pytest.raises(ValueError, match="color"):
        decode_jpeg_gray(blob)
    # 4-component (CMYK-shaped) SOF: honest NotImplementedError
    i = blob.index(b"\xff\xc0")
    cmyk = bytearray(blob)
    cmyk[i + 9] = 4  # ncomp byte inside SOF
    with pytest.raises(NotImplementedError, match="component"):
        decode_jpeg(bytes(cmyk))
    # truncated color scan
    with pytest.raises(ValueError):
        decode_jpeg(blob[:-10] + b"\xff\xd9")


def test_jpeg_color_oracle_space_half_free():
    """The l8o oracle relies on SQL round() (half away from zero) and
    the decoder on floor(x+0.5) (half up) agreeing — true iff no value
    in the synthesizer's parameter space lands exactly on .5. Verify
    exhaustively: d in 8..15, c/r in {0, 8..15}, Y in {128, 128+2d}."""
    for d in range(8, 16):
        for c in [0, *range(8, 16)]:
            for r in [0, *range(8, 16)]:
                for yv in (128, 128 + 2 * d):
                    for v in (
                        yv + 2.804 * r,
                        yv - 0.688272 * c - 1.428272 * r,
                        yv + 3.544 * c,
                    ):
                        assert abs((v % 1) - 0.5) > 1e-9, (d, c, r, yv, v)
                        assert 0 < v < 255  # clip never fires either


# --------------------------------------------------------------------------
# l8p: real FLAC decode (r9). Test-side REAL encoder: FIXED and LPC
# prediction with genuine Rice-coded residual partitions, raw-escape
# partitions, wasted bits, all three stereo decorrelation modes, and
# spec CRC-8/CRC-16 — every path the SQL synthesizer's byte-aligned
# VERBATIM construction never produces.
# --------------------------------------------------------------------------
class _FlacWriter:
    def __init__(self):
        self.bits = []

    def wb(self, v, n):  # n bits MSB-first, unsigned
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ws(self, v, n):  # signed two's complement
        self.wb(v & ((1 << n) - 1), n)

    def unary(self, q):  # q zeros then a 1 (FLAC unary)
        self.bits.extend([0] * q)
        self.bits.append(1)

    def rice(self, v, p):
        u = (v << 1) ^ (-1 if v < 0 else 0)  # zigzag
        self.unary(u >> p)
        if p:
            self.wb(u & ((1 << p) - 1), p)

    def to_bytes(self):
        while len(self.bits) % 8:
            self.bits.append(0)  # frame zero-padding to alignment
        return bytes(
            sum(b << (7 - i) for i, b in enumerate(self.bits[j : j + 8]))
            for j in range(0, len(self.bits), 8)
        )


def _flac_residuals(samples, order, kind):
    coefs = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}[order]
    out = []
    for i in range(order, len(samples)):
        pred = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
        out.append(int(samples[i]) - pred)
    return out


def _flac_write_subframe(w, samples, bps, plan):
    """plan: ('constant',) | ('verbatim',) | ('fixed', order, porder,
    params) | ('lpc', coefs, shift, prec, porder, params) |
    ('fixed_escape', order, rawbits) | ('wasted', k, inner_plan)."""
    samples = [int(s) for s in samples]
    if plan[0] == "wasted":
        k, inner = plan[1], plan[2]
        assert all(s % (1 << k) == 0 for s in samples)
        w.wb(0, 1)
        t = {"constant": 0, "verbatim": 1}[inner]
        w.wb(t, 6)
        w.wb(1, 1)  # wasted flag
        w.unary(k - 1)
        shifted = [s >> k for s in samples]
        if inner == "constant":
            w.ws(shifted[0], bps - k)
        else:
            for s in shifted:
                w.ws(s, bps - k)
        return
    w.wb(0, 1)
    if plan[0] == "constant":
        w.wb(0, 6)
        w.wb(0, 1)
        w.ws(samples[0], bps)
        return
    if plan[0] == "verbatim":
        w.wb(1, 6)
        w.wb(0, 1)
        for s in samples:
            w.ws(s, bps)
        return
    if plan[0] in ("fixed", "fixed_escape"):
        order = plan[1]
        w.wb(8 + order, 6)
        w.wb(0, 1)
        for s in samples[:order]:
            w.ws(s, bps)
        res = _flac_residuals(samples, order, "fixed")
        if plan[0] == "fixed_escape":
            rawbits = plan[2]
            w.wb(0, 2)  # method 0: 4-bit params
            w.wb(0, 4)  # one partition
            w.wb(0xF, 4)  # escape
            w.wb(rawbits, 5)
            for v in res:
                w.ws(v, rawbits)
            return
        porder, params = plan[2], plan[3]
    else:  # lpc
        coefs, shift, prec, porder, params = plan[1:]
        order = len(coefs)
        w.wb(31 + order, 6)
        w.wb(0, 1)
        for s in samples[:order]:
            w.ws(s, bps)
        w.wb(prec - 1, 4)
        w.ws(shift, 5)
        for c in coefs:
            w.ws(c, prec)
        res = []
        for i in range(order, len(samples)):
            pred = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs)) >> shift
            res.append(samples[i] - pred)
    w.wb(0, 2)  # method 0: 4-bit rice params
    w.wb(porder, 4)
    n = len(samples)
    ri = 0
    for p in range(1 << porder):
        cnt = (n >> porder) - (order if p == 0 else 0)
        w.wb(params[p], 4)
        for _ in range(cnt):
            w.rice(res[ri], params[p])
            ri += 1
    assert ri == len(res)


def _flac_bytes(chans, blocksize, frame_plans, bps=16, rate=44100):
    """chans: list of equal-length int arrays (len multiple of
    blocksize). frame_plans[f]: (channel_assignment, [subframe plans])
    with ca in {'indep','left_side','right_side','mid_side'}."""
    import struct

    from lens_warehouse_spark.llm.multimodal import _crc8, _crc16

    nch = len(chans)
    total = len(chans[0])
    out = b"fLaC"
    packed = (rate << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | total
    out += bytes([0x80]) + b"\x00\x00\x22"
    out += struct.pack(">HH", blocksize, blocksize) + b"\x00" * 6
    out += packed.to_bytes(8, "big") + b"\x00" * 16
    ca_code = {"indep": nch - 1, "left_side": 8, "right_side": 9, "mid_side": 10}
    for f in range(total // blocksize):
        ca, plans = frame_plans[f]
        sl = slice(f * blocksize, (f + 1) * blocksize)
        hdr = bytes([0xFF, 0xF8])
        # blocksize code 6 (8-bit value follows) pins that parse path
        hdr += bytes([(6 << 4) | 9, (ca_code[ca] << 4) | (4 << 1), f])
        hdr += bytes([blocksize - 1])
        hdr += bytes([_crc8(hdr)])
        w = _FlacWriter()
        L = [int(v) for v in chans[0][sl]]
        if nch == 2:
            R = [int(v) for v in chans[1][sl]]
        if ca == "indep":
            subs = [([int(v) for v in c[sl]], bps) for c in chans]
        elif ca == "left_side":
            subs = [(L, bps), ([a - b for a, b in zip(L, R)], bps + 1)]
        elif ca == "right_side":
            subs = [([a - b for a, b in zip(L, R)], bps + 1), (R, bps)]
        else:
            subs = [
                ([(a + b) >> 1 for a, b in zip(L, R)], bps),
                ([a - b for a, b in zip(L, R)], bps + 1),
            ]
        for (samples, sbps), plan in zip(subs, plans):
            _flac_write_subframe(w, samples, sbps, plan)
        body = hdr + w.to_bytes()
        out += body + _crc16(body).to_bytes(2, "big")
    return out


def _smooth_samples(n, seed, scale=400):
    import numpy as np

    rng = np.random.default_rng(seed)
    return np.cumsum(rng.integers(-scale, scale, n)).clip(-30000, 30000)


def test_flac_fixed_orders_roundtrip():
    import numpy as np

    from lens_warehouse_spark.llm.multimodal import decode_flac

    n, bsz = 320, 64
    s = _smooth_samples(n, 7)
    plans = [
        ("indep", [("fixed", 0, 0, [9])]),
        ("indep", [("fixed", 1, 1, [8, 9])]),
        ("indep", [("fixed", 2, 2, [7, 8, 9, 10])]),
        ("indep", [("fixed", 3, 0, [11])]),
        ("indep", [("fixed", 4, 1, [12, 12])]),
    ]
    rate, nch, got = decode_flac(_flac_bytes([s], bsz, plans))
    assert (rate, nch) == (44100, 1)
    assert got.shape == (n, 1)
    assert (got[:, 0] == s).all()


def test_flac_stereo_decorrelation_roundtrip():
    import numpy as np

    from lens_warehouse_spark.llm.multimodal import decode_flac

    n, bsz = 192, 64
    left = _smooth_samples(n, 21)
    right = left + _smooth_samples(n, 22, scale=40)  # correlated
    plans = [
        ("left_side", [("fixed", 2, 1, [6, 7]), ("fixed", 1, 0, [5])]),
        ("right_side", [("fixed", 1, 0, [5]), ("fixed", 2, 0, [7])]),
        ("mid_side", [("fixed", 2, 0, [7]), ("verbatim",)]),
    ]
    rate, nch, got = decode_flac(_flac_bytes([left, right], bsz, plans))
    assert nch == 2
    assert (got[:, 0] == left).all() and (got[:, 1] == right).all()


def test_flac_lpc_constant_escape_wasted_roundtrip():
    import numpy as np

    from lens_warehouse_spark.llm.multimodal import decode_flac

    n, bsz = 256, 64
    s = _smooth_samples(n, 31)
    s[:bsz] = 1234  # frame 0: constant
    s[bsz : 2 * bsz] = (s[bsz : 2 * bsz] // 4) * 4  # frame 1: 2 wasted bits
    plans = [
        ("indep", [("constant",)]),
        ("indep", [("wasted", 2, "verbatim")]),
        ("indep", [("lpc", [3, -1], 1, 6, 1, [9, 10])]),
        ("indep", [("fixed_escape", 2, 14)]),
    ]
    rate, nch, got = decode_flac(_flac_bytes([s], bsz, plans))
    assert (got[:, 0] == s).all()


def test_flac_crc_and_error_paths():
    import pytest

    from lens_warehouse_spark.llm.multimodal import decode_flac

    s = _smooth_samples(64, 41)
    blob = _flac_bytes([s], 64, [("indep", [("fixed", 2, 0, [8])])])
    with pytest.raises(ValueError, match="fLaC"):
        decode_flac(b"notflac")
    # corrupt one sample byte mid-frame: CRC-16 must catch it
    bad = bytearray(blob)
    bad[-10] ^= 0x40
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(bad))
    # corrupt a frame-header byte: CRC-8 must catch it
    hdr_off = blob.index(b"\xff\xf8")
    bad = bytearray(blob)
    bad[hdr_off + 2] ^= 0x10
    with pytest.raises(ValueError, match="CRC-8|sync|reserved|blocksize"):
        decode_flac(bytes(bad))
    # truncated stream
    with pytest.raises(ValueError):
        decode_flac(blob[:-5])
    # r10 (ADVICE): stream cut right after a lone sync byte must be a
    # clean ValueError, not an IndexError from b[pos + 1]
    with pytest.raises(ValueError, match="truncated frame header"):
        decode_flac(blob[: hdr_off + 1])


def test_flac_residual_rejects_order_ge_blocksize_at_porder0():
    """r10 (ADVICE): the order-vs-blocksize check must hold at
    partition order 0 too — a malformed subframe with order >=
    blocksize raises ValueError instead of yielding too-few residuals
    and a ragged-channel numpy error downstream."""
    import pytest

    from lens_warehouse_spark.llm.multimodal import _flac_residual, _FlacBits

    # bits: method=00, porder=0000, then a Rice parameter — the check
    # fires before any residual is read
    r = _FlacBits(bytes([0b00000000, 0, 0]), 0)
    with pytest.raises(ValueError, match="partition order"):
        _flac_residual(r, order=4, blocksize=4)
    # boundary: blocksize == order + 1 is fine (one residual). Bits:
    # method(2)=0 porder(4)=0 param(4)=0, then unary residual '1' at
    # bit 10 -> quotient 0 -> residual value 0.
    r = _FlacBits(bytes([0b00000000, 0b00100000, 0]), 0)
    assert _flac_residual(r, order=3, blocksize=4) == [0]


def test_jpeg_dri_zero_interval_is_noop():
    """r10 (ADVICE): DRI with restart interval 0 (emitted by some
    encoders) needs no restart support and must decode; a nonzero
    interval still raises NotImplementedError."""
    import numpy as np
    import pytest

    from lens_warehouse_spark.llm.multimodal import decode_jpeg_gray

    y, x = np.indices((16, 24))
    px = ((y * 6 + x * 3) % 200 + 20).astype(np.uint8)
    q = np.full(64, 64, dtype=np.int32)  # coarse -> few distinct AC syms
    q[0] = 8
    blob, ref = _jpeg_bytes(px, q)

    def with_dri(interval):
        # inject FF DD 00 04 <interval:2> right after SOI
        return blob[:2] + bytes([0xFF, 0xDD, 0, 4]) + interval.to_bytes(2, "big") + blob[2:]

    assert (decode_jpeg_gray(with_dri(0)) == ref).all()
    with pytest.raises(NotImplementedError, match="restart"):
        decode_jpeg_gray(with_dri(8))


def test_png_adam7_interlace_roundtrip():
    """r9: Adam7-interlaced PNGs decode for real — seven independently
    filtered reduced images reassembled on their lattices. Gradient +
    noise content so any lattice mis-placement flips pixels; filters
    cycle so pass boundaries reset the Up/Paeth neighbor state."""
    import numpy as np

    from lens_warehouse_spark.llm.multimodal import decode_png

    rng = np.random.default_rng(23)
    for h, w, ch in [(13, 11, 3), (8, 8, 4), (1, 7, 3), (9, 1, 4), (3, 3, 3)]:
        px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        filters = [rng.integers(0, 5) for _ in range(h * 4)]
        blob = _encode_png(px, filters, interlace=True)
        got = decode_png(blob)
        assert got.shape == px.shape
        assert (got == px).all(), (h, w, ch)


def test_jpeg_16bit_quant_table():
    """r9: DQT precision 1 (16-bit entries) decodes; a DC quant of 300
    proves the wide value is actually used (an 8-bit truncation would
    read 44 and shift every pixel)."""
    import struct

    import numpy as np

    from lens_warehouse_spark.llm.multimodal import (
        _JPEG_ZIGZAG,
        decode_jpeg_gray,
    )

    q = np.full(64, 64, np.int32)
    q[0] = 300  # needs 16 bits; _jpeg_bytes emits DQT precision 1
    y, x = np.indices((8, 16))
    px = ((y * 9 + x * 4) % 180 + 40).astype(np.uint8)
    blob, ref = _jpeg_bytes(px, q)
    assert b"\xff\xdb" + struct.pack(">H", 131) + b"\x10" in blob
    assert (decode_jpeg_gray(blob) == ref).all()


# --------------------------------------------------------------------------
# Progressive JPEG (r9). Test-side REAL progressive encoder: spectral
# selection, successive approximation (DC/AC first scans at Al=1 plus
# refinement scans to Al=0), EOB-run accumulation across blocks, ZRL
# in both first and refinement scans, buffered correction bits — the
# libjpeg jcphuff grammar, emitted independently and decoded by the
# module's coefficient-accumulation engine.
# --------------------------------------------------------------------------
class _ProgBits:
    def __init__(self):
        self.bits = []

    def wb(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def val(self, v, size):  # magnitude-category extra bits
        if size:
            enc = v if v >= 0 else v + (1 << size) - 1
            self.wb(enc, size)

    def to_bytes(self):
        while len(self.bits) % 8:
            self.bits.append(1)
        raw = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = sum(b << (7 - j) for j, b in enumerate(self.bits[i : i + 8]))
            raw.append(byte)
            if byte == 0xFF:
                raw.append(0x00)
        return bytes(raw)


def _prog_tables():
    """Fixed 8-bit-code tables: DC cats 0..11, AC symbols as needed."""
    dc = {s: (8, s) for s in range(12)}
    return dc


def _prog_ac_table(symbols):
    """Canonical table over the symbol set: 1-bit code for the first,
    then the rest at ceil-width 8 (always decodable)."""
    symbols = list(dict.fromkeys(symbols))
    counts = [0] * 16
    counts[7] = len(symbols)  # all codes at length 8
    codes = _canonical_codes(counts, symbols)
    return counts, symbols, codes


def _jpeg_progressive_bytes(planes, samps, qids, qtables, h, w, scans):
    """Encode quantized-coefficient planes progressively.

    planes[ci]: int32 array (bh, bw, 64) of NATURAL-order quantized
    coefficients; samps[ci] = (hs, vs); qids[ci] -> qtables[qid] (64
    natural-order ints). scans: list of dicts {comps: [ci...], ss, se,
    ah, al}. Returns blob. Block grids must already be MCU-padded for
    interleaved DC scans."""
    import struct

    import numpy as np

    from lens_warehouse_spark.llm.multimodal import _JPEG_ZIGZAG, _crc8  # noqa: F401

    ncomp = len(planes)
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    zz = [
        np.stack(
            [pl.reshape(pl.shape[0], pl.shape[1], 64)[:, :, _JPEG_ZIGZAG][..., i]
             for i in range(64)],
            axis=-1,
        )
        for pl in planes
    ]
    # true block dims per component (non-interleaved AC rasters)
    bdims = []
    for hs, vs in samps:
        cw = (w * hs + hmax - 1) // hmax
        chh = (h * vs + vmax - 1) // vmax
        bdims.append(((chh + 7) // 8, (cw + 7) // 8))

    def cat_of(v):
        return int(abs(v)).bit_length()

    dc_codes = _prog_tables()
    segs = []  # (scan_header_bytes, entropy_bytes, ac_table_def|None)
    for sc in scans:
        cis, ss, se, ah, al = sc["comps"], sc["ss"], sc["se"], sc["ah"], sc["al"]
        wtr = _ProgBits()
        ac_def = None
        if ss == 0:
            if ah == 0:
                preds = {ci: 0 for ci in cis}

                def dc_first(ci, by, bx):
                    v = int(zz[ci][by, bx, 0]) >> al  # arithmetic shift
                    diff = v - preds[ci]
                    preds[ci] = v
                    c = cat_of(diff)
                    ln, code = dc_codes[c]
                    wtr.wb(code, ln)
                    wtr.val(diff, c)

                unit = dc_first
            else:

                def dc_refine(ci, by, bx):
                    wtr.wb((int(zz[ci][by, bx, 0]) >> al) & 1, 1)

                unit = dc_refine
            if len(cis) > 1:
                for my in range(mcuy):
                    for mx in range(mcux):
                        for ci in cis:
                            hs, vs = samps[ci]
                            for dy in range(vs):
                                for dx in range(hs):
                                    unit(ci, my * vs + dy, mx * hs + dx)
            else:
                ci = cis[0]
                bh, bw = bdims[ci]
                for by in range(bh):
                    for bx in range(bw):
                        unit(ci, by, bx)
        else:
            ci = cis[0]
            bh, bw = bdims[ci]
            events = []  # per scan: list of (sym, valbits) or deferred
            if ah == 0:
                # AC first at al: magnitude-shifted run/size + EOB runs
                eob_run = 0

                def flush_eob():
                    nonlocal eob_run
                    if eob_run:
                        nb = eob_run.bit_length() - 1
                        events.append(("sym", nb << 4))
                        if nb:
                            events.append(("raw", eob_run - (1 << nb), nb))
                        eob_run = 0

                for by in range(bh):
                    for bx in range(bw):
                        blk = zz[ci][by, bx]
                        run = 0
                        emitted = False
                        for k in range(ss, se + 1):
                            v = int(blk[k])
                            t = (abs(v) >> al) * (1 if v >= 0 else -1)
                            if t == 0:
                                run += 1
                                continue
                            flush_eob()
                            while run >= 16:
                                events.append(("sym", 0xF0))
                                run -= 16
                            s = cat_of(t)
                            events.append(("sym", (run << 4) | s))
                            events.append(("val", t, s))
                            run = 0
                            emitted = True
                        if run or not emitted:
                            eob_run += 1
                            if eob_run == 0x7FFF:
                                flush_eob()
                flush_eob()
            else:
                # AC refinement (libjpeg jcphuff): buffered correction
                # bits, runs count zero-history positions only
                eob_run = 0
                pending_bits = []

                def flush_eob():
                    nonlocal eob_run, pending_bits
                    if eob_run:
                        nb = eob_run.bit_length() - 1
                        events.append(("sym", nb << 4))
                        if nb:
                            events.append(("raw", eob_run - (1 << nb), nb))
                        events.extend(("raw", b, 1) for b in pending_bits)
                        pending_bits = []
                        eob_run = 0

                for by in range(bh):
                    for bx in range(bw):
                        blk = zz[ci][by, bx]
                        absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
                        signs = [1 if int(blk[k]) >= 0 else -1
                                 for k in range(ss, se + 1)]
                        # EOB position: after the last newly-significant
                        eobpos = 0
                        for i, t in enumerate(absv):
                            if t == 1:
                                eobpos = i + 1
                        run = 0
                        br = []
                        for i in range(eobpos):
                            t = absv[i]
                            if t == 0:
                                run += 1
                                continue
                            # emit ZRLs as soon as the pending zero run
                            # exceeds 15 — at ANY nonzero position,
                            # corrections included (the jcphuff rule:
                            # buffered bits must stay within the
                            # 16-zero window the decoder walks per ZRL)
                            while run >= 16:
                                flush_eob()
                                events.append(("sym", 0xF0))
                                events.extend(("raw", b, 1) for b in br)
                                br = []
                                run -= 16
                            if t > 1:  # history-nonzero: correction bit
                                br.append(t & 1)
                                continue
                            # newly significant
                            flush_eob()
                            events.append(("sym", (run << 4) | 1))
                            events.append(("raw", 1 if signs[i] > 0 else 0, 1))
                            events.extend(("raw", b, 1) for b in br)
                            br = []
                            run = 0
                        if run or br or eobpos <= len(absv) - 1:
                            # correction bits after the last new coef
                            tail = [absv[i] & 1
                                    for i in range(eobpos, len(absv))
                                    if absv[i] > 1]
                            eob_run += 1
                            pending_bits.extend(br + tail)
                            if eob_run == 0x7FFF:
                                flush_eob()
                flush_eob()
            # build a table over exactly the symbols used
            syms = [e[1] for e in events if e[0] == "sym"]
            counts, ranked, codes = _prog_ac_table(syms or [0x00])
            ac_def = (counts, ranked)
            for e in events:
                if e[0] == "sym":
                    ln, code = codes[e[1]]
                    wtr.wb(code, ln)
                elif e[0] == "val":
                    wtr.val(e[1], e[2])
                else:
                    wtr.wb(e[1], e[2])
        # SOS header
        hdr = bytes([len(cis)])
        for ci in cis:
            hdr += bytes([ci + 1, (0 << 4) | 0])  # DC/AC table id 0
        hdr += bytes([ss, se, (ah << 4) | al])
        segs.append((hdr, wtr.to_bytes(), ac_def))

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = b"\xff\xd8"
    for qid in sorted(set(qids)):
        zq = bytes(int(qtables[qid][ni]) for ni in _JPEG_ZIGZAG)
        out += seg(0xDB, bytes([qid]) + zq)
    # one fixed DC table (id 0): 12 cats at length 8
    out += seg(0xC4, b"\x00" + bytes([0] * 7 + [12] + [0] * 8) + bytes(range(12)))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hs, vs = samps[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, qids[ci]])
    out += seg(0xC2, sof)
    for hdr, body, ac_def in segs:
        if ac_def is not None:  # redefine AC table 0 before this scan
            counts, ranked = ac_def
            out += seg(0xC4, b"\x10" + bytes(counts) + bytes(ranked))
        out += seg(0xDA, hdr) + body
    out += b"\xff\xd9"
    return out


def _prog_ref_gray(coefs, q, h, w):
    """Dequant + IDCT reference for (bh, bw, 64) natural-order coefs."""
    import numpy as np

    from lens_warehouse_spark.llm.multimodal import _idct_matrix

    m = _idct_matrix()
    bh, bw = coefs.shape[:2]
    out = np.zeros((bh * 8, bw * 8), dtype=np.uint8)
    for by in range(bh):
        for bx in range(bw):
            s = (coefs[by, bx] * q).reshape(8, 8).astype(np.float64)
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                np.round(m @ s @ m.T + 128), 0, 255
            ).astype(np.uint8)
    return out[:h, :w]


_PROG_LADDER_GRAY = [
    dict(comps=[0], ss=0, se=0, ah=0, al=1),
    dict(comps=[0], ss=1, se=5, ah=0, al=1),
    dict(comps=[0], ss=6, se=63, ah=0, al=1),
    dict(comps=[0], ss=0, se=0, ah=1, al=0),
    dict(comps=[0], ss=1, se=5, ah=1, al=0),
    dict(comps=[0], ss=6, se=63, ah=1, al=0),
]


def test_jpeg_progressive_gray_roundtrip():
    """Full successive-approximation ladder over random sparse
    coefficients: DC+AC first scans at Al=1, refinement scans to Al=0.
    Decoded pixels must equal the dequant+IDCT of the exact
    coefficients — any mis-accumulated bit shifts a pixel."""
    import numpy as np

    from lens_warehouse_spark.llm.multimodal import decode_jpeg_gray

    rng = np.random.default_rng(3)
    bh, bw = 3, 4
    coefs = np.zeros((bh, bw, 64), dtype=np.int32)
    for by in range(bh):
        for bx in range(bw):
            coefs[by, bx, 0] = rng.integers(-60, 61)
            for k in rng.choice(np.arange(1, 64), size=6, replace=False):
                coefs[by, bx, k] = rng.integers(-6, 7)
    q = np.full(64, 16, dtype=np.int32)
    q[0] = 8
    h, w = bh * 8, bw * 8
    blob = _jpeg_progressive_bytes(
        [coefs], [(1, 1)], [0], {0: q}, h, w, _PROG_LADDER_GRAY
    )
    got = decode_jpeg_gray(blob)
    assert (got == _prog_ref_gray(coefs, q, h, w)).all()


def test_jpeg_progressive_color_420_roundtrip():
    import numpy as np

    from lens_warehouse_spark.llm.multimodal import (
        _ycbcr_to_rgb,
        decode_jpeg,
    )

    rng = np.random.default_rng(9)
    h, w = 16, 32  # 1x2 MCUs at 4:2:0
    yc = np.zeros((2, 4, 64), dtype=np.int32)
    cb = np.zeros((1, 2, 64), dtype=np.int32)
    cr = np.zeros((1, 2, 64), dtype=np.int32)
    for arr in (yc, cb, cr):
        bh, bw = arr.shape[:2]
        for by in range(bh):
            for bx in range(bw):
                arr[by, bx, 0] = rng.integers(-30, 31)
                for k in rng.choice(np.arange(1, 64), size=4, replace=False):
                    arr[by, bx, k] = rng.integers(-5, 6)
    qy = np.full(64, 16, dtype=np.int32)
    qy[0] = 8
    qc = np.full(64, 24, dtype=np.int32)
    qc[0] = 12
    scans = [
        dict(comps=[0, 1, 2], ss=0, se=0, ah=0, al=1),
        dict(comps=[0], ss=1, se=63, ah=0, al=1),
        dict(comps=[1], ss=1, se=63, ah=0, al=1),
        dict(comps=[2], ss=1, se=63, ah=0, al=1),
        dict(comps=[0, 1, 2], ss=0, se=0, ah=1, al=0),
        dict(comps=[0], ss=1, se=63, ah=1, al=0),
        dict(comps=[1], ss=1, se=63, ah=1, al=0),
        dict(comps=[2], ss=1, se=63, ah=1, al=0),
    ]
    blob = _jpeg_progressive_bytes(
        [yc, cb, cr], [(2, 2), (1, 1), (1, 1)], [0, 1, 1],
        {0: qy, 1: qc}, h, w, scans,
    )
    got = decode_jpeg(blob)
    yp = _prog_ref_gray(yc, qy, h, w)
    cbp = np.repeat(np.repeat(_prog_ref_gray(cb, qc, 8, 16), 2, 0), 2, 1)
    crp = np.repeat(np.repeat(_prog_ref_gray(cr, qc, 8, 16), 2, 0), 2, 1)
    assert (got == _ycbcr_to_rgb(yp, cbp, crp)).all()


def test_jpeg_progressive_zrl_and_eobrun_refinement():
    """Handcrafted stress for the refinement grammar: long zero runs
    (>16, forcing ZRL with buffered correction bits inside the window),
    history coefficients between runs, all-zero blocks folding into an
    EOB run spanning blocks, and a trailing-correction-only block."""
    import numpy as np

    from lens_warehouse_spark.llm.multimodal import decode_jpeg_gray

    coefs = np.zeros((1, 4, 64), dtype=np.int32)
    # block 0: history coef (|v|>1) at k=2, 20 zeros, new ±1 at k=30,
    # another new at k=62 after a long run
    coefs[0, 0, 0] = 10
    coefs[0, 0, 2] = 5
    coefs[0, 0, 30] = 1
    coefs[0, 0, 62] = -1
    # block 1: all zero (EOB run member)
    # block 2: only history coefs — correction-only block in refinement
    coefs[0, 2, 0] = -9
    coefs[0, 2, 5] = -4
    coefs[0, 2, 40] = 7
    # block 3: new coef at the very end of the band
    coefs[0, 3, 63] = 1
    q = np.full(64, 16, dtype=np.int32)
    q[0] = 8
    blob = _jpeg_progressive_bytes(
        [coefs], [(1, 1)], [0], {0: q}, 8, 32, _PROG_LADDER_GRAY
    )
    got = decode_jpeg_gray(blob)
    assert (got == _prog_ref_gray(coefs, q, 8, 32)).all()


@settings(max_examples=25, deadline=None)
@given(
    bw=st.integers(1, 4),
    bh=st.integers(1, 3),
    density=st.integers(1, 12),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_progressive_property(bw, bh, density, seed):
    import numpy as np

    from lens_warehouse_spark.llm.multimodal import decode_jpeg_gray

    rng = np.random.default_rng(seed)
    coefs = np.zeros((bh, bw, 64), dtype=np.int32)
    for by in range(bh):
        for bx in range(bw):
            coefs[by, bx, 0] = rng.integers(-100, 101)
            for k in rng.choice(np.arange(1, 64), size=density, replace=False):
                coefs[by, bx, k] = rng.integers(-9, 10)
    q = np.full(64, 16, dtype=np.int32)
    q[0] = 4
    h, w = bh * 8, bw * 8
    blob = _jpeg_progressive_bytes(
        [coefs], [(1, 1)], [0], {0: q}, h, w, _PROG_LADDER_GRAY
    )
    assert (decode_jpeg_gray(blob) == _prog_ref_gray(coefs, q, h, w)).all()


def test_sniff_flac():
    from lens_warehouse_spark.llm.multimodal import sniff_media

    s = _smooth_samples(64, 3)
    blob = _flac_bytes([s], 64, [("indep", [("verbatim",)])])
    assert sniff_media(blob) == ("flac", None, None)
    assert sniff_media(b"fLaX nope") == ("unknown", None, None)


def test_png_all_color_types_and_depths():
    """r9: gray / gray+alpha / 16-bit / palette PNGs decode for real,
    with filters cycling (16-bit filtering is bytewise with the left
    neighbor bpp bytes back — the spec subtlety a naive per-sample
    filter gets wrong), plus interlace combinations."""
    import numpy as np

    from lens_warehouse_spark.llm.multimodal import decode_png

    rng = np.random.default_rng(31)
    fl = [0, 1, 2, 3, 4, 1, 3, 4, 2, 0, 4, 3]
    gray = rng.integers(0, 256, (9, 7), dtype=np.uint8)
    got = decode_png(_encode_png(gray, fl))
    assert got.shape == (9, 7) and (got == gray).all()
    ga = rng.integers(0, 256, (6, 5, 2), dtype=np.uint8)
    assert (decode_png(_encode_png(ga, fl)) == ga).all()
    g16 = rng.integers(0, 65536, (7, 4), dtype=np.uint16)
    got = decode_png(_encode_png(g16, fl))
    assert got.dtype == np.uint16 and (got == g16).all()
    rgb16 = rng.integers(0, 65536, (5, 6, 3), dtype=np.uint16)
    assert (decode_png(_encode_png(rgb16, fl)) == rgb16).all()
    rgba16 = rng.integers(0, 65536, (4, 4, 4), dtype=np.uint16)
    assert (decode_png(_encode_png(rgba16, fl)) == rgba16).all()
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (8, 9), dtype=np.uint8)
    got = decode_png(_encode_png(idx, fl, palette=pal))
    assert got.shape == (8, 9, 3) and (got == pal[idx]).all()
    # interlaced variants of the new modes
    assert (decode_png(_encode_png(g16, fl, interlace=True)) == g16).all()
    got = decode_png(_encode_png(idx, fl, interlace=True, palette=pal))
    assert (got == pal[idx]).all()
    # palette index beyond a short PLTE: malformed, not a crash
    import pytest

    short = pal[:16]
    idx_hi = np.full((3, 3), 200, dtype=np.uint8)
    with pytest.raises(ValueError, match="palette index"):
        decode_png(_encode_png(idx_hi, palette=short))
    # sub-byte depths decode since r9 (test_png_sub_byte_depths); an
    # 8-bit stream RELABELED 4-bit is malformed (stride mismatch)
    blob = bytearray(_encode_png(gray))
    import struct
    import zlib

    ihdr = bytearray(blob[16:29])
    ihdr[8] = 4  # depth byte inside IHDR payload
    crc = zlib.crc32(b"IHDR" + bytes(ihdr))
    blob[16:29] = ihdr
    blob[29:33] = struct.pack(">I", crc)
    with pytest.raises(
        ValueError, match="length mismatch|filter type|inflates past"
    ):
        decode_png(bytes(blob))


def test_tiff_palette_roundtrip():
    import numpy as np

    from lens_warehouse_spark.llm.multimodal import decode_tiff

    rng = np.random.default_rng(37)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (10, 6), dtype=np.uint8)
    # the x257 colormap scaling makes >>8 the exact inverse
    got = decode_tiff(_tiff_bytes(idx, palette=pal))
    assert got.shape == (10, 6, 3) and (got == pal[idx]).all()
    # palette + compression together
    got = decode_tiff(
        _tiff_bytes(idx, palette=pal, compression=8, rows_per_strip=4)
    )
    assert (got == pal[idx]).all()
    # big-endian palette (out-of-line SHORT array, MM byte order)
    got = decode_tiff(_tiff_bytes(idx, palette=pal, big_endian=True))
    assert (got == pal[idx]).all()


@settings(max_examples=30, deadline=None)
@given(
    nframes=st.integers(1, 4),
    bsz=st.sampled_from([32, 64, 96]),
    stereo=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
    data=st.data(),
)
def test_flac_property_random_plans(nframes, bsz, stereo, seed, data):
    """Random samples through random per-frame subframe plans (all
    predictors, rice params, partitions, stereo modes) must round-trip
    exactly — FLAC is lossless by construction, so any bit slip is a
    decoder bug."""
    import numpy as np

    from lens_warehouse_spark.llm.multimodal import decode_flac

    rng = np.random.default_rng(seed)
    n = nframes * bsz
    left = np.cumsum(rng.integers(-300, 300, n)).clip(-30000, 30000)
    chans = [left]
    if stereo:
        chans.append(
            (left + np.cumsum(rng.integers(-50, 50, n))).clip(-30000, 30000)
        )

    def sub_plan():
        kind = data.draw(
            st.sampled_from(["constant", "verbatim", "fixed", "lpc", "escape"])
        )
        if kind == "constant":
            return ("verbatim",)  # random samples are rarely constant
        if kind == "verbatim":
            return ("verbatim",)
        if kind == "escape":
            return ("fixed_escape", data.draw(st.integers(0, 4)), 18)
        if kind == "lpc":
            return ("lpc", [2, -1], 1, 5,
                    data.draw(st.integers(0, 1)), [14, 14])
        order = data.draw(st.integers(0, 4))
        porder = data.draw(st.integers(0, 2))
        params = [data.draw(st.integers(4, 14)) for _ in range(1 << porder)]
        return ("fixed", order, porder, params)

    plans = []
    for _f in range(nframes):
        if stereo:
            ca = data.draw(
                st.sampled_from(["indep", "left_side", "right_side", "mid_side"])
            )
            plans.append((ca, [sub_plan(), sub_plan()]))
        else:
            plans.append(("indep", [sub_plan()]))
    rate, nch, got = decode_flac(_flac_bytes(chans, bsz, plans))
    assert nch == len(chans)
    for ci, c in enumerate(chans):
        assert (got[:, ci] == c).all()


def test_bmp_8bit_palette_roundtrip():
    """r9: paletted BMP decodes through the BGRA color table, bottom-up
    row order and 4-byte row padding included."""
    import struct

    import numpy as np

    from lens_warehouse_spark.llm.multimodal import decode_pixels

    rng = np.random.default_rng(41)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)  # RGB
    idx = rng.integers(0, 256, (6, 5), dtype=np.uint8)
    h, w = idx.shape
    stride = (w + 3) & ~3
    quads = np.zeros((256, 4), np.uint8)
    quads[:, :3] = pal[:, ::-1]  # BGR0 quads
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :w] = idx[::-1]  # bottom-up
    pix_off = 14 + 40 + 4 * 256
    blob = (
        b"BM"
        + struct.pack("<IHHI", pix_off + stride * h, 0, 0, pix_off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, stride * h,
                      2835, 2835, 256, 0)
        + quads.tobytes()
        + rows.tobytes()
    )
    got = decode_pixels(blob)
    assert got.shape == (h, w, 3)
    assert (got == pal[idx]).all()


def test_decode_pixels_routes_all_codecs():
    """r9: the generic pixel entry decodes every module codec — GIF,
    gray and color JPEG, TIFF — not just PPM/BMP/PNG."""
    import numpy as np

    from lens_warehouse_spark.llm.multimodal import decode_pixels

    rng = np.random.default_rng(43)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (5, 7), dtype=np.uint8)
    assert (decode_pixels(_gif_bytes(idx, pal)) == pal[idx]).all()
    gray = rng.integers(0, 256, (9, 4), dtype=np.uint8)
    assert (decode_pixels(_tiff_bytes(gray)) == np.stack([gray] * 3, -1)).all()
    q = np.full(64, 64, np.int32)
    q[0] = 8
    blob, ref = _jpeg_bytes(
        ((np.indices((8, 16)).sum(0) * 7) % 200 + 20).astype(np.uint8), q
    )
    assert (decode_pixels(blob) == np.stack([ref] * 3, -1)).all()
    qc = np.full(64, 96, np.int32)
    qc[0] = 16
    cblob, cref = _jpeg_color_bytes(
        _smooth_plane((16, 16), 1), _smooth_plane((8, 8), 2),
        _smooth_plane((8, 8), 3), 2, 2, q, qc,
    )
    assert (decode_pixels(cblob) == cref).all()
    # 16-bit PNG: high-byte preview on this 3-channel path
    g16 = rng.integers(0, 65536, (4, 5), dtype=np.uint16)
    got = decode_pixels(_encode_png(g16))
    assert (got == np.stack([(g16 >> 8).astype(np.uint8)] * 3, -1)).all()


def test_wav_sample_widths():
    """r9: 8-bit unsigned, 24-bit packed, 32-bit int and 32-bit float
    PCM WAVs decode exactly; compressed encodings still raise."""
    import struct

    import numpy as np
    import pytest

    from lens_warehouse_spark.llm.multimodal import decode_audio

    def wav(fmt_code, bits, payload, ch=1, rate=8000):
        ba = ch * bits // 8
        fmt = struct.pack("<HHIIHH", fmt_code, ch, rate, rate * ba, ba, bits)
        out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload))
        out += b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        out += b"data" + struct.pack("<I", len(payload)) + payload
        if len(payload) % 2:
            out += b"\x00"
        return out

    rng = np.random.default_rng(47)
    u8 = rng.integers(0, 256, 33, dtype=np.uint8)
    r, c, got = decode_audio(wav(1, 8, u8.tobytes()))
    assert (r, c) == (8000, 1) and got.dtype == np.uint8 and (got == u8).all()
    i24 = rng.integers(-(1 << 23), 1 << 23, 21).astype(np.int32)
    raw = b"".join(
        int(v & 0xFFFFFF).to_bytes(3, "little") for v in i24
    )
    _r, _c, got = decode_audio(wav(1, 24, raw))
    assert got.dtype == np.int32 and (got == i24).all()
    i32 = rng.integers(-(1 << 31), 1 << 31, 17).astype("<i4")
    _r, _c, got = decode_audio(wav(1, 32, i32.tobytes()))
    assert (got == i32).all()
    f32 = rng.random(19).astype("<f4") * 2 - 1
    _r, _c, got = decode_audio(wav(3, 32, f32.tobytes()))
    assert got.dtype == np.float32 and (got == f32).all()
    with pytest.raises(NotImplementedError):  # IMA ADPCM
        decode_audio(wav(17, 4, b"\x00" * 8))


def test_png_sub_byte_depths():
    """r9: 1/2/4-bit gray (scaled to 8-bit per the spec's v*255/(2^d-1))
    and sub-byte palette PNGs decode, filters applying to the PACKED
    bytes with a 1-byte left offset, interlaced included."""
    import numpy as np

    from lens_warehouse_spark.llm.multimodal import decode_png

    rng = np.random.default_rng(53)
    fl = [0, 1, 2, 3, 4, 2, 1, 4, 3, 0, 2, 4, 1]
    for depth in (1, 2, 4):
        hi = 1 << depth
        vals = rng.integers(0, hi, (11, 13), dtype=np.uint8)
        want = (vals.astype(np.uint16) * 255 // (hi - 1)).astype(np.uint8)
        got = decode_png(_encode_png(vals, fl, depth=depth))
        assert got.shape == (11, 13) and (got == want).all(), depth
        got = decode_png(_encode_png(vals, fl, depth=depth, interlace=True))
        assert (got == want).all(), ("interlace", depth)
        pal = rng.integers(0, 256, (hi, 3), dtype=np.uint8)
        got = decode_png(_encode_png(vals, fl, depth=depth, palette=pal))
        assert (got == pal[vals]).all(), ("palette", depth)
    # depth/color-type combination the spec forbids -> ValueError
    import pytest
    import struct
    import zlib

    rgb = rng.integers(0, 256, (3, 3, 3), dtype=np.uint8)
    blob = bytearray(_encode_png(rgb))
    ihdr = bytearray(blob[16:29])
    ihdr[8] = 4  # 4-bit truecolor: illegal
    blob[16:29] = ihdr
    blob[29:33] = struct.pack(">I", zlib.crc32(b"IHDR" + bytes(ihdr)))
    with pytest.raises(ValueError, match="depth/color-type"):
        decode_png(bytes(blob))


# ---------------------------------------------------------------------------
# r10 fuzz sweep (verdict #7): valid blobs of EVERY decodable format,
# mutated by truncation / bit flips / byte deletion / insertion /
# dimension-field maxing, must either decode or degrade to ValueError /
# NotImplementedError — and the dispatch layer (sniff_media,
# decode_image, dispatch_media) must never raise AT ALL, because one
# bit-rotted row in a 100 TB bucket must not kill the mapInPandas task
# hosting its batch. tools/fuzz_multimodal.py runs the same generator
# standalone (RLIMIT_AS + SIGALRM guarded) at much higher volume; the
# r10 clean run covered 253,500 cases after fixing the escapes it
# found (JPEG SOF/SOS/DHT truncation IndexErrors, DC-category int32
# overflows, allocate-before-validate on corrupt frame dimensions,
# TIFF cnt=0 tags, zlib.error leaks).
# ---------------------------------------------------------------------------
def build_fuzz_seeds() -> dict[str, bytes]:
    """One known-good blob per format family, built with this file's
    independent encoders (not the decoders' own inverses)."""
    import gzip

    import numpy as np

    from lens_warehouse_spark.llm.multimodal import encode_ppm

    rng = np.random.default_rng(0xF022)
    px = _pattern(9, 7)
    seeds: dict[str, bytes] = {"ppm": encode_ppm(px), "bmp": _bmp_bytes(px)}
    seeds["wav"] = _wav_bytes(list(range(-300, 300, 7)), extra_chunk=True)
    seeds["y4m"] = _y4m_bytes((np.arange(2 * 8 * 6).reshape(2, 8, 6) % 256))
    seeds["png"] = _encode_png(px, filters=[1, 2, 3, 4, 0, 1, 2, 3, 4])
    gif_idx = rng.integers(0, 256, (8, 6), dtype=np.uint8)
    gif_pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    seeds["gif"] = _gif_bytes(gif_idx, gif_pal, extension=True)
    q = np.full(64, 64, np.int32)
    q[0] = 8
    gray = ((np.indices((16, 24)).sum(0) * 5) % 200 + 20).astype(np.uint8)
    seeds["jpeg_gray"] = _jpeg_bytes(gray, q)[0]
    qc = np.full(64, 96, np.int32)
    qc[0] = 16
    seeds["jpeg_color"] = _jpeg_color_bytes(
        _smooth_plane((16, 32), 11),
        _smooth_plane((8, 16), 12),
        _smooth_plane((8, 16), 13),
        2, 2, q, qc,
    )[0]
    coefs = np.zeros((2, 3, 64), dtype=np.int32)
    coefs[..., 0] = rng.integers(-60, 61, (2, 3))
    coefs[..., 5] = rng.integers(-6, 7, (2, 3))
    seeds["jpeg_prog"] = _jpeg_progressive_bytes(
        [coefs], [(1, 1)], [0], {0: q}, 16, 24, _PROG_LADDER_GRAY
    )
    tgray = rng.integers(0, 256, (7, 5), dtype=np.uint8)
    seeds["tiff"] = _tiff_bytes(tgray, big_endian=True, rows_per_strip=3)
    seeds["tiff_lzw"] = _tiff_bytes(tgray, compression=5, predictor=2)
    s = _smooth_samples(320, 7)
    seeds["flac"] = _flac_bytes(
        [s], 64, [("indep", [("fixed", 2, 2, [7, 8, 9, 10])])] * 5
    )
    seeds["gzip"] = gzip.compress(b"the quick brown fox " * 40)
    # --- variant-path seeds (r10): reach the decoder branches the base
    # corpus doesn't — palette tables, interlace walks, sub-byte
    # unpacking, wide samples, stereo decorrelation, PackBits/deflate
    # strips. Each variant has a guard surface of its own to fuzz.
    idx = rng.integers(0, 256, (7, 6), dtype=np.uint8)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    seeds["png_pal"] = _encode_png(idx, palette=pal)
    seeds["png_adam7"] = _encode_png(px, interlace=True)
    seeds["png_g16"] = _encode_png(
        rng.integers(0, 65536, (6, 5), dtype=np.uint16)
    )
    seeds["png_sub"] = _encode_png(
        rng.integers(0, 4, (9, 11), dtype=np.uint8), depth=2
    )
    seeds["gif_ilace"] = _gif_bytes(
        idx, pal, interlace=True,
        local_palette=rng.integers(0, 256, (256, 3), dtype=np.uint8),
    )
    seeds["tiff_pal"] = _tiff_bytes(idx, palette=pal)
    seeds["tiff_pb"] = _tiff_bytes(tgray, compression=32773)
    seeds["tiff_rgbz"] = _tiff_bytes(
        rng.integers(0, 256, (6, 4, 3), dtype=np.uint8), compression=8
    )
    import struct as _st

    def _wav_wide(fmt_code, bits, payload):
        ba = bits // 8
        fmt = _st.pack("<HHIIHH", fmt_code, 1, 8000, 8000 * ba, ba, bits)
        out = b"RIFF" + _st.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload))
        out += b"WAVE" + b"fmt " + _st.pack("<I", len(fmt)) + fmt
        return out + b"data" + _st.pack("<I", len(payload)) + payload

    seeds["wav_f32"] = _wav_wide(
        3, 32, (rng.random(40).astype("<f4") * 2 - 1).tobytes()
    )
    seeds["wav_24"] = _wav_wide(
        1, 24,
        b"".join(
            int(v & 0xFFFFFF).to_bytes(3, "little")
            for v in rng.integers(-(1 << 23), 1 << 23, 30)
        ),
    )
    left = _smooth_samples(128, 3)
    seeds["flac_ms"] = _flac_bytes(
        [left, left + 7], 64,
        [("mid_side", [("fixed", 1, 0, [9]), ("fixed", 2, 1, [8, 9])])] * 2,
    )
    return seeds


def mutate_blob(rng, b: bytes) -> tuple[str, bytes]:
    """One random structural mutation of a valid blob."""
    import numpy as np

    ba = bytearray(b)
    n = len(ba)
    op = ("truncate", "flip", "delete", "insert", "window", "maxdims",
          "zero")[int(rng.integers(7))]
    if op == "truncate":
        return op, bytes(ba[: int(rng.integers(n))])
    if op == "flip":
        for _ in range(int(rng.integers(1, 9))):
            i = int(rng.integers(n))
            ba[i] ^= 1 << int(rng.integers(8))
    elif op == "delete":
        i = int(rng.integers(n))
        del ba[i : i + int(rng.integers(1, 5))]
    elif op == "insert":
        i = int(rng.integers(n + 1))
        ba[i:i] = rng.integers(0, 256, int(rng.integers(1, 5)), np.uint8).tobytes()
    elif op == "window":
        i = int(rng.integers(n))
        k = min(4, n - i)
        ba[i : i + k] = rng.integers(0, 256, k, np.uint8).tobytes()
    elif op == "maxdims":
        # 0xFF runs land on dimension/count fields often enough to probe
        # allocate-before-validate bugs (65535-ish widths, strip counts)
        i = int(rng.integers(n))
        k = min(int(rng.integers(2, 9)), n - i)
        ba[i : i + k] = b"\xff" * k
    elif op == "zero":
        i = int(rng.integers(n))
        k = min(8, n - i)
        ba[i : i + k] = b"\x00" * k
    return op, bytes(ba)


_FUZZ_SEED_CACHE: dict[str, bytes] = {}


@settings(max_examples=300, deadline=None)
@given(seed=st.integers(0, 2**32 - 1), data=st.data())
def test_fuzz_mutated_blobs_degrade(seed, data):
    import time

    import numpy as np

    from lens_warehouse_spark.llm.multimodal import (
        decode_audio,
        decode_flac,
        decode_gif,
        decode_jpeg,
        decode_jpeg_gray,
        decode_pixels,
        decode_png,
        decode_tiff,
        decode_y4m,
        dispatch_media,
        gunzip_stats,
    )

    if not _FUZZ_SEED_CACHE:
        _FUZZ_SEED_CACHE.update(build_fuzz_seeds())
    fmt = data.draw(st.sampled_from(sorted(_FUZZ_SEED_CACHE)))
    rng = np.random.default_rng(seed)
    op, blob = mutate_blob(rng, _FUZZ_SEED_CACHE[fmt])

    # the dispatch layer NEVER raises — garbage degrades to a row
    t0 = time.monotonic()
    assert isinstance(sniff_media(blob), tuple)
    got = dispatch_media(blob)
    assert isinstance(got, tuple) and len(got) == 3, (fmt, op)
    assert isinstance(decode_image(blob), tuple)
    assert isinstance(gunzip_stats(blob), tuple)  # s21's degrade layer

    # every decoder either returns or raises the two catchable types
    for fn in (decode_pixels, decode_audio, decode_y4m, decode_png,
               decode_gif, decode_jpeg, decode_jpeg_gray, decode_tiff,
               decode_flac):
        try:
            fn(blob)
        except (ValueError, NotImplementedError):
            pass
    # bounded: the whole battery on a small mutant stays well under a
    # second; a quadratic blowup or spin shows up here long before CI
    assert time.monotonic() - t0 < 5.0, (fmt, op)


def test_dispatch_media_routes_and_degrades():
    """Deterministic companion to the fuzz sweep: every VALID seed
    routes to its decoder (nonzero units for decodable formats), and
    two canonical corruption shapes degrade without raising."""
    from lens_warehouse_spark.llm.multimodal import dispatch_media

    seeds = _FUZZ_SEED_CACHE or build_fuzz_seeds()
    want_fmt = {
        "ppm": "ppm", "bmp": "bmp", "wav": "wav", "y4m": "y4m",
        "png": "png", "gif": "gif", "jpeg_gray": "jpeg",
        "jpeg_color": "jpeg", "jpeg_prog": "jpeg", "tiff": "tiff",
        "tiff_lzw": "tiff", "flac": "flac",
        "png_pal": "png", "png_adam7": "png", "png_g16": "png",
        "png_sub": "png", "gif_ilace": "gif", "tiff_pal": "tiff",
        "tiff_pb": "tiff", "tiff_rgbz": "tiff", "wav_f32": "wav",
        "wav_24": "wav", "flac_ms": "flac",
    }
    for key, fmt in want_fmt.items():
        got_fmt, n_units, _ = dispatch_media(seeds[key])
        assert got_fmt == fmt, (key, got_fmt)
        assert n_units > 0, (key, n_units)
    # gzip sniffs as unknown media (it's not a media container)
    assert dispatch_media(seeds["gzip"])[0] == "unknown"
    # sniffable magic + corrupt body -> ("corrupt", 0, 0), no raise
    assert dispatch_media(seeds["png"][:40]) == ("corrupt", 0, 0)
    assert dispatch_media(seeds["tiff"][:16]) == ("corrupt", 0, 0)
    assert dispatch_media(b"\x00\x01garbage") == ("unknown", 0, 0)
    # s21's per-member core: valid member -> exact stats; truncated,
    # trailer-flipped and non-gzip members degrade to (0, 0, None)
    from lens_warehouse_spark.llm.multimodal import gunzip_stats

    plain = b"the quick brown fox " * 40
    nb, nt, md = gunzip_stats(seeds["gzip"])
    assert (nb, nt) == (len(plain), len(plain.decode().split(" "))) and md
    assert gunzip_stats(seeds["gzip"][:25]) == (0, 0, None)
    bad = bytearray(seeds["gzip"])
    bad[-5] ^= 0xFF  # ISIZE trailer
    assert gunzip_stats(bytes(bad)) == (0, 0, None)
    assert gunzip_stats(b"not gzip at all") == (0, 0, None)


def test_png_bomb_guard_exact_implied_size():
    """r10: the pre-decompress plausibility bound must (a) reject an
    authored bomb — valid chunk CRCs, huge IHDR, tiny zstream — and
    (b) NEVER false-positive a legitimate file, even a maximally
    compressible large interlaced one (the exact per-pass implied size
    is what makes (b) hold; a 2x interlace fudge factor failed it)."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from lens_warehouse_spark.llm.multimodal import decode_png

    # (a) authored bomb: 30000x30000 8-bit gray (900 MB raw) over a
    # 1 KB zstream; CRCs are valid so only the bound can stop it
    ihdr = struct.pack(">IIBBBBB", 30000, 30000, 8, 0, 0, 0, 0)
    bomb = _png_container(ihdr, zlib.compress(b"\x00" * 1024))
    with pytest.raises(ValueError, match="implausible"):
        decode_png(bomb)

    # (b) legitimate worst case: large constant interlaced gray —
    # deflate ratio approaches its 1032:1 ceiling, implied size is in
    # the tens of MB, and the file must still decode
    big = np.zeros((2048, 2048), dtype=np.uint8)
    blob = _encode_png(big, interlace=True, level=9)
    got = decode_png(blob)
    assert got.shape == (2048, 2048) and not got.any()
    # same property non-interlaced
    got = decode_png(_encode_png(big, level=9))
    assert got.shape == (2048, 2048) and not got.any()


def test_decompression_bombs_degrade_not_inflate():
    """r10 review: output-capped decompression everywhere the expected
    size is known. Each authored bomb here would inflate 3-6 orders of
    magnitude past its file size if the decoder trusted the stream;
    instead the format layer raises ValueError (caught by
    dispatch_media) or, for gzip, gunzip_stats degrades."""
    import gzip
    import zlib

    import numpy as np

    from lens_warehouse_spark.llm.multimodal import (
        _tiff_lzw,
        gunzip_stats,
        lzw_decode,
    )

    # gzip bomb: a <2 MB VALID member holding >256 MiB of zeros must
    # degrade at the output cap, not inflate before failing
    member = gzip.compress(b"\x00" * ((256 << 20) + 64), 9)
    assert len(member) < (2 << 20)
    assert gunzip_stats(member) == (0, 0, None)  # over _S21_MAX_TEXT
    # and a small valid member still decodes exactly
    assert gunzip_stats(gzip.compress(b"ok ok"))[0] == 5

    # TIFF huge-dims/tiny-data: a deflate strip cannot legitimately
    # inflate past 1032:1, so a 8000x8000 header over a 100-byte strip
    # trips the implausibility pre-check (TIFF has no CRC to rely on)
    import struct

    big_hdr = bytearray(_tiff_bytes(np.zeros((4, 4), np.uint8), compression=8))
    # tag 256 (width) value field: II layout, first IFD entry at 10
    w_off = big_hdr.find(struct.pack("<HHI", 256, 3, 1))
    h_off = big_hdr.find(struct.pack("<HHI", 257, 3, 1))
    assert w_off > 0 and h_off > 0
    struct.pack_into("<I", big_hdr, w_off + 8, 8000)
    struct.pack_into("<I", big_hdr, h_off + 8, 8000)
    import pytest

    from lens_warehouse_spark.llm.multimodal import decode_tiff

    with pytest.raises(ValueError, match="implausible|short|overruns"):
        decode_tiff(bytes(big_hdr))

    # LZW bombs (GIF and TIFF flavors): a stream that would emit tens
    # of MB returns promptly once `limit` bytes exist — one in-flight
    # entry (<=4096 B) of overshoot at most
    enc = _lzw_encode(bytes(range(256)) * 4096, 8)
    out = lzw_decode(enc, 8, limit=1024)
    assert 1024 <= len(out) < 1024 + 4096
    tenc = _tiff_lzw_encode(b"\x00" * (1 << 20))
    tout = _tiff_lzw(tenc, limit=1024)
    assert 1024 <= len(tout) < 1024 + 4096


def test_tiff_lzw_high_ratio_strip_accepted():
    """Advisor r11: the strip plausibility pre-check applied deflate's
    1032:1 expansion ceiling to ALL codecs, so a LEGITIMATE
    high-ratio LZW TIFF (constant-gray 2048x2048 measures ~1050:1
    with the 12-bit/4094-entry table) was rejected as implausible and
    dispatch_media silently misclassified it as corrupt. Ceilings are
    per-codec now (deflate 1032, LZW 2730, PackBits 128,
    uncompressed 1)."""
    import numpy as np

    from lens_warehouse_spark.llm.multimodal import decode_tiff, dispatch_media

    px = np.full((2048, 2048), 77, np.uint8)
    blob = _tiff_bytes(px, compression=5)
    # precondition: the single strip really is past the old per-strip
    # 1032:1 bound (expected > 1032 * len(raw_strip) + 4096)
    strip = _tiff_lzw_encode(px.tobytes())
    assert px.size > 1032 * len(strip) + 4096
    got = decode_tiff(blob)
    assert got.shape == (2048, 2048) and (got == 77).all()
    assert dispatch_media(blob) == ("tiff", px.size, 77 * px.size)
    # the huge-dims/tiny-data direction still trips per-codec: an
    # uncompressed strip may never expand at all
    import struct

    hdr = bytearray(_tiff_bytes(np.zeros((4, 4), np.uint8), compression=1))
    w_off = hdr.find(struct.pack("<HHI", 256, 3, 1))
    h_off = hdr.find(struct.pack("<HHI", 257, 3, 1))
    struct.pack_into("<I", hdr, w_off + 8, 4000)
    struct.pack_into("<I", hdr, h_off + 8, 4000)
    import pytest

    with pytest.raises(ValueError, match="implausible|short|overruns"):
        decode_tiff(bytes(hdr))


def test_wav_float_nonfinite_degrades():
    """Advisor r11: an IEEE-float WAV (valid container) carrying
    NaN/Inf hit an undefined float->int64 cast in dispatch_media —
    RuntimeWarning plus platform-dependent INT64_MIN garbage in
    val_sum. Non-finite samples now degrade to corrupt; finite float
    WAVs keep summing exactly."""
    import struct
    import warnings

    import numpy as np

    from lens_warehouse_spark.llm.multimodal import dispatch_media

    def wav_f32(payload):
        fmt = struct.pack("<HHIIHH", 3, 1, 8000, 8000 * 4, 4, 32)
        out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload))
        out += b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        out += b"data" + struct.pack("<I", len(payload)) + payload
        return out

    bad = np.array([0.5, np.nan, 1.0, -np.inf], dtype="<f4")
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # the old path raised RuntimeWarning
        assert dispatch_media(wav_f32(bad.tobytes())) == ("corrupt", 0, 0)
        # r11 fuzz follow-up: FINITE floats beyond int64 range (1e30 is
        # a valid IEEE byte pattern) hit the same undefined cast — the
        # 2^31 plausibility bound degrades them too.
        huge = np.array([0.5, 1e30, -1.0], dtype="<f4")
        assert dispatch_media(wav_f32(huge.tobytes())) == ("corrupt", 0, 0)
    ok = np.array([1.25, -2.5, 3.0], dtype="<f4")
    # int64 cast truncates toward zero: 1 - 2 + 3
    assert dispatch_media(wav_f32(ok.tobytes())) == ("wav", 3, 2)


def test_absolute_decoded_size_caps(monkeypatch):
    """r11 bomb doctrine part 2: the r10 caps are RELATIVE (expansion
    ceiling x payload), so a large authored payload can still claim a
    multi-GB decode. One absolute bound (_MAX_DECODED_BYTES) now
    applies across TIFF/PNG/GIF/FLAC. Tested by shrinking the cap so
    small legitimate blobs trip it — same code path a real bomb hits —
    then restoring it to confirm the same blobs decode."""
    import numpy as np
    import pytest

    from lens_warehouse_spark.llm import multimodal as mm

    px = np.full((64, 64), 9, np.uint8)
    tiff = _tiff_bytes(px, compression=1)
    png = _encode_png(np.dstack([px] * 3))
    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    gif = _gif_bytes(px, pal)
    smp = np.zeros(4096, dtype=np.int64)
    flac = _flac_bytes([smp], 256, [("indep", [("constant",)])] * 16)

    # all decode fine under the real 256 MiB cap
    assert mm.decode_tiff(tiff).shape == (64, 64)
    assert mm.decode_png(png).shape == (64, 64, 3)
    assert mm.decode_gif(gif).shape == (64, 64, 3)  # palette-mapped RGB
    assert mm.decode_flac(flac)[2].shape[0] == 4096

    monkeypatch.setattr(mm, "_MAX_DECODED_BYTES", 2048)
    with pytest.raises(ValueError, match="exceeds cap"):
        mm.decode_tiff(tiff)
    with pytest.raises(ValueError, match="exceeds cap"):
        mm.decode_png(png)
    with pytest.raises(ValueError, match="exceeds cap"):
        mm.decode_gif(gif)
    with pytest.raises(ValueError, match="exceeds cap"):
        mm.decode_flac(flac)
    # dispatch degrades, never raises
    assert mm.dispatch_media(tiff) == ("corrupt", 0, 0)
