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
