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
