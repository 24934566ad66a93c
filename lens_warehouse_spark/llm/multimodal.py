"""Multimodal column plumbing L8 (SURVEY.md §2.10).

Pattern: media as opaque ``binary`` payloads + typed metadata struct +
path pointer for blob offloading. At 100 TB the payload column lives in
parquet only for small assets; large assets stay in object storage and
the ``blob_path`` pointer column is what flows through the engine —
decode/feature-extract stages read bytes inside ``mapInPandas`` workers
so media bytes never pass through the driver.

The actual image/audio decode is STUBBED (``decode_image``) — the
container has no media libraries — but the Spark-side plumbing (schema,
Arrow batch shape, partitioning, generator-style mapInPandas) is real
and oracle-checked on deterministic byte-level features.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from lens_warehouse_spark.catalog import table
from lens_warehouse_spark.registry import register


def sniff_media(blob: bytes) -> tuple[str, int | None, int | None]:
    """Pure-Python magic-byte sniff: (format, width, height).

    No media libraries exist in this container, so instead of raising,
    the decode path does the part that needs no codec: recognize the
    container from its magic bytes and parse dimensions out of the
    header with ``struct`` — PNG (IHDR), GIF (logical screen), BMP
    (BITMAPINFOHEADER), JPEG (SOF segment walk), plus WAV/OGG/PDF
    detection without dimensions. Unknown formats return
    ``("unknown", None, None)`` rather than raising: a 100 TB corpus
    always contains garbage rows, and a decode stage that throws on
    them kills the whole task.
    """
    import struct

    b = bytes(blob)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        w, h = struct.unpack(">II", b[16:24])
        return ("png", w, h)
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return ("gif", w, h)
    if b[:2] == b"BM" and len(b) >= 22:
        # Validate the DIB header size at offset 14 before trusting the
        # dimension fields: a text blob starting "BM..." (prose like
        # "BMW") is NOT a bitmap, and the OS/2 BITMAPCOREHEADER (size
        # 12) stores 16-bit dimensions where the INFOHEADER stores
        # 32-bit ones — unpacking '<ii' unconditionally returned
        # width | (height << 16) garbage for valid core-header files.
        dib = struct.unpack("<I", b[14:18])[0]
        if dib == 12:
            w16, h16 = struct.unpack("<HH", b[18:22])
            return ("bmp", w16, h16)
        if dib in (40, 52, 56, 64, 108, 124) and len(b) >= 26:
            w, h = struct.unpack("<ii", b[18:26])
            return ("bmp", w, abs(h))
        return ("unknown", None, None)
    if b[:3] == b"\xff\xd8\xff":
        # JPEG: walk segments to a start-of-frame (SOF0..SOF15 except
        # DHT/DAC/RST markers) and read height/width from it.
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker == 0xFF:
                # spec-legal 0xFF fill byte before a marker: advance ONE
                # byte, or the real marker after it is consumed as a
                # segment length and the walk jumps past the SOF
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker in (0xD9, 0xDA):
                # EOI / start-of-scan: entropy-coded data follows; its
                # bytes are not segment headers, and walking them can
                # match a fake SOF with garbage dimensions. SOF always
                # precedes SOS, so stop here.
                break
            seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
            if seg_len < 2:
                break  # corrupt length field; would loop forever
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return ("jpeg", w, h)
            i += 2 + seg_len
        return ("jpeg", None, None)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return ("wav", None, None)
    if b[:4] == b"OggS":
        return ("ogg", None, None)
    if b[:5] == b"%PDF-":
        return ("pdf", None, None)
    return ("unknown", None, None)


def decode_image(blob: bytes) -> tuple[str, int | None, int | None]:
    """Decode an image payload as far as this container allows.

    Real deployments: ``PIL.Image.open(io.BytesIO(blob))`` for pixel
    access; here the pure-Python header sniff supplies format and
    dimensions so decode-dependent stages execute instead of raising
    (pixel-level transforms remain stubbed — see ``resize_image``).
    """
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]

        img = Image.open(io.BytesIO(bytes(blob)))
        return (img.format.lower() if img.format else "unknown", *img.size)
    except Exception:
        # Not just ImportError: the pipeline deliberately feeds non-image
        # and truncated header-only blobs through this stage, and a real
        # PIL raises UnidentifiedImageError/OSError/ValueError on those —
        # which would kill the whole mapInPandas task. The pure-Python
        # sniff is the safety net in EVERY environment.
        return sniff_media(blob)


def multimodal_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the multimodal table shape from ``documents``: binary
    payload (utf-8 bytes standing in for media bytes), metadata struct,
    and a blob-path pointer."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("blob").cast(BinaryType()),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("n_chars").cast("int").alias("n_bytes_meta"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
        F.concat(F.lit("blob://store/"), F.col("doc_id").cast("string")).alias(
            "blob_path"
        ),
    )


# ---------------------------------------------------------------------------
# L8: byte-level feature extraction over Arrow batches (mapInPandas).
# Deterministic features -> full SQL oracle despite the Python stage.
# ---------------------------------------------------------------------------
@register(
    "l8_multimodal_features",
    oracle="""
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS byte_len,  -- strlen = utf-8 BYTES, matching len(blob)
       md5(text) AS blob_md5,
       'text/plain' AS mime
FROM documents
""",
)
def l8_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    import pandas as pd

    mm = multimodal_frame(spark, sf_dir)
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("byte_len", LongType()),
            StructField("blob_md5", StringType()),
            StructField("mime", StringType()),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": pdf["blob"].map(len).astype("int64"),
                    "blob_md5": pdf["blob"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "mime": pdf["meta"].map(lambda m: m["mime"]),
                }
            )

    return mm.mapInPandas(extract, out_schema)


# ---------------------------------------------------------------------------
# L8b: frame sampling — a 1:N generator stage (video -> frames shape).
# Deterministic fake frame count (doc_id % 5) keeps it oracle-able.
# ---------------------------------------------------------------------------
@register(
    "l8b_frame_sample",
    oracle="""
SELECT doc_id, CAST(unnest(range(CAST(doc_id % 5 AS INT))) AS INT) AS frame_idx
FROM documents
WHERE doc_id % 5 > 0
""",
)
def l8b_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    mm = multimodal_frame(spark, sf_dir).select("doc_id", "blob_path")
    out_schema = StructType(
        [StructField("doc_id", LongType()), StructField("frame_idx", IntegerType())]
    )

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Real pipeline: fetch blob_path, decode container, sample frames.
        for pdf in batches:
            ids, idxs = [], []
            for doc_id in pdf["doc_id"]:
                for i in range(int(doc_id) % 5):
                    ids.append(int(doc_id))
                    idxs.append(i)
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "frame_idx": pd.Series(idxs, dtype="int32")})

    return mm.mapInPandas(sample_frames, out_schema)


# ---------------------------------------------------------------------------
# L8d: frame-hash dedup — per-frame content hashes (sha inside the
# mapInPandas worker, bytes never reach the driver), then the standard
# hash-groupBy dedup over (frame_hash). Finds identical frames ACROSS
# videos — the multimodal analog of L1 exact text dedup. The fake frame
# payload is blob-prefix + frame index, deterministic -> full oracle.
# ---------------------------------------------------------------------------
@register(
    "l8d_frame_hash_dedup",
    oracle="""
WITH frames AS (
  SELECT doc_id,
         CAST(unnest(range(CAST(doc_id % 5 AS INT))) AS INT) AS frame_idx
  FROM documents WHERE doc_id % 5 > 0
), hashed AS (
  SELECT f.doc_id, f.frame_idx,
         md5(substring(d.text, 1, 32) || '#' || CAST(f.frame_idx AS VARCHAR))
           AS frame_hash
  FROM frames f JOIN documents d ON d.doc_id = f.doc_id
)
SELECT frame_hash,
       count(*) AS n_copies,
       CAST(min(doc_id) AS BIGINT) AS keep_doc_id
FROM hashed
GROUP BY frame_hash
HAVING count(*) > 1
ORDER BY frame_hash
""",
)
def l8d_frame_hash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    import pandas as pd

    mm = multimodal_frame(spark, sf_dir).select("doc_id", "blob")
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_hash", StringType()),
        ]
    )

    def hash_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Real pipeline: decode container, extract frame bytes, hash them.
        # Deterministic fake frame payload: first 32 payload bytes + index.
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                # First 32 CHARACTERS, not bytes: the oracle hashes
                # substring(text, 1, 32), and a multi-byte char
                # straddling byte 32 would change the hashed prefix.
                # The blob is utf-8 text by construction (multimodal_frame).
                head = bytes(blob).decode("utf-8")[:32].encode("utf-8")
                for i in range(int(doc_id) % 5):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    hashes.append(
                        hashlib.md5(head + b"#" + str(i).encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_hash": pd.Series(hashes, dtype="object"),
                }
            )

    return (
        mm.mapInPandas(hash_frames, out_schema)
        .groupBy("frame_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("n_copies") > 1)
        .orderBy("frame_hash")
    )


# ---------------------------------------------------------------------------
# L8e: blob-manifest pointer join — the engine-side table carries only
# blob_path pointers; asset facts (size, store node, checksum) live in an
# external manifest keyed by path. At 100 TB both sides are large, so
# this is a plain hash join on the pointer (bucketable by path in real
# deployments); no broadcast assumption. Manifest is synthesized
# deterministically here, standing in for an object-store listing.
# ---------------------------------------------------------------------------
@register(
    "l8e_blob_manifest_join",
    oracle="""
WITH manifest AS (
  SELECT concat('blob://store/', CAST(doc_id AS VARCHAR)) AS blob_path,
         CAST(doc_id % 16 AS INT) AS store_node,
         CAST(strlen(text) AS BIGINT) AS asset_bytes  -- utf-8 bytes, matching the blob
  FROM documents
)
SELECT d.doc_id, m.store_node, m.asset_bytes,
       CAST(d.n_chars AS BIGINT) AS n_chars
FROM (
  SELECT doc_id, n_chars,
         concat('blob://store/', CAST(doc_id AS VARCHAR)) AS blob_path
  FROM documents
) d
JOIN manifest m ON m.blob_path = d.blob_path
WHERE m.asset_bytes > 512
""",
)
def l8e_blob_manifest_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    manifest = docs.select(
        F.concat(F.lit("blob://store/"), F.col("doc_id").cast("string")).alias(
            "m_path"
        ),
        (F.col("doc_id") % 16).cast("int").alias("store_node"),
        F.octet_length("text").cast("long").alias("asset_bytes"),
    )
    side = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.concat(F.lit("blob://store/"), F.col("doc_id").cast("string")).alias(
            "blob_path"
        ),
    )
    return (
        side.join(manifest, side.blob_path == manifest.m_path)
        .filter(F.col("asset_bytes") > 512)
        .select("doc_id", "store_node", "asset_bytes", "n_chars")
    )


# ---------------------------------------------------------------------------
# L8f: media header decode — the sniff path executing for real. Each
# row synthesizes a VALID format header (PNG IHDR / GIF screen / BMP
# DIB / JPEG SOF0 walk) with dimensions derived from doc_id, and the
# mapInPandas stage parses them back out with decode_image's
# pure-Python sniffer; every 5th row carries raw text bytes and must
# come back 'unknown' instead of killing the task. The oracle recomputes
# the expected (fmt, width, height) from the same doc_id arithmetic.
# ---------------------------------------------------------------------------
def _synth_media_blob(doc_id: int, text: str) -> bytes:
    import struct

    w = doc_id % 640 + 1
    h = doc_id % 480 + 1
    kind = doc_id % 5
    if kind == 0:
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13)
            + b"IHDR"
            + struct.pack(">II", w, h)
        )
    if kind == 1:
        return b"GIF89a" + struct.pack("<HH", w, h)
    if kind == 2:
        # valid BITMAPINFOHEADER size (40) at offset 14 — the sniffer
        # validates the DIB header size, so an all-zero one would
        # (correctly) classify as unknown
        return (
            b"BM"
            + b"\x00" * 12
            + struct.pack("<I", 40)
            + struct.pack("<ii", w, h)
        )
    if kind == 3:
        return (
            b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
            + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
            + struct.pack(">HH", h, w) + b"\x03" + b"\x00" * 9
        )
    return text.encode("utf-8")


@register(
    "l8f_media_sniff",
    oracle="""
SELECT doc_id,
       CASE CAST(doc_id % 5 AS INT)
            WHEN 0 THEN 'png' WHEN 1 THEN 'gif' WHEN 2 THEN 'bmp'
            WHEN 3 THEN 'jpeg' ELSE 'unknown' END AS fmt,
       CASE WHEN doc_id % 5 <= 3 THEN CAST(doc_id % 640 + 1 AS INT) END AS width,
       CASE WHEN doc_id % 5 <= 3 THEN CAST(doc_id % 480 + 1 AS INT) END AS height
FROM documents
""",
)
def l8f_media_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("fmt", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def sniff_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                decode_image(_synth_media_blob(int(d), t))
                for d, t in zip(pdf["doc_id"], pdf["text"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "fmt": pd.Series([f for f, _, _ in decoded], dtype="object"),
                    "width": pd.Series([w for _, w, _ in decoded], dtype="Int32"),
                    "height": pd.Series([h for _, _, h in decoded], dtype="Int32"),
                }
            )

    return docs.mapInPandas(sniff_batch, out_schema)


def resize_image(blob: bytes, width: int, height: int) -> bytes:
    """Resize an image payload. STUB: no media libs in this container.

    Real deployments: PIL ``Image.open(...).resize((width, height))``;
    the mapInPandas batch plumbing below is already shaped for it.
    """
    raise NotImplementedError("media codecs unavailable in this environment")


# ---------------------------------------------------------------------------
# L8c: resize stage — 1:1 media transform over Arrow batches. The codec
# is stubbed with a deterministic byte-truncation fake, so the Spark
# plumbing (schema, batch shape, metadata rewrite) is fully oracle-checked.
# ---------------------------------------------------------------------------
@register(
    "l8c_resize",
    oracle="""
SELECT doc_id,
       64 AS target_w,
       64 AS target_h,
       CAST(least(strlen(text), 64 * 64) AS BIGINT) AS resized_bytes  -- utf-8 bytes
FROM documents
""",
)
def l8c_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    target_w, target_h = 64, 64
    mm = multimodal_frame(spark, sf_dir).select("doc_id", "blob")
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("target_w", IntegerType()),
            StructField("target_h", IntegerType()),
            StructField("resized_bytes", LongType()),
        ]
    )

    def resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cap = target_w * target_h
        for pdf in batches:
            # deterministic fake for the stubbed codec: truncate payload
            resized = pdf["blob"].map(lambda b: min(len(b), cap))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "target_w": pd.Series([target_w] * len(pdf), dtype="int32"),
                    "target_h": pd.Series([target_h] * len(pdf), dtype="int32"),
                    "resized_bytes": resized.astype("int64"),
                }
            )

    return mm.mapInPandas(resize_batch, out_schema)
