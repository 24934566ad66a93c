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


def decode_image(blob: bytes) -> object:
    """Decode an image payload. STUB: no media libs in this container.

    Real deployments: ``PIL.Image.open(io.BytesIO(blob))`` here; the
    surrounding mapInPandas plumbing is already batch-correct.
    """
    raise NotImplementedError("media codecs unavailable in this environment")


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
       CAST(length(text) AS BIGINT) AS byte_len,
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
       CAST(least(length(text), 64 * 64) AS BIGINT) AS resized_bytes
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
