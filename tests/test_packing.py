"""Sequence-packing invariants: every doc packed exactly once, no
sequence exceeds capacity, offsets are consistent, packing is efficient.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lens_warehouse_spark.llm.textstats import SEQ_CAPACITY, pack_documents

SF = "/root/testdata/sf0.001"


def test_packing_invariants(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    packed = pack_documents(docs).cache()

    # every document appears exactly once
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()

    # no sequence exceeds capacity
    fill = packed.groupBy("shard", "seq_id").agg(
        F.sum("n_tokens").alias("used"), F.count(F.lit(1)).alias("n_docs")
    )
    assert fill.filter(F.col("used") > SEQ_CAPACITY).count() == 0

    # offsets within a sequence are non-overlapping and within capacity
    bad_offsets = packed.filter(
        (F.col("offset") < 0) | (F.col("offset") + F.col("n_tokens") > SEQ_CAPACITY)
    )
    assert bad_offsets.count() == 0

    # packing efficiency: average fill of non-final bins is decent
    stats = fill.agg(F.avg("used").alias("avg_used")).collect()[0]
    assert stats.avg_used > SEQ_CAPACITY * 0.5


def _write_docs(spark, path, token_counts):
    rows = [
        (i, " ".join("w" for _ in range(n)))
        for i, n in enumerate(token_counts)
    ]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def test_certificate_half_full_boundary(spark, tmp_path):
    """r11 certified contract, adversarial boundary: the half-full
    theorem ("at most one sequence per shard is <= cap/2 full") is
    sharpest when docs are exactly cap/2 tokens — pairs fill bins to
    exactly cap, and a shard with an ODD count leaves exactly one bin
    at exactly cap/2, the theorem's equality case. Just-over-half docs
    (cap/2 + 1) force one-doc-per-bin packings where NO bin is <= half
    full. Both shapes must certify through the registered query."""
    from lens_warehouse_spark.registry import QUERIES, load_all

    load_all()
    cap = SEQ_CAPACITY
    cert_cols = ["capacity_ok", "contiguous_ok", "packed_once_ok", "halffull_ok"]

    d1 = str(tmp_path / "half")
    _write_docs(spark, d1, [cap // 2] * 33)  # odd count -> equality case
    pdf = QUERIES["l15_sequence_packing"](spark, d1).toPandas()
    assert len(pdf) == 33
    assert (pdf["n_tokens"] == cap // 2).all()
    for c in cert_cols:
        assert pdf[c].all(), c

    d2 = str(tmp_path / "overhalf")
    _write_docs(spark, d2, [cap // 2 + 1] * 17)  # one doc per bin
    pdf2 = QUERIES["l15_sequence_packing"](spark, d2).toPandas()
    assert len(pdf2) == 17
    for c in cert_cols:
        assert pdf2[c].all(), c

    d3 = str(tmp_path / "mixed")  # ragged mix incl. cap-truncated docs
    _write_docs(spark, d3, [1, 3, 7, 13, 64, 64, 65, 127, 128, 128, 200, 300])
    pdf3 = QUERIES["l15_sequence_packing"](spark, d3).toPandas()
    assert len(pdf3) == 12
    assert pdf3["n_tokens"].max() == cap  # >cap docs truncated to cap
    for c in cert_cols:
        assert pdf3[c].all(), c
