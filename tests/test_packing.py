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
