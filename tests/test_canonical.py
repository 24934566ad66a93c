"""Invariants for l33 canonical selection over near-dup clusters."""

from __future__ import annotations

from lens_warehouse_spark.catalog import table
from lens_warehouse_spark.registry import QUERIES
from tests.conftest import SF_SMOKE


def test_one_representative_per_cluster_and_total_coverage(spark):
    out = QUERIES["l33_canonical_selection"](spark, SF_SMOKE).collect()
    clusters = [r["cluster_id"] for r in out]
    assert len(clusters) == len(set(clusters))  # one keeper per cluster
    n_docs = table(spark, SF_SMOKE, "documents").count()
    # every document is accounted for: keepers + absorbed dups
    assert sum(r["n_dups_absorbed"] for r in out) + len(out) == n_docs


def test_representative_maximizes_quality_key(spark):
    out = QUERIES["l33_canonical_selection"](spark, SF_SMOKE)
    multi = [r for r in out.collect() if r["n_dups_absorbed"] > 0]
    if not multi:  # corpus may have no near-dup clusters at this SF
        return
    # keeper's tok_ratio must be >= every clustermate's (checked via the
    # component frame rebuilt the same way)
    from pyspark.sql import functions as F
    from lens_warehouse_spark.llm.dedup import (
        jaccard,
        lsh_candidate_pairs,
        minhash_signatures,
        neardup_components,
    )

    docs = table(spark, SF_SMOKE, "documents")
    sigs = minhash_signatures(docs).select("doc_id", "sig")
    pairs = (
        jaccard(lsh_candidate_pairs(sigs), docs)
        .filter(F.col("jaccard") >= 0.7)
        .select("doc_a", "doc_b")
    )
    comp = neardup_components(pairs, docs.select("doc_id"))
    toks = F.split("text", " ")
    q = docs.select(
        "doc_id",
        F.round(
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 6
        ).alias("tr"),
    )
    best = (
        comp.join(q, "doc_id")
        .groupBy("canonical_id")
        .agg(F.max("tr").alias("max_tr"))
        .collect()
    )
    best_by_cluster = {r["canonical_id"]: r["max_tr"] for r in best}
    for r in multi:
        assert r["tok_ratio"] == best_by_cluster[r["cluster_id"]]


def test_geohash_matches_reference_algorithm(spark):
    """g3's bit-arithmetic geohash == the canonical bisection algorithm
    on the textbook example (lat 42.605, lon -5.603 -> 'ezs42...')."""
    from lens_warehouse_spark.operators.graph import _geohash_sql

    got = spark.sql(
        "SELECT " + _geohash_sql("-5.60302734375", "42.60498046875", 8) + " AS gh"
    ).first()["gh"]
    assert got == "ezs42s00"
