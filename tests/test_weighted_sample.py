"""l39 weighted reservoir sampling (Efraimidis-Spirakis A-ES) —
exact invariants replacing the oracle (rows-only by design: the k-th
selection boundary compares ln() outputs, not oracle-safe across
engines)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from lens_warehouse_spark.llm.curation import (
    _L39_K,
    l39_weighted_sample,
    weighted_sample_keys,
)
from lens_warehouse_spark.catalog import table

SF = "/root/testdata/sf0.001"


def test_determinism_and_shape(spark):
    a = l39_weighted_sample(spark, SF).collect()
    b = l39_weighted_sample(spark, SF).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == min(_L39_K, table(spark, SF, "documents").count())
    assert len({r.doc_id for r in a}) == len(a)  # no replacement


def test_weight_scaling_invariance(spark):
    """A-ES selection is invariant under w -> c*w: ln(u)/(c*w) rescales
    every key by the same positive 1/c, preserving the order exactly."""
    docs = table(spark, SF, "documents").select(
        "doc_id", F.col("n_chars").alias("n_chars")
    )
    scaled = docs.select("doc_id", (F.col("n_chars") * 1000).alias("n_chars"))
    pick = lambda d: {  # noqa: E731
        r.doc_id
        for r in weighted_sample_keys(d)
        .orderBy(F.col("es_key").desc(), "doc_id")
        .limit(50)
        .collect()
    }
    assert pick(docs) == pick(scaled)


def test_monotone_dominance(spark):
    """Raising one SELECTED doc's weight keeps it selected: ln(u) < 0,
    so es_key = ln(u)/w strictly increases with w."""
    base = weighted_sample_keys(table(spark, SF, "documents"))
    top = base.orderBy(F.col("es_key").desc(), "doc_id").limit(50).collect()
    victim = top[25].doc_id
    docs = table(spark, SF, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") == victim, F.col("n_chars") * 10)
        .otherwise(F.col("n_chars"))
        .alias("n_chars"),
    )
    boosted = {
        r.doc_id
        for r in weighted_sample_keys(docs)
        .orderBy(F.col("es_key").desc(), "doc_id")
        .limit(50)
        .collect()
    }
    assert victim in boosted


def test_equal_weights_degenerates_to_uniform_topk(spark):
    """With all weights equal the A-ES order is the pure-u order — the
    deterministic uniform sample l11 uses, derived independently here."""
    docs = table(spark, SF, "documents").select(
        "doc_id", F.lit(7).alias("n_chars")
    )
    got = [
        r.doc_id
        for r in weighted_sample_keys(docs)
        .orderBy(F.col("es_key").desc(), "doc_id")
        .limit(20)
        .collect()
    ]
    rows = table(spark, SF, "documents").select("doc_id").collect()

    def u(doc_id: int) -> float:
        import hashlib

        m = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        return (m + 1) / float(1 << 60)

    want = [
        d for d, _ in sorted(
            ((r.doc_id, math.log(u(r.doc_id)) / 7.0) for r in rows),
            key=lambda t: (-t[1], t[0]),
        )[:20]
    ]
    assert got == want


def test_weight_bias_is_real(spark):
    """Selection probability rises with weight: the sampled docs' mean
    weight must exceed the corpus mean (deterministic given the seed)."""
    sample = l39_weighted_sample(spark, SF)
    mean_sel = sample.agg(F.avg("weight")).first()[0]
    mean_all = (
        table(spark, SF, "documents").agg(F.avg("n_chars")).first()[0]
    )
    assert mean_sel > mean_all


def test_nonpositive_weights_are_unsampleable(spark):
    """Weight 0 must not DIVIDE_BY_ZERO under ANSI mode, and negative
    weights must not invert the key order — both are filtered out
    before the es_key division (they are unsampleable by definition)."""
    docs = spark.createDataFrame(
        [(1, 100), (2, 0), (3, -5), (4, 50)], "doc_id long, n_chars long"
    )
    rows = weighted_sample_keys(docs).collect()
    assert {r.doc_id for r in rows} == {1, 4}
    assert all(math.isfinite(r.es_key) for r in rows)
