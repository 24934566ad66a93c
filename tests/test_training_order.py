"""Invariants for the training-order / budget-selection operators
(l26 epoch shuffle, l27 token-budget selection): the distributed
offset-based global ranks must form exact permutations / prefix sums —
any partition-boundary bug shows up as a gap or duplicate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lens_warehouse_spark.llm.curation import (
    _L27_BUDGET,
    l26_epoch_shuffle,
    l27_budget_select,
)

SF = "/root/testdata/sf0.001"


def test_epoch_shuffle_is_permutation(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = l26_epoch_shuffle(spark, SF).cache()
    n = docs.count()
    # bijection: every doc once, positions are exactly 1..n
    assert out.count() == n
    assert out.select("doc_id").distinct().count() == n
    mm = out.agg(
        F.min("epoch_pos").alias("lo"),
        F.max("epoch_pos").alias("hi"),
        F.countDistinct("epoch_pos").alias("k"),
    ).first()
    assert (mm.lo, mm.hi, mm.k) == (1, n, n)
    # deterministic across invocations
    again = {r.doc_id: r.epoch_pos for r in l26_epoch_shuffle(spark, SF).collect()}
    assert {r.doc_id: r.epoch_pos for r in out.collect()} == again


def test_budget_select_prefix_properties(spark):
    out = l27_budget_select(spark, SF).cache()
    rows = out.collect()
    assert len(rows) > 0
    # budget respected, and cum_tok is exactly the running sum in
    # quality-descending order (prefix-sum consistency across partitions)
    ordered = sorted(rows, key=lambda r: (-r.quality, r.doc_id))
    run = 0
    for r in ordered:
        run += r.n_tok
        assert r.cum_tok <= _L27_BUDGET
    assert run == ordered[-1].cum_tok
    # the greedy-cut (prefix) property is asserted exactly in
    # test_budget_select_cut_is_contiguous


def test_budget_select_cut_is_contiguous(spark):
    """The selected set must be a PREFIX of the quality-ordered corpus:
    no unselected doc may sort strictly before a selected one."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = F.split(F.col("text"), " ")
    allq = docs.select(
        "doc_id",
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias("q"),
    ).collect()
    order = [r.doc_id for r in sorted(allq, key=lambda r: (-r.q, r.doc_id))]
    sel = {r.doc_id for r in l27_budget_select(spark, SF).collect()}
    prefix = set(order[: len(sel)])
    assert sel == prefix
