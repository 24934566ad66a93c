"""Property tests for the round-6 additions: l41 n-gram novelty,
l43 containment scoring, a26 two-sample KS statistic.

Exact values are pinned by the DuckDB oracles (tools/check_parity.py);
these tests pin the SEMANTIC invariants on planted data the synthetic
corpus cannot guarantee to exercise (exact duplicates, strict subsets,
identical distributions).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lens_warehouse_spark.llm.curation import ngram_novelty
from lens_warehouse_spark.llm.dedup import containment_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestNgramNovelty:
    def test_duplicate_doc_has_zero_novelty(self, spark):
        docs = _docs(
            spark,
            [
                (1, "a b c d e f"),
                (2, "a b c d e f"),  # exact duplicate, later id
                (3, "x y z w v u"),  # disjoint
            ],
        )
        out = {r["doc_id"]: r.asDict() for r in ngram_novelty(docs).collect()}
        assert out[2]["n_novel"] == 0 and out[2]["novelty"] == 0.0
        assert out[1]["novelty"] == 1.0
        assert out[3]["novelty"] == 1.0

    def test_novel_counts_partition_the_gram_universe(self, spark):
        # sum(n_novel) == corpus-wide distinct gram count: every gram
        # is "novel" in exactly one doc (its min-doc_id owner).
        docs = _docs(
            spark,
            [
                (1, "a b c d"),
                (2, "b c d e"),
                (3, "a b c d e"),
            ],
        )
        res = ngram_novelty(docs)
        total_novel = res.agg(F.sum("n_novel")).first()[0]
        universe = (
            docs.select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(split(text,' ')) - 2),"
                        " i -> concat_ws(' ', slice(split(text,' '), i, 3)))"
                    )
                ).alias("g")
            )
            .distinct()
            .count()
        )
        assert total_novel == universe

    def test_bounds_and_short_docs_absent(self, spark):
        docs = _docs(spark, [(1, "a b"), (2, "a b c d")])
        rows = ngram_novelty(docs).collect()
        ids = {r["doc_id"] for r in rows}
        assert ids == {2}  # <3 tokens emits no grams
        for r in rows:
            assert 0.0 <= r["novelty"] <= 1.0
            assert 0 <= r["n_novel"] <= r["n_distinct_grams"]


class TestContainmentPairs:
    def test_strict_subset_has_containment_one(self, spark):
        docs = _docs(
            spark,
            [
                (1, "a b c d e f g h i j"),
                (2, "a b c"),  # token set strictly inside doc 1's
                (3, "q r s t"),
            ],
        )
        rows = {(r["doc_a"], r["doc_b"]): r.asDict()
                for r in containment_pairs(docs).collect()}
        pair = rows[(1, 2)]
        # doc_b's set is inside doc_a's: containment of b in a is 1.0
        assert pair["cont_b_in_a"] == 1.0
        assert pair["cont_a_in_b"] == pytest.approx(0.3)
        assert pair["jaccard"] == pytest.approx(0.3)
        assert (1, 3) not in rows and (2, 3) not in rows

    def test_jaccard_never_exceeds_min_containment(self, spark):
        docs = _docs(
            spark,
            [
                (1, "a b c d e"),
                (2, "a b c d x"),
                (3, "a b c"),
            ],
        )
        for r in containment_pairs(docs, threshold=0.0).collect():
            assert r["jaccard"] <= min(r["cont_a_in_b"], r["cont_b_in_a"]) + 1e-9


class TestKsTest:
    def test_identical_distributions_give_zero(self, spark, tmp_path):
        # Stage a tiny events table where click and view values are the
        # SAME multiset -> every cumulative difference is exactly 0.
        import os

        from lens_warehouse_spark.operators.aggregates import a26_ks_test

        rows = []
        for i, v in enumerate([1.0, 2.0, 3.0, 4.0, 5.0] * 4):
            rows.append((i, "click", v))
            rows.append((1000 + i, "view", v))
        rows.append((9999, "error", 99.0))  # ignored type
        spark.createDataFrame(
            rows, "event_id long, event_type string, value double"
        ).write.mode("overwrite").parquet(
            os.path.join(str(tmp_path), "events.parquet")
        )
        out = a26_ks_test(spark, str(tmp_path)).collect()
        assert len(out) == 1
        r = out[0]
        assert r["ks_d"] == 0.0
        assert r["n_click"] == 20 and r["n_view"] == 20

    def test_disjoint_distributions_give_one(self, spark, tmp_path):
        import os

        from lens_warehouse_spark.operators.aggregates import a26_ks_test

        rows = [(i, "click", float(i)) for i in range(10)]
        rows += [(100 + i, "view", 1000.0 + i) for i in range(10)]
        spark.createDataFrame(
            rows, "event_id long, event_type string, value double"
        ).write.mode("overwrite").parquet(
            os.path.join(str(tmp_path), "events.parquet")
        )
        r = a26_ks_test(spark, str(tmp_path)).collect()[0]
        assert r["ks_d"] == 1.0

    def test_one_class_corpus_matches_oracle_null_d(self, spark, tmp_path):
        # r13 campaign (seed 20260818, corpus n_events=1): a corpus
        # whose filtered events hold only ONE class makes a per-class
        # total zero — Spark's ANSI division raised DIVIDE_BY_ZERO
        # where the DuckDB oracle returns (ks_d=NULL, n_click, n_view).
        # The nullif denominator guard must reproduce the oracle row
        # exactly, and an events table with no click/view rows at all
        # must stay an empty result on both engines.
        import os

        import duckdb

        from lens_warehouse_spark import registry
        from lens_warehouse_spark.operators.aggregates import a26_ks_test

        registry.load_all()
        oracle = registry.ORACLES["a26_ks_test"]
        rows = [(0, "click", 1.5), (1, "error", 9.0)]
        spark.createDataFrame(
            rows, "event_id long, event_type string, value double"
        ).write.mode("overwrite").parquet(
            os.path.join(str(tmp_path), "events.parquet")
        )
        got = a26_ks_test(spark, str(tmp_path)).collect()
        con = duckdb.connect()
        con.execute("CREATE TABLE events(event_id BIGINT, event_type VARCHAR, value DOUBLE)")
        con.executemany("INSERT INTO events VALUES (?, ?, ?)", rows)
        want = con.execute(oracle).fetchall()
        assert [(r["ks_d"], r["n_click"], r["n_view"]) for r in got] == want
        assert want == [(None, 1, 0)]
        # No click/view rows at all: both engines emit the empty set.
        spark.createDataFrame(
            [(0, "error", 9.0)], "event_id long, event_type string, value double"
        ).write.mode("overwrite").parquet(
            os.path.join(str(tmp_path), "events.parquet")
        )
        assert a26_ks_test(spark, str(tmp_path)).collect() == []
        con.execute("DELETE FROM events")
        con.execute("INSERT INTO events VALUES (0, 'error', 9.0)")
        assert con.execute(oracle).fetchall() == []
