"""Facade smoke tests: every public method returns sane results."""

from __future__ import annotations

from lens_warehouse_spark.engine import LensWarehouse
from lens_warehouse_spark.operators.cohort_queries import EXAMPLE_COHORT

SF = "/root/testdata/sf0.001"


def test_engine_surface(spark):
    lw = LensWarehouse(spark, SF)
    assert len(lw.tables()) == 10
    assert lw.table("orders").count() == 1500
    assert lw.sql("SELECT count(*) AS n FROM lineitem").collect()[0].n == 6000

    n = lw.cohort_count(EXAMPLE_COHORT).collect()[0].n_subjects
    assert n == lw.cohort_members(EXAMPLE_COHORT).count() > 0
    facets = lw.cohort_facets(EXAMPLE_COHORT).collect()
    assert sum(r.n_subjects for r in facets) == n

    assert lw.dedup_exact().count() == 500  # all unique at sf0.001
    knn = lw.knn(0, k=5).collect()
    assert len(knn) == 5
    assert knn[0].cos >= knn[-1].cos
    assert lw.sessionize().count() > 0
    assert lw.simhashes().count() == 500
