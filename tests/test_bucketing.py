"""Bucketing demo: the SCALE.md claim that bucketed fact-fact joins are
shuffle-free, verified against the actual physical plan.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_db(spark):
    warehouse = tempfile.mkdtemp(prefix="lws_buckets_")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS lws_bucket_db LOCATION '{warehouse}'")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("lws_bucket_db.orders_b")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("lws_bucket_db.lineitem_b")
    )
    yield "lws_bucket_db"
    spark.sql("DROP DATABASE IF EXISTS lws_bucket_db CASCADE")
    shutil.rmtree(warehouse, ignore_errors=True)


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_is_shuffle_free(spark, bucketed_db):
    li = spark.table(f"{bucketed_db}.lineitem_b")
    od = spark.table(f"{bucketed_db}.orders_b")
    # disable auto-broadcast so the join strategy decision is about
    # co-location, not size
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(od, li.l_orderkey == od.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_orderpriority"
        )
        plan = _physical_plan(joined)
        assert "SortMergeJoin" in plan
        # bucket co-location: no exchange feeding the join
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == 6000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_join_does_shuffle(spark):
    """Control: the same join on plain parquet shuffles both sides."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    od = spark.read.parquet(f"{SF}/orders.parquet")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(od, li.l_orderkey == od.o_orderkey)
        plan = _physical_plan(joined)
        assert "Exchange hashpartitioning" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_approx_count_distinct_within_rsd(spark):
    """A2 accuracy bound: HLL++ at rsd=0.02 stays within ~3x rsd."""
    od = spark.read.parquet(f"{SF}/orders.parquet")
    exact = od.select("o_custkey").distinct().count()
    approx = od.agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("a")
    ).collect()[0].a
    assert abs(approx - exact) / exact < 0.06


def test_hll_rollup_union_accuracy(spark):
    """Merged daily HLL sketches (a18) must estimate within ~3% of the
    exact per-event_type distinct user count (lgConfigK=14 gives ~0.8%
    RSE; 3% is a generous determinism-safe bound), and the rollup path
    (union of daily sketches) must equal sketching the raw column
    directly — the mergeability identity that makes the pattern sound."""
    from pyspark.sql import functions as F

    from lens_warehouse_spark.catalog import table
    from lens_warehouse_spark.operators.aggregates import (
        a18_hll_rollup,
        hll_daily_sketches,
    )

    sf = "/root/testdata/sf0.01"
    # r10: a18's public output is exact + sketch_within_rsd (full
    # oracle); the query must certify every group in-bound...
    q = a18_hll_rollup(spark, sf).collect()
    assert len(q) == 5 and all(r["sketch_within_rsd"] for r in q)
    # ...and this test keeps pinning the RAW rollup estimate.
    got = {
        r.event_type: r.approx_users
        for r in hll_daily_sketches(spark, sf)
        .groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users")
        )
        .collect()
    }
    exact = {
        r.event_type: r.n
        for r in table(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for et, est in got.items():
        assert abs(est - exact[et]) / exact[et] < 0.03, (et, est, exact[et])

    direct = {
        r.event_type: r.a
        for r in table(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(14))
            ).alias("a")
        )
        .collect()
    }
    assert got == direct


def test_sketch_overlap_within_bound(spark):
    """a19's inclusion-exclusion overlap estimates must sit within 5% of
    the exact pairwise distinct-user overlaps (relative to union size,
    the scale on which HLL error compounds)."""
    from pyspark.sql import functions as F

    from lens_warehouse_spark.catalog import table
    from lens_warehouse_spark.operators.aggregates import (
        a19_sketch_overlap,
        sketch_overlap_estimates,
    )

    sf = "/root/testdata/sf0.01"
    # r10: a19's public output is exact + ie_within_bound (full
    # oracle); the query must certify every pair in-bound...
    q = a19_sketch_overlap(spark, sf).collect()
    assert len(q) == 10 and all(r["ie_within_bound"] for r in q)
    # ...and this test keeps pinning the RAW I-E estimates.
    got = {
        (r.type_a, r.type_b): r.approx_overlap
        for r in sketch_overlap_estimates(spark, sf).collect()
    }
    ev = table(spark, sf, "events").select("event_type", "user_id").distinct()
    a, b = ev.alias("a"), ev.alias("b")
    exact = {
        (r.ta, r.tb): r.n
        for r in a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("ta"), F.col("b.event_type").alias("tb")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(got) == set(exact) and len(got) == 10
    union_ub = ev.select("user_id").distinct().count()
    for pair, est in got.items():
        assert abs(est - exact[pair]) <= 0.05 * union_ub, (pair, est, exact[pair])


def test_windowed_hll_tracks_exact_rolling_dau(spark):
    """a25's sketched 7-day rolling DAU must track the exact counts
    within HLL error (lgk=12 -> ~1.6% relative; allow 5%). r11: the
    bound now travels IN the query as within_bound (certified
    contract), and the emitted exact column must equal w9's exact
    rolling DAU row-for-row (two independent exact machineries:
    a25's day-series band join vs w9's fan-out explode — the day
    series is dense in the synthetic feed, so row-frame and calendar
    trailing-7 coincide)."""
    from lens_warehouse_spark import registry
    from lens_warehouse_spark.registry import QUERIES

    registry.load_all()
    sf = "/root/testdata/sf0.001"
    rows = (
        QUERIES["a25_windowed_hll"](spark, sf).orderBy("day_ms").collect()
    )
    assert rows and all(r["within_bound"] for r in rows)
    exact = [
        r["dau7"]
        for r in QUERIES["w9_sliding_distinct"](spark, sf)
        .orderBy("day_idx")
        .collect()
    ]
    assert len(rows) == len(exact)  # same day series, both ordered
    assert [r["dau7_exact"] for r in rows] == exact
