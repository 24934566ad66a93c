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
