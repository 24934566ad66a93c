"""Runtime-filter (Bloom) injection proof — the join-pruning lever for
fact-fact joins at 100 TB: the selective side's keys build a Bloom
filter that prunes the big side's scan before the shuffle. Locally the
dims broadcast instead, so the test forces a shuffle join to show the
mechanism engages when broadcast isn't available (exactly the 100 TB
regime)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from lens_warehouse_spark.catalog import table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bloom_runtime_filter_injected_and_equivalent(spark):
    li = table(spark, SF, "lineitem")
    od = table(spark, SF, "orders").filter(F.col("o_totalprice") > 400000)
    joined = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    baseline = {(r.o_orderpriority, r.n) for r in joined.collect()}

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    try:
        forced = (
            li.join(od, li.l_orderkey == od.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert "bloom" in _plan(forced).lower(), "no runtime Bloom filter in plan"
        assert {(r.o_orderpriority, r.n) for r in forced.collect()} == baseline
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )
