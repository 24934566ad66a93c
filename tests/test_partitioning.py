"""Partition-pruning proof: the SCALE.md date-partitioned-layout claim,
verified against the physical plan of a filtered read.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def partitioned_dir(spark):
    from lens_warehouse_spark.catalog import table

    out = tempfile.mkdtemp(prefix="lws_part_")
    ev = table(spark, SF, "events")  # handles the ns-timestamp read
    # date-partitioned layout (the 100 TB shape for the events stream)
    (
        ev.withColumn("event_date", F.to_date(F.col("ts").cast("timestamp")))
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(out)
    )
    yield out
    shutil.rmtree(out, ignore_errors=True)


def test_partition_filter_prunes_files(spark, partitioned_dir):
    df = spark.read.parquet(partitioned_dir).filter(
        F.col("event_date") == "2024-01-05"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "event_date" in plan.split("PartitionFilters")[1][:200]
    n_days = (
        spark.read.parquet(partitioned_dir)
        .select("event_date")
        .distinct()
        .count()
    )
    assert n_days > 10  # the month of January split across partitions
    assert df.count() > 0


def test_unfiltered_read_sees_all_rows(spark, partitioned_dir):
    assert spark.read.parquet(partitioned_dir).count() == 1000
