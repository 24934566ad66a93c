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


def test_compaction_reduces_files_and_keeps_clustering(spark):
    """s16: compaction must reduce file count AND preserve data-skipping:
    range clustering on (event_type, ts) means individual files span at
    most a bounded slice of the key space — not every file touching
    every event_type as the fragmented round-robin layout does."""
    import glob
    import os
    import tempfile

    from lens_warehouse_spark import registry
    from lens_warehouse_spark.operators.extras import s16_compaction
    from lens_warehouse_spark.operators.timetravel import _staging_tag

    sf = "/root/testdata/sf0.001"
    s16_compaction(spark, sf).count()  # ensure staged
    frag = os.path.join(
        tempfile.gettempdir(), f"lws_frag_{_staging_tag(sf, 'events')}"
    )
    comp = frag + "_compacted"
    n_frag = len(glob.glob(os.path.join(frag, "*.parquet")))
    n_comp = len(glob.glob(os.path.join(comp, "*.parquet")))
    assert n_comp < n_frag
    # every fragmented file spans all 5 event types (round-robin);
    # compacted files are clustered — most span exactly one
    import pyarrow.parquet as pq

    def types_per_file(d):
        out = []
        for f in glob.glob(os.path.join(d, "*.parquet")):
            t = pq.read_table(f, columns=["event_type"])
            out.append(len(set(t.column(0).to_pylist())))
        return out

    frag_spans = types_per_file(frag)
    comp_spans = types_per_file(comp)
    # round-robin fragments mix types; range-clustered files mostly
    # hold a single type's slice of the keyspace
    assert sum(frag_spans) / len(frag_spans) > 2.0, frag_spans
    assert sum(1 for n in comp_spans if n <= 2) >= len(comp_spans) - 2, comp_spans
