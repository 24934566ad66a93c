"""Z-order layout: row-group stats must let BOTH dimensions skip files.

A layout linearly sorted by user_id prunes user_id predicates perfectly
but value predicates not at all (every file spans the full value range).
The z-ordered layout must (a) lose no rows, (b) skip files for a
value-only box, and (c) still skip files for a user_id-only box — the
balanced-skipping property that justifies the extra shuffle at scale.
"""

from __future__ import annotations

import glob
import shutil
import tempfile

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from lens_warehouse_spark.catalog import table
from lens_warehouse_spark.operators.layout import zorder_df

SF = "/root/testdata/sf0.01"


def _files_overlapping(path: str, col: str, lo: float, hi: float) -> int:
    """Count parquet files whose [min,max] stats intersect [lo, hi]."""
    hits = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        fmin = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        fmax = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        if fmax >= lo and fmin <= hi:
            hits += 1
    return hits


@pytest.fixture(scope="module")
def layouts(spark):
    ev = table(spark, SF, "events").select("event_id", "user_id", "value")
    zdir = tempfile.mkdtemp(prefix="lws_z_")
    ldir = tempfile.mkdtemp(prefix="lws_lin_")
    zorder_df(ev, ["user_id", "value"], bits=8, n_files=8).write.mode(
        "overwrite"
    ).parquet(zdir)
    ev.repartitionByRange(8, "user_id").sortWithinPartitions("user_id").write.mode(
        "overwrite"
    ).parquet(ldir)
    yield zdir, ldir, ev.count()
    shutil.rmtree(zdir, ignore_errors=True)
    shutil.rmtree(ldir, ignore_errors=True)


def test_no_rows_lost(spark, layouts):
    zdir, _, n = layouts
    assert spark.read.parquet(zdir).count() == n


def test_value_predicate_skips_files(layouts):
    zdir, ldir, _ = layouts
    lin_hits = _files_overlapping(ldir, "value", 10.0, 20.0)
    z_hits = _files_overlapping(zdir, "value", 10.0, 20.0)
    assert lin_hits == 8  # linear layout cannot skip on the second dim
    assert z_hits < lin_hits


def test_userid_predicate_still_skips(layouts):
    zdir, _, _ = layouts
    assert _files_overlapping(zdir, "user_id", 20, 40) < 8


def test_query_results_identical(spark, layouts):
    zdir, _, _ = layouts
    got = (
        spark.read.parquet(zdir)
        .filter((F.col("value") >= 10.0) & (F.col("value") <= 20.0))
        .count()
    )
    want = (
        table(spark, SF, "events")
        .filter((F.col("value") >= 10.0) & (F.col("value") <= 20.0))
        .count()
    )
    assert got == want


def test_zorder_rejects_overflow_reserved_and_degenerate(spark):
    import pytest
    from lens_warehouse_spark.operators.layout import zorder_df

    df = spark.createDataFrame([(float(i), i % 7, "x") for i in range(50)],
                               "a double, b long, s string")
    with pytest.raises(ValueError, match="63 usable"):
        zorder_df(df, ["a"] * 8, bits=8)  # 64 bits hits the sign bit
    clash = df.withColumnRenamed("s", "__z")
    with pytest.raises(ValueError, match="reserves"):
        zorder_df(clash, ["a"])
    with pytest.raises(ValueError, match="no numeric"):
        zorder_df(df, ["a", "s"])  # string dim nulls out under the cast
