"""global_rank (the no-single-partition-window rank): offsets + local
ranks must equal the global row_number regardless of where the range
boundaries fall — including degenerate partition counts."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from lens_warehouse_spark.operators._helpers import global_rank


@pytest.mark.parametrize("nparts", [1, 3, 32, 700])
def test_global_rank_matches_ground_truth(spark, nparts):
    rnd = random.Random(7)
    data = [(i, rnd.randint(0, 50)) for i in range(500)]  # heavy ties in v
    df = spark.createDataFrame(data, "id long, v long")
    got = {
        r["id"]: r["r"]
        for r in global_rank(
            df, ["v", "id"], rank_col="r", num_partitions=nparts
        ).collect()
    }
    expected = {
        id_: i + 1
        for i, (id_, _) in enumerate(sorted(data, key=lambda t: (t[1], t[0])))
    }
    assert got == expected


def test_global_rank_desc_order(spark):
    df = spark.createDataFrame([(i, i % 7) for i in range(100)], "id long, v long")
    got = {
        r["id"]: r["r"]
        for r in global_rank(df, [F.col("v").desc(), "id"], rank_col="r").collect()
    }
    expected = {
        id_: i + 1
        for i, (id_, _) in enumerate(
            sorted(((i, i % 7) for i in range(100)), key=lambda t: (-t[1], t[0]))
        )
    }
    assert got == expected


def test_global_rank_rejects_colliding_rank_col(spark):
    """rank_col colliding with an internal working column (or an input
    column) would be silently dropped by the final drop(); the helper
    must reject it instead."""
    import pytest

    df = spark.createDataFrame([(1,)], "v long")
    for bad in ("__r", "__p", "__off", "v"):
        with pytest.raises(ValueError, match="collides"):
            global_rank(df, ["v"], rank_col=bad)
