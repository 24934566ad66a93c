"""Salted join must be result-identical to the plain join, including on
pathologically skewed keys."""

from __future__ import annotations

import random

from lens_warehouse_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join_on_skewed_data(spark):
    rng = random.Random(3)
    # 90% of big-side rows share one hot key
    big_rows = [
        (0 if rng.random() < 0.9 else rng.randrange(1, 50), rng.randrange(1000))
        for _ in range(5000)
    ]
    big = spark.createDataFrame(big_rows, "k long, payload long")
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(50)], "k long, name string"
    )
    plain = sorted(
        (r.k, r.payload, r.name) for r in big.join(small, "k", "inner").collect()
    )
    salted = sorted(
        (r.k, r.payload, r.name)
        for r in salted_join(big, small, "k", n_salts=8).collect()
    )
    assert salted == plain
    assert len(plain) == 5000


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, 10), (99, 20)], "k long, payload long")
    small = spark.createDataFrame([(1, "a")], "k long, name string")
    out = {(r.k, r.payload, r.name) for r in salted_join(big, small, "k", 4, "left").collect()}
    assert out == {(1, 10, "a"), (99, 20, None)}


def test_salted_join_rejects_outer_and_reserved(spark):
    """Right/full outer would emit a null-padded row per non-matching
    salt replica; a pre-existing __salt payload column would be silently
    clobbered — both must raise."""
    import pytest

    from lens_warehouse_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, 10)], "k long, v long")
    small = spark.createDataFrame([(1, "a")], "k long, name string")
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="does not support"):
            salted_join(big, small, "k", 4, how)
    clash = spark.createDataFrame([(1, 0)], "k long, __salt long")
    with pytest.raises(ValueError, match="reserves"):
        salted_join(clash, small, "k", 4)


def test_salted_join_spreads_duplicate_rows(spark):
    """A hot key whose rows are duplicates (big carries only the key)
    must still spread across salts — a value-derived salt collapsed them
    onto one (key, salt) partition."""
    from pyspark.sql import functions as F

    from lens_warehouse_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1,)] * 400, "k long")
    small = spark.createDataFrame([(1, "hot")], "k long, name string")
    out = salted_join(big, small, "k", n_salts=8)
    assert out.count() == 400
    # inspect the salt spread via the same expression the join uses
    salts = (
        big.withColumn("s", F.pmod(F.monotonically_increasing_id(), F.lit(8)))
        .select("s")
        .distinct()
        .count()
    )
    assert salts > 1
