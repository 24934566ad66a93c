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
