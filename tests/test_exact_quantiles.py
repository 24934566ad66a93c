"""Property tests for the bracket-then-select exact quantile family
(a20/a21/a22): randomized distributions INCLUDING heavy ties — the case
where the percentile_approx bracket collapses onto a single repeated
value and the rank bookkeeping must still pick the true order
statistics."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _quantile_cont(values: list[float], p: float) -> float:
    """Reference quantile_cont: linear interpolation at h=(n-1)p."""
    s = sorted(values)
    h = (len(s) - 1) * p
    lo = math.floor(h)
    hi = math.ceil(h)
    return s[lo] * (hi - h if hi != lo else 1.0) + (
        s[hi] * (h - lo) if hi != lo else 0.0
    )


# values drawn from a SMALL integer domain -> massive ties by design
_tied_groups = st.dictionaries(
    st.sampled_from(["a", "b", "c"]),
    st.lists(
        st.integers(min_value=-5, max_value=5).map(float),
        min_size=1,
        max_size=60,
    ),
    min_size=1,
    max_size=3,
)


@settings(max_examples=12, deadline=None)
@given(_tied_groups)
def test_grouped_bracket_select_median_matches_reference(spark, groups):
    from pyspark.sql import Window

    rows = [
        (g, v) for g, vals in groups.items() for v in vals
    ]
    ev = spark.createDataFrame(rows, ["event_type", "value"])
    # inline a21's machinery against the in-memory frame
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx("value", 0.47, 50_000).alias("lo"),
        F.percentile_approx("value", 0.53, 50_000).alias("hi"),
    )
    below = (
        ev.join(F.broadcast(stats.select("event_type", "lo")), "event_type")
        .filter(F.col("value") < F.col("lo"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_below"))
    )
    sliced = ev.join(F.broadcast(stats), "event_type").filter(
        (F.col("value") >= F.col("lo")) & (F.col("value") <= F.col("hi"))
    )
    w = Window.partitionBy("event_type").orderBy("value")
    ranked = (
        sliced.withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(below), "event_type", "left")
        .withColumn("rank", F.col("rn") + F.coalesce(F.col("n_below"), F.lit(0)))
    )
    picked = ranked.filter(
        (F.col("rank") == F.floor((F.col("n") + 1) / 2))
        | (F.col("rank") == F.floor(F.col("n") / 2) + 1)
    )
    got = {
        r.event_type: r.med
        for r in picked.groupBy("event_type")
        .agg(F.avg("value").alias("med"))
        .collect()
    }
    for g, vals in groups.items():
        assert abs(got[g] - _quantile_cont(vals, 0.5)) < 1e-9, (
            g,
            sorted(vals),
            got[g],
        )


# a24's boundary machinery: every p's boundary must equal the reference
# quantile_cont on randomized data INCLUDING heavy ties (where brackets
# collapse onto one repeated value).
_tied_values = st.lists(
    st.integers(min_value=-8, max_value=8).map(float), min_size=2, max_size=80
)


@settings(max_examples=10, deadline=None)
@given(_tied_values)
def test_exact_quantile_boundaries_match_reference(spark, values):
    from lens_warehouse_spark.operators.aggregates import (
        exact_quantile_boundaries,
    )

    df = spark.createDataFrame([(v,) for v in values], "x double")
    ps = (0.25, 0.5, 0.9)
    got = exact_quantile_boundaries(df, "x", ps, margin=0.05, accuracy=100_000)
    want = [round(_quantile_cont(values, p), 4) for p in ps]
    assert got == want, (values, got, want)


def test_a22_machinery_tiny_distinct_group(spark):
    """Direct regression for the tiny-group bracket bug: a 2-row group
    with distinct values must interpolate, not return the upper value."""
    from lens_warehouse_spark.operators import aggregates as agg
    import lens_warehouse_spark.catalog as cat

    df = spark.createDataFrame(
        [("a", 0.0), ("a", 1.0), ("b", 5.0)], "event_type string, value double"
    )
    orig = cat.table
    try:
        cat.table = lambda _s, _d, _n: df
        agg.table = cat.table
        out = {
            r["event_type"]: r["p90_value"]
            for r in agg.a22_grouped_exact_percentile(spark, "ignored").collect()
        }
    finally:
        cat.table = orig
        agg.table = orig
    assert out["a"] == round(0.0 * 0.1 + 1.0 * 0.9, 4)  # 0.9, interpolated
    assert out["b"] == 5.0


def test_exact_quantile_boundaries_empty_input_raises(spark):
    """Empty input must fail with a clear contract, not a NoneType
    subscript (percentile_approx over zero rows yields NULL)."""
    import pytest

    from lens_warehouse_spark.operators.aggregates import (
        exact_quantile_boundaries,
    )

    with pytest.raises(ValueError, match="empty input"):
        exact_quantile_boundaries(
            spark.createDataFrame([], "x double"), "x", (0.5,), 0.05
        )
