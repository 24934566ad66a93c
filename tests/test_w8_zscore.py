"""w8's z-score filter must match the DuckDB oracle on a zero-sigma
group (r13: the a26 DIVIDE_BY_ZERO sibling — an event_type whose
values are all equal, or whose stddev rounds to 0.000000, has sigma
exactly 0; Spark's ANSI division raised inside the filter where the
oracle's x/0 yields NULL and the NULL comparison drops the group)."""

from __future__ import annotations

import os

import duckdb

from lens_warehouse_spark import registry

registry.load_all()


def _stage(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "events.parquet")
    )


def _oracle(rows):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events(event_id BIGINT, event_type VARCHAR, value DOUBLE)"
    )
    con.executemany("INSERT INTO events VALUES (?, ?, ?)", rows)
    return con.execute(registry.ORACLES["w8_zscore_outliers"]).fetchall()


def test_constant_group_matches_oracle(spark, tmp_path):
    # 'click' is constant (sigma exactly 0 -> its rows must vanish,
    # not raise); 'view' carries one genuine outlier that must survive
    # with the identically rounded z on both engines.
    rows = [(0, "click", 2.0), (1, "click", 2.0), (2, "click", 2.0)]
    rows += [(10 + i, "view", 1.0) for i in range(30)] + [(99, "view", 500.0)]
    _stage(spark, tmp_path, rows)
    got = [
        tuple(r)
        for r in registry.QUERIES["w8_zscore_outliers"](
            spark, str(tmp_path)
        ).collect()
    ]
    want = _oracle(rows)
    assert got == want
    assert want == [(99, "view", 5.388)]


def test_single_row_groups_stay_empty(spark, tmp_path):
    # One row per type: stddev_samp is NULL -> z is NULL on both
    # engines -> no row passes the |z| > 3 filter.
    rows = [(0, "click", 5.0), (1, "view", -2.0)]
    _stage(spark, tmp_path, rows)
    got = registry.QUERIES["w8_zscore_outliers"](spark, str(tmp_path)).collect()
    assert got == []
    assert _oracle(rows) == []
