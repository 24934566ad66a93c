"""Catalog stats-gated broadcast (SURVEY.md §2.3 J2/J6 scale hazard).

An explicit broadcast() hint is never demoted by AQE, so the gate in
catalog.maybe_broadcast is the only thing standing between a scaling
dim and a 100 GB build side shipped to every executor. These tests pin
the gate's three behaviors: hint below the limit, no hint above it,
KeyError outside the dim contract.
"""

from __future__ import annotations

import pytest

from lens_warehouse_spark import catalog
from tests.conftest import SF_SMOKE


def _has_broadcast_hint(df) -> bool:
    return "ResolvedHint" in df._jdf.queryExecution().analyzed().toString()


def test_fixed_dims_always_hinted(spark):
    na = catalog.table(spark, SF_SMOKE, "nation")
    assert _has_broadcast_hint(catalog.maybe_broadcast(na, SF_SMOKE, "nation"))


def test_scaling_dim_hinted_below_limit(spark):
    cu = catalog.table(spark, SF_SMOKE, "customer")
    assert catalog.table_rows(SF_SMOKE, "customer") <= catalog.BROADCAST_ROW_LIMIT
    assert _has_broadcast_hint(catalog.maybe_broadcast(cu, SF_SMOKE, "customer"))


def test_scaling_dim_not_hinted_above_limit(spark, monkeypatch):
    """Simulate the 100 TB catalog: footer stats over the limit."""
    path, mtime, _ = catalog._cache_lookup(
        catalog._ROWCOUNT_CACHE, SF_SMOKE, "customer"
    )
    monkeypatch.setitem(
        catalog._ROWCOUNT_CACHE, path, (mtime, catalog.BROADCAST_ROW_LIMIT + 1)
    )
    cu = catalog.table(spark, SF_SMOKE, "customer")
    out = catalog.maybe_broadcast(cu, SF_SMOKE, "customer")
    assert not _has_broadcast_hint(out)


def test_fact_table_rejected(spark):
    li = catalog.table(spark, SF_SMOKE, "lineitem")
    with pytest.raises(KeyError):
        catalog.maybe_broadcast(li, SF_SMOKE, "lineitem")


def test_table_rows_matches_spark_count(spark):
    for t in ("region", "nation", "customer"):
        assert catalog.table_rows(SF_SMOKE, t) == catalog.table(
            spark, SF_SMOKE, t
        ).count()


def test_schema_cache_replay_identical(spark):
    """The cached-schema fast path (round 6: spark.read.schema(...)
    replay skips the ~190 ms/call footer-resolution job) must produce
    the SAME schema and rows as a fresh resolution — including the
    events ts rebuild, whose bigint-vs-timestamp dispatch reads the
    dtypes of whichever path ran."""
    for t in ("events", "lineitem"):
        key = f"{SF_SMOKE}/{t}.parquet"
        catalog._SCHEMA_CACHE.pop(key, None)
        fresh = catalog.table(spark, SF_SMOKE, t)  # populates the cache
        assert key in catalog._SCHEMA_CACHE
        cached = catalog.table(spark, SF_SMOKE, t)  # replays it
        assert cached.schema == fresh.schema
        assert cached.count() == fresh.count()
        # value-identical on a sample row ordering
        order = fresh.columns[0]
        assert (
            cached.orderBy(order).limit(5).collect()
            == fresh.orderBy(order).limit(5).collect()
        )


def test_schema_cache_invalidates_on_rewrite(spark, tmp_path):
    """Round-6 advisor: a table REWRITTEN at the same path with a
    changed schema must not be silently misread through a stale cached
    schema (spark.read.schema(stale) doesn't fail — it misreads). The
    (path, mtime_ns) cache key makes the rewrite a cache miss."""
    import os
    import time

    d = str(tmp_path)
    p = os.path.join(d, "nation.parquet")
    spark.createDataFrame(
        [(1, "a")], "n_nationkey long, n_name string"
    ).coalesce(1).write.mode("overwrite").parquet(p)
    first = catalog.table(spark, d, "nation")
    assert first.columns == ["n_nationkey", "n_name"]
    time.sleep(0.01)  # ensure mtime_ns moves even on coarse filesystems
    spark.createDataFrame(
        [(2, "b", 7)], "n_nationkey long, n_name string, n_regionkey long"
    ).coalesce(1).write.mode("overwrite").parquet(p)
    second = catalog.table(spark, d, "nation")
    assert second.columns == ["n_nationkey", "n_name", "n_regionkey"]
    assert second.collect()[0].n_regionkey == 7

def test_metadata_caches_bounded_per_path(spark, tmp_path):
    """r7 advisor: rewriting a table in-process must REPLACE its cache
    entries, not append new keys — a rewrite-heavy session (compaction
    loops, streaming foreachBatch sinks) would otherwise grow both
    caches without bound."""
    import os

    d = str(tmp_path)
    p = os.path.join(d, "nation.parquet")
    for i in range(4):
        spark.createDataFrame(
            [(i, "x")], "n_nationkey long, n_name string"
        ).coalesce(1).write.mode("overwrite").parquet(p)
        os.utime(p, ns=(1_000_000_000 * i, 1_000_000_000 * i))
        catalog.table(spark, d, "nation")
        catalog.table_rows(d, "nation")
    assert sum(1 for k in catalog._SCHEMA_CACHE if k == p) == 1
    assert sum(1 for k in catalog._ROWCOUNT_CACHE if k == p) == 1
