"""S10 time-travel semantics: manifest snapshot resolution boundaries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lens_warehouse_spark.operators.timetravel import (
    _SNAP_COMMITS,
    _snapshot_base,
    asof_read,
)
from tests.conftest import SF_SMOKE


def test_asof_resolves_each_commit_boundary(spark):
    base = _snapshot_base(spark, SF_SMOKE)
    # Exactly-at-commit reads that version; between commits reads the
    # floor; far future reads the latest.
    sums = {}
    for v, t in _SNAP_COMMITS.items():
        sums[v] = asof_read(spark, base, t).agg(F.sum("price")).first()[0]
    assert sums[0] != sums[1] != sums[2]
    between = asof_read(spark, base, 2_500).agg(F.sum("price")).first()[0]
    assert between == sums[1]
    future = asof_read(spark, base, 10**12).agg(F.sum("price")).first()[0]
    assert future == sums[2]


def test_asof_before_first_commit_raises(spark):
    base = _snapshot_base(spark, SF_SMOKE)
    with pytest.raises(ValueError):
        asof_read(spark, base, 999)


def test_engine_facade_asof_and_decode(spark):
    from lens_warehouse_spark.engine import LensWarehouse

    lw = LensWarehouse(spark, SF_SMOKE)
    base = _snapshot_base(spark, SF_SMOKE)
    assert lw.asof(base, 2_000).count() > 0
    decoded = lw.decode_codes(lw.table("orders"), "o_orderpriority")
    assert decoded.filter(F.col("label").isNull()).count() == 0


def test_s14_staging_keyed_by_sf_dir(spark):
    """Regression: one session running s14 against two sf_dirs must not
    reuse the first dir's bucketed tables for the second (the catalog
    tableExists guard is blind to sf_dir unless the db name encodes the
    staging fingerprint)."""
    from lens_warehouse_spark.operators.timetravel import s14_bucketed_join
    from tests.conftest import SF_ORACLE

    small = sum(r.n_items for r in s14_bucketed_join(spark, SF_SMOKE).collect())
    big = sum(r.n_items for r in s14_bucketed_join(spark, SF_ORACLE).collect())
    assert big > small, (small, big)


def test_expired_snapshot_no_longer_resolvable(spark):
    """After expiry the retention window IS the time-travel horizon:
    as-of times before the oldest surviving commit raise."""
    from lens_warehouse_spark.operators.timetravel import s17_snapshot_expiry

    s17_snapshot_expiry(spark, SF_SMOKE).count()  # ensure expired copy
    base = _snapshot_base(spark, SF_SMOKE) + "_expiry"
    with pytest.raises(ValueError):
        asof_read(spark, base, 1_500)  # v0's window — expired
    assert asof_read(spark, base, 2_500).count() > 0  # v1 survives


def test_expire_snapshots_rejects_nonpositive_keep(tmp_path):
    """entries[:-0] is entries[:0], so keep_last=0 silently kept
    everything and negative values inverted the semantics — both must
    raise up front."""
    import json
    import os

    import pytest

    from lens_warehouse_spark.operators.timetravel import expire_snapshots

    base = str(tmp_path)
    with open(os.path.join(base, "manifest.json"), "w") as fh:
        json.dump(
            [{"version": v, "commit_ms": v, "path": os.path.join(base, f"v{v}")}
             for v in range(3)],
            fh,
        )
    for bad in (0, -1):
        with pytest.raises(ValueError, match="keep_last"):
            expire_snapshots(base, keep_last=bad)
    # manifest untouched by the rejected calls
    with open(os.path.join(base, "manifest.json")) as fh:
        assert len(json.load(fh)) == 3
