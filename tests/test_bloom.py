"""s20: the bloom filter must actually be injected, and be
semantics-transparent."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from lens_warehouse_spark.operators.extras import (
    _BLOOM_CONFS,
    _bloom_join_frame,
)
from lens_warehouse_spark.registry import QUERIES
from tests.conftest import SF_SMOKE


def test_bloom_filter_injected_and_transparent(spark):
    plain = _bloom_join_frame(spark, SF_SMOKE).collect()

    saved = {k: spark.conf.get(k) for k in _BLOOM_CONFS}
    try:
        for k, v in _BLOOM_CONFS.items():
            spark.conf.set(k, v)
        df = _bloom_join_frame(spark, SF_SMOKE)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "might_contain" in plan  # fact side pruned pre-shuffle
        assert "bloom_filter_agg" in plan  # filter built from dim side
        assert "BroadcastHashJoin" not in plan  # the non-broadcast regime
        pruned = df.collect()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)

    assert plain == pruned  # pruning is semantics-transparent

    # and the registered (checkpointed) query returns the same rows
    assert QUERIES["s20_bloom_pruned_join"](spark, SF_SMOKE).collect() == plain
