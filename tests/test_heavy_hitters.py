"""a16_heavy_hitters: the Misra-Gries candidate stage must never lose a
true heavy hitter (superset guarantee), and the final output must equal
the exact GROUP BY / HAVING answer on any distribution — including the
adversarial many-singletons case that defeats naive per-partition top-k.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from lens_warehouse_spark.operators.aggregates import (
    _HH_K,
    _mg_summaries,
    a16_heavy_hitters,
)


def exact_heavy_hitters(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id")
    n = ev.count()
    return {
        r.user_id
        for r in ev.groupBy("user_id")
        .count()
        .filter(F.col("count") * _HH_K > n)
        .collect()
    }


def test_matches_exact_on_testdata(spark, sf_dir):
    got = a16_heavy_hitters(spark, sf_dir).collect()
    want = exact_heavy_hitters(spark, sf_dir)
    assert {r.user_id for r in got} == want
    assert all(r.cnt * _HH_K > 0 for r in got)


def test_mg_superset_adversarial():
    # One partition: a sea of singletons (ids 10_000+) hiding two true
    # heavy hitters. Naive partition top-k by arrival order would evict
    # them; MG must keep anything with count > n/K.
    heavy = [1] * 400 + [2] * 300
    noise = list(range(10_000, 10_000 + 30_000))
    stream = []
    hi, ni = 0, 0
    # interleave: one heavy element every ~86 noise elements
    for i, uid in enumerate(noise):
        stream.append(uid)
        if i % 86 == 0 and hi < len(heavy):
            stream.append(heavy[hi])
            hi += 1
    stream.extend(heavy[hi:])
    batches = [
        pd.DataFrame({"user_id": pd.Series(stream[i : i + 5000], dtype="int64")})
        for i in range(0, len(stream), 5000)
    ]
    (summary,) = list(_mg_summaries(iter(batches)))
    n = len(stream)
    cands = set(summary["user_id"])
    for uid, cnt in ((1, 400), (2, 300)):
        assert cnt * _HH_K > n  # they ARE heavy at this K
        assert uid in cands
    assert len(cands) <= 2 * _HH_K  # summary stays bounded


def test_ann_recall_bounds(spark, sf_dir):
    from lens_warehouse_spark.llm.vector import l3h_ann_recall

    rows = l3h_ann_recall(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.k == 3
        assert 0 <= r.hits <= r.k
