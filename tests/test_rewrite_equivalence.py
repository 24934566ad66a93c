"""Equivalence properties for the round's plan rewrites:

- s13's shape: incremental MV maintenance == full recompute for ANY
  random CDC batch (inserts/updates/deletes), not just the registered
  instance.
- j11's shape: binned interval join == plain theta join for ANY random
  interval/point sets, including intervals spanning bin boundaries.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_incremental_mv_equals_recompute(spark, seed):
    rnd = random.Random(seed)
    base = [(k, rnd.choice("ABC"), rnd.randint(1, 500)) for k in range(300)]
    old = spark.createDataFrame(base, "k long, g string, v long")
    # random CDC: delete ~10%, update ~20% (new value), insert ~10%
    deletes = {k for k, _, _ in base if rnd.random() < 0.1}
    updates = {
        k: rnd.randint(1, 500)
        for k, _, _ in base
        if k not in deletes and rnd.random() < 0.2
    }
    inserts = [
        (1000 + i, rnd.choice("ABC"), rnd.randint(1, 500)) for i in range(30)
    ]
    new_rows = [
        (k, g, updates.get(k, v)) for k, g, v in base if k not in deletes
    ] + inserts
    new = spark.createDataFrame(new_rows, "k long, g string, v long")

    mv_base = old.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    # contributions: -old and +new for every changed key
    old_changed = old.filter(
        F.col("k").isin(list(deletes | set(updates))) if (deletes or updates)
        else F.lit(False)
    )
    new_changed = new.filter(
        F.col("k").isin(list(set(updates) | {k for k, _, _ in inserts}))
        if (updates or inserts)
        else F.lit(False)
    )
    contrib = old_changed.select(
        "g", F.lit(-1).alias("dn"), (-F.col("v")).alias("dv")
    ).unionByName(
        new_changed.select("g", F.lit(1).alias("dn"), F.col("v").alias("dv"))
    )
    delta = contrib.groupBy("g").agg(
        F.sum("dn").alias("dn"), F.sum("dv").alias("dv")
    )
    maintained = {
        r["g"]: (r["n2"], r["s2"])
        for r in mv_base.join(delta, "g", "full_outer")
        .select(
            "g",
            (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n2"),
            (F.coalesce("s", F.lit(0)) + F.coalesce("dv", F.lit(0))).alias("s2"),
        )
        .filter(F.col("n2") > 0)
        .collect()
    }
    recomputed = {
        r["g"]: (r["n"], r["s"])
        for r in new.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert maintained == recomputed


@pytest.mark.parametrize("seed", [3, 11])
def test_binned_interval_join_equals_theta(spark, seed):
    rnd = random.Random(seed)
    # intervals up to 3 bins wide over a 0..999 domain, bin width 100
    ivs = []
    for i in range(60):
        start = rnd.randint(0, 950)
        ivs.append((i, start, start + rnd.randint(1, 250)))
    pts = [(j, rnd.randint(0, 1199)) for j in range(400)]
    iv = spark.createDataFrame(ivs, "iv_id long, lo long, hi long")
    pt = spark.createDataFrame(pts, "pt_id long, x long")

    theta = {
        (r["iv_id"], r["pt_id"])
        for r in iv.join(
            pt, (F.col("x") >= F.col("lo")) & (F.col("x") < F.col("hi"))
        ).collect()
    }
    binned_iv = iv.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / 100), F.floor((F.col("hi") - 1) / 100)
            )
        ),
    )
    binned_pt = pt.withColumn("bin", F.floor(F.col("x") / 100))
    binned = {
        (r["iv_id"], r["pt_id"])
        for r in binned_pt.join(binned_iv, "bin")
        .filter((F.col("x") >= F.col("lo")) & (F.col("x") < F.col("hi")))
        .collect()
    }
    assert binned == theta
