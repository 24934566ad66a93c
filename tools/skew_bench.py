"""Skew-join strategy bench (SCALE.md evidence): one hot key vs the
three levers — plain shuffle join, AQE skew splitting, explicit salting
(operators/skew.salted_join).

Workload: big side 4M rows with 70% of rows on ONE hot key (the regime
where a single sort-merge task holds most of the data), dim side 100k
unique keys. Broadcast is disabled (threshold -1) so the join actually
shuffles — at 100 TB the dim side of a genuinely skewed join is too big
to broadcast or you'd have broadcast it. AQE skew thresholds are
lowered to make the splitter see local-scale partitions as "skewed",
mirroring its behavior on 256MB+ partitions in production.

Prints one JSON line; run occasionally, not per-round (3 timed joins).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lens_warehouse_spark.operators.skew import salted_join
from lens_warehouse_spark.session import get_spark

N_BIG = 4_000_000
N_KEYS = 100_000
HOT_FRACTION = 7  # of 10 rows -> key 0


def main() -> None:
    spark = get_spark("skew-bench")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    big = spark.range(N_BIG).select(
        F.when(F.col("id") % 10 < HOT_FRACTION, F.lit(0))
        .otherwise(F.pmod(F.col("id"), F.lit(N_KEYS)))
        .alias("key"),
        (F.col("id") % 1000).alias("v"),
    )
    small = spark.range(N_KEYS).select(
        F.col("id").alias("key"), (F.col("id") % 97).alias("w")
    )

    def run(df) -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df.agg(F.count(F.lit(1)), F.sum(F.col("v") + F.col("w"))).collect()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    results: dict[str, float] = {}

    # Plain shuffle join, no skew handling.
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    results["plain_smj"] = run(big.join(small, "key"))

    # AQE skew splitting (thresholds lowered to local scale).
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    results["aqe_skew"] = run(big.join(small, "key"))

    # Explicit salting (AQE skew off so salting is the only mitigation).
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    results["salted_join"] = run(salted_join(big, small, "key", n_salts=32))

    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    print(
        json.dumps(
            {
                "bench": "skew_join",
                "n_big": N_BIG,
                "hot_key_share": HOT_FRACTION / 10,
                "seconds": results,
            }
        )
    )


if __name__ == "__main__":
    main()
