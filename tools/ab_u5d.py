"""A/B: u5d fused visit-count — share ONE exchange between the CNF gate
and the subject-level distinct aggregation (r13 verdict #3, guide §2.4).

Arm A (current): tagged union -> partial bit_or -> Exchange(subject,
visit) -> gate -> partial count -> Exchange(subject) -> merge ->
Exchange(single) -> final. Three exchanges; the middle one exists only
because countDistinct(subject_id) needs subject clustering.

Arm B: repartition the tagged union by subject_id BEFORE the gate's
groupBy(subject_id, visit_id). HashPartitioning(subject) satisfies
ClusteredDistribution({subject, visit}) — same subject => same
partition => same (subject, visit) => same partition — so BOTH the
gate's group-by and the downstream per-subject distinct expansion run
partition-local: Exchange(subject) + Exchange(single), two exchanges.
The trade: the union rows now cross the first exchange RAW (repartition
forwards rows; no map-side partial bit_or), so the arm shuffles
occurrence-level rows instead of (subject, visit)-level masks.

Protocol: interleaved best-of-N at sf0.1 (optional volume mult via
argv), noop sink, results compared exactly, Exchange counts printed
from the executed plans.

Usage: python tools/ab_u5d.py [mult] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lens_warehouse_spark.operators import cohort
from lens_warehouse_spark.operators.cohort_queries import EXAMPLE_COHORT
from lens_warehouse_spark.session import get_spark


def build_a(spark, sf_dir):
    members = cohort.compile_visits_fused(EXAMPLE_COHORT, spark, sf_dir)
    return members.agg(
        F.count(F.lit(1)).alias("n_visits"),
        F.countDistinct(cohort.SUBJECT_KEY).alias("n_subjects"),
    )


def build_b(spark, sf_dir):
    orig = cohort._cnf_gate

    def gate_repart(union, n, *keys):
        return orig(union.repartition(F.col(keys[0])), n, *keys)

    cohort._cnf_gate = gate_repart
    try:
        return build_a(spark, sf_dir)
    finally:
        cohort._cnf_gate = orig


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_u5d")
    if mult > 1:
        from tools.volume_bench import ensure_scaled_dir

        sf_dir = ensure_scaled_dir(base, mult, spark=spark)
    else:
        sf_dir = base

    # Equivalence first (the A/B is void if the rewrite changes rows).
    ra = build_a(spark, sf_dir).collect()
    rb = build_b(spark, sf_dir).collect()
    assert [r.asDict() for r in ra] == [r.asDict() for r in rb], (ra, rb)

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    # Warmup both plans, then interleave timed reps.
    for _ in range(2):
        run(build_a(spark, sf_dir))
        run(build_b(spark, sf_dir))
    out = {"A_current": [], "B_shared_exchange": []}
    for _ in range(reps):
        for key, builder in (("A_current", build_a), ("B_shared_exchange", build_b)):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            run(builder(spark, sf_dir))
            out[key].append(round(time.perf_counter() - t0, 3))

    def exchanges(df):
        s = df._jdf.queryExecution().executedPlan().toString()
        return s.count("Exchange") - s.count("ReusedExchange")

    print(
        json.dumps(
            {
                "mult": mult,
                "reps": out,
                "best": {k: min(v) for k, v in out.items()},
                "exchanges": {
                    "A": exchanges(build_a(spark, sf_dir)),
                    "B": exchanges(build_b(spark, sf_dir)),
                },
                "rows_equal": True,
                "loadavg": os.getloadavg(),
            }
        )
    )


if __name__ == "__main__":
    main()
