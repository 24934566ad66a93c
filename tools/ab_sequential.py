"""A/B the sequential-power fixed-cost exposure (r11 verdict #5).

Spark sequential power at sf0.1 reads ~3.1x DuckDB sequential, and the
standing attribution is a ~0.2 s/job fixed cost (Py4J plan build +
Catalyst + job scheduling) x 25 headline queries — not per-row cost
(VOLUME_300x/1000x invert the ratio). This harness decomposes and
attacks that floor WITHOUT touching bench.py's longitudinal protocol:

  arm fresh32   the exact bench power protocol: fresh fn() call per
                rep, session defaults (shuffle.partitions=32, AQE on).
  arm fresh8    same protocol, spark.sql.shuffle.partitions=8 for the
                arm's duration — fewer tasks per shuffle stage => less
                scheduling, IF task dispatch is the floor.
  arm reuse     fn() built ONCE per query, three .count() reps on the
                same DataFrame — Spark memoizes the QueryExecution, so
                this isolates plan-build (Py4J + analysis) from
                execution+scheduling.
  build         plan-build-only timing (fn() without an action), the
                direct Py4J+analysis attribution number.

Prints one JSON record; findings go to BASELINE.md. Adoption bar
(r11 verdict): >=20% sequential gain with throughput median5 unharmed.

Usage: python tools/ab_sequential.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lens_warehouse_spark import registry
from lens_warehouse_spark.session import get_spark


def _power(spark, names, sf_dir, reps, reuse=False):
    timings = {}
    for name in names:
        fn = registry.QUERIES[name]
        best = float("inf")
        df = fn(spark, sf_dir) if reuse else None
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            (df if reuse else fn(spark, sf_dir)).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    return timings


def _build_only(spark, names, sf_dir, reps):
    timings = {}
    for name in names:
        fn = registry.QUERIES[name]
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir)  # no action: Py4J plan construction only
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    return timings


def main() -> None:
    import bench

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    registry.load_all()
    spark = get_spark("ab_sequential")
    names = list(bench.HEADLINE)

    # Warmup to bench's v2 steady state so the arms measure the engine,
    # not the C2 ramp (same discipline as bench.py).
    from tools.volume_bench import warm_plans, wait_for_idle

    warm_plans(spark, names, "/root/testdata/sf0.001")
    for _ in range(3):
        for n in names:
            try:
                registry.QUERIES[n](spark, sf_dir).count()
            except Exception:  # noqa: BLE001
                pass
    gate = wait_for_idle(threshold_5m=3.0, timeout_s=900.0)

    out = {"sf_dir": sf_dir, "reps": reps, **gate}
    default_parts = spark.conf.get("spark.sql.shuffle.partitions")

    t = _power(spark, names, sf_dir, reps)
    out["fresh32"] = {"total": round(sum(t.values()), 3), "q": t}

    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        t = _power(spark, names, sf_dir, reps)
        out["fresh8"] = {"total": round(sum(t.values()), 3), "q": t}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", default_parts)

    t = _power(spark, names, sf_dir, reps, reuse=True)
    out["reuse"] = {"total": round(sum(t.values()), 3), "q": t}

    t = _build_only(spark, names, sf_dir, reps)
    out["build_only"] = {"total": round(sum(t.values()), 3), "q": t}

    # Second fresh32 pass brackets machine drift across the arms.
    t = _power(spark, names, sf_dir, reps)
    out["fresh32_repeat"] = {"total": round(sum(t.values()), 3), "q": t}

    print(json.dumps(out))


if __name__ == "__main__":
    main()
