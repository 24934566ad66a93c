"""Per-query Python-side plan-construction cost over the headline set.

AB_SEQUENTIAL_r12's build_only arm showed ~40% of sequential power
(3.96 s of 10.0 s) is pure Py4J plan construction that never touches
data. This profiler attributes that 4 s to individual queries so the
optimization round can shrink the worst builders (fewer chained Py4J
calls per plan) instead of guessing. Build cost also contends on the
GIL/Py4J bridge during the 16-stream throughput run, so shrinking it
helps both framings.

Protocol: for each headline query, time fn(spark, sf_dir) ALONE (no
action) best-of-5 after one untimed warm pass (classloading, local
imports). Prints one JSON line sorted by best build seconds.

Usage: python tools/profile_build.py [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lens_warehouse_spark import registry
from lens_warehouse_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all()
    from bench import HEADLINE

    names = sys.argv[1:] or HEADLINE
    spark = get_spark("profile_build")
    out: dict[str, float] = {}
    for name in names:
        fn = registry.QUERIES[name]
        fn(spark, sf_dir)  # warm pass: imports, table() staging, JIT
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            fn(spark, sf_dir)
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 4)
    ranked = dict(sorted(out.items(), key=lambda kv: -kv[1]))
    print(json.dumps({"build_sec": ranked, "total": round(sum(out.values()), 3)}))


if __name__ == "__main__":
    main()
