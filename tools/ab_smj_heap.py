"""A/B the 1000x buffered-SMJ heap spike against plan-level levers.

r12 attribution (BASELINE.md): the full volume subset run SEQUENTIALLY
in one 8 GiB local-mode session died twice with heap OOM inside a
buffered sort-merge-join stage (~988) during the timed 1000x phase,
while every query passes individually at 8g — 32 executor threads
share ONE heap in local mode, so residual session state plus a
100M-row SMJ match-group buffer crosses 8 GiB only mid-sequence. The
r12 record runs at 16g, honestly recorded. r12 verdict #5: the 100 TB
story is stronger if per-thread memory is bounded by PLAN shape — A/B
the same failing sequence at 8g with (a) more shuffle partitions
(smaller per-task sort/buffer footprint) and (b) shuffled-hash-join
preference (no sorted-run buffering). Adopt a lever only if it passes
at 8g with <=5% cost vs the 16g record.

One arm per PROCESS (driver memory is a JVM launch option):

    SPARK_GRAFT_DRIVER_MEM=8g python tools/ab_smj_heap.py control [mult]
    SPARK_GRAFT_DRIVER_MEM=8g SPARK_GRAFT_SHUFFLE=128 \
        python tools/ab_smj_heap.py parts128 [mult]
    SPARK_GRAFT_DRIVER_MEM=8g python tools/ab_smj_heap.py shj [mult]

Each arm replays the volume harness's exact sequence shape: warmup v2
with per-query clearCache, then the timed checksum pass over
VOLUME_SUBSET at the scaled dir. Per-query progress is recorded so a
crash pins WHICH query's stage blew the heap. Output: one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lens_warehouse_spark import registry
from lens_warehouse_spark.session import get_spark
from tools.volume_bench import (
    VOLUME_SUBSET,
    content_fingerprint,
    ensure_scaled_dir,
    wait_for_idle,
)


def _checksum(df) -> None:
    h = F.xxhash64(*[F.col(c) for c in df.columns]).cast("decimal(38,0)")
    df.agg(F.count(F.lit(1)), F.sum(h)).collect()


def main() -> None:
    arm = sys.argv[1] if len(sys.argv) > 1 else "control"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    base_sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all()
    spark = get_spark(f"ab_smj_{arm}")
    if arm == "shj":
        # Prefer shuffled hash join over sort-merge where sizes allow:
        # no per-task sorted-run buffering of giant match groups.
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    scaled = ensure_scaled_dir(base_sf_dir, mult, spark=spark)

    # Warmup v2 shape: one untimed checksum pass per query per dir,
    # clearCache per query (the r12 hygiene fix, kept).
    warm_log = []
    for warm_dir in (base_sf_dir, scaled):
        for name in VOLUME_SUBSET:
            try:
                _checksum(registry.QUERIES[name](spark, warm_dir))
                warm_log.append(f"warm ok {name}")
            except Exception as exc:  # noqa: BLE001 - record, continue
                warm_log.append(f"warm FAIL {name}: {exc!r}"[:300])
            spark.catalog.clearCache()

    gate = wait_for_idle(threshold_5m=3.0, timeout_s=600.0)

    # Capture config + fingerprint BEFORE the timed loop: a fatal JVM
    # OOM kills the Py4J bridge and any later spark.conf.get would
    # throw away the artifact this run exists to produce.
    conf_rec = {
        "driver_memory": spark.conf.get("spark.driver.memory", "unset"),
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "prefer_smj": spark.conf.get(
            "spark.sql.join.preferSortMergeJoin", "true"
        ),
        "staged_fingerprint": content_fingerprint(scaled),
    }

    timings: dict[str, list[float]] = {}
    status = "completed"
    failed_query = None
    error = None
    for name in VOLUME_SUBSET:
        fn = registry.QUERIES[name]
        reps = []
        try:
            for _ in range(3):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                _checksum(fn(spark, scaled))
                reps.append(round(time.perf_counter() - t0, 3))
            timings[name] = reps
            print(f"ab[{arm}] {name}: {reps}", file=sys.stderr, flush=True)
        except Exception as exc:  # noqa: BLE001 - the crash IS the datum
            status = "crashed"
            failed_query = name
            error = repr(exc)[:500]
            break

    total = round(sum(min(r) for r in timings.values()), 3)
    out = {
        "arm": arm,
        "mult": mult,
        **conf_rec,
        **gate,
        "status": status,
        "failed_query": failed_query,
        "error": error,
        "timings": timings,
        "total_best_sec": total,
        "warm_failures": [w for w in warm_log if "FAIL" in w],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
