"""Re-validate the t3 islands-vs-native pin under the r12 protocol.

T3_PIN_r08 pinned sessionize_islands over the native session_window
aggregate at the 1000x point, but it predates warmup v2, the 16 GiB
volume heap, and two JDK updates (r12 verdict #4: t3 at 1.66x is the
worst volume entry and its pin is the oldest measurement still
governing a shipped plan choice). This harness re-runs the A/B —
islands vs native vs the DuckDB oracle — at a given multiplier under
the CURRENT protocol: staged-dir fingerprint, warmup v2 (untimed
checksum passes to steady state), bounded idle gate, checksum timing
(count + xxhash64 of all output columns, engine-side), clearCache per
rep, fresh DuckDB connection per rep, two independent batches of 3
paired reps. The two Spark forms' checksums are also compared, so the
A/B doubles as an equivalence check.

Piggybacked constant-work probe (r12 verdict #6): l9/l28 read 1.74x/
1.46x at 300x but <=0.61x at 1000x; the fixed-cost hypothesis says
Spark's side is fixed + linear while DuckDB's per-row cost bends past
its cache envelope. The probe times l9/l28 on the BASE sf0.1 dir from
inside this session — constant work regardless of mult — so comparing
the probe across the 300x and 1000x runs separates session/scale
state from genuine per-row cost.

Usage: python tools/t3_pin.py [mult]    (default 300; artifact merged
into T3_PIN_r13.json by the caller, one key per mult)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from pyspark.sql import functions as F

from lens_warehouse_spark import registry
from lens_warehouse_spark.catalog import TABLES, table
from lens_warehouse_spark.session import get_spark
from tools.volume_bench import (
    _timed_reps,
    content_fingerprint,
    ensure_scaled_dir,
    wait_for_idle,
)

PROBE_QUERIES = ["l9_language_id", "l28_boilerplate_scrub"]


def t3_native(spark, sf_dir: str):
    """Native session_window form of t3 (same output contract as the
    registered islands form: user_id, session_start_ms, n_events).
    session_window merges at gap < 30 min and splits at >= 30 min —
    identical semantics to sessionize_islands; the checksum equality
    below re-proves it on the staged corpus."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_millis(F.col("w.start")).alias("session_start_ms"),
            "n_events",
        )
        .orderBy("user_id", "session_start_ms")
    )


def _spark_checksum(df) -> tuple:
    h = F.xxhash64(*[F.col(c) for c in df.columns]).cast("decimal(38,0)")
    row = df.agg(F.count(F.lit(1)), F.sum(h)).collect()[0]
    return (row[0], str(row[1]))


def _time_spark(spark, build, reps: int = 3) -> tuple[list[float], tuple]:
    sums: list[tuple] = []

    def run():
        sums.append(_spark_checksum(build()))

    times = _timed_reps(run, reps=reps, setup=spark.catalog.clearCache)
    return times, sums[0]


def _time_duckdb(sf_dir: str, sql: str, reps: int = 3) -> list[float]:
    out = []
    for _ in range(reps):
        con = duckdb.connect()
        for t in TABLES:
            path = f"{sf_dir}/{t}.parquet"
            src = f"{path}/*.parquet" if os.path.isdir(path) else path
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
        wrapped = f"SELECT count(*), sum(hash(t)) FROM ({sql}) t"
        t0 = time.perf_counter()
        con.execute(wrapped).fetchall()
        out.append(round(time.perf_counter() - t0, 3))
        con.close()
    return out


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    base_sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all()
    spark = get_spark("t3_pin")
    scaled = ensure_scaled_dir(base_sf_dir, mult, spark=spark)

    islands = registry.QUERIES["t3_session_window"]
    sql = registry.ORACLES["t3_session_window"]

    # Warmup v2: untimed checksum passes of every timed plan (both
    # forms + probes) until the hot paths are at steady state.
    for _ in range(2):
        for build in (lambda: islands(spark, scaled), lambda: t3_native(spark, scaled)):
            try:
                _spark_checksum(build())
            except Exception:  # noqa: BLE001 - warmup is best-effort
                pass
            spark.catalog.clearCache()
        for name in PROBE_QUERIES:
            try:
                _spark_checksum(registry.QUERIES[name](spark, base_sf_dir))
            except Exception:  # noqa: BLE001
                pass
            spark.catalog.clearCache()

    gate = wait_for_idle(threshold_5m=3.0, timeout_s=900.0)

    batches = []
    checks = {}
    for b in range(2):
        isl_t, isl_sum = _time_spark(spark, lambda: islands(spark, scaled))
        nat_t, nat_sum = _time_spark(spark, lambda: t3_native(spark, scaled))
        duck_t = _time_duckdb(scaled, sql)
        batches.append(
            {"islands": isl_t, "native": nat_t, "duckdb": duck_t}
        )
        checks = {"islands": isl_sum, "native": nat_sum}

    # Constant-work probe at the BASE dir, inside this (scaled) session.
    probe = {}
    for name in PROBE_QUERIES:
        fn = registry.QUERIES[name]
        probe[name] = _timed_reps(
            lambda: _spark_checksum(fn(spark, base_sf_dir)),
            reps=3,
            setup=spark.catalog.clearCache,
        )

    isl_best = min(min(b["islands"]) for b in batches)
    nat_best = min(min(b["native"]) for b in batches)
    duck_best = min(min(b["duckdb"]) for b in batches)
    out = {
        "mult": mult,
        "protocol": "r12 (warmup v2, idle gate 1m/5m, checksum timing, "
        "clearCache per rep, fresh DuckDB connection per rep, "
        "2 batches x 3 reps)",
        "staged_fingerprint": content_fingerprint(scaled),
        "spark_driver_memory": spark.conf.get("spark.driver.memory", "unset"),
        **gate,
        "batches": batches,
        "islands_best": isl_best,
        "native_best": nat_best,
        "duckdb_best": duck_best,
        "ratio_islands_vs_duckdb": round(isl_best / duck_best, 2) if duck_best else None,
        "ratio_native_vs_islands": round(nat_best / isl_best, 2) if isl_best else None,
        "forms_agree": checks["islands"] == checks["native"],
        "checksums": checks,
        "probe_base_dir": probe,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
