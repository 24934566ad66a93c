"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "wall_clock_total", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1, ...}

Two runs, TPC-H style:
- POWER: each headline query alone, best-of-3 -> the ``queries`` dict
  and ``power_total_sec``. At sf0.1 every query is dominated by Spark's
  ~0.15-0.3 s fixed per-job cost (Py4J plan build + scheduling), which
  is the price of an engine built for 1000 executors, not 60 MB.
- THROUGHPUT (the headline ``value``): the whole workload batch
  submitted as concurrent streams (FAIR scheduler), best-of-3
  wall-clock. Concurrency overlaps the fixed per-job cost exactly as a
  warehouse serving real traffic does; this is the number comparable to
  a single-process baseline's sequential total at the same SF.

Headline set: one per operator family, exercising the
scan/join/agg/window/set/time/text/vector paths. The quadratic Jaccard
baseline (l2b) is deliberately excluded — LSH (l2) is the scale path.
Trivial singletons (sub-0.2 s plans that only measure job overhead) are
kept out; volume-bearing text ops (l16/l17/l20/l28) are in.

PROTOCOL NOTE: headline timings materialize via .count(), which lets
Catalyst prune output expressions a query never aggregates — the
number measures plan execution to cardinality, NOT full result
construction. It is kept this way deliberately: BENCH_r{N}.json is a
LONGITUDINAL series and a mid-series protocol change would corrupt
the only cross-round trend signal the driver records. The
design-grade engine-vs-engine evidence lives in VOLUME*.json, whose
harness (tools/volume_bench.py) times BOTH engines under the full
checksum protocol (count + hash of every output column) precisely
because the count convention is not engine-comparable.
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lens_warehouse_spark import registry
from lens_warehouse_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "j1_inner_join",
    "j6_star_join_revenue",
    "j8_asof_latest_event",
    "a3_faceted_counts",
    "a8b_cube",
    "u5_cohort_count",
    "w3_running_total",
    "o5_top_k_per_group",
    "t1_tumbling_window",
    "t3_session_window",
    "f7_json_extract",
    "l1_exact_dedup",
    "l2_minhash_neardup",
    "l9_language_id",
    "l3b_knn_batch",
    "q3_shipping_priority",
    "q10_returned_items",
    "u5d_cohort_visit_counts_fused",
    "l13_tfidf_top_terms",
    "l12_chunking",
    "l16_decontamination",
    "l17_repetition_filter",
    "l20_curation_pipeline",
    "l28_boilerplate_scrub",
]

STREAMS = int(os.environ.get("SPARK_GRAFT_BENCH_STREAMS", "16"))


def drain_depth(load5: float, load15: float) -> dict:
    """Classify machine drain state at gate-pass -> predicted framing band.

    r12 verdict #3: BENCH_r12 (driver, framing 1.32x) vs the same-day
    closing idle run (0.84x) differ only by how drained the machine was,
    but a reader needed BASELINE.md archaeology to know that. This
    encodes BASELINE.md's drain-depth table ("r11 closing bench" +
    r12 calibration points) so every artifact self-reports which band
    its framing should fall in. The 1m+5m gate admits runs up to ~3x
    off the idle floor; the 5m/15m horizons at gate-pass carry the
    residue of the session's own prior heavy phases (tests, volume
    staging), which elevate the 16-stream batch far more than DuckDB's
    sequential loop. Calibration (5m/15m at gate -> observed framing):
    0.74/1.5 -> 0.87; ~1.0/elevated -> 1.45; 2.2/~5 -> 1.43;
    3.0/3.4 -> 1.32; 2.87/10.97 -> 1.74.

    est_mins_since_heavy models the 15m loadavg as exponential decay
    (tau = 15 min) from a machine-saturating job (load ~32 on this
    box): T = 15 * ln(32 / load15), capped at 90 — a coarse but
    monotone "how long ago did something heavy run" stamp.
    """
    import math

    if load5 < 1.0 and load15 < 2.5:
        depth, band = "drained", "0.7-1.2x"
    elif load5 < 3.5 and load15 < 8.0:
        depth, band = "partial", "1.0-1.6x"
    else:
        depth, band = "hot", "1.3-2.0x"
    est = min(90, round(15 * math.log(32 / max(load15, 0.2))))
    return {
        "drain_depth": depth,
        "predicted_framing_band": band,
        "est_mins_since_heavy": est,
    }


def _prev_gated_bench() -> tuple[str | None, dict[str, float]]:
    """Per-query power timings from the most recent PRIOR round's
    idle-gated BENCH artifact (r9 verdict #5: gated same-code power
    readings still spanned 8.2-10.4 s; a per-query ratio vs the last
    gated round separates 'one query regressed' from 'uniform machine
    drift' — >1.5x movers are flagged, an empty list means uniform).
    Non-gated rounds are skipped: comparing against a contaminated
    baseline would flag phantom movers. The driver wraps the JSON line
    under a 'parsed' key; accept both shapes."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    # Exclude the in-progress round's own artifact (r10 review): once
    # the driver writes BENCH_r{N}.json, a same-round re-run comparing
    # against it would read ratio ~1.0 for anything that regressed
    # earlier in round N — masking exactly the drift this detector
    # exists to flag. PROGRESS.jsonl's last line carries the round.
    current_round = None
    try:
        with open(os.path.join(here, "PROGRESS.jsonl")) as fh:
            lines = [ln for ln in fh if ln.strip()]
        if lines:
            current_round = json.loads(lines[-1]).get("round")
    except Exception:
        pass  # no progress file: fall back to newest-gated-artifact
    best: tuple[int, str, dict[str, float]] | None = None
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if isinstance(current_round, int) and rnd >= current_round:
            continue
        try:
            with open(path) as fh:
                doc = json.load(fh)
        except Exception:
            continue
        payload = doc.get("parsed") if isinstance(doc.get("parsed"), dict) else doc
        if not isinstance(payload, dict):
            continue
        if payload.get("contention_gate") != "idle":
            continue
        qs = payload.get("queries")
        if not isinstance(qs, dict) or not qs:
            continue
        if best is None or rnd > best[0]:
            best = (rnd, os.path.basename(path), qs)
    if best is None:
        return None, {}
    return best[1], best[2]


def _duckdb_sequential(sf_dir: str, names: list[str]) -> tuple[float, int]:
    """DuckDB sequential best-of-3 total over the oracle-backed subset of
    ``names`` — the second framing of the 2x bound (r8 verdict #9: both
    framings must travel machine-readably inside BENCH_r{N}.json, not
    only as BASELINE.md prose, so a future change in the driver's
    framing can't retroactively flip the longitudinal series without
    the context). Protocol matches tools/bench_vs_oracle.py: fetchall,
    best-of-3, fresh connection-wide views."""
    import duckdb

    from lens_warehouse_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    total = 0.0
    n = 0
    for name in names:
        sql = registry.ORACLES.get(name)
        if not sql:
            continue
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        total += best
        n += 1
    con.close()
    return round(total, 3), n


def compact_headline(out: dict) -> str:
    """The FINAL stdout line the driver parses, as a string.

    r10 and r11 both recorded ``parsed: null`` in BENCH_r{N}.json
    because the driver captures only the LAST 2000 chars of stdout and
    the verbose record (25 per-query floats + ratio_vs_prev +
    throughput_reps + nested framing) overran the window, clipping the
    head of the JSON. This builder emits the driver-contract fields
    (metric/value/unit/queries/sf) plus the gate/framing SCALARS only
    — ~1.1 KB with the current 25-query headline set — and sheds
    optional fields if a future addition pushes past 1800 bytes, so
    the line can never silently outgrow the tail window again. The
    verbose record lives in BENCH_LOCAL.json (committed every round).
    Tested by tests/test_bench_headline.py.
    """
    seq = out.get("sequential_power_vs_duckdb", {})
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "queries": out["queries"],
        "sf": out["sf"],
        # Core-count self-attribution (r13 verdict #1): requested vs
        # resolved parallelism must travel in the driver-parsed line so
        # a low-core arm is distinguishable from a mislabeled 32-core
        # run. Never shed: they are the point of the r14 fix.
        "cores_requested": out.get("cores_requested"),
        "cores_resolved": out.get("cores_resolved"),
        "cores_affinity": out.get("cores_affinity"),
        "master": out.get("master"),
        "power_total_sec": out.get("power_total_sec"),
        "throughput_median5": out.get("throughput_median5"),
        "ratio_sequential": seq.get("ratio_sequential"),
        "ratio_throughput": seq.get("ratio_throughput"),
        "duckdb_sequential_sec": seq.get("duckdb_sequential_sec"),
        "failed": out.get("failed", []),
        "warmup_protocol": out.get("warmup_protocol"),
        "drift_median": out.get("drift_median"),
        "uniform_drift": out.get("uniform_drift"),
        "regressed": out.get("regressed", []),
        "contention_gate": out.get("contention_gate"),
        "gate_loadavg_5m": out.get("gate_loadavg_5m"),
        # Drain-depth self-attribution (r12 verdict #3): the framing
        # ratio is only comparable round-over-round at like drain
        # depth; the artifact now says which band it expects.
        "drain_depth": out.get("drain_depth"),
        "predicted_framing_band": out.get("predicted_framing_band"),
        "est_mins_since_heavy": out.get("est_mins_since_heavy"),
        "detail": "BENCH_LOCAL.json",
    }
    line = json.dumps(compact)
    if len(line) > 1800:  # tail window is 2000 chars incl. trailing \n
        # Last-resort shedding keeps the driver contract fields intact.
        # ``failed`` is a CONTRACT field (r12 advice): shedding it under
        # byte pressure would make a failing round look clean in the
        # driver artifact while per-query timings survive — it is never
        # popped; the queries-dict truncation below bounds the line
        # instead (a long failed list only shrinks the kept dict).
        for k in ("regressed", "drift_median", "uniform_drift",
                  "gate_loadavg_5m", "duckdb_sequential_sec",
                  "warmup_protocol", "est_mins_since_heavy", "detail",
                  "drain_depth", "predicted_framing_band",
                  # sheddable tail of the cores block: master/affinity
                  # are redundant once requested+resolved survive
                  # (those two are never shed, like ``failed``).
                  "master", "cores_affinity"):
            compact.pop(k, None)
            line = json.dumps(compact)
            if len(line) <= 1800:
                break
    if len(line) > 1800:
        # Optional fields are gone and the line is STILL oversized: the
        # queries dict itself outgrew the window (r12 review finding —
        # the original shedding loop exited here with an oversized line
        # and the driver would have recorded parsed:null again). Keep
        # as many per-query entries as fit, flag the truncation count;
        # the full dict always survives in BENCH_LOCAL.json.
        full = compact["queries"]
        kept: dict[str, float] = {}
        compact["queries_truncated"] = len(full)
        for name in sorted(full):
            trial = {**compact, "queries": {**kept, name: full[name]},
                     "queries_truncated": len(full) - len(kept) - 1}
            if len(json.dumps(trial)) > 1800:
                break
            kept[name] = full[name]
        compact["queries"] = kept
        compact["queries_truncated"] = len(full) - len(kept)
        line = json.dumps(compact)
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all()
    spark = get_spark("bench")
    # Core-count self-attribution (r13 verdict #1): the driver's 8-core
    # arm read per-query times identical to the 32-core run —
    # `suspect_cpus_ignored` — because its restriction was applied via
    # CPU affinity/cgroup, which the old literal local[32] default
    # ignored, and nothing in the artifact recorded what parallelism
    # the session ACTUALLY ran with. Emit requested (env), resolved
    # (the live scheduler's defaultParallelism) and detected-affinity
    # counts plus the master string so every BENCH artifact proves
    # which happened. session.py now defaults cpus from affinity.
    try:
        affinity = len(os.sched_getaffinity(0))
    except (AttributeError, OSError):
        affinity = os.cpu_count()
    cores = {
        "cores_requested": os.environ.get("SPARK_GRAFT_CPUS"),
        "cores_resolved": spark.sparkContext.defaultParallelism,
        "cores_affinity": affinity,
        "master": spark.sparkContext.master,
    }
    # JMH-style warmup: run every headline plan once at the smallest SF so
    # JVM JIT + whole-stage-codegen compilation happen outside the timed
    # region. Timed runs below execute at the target SF only.
    warm_dir = "/root/testdata/sf0.001"
    if warm_dir != sf_dir:
        # Two passes (shared helper with tools/volume_bench.py): one
        # compile pass is not enough for the JIT to reach steady state
        # on the widest plans (l2's banded self-join measured ~1.8 s
        # cold vs 1.26 s steady with a single pass).
        from tools.volume_bench import warm_plans

        warm_plans(spark, HEADLINE, warm_dir)
    # Warmup v2 (r11): the container's JDK moved to 17.0.20 and its
    # C2 ramp got much longer — a 25-rep probe of q1 at sf0.1 read
    # 0.76/0.61/0.64 s on reps 2-4 (where best-of-3 used to sit) but
    # only reached its 0.38 s plateau around rep 8+; the sf0.001
    # passes alone no longer carry the hot paths to steady state, so
    # best-of-3 was recording compile ramp, not the engine (r11's
    # first gated run: uniform drift 1.75-1.98x, regressed=[], DuckDB
    # flat — a JVM/measurement artifact, not a plan change). Three
    # additional untimed passes at the TARGET SF put the timed reps
    # at executions 6-8 of each hot plan. Page-cache state is
    # unchanged by this: the power phase's own rep 1 already warmed
    # the sf0.1 files in every prior round.
    WARM_TARGET_PASSES = 3
    for _wp in range(WARM_TARGET_PASSES):
        for _wname in HEADLINE:
            try:
                registry.QUERIES[_wname](spark, sf_dir).count()
            except Exception:  # noqa: BLE001 - power loop reports failures
                pass

    # Idle gate (r8 verdict #1): BENCH_r08 recorded a loadavg-8.5 start
    # and its 30-70% apparent regression was machine state, not code —
    # bench.py annotated contention but didn't GATE on it, so the
    # driver's longitudinal series now carries a spurious point. Wait
    # (bounded) for the 1m load to clear before the first timed phase;
    # the gate record travels in the artifact either way. Gating AFTER
    # warmup also drains our own warmup load tail.
    from tools.volume_bench import wait_for_idle

    # r10 verdict #2: gate on the 5m average too (< 3.0, bounded 15
    # min) — the 1m-only gate admitted runs whose 5m/15m still carried
    # the session's own test sweep, and r10's longitudinal point read
    # 1.4x elevated purely from that tail.
    gate = wait_for_idle(threshold_5m=3.0, timeout_s=900.0)
    # All three loadavg horizons AT GATE-PASS (r9 verdict #5): the 1m
    # gate can pass while a 5m/15m tail from a prior heavy phase is
    # still decaying — the 10.35 s-class residual power readings need
    # to be attributable post-hoc.
    load1_at_start, load5_at_start, load15_at_start = os.getloadavg()
    # Drain-depth self-attribution (r12 verdict #3): classify the
    # machine state the timed phases will see, so the framing ratio in
    # this artifact carries its own predicted band instead of needing
    # BASELINE.md archaeology to compare round-over-round.
    drain = drain_depth(load5_at_start, load15_at_start)
    # POWER run: isolated per-query timings.
    timings: dict[str, float] = {}
    failed: list[str] = []
    for name in HEADLINE:
        fn = registry.QUERIES[name]
        best = float("inf")
        try:
            for _rep in range(3):  # best-of-3: report steady-state
                spark.catalog.clearCache()  # no cross-rep cache assists
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                df.count()
                best = min(best, time.perf_counter() - t0)
        except Exception as exc:  # noqa: BLE001 - headline must survive
            # One failing query must not abort the whole bench: the
            # driver parses the LAST stdout line, so dying here records
            # NO metric at all even when 24/25 queries succeeded.
            print(f"bench query {name} failed: {exc!r}", file=sys.stderr)
            failed.append(name)
            continue
        timings[name] = round(best, 3)

    # THROUGHPUT run: the full batch as concurrent streams.
    def run_one(name: str) -> None:
        try:
            registry.QUERIES[name](spark, sf_dir).count()
        except Exception as exc:  # noqa: BLE001 - headline must survive
            print(f"bench stream {name} failed: {exc!r}", file=sys.stderr)

    live = [n for n in HEADLINE if n not in failed]
    # r7 verdict #5: the 16-stream wall-clock moved +-20% across idle
    # same-code runs while the power series moved <2% — a best-of-3
    # cannot carry a code-delta signal. Five reps now: ``value`` stays
    # min of the FIRST THREE (the exact longitudinal protocol every
    # prior BENCH_r* used), and ``throughput_median5`` is the readable
    # number — median over all five absorbs the stragglers that one
    # lucky rep hides.
    # Warmup v2 (r11): the concurrent path has its own JIT ramp on top
    # of the sequential one (FAIR-scheduler queues, parallel codegen —
    # the first gated r11 run's five timed reps read 11.2/8.0/6.6/7.2/
    # 5.4 s, still descending at rep 5). Two untimed batch reps first
    # so the five timed reps measure steady state, as the power loop
    # now does.
    for _rep in range(2):
        with ThreadPoolExecutor(max_workers=STREAMS) as pool:
            list(pool.map(run_one, live))
    batch_reps: list[float] = []
    for _rep in range(5):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=STREAMS) as pool:
            list(pool.map(run_one, live))
        batch_reps.append(time.perf_counter() - t0)
    batch_best = min(batch_reps[:3])

    # Dual-framing insurance (r8 verdict #9): measure DuckDB running the
    # same oracle-backed headline set sequentially, so BOTH framings of
    # the 2x bound (16-stream throughput AND sequential power) are
    # machine-readable in every BENCH_r{N}.json.
    try:
        duck_seq, duck_n = _duckdb_sequential(sf_dir, live)
    except Exception as exc:  # noqa: BLE001 - headline metric must survive
        print(f"duckdb sequential framing failed: {exc!r}", file=sys.stderr)
        duck_seq, duck_n = 0.0, 0
    spark_seq = round(
        sum(timings[n] for n in live if n in registry.ORACLES and n in timings), 3
    )

    # Second SF point: the volume-bearing subset at a deterministic 10x
    # scale-up of documents/events, Spark vs DuckDB oracle per query.
    # One SF cannot separate per-row cost from Spark's fixed per-job
    # overhead; the ratio trend across SFs can (and shows the crossover).
    # Written to VOLUME.json, NOT embedded in the stdout headline: the
    # driver captures only a bounded tail of stdout, and round 4's
    # embedded volume_scaling pushed the one JSON line past that capture
    # (BENCH_r04.json recorded parsed:null). The headline line must stay
    # compact and LAST.
    vol_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "VOLUME.json"
    )
    # Remove any previous run's artifact FIRST and UNCONDITIONALLY: a
    # stale VOLUME.json surviving a disabled or failed attempt is
    # indistinguishable from fresh output.
    if os.path.exists(vol_path):
        os.remove(vol_path)
    if os.environ.get("SPARK_GRAFT_VOLSCALE", "1") != "0":
        try:
            from tools.volume_bench import (
                VOLUME_SUBSET,
                volume_scaling_report,
                warm_plans,
            )

            # warm the volume queries NOT in HEADLINE (l31) too
            warm_plans(spark, [n for n in VOLUME_SUBSET if n not in HEADLINE])
            volume_scaling = volume_scaling_report(spark, sf_dir, mult=10)
            with open(vol_path, "w") as fh:
                json.dump(volume_scaling, fh, indent=1)
        except Exception as exc:  # noqa: BLE001 - headline metric must survive
            print(f"volume_scaling failed: {exc!r}", file=sys.stderr)

    # Per-query drift vs the last idle-gated round (r9 verdict #5).
    # Regression flags are MEDIAN-NORMALIZED (r10): a warm-cache /
    # load-tail run elevates every query uniformly (a gated post-test
    # run read 1.13-1.58x across the board with one query over the raw
    # 1.5 threshold), and flagging those reads as a code regression is
    # exactly the misattribution this detector exists to prevent. A
    # real single-query regression stands out from the run's own
    # median; uniform drift flags nothing and is visible in
    # drift_median itself.
    prev_name, prev_q = _prev_gated_bench()
    ratio_vs_prev: dict[str, float] = {}
    regressed: list[str] = []
    drift_median = None
    for name, sec in timings.items():
        p = prev_q.get(name)
        if isinstance(p, (int, float)) and p > 0:
            ratio_vs_prev[name] = round(sec / p, 2)
    if ratio_vs_prev:
        import statistics

        drift_median = round(statistics.median(ratio_vs_prev.values()), 2)
        regressed = [
            n for n, r in ratio_vs_prev.items()
            if r / max(drift_median, 0.01) > 1.5
        ]
    # Advisor r10: median-normalization makes a genuine ALL-queries
    # regression (e.g. in the shared scan helper) invisible to
    # ``regressed`` — it looks exactly like machine drift. Surface it
    # mechanically: uniform_drift flags a run whose median ratio itself
    # exceeds 1.3x the last gated round. With the 5m gate above, a
    # flagged run on unchanged plans means investigate the shared path.
    uniform_drift = bool(drift_median is not None and drift_median > 1.3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    out = {
        "metric": "wall_clock_total",
        "value": round(batch_best, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        **cores,
        "mode": "throughput_batch",
        "streams": STREAMS,
        "power_total_sec": round(sum(timings.values()), 3),
        # Trend consumers must be able to tell a faster round from a
        # smaller one: a crashing query shrinks power_total_sec, which
        # would otherwise read as a speedup in the longitudinal series.
        "failed": failed,
        # Machine-state stamp (volume_bench.py:247 precedent): the r6
        # +10.6% throughput regression could not be attributed to
        # contention vs code because BENCH artifacts carried no load
        # field. loadavg >~1 at start means ratios are suspect.
        "loadavg_1m_at_start": round(load1_at_start, 2),
        "loadavg_5m_at_start": round(load5_at_start, 2),
        "loadavg_15m_at_start": round(load15_at_start, 2),
        "throughput_median5": round(sorted(batch_reps)[2], 3),
        "throughput_reps": [round(r, 3) for r in batch_reps],
        # Both framings of the 2x bound, machine-readable (r8 verdict
        # #9): sequential = Spark power total vs DuckDB sequential total
        # over the oracle-backed headline subset (n_queries of them);
        # throughput = the 16-stream median5 vs the same DuckDB number.
        # The sequential ratio carries Spark's ~0.2 s/job scheduling
        # floor x 24 queries at sf0.1 — a fixed-cost artifact, not
        # per-row cost (see BASELINE.md; VOLUME_*x shows the crossover).
        "sequential_power_vs_duckdb": {
            "n_queries": duck_n,
            "spark_power_sec": spark_seq,
            "duckdb_sequential_sec": duck_seq,
            "ratio_sequential": (
                round(spark_seq / duck_seq, 2) if duck_seq else None
            ),
            "ratio_throughput": (
                round(sorted(batch_reps)[2] / duck_seq, 2) if duck_seq else None
            ),
        },
        # Drift detector (r9 verdict #5): per-query power ratio vs the
        # previous idle-gated round. regressed = names moving >1.5x
        # RELATIVE TO THIS RUN'S MEDIAN ratio (r10) — EMPTY means any
        # total drift is uniform, i.e. machine state, not a code
        # regression in one plan; drift_median carries the uniform
        # component for attribution.
        # Warmup protocol version travels in the artifact so the
        # longitudinal series carries the r11 change annotation: v2 =
        # +3 untimed target-SF power passes and +2 untimed concurrent
        # batch reps before the timed regions (JDK 17.0.20's longer C2
        # ramp; steady state unchanged, so pre-r11 points — which were
        # already steady under v1 warmup — stay comparable).
        "warmup_protocol": "v2",
        "drift_baseline": prev_name,
        "drift_median": drift_median,
        "uniform_drift": uniform_drift,
        "ratio_vs_prev": ratio_vs_prev,
        "regressed": regressed,
        **drain,
        **gate,
        # r9: the note keys off the GATE, not the raw 5m average — the
        # load sample now happens after our own warmup, so a 5m>1
        # reading usually reflects the warmup itself, not an external
        # process (the r8 heuristic would mislabel every gated run).
        "contention_note": (
            "idle start (gated)"
            if gate["contention_gate"] == "idle"
            else "idle-gate timed out: throughput suspect, read "
            "power/VOLUME series"
        ),
    }
    # Parse-proofing (r10 verdict #1, r11 verdict #1): BENCH_r10 and
    # BENCH_r11 both recorded parsed:null because the driver's
    # fixed-size 2000-char tail capture clipped the HEAD of the verbose
    # stdout JSON line (25 per-query floats + ratio_vs_prev +
    # throughput_reps push it past the window). Defense in depth:
    #   1. the FULL verbose record goes to BENCH_LOCAL.json (clip-proof
    #      repo copy, committed each round);
    #   2. the final stdout line is a COMPACT subset — the driver
    #      contract fields (metric/value/unit/queries/sf) plus the gate
    #      and framing scalars — sized well under the tail window. The
    #      25-entry queries dict is ~750 bytes; the whole compact line
    #      stays < 1.5 KB, and compact_headline() sheds fields — and as
    #      a last resort per-query entries, flagged via
    #      queries_truncated — so the emitted line can NEVER exceed
    #      1800 bytes (pinned by tests/test_bench_headline.py).
    local_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"
    )
    try:
        with open(local_path, "w") as fh:
            json.dump(out, fh, indent=1)
            fh.write("\n")
    except Exception as exc:  # noqa: BLE001 - stdout line must still print
        print(f"BENCH_LOCAL.json write failed: {exc!r}", file=sys.stderr)
    # Compact headline JSON as the FINAL stdout line (driver contract).
    sys.stdout.flush()
    print(compact_headline(out))


if __name__ == "__main__":
    main()
