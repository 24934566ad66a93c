"""Pin the bench headline-line contract (r11 verdict #1).

The driver records only the LAST 2000 chars of bench.py's stdout and
parses the final line as JSON. BENCH_r10 and BENCH_r11 both came back
``parsed: null`` because the verbose record overran that window and the
head of the JSON was clipped. bench.compact_headline() is the fix: the
final stdout line is a compact subset sized under 1800 bytes, with the
verbose record redirected to BENCH_LOCAL.json. These tests feed the
builder the REAL shape of a bench record (r11's committed
BENCH_LOCAL.json when present, else a synthetic twin) so a future field
addition that would re-break driver parsing fails here first.
"""

from __future__ import annotations

import json
import os

import bench

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Synthetic twin of a full bench record: 25 headline queries (the real
# set size), every verbose field populated the way main() populates it.
_SYNTH = {
    "metric": "wall_clock_total",
    "value": 2.251,
    "unit": "sec",
    "queries": {f"q{i}_some_operator_name_{i:02d}": 0.123 for i in range(25)},
    "sf": 0.1,
    "mode": "throughput_batch",
    "streams": 16,
    "power_total_sec": 8.319,
    "failed": [],
    "loadavg_1m_at_start": 0.5,
    "loadavg_5m_at_start": 0.5,
    "loadavg_15m_at_start": 0.5,
    "throughput_median5": 2.251,
    "throughput_reps": [2.2, 2.25, 2.251, 2.3, 2.4],
    "sequential_power_vs_duckdb": {
        "n_queries": 24,
        "spark_power_sec": 8.3,
        "duckdb_sequential_sec": 2.4,
        "ratio_sequential": 3.46,
        "ratio_throughput": 0.93,
    },
    "warmup_protocol": "v2",
    "drift_baseline": "BENCH_r10.json",
    "drift_median": 0.93,
    "uniform_drift": False,
    "ratio_vs_prev": {f"q{i}_some_operator_name_{i:02d}": 1.0 for i in range(25)},
    "regressed": [],
    "contention_gate": "idle",
    "gate_waited_sec": 240.0,
    "gate_loadavg_1m": 0.11,
    "gate_loadavg_5m": 2.87,
    "drain_depth": "partial",
    "predicted_framing_band": "1.0-1.6x",
    "est_mins_since_heavy": 33,
    "contention_note": "idle start (gated)",
}


def _records():
    recs = [("synthetic", _SYNTH)]
    local = os.path.join(REPO, "BENCH_LOCAL.json")
    if os.path.exists(local):
        with open(local) as fh:
            recs.append(("BENCH_LOCAL.json", json.load(fh)))
    return recs


def test_headline_fits_driver_tail_window():
    for src, rec in _records():
        line = bench.compact_headline(rec)
        assert len(line) <= 1800, (
            f"{src}: compact headline is {len(line)} bytes; the driver "
            "tail window is 2000 chars — shed fields or shrink names"
        )
        assert "\n" not in line


def test_headline_is_parseable_json_with_driver_contract_fields():
    for src, rec in _records():
        parsed = json.loads(bench.compact_headline(rec))
        # Driver contract: metric/value/unit/queries/sf must survive
        # even the last-resort field shedding.
        for key in ("metric", "value", "unit", "queries", "sf"):
            assert key in parsed, f"{src}: driver field {key!r} missing"
        assert parsed["queries"] == rec["queries"]
        assert parsed["value"] == rec["value"]


def test_headline_survives_tail_clip_simulation():
    # Exactly what the driver does: keep the last 2000 chars of stdout,
    # take the final line, json.loads it.
    for src, rec in _records():
        stdout = "warmup noise line\n" * 40 + bench.compact_headline(rec) + "\n"
        tail = stdout[-2000:]
        last = tail.rstrip("\n").rsplit("\n", 1)[-1]
        parsed = json.loads(last)  # raises if the head was clipped
        assert parsed["metric"] == rec["metric"], src


def test_headline_sheds_fields_rather_than_overflowing():
    fat = dict(_SYNTH)
    # 60 long query names ≈ 2.6 KB of queries alone — forces shedding
    # past the optional fields INTO the queries dict itself.
    fat["queries"] = {
        f"extremely_long_query_name_for_overflow_test_{i:03d}": 0.111
        for i in range(60)
    }
    line = bench.compact_headline(fat)
    # The whole point: the final line must FIT (r12 review finding —
    # the first shedding loop could exit with an oversized line and
    # reintroduce the driver's parsed:null failure).
    assert len(line) <= 1800, f"shed line still {len(line)} bytes"
    parsed = json.loads(line)
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in parsed
    # Truncation is flagged, never silent, and what remains is a
    # prefix-consistent subset of the real dict.
    assert parsed["queries_truncated"] == 60 - len(parsed["queries"])
    assert parsed["queries_truncated"] > 0
    for k, v in parsed["queries"].items():
        assert fat["queries"][k] == v


def test_failed_list_survives_field_shedding():
    """r12 advice: ``failed`` is a contract field — shedding it under
    byte pressure would make a failing round look clean in the driver
    artifact while per-query timings survive. Even the worst-case
    record (oversized queries dict AND a populated failed list) must
    emit the failures."""
    fat = dict(_SYNTH)
    fat["queries"] = {
        f"extremely_long_query_name_for_overflow_test_{i:03d}": 0.111
        for i in range(60)
    }
    fat["failed"] = ["l99_some_crashed_query", "j42_another_crashed_query"]
    line = bench.compact_headline(fat)
    assert len(line) <= 1800
    parsed = json.loads(line)
    assert parsed["failed"] == fat["failed"]


def test_drain_depth_fields_in_headline():
    """r12 verdict #3: the headline must self-report drain depth and
    the predicted framing band so the longitudinal series is readable
    without BASELINE.md archaeology."""
    parsed = json.loads(bench.compact_headline(_SYNTH))
    assert parsed["drain_depth"] == "partial"
    assert parsed["predicted_framing_band"] == "1.0-1.6x"
    assert parsed["est_mins_since_heavy"] == 33


def test_cores_attribution_in_headline():
    """r13 verdict #1: the driver's low-core arm was indistinguishable
    from a mislabeled 32-core run because nothing recorded the RESOLVED
    parallelism. requested+resolved must survive even worst-case
    shedding; a run where the two disagree must be visible as such."""
    rec = dict(
        _SYNTH,
        cores_requested="8",
        cores_resolved=32,  # the r13 failure shape: asked 8, ran 32
        cores_affinity=32,
        master="local[32]",
    )
    parsed = json.loads(bench.compact_headline(rec))
    assert parsed["cores_requested"] == "8"
    assert parsed["cores_resolved"] == 32
    # Worst-case shedding (oversized queries dict): the two attribution
    # scalars still travel, like ``failed``.
    fat = dict(rec)
    fat["queries"] = {
        f"extremely_long_query_name_for_overflow_test_{i:03d}": 0.111
        for i in range(60)
    }
    line = bench.compact_headline(fat)
    assert len(line) <= 1800
    shed = json.loads(line)
    assert shed["cores_requested"] == "8"
    assert shed["cores_resolved"] == 32


def test_session_default_cpus_tracks_affinity():
    """session.get_spark must default local[N] from detected CPU
    affinity (r13 verdict #1), not a literal 32, while an explicit
    $SPARK_GRAFT_CPUS still wins."""
    from lens_warehouse_spark import session as s

    assert s._detected_cpus() == len(os.sched_getaffinity(0))
    # The resolution expression itself: env set -> env; unset -> affinity.
    env = {"SPARK_GRAFT_CPUS": "7"}
    assert str(None or env.get("SPARK_GRAFT_CPUS") or s._detected_cpus()) == "7"
    env = {}
    assert (
        str(None or env.get("SPARK_GRAFT_CPUS") or s._detected_cpus())
        == str(len(os.sched_getaffinity(0)))
    )


def test_drain_depth_classifier_matches_baseline_calibration():
    """The classifier must reproduce BASELINE.md's drain-depth table:
    every recorded (load5, load15) -> framing observation lands in the
    band the classifier predicts for it."""
    observed = [  # (load5, load15, framing) from BASELINE.md r11/r12
        (0.74, 1.5, 0.87),
        (2.2, 5.0, 1.43),
        (3.0, 3.4, 1.32),
        (2.87, 10.97, 1.74),
    ]
    for load5, load15, framing in observed:
        d = bench.drain_depth(load5, load15)
        lo, hi = (float(x.rstrip("x")) for x in
                  d["predicted_framing_band"].split("-"))
        assert lo <= framing <= hi, (load5, load15, framing, d)
        assert d["est_mins_since_heavy"] > 0
