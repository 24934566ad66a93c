"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``lens_warehouse_spark/``; this file is a thin
adapter over its registry.
"""

from __future__ import annotations

import glob
import itertools
import json
import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

from lens_warehouse_spark import registry

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary, TPC-H Q1 shape) on sf0.001."""
    return registry.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def _already_checked() -> set[str]:
    """Query names that earned a row in any prior round's driver check."""
    seen: set[str] = set()
    for path in glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json")):
        try:
            with open(path) as fh:
                seen |= set(json.load(fh))
        except Exception:
            pass
    return seen


def _failed_last_check() -> set[str]:
    """Names whose MOST RECENT driver row was a hard error (err set and
    not the rows-only 'no_oracle' marker) — these must jump the queue
    so a fix is re-verified the very next round (l34, round 6)."""
    latest: dict[str, tuple[int, bool]] = {}
    for path in glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except Exception:
            continue
        for name, row in rows.items():
            bad = bool(isinstance(row, dict) and row.get("err") not in (None, "no_oracle"))
            if name not in latest or rnd > latest[name][0]:
                latest[name] = (rnd, bad)
    return {n for n, (_, bad) in latest.items() if bad}


def _coverage_order(names: list[str]) -> list[str]:
    """Order queries for the driver's first-N sample so no slot repeats a
    prior round while unchecked queries remain: three strict tiers —
    never-driver-checked oracle-backed, then never-checked rows-only,
    then already-checked — each round-robined across operator families
    (the letter prefix: j/w/p/o/f/t/l/x/q/a/u/s) for §2 diversity.
    Tiering BEFORE the family round-robin matters: small families
    exhaust their unchecked members mid-rotation, and interleaving them
    with large families would backfill those slots with repeats.
    """
    seen = _already_checked()
    index = {n: i for i, n in enumerate(names)}

    def fam_round_robin(subset: list[str]) -> list[str]:
        fams: dict[str, list[str]] = {}
        for n in subset:
            m = re.match(r"[a-z]+", n)
            fams.setdefault(m.group(0) if m else n, []).append(n)
        for fam in fams.values():
            fam.sort(key=lambda n: index[n])
        return [
            n
            for tier in itertools.zip_longest(*fams.values())
            for n in tier
            if n is not None
        ]

    failed = _failed_last_check()
    refail = [n for n in names if n in failed]
    unseen_oracle = [
        n
        for n in names
        if n not in seen and n not in failed and n in registry.ORACLES
    ]
    unseen_rows = [
        n
        for n in names
        if n not in seen and n not in failed and n not in registry.ORACLES
    ]
    checked = [n for n in names if n in seen and n not in failed]
    # Tier 0: names whose latest driver row ERRORED — the fix must be
    # re-verified next round, not whenever the round-robin reaches it.
    return (
        refail
        + fam_round_robin(unseen_oracle)
        + fam_round_robin(unseen_rows)
        + fam_round_robin(checked)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    order = _coverage_order(list(registry.QUERIES))
    return {n: registry.QUERIES[n] for n in order}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys -> rows-only check."""
    return dict(registry.ORACLES)
