"""Driver-sample rotation invariants (__spark_entry__._coverage_order).

The rotation decides which 50 queries the grading driver re-verifies
each round, so its tiering is product-facing: a starved tier means a
rewritten or long-unsampled query ships rounds of changes with no
driver row. r10 and r11 verdicts both traced that failure to
module-granularity staleness flooding the fast lane; r12 replaced it
with function-source-hash staleness + an oldest-driver-row rest tier.
These tests pin the invariants structurally (no golden lists), so they
stay true as CORRECTNESS artifacts accumulate.
"""

from __future__ import annotations

import re

import __spark_entry__ as entry
from lens_warehouse_spark import registry

registry.load_all()


def _tiers():
    return entry._coverage_order(list(registry.QUERIES), explain=True)


def test_tiers_partition_the_registry():
    tiers = _tiers()
    flat = [n for t in tiers.values() for n in t]
    assert len(flat) == len(set(flat)) == len(registry.QUERIES)
    assert set(flat) == set(registry.QUERIES)
    assert list(entry.queries()) == flat


def test_rest_tier_drains_oldest_driver_rows_first_within_family():
    """Within each operator family, the rest tier must order names by
    their last driver round non-decreasingly — the r11 verdict's
    'tpch.py last sampled r4/r5' starvation is impossible under this
    invariant, because nothing with a NEWER row can precede an older
    one inside its family slot sequence."""
    tiers = _tiers()
    last = entry._latest_round_by_name()
    fams: dict[str, list[int]] = {}
    for n in tiers["rest"]:
        fam = re.match(r"[a-z]+", n).group(0)
        fams.setdefault(fam, []).append(last.get(n, 0))
    for fam, rounds in fams.items():
        assert rounds == sorted(rounds), (
            f"family {fam!r} rest tier not oldest-first: {rounds}"
        )


def test_fn_stale_only_contains_genuinely_changed_functions():
    """The fast lane must hold ONLY names whose ledger change-round
    postdates their last driver row (or whose live hash disagrees with
    the ledger) — a module-wide edit flooding it is the regression this
    guards against. Uses the SAME fn_hash the ledger writer and
    _fn_hash_stale use (r12 advice: an inline dedent+sha1 copy here
    could diverge silently from the production hasher)."""
    import json
    import os

    from tools.update_src_hashes import PATH as LEDGER_PATH
    from tools.update_src_hashes import fn_hash

    assert os.path.exists(LEDGER_PATH)
    tiers = _tiers()
    last = entry._latest_round_by_name()
    with open(LEDGER_PATH) as fh:
        ledger = json.load(fh)
    for n in tiers["fn_stale"]:
        rec = ledger.get(n)
        live = fn_hash(registry.QUERIES[n])
        genuinely_changed = (
            rec is None
            or rec.get("h") != live
            or last.get(n, 0) < rec.get("r", 0)
        )
        assert genuinely_changed, (
            f"{n} sits in the fn_stale fast lane but neither its ledger "
            "round nor its live hash justifies it"
        )


def test_unhashable_unledgered_name_is_not_pinned_stale():
    """r12 advice: a query whose source inspect cannot retrieve (h None)
    and which the ledger has never seen (rec None) must NOT be treated
    as rewritten-every-round — that would permanently consume a
    fast-lane driver slot. _fn_hash_stale skips it (rest tier)."""
    from lens_warehouse_spark import registry as reg

    fake = "zz99_unhashable_phantom"
    assert fake not in reg.QUERIES
    # exec'd source: inspect.getsource raises OSError -> fn_hash None
    ns: dict = {}
    exec("def _phantom(spark, sf_dir):\n    return None", ns)
    reg.QUERIES[fake] = ns["_phantom"]
    try:
        stale = entry._fn_hash_stale([fake], {})
        assert fake not in stale
    finally:
        del reg.QUERIES[fake]


def test_priority_tier_is_subset_of_unsampled_verdict_rewrites():
    """priority names must still be AWAITING their first post-rewrite
    driver row; once sampled they go inert, so the tier can only
    shrink between code changes. (r12 review finding #6: the first
    version of this test asserted a tautology — it now checks the real
    membership rule against the module-level _VERDICT_RESAMPLE dict.)"""
    tiers = _tiers()
    last = entry._latest_round_by_name()
    for n in tiers["priority"]:
        assert n in entry._VERDICT_RESAMPLE, (
            f"{n} in priority tier but not a verdict-flagged rewrite"
        )
        assert last.get(n, 0) < entry._VERDICT_RESAMPLE[n], (
            f"{n} was already sampled in round {last.get(n)} — it must "
            "be inert, not re-consuming a priority slot"
        )
    # and the converse: every still-unsampled verdict rewrite IS there
    for n, rnd in entry._VERDICT_RESAMPLE.items():
        if n in registry.QUERIES and last.get(n, 0) < rnd and n in last:
            assert n in tiers["priority"] or n in tiers["refail"], (
                f"verdict rewrite {n} (r{rnd}) missing from priority tier"
            )
