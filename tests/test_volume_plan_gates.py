"""Volume-mode join-strategy gates (r13 verdict #7).

The volume protocol sets ``spark.sql.join.preferSortMergeJoin=false``
at mult>=300 (AB_SMJ_r13.json: -15% and completes on an 8 GiB heap —
per-partition hash builds replace the buffered-SMJ match-group heap
spike). Nothing pinned the resulting plan SHAPE, so a future Spark
upgrade could silently flip the join choice back and the volume series
would degrade without any gate firing.

These gates pin the committed r14 dumps, captured against the staged
300x corpus (footer stats large enough that broadcast is off the
table):

- plans/r14/l20_curation_pipeline_volume300_shj.txt — the lever's
  target: the semi/anti joins become ShuffledHashJoin, and the one
  both-sides-huge gram join correctly FALLS BACK to SortMergeJoin
  (SHJ's per-partition build-side size condition unmet — forcing it
  there is the OOM case the lever exists to avoid).
- plans/r14/l20_curation_pipeline_volume300_smj.txt — the default twin:
  all four joins SortMergeJoin. The pair proves the env knob reaches
  the planner.
- t3/l31 dumps — recorded lever-neutral (t3 has no shuffle join at
  all; l31's one inner join stays SMJ) so AB_SMJ_r13's l20/t3 movers
  are attributed correctly: the t3 delta there was heap/sequence
  state, not join strategy.

Regeneration after a Spark upgrade (then re-run these gates):
  SPARK_GRAFT_SF_DIR=<staged 300x dir> SPARK_GRAFT_PREFER_SMJ=false \
    python tools/capture_plans.py plans/r14 volume300_shj \
    l20_curation_pipeline t3_session_window l31_substring_dedup
"""

from __future__ import annotations

import os

import pytest

PLANS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14"
)


def _read(name: str) -> str:
    path = os.path.join(PLANS, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not committed")
    with open(path) as fh:
        return fh.read()


def test_l20_volume_lever_prefers_shuffled_hash():
    plan = _read("l20_curation_pipeline_volume300_shj.txt")
    assert plan.count("ShuffledHashJoin LeftAnti") == 2
    assert plan.count("ShuffledHashJoin LeftSemi") == 1
    # the both-sides-huge gram_h inner join must stay SMJ (deliberate
    # fallback, not a lever failure): exactly one.
    assert plan.count("SortMergeJoin Inner") == 1
    assert "BatchEvalPython" not in plan


def test_l20_default_twin_is_all_smj():
    plan = _read("l20_curation_pipeline_volume300_smj.txt")
    assert "ShuffledHashJoin" not in plan
    assert plan.count("SortMergeJoin") >= 4  # tree + detail lines


def test_t3_and_l31_are_lever_neutral():
    t3 = _read("t3_session_window_volume300_shj.txt")
    assert "SortMergeJoin" not in t3 and "ShuffledHashJoin" not in t3
    l31 = _read("l31_substring_dedup_volume300_shj.txt")
    assert "ShuffledHashJoin" not in l31
    assert "SortMergeJoin Inner" in l31
