"""t1-shape smoke tests: the driver contract surface itself."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"l_returnflag", "l_linestatus", "sum_qty", "count_order"} <= set(df.columns)


def test_every_oracle_key_has_query():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) > 0


def test_all_queries_run_on_smoke_sf(spark, sf_dir):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(5).collect()


def test_failed_rows_jump_the_rotation_queue(tmp_path, monkeypatch):
    """Round-7 rotation tier 0: a name whose LATEST driver row errored
    must head the queries() order so its fix is re-verified next round;
    an OLDER error superseded by a clean row must not. Malformed or
    rows-only ('no_oracle') artifacts must not break the ordering."""
    import json

    d = str(tmp_path)
    with open(f"{d}/CORRECTNESS_r01.json", "w") as fh:
        json.dump(
            {
                "a1_count_distinct": {"err": "boom"},  # later superseded
                "w3_running_total": {"err": "no_oracle"},  # rows-only, not a fail
            },
            fh,
        )
    with open(f"{d}/CORRECTNESS_r02.json", "w") as fh:
        json.dump(
            {
                "a1_count_distinct": {"err": None, "hash_match": True},
                "l34_inverted_index": {"err": "TypeError: unhashable"},
            },
            fh,
        )
    with open(f"{d}/CORRECTNESS_r03.json", "w") as fh:
        fh.write("{not json")  # must be skipped, not raise
    monkeypatch.setattr(entry_mod, "_HERE", d)

    failed = entry_mod._failed_last_check()
    assert failed == {"l34_inverted_index"}
    order = list(entry_mod.queries())
    assert order[0] == "l34_inverted_index"
    assert "a1_count_distinct" in order and "w3_running_total" in order


def test_rewritten_queries_lead_checked_tier(tmp_path, monkeypatch):
    """r8 rotation: a checked query whose implementing module changed
    since its last driver row must head the checked tier (oldest driver
    row first), ahead of the family round-robin — so a rewrite is
    re-verified the next round, not when the rotation happens to reach
    it. Names with current rows and unchanged modules keep their
    round-robin order, now oldest-checked-first inside each family."""
    import json

    from lens_warehouse_spark import registry

    d = str(tmp_path)
    with open(f"{d}/CORRECTNESS_r01.json", "w") as fh:
        json.dump(
            {
                "a1_count_distinct": {"err": None, "hash_match": True},
                "l28_boilerplate_scrub": {"err": None, "hash_match": True},
            },
            fh,
        )
    with open(f"{d}/CORRECTNESS_r02.json", "w") as fh:
        json.dump({"w3_running_total": {"err": None, "hash_match": True}}, fh)
    monkeypatch.setattr(entry_mod, "_HERE", d)
    monkeypatch.setattr(entry_mod, "_dirty_files", lambda: set())

    l28_src = registry.QUERIES["l28_boilerplate_scrub"].__code__.co_filename

    def fake_commit_time(path):
        if path == l28_src:
            return 300  # module rewritten AFTER its r01 driver row...
        if path.endswith("CORRECTNESS_r01.json"):
            return 100  # ...which was committed here
        if path.endswith("CORRECTNESS_r02.json"):
            return 200
        return 50  # every other module predates its driver row

    monkeypatch.setattr(entry_mod, "_git_commit_time", fake_commit_time)

    order = list(entry_mod.queries())
    pos = {n: i for i, n in enumerate(order)}
    # unseen tiers (everything not in the artifacts) come first; among
    # the three CHECKED names, the stale one leads
    assert pos["l28_boilerplate_scrub"] < pos["a1_count_distinct"]
    assert pos["l28_boilerplate_scrub"] < pos["w3_running_total"]
    # non-stale checked names: oldest driver round first
    assert pos["a1_count_distinct"] < pos["w3_running_total"]

    # and with no git information at all, ordering still works
    monkeypatch.setattr(entry_mod, "_git_commit_time", lambda p: 0)
    assert set(entry_mod.queries()) == set(order)
