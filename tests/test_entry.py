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
