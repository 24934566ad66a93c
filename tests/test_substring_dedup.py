"""Semantics tests for l31 exact substring (duplicated-span) detection."""

from __future__ import annotations

from lens_warehouse_spark.llm.dedup import substring_dup_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


SHARED = "alpha beta gamma delta epsilon zeta eta theta"  # exactly 8 tokens


def test_cross_doc_span_detected(spark):
    rows = [
        (1, f"start one two three {SHARED} tail1 tail2"),
        (2, f"other prefix words here {SHARED} different suffix"),
        (3, "totally unique tokens q w e r t y u i o p"),
    ]
    out = {
        r["doc_id"]: r
        for r in substring_dup_stats(_docs(spark, rows), w=8).collect()
    }
    # docs 1 and 2 share exactly one 8-token window; doc 3 shares none
    assert out[1]["n_dup_windows"] == 1
    assert out[2]["n_dup_windows"] == 1
    assert out[3]["n_dup_windows"] == 0
    assert out[3]["dup_frac"] == 0.0


def test_within_doc_repetition_is_not_cross_doc_dup(spark):
    rows = [
        (1, f"{SHARED} junk {SHARED}"),  # repeats only within itself
        (2, "unique filler a b c d e f g h i j"),
    ]
    out = {
        r["doc_id"]: r
        for r in substring_dup_stats(_docs(spark, rows), w=8).collect()
    }
    assert out[1]["n_dup_windows"] == 0


def test_short_docs_excluded_and_counts_exact(spark):
    rows = [
        (1, "one two three"),  # < 8 tokens -> excluded entirely
        (2, "t1 t2 t3 t4 t5 t6 t7 t8 t9"),  # 9 tokens -> 2 windows
        (3, "t1 t2 t3 t4 t5 t6 t7 t8 t9"),  # identical -> both dup
    ]
    out = {
        r["doc_id"]: r
        for r in substring_dup_stats(_docs(spark, rows), w=8).collect()
    }
    assert 1 not in out
    assert out[2]["n_windows"] == 2
    assert out[2]["n_dup_windows"] == 2
    assert out[2]["dup_frac"] == 1.0


# Randomized cross-check against a pure-Python reference, tiny vocab so
# cross-document window collisions actually occur.
from hypothesis import given, settings
from hypothesis import strategies as st

_docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c"]), min_size=1, max_size=12
    ).map(" ".join),
    min_size=1,
    max_size=10,
)


def _reference(rows, w):
    wins = {}  # hash -> set of doc_ids
    per_doc = {}
    for doc_id, text in rows:
        toks = text.split(" ")
        if len(toks) < w:
            continue
        windows = [" ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)]
        per_doc[doc_id] = windows
        for win in set(windows):
            wins.setdefault(win, set()).add(doc_id)
    out = {}
    for doc_id, windows in per_doc.items():
        dup = sum(1 for win in windows if len(wins[win]) >= 2)
        out[doc_id] = (len(windows), dup)
    return out


@settings(max_examples=10, deadline=None)
@given(_docs_strategy)
def test_matches_python_reference(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    w = 3
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"])
        for r in substring_dup_stats(_docs(spark, rows), w=w).collect()
    }
    assert got == _reference(rows, w)
