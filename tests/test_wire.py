"""EP-1 wire-format parsing + EP-2 keyset pagination."""

from __future__ import annotations

import pytest

from lens_warehouse_spark.operators.cohort import cohort_count
from lens_warehouse_spark.operators.cohort_queries import EXAMPLE_COHORT
from lens_warehouse_spark.operators.wire import cohort_from_json, paginate

SF = "/root/testdata/sf0.001"

EXAMPLE_JSON = {
    "include": [
        [{"type": "order", "priorities": ["1-URGENT", "2-HIGH"]}],
        [
            {"type": "order", "date_from": "1996-01-01", "date_to": "1997-01-01"},
            {"type": "lineitem", "returnflags": ["R"]},
        ],
    ],
    "exclude": [{"type": "subject", "max_balance": 0.0}],
}


def test_json_roundtrip_equals_programmatic_query(spark):
    parsed = cohort_from_json(EXAMPLE_JSON)
    assert parsed == EXAMPLE_COHORT
    n_parsed = cohort_count(parsed, spark, SF).collect()[0][0]
    n_direct = cohort_count(EXAMPLE_COHORT, spark, SF).collect()[0][0]
    assert n_parsed == n_direct


@pytest.mark.parametrize(
    "bad",
    [
        {},
        {"include": []},
        {"include": [[]]},
        {"include": [[{"type": "nope"}]]},
        {"include": [[{"type": "order", "bogus_field": 1}]]},
    ],
)
def test_malformed_queries_rejected(bad):
    with pytest.raises(ValueError):
        cohort_from_json(bad)


def test_keyset_pagination_walks_everything_once(spark):
    df = spark.read.parquet(f"{SF}/customer.parquet")
    seen, token, pages = [], None, 0
    while True:
        page, token = paginate(df, "c_custkey", 40, after=token)
        seen.extend(r.c_custkey for r in page)
        pages += 1
        if token is None:
            break
    assert pages == 4  # 150 rows / 40
    assert seen == sorted(seen)
    assert len(seen) == len(set(seen)) == 150


def test_hal_page_links_walk_the_collection(spark):
    from lens_warehouse_spark.operators.wire import paginate_hal

    df = spark.read.parquet(f"{SF}/region.parquet")
    doc = paginate_hal(df, "r_regionkey", 2, "/regions")
    assert doc["_links"]["self"]["href"] == "/regions?page-size=2"
    assert doc["count"] == 2
    assert "next" in doc["_links"]
    # follow the next link's token: 5 regions -> pages of 2, 2, 1
    seen = [it["r_regionkey"] for it in doc["_embedded"]["items"]]
    while "next" in doc["_links"]:
        href = doc["_links"]["next"]["href"]
        after = int(href.split("after=")[1])
        doc = paginate_hal(df, "r_regionkey", 2, "/regions", after=after)
        seen += [it["r_regionkey"] for it in doc["_embedded"]["items"]]
    assert sorted(seen) == [0, 1, 2, 3, 4]
    assert doc["_links"]["first"]["href"] == "/regions?page-size=2"
