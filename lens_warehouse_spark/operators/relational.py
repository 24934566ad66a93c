"""Relational core: scans, projection, predicates, sort/limit/pagination.

Reference parity (SURVEY.md §2.1, §2.2, §2.7): lens-warehouse resolves
point lookups with ``d/pull`` on unique ids, predicates as datalog atoms
(equality, range, set-membership, temporal windows, presence), fulltext
via Datomic's ``fulltext``, and paginates browse endpoints in page-size
chunks (public repo ``src/lens/api.clj``, ``src/lens/handler.clj``;
/root/reference is empty — see SURVEY.md §0).

Spark-first: every predicate is a Column expression so Catalyst pushes it
into the parquet scan (check ``.explain``: PushedFilters) and prunes
columns (ReadSchema). Nothing here shuffles except the explicit sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lens_warehouse_spark.catalog import table
from lens_warehouse_spark.operators._helpers import epoch_ms
from lens_warehouse_spark.registry import register


# ---------------------------------------------------------------------------
# Flagship (entry): pricing summary, TPC-H Q1 shape — S1+P5+F3+A1/A4+O1.
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(round(sum(l_quantity)) AS BIGINT)  AS sum_qty,
  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
  CAST(round(sum(l_extendedprice * (1 - l_discount))) AS BIGINT) AS sum_disc_price,
  CAST(round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))) AS BIGINT) AS sum_charge,
  round(avg(l_quantity), 4) AS avg_qty,
  round(avg(l_extendedprice), 4) AS avg_price,
  round(avg(l_discount), 4) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13 (opt round 1): aggregates as parsed SQL expressions — one
    # Py4J call each instead of the 3-6 a money_sum/cents_sum/avg4
    # Column tree costs. The expression trees are identical to the
    # helper forms they replace (round(sum(x)) / sum of per-row integer
    # cents / round(avg, 4); `1 - l_discount` parses to the same
    # int-minus-double Subtract as F.lit(1) - col), so every value is
    # bit-identical — this is the flagship entry() query, built on
    # every driver smoke check and bench rep, and its construction was
    # 0.154 s of its ~0.3 s drained power time (guide §7.3).
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr("CAST(round(sum(l_quantity)) AS BIGINT) AS sum_qty"),
            # exact cents: raw 2-decimal column (rule 3 caveat)
            F.expr(
                "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)"
                " AS sum_base_price_cents"
            ),
            F.expr(
                "CAST(round(sum(l_extendedprice * (1 - l_discount))) AS BIGINT)"
                " AS sum_disc_price"
            ),
            F.expr(
                "CAST(round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)))"
                " AS BIGINT) AS sum_charge"
            ),
            F.expr("round(avg(l_quantity), 4) AS avg_qty"),
            F.expr("round(avg(l_extendedprice), 4) AS avg_price"),
            F.expr("round(avg(l_discount), 4) AS avg_disc"),
            F.expr("count(1) AS count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# S2: point lookup by unique id (ref: d/pull entity by :study/id).
# ---------------------------------------------------------------------------
@register(
    "s2_point_lookup",
    oracle="""
SELECT c_custkey, c_name, c_nationkey, round(c_acctbal, 2) AS acctbal, c_mktsegment
FROM customer WHERE c_custkey = 42
""",
)
def s2_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") == F.lit(42))
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            "c_mktsegment",
        )
    )


# ---------------------------------------------------------------------------
# P1: projection / rename (ref: pull-pattern attribute selection).
# ---------------------------------------------------------------------------
@register(
    "p1_projection",
    oracle="""
SELECT n_nationkey AS nation_id, lower(n_name) AS nation_name, n_regionkey AS region_id
FROM nation
""",
)
def p1_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nation_id"),
        F.lower("n_name").alias("nation_name"),
        F.col("n_regionkey").alias("region_id"),
    )


# ---------------------------------------------------------------------------
# P3: numeric range predicate (ref: [:item id :range [lo hi]] atom).
# ---------------------------------------------------------------------------
@register(
    "p3_range_predicate",
    oracle="""
SELECT p_partkey, p_name, p_size
FROM part WHERE p_size BETWEEN 10 AND 20
""",
)
def p3_range_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "part")
        .filter(F.col("p_size").between(10, 20))
        .select("p_partkey", "p_name", "p_size")
    )


# ---------------------------------------------------------------------------
# P4: set membership (ref: code in code-list subset).
# ---------------------------------------------------------------------------
@register(
    "p4_set_membership",
    oracle="""
SELECT o_orderkey, o_orderpriority
FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
""",
)
def p4_set_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# P5: temporal window predicate (ref: visit timestamp within range).
# ---------------------------------------------------------------------------
@register(
    "p5_temporal_predicate",
    oracle="""
SELECT o_orderkey, epoch_ms(o_orderdate) AS order_ts_ms
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
""",
)
def p5_temporal_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = F.col("o_orderdate").cast("timestamp")
    return (
        table(spark, sf_dir, "orders")
        .filter(
            (od >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (od < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .select("o_orderkey", epoch_ms("o_orderdate").alias("order_ts_ms"))
    )


# ---------------------------------------------------------------------------
# P7: compound boolean over predicates (ref: and/or/not atom combination).
# ---------------------------------------------------------------------------
@register(
    "p7_compound_boolean",
    oracle="""
SELECT l_orderkey, l_linenumber
FROM lineitem
WHERE (l_returnflag = 'R' OR l_linestatus = 'F')
  AND NOT (l_discount > 0.05)
  AND l_quantity >= 25
""",
)
def p7_compound_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    cond = (
        ((F.col("l_returnflag") == "R") | (F.col("l_linestatus") == "F"))
        & ~(F.col("l_discount") > 0.05)
        & (F.col("l_quantity") >= 25)
    )
    return li.filter(cond).select("l_orderkey", "l_linenumber")


# ---------------------------------------------------------------------------
# P8: text search (ref: Datomic fulltext on :study/name for browse/search).
# ---------------------------------------------------------------------------
@register(
    "p8_text_search",
    oracle="""
SELECT p_partkey, p_name
FROM part
WHERE contains(lower(p_name), 'gold') OR lower(p_type) LIKE 'promo%'
""",
)
def p8_text_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    pt = table(spark, sf_dir, "part")
    return pt.filter(
        F.lower("p_name").contains("gold") | F.lower("p_type").startswith("promo")
    ).select("p_partkey", "p_name")


# ---------------------------------------------------------------------------
# O1/O2: global sort + limit/offset pagination (ref: browse endpoints,
# page-size chunks, util.clj paginate).
# ---------------------------------------------------------------------------
@register(
    "o2_limit_offset_page",
    oracle="""
SELECT c_custkey, c_name
FROM customer
ORDER BY c_name, c_custkey
LIMIT 20 OFFSET 40
""",
)
def o2_limit_offset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "customer")
        .orderBy("c_name", "c_custkey")
        .offset(40)
        .limit(20)
        .select("c_custkey", "c_name")
    )


# ---------------------------------------------------------------------------
# O3: keyset pagination (ref: hypermedia next-links carry the last key).
# ---------------------------------------------------------------------------
@register(
    "o3_keyset_page",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey > 100
ORDER BY c_custkey
LIMIT 25
""",
)
def o3_keyset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") > 100)
        .orderBy("c_custkey")
        .limit(25)
        .select("c_custkey", "c_name")
    )


# ---------------------------------------------------------------------------
# O4: global top-k (TakeOrderedAndProject — no full sort at scale).
# ---------------------------------------------------------------------------
@register(
    "o4_top_k",
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS total_price
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
)
def o4_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total_price"))
    )
