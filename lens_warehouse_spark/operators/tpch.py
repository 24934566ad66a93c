"""Composite analytic queries (TPC-H Q3/Q10 shapes) — multi-operator
showcase plans combining scans, selective dim filters, fact joins,
aggregation and top-k in one pipeline.

These exercise operator *composition* (the individual operators are
oracle-checked elsewhere): Catalyst must push filters through joins,
choose broadcast for dims, and finish with TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from lens_warehouse_spark.catalog import table
from lens_warehouse_spark.operators._helpers import money_sum, revenue
from lens_warehouse_spark.registry import register


# ---------------------------------------------------------------------------
# Q3 shape: shipping-priority — top 10 unshipped orders by revenue.
# ---------------------------------------------------------------------------
@register(
    "q3_shipping_priority",
    oracle="""
SELECT l.l_orderkey,
       CAST(round(sum(l.l_extendedprice * (1 - l.l_discount))) AS BIGINT) AS revenue,
       epoch_ms(o.o_orderdate) AS orderdate_ms,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cu = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    od = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(broadcast(cu), od.o_custkey == cu.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money_sum(revenue()).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias(
                "orderdate_ms"
            ),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q10 shape: returned-item reporting — customers who returned the most
# revenue in a quarter, with their nation.
# ---------------------------------------------------------------------------
@register(
    "q10_returned_items",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name AS nation_name,
       CAST(round(sum(l.l_extendedprice * (1 - l.l_discount))) AS BIGINT) AS lost_revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY lost_revenue DESC, c.c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = table(spark, sf_dir, "customer")
    na = table(spark, sf_dir, "nation")
    od = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation_name"))
        .agg(money_sum(revenue()).alias("lost_revenue"))
        .orderBy(F.col("lost_revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q18 shape: large-volume customers (semi-join on a grouped HAVING).
# ---------------------------------------------------------------------------
@register(
    "q18_large_orders",
    oracle="""
SELECT o.o_orderkey, c.c_name, CAST(round(sum(l.l_quantity)) AS BIGINT) AS total_qty
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
)
GROUP BY o.o_orderkey, c.c_name
ORDER BY total_qty DESC, o.o_orderkey
LIMIT 20
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    od = table(spark, sf_dir, "orders")
    cu = table(spark, sf_dir, "customer")
    return (
        li.join(big, li.l_orderkey == big.big_orderkey, "left_semi")
        .join(od, li.l_orderkey == od.o_orderkey)
        .join(broadcast(cu), od.o_custkey == cu.c_custkey)
        .groupBy("o_orderkey", "c_name")
        .agg(F.round(F.sum("l_quantity")).cast("long").alias("total_qty"))
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
        .limit(20)
    )
