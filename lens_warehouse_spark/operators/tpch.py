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

from lens_warehouse_spark.catalog import maybe_broadcast, table
from lens_warehouse_spark.operators._helpers import epoch_ms, money_sum, revenue
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
        .join(maybe_broadcast(cu, sf_dir, "customer"), od.o_custkey == cu.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money_sum(revenue()).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            epoch_ms("o_orderdate").alias("orderdate_ms"),
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
        .join(maybe_broadcast(cu, sf_dir, "customer"), od.o_custkey == cu.c_custkey)
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
        .join(maybe_broadcast(cu, sf_dir, "customer"), od.o_custkey == cu.c_custkey)
        .groupBy("o_orderkey", "c_name")
        .agg(money_sum(F.col("l_quantity")).alias("total_qty"))
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q7 shape: volume shipping between two nation pairs — self-aliased dim
# joins with a symmetric pair predicate.
# ---------------------------------------------------------------------------
@register(
    "q7_nation_volume",
    oracle="""
SELECT supp_nation, cust_nation, l_year,
       CAST(round(sum(volume)) AS BIGINT) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l.l_shipdate) AS INT) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM lineitem l
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
  JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    od = table(spark, sf_dir, "orders")
    su = table(spark, sf_dir, "supplier")
    cu = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(maybe_broadcast(su, sf_dir, "supplier"), li.l_suppkey == su.s_suppkey)
        .join(maybe_broadcast(cu, sf_dir, "customer"), od.o_custkey == cu.c_custkey)
        .join(broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year(F.col("l_shipdate").cast("timestamp")).alias("l_year"),
            revenue().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(money_sum(F.col("volume")).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q11 shape: important stock — grouped value with a HAVING against a
# correlated-free scalar subquery (Catalyst rewrites it to a join).
# Exercised through the SQL surface to showcase subquery decorrelation.
# ---------------------------------------------------------------------------
@register(
    "q11_important_stock",
    oracle="""
SELECT s.s_nationkey AS nationkey,
       CAST(sum(ps.total_cents) AS BIGINT) AS value_cents
FROM (
  SELECT l_suppkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS total_cents
  FROM lineitem GROUP BY l_suppkey
) ps
JOIN supplier s ON s.s_suppkey = ps.l_suppkey
GROUP BY s.s_nationkey
HAVING sum(ps.total_cents) > (
  SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)) * 0.01 FROM lineitem
)
ORDER BY nationkey
""",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lws_q11_lineitem")
    table(spark, sf_dir, "supplier").createOrReplaceTempView("lws_q11_supplier")
    return spark.sql(
        """
        SELECT s.s_nationkey AS nationkey,
               CAST(sum(ps.total_cents) AS BIGINT) AS value_cents
        FROM (
          SELECT l_suppkey,
                 sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS total_cents
          FROM lws_q11_lineitem GROUP BY l_suppkey
        ) ps
        JOIN lws_q11_supplier s ON s.s_suppkey = ps.l_suppkey
        GROUP BY s.s_nationkey
        HAVING sum(ps.total_cents) > (
          SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)) * 0.01 FROM lws_q11_lineitem
        )
        ORDER BY nationkey
        """
    )


# ---------------------------------------------------------------------------
# Q2 shape: minimum-cost supplier per part. The testdata has no partsupp
# table, so the part<->supplier bridge (and its "supplycost") is derived
# from lineitem: cost(part, supp) = min unit price ever charged. The
# per-part minimum is a correlated MIN subquery -> Catalyst decorrelates
# to an aggregate + join. min() selects an actual IEEE value computed
# with the identical expression tree on both sides, so the equality join
# on it is bit-deterministic (parity rule 5).
# ---------------------------------------------------------------------------
@register(
    "q2_min_cost_supplier",
    oracle="""
WITH bridge AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT p.p_partkey, p.p_brand, s.s_suppkey, s.s_name, n.n_name AS nation_name,
       b.unit_cost AS unit_cost
FROM part p
JOIN bridge b ON b.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = b.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_type = 'ECONOMY' AND p.p_size < 15
  AND b.unit_cost = (
    SELECT min(b2.unit_cost) FROM bridge b2 WHERE b2.l_partkey = p.p_partkey
  )
ORDER BY p.p_partkey, s.s_suppkey
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    bridge = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    best = (
        bridge.groupBy("l_partkey")
        .agg(F.min("unit_cost").alias("best_cost"))
        .select(F.col("l_partkey").alias("bp_partkey"), "best_cost")
    )
    pa = table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "ECONOMY") & (F.col("p_size") < 15)
    )
    su = table(spark, sf_dir, "supplier")
    na = table(spark, sf_dir, "nation")
    return (
        bridge.join(
            best,
            (F.col("l_partkey") == F.col("bp_partkey"))
            & (F.col("unit_cost") == F.col("best_cost")),
        )
        .drop("bp_partkey", "best_cost")
        .join(maybe_broadcast(pa, sf_dir, "part"), F.col("l_partkey") == pa.p_partkey)
        .join(maybe_broadcast(su, sf_dir, "supplier"), F.col("l_suppkey") == su.s_suppkey)
        .join(broadcast(na), su.s_nationkey == na.n_nationkey)
        .select(
            "p_partkey",
            "p_brand",
            "s_suppkey",
            "s_name",
            F.col("n_name").alias("nation_name"),
            F.col("unit_cost").alias("unit_cost"),
        )
        .orderBy("p_partkey", "s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q16 shape: supplier diversity per part attribute group, excluding a
# denylist of suppliers via NOT IN (anti-join showcase).
# ---------------------------------------------------------------------------
@register(
    "q16_parts_supplier_count",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_size IN (5, 10, 15, 20)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
""",
)
def q16_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    pa = table(spark, sf_dir, "part").filter(F.col("p_size").isin(5, 10, 15, 20))
    deny = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        # NOT IN semantics, not NOT EXISTS: the oracle's NOT IN drops a
        # NULL-keyed left row (NULL NOT IN (...) is NULL), while a bare
        # left_anti would KEEP it. The denylist side (s_suppkey) is a
        # non-null PK, so filtering the left key's nulls makes the two
        # semantics coincide for any data.
        li.filter(F.col("l_suppkey").isNotNull())
        .join(maybe_broadcast(deny, sf_dir, "supplier"), li.l_suppkey == deny.s_suppkey, "left_anti")
        .join(maybe_broadcast(pa, sf_dir, "part"), li.l_partkey == pa.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q20 shape: suppliers shipping excess volume of a part family — a
# semi-join chain gated by a scalar subquery over an aggregate of
# aggregates. l_quantity is integer-valued double, so sums (and the
# half-average threshold) are exact in both engines.
# ---------------------------------------------------------------------------
@register(
    "q20_excess_suppliers",
    oracle="""
WITH vol AS (
  SELECT l.l_suppkey, sum(l.l_quantity) AS qty
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE 'large%'
  GROUP BY l.l_suppkey
)
SELECT s.s_suppkey, s.s_name, n.n_name AS nation_name,
       CAST(v.qty AS BIGINT) AS qty
FROM supplier s
JOIN vol v ON v.l_suppkey = s.s_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE v.qty > (SELECT 0.5 * avg(qty) FROM vol)
ORDER BY s.s_suppkey
""",
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    pa = table(spark, sf_dir, "part").filter(F.col("p_name").like("large%"))
    su = table(spark, sf_dir, "supplier")
    na = table(spark, sf_dir, "nation")
    vol = (
        li.join(maybe_broadcast(pa, sf_dir, "part"), li.l_partkey == pa.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    threshold = vol.agg((F.lit(0.5) * F.avg("qty")).alias("t"))
    return (
        vol.join(broadcast(threshold))
        .filter(F.col("qty") > F.col("t"))
        .join(maybe_broadcast(su, sf_dir, "supplier"), F.col("l_suppkey") == su.s_suppkey)
        .join(broadcast(na), su.s_nationkey == na.n_nationkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("n_name").alias("nation_name"),
            F.col("qty").cast("long").alias("qty"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# P9: correlated EXISTS subquery through SQL (decorrelation showcase —
# Catalyst RewriteCorrelatedScalarSubquery / RewritePredicateSubquery).
# ---------------------------------------------------------------------------
@register(
    "p9_correlated_subquery",
    oracle="""
SELECT c_custkey
FROM customer c
WHERE c_acctbal > (
  SELECT coalesce(avg(o_totalprice), 1e18) FROM orders o
  WHERE o.o_custkey = c.c_custkey
) * 0.001
""",
)
def p9_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "customer").createOrReplaceTempView("lws_p9_customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("lws_p9_orders")
    return spark.sql(
        """
        SELECT c_custkey
        FROM lws_p9_customer c
        WHERE c_acctbal > (
          SELECT coalesce(avg(o_totalprice), 1e18) FROM lws_p9_orders o
          WHERE o.o_custkey = c.c_custkey
        ) * 0.001
        """
    )


# ---------------------------------------------------------------------------
# Q21 shape: suppliers who alone were late on a multi-supplier order —
# the EXISTS + NOT-EXISTS double correlated subquery (Catalyst rewrites
# both into semi/anti joins). This lineitem has no commit/receipt dates,
# so "late" is shipping >60 days after the order date.
# ---------------------------------------------------------------------------
_Q21_BODY = """
SELECT s.s_name, count(*) AS numwait
FROM {supplier} s
JOIN {lineitem} l1 ON l1.l_suppkey = s.s_suppkey
JOIN {orders} o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM {lineitem} l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM {lineitem} l3
    JOIN {orders} o3 ON o3.o_orderkey = l3.l_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
"""


@register(
    "q21_waiting_suppliers",
    oracle=_Q21_BODY.format(
        supplier="supplier", lineitem="lineitem", orders="orders"
    ),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "supplier").createOrReplaceTempView("lws_q21_supplier")
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lws_q21_lineitem")
    table(spark, sf_dir, "orders").createOrReplaceTempView("lws_q21_orders")
    return spark.sql(
        _Q21_BODY.format(
            supplier="lws_q21_supplier",
            lineitem="lws_q21_lineitem",
            orders="lws_q21_orders",
        )
    )


# ---------------------------------------------------------------------------
# Q22 shape: rich customers with no urgent orders — scalar subquery
# threshold (above-average balance) + NOT EXISTS anti-join, grouped by
# segment. (Predicate adapted: this generator gives every customer
# orders, so plain no-orders would be empty at every SF.)
# ---------------------------------------------------------------------------
_Q22_BODY = """
SELECT c.c_mktsegment,
       count(*) AS numcust,
       CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS totacctbal_cents
FROM {customer} c
WHERE c.c_acctbal > (
    SELECT avg(c2.c_acctbal) FROM {customer} c2 WHERE c2.c_acctbal > 0.0
  )
  AND NOT EXISTS (
    SELECT 1 FROM {orders} o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
  )
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


@register(
    "q22_global_sales_opportunity",
    oracle=_Q22_BODY.format(customer="customer", orders="orders"),
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "customer").createOrReplaceTempView("lws_q22_customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("lws_q22_orders")
    return spark.sql(_Q22_BODY.format(customer="lws_q22_customer", orders="lws_q22_orders"))


# ---------------------------------------------------------------------------
# Q4 shape: order-priority checking — EXISTS correlated subquery counted
# per priority ("late" adapted: shipped >30 days after order date).
# ---------------------------------------------------------------------------
@register(
    "q4_order_priority",
    oracle="""
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("lws_q4_orders")
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lws_q4_lineitem")
    return spark.sql(
        """
        SELECT o.o_orderpriority, count(*) AS order_count
        FROM lws_q4_orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lws_q4_lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
          )
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# Q5 shape: local-supplier volume — revenue where the customer and the
# supplier share a nation, per nation in one region.
# ---------------------------------------------------------------------------
@register(
    "q5_local_supplier_volume",
    oracle="""
SELECT n.n_name AS nation_name,
       CAST(round(sum(l.l_extendedprice * (1 - l.l_discount))) AS BIGINT) AS revenue
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name
ORDER BY revenue DESC, nation_name
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = table(spark, sf_dir, "customer")
    od = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    su = table(spark, sf_dir, "supplier")
    na = table(spark, sf_dir, "nation")
    re = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(maybe_broadcast(cu, sf_dir, "customer"), od.o_custkey == cu.c_custkey)
        .join(
            maybe_broadcast(su, sf_dir, "supplier"),
            (li.l_suppkey == su.s_suppkey)
            & (su.s_nationkey == cu.c_nationkey),
        )
        .join(broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(broadcast(re), na.n_regionkey == re.r_regionkey, "left_semi")
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(money_sum(revenue()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "nation_name")
    )


# ---------------------------------------------------------------------------
# Q6 shape: forecast-revenue change — pure filter + aggregate; the plan
# should be scan (all predicates pushed) -> partial/final agg, nothing
# else.
# ---------------------------------------------------------------------------
@register(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(round(sum(l_extendedprice * l_discount)) AS BIGINT) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Q13 shape: customer order-count distribution — left outer join (keep
# zero-order customers) then a histogram of counts. All-integer.
# ---------------------------------------------------------------------------
@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = table(spark, sf_dir, "customer")
    od = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cu.join(od, cu.c_custkey == od.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# Q14 shape: promo revenue — conditional aggregation. The TPC-H ratio is
# a division of two order-dependent double sums, so both terms are
# emitted integer-rounded instead of the ratio (parity rule 3/4).
# ---------------------------------------------------------------------------
@register(
    "q14_promo_revenue",
    oracle="""
SELECT CAST(round(sum(CASE WHEN p.p_type = 'PROMO'
                 THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)) AS BIGINT)
         AS promo_revenue,
       CAST(round(sum(l.l_extendedprice * (1 - l.l_discount))) AS BIGINT)
         AS total_revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    pa = table(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", revenue()).otherwise(F.lit(0))
    return (
        li.join(maybe_broadcast(pa, sf_dir, "part"), li.l_partkey == pa.p_partkey)
        .agg(
            money_sum(promo).alias("promo_revenue"),
            money_sum(revenue()).alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Q15 shape: top supplier by quarterly revenue — scalar MAX subquery over
# a grouped view (each engine self-consistently picks its max; output
# revenue integer-rounded).
# ---------------------------------------------------------------------------
@register(
    "q15_top_supplier",
    oracle="""
WITH rev AS (
  SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS total
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(round(r.total) AS BIGINT) AS total_revenue
FROM supplier s
JOIN rev r ON r.l_suppkey = s.s_suppkey
WHERE r.total = (SELECT max(total) FROM rev)
ORDER BY s.s_suppkey
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(revenue()).alias("total"))
    best = rev.agg(F.max("total").alias("best_total"))
    su = table(spark, sf_dir, "supplier")
    return (
        rev.join(broadcast(best), rev.total == F.col("best_total"), "left_semi")
        .join(maybe_broadcast(su, sf_dir, "supplier"), F.col("l_suppkey") == su.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round("total").cast("long").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q17 shape: small-quantity-order revenue — correlated AVG subquery per
# part (quantity below 20% of the part's average).
# ---------------------------------------------------------------------------
@register(
    "q17_small_quantity_revenue",
    oracle="""
WITH pavg AS (
  SELECT l_partkey, 0.2 * avg(l_quantity) AS lim
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS total_price_cents,
       count(*) AS n_rows
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN pavg a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < a.lim
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    pavg = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("lim")
    )
    pa = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    return (
        li.join(maybe_broadcast(pa, sf_dir, "part"), li.l_partkey == pa.p_partkey, "left_semi")
        .join(pavg, li.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("lim"))
        .agg(
            # exact integer cents (rule 3 caveat: 2-decimal sums)
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("total_price_cents"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Q19 shape: discounted revenue — three-way disjunctive predicate over
# joined attributes; Catalyst extracts the common l_partkey join and
# pushes the residual OR (the pushdown-of-disjunctions showcase).
# ---------------------------------------------------------------------------
@register(
    "q19_discounted_revenue",
    oracle="""
SELECT CAST(round(sum(l.l_extendedprice * (1 - l.l_discount))) AS BIGINT) AS revenue,
       count(*) AS n_rows
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 11 AND 20
       AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 21 AND 30
       AND l.l_quantity BETWEEN 20 AND 40)
""",
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    pa = table(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 10)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(11, 20)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(21, 30)
           & F.col("l_quantity").between(20, 40))
    )
    return (
        li.join(maybe_broadcast(pa, sf_dir, "part"), li.l_partkey == pa.p_partkey)
        .filter(cond)
        .agg(
            money_sum(revenue()).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Q8 shape: national market share — a nation's fraction of regional
# revenue per year. Ratio of order-dependent double sums -> emit both
# terms integer-rounded (parity rules 3/4), not the ratio.
# ---------------------------------------------------------------------------
@register(
    "q8_market_share",
    oracle="""
SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
       CAST(round(sum(CASE WHEN n2.n_name = 'NATION_3'
                  THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)) AS BIGINT)
         AS nation_revenue,
       CAST(round(sum(l.l_extendedprice * (1 - l.l_discount))) AS BIGINT)
         AS region_revenue
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
JOIN region r   ON r.r_regionkey = n1.n_regionkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
JOIN part p     ON p.p_partkey = l.l_partkey
WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
GROUP BY year(o.o_orderdate)
ORDER BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    od = table(spark, sf_dir, "orders")
    cu = table(spark, sf_dir, "customer")
    su = table(spark, sf_dir, "supplier")
    pa = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    re = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation_rev = F.when(F.col("supp_nation") == "NATION_3", revenue()).otherwise(
        F.lit(0)
    )
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(maybe_broadcast(pa, sf_dir, "part"), li.l_partkey == pa.p_partkey, "left_semi")
        .join(maybe_broadcast(cu, sf_dir, "customer"), od.o_custkey == cu.c_custkey)
        .join(broadcast(n1), cu.c_nationkey == F.col("n1_key"))
        .join(broadcast(re), F.col("n1_region") == re.r_regionkey, "left_semi")
        .join(maybe_broadcast(su, sf_dir, "supplier"), li.l_suppkey == su.s_suppkey)
        .join(broadcast(n2), su.s_nationkey == F.col("n2_key"))
        .groupBy(
            F.year(F.col("o_orderdate").cast("timestamp")).alias("o_year")
        )
        .agg(
            money_sum(nation_rev).alias("nation_revenue"),
            money_sum(revenue()).alias("region_revenue"),
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9 shape: product-type profit by supplier nation and year. The schema
# has no partsupp.ps_supplycost, so cost(part, supp) is the minimum unit
# price ever charged (same derived bridge as Q2); profit = revenue -
# cost * quantity, identical expression tree both sides, summed and
# integer-rounded.
# ---------------------------------------------------------------------------
@register(
    "q9_product_profit",
    oracle="""
WITH bridge AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT n.n_name AS nation_name,
       CAST(year(o.o_orderdate) AS INT) AS o_year,
       CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)
                      - b.unit_cost * l.l_quantity)) AS BIGINT) AS profit
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN bridge b   ON b.l_partkey = l.l_partkey AND b.l_suppkey = l.l_suppkey
WHERE p.p_name LIKE '%bolt%'
GROUP BY n.n_name, year(o.o_orderdate)
ORDER BY nation_name, o_year
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    od = table(spark, sf_dir, "orders")
    pa = table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    su = table(spark, sf_dir, "supplier")
    na = table(spark, sf_dir, "nation")
    bridge = (
        li.groupBy(
            F.col("l_partkey").alias("b_partkey"),
            F.col("l_suppkey").alias("b_suppkey"),
        )
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    profit = revenue() - F.col("unit_cost") * F.col("l_quantity")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(maybe_broadcast(pa, sf_dir, "part"), li.l_partkey == pa.p_partkey, "left_semi")
        .join(
            bridge,
            (li.l_partkey == F.col("b_partkey"))
            & (li.l_suppkey == F.col("b_suppkey")),
        )
        .join(maybe_broadcast(su, sf_dir, "supplier"), li.l_suppkey == su.s_suppkey)
        .join(broadcast(na), su.s_nationkey == na.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation_name"),
            F.year(F.col("o_orderdate").cast("timestamp")).alias("o_year"),
        )
        .agg(money_sum(profit).alias("profit"))
        .orderBy("nation_name", "o_year")
    )


# ---------------------------------------------------------------------------
# Q12 shape: shipping-lateness histogram by priority class. The schema
# has no l_shipmode/commitdate, so the Q12 pivot (critical vs non-
# critical priority per mode) becomes: per lateness bucket (shipped
# within 30/60/90+ days of the order), count critical-priority and
# other orders. All-integer.
# ---------------------------------------------------------------------------
@register(
    "q12_lateness_priority",
    oracle="""
SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 30 THEN '0-30'
            WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 60 THEN '31-60'
            ELSE '60+' END AS lateness,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS critical_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS other_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1
ORDER BY lateness
""",
)
def q12_lateness_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    od = table(spark, sf_dir, "orders")
    days = F.datediff(
        F.col("l_shipdate").cast("timestamp"), F.col("o_orderdate").cast("timestamp")
    )
    lateness = (
        F.when(days <= 30, "0-30").when(days <= 60, "31-60").otherwise("60+")
    )
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy(lateness.alias("lateness"))
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).alias("critical_count"),
            F.sum(F.when(crit, 0).otherwise(1)).alias("other_count"),
        )
        .orderBy("lateness")
    )
