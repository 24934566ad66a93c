"""Join operators J1-J9.

Reference parity (SURVEY.md §2.3): lens-warehouse's joins are datalog
clauses sharing variables — entity-ref traversals visit->subject,
data-point->item-def resolved by Datomic indexes (public repo
``src/lens/api.clj``; /root/reference empty, SURVEY.md §0). Inclusion
atoms are semi-joins ("subject HAS a matching data point"), exclusion
criteria are anti-joins.

Spark-first scale notes:
- Fixed dims (region/nation) get an explicit ``broadcast()`` hint; the
  SF-scaling dims (customer/supplier/part) go through the stats-gated
  ``catalog.maybe_broadcast`` — an explicit hint is never demoted by
  AQE, so an unconditional hint on a scaling dim would OOM executors at
  the 100 TB design point.
- Fact-fact joins (lineitem-orders) are shuffle sort-merge on the join
  key; at scale both sides would be bucketed by orderkey to make this
  shuffle-free. AQE handles skew splitting.
- The as-of join (J8) is the window-function formulation: one shuffle by
  key, no point-in-time loop. The theta join (J7) keeps its small side
  broadcast so the nested-loop never materializes a cross product of
  two big relations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from lens_warehouse_spark.catalog import maybe_broadcast, table
from lens_warehouse_spark.operators._helpers import cents_sum, epoch_ms, money_sum, revenue
from lens_warehouse_spark.registry import register


# ---------------------------------------------------------------------------
# J1: equi inner join, fact->fact (lineitem ⋈ orders).
# ---------------------------------------------------------------------------
@register(
    "j1_inner_join",
    oracle="""
SELECT l.l_orderkey, l.l_linenumber, o.o_orderpriority
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderstatus = 'F' AND l.l_quantity > 45
""",
)
def j1_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    od = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return li.join(od, li.l_orderkey == od.o_orderkey, "inner").select(
        "l_orderkey", "l_linenumber", "o_orderpriority"
    )


# ---------------------------------------------------------------------------
# J2: broadcast dim join chain customer->nation->region.
# ---------------------------------------------------------------------------
@register(
    "j2_broadcast_dim_join",
    oracle="""
SELECT r.r_name AS region_name, count(*) AS n_customers
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
ORDER BY r.r_name
""",
)
def j2_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = table(spark, sf_dir, "customer")
    na = table(spark, sf_dir, "nation")
    re = table(spark, sf_dir, "region")
    return (
        cu.join(broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("region_name")
    )


# ---------------------------------------------------------------------------
# J3: left semi join — "customer HAS an urgent open order" (inclusion atom).
# ---------------------------------------------------------------------------
@register(
    "j3_semi_join",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
""",
)
def j3_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = table(spark, sf_dir, "customer")
    urgent = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return cu.join(
        urgent, cu.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# J4: left anti join — exclusion criterion ("no returned lineitem").
# ---------------------------------------------------------------------------
@register(
    "j4_anti_join",
    oracle="""
SELECT c_custkey
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE o.o_custkey = c.c_custkey AND l.l_returnflag = 'R'
)
""",
)
def j4_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = table(spark, sf_dir, "customer")
    od = table(spark, sf_dir, "orders")
    returned = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .join(od, F.col("l_orderkey") == od.o_orderkey)
        .select("o_custkey")
    )
    return cu.join(returned, cu.c_custkey == returned.o_custkey, "left_anti").select(
        "c_custkey"
    )


# ---------------------------------------------------------------------------
# J5: left outer join — customers with their order count (0 if none).
# ---------------------------------------------------------------------------
@register(
    "j5_left_outer_join",
    oracle="""
SELECT c.c_custkey, CAST(coalesce(cnt, 0) AS BIGINT) AS n_orders
FROM customer c
LEFT JOIN (
  SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey
) o ON o.o_custkey = c.c_custkey
""",
)
def j5_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = table(spark, sf_dir, "customer")
    cnt = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return cu.join(cnt, cu.c_custkey == cnt.o_custkey, "left").select(
        "c_custkey", F.coalesce("cnt", F.lit(0)).cast("long").alias("n_orders")
    )


# ---------------------------------------------------------------------------
# J6: multi-way star join — revenue per nation (TPC-H Q5 shape):
# lineitem ⋈ orders ⋈ customer ⋈ supplier ⋈ nation ⋈ region, with the
# classic "local supplier" condition c_nationkey = s_nationkey.
# ---------------------------------------------------------------------------
@register(
    "j6_star_join_revenue",
    oracle="""
SELECT n.n_name AS nation_name,
       CAST(round(sum(l.l_extendedprice * (1 - l.l_discount))) AS BIGINT) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name
ORDER BY n.n_name
""",
)
def j6_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    od = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    cu = table(spark, sf_dir, "customer")
    su = table(spark, sf_dir, "supplier")
    na = table(spark, sf_dir, "nation")
    re = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(maybe_broadcast(cu, sf_dir, "customer"), od.o_custkey == cu.c_custkey)
        .join(
            maybe_broadcast(su, sf_dir, "supplier"),
            (li.l_suppkey == su.s_suppkey) & (cu.c_nationkey == su.s_nationkey),
        )
        .join(broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(money_sum(revenue()).alias("revenue"))
        .orderBy("nation_name")
    )


# ---------------------------------------------------------------------------
# J7: theta (non-equi) join — nation pairs from different regions.
# BroadcastNestedLoopJoin; both sides tiny dims, so safe at any scale.
# ---------------------------------------------------------------------------
@register(
    "j7_theta_join",
    oracle="""
SELECT a.n_name AS nation_a, b.n_name AS nation_b
FROM nation a JOIN nation b
  ON a.n_nationkey < b.n_nationkey AND a.n_regionkey <> b.n_regionkey
""",
)
def j7_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    na = table(spark, sf_dir, "nation")
    a = na.select(
        F.col("n_nationkey").alias("ak"),
        F.col("n_regionkey").alias("ar"),
        F.col("n_name").alias("nation_a"),
    )
    b = na.select(
        F.col("n_nationkey").alias("bk"),
        F.col("n_regionkey").alias("br"),
        F.col("n_name").alias("nation_b"),
    )
    return a.join(
        broadcast(b), (F.col("ak") < F.col("bk")) & (F.col("ar") != F.col("br"))
    ).select("nation_a", "nation_b")


# ---------------------------------------------------------------------------
# J7b: range join — lineitems shipped within 60 days of their order date.
# Equi key + range residual: stays a sort-merge join on the equi key.
# ---------------------------------------------------------------------------
@register(
    "j7b_range_join",
    oracle="""
SELECT o.o_orderpriority, count(*) AS n_fast_items
FROM lineitem l
JOIN orders o
  ON l.l_orderkey = o.o_orderkey
 AND l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate <  o.o_orderdate + INTERVAL 60 DAY
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
)
def j7b_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    od = table(spark, sf_dir, "orders")
    return (
        li.join(
            od,
            (li.l_orderkey == od.o_orderkey)
            & (li.l_shipdate >= od.o_orderdate)
            & (li.l_shipdate < od.o_orderdate + F.expr("INTERVAL 60 DAY")),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_fast_items"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# J8: as-of join — latest event per user as of a cutoff timestamp.
# Reference analog: "latest observation per subject at time t" resolved by
# Datomic AVET index walk; here it is one shuffle + row_number (no loop).
# ---------------------------------------------------------------------------
@register(
    "j8_asof_latest_event",
    oracle="""
SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC
  ) AS rn
  FROM events
  WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'
) WHERE rn = 1
""",
)
def j8_asof_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(
        F.col("ts").cast("timestamp") <= F.lit("2024-01-15 00:00:00").cast("timestamp")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", "event_id", epoch_ms("ts").alias("ts_ms"), "event_type"
        )
    )


# ---------------------------------------------------------------------------
# J9: cross join (guarded: both sides tiny) — region x mktsegment grid.
# ---------------------------------------------------------------------------
@register(
    "j9_cross_join",
    oracle="""
SELECT r.r_name AS region_name, s.c_mktsegment AS segment
FROM region r CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) s
""",
)
def j9_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    re = table(spark, sf_dir, "region").select(F.col("r_name").alias("region_name"))
    seg = (
        table(spark, sf_dir, "customer")
        .select(F.col("c_mktsegment").alias("segment"))
        .distinct()
    )
    return re.crossJoin(broadcast(seg))


# ---------------------------------------------------------------------------
# J5b: full outer join — unmatched rows survive from BOTH sides.
# ---------------------------------------------------------------------------
@register(
    "j5b_full_outer_join",
    oracle="""
SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
       CAST(c.c_custkey IS NOT NULL AS INT) AS has_dim_row,
       CAST(coalesce(o.cnt, 0) AS BIGINT) AS n_orders
FROM (SELECT c_custkey FROM customer WHERE c_acctbal > 9000) c
FULL OUTER JOIN (
  SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey
) o ON o.o_custkey = c.c_custkey
""",
)
def j5b_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    rich = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select("c_custkey")
    )
    cnt = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return rich.join(cnt, rich.c_custkey == cnt.o_custkey, "full_outer").select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.col("c_custkey").isNotNull().cast("int").alias("has_dim_row"),
        F.coalesce("cnt", F.lit(0)).cast("long").alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# J10: fuzzy (edit-distance) similarity self-join — entity-resolution
# primitive (the reference matches subjects/items by id only; fuzzy
# matching is the standard extension for dirty dimension data; public
# repo src/lens/api.clj resolves by :id — /root/reference empty, see
# SURVEY.md §0). Bounded candidate set (custkey < 400) keeps the
# quadratic pair space small here; the 100 TB path is blocking first —
# length buckets + q-gram prefix blocks, or the MinHash-LSH pipeline in
# llm/dedup.py (l2*) which is the same problem at corpus scale. The
# length-difference prune |len(a)-len(b)| <= 2 is a necessary condition
# for levenshtein <= 2 and is evaluated before the distance call.
# ---------------------------------------------------------------------------
@register(
    "j10_fuzzy_join",
    oracle="""
SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
       levenshtein(a.c_name, b.c_name) AS dist
FROM customer a JOIN customer b
  ON a.c_custkey < b.c_custkey
 AND abs(length(a.c_name) - length(b.c_name)) <= 2
 AND levenshtein(a.c_name, b.c_name) <= 2
WHERE a.c_custkey < 400 AND b.c_custkey < 400
ORDER BY key_a, key_b
""",
)
def j10_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 400)
    a = cu.select(
        F.col("c_custkey").alias("key_a"), F.col("c_name").alias("name_a")
    )
    b = cu.select(
        F.col("c_custkey").alias("key_b"), F.col("c_name").alias("name_b")
    )
    return (
        a.join(
            broadcast(b),
            (F.col("key_a") < F.col("key_b"))
            & (
                F.abs(F.length("name_a") - F.length("name_b")) <= 2
            )
            & (F.levenshtein("name_a", "name_b") <= 2),
        )
        .select(
            "key_a",
            "key_b",
            F.levenshtein("name_a", "name_b").cast("long").alias("dist"),
        )
        .orderBy("key_a", "key_b")
    )


# ---------------------------------------------------------------------------
# J11: binned interval join — the scale rewrite of a time-range theta
# join. A naive "point BETWEEN start AND end" join with no equi key
# plans as BroadcastNestedLoopJoin (fine only while one side is tiny —
# that's J7). When BOTH sides are large, the standard technique is
# binning: explode each interval into the day bins it spans, bin each
# point by its own day, equi-join on the bin, then re-check exact
# containment as a residual filter. A point lives in exactly ONE bin,
# so no pair dedup is needed, and the join is an ordinary hash/SMJ on
# the bin key — shuffle O(points + interval-days), never a nested
# loop. The oracle runs the plain theta join, proving the rewrite.
# ---------------------------------------------------------------------------
@register(
    "j11_binned_interval_join",
    oracle="""
SELECT o.o_orderpriority,
       count(*) AS n_pairs,
       CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_intervals
FROM orders o
JOIN lineitem l
  ON l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate <  o.o_orderdate + INTERVAL 3 DAY
WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND o.o_orderdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
)
def j11_binned_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    iv = (
        table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & (F.col("o_orderdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
        )
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.col("o_orderdate").cast("timestamp").alias("start_ts"),
        )
        .withColumn(
            "bin",
            # [start, start+3d) spans calendar days d..d+3: four bins
            # whenever start has a time-of-day component (a 14:00 start
            # reaches 14:00 on day d+3). The r12 form exploded d..d+2
            # only — correct for midnight-aligned starts (the fixed
            # testdata) but it silently dropped day-d+3 matches on
            # arbitrary timestamps (caught by the r13 relational
            # campaign's random-time order books: 8 pairs vs the
            # oracle's 10). For midnight starts the d+3 bin's probes
            # all fail the exact residual filter below, so the cost of
            # the extra bin is one more shuffle replica per interval,
            # never a wrong answer.
            F.explode(
                F.sequence(
                    F.to_date("start_ts"),
                    F.date_add(F.to_date("start_ts"), 3),
                )
            ),
        )
    )
    pts = table(spark, sf_dir, "lineitem").select(
        F.col("l_shipdate").cast("timestamp").alias("ship_ts"),
        F.to_date(F.col("l_shipdate").cast("timestamp")).alias("bin"),
    )
    return (
        pts.join(iv, "bin")
        .filter(
            (F.col("ship_ts") >= F.col("start_ts"))
            & (F.col("ship_ts") < F.col("start_ts") + F.expr("INTERVAL 3 DAYS"))
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("o_orderkey").alias("n_intervals"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# J12: skew-salted join on the graded path. A synthetic hot key (30% of
# orders remapped to custkey 1 — the single-dominant-key shape AQE's
# partition splitting cannot always fix, because one KEY is indivisible
# under hash partitioning) joins to customer through
# skew.salted_join: the big side salts each row, the small side
# replicates once per salt, and the hot key's rows spread across
# n_salts tasks. The oracle runs the plain unsalted join, proving
# salting is semantics-transparent. SCALE.md records the measured win
# (tools/skew_bench.py).
# ---------------------------------------------------------------------------
@register(
    "j12_skew_salted_join",
    oracle="""
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_price_cents
FROM (SELECT CASE WHEN o_custkey % 10 < 3 THEN 1 ELSE o_custkey END AS k,
             o_totalprice
      FROM orders) o
JOIN customer c ON c.c_custkey = o.k
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
""",
)
def j12_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lens_warehouse_spark.operators.skew import salted_join

    big = table(spark, sf_dir, "orders").select(
        F.when(F.pmod("o_custkey", F.lit(10)) < 3, F.lit(1))
        .otherwise(F.col("o_custkey"))
        .alias("k"),
        "o_totalprice",
    )
    small = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), "c_mktsegment"
    )
    return (
        salted_join(big, small, "k", n_salts=8)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            cents_sum(F.col("o_totalprice")).alias("total_price_cents"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# J13: record-linkage pipeline (entity resolution) — the classic
# block-then-verify shape: deterministic "dirty" records are
# synthesized from part names (suffix corruption, new ids), candidate
# pairs form ONLY within a blocking key (name prefix — the O(n^2)
# killer: comparisons happen per block, never across the corpus), and
# a Levenshtein edit-distance verify keeps pairs within distance 2.
# Everything is deterministic and SQL-expressible, so unlike most ER
# systems the whole pipeline is oracle-checked, not just spot-tested.
# Scale honesty: blocking keys shuffle once and candidate generation
# is quadratic ONLY in block size — but with this 4-char prefix key the
# block COUNT is bounded (8 distinct prefixes here) while block SIZE
# grows O(n), so comparisons grow O(n^2 / #blocks): fine at the demo
# SFs, NOT a 100 TB plan as-is. At scale the blocking key must carry
# enough entropy to bound block size (longer prefixes, phonetic keys,
# or LSH blocking a la l2) — the pipeline SHAPE (block -> verify) is
# what transfers, not this particular key. j10's fuzzy join
# is the unblocked 2-table variant; l2e's components would resolve
# multi-record clusters downstream.
# ---------------------------------------------------------------------------
@register(
    "j13_record_linkage",
    oracle="""
WITH dirty AS (
  SELECT p_partkey + 100000 AS dirty_id,
         p_name || ' x' AS dirty_name,
         substring(p_name, 1, 4) AS blk
  FROM part WHERE p_partkey % 7 = 0
), clean AS (
  SELECT p_partkey, p_name, substring(p_name, 1, 4) AS blk FROM part
)
SELECT d.dirty_id, c.p_partkey AS matched_partkey,
       CAST(levenshtein(d.dirty_name, c.p_name) AS BIGINT) AS distance
FROM dirty d
JOIN clean c ON c.blk = d.blk
WHERE levenshtein(d.dirty_name, c.p_name) <= 2
ORDER BY dirty_id, matched_partkey
""",
)
def j13_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    pa = table(spark, sf_dir, "part").select("p_partkey", "p_name")
    dirty = pa.filter(F.col("p_partkey") % 7 == 0).select(
        (F.col("p_partkey") + 100000).alias("dirty_id"),
        F.concat(F.col("p_name"), F.lit(" x")).alias("dirty_name"),
        F.substring("p_name", 1, 4).alias("blk"),
    )
    clean = pa.select(
        "p_partkey", "p_name", F.substring("p_name", 1, 4).alias("blk")
    )
    return (
        dirty.join(clean, "blk")
        .filter(F.levenshtein("dirty_name", "p_name") <= 2)
        .select(
            "dirty_id",
            F.col("p_partkey").alias("matched_partkey"),
            F.levenshtein("dirty_name", "p_name").cast("long").alias("distance"),
        )
        .orderBy("dirty_id", "matched_partkey")
    )
