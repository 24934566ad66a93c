"""Gap-fill operators: null/presence (P6), global sort (O1), grouping
sets (A8c), decimal discipline (F4), map functions (F6), batch sink
round-trip (S3).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lens_warehouse_spark.catalog import table
from lens_warehouse_spark.registry import register


# ---------------------------------------------------------------------------
# P6: null / presence tests (ref: EAV attribute present on entity).
# Formulated as a left join + isNull — the "attribute absent" shape.
# ---------------------------------------------------------------------------
@register(
    "p6_null_presence",
    oracle="""
SELECT c.c_custkey,
       CAST(o.o_custkey IS NOT NULL AS INT) AS has_urgent_order
FROM customer c
LEFT JOIN (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
) o ON o.o_custkey = c.c_custkey
""",
)
def p6_null_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = table(spark, sf_dir, "customer")
    urgent = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    return cu.join(urgent, cu.c_custkey == urgent.o_custkey, "left").select(
        "c_custkey",
        F.col("o_custkey").isNotNull().cast("int").alias("has_urgent_order"),
    )


# ---------------------------------------------------------------------------
# O1: global sort (range-partitioned shuffle at scale).
# ---------------------------------------------------------------------------
@register(
    "o1_global_sort",
    oracle="""
SELECT s_suppkey, s_name, round(s_acctbal, 2) AS acctbal
FROM supplier
ORDER BY s_acctbal DESC, s_suppkey
""",
)
def o1_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "supplier")
        .orderBy(F.col("s_acctbal").desc(), "s_suppkey")
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("acctbal"))
    )


# ---------------------------------------------------------------------------
# A8c: GROUPING SETS through the SQL surface (temp-view catalog, S5).
# ---------------------------------------------------------------------------
@register(
    "a8c_grouping_sets",
    oracle="""
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
)
def a8c_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("lws_orders_gs")
    # The trailing UNION ALL arm restores the () grouping set's
    # zero-count row over an EMPTY table (standard semantics; Spark's
    # grouping-sets expansion omits it — see a8_rollup).
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n
        FROM lws_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        UNION ALL
        SELECT 'ALL', 'ALL', CAST(0 AS BIGINT)
        FROM (SELECT count(*) AS c FROM lws_orders_gs) WHERE c = 0
        """
    )


# ---------------------------------------------------------------------------
# F4: decimal money discipline — per-row cast to DECIMAL(12,2), exact
# decimal sum, emitted as DOUBLE (engine-neutral schema).
# ---------------------------------------------------------------------------
@register(
    "f4_decimal_money",
    oracle="""
SELECT o_orderstatus,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18, 2))) AS DOUBLE) AS total_decimal
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def f4_decimal_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_decimal")
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# F6: map functions (map built & consumed in-plan; scalar projection out).
# ---------------------------------------------------------------------------
@register(
    "f6_map_functions",
    oracle="""
SELECT o_orderkey, o_orderpriority AS prio_from_map, 2 AS map_size
FROM orders
""",
)
def f6_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.element_at(m, "priority").alias("prio_from_map"),
        F.size(m).alias("map_size"),
    )


# ---------------------------------------------------------------------------
# S3: batch sink round-trip — write partitioned parquet, read it back.
# ---------------------------------------------------------------------------
@register(
    "s3_sink_roundtrip",
    oracle="""
SELECT o_orderstatus, count(*) AS n
FROM orders WHERE o_totalprice > 150000
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def s3_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    tag = sf_dir.strip("/").replace("/", "_")
    out = os.path.join(tempfile.gettempdir(), f"lws_sink_{tag}")
    filtered = table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 150000
    )
    (
        filtered.write.mode("overwrite")
        .partitionBy("o_orderstatus")
        .parquet(out)
    )
    # Read back with the WRITER's schema: an empty filter result writes
    # only _SUCCESS (no part files, no partition dirs), and schema
    # inference on that raises AnalysisException (r13 relational
    # campaign, empty-orders corpus). A production sink reader carries
    # the table schema rather than inferring it from data files anyway.
    return (
        spark.read.schema(filtered.schema).parquet(out)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# S3b: upsert / merge — the reference's import path (EP-3) is Datomic
# transact: re-asserting an entity id replaces its attribute values.
# Merge-on-read expression: union(base, updates), keep the newest row per
# key (updates win over base; later updates win over earlier).
# ---------------------------------------------------------------------------
@register(
    "s3b_upsert_merge",
    oracle="""
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, 0 AS version FROM orders
), updates AS (
  SELECT o_orderkey, 'X' AS o_orderstatus, round(o_totalprice * 1.1, 2) AS o_totalprice,
         1 AS version
  FROM orders WHERE o_orderkey % 100 = 0
), merged AS (
  SELECT *, row_number() OVER (
    PARTITION BY o_orderkey ORDER BY version DESC
  ) AS rn
  FROM (SELECT * FROM base UNION ALL SELECT * FROM updates)
)
SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS totalprice
FROM merged WHERE rn = 1
""",
)
def s3b_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    od = table(spark, sf_dir, "orders")
    base = od.select(
        "o_orderkey", "o_orderstatus", "o_totalprice", F.lit(0).alias("version")
    )
    updates = (
        od.filter(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            F.lit("X").alias("o_orderstatus"),
            F.round(F.col("o_totalprice") * 1.1, 2).alias("o_totalprice"),
            F.lit(1).alias("version"),
        )
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.col("version").desc())
    return (
        base.unionByName(updates)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.round("o_totalprice", 2).alias("totalprice"),
        )
    )


# ---------------------------------------------------------------------------
# S3c: import validation — the reference validates entities with
# Prismatic schema before transacting (EP-3). Relational form: per-rule
# violation counts over the incoming batch; a real pipeline routes
# violators to a quarantine sink.
# ---------------------------------------------------------------------------
@register(
    "s3c_validate_import",
    oracle="""
SELECT
  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_key,
  CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpositive_price,
  CAST(sum(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P') THEN 1 ELSE 0 END) AS BIGINT) AS bad_status,
  CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01 00:00:00'
                  OR o_orderdate >= TIMESTAMP '2030-01-01 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS bad_date,
  count(*) AS n_rows
FROM orders
""",
)
def s3c_validate_import(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = table(spark, sf_dir, "orders")
    flag = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return od.agg(
        flag(F.col("o_orderkey").isNull()).alias("null_key"),
        flag(F.col("o_totalprice") <= 0).alias("nonpositive_price"),
        flag(~F.col("o_orderstatus").isin("F", "O", "P")).alias("bad_status"),
        flag(
            (F.col("o_orderdate") < F.lit("1990-01-01 00:00:00").cast("timestamp"))
            | (F.col("o_orderdate") >= F.lit("2030-01-01 00:00:00").cast("timestamp"))
        ).alias("bad_date"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# S5b: catalog introspection — describe a table's columns (ref: Datomic
# schema IS the catalog; browse endpoints render entity attributes).
# ---------------------------------------------------------------------------
@register(
    "s5b_catalog_describe",
    oracle="""
SELECT column_name, CAST(ordinal_position AS INT) AS ordinal
FROM information_schema.columns
WHERE table_name = 'orders'
ORDER BY ordinal
""",
)
def s5b_catalog_describe(spark: SparkSession, sf_dir: str) -> DataFrame:
    schema = table(spark, sf_dir, "orders").schema
    rows = [(f.name, i + 1) for i, f in enumerate(schema.fields)]
    return spark.createDataFrame(rows, "column_name string, ordinal int").orderBy(
        "ordinal"
    )


# ---------------------------------------------------------------------------
# S3b: multi-format round-trip — the engine's source/sink surface beyond
# parquet. Events write as CSV (header), JSON-lines, and ORC, read back
# with explicit schemas (CSV/JSON types would otherwise be inferred),
# and each format must reproduce identical aggregates. At scale these
# are the ingest formats; parquet/ORC are the columnar resting formats.
# ---------------------------------------------------------------------------
@register(
    "s3b_multiformat_roundtrip",
    oracle="""
SELECT fmt, n, total_cents
FROM (
  SELECT 'csv' AS fmt, count(*) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents FROM events
  UNION ALL
  SELECT 'json', count(*), CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) FROM events
  UNION ALL
  SELECT 'orc', count(*), CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) FROM events
)
ORDER BY fmt
""",
)
def s3b_multiformat_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lens_warehouse_spark.operators.timetravel import _staging_tag

    ev = table(spark, sf_dir, "events").select("event_id", "value")
    base = os.path.join(
        tempfile.gettempdir(), f"lws_fmt_{_staging_tag(sf_dir, 'events')}"
    )
    outs = []
    for fmt in ("csv", "json", "orc"):
        path = os.path.join(base, fmt)
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            w = ev.write.mode("overwrite")
            (w.option("header", True) if fmt == "csv" else w).format(fmt).save(path)
        r = spark.read
        if fmt == "csv":
            r = r.option("header", True)
        back = r.schema("event_id BIGINT, value DOUBLE").format(fmt).load(path)
        outs.append(
            back.agg(
                F.lit(fmt).alias("fmt"),
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("total_cents"),
            ).select("fmt", "n", "total_cents")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("fmt")


# ---------------------------------------------------------------------------
# S6: z-order clustering is semantics-transparent — the same box filter
# + aggregate through the Morton-curve re-layout (scale ranks, bit
# interleave, range repartition, in-partition sort) returns exactly the
# raw-table answer. The layout's data-skipping payoff is proved against
# parquet row-group stats in tests/test_zorder.py; this entry keeps the
# expression itself (the aggregate/sequence bit fold) on the graded
# correctness path.
# ---------------------------------------------------------------------------
@register(
    "s6_zorder_scan",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
WHERE user_id BETWEEN 20 AND 40 AND value BETWEEN 10 AND 20
""",
)
def s6_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lens_warehouse_spark.operators.layout import zorder_df

    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    z = zorder_df(ev, ["user_id", "value"], bits=8, n_files=8)
    return z.filter(
        (F.col("user_id").between(20, 40)) & (F.col("value").between(10, 20))
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("value_cents"),
    )


# ---------------------------------------------------------------------------
# S7: snapshot diff (CDC) — classify every key as Inserted / Deleted /
# Updated between two table snapshots: ONE full-outer shuffle join on
# the key (zero-shuffle under the bucketed layout, SCALE.md) plus a
# changed-row filter; the emitted change set is tiny relative to the
# snapshots. This is the batch CDC primitive behind incremental import
# (the reference ingests incremental Datomic transactions through its
# REST layer — public repo src/lens/handler.clj; /root/reference empty,
# SURVEY.md §0) and behind s3b_upsert_merge's source deltas. Snapshots
# are derived deterministically from orders: % 97 keys deleted, % 89
# prices restated (*1.1, identical FP expression both engines), % 101
# keys re-inserted under new (negative) ids.
# ---------------------------------------------------------------------------
@register(
    "s7_snapshot_diff",
    oracle="""
WITH old AS (
  SELECT o_orderkey, o_totalprice FROM orders
), new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice * 1.1
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 97 <> 0
  UNION ALL
  SELECT -o_orderkey AS o_orderkey, o_totalprice
  FROM orders WHERE o_orderkey % 101 = 0
)
SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS okey,
       CASE WHEN n.o_orderkey IS NULL THEN 'D'
            WHEN o.o_orderkey IS NULL THEN 'I'
            ELSE 'U' END AS change_type
FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
WHERE n.o_orderkey IS NULL OR o.o_orderkey IS NULL
   OR o.o_totalprice <> n.o_totalprice
ORDER BY okey
""",
)
def s7_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = table(spark, sf_dir, "orders")
    old = od.select("o_orderkey", "o_totalprice")
    new = (
        od.filter(F.col("o_orderkey") % 97 != 0)
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") * 1.1
            )
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
        .unionByName(
            od.filter(F.col("o_orderkey") % 101 == 0).select(
                (-F.col("o_orderkey")).alias("o_orderkey"), "o_totalprice"
            )
        )
    )
    o = old.alias("o")
    n = new.alias("n")
    joined = o.join(
        n, F.col("o.o_orderkey") == F.col("n.o_orderkey"), "full_outer"
    )
    return (
        joined.filter(
            F.col("n.o_orderkey").isNull()
            | F.col("o.o_orderkey").isNull()
            | (F.col("o.o_totalprice") != F.col("n.o_totalprice"))
        )
        .select(
            F.coalesce(F.col("o.o_orderkey"), F.col("n.o_orderkey")).alias("okey"),
            F.when(F.col("n.o_orderkey").isNull(), "D")
            .when(F.col("o.o_orderkey").isNull(), "I")
            .otherwise("U")
            .alias("change_type"),
        )
        .orderBy("okey")
    )


# ---------------------------------------------------------------------------
# S5c: one-pass column profiling — per-column null count, distinct
# count, min/max — the warehouse "describe statistics" surface (the
# reference serves attribute metadata from its catalog; public repo
# src/lens/api.clj schema endpoints — /root/reference empty, SURVEY.md
# §0). ONE scan computes every stat as a single wide aggregate row
# (partial-agg map-side, no per-column scans), then stack() unpivots the
# 1-row result driver-side-free into the (column, stats) long form.
# Numerics are printf('%.2f')-formatted identically on both engines so
# min/max share one string column with the text columns.
# ---------------------------------------------------------------------------
@register(
    "s5c_profile",
    oracle="""
WITH s AS (
  SELECT
    count(*) AS n,
    count(c_custkey) AS k_n, count(DISTINCT c_custkey) AS k_d,
      printf('%.2f', CAST(min(c_custkey) AS DOUBLE)) AS k_min, printf('%.2f', CAST(max(c_custkey) AS DOUBLE)) AS k_max,
    count(c_name) AS nm_n, count(DISTINCT c_name) AS nm_d, min(c_name) AS nm_min, max(c_name) AS nm_max,
    count(c_acctbal) AS ab_n, count(DISTINCT c_acctbal) AS ab_d,
      printf('%.2f', min(c_acctbal)) AS ab_min, printf('%.2f', max(c_acctbal)) AS ab_max,
    count(c_mktsegment) AS mk_n, count(DISTINCT c_mktsegment) AS mk_d, min(c_mktsegment) AS mk_min, max(c_mktsegment) AS mk_max
  FROM customer
)
SELECT col, CAST(n - nn AS BIGINT) AS n_nulls, CAST(nd AS BIGINT) AS n_distinct, vmin, vmax
FROM (
  SELECT 'c_custkey' AS col, n, k_n AS nn, k_d AS nd, k_min AS vmin, k_max AS vmax FROM s
  UNION ALL SELECT 'c_name', n, nm_n, nm_d, nm_min, nm_max FROM s
  UNION ALL SELECT 'c_acctbal', n, ab_n, ab_d, ab_min, ab_max FROM s
  UNION ALL SELECT 'c_mktsegment', n, mk_n, mk_d, mk_min, mk_max FROM s
)
ORDER BY col
""",
)
def s5c_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = table(spark, sf_dir, "customer")
    # Null-safe %.2f: Java's Formatter renders a NULL argument as the
    # string "null" and then applies the precision to IT ("%.2f" ->
    # "nu"), while DuckDB's printf propagates NULL (r13 relational
    # campaign, empty-table corpus). Gate on the input.
    fmt = lambda c: F.when(
        c.isNull(), F.lit(None).cast("string")
    ).otherwise(F.format_string("%.2f", c.cast("double")))
    wide = cu.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("c_custkey").alias("k_n"),
        F.countDistinct("c_custkey").alias("k_d"),
        fmt(F.min("c_custkey")).alias("k_min"),
        fmt(F.max("c_custkey")).alias("k_max"),
        F.count("c_name").alias("nm_n"),
        F.countDistinct("c_name").alias("nm_d"),
        F.min("c_name").alias("nm_min"),
        F.max("c_name").alias("nm_max"),
        F.count("c_acctbal").alias("ab_n"),
        F.countDistinct("c_acctbal").alias("ab_d"),
        fmt(F.min("c_acctbal")).alias("ab_min"),
        fmt(F.max("c_acctbal")).alias("ab_max"),
        F.count("c_mktsegment").alias("mk_n"),
        F.countDistinct("c_mktsegment").alias("mk_d"),
        F.min("c_mktsegment").alias("mk_min"),
        F.max("c_mktsegment").alias("mk_max"),
    )
    stacked = wide.select(
        F.col("n"),
        F.expr(
            "stack(4,"
            " 'c_custkey', k_n, k_d, k_min, k_max,"
            " 'c_name', nm_n, nm_d, nm_min, nm_max,"
            " 'c_acctbal', ab_n, ab_d, ab_min, ab_max,"
            " 'c_mktsegment', mk_n, mk_d, mk_min, mk_max"
            ") AS (col, nn, nd, vmin, vmax)"
        ),
    )
    return stacked.select(
        "col",
        (F.col("n") - F.col("nn")).cast("long").alias("n_nulls"),
        F.col("nd").cast("long").alias("n_distinct"),
        "vmin",
        "vmax",
    ).orderBy("col")


# ---------------------------------------------------------------------------
# S8: SCD2 (slowly-changing-dimension type 2) history build — collapse a
# sequence of snapshots into per-key validity intervals [valid_from,
# valid_to]. The temporal-dimension primitive behind "as of snapshot N"
# queries (the reference gets this from Datomic's as-of database views;
# public repo src/lens/api.clj — /root/reference empty, SURVEY.md §0).
# Three deterministic snapshots derive from orders (%89 keys restated
# *1.1 at snap 1, %55 restated *0.9 at snap 2 — identical FP trees both
# engines, rule 5). One window pass per key (lag to find change points,
# running max to carry version starts, lead to close intervals): the
# partitionBy(o_orderkey) shuffle is the only exchange, and at 100 TB
# snapshots arrive partition-aligned by key so it degenerates to a
# map-side pass under bucketing (SCALE.md).
# ---------------------------------------------------------------------------
@register(
    "s8_scd2_history",
    oracle="""
WITH snaps AS (
  SELECT 0 AS snap_id, o_orderkey, o_totalprice AS price FROM orders
  UNION ALL
  SELECT 1, o_orderkey,
         CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice * 1.1 ELSE o_totalprice END
  FROM orders
  UNION ALL
  SELECT 2, o_orderkey,
         CASE WHEN o_orderkey % 55 = 0 THEN o_totalprice * 0.9
              WHEN o_orderkey % 89 = 0 THEN o_totalprice * 1.1
              ELSE o_totalprice END
  FROM orders
), marked AS (
  SELECT snap_id, o_orderkey, price,
         CASE WHEN lag(price) OVER w IS NULL OR price <> lag(price) OVER w
              THEN 1 ELSE 0 END AS is_start
  FROM snaps
  WINDOW w AS (PARTITION BY o_orderkey ORDER BY snap_id)
), versions AS (
  SELECT o_orderkey, price, snap_id AS valid_from,
         lead(snap_id) OVER (PARTITION BY o_orderkey ORDER BY snap_id) - 1 AS next_minus
  FROM marked WHERE is_start = 1
)
SELECT o_orderkey, price,
       CAST(valid_from AS BIGINT) AS valid_from,
       CAST(COALESCE(next_minus, 999) AS BIGINT) AS valid_to
FROM versions
ORDER BY o_orderkey, valid_from
""",
)
def s8_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    od = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    restate1 = F.when(
        F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") * 1.1
    ).otherwise(F.col("o_totalprice"))
    restate2 = (
        F.when(F.col("o_orderkey") % 55 == 0, F.col("o_totalprice") * 0.9)
        .when(F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") * 1.1)
        .otherwise(F.col("o_totalprice"))
    )
    snaps = (
        od.select(F.lit(0).alias("snap_id"), "o_orderkey", F.col("o_totalprice").alias("price"))
        .unionByName(od.select(F.lit(1).alias("snap_id"), "o_orderkey", restate1.alias("price")))
        .unionByName(od.select(F.lit(2).alias("snap_id"), "o_orderkey", restate2.alias("price")))
    )
    w = Window.partitionBy("o_orderkey").orderBy("snap_id")
    marked = snaps.withColumn(
        "is_start",
        F.when(
            F.lag("price").over(w).isNull()
            | (F.col("price") != F.lag("price").over(w)),
            1,
        ).otherwise(0),
    ).filter(F.col("is_start") == 1)
    return marked.select(
        "o_orderkey",
        "price",
        F.col("snap_id").cast("long").alias("valid_from"),
        F.coalesce(
            F.lead("snap_id").over(w) - 1, F.lit(999)
        ).cast("long").alias("valid_to"),
    ).orderBy("o_orderkey", "valid_from")


# ---------------------------------------------------------------------------
# S9: schema evolution on read — the ingest reality at 100 TB: years of
# parquet batches where later producers added columns. Batch 1 lacks
# event_type; batch 2 carries it; a mergeSchema read reconciles the
# footers (schema union, null backfill for the missing column) without
# rewriting old data. The aggregate proves both the union (row counts)
# and the backfill (nulls exactly on batch-1 rows). At scale mergeSchema
# footer reconciliation is a driver-side listing cost — pin the merged
# schema in the table catalog instead of re-merging per query (S5's
# job); the read itself stays fully parallel either way. Reference's
# Datomic schema is append-only attributes — same evolution model, EAV
# side [P src/lens/schema.clj].
# ---------------------------------------------------------------------------
@register(
    "s9_schema_evolution",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE event_id % 2 = 0) AS BIGINT) AS n_legacy,
       CAST(count(DISTINCT CASE WHEN event_id % 2 <> 0 THEN event_type END)
            AS BIGINT) AS n_types,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM events
""",
)
def s9_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lens_warehouse_spark.operators.timetravel import _staging_tag

    ev = table(spark, sf_dir, "events")
    base = os.path.join(
        tempfile.gettempdir(), f"lws_evo_{_staging_tag(sf_dir, 'events')}"
    )
    b1, b2 = os.path.join(base, "b1"), os.path.join(base, "b2")
    if not os.path.exists(os.path.join(b2, "_SUCCESS")):
        ev.filter(F.col("event_id") % 2 == 0).select("event_id", "value").write.mode(
            "overwrite"
        ).parquet(b1)
        ev.filter(F.col("event_id") % 2 != 0).select(
            "event_id", "value", "event_type"
        ).write.mode("overwrite").parquet(b2)
    merged = spark.read.option("mergeSchema", True).parquet(b1, b2)
    return merged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("event_type").isNull(), 1)).alias("n_legacy"),
        F.countDistinct("event_type").alias("n_types"),
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("total_cents"),
    )


# ---------------------------------------------------------------------------
# S16: small-file compaction on the graded path — the table-maintenance
# primitive every 100 TB ingest needs (streaming sinks and per-batch
# writers leave thousands of KB-sized files; scan cost becomes file-
# open-bound). A deliberately fragmented copy of events (64 files) is
# staged once, then compacted to a size-targeted file count with
# range clustering on (event_type, ts) so min/max skipping survives
# the rewrite. The oracle aggregates the ORIGINAL table — proving the
# compacted layout content-transparent; the file-count reduction and
# per-file sort are asserted in tests/test_partitioning.py.
# ---------------------------------------------------------------------------
@register(
    "s16_compaction",
    oracle="""
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_value_cents,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def s16_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob as _glob

    from lens_warehouse_spark.operators.layout import compact_df, compact_plan
    from lens_warehouse_spark.operators.timetravel import _staging_tag

    frag = os.path.join(
        tempfile.gettempdir(), f"lws_frag_{_staging_tag(sf_dir, 'events')}"
    )
    if not os.path.exists(os.path.join(frag, "_SUCCESS")):
        table(spark, sf_dir, "events").repartition(64).write.mode(
            "overwrite"
        ).parquet(frag)
    compacted = frag + "_compacted"
    if not os.path.exists(os.path.join(compacted, "_SUCCESS")):
        df = spark.read.parquet(frag)
        # small target so the demo compacts 64 -> >1 files even at test
        # SFs; production uses the 128 MB default
        n = compact_plan(frag, target_bytes=1 * 1024 * 1024)
        compact_df(df, n, ["event_type", "ts"]).write.mode(
            "overwrite"
        ).parquet(compacted)
    n_frag = len(_glob.glob(os.path.join(frag, "*.parquet")))
    n_comp = len(_glob.glob(os.path.join(compacted, "*.parquet")))
    if n_comp >= n_frag:
        # not an assert: the compaction invariant must hold under -O too
        raise RuntimeError(
            f"compaction did not reduce file count: {n_frag} -> {n_comp}"
        )
    return (
        spark.read.parquet(compacted)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("total_value_cents"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# S18: data-quality / constraint validation suite — the expectation
# checks a warehouse runs after every load, computed in ONE Spark job
# per table family and unioned into a (check, violation) frame:
# null keys, duplicate keys, range constraints, referential integrity
# (anti-join counts). Healthy zeros ARE the expected output — the
# oracle proves the counts, zero or not, match DuckDB on the same
# constraints. Scale shape: each check is a partial-aggregated scan or
# an anti-join on the already-shuffled key; no check collects rows,
# only counts.
# ---------------------------------------------------------------------------
@register(
    "s18_data_quality",
    oracle="""
SELECT check_name, CAST(violations AS BIGINT) AS violations FROM (
  SELECT 'customer_null_key' AS check_name,
         count(*) FILTER (WHERE c_custkey IS NULL) AS violations FROM customer
  UNION ALL
  SELECT 'customer_dup_key', count(*) - count(DISTINCT c_custkey) FROM customer
  UNION ALL
  SELECT 'customer_negative_balance',
         count(*) FILTER (WHERE c_acctbal < 0) FROM customer
  UNION ALL
  SELECT 'orders_nonpositive_total',
         count(*) FILTER (WHERE o_totalprice <= 0) FROM orders
  UNION ALL
  SELECT 'lineitem_discount_range',
         count(*) FILTER (WHERE l_discount < 0 OR l_discount > 1) FROM lineitem
  UNION ALL
  SELECT 'orders_orphan_customer',
         count(*) FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
  UNION ALL
  SELECT 'lineitem_orphan_order',
         count(*) FROM lineitem l
         WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
  UNION ALL
  SELECT 'events_orphan_user',
         count(*) FROM events e
         WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)
)
ORDER BY check_name
""",
)
def s18_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = table(spark, sf_dir, "customer")
    od = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    ev = table(spark, sf_dir, "events")
    cu_checks = cu.agg(
        F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0)).alias("nk"),
        (F.count(F.lit(1)) - F.countDistinct("c_custkey")).alias("dup"),
        F.sum(F.when(F.col("c_acctbal") < 0, 1).otherwise(0)).alias("neg"),
    )
    checks = [
        cu_checks.select(F.lit("customer_null_key").alias("check_name"),
                         F.col("nk").cast("long").alias("violations")),
        cu_checks.select(F.lit("customer_dup_key").alias("check_name"),
                         F.col("dup").cast("long").alias("violations")),
        cu_checks.select(F.lit("customer_negative_balance").alias("check_name"),
                         F.col("neg").cast("long").alias("violations")),
        od.agg(F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
               .cast("long").alias("violations"))
          .select(F.lit("orders_nonpositive_total").alias("check_name"), "violations"),
        li.agg(F.sum(F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)
                     .otherwise(0)).cast("long").alias("violations"))
          .select(F.lit("lineitem_discount_range").alias("check_name"), "violations"),
        od.join(cu.select(F.col("c_custkey").alias("o_custkey")), "o_custkey",
                "left_anti")
          .agg(F.count(F.lit(1)).cast("long").alias("violations"))
          .select(F.lit("orders_orphan_customer").alias("check_name"), "violations"),
        li.join(od.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey",
                "left_anti")
          .agg(F.count(F.lit(1)).cast("long").alias("violations"))
          .select(F.lit("lineitem_orphan_order").alias("check_name"), "violations"),
        ev.join(cu.select(F.col("c_custkey").alias("user_id")), "user_id",
                "left_anti")
          .agg(F.count(F.lit(1)).cast("long").alias("violations"))
          .select(F.lit("events_orphan_user").alias("check_name"), "violations"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("check_name")


# ---------------------------------------------------------------------------
# S20: runtime Bloom-filter join pruning — Spark's InjectRuntimeFilter
# builds a bloom filter from the selective (filtered-dim) side of a
# shuffle join and applies `might_contain` to the fact side BEFORE the
# shuffle, so non-matching fact rows never cross the wire. On a real
# cluster this triggers by itself: the default gates
# (applicationSideScanSizeThreshold 10GB / creationSideThreshold
# 100MB) describe exactly the 100 TB regime. The toy SF sits below
# both, so this op lowers the gates FOR ITS OWN EXECUTION ONLY
# (confs restored in a finally; the result is materialized eagerly
# under the adjusted confs because Catalyst optimizes at action time).
# Broadcast is disabled inside the scope — bloom pruning targets
# exactly the joins too big to broadcast. tests/test_bloom.py asserts
# `might_contain` + `bloom_filter_agg` in the executed plan and result
# equality with the un-pruned join.
# ---------------------------------------------------------------------------
_BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def _bloom_join_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # round-then-cast (parity rule 3): a bare cast truncates
            # while the oracle's CAST rounds — integral quantities mask
            # the divergence today, fractional ones would not
            F.round(F.sum("l_quantity")).cast("long").alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "s20_bloom_pruned_join",
    oracle="""
SELECT l.l_returnflag, count(*) AS n,
       CAST(sum(l.l_quantity) AS BIGINT) AS sum_qty
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
""",
)
def s20_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Save-with-unset-tracking: conf.get on a never-set key returns its
    # DEFAULT, and blindly re-setting that default would pin it as an
    # explicit value — masking later spark-defaults changes in a
    # long-lived session. Keys that were unset get unset again.
    saved = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    try:
        for k, v in _BLOOM_CONFS.items():
            spark.conf.set(k, v)
        # materialize NOW: optimization (where the bloom filter is
        # injected) happens at action time, inside the conf scope
        return _bloom_join_frame(spark, sf_dir).localCheckpoint(eager=True)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
