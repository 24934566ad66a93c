"""Scalar function surface F1-F9 (SURVEY.md §2.8).

Reference parity: lens-warehouse's scalar surface is thin — name search,
id mangling, timestamp rendering, Prismatic-schema validation (public
repo ``src/lens/api.clj``, ``src/lens/util.clj``; /root/reference empty,
SURVEY.md §0). The full families below are the engine-grade extension;
all stay JVM-side inside whole-stage codegen (zero Python UDFs here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lens_warehouse_spark.catalog import table
from lens_warehouse_spark.operators._helpers import epoch_ms
from lens_warehouse_spark.registry import register


# ---------------------------------------------------------------------------
# F1: string functions.
# ---------------------------------------------------------------------------
@register(
    "f1_string_functions",
    oracle="""
SELECT p_partkey,
       upper(p_brand) AS brand_upper,
       substring(p_name, 1, 8) AS name_prefix,
       length(p_name) AS name_len,
       concat_ws('|', p_brand, p_type) AS brand_type,
       replace(p_type, ' ', '_') AS type_snake,
       regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS brand_num
FROM part
""",
)
def f1_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.regexp_extract("p_brand", r"Brand#([0-9]+)", 1).alias("brand_num"),
    )


# ---------------------------------------------------------------------------
# F2: date/time functions (ref: visit timestamps, age-at-visit).
# ---------------------------------------------------------------------------
@register(
    "f2_datetime_functions",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT)  AS order_year,
       CAST(month(o_orderdate) AS INT) AS order_month,
       CAST(day(o_orderdate) AS INT)   AS order_day,
       epoch_ms(date_trunc('month', o_orderdate)) AS month_start_ms,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_epoch_start,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date_str
FROM orders
""",
)
def f2_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = F.col("o_orderdate").cast("timestamp")
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year(od).alias("order_year"),
        F.month(od).alias("order_month"),
        F.dayofmonth(od).alias("order_day"),
        epoch_ms(F.date_trunc("month", od)).alias("month_start_ms"),
        F.datediff(od.cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
        F.date_format(od, "yyyy-MM-dd").alias("order_date_str"),
    )


# ---------------------------------------------------------------------------
# F3: math functions. libm outputs rounded to 6 (cross-engine ulp drift).
# ---------------------------------------------------------------------------
@register(
    "f3_math_functions",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(abs(l_extendedprice - l_quantity * 1000.0), 2) AS abs_diff,
       CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS price_k,
       CAST(ceil(l_quantity / 7.0) AS BIGINT) AS qty_ceil,
       round(sqrt(l_extendedprice), 6) AS price_sqrt,
       round(ln(l_extendedprice), 6) AS price_ln,
       round(pow(1.0 + l_discount, 2), 6) AS disc_sq
FROM lineitem
WHERE l_extendedprice > 0
""",
)
def f3_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    price = F.col("l_extendedprice")
    return (
        table(spark, sf_dir, "lineitem")
        .filter(price > 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.abs(price - F.col("l_quantity") * F.lit(1000.0)), 2).alias("abs_diff"),
            F.floor(price / F.lit(1000.0)).cast("long").alias("price_k"),
            F.ceil(F.col("l_quantity") / F.lit(7.0)).cast("long").alias("qty_ceil"),
            F.round(F.sqrt(price), 6).alias("price_sqrt"),
            F.round(F.log(price), 6).alias("price_ln"),
            F.round(F.pow(F.lit(1.0) + F.col("l_discount"), 2), 6).alias("disc_sq"),
        )
    )


# ---------------------------------------------------------------------------
# F5: array functions over tokenized text (documents).
# ---------------------------------------------------------------------------
@register(
    "f5_array_functions",
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
       string_split(text, ' ')[1] AS first_token,
       CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct_tokens,
       array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:5], ',') AS first_vocab
FROM documents
""",
)
def f5_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.split("text", " ")
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.concat_ws(",", F.slice(F.array_sort(F.array_distinct(toks)), 1, 5)).alias(
            "first_vocab"
        ),
    )


# ---------------------------------------------------------------------------
# F7: JSON extraction on events.props (verified shape {"k": <int>}).
# ---------------------------------------------------------------------------
@register(
    "f7_json_extract",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INT) AS k,
       CAST(json_extract(props, '$.missing') AS INT) AS missing_key
FROM events
""",
)
def f7_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        F.get_json_object("props", "$.missing").cast("int").alias("missing_key"),
    )


# ---------------------------------------------------------------------------
# F8: conditional / null handling (ref: optional EAV attributes).
# ---------------------------------------------------------------------------
@register(
    "f8_conditional_null",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'hot'
            WHEN o_orderstatus = 'F' THEN 'done'
            ELSE 'normal' END AS order_class,
       coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
       CAST(o_totalprice > 100000 AS INT) AS is_big
FROM orders
""",
)
def f8_conditional_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "hot")
        .when(F.col("o_orderstatus") == "F", "done")
        .otherwise("normal")
        .alias("order_class"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias(
            "status_or_open"
        ),
        (F.col("o_totalprice") > 100000).cast("int").alias("is_big"),
    )


# ---------------------------------------------------------------------------
# F9: deterministic hashing (ref: entity ids; here content fingerprints).
# ---------------------------------------------------------------------------
@register(
    "f9_hash_functions",
    oracle="""
SELECT doc_id,
       sha256(text) AS text_sha,
       md5(lang) AS lang_md5
FROM documents
""",
)
def f9_hash_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.sha2(F.col("text"), 256).alias("text_sha"),
        F.md5(F.col("lang")).alias("lang_md5"),
    )


# ---------------------------------------------------------------------------
# F1b: string distance + padding/reversal family.
# ---------------------------------------------------------------------------
@register(
    "f1b_string_distance",
    oracle="""
SELECT p_partkey,
       CAST(levenshtein(p_brand, 'Brand#10') AS INT) AS edit_dist,
       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_id,
       reverse(p_brand) AS brand_rev,
       left(p_type, 5) AS type_head,
       right(p_type, 4) AS type_tail
FROM part
""",
)
def f1b_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "part").select(
        "p_partkey",
        F.levenshtein("p_brand", F.lit("Brand#10")).alias("edit_dist"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded_id"),
        F.reverse("p_brand").alias("brand_rev"),
        F.substring("p_type", 1, 5).alias("type_head"),
        F.col("p_type").substr(F.length("p_type") - 3, F.lit(4)).alias("type_tail"),
    )


# ---------------------------------------------------------------------------
# F5b: higher-order array functions — filter / exists / aggregate lambdas
# (the Catalyst lambda surface; DuckDB mirrors with list_* lambdas).
# ---------------------------------------------------------------------------
@register(
    "f5b_higher_order_arrays",
    oracle="""
SELECT doc_id,
       CAST(len(list_filter(string_split(text, ' '), t -> length(t) > 5)) AS INT) AS n_long_tokens,
       CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS BIGINT) AS total_chars,
       CAST(length(list_filter(string_split(text, ' '), t -> t = 'join')) > 0 AS BOOLEAN) AS mentions_join
FROM documents
""",
)
def f5b_higher_order_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.split("text", " ")
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.filter(toks, lambda t: F.length(t) > 5)).alias("n_long_tokens"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).alias("total_chars"),
        F.exists(toks, lambda t: t == F.lit("join")).alias("mentions_join"),
    )


# ---------------------------------------------------------------------------
# F10: VARIANT semi-structured access (Spark 4 VariantType) — the
# modern engine answer to schemaless JSON columns: ``parse_json`` once
# into Spark's binary variant encoding, then ``variant_get`` path
# extraction with a type hint, plus ``try_variant_get`` returning NULL
# on missing paths instead of failing. Unlike f7's per-access
# get_json_object string parsing, the variant parse happens once per
# row and every subsequent path access reads the binary encoding —
# the right trade at 100 TB where a props column is touched by many
# predicates. The oracle reads the same paths with DuckDB's JSON
# extraction; outputs are plain BIGINTs so the wire format stays
# engine-neutral.
# ---------------------------------------------------------------------------
@register(
    "f10_variant_extract",
    oracle="""
SELECT event_type,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
       CAST(sum(CASE WHEN json_extract(props, '$.missing') IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def f10_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").withColumn(
        "v", F.parse_json("props")
    )
    k = F.variant_get("v", "$.k", "bigint")
    missing = F.try_variant_get("v", "$.missing", "bigint")
    return (
        ev.groupBy("event_type")
        .agg(
            F.sum(k).cast("long").alias("sum_k"),
            F.max(k).cast("long").alias("max_k"),
            F.sum(F.when(missing.isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_missing"),
        )
        .orderBy("event_type")
    )
