"""Aggregation operators A1-A10 (SURVEY.md §2.5).

Reference parity: lens-warehouse's analytics are counts — visit & subject
counts per cohort query, faceted per study-event (public repo
``src/lens/api.clj``; /root/reference empty, SURVEY.md §0). Numeric
min/max/avg summaries back the UI's item-value histograms. Everything
else here (approx distinct, rollup/cube, grouped arrays) is the
100-TB-scale extension mandated by the north star.

Scale notes: every groupBy below is a partial (map-side) + final
HashAggregate — one shuffle of the *aggregated* keys, never raw rows.
``approx_count_distinct`` (HLL++) replaces exact distinct counting at
100 TB where the exact shuffle would be the bottleneck; rollup/cube
compute all facets in ONE pass instead of the reference's
one-datalog-query-per-facet loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lens_warehouse_spark.catalog import table
from lens_warehouse_spark.registry import register


# ---------------------------------------------------------------------------
# A1: count + exact count-distinct (ref: visit & subject counts).
# ---------------------------------------------------------------------------
@register(
    "a1_count_distinct",
    oracle="""
SELECT count(*) AS n_orders, count(DISTINCT o_custkey) AS n_customers
FROM orders
""",
)
def a1_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


# ---------------------------------------------------------------------------
# A2: approximate count-distinct (HLL++) — the 100 TB path. No SQL oracle
# (engines' sketches differ); sanity property tested in tests/ instead.
# ---------------------------------------------------------------------------
_A2_ORACLE = """
SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
       CAST(count(*) AS BIGINT) AS n_orders,
       TRUE AS approx_within_rsd
FROM orders
"""


# Certified (r11, the equals-batch pattern's error-bound cousin): the
# HLL++ estimate itself is engine-specific and can't appear in a DuckDB
# oracle, so the query emits the EXACT distinct count plus an in-engine
# boolean asserting |approx - exact| / exact <= 0.06 (3x the requested
# rsd 0.02 — a ~3-sigma bound on a deterministic sketch). The plan
# still exercises approx_count_distinct; an estimator regression flips
# the flag and hash-fails. Was rows-only since r1.
@register("a2_approx_count_distinct", oracle=_A2_ORACLE)
def a2_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = table(spark, sf_dir, "orders").agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("approx_customers"),
        F.count_distinct(F.col("o_custkey")).alias("exact_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    err = F.abs(
        F.col("approx_customers") - F.col("exact_customers")
    ) / F.col("exact_customers")
    # exact == 0 (empty table, or every key NULL — the r13 relational
    # campaign's all-null-FK corpus): the relative-error bound is 0/0,
    # which ANSI mode raises on. An empty key set is "within rsd" iff
    # the sketch also reads 0.
    within = F.when(
        F.col("exact_customers") == 0, F.col("approx_customers") == 0
    ).otherwise(err <= 0.06)
    return agg.select(
        "exact_customers",
        "n_orders",
        within.alias("approx_within_rsd"),
    )


# ---------------------------------------------------------------------------
# A3: grouped counts / facets (ref: counts per study-event / form).
# ---------------------------------------------------------------------------
@register(
    "a3_faceted_counts",
    oracle="""
SELECT o_orderpriority, o_orderstatus, count(*) AS n
FROM orders
GROUP BY o_orderpriority, o_orderstatus
""",
)
def a3_faceted_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# A4: numeric stats (ref: item-value summaries for UI).
# stddev rounded to 2: cross-engine algorithm drift is ~1e-9, boundary 5e-3.
# ---------------------------------------------------------------------------
@register(
    "a4_numeric_stats",
    oracle="""
SELECT c_mktsegment,
       round(min(c_acctbal), 2) AS min_bal,
       round(max(c_acctbal), 2) AS max_bal,
       round(avg(c_acctbal), 4) AS avg_bal,
       round(stddev_samp(c_acctbal), 2) AS sd_bal,
       CAST(round(sum(c_acctbal)) AS BIGINT) AS sum_bal,
       count(*) AS n
FROM customer
GROUP BY c_mktsegment
""",
)
def a4_numeric_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
            F.round(F.stddev_samp("c_acctbal"), 2).alias("sd_bal"),
            F.round(F.sum("c_acctbal")).cast("long").alias("sum_bal"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# A5: histogram via explicit width buckets (ref: UI value distributions).
# Exact integer bucket edges -> deterministic across engines.
# ---------------------------------------------------------------------------
@register(
    "a5_histogram",
    oracle="""
SELECT CAST(floor((c_acctbal - (-1000.0)) / 500.0) AS BIGINT) AS bucket,
       count(*) AS n
FROM customer
GROUP BY bucket
ORDER BY bucket
""",
)
def a5_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    bucket = F.floor((F.col("c_acctbal") - F.lit(-1000.0)) / F.lit(500.0))
    return (
        table(spark, sf_dir, "customer")
        .groupBy(bucket.cast("long").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# A5b: exact percentiles via inverse-distribution (median price per status).
# percentile_cont is interpolation on sorted values — deterministic.
# ---------------------------------------------------------------------------
@register(
    "a5b_percentiles",
    oracle="""
SELECT o_orderstatus,
       round(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 4) AS p50,
       round(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice), 4) AS p90
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def a5b_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# A8: rollup — all facet levels in one pass (ref computes facets per-query).
# ---------------------------------------------------------------------------
@register(
    "a8_rollup",
    oracle="""
SELECT coalesce(r.r_name, 'ALL')  AS region_name,
       coalesce(n.n_name, 'ALL')  AS nation_name,
       CAST(GROUPING(r.r_name) * 2 + GROUPING(n.n_name) AS BIGINT) AS grp,
       count(*) AS n_suppliers
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""",
)
def a8_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    su = table(spark, sf_dir, "supplier")
    na = table(spark, sf_dir, "nation")
    re = table(spark, sf_dir, "region")
    joined = su.join(F.broadcast(na), su.s_nationkey == na.n_nationkey).join(
        F.broadcast(re), na.n_regionkey == re.r_regionkey
    )
    rolled = (
        joined.rollup("r_name", "n_name")
        .agg(F.grouping_id().cast("long").alias("grp"), F.count(F.lit(1)).alias("n_suppliers"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "grp",
            "n_suppliers",
        )
    )
    # Standard SQL ROLLUP includes the () grouping set, which — like a
    # global aggregate — yields one zero-count row even over an EMPTY
    # input; Spark's rollup omits it (r13 relational campaign,
    # empty-dim corpus: spark 0 rows vs oracle 1). Synthesize the
    # grand-total row from a count-only pass that survives the filter
    # exactly when the input is empty; count(1) is a metadata-cheap
    # partial aggregate, so the extra pass is noise at any scale.
    grand = (
        joined.agg(F.count(F.lit(1)).alias("n_suppliers"))
        .where(F.col("n_suppliers") == 0)
        .select(
            F.lit("ALL").alias("region_name"),
            F.lit("ALL").alias("nation_name"),
            F.lit(3).cast("long").alias("grp"),
            "n_suppliers",
        )
    )
    return rolled.unionByName(grand)


# ---------------------------------------------------------------------------
# A8b: cube over two independent dims.
# ---------------------------------------------------------------------------
@register(
    "a8b_cube",
    oracle="""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS grp,
       count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def a8b_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    cubed = (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.grouping_id().cast("long").alias("grp"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "grp",
            "n",
        )
    )
    # CUBE's () grouping set must yield one zero-count row over empty
    # input (standard semantics; Spark omits it — see a8_rollup).
    grand = (
        li.agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") == 0)
        .select(
            F.lit("ALL").alias("returnflag"),
            F.lit("ALL").alias("linestatus"),
            F.lit(3).cast("long").alias("grp"),
            "n",
        )
    )
    return cubed.unionByName(grand)


# ---------------------------------------------------------------------------
# A9: conditional aggregation (ref: per-criterion counts in one scan).
# ---------------------------------------------------------------------------
@register(
    "a9_conditional_agg",
    oracle="""
SELECT o_orderstatus,
       CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
       CAST(sum(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
       count(*) AS n
FROM orders
GROUP BY o_orderstatus
""",
)
def a9_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0))
            .cast("long")
            .alias("n_urgent"),
            F.sum(F.when(F.col("o_totalprice") > 200000, 1).otherwise(0))
            .cast("long")
            .alias("n_big"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# A10: collect children to (sorted) array — ref renders metadata trees via
# pull-many. Emitted as a joined string: engine-neutral for value hashing.
# ---------------------------------------------------------------------------
@register(
    "a10_collect_array",
    oracle="""
SELECT r.r_name AS region_name,
       array_to_string(list_sort(list(n.n_name)), ',') AS nations
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
ORDER BY r.r_name
""",
)
def a10_collect_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    na = table(spark, sf_dir, "nation")
    re = table(spark, sf_dir, "region")
    return (
        na.join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations")
        )
        .orderBy("region_name")
    )


# ---------------------------------------------------------------------------
# U1-U4 set algebra primitives (SURVEY.md §2.4) in their raw DataFrame form;
# the full CNF cohort compiler lives in cohort_queries.py.
# ---------------------------------------------------------------------------
@register(
    "u1_union_distinct",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
UNION
SELECT o_custkey FROM orders WHERE o_totalprice > 300000
""",
)
def u1_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = table(spark, sf_dir, "orders")
    a = od.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    b = od.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.unionByName(b).distinct()


@register(
    "u2_intersect",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
""",
)
def u2_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = table(spark, sf_dir, "orders")
    a = od.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    b = od.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersect(b)


@register(
    "u3_except",
    oracle="""
SELECT c_custkey AS custkey FROM customer
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
""",
)
def u3_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    open_ = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("custkey"))
    )
    return cu.subtract(open_)  # EXCEPT (distinct semantics), matching SQL


@register(
    "u4_distinct",
    oracle="""
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
""",
)
def u4_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# ---------------------------------------------------------------------------
# A13: PIVOT — status counts spread across priority columns (explicit
# value list -> deterministic schema; oracle via conditional aggregation).
# ---------------------------------------------------------------------------
@register(
    "a13_pivot",
    oracle="""
SELECT o_orderstatus,
       CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent,
       CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high,
       CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS low
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def a13_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    pivoted = (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", ["1-URGENT", "2-HIGH", "5-LOW"])
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "o_orderstatus",
        F.coalesce(F.col("1-URGENT"), F.lit(0)).cast("long").alias("urgent"),
        F.coalesce(F.col("2-HIGH"), F.lit(0)).cast("long").alias("high"),
        F.coalesce(F.col("5-LOW"), F.lit(0)).cast("long").alias("low"),
    ).orderBy("o_orderstatus")


# ---------------------------------------------------------------------------
# A14: UNPIVOT / melt — wide stats back to long (id, metric, value).
# ---------------------------------------------------------------------------
@register(
    "a14_unpivot",
    oracle="""
SELECT s_suppkey, metric, round(value, 2) AS value
FROM (
  SELECT s_suppkey, 'acctbal' AS metric, s_acctbal AS value FROM supplier
  UNION ALL
  SELECT s_suppkey, 'nationkey' AS metric, CAST(s_nationkey AS DOUBLE) AS value FROM supplier
)
ORDER BY s_suppkey, metric
""",
)
def a14_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    su = table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.col("s_acctbal").alias("acctbal"),
        F.col("s_nationkey").cast("double").alias("nationkey"),
    )
    return (
        su.unpivot("s_suppkey", ["acctbal", "nationkey"], "metric", "value")
        .select("s_suppkey", "metric", F.round("value", 2).alias("value"))
        .orderBy("s_suppkey", "metric")
    )


# ---------------------------------------------------------------------------
# U2b/U3b: bag-semantics set operations (INTERSECT ALL / EXCEPT ALL) —
# multiplicities preserved, unlike the set-semantics forms above.
# ---------------------------------------------------------------------------
@register(
    "u2b_intersect_all",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT ALL
SELECT o_custkey FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
""",
)
def u2b_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = table(spark, sf_dir, "orders")
    a = od.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    b = od.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersectAll(b)


@register(
    "u3b_except_all",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT ALL
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""",
)
def u3b_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = table(spark, sf_dir, "orders")
    a = od.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    b = od.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.exceptAll(b)


# ---------------------------------------------------------------------------
# A15: correlation / covariance — the remaining statistical aggregate
# family. Both engines use numerically-stable one-pass updates whose
# cross-engine drift is ~1e-9; rounded to 4 (boundary 5e-5, far above
# drift; corr of continuous doubles essentially never lands on one).
# ---------------------------------------------------------------------------
@register(
    "a15_correlation",
    oracle="""
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
       round(covar_samp(l_quantity, l_discount), 4) AS qty_disc_covar,
       round(covar_pop(l_extendedprice, l_tax), 4) AS price_tax_covar
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def a15_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias(
                "qty_price_corr"
            ),
            F.round(F.covar_samp("l_quantity", "l_discount"), 4).alias(
                "qty_disc_covar"
            ),
            F.round(F.covar_pop("l_extendedprice", "l_tax"), 4).alias(
                "price_tax_covar"
            ),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# A16: distributed heavy hitters — the Misra-Gries / SpaceSaving pattern.
# Stage 1 runs a weighted Misra-Gries summary of size K inside each
# partition (mapInPandas; value_counts per Arrow batch, then the
# weighted-MG prune: subtract the (K+1)-th largest weight from all,
# drop non-positives — the per-batch merge keeps the classic guarantee
# that any item with partition count > n_p/K survives). By pigeonhole,
# any item with GLOBAL count > n/K then survives in at least one
# partition, so the union of the P summaries (≤ P*K ids, broadcast-size
# even at P=10^4 partitions) is a candidate superset. Stage 2 recounts
# ONLY the candidates exactly (broadcast semi-join + one aggregation of
# the filtered rows) and applies the threshold with INTEGER arithmetic
# (cnt*K > n) — so the output is the exact heavy-hitter set and fully
# oracle-able, while raw-row shuffle volume stays bounded by the
# candidate filter instead of the full key cardinality. This is the
# 100 TB replacement for "GROUP BY user ORDER BY count DESC" over billions of
# keys. Ref parity: lens-warehouse has no sketch ops; this is part of
# the training-pipeline extension mandated by SURVEY.md §2.11.
# ---------------------------------------------------------------------------
_HH_K = 140  # summary size; threshold is count*K > n


def _mg_summaries(batches):
    """Per-partition weighted Misra-Gries over Arrow batches."""
    import pandas as pd

    counters: dict = {}
    for pdf in batches:
        for uid, w in pdf["user_id"].value_counts().items():
            counters[uid] = counters.get(uid, 0) + int(w)
        if len(counters) > _HH_K:
            cut = sorted(counters.values(), reverse=True)[_HH_K]
            counters = {
                u: c - cut for u, c in counters.items() if c - cut > 0
            }
    yield pd.DataFrame({"user_id": list(counters.keys()) or []}).astype(
        {"user_id": "int64"}
    )


@register(
    "a16_heavy_hitters",
    oracle=f"""
SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
FROM events
GROUP BY user_id
HAVING count(*) * {_HH_K} > (SELECT count(*) FROM events)
ORDER BY user_id
""",
)
def a16_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id")
    candidates = (
        ev.mapInPandas(_mg_summaries, "user_id long").distinct()
    )
    total = ev.groupBy().agg(F.count(F.lit(1)).alias("n_total"))
    return (
        ev.join(F.broadcast(candidates), "user_id", "left_semi")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * _HH_K > F.col("n_total"))
        .select("user_id", "cnt")
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# A17: approximate percentiles — percentile_approx (Greenwald-Khanna
# sketch, JVM-side, mergeable across partitions) with the accuracy knob
# exposed. The scale counterpart of a5b's exact percentile_cont: at
# 100 TB exact percentiles need a full sort while the GK sketch is one
# map-side pass + tiny merges, error bounded by 1/accuracy.
# r10 CONTRACT CHANGE (verdict #2): the hash-compared output is now
# fully oracle-checkable — exact percentiles (same convention as a5b)
# plus a gk_within_eps boolean certifying every GK answer's exact RANK
# sits inside [floor((q-eps)n)-1, ceil((q+eps)n)+1] (eps = 2/accuracy;
# the +/-1 is integer-rank slack, load-bearing at small n where the
# eps window spans <1 rank). The sketch still runs in the same single
# groupBy pass; certification adds one broadcast-join conditional-sum
# pass (a VERIFICATION artifact — at 100 TB you persist the sketch and
# skip it). DuckDB's side emits literal TRUE, so a hash-match proves
# both the exact values AND the in-bound property.
# ---------------------------------------------------------------------------
_A17_QS = [0.25, 0.5, 0.75, 0.95]
_A17_EPS = 2.0 / 10000  # 2x the GK rank-error bound at accuracy=10000


@register(
    "a17_approx_percentile",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
       round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
       CAST(count(*) AS BIGINT) AS n,
       TRUE AS gk_within_eps
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def a17_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Certification is RANK-based — the guarantee GK actually makes.
    # (The first r10 form bracketed gk between interpolated exact
    # percentiles at q +/- eps; at sf0.001 a group has ~2k rows, the
    # +/- eps window spans <1 rank, the bracket collapses to the
    # interpolated point, and the certification False-failed on values
    # GK legitimately returned. Caught by the cross-SF parity sweep.)
    # Pass 2 ranks each GK answer with one broadcast join + conditional
    # sums (map-side partials, 3 groups x 8 counters — no row blowup):
    # gkv is certified iff its value-rank interval [lt+1, le] meets
    # [floor((q-eps)n), ceil((q+eps)n)] with a +/-1 integer-rank slack.
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    fracs = ", ".join(f"{x!r}D" for x in _A17_QS)
    agg = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", _A17_QS, 10000).alias("gk"),
        F.expr(f"percentile(l_extendedprice, array({fracs}))").alias("ex"),
        F.count(F.lit(1)).alias("n"),
    )
    # agg feeds TWO consumers (the broadcast cert branch and the final
    # join's left side) whose pruned subtrees don't exchange-reuse —
    # unpinned, the full lineitem aggregation ran twice (r10 review).
    from lens_warehouse_spark.operators._helpers import pin

    agg = pin("a17.agg", agg)
    k = len(_A17_QS)
    joined = li.join(F.broadcast(agg.select("l_returnflag", "gk")), "l_returnflag")
    cert = joined.groupBy("l_returnflag").agg(
        *(
            F.sum(
                (F.col("l_extendedprice") < F.col("gk")[i]).cast("long")
            ).alias(f"lt{i}")
            for i in range(k)
        ),
        *(
            F.sum(
                (F.col("l_extendedprice") <= F.col("gk")[i]).cast("long")
            ).alias(f"le{i}")
            for i in range(k)
        ),
    )
    within = F.lit(True)
    for i, q in enumerate(_A17_QS):
        lo_rank = F.floor(F.lit(q - _A17_EPS) * F.col("n")) - 1
        hi_rank = F.ceil(F.lit(q + _A17_EPS) * F.col("n")) + 1
        within = (
            within
            & (F.col(f"le{i}") >= lo_rank)
            & (F.col(f"lt{i}") + 1 <= hi_rank)
        )
    return (
        agg.join(cert, "l_returnflag")
        .select(
            "l_returnflag",
            F.round(F.col("ex")[0], 4).alias("p25"),
            F.round(F.col("ex")[1], 4).alias("p50"),
            F.round(F.col("ex")[2], 4).alias("p75"),
            F.round(F.col("ex")[3], 4).alias("p95"),
            "n",
            within.alias("gk_within_eps"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# A18: HLL sketch rollup — the mergeable-sketch pre-aggregation pattern.
# Stage 1 builds a (event_type, day) -> HLL(user_id) sketch table
# (Datasketches HLL via hll_sketch_agg, JVM-side, partial-aggregable);
# at 100 TB that table is what you PERSIST — thousands of ~KB sketches
# instead of re-scanning the fact table. Stage 2 answers "distinct users
# per event_type over any day range" by hll_union_agg over the tiny
# sketch table — no rescan, no exact-distinct shuffle of raw keys.
# a1/a2 are the exact/approx single-pass forms; this is the rollup form
# that makes repeated distinct queries O(sketch table).
# tests/test_bucketing.py pins the relative error vs exact
# countDistinct and the union==direct mergeability identity.
# Reference counts subject sets exactly per query [P src/lens/api.clj];
# sketches are the NS scale extension.
# ---------------------------------------------------------------------------
def hll_daily_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage 1: the persistable (event_type, day) sketch rollup."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"))
    )


# ---------------------------------------------------------------------------
# A19: approximate cohort overlap — the reference's set INTERSECTION
# (clojure.set/intersection of subject-id sets, [P src/lens/api.clj])
# re-expressed as sketch algebra for 100 TB: per-cohort HLL sketches +
# inclusion-exclusion |A∩B| ≈ |A| + |B| − |A∪B| (HLL unions exactly;
# intersection only via I-E). One pass builds the 5 per-event_type
# sketches; the pair table is a trivial self-join of 5 KB-sized rows —
# the fact table is never rescanned per pair, vs U2's exact intersect
# which shuffles the full key sets for every cohort pair.
# r10 CONTRACT CHANGE (verdict #2): output is exact_overlap (exact
# pairwise distinct-user intersection, re-derivable by DuckDB) plus an
# ie_within_bound boolean certifying the I-E estimate sits within
# 5% of the pair's exact union size (+5 absolute slack) — the scale
# on which the three HLL errors compound. The sketch path is the
# production answer at 100 TB; the exact columns are the sf-scale
# verification contract (oracle emits literal TRUE).
# ---------------------------------------------------------------------------
def sketch_overlap_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pure sketch path: per-pair inclusion-exclusion estimates
    from one fact-table pass + a 5x5 broadcast self-join."""
    ev = table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    a, b = sk.alias("a"), F.broadcast(sk.alias("b"))
    return a.join(b, F.col("a.event_type") < F.col("b.event_type")).select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        (
            F.hll_sketch_estimate("a.sk")
            + F.hll_sketch_estimate("b.sk")
            - F.hll_sketch_estimate(F.hll_union("a.sk", "b.sk"))
        ).alias("approx_overlap"),
    )


@register(
    "a19_sketch_overlap",
    oracle="""
WITH d AS (SELECT DISTINCT event_type, user_id FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(count(*) AS BIGINT) AS exact_overlap,
       TRUE AS ie_within_bound
FROM d a JOIN d b
  ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def a19_sketch_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    est = sketch_overlap_estimates(spark, sf_dir)
    d = (
        table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
    )
    sz = d.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a, b = d.alias("a"), d.alias("b")
    exact = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("exact_overlap"))
        .join(F.broadcast(sz.withColumnRenamed("n", "n_a")),
              F.col("type_a") == F.col("event_type"))
        .drop("event_type")
        .join(F.broadcast(sz.withColumnRenamed("n", "n_b")),
              F.col("type_b") == F.col("event_type"))
        .drop("event_type")
    )
    union_sz = F.col("n_a") + F.col("n_b") - F.col("exact_overlap")
    return (
        exact.join(F.broadcast(est), ["type_a", "type_b"])
        .select(
            "type_a",
            "type_b",
            "exact_overlap",
            (
                F.abs(F.col("approx_overlap") - F.col("exact_overlap"))
                <= 0.05 * union_sz + 5
            ).alias("ie_within_bound"),
        )
        .orderBy("type_a", "type_b")
    )


# r10 CONTRACT CHANGE (verdict #2): a18's hash-compared output is now
# exact_users (countDistinct, re-derivable by DuckDB) + n_days + a
# sketch_within_rsd boolean certifying the rollup-union estimate sits
# within 3% of exact (lgConfigK=14 -> ~0.8% RSE; 3% is the same
# determinism-safe bound tests/test_bucketing.py has pinned since r3).
# The sketch rollup (the thing that matters at 100 TB) still runs
# unchanged; the exact pass is the sf-scale verification contract.
@register(
    "a18_hll_rollup",
    oracle="""
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
       TRUE AS sketch_within_rsd
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def a18_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    sketches = hll_daily_sketches(spark, sf_dir)
    roll = sketches.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
        F.count(F.lit(1)).alias("n_days"),
    )
    exact = (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_users"))
    )
    return (
        exact.join(F.broadcast(roll), "event_type")
        .select(
            "event_type",
            "exact_users",
            "n_days",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users")
                <= 0.03
            ).alias("sketch_within_rsd"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# A20: EXACT median without a global sort — the scale-correct exact
# selection: (1) a percentile_approx sketch pass brackets the median
# (GK error bound guarantees the true median lies inside a generous
# bracket), (2) one count pass fixes the rank of the bracket's left
# edge, (3) the in-bracket slice (a tiny, error-bounded fraction of
# the data) is ranked DISTRIBUTED via global_rank (range-repartition +
# per-partition offsets — no single-partition window, no driver
# collect), and only the two middle ranks survive the final filter.
# Nothing data-sized ever leaves the cluster: the driver sees two
# sketch scalars and two counts. Contrast with a5b/a17 which settle
# for the approximation itself. Median definition matches SQL
# quantile_cont(0.5): average of the two middle values for even n.
# ---------------------------------------------------------------------------
@register(
    "a20_exact_median",
    oracle="""
SELECT round(quantile_cont(c_acctbal, 0.5), 4) AS median_balance,
       CAST(count(*) AS BIGINT) AS n
FROM customer
""",
)
def a20_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = table(spark, sf_dir, "customer").select("c_acctbal")
    # Pass 1: bracket the median with an accuracy-bounded sketch. GK
    # rank error is n/accuracy = 1e-5·n, far inside the ±0.001 quantile
    # margin, so the true middle ranks are guaranteed in-bracket and the
    # ranked slice is ~0.2% of rows — and it stays on executors.
    lo, hi = cu.agg(
        F.percentile_approx("c_acctbal", 0.499, 100_000).alias("lo"),
        F.percentile_approx("c_acctbal", 0.501, 100_000).alias("hi"),
    ).first()
    # Pass 2: exact rank of the bracket edge + total count.
    n_total, n_below = cu.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("c_acctbal") < lo, 1).otherwise(0)).alias("b"),
    ).first()
    if not n_total:
        # Empty table (r13 relational campaign, empty-dim corpus):
        # n_below is NULL and int(None) below would crash. SQL
        # quantile_cont over zero rows is NULL with count 0 — one row.
        return spark.range(1).select(
            F.lit(None).cast("double").alias("median_balance"),
            F.lit(0).cast("long").alias("n"),
        )
    # The two middle ranks (1-based): for odd n both are (n+1)/2.
    k1, k2 = (n_total + 1) // 2, n_total // 2 + 1
    # Pass 3: rank the bracketed slice IN the cluster. Ties in
    # c_acctbal make the tiebreak order arbitrary, but the value at any
    # fixed rank is invariant under it, so no tiebreaker column needed.
    from ._helpers import global_rank

    sliced = cu.filter(
        (F.col("c_acctbal") >= lo) & (F.col("c_acctbal") <= hi)
    )
    # rank_col must NOT be "__r" — that collides with global_rank's
    # internal column and the helper would drop the rank entirely
    # (global_rank now rejects the collision outright).
    picked = global_rank(sliced, ["c_acctbal"], rank_col="__gr").filter(
        (F.col("__gr") + F.lit(int(n_below))).isin(int(k1), int(k2))
    )
    return picked.agg(
        F.round(F.avg("c_acctbal"), 4).alias("median_balance")
    ).select(
        "median_balance", F.lit(int(n_total)).cast("long").alias("n")
    )


def _widen_tiny_group_brackets(stats: DataFrame, margin: float) -> DataFrame:
    """Disable the GK bracket for groups too small to guarantee BOTH
    straddling ranks in-bracket (needs margin * n >= 2): set lo/hi to
    -inf/+inf so the slice becomes the whole (tiny) group and the
    below-count is consistently zero. Caught by direct construction: a
    2-row group's p90 bracket [v2, v2] excludes rank 1, silently
    returning v2 instead of the interpolated quantile. Zero cost for
    real groups (n >= 2/margin + 1)."""
    n_min = int(2.0 / margin) + 2
    tiny = F.col("n") < n_min
    return stats.withColumn(
        "lo", F.when(tiny, F.lit(float("-inf"))).otherwise(F.col("lo"))
    ).withColumn(
        "hi", F.when(tiny, F.lit(float("inf"))).otherwise(F.col("hi"))
    )


# ---------------------------------------------------------------------------
# A21: per-GROUP exact median without sorting any group — a20's
# bracket-then-select composed with groupBy: one sketch pass brackets
# every group's median simultaneously, one count pass fixes each
# group's below-bracket rank, and the per-group selection runs as a
# window over ONLY the in-bracket slices (error-bounded tiny), never
# the groups themselves. The slice window is partitioned by group, so
# no single-partition degeneracy; shuffle = slices + two small
# broadcast joins. quantile_cont semantics per group.
# ---------------------------------------------------------------------------
@register(
    "a21_grouped_exact_median",
    oracle="""
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS median_value,
       CAST(count(*) AS BIGINT) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def a21_grouped_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The median IS the p=0.5 percentile: h = (n-1)/2 + 1 straddles the
    # two middle ranks for even n (frac = 0.5 averages them) and the
    # single middle rank for odd n — one shared implementation instead
    # of two hand-synced copies of the rank bookkeeping.
    ev = table(spark, sf_dir, "events").select("event_type", "value")
    return _grouped_exact_percentile(ev, 0.5, "median_value")


# ---------------------------------------------------------------------------
# A22: per-group exact ARBITRARY percentile — a21's bracket-then-select
# generalized from the median to any p (here p90 per event_type). The
# sketch pass brackets [p-margin, p+margin] per group; the count pass
# fixes each group's below-bracket rank; selection windows run over
# ONLY the in-bracket slices. quantile_cont(p) semantics: linear
# interpolation between the two straddling order statistics at virtual
# index h = (n-1)*p + 1 (1-based), which the filter picks via
# floor(h)/ceil(h) and the final select interpolates exactly.
# ---------------------------------------------------------------------------
_A22_P = 0.9


@register(
    "a22_grouped_exact_percentile",
    oracle=f"""
SELECT event_type,
       round(quantile_cont(value, {_A22_P}), 4) AS p90_value,
       CAST(count(*) AS BIGINT) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def a22_grouped_exact_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_type", "value")
    return _grouped_exact_percentile(ev, _A22_P, "p90_value")


def _grouped_exact_percentile(
    ev: DataFrame, p: float, out_name: str, margin: float = 0.03
) -> DataFrame:
    """Per-group exact quantile_cont(p) over (event_type, value) via the
    bracket-then-select machinery: GK-sketch brackets [p±margin] per
    group, one conditional-agg pass fixes each group's below-bracket
    rank, then the selection window runs over ONLY the in-bracket
    slices and interpolates the straddling order statistics at virtual
    index h = (n-1)*p + 1. Shared by a21 (p=0.5) and a22 (p=0.9) so the
    subtle rank bookkeeping (incl. the tiny-group bracket widening)
    lives exactly once."""
    from pyspark.sql import Window

    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx("value", max(p - margin, 0.0), 50_000).alias("lo"),
        F.percentile_approx("value", min(p + margin, 1.0), 50_000).alias("hi"),
    )
    stats = _widen_tiny_group_brackets(stats, margin=margin)
    below = (
        ev.join(F.broadcast(stats.select("event_type", "lo")), "event_type")
        .filter(F.col("value") < F.col("lo"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_below"))
    )
    sliced = ev.join(F.broadcast(stats), "event_type").filter(
        (F.col("value") >= F.col("lo")) & (F.col("value") <= F.col("hi"))
    )
    w = Window.partitionBy("event_type").orderBy("value")
    # virtual index h (1-based) and its straddling integer ranks
    h = (F.col("n") - 1) * F.lit(p) + 1
    k_lo, k_hi = F.floor(h), F.ceil(h)
    frac = h - k_lo
    ranked = (
        sliced.withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(below), "event_type", "left")
        .withColumn(
            "rank", F.col("rn") + F.coalesce(F.col("n_below"), F.lit(0))
        )
    )
    picked = ranked.filter((F.col("rank") == k_lo) | (F.col("rank") == k_hi))
    # interpolate: v_lo*(1-frac) + v_hi*frac; when k_lo == k_hi the
    # single row carries both roles
    return (
        picked.groupBy("event_type", "n")
        .agg(
            F.min("value").alias("v_lo"),
            F.max("value").alias("v_hi"),
        )
        .select(
            "event_type",
            F.round(
                F.col("v_lo") * (F.lit(1) - frac) + F.col("v_hi") * frac, 4
            ).alias(out_name),
            F.col("n").cast("long").alias("n"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# A23: exact per-group mode — each user's dominant event_type, with a
# deterministic tie-break (lexicographically smallest among the tied
# counts). The exact counterpart of a16's approximate heavy-hitter
# machinery, at per-group granularity.
#
# Scale shape: one shuffle to count (user_id, event_type) pairs —
# partial-aggregated map-side, so raw rows collapse before moving — then
# a per-user window over at most |event_types| rows per user. No global
# window, no driver collection.
# ---------------------------------------------------------------------------
@register(
    "a23_grouped_mode",
    oracle="""
WITH c AS (
  SELECT user_id, event_type, count(*) AS cnt
  FROM events GROUP BY user_id, event_type
), r AS (
  SELECT user_id, event_type, cnt,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY cnt DESC, event_type) AS rn
  FROM c
)
SELECT user_id, event_type AS modal_event, CAST(cnt AS BIGINT) AS cnt
FROM r WHERE rn = 1
ORDER BY user_id
""",
)
def a23_grouped_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    c = (
        table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("user_id").orderBy(F.col("cnt").desc(), "event_type")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("modal_event"),
            F.col("cnt").cast("long").alias("cnt"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# A24: exact equi-depth histogram — the optimizer-statistics / feature-
# binning primitive: exact deciles of o_totalprice (quantile_cont
# semantics) computed with the bracket-then-select machinery, then one
# aggregation binning every row by how many boundaries it exceeds.
#
# Scale shape: FOUR passes over the fact column, all partial-aggregated
# — (1) one GK sketch call brackets ALL nine deciles at once (18 probe
# points, rank error 1e-5*n << the ±0.005 bracket margin, so brackets
# are disjoint and each true decile is guaranteed in-bracket), (2) one
# conditional-sum pass fixes each bracket's below-rank, (3) the union
# of the nine tiny slices ranks in a window PARTITIONED by decile
# index (never the full table, no single-partition window), and the
# straddling order statistics interpolate exactly like a22, (4) the
# binning pass compares each row against nine rounded literals inside
# codegen. Only 9 boundary doubles and 10 counts ever reach the
# driver. Boundary parity: identical interpolation expression to a22
# (proven against quantile_cont), rounded to 4 before binning on BOTH
# engines so bin edges are exact decimals.
# ---------------------------------------------------------------------------
_A24_PS = tuple(round(0.1 * i, 1) for i in range(1, 10))
_A24_MARGIN = 0.005


@register(
    "a24_equidepth_histogram",
    oracle=f"""
WITH q AS (
  SELECT list_transform(
           quantile_cont(o_totalprice, [{", ".join(str(p) for p in _A24_PS)}]),
           x -> round(x, 4)) AS qs
  FROM orders
)
SELECT CAST(len(list_filter(q.qs, b -> o.o_totalprice > b)) AS BIGINT) AS bin,
       count(*) AS n_rows
FROM orders o CROSS JOIN q
GROUP BY 1
ORDER BY 1
""",
)
def a24_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = table(spark, sf_dir, "orders").select("o_totalprice")
    try:
        bounds = exact_quantile_boundaries(od, "o_totalprice", _A24_PS, _A24_MARGIN)
    except ValueError:
        # Empty table (r13 relational campaign): no deciles exist and
        # the oracle's cross-join-with-quantiles form yields zero
        # groups — return the empty relation with the result schema.
        return spark.createDataFrame([], "bin long, n_rows long")
    # Pass 4: bin by boundary-exceedance count, entirely in codegen.
    bin_expr = sum(
        (F.col("o_totalprice") > F.lit(b)).cast("long") for b in bounds
    )
    return (
        od.groupBy(bin_expr.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("bin")
    )


def exact_quantile_boundaries(
    df: DataFrame,
    col: str,
    ps: tuple = _A24_PS,
    margin: float = _A24_MARGIN,
    accuracy: int = 100_000,
) -> list[float]:
    """Exact quantile_cont(p) for every p, rounded to 4 — bracket with
    one GK sketch call, rank the disjoint slices in a per-p window,
    interpolate the straddling order statistics (a20/a22 machinery).
    Returns O(|ps|) floats; nothing data-sized reaches the driver."""
    from pyspark.sql import Window

    m = margin
    od = df.select(F.col(col).alias("o_totalprice"))
    ps = tuple(ps)

    # Pass 1: bracket all quantiles with one sketch call; n rides along
    # in the SAME aggregation (a dedicated od.count() pre-pass was a
    # full extra scan per invocation that made the a24 header's "four
    # passes" a lie). The bracket must contain BOTH straddling ranks
    # floor/ceil((n-1)p+1), which needs margin*n >= 2: at scale the
    # plain margin satisfies that; only a tiny input (n < 2/margin)
    # re-brackets once with a widened margin (caught by the hypothesis
    # test at n=2).
    def sketch(mm: float):
        probes = [max(p - mm, 0.0) for p in ps] + [min(p + mm, 1.0) for p in ps]
        return od.agg(
            F.percentile_approx("o_totalprice", probes, accuracy).alias("b"),
            F.count(F.lit(1)).alias("n"),
        ).first()

    row = sketch(m)
    n = row["n"]
    if n == 0:
        # percentile_approx over zero rows yields NULL — fail with a
        # clear contract instead of a NoneType subscript below.
        raise ValueError("exact_quantile_boundaries: empty input")
    if m * n < 2:
        row = sketch(m + 2.0 / n)
    lows, highs = row["b"][: len(ps)], row["b"][len(ps):]
    # Pass 2: exact below-bracket rank per decile (one conditional agg).
    below_row = od.agg(
        *[
            F.sum(F.when(F.col("o_totalprice") < lows[i], 1).otherwise(0)).alias(
                f"b{i}"
            )
            for i in range(len(ps))
        ]
    ).first()
    below = [int(below_row[f"b{i}"]) for i in range(len(ps))]
    # Pass 3: rank the union of the (disjoint) slices, partitioned by
    # decile index; pick and interpolate the straddling statistics.
    # Membership via a 9-row broadcast range join, NOT a first-match
    # CASE tag: under heavy ties the brackets can OVERLAP on a repeated
    # value, and every p must still see its full slice (caught by the
    # hypothesis test on tied data). Join output = sum of slice sizes.
    spark = df.sparkSession
    brackets = spark.createDataFrame(
        [(i, float(lows[i]), float(highs[i])) for i in range(len(ps))],
        "p_idx int, lo double, hi double",
    )
    sliced = od.join(
        F.broadcast(brackets),
        (F.col("o_totalprice") >= F.col("lo"))
        & (F.col("o_totalprice") <= F.col("hi")),
    )
    w = Window.partitionBy("p_idx").orderBy("o_totalprice")
    below_map = F.element_at(
        F.array(*[F.lit(b) for b in below]), F.col("p_idx") + 1
    )
    p_arr = F.array(*[F.lit(float(p)) for p in ps])
    h = (F.lit(n) - 1) * F.element_at(p_arr, F.col("p_idx") + 1) + 1
    k_lo, k_hi = F.floor(h), F.ceil(h)
    frac = h - k_lo
    picked = (
        sliced.withColumn("rank", F.row_number().over(w) + below_map)
        .filter((F.col("rank") == k_lo) | (F.col("rank") == k_hi))
        .groupBy("p_idx")
        .agg(
            F.min("o_totalprice").alias("v_lo"),
            F.max("o_totalprice").alias("v_hi"),
        )
        .select(
            "p_idx",
            F.round(
                F.col("v_lo") * (F.lit(1) - frac) + F.col("v_hi") * frac, 4
            ).alias("boundary"),
        )
    )
    return [r["boundary"] for r in picked.orderBy("p_idx").collect()]


# ---------------------------------------------------------------------------
# A25: windowed sketch merge — 7-day rolling distinct users from DAILY
# HLL sketches (Datasketches hll_sketch_agg per day, hll_union_agg over
# a 7-row frame). The sketch answer to w9's exact rolling DAU: at
# 100 TB the exact form shuffles (user, day) fan-out pairs, while this
# one aggregates each day's sketch ONCE (map-side combinable, KB-sized)
# and the rolling union touches only |days| sketches — the frame is the
# bounded day series, never raw events. Mergeability is the point:
# day sketches are computed once and reused by every window that
# covers them (and by a18's coarser rollups). Certified (r11, was
# rows-only): the estimates are sketch-impl-specific, so the query
# emits the EXACT trailing-7-row distinct counts (same row-frame
# semantics as the sketch window) plus an in-engine boolean asserting
# every estimate lands within 5% of exact (default lgK=12 sketch,
# rsd ~1.6%; 5% is ~3 sigma) — the oracle re-derives the exact counts
# and literal TRUE. tests/test_sketches.py keeps the per-day bound.
# The exact side is the certification epilogue, severable at scale;
# the sketch pipeline remains the production path.
# ---------------------------------------------------------------------------
_A25_ORACLE = """
WITH ud AS (
  SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
), days AS (
  SELECT day, row_number() OVER (ORDER BY day) AS rn
  FROM (SELECT DISTINCT day FROM ud)
), pairs AS (
  SELECT d2.day AS day, ud.user_id
  FROM days d1
  JOIN days d2 ON d2.rn BETWEEN d1.rn AND d1.rn + 6
  JOIN ud ON ud.day = d1.day
)
SELECT epoch_ms(day) AS day_ms,
       CAST(count(DISTINCT user_id) AS BIGINT) AS dau7_exact,
       TRUE AS within_bound
FROM pairs GROUP BY day ORDER BY day_ms
"""


@register("a25_windowed_hll", oracle=_A25_ORACLE)
def a25_windowed_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from lens_warehouse_spark.operators._helpers import as_ts

    daily = (
        table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", as_ts("ts")).alias("day"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    # the frame is the bounded day series (one row per day), so the
    # unpartitioned ordered window is O(|days|), like u8's month series
    w = Window.orderBy("day").rowsBetween(-6, 0)
    est = daily.select(
        "day",
        F.hll_sketch_estimate(F.hll_union_agg("sk").over(w))
        .cast("long")
        .alias("dau7_estimate"),
    )
    # exact twin with the SAME trailing-7-ROW frame over the day
    # series: rank the day series, band-join rank windows, distinct
    # per covered day — all on the bounded day/user-day domain.
    ud = (
        table(spark, sf_dir, "events")
        .select(F.date_trunc("day", as_ts("ts")).alias("day"), "user_id")
        .distinct()
    )
    days = ud.select("day").distinct().withColumn(
        "rn", F.row_number().over(Window.orderBy("day"))
    )
    d1, d2 = days.alias("d1"), days.alias("d2")
    cover = d1.join(
        F.broadcast(d2),
        (F.col("d2.rn") >= F.col("d1.rn"))
        & (F.col("d2.rn") <= F.col("d1.rn") + 6),
    ).select(F.col("d1.day").alias("src_day"), F.col("d2.day").alias("day"))
    exact = (
        ud.withColumnRenamed("day", "src_day")
        .join(F.broadcast(cover), "src_day")
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("dau7_exact"))
    )
    bound = (
        F.abs(F.col("dau7_estimate") - F.col("dau7_exact"))
        / F.col("dau7_exact")
        <= 0.05
    )
    return (
        est.join(exact, "day")
        .select(
            F.unix_millis("day").alias("day_ms"),
            "dau7_exact",
            bound.alias("within_bound"),
        )
        .orderBy("day_ms")
    )


# ---------------------------------------------------------------------------
# A26: two-sample Kolmogorov-Smirnov statistic — the experiment-analysis
# primitive (are 'click' and 'view' event values drawn from the same
# distribution?). D = max over x of |CDF_click(x) - CDF_view(x)|,
# computed EXACTLY from integer cumulative counts over the grouped
# value domain. The reference has no hypothesis testing (its analytics
# are counts [P src/lens/api.clj]); this is part of the stats extension
# with a25/a15.
#
# Scale shape — the distributed-CDF pattern: a plain Window.orderBy
# cumsum would move the whole value domain to ONE partition. Instead
# the grouped (value, count_a, count_b) relation is RANGE-repartitioned
# on value, cumsummed locally per partition, and per-partition totals
# are broadcast back as offsets (the w5/global_rank machinery, applied
# to weighted sums instead of row counts). Every stage is parallel; the
# only data-sized shuffles are the groupBy(value) and the range
# exchange, both on the (much smaller) distinct-value domain. All
# cumulative counts are integers, so the D statistic is
# rational-deterministic on both engines (round 6 for the libm /
# division ulp only).
# ---------------------------------------------------------------------------
@register(
    "a26_ks_test",
    oracle="""
WITH g AS (
  SELECT value,
         count(*) FILTER (event_type = 'click') AS a,
         count(*) FILTER (event_type = 'view') AS b
  FROM events
  WHERE event_type IN ('click', 'view') AND value IS NOT NULL
  GROUP BY value
), t AS (
  SELECT sum(a) AS na, sum(b) AS nb FROM g
), c AS (
  SELECT sum(a) OVER (ORDER BY value) AS ca,
         sum(b) OVER (ORDER BY value) AS cb
  FROM g
)
SELECT round(max(abs(CAST(c.ca AS DOUBLE) / t.na - CAST(c.cb AS DOUBLE) / t.nb)), 6) AS ks_d,
       CAST(t.na AS BIGINT) AS n_click,
       CAST(t.nb AS BIGINT) AS n_view
FROM c CROSS JOIN t
GROUP BY t.na, t.nb
""",
)
def a26_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # NULL values have no place in a CDF — and Spark's ascending window
    # sorts NULL FIRST where DuckDB's sorts it LAST, so one NULL in
    # events.value would silently shift every cumulative prefix between
    # the engines (round-6 advisor finding). Filter on BOTH sides.
    ev = (
        table(spark, sf_dir, "events")
        .filter(
            F.col("event_type").isin("click", "view")
            & F.col("value").isNotNull()
        )
        .select("value", (F.col("event_type") == "click").alias("__ia"))
    )
    g = ev.groupBy("value").agg(
        F.count(F.when(F.col("__ia"), 1)).alias("a"),
        F.count(F.when(~F.col("__ia"), 1)).alias("b"),
    )
    # Distributed cumulative sum (no single-partition window): range
    # shuffle on value, local cumsum, broadcast per-partition offsets.
    # localCheckpoint pins the ranged relation so the offsets pass
    # reads cached blocks instead of repeating the range exchange
    # (range boundaries are sampled, so Catalyst cannot reuse them).
    keyed = (
        g.repartitionByRange(32, "value")
        .withColumn("__p", F.spark_partition_id())
        .localCheckpoint()
    )
    w = Window.partitionBy("__p").orderBy("value")
    local = keyed.select(
        "__p",
        F.sum("a").over(w).alias("__la"),
        F.sum("b").over(w).alias("__lb"),
    )
    psums = keyed.groupBy("__p").agg(
        F.sum("a").alias("__pa"), F.sum("b").alias("__pb")
    )
    prior = psums.select(
        F.col("__p").alias("__p2"),
        F.col("__pa").alias("__pa2"),
        F.col("__pb").alias("__pb2"),
    )
    # Triangular join over <= 32 per-partition rows — bounded by
    # construction, never data-sized (global_rank precedent).
    offsets = (
        psums.join(F.broadcast(prior), F.col("__p2") < F.col("__p"), "left")
        .groupBy("__p")
        .agg(
            F.coalesce(F.sum("__pa2"), F.lit(0)).alias("__offa"),
            F.coalesce(F.sum("__pb2"), F.lit(0)).alias("__offb"),
        )
    )
    totals = psums.agg(
        F.sum("__pa").alias("__ta"), F.sum("__pb").alias("__tb")
    )
    # nullif-guarded denominators (r13 campaign, seed 20260818): a
    # corpus where only ONE event class occurs (e.g. a single 'click'
    # row) makes __ta or __tb zero, and Spark's ANSI division raises
    # DIVIDE_BY_ZERO where DuckDB's returns NULL — the oracle emits
    # (ks_d=NULL, n_click, n_view) for that shape. x/NULL is NULL on
    # both engines, so nullif reproduces DuckDB exactly; when both
    # classes exist (every fixed-SF corpus) the guard passes the
    # nonzero total through and every value is bit-identical.
    diff = (
        local.join(F.broadcast(offsets), "__p")
        .crossJoin(F.broadcast(totals))
        .select(
            (
                (F.col("__la") + F.col("__offa")).cast("double")
                / F.nullif(F.col("__ta"), F.lit(0))
                - (F.col("__lb") + F.col("__offb")).cast("double")
                / F.nullif(F.col("__tb"), F.lit(0))
            ).alias("__d"),
            "__ta",
            "__tb",
        )
    )
    return diff.groupBy("__ta", "__tb").agg(
        F.round(F.max(F.abs(F.col("__d"))), 6).alias("ks_d")
    ).select(
        "ks_d",
        F.col("__ta").cast("long").alias("n_click"),
        F.col("__tb").cast("long").alias("n_view"),
    )
