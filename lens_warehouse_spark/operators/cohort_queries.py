"""Registered cohort queries (U1-U5) over the star schema.

The canonical example cohort mirrors a clinical inclusion/exclusion
criteria query (SURVEY.md §2.4): subjects = customers,
  include: (urgent-or-high-priority order)
       AND (order placed in 1996 OR a returned lineitem)
  exclude: negative account balance.
Registered with both compilation strategies — the reference-shaped
intersect chain and the one-shuffle tagged aggregation — against the
same SQL oracle, proving the rewrite preserves semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lens_warehouse_spark.operators.cohort import (
    CohortQuery,
    LineitemAtom,
    OrderAtom,
    SubjectAttr,
    cohort_count,
    cohort_facets,
    cohort_members,
)
from lens_warehouse_spark.registry import register

EXAMPLE_COHORT = CohortQuery(
    disjunctions=(
        (OrderAtom(priorities=("1-URGENT", "2-HIGH")),),
        (
            OrderAtom(date_from="1996-01-01", date_to="1997-01-01"),
            LineitemAtom(returnflags=("R",)),
        ),
    ),
    exclusions=(SubjectAttr(max_balance=0.0),),
)

_MEMBERS_CTE = """
WITH d1 AS (
  SELECT DISTINCT o_custkey AS subject_id FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
), d2 AS (
  SELECT DISTINCT o_custkey AS subject_id FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  UNION
  SELECT DISTINCT o.o_custkey FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'
), exc AS (
  SELECT DISTINCT c_custkey AS subject_id FROM customer WHERE c_acctbal <= 0.0
), members AS (
  SELECT subject_id FROM d1
  INTERSECT
  SELECT subject_id FROM d2
  EXCEPT
  SELECT subject_id FROM exc
)
"""


@register(
    "u5_cohort_count",
    oracle=_MEMBERS_CTE + "SELECT count(*) AS n_subjects FROM members",
)
def u5_cohort_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cohort_count(EXAMPLE_COHORT, spark, sf_dir, strategy="tagged")


@register(
    "u5_cohort_count_naive",
    oracle=_MEMBERS_CTE + "SELECT count(*) AS n_subjects FROM members",
)
def u5_cohort_count_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cohort_count(EXAMPLE_COHORT, spark, sf_dir, strategy="naive")


@register(
    "u5_cohort_members",
    oracle=_MEMBERS_CTE + "SELECT subject_id FROM members",
)
def u5_cohort_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cohort_members(EXAMPLE_COHORT, spark, sf_dir, strategy="tagged")


@register(
    "u5_cohort_facets",
    oracle=_MEMBERS_CTE
    + """
SELECT c.c_mktsegment AS facet, count(*) AS n_subjects
FROM members m JOIN customer c ON c.c_custkey = m.subject_id
GROUP BY c.c_mktsegment
ORDER BY facet
""",
)
def u5_cohort_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cohort_facets(EXAMPLE_COHORT, spark, sf_dir, facet_col="c_mktsegment")


@register(
    "u5_cohort_count_fused",
    oracle=_MEMBERS_CTE + "SELECT count(*) AS n_subjects FROM members",
)
def u5_cohort_count_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same CNF, fused compilation: one scan per source table."""
    return cohort_count(EXAMPLE_COHORT, spark, sf_dir, strategy="fused")


@register(
    "u5e_cohort_count_auto",
    oracle=_MEMBERS_CTE + "SELECT count(*) AS n_subjects FROM members",
)
def u5e_cohort_count_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-based strategy choice: a static (shuffles, scans) model picks
    naive/tagged/fused from the CNF shape (see cohort.choose_strategy)."""
    return cohort_count(EXAMPLE_COHORT, spark, sf_dir, strategy="auto")


_VISIT_MEMBERS_CTE = """
WITH d1 AS (
  SELECT o_custkey AS subject_id, o_orderkey AS visit_id FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
), d2 AS (
  SELECT o_custkey AS subject_id, o_orderkey AS visit_id FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  UNION
  SELECT o.o_custkey, o.o_orderkey FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'
), exc AS (
  SELECT o.o_custkey AS subject_id, o.o_orderkey AS visit_id
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE c.c_acctbal <= 0.0
), members AS (
  SELECT subject_id, visit_id FROM d1
  INTERSECT
  SELECT subject_id, visit_id FROM d2
  EXCEPT
  SELECT subject_id, visit_id FROM exc
)
"""


@register(
    "u5b_cohort_visit_counts",
    oracle=_VISIT_MEMBERS_CTE
    + """
SELECT count(*) AS n_visits, count(DISTINCT subject_id) AS n_subjects
FROM members
""",
)
def u5b_cohort_visit_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visit-level CNF resolution (ref: atoms -> visit eid sets; the
    endpoint reports visit AND subject counts)."""
    from lens_warehouse_spark.operators.cohort import cohort_visit_counts

    return cohort_visit_counts(EXAMPLE_COHORT, spark, sf_dir)


@register(
    "u5c_cohort_visit_facets",
    oracle=_VISIT_MEMBERS_CTE
    + """
SELECT o.o_orderpriority AS facet,
       count(*) AS n_visits,
       count(DISTINCT m.subject_id) AS n_subjects
FROM members m JOIN orders o ON o.o_orderkey = m.visit_id
GROUP BY o.o_orderpriority
ORDER BY facet
""",
)
def u5c_cohort_visit_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-study-event faceting analog: visit counts per order priority
    (ref: counts faceted per study-event-def)."""
    from pyspark.sql import functions as F

    from lens_warehouse_spark.catalog import table as _table
    from lens_warehouse_spark.operators.cohort import compile_visits_tagged

    members = compile_visits_tagged(EXAMPLE_COHORT, spark, sf_dir)
    od = _table(spark, sf_dir, "orders").select(
        F.col("o_orderkey"), F.col("o_orderpriority").alias("facet")
    )
    return (
        members.join(od, members.visit_id == F.col("o_orderkey"))
        .groupBy("facet")
        .agg(
            F.count(F.lit(1)).alias("n_visits"),
            F.countDistinct("subject_id").alias("n_subjects"),
        )
        .orderBy("facet")
    )


@register(
    "u5d_cohort_visit_counts_fused",
    oracle=_VISIT_MEMBERS_CTE
    + """
SELECT count(*) AS n_visits, count(DISTINCT subject_id) AS n_subjects
FROM members
""",
)
def u5d_cohort_visit_counts_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visit-level CNF, fused: one orders x customer pass for all
    order/subject atoms."""
    from pyspark.sql import functions as F

    from lens_warehouse_spark.operators.cohort import compile_visits_fused

    return compile_visits_fused(EXAMPLE_COHORT, spark, sf_dir).agg(
        F.count(F.lit(1)).alias("n_visits"),
        F.countDistinct("subject_id").alias("n_subjects"),
    )


# ---------------------------------------------------------------------------
# U6: temporal-sequencing cohort — criteria with an ORDERING constraint
# between them, the clinical "diagnosis BEFORE treatment" shape the
# reference's pure set algebra cannot express (sets forget time;
# public repo src/lens/api.clj atoms resolve to id sets — /root/
# reference empty, SURVEY.md §0). Formulation: per subject, the
# earliest occurrence of criterion A (first urgent order) must precede
# the earliest occurrence of criterion B (first order with a returned
# lineitem). One groupBy(subject) pass computes both firsts as
# conditional MIN aggregates — no window, no self-join; the shuffle
# carries two timestamps per subject. At 100 TB this is the same
# one-pass shape as the tagged CNF gate, extended with per-criterion
# time aggregates.
# ---------------------------------------------------------------------------
@register(
    "u6_temporal_cohort",
    oracle="""
WITH firsts AS (
  SELECT o.o_custkey AS subject_id,
         min(CASE WHEN o.o_orderpriority = '1-URGENT'
                  THEN o.o_orderdate END) AS first_a,
         min(CASE WHEN l.l_returnflag = 'R'
                  THEN o.o_orderdate END) AS first_b
  FROM orders o
  LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_custkey
)
SELECT subject_id, epoch_ms(first_a) AS first_urgent_ms,
       epoch_ms(first_b) AS first_return_ms
FROM firsts
WHERE first_a IS NOT NULL AND first_b IS NOT NULL AND first_a < first_b
ORDER BY subject_id
""",
)
def u6_temporal_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from lens_warehouse_spark.catalog import table
    from lens_warehouse_spark.operators._helpers import epoch_ms

    od = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    firsts = (
        od.join(li, od.o_orderkey == li.l_orderkey, "left")
        .groupBy(F.col("o_custkey").alias("subject_id"))
        .agg(
            F.min(
                F.when(
                    F.col("o_orderpriority") == "1-URGENT", F.col("o_orderdate")
                )
            ).alias("first_a"),
            F.min(
                F.when(F.col("l_returnflag") == "R", F.col("o_orderdate"))
            ).alias("first_b"),
        )
    )
    return (
        firsts.filter(
            F.col("first_a").isNotNull()
            & F.col("first_b").isNotNull()
            & (F.col("first_a") < F.col("first_b"))
        )
        .select(
            "subject_id",
            epoch_ms("first_a").alias("first_urgent_ms"),
            epoch_ms("first_b").alias("first_return_ms"),
        )
        .orderBy("subject_id")
    )


# ---------------------------------------------------------------------------
# U7: washout cohort — "A then NOT B within a window": subjects whose
# first urgent order is followed by NO high-priority order in the next
# 90 days (the clinical new-user / washout design; negative temporal
# constraints are inexpressible in the reference's set algebra, which
# forgets time — public repo src/lens/api.clj; /root/reference empty,
# SURVEY.md §0). Two passes: one conditional-MIN groupBy anchors each
# subject's first A; one join-back of the fact table against the
# anchors counts in-window B events, kept only when zero. Both
# shuffles are keyed on the subject — no window, no self-join of the
# fact table against itself, anchor side is one row per subject.
# ---------------------------------------------------------------------------
@register(
    "u7_washout_cohort",
    oracle="""
WITH anchors AS (
  SELECT o_custkey AS subject_id,
         min(CASE WHEN o_orderpriority = '1-URGENT' THEN o_orderdate END)
           AS first_a
  FROM orders
  GROUP BY o_custkey
), violations AS (
  SELECT a.subject_id, count(*) AS n_b
  FROM anchors a
  JOIN orders o ON o.o_custkey = a.subject_id
  WHERE a.first_a IS NOT NULL
    AND o.o_orderpriority = '2-HIGH'
    AND o.o_orderdate > a.first_a
    AND o.o_orderdate <= a.first_a + INTERVAL 90 DAY
  GROUP BY a.subject_id
)
SELECT a.subject_id, epoch_ms(a.first_a) AS first_urgent_ms
FROM anchors a
LEFT JOIN violations v USING (subject_id)
WHERE a.first_a IS NOT NULL AND v.subject_id IS NULL
ORDER BY a.subject_id
""",
)
def u7_washout_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from lens_warehouse_spark.catalog import table
    from lens_warehouse_spark.operators._helpers import epoch_ms

    od = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderpriority"
    )
    anchors = (
        od.groupBy(F.col("o_custkey").alias("subject_id"))
        .agg(
            F.min(
                F.when(
                    F.col("o_orderpriority") == "1-URGENT", F.col("o_orderdate")
                )
            ).alias("first_a")
        )
        .filter(F.col("first_a").isNotNull())
    )
    violations = (
        anchors.join(od, od.o_custkey == anchors.subject_id)
        .filter(
            (F.col("o_orderpriority") == "2-HIGH")
            & (F.col("o_orderdate") > F.col("first_a"))
            & (F.col("o_orderdate") <= F.date_add(F.col("first_a"), 90))
        )
        .select("subject_id")
        .distinct()
    )
    return (
        anchors.join(violations, "subject_id", "left_anti")
        .select("subject_id", epoch_ms("first_a").alias("first_urgent_ms"))
        .orderBy("subject_id")
    )


# ---------------------------------------------------------------------------
# U8: incidence / prevalence over time — the epidemiology view of a
# cohort (the reference's clinical domain): per month, the number of
# subjects ENTERING the cohort (first urgent order in that month), the
# cumulative cohort size, and the at-risk denominator (subjects not yet
# entered). One conditional-MIN groupBy anchors each subject's entry;
# the month-level series is a tiny frame (|months| rows), so its
# cumulative window is trivially bounded. Integer counts throughout —
# no float crosses the wire.
# ---------------------------------------------------------------------------
@register(
    "u8_incidence_curve",
    oracle="""
WITH entry AS (
  SELECT o_custkey AS subject_id,
         min(CASE WHEN o_orderpriority = '1-URGENT' THEN o_orderdate END)
           AS entry_date
  FROM orders GROUP BY o_custkey
), monthly AS (
  SELECT strftime(CAST(date_trunc('month', entry_date) AS DATE), '%Y-%m') AS month,
         count(*) AS n_new
  FROM entry WHERE entry_date IS NOT NULL
  GROUP BY 1
), total AS (SELECT count(*) AS n_subjects FROM customer)
SELECT m.month,
       CAST(m.n_new AS BIGINT) AS n_new,
       CAST(sum(m.n_new) OVER (ORDER BY m.month
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cohort,
       CAST(t.n_subjects
            - sum(m.n_new) OVER (ORDER BY m.month ROWS UNBOUNDED PRECEDING)
            + m.n_new AS BIGINT) AS at_risk_start
FROM monthly m CROSS JOIN total t
ORDER BY m.month
""",
)
def u8_incidence_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from lens_warehouse_spark.catalog import table

    od = table(spark, sf_dir, "orders")
    entry = (
        od.groupBy(F.col("o_custkey").alias("subject_id"))
        .agg(
            F.min(
                F.when(
                    F.col("o_orderpriority") == "1-URGENT", F.col("o_orderdate")
                )
            ).alias("entry_date")
        )
        .filter(F.col("entry_date").isNotNull())
    )
    monthly = entry.groupBy(
        F.date_format(F.date_trunc("month", "entry_date"), "yyyy-MM").alias(
            "month"
        )
    ).agg(F.count(F.lit(1)).alias("n_new"))
    n_subjects = (
        table(spark, sf_dir, "customer")
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n_subjects"))
    )
    # the month series is |months| rows — the cumulative window runs
    # over a bounded frame, not the fact table
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    return (
        monthly.crossJoin(F.broadcast(n_subjects))
        .withColumn("cum_cohort", F.sum("n_new").over(w).cast("long"))
        .select(
            "month",
            F.col("n_new").cast("long").alias("n_new"),
            "cum_cohort",
            (
                F.col("n_subjects") - F.col("cum_cohort") + F.col("n_new")
            )
            .cast("long")
            .alias("at_risk_start"),
        )
        .orderBy("month")
    )
