"""Hierarchy / recursive-closure operators.

The reference has no hierarchy traversal (its metadata tree is fixed
two-level study->def joins; public repo src/lens/schema.clj —
/root/reference empty, SURVEY.md §0). This module adds the
recursive-query class a warehouse needs for org charts, category trees
and thread ancestry — expressed Spark-first: the ancestor closure is
FLATTENED to (node, ancestor) pairs bounded by tree depth, then the
rollup is one aggregation. Never a driver-side loop per level over the
full data; for general parent POINTERS (no arithmetic closed form) the
closure comes from l2e's label-propagation machinery in O(log depth)
rounds — here the synthetic tree (parent = user_id // 2) gives it in
closed form inside codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lens_warehouse_spark.catalog import table
from lens_warehouse_spark.registry import register


# ---------------------------------------------------------------------------
# G1: subtree rollup over an implicit binary hierarchy — every event
# contributes to its user node AND every ancestor (ancestors of u are
# u >> k until 0). The DuckDB oracle computes the same closure with a
# genuine WITH RECURSIVE, so this also pins "our flattened closure ==
# a recursive CTE". Scale shape: explode multiplies rows by tree DEPTH
# (log n — 11 levels at 1500 users, 34 at 10^10), then one
# partial-aggregated shuffle keyed by ancestor; the root's partial
# sums combine map-side so the hot root key never concentrates raw
# rows.
# ---------------------------------------------------------------------------
@register(
    "g1_subtree_rollup",
    oracle="""
WITH RECURSIVE anc AS (
  SELECT user_id AS a, value FROM events WHERE user_id >= 1
  UNION ALL
  SELECT a // 2, value FROM anc WHERE a // 2 >= 1
)
SELECT a AS node,
       count(*) AS n_events_subtree,
       round(sum(value), 4) AS sum_value_subtree
FROM anc
GROUP BY a
ORDER BY a
""",
)
def g1_subtree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id", "value").filter(
        F.col("user_id") >= 1
    )
    ancestors = F.expr(
        "filter(transform(sequence(0, 40), k -> shiftright(user_id, k)),"
        " a -> a >= 1)"
    )
    return (
        ev.select(F.explode(ancestors).alias("node"), "value")
        .groupBy("node")
        .agg(
            F.count(F.lit(1)).alias("n_events_subtree"),
            F.round(F.sum("value"), 4).alias("sum_value_subtree"),
        )
        .orderBy("node")
    )
