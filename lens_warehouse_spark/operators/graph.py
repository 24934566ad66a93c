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
    # k ranges over the full BIGINT width: a 40-shift cap silently
    # DROPPED every ancestor above depth 40 for ids >= 2^41 (the
    # recursive oracle has no such cap, so those rows would mismatch).
    # The filter still prunes the closure to the id's true depth.
    ancestors = F.expr(
        "filter(transform(sequence(0, 62), k -> shiftright(user_id, k)),"
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


# ---------------------------------------------------------------------------
# G2: spatial proximity join — the grid-bucket rewrite of "all point
# pairs within radius r". Points derive deterministically from events
# (double arithmetic identical on both engines); each point lands in a
# floor(x/r, y/r) cell, side B explodes to its 3x3 neighbor cells, and
# the equi-join on the cell key yields candidates that one exact
# squared-distance filter (pure IEEE arithmetic, no sqrt) confirms.
# The oracle is the quadratic self-join on the bounded sample —
# proving the bucketing loses no pair (a point within r of another is
# always in one of its 3x3 neighbor cells when the cell edge is r).
#
# Scale shape: shuffle keys are cell ids (fixed-width ints), candidate
# volume is bounded by local density x 9, never n^2; the quadratic
# formulation exists only as the oracle on the sampled subset. This is
# the same bucket-then-verify pattern as LSH dedup (l2) and the binned
# interval join (j11), instantiated for metric space.
# ---------------------------------------------------------------------------
_G2_R = 1.5
_G2_MOD = 37  # sample: event_id % 37 == 0


@register(
    "g2_spatial_join",
    oracle=f"""
WITH pts AS (
  SELECT event_id AS id,
         (value * 13.0) % 100.0 AS x,
         (value * 29.0 + CAST(user_id AS DOUBLE)) % 100.0 AS y
  FROM events WHERE event_id % {_G2_MOD} = 0
)
SELECT a.id AS id_a, b.id AS id_b,
       round((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y), 6) AS dist2
FROM pts a JOIN pts b ON a.id < b.id
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {_G2_R} * {_G2_R}
ORDER BY id_a, id_b
""",
)
def g2_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _G2_R
    pts = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_id") % _G2_MOD == 0)
        .select(
            F.col("event_id").alias("id"),
            ((F.col("value") * 13.0) % 100.0).alias("x"),
            (
                (F.col("value") * 29.0 + F.col("user_id").cast("double"))
                % 100.0
            ).alias("y"),
        )
    )
    a = pts.select(
        F.col("id").alias("id_a"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        F.floor(F.col("x") / r).alias("cx"),
        F.floor(F.col("y") / r).alias("cy"),
    )
    b = pts.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.explode(
            F.expr(
                f"flatten(transform(sequence(-1, 1), dx ->"
                f" transform(sequence(-1, 1), dy ->"
                f" struct(floor(x / {r}) + dx AS cx, floor(y / {r}) + dy AS cy))))"
            )
        ).alias("cell"),
    ).select("id_b", "bx", "by", F.col("cell.cx").alias("cx"), F.col("cell.cy").alias("cy"))
    dist2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    return (
        a.join(b, ["cx", "cy"])
        .filter((F.col("id_a") < F.col("id_b")) & (dist2 <= r * r))
        .select("id_a", "id_b", F.round(dist2, 6).alias("dist2"))
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# G3: geohash encoding — the textbook geo bucketing key (base32 over
# interleaved lon/lat bits, lon bit first), built ENTIRELY from integer
# bit arithmetic so the identical expression string runs on both
# engines: quantize lon/lat to 20 bits each, fold the 40-bit Morton
# interleave, slice 5-bit groups into base32 chars. The same
# bit-interleave idea as operators/layout.zorder_df, surfaced as the
# standard interchange format; prefix truncation gives the hierarchy
# of cells (geohash4 below) that spatial joins and privacy coarsening
# bucket by. Deterministic end-to-end — fully oracle-checked.
# ---------------------------------------------------------------------------
_GH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_sql(lon: str, lat: str, chars: int = 8) -> str:
    """Engine-neutral SQL: geohash of (lon, lat) to ``chars`` chars."""
    lon_q = f"CAST(floor((({lon}) + 180.0) / 360.0 * 1048576.0) AS BIGINT)"
    lat_q = f"CAST(floor((({lat}) + 90.0) / 180.0 * 1048576.0) AS BIGINT)"
    # 40-bit Morton: even positions (MSB first) carry lon bits
    terms = []
    for k in range(20):
        terms.append(f"((({lon_q}) >> {19 - k}) & 1) * {1 << (39 - 2 * k)}")
        terms.append(f"((({lat_q}) >> {19 - k}) & 1) * {1 << (38 - 2 * k)}")
    morton = "(" + " + ".join(terms) + ")"
    parts = [
        f"substr('{_GH_ALPHABET}', "
        f"CAST((({morton}) >> {35 - 5 * j}) & 31 AS INT) + 1, 1)"
        for j in range(chars)
    ]
    return "concat(" + ", ".join(parts) + ")"


@register(
    "g3_geohash_encode",
    oracle=f"""
WITH pts AS (
  SELECT event_id AS id,
         ((value * 13.0) % 100.0) * 3.6 - 180.0 AS lon,
         ((value * 29.0 + CAST(user_id AS DOUBLE)) % 100.0) * 1.8 - 90.0 AS lat
  FROM events WHERE event_id % {_G2_MOD} = 0
)
SELECT id, {_geohash_sql('lon', 'lat', 8)} AS geohash8,
       substr({_geohash_sql('lon', 'lat', 8)}, 1, 4) AS cell4
FROM pts
ORDER BY id
""",
)
def g3_geohash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_id") % _G2_MOD == 0)
        .select(
            F.col("event_id").alias("id"),
            (((F.col("value") * 13.0) % 100.0) * 3.6 - 180.0).alias("lon"),
            (
                ((F.col("value") * 29.0 + F.col("user_id").cast("double")) % 100.0)
                * 1.8
                - 90.0
            ).alias("lat"),
        )
    )
    gh = F.expr(_geohash_sql("lon", "lat", 8))
    return (
        pts.select(
            "id",
            gh.alias("geohash8"),
            F.substring(gh, 1, 4).alias("cell4"),
        )
        .orderBy("id")
    )


# ---------------------------------------------------------------------------
# G4: k-anonymous spatial aggregation — the privacy-coarsening release
# shape for location data: aggregate points per geohash-4 cell
# (~39 km x 19.5 km) and SUPPRESS cells with fewer than K points, so
# no released row isolates fewer than K individuals. Integer counts +
# the g3 encoding — fully oracle-checked. Scale shape: one map-side-
# combined groupBy on the cell key; suppression is a HAVING on the
# aggregate, so suppressed cells never leave the executors.
# ---------------------------------------------------------------------------
_G4_K = 5


@register(
    "g4_kanon_cells",
    oracle=f"""
WITH pts AS (
  SELECT event_id AS id,
         ((value * 13.0) % 100.0) * 3.6 - 180.0 AS lon,
         ((value * 29.0 + CAST(user_id AS DOUBLE)) % 100.0) * 1.8 - 90.0 AS lat
  FROM events WHERE event_id % 3 = 0
)
SELECT substr({_geohash_sql('lon', 'lat', 8)}, 1, 4) AS cell4,
       count(*) AS n_points
FROM pts
GROUP BY 1
HAVING count(*) >= {_G4_K}
ORDER BY cell4
""",
)
def g4_kanon_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 3 == 0)
        .select(
            (((F.col("value") * 13.0) % 100.0) * 3.6 - 180.0).alias("lon"),
            (
                ((F.col("value") * 29.0 + F.col("user_id").cast("double")) % 100.0)
                * 1.8
                - 90.0
            ).alias("lat"),
        )
    )
    cell4 = F.substring(F.expr(_geohash_sql("lon", "lat", 8)), 1, 4)
    return (
        pts.groupBy(cell4.alias("cell4"))
        .agg(F.count(F.lit(1)).alias("n_points"))
        .filter(F.col("n_points") >= _G4_K)
        .orderBy("cell4")
    )
