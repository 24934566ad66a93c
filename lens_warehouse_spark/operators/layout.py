"""Z-order (Morton-curve) file layout for multi-dimensional data skipping.

The 100 TB problem this solves: a table laid out by ONE sort key skips
row groups only for predicates on that key — filters on any other column
touch every file. Interleaving the bits of k normalized sort keys puts
rows that are close in ALL k dimensions into the same row groups, so
parquet min/max stats prune files for predicates on ANY participating
column (the Delta Lake / Iceberg `OPTIMIZE ZORDER BY` idea, rebuilt here
on plain parquet with pure DataFrame ops).

Mechanics — everything JVM-side, one stats agg plus one range shuffle:

1. one ``agg(min, max)`` pass collects the per-column bounds (exactly
   the statistics a catalog would serve; 2k scalars, driver-safe),
2. each column is scaled to a ``bits``-bit integer rank,
3. bit interleave via a ``sequence``/``aggregate`` fold (whole-stage
   codegen, no UDF),
4. ``repartitionByRange`` + ``sortWithinPartitions`` on the z-value
   clusters the files; the z column is dropped before the write.

Ref parity: lens-warehouse has no storage-layout management (Datomic
owns the index trees); this is part of the scale extension (SCALE.md §
data layout). Proof of effectiveness: tests/test_zorder.py counts
row-group stat hits under single-dimension predicates against a
linear-sorted layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scaled(col: str, lo: Column, hi: Column, bits: int) -> Column:
    """Min/max-scale a numeric column to an integer in [0, 2^bits)."""
    top = (1 << bits) - 1
    span = hi.cast("double") - lo.cast("double")
    frac = F.when(span > 0, (F.col(col).cast("double") - lo.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    return F.coalesce(
        F.floor(frac * top).cast("long"), F.lit(0)
    )


def zorder_expr(ranks_col: str, k: int, bits: int) -> str:
    """SQL for Morton-interleaving an array<long> of k ``bits``-bit ranks.

    Bit i of rank j lands at position ``i*k + j`` — a nested codegen'd
    ``aggregate`` fold over ``sequence``, no Python in the loop (the
    shift amounts are expressions, which the SQL builtins accept).
    """
    return (
        f"aggregate(sequence(0, {bits - 1}), CAST(0 AS BIGINT),"
        f" (acc, i) -> aggregate(sequence(0, {k - 1}), acc,"
        f" (a, j) -> a | shiftleft(shiftright(element_at({ranks_col}, j + 1), i) & 1,"
        f" i * {k} + j)))"
    )


def zorder_df(df: DataFrame, cols: list[str], bits: int = 16, n_files: int = 8) -> DataFrame:
    """Return ``df`` clustered along the Morton curve of ``cols``.

    Numeric (or castable-to-double) columns only — cast timestamps to
    epoch first. The result has the same schema as ``df``; write it with
    ``.write.parquet`` and every file's min/max stats are tight in all
    ``cols`` dimensions.
    """
    bounds = df.agg(
        *[f(c).alias(f"{c}__{t}") for c in cols for t, f in (("lo", F.min), ("hi", F.max))]
    ).collect()[0]
    ranks = [
        _scaled(c, F.lit(bounds[f"{c}__lo"]), F.lit(bounds[f"{c}__hi"]), bits)
        for c in cols
    ]
    z = df.withColumn("__ranks", F.array(*ranks)).withColumn(
        "__z", F.expr(zorder_expr("__ranks", len(cols), bits))
    )
    return (
        z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__ranks", "__z")
    )
