"""Z-order (Morton-curve) file layout for multi-dimensional data skipping.

The 100 TB problem this solves: a table laid out by ONE sort key skips
row groups only for predicates on that key — filters on any other column
touch every file. Interleaving the bits of k normalized sort keys puts
rows that are close in ALL k dimensions into the same row groups, so
parquet min/max stats prune files for predicates on ANY participating
column (the Delta Lake / Iceberg `OPTIMIZE ZORDER BY` idea, rebuilt here
on plain parquet with pure DataFrame ops).

Mechanics — everything JVM-side, one sketch pass plus one range shuffle:

1. one ``approxQuantile`` pass per column collects 2^bits - 1 equi-depth
   boundaries (a mergeable one-pass sketch, executor-parallel). Ranks
   are EQUI-DEPTH, not min/max-scaled: real columns are long-tailed
   (events.value: median 34.6, max 490), and under min/max scaling the
   bulk of a skewed column lands in a few low bit patterns, so its high
   bits stop discriminating and the curve degenerates to the other
   dimension. Quantile ranks give every bit pattern equal mass by
   construction, skew or not.
2. each value maps to its boundary rank with a codegen'd ``aggregate``
   fold over the (broadcast-literal) boundary array,
3. bit interleave via a ``sequence``/``aggregate`` fold (whole-stage
   codegen, no UDF),
4. ``repartitionByRange`` + ``sortWithinPartitions`` on the z-value
   clusters the files; the helper columns are dropped before the write.

Ref parity: lens-warehouse has no storage-layout management (Datomic
owns the index trees); this is part of the scale extension (SCALE.md §
data layout). Proof of effectiveness: tests/test_zorder.py counts
row-group stat hits under single-dimension predicates against a
linear-sorted layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _equidepth_rank(col: str, boundaries: list[float]) -> Column:
    """Rank of ``col`` among equi-depth boundaries: count of boundaries
    <= value, via a codegen'd fold (no UDF, no per-row Python).

    try_cast, NOT cast: the quantile pass below tolerates malformed
    strings to NULL, so a PARTIALLY-malformed column passes the
    empty-boundaries contract check — an ANSI cast here would then
    abort the clustering write mid-stage on the first bad row. A
    malformed/NULL value ranks 0 (the when() is null-false), i.e. it
    clusters with the lowest band instead of killing the job."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    return F.aggregate(
        arr,
        F.lit(0).cast("long"),
        lambda acc, b: acc
        + F.when(F.col(col).try_cast("double") >= b, 1).otherwise(0).cast("long"),
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


def zorder_df(df: DataFrame, cols: list[str], bits: int = 8, n_files: int = 8) -> DataFrame:
    """Return ``df`` clustered along the Morton curve of ``cols``.

    Numeric (or castable-to-double) columns only — cast timestamps to
    epoch first. The result has the same schema as ``df``; write it with
    ``.write.parquet`` and every file's min/max stats are tight in all
    ``cols`` dimensions. ``bits`` is per-dimension rank resolution
    (2^bits - 1 quantile boundaries per column — 8 bits = 255 literals
    in the plan, plenty for file-level skipping; row-group boundaries
    only need rank granularity finer than n_files * row_groups/file).
    """
    if len(cols) * bits > 63:
        # Bit 63 is the BIGINT sign bit: an interleaved rank bit landing
        # there flips z negative (and Java shifts wrap mod 64 beyond),
        # so high-rank rows would range-partition BEFORE low-rank ones
        # and the clustering silently inverts.
        raise ValueError(
            f"zorder_df: {len(cols)} cols x {bits} bits = "
            f"{len(cols) * bits} interleaved bits exceeds the 63 usable "
            "bits of the BIGINT z-value; lower bits or cols"
        )
    for helper in ("__ranks", "__z"):
        if helper in df.columns:
            raise ValueError(
                f"zorder_df reserves the {helper!r} column name; rename "
                "the input column (it would be silently dropped)"
            )
    nq = 1 << bits
    probs = [i / nq for i in range(1, nq)]
    # try_cast: under ANSI a malformed string ABORTS the quantile job
    # mid-stage; tolerating it to NULL lets the empty-boundaries check
    # below produce the clear contract error instead
    casted = df.select(*[F.col(c).try_cast("double").alias(c) for c in cols])
    quantiles = casted.stat.approxQuantile(cols, probs, 0.001)
    for c, qs in zip(cols, quantiles):
        if not qs:
            # approxQuantile returns [] for an all-null (e.g. a string
            # column nulled by the double cast) dimension — every rank
            # would be 0 and the dimension silently drops out of the
            # curve while the caller believes it is clustered.
            raise ValueError(
                f"zorder_df: column {c!r} has no numeric values "
                "(non-castable or all-null); cast it explicitly first"
            )
    ranks = [_equidepth_rank(c, qs) for c, qs in zip(cols, quantiles)]
    z = df.withColumn("__ranks", F.array(*ranks)).withColumn(
        "__z", F.expr(zorder_expr("__ranks", len(cols), bits))
    )
    return (
        z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__ranks", "__z")
    )


def compact_plan(src_dir: str, target_bytes: int = 128 * 1024 * 1024) -> int:
    """Target file count for compacting ``src_dir`` — metadata only
    (sums fragment sizes from the filesystem, the statistic a table
    service keeps). Never less than 1."""
    import os

    total = 0
    for root, _dirs, files in os.walk(src_dir):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    return max(1, -(-total // target_bytes))  # ceil div


def compact_df(df: DataFrame, n_files: int, sort_cols: list[str]) -> DataFrame:
    """Rewrite ``df`` as ``n_files`` range-clustered, internally-sorted
    files — the OPTIMIZE/compaction primitive. Range partitioning keeps
    file min/max stats tight on ``sort_cols`` so data skipping still
    works after compaction (a round-robin coalesce would destroy it)."""
    return df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
        *sort_cols
    )
