"""A/B: l28's probe-side chunk-STRING build — interpreted lambda vs
two alternatives the floor note hasn't measured yet.

The l28 floor decomposition (curation.py) attributes ~1.55 s at 100x
to the one irreducible chunk-string pass: an interpreted
``transform(sequence, i -> concat_ws(' ', slice(__t, ...)))``.
Since split+join on the same delimiter is an identity, a chunk is
just the original text cut at every Nth space — so two candidate
builds avoid the per-chunk array-slice-and-copy:

A. regex: one codegen ``regexp_extract_all`` pass with a \\G-anchored
   pattern capturing up-to-N space-separated fields per match (the
   trailing zero-width match is trimmed by slicing to the known
   chunk count ceil(size(__t)/N)).
B. arrow: a pandas_udf chunker (C-speed str split/join, Arrow
   transfer of text in / chunk array out).

Both keep the boiler branch and the token-hash chunk_h join keys
byte-identical; only the ch_s expression changes, so output parity
is exact by construction if the chunk strings match — which the
equivalence stage verifies on real data AND adversarial spacing
(empty text, double/trailing spaces, exact chunk boundaries).

Usage: python tools/ab_l28.py [sf_dir ...]
"""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lens_warehouse_spark import registry
from lens_warehouse_spark.catalog import table, table_rows
from lens_warehouse_spark.llm.curation import _L28_MIN_DOCS, _L28_N
from tools.ab_l13 import checksum_time

N = _L28_N


def _chunks_arrow_udf():
    # created lazily: pandas_udf registration needs an active session
    @F.pandas_udf("array<string>")
    def _chunks_arrow(s: pd.Series) -> pd.Series:
        def f(text: str) -> list[str]:
            t = text.split(" ")
            return [
                " ".join(t[i * N : (i + 1) * N]) for i in range(-(-len(t) // N))
            ]

        return s.map(f)

    return _chunks_arrow


def _ch_s_expr(mode: str):
    if mode == "lambda":
        return F.expr(
            f"transform(sequence(0, CAST(ceil(size(__t) / {N}.0) AS INT) - 1),"
            f" i -> concat_ws(' ', slice(__t, i * {N} + 1, {N})))"
        )
    if mode == "regex":
        # \G anchors each match to the previous end; ' ?' eats the
        # inter-chunk delimiter. Zero-width trailing match trimmed by
        # the slice to ceil(size/N).
        pat = r"\G ?([^ ]*(?: [^ ]*){0,%d})" % (N - 1)
        return F.slice(
            F.regexp_extract_all("text", F.lit(pat), F.lit(1)),
            F.lit(1),
            F.ceil(F.size("__t") / F.lit(float(N))).cast("int"),
        )
    if mode == "arrow":
        return _chunks_arrow_udf()("text")
    raise ValueError(mode)


def build_l28(docs: DataFrame, n_docs: int, mode: str) -> DataFrame:
    """l28 body with the chunk-string build swapped per ``mode``
    (mode='lambda' replicates the registered plan exactly)."""
    n = N
    hargs = ", ".join(
        f"try_element_at(__th, i * {n} + {j + 1})" for j in range(n)
    )
    ch_h = (
        f"transform(sequence(0, CAST(ceil(size(__t) / {n}.0) AS INT) - 1),"
        f" i -> xxhash64({hargs}))"
    )
    base = docs.select("doc_id", "text", F.split("text", " ").alias("__t")).select(
        "doc_id",
        "text",
        "__t",
        F.expr("transform(__t, t -> xxhash64(t))").alias("__th"),
    )
    chunk_hashes = base.select("doc_id", F.explode(F.expr(ch_h)).alias("chunk_h"))
    boiler = (
        chunk_hashes.groupBy("chunk_h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= _L28_MIN_DOCS)
        .select("chunk_h", F.lit(1).alias("__b"))
    )
    boiler_side = F.broadcast(boiler) if n_docs <= 100_000 else boiler
    chunks = base.select(
        "doc_id",
        F.posexplode(
            F.arrays_zip(
                _ch_s_expr(mode).alias("chunk"), F.expr(ch_h).alias("chunk_h")
            )
        ).alias("chunk_idx", "__z"),
    ).select(
        "doc_id",
        "chunk_idx",
        F.col("__z.chunk").alias("chunk"),
        F.col("__z.chunk_h").alias("chunk_h"),
    )
    marked = chunks.join(boiler_side, "chunk_h", "left")
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.when(F.col("__b").isNull(), 1)).alias("n_kept"),
            F.count(F.when(F.col("__b").isNotNull(), 1)).alias("n_removed"),
            F.array_sort(
                F.collect_list(
                    F.when(F.col("__b").isNull(), F.struct("chunk_idx", "chunk"))
                )
            ).alias("collect_kept"),
        )
        .select(
            "doc_id",
            "n_kept",
            "n_removed",
            F.md5(
                F.coalesce(
                    F.concat_ws(
                        " ",
                        F.expr("transform(array_sort(collect_kept), x -> x.chunk)"),
                    ),
                    F.lit(""),
                )
            ).alias("clean_md5"),
        )
        .orderBy("doc_id")
    )


ADVERSARIAL = [
    (0, ""),
    (1, " "),
    (2, "a  b"),
    (3, "a b "),
    (4, " leading space"),
    (5, " ".join(f"t{i}" for i in range(N))),  # exactly one chunk
    (6, " ".join(f"t{i}" for i in range(N + 1))),  # boundary +1
    (7, " ".join(f"t{i}" for i in range(3 * N))),  # exact multiple
    (8, "x  " * 5),  # repeated double spaces + trailing
]


def equivalent(spark, docs: DataFrame, n_docs: int, mode: str) -> bool:
    a = build_l28(docs, n_docs, "lambda")
    b = build_l28(docs, n_docs, mode)
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def main() -> None:
    registry.load_all()
    from lens_warehouse_spark.session import get_spark

    spark = get_spark("ab_l28")
    adv = spark.createDataFrame(ADVERSARIAL, "doc_id long, text string")
    real = table(spark, "/root/testdata/sf0.01", "documents")
    for mode in ("regex", "arrow"):
        ok_adv = equivalent(spark, adv, 9, mode)
        ok_real = equivalent(
            spark, real, table_rows("/root/testdata/sf0.01", "documents"), mode
        )
        print(f"{mode}: adversarial={'OK' if ok_adv else 'MISMATCH'} "
              f"real={'OK' if ok_real else 'MISMATCH'}")
    dirs = sys.argv[1:]
    if not dirs:
        dirs = ["/root/testdata/sf0.1"]
        staged = sorted(glob.glob("/tmp/lws_volscale_*_x100_v3_*"))
        dirs += staged[:1]
    for d in dirs:
        n_docs = table_rows(d, "documents")
        docs = table(spark, d, "documents")
        times = {
            mode: checksum_time(
                spark, lambda s, _sd, m=mode: build_l28(docs, n_docs, m), d
            )
            for mode in ("lambda", "regex", "arrow")
        }
        print(d, times)


if __name__ == "__main__":
    main()
