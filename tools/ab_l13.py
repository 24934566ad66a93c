"""A/B: l13 TF-IDF current (string-keyed) vs hash-first candidate.

Candidate applies the round-6 gram-hash rule to l13's hot shuffles:
aggregate tf/df over xxhash64(term) (8-byte longs) instead of term
strings, OVERFETCH the per-doc top-3 with rank() (keeps all boundary
ties, so the true top-3 by (tfidf DESC, term) is provably a subset),
then join term text back only for the ~3-rows-per-doc superset and
apply the exact row_number tie-break there. Collision acceptance:
2^-64, same convention as l16/l17 gram hashing.

Usage: python tools/ab_l13.py [sf_dir ...]
Defaults to sf0.1 and the staged 100x dir if present.
"""

from __future__ import annotations

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lens_warehouse_spark import registry
from lens_warehouse_spark.catalog import table, table_rows
from lens_warehouse_spark.llm.textstats import _toks
from lens_warehouse_spark.operators._helpers import pin


def l13_hashfirst(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    n_docs = table_rows(sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_toks()).alias("term")).withColumn(
        "h", F.xxhash64("term")
    )
    if n_docs > 100_000:
        tok = pin("l13ab.tok", tok)
    tf = tok.groupBy("doc_id", "h").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    df_side = F.broadcast(df) if n_docs <= 100_000 else df
    scored = tf.join(df_side, "h").select(
        "doc_id",
        "h",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias(
            "tfidf"
        ),
    )
    w_pre = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc())
    cand = (
        scored.withColumn("rk", F.rank().over(w_pre))
        .filter(F.col("rk") <= 3)
        .drop("rk")
    )
    vocab = tok.select("h", "term").distinct()
    full = cand.join(vocab, "h")
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        full.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf", "rn")
        .orderBy("doc_id", "rn")
    )


def checksum_time(spark, fn, sf_dir: str, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        out = fn(spark, sf_dir)
        h = F.xxhash64(*[F.col(c) for c in out.columns]).cast("decimal(38,0)")
        out.agg(F.count(F.lit(1)), F.sum(h)).collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def equal_outputs(spark, sf_dir: str) -> bool:
    a = registry.QUERIES["l13_tfidf_top_terms"](spark, sf_dir)
    b = l13_hashfirst(spark, sf_dir)
    return (
        a.exceptAll(b).isEmpty()
        and b.exceptAll(a).isEmpty()
        and a.count() == b.count()
    )


def main() -> None:
    registry.load_all()
    from lens_warehouse_spark.session import get_spark

    spark = get_spark("ab_l13")
    dirs = sys.argv[1:]
    if not dirs:
        dirs = ["/root/testdata/sf0.1"]
        staged = sorted(glob.glob("/tmp/lws_volscale_*_x100_v3_*"))
        dirs += staged[:1]
    print("equivalence sf0.01:", equal_outputs(spark, "/root/testdata/sf0.01"))
    for d in dirs:
        cur = checksum_time(
            spark, registry.QUERIES["l13_tfidf_top_terms"], d
        )
        new = checksum_time(spark, l13_hashfirst, d)
        print(f"{d}: current={cur}s hashfirst={new}s ratio={new / cur:.2f}")


if __name__ == "__main__":
    main()
