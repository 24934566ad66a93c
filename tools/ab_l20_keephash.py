"""A/B: l20's exact-dedup key — md5 string (32 chars + offsets through
the first exchange) vs xxhash64 (8-byte long), guide §2.3 "narrower
types / shuffle fewer bytes".

The dedup key is INTERNAL to the plan (only min(doc_id) per group
survives), so any exact function of the normalized text yields the same
groups; xxhash64 merges two distinct texts with P ~ groups^2/2^64 — the
same acceptance every hashed-gram op in this file already carries
(l17/l20 gram hashes), and the sf0.01 oracle comparison stays exact.

Also prints a branch decomposition of the pipeline (keep / repetitive /
contaminated in isolation) so the adopt-or-pin decision knows which
branch the full-query delta lives in.

Usage: python tools/ab_l20_keephash.py [mult] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lens_warehouse_spark.catalog import table, table_rows
from lens_warehouse_spark.llm.curation import (
    GRAM_N,
    _BENCH_MOD,
    word_ngram_hashes,
)
from lens_warehouse_spark.operators._helpers import md5_bucket
from lens_warehouse_spark.session import get_spark


def build(spark, sf_dir, keep_key):
    docs = table(spark, sf_dir, "documents")
    norm = F.lower(F.trim("text"))
    h = F.md5(norm) if keep_key == "md5" else F.xxhash64(norm)
    keep = (
        docs.groupBy(h.alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    repetitive = (
        word_ngram_hashes(docs, 3)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.countDistinct("gram_h").alias("n_distinct"),
        )
        .filter(F.lit(5) * (F.col("n_grams") - F.col("n_distinct")) > F.col("n_grams"))
        .select("doc_id")
    )
    grams5 = word_ngram_hashes(docs, GRAM_N)
    bench = (
        grams5.filter(F.col("doc_id") % _BENCH_MOD == 0).select("gram_h").distinct()
    )
    bench_side = (
        F.broadcast(bench) if table_rows(sf_dir, "documents") <= 100_000 else bench
    )
    contaminated = (
        grams5.filter(F.col("doc_id") % _BENCH_MOD != 0)
        .join(bench_side, "gram_h")
        .select("doc_id")
        .distinct()
    )
    bucket = md5_bucket(F.col("doc_id"))
    return (
        docs.join(keep, "doc_id", "left_semi")
        .join(repetitive, "doc_id", "left_anti")
        .join(contaminated, "doc_id", "left_anti")
        .filter(F.col("doc_id") % _BENCH_MOD != 0)
        .filter(F.col("n_chars").between(64, 100000))
        .filter(bucket < int(0.5 * 65536))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("lang", "source")
    )


def branches(spark, sf_dir):
    """Isolated branch timings (noop sink), one pass each."""
    docs = table(spark, sf_dir, "documents")
    norm = F.lower(F.trim("text"))
    out = {}
    defs = {
        "keep_md5": docs.groupBy(F.md5(norm).alias("h")).agg(
            F.min("doc_id").alias("doc_id")
        ),
        "keep_xxh": docs.groupBy(F.xxhash64(norm).alias("h")).agg(
            F.min("doc_id").alias("doc_id")
        ),
        "repetitive": word_ngram_hashes(docs, 3)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.countDistinct("gram_h").alias("n_distinct"),
        ),
        "grams5_join": word_ngram_hashes(docs, GRAM_N)
        .filter(F.col("doc_id") % _BENCH_MOD != 0)
        .join(
            F.broadcast(
                word_ngram_hashes(docs, GRAM_N)
                .filter(F.col("doc_id") % _BENCH_MOD == 0)
                .select("gram_h")
                .distinct()
            ),
            "gram_h",
        )
        .select("doc_id")
        .distinct(),
    }
    for name, df in defs.items():
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    return out


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_l20")
    if mult > 1:
        from tools.volume_bench import ensure_scaled_dir

        sf_dir = ensure_scaled_dir(base, mult, spark=spark)
    else:
        sf_dir = base

    ra = build(spark, sf_dir, "md5").collect()
    rb = build(spark, sf_dir, "xxh").collect()
    assert [r.asDict() for r in ra] == [r.asDict() for r in rb], "rows diverge"

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    for _ in range(2):
        run(build(spark, sf_dir, "md5"))
        run(build(spark, sf_dir, "xxh"))
    out = {"A_md5": [], "B_xxhash64": []}
    for _ in range(reps):
        for key, kk in (("A_md5", "md5"), ("B_xxhash64", "xxh")):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            run(build(spark, sf_dir, kk))
            out[key].append(round(time.perf_counter() - t0, 3))
    print(
        json.dumps(
            {
                "mult": mult,
                "reps": out,
                "best": {k: min(v) for k, v in out.items()},
                "branches": branches(spark, sf_dir),
                "rows_equal": True,
                "loadavg": os.getloadavg(),
            }
        )
    )


if __name__ == "__main__":
    main()
