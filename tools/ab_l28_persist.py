"""A/B (r10 verdict #3): l28's two-pass tier-2b vs a compact-persist
one-tokenize variant, paired at the staged volume dirs.

The floor note's decomposition says the ~2x-vs-DuckDB band IS the
second corpus scan: probe (tokenize + chunk-hash + df-count + collect)
8.6-13.1 s, scrub (RE-tokenize + searchsorted + md5 rebuild) ~8.2 s,
while DuckDB materializes its chunks CTE once and shares it. Verdict
r9 #3 asks for ONE more structural attempt: persist the smallest
reuse unit across the two passes. The literal suggestion —
(doc_id, __th) token hashes — cannot feed the md5 rebuild (it needs
chunk TEXT) without a corpus-wide join back to a re-scan, so the
smallest unit that serves BOTH passes is the chunk level:

    compact = (doc_id, __c array<chunk strings>, __ch array<int64>)

i.e. exactly DuckDB's materialized chunks CTE, ~text-sized (chunks
are substrings; split+join on ' ' is an identity) plus 8 bytes per
chunk. Both passes scan it: the probe explodes __ch (hash-only
shuffle, gram-hash rule intact — strings are built ONCE, JVM-side,
not in the exploded lambda), the scrub filters by membership against
the broadcast boiler set and md5's the kept chunks — no re-tokenize,
no join, still zero corpus shuffle.

Rejected-variant guard: the r7 rejection persisted TOKEN arrays
(~60 small strings/doc -> DISK_ONLY 92.1 s serialization blowup,
MEMORY_AND_DISK GC-thrash). Chunk arrays are ~8 larger strings/doc —
an order of magnitude fewer JVM objects — so this is not a re-try of
the rejected shape.

Protocol: idle gate, checksum runs (full expression tree executes
engine-side), 3 reps per side interleaved A,B,A,B,... so page-cache
and JVM warmth drift hits both sides equally; per-rep arrays printed.
Equivalence is asserted first (checksum equality on the full output).

Usage: python tools/ab_l28_persist.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from lens_warehouse_spark import registry
from lens_warehouse_spark.catalog import table
from lens_warehouse_spark.llm import curation as cu

registry.load_all()


def l28_persist_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The compact-persist candidate (B side). Returns the result
    DataFrame; caller unpersists via the attached ``_ab_persisted``."""
    n = cu._L28_N
    compact = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("__t"))
        .where(F.col("__t").isNotNull())
        .select(
            "doc_id",
            F.expr(
                f"transform(sequence(0, CAST(ceil(size(__t) / {n}.0) AS INT) - 1),"
                f" i -> concat_ws(' ', slice(__t, i * {n} + 1, {n})))"
            ).alias("__c"),
        )
        .select(
            "doc_id",
            "__c",
            F.expr("transform(__c, c -> xxhash64(c))").alias("__ch"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    boiler = (
        compact.select("doc_id", F.explode("__ch").alias("chunk_h"))
        .groupBy("chunk_h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= cu._L28_MIN_DOCS)
        .select("chunk_h")
    )
    rows = boiler.limit(cu._L28_BC_MAX + 1).collect()
    assert len(rows) <= cu._L28_BC_MAX, "A/B targets tier 2b only"
    hashes = sorted(r[0] for r in rows)

    import numpy as np

    bc = cu._l28_cached_broadcast(spark, np.array(hashes, dtype=np.int64))

    @F.pandas_udf("array<int>")
    def kept_idx(hs: pd.Series) -> pd.Series:
        import numpy as _np

        b = bc.value

        def f(arr):
            if arr is None or not len(arr):
                return _np.empty(0, dtype=_np.int32)
            a = _np.asarray(arr, dtype=_np.int64)
            pos = _np.searchsorted(b, a).clip(max=len(b) - 1)
            return _np.nonzero(b[pos] != a)[0].astype(_np.int32)

        return hs.map(f)

    staged = compact.select(
        "doc_id", "__c", F.size("__c").alias("__nc"), kept_idx("__ch").alias("__k")
    )
    out = staged.select(
        "doc_id",
        F.size("__k").cast("long").alias("n_kept"),
        (F.col("__nc") - F.size("__k")).cast("long").alias("n_removed"),
        F.md5(
            F.concat_ws(" ", F.expr("transform(__k, i -> __c[i])"))
        ).alias("clean_md5"),
    ).orderBy("doc_id")
    out._ab_persisted = compact  # noqa: SLF001 — harness unpersist hook
    return out


def checksum(df: DataFrame):
    h = F.xxhash64(*[F.col(c) for c in df.columns]).cast("decimal(38,0)")
    return df.agg(F.count(F.lit(1)), F.sum(h)).collect()[0]


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def main() -> int:
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)))
    )
    from volume_bench import wait_for_idle

    from lens_warehouse_spark.session import get_spark

    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = get_spark("ab_l28_persist")
    report = {}
    for sf_dir in dirs:
        # equivalence first (untimed)
        cur = registry.QUERIES["l28_boilerplate_scrub"](spark, sf_dir)
        var = l28_persist_variant(spark, sf_dir)
        ca, cb = checksum(cur), checksum(var)
        var._ab_persisted.unpersist()
        assert tuple(ca) == tuple(cb), (sf_dir, ca, cb)
        print(f"equivalence OK at {sf_dir}: {tuple(ca)}", flush=True)

        gate = wait_for_idle()
        a_reps, b_reps = [], []
        for _ in range(3):
            a_reps.append(
                timed(
                    lambda: checksum(
                        registry.QUERIES["l28_boilerplate_scrub"](spark, sf_dir)
                    )
                )
            )

            def run_b():
                v = l28_persist_variant(spark, sf_dir)
                checksum(v)
                v._ab_persisted.unpersist()

            b_reps.append(timed(run_b))
        report[sf_dir] = {
            "gate": gate,
            "current_two_pass": a_reps,
            "persist_variant": b_reps,
            "current_best": min(a_reps),
            "persist_best": min(b_reps),
        }
        print(json.dumps({sf_dir: report[sf_dir]}), flush=True)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
