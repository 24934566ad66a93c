"""Volume-scaling bench: the same queries at sf0.1 and at a ~10x
synthetic scale-up, Spark vs the DuckDB oracle, per-query.

Why this exists: at sf0.1 every Spark query is dominated by the fixed
~0.15-0.3 s per-job cost (plan build + scheduling) — the price of an
engine built for 1000 executors. A single SF therefore cannot show
whether the per-ROW cost is competitive. This harness synthesizes a
deterministic MULT-x scale-up of the volume-bearing tables (documents,
events), runs the volume-bearing headline subset on both engines at
both SFs, and reports per-query ratios — demonstrating the
Spark/DuckDB ratio falling toward (and past) parity as volume grows.

Scale-up construction (deterministic, idempotent):
- documents: MULT replicas, doc_id' = doc_id + i*(max_doc_id+1)
- events:    MULT replicas, event_id and user_id offset per replica so
  each replica's users/sessions are disjoint — per-user sessionization
  (t3) replicates exactly, never merges across replicas
- all other tables copied unchanged (they are not the volume story)

Usage: python tools/volume_bench.py [mult]    (default 10)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from lens_warehouse_spark import registry
from lens_warehouse_spark.catalog import TABLES

# Volume-bearing headline subset: per-row work (tokenization, n-grams,
# regex, sessionization) dominates these, not job overhead.
VOLUME_SUBSET = [
    "l9_language_id",
    "l12_chunking",
    "l13_tfidf_top_terms",
    "l17_repetition_filter",
    "l20_curation_pipeline",
    "l28_boilerplate_scrub",
    "t3_session_window",
]

SCALED_TABLES = {"documents": "doc_id", "events": None}  # events: special


def ensure_scaled_dir(base_sf_dir: str, mult: int) -> str:
    """Create (once) the MULT-x scaled twin of ``base_sf_dir`` in /tmp,
    fingerprinted by source size+mtime so a testdata refresh invalidates
    the staging, like every other staging path in this repo."""
    st = os.stat(os.path.join(base_sf_dir, "documents.parquet"))
    tag = (
        f"{base_sf_dir.strip('/').replace('/', '_')}"
        f"_x{mult}_{st.st_size}_{int(st.st_mtime)}"
    )
    out = os.path.join(tempfile.gettempdir(), f"lws_volscale_{tag}")
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    docs = os.path.join(base_sf_dir, "documents.parquet")
    con.execute(
        f"""
COPY (
  SELECT d.* REPLACE (
    d.doc_id + r.i * (SELECT max(doc_id) + 1 FROM read_parquet('{docs}'))
      AS doc_id)
  FROM read_parquet('{docs}') d CROSS JOIN range({mult}) r(i)
) TO '{out}/documents.parquet' (FORMAT parquet)
"""
    )
    ev = os.path.join(base_sf_dir, "events.parquet")
    con.execute(
        f"""
COPY (
  SELECT e.* REPLACE (
    e.event_id + r.i * (SELECT max(event_id) + 1 FROM read_parquet('{ev}'))
      AS event_id,
    e.user_id + r.i * (SELECT max(user_id) + 1 FROM read_parquet('{ev}'))
      AS user_id)
  FROM read_parquet('{ev}') e CROSS JOIN range({mult}) r(i)
) TO '{out}/events.parquet' (FORMAT parquet)
"""
    )
    con.close()
    for t in TABLES:
        if t not in SCALED_TABLES:
            shutil.copy(
                os.path.join(base_sf_dir, f"{t}.parquet"),
                os.path.join(out, f"{t}.parquet"),
            )
    with open(marker, "w") as fh:
        fh.write(f"mult={mult}\n")
    return out


def _best_of(fn, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def run_spark_subset(spark, sf_dir: str, names=VOLUME_SUBSET) -> dict[str, float]:
    out = {}
    for name in names:
        fn = registry.QUERIES[name]
        spark.catalog.clearCache()
        out[name] = round(_best_of(lambda: fn(spark, sf_dir).count()), 3)
    return out


def run_duckdb_subset(sf_dir: str, names=VOLUME_SUBSET) -> dict[str, float]:
    out = {}
    for name in names:
        sql = registry.ORACLES[name]
        con = duckdb.connect()  # fresh per query: no cross-query caching
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        out[name] = round(_best_of(lambda: con.execute(sql).fetchall()), 3)
        con.close()
    return out


def _point(spark, sf_dir: str) -> dict:
    sp = run_spark_subset(spark, sf_dir)
    du = run_duckdb_subset(sf_dir)
    ratio = {
        n: round(sp[n] / du[n], 2) if du[n] > 0 else None for n in sp
    }
    return {
        "spark": sp,
        "duckdb": du,
        "ratio_spark_over_duckdb": ratio,
        "spark_total_sec": round(sum(sp.values()), 3),
        "duckdb_total_sec": round(sum(du.values()), 3),
    }


def volume_scaling_report(spark, base_sf_dir: str, mult: int = 10) -> dict:
    """The second-SF bench point: base vs mult-x, both engines."""
    scaled_dir = ensure_scaled_dir(base_sf_dir, mult)
    base = _point(spark, base_sf_dir)
    scaled = _point(spark, scaled_dir)
    return {
        "mult": mult,
        "subset": VOLUME_SUBSET,
        "sf_base": base,
        "sf_scaled": scaled,
        "total_ratio_base": round(
            base["spark_total_sec"] / base["duckdb_total_sec"], 2
        ),
        "total_ratio_scaled": round(
            scaled["spark_total_sec"] / scaled["duckdb_total_sec"], 2
        ),
    }


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base_sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all()
    from lens_warehouse_spark.session import get_spark

    spark = get_spark("volume_bench")
    # warm plans at the smallest SF (JIT + codegen outside timed region)
    for name in VOLUME_SUBSET:
        try:
            registry.QUERIES[name](spark, "/root/testdata/sf0.001").count()
        except Exception:  # noqa: BLE001 - warmup is best-effort
            pass
    print(json.dumps(volume_scaling_report(spark, base_sf_dir, mult)))


if __name__ == "__main__":
    main()
