"""Catalog: scale-factor directory -> named DataFrames / temp views.

Reference parity: lens-warehouse's "catalog" is its Datomic schema — a
fixed set of entity types declared up front (public repo
``src/lens/schema.clj``; SURVEY.md §2.1 S1/S5). Here the fixed set is the
ten driver tables; schemas come from parquet footers (never inferred).

Scale notes: ``spark.read.parquet`` is the vectorized reader; predicate
pushdown + column pruning reach the row-group level for free once plans
are declarative. At 100 TB these tables would be date-partitioned
directories — the API stays identical, only the path layout changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Fixed-cardinality dims: their size does NOT grow with scale factor
# (region=5, nation=25 rows at every SF), so an unconditional
# ``broadcast()`` hint is always safe (SURVEY.md §2.3 J2).
FIXED_DIMS = {"region", "nation"}

# SF-scaling dims (customer/supplier/part grow linearly with SF — at the
# 100 TB design point customer is ~1e10 rows). Broadcasting them must be
# gated on catalog statistics: an explicit hint is NEVER demoted by AQE,
# so an unconditional hint would ship a 100 GB build side to every
# executor. ``maybe_broadcast`` below applies the gate.
SCALING_DIMS = {"supplier", "part", "customer"}
BROADCAST_DIMS = FIXED_DIMS | SCALING_DIMS

# Row-count ceiling for the stats gate. ~5M narrow dim rows serialize to
# O(100 MB) — comfortably inside executor memory; anything bigger joins
# as shuffle/SMJ (or AQE upgrades it to broadcast at runtime if the
# *filtered* build side turns out tiny).
BROADCAST_ROW_LIMIT = 5_000_000

# Both metadata caches are keyed by PATH with the observed mtime_ns
# stored alongside the value (r7 advisor: keying BY (path, mtime)
# retained every superseded entry forever, so a rewrite-heavy session
# grew without bound). A lookup whose stored mtime mismatches the
# current one recomputes and REPLACES the entry — at most one live
# entry per path.
_ROWCOUNT_CACHE: dict[str, tuple[int, int]] = {}

# Resolved StructType per "{sf_dir}/{name}". Path-based parquet reads
# re-run schema resolution on EVERY ``spark.read.parquet`` call — a
# driver-side footer job costing ~75-190 ms per call on local[32]
# depending on load (measured round 6, idle: 92 ms/call inferred vs
# 17 ms/call with an explicit schema; loaded: 230 vs 38). Across a
# 25-query bench power run that job, not per-row work, was a dominant
# fixed cost. The schema of a given
# sf_dir table is immutable for the life of the process (same contract
# as _ROWCOUNT_CACHE), so the first resolution is cached and replayed
# via ``spark.read.schema(...)``. StructType is plain Python — safe to
# reuse across sessions (every session gets _ensure_reader_conf first,
# so resolution conditions are identical).
_SCHEMA_CACHE: dict = {}


def _cache_lookup(cache: dict, sf_dir: str, tname: str):
    """(path, mtime_ns, cached-value-or-None) for footer metadata.

    mtime invalidates both caches when a table at the same path is
    rewritten in-process (round-6 advisor: a stale _SCHEMA_CACHE entry
    made spark.read.schema(stale) silently MISREAD a rewritten table's
    columns — worse than a stale rowcount, which only skews gates).
    ``write.mode('overwrite')`` replaces the file/recreates the part
    directory either way, so st_mtime_ns moves; one os.stat per call is
    noise next to the ~90 ms footer job the caches exist to skip. A
    missing path stats as mtime -1 (the read below raises anyway).
    A stale entry is evicted by the caller overwriting cache[path]."""
    import os as _os

    path = f"{sf_dir}/{tname}.parquet"
    try:
        mtime = _os.stat(path).st_mtime_ns
    except OSError:
        mtime = -1
    hit = cache.get(path)
    if hit is not None and hit[0] == mtime:
        return path, mtime, hit[1]
    return path, mtime, None


def table_rows(sf_dir: str, tname: str) -> int:
    """Row count from parquet footers — metadata only, no Spark job.
    This is exactly the statistic a cluster catalog would serve.

    Handles both the test layout (one ``<t>.parquet`` file) and the
    100 TB layout (a date-partitioned directory of part files):
    ``pyarrow.dataset`` sums fragment footer counts either way.
    """
    path, mtime, rows = _cache_lookup(_ROWCOUNT_CACHE, sf_dir, tname)
    if rows is None:
        import pyarrow.dataset as ds

        rows = ds.dataset(path, format="parquet").count_rows()
        _ROWCOUNT_CACHE[path] = (mtime, rows)
    return rows


def maybe_broadcast(df: DataFrame, sf_dir: str, name: str) -> DataFrame:
    """Stats-gated broadcast hint for dim ``name`` (already loaded /
    filtered / projected as ``df``).

    nation/region keep the hint unconditionally (fixed cardinality).
    SF-scaling dims get it only while the footers report at most
    ``BROADCAST_ROW_LIMIT`` rows — true at every test SF, false at
    the 100 TB design point, where the plain join lets Catalyst pick
    shuffle-hash/SMJ and AQE still upgrade to broadcast when a selective
    filter shrinks the build side below its own threshold at runtime.

    ``name`` is the *base table* the build side derives from (a filtered
    or projected subset still gates on its base table's count — an upper
    bound, so the gate only errs toward the safe non-broadcast side).
    Dims only: passing a fact table is a contract violation, not a
    silent no-op.
    """
    if name in FIXED_DIMS:
        return F.broadcast(df)
    if name not in SCALING_DIMS:
        raise KeyError(
            f"maybe_broadcast is for dims only; got {name!r}, "
            f"expected one of {sorted(FIXED_DIMS | SCALING_DIMS)}"
        )
    if table_rows(sf_dir, name) <= BROADCAST_ROW_LIMIT:
        return F.broadcast(df)
    return df


_READER_CONF = {
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Timestamp-literal parsing, year()/datediff() rendering, and every
    # date-range predicate in the TPC-H queries are session-timezone
    # dependent on LTZ columns. get_spark pins UTC at build time, but a
    # DRIVER-SUPPLIED default session in a non-UTC environment would
    # shift every midnight-aligned filter by the TZ offset and diverge
    # from the DuckDB oracles reading the same naive parquet micros —
    # so the catalog guarantees UTC exactly like the reader confs.
    "spark.sql.session.timeZone": "UTC",
}


def _ensure_reader_conf(spark: SparkSession) -> None:
    """Ensure the parquet-reader conf on this session.

    ``session.get_spark`` already bakes these in at build time, but the
    grading driver hands us a DEFAULT SparkSession, so the catalog must
    still guarantee them. The check reads ``spark.conf`` directly on
    every call — a cheap lookup — rather than caching "configured"
    sessions by object identity: CPython ``id()`` values are recycled
    after GC, so an identity cache could silently skip a brand-new
    session and change the events table's ts decoding.
    """
    for k, v in _READER_CONF.items():
        if spark.conf.get(k, None) != v:
            spark.conf.set(k, v)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table (S1). Lazy; Catalyst prunes columns/predicates.

    Timestamp discipline (two on-disk generations seen from the driver):

    - tz-naive ``timestamp[us]/[ms]`` columns (current data): Spark 4
      infers these as TIMESTAMP_NTZ by default, which is session-tz
      dependent under functions like ``unix_millis`` and rejected by
      ``withWatermark``. We disable NTZ inference so they read as legacy
      TIMESTAMP (LTZ): raw micros interpreted as UTC instants —
      session-tz independent and exactly what DuckDB's ``epoch_ms`` sees
      in the same file.
    - ``events.ts`` nanosecond-precision (earlier data): Spark's reader
      rejects ns (PARQUET_TYPE_ILLEGAL); read as raw INT64 nanos via the
      legacy conf and rebuild a microsecond timestamp with exact integer
      arithmetic (``div 1000`` floors, matching DuckDB's ns->us
      truncation of the same file).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    _ensure_reader_conf(spark)
    path, mtime, schema = _cache_lookup(_SCHEMA_CACHE, sf_dir, name)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[path] = (mtime, df.schema)
    else:
        df = spark.read.schema(schema).parquet(path)
    if name == "events":
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """S5: register all tables as session temp views for spark.sql()."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
