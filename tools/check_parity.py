"""Local replica of the driver's t2 oracle check.

Runs every registered query at a given sf_dir through Spark AND its
DuckDB oracle, then compares row count, column names/dtypes, and exact
values after sorting columns by name and rows by value. Stricter than
the driver can possibly be: any float divergence at all is a failure,
which forces the parity rules in registry.py to actually hold.

Usage:
    python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from lens_warehouse_spark import registry
from lens_warehouse_spark.catalog import TABLES
from lens_warehouse_spark.session import get_spark


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # Spark-written staging dirs (volume_bench's scaled twins) are
        # DIRECTORIES of part files — glob them so parity can verify
        # the exact bytes the volume harness measures.
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{src}')"
        )
    return con


def _canon(value: object) -> object:
    """Canonical python value for comparison/sorting."""
    if value is None:
        return None
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return value
    if isinstance(value, (list, tuple)) or type(value).__name__ == "ndarray":
        return tuple(_canon(v) for v in value)
    if hasattr(value, "item"):  # numpy scalar (after arrays: they have .item too)
        return _canon(value.item())
    return value


def _rows(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [tuple(_canon(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    return sorted(rows, key=repr)


def _nested_cols(pdf: pd.DataFrame) -> list[str]:
    """Columns holding list/array/dict values — the driver's pandas
    hasher crashes on these (`unhashable type: 'list'`, the l34 r6
    failure), so an oracle-backed query emitting one is a FAIL here
    even though tuple-izing would let a value compare pass."""
    bad = []
    for c in pdf.columns:
        # r7 advisor: probe a SAMPLE, not just the first value — an
        # object-dtype column whose first non-null is scalar but whose
        # later values are lists (mixed column) slipped past the guard.
        probe = pdf[c].dropna().head(100)
        if any(
            isinstance(v, (list, tuple, dict))
            or type(v).__name__ == "ndarray"
            for v in probe
        ):
            bad.append(c)
    return bad


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    nested = _nested_cols(spark_pdf)
    if nested:
        problems.append(
            f"nested output column(s) {nested}: driver hasher would crash "
            f"(unhashable) — serialize to string (concat_ws / array_to_string)"
        )
        return problems
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} "
            f"oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_dtypes = {c: str(spark_pdf[c].dtype) for c in spark_pdf.columns}
    o_dtypes = {c: str(oracle_pdf[c].dtype) for c in oracle_pdf.columns}
    dtype_diff = {c: (s_dtypes[c], o_dtypes[c]) for c in s_dtypes if s_dtypes[c] != o_dtypes[c]}
    if dtype_diff:
        problems.append(f"dtype drift (warn-level): {dtype_diff}")
    if len(spark_pdf) == len(oracle_pdf):
        s_rows, o_rows = _rows(spark_pdf), _rows(oracle_pdf)
        n_bad = sum(1 for a, b in zip(s_rows, o_rows) if a != b)
        if n_bad:
            first = next((a, b) for a, b in zip(s_rows, o_rows) if a != b)
            problems.append(
                f"{n_bad}/{len(s_rows)} rows differ; first: spark={first[0]!r} "
                f"oracle={first[1]!r}"
            )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    registry.load_all()
    only = set(sys.argv[2:])
    unknown = only - set(registry.QUERIES)
    if unknown:
        # A misspelled name silently filtering to '0/0 pass' (exit 0)
        # would let a CI step conclude parity holds for a query that
        # never ran.
        print(f"unknown query name(s): {sorted(unknown)}", file=sys.stderr)
        return 2
    names = [n for n in registry.QUERIES if not only or n in only]

    if os.environ.get("PARITY_DEFAULT_SESSION"):
        # Driver-fidelity mode: a bone-stock session (no AQE/Arrow/UTC
        # overrides) — flushes out any query that silently depends on
        # our session factory's settings.
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[32]").getOrCreate()
    else:
        spark = get_spark("parity-check")
    con = duck_connection(sf_dir)
    failed, rows_only = [], []
    for name in names:
        try:
            spark_pdf = registry.QUERIES[name](spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL  {name}: spark raised {exc}")
            continue
        sql = registry.ORACLES.get(name)
        if sql is None:
            rows_only.append(name)
            print(f"rows  {name}: {len(spark_pdf)} rows (no oracle)")
            continue
        try:
            oracle_pdf = con.execute(sql).df()
        except Exception as exc:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL  {name}: duckdb raised {exc}")
            continue
        problems = compare(name, spark_pdf, oracle_pdf)
        hard = [p for p in problems if not p.startswith("dtype drift")]
        if hard:
            failed.append(name)
            print(f"FAIL  {name}:")
            for p in problems:
                print(f"      - {p}")
        elif problems:
            print(f"WARN  {name}: {problems[0]} ({len(spark_pdf)} rows)")
        else:
            print(f"ok    {name} ({len(spark_pdf)} rows)")
    print(
        f"\n{len(names) - len(failed)}/{len(names)} pass "
        f"({len(rows_only)} rows-only) at {sf_dir}"
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
