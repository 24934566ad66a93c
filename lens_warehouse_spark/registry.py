"""Query/oracle registry.

Every implemented operator from SURVEY.md §2 registers here as a
``(spark, sf_dir) -> DataFrame`` callable, optionally paired with the
equivalent DuckDB ANSI-SQL oracle string. ``__spark_entry__.py`` exposes
these to the driver.

PARITY RULES (why the queries look the way they do — the driver
hash-compares Spark output against DuckDB at value level):

1.  Alias every computed column identically on both sides (driver sorts
    columns by name before hashing).
2.  Timestamps out -> epoch millis BIGINT (``unix_millis`` /
    ``epoch_ms``) or a formatted string; never raw timestamp values
    (ns-vs-us flavor risk).
3.  Large double sums (magnitude >~1e6, e.g. price sums) -> round to
    integer and cast BIGINT: cross-engine summation-order error is
    ~1e-4 absolute at 1e9 magnitude, so a 2-decimal round could flip a
    boundary but an integer round practically cannot. CAVEAT (hit at
    sf0.1, round 4b): when the summed data is 2-decimal, the exact
    group sum CAN land dead on x.50 (observed: signup value sum
    998497.50), and then the integer round is a coin flip on
    accumulation order. For 2-decimal columns, sum EXACT INTEGER CENTS
    instead — sum(CAST(round(value * 100) AS BIGINT)) — on both sides;
    per-row round is deterministic, integer sums are order-free.
4.  Small-magnitude aggregates (discount sums) -> round(x, 4). CAUTION
    on averages of low-precision (2-decimal) data: when the group count
    is 2^a*5^b the true average can terminate exactly ON a rounding
    boundary (observed: 589.18/16 = 36.82375 flipping between engines
    at round-4) — emit the rounded SUM plus the count instead.
5.  Per-row arithmetic on doubles is written with the identical
    expression tree on both sides (IEEE ops are bit-deterministic).
6.  DuckDB sums of INTEGER produce HUGEINT -> always CAST AS BIGINT.
7.  Never rely on output order (compare is order-insensitive), but any
    LIMIT/top-k query must have a *unique* ordering key (add tiebreakers).
8.  NO NESTED TYPES (array/map/struct) in oracle-backed output: the
    driver's pandas canonicalizer factorizes values and crashes on
    unhashable lists (l34, round 6 — the only red driver row in six
    rounds). Serialize collections to a flat string:
    ``concat_ws(',', sort_array(collect_list(x)).cast('array<string>'))``
    vs DuckDB ``array_to_string(list(x ORDER BY x), ',')``.
    tests/test_registry_schema.py enforces this registry-wide.

BUILD-IS-LAZY CONTRACT: calling a registered query returns an
UNEXECUTED frame — plan audits and dry runs may construct plans freely
without triggering Spark jobs. This now holds registry-wide (r8 verdict
#6): ``l28_boilerplate_scrub`` above 100k docs needs a bounded
boiler-cardinality probe (a real corpus aggregation no metadata-only
statistic can supply) to route between its map-side and shuffle tiers,
and since r9 that probe runs on the FIRST ACTION, not at build — the
query returns a thin delegating proxy (curation._DeferredFrame) that
materializes the routed DataFrame on first attribute access.
tests/test_curation.py::test_l28_build_is_lazy pins zero-jobs-at-build.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query, optionally with its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registration side-effects run."""
    from lens_warehouse_spark.operators import (  # noqa: F401
        aggregates,
        graph,
        cohort_queries,
        extras,
        functions,
        joins,
        relational,
        timeseries,
        timetravel,
        tpch,
        udfs,
        windows,
    )
    from lens_warehouse_spark.llm import (  # noqa: F401
        curation,
        dedup,
        multimodal,
        textstats,
        vector,
    )
    from lens_warehouse_spark import sources  # noqa: F401
    from lens_warehouse_spark.streaming import jobs  # noqa: F401
