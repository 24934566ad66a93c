"""Shared column helpers enforcing the parity rules in registry.py."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_ts(col: Column | str) -> Column:
    """Normalize a timestamp column to session-TZ TIMESTAMP.

    Parquet files store naive timestamps (isAdjustedToUTC=false); the cast
    makes the code robust whether Spark reads them as LTZ or NTZ.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp")


def epoch_ms(col: Column | str) -> Column:
    """Timestamp -> epoch millis BIGINT (parity rule 2)."""
    return F.unix_millis(as_ts(col))


def money_sum(expr: Column) -> Column:
    """Large double sum -> integer-rounded BIGINT (parity rule 3)."""
    return F.round(F.sum(expr)).cast("long")


def avg4(expr: Column | str) -> Column:
    """Average rounded to 4 decimals (parity rule 4)."""
    return F.round(F.avg(expr), 4)


def revenue() -> Column:
    """The l_extendedprice * (1 - l_discount) idiom, identical tree to the
    oracle's ``l_extendedprice * (1 - l_discount)`` (parity rule 5)."""
    return F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
