"""Skew-mitigated join: salting for keys AQE's skew splitting can't fix
(e.g. a single hot key dominating a shuffle partition).

Mechanics: explode the small side S times (salt 0..S-1), salt the big
side with ``pmod(hash-ish, S)`` derived from a uniform row attribute,
join on (key, salt). Result is identical to the plain join (verified by
tests/test_skew.py); the hot key's rows spread over S partitions.

At 100 TB this is the fallback lever — first choices are AQE skew-join
(enabled in session.py) and broadcast. Use when the hot side is too big
to broadcast AND a single key exceeds what one task should hold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with salt fan-out.

    ``big`` gets a random-ish salt per row (derived from xxhash64 of all
    columns — deterministic for deterministic input); ``small`` is
    replicated once per salt value.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    big_salted = big.withColumn("__salt", salt)
    small_exploded = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = big_salted.join(small_exploded, [key, "__salt"], how)
    return out.drop("__salt")
