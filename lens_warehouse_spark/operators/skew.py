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

    ``big`` gets a per-row salt; ``small`` is replicated once per salt
    value. Only join types where the replicated small side cannot leak
    extra rows are accepted: for right/full outer joins every
    non-matching salt replica of a small-side row would survive as a
    spurious null-padded output row, so those raise instead of
    returning silently duplicated data.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join does not support how={how!r}: the exploded "
            "small side would emit one null-padded row per non-matching "
            "salt replica"
        )
    if "__salt" in big.columns or "__salt" in small.columns:
        raise ValueError(
            "salted_join reserves the '__salt' column name; rename the "
            "input column (it would be silently overwritten and dropped)"
        )
    # Row-position salt, NOT a hash of the row's values: a hot key whose
    # rows are duplicates (or where big carries only the key) would
    # hash to ONE salt and re-create the single-task hotspot while
    # still paying the small-side explosion. Salt choice never affects
    # join results (small is replicated across ALL salts), so the
    # non-reproducible id is safe here.
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    big_salted = big.withColumn("__salt", salt)
    small_exploded = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = big_salted.join(small_exploded, [key, "__salt"], how)
    return out.drop("__salt")
