"""Registry-wide output-schema guard (parity rule 8, registry.py).

The driver hash-compares oracle-backed query output by loading it into
pandas and factorizing values; a nested-typed column (array/map/struct)
arrives as Python lists/dicts and crashes the hasher with
``unhashable type: 'list'`` — exactly the l34 round-6 failure, the only
red driver row in six rounds. Semantics were right; the representation
was illegal. This test makes the rule structural: NO oracle-backed
query may emit a nested-typed column.

Schema-only: ``df.schema`` runs analysis, not execution, so the whole
243-query registry checks in seconds.
"""

from __future__ import annotations

import pyspark.sql.types as T
import pytest

from lens_warehouse_spark import registry

registry.load_all()

# Positive whitelist, not just a nested-type ban: timestamps are banned
# by parity rule 2 (ns-vs-us flavor), decimals/binary/interval have
# engine-specific pandas representations the driver compare was never
# exercised on. Round-7 scan: every oracle-backed column is one of
# these today; a new query needing something else must argue its case
# here, not discover a driver crash in the next round's artifact.
_FLAT_OK = (
    T.StringType,
    T.LongType,
    T.IntegerType,
    T.ShortType,
    T.ByteType,
    T.DoubleType,
    T.FloatType,
    T.BooleanType,
)


@pytest.mark.parametrize("name", sorted(registry.ORACLES))
def test_oracle_backed_output_is_flat(name, spark, sf_dir):
    schema = registry.QUERIES[name](spark, sf_dir).schema
    bad = [
        f"{f.name}:{f.dataType.simpleString()}"
        for f in schema.fields
        if not isinstance(f.dataType, _FLAT_OK)
    ]
    assert not bad, (
        f"{name} emits non-scalar/non-whitelisted column(s) {bad}; the "
        f"driver's pandas hasher is only proven on flat scalars — "
        f"serialize or cast (parity rule 8)"
    )
