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

_NESTED = (T.ArrayType, T.MapType, T.StructType)


@pytest.mark.parametrize("name", sorted(registry.ORACLES))
def test_oracle_backed_output_is_flat(name, spark, sf_dir):
    schema = registry.QUERIES[name](spark, sf_dir).schema
    nested = [f.name for f in schema.fields if isinstance(f.dataType, _NESTED)]
    assert not nested, (
        f"{name} emits nested column(s) {nested}; the driver's pandas "
        f"hasher crashes on these — serialize to string (parity rule 8)"
    )
