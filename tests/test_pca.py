"""Invariant tests for the PCA family (l32 gram matrix, l32b projection).

l32 is fully oracle-checked; these tests pin the parts an SQL oracle
cannot express: eigen-structure invariants of the projection (variance
ordering, orthonormality, projected variance == eigenvalue) and the
distributed-vs-local agreement of the covariance assembly.
"""

from __future__ import annotations

import numpy as np
import pytest

from lens_warehouse_spark.catalog import table
from lens_warehouse_spark.llm.vector import pca_components
from lens_warehouse_spark.registry import QUERIES
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def eig(spark):
    vals, vecs, mean = pca_components(spark, SF_SMOKE)
    return vals, vecs, mean


def _local_embeddings(spark):
    rows = table(spark, SF_SMOKE, "embeddings").select("embedding").collect()
    return np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])


def test_distributed_cov_matches_local(spark, eig):
    """The mapInPandas partial-Gram assembly == one-shot local numpy."""
    vals, vecs, mean = eig
    x = _local_embeddings(spark)
    local_cov = x.T @ x / len(x) - np.outer(x.mean(axis=0), x.mean(axis=0))
    local_vals = np.sort(np.linalg.eigvalsh(local_cov))[::-1][: len(vals)]
    assert np.allclose(np.asarray(vals), local_vals, atol=1e-8)
    assert np.allclose(mean, x.mean(axis=0), atol=1e-10)


def test_eigenvalues_monotone_nonincreasing(eig):
    vals = np.asarray(eig[0])
    assert np.all(np.diff(vals) <= 1e-12)
    assert np.all(vals >= -1e-10)  # covariance is PSD


def test_components_orthonormal(eig):
    vecs = eig[1]
    assert np.allclose(vecs.T @ vecs, np.eye(vecs.shape[1]), atol=1e-10)


def test_projected_variance_matches_eigenvalue(spark, eig):
    """Population variance of pc_k over the corpus == lambda_k (the
    defining property of PCA), computed through the registered query —
    i.e. the JVM-side literal-array dot expressions, not numpy."""
    vals, vecs, _mean = eig
    pdf = QUERIES["l32b_pca_project"](spark, SF_SMOKE).toPandas()
    for k in range(min(4, vecs.shape[1])):
        col = pdf[f"pc{k + 1}"].to_numpy()
        # projections are centered -> mean ~ 0, var == eigenvalue
        assert abs(col.mean()) < 1e-3
        assert abs(col.var() - vals[k]) < 1e-3


def test_projection_schema_and_rows(spark):
    df = QUERIES["l32b_pca_project"](spark, SF_SMOKE)
    n = table(spark, SF_SMOKE, "embeddings").count()
    assert df.count() == n
    assert df.columns == ["vec_id"] + [f"pc{i}" for i in range(1, 9)]
