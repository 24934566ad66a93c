"""Invariant tests for the PCA family (l32 gram matrix, l32b projection).

l32 is fully oracle-checked. r11: the registered l32b query became a
certified contract (oracle-exact norms + Bessel/centered/variance/
orthonormality/monotonicity certificates); the full coordinate surface
moved to ``pca_project`` and keeps its original invariants here, plus
the certificate booleans are pinned TRUE at the smoke SF so a
certificate regression fails in-suite, not only at driver time.
"""

from __future__ import annotations

import numpy as np
import pytest

from lens_warehouse_spark.catalog import table
from lens_warehouse_spark.llm.vector import pca_components, pca_project
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
    pdf = pca_project(spark, SF_SMOKE).toPandas()
    for k in range(min(4, vecs.shape[1])):
        col = pdf[f"pc{k + 1}"].to_numpy()
        # projections are centered -> mean ~ 0, var == eigenvalue
        assert abs(col.mean()) < 1e-3
        assert abs(col.var() - vals[k]) < 1e-3


def test_projection_schema_and_rows(spark):
    df = pca_project(spark, SF_SMOKE)
    n = table(spark, SF_SMOKE, "embeddings").count()
    assert df.count() == n
    assert df.columns == ["vec_id"] + [f"pc{i}" for i in range(1, 9)]


def test_certified_contract_booleans_hold(spark):
    pdf = QUERIES["l32b_pca_project"](spark, SF_SMOKE).toPandas()
    for col in (
        "bessel_ok",
        "centered_ok",
        "var_ok",
        "orthonormal_ok",
        "monotone_ok",
    ):
        assert pdf[col].all(), col


def test_certified_norms_match_numpy(spark):
    """norm2 in the contract must equal the raw squared L2 norm of each
    embedding (the number the DuckDB oracle recomputes)."""
    pdf = (
        QUERIES["l32b_pca_project"](spark, SF_SMOKE)
        .toPandas()
        .set_index("vec_id")
    )
    x = table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    for r in x.collect():
        v = np.asarray(r["embedding"], dtype=np.float64)
        # norm2 is round(<x,x>, 6): within half an ulp-of-rounding of
        # the true value, no rounding-convention dependence
        assert abs(pdf.loc[r["vec_id"], "norm2"] - v @ v) < 6e-7


def test_certificates_hold_on_degenerate_spectrum(spark, tmp_path):
    """Adversarial: identical embeddings give a ZERO covariance matrix —
    eigenvalues all 0, eigenvector choice maximally convention-
    dependent (any orthonormal basis is valid). The certificates must
    still hold: projections are exactly centered to 0, var == 0 ==
    eigenvalue, Bessel trivially, eigh's basis orthonormal."""
    import numpy as np

    from lens_warehouse_spark.registry import QUERIES, load_all

    load_all()
    vec = [float((i * 7) % 13) / 13.0 for i in range(64)]
    rows = [(i, vec) for i in range(40)]
    d = str(tmp_path)
    spark.createDataFrame(rows, "vec_id long, embedding array<float>").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    pdf = QUERIES["l32b_pca_project"](spark, d).toPandas()
    assert len(pdf) == 40
    # parquet stores float32; the engine dots in double over those values
    v32 = np.asarray(vec, dtype=np.float32).astype(np.float64)
    expected = round(float((v32 * v32).sum()), 6)
    for col in (
        "bessel_ok",
        "centered_ok",
        "var_ok",
        "orthonormal_ok",
        "monotone_ok",
    ):
        assert pdf[col].all(), col
    assert (pdf["norm2"] - expected).abs().max() < 1e-6
