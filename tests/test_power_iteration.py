"""Power-iteration kernel: the distributed 2-step result must equal the
same 2 steps computed densely in numpy (the fixed-point reductions add
≤1e-10 per element), and its Rayleigh quotient must be climbing —
each step is a genuine spectral-power improvement, not a no-op."""

from __future__ import annotations

import numpy as np
import duckdb

from breweries_data_engineering_case_spark.plans import registry


def _numpy_two_steps(X: np.ndarray) -> np.ndarray:
    v = np.full(X.shape[1], 0.125)
    for _ in range(2):
        s = X.T @ (X @ v)
        v = s / np.linalg.norm(s)
    return v


def _spark_vec(spark, sf_dir) -> np.ndarray:
    rows = registry.queries()["embedding_top_pc_power_iter"](spark, sf_dir).collect()
    return np.array([r.component for r in sorted(rows, key=lambda r: r.j)])


def _matrix(sf_dir) -> np.ndarray:
    rel = duckdb.sql(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    )
    return np.array(rel.fetchnumpy()["embedding"].tolist(), dtype=np.float64)


def test_matches_dense_numpy_replay(spark, sf_dir):
    X = _matrix(sf_dir)
    got = _spark_vec(spark, sf_dir)
    want = _numpy_two_steps(X)
    assert np.abs(got - want).max() < 1e-9
    assert abs(np.linalg.norm(got) - 1.0) < 1e-9  # unit vector out


def test_rayleigh_quotient_increases(spark, sf_dir):
    X = _matrix(sf_dir)
    v0 = np.full(X.shape[1], 0.125)
    v0 = v0 / np.linalg.norm(v0)
    v2 = _spark_vec(spark, sf_dir)
    r0 = v0 @ (X.T @ (X @ v0))
    r2 = v2 @ (X.T @ (X @ v2))
    assert r2 > r0  # power steps monotonically improve the quotient
