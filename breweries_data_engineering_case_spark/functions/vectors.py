"""Vector expressions over ``array<float>`` embedding columns.

All JVM-side higher-order functions — no UDFs, no data leaves Tungsten. The
fold order of ``F.aggregate`` is the array order, so dot products and norms
are bit-deterministic (and reproducible against any engine that accumulates
in index order — the oracle uses DuckDB's ordered aggregates).

Elements are cast float→double *before* multiplying so every arithmetic op
is an exact IEEE double op on exactly-representable inputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product in double precision."""
    prods = F.zip_with(_col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm2(a: Column | str) -> Column:
    """Euclidean norm, sequential-fold sum of squares."""
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity in double precision (NULL-safe on zero vectors is
    the caller's concern; embeddings here are never zero)."""
    return dot(a, b) / (norm2(a) * norm2(b))


def hyperplane_bits(a: Column | str, planes: list[list[float]]) -> Column:
    """Sign bits of projections onto fixed random hyperplanes (SimHash for
    dense vectors): bit i = 1 if a·p_i >= 0. Returns a BIGINT bit-pack
    (len(planes) <= 62 — bit 63 would overflow a signed long literal).
    Used for LSH bucketing of embeddings.

    Implemented as an Arrow-batched pandas UDF: the projection is one
    (batch × dim) @ (dim × planes) numpy matmul — a per-row expression fold
    over `planes` literal arrays runs interpreted and measured ~10× slower.
    This is exactly the 'vectorized UDF where built-ins can't express it
    efficiently' case; the bucketing result feeds normal JVM-side joins."""
    if len(planes) > 62:
        raise ValueError(f"at most 62 hyperplane bits fit a signed long, got {len(planes)}")
    from pyspark.sql.functions import pandas_udf

    mat = np.asarray(planes, dtype=np.float64).T.copy()  # (dim, n_planes)
    weights = (np.int64(1) << np.arange(len(planes), dtype=np.int64))

    @pandas_udf("long")
    def _sig(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype="int64")
        arr = np.stack(col.to_numpy()).astype(np.float64)  # (n, dim)
        bits = (arr @ mat) >= 0.0
        return pd.Series(bits.astype(np.int64) @ weights)

    return _sig(_col(a))
