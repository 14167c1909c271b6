"""Replicates the driver's correctness gate locally (at sf0.001 for speed):
every registered query must match its DuckDB oracle on row count, column
names, and order-insensitive values.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from breweries_data_engineering_case_spark.plans import registry

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return str(v)


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(_norm(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


@pytest.mark.parametrize("name", sorted(registry.ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    sdf = registry.QUERIES[name](spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = _duck(sf_dir)
    rel = con.sql(registry.ORACLES[name])
    dcols = [d[0] for d in rel.description]
    drows = rel.fetchall()
    con.close()

    assert len(srows) == len(drows), f"{name}: row count {len(srows)} != oracle {len(drows)}"
    sc, sv = _canon(scols, srows)
    dc, dv = _canon(dcols, drows)
    assert sc == dc, f"{name}: columns {sc} != oracle {dc}"
    mism = [i for i, (a, b) in enumerate(zip(sv, dv)) if a != b][:3]
    assert not mism, f"{name}: first value mismatches at {mism}: " + "; ".join(
        f"spark={sv[i]} oracle={dv[i]}" for i in mism
    )


def test_all_queries_have_callables():
    assert set(registry.ORACLES) <= set(registry.QUERIES)
    assert registry.QUERIES, "registry must not be empty"


@pytest.mark.parametrize(
    "name", sorted(set(registry.QUERIES) - set(registry.ORACLES))
)
def test_rows_only_query_executes_deterministically(spark, sf_dir, name):
    """Rows-only queries (no SQL oracle) must still execute, return a stable
    schema, and be run-to-run deterministic."""
    fn = registry.QUERIES[name]
    df1 = fn(spark, sf_dir)
    rows1 = sorted(map(str, df1.collect()))
    df2 = fn(spark, sf_dir)
    rows2 = sorted(map(str, df2.collect()))
    assert df1.columns == df2.columns
    assert rows1 == rows2, f"{name} is not deterministic across runs"
