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


# The driver hash is computed over fetched VALUES, so types matter exactly
# when they change the fetched Python representation. Driver evidence
# (r01–r05 green rows) fixes the equivalence classes:
#  - integer widths collapse (csv_scan INTEGER↔bigint green r1;
#    orders_dow_seasonality BIGINT↔int green r5) — all map to Python int;
#  - HUGEINT does NOT (r05 benford red: DuckDB int128 fetches as a non-int
#    representation) — always fatal;
#  - cross-family pairs (int vs double, double vs string, float vs double)
#    change the value representation — fatal.
_INT_SPARK = {"tinyint", "smallint", "int", "bigint"}
DUCK_TO_SPARK = {
    "BIGINT": _INT_SPARK,
    "INTEGER": _INT_SPARK,
    "SMALLINT": _INT_SPARK,
    "TINYINT": _INT_SPARK,
    "VARCHAR": {"string"},
    "DOUBLE": {"double"},
    "FLOAT": {"float"},
    "DATE": {"date"},
    "BOOLEAN": {"boolean"},
    # oracle timestamps are wall-clock; Spark side may carry either flavor
    "TIMESTAMP": {"timestamp_ntz", "timestamp"},
}


def _assert_types_compatible(name, scols, stypes, dcols, dtypes):
    smap = dict(zip(scols, stypes))
    for c, dt in zip(dcols, dtypes):
        dt = str(dt).upper()
        assert "HUGEINT" not in dt, (
            f"{name}.{c}: oracle binds {dt} — DuckDB int128 never matches a "
            f"Spark type; wrap the widening SUM in CAST(... AS BIGINT)"
        )
        allowed = DUCK_TO_SPARK.get(dt)
        assert allowed is not None, f"{name}.{c}: unmapped oracle type {dt}"
        st = smap[c].simpleString()
        assert st in allowed, (
            f"{name}.{c}: oracle type {dt} vs spark type {st} — typed "
            f"value-hash will mismatch even on equal values"
        )


def test_oracle_bound_types_allowed(sf_dir):
    """Bind EVERY oracle in DuckDB (no execution) and lint result types:
    any type outside DUCK_TO_SPARK — above all HUGEINT, which DuckDB
    silently widens integer SUMs to — fails here before the driver sees it
    (VERDICT r5 ask #2)."""
    con = _duck(sf_dir)
    offenders = []
    for name, sql in registry.oracles().items():
        rel = con.sql(sql)
        for c, t in zip(rel.columns, rel.types):
            ts = str(t).upper()
            if ts not in DUCK_TO_SPARK:
                offenders.append(f"{name}.{c}: {ts}")
    con.close()
    assert not offenders, f"oracle result types outside the portable set: {offenders}"


@pytest.fixture(autouse=True)
def _release_caches_between_queries(spark):
    """Queries cache intermediates through caching.cached(); the registry
    wrapper releases them on the NEXT query construction, but between
    pytest cases (where arbitrary non-registry code may run next) release
    eagerly so each query is measured/validated in isolation."""
    yield
    from breweries_data_engineering_case_spark.caching import release_all

    release_all()


@pytest.mark.parametrize("name", sorted(registry.ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    sdf = registry.QUERIES[name](spark, sf_dir)
    scols = sdf.columns
    stypes = [f.dataType for f in sdf.schema.fields]
    srows = [tuple(r) for r in sdf.collect()]

    con = _duck(sf_dir)
    rel = con.sql(registry.ORACLES[name])
    dcols = [d[0] for d in rel.description]
    dtypes = list(rel.types)
    drows = rel.fetchall()
    con.close()

    _assert_types_compatible(name, scols, stypes, dcols, dtypes)

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
