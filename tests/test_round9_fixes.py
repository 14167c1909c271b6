"""Round-9 defect fixes (VERDICT r8 #2/#3/#5, ADVICE r8): empty/degenerate
slices for the two-pass median and decile lift, the JSONL sink append
contract, malformed-audio drop semantics, the actual-size Jaccard
denominator, and the registry cache-lifecycle contract.
"""

from __future__ import annotations

import json
import struct

import duckdb
import pytest
from pyspark.sql import functions as F

from breweries_data_engineering_case_spark import caching
from breweries_data_engineering_case_spark.plans import registry
from breweries_data_engineering_case_spark.sources.readers import table_scan


def _oracle_rows(sql: str, table: str, parquet: str):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW {table} AS SELECT * FROM '{parquet}'")
    rel = con.sql(sql)
    cols = [d[0] for d in rel.description]
    rows = rel.fetchall()
    con.close()
    return cols, rows


def _compare(sdf, sql: str, table: str, parquet: str):
    cols, drows = _oracle_rows(sql, table, parquet)
    srows = [tuple(r) for r in sdf.collect()]
    assert sorted(sdf.columns) == sorted(cols)
    si = sorted(range(len(sdf.columns)), key=lambda i: sdf.columns[i])
    di = sorted(range(len(cols)), key=lambda i: cols[i])
    snorm = sorted(tuple(str(r[i]) for i in si) for r in srows)
    dnorm = sorted(tuple(str(r[i]) for i in di) for r in drows)
    assert snorm == dnorm


# ---------------------------------------------------------------------------
# VERDICT r8 #2: empty / degenerate slices
# ---------------------------------------------------------------------------

def test_median_two_pass_empty_table(spark, sf_dir, tmp_path):
    """Empty lineitem: oracle's rank filter yields ZERO rows; the query must
    not emit a one-NULL-row aggregate instead (VERDICT r8 defect #1)."""
    out = str(tmp_path / "empty_sf")
    table_scan(spark, sf_dir, "lineitem").limit(0).write.parquet(
        f"{out}/lineitem.parquet"
    )
    sdf = registry.QUERIES["lineitem_exact_median_two_pass"](spark, out)
    assert sdf.collect() == []
    _compare(
        sdf,
        registry.ORACLES["lineitem_exact_median_two_pass"],
        "lineitem",
        f"{out}/lineitem.parquet/*.parquet",
    )


def test_median_two_pass_single_row(spark, sf_dir, tmp_path):
    out = str(tmp_path / "one_sf")
    table_scan(spark, sf_dir, "lineitem").orderBy(
        "l_orderkey", "l_linenumber"
    ).limit(1).write.parquet(f"{out}/lineitem.parquet")
    sdf = registry.QUERIES["lineitem_exact_median_two_pass"](spark, out)
    _compare(
        sdf,
        registry.ORACLES["lineitem_exact_median_two_pass"],
        "lineitem",
        f"{out}/lineitem.parquet/*.parquet",
    )


def test_decile_lift_zero_positives(spark, sf_dir, tmp_path):
    """No '1-URGENT' orders anywhere: total_pos = 0 must yield NULL lift on
    BOTH engines (Spark div→NULL, DuckDB needs the CASE guard) — VERDICT r8
    defect #2."""
    out = str(tmp_path / "nopos_sf")
    table_scan(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).write.parquet(f"{out}/orders.parquet")
    sdf = registry.QUERIES["orders_decile_lift"](spark, out)
    rows = sdf.collect()
    assert rows, "deciles should still exist"
    assert all(r["lift_permille"] is None for r in rows)
    _compare(
        sdf,
        registry.ORACLES["orders_decile_lift"],
        "orders",
        f"{out}/orders.parquet/*.parquet",
    )


# ---------------------------------------------------------------------------
# ADVICE r8 #3: top-k churn drift with < 10 users per half
# ---------------------------------------------------------------------------

def test_topk_churn_drift_small_slice(spark, sf_dir, tmp_path):
    """3 users total: the Jaccard denominator must come from the actual
    top-list sizes (|t0| + |t1| − common), not the literal 20."""
    out = str(tmp_path / "small_events")
    small_users = [
        r["user_id"]
        for r in table_scan(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .orderBy("user_id")
        .limit(3)
        .collect()
    ]
    table_scan(spark, sf_dir, "events").filter(
        F.col("user_id").isin(small_users)
    ).write.parquet(f"{out}/events.parquet")
    sdf = registry.QUERIES["events_topk_churn_drift"](spark, out)
    row = sdf.collect()[0]
    assert row["n_t0"] <= 3 and row["n_t1"] <= 3
    union = row["n_t0"] + row["n_t1"] - row["n_common"]
    if union > 0:
        assert row["jaccard_ppm"] == (1_000_000 * row["n_common"]) // union
    assert row["n_new_entrants"] == row["n_t1"] - row["n_common"]
    _compare(
        sdf,
        registry.ORACLES["events_topk_churn_drift"],
        "events",
        f"{out}/events.parquet/*.parquet",
    )


# ---------------------------------------------------------------------------
# VERDICT r8 #5: JSONL sink append contract
# ---------------------------------------------------------------------------

def _write_jsonl(spark, df, path, mode):
    from breweries_data_engineering_case_spark.sources.python_datasource import (
        register_jsonl_sink,
    )

    register_jsonl_sink(spark)
    df.write.format("jsonl_audit_sink").mode(mode).save(path)


def test_jsonl_sink_append_never_clobbers(spark, tmp_path):
    out = str(tmp_path / "sink")
    (tmp_path / "sink").mkdir()
    first = spark.range(5).select(F.col("id").alias("v"))
    second = spark.range(100, 103).select(F.col("id").alias("v"))
    _write_jsonl(spark, first.repartition(2), out, "overwrite")
    parts_before = sorted(p.name for p in (tmp_path / "sink").glob("part-*.jsonl"))
    _write_jsonl(spark, second.repartition(2), out, "append")
    parts_after = sorted(p.name for p in (tmp_path / "sink").glob("part-*.jsonl"))
    # every pre-append part survives with its exact name (no index reuse)
    assert set(parts_before) <= set(parts_after)
    assert len(parts_after) == len(parts_before) + 2
    # _SUCCESS reports the CUMULATIVE rows across both writes
    manifest = json.loads((tmp_path / "sink" / "_SUCCESS").read_text())
    assert manifest["rows"] == 8
    assert manifest["files"] == len(parts_after)
    # read-back sees all 8 rows exactly once
    vals = []
    for p in (tmp_path / "sink").glob("part-*.jsonl"):
        vals += [json.loads(line)["v"] for line in p.read_text().splitlines()]
    assert sorted(vals) == [0, 1, 2, 3, 4, 100, 101, 102]


def test_jsonl_sink_concurrent_writers_isolated(spark, tmp_path):
    """Two writers interleaved on ONE sink root: writer B's commit (and a
    third writer's abort) must not reap writer A's still-staged task files
    — the _staged rmtree race from VERDICT r8 #3. Drives the writer
    protocol objects directly (two sessions in one JVM isn't possible), the
    exact interleave the executors would produce."""
    from breweries_data_engineering_case_spark.sources.python_datasource import (
        JsonlCommitMessage,
        JsonlSinkWriter,
    )

    root = tmp_path / "sink3"
    root.mkdir()
    staged_dir = root / "_staged"
    staged_dir.mkdir()

    # writer A stages a task file (its commit hasn't happened yet)
    a_staged = staged_dir / "task-aaaa.jsonl"
    a_staged.write_text('{"v": 1}\n{"v": 2}\n')
    a_msg = JsonlCommitMessage(staged=str(a_staged), n_rows=2)

    # writer B stages + commits while A is still in flight
    b_staged = staged_dir / "task-bbbb.jsonl"
    b_staged.write_text('{"v": 10}\n')
    writer_b = JsonlSinkWriter({"path": str(root)}, overwrite=False)
    writer_b.commit([JsonlCommitMessage(staged=str(b_staged), n_rows=1)])
    assert a_staged.exists(), "B's commit reaped A's staged file"

    # a third writer aborts — must also leave A's staged file alone
    c_staged = staged_dir / "task-cccc.jsonl"
    c_staged.write_text('{"v": 99}\n')
    writer_c = JsonlSinkWriter({"path": str(root)}, overwrite=False)
    writer_c.abort([JsonlCommitMessage(staged=str(c_staged), n_rows=1)])
    assert a_staged.exists(), "C's abort reaped A's staged file"

    # A finally commits; read-back sees every committed row exactly once
    writer_a = JsonlSinkWriter({"path": str(root)}, overwrite=False)
    writer_a.commit([a_msg])
    manifest = json.loads((root / "_SUCCESS").read_text())
    assert manifest["rows"] == 3
    vals = []
    for p in root.glob("part-*.jsonl"):
        vals += [json.loads(line)["v"] for line in p.read_text().splitlines()]
    assert sorted(vals) == [1, 2, 10]
    # the shared staging dir is reaped once the last writer drains it
    assert not staged_dir.exists()


def test_jsonl_sink_overwrite_resets(spark, tmp_path):
    out = str(tmp_path / "sink2")
    (tmp_path / "sink2").mkdir()
    _write_jsonl(spark, spark.range(4).select(F.col("id").alias("v")), out, "overwrite")
    _write_jsonl(spark, spark.range(2).select(F.col("id").alias("v")), out, "overwrite")
    manifest = json.loads((tmp_path / "sink2" / "_SUCCESS").read_text())
    assert manifest["rows"] == 2
    vals = []
    for p in (tmp_path / "sink2").glob("part-*.jsonl"):
        vals += [json.loads(line)["v"] for line in p.read_text().splitlines()]
    assert sorted(vals) == [0, 1]


# ---------------------------------------------------------------------------
# ADVICE r8 #2: malformed RIFF payloads are dropped, not task failures
# ---------------------------------------------------------------------------

def _wav_bytes(n=2048):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(8000)
        wv.writeframes(struct.pack(f"<{n}h", *([1000] * n)))
    return buf.getvalue()


@pytest.mark.parametrize(
    "op", ["audio_fingerprint", "audio_frame_energy"]
)
def test_malformed_riff_dropped(spark, op):
    from breweries_data_engineering_case_spark.operators import multimodal

    good = _wav_bytes()
    truncated = good[: len(good) // 3]  # valid RIFF magic, broken body
    junk = b"RIFF" + b"\x00" * 10
    df = spark.createDataFrame(
        [
            (1, "audio", bytearray(good)),
            (2, "audio", bytearray(truncated)),
            (3, "audio", bytearray(junk)),
            (4, "text", bytearray(b"not audio")),
        ],
        "asset_id long, media_type string, payload binary",
    )
    out = getattr(multimodal, op)(df).collect()  # must not raise
    ids = {r["asset_id"] for r in out}
    assert 1 in ids  # the intact WAV decodes
    assert 3 not in ids and 4 not in ids


# ---------------------------------------------------------------------------
# VERDICT r8 #3: cache lifecycle contract
# ---------------------------------------------------------------------------

def test_registry_releases_previous_query_caches(spark, sf_dir):
    # part_similarity_topk caches its baskets; constructing ANY next registry
    # query must release them (no clearCache() needed anywhere)
    df = registry.QUERIES["part_similarity_topk"](spark, sf_dir)
    df.collect()
    assert len(caching._ACTIVE) > 0, "query should have tracked its caches"
    df2 = registry.QUERIES["scalar_count"](spark, sf_dir)
    # previous query's tracked frames were released at construction time:
    # nothing is left in Spark's cache manager (scalar_count caches nothing)
    assert len(caching._ACTIVE) == 0
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
    assert df2.collect()[0][0] > 0


def test_release_all_idempotent(spark, sf_dir):
    caching.release_all()
    assert caching._ACTIVE == []
    caching.release_all()  # second call is a no-op, not an error


# ---------------------------------------------------------------------------
# ADVICE r8 #1 follow-through: pre-anchor weeks must FLOOR on both engines.
# DuckDB's integer // truncates toward zero ((-13)//7 = -1), so the oracle
# uses floor(x/7.0); this test feeds events BEFORE the 2024-01-01 anchor and
# requires the two engines to agree bit-for-bit.
# ---------------------------------------------------------------------------

def test_growth_accounting_pre_anchor_floor(spark, tmp_path):
    import datetime as dt

    rows = []
    eid = 0
    # user 1: active 3 days before the anchor (week -1 under floor, week 0
    # under truncation — the divergence ADVICE r8 #1 flagged), then week 0
    for day in ("2023-12-29", "2024-01-02"):
        rows.append((eid, dt.datetime.fromisoformat(day + "T12:00:00"), 1,
                     "view", 1.0, "{}"))
        eid += 1
    # user 2: weeks -2 and 0 (a resurrection across the anchor)
    for day in ("2023-12-20", "2024-01-03"):
        rows.append((eid, dt.datetime.fromisoformat(day + "T12:00:00"), 2,
                     "view", 1.0, "{}"))
        eid += 1
    # user 3: only pre-anchor, churns at week 0
    rows.append((eid, dt.datetime.fromisoformat("2023-12-28T12:00:00"), 3,
                 "view", 1.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    out = str(tmp_path / "pre_anchor_sf")
    df.coalesce(1).write.parquet(f"{out}/events.parquet")

    sdf = registry.QUERIES["events_growth_accounting_weekly"](spark, out)
    got = {(r.week, r.state): r.n for r in sdf.collect()}
    # floor semantics: 2023-12-29 is week -1, 2023-12-28 is week -1,
    # 2023-12-20 is week -2
    assert got[(-2, "new")] == 1           # user 2
    assert got[(-1, "new")] == 2           # users 1, 3
    assert got[(0, "retained")] == 1       # user 1 (week -1 -> 0)
    assert got[(0, "resurrected")] == 1    # user 2 (gap from week -2)
    assert got[(0, "churned")] == 1        # user 3
    assert (0, "new") not in got           # nobody first appears at week 0
    _compare(
        sdf,
        registry.ORACLES["events_growth_accounting_weekly"],
        "events",
        f"{out}/events.parquet/*.parquet",
    )
