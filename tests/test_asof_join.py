"""As-of join semantics on a hand-computed fixture."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from breweries_data_engineering_case_spark.operators.asof import asof_join_backward


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_backward_matches_latest_at_or_before(spark):
    trades = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "t1"),
            (1, _ts("2024-01-01 10:05:00"), "t2"),
            (2, _ts("2024-01-01 10:00:30"), "t3"),
            (3, _ts("2024-01-01 09:00:00"), "t4"),  # before any quote
        ],
        "sym long, ts timestamp, trade_id string",
    )
    quotes = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:59:00"), 100),
            (1, _ts("2024-01-01 10:00:00"), 101),  # tie with t1 → at-or-before wins
            (1, _ts("2024-01-01 10:04:00"), 102),
            (2, _ts("2024-01-01 10:00:00"), 200),
            (3, _ts("2024-01-01 12:00:00"), 300),  # after t4 only
        ],
        "sym long, ts timestamp, quote_id long",
    )
    out = asof_join_backward(
        trades, quotes, key="sym", left_ts="ts", right_ts="ts",
        right_payload="quote_id", left_cols=["trade_id"], payload_out="quote_id",
    )
    got = {r.trade_id: r.quote_id for r in out.collect()}
    assert got == {"t1": 101, "t2": 102, "t3": 200, "t4": None}


def test_asof_tie_break_is_max_payload(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "x")], "k long, ts timestamp, lid string"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 7), (1, _ts("2024-01-01 10:00:00"), 9)],
        "k long, ts timestamp, rid long",
    )
    out = asof_join_backward(
        left, right, key="k", left_ts="ts", right_ts="ts",
        right_payload="rid", left_cols=["lid"], payload_out="rid",
    )
    assert out.collect()[0].rid == 9  # deterministic: max payload among ties


def test_forward_asof_matches_pandas_merge_asof(spark, sf_dir):
    """events_asof_forward_tolerance ≡ pandas merge_asof(direction='forward',
    tolerance=2h) — the independent reference implementation of the
    semantics. Duplicate (user, ts) purchases are collapsed keep-min in
    BOTH paths so the engines' tie-break conventions can't differ."""
    import pandas as pd

    from breweries_data_engineering_case_spark.plans import registry
    from breweries_data_engineering_case_spark.sources.readers import table_scan

    e = table_scan(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    pdf = e.select("event_id", "user_id", "event_type", "ts").toPandas()
    clicks = (
        pdf[pdf.event_type == "click"][["event_id", "user_id", "ts"]]
        .rename(columns={"event_id": "click_id"})
        .sort_values("ts", kind="stable")
    )
    purchases = (
        pdf[pdf.event_type == "purchase"][["event_id", "user_id", "ts"]]
        .sort_values(["ts", "event_id"], kind="stable")
        .drop_duplicates(subset=["user_id", "ts"], keep="first")
        .sort_values("ts", kind="stable")
    )
    merged = pd.merge_asof(
        clicks,
        purchases,
        on="ts",
        by="user_id",
        direction="forward",
        tolerance=pd.Timedelta(hours=2),
        allow_exact_matches=True,
    )
    want = {
        int(r.click_id): (None if pd.isna(r.event_id) else int(r.event_id))
        for r in merged.itertuples()
    }
    got_rows = registry.QUERIES["events_asof_forward_tolerance"](
        spark, sf_dir
    ).collect()
    got = {r["click_id"]: r["next_purchase_id"] for r in got_rows}
    # compare only where the engine tie-break cannot differ: both paths
    # collapsed duplicate-(user, ts) purchases the same way, so all rows
    dup_ts = set()
    full = pdf[pdf.event_type == "purchase"]
    dups = full[full.duplicated(subset=["user_id", "ts"], keep=False)]
    dup_keys = {(int(r.user_id)) for r in dups.itertuples()}
    comparable = {
        cid: v for cid, v in want.items()
        if int(clicks[clicks.click_id == cid].user_id.iloc[0]) not in dup_keys
    }
    for cid, v in comparable.items():
        assert got[cid] == v, (cid, got[cid], v)
    assert comparable, "no comparable rows"
