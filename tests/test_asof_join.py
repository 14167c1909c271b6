"""As-of join semantics on a hand-computed fixture."""

from __future__ import annotations

import datetime as dt

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
