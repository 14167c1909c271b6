"""As-of (point-in-time) join — a temporal operator Spark lacks natively.

``asof_join_backward(left, right, …)`` attaches, to every left row, the
payload of the latest right row with the same key whose timestamp is
at-or-before the left row's timestamp.

Implementation is the scalable **union + running last_value** rewrite, not a
per-key loop or a range cross-join:

    tag right rows 0, left rows 1
    → union on (key, ts, tag, payload)
    → one window per key ordered by (ts, tag, payload-id):
      carry = LAST(payload IGNORE NULLS) over rows-unbounded-preceding
    → keep tag=1 rows

Cost is exactly one shuffle on the key (the window partition) over
|left|+|right| rows — the same price as a plain equi-join, regardless of how
many right rows precede each left row. Ties at equal timestamps resolve
right-before-left (tag order) and by the payload id column (explicit,
engine-portable determinism).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: str,
    left_cols: list[str] | None = None,
    payload_out: str = "asof_value",
) -> DataFrame:
    """For each left row: latest ``right_payload`` with right_ts <= left_ts
    for the same key (NULL when no prior right row exists).

    ``right_payload`` must be non-null and unique per (key, ts) tie-group for
    deterministic results; output columns = left_cols + payload_out.
    """
    left_cols = left_cols or [c for c in left.columns if c != key]
    l_tag = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(right.schema[right_payload].dataType).alias("__pl"),
        *[F.col(c).alias(f"__l_{c}") for c in left_cols],
    )
    r_tag = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.col(right_payload).alias("__pl"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in left_cols],
    )
    u = r_tag.unionByName(l_tag)
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__tag", "__pl")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("__match", F.last("__pl", ignorenulls=True).over(w))
    return carried.filter(F.col("__tag") == 1).select(
        F.col("__k").alias(key),
        *[F.col(f"__l_{c}").alias(c) for c in left_cols],
        F.col("__match").alias(payload_out),
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: str,
    left_cols: list[str] | None = None,
    payload_out: str = "asof_value",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Forward as-of join (pandas ``merge_asof(direction='forward')``): for
    each left row, the EARLIEST right row with the same key whose timestamp
    is at-or-after the left row's — optionally only if it lands within
    ``tolerance_us`` microseconds (the "next purchase within 2 h of the
    click" attribution shape).

    Same union + running-carry rewrite as the backward join, with the scan
    order reversed: order by (ts DESC, tag, payload) so the carry at each
    left row is the nearest FOLLOWING right payload. Matched timestamp and
    payload are carried as two IGNORE-NULLS lasts over the identical
    window — they are null on exactly the same rows, so they always come
    from the same right row. Order keys are never null (COALESCE payload
    to -1 for left rows): Spark and DuckDB default null placement differs
    per direction, so nullable sort keys are banned in portable windows.
    Ties: a right row at the left row's exact timestamp matches (>=); among
    equal-timestamp right rows the smallest payload wins (deterministic in
    both engines). One shuffle on the key, same as an equi-join.
    """
    left_cols = left_cols or [c for c in left.columns if c != key]
    pl_type = right.schema[right_payload].dataType
    l_tag = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(pl_type).alias("__pl"),
        *[F.col(c).alias(f"__l_{c}") for c in left_cols],
    )
    r_tag = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.col(right_payload).alias("__pl"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
            for c in left_cols
        ],
    )
    u = r_tag.unionByName(l_tag)
    # unix_micros rejects TIMESTAMP_NTZ; the cast is value-preserving under
    # the UTC session this engine pins (session.py)
    us = F.unix_micros(F.col("__ts").cast("timestamp"))
    w = (
        Window.partitionBy("__k")
        .orderBy(
            us.desc(),
            F.col("__tag").asc(),
            F.coalesce(F.col("__pl"), F.lit(-1)).desc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    right_us = F.when(F.col("__tag") == 0, us)
    carried = u.withColumn(
        "__match", F.last("__pl", ignorenulls=True).over(w)
    ).withColumn("__match_us", F.last(right_us, ignorenulls=True).over(w))
    out = carried.filter(F.col("__tag") == 1)
    match = F.col("__match")
    if tolerance_us is not None:
        match = F.when(
            F.col("__match_us") - us <= F.lit(tolerance_us), F.col("__match")
        )
    return out.select(
        F.col("__k").alias(key),
        *[F.col(f"__l_{c}").alias(c) for c in left_cols],
        match.alias(payload_out),
    )
