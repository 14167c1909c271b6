"""Aggregation operators — grouped counts and the rollup hierarchy.

Reference semantics (app/tasks/gold.py:74-178):

- base grouped count: ``COUNT(*) … GROUP BY ALL`` over
  (country, state, brewery_type) with NULL dims coalesced to ``''``
  (gold.py:76-85);
- three coarser granularities obtained by re-aggregating the base counts with
  ``SUM(brewery_count)`` (gold.py:133-171) — four separate materializations.

Spark-first design: the four granularities are **one** plan via
``GROUPING SETS`` — a single shuffle produces all levels (the Expand operator
replicates each input row once per set *after* partial aggregation), instead
of four scans + four shuffles. ``regroup_sum`` is still provided because
summing pre-aggregated counts is the right call when the base counts are
already materialized (at 100 TB you re-aggregate the small gold table, not
the huge silver one).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_count(
    df: DataFrame,
    dims: Sequence[str],
    count_name: str = "brewery_count",
    blank_fill: bool = True,
) -> DataFrame:
    """``COUNT(*)`` grouped by ``dims``; NULL dims optionally coalesced to ''.

    ≈ app/tasks/gold.py:76-85 (COALESCE at :78-80, COUNT(*) at :81,
    GROUP BY ALL at :83 — expanded explicitly; Spark has no GROUP BY ALL).
    """
    sel = [
        (F.coalesce(F.col(d), F.lit("")) if blank_fill else F.col(d)).alias(d) for d in dims
    ]
    return df.select(*sel).groupBy(*dims).agg(F.count(F.lit(1)).alias(count_name))


def regroup_sum(
    counts: DataFrame,
    dims: Sequence[str],
    count_col: str = "brewery_count",
) -> DataFrame:
    """Coarser granularity by summing pre-aggregated counts.

    ≈ ``SUM(brewery_count) … GROUP BY ALL`` (app/tasks/gold.py:133-138).
    Summing counts ≡ recounting, but reads the (tiny) counts table instead of
    the fact table.
    """
    return counts.groupBy(*dims).agg(F.sum(count_col).alias(count_col))


def grouping_sets_counts(
    df: DataFrame,
    sets: Sequence[Sequence[str]],
    count_name: str = "cnt",
    blank_fill: str | None = None,
    level_col: str | None = None,
) -> DataFrame:
    """All granularities in one pass via GROUPING SETS.

    The idiomatic one-shot alternative to the reference's four sequential
    aggregations (app/tasks/gold.py:115-178). One shuffle; AQE coalesces the
    (small) output partitions. ``blank_fill`` maps the NULLs that grouping
    sets introduce for non-grouped dims (and any real NULL dim values) to a
    sentinel, matching gold.py:78-80.

    ``level_col`` additionally emits ``grouping_id()`` (bit i set ⇔ dim i is
    NOT grouped in the row's set, first dim = MSB), so a subtotal row is
    distinguishable from a genuine group whose dim values are NULL — the
    ambiguity ``blank_fill`` alone would introduce in a mixed-level output.
    """
    all_dims: list[str] = []
    for s in sets:
        for d in s:
            if d not in all_dims:
                all_dims.append(d)
    gsets = [[F.col(d) for d in s] for s in sets]
    aggs = [F.count(F.lit(1)).alias(count_name)]
    if level_col is not None:
        aggs.append(F.grouping_id().alias(level_col))
    out = df.groupingSets(gsets, *[F.col(d) for d in all_dims]).agg(*aggs)
    if blank_fill is not None:
        out = out.select(
            *[F.coalesce(F.col(d), F.lit(blank_fill)).alias(d) for d in all_dims],
            F.col(count_name),
            *([F.col(level_col)] if level_col is not None else []),
        )
    return out


def largest_remainder_topup(
    alloc: DataFrame,
    budget: int,
    floor_col: str,
    rem_col: str,
    key_col: str,
    out_col: str,
) -> DataFrame:
    """Hamilton (largest-remainder) apportionment tail, shared by every
    exact-integer budget allocator (dataset_token_budget_allocation,
    doremi_domain_mixture_weights, and the SQL twins they verify
    against): given per-key floored shares and their remainders, hand the
    integer shortfall (budget − Σfloor) to the largest remainders, ties
    broken by ``key_col`` ascending — a total order, so the allocation is
    deterministic and Σ``out_col`` == budget exactly, by construction.

    ``rem_col`` may be any totally-ordered numeric (long or DECIMAL —
    the DoReMi allocator ranks DECIMAL(38,0) remainders). The input is
    expected to be key-level (a handful of rows): the shortfall is a
    1-row broadcast and the rank is one tiny global window — O(|keys|)
    through one task at any corpus size.
    """
    from pyspark.sql import Window

    short = alloc.agg(
        (F.lit(budget) - F.sum(floor_col)).cast("long").alias("__shortfall")
    )
    w = Window.orderBy(F.desc(rem_col), F.asc(key_col))
    return (
        alloc.withColumn("__rk", F.row_number().over(w).cast("long"))
        .crossJoin(F.broadcast(short))
        .withColumn(
            out_col,
            (
                F.col(floor_col)
                + F.when(F.col("__rk") <= F.col("__shortfall"), 1).otherwise(0)
            ).cast("long"),
        )
        .drop("__rk", "__shortfall")
    )


def trunc_div(a: int, b: int) -> int:
    """Integer division truncating toward zero — SQL ``div`` (and DuckDB
    ``//`` on BIGINT) semantics. Python's ``//`` floors, which differs on
    exactly the mixed-sign cases; driver-side replays of SQL integer
    division (the r14 bounded-collect lattice family) must route any
    possibly-negative numerator through this helper."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b > 0) else -q


def bounded_collect(df, bound: int, what: str) -> list:
    """Collect a dim-sized aggregate with a LOUD overflow guard (VERDICT
    r14 #3). The r14 driver-side lattice family collects frames that are
    bounded *by assumption* — |S|² transition counts for a schema-level
    event-type enum, ≤2^C touch sets, 12 calendar months, k·dim centroid
    partials. The old in-plan forms made the identical assumption (≤|S|²
    broadcasts, ``sequence(0, 2^c−1)`` explodes), but a violated
    assumption there overloaded a Spark stage; violated HERE it would
    OOM/hang the *driver* silently. This helper makes the bound explicit
    and enforced: ``limit(bound+1)`` caps driver memory by construction
    (the same short-circuit shape as connected_components' fast-path
    probe), and one extra row raises with the documented assumption
    instead of letting an unexpectedly high-cardinality input melt the
    driver. Callers treat the returned rows as an unordered dict/set —
    every call site aggregates by key — so the limit (which makes no
    ordering promise a plain ``collect()`` made either) cannot change
    results on conforming data."""
    # CollectLimit executes incrementally (1 partition, then scaleUpFactor
    # more per job) — on a ≤30-row aggregate spread over 32 partitions it
    # needs up to 4 scheduling rounds to learn there is no (bound+1)-th
    # row, which measurably taxed the markov lattice (+0.17 s/query).
    # Scoping spark.sql.limit.initialNumPartitions to the collect makes
    # the first job scan every partition at once: ONE job, bound intact.
    spark = df.sparkSession
    key = "spark.sql.limit.initialNumPartitions"
    try:
        prev = spark.conf.get(key, None)
    except Exception:
        prev = None
    try:
        spark.conf.set(key, "1000000")
        rows = df.limit(bound + 1).collect()
    finally:
        try:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
        except Exception:
            pass
    if len(rows) > bound:
        raise RuntimeError(
            f"bounded_collect: {what} produced more than {bound} rows — "
            "the dim-size assumption this driver-side lattice relies on "
            "does not hold for this input; refusing to iterate an "
            "unbounded lattice on the driver"
        )
    return rows
