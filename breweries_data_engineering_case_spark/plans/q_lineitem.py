"""Lineitem fact analytics: pricing summaries, medians, regressions, time-bucketed rollups.

Split out of the monolithic plans/registry.py (VERDICT r8 #8); the
aggregator in registry.py restores the historical registration order.
"""


from __future__ import annotations

import hashlib
import json
import tempfile
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

from ..caching import cached, release_all
from ..functions.cleaning import stamp_date
from ..functions.text import LANG_MARKERS, fingerprint, lang_id, quality_score, token_count
from ..operators.agg import grouped_count, grouping_sets_counts, regroup_sum
from ..operators.dedup import dedup_rownum
from ..operators.enforce import range_check
from ..operators.asof import asof_join_backward
from ..operators.fuzzy_dedup import (
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dup_pairs,
)
from ..operators.joins import broadcast_dim_join, shuffle_join
from ..operators.similarity import (
    cosine_topk,
    cosine_topk_ivf,
    cosine_topk_lsh,
    embedding_near_dup_pairs,
    semantic_dedup,
)
from ..sources.readers import json_array_scan, table_scan
from ..sources.writers import idempotent_date_overwrite, write_partitioned_parquet
from .silver import clean_breweries

from .qshared import (
    register,
)



@register(
    "lineitem_corr_qty_price",
    """
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(24,4))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(24,4))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           ((n * sxy) - (sx * sy))
             / (sqrt((n * sxx) - (sx * sx)) * sqrt((n * syy) - (sy * sy)))
             AS corr_qty_price
    FROM s
    """,
)
def q_lineitem_corr_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation per group, built from exact-decimal moment sums
    instead of the built-in corr() — because both engines' native corr
    accumulate doubles in partition order (non-deterministic across engines
    AND across partitionings). Here the five moments are exact decimals; the
    final formula is a fixed tree of IEEE double ops, identical on both
    sides, so the result is bit-reproducible. One grouped pass, map-side
    partial agg — the same cost as a SUM."""
    li = table_scan(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    p = F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(q.cast("decimal(18,4)")).cast("double").alias("sx"),
        F.sum(p.cast("decimal(18,4)")).cast("double").alias("sy"),
        F.sum((q * q).cast("decimal(18,4)")).cast("double").alias("sxx"),
        F.sum((p * p).cast("decimal(24,4)")).cast("double").alias("syy"),
        F.sum((q * p).cast("decimal(24,4)")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    corr = ((n * sxy) - (sx * sy)) / (
        F.sqrt((n * sxx) - (sx * sx)) * F.sqrt((n * syy) - (sy * sy))
    )
    return s.select("l_returnflag", corr.alias("corr_qty_price"))


@register(
    "lineitem_ols_two_factor",
    """
    WITH b AS (
      SELECT l_returnflag,
             CAST(ROUND(l_quantity) AS BIGINT) AS x1,
             CAST(ROUND(l_discount * 100) AS BIGINT) AS x2,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
      FROM lineitem
    ),
    m AS (
      SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x1 * x1) AS BIGINT) AS s11,
             CAST(SUM(x1 * x2) AS BIGINT) AS s12,
             CAST(SUM(x2 * x2) AS BIGINT) AS s22,
             CAST(SUM(x1 * y) AS BIGINT) AS s1y,
             CAST(SUM(x2 * y) AS BIGINT) AS s2y
      FROM b GROUP BY l_returnflag
    ),
    s AS (
      SELECT l_returnflag, n,
             CAST(s11 AS HUGEINT) * s22 - CAST(s12 AS HUGEINT) * s12 AS det,
             CAST(s1y AS HUGEINT) * s22 - CAST(s2y AS HUGEINT) * s12 AS b1n,
             CAST(s2y AS HUGEINT) * s11 - CAST(s1y AS HUGEINT) * s12 AS b2n
      FROM m
    )
    SELECT l_returnflag, n AS n_rows,
           CAST(CASE WHEN b1n < 0 THEN -((-b1n * 1000000) // det)
                     ELSE (b1n * 1000000) // det END AS BIGINT)
             AS beta_qty_microcents,
           CAST(CASE WHEN b2n < 0 THEN -((-b2n * 1000000) // det)
                     ELSE (b2n * 1000000) // det END AS BIGINT)
             AS beta_disc_microcents
    FROM s
    """,
)
def q_lineitem_ols_two_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-predictor least squares via NORMAL EQUATIONS — multivariate
    regression (price ~ quantity + discount, no intercept) as one
    partial-agg pass of five integer moments plus a closed-form 2×2 Cramer
    solve, per return-flag group. The moments are exact BIGINTs (quantity
    and discount·100 are integer-valued, price is exact cents); the Cramer
    products run in DECIMAL(38,0) (DuckDB HUGEINT twin) with sign-split
    floor division emitting micro-cents — no float anywhere, bitwise
    cross-engine. This is the distributed-ML shape for linear models: the
    Gram matrix X'X and X'y fold map-side, the solve is O(k³) on k·(k+1)/2
    scalars — nothing but the moments ever shuffles. Beyond ~10¹² rows the
    ·10⁶-scaled Cramer numerators approach DECIMAL(38) — center the
    features or solve in float128 off-cluster at that point."""
    li = table_scan(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round("l_quantity").cast("long").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("long").alias("x2"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("y"),
    )
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
    )
    s = m.selectExpr(
        "l_returnflag",
        "n",
        "CAST(s11 AS DECIMAL(38,0)) * s22 - CAST(s12 AS DECIMAL(38,0)) * s12"
        " AS det",
        "CAST(s1y AS DECIMAL(38,0)) * s22 - CAST(s2y AS DECIMAL(38,0)) * s12"
        " AS b1n",
        "CAST(s2y AS DECIMAL(38,0)) * s11 - CAST(s1y AS DECIMAL(38,0)) * s12"
        " AS b2n",
    )
    return s.selectExpr(
        "l_returnflag",
        "n AS n_rows",
        "CAST(CASE WHEN b1n < 0 THEN -((-b1n * 1000000) div det)"
        "          ELSE (b1n * 1000000) div det END AS BIGINT)"
        " AS beta_qty_microcents",
        "CAST(CASE WHEN b2n < 0 THEN -((-b2n * 1000000) div det)"
        "          ELSE (b2n * 1000000) div det END AS BIGINT)"
        " AS beta_disc_microcents",
    )


@register(
    "lineitem_ordered_concat",
    """
    WITH g AS (
      SELECT l_orderkey,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             array_to_string(list(l_linenumber
               ORDER BY l_shipdate, l_linenumber), ',') AS lines_ordered,
             MIN(CAST(l_shipdate AS DATE)) AS first_ship,
             MAX(CAST(l_shipdate AS DATE)) AS last_ship
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey, n_lines, lines_ordered, first_ship, last_ship
    FROM g WHERE n_lines >= 4
    """,
)
def q_lineitem_ordered_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Secondary sort / ordered aggregation — the MapReduce-era pattern,
    Spark-first: per order, the line numbers in ship-date order as an
    CSV-serialized string (the registry's array convention; the shape
    that feeds per-entity sequence models and
    event-log exports). collect_list is order-NONDETERMINISTIC in a
    distributed shuffle, so the order is imposed by sorting structs of
    (shipdate, linenumber) AFTER collection — sort_array on the struct is
    a per-row JVM op, total-ordered by the (date, line) key, making the
    array bitwise deterministic with no repartition/sortWithinPartitions
    stage and no single-partition sort. One grouped shuffle; arrays stay
    bounded by lines-per-order."""
    li = table_scan(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_shipdate").cast("date").alias("sd"),
    )
    g = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.expr(
            "array_join(transform(sort_array(collect_list(struct(sd,"
            " l_linenumber))), x -> CAST(x.l_linenumber AS STRING)), ',')"
        ).alias("lines_ordered"),
        F.min("sd").alias("first_ship"),
        F.max("sd").alias("last_ship"),
    )
    return g.filter(F.col("n_lines") >= 4).select(
        "l_orderkey", "n_lines", "lines_ordered", "first_ship", "last_ship"
    )


@register(
    "lineitem_exact_median_two_pass",
    """
    WITH c AS (
      SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM lineitem
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c),
    r AS (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rn FROM c)
    SELECT n.n AS n_rows, r.cents AS median_cents
    FROM r CROSS JOIN n WHERE r.rn = (n.n + 1) // 2
    """,
)
def q_lineitem_exact_median_two_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global median (lower median, k = ⌈n/2⌉-th smallest) by
    distributed two-pass selection — the scale-correct alternative to both
    a full global sort (what the oracle's naive ORDER BY/OFFSET does) and
    an approximate sketch: pass 1 bins all values into 1024 range buckets
    (one partial-agg count shuffle, no data movement) and walks the
    ~1 KB cumulative histogram to find the bucket holding rank k; pass 2
    sorts ONLY that bucket's slice (expected n/1024 rows, a TakeOrdered
    of the remaining offset) and picks the residual rank. Total cost: two
    scans + one tiny sort, O(n/buckets) memory on one task — the
    classic BigQuery/Presto exact-percentile strategy. Bucket bounds come
    from the pass-1 min/max broadcast; every step is integer cents.

    EAGER-EXECUTION EXCEPTION (documented per ADVICE r7): multi-pass
    selection is inherently adaptive — the pass-2 plan depends on pass-1
    DATA (the target bucket and rank), so constructing this DataFrame runs
    two jobs (the O(buckets) histogram collect and the scalar stats row)
    and embeds their results as literals. The returned plan is therefore a
    snapshot: rebuild it if the underlying table changes. Plan-only
    consumers (EXPLAIN / plan sweep) pay the two jobs; that cost is
    O(n) scan + O(1 KB) driver data, same as executing pass 1."""
    li = table_scan(spark, sf_dir, "lineitem").select(
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents")
    )
    stats = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
    )
    # pass 1: 1024-bucket histogram (bucket width ≥ 1 cent)
    binned = (
        li.crossJoin(F.broadcast(stats))
        .selectExpr(
            "cents",
            "n",
            "LEAST(CAST((cents - lo) * 1024 div GREATEST(hi - lo + 1, 1)"
            " AS INT), 1023) AS b",
        )
    )
    hist = binned.groupBy("b").agg(F.count(F.lit(1)).alias("cnt"))
    rows = sorted(
        (r["b"], r["cnt"]) for r in hist.collect()
    )  # ≤1024 rows: the one driver-side step, O(buckets) not O(n)
    n = stats.collect()[0]["n"]
    if n == 0:
        # empty table: the oracle's rank filter yields zero rows; an
        # aggregate over the empty slice would instead produce one NULL row
        return spark.createDataFrame(
            [], "n_rows bigint, median_cents bigint"
        )
    k = (n + 1) // 2
    cum = 0
    target_b, before = 0, 0
    for bb, cnt in rows:
        if cum + cnt >= k:
            target_b, before = bb, cum
            break
        cum += cnt
    # pass 2: sort only the target bucket's slice
    resid = k - before
    picked = (
        binned.filter(F.col("b") == target_b)
        .select("cents")
        .orderBy("cents")
        .limit(resid)
        .agg(F.max("cents").alias("median_cents"))
    )
    return picked.selectExpr(f"CAST({n} AS BIGINT) AS n_rows", "median_cents")


@register(
    "lineitem_daily_vwap",
    """
    WITH b AS (
      SELECT CAST(l_shipdate AS DATE) AS day,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents,
             CAST(ROUND(l_quantity) AS BIGINT) AS qty
      FROM lineitem
    )
    SELECT day, CAST(SUM(qty) AS BIGINT) AS total_qty,
           CAST(SUM(cents * qty) AS BIGINT) AS notional_cents,
           CAST(CAST(SUM(cents * qty) AS HUGEINT) * 1
                // SUM(qty) AS BIGINT) AS vwap_cents
    FROM b GROUP BY day
    """,
)
def q_lineitem_daily_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily volume-weighted average price — the canonical weighted-mean
    aggregation (finance VWAP / weighted unit economics): Σ(price·qty) /
    Σqty per day in exact integer cents (floored), one partial-agg
    shuffle on the day key. Products stay int64 to ~10¹³ rows/day; the
    division runs in HUGEINT/DECIMAL(38) so the numerator can't clip
    first."""
    li = table_scan(spark, sf_dir, "lineitem").select(
        F.col("l_shipdate").cast("date").alias("day"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
        F.round("l_quantity").cast("long").alias("qty"),
    )
    return li.groupBy("day").agg(
        F.sum("qty").alias("total_qty"),
        F.sum(F.col("cents") * F.col("qty")).alias("notional_cents"),
        F.expr(
            "CAST(CAST(SUM(cents * qty) AS DECIMAL(38,0)) * 1"
            " div SUM(qty) AS BIGINT)"
        ).alias("vwap_cents"),
    )


@register(
    "lineitem_monthly_yoy_growth",
    """
    WITH m AS (
      SELECT CAST(YEAR(CAST(l_shipdate AS DATE)) AS INT) AS yr,
             CAST(MONTH(CAST(l_shipdate AS DATE)) AS INT) AS mo,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem GROUP BY 1, 2
    )
    SELECT cur.yr, cur.mo, cur.cents AS revenue_cents,
           prev.cents AS prev_year_cents,
           CAST(CASE
             WHEN (cur.cents - prev.cents) < 0
               THEN -((-(cur.cents - prev.cents) * 1000) // prev.cents)
             ELSE ((cur.cents - prev.cents) * 1000) // prev.cents
           END AS BIGINT) AS yoy_growth_permille
    FROM m cur JOIN m prev ON prev.yr = cur.yr - 1 AND prev.mo = cur.mo
    """,
)
def q_lineitem_monthly_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year monthly revenue growth — the BI staple: monthly
    roll-up self-joined on (year−1, month), growth in sign-split floored
    per-mille integer (prev = 0 months simply drop with the inner join —
    no division guard needed). The fact stream aggregates BEFORE the
    self-join, so the comparison costs O(months); exact cents
    throughout."""
    li = table_scan(spark, sf_dir, "lineitem").select(
        F.year(F.col("l_shipdate").cast("date")).cast("int").alias("yr"),
        F.month(F.col("l_shipdate").cast("date")).cast("int").alias("mo"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("c"),
    )
    m = li.groupBy("yr", "mo").agg(F.sum("c").alias("cents"))
    prev = m.select(
        (F.col("yr") + 1).alias("yr"),
        F.col("mo"),
        F.col("cents").alias("prev_year_cents"),
    )
    return (
        m.join(prev, ["yr", "mo"])
        .selectExpr(
            "yr",
            "mo",
            "cents AS revenue_cents",
            "prev_year_cents",
            "CAST(CASE WHEN (cents - prev_year_cents) < 0"
            "  THEN -((-(cents - prev_year_cents) * 1000) div prev_year_cents)"
            "  ELSE ((cents - prev_year_cents) * 1000) div prev_year_cents"
            " END AS BIGINT) AS yoy_growth_permille",
        )
    )


@register(
    "lineitem_return_rate_by_discount",
    """
    WITH b AS (
      SELECT CAST(ROUND(l_discount * 100) AS INT) AS discount_pct,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS returned
      FROM lineitem
    )
    SELECT discount_pct,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(returned) AS BIGINT) AS n_returned,
           CAST(CAST(SUM(returned) AS BIGINT) * 1000 // COUNT(*) AS BIGINT)
             AS return_rate_permille
    FROM b GROUP BY discount_pct
    """,
)
def q_lineitem_return_rate_by_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return rate by discount band — the 'do discounted items come back
    more?' diagnostic: discount quantized to exact integer percent (the
    data's own grid), return share in floored per-mille. One partial-agg
    pass over the fact table, ≤11 output rows — the canonical
    rate-by-band report shape."""
    li = table_scan(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_discount") * 100).cast("int").alias("discount_pct"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("returned"),
    )
    return li.groupBy("discount_pct").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("returned").alias("n_returned"),
    ).selectExpr(
        "discount_pct",
        "n_lines",
        "n_returned",
        "(n_returned * 1000) div n_lines AS return_rate_permille",
    )


@register(
    "lineitem_price_iqr_by_brand",
    """
    WITH b AS (
      SELECT p.p_brand,
             CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    r AS (
      SELECT p_brand, cents,
             ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY cents) AS rn,
             COUNT(*) OVER (PARTITION BY p_brand) AS n
      FROM b
    ),
    q AS (
      SELECT p_brand, CAST(MAX(n) AS BIGINT) AS n,
             CAST(MAX(CASE WHEN rn = (n + 3) // 4 THEN cents END)
                  AS BIGINT) AS q1,
             CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN cents END)
                  AS BIGINT) AS median,
             CAST(MAX(CASE WHEN rn = (3 * n + 1) // 4 THEN cents END)
                  AS BIGINT) AS q3
      FROM r GROUP BY p_brand
    )
    SELECT p_brand, n AS n_lines, q1, median, q3, q3 - q1 AS iqr,
           CAST(CASE WHEN median = 0 THEN NULL
                ELSE ((q3 - q1) * 1000) // median END AS BIGINT)
             AS iqr_over_median_permille
    FROM q
    """,
)
def q_lineitem_price_iqr_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interquartile dispersion per brand — the robust variability
    report (quartile coefficient ≈ IQR/median, immune to the price tail
    that inflates stddev): discrete quartiles by exact rank selection
    (⌈n/4⌉, ⌈n/2⌉, ⌈3n/4⌉ lower-type positions — pure integer rank
    arithmetic, identical on both engines, unlike interpolating
    percentile_cont whose float lerp is engine-shaped), from ONE
    rank window per brand partition. Scale: windows partition by brand;
    at extreme per-brand cardinality the two-pass histogram median
    (lineitem_exact_median_two_pass) is the drop-in."""
    li = table_scan(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    p = table_scan(spark, sf_dir, "part").select("p_partkey", "p_brand")
    b = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).select(
        "p_brand", "cents"
    )
    wrank = Window.partitionBy("p_brand").orderBy("cents")
    wcnt = Window.partitionBy("p_brand")
    r = b.select(
        "p_brand",
        "cents",
        F.row_number().over(wrank).alias("rn"),
        F.count(F.lit(1)).over(wcnt).alias("n"),
    )
    q = r.groupBy("p_brand").agg(
        F.max("n").alias("n"),
        F.max(F.expr("CASE WHEN rn = (n + 3) div 4 THEN cents END")).alias("q1"),
        F.max(F.expr("CASE WHEN rn = (n + 1) div 2 THEN cents END")).alias(
            "median"
        ),
        F.max(F.expr("CASE WHEN rn = (3 * n + 1) div 4 THEN cents END")).alias(
            "q3"
        ),
    )
    return q.selectExpr(
        "p_brand",
        "n AS n_lines",
        "q1",
        "median",
        "q3",
        "q3 - q1 AS iqr",
        "CAST(CASE WHEN median = 0 THEN NULL"
        " ELSE ((q3 - q1) * 1000) div median END AS BIGINT)"
        " AS iqr_over_median_permille",
    )


@register(
    "lineitem_spearman_qty_discount",
    """
    WITH b AS (
      SELECT l_returnflag AS flag, CAST(l_quantity AS INT) AS q,
             CAST(ROUND(l_discount * 100) AS INT) AS d
      FROM lineitem
    ),
    ct AS (SELECT flag, q, d, CAST(COUNT(*) AS BIGINT) AS w
           FROM b GROUP BY flag, q, d),
    mq AS (
      SELECT flag, q, wq,
             2 * (SUM(wq) OVER (PARTITION BY flag ORDER BY q) - wq) + wq + 1
               AS r2q
      FROM (SELECT flag, q, CAST(SUM(w) AS BIGINT) AS wq
            FROM ct GROUP BY flag, q)
    ),
    md AS (
      SELECT flag, d, wd,
             2 * (SUM(wd) OVER (PARTITION BY flag ORDER BY d) - wd) + wd + 1
               AS r2d
      FROM (SELECT flag, d, CAST(SUM(w) AS BIGINT) AS wd
            FROM ct GROUP BY flag, d)
    ),
    s AS (
      SELECT ct.flag,
             CAST(SUM(w) AS BIGINT) AS n,
             CAST(SUM(CAST(w AS HUGEINT) * r2q) AS DOUBLE) AS sx,
             CAST(SUM(CAST(w AS HUGEINT) * r2d) AS DOUBLE) AS sy,
             CAST(SUM(CAST(w AS HUGEINT) * r2q * r2q) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(w AS HUGEINT) * r2d * r2d) AS DOUBLE) AS syy,
             CAST(SUM(CAST(w AS HUGEINT) * r2q * r2d) AS DOUBLE) AS sxy
      FROM ct JOIN mq USING (flag, q) JOIN md USING (flag, d)
      GROUP BY ct.flag
    )
    SELECT flag AS l_returnflag, n AS n_rows,
           CASE WHEN (n * sxx - sx * sx) <= 0 OR (n * syy - sy * sy) <= 0
                THEN NULL
                ELSE (n * sxy - sx * sy)
                     / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
           END AS rho_spearman
    FROM s
    """,
)
def q_lineitem_spearman_qty_discount(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Spearman rank correlation (quantity vs discount, per return flag) —
    the robust correlation every data-quality screen wants, computed the
    DISTRIBUTED way: no global rank window over the fact table. Both
    variables have small discrete domains (50 quantities × 11 discount
    steps), so the whole computation collapses onto the ≤550-cell
    contingency table: average ranks (ties share the midrank, the proper
    Spearman treatment) come from cumulative marginal counts — windows
    over ≤50/≤11-row per-flag histograms, partitioned by flag — and the
    Pearson-on-ranks sums are weighted aggregates over the cells. Ranks
    carry a 2x scale (midranks are .5-steps; correlation is
    scale-invariant) so everything stays integer; products are summed as
    DECIMAL(38,0) (a long would overflow at n·rank² ≈ 8.6e17 per cell)
    and cast to double only for the final sqrt formula — bitwise equal to
    the oracle's HUGEINT route. At 100 TB this is one partial-agg shuffle
    to the contingency table plus broadcast rank joins."""
    b = table_scan(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("int").alias("q"),
        F.round(F.col("l_discount") * 100).cast("int").alias("d"),
    )
    ct = b.groupBy("flag", "q", "d").agg(F.count(F.lit(1)).alias("w")).transform(cached)
    wf = Window.partitionBy("flag")
    mq = (
        ct.groupBy("flag", "q")
        .agg(F.sum("w").alias("wq"))
        .select(
            "flag",
            "q",
            (
                2 * (F.sum("wq").over(wf.orderBy("q")) - F.col("wq"))
                + F.col("wq")
                + 1
            ).alias("r2q"),
        )
    )
    md = (
        ct.groupBy("flag", "d")
        .agg(F.sum("w").alias("wd"))
        .select(
            "flag",
            "d",
            (
                2 * (F.sum("wd").over(wf.orderBy("d")) - F.col("wd"))
                + F.col("wd")
                + 1
            ).alias("r2d"),
        )
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = (
        ct.join(F.broadcast(mq), ["flag", "q"])
        .join(F.broadcast(md), ["flag", "d"])
        .groupBy("flag")
        .agg(
            F.sum("w").alias("n"),
            F.sum(dec(F.col("w")) * F.col("r2q")).cast("double").alias("sx"),
            F.sum(dec(F.col("w")) * F.col("r2d")).cast("double").alias("sy"),
            F.sum(dec(F.col("w")) * F.col("r2q") * F.col("r2q"))
            .cast("double")
            .alias("sxx"),
            F.sum(dec(F.col("w")) * F.col("r2d") * F.col("r2d"))
            .cast("double")
            .alias("syy"),
            F.sum(dec(F.col("w")) * F.col("r2q") * F.col("r2d"))
            .cast("double")
            .alias("sxy"),
        )
    )
    n = F.col("n").cast("double")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    rho = F.when((vx <= 0) | (vy <= 0), F.lit(None).cast("double")).otherwise(
        (n * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (F.sqrt(vx) * F.sqrt(vy))
    )
    return s.select(
        F.col("flag").alias("l_returnflag"),
        F.col("n").alias("n_rows"),
        rho.alias("rho_spearman"),
    )


@register(
    "lineitem_kendall_tau_b",
    """
    WITH b AS (
      SELECT l_returnflag AS flag, CAST(l_quantity AS INT) AS q,
             CAST(ROUND(l_discount * 100) AS INT) AS d
      FROM lineitem
    ),
    ct AS (SELECT flag, q, d, CAST(COUNT(*) AS BIGINT) AS w
           FROM b GROUP BY flag, q, d),
    pairs AS (
      SELECT a.flag,
             CAST(SUM(CASE WHEN a.d < c.d
                           THEN CAST(a.w AS HUGEINT) * c.w ELSE 0 END)
                  AS HUGEINT) AS conc,
             CAST(SUM(CASE WHEN a.d > c.d
                           THEN CAST(a.w AS HUGEINT) * c.w ELSE 0 END)
                  AS HUGEINT) AS disc
      FROM ct a JOIN ct c ON a.flag = c.flag AND a.q < c.q
      GROUP BY a.flag
    ),
    tq AS (
      SELECT flag,
             CAST(SUM(CAST(wq AS HUGEINT) * (wq - 1) // 2) AS HUGEINT) AS n1
      FROM (SELECT flag, q, CAST(SUM(w) AS BIGINT) AS wq
            FROM ct GROUP BY flag, q)
      GROUP BY flag
    ),
    td AS (
      SELECT flag,
             CAST(SUM(CAST(wd AS HUGEINT) * (wd - 1) // 2) AS HUGEINT) AS n2
      FROM (SELECT flag, d, CAST(SUM(w) AS BIGINT) AS wd
            FROM ct GROUP BY flag, d)
      GROUP BY flag
    ),
    tot AS (
      SELECT flag, CAST(SUM(w) AS BIGINT) AS n FROM ct GROUP BY flag
    )
    SELECT tot.flag AS l_returnflag, tot.n AS n_rows,
           CAST(conc AS BIGINT) AS n_concordant,
           CAST(disc AS BIGINT) AS n_discordant,
           CAST(conc - disc AS DOUBLE)
             / (sqrt(CAST(CAST(tot.n AS HUGEINT) * (tot.n - 1) // 2 - n1
                          AS DOUBLE))
                * sqrt(CAST(CAST(tot.n AS HUGEINT) * (tot.n - 1) // 2 - n2
                            AS DOUBLE))) AS tau_b
    FROM tot JOIN pairs USING (flag) JOIN tq USING (flag) JOIN td USING (flag)
    """,
)
def q_lineitem_kendall_tau_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b (quantity vs discount, per return flag) — the
    concordance coefficient with full tie correction, computed WITHOUT the
    O(n²) pair enumeration every textbook implies: all ~3.6e11 row pairs
    at sf0.1 reduce to pairs of CONTINGENCY CELLS (≤550 per flag, ~150k
    cell pairs), each contributing w_a·w_b concordances or discordances
    at once. The cell-pair inequality join is a broadcast nested-loop over
    the bounded aggregate (never the data); tie terms n1/n2 come from the
    marginal histograms; the tau-b denominator takes exact integer
    (n0−n1)(n0−n2) through DECIMAL before one final sqrt in double. At
    100 TB the only data-sized stage is the contingency partial-agg."""
    b = table_scan(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("int").alias("q"),
        F.round(F.col("l_discount") * 100).cast("int").alias("d"),
    )
    ct = b.groupBy("flag", "q", "d").agg(F.count(F.lit(1)).alias("w")).transform(cached)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    a = ct.select(
        F.col("flag"), F.col("q"), F.col("d").alias("da"), F.col("w").alias("wa")
    )
    c2 = ct.select(
        F.col("flag").alias("flag2"),
        F.col("q").alias("q2"),
        F.col("d").alias("db"),
        F.col("w").alias("wb"),
    )
    pairs = (
        a.join(
            F.broadcast(c2),
            (F.col("flag") == F.col("flag2")) & (F.col("q") < F.col("q2")),
        )
        .groupBy("flag")
        .agg(
            F.sum(
                F.when(F.col("da") < F.col("db"), dec(F.col("wa")) * F.col("wb"))
                .otherwise(F.lit(0).cast("decimal(38,0)"))
            ).alias("conc"),
            F.sum(
                F.when(F.col("da") > F.col("db"), dec(F.col("wa")) * F.col("wb"))
                .otherwise(F.lit(0).cast("decimal(38,0)"))
            ).alias("disc"),
        )
    )
    tq = (
        ct.groupBy("flag", "q")
        .agg(F.sum("w").alias("wq"))
        .groupBy("flag")
        .agg(
            F.sum(dec(F.col("wq")) * (F.col("wq") - 1) / 2)
            .cast("decimal(38,0)")
            .alias("n1")
        )
    )
    td = (
        ct.groupBy("flag", "d")
        .agg(F.sum("w").alias("wd"))
        .groupBy("flag")
        .agg(
            F.sum(dec(F.col("wd")) * (F.col("wd") - 1) / 2)
            .cast("decimal(38,0)")
            .alias("n2")
        )
    )
    tot = ct.groupBy("flag").agg(F.sum("w").alias("n"))
    n0 = (dec(F.col("n")) * (F.col("n") - 1) / 2).cast("decimal(38,0)")
    tau = (F.col("conc") - F.col("disc")).cast("double") / (
        F.sqrt((n0 - F.col("n1")).cast("double"))
        * F.sqrt((n0 - F.col("n2")).cast("double"))
    )
    return (
        tot.join(F.broadcast(pairs), "flag")
        .join(F.broadcast(tq), "flag")
        .join(F.broadcast(td), "flag")
        .select(
            F.col("flag").alias("l_returnflag"),
            F.col("n").alias("n_rows"),
            F.col("conc").cast("long").alias("n_concordant"),
            F.col("disc").cast("long").alias("n_discordant"),
            tau.alias("tau_b"),
        )
    )


@register(
    "lineitem_kruskal_wallis_qty_by_flag",
    """
    WITH b AS (
      SELECT l_returnflag AS flag, CAST(l_quantity AS INT) AS q FROM lineitem
    ),
    hq AS (SELECT q, CAST(COUNT(*) AS BIGINT) AS w FROM b GROUP BY q),
    rk AS (
      SELECT q, w,
             2 * (SUM(w) OVER (ORDER BY q) - w) + w + 1 AS r2
      FROM hq
    ),
    fq AS (SELECT flag, q, CAST(COUNT(*) AS BIGINT) AS wf
           FROM b GROUP BY flag, q),
    g AS (
      SELECT flag, CAST(SUM(wf) AS BIGINT) AS nj,
             CAST(SUM(CAST(wf AS HUGEINT) * r2) AS HUGEINT) AS r2j
      FROM fq JOIN rk USING (q) GROUP BY flag
    ),
    t AS (
      SELECT CAST(SUM(w) AS BIGINT) AS n,
             CAST(SUM(CAST(w AS HUGEINT) * w * w - w) AS HUGEINT) AS ties
      FROM hq
    ),
    hsum AS (
      SELECT CAST(SUM(CAST(r2j AS DOUBLE) * CAST(r2j AS DOUBLE) / nj)
                  AS DOUBLE) AS s,
             CAST(COUNT(*) AS BIGINT) AS n_groups
      FROM g
    )
    SELECT t.n AS n_rows, hsum.n_groups,
           3.0 * hsum.s / (CAST(t.n AS DOUBLE) * (t.n + 1)) - 3.0 * (t.n + 1)
             AS h_statistic,
           (3.0 * hsum.s / (CAST(t.n AS DOUBLE) * (t.n + 1)) - 3.0 * (t.n + 1))
             / (1.0 - CAST(t.ties AS DOUBLE)
                      / (CAST(t.n AS DOUBLE) * t.n * t.n - t.n))
             AS h_corrected
    FROM t CROSS JOIN hsum
    """,
)
def q_lineitem_kruskal_wallis_qty_by_flag(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Kruskal-Wallis H (quantity across the three return flags) — the
    rank-based one-way ANOVA (the non-parametric sibling of
    orders_weekday_anova_eta2), with the full tie correction a 50-value
    discrete domain demands. Global midranks come from the ≤50-row
    quantity histogram (the one bounded global window); per-flag rank sums
    are weighted joins of the (flag, q) aggregate against that broadcast
    rank table. Ranks carry the 2x midrank scale, so
    H = 3·Σ(R2_j²/n_j)/(n(n+1)) − 3(n+1) (the usual 12 becomes 3); the
    tie term Σ(t³−t) is exact DECIMAL. Every data-sized stage is a
    partial-agg shuffle; everything after is O(distinct values)."""
    b = table_scan(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("int").alias("q"),
    )
    hq = b.groupBy("q").agg(F.count(F.lit(1)).alias("w"))
    rk = hq.select(
        "q",
        "w",
        (2 * (F.sum("w").over(Window.orderBy("q")) - F.col("w")) + F.col("w") + 1)
        .alias("r2"),
    )
    fq = b.groupBy("flag", "q").agg(F.count(F.lit(1)).alias("wf"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    g = (
        fq.join(F.broadcast(rk), "q")
        .groupBy("flag")
        .agg(
            F.sum("wf").alias("nj"),
            F.sum(dec(F.col("wf")) * F.col("r2"))
            .cast("decimal(38,0)")
            .alias("r2j"),
        )
    )
    t = hq.agg(
        F.sum("w").alias("n"),
        F.sum(dec(F.col("w")) * F.col("w") * F.col("w") - F.col("w"))
        .cast("decimal(38,0)")
        .alias("ties"),
    )
    hsum = g.agg(
        F.sum(
            F.col("r2j").cast("double") * F.col("r2j").cast("double")
            / F.col("nj")
        ).alias("s"),
        F.count(F.lit(1)).alias("n_groups"),
    )
    nd = F.col("n").cast("double")
    h = 3.0 * F.col("s") / (nd * (F.col("n") + 1)) - 3.0 * (F.col("n") + 1)
    corr = 1.0 - F.col("ties").cast("double") / (nd * F.col("n") * F.col("n") - F.col("n"))
    return t.crossJoin(F.broadcast(hsum)).select(
        F.col("n").alias("n_rows"),
        "n_groups",
        h.alias("h_statistic"),
        (h / corr).alias("h_corrected"),
    )


@register(
    "lineitem_qty_skew_kurtosis_by_flag",
    """
    WITH h AS (
      SELECT l_returnflag AS flag, CAST(l_quantity AS INT) AS x,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    s AS (
      SELECT flag,
             CAST(SUM(w) AS HUGEINT) AS n,
             CAST(SUM(CAST(w AS HUGEINT) * x) AS HUGEINT) AS s1,
             CAST(SUM(CAST(w AS HUGEINT) * x * x) AS HUGEINT) AS s2,
             CAST(SUM(CAST(w AS HUGEINT) * x * x * x) AS HUGEINT) AS s3,
             CAST(SUM(CAST(w AS HUGEINT) * x * x * x * x) AS HUGEINT) AS s4
      FROM h GROUP BY flag
    ),
    a AS (
      SELECT flag, n,
             n * s2 - s1 * s1 AS a2,
             n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1 AS a3,
             n * n * n * s4 - 4 * n * n * s1 * s3
               + 6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1 AS a4
      FROM s
    )
    SELECT flag AS l_returnflag, CAST(n AS BIGINT) AS n_rows,
           CASE WHEN a2 <= 0 THEN NULL
                ELSE CAST(a3 AS DOUBLE)
                     / (CAST(a2 AS DOUBLE) * sqrt(CAST(a2 AS DOUBLE)))
           END AS skewness,
           CASE WHEN a2 <= 0 THEN NULL
                ELSE CAST(a4 AS DOUBLE)
                     / (CAST(a2 AS DOUBLE) * CAST(a2 AS DOUBLE)) - 3.0
           END AS excess_kurtosis
    FROM a
    """,
)
def q_lineitem_qty_skew_kurtosis_by_flag(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Population skewness and excess kurtosis of quantity per return flag
    — third/fourth moments the single-pass MERGEABLE way: raw power sums
    S1..S4 are partial-aggregated (each executor folds its partition, the
    reducer adds — the textbook distributed-moments recipe), then combined
    into n-scaled central forms A2 = n·S2−S1² (= n²·M2),
    A3 = n²·S3−3n·S1·S2+2S1³ (= n³·M3),
    A4 = n³·S4−4n²·S1·S3+6n·S1²·S2−3S1⁴ (= n⁴·M4), giving
    g1 = A3/A2^1.5 and g2 = A4/A2²−3 with every n-power cancelling.
    The bounded domain (quantity ≤ 50) keeps S1⁴ ≈ 1.6e33 inside
    DECIMAL(38,0)/HUGEINT at SF1 — all integer until the final sqrt.
    Naive double power sums would lose ~3 digits to the A4 cancellation
    AND drift with summation order; exact sums make the cancellation
    exact. Collapsing through the ≤50-row histogram keeps per-group state
    O(domain), the same contingency idiom as the rank-statistics family."""
    h = (
        table_scan(spark, sf_dir, "lineitem")
        .select(
            F.col("l_returnflag").alias("flag"),
            F.col("l_quantity").cast("int").alias("x"),
        )
        .groupBy("flag", "x")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    x = F.col("x")
    s = h.groupBy("flag").agg(
        F.sum("w").cast("decimal(38,0)").alias("n"),
        F.sum(dec(F.col("w")) * x).cast("decimal(38,0)").alias("s1"),
        F.sum(dec(F.col("w")) * x * x).cast("decimal(38,0)").alias("s2"),
        F.sum(dec(F.col("w")) * x * x * x).cast("decimal(38,0)").alias("s3"),
        F.sum(dec(F.col("w")) * x * x * x * x).cast("decimal(38,0)").alias("s4"),
    )
    n, s1, s2, s3, s4 = (F.col(c) for c in ("n", "s1", "s2", "s3", "s4"))
    # chained decimal(38,0) products keep scale 0 and stay exact as long
    # as the VALUE fits 38 digits — the bounded domain guarantees ≤ ~1e34
    a2 = (n * s2 - s1 * s1).cast("decimal(38,0)")
    a3 = (n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1).cast("decimal(38,0)")
    a4 = (
        n * n * n * s4
        - 4 * n * n * s1 * s3
        + 6 * n * s1 * s1 * s2
        - 3 * s1 * s1 * s1 * s1
    ).cast("decimal(38,0)")
    a = s.select("flag", n.cast("long").alias("n_rows"), a2.alias("a2"), a3.alias("a3"), a4.alias("a4"))
    a2d = F.col("a2").cast("double")
    skew = F.when(F.col("a2") <= 0, F.lit(None).cast("double")).otherwise(
        F.col("a3").cast("double") / (a2d * F.sqrt(a2d))
    )
    kurt = F.when(F.col("a2") <= 0, F.lit(None).cast("double")).otherwise(
        F.col("a4").cast("double") / (a2d * a2d) - 3.0
    )
    return a.select(
        F.col("flag").alias("l_returnflag"),
        "n_rows",
        skew.alias("skewness"),
        kurt.alias("excess_kurtosis"),
    )


@register(
    "lineitem_jonckheere_dose_response",
    """
    WITH b AS (
      SELECT CAST(ROUND(l_discount * 100) AS INT) AS d,
             CAST(l_quantity AS INT) AS q
      FROM lineitem
    ),
    ct AS (SELECT d, q, CAST(COUNT(*) AS BIGINT) AS w
           FROM b GROUP BY d, q),
    cc AS (
      SELECT d, q, w,
             SUM(w) OVER (PARTITION BY d ORDER BY q
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - w AS below
      FROM ct
    ),
    jt AS (
      SELECT CAST(SUM(CAST(j.w AS HUGEINT) * (2 * i.below + i.w))
                  AS HUGEINT) AS jt2
      FROM cc i JOIN ct j ON i.q = j.q AND i.d < j.d
    ),
    marg AS (SELECT d, CAST(SUM(w) AS BIGINT) AS nd FROM ct GROUP BY d),
    e AS (
      SELECT CAST(SUM(CAST(a.nd AS HUGEINT) * b2.nd) AS HUGEINT) AS e2
      FROM marg a JOIN marg b2 ON a.d < b2.d
    ),
    tot AS (SELECT CAST(SUM(nd) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) AS BIGINT) AS n_groups FROM marg)
    SELECT tot.n_rows, tot.n_groups,
           CAST(jt2 AS BIGINT) AS jt_x2, CAST(e2 AS BIGINT) AS e_null_x2,
           CAST(jt2 - e2 AS BIGINT) AS excess_x2,
           CASE WHEN jt2 > e2 THEN 'increasing'
                WHEN jt2 < e2 THEN 'decreasing'
                ELSE 'none' END AS trend
    FROM tot CROSS JOIN jt CROSS JOIN e
    """,
)
def q_lineitem_jonckheere_dose_response(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Jonckheere-Terpstra ordered-alternative trend test — does quantity
    shift monotonically as the discount level rises? The dose-response
    question a one-way test (Kruskal-Wallis) can't answer, because it
    treats groups as unordered. JT = Σ over ordered group pairs i<j of
    the Mann-Whitney count #(qᵢ < qⱼ) + ½ ties; on the bounded
    11-level × 50-value contingency this collapses to an equi-join of
    cumulative cells on the shared quantity value with d_i < d_j (~3k
    cell pairs standing in for ~1.4e11 row pairs). The ½-tie term rides
    the 2× integer scale (jt_x2), compared against the exact null mean
    E₀·2 = Σ nᵢ·nⱼ from the marginals — all exact integers, no
    distributional approximation emitted. One data-sized shuffle (the
    contingency partial agg)."""
    b = table_scan(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_discount") * 100).cast("int").alias("d"),
        F.col("l_quantity").cast("int").alias("q"),
    )
    ct = b.groupBy("d", "q").agg(F.count(F.lit(1)).alias("w")).transform(cached)
    wd = Window.partitionBy("d").orderBy("q").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cc = ct.select(
        "d", "q", "w", (F.sum("w").over(wd) - F.col("w")).alias("below")
    )
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    i = cc.select(
        F.col("d").alias("di"), F.col("q").alias("qi"), F.col("w").alias("wi"), "below"
    )
    j = ct.select(
        F.col("d").alias("dj"), F.col("q").alias("qj"), F.col("w").alias("wj")
    )
    jt = (
        i.join(
            F.broadcast(j),
            (F.col("qi") == F.col("qj")) & (F.col("di") < F.col("dj")),
        )
        .agg(
            F.sum(dec(F.col("wj")) * (2 * F.col("below") + F.col("wi")))
            .cast("decimal(38,0)")
            .alias("jt2")
        )
    )
    marg = ct.groupBy("d").agg(F.sum("w").alias("nd"))
    ma = marg.select(F.col("d").alias("da"), F.col("nd").alias("na"))
    mb = marg.select(F.col("d").alias("db"), F.col("nd").alias("nb"))
    e = ma.join(F.broadcast(mb), F.col("da") < F.col("db")).agg(
        F.sum(dec(F.col("na")) * F.col("nb")).cast("decimal(38,0)").alias("e2")
    )
    tot = marg.agg(
        F.sum("nd").alias("n_rows"), F.count(F.lit(1)).alias("n_groups")
    )
    return (
        tot.crossJoin(F.broadcast(jt))
        .crossJoin(F.broadcast(e))
        .selectExpr(
            "n_rows",
            "n_groups",
            "CAST(jt2 AS BIGINT) AS jt_x2",
            "CAST(e2 AS BIGINT) AS e_null_x2",
            "CAST(jt2 - e2 AS BIGINT) AS excess_x2",
            "CASE WHEN jt2 > e2 THEN 'increasing'"
            " WHEN jt2 < e2 THEN 'decreasing' ELSE 'none' END AS trend",
        )
    )


@register(
    "lineitem_brown_forsythe_variance",
    """
    WITH hist AS (
      SELECT l_returnflag AS flag,
             CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS q,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1, 2
    ),
    med AS (
      SELECT flag, MAX(CASE WHEN cum - cnt < k AND k <= cum THEN q END)
               AS med
      FROM (SELECT flag, q, cnt,
                   CAST(SUM(cnt) OVER (PARTITION BY flag ORDER BY q
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum,
                   CAST((SUM(cnt) OVER (PARTITION BY flag) + 1) // 2
                     AS BIGINT) AS k
            FROM hist)
      GROUP BY flag
    ),
    z AS (
      SELECT h.flag, h.cnt, ABS(h.q - m.med) AS z
      FROM hist h JOIN med m USING (flag)
    ),
    piv AS (
      SELECT CAST(CAST(SUM(cnt) AS BIGINT) AS DOUBLE) AS n,
             CAST(CAST(SUM(cnt * z) AS HUGEINT) AS DOUBLE) AS s,
             CAST(CAST(SUM(CAST(cnt AS HUGEINT) * z * z) AS HUGEINT)
                  AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CASE WHEN flag = 'A' THEN cnt ELSE 0 END)
                  AS BIGINT) AS DOUBLE) AS na,
             CAST(CAST(SUM(CASE WHEN flag = 'A' THEN cnt * z ELSE 0 END)
                  AS HUGEINT) AS DOUBLE) AS sa,
             CAST(CAST(SUM(CASE WHEN flag = 'N' THEN cnt ELSE 0 END)
                  AS BIGINT) AS DOUBLE) AS nn,
             CAST(CAST(SUM(CASE WHEN flag = 'N' THEN cnt * z ELSE 0 END)
                  AS HUGEINT) AS DOUBLE) AS sn,
             CAST(CAST(SUM(CASE WHEN flag = 'R' THEN cnt ELSE 0 END)
                  AS BIGINT) AS DOUBLE) AS nr,
             CAST(CAST(SUM(CASE WHEN flag = 'R' THEN cnt * z ELSE 0 END)
                  AS HUGEINT) AS DOUBLE) AS sr
      FROM z
    ),
    meds AS (
      SELECT MAX(CASE WHEN flag = 'A' THEN med END) AS med_a,
             MAX(CASE WHEN flag = 'N' THEN med END) AS med_n,
             MAX(CASE WHEN flag = 'R' THEN med END) AS med_r
      FROM med
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           CAST(med_a AS BIGINT) AS med_a_cents,
           CAST(med_n AS BIGINT) AS med_n_cents,
           CAST(med_r AS BIGINT) AS med_r_cents,
           CASE WHEN (sxx - ((CASE WHEN na > 0 THEN sa * sa / na ELSE 0 END)
                           + (CASE WHEN nn > 0 THEN sn * sn / nn ELSE 0 END)
                           + (CASE WHEN nr > 0 THEN sr * sr / nr ELSE 0 END)))
                     <= 0 THEN NULL
                ELSE (((CASE WHEN na > 0 THEN sa * sa / na ELSE 0 END)
                     + (CASE WHEN nn > 0 THEN sn * sn / nn ELSE 0 END)
                     + (CASE WHEN nr > 0 THEN sr * sr / nr ELSE 0 END))
                     - s * s / n)
                   / ((CASE WHEN na > 0 THEN 1 ELSE 0 END)
                    + (CASE WHEN nn > 0 THEN 1 ELSE 0 END)
                    + (CASE WHEN nr > 0 THEN 1 ELSE 0 END) - 1)
                   / ((sxx - ((CASE WHEN na > 0 THEN sa * sa / na ELSE 0 END)
                            + (CASE WHEN nn > 0 THEN sn * sn / nn ELSE 0 END)
                            + (CASE WHEN nr > 0 THEN sr * sr / nr ELSE 0 END)))
                      / (n - ((CASE WHEN na > 0 THEN 1 ELSE 0 END)
                            + (CASE WHEN nn > 0 THEN 1 ELSE 0 END)
                            + (CASE WHEN nr > 0 THEN 1 ELSE 0 END))))
                END AS f_brown_forsythe
    FROM piv CROSS JOIN meds
    """,
)
def q_lineitem_brown_forsythe_variance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Brown–Forsythe test of equal VARIANCES across the three return-flag
    groups — the robust Levene variant (deviations from the group MEDIAN,
    not mean) that survives the heavy-tailed quantity distributions a
    mean-based F-test chokes on. Homogeneity-of-variance is the
    precondition every pooled-variance ANOVA silently assumes; this query
    is the check. Pipeline: (1) one data-sized grouped count collapses
    lineitem to the ≤150-cell (flag, quantity-cents) histogram; (2) each
    group's LOWER MEDIAN is an exact rank selection inside the bounded
    histogram (cum − cnt < k ≤ cum picks the cell holding rank
    k = ⌈n_g/2⌉ — no data-sized window); (3) absolute deviations
    z = |q − med_g| stay exact integers, and their per-group moments pivot
    into ONE row of a fixed expression tree (the eta² idiom), so the final
    F = (SSB/(k−1)) / (SSW/(N−k)) is one deterministic IEEE double on both
    engines. Zero-variance (SSW ≤ 0) guards to NULL. The only data-sized
    stage is the initial partial-agg count — everything after runs on
    ≤150 rows regardless of scale."""
    li = table_scan(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        (F.col("l_quantity").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("q"),
    )
    hist = li.groupBy("flag", "q").agg(F.count(F.lit(1)).alias("cnt"))
    wr = Window.partitionBy("flag").orderBy("q").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wn = Window.partitionBy("flag")
    med = (
        hist.withColumn("cum", F.sum("cnt").over(wr))
        .withColumn("k", F.expr("(SUM(cnt) OVER (PARTITION BY flag) + 1) div 2"))
        .filter(
            (F.col("cum") - F.col("cnt") < F.col("k"))
            & (F.col("k") <= F.col("cum"))
        )
        .select("flag", F.col("q").alias("med"))
    )
    z = hist.join(F.broadcast(med), "flag").select(
        "flag", "cnt", F.abs(F.col("q") - F.col("med")).alias("z")
    )
    aggs = [
        F.sum("cnt").cast("double").alias("n"),
        F.sum(F.col("cnt") * F.col("z")).cast("double").alias("s"),
        # z² × cnt can pass int64 at extreme scale: widen to DECIMAL(38)
        F.sum(F.col("cnt").cast("decimal(38,0)") * F.col("z") * F.col("z"))
        .cast("double")
        .alias("sxx"),
    ]
    for g, tag in (("A", "a"), ("N", "n2"), ("R", "r")):
        aggs.append(
            F.sum(F.when(F.col("flag") == g, F.col("cnt")).otherwise(0))
            .cast("double")
            .alias(f"n_{tag}")
        )
        aggs.append(
            F.sum(
                F.when(F.col("flag") == g, F.col("cnt") * F.col("z")).otherwise(0)
            )
            .cast("double")
            .alias(f"s_{tag}")
        )
    piv = z.agg(*aggs)
    meds = med.groupBy().agg(
        F.max(F.when(F.col("flag") == "A", F.col("med"))).alias("med_a"),
        F.max(F.when(F.col("flag") == "N", F.col("med"))).alias("med_n"),
        F.max(F.when(F.col("flag") == "R", F.col("med"))).alias("med_r"),
    )
    between = None
    kcnt = None
    for tag in ("a", "n2", "r"):
        term = F.when(
            F.col(f"n_{tag}") > 0,
            (F.col(f"s_{tag}") * F.col(f"s_{tag}")) / F.col(f"n_{tag}"),
        ).otherwise(F.lit(0.0))
        ind = F.when(F.col(f"n_{tag}") > 0, F.lit(1.0)).otherwise(F.lit(0.0))
        between = term if between is None else between + term
        kcnt = ind if kcnt is None else kcnt + ind
    ssw = F.col("sxx") - between
    ssb = between - (F.col("s") * F.col("s")) / F.col("n")
    f_stat = F.when(ssw <= 0, F.lit(None).cast("double")).otherwise(
        ssb / (kcnt - 1) / (ssw / (F.col("n") - kcnt))
    )
    return piv.crossJoin(F.broadcast(meds)).select(
        F.col("n").cast("long").alias("n_rows"),
        F.col("med_a").cast("long").alias("med_a_cents"),
        F.col("med_n").cast("long").alias("med_n_cents"),
        F.col("med_r").cast("long").alias("med_r_cents"),
        f_stat.alias("f_brown_forsythe"),
    )


@register(
    "lineitem_twap_by_brand",
    """
    WITH li AS (
      SELECT p.p_brand AS brand, CAST(l.l_shipdate AS DATE) AS day,
             CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(l.l_quantity AS BIGINT) AS qty
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    daily AS (
      SELECT brand, day,
             CAST(SUM(cents) AS BIGINT) AS cents,
             CAST(SUM(qty) AS BIGINT) AS qty
      FROM li GROUP BY brand, day
    ),
    priced AS (
      SELECT brand, day, cents // qty AS price_cpu,
             COALESCE(date_diff('day', day,
               LEAD(day) OVER (PARTITION BY brand ORDER BY day)), 1)
               AS days_held
      FROM daily
    )
    SELECT brand,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(price_cpu * days_held) // SUM(days_held) AS BIGINT)
             AS twap_cpu,
           CAST(SUM(price_cpu) // COUNT(*) AS BIGINT) AS avg_cpu
    FROM priced GROUP BY brand
    """,
)
def q_lineitem_twap_by_brand(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Time-weighted average price (TWAP) per brand — the market-data
    average that is robust to IRREGULAR observation gaps, complement to
    lineitem_daily_vwap (volume-weighted): each observed day's unit price
    holds until the NEXT observed day, so a price that persisted 5 days
    unobserved weighs 5×, while the naive per-day mean (avg_cpu, emitted
    for contrast) over-weights busy stretches. Exact integer contract:
    unit price = floor cents/qty per (brand, day); weights = calendar-day
    gaps from LEAD (last day holds 1); TWAP = floor of the weighted sum
    over the weight sum. Scale shape: one fact join (part dim broadcast),
    one partial-agg groupBy to the bounded (brand × day) grid, a
    brand-partitioned LEAD window — never a global window — and a final
    25-row brand aggregate."""
    li = table_scan(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_shipdate").cast("date").alias("day"),
        F.round(F.col("l_extendedprice") * 100)
        .cast("long")
        .alias("cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    p = table_scan(spark, sf_dir, "part").select("p_partkey", "p_brand")
    daily = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"), "day")
        .agg(
            F.sum("cents").cast("long").alias("cents"),
            F.sum("qty").cast("long").alias("qty"),
        )
    )
    w = Window.partitionBy("brand").orderBy("day")
    priced = daily.select(
        "brand",
        F.expr("cents div qty").alias("price_cpu"),
        F.coalesce(
            F.datediff(F.lead("day").over(w), F.col("day")), F.lit(1)
        ).alias("days_held"),
    )
    return priced.groupBy("brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.expr("sum(price_cpu * days_held) div sum(days_held)")
        .cast("long")
        .alias("twap_cpu"),
        F.expr("sum(price_cpu) div count(1)").cast("long").alias("avg_cpu"),
    )


@register(
    "lineitem_price_index_laspeyres_paasche",
    """
    WITH li AS (
      SELECT l_partkey AS pk, year(l_shipdate) AS y,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem
    ),
    yr AS (
      SELECT CAST(MIN(y) AS BIGINT) AS y0, CAST(MAX(y) AS BIGINT) AS y1
      FROM li
    ),
    py AS (
      SELECT li.pk, li.y,
             CAST(SUM(li.cents) // SUM(li.qty) AS BIGINT) AS p,
             CAST(SUM(li.qty) AS BIGINT) AS q
      FROM li JOIN yr ON li.y IN (yr.y0, yr.y1)
      GROUP BY li.pk, li.y
    ),
    m AS (
      SELECT b.pk, b.p AS p0, b.q AS q0, c.p AS p1, c.q AS q1
      FROM py b JOIN py c ON b.pk = c.pk
      CROSS JOIN yr
      WHERE b.y = yr.y0 AND c.y = yr.y1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_matched_parts,
           CAST((1000000 * SUM(p1 * q0)) // SUM(p0 * q0) AS BIGINT)
             AS laspeyres_ppm,
           CAST((1000000 * SUM(p1 * q1)) // SUM(p0 * q1) AS BIGINT)
             AS paasche_ppm,
           CAST((1000000 * SUM(p1 * q0)) // SUM(p0 * q0)
                - (1000000 * SUM(p1 * q1)) // SUM(p0 * q1) AS BIGINT)
             AS substitution_gap_ppm
    FROM m
    """,
)
def q_lineitem_price_index_laspeyres_paasche(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Laspeyres and Paasche price indices — the two canonical inflation
    measures every pricing/economics dashboard reports: both compare
    base-year (first shipping year in the data) to current-year (last
    year) unit prices over the MATCHED part basket, Laspeyres weighting
    by base-year quantities (what the old basket costs now) and Paasche
    by current-year quantities; their gap is the substitution bias that
    motivates Fisher's ideal index. Exact integer contract: unit price =
    floor cents/qty per (part, year); index = floor-ppm of the weighted
    sums — no floats. Scale shape: one partial-agg groupBy to the
    (part, 2-year) grid, a self-join on partkey (co-partitioned equi
    join), a single-row output; the year bounds ride a 1-row broadcast.
    Rebasing to another period is the same plan with different bounds."""
    li = table_scan(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("pk"),
        F.year("l_shipdate").alias("y"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    yr = li.agg(
        F.min("y").cast("long").alias("y0"),
        F.max("y").cast("long").alias("y1"),
    )
    py = (
        li.crossJoin(F.broadcast(yr))
        .filter((F.col("y") == F.col("y0")) | (F.col("y") == F.col("y1")))
        .groupBy("pk", "y", "y0")
        .agg(
            F.expr("sum(cents) div sum(qty)").cast("long").alias("p"),
            F.sum("qty").cast("long").alias("q"),
        )
    )
    base = py.filter(F.col("y") == F.col("y0")).select(
        "pk", F.col("p").alias("p0"), F.col("q").alias("q0")
    )
    cur = py.filter(F.col("y") != F.col("y0")).select(
        "pk", F.col("p").alias("p1"), F.col("q").alias("q1")
    )
    m = base.join(cur, "pk")
    return m.agg(
        F.count(F.lit(1)).cast("long").alias("n_matched_parts"),
        F.expr("(1000000 * sum(p1 * q0)) div sum(p0 * q0)")
        .cast("long")
        .alias("laspeyres_ppm"),
        F.expr("(1000000 * sum(p1 * q1)) div sum(p0 * q1)")
        .cast("long")
        .alias("paasche_ppm"),
        F.expr(
            "(1000000 * sum(p1 * q0)) div sum(p0 * q0)"
            " - (1000000 * sum(p1 * q1)) div sum(p0 * q1)"
        )
        .cast("long")
        .alias("substitution_gap_ppm"),
    )


@register(
    "lineitem_cross_price_elasticity",
    """
    WITH li AS (
      SELECT p.p_brand AS brand, year(l.l_shipdate) AS y,
             CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(l.l_quantity AS BIGINT) AS qty
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    yr AS (SELECT CAST(MIN(y) AS BIGINT) AS y0, CAST(MAX(y) AS BIGINT)
             AS y1 FROM li),
    by_ AS (
      SELECT li.brand, li.y,
             CAST(SUM(li.cents) // SUM(li.qty) AS BIGINT) AS p,
             CAST(SUM(li.qty) AS BIGINT) AS q
      FROM li JOIN yr ON li.y IN (yr.y0, yr.y1)
      GROUP BY li.brand, li.y
    ),
    w AS (
      SELECT b0.brand, b0.p AS p0, b0.q AS q0, b1.p AS p1, b1.q AS q1
      FROM by_ b0 JOIN by_ b1 ON b0.brand = b1.brand
      CROSS JOIN yr WHERE b0.y = yr.y0 AND b1.y = yr.y1
    )
    SELECT a.brand AS qty_brand, b.brand AS price_brand,
           CAST(a.q1 - a.q0 AS BIGINT) AS dq_a,
           CAST(b.p1 - b.p0 AS BIGINT) AS dp_b,
           CAST(CASE WHEN b.p1 <> b.p0 AND a.q0 > 0
                THEN ((a.q1 - a.q0) * b.p0 * 1000000)
                     // (a.q0 * (b.p1 - b.p0))
                END AS BIGINT) AS cross_elasticity_ppm
    FROM w a JOIN w b ON a.brand <> b.brand
    """,
)
def q_lineitem_cross_price_elasticity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-price elasticity matrix — the substitution economics the
    own-price arc elasticity can't see: for each ordered brand pair
    (A, B), %ΔQ_A / %ΔP_B between the first and last shipping year.
    Positive = substitutes (B got pricier, A sold more), negative =
    complements. Exact rationals throughout: unit prices are floored
    cents (the price-index convention), the elasticity is one signed
    integer cross-multiplication ppm with zero-guards on ΔP and Q₀.
    Scale shape: the brand×year aggregate is the only data-sized stage;
    the pair matrix is the 25-brand dimension squared (≤600 rows),
    self-joined dim-side."""
    li = table_scan(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.year("l_shipdate").alias("y"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    p = table_scan(spark, sf_dir, "part").select("p_partkey", "p_brand")
    yr = li.agg(
        F.min("y").cast("long").alias("y0"),
        F.max("y").cast("long").alias("y1"),
    )
    by = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .crossJoin(F.broadcast(yr))
        .filter((F.col("y") == F.col("y0")) | (F.col("y") == F.col("y1")))
        .groupBy(F.col("p_brand").alias("brand"), "y", "y0")
        .agg(
            F.expr("sum(cents) div sum(qty)").cast("long").alias("p"),
            F.sum("qty").cast("long").alias("q"),
        )
    )
    b0 = by.filter(F.col("y") == F.col("y0")).select(
        "brand", F.col("p").alias("p0"), F.col("q").alias("q0")
    )
    b1 = by.filter(F.col("y") != F.col("y0")).select(
        "brand", F.col("p").alias("p1"), F.col("q").alias("q1")
    )
    w = b0.join(b1, "brand").transform(cached)  # ≤25 rows, self-joined below
    a = w.selectExpr(
        "brand AS qty_brand", "q0 AS aq0", "q1 AS aq1"
    )
    b = w.selectExpr(
        "brand AS price_brand", "p0 AS bp0", "p1 AS bp1"
    )
    return (
        a.join(F.broadcast(b), F.col("qty_brand") != F.col("price_brand"))
        .select(
            "qty_brand",
            "price_brand",
            (F.col("aq1") - F.col("aq0")).cast("long").alias("dq_a"),
            (F.col("bp1") - F.col("bp0")).cast("long").alias("dp_b"),
            F.when(
                (F.col("bp1") != F.col("bp0")) & (F.col("aq0") > 0),
                F.expr(
                    "((aq1 - aq0) * bp0 * 1000000)"
                    " div (aq0 * (bp1 - bp0))"
                ),
            )
            .cast("long")
            .alias("cross_elasticity_ppm"),
        )
    )
