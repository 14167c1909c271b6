"""Independent ground-truth twins for the round-5 late-batch operators —
each check recomputes the answer with a DIFFERENT algorithm (driver-side
Python/numpy over the tiny sf0.001 corpus), so a bug in the distributed
path cannot hide in both implementations:

- bitmap exact distinct vs a plain count_distinct aggregate;
- Markov transitions vs a pure-Python per-user sequence walk;
- integer Lloyd step vs a numpy argmin/bincount replay;
- portable SemDeDup vs an exact all-pairs keep-min replay, plus a
  planted-duplicate recovery check;
- skip-gram pairs vs a Python token-window count;
- fixed-point pandas z-score vs the expression-only grouped_zscore.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
from pyspark.sql import functions as F

from breweries_data_engineering_case_spark.plans import registry
from breweries_data_engineering_case_spark.sources.readers import table_scan


def test_bitmap_distinct_equals_count_distinct(spark, sf_dir):
    got = {
        (r.event_type, r.distinct_users)
        for r in registry.queries()["events_bitmap_distinct"](spark, sf_dir).collect()
    }
    want = {
        (r.event_type, r.d)
        for r in table_scan(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("d"))
        .collect()
    }
    assert got == want


def test_markov_transitions_match_python_walk(spark, sf_dir):
    rows = (
        table_scan(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    seqs = defaultdict(list)
    for r in rows:
        seqs[r.user_id].append((r.ts, r.event_id, r.event_type))
    counts: Counter = Counter()
    for s in seqs.values():
        s.sort()
        for (_, _, a), (_, _, b) in zip(s, s[1:]):
            counts[(a, b)] += 1
    totals: Counter = Counter()
    for (a, _), n in counts.items():
        totals[a] += n
    want = {
        (a, b, n, n * 1000 // totals[a]) for (a, b), n in counts.items()
    }
    got = {
        (r.from_type, r.to_type, r.n_transitions, r.per_mille)
        for r in registry.queries()["events_markov_transitions"](
            spark, sf_dir
        ).collect()
    }
    assert got == want


def test_kmeans_lloyd_step_matches_numpy(spark, sf_dir):
    rows = table_scan(spark, sf_dir, "embeddings").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    Q = np.round(X * 1_000_000).astype(np.int64)
    C = Q[np.argsort(ids)][:0]  # placeholder, rebuilt below
    order = np.argsort(ids)
    ids, Q = ids[order], Q[order]
    C = Q[ids < 8]
    # exact integer squared distances; argmin with centroid-id tiebreak is
    # numpy's first-minimum (centroids are id-ordered)
    d = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    assign = d.argmin(axis=1)
    want = {}
    for c in range(C.shape[0]):
        members = Q[assign == c]
        if len(members):
            s = members.sum(axis=0)
            for i in range(Q.shape[1]):
                want[(c, i)] = (int(s[i]), len(members))
    got = {
        (r.cluster, r.i): (r.comp_sum, r.n_members)
        for r in registry.queries()["kmeans_lloyd_step_int"](spark, sf_dir).collect()
    }
    assert got == want


def test_semantic_dedup_portable_keep_min_exact_replay(spark, sf_dir):
    out = registry.queries()["embedding_semantic_dedup_portable"](
        spark, sf_dir
    ).collect()
    cluster = {r.id: r.cluster for r in out}
    keep = {r.id: r.keep for r in out}
    rows = table_scan(spark, sf_dir, "embeddings").collect()
    V = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    for i in V:
        dup = any(
            cluster[j] == cluster[i] and j < i and cos(V[i], V[j]) >= 0.4
            for j in V
        )
        assert keep[i] == (not dup), f"vec {i}: keep={keep[i]} but exact dup={dup}"


def test_semantic_dedup_portable_drops_planted_duplicate(spark, sf_dir):
    from breweries_data_engineering_case_spark.operators.similarity import (
        semantic_dedup_portable,
    )

    emb = table_scan(spark, sf_dir, "embeddings")
    donor = emb.filter(F.col("vec_id") == 3).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding", "label"
    )
    planted = emb.unionByName(donor)
    out = semantic_dedup_portable(planted, threshold=0.4, cluster_bits=4)
    flags = {r.id: r.keep for r in out.collect()}
    assert flags[1_000_003] is False  # identical vector, lower-id donor wins
    assert flags[3] is True or any(
        v for k, v in flags.items() if k < 3
    )  # donor only dropped if it has its own lower-id near-dup


def test_skipgram_pairs_match_python_window_count(spark, sf_dir):
    texts = [
        r.text
        for r in table_scan(spark, sf_dir, "documents").select("text").collect()
    ]
    counts: Counter = Counter()
    for t in texts:
        w = t.split(" ")
        for i, center in enumerate(w):
            for k in (1, 2):
                if i + k < len(w) and center and w[i + k]:
                    counts[(center, w[i + k])] += 1
    want = sorted(
        ((n, a, b) for (a, b), n in counts.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:50]
    got = [
        (r.n_pairs, r.center, r.context)
        for r in registry.queries()["vocab_skipgram_pairs"](spark, sf_dir).collect()
    ]
    assert sorted(got, key=lambda t: (-t[0], t[1], t[2])) == want


def test_pandas_zscore_agrees_with_expression_twin(spark, sf_dir):
    """The fixed-point pandas z and the decimal-expression z quantize at
    different scales (1e2 vs 1e4) so they are not bitwise equal — but they
    normalize the same data, so they must agree to ~1e-4 everywhere."""
    a = {
        r.event_id: r.zscore
        for r in registry.queries()["grouped_zscore_pandas"](spark, sf_dir).collect()
    }
    b = {
        r.event_id: r.zscore
        for r in registry.queries()["grouped_zscore"](spark, sf_dir).collect()
    }
    assert a.keys() == b.keys()
    worst = max(abs(a[k] - b[k]) for k in a)
    assert worst < 1e-3, f"max |Δz| = {worst}"


def test_pandas_zscore_group_moments(spark, sf_dir):
    df = registry.queries()["grouped_zscore_pandas"](spark, sf_dir)
    stats = (
        df.groupBy("event_type")
        .agg(F.avg("zscore").alias("m"), F.stddev_pop("zscore").alias("s"))
        .collect()
    )
    for r in stats:
        assert abs(r.m) < 1e-9
        assert math.isclose(r.s, 1.0, rel_tol=1e-6)


def test_connected_components_match_union_find(spark, sf_dir):
    """Registry components (iterative label propagation) vs a driver-side
    union-find over the same sampled edge list — different algorithm, same
    partition."""
    from breweries_data_engineering_case_spark.functions.hashing import (
        portable_hash64,
    )

    li = (
        table_scan(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") < 200)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
    )
    a, b = li.alias("a"), li.alias("b")
    e0 = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .distinct()
    )
    key = F.concat(F.col("u").cast("string"), F.lit(":"), F.col("v").cast("string"))
    edges = [
        (r.u, r.v)
        for r in e0.filter(F.pmod(portable_hash64(key), F.lit(10)) == 0).collect()
    ]
    nodes = [r.node for r in li.select(F.col("p").alias("node")).distinct().collect()]
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    want = {n: find(n) for n in nodes}
    got = {
        r.node: r.component
        for r in registry.queries()["graph_connected_components"](
            spark, sf_dir
        ).collect()
    }
    assert got == want


def test_cogroup_attribution_matches_relational_twin(spark, sf_dir):
    e = (
        table_scan(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            "user_id",
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        )
    )
    rows = e.collect()
    clicks = defaultdict(list)
    purch = defaultdict(list)
    for r in rows:
        (clicks if r.event_type == "click" else purch)[r.user_id].append(r.us)
    want = {}
    for uid in set(clicks) | set(purch):
        fp = min(purch[uid]) if purch[uid] else None
        want[uid] = (
            len(clicks[uid]),
            len(purch[uid]),
            sum(1 for t in clicks[uid] if fp is not None and t < fp),
        )
    got = {
        r.user_id: (r.n_clicks, r.n_purchases, r.clicks_before_first_purchase)
        for r in registry.queries()["events_cogroup_purchase_attribution"](
            spark, sf_dir
        ).collect()
    }
    assert got == want


def test_aqe_converts_q17_agg_join_to_broadcast(spark, sf_dir):
    """The per-part avg-quantity aggregate joined back to lineitem in q17 is
    tiny at any SF — AQE must convert that shuffle join to broadcast at
    runtime (the runtime re-plan the 100-TB path depends on when static
    stats are missing)."""
    df = registry.queries()["tpch_q17_small_quantity_revenue"](spark, sf_dir)
    df.collect()  # AQE final plan exists only after execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_kmeans_two_iterations_match_numpy(spark, sf_dir):
    """Two-iteration Lloyd vs a numpy replay — including the centroid
    update, where division must TRUNCATE toward zero (Spark div / DuckDB
    //), not floor like numpy's //."""
    rows = table_scan(spark, sf_dir, "embeddings").collect()
    order = np.argsort([r.vec_id for r in rows])
    ids = np.array([r.vec_id for r in rows])[order]
    X = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])[order]
    Q = np.round(X * 1_000_000).astype(np.int64)

    def assign(C):
        d = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return d.argmin(axis=1)  # first-minimum = smallest centroid index

    def trunc_div(s, n):
        return s // n if s >= 0 else -((-s) // n)

    C0 = Q[ids < 8]
    a1 = assign(C0)
    live = sorted(set(a1.tolist()))
    C1 = np.stack(
        [
            np.array(
                [
                    trunc_div(int(Q[a1 == c][:, i].sum()), int((a1 == c).sum()))
                    for i in range(Q.shape[1])
                ],
                dtype=np.int64,
            )
            for c in live
        ]
    )
    a2 = assign(C1)
    want = {}
    for pos, c in enumerate(live):
        members = Q[a2 == pos]
        for i in range(Q.shape[1]):
            if len(members):
                want[(c, i)] = (int(members[:, i].sum()), len(members))
    got = {
        (r.cluster, r.i): (r.comp_sum, r.n_members)
        for r in registry.queries()["kmeans_lloyd_converge_int"](
            spark, sf_dir
        ).collect()
    }
    assert got == want


def test_weighted_median_matches_python_scan(spark, sf_dir):
    o = {
        (r.o_orderkey): (r.o_orderpriority, r.o_totalprice)
        for r in table_scan(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .collect()
    }
    wt = Counter(
        r.l_orderkey
        for r in table_scan(spark, sf_dir, "lineitem").select("l_orderkey").collect()
        if r.l_orderkey in o
    )
    groups = defaultdict(list)
    for k, n in wt.items():
        prio, price = o[k]
        groups[prio].append((price, k, n))
    want = {}
    for prio, rows in groups.items():
        rows.sort()
        total = sum(n for _, _, n in rows)
        run = 0
        for price, k, n in rows:
            run += n
            if 2 * run >= total:
                want[prio] = (price, k)
                break
    got = {
        r.o_orderpriority: (r.weighted_median_price, r.median_orderkey)
        for r in registry.queries()["orders_weighted_median"](spark, sf_dir).collect()
    }
    assert got == want
