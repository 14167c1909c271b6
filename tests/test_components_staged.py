"""Round-11 connected-components rework (VERDICT r10 #1 + #5).

Covers: (a) the bucket-staged symmetrized edge list is scanned
``Bucketed: true`` with no Exchange above the probe inside the CC loop
(the pagerank plan-assertion pattern, tests/test_pagerank.py), (b) the
staging manifest lets a FRESH catalog (≈ fresh process) re-register the
on-disk bucketed files via a metadata-only DDL instead of recomputing and
rewriting them, and (c) the reworked operator's semantics: incident-only
iteration + appended singletons, induced-subgraph edge restriction, and
the fused min/max convergence check all preserve the exact (id, component)
output of the pre-rework implementation.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import functions as F

from breweries_data_engineering_case_spark.operators.components import (
    connected_components,
)
from breweries_data_engineering_case_spark.plans import registry
from breweries_data_engineering_case_spark.sources.writers import (
    stage_bucketed_table,
)


def _components_of(spark, pairs, vertex_ids, **kwargs):
    verts = spark.createDataFrame(
        [(int(v),) for v in vertex_ids], "node bigint"
    )
    edges = spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "id_a bigint, id_b bigint"
    )
    out = connected_components(
        verts, edges, id_col="node", src_col="id_a", dst_col="id_b", **kwargs
    )
    return {(r.node, r.component) for r in out.collect()}


def test_chain_star_and_singletons(spark):
    # chain 1-2-3-4, star 10-{11,12,13}, isolated 99 → min labels
    got = _components_of(
        spark,
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13)],
        [1, 2, 3, 4, 10, 11, 12, 13, 99],
    )
    assert got == {
        (1, 1),
        (2, 1),
        (3, 1),
        (4, 1),
        (10, 10),
        (11, 10),
        (12, 10),
        (13, 10),
        (99, 99),
    }


def test_empty_edges_all_singletons(spark):
    got = _components_of(spark, [], [5, 6, 7])
    assert got == {(5, 5), (6, 6), (7, 7)}


def test_edges_outside_vertices_ignored(spark):
    # (2,50): 50 is not a vertex → the edge is dropped entirely (induced
    # subgraph), matching the pre-round-11 join semantics where an unknown
    # endpoint contributed no label and received none
    got = _components_of(spark, [(1, 2), (2, 50)], [1, 2, 3])
    assert got == {(1, 1), (2, 1), (3, 3)}


def test_long_chain_converges(spark):
    # a 24-node path exercises multiple gather+jump rounds
    n = 24
    got = _components_of(spark, [(i, i + 1) for i in range(n - 1)], range(n))
    assert got == {(i, 0) for i in range(n)}


def test_cascade_cc_probe_scans_bucketed_no_reexchange(spark, sf_dir):
    """VERDICT r10 #1 'done' criterion: inside the dedup_cascade_funnel CC
    loop, the gather join's probe side must scan the staged bucketed sym
    table (Bucketed: true) with NO shuffle Exchange between the scan and
    the join — the exchange over the dominant table is paid once at stage
    time, never per iteration. The per-round plans are captured via the
    operator's PLAN_CAPTURE hook (the loop's localCheckpoints truncate them
    out of the returned frame's lineage)."""
    from breweries_data_engineering_case_spark.operators import components

    components.PLAN_CAPTURE = captured = []
    # the cascade's bench-scale graph takes the small-graph fast path
    # (round 12); force the distributed loop so its plan stays asserted —
    # this is the path every over-threshold (100 TB-regime) graph takes
    components.LOCAL_THRESHOLD_OVERRIDE = 0
    try:
        df = registry.queries()["dedup_cascade_funnel"](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
    finally:
        components.PLAN_CAPTURE = None
        components.LOCAL_THRESHOLD_OVERRIDE = None
    assert captured, "CC loop ran no rounds"
    for plan in captured:
        # the captured tree must be the AQE-FINAL plan of the round that
        # executed, not a pre-adaptive compile (ADVICE r11)
        assert "isFinalPlan=true" in plan, "captured plan is not AQE-final"
        lines = plan.splitlines()
        scan_idx = [
            i
            for i, ln in enumerate(lines)
            if "Scan parquet" in ln and "bdec_cc_sym_" in ln
        ]
        assert scan_idx, "gather round did not scan the staged sym table"
        n_probe = 0
        for i in scan_idx:
            assert "Bucketed: true" in lines[i], "sym scan not bucketed"
            # walk up from the scan to its nearest Join: a SHUFFLE exchange
            # between them would mean the bucketing was not honored and the
            # edge list re-shuffles every iteration
            j = i
            while j > 0 and "Join" not in lines[j]:
                assert "Exchange hashpartitioning" not in lines[j], (
                    "CC probe side re-exchanged:\n"
                    + "\n".join(lines[max(0, j - 3) : i + 1])
                )
                j -= 1
            if "ShuffledHashJoin" in lines[j]:
                n_probe += 1
        assert n_probe >= 1, "no exchange-free bucketed probe in the round"


def test_staging_manifest_fresh_catalog_reuses_files(spark, tmp_path):
    """VERDICT r10 #5: after a successful stage, dropping the catalog entry
    (what a fresh process starts with) and re-staging must re-REGISTER the
    existing files via DDL — same data, untouched parquet files, still a
    bucketed scan — not recompute/rewrite."""
    name = "bdec_test_stage_reuse"
    path = tmp_path / "staged"
    calls = []

    def builder():
        calls.append(1)
        return spark.range(500).select(
            F.col("id").alias("d"), (F.col("id") % 9).alias("payload")
        )

    t1 = stage_bucketed_table(
        spark, name, ["d"], num_buckets=8, path=str(path), builder=builder
    )
    assert t1.count() == 500 and calls == [1]
    files_before = sorted(
        (p.name, p.stat().st_mtime_ns) for p in path.rglob("*.parquet")
    )
    assert files_before, "stage wrote no bucketed files"
    manifest = json.loads((path / "_bdec_manifest.json").read_text())
    assert manifest["bucket_cols"] == ["d"] and manifest["num_buckets"] == 8

    # fresh-process simulation: the in-memory catalog forgets the table
    spark.sql(f"DROP TABLE `{name}`")
    t2 = stage_bucketed_table(
        spark, name, ["d"], num_buckets=8, path=str(path), builder=builder
    )
    # the builder runs on every resolution (its analyzed-plan fingerprint
    # is the CODE half of the manifest key — an r15 attempt to memoize it
    # away per (name,path,spec) was rejected, see stage_bucketed_table),
    # so reuse is proven by the data files being untouched, not by the
    # builder call count
    assert calls == [1, 1]
    files_after = sorted(
        (p.name, p.stat().st_mtime_ns) for p in path.rglob("*.parquet")
    )
    assert files_after == files_before, "re-stage rewrote the data files"
    assert t2.count() == 500

    # and the re-registered table still joins off a bucketed scan
    other = spark.range(100).select(F.col("id").alias("d"))
    j = t2.join(other.hint("shuffle_hash"), "d")
    j.write.format("noop").mode("overwrite").save()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan
    spark.sql(f"DROP TABLE `{name}`")


def test_staging_manifest_spec_mismatch_restages(spark, tmp_path):
    """A manifest whose bucket spec no longer matches the code's request
    (layout changed between versions) must invalidate the cache and
    restage rather than serve a stale layout."""
    name = "bdec_test_stage_mismatch"
    path = tmp_path / "staged2"
    calls = []

    def builder():
        calls.append(1)
        return spark.range(100).select(F.col("id").alias("d"))

    stage_bucketed_table(
        spark, name, ["d"], num_buckets=8, path=str(path), builder=builder
    )
    spark.sql(f"DROP TABLE `{name}`")
    stage_bucketed_table(
        spark, name, ["d"], num_buckets=16, path=str(path), builder=builder
    )
    assert calls == [1, 1], "spec mismatch must trigger a restage"
    m = json.loads((path / "_bdec_manifest.json").read_text())
    assert m["num_buckets"] == 16
    spark.sql(f"DROP TABLE `{name}`")


def test_staging_crash_windows_restage_never_torn(spark, tmp_path):
    """Crash-safety of the generation publish protocol: files land via an
    atomic tmp-dir rename, and the commit evidence is Spark's _SUCCESS
    marker INSIDE the immutable generation dir (the root manifest is
    observability only). So (a) a deleted manifest does not force a
    recompute — the committed generation is adopted as-is; (b) a TORN
    generation dir (marker missing — a partially-copied artifact) is never
    trusted: the next stage clears it and republishes; (c) a dead stager's
    leftover tmp dir never breaks a stage."""
    name = "bdec_test_stage_crash"
    path = tmp_path / "staged3"
    calls = []

    def builder():
        calls.append(1)
        return spark.range(64).select(F.col("id").alias("d"))

    stage_bucketed_table(
        spark, name, ["d"], num_buckets=4, path=str(path), builder=builder
    )
    gen_dirs = [d for d in path.glob("gen-*") if d.is_dir()]
    assert len(gen_dirs) == 1 and (gen_dirs[0] / "_SUCCESS").exists()
    files_v1 = sorted(
        (p.name, p.stat().st_mtime_ns) for p in path.rglob("*.parquet")
    )
    # crash window (a): manifest gone after a committed generation — the
    # generation's _SUCCESS marker is the commit evidence, so the next call
    # adopts the existing files instead of rewriting them
    spark.sql(f"DROP TABLE `{name}`")
    (path / "_bdec_manifest.json").unlink()
    t = stage_bucketed_table(
        spark, name, ["d"], num_buckets=4, path=str(path), builder=builder
    )
    assert t.count() == 64
    files_v2 = sorted(
        (p.name, p.stat().st_mtime_ns) for p in path.rglob("*.parquet")
    )
    assert files_v2 == files_v1, "committed generation rewritten on adopt"
    # crash window (b): a torn generation (marker missing) must restage —
    # a partially-visible table is never served
    spark.sql(f"DROP TABLE `{name}`")
    (gen_dirs[0] / "_SUCCESS").unlink()
    t = stage_bucketed_table(
        spark, name, ["d"], num_buckets=4, path=str(path), builder=builder
    )
    assert (gen_dirs[0] / "_SUCCESS").exists(), "torn generation not republished"
    assert t.count() == 64
    # crash window (c): a dead stager's tmp dir must not break a stage
    spark.sql(f"DROP TABLE `{name}`")
    fake_tmp = path / f"{gen_dirs[0].name}.tmp-99999"
    fake_tmp.mkdir()
    (fake_tmp / "junk").write_text("torn")
    t = stage_bucketed_table(
        spark, name, ["d"], num_buckets=4, path=str(path), builder=builder
    )
    assert t.count() == 64
    assert len(calls) == 4  # the builder thunk runs per call by design
    spark.sql(f"DROP TABLE `{name}`")


def test_pagerank_staging_survives_catalog_reset(spark, sf_dir):
    """The pagerank staged tables go through the same manifest helper: after
    a catalog reset the query must come back green without rewriting the
    staged files (the r10 NOTES caveat — fresh-process restage — is gone)."""
    q = registry.queries()["graph_pagerank_salted"]
    base = {(r.node, r.pr) for r in q(spark, sf_dir).collect()}
    # find the staged edge table the run registered and its files on disk
    tables = [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith("bdec_pr_salted_edges_")
    ]
    assert tables
    loc_row = [
        r
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {tables[0]}").collect()
        if r.col_name == "Location"
    ]
    path = Path(loc_row[0].data_type.replace("file:", ""))
    before = sorted((p.name, p.stat().st_mtime_ns) for p in path.rglob("*.parquet"))
    for t in spark.catalog.listTables():
        if t.name.startswith(("bdec_pr_salted_edges_", "bdec_pr_nodes_")):
            spark.sql(f"DROP TABLE `{t.name}`")
    again = {(r.node, r.pr) for r in q(spark, sf_dir).collect()}
    assert again == base
    after = sorted((p.name, p.stat().st_mtime_ns) for p in path.rglob("*.parquet"))
    assert after == before, "fresh catalog rewrote the staged pagerank files"


def test_plan_fingerprint_memo_keyed_on_semantics_and_schema(spark):
    """r15 _plan_fingerprint memo (VERDICT r14 #4): rebuilding the SAME
    frame hits the (semanticHash, schema) memo and returns the identical
    fingerprint without re-stringifying; a literal change (different
    canonicalized plan) and an output RENAME (same canonicalized plan,
    different schema — the named half's reason to exist) both miss the
    memo and mint DIFFERENT fingerprints. This pins exactly the two blind
    spots the memo key must cover for the r13 invalidation contract."""
    from breweries_data_engineering_case_spark.sources.writers import (
        _plan_fingerprint,
    )

    def frame(mod: int, out: str):
        return spark.range(100).select(
            F.col("id").alias("d"), (F.col("id") % mod).alias(out)
        )

    fp1 = _plan_fingerprint(frame(7, "payload"))
    memo = spark.__dict__["_bdec_plan_fp_memo"]
    n0 = len(memo)
    assert _plan_fingerprint(frame(7, "payload")) == fp1
    assert len(memo) == n0, "identical rebuild must hit the memo"
    fp_lit = _plan_fingerprint(frame(5, "payload"))
    assert fp_lit != fp1, "a literal change must mint a new fingerprint"
    fp_ren = _plan_fingerprint(frame(7, "renamed"))
    assert fp_ren != fp1, "an output rename must mint a new fingerprint"
    assert len(memo) == n0 + 2


def test_staged_row_count_matches_scan(spark, tmp_path):
    """r15 footer-metadata row count (the CC fast-path probe): exact for a
    staged frame, None for a plain frame (which must fall back to the
    limit-probe job)."""
    from breweries_data_engineering_case_spark.operators.components import (
        _staged_row_count,
    )

    name = "bdec_test_stage_rowcount"
    path = tmp_path / "staged_rc"
    staged = stage_bucketed_table(
        spark,
        name,
        ["d"],
        num_buckets=4,
        path=str(path),
        builder=lambda: spark.range(137).select(F.col("id").alias("d")),
    )
    assert _staged_row_count(staged) == 137 == staged.count()
    assert _staged_row_count(spark.range(5)) is None
    spark.sql(f"DROP TABLE `{name}`")


def test_staged_generation_writes_one_file_per_bucket(spark, tmp_path):
    """r15 layout v2 (guide §6): the staged bucketed write repartitions by
    the bucket columns into num_buckets tasks, so a committed generation
    holds at most ONE parquet file per bucket — a many-task builder must
    not fan out into tasks×buckets tiny files (the sf0.1 pagerank edge
    table reached 2048 files for 32 buckets; every scan task then paid ~64
    synchronized Hadoop-Configuration clones per stage, a measured lock
    convoy). Layout, not content: rows and bucketing semantics unchanged."""
    name = "bdec_test_stage_layout"
    path = tmp_path / "staged_layout"
    staged = stage_bucketed_table(
        spark,
        name,
        ["d"],
        num_buckets=8,
        path=str(path),
        builder=lambda: spark.range(10_000)
        .repartition(64)  # a many-task builder, the pathological input
        .select(F.col("id").alias("d")),
    )
    gens = [d for d in path.glob("gen-*") if d.is_dir()]
    assert len(gens) == 1
    files = [p for p in gens[0].glob("*.parquet")]
    assert 0 < len(files) <= 8, f"{len(files)} files for 8 buckets"
    assert staged.count() == 10_000
    spark.sql(f"DROP TABLE `{name}`")
