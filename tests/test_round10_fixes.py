"""Round-10 hardening regression tests (VERDICT r9 tasks)."""
from __future__ import annotations

import subprocess
import sys

import pytest

sys.path.insert(0, ".")
from tools.replica import select_window  # noqa: E402

NAMES = [f"q{i}" for i in range(10)]


class TestReplicaWindowSlicer:
    """VERDICT r9 #2: --window is a chunk size relative to --start."""

    def test_chunks_tile_the_registry_without_gaps_or_overlap(self):
        chunks = [select_window(NAMES, s, 3) for s in range(0, 10, 3)]
        assert [c for ch in chunks for c in ch] == NAMES

    def test_start_equals_window_runs_the_second_chunk(self):
        # the historical footgun: --start 65 --window 65 ran NOTHING
        assert select_window(NAMES, 5, 5) == NAMES[5:10]

    def test_no_window_resumes_to_end(self):
        assert select_window(NAMES, 7, None) == NAMES[7:]

    def test_window_past_end_clips(self):
        assert select_window(NAMES, 8, 100) == NAMES[8:]

    def test_invalid_args_raise(self):
        with pytest.raises(ValueError):
            select_window(NAMES, -1, 5)
        with pytest.raises(ValueError):
            select_window(NAMES, 0, 0)

    def test_empty_selection_exits_nonzero(self):
        # end-to-end: a start past the registry must fail loudly, not
        # masquerade as a green sweep
        proc = subprocess.run(
            [sys.executable, "tools/replica.py", "--start", "999999", "--window", "5"],
            capture_output=True,
            text=True,
            timeout=600,
            cwd=".",
        )
        assert proc.returncode == 2, proc.stdout + proc.stderr
        assert "selection is empty" in proc.stdout


class TestSpreadGuards:
    """ADVICE r9 (low): spread() must not probe .rdd on frames where the
    probe is unsafe — streaming frames (unsupported) and frames with
    shuffle-inducing ancestors (AQE materializes the stages eagerly)."""

    def test_streaming_frame_returned_unchanged(self, spark, tmp_path, sf_dir):
        from breweries_data_engineering_case_spark.sources.readers import spread

        src = tmp_path / "spread_stream"
        src.mkdir()
        spark.range(10).coalesce(1).write.parquet(str(src / "a.parquet"))
        stream = spark.readStream.schema("id long").parquet(str(src) + "/*.parquet")
        assert spread(stream) is stream

    def test_shuffled_frame_returned_unchanged(self, spark, sf_dir):
        from breweries_data_engineering_case_spark.sources.readers import (
            _has_shuffle_ancestor,
            spread,
        )
        from breweries_data_engineering_case_spark.sources.readers import table_scan

        scan = table_scan(spark, sf_dir, "orders").select("o_orderkey")
        assert not _has_shuffle_ancestor(scan)
        for shuffled in (
            scan.groupBy("o_orderkey").count(),
            scan.distinct(),
            scan.repartition(4),
            scan.join(scan.alias("b"), "o_orderkey"),
            scan.orderBy("o_orderkey"),
        ):
            assert _has_shuffle_ancestor(shuffled)
            assert spread(shuffled) is shuffled

    def test_scan_frame_still_spreads(self, spark, sf_dir):
        from breweries_data_engineering_case_spark.sources.readers import (
            spread,
            table_scan,
        )

        scan = table_scan(spark, sf_dir, "documents").select("doc_id", "text")
        out = spread(scan)
        cores = spark.sparkContext.defaultParallelism
        if scan.rdd.getNumPartitions() < cores:
            assert out is not scan
            assert out.rdd.getNumPartitions() == cores
        else:
            assert out is scan


def test_dsir_ln_floor_boundary_margin():
    """ADVICE r9 (low): the DSIR per-bucket score freezes floor(1e6*ln(ratio)),
    and ln is libm-dependent — a 1-ulp JVM-vs-DuckDB difference shifts the
    scaled value by ~1e-9, flipping the floor only if it lands that close to
    an integer. Replay every bucket's exact ratio at both tested SFs and
    assert the margin to the nearest boundary is >= 1e-7 (>=100x the flip
    window), so the recorded MATCHes are structural, not coin flips."""
    import math

    import duckdb

    import __spark_entry__  # noqa: F401  (path bootstrap)
    from breweries_data_engineering_case_spark.plans.q_corpus import _DSIR_ORACLE

    prefix, sep, _final = _DSIR_ORACLE.rpartition("SELECT doc_id, lang")
    assert sep, "oracle text changed — update this replay"
    ratio_sql = (
        prefix
        + """
        SELECT CAST(COALESCE(tgt.tc, 0) + 1 AS DOUBLE)
                 * CAST(rr + 1024 AS DOUBLE) AS num,
               CAST(raw.r + 1 AS DOUBLE)
                 * CAST(tsum + 1024 AS DOUBLE) AS den
        FROM raw LEFT JOIN tgt USING (b) CROSS JOIN rt CROSS JOIN tt
        """
    )
    # the oracle's last CTE (sc) references occ/lr; rpartition cut inside the
    # final SELECT, so the WITH clause is intact and unused CTEs are fine
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
        )
        rows = con.sql(ratio_sql).fetchall()
        assert rows, "no buckets — replay is vacuous"
        worst = 1.0
        for num, den in rows:
            x = 1e6 * math.log(num / den)
            frac = x - math.floor(x)
            worst = min(worst, frac, 1.0 - frac)
        assert worst >= 1e-7, f"{sf}: floor-boundary margin {worst}"
        con.close()


def test_streaming_lsh_descending_id_across_batches(spark, tmp_path):
    """ADVICE r9 (medium): when a SMALLER doc_id arrives in a later
    micro-batch than the canonical min already in state, the collision must
    still surface — the previously-canonical doc is emitted as a candidate
    of the new minimum. Before the fix the state min was silently updated
    and the (old-min, new-min) pair was lost in both directions."""
    from breweries_data_engineering_case_spark.operators.fuzzy_dedup import (
        minhash_band_exprs,
    )
    from breweries_data_engineering_case_spark.streaming.stateful import (
        lsh_band_dedup,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    uniq = "completely different words about spark structured streaming state"
    src = tmp_path / "stream_src_desc"
    src.mkdir()
    # batch 1 carries the LARGER id; batch 2 the smaller near-dup
    spark.createDataFrame(
        [(11, base), (3, uniq)], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(src / "b1.parquet"))
    spark.createDataFrame(
        [(1, base + " extra")], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(src / "b2.parquet"))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*.parquet")
    )
    out = lsh_band_dedup(minhash_band_exprs(stream, num_hashes=16, bands=4))
    q = (
        out.writeStream.format("memory")
        .queryName("t_lsh_desc")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(q.recentProgress) >= 2
    rows = spark.table("t_lsh_desc").collect()
    pairs = {(r.doc_id, r.canon_id) for r in rows}
    # the old canonical doc 11 must be demoted to a candidate of doc 1
    assert (11, 1) in pairs, pairs
    # the unique doc never appears
    assert all(3 not in p for p in pairs)


