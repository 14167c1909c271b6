"""Round-14 staged-state churn stress (VERDICT r13 #3): two real
processes, one holding LONG reads of a staged table, the other
alternating RESTAGES with changed plan fingerprints at the same key root
— the co-running-code-versions topology (e.g. an old-code job still
scanning while newly-deployed code republishes).

Asserts the full MVCC-generation contract under churn:

- zero reader aborts (no FileScanRDD FILE_NOT_EXIST — the round-12
  failure mode) and zero reader self-heal restages (its generation is
  never reaped while it keeps re-validating: the catalog fast path
  clears the supersession tombstone, so an actively-adopted generation's
  lease keeps restarting);
- the leased reap genuinely PROGRESSES under churn (superseded
  generations nobody validates age out — at least one live reap);
- the on-disk leak stays bounded: gen-dir count and tree bytes never
  exceed active readers + the current generation + the ~grace/period
  generations inside the lease window.

Workers run in separate processes with their own SparkSession/JVM
(tests/stage_worker.py). The default-suite run uses a small frame; the
SF1-scale record (pagerank-edge-sized rows, the NOTES.md disk
high-water-mark line) is the same test with SPARK_GRAFT_SF1_STRESS=1.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
WORKER = REPO / "tests" / "stage_worker.py"

SF1_MODE = os.environ.get("SPARK_GRAFT_SF1_STRESS") == "1"
# quick profile: ~100k-row gens, 6 s lease, 2.5 s churn period
# SF1 profile: 20M-row gens (pagerank-edge scale: two longs, bucketed),
# 30 s lease, 10 s churn period — run manually, records the high-water
NROWS = 20_000_000 if SF1_MODE else 100_000
GRACE = 30.0 if SF1_MODE else 6.0
PERIOD = 10.0 if SF1_MODE else 2.5
ITERS = 4 if SF1_MODE else 6


def _spawn(mode: str, *args: str, warehouse: str) -> subprocess.Popen:
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env["SPARK_WAREHOUSE_DIR"] = warehouse
    env["BDEC_TEST_GRACE"] = str(GRACE)
    if SF1_MODE:
        env["BDEC_TEST_WORKER_CORES"] = "8"
        env["BDEC_TEST_WORKER_MEM"] = "8g"
    return subprocess.Popen(
        [sys.executable, str(WORKER), mode, *[str(a) for a in args]],
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.STDOUT,
    )


def _result(path: Path, proc: subprocess.Popen, timeout: float = 600.0) -> dict:
    proc.wait(timeout=timeout)
    assert path.exists(), f"worker wrote no result ({path.name})"
    r = json.loads(path.read_text())
    assert r.get("ok"), f"worker failed:\n{r.get('traceback')}"
    return r


def test_restage_churn_vs_long_reader(tmp_path):
    root = tmp_path / "bdec_bucketed" / "churn_scope"
    ready = tmp_path / "reader_ready"
    stop = tmp_path / "reader_stop"
    out_r = tmp_path / "out_reader.json"
    out_w = tmp_path / "out_churn.json"
    reader = _spawn(
        "reader_validate_loop",
        "bdec_t14_reader",
        root,
        NROWS,
        0,  # reader's builder variant — constant for its whole life
        ready,
        stop,
        out_r,
        warehouse=str(tmp_path / "wh_r"),
    )
    churner = _spawn(
        "restager_churn",
        "bdec_t14_churn",
        root,
        NROWS,
        1,  # strictly-increasing variants 1..ITERS — each a new gen
        ITERS,
        PERIOD,
        ready,  # starts only once the reader is mid-loop
        out_w,
        warehouse=str(tmp_path / "wh_w"),
    )
    w = _result(out_w, churner)
    # a few more reader laps after the last churn, then stop it
    time.sleep(2)
    stop.touch()
    r = _result(out_r, reader)

    # 1. zero aborts, zero self-heal restages: the reader's generation
    #    survived every reap because its re-validations kept clearing the
    #    supersession tombstone
    assert r["errors"] == [], f"reader aborted under churn: {r['errors'][:3]}"
    assert r["n_reads"] >= 3
    assert r["writes"] == 1, (
        "reader restaged mid-run — its active generation was reaped "
        f"despite continuous re-validation (writes={r['writes']})"
    )

    # 2. the lease PROGRESSES: of the churner's minted generations, at
    #    least one unvalidated superseded gen aged out during the run
    #    (publishes run long enough past the grace window)
    final_gens = w["samples"][-1]["n_gens"]
    minted_total = w["minted"] + 1  # + the reader's generation
    if (ITERS - 1) * PERIOD > GRACE + PERIOD:  # enough runway to observe
        assert minted_total - final_gens >= 1, (
            f"no superseded generation was ever reaped: minted "
            f"{minted_total}, final {final_gens} ({w['samples']})"
        )

    # 3. bounded leak: reader's gen + current gen + at most ~grace/period
    #    superseded gens inside their lease window (+1 sampling slack)
    bound = 2 + math.ceil(GRACE / PERIOD) + 1
    hwm_gens = max(s["n_gens"] for s in w["samples"])
    assert hwm_gens <= bound, (
        f"gen-dir high water {hwm_gens} exceeds lease bound {bound}: "
        f"{[s['n_gens'] for s in w['samples']]}"
    )
    hwm_bytes = max(s["bytes"] for s in w["samples"])
    per_gen = w["samples"][-1]["bytes"] / max(final_gens, 1)
    assert hwm_bytes <= bound * per_gen * 1.5 + 1_000_000, (
        f"disk high water {hwm_bytes} not bounded by ~{bound} generations"
    )
    # the NOTES.md record line (visible with pytest -s)
    print(
        f"\n[round-14 stress] nrows/gen={NROWS} gens minted={minted_total} "
        f"final={final_gens} hwm_gens={hwm_gens} "
        f"hwm_bytes={hwm_bytes:,} (~{per_gen:,.0f}/gen) "
        f"reader reads={r['n_reads']} errors=0 writes=1"
    )

    # 4. end state: once every lease is expired, one reap sweep leaves
    #    only the LAST published generation (the /tmp steady state)
    import breweries_data_engineering_case_spark.sources.writers as writers

    # the churner's actual final active gen, from the manifest
    manifest = json.loads((root / "_bdec_manifest.json").read_text())
    active = manifest["generation"]
    old = time.time() - 86400
    for tomb in root.glob("gen-*.stale"):
        os.utime(tomb, (old, old))
    # two sweeps: the first stamps tombstones on never-sighted gens, the
    # second (backdated) removes them
    writers.reap_stale_stage_siblings(root, "gen-", active)
    for tomb in root.glob("gen-*.stale"):
        os.utime(tomb, (old, old))
    writers.reap_stale_stage_siblings(root, "gen-", active)
    remaining = [p.name for p in root.glob("gen-*") if p.is_dir()]
    assert remaining == [active], (
        f"steady state must keep exactly the active generation: {remaining}"
    )


def test_fast_path_validation_clears_supersession_tombstone(tmp_path, spark):
    """Unit twin of the stress's load-bearing fix: a catalog fast-path hit
    on a published generation unlinks the ``<gen>.stale`` tombstone a
    concurrent newer-code reaper stamped, restarting the lease — an
    actively-adopted generation is not stale."""
    import breweries_data_engineering_case_spark.sources.writers as writers
    from pyspark.sql import functions as F

    root = tmp_path / "scope"
    name = "bdec_t14_tomb_unit"
    spark.sql(f"DROP TABLE IF EXISTS `{name}`")

    def builder():
        return spark.range(100).select(
            F.col("id").alias("d"), (F.col("id") % 7).alias("payload")
        )

    t = writers.stage_bucketed_table(
        spark, name, ["d"], num_buckets=2, path=str(root), builder=builder
    )
    assert t.count() == 100
    gens = [p for p in root.glob("gen-*") if p.is_dir()]
    assert len(gens) == 1
    tomb = gens[0].with_name(gens[0].name + ".stale")
    tomb.touch()  # a sibling process's reap sighted us as superseded
    # fast path: catalog entry matches spec+location and _SUCCESS exists
    t2 = writers.stage_bucketed_table(
        spark, name, ["d"], num_buckets=2, path=str(root), builder=builder
    )
    assert t2.count() == 100
    assert not tomb.exists(), (
        "fast-path validation must clear the supersession tombstone"
    )
    spark.sql(f"DROP TABLE IF EXISTS `{name}`")
