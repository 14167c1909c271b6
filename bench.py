"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed best-of-3 into Spark's ``noop`` sink after a shared
warm-up (JVM + parquet footer caches); all attempt times are recorded in the
JSON for drift forensics. The noop sink forces every column of the full
plan to be computed (a ``count()`` would let Catalyst prune projection-only
work) without collecting rows to the driver — the cost measured is the
distributed plan, not row transfer.
"""

from __future__ import annotations

import json
import os
import time

HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_top_orders",
    "tpch_q5_local_supplier_volume",
    "join_broadcast_dim",
    "join_shuffle_fact",
    "agg_count_group_by",
    "grouping_sets_hierarchy",
    "window_dedup_rownum",
    "topk_per_group",
    "silver_clean_contract",
    "gold_counts_hierarchy",
    "events_tumbling_window_hourly",
    "events_sliding_window",
    "events_session_window",
    "events_type_stats",
    "doc_dedup_exact",
    "doc_dedup_minhash_lsh",
    "doc_token_count",
    "ann_cosine_topk",
    # LLM-pipeline flagships (VERDICT r5 #4): track the heaviest operator
    # families from rounds 4-5 round-over-round
    "doc_dedup_portable_pipeline",
    "doc_containment_pairs",
    "graph_pagerank_salted",
    # round-7 flagship families: lexical retrieval + corpus statistics
    "doc_bm25_topk",
    "vocab_pmi_collocations",
    # round-8 flagships (VERDICT r7 ask #5): the full 3-stage LLM dedup
    # pipeline and blocked-levenshtein entity resolution — the two heaviest
    # previously-untracked families, now costed round-over-round
    "dedup_cascade_funnel",
    "entity_resolution_fuzzy",
    # round-8 flagships: the end-to-end curation recipe (quality → dedup
    # keep-policy → token budget in one plan) and the heaviest new
    # attribution family (grid-absorption removal effects)
    "llm_curation_pipeline_end_to_end",
    "events_markov_removal_attribution",
    # round-9 flagship: DSIR-style importance resampling (hashed-bigram
    # broadcast scoring) — the data-selection family, newly tracked
    "doc_dsir_importance_select",
    # round-10 flagship: snapshot-incremental fuzzy dedup (persisted
    # band-bucket state + delta-only merge) — the batch scale path for
    # streaming near-dup, newly tracked
    "doc_neardup_incremental_snapshot",
]

# Clean-host reference probes (recorded across rounds 6-7 idle windows in
# NOTES.md: matmul 0.021-0.032 s, pyloop 0.16-0.17 s, threads32 3.9-4.4 s).
# A stamp probe exceeding its dirty ratio x the clean ceiling means
# neighbor-VM contention (invisible to loadavg — NOTES.md), and the run
# auto-reruns. threads32 gets a TIGHTER ratio: it under-reports contention
# against a 32-way Spark workload (measured r7-r8: threads32 at 1.34x clean
# coincided with 2.5-3x Spark-query slowdowns), so 1.3x is the honest line.
CLEAN_REF = {
    "numpy_matmul_sec": 0.032,
    "pyloop_sec": 0.17,
    "threads32_hash_sec": 4.4,
}
DIRTY_RATIO = {
    "numpy_matmul_sec": 1.5,
    "pyloop_sec": 1.5,
    "threads32_hash_sec": 1.3,
}
MAX_RERUNS = 2

# Hypervisor steal gate (VERDICT r12 #2). The r12 record proved the active
# microkernel probes miss steal entirely: three same-day code-identical runs
# tracked steal-delta monotonically (2,688 jiffies → 34.59 s total; 13,621 →
# 40.33; 23,322 → 42.62) while every probe stamped "clean". A run whose
# /proc/stat cpu steal counter grows by more than this across the bench is a
# dirty-host sample — rerun it like any other dirty probe. Threshold sits
# between the proven-clean 2.7k run and the proven-inflated 13.6k one.
STEAL_DIRTY_JIFFIES = 5000.0


def _steal_delta(before: dict, after: dict) -> float | None:
    """Steal-jiffy growth across a bench pass, None if /proc/stat lacks the
    field (non-Linux or truncated cpu line — then the gate can't fire)."""
    b = before.get("ambient_steal_jiffies")
    a = after.get("ambient_steal_jiffies")
    if b is None or a is None:
        return None
    return a - b

# The 19 queries benched since round 1 — BASELINE.md's 19.07 s gate is over
# this subset; later flagship additions must not blur the round-over-round
# comparison, so the JSON carries this subtotal explicitly.
BASELINE_SUBSET_N = 19


def _host_stamp() -> dict[str, float]:
    """Machine-bound microkernels: numpy matmul (BLAS), a pure-Python loop
    (interpreter), and a 32-thread hashing kernel. The threads32 probe is
    the only one that reliably detects contention against a 32-way Spark
    workload (r7: it read 6.5 s contended vs 3.9-4.4 idle while the
    single-thread matmul probe looked FAST during the same starvation)."""
    import concurrent.futures
    import hashlib

    import numpy as np

    def _best3(fn):
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 4)

    rng = np.random.default_rng(7)
    a = rng.random((1200, 1200))

    def _pyloop():
        s = 0
        for i in range(3_000_000):
            s += i * i

    def _threads32():
        def work(_):
            h = hashlib.sha256()
            for _ in range(2000):
                h.update(b"x" * 4096)
            return h.hexdigest()

        with concurrent.futures.ThreadPoolExecutor(32) as ex:
            list(ex.map(work, range(64)))

    return {
        "numpy_matmul_sec": _best3(lambda: (a @ a).sum()),
        "pyloop_sec": _best3(_pyloop),
        "threads32_hash_sec": _best3(_threads32),
        **_ambient_stat(),
    }


def _ambient_stat() -> dict[str, float]:
    """Ambient host-pressure readings recorded ALONGSIDE the active probes
    (VERDICT r11 #7): the microkernels catch in-window contention, but
    cross-RUN drift (±15% between same-day clean-stamp runs) has no witness
    in the record. Load average and the cgroup CPU accounting don't gate
    anything — they give a later reader the data to adjudicate whether two
    runs saw comparable ambient pressure. Keys are prefixed ``ambient_`` so
    the dirty-stamp check (driven by CLEAN_REF membership) ignores them."""
    out: dict[str, float] = {}
    try:
        la1, la5, la15 = os.getloadavg()
        out["ambient_loadavg_1m"] = round(la1, 2)
        out["ambient_loadavg_5m"] = round(la5, 2)
    except OSError:
        pass
    # cgroup CPU accounting (v2 cpu.stat, else v1 cpuacct/cpu.stat):
    # cumulative usage + throttling for THIS container — deltas across the
    # before/after stamps expose throttling that loadavg cannot see
    try:
        with open("/sys/fs/cgroup/cpu.stat") as fh:
            for line in fh:
                k, _, v = line.partition(" ")
                if k in ("usage_usec", "throttled_usec", "nr_throttled"):
                    out[f"ambient_cgroup_{k}"] = float(v)
    except OSError:
        for path, key in (
            ("/sys/fs/cgroup/cpuacct/cpuacct.usage", "usage_ns"),
            ("/sys/fs/cgroup/cpu/cpu.stat", None),
        ):
            try:
                with open(path) as fh:
                    if key:
                        out[f"ambient_cgroup_{key}"] = float(fh.read().strip())
                    else:
                        for line in fh:
                            k, _, v = line.partition(" ")
                            if k in ("nr_throttled", "throttled_time"):
                                out[f"ambient_cgroup_{k}"] = float(v)
            except (OSError, ValueError):
                pass
    # VM steal time (/proc/stat cpu line, field 8, jiffies): nonzero deltas
    # mean the hypervisor took cycles mid-run — the prime suspect for the
    # cross-run drift that clean stamps fail to explain
    try:
        with open("/proc/stat") as fh:
            first = fh.readline().split()
        if first and first[0] == "cpu" and len(first) > 8:
            out["ambient_steal_jiffies"] = float(first[8])
    except (OSError, ValueError):
        pass
    return out


def _stamp_dirty(stamp: dict[str, float]) -> list[str]:
    """Probes exceeding their per-probe dirty ratio x the clean reference."""
    return [
        k
        for k, ref in CLEAN_REF.items()
        if stamp.get(k, 0.0) > DIRTY_RATIO[k] * ref
    ]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from breweries_data_engineering_case_spark.plans import registry
    from breweries_data_engineering_case_spark.session import get_spark

    spark = get_spark(app_name="bdec-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # warm-up: JVM JIT + codegen compile + file listing + parquet footers,
    # not measured — covers the heaviest codegen shapes (wide aggregate,
    # window, scan+agg) so measurements reflect steady-state execution
    for wname in ("agg_count_group_by", "window_dedup_rownum", "doc_dedup_minhash_lsh"):
        run(registry.QUERIES[wname](spark, sf_dir))

    per_query_attempts: dict[str, list[float]] = {}

    def measure() -> tuple[dict[str, float], dict, dict]:
        """One full pass: stamp -> best-of-3 per query -> stamp."""
        before = _host_stamp()
        timings: dict[str, float] = {}
        # best-of-3 per query (VERDICT r10 #4): the first attempt absorbs
        # any remaining codegen/JIT cost for that exact shape, and three
        # samples of ambient host noise (shared VM; same-day clean runs
        # spread ±15%, twice forcing a judged round to adjudicate phantom
        # regressions). The fastest attempt measures the plan; every
        # attempt is kept in the JSON for drift forensics.
        for name in HEADLINE:
            fn = registry.QUERIES.get(name)
            if fn is None:
                continue
            tries = per_query_attempts.setdefault(name, [])
            for _ in range(3):
                # drop caches BEFORE each attempt: queries persist()
                # intermediates, and Spark's CacheManager matches by logical
                # plan — without this later attempts would read attempt
                # one's cache and measure warm-cache I/O, not the plan
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                run(fn(spark, sf_dir))
                tries.append(round(time.perf_counter() - t0, 3))
            timings[name] = min(tries[-3:])
        after = _host_stamp()
        return timings, before, after

    # Contention guard (VERDICT r7 ask #1): a run whose before/after stamp
    # deviates >1.5x from the clean-host reference was measured on a
    # contended VM and is NOT a valid performance record — rerun (bounded).
    attempts = []
    for attempt in range(1 + MAX_RERUNS):
        timings, before, after = measure()
        dirty = sorted(set(_stamp_dirty(before)) | set(_stamp_dirty(after)))
        # steal gate (VERDICT r12 #2): in-window probes can't see hypervisor
        # steal — the before/after /proc/stat delta can, and it is ENFORCED,
        # not just recorded: a high-steal pass reruns like any dirty probe
        sd = _steal_delta(before, after)
        if sd is not None and sd > STEAL_DIRTY_JIFFIES:
            dirty.append("steal_delta_jiffies")
        attempts.append((timings, before, after, dirty, sd))
        if not dirty:
            break
    # prefer the first clean attempt; else the attempt with the lowest total
    clean = [a for a in attempts if not a[3]]
    timings, before, after, dirty, steal_delta = (
        clean[0] if clean else min(attempts, key=lambda a: sum(a[0].values()))
    )

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    baseline_subset = [n for n in HEADLINE[:BASELINE_SUBSET_N] if n in timings]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                # the r1-comparable gate number: subtotal of the original 19
                # queries (BASELINE.md 19.07 s), independent of flagship adds
                "baseline_subset_sec": round(
                    sum(timings[n] for n in baseline_subset), 3
                ),
                "baseline_subset_n": len(baseline_subset),
                "host_calibration": {
                    "before": before,
                    "after": after,
                    "clean_reference": CLEAN_REF,
                    "dirty_ratio": DIRTY_RATIO,
                    "stamp_clean": not dirty,
                    "dirty_probes": dirty,
                    # the enforced steal gate (VERDICT r12 #2): the recorded
                    # pass's steal growth, the threshold it was judged
                    # against, and the verdict — so a later reader can see
                    # the gate DECISION, not just the raw counter
                    "steal_delta_jiffies": steal_delta,
                    "steal_gate_threshold": STEAL_DIRTY_JIFFIES,
                    # null (not true) when the counter is unavailable: an
                    # unmeasurable host is UNKNOWN, not affirmatively clean
                    # (ADVICE r13) — readers must not mistake a gate that
                    # could not fire for one that passed
                    "steal_gate_clean": (
                        None
                        if steal_delta is None
                        else steal_delta <= STEAL_DIRTY_JIFFIES
                    ),
                    "attempts": len(attempts),
                    # full per-attempt record: totals + stamps, so a reader
                    # can see the spread the guard was choosing between
                    "attempt_totals_sec": [
                        round(sum(t.values()), 3) for t, _, _, _, _ in attempts
                    ],
                    "attempt_dirty_probes": [d for _, _, _, d, _ in attempts],
                    "attempt_steal_deltas": [s for _, _, _, _, s in attempts],
                    # raw per-query attempt times across ALL passes (3 per
                    # pass), in execution order — the drift-forensics record
                    # VERDICT r10 #4 asked to keep alongside the min
                    "per_query_attempts_sec": per_query_attempts,
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
