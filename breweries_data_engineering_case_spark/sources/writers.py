"""Sink operators: partitioned Parquet + idempotent by-date overwrite.

≈ reference S5/S6 (SURVEY.md §2.1):

- S5: ``COPY … TO 's3://dir' (FORMAT PARQUET, PARTITION_BY (…),
  COMPRESSION 'snappy', OVERWRITE_OR_IGNORE TRUE)``
  (app/tasks/silver.py:61-71, app/tasks/gold.py:12-32).
- S6: ``CREATE TABLE IF NOT EXISTS …; DELETE WHERE ingestion_date = d;
  INSERT INTO … SELECT`` — per-run replace on an append-by-date history table
  (app/tasks/gold.py:89-113).

Spark-first mapping: immutable Parquet has no DELETE, so S6's
delete-then-insert becomes **dynamic partition overwrite** — with
``spark.sql.sources.partitionOverwriteMode=dynamic`` (set by session.py),
``mode("overwrite").partitionBy("ingestion_date")`` replaces exactly the
partitions present in the written data and leaves every other date alone.
Same idempotency contract, and it scales: the overwrite is a metadata swap of
one date directory, never a table rewrite.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import shutil
from collections.abc import Sequence
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
    compression: str = "snappy",
    max_records_per_file: int | None = None,
    dynamic_overwrite: bool = True,
) -> None:
    """Hive-partitioned snappy Parquet write (≈ S5).

    ``dynamic_overwrite`` pins ``partitionOverwriteMode=dynamic`` as a
    per-write option (NOT relying on session conf — an externally-created
    session defaults to static, which silently wipes every other partition):
    ``overwrite`` then replaces only the partitions this DataFrame contains —
    the semantic twin of DuckDB's ``OVERWRITE_OR_IGNORE``
    (app/tasks/silver.py:69). ``max_records_per_file`` caps file size to keep
    downstream scan tasks balanced (small-files vs giant-files tradeoff).
    """
    w = df.write.option("compression", compression)
    if dynamic_overwrite:
        w = w.option("partitionOverwriteMode", "dynamic")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.partitionBy(*partition_cols).mode(mode).parquet(path)


def idempotent_date_overwrite(
    df: DataFrame,
    path: str,
    date_value: str | _dt.date,
    date_col: str = "ingestion_date",
    extra_partition_cols: Sequence[str] = (),
) -> None:
    """Replace exactly one date's slice of a date-partitioned dataset (≈ S6).

    Stamps ``date_col`` with the run date, then dynamic-partition-overwrites.
    Re-running the same date yields identical table contents — the
    "Idempotency for this run" contract of app/tasks/gold.py:100-113.
    """
    if isinstance(date_value, _dt.date):
        date_value = date_value.isoformat()
    stamped = df.withColumn(date_col, F.to_date(F.lit(date_value)))
    cols = [date_col, *extra_partition_cols]
    write_partitioned_parquet(stamped, path, cols, mode="overwrite")


def read_back(spark: SparkSession, path: str) -> DataFrame:
    """Re-open a written dataset (partition columns recovered from dirs)."""
    return spark.read.parquet(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_mb: int = 128,
    partition_cols: Sequence[str] = (),
) -> int:
    """Small-files compaction: rewrite a dataset into ~target-sized files.

    The small-files problem is the classic failure mode of incremental
    pipelines (every micro-batch/run appends a few KB files; a year later the
    scan spends longer listing+opening than reading). Rewrites with a file
    count derived from the actual byte size; returns the file count used.
    Partitioned datasets compact within partitions via a repartition on the
    partition key (one shuffle, each output partition dir gets coalesced
    files).
    """
    df = spark.read.parquet(path)
    total_bytes = sum(f.stat().st_size for f in Path(path).rglob("*.parquet"))
    n_files = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
    if partition_cols:
        df = df.repartition(n_files, *[F.col(c) for c in partition_cols])
        write_partitioned_parquet(df, out_path, partition_cols)
    else:
        df.repartition(n_files).write.mode("overwrite").option(
            "compression", "snappy"
        ).parquet(out_path)
    return n_files


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed (hash-clustered) table — the co-located-join path.

    Two tables bucketed on the same key with the same bucket count join with
    ZERO shuffle (both sides arrive pre-partitioned; with sort_cols, even the
    sort is pre-done). At 100 TB this converts the repeated fact-fact join
    from two full shuffles per query into none — the shuffle is paid once at
    write time. No DuckDB/reference counterpart (the reference is single-
    process); Spark-native scale feature.

    ``path`` makes the table EXTERNAL at that location. Catalog entries are
    per-session (in-memory metastore) but the location persists — so a fresh
    session re-creating the table would hit LOCATION_ALREADY_EXISTS on the
    leftover directory; with mode='overwrite' the stale location is removed
    first.
    """
    w = df.write.format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        if mode == "overwrite":
            shutil.rmtree(path, ignore_errors=True)
        w = w.option("path", path)
    w.mode(mode).saveAsTable(name)


_MANIFEST = "_bdec_manifest.json"


def _plan_fingerprint(df: DataFrame) -> str:
    """Deterministic hash of a frame's analyzed plan, built from TWO
    stringifications whose blind spots are disjoint (round-12 review):

    - the CANONICALIZED plan — Catalyst's semantic-equality form:
      expression ids normalized (session-global counters that differ
      across processes), literals preserved verbatim — catches every
      expression/literal change, but erases output NAMES (aliases print
      as ``AS #0L``), so a builder that merely renames or SWAPS output
      columns would hash identically while the served schema binding
      changed;
    - the raw analyzed plan with ``#<digits>`` id suffixes stripped —
      carries the name↔expression binding (``expr AS name#``), closing
      the rename/swap hole; its own blind spot (the strip also mangles
      ``#N`` inside string literals) is covered by the canonicalized
      half, which keeps literals intact.

    ``maxToStringFields`` is raised for both stringifies (and restored)
    because the default (25) elides wide projections as "... N more
    fields" — a change to the 26th expression would otherwise mint the
    SAME fingerprint and silently reuse stale staged data.

    This is the CODE half of stage-key invalidation (VERDICT r11 #5 /
    NOTES "Staging version discipline"): ``source_fingerprint`` catches a
    regenerated corpus (DATA change), but a code change to pair-gen /
    salting / surrogate-id logic used to silently reuse stale cross-process
    staged state unless someone remembered to bump a ``:vN:`` tag.
    Folding the analyzed-plan hash into the staging manifest makes that
    automatic: any upstream change that alters the staged frame's lineage
    mints a different fingerprint and forces a restage. (An upstream
    ``localCheckpoint`` truncates lineage to an opaque ``LogicalRDD`` node,
    so code changes ABOVE a checkpoint are not visible — stagers should
    build their frame un-checkpointed, as all in-repo call sites do.)"""
    import re

    spark = df.sparkSession
    key = "spark.sql.debug.maxToStringFields"
    prev = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "100000")
        analyzed = df._jdf.queryExecution().analyzed()
        canonical = analyzed.canonicalized().toString()
        named = re.sub(r"#\d+", "#", analyzed.toString())
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    h = hashlib.md5()
    h.update(canonical.encode())
    h.update(b"\x00")
    h.update(named.encode())
    return h.hexdigest()[:12]


def _catalog_bucket_spec(spark: SparkSession, name: str) -> dict | None:
    """The bucket spec the session catalog has registered for ``name``
    (parsed from DESCRIBE TABLE EXTENDED), or None if it has none."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED `{name}`").collect()
    info = {r.col_name: r.data_type for r in rows}

    def _cols(s: str | None) -> list[str]:
        s = (s or "").strip().strip("[]")
        return [c.strip().strip("`") for c in s.split(",") if c.strip()]

    try:
        nb = int(info.get("Num Buckets", ""))
    except (TypeError, ValueError):
        return None
    return {
        "bucket_cols": _cols(info.get("Bucket Columns")),
        "num_buckets": nb,
        "sort_cols": _cols(info.get("Sort Columns")),
    }


def reap_stale_stage_siblings(parent, prefix: str, active_name: str) -> list[str]:
    """Remove sibling staged dirs under ``parent`` that share the stage
    ``prefix`` but are not the active key dir (ADVICE r11: fingerprint-keyed
    staging mints a brand-new dir per corpus generation and the
    old-fingerprint siblings would otherwise leak /tmp disk forever — at
    SF1 each leaked pagerank edge table is sizeable). The prefix must
    identify ONE (operator, corpus) scope — callers hash the corpus path
    into it, so staged state for other corpora is never touched (round-12
    review). Returns the reaped dir names so the caller can drop any
    same-session catalog entries that pointed into them."""
    try:
        candidates = list(Path(parent).glob(prefix + "*"))
    except OSError:
        return []
    reaped = []
    for d in candidates:
        if d.name != active_name and d.is_dir():
            shutil.rmtree(d, ignore_errors=True)
            reaped.append(d.name)
    return reaped


def run_once_layout_migration(parent, marker_name: str, sweep) -> None:
    """Marker-gated one-time staged-layout migration. ``sweep(parent)``
    (returning True when every removal succeeded or nothing was left to
    remove) runs until a clean pass, then the marker file stops future
    directory scans. The marker is NOT written after a failed removal
    (e.g. a legacy dir owned by another user on a shared /tmp) — the sweep
    retries on the next call instead of silently leaking that dir forever
    (round-12 review)."""
    parent = Path(parent)
    marker = parent / marker_name
    if marker.exists():
        return
    if sweep(parent):
        try:
            parent.mkdir(parents=True, exist_ok=True)
            marker.touch()
        except OSError:
            pass


def stage_bucketed_table(
    spark: SparkSession,
    name: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    path: str,
    builder,
    sort_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Idempotent bucketed staging with CROSS-PROCESS reuse (VERDICT r10 #5).

    The iterative-graph staging pattern (PageRank, connected components)
    pays the edge-list shuffle once per corpus snapshot by writing it as a
    bucketed table. ``saveAsTable`` records the bucket spec in the session
    catalog — which for the in-memory catalog is forgotten at process exit,
    so a fresh process used to RESTAGE (~15 s at SF1 for PageRank) even
    though the bucketed files were still on disk. The fix is a tiny on-disk
    metastore: a manifest JSON written next to the bucketed files AFTER a
    successful write records the schema + bucket spec, and a fresh process
    re-REGISTERS the existing files with a metadata-only DDL
    (``CREATE TABLE … CLUSTERED BY … INTO n BUCKETS LOCATION …`` — verified
    to scan ``Bucketed: true`` exactly like the original saveAsTable entry)
    instead of recomputing and rewriting the data.

    Resolution order:
      1. session catalog hit with a MATCHING bucket spec →
         ``spark.table(name)`` (same-process reuse; a spec mismatch drops
         the stale entry and falls through — ADVICE r11);
      2. manifest hit with a matching bucket spec AND a matching
         analyzed-plan fingerprint of ``builder()``'s frame → DDL
         re-registration (fresh-process reuse, no data movement — the
         100 TB economics: the staged table is keyed by corpus snapshot +
         builder code, not by process);
      3. otherwise → write ``builder()``'s frame as bucketed files to a
         TEMP location, publish them into ``path`` with a directory
         rename, then write the manifest LAST. A crash anywhere mid-stage
         leaves either the old published dir or a manifest-less partial —
         both make the next run restage; a reader can never see a torn
         table (no manifest ⇒ no re-registration, and the session-catalog
         entry is only created after publish).

    The manifest stores the bucket spec and the builder frame's
    analyzed-plan fingerprint; a spec mismatch (code changed the staging
    layout) or a plan mismatch (code changed the staged frame's SEMANTICS —
    pair-gen, salting, surrogate ids) invalidates the cache and restages
    automatically, closing the manual ``:vN:``-bump discipline footgun
    (VERDICT r11 #5). Concurrency note: stagers assume
    one writer per key (keys are content-derived, so concurrent writers
    would write identical data; the rmtree+rename publish window is the
    residual race — same single-writer assumption as the rest of the
    /tmp staging in this repo).
    """
    import json as _json
    import os as _os

    spec = {
        "bucket_cols": list(bucket_cols),
        "num_buckets": int(num_buckets),
        "sort_cols": list(sort_cols) if sort_cols else [],
    }
    if spark.catalog.tableExists(name):
        # validate the registered layout against the requested spec (ADVICE
        # r11): if the spec changed within one session (A/B harness flipping
        # num_buckets, two call-sites colliding on a name), serving the stale
        # layout would silently break downstream bucketed-probe plan
        # assumptions. External table: dropping the entry keeps the files;
        # resolution falls through to the manifest / restage path.
        if _catalog_bucket_spec(spark, name) == spec:
            return spark.table(name)
        spark.sql(f"DROP TABLE `{name}`")

    def _register(schema_ddl: str) -> DataFrame:
        clustered = ", ".join(f"`{c}`" for c in spec["bucket_cols"])
        sorted_by = (
            " SORTED BY (" + ", ".join(f"`{c}`" for c in spec["sort_cols"]) + ")"
            if spec["sort_cols"]
            else ""
        )
        spark.sql(
            f"CREATE TABLE `{name}` ({schema_ddl}) USING PARQUET "
            f"CLUSTERED BY ({clustered}){sorted_by} "
            f"INTO {spec['num_buckets']} BUCKETS "
            f"LOCATION '{path}'"
        )
        return spark.table(name)

    # The builder runs before the manifest check so its analyzed-plan hash
    # can be compared against the manifest's recorded one — the automatic
    # CODE-change invalidation (VERDICT r11 #5). Construction is cheap (the
    # call sites have already built the lineage; the thunk just returns it);
    # the expensive parts a manifest hit still skips are the shuffle, the
    # write, and the data movement.
    df = builder()
    plan_fp = _plan_fingerprint(df)
    mf = Path(path) / _MANIFEST
    if mf.exists():
        try:
            m = _json.loads(mf.read_text())
        except (OSError, ValueError):
            m = None
        if (
            m
            and all(m.get(k) == v for k, v in spec.items())
            and m.get("schema")
            and m.get("plan") == plan_fp
        ):
            return _register(m["schema"])
    # write to a temp sibling under a temp catalog name, publish by rename
    tmp_path = Path(path).with_name(Path(path).name + f".tmp-{_os.getpid()}")
    tmp_name = f"{name}__stage_tmp"
    shutil.rmtree(tmp_path, ignore_errors=True)
    spark.sql(f"DROP TABLE IF EXISTS `{tmp_name}`")
    write_bucketed_table(
        df,
        tmp_name,
        bucket_cols,
        num_buckets=num_buckets,
        sort_cols=sort_cols,
        mode="overwrite",
        path=str(tmp_path),
    )
    # external table: dropping the catalog entry keeps the files
    spark.sql(f"DROP TABLE `{tmp_name}`")
    shutil.rmtree(path, ignore_errors=True)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    tmp_path.rename(path)
    schema_ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    mf.write_text(_json.dumps({**spec, "schema": schema_ddl, "plan": plan_fp}))
    return _register(schema_ddl)
