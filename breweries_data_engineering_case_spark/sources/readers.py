"""Scan operators.

≈ reference S3/S4 (SURVEY.md §2.1): ``read_json_auto`` over a bronze glob
(app/tasks/silver.py:19) and ``read_parquet`` over the hive-partitioned silver
glob (app/tasks/gold.py:50-53,71).

Scale notes
-----------
- Bronze page files are **JSON arrays** (one array per API page,
  app/io/storage.py:23), so ``multiLine=True`` is required. multiLine JSON is
  not splittable — one file = one task — which is fine here because pages are
  small and numerous (parallelism comes from file count, the same way the
  reference's glob works). For huge single JSON files, land NDJSON instead.
- Always pass an explicit schema: at 100 TB, inference is a full extra read
  of the data; with a read schema the JSON parser also *skips* unprojected
  fields (projection pushdown into the parser).
- Parquet reads use partition discovery; filters on partition columns prune
  directories before any file is opened (the built-in version of the
  reference's manual glob construction, SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def json_array_scan(
    spark: SparkSession, path_or_glob: str, schema: StructType | None = None
) -> DataFrame:
    """Read JSON-array files (one top-level array per file) → rows.

    ≈ ``read_json_auto('…/ingestion_date={d}/*.json')`` app/tasks/silver.py:19.
    """
    reader = spark.read.option("multiLine", True)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path_or_glob)


def ndjson_scan(
    spark: SparkSession, path_or_glob: str, schema: StructType | None = None
) -> DataFrame:
    """Read newline-delimited JSON — the splittable fast path for large files."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path_or_glob)


def parquet_scan(
    spark: SparkSession,
    path: str,
    base_path: str | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """Parquet scan with hive partition discovery.

    ≈ ``read_parquet('…/*/*/*.parquet')`` app/tasks/gold.py:50-53. Spark
    recovers ``country=/state=`` dirs as columns (the reference keeps them
    in-file; same logical result, see SURVEY.md S4). ``base_path`` lets a
    subdirectory read still recover partition columns above it.
    """
    reader = spark.read
    if base_path:
        reader = reader.option("basePath", base_path)
    df = reader.parquet(path)
    return df.select(*columns) if columns else df


_NS_TS_COLS: dict[str, tuple[str, ...]] = {}


def _nanos_ts_columns(path: str) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS) (footer-only check, cached)."""
    if path not in _NS_TS_COLS:
        try:
            import pyarrow.parquet as pq

            schema = pq.read_schema(path)
            _NS_TS_COLS[path] = tuple(
                f.name for f in schema if str(f.type) == "timestamp[ns]"
            )
        except Exception:
            _NS_TS_COLS[path] = ()
    return _NS_TS_COLS[path]


def table_scan(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one of the shared testdata tables (TESTDATA.md).

    The driver-generated parquet stamps some timestamps as TIMESTAMP(NANOS),
    which Spark's reader rejects by default. With the runtime-settable
    ``nanosAsLong`` flag those columns read as BIGINT nanos; we restore them
    to ``timestamp_ntz`` (micros — Spark's native resolution). The footer
    check is metadata-only, so this costs nothing at scale.

    The built frame is MEMOIZED per (session, path, mtime_ns, size) — r14:
    ``spark.read.parquet`` re-lists and re-reads the footer schema on every
    call (~100 ms of driver time), and a bench pass constructs each query
    up to 9×. DataFrames are immutable plans, so reuse is safe; the stat in
    the key makes a same-path rewrite mint a fresh entry (the same
    staleness contract as source_fingerprint). Only regular FILES are
    memoized: a directory's inode stat doesn't see rewrites confined to
    partition subdirs, so directory tables (stress corpora) take the
    uncached path. The memo lives on the session object and dies with it;
    it caches plan METADATA only — every execution still reads the data.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # non-settable session: assume it was configured at build time
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    import os as _os

    key = None
    try:
        st = _os.stat(path)
        if not _os.path.isdir(path):
            key = (path, st.st_mtime_ns, st.st_size)
    except OSError:
        pass  # let spark.read raise its usual missing-path error below
    memo: dict = spark.__dict__.setdefault("_bdec_scan_memo", {})
    if key is not None and key in memo:
        return memo[key]
    df = spark.read.parquet(path)
    for c in _nanos_ts_columns(path):
        df = df.withColumn(
            c,
            F.timestamp_micros(F.expr(f"`{c}` div 1000")).cast("timestamp_ntz"),
        )
    if key is not None:
        if len(memo) > 64:  # bound growth across many sf_dirs/rewrites
            memo.clear()
        memo[key] = df
    return df


def source_fingerprint(sf_dir: str, *names: str) -> str:
    """Cheap content fingerprint (mtime_ns:size per table file) for keying
    cross-process staged artifacts (bucketed tables, stream staging dirs).

    Staged state derived from a corpus snapshot must be invalidated when
    the snapshot is REGENERATED at the same path — mtime+size changes on
    any rewrite, so baking this string into a stage key makes stale-reuse
    impossible without paying a content hash over the data.

    A table may be a single parquet FILE (driver testdata) or a
    Spark-written DIRECTORY (stress corpora). For a directory, the stat of
    the dir inode carries no content signal (st_size is the inode size),
    so the fingerprint RECURSIVELY walks the data files inside (sorted
    relpath:mtime:size per file) — a rewrite that replaces part files is
    then reliably detected even if dir mtimes are preserved, including
    in-place rewrites confined inside a hive-partition subdirectory
    (a shallow listdir of partition dirs would miss those — round-12
    review).

    A missing table raises FileNotFoundError instead of yielding a
    constant sentinel: a typo'd name must fail loudly, not permanently
    disable staleness invalidation for that stage key."""
    import os as _os

    parts = []
    for n in names:
        p = f"{sf_dir.rstrip('/')}/{n}.parquet"
        try:
            st = _os.stat(p)
        except FileNotFoundError as exc:
            # ENOENT only: a typo'd table name must fail with the loud
            # missing-table message. Other OSErrors (EACCES, ELOOP, …) are
            # NOT "does not exist" — misdiagnosing a permission problem as
            # a typo sends the operator hunting the wrong bug (ADVICE r12);
            # they propagate unchanged.
            raise FileNotFoundError(
                f"source_fingerprint: table path {p!r} does not exist — "
                "refusing to key staged state on an absent source"
            ) from exc
        if _os.path.isdir(p):
            entries = []
            for root, dirs, files in _os.walk(p):
                # prune transient trees a crashed/concurrent writer leaves
                # (_temporary/, .spark-staging-*): their inner part files
                # carry plain names, so a per-file basename filter alone
                # would fold them into the fingerprint and churn stage
                # keys run-over-run (round-12 review)
                dirs[:] = sorted(
                    d for d in dirs if not d.startswith((".", "_"))
                )
                rel_root = _os.path.relpath(root, p)
                for fn in sorted(files):
                    if fn.startswith((".", "_")) and fn != "_SUCCESS":
                        continue  # skip .crc noise; keep the commit marker
                    fst = _os.stat(_os.path.join(root, fn))
                    rel = fn if rel_root == "." else f"{rel_root}/{fn}"
                    entries.append(f"{rel}:{fst.st_mtime_ns}:{fst.st_size}")
            parts.append(f"{n}=dir[{','.join(entries)}]")
        else:
            parts.append(f"{n}={st.st_mtime_ns}:{st.st_size}")
    return ";".join(parts)


# logical-plan nodes that compile to an Exchange (or otherwise preclude the
# cheap .rdd partition probe): spread() declines to probe below any of these
_SHUFFLE_NODES = frozenset(
    {
        "Join",
        "Aggregate",
        "Repartition",
        "RepartitionByExpression",
        "Sort",
        "Window",
        "Distinct",
        "Deduplicate",
        "Intersect",
        "Except",
        "GlobalLimit",
        "CoGroup",
        "FlatMapGroupsInPandas",
        "FlatMapCoGroupsInPandas",
        "MapGroups",
    }
)


def _has_shuffle_ancestor(df: DataFrame) -> bool:
    """True when the ANALYZED logical plan contains a node that plans an
    exchange. String-walk of the plan tree (first token per line, after the
    tree art) — no execution, no py4j beyond toString."""
    plan = df._jdf.queryExecution().analyzed().toString()
    for line in plan.splitlines():
        tok = line.lstrip(" :+-").split(" ", 1)[0].split("(", 1)[0]
        if tok in _SHUFFLE_NODES:
            return True
    return False


def spread(df: DataFrame) -> DataFrame:
    """Fan a CPU-bound stage's input out to the cluster's core count when
    the upstream scan yields fewer partitions than cores.

    A single small parquet file (one row group) scans as ONE partition, so
    a per-row-expensive stage downstream (md5 shingling, image decode,
    edit-distance verify) runs on one core no matter how wide the cluster
    is — measured 4.2 s → 1.4 s on the portable-MinHash shingle stage at
    sf0.1/local[32]. Scale-safe by construction: when the scan already has
    at least `defaultParallelism` partitions (any real multi-file dataset),
    this is a NO-OP — no shuffle is added where scan parallelism is
    adequate. Call it on the skinny projection feeding the expensive
    expression, never on the raw wide scan.

    The partition probe uses ``df.rdd``, which is only cheap on a
    scan+project frame — with shuffles upstream, AQE would materialize
    those query stages eagerly at plan-construction time, and streaming
    frames don't support ``.rdd`` at all. Both hazards are now guarded
    (ADVICE r9): a streaming frame or a frame whose analyzed plan contains
    a shuffle-inducing node is returned UNCHANGED (those inputs arrive
    shuffle-partitioned anyway; streaming staging queries repartition
    explicitly at the source, streaming/stateful.py)."""
    if df.isStreaming:
        return df
    spark = df.sparkSession
    # Probe memo (r14): the ``.rdd`` probe pays physical planning + codegen
    # compile (~60 ms) and a bench pass re-constructs each query up to 9×
    # with a FRESH frame each time, so the per-DataFrame memo Spark keeps
    # never hits. Key on the analyzed plan's semanticHash (one py4j call,
    # ~1 ms): same semantic plan → same scan split count. A same-path
    # rewrite upstream changes table_scan's memo key but not this plan
    # hash — the stale entry can only mis-size parallelism for that corner
    # (never results), and the cap bounds the dict.
    memo: dict = spark.__dict__.setdefault("_bdec_spread_memo", {})
    try:
        key = df._jdf.queryExecution().analyzed().semanticHash()
    except Exception:
        key = None
    if key is not None and key in memo:
        n = memo[key]
    else:
        if _has_shuffle_ancestor(df):
            return df
        n = df.rdd.getNumPartitions()
        if key is not None:
            if len(memo) > 256:
                memo.clear()
            memo[key] = n
    cores = spark.sparkContext.defaultParallelism
    if n < cores:
        return df.repartition(cores)
    return df
