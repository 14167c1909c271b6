"""Driver-replica correctness gate.

Replicates what the per-round driver does: run every registry query on a
*vanilla* SparkSession and its oracle SQL in DuckDB over the same parquet
tables, then compare row count, column set, and normalized values.

Usage:
    python tools/replica.py                       # full gate at sf0.01
    python tools/replica.py --sf /root/testdata/sf0.1
    python tools/replica.py --window 50           # run 50 entries from --start
    python tools/replica.py name1 name2 ...       # just these queries
    python tools/replica.py --start 100           # resume from index 100
    python tools/replica.py --json REPLICA_r08.json   # persist the gate

`--window N` is a CHUNK SIZE relative to `--start` (the slice is
`todo[start:start+window]`), so chunked sweeps are
`--start 0 --window 65`, `--start 65 --window 65`, ... An empty
selection is an error (exit 2), never a silent green run.
"""
from __future__ import annotations

import json
import math
import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, ".")
import __spark_entry__ as e  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def select_window(todo: list[str], start: int, window: int | None) -> list[str]:
    """Slice the run list: `window` is a chunk SIZE relative to `start`.

    Historically `--window` was an absolute cutoff applied BEFORE `--start`,
    so `--start 65 --window 65` silently selected nothing — a sweep that
    prints no failures while running no queries. Chunk semantics + the
    caller's empty-selection guard make that impossible now.
    """
    if start < 0:
        raise ValueError(f"--start must be >= 0, got {start}")
    if window is not None and window <= 0:
        raise ValueError(f"--window must be > 0, got {window}")
    end = len(todo) if window is None else start + window
    return todo[start:end]


def norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.10g}"
    return str(v)


def main() -> int:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    window = None
    start = 0
    json_out = None
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--sf":
            sf = next(it)
        elif a == "--window":
            window = int(next(it))
        elif a == "--start":
            start = int(next(it))
        elif a == "--json":
            json_out = next(it)
        else:
            names.append(a)

    qs = e.queries()
    oracles = e.oracle_sql()
    try:
        todo = select_window(list(qs) if not names else names, start, window)
    except ValueError as exc:
        # invalid --start/--window gets the same clean nonzero exit as an
        # empty selection, not an uncaught traceback
        print(f"ERROR: {exc}", flush=True)
        return 2
    if not todo:
        print(
            f"ERROR: selection is empty (start={start}, window={window}) — "
            "refusing to report a vacuously green sweep",
            flush=True,
        )
        return 2

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    fails: list[str] = []
    records: dict[str, dict] = {}
    for idx, name in enumerate(todo, start=start):
        fn = qs[name]
        sql = oracles.get(name)
        try:
            # cache lifecycle is the registry's contract now (VERDICT r8
            # #3): constructing each query releases the previous query's
            # caching.cached() frames, so the gate needs no clearCache()
            sdf = fn(spark, sf)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            print(f"[{idx}] {name}: SPARK ERROR {type(ex).__name__}: {ex}", flush=True)
            fails.append(name)
            records[name] = {"status": "SPARK_ERROR", "err": f"{type(ex).__name__}: {ex}"[:300]}
            continue
        if sql is None:
            print(f"[{idx}] {name}: rows-only, {len(srows)} rows", flush=True)
            records[name] = {"status": "ROWS_ONLY", "spark_rows": len(srows)}
            continue
        try:
            rel = con.sql(sql)
            dcols = [d[0] for d in rel.description]
            drows = rel.fetchall()
        except Exception as ex:  # noqa: BLE001
            print(f"[{idx}] {name}: ORACLE ERROR {type(ex).__name__}: {ex}", flush=True)
            fails.append(name)
            records[name] = {"status": "ORACLE_ERROR", "err": f"{type(ex).__name__}: {ex}"[:300]}
            continue
        ok = len(srows) == len(drows) and sorted(sdf.columns) == sorted(dcols)
        why = "" if ok else f" (rows {len(srows)} vs {len(drows)}, cols {sorted(sdf.columns)} vs {sorted(dcols)})"
        if ok:
            si = sorted(range(len(sdf.columns)), key=lambda i: sdf.columns[i])
            di = sorted(range(len(dcols)), key=lambda i: dcols[i])
            ok = sorted(tuple(norm(r[i]) for i in si) for r in srows) == sorted(
                tuple(norm(r[i]) for i in di) for r in drows
            )
            if not ok:
                why = " (values)"
        print(f"[{idx}] {name}: {'MATCH' if ok else 'MISMATCH' + why}", flush=True)
        records[name] = {
            "status": "MATCH" if ok else "MISMATCH",
            "spark_rows": len(srows),
            "oracle_rows": len(drows),
        }
        if not ok:
            records[name]["why"] = why.strip() or "(values)"
            fails.append(name)
    print("FAILURES:", fails or "none")
    if json_out:
        counts: dict[str, int] = {}
        for r in records.values():
            counts[r["status"]] = counts.get(r["status"], 0) + 1
        out = {
            "sf": sf,
            "total": len(records),
            "counts": counts,
            "failures": fails,
            "queries": records,
        }
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {json_out}: {counts}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
