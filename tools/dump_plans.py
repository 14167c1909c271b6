"""Dump .explain("formatted") for headline (or named) queries to
plans/$BDEC_PLAN_ROUND/ (default r15).

Usage: python tools/dump_plans.py <suffix> [query ...]
Writes plans/<round>/<query>_<suffix>.txt for each query (default: the
bench HEADLINE list). Plans are captured fresh (cache cleared first) so
the dump reflects what the bench actually executes.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]

    from bench import HEADLINE
    from breweries_data_engineering_case_spark.plans import registry
    from breweries_data_engineering_case_spark.session import get_spark

    if not names:
        names = HEADLINE

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    round_dir = os.environ.get("BDEC_PLAN_ROUND", "r15")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / round_dir
    out_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark(app_name="bdec-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = registry.QUERIES.get(name)
        if fn is None:
            print(f"SKIP {name}: not in registry", file=sys.stderr)
            continue
        spark.catalog.clearCache()
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
            print(f"wrote {name}_{suffix}.txt")
        except Exception as exc:  # noqa: BLE001 - record the failure, keep going
            (out_dir / f"{name}_{suffix}.txt").write_text(f"ERROR: {exc}\n")
            print(f"ERROR {name}: {exc}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
