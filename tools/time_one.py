"""Time one registry query at a given SF, bench-style (best-of-N to noop).

Usage: python tools/time_one.py QUERY [QUERY...] [--sf DIR] [--n 3]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.1"
    n = 3
    names = []
    it = iter(args)
    for a in it:
        if a == "--sf":
            sf = next(it)
        elif a == "--n":
            n = int(next(it))
        else:
            names.append(a)

    from breweries_data_engineering_case_spark.plans import registry
    from breweries_data_engineering_case_spark.session import get_spark

    spark = get_spark(app_name="bdec-time-one")
    spark.sparkContext.setLogLevel("ERROR")

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    # shared warm-up (JVM/codegen), same shapes as bench.py
    run(registry.QUERIES["agg_count_group_by"](spark, sf))
    for name in names:
        times = []
        for _ in range(n):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            run(registry.QUERIES[name](spark, sf))
            times.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: best={min(times)} all={times}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
