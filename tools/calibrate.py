"""Host-speed calibration — run before trusting any cross-session bench
comparison.

bench.py totals on this shared VM have repeatedly confused rounds: the same
commit benches 14 s one session and 20 s the next with no plan change. This
microbenchmark times fixed machine-bound kernels (no Spark, no disk) so a
session can record what the HOST was worth that day; future sessions divide
bench totals by the calibration ratio before calling anything a regression.

Prints one JSON line:
  {"md5_50mb_sec": ..., "numpy_matmul_sec": ..., "pyloop_sec": ...,
   "threads32_hash_sec": ...}
"""

from __future__ import annotations

import concurrent.futures
import hashlib
import json
import time

import numpy as np


def t(fn) -> float:
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 4)


def md5_50mb() -> None:
    hashlib.md5(b"\xab" * (50 * 1024 * 1024)).hexdigest()


def matmul() -> None:
    rng = np.random.default_rng(7)
    a = rng.random((1200, 1200))
    (a @ a).sum()


def pyloop() -> None:
    s = 0
    for i in range(3_000_000):
        s += i * i
    assert s > 0


def threads32() -> None:
    def work(_):
        h = hashlib.sha256()
        for _ in range(2000):
            h.update(b"x" * 4096)
        return h.hexdigest()

    with concurrent.futures.ThreadPoolExecutor(32) as ex:
        list(ex.map(work, range(64)))


def main() -> None:
    print(
        json.dumps(
            {
                "md5_50mb_sec": t(md5_50mb),
                "numpy_matmul_sec": t(matmul),
                "pyloop_sec": t(pyloop),
                "threads32_hash_sec": t(threads32),
            }
        )
    )


if __name__ == "__main__":
    main()
