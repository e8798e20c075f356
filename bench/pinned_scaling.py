"""Single-JVM worker for the taskset-pinned Spark-native scaling pair.

Run as::

    taskset -c 0-(N-1) python bench/pinned_scaling.py N CACHE RUNS OUT.json

The whole process tree — driver JVM, scheduler, GC, every Python
worker — inherits the taskset CPU mask, so a local[2] run really owns
TWO cores and nothing else (a real 2-core executor also shares its
cores with its own JVM threads).  This removes the idle-core-help bias
of same-session task slicing: there, the 2-task job's JVM/driver
threads ran on 30 idle cores and flattered the low-parallelism level.

Task granularity stays FINE (one file per task, 64 files) at both
levels — the scheduler keeps all N pinned cores busy across many small
tasks exactly as a real cluster would, so a single host stall no
longer sets the whole wall time (the fat-task straggler bias of the
sliced measurement).

Protocol per JVM: 2 discarded warm builds (worker pool + allocator
arenas settle; full spec set so every sketch's arena is faulted), then
RUNS measured builds.  Output: one JSON file with the raw times.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores, cache, runs, out_path = (int(sys.argv[1]), sys.argv[2],
                                    int(sys.argv[3]), sys.argv[4])
    affinity = sorted(os.sched_getaffinity(0))
    from qsketch.spark.agg import DEFAULT_SPECS, build_files
    from qsketch.spark.session import make_session

    spark = make_session(cores)
    for _ in range(2):  # discarded: settle worker pool + arenas
        build_files(spark, cache, DEFAULT_SPECS)
    times, n_tokens = [], 0
    for _ in range(runs):
        t0 = time.perf_counter()
        res = build_files(spark, cache, DEFAULT_SPECS)
        times.append(time.perf_counter() - t0)
        n_tokens = res.n_tokens
    spark.stop()
    with open(out_path, "w") as fh:
        json.dump({"cores": cores, "affinity": affinity, "times": times,
                   "n_tokens": n_tokens}, fh)


if __name__ == "__main__":
    main()
