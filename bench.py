"""Benchmark harness — prints ONE JSON line for the driver.

Headline: tokens/sec two-phase sketch-build throughput (BASELINE.json)
over a deterministic synthetic tokenized_sequences table (FIXTURES.md
§1, 2M docs ~ 7.7e8 tokens), measured warm (steady state: Spark reuses
Python workers, so a long job's allocator arenas stay faulted-in — the
cold number is also reported).

Scaling evidence (north rule: the same job at two parallelism levels
on the same input): ONE local[32] session runs the identical build
with the file list sliced into 2, 8, and 32 tasks — the single-box
analog of 2/8/32 executors (each executor-core owns more files; the
Python worker pool, page cache, and JVM stay identical across levels,
so the ratio is taken within one host phase with no session-restart
variance).  Each round measures all levels back-to-back plus an
in-phase MEMORY-BANDWIDTH control (same Spark workers, pure array
streaming) and a CPU-only spin control; the JSON carries:
  * efficiency_2_to_8 / _8_to_32: median of per-round ratios,
  * *_from_min: min-estimator ratios (noise on this Firecracker
    microVM is strictly additive — steal + neighbor bandwidth — so
    min-of-K approximates the uncontended runtime; standard
    microbenchmark practice),
  * *_normalized: per-round build efficiency divided by the same
    round's bandwidth-control efficiency — what the engine would
    scale at on a box whose memory system scaled perfectly; >1 rounds
    mean the build is LESS bandwidth-coupled than raw streaming.

Reproducibility: every throughput-bearing measurement is the MEDIAN of
QSKETCH_BENCH_RUNS (default 3) warm runs (scaling rounds:
QSKETCH_SCALING_ROUNDS, default 7) and the JSON carries the full
sorted spread per parallelism level — single warm samples on this
host are not evidence (run-to-run variance up to 9x under 32-way
oversubscription, see BASELINE.md host controls).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     QSKETCH_BENCH_DOCS (default 2000000),
     QSKETCH_BENCH_RUNS (default 3),
     QSKETCH_SCALING_ROUNDS (default 7).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("QSKETCH_BENCH_DOCS", "2000000"))
N_RUNS = int(os.environ.get("QSKETCH_BENCH_RUNS", "3"))
SCALING_ROUNDS = int(os.environ.get("QSKETCH_SCALING_ROUNDS", "7"))
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_cache", f"tokenized_{N_DOCS}")


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def _median_timed(fn, runs=None):
    """(median_sec, [sorted times], last_out) over ``runs`` warm runs."""
    runs = runs or N_RUNS
    ts, out = [], None
    for _ in range(runs):
        t, out = _timed(fn)
        ts.append(t)
    ts.sort()
    return ts[len(ts) // 2], ts, out


def _spin_control(spark, cpus: int) -> float:
    """Total spin iterations/sec across all tasks — CPU-only scaling probe."""
    import pyarrow as pa

    def spin(batches):
        import time as _t
        t0 = _t.perf_counter()
        x = 0
        while _t.perf_counter() - t0 < 2.0:
            x += 1
        yield pa.RecordBatch.from_arrays([pa.array([x])], names=["iters"])

    rows = spark.range(0, cpus, 1, cpus).mapInArrow(spin, "iters long").collect()
    return sum(r["iters"] for r in rows) / 2.0


def _membw_control(spark, tasks: int, mb: int = 192,
                   seconds: float = 1.5) -> float:
    """Aggregate read bandwidth (bytes/sec) of ``tasks`` concurrent Spark

    tasks each streaming over a per-worker resident float64 array — the
    engine-independent control the build's scaling is normalized
    against.  The buffer is cached per worker process (reused-pool
    semantics), so after the first call pages are warm and the probe
    measures steady-state bandwidth, not first-touch faulting."""
    import pyarrow as pa

    def stream(batches):
        import time as _t

        import builtins  # survives tasks within one reused worker proc

        import numpy as np
        buf = getattr(builtins, "_QSKETCH_BW_BUF", None)
        if buf is None or buf.nbytes != mb << 20:
            buf = np.ones((mb << 20) // 8, dtype=np.float64)
            builtins._QSKETCH_BW_BUF = buf
        t0 = _t.perf_counter()
        passes = 0
        while _t.perf_counter() - t0 < seconds:
            buf.sum()
            passes += 1
        dt = _t.perf_counter() - t0
        yield pa.RecordBatch.from_arrays(
            [pa.array([passes * buf.nbytes / dt])], names=["bps"])

    rows = (spark.range(0, tasks, 1, tasks)
            .mapInArrow(stream, "bps double").collect())
    return sum(r["bps"] for r in rows)


def main() -> None:
    from qsketch.spark.session import make_session

    queries: dict[str, float] = {}
    extras: dict[str, object] = {}
    tput: dict[str, float] = {}
    spin: dict[int, float] = {}

    # ---- main session at 4N = 8 (this VM's measured per-box sweet spot;
    # the 32-way run below shows the host's oversubscription ceiling)
    spark = make_session(8)
    from qsketch.spark.agg import (DEFAULT_SPECS, SketchSpec, build,
                                   build_files, build_grouped_files)
    from qsketch.spark.io import write_tokenized

    if not os.path.exists(os.path.join(CACHE, "_SUCCESS")):
        write_tokenized(spark, CACHE, N_DOCS, seed=42, num_partitions=64)

    t_cold, res = _timed(lambda: build_files(spark, CACHE, DEFAULT_SPECS))
    t_warm, spread8, res = _median_timed(
        lambda: build_files(spark, CACHE, DEFAULT_SPECS))
    n_tokens = res.n_tokens
    queries["build_all_sketches_cold"] = t_cold
    queries["build_all_sketches"] = t_warm
    tput["local8"] = n_tokens / t_warm
    spreads = {"local8_64tasks": [round(t, 3) for t in spread8]}
    extras["tokens"] = n_tokens
    extras["tokens_per_sec"] = tput["local8"]
    extras["qf_cardinality"] = res.sketches["quotient:tokens"].cardinality()

    # row-path (DataFrame scan) comparison at the same core count
    t_row, _ = _timed(lambda: build(
        spark.read.parquet(CACHE), DEFAULT_SPECS))
    queries["build_all_sketches_rowpath"] = t_row

    t_grouped, _ = _timed(lambda: build_grouped_files(
        spark, CACHE,
        (SketchSpec("quotient", "tokens"), SketchSpec("hll", "tokens")),
        "source").collect())
    queries["grouped_build_by_source"] = t_grouped

    import __spark_entry__ as entrymod

    for name in ("qf_membership", "cms_heavy_hitters",
                 "cms_heavy_hitters_sketch", "token_counts_top50",
                 "kll_nchars_quantiles", "near_duplicates",
                 "simhash_near_duplicates", "cosine_topk"):
        fn = entrymod.queries()[name]
        t, _, _ = _median_timed(lambda f=fn: f(spark, SF_DIR).collect())
        queries[name] = t
    spin[8] = _spin_control(spark, 8)
    spark.stop()

    # ---- scaling: the SAME job at task-parallelism 2 / 8 / 32 inside
    # ONE local[CPUS] session (build_files(parallelism=N) slices the 64
    # input files into N contiguous per-task slices — the single-box
    # analog of N executors).  The host's memory bandwidth drifts on a
    # minutes scale, so every round measures all levels back-to-back
    # plus an in-phase bandwidth control, and efficiencies are computed
    # WITHIN the round, then medianed across rounds.  A min-estimator
    # is reported alongside: noise on this microVM is strictly additive
    # (steal + neighbor bandwidth), so min-of-K estimates the
    # uncontended runtime.
    levels = (2, 8, CPUS) if CPUS != 8 else (2, 8)
    times: dict[int, list[float]] = {c: [] for c in levels}
    bw: dict[int, list[float]] = {c: [] for c in levels}
    n_tok_by: dict[int, int] = {}
    s = make_session(CPUS)
    # warm up descending so every worker in the pool faults its arenas
    # with the FULL spec set (an hll-only warmup leaves the other five
    # sketches' arenas unfaulted and measured runs land half-cold)
    for par in sorted(levels, reverse=True):
        _timed(lambda p=par: build_files(s, CACHE, DEFAULT_SPECS,
                                         parallelism=p))
    _membw_control(s, max(levels))  # fault the control buffers once
    for _ in range(SCALING_ROUNDS):
        for par in levels:
            t, r = _timed(lambda p=par: build_files(s, CACHE, DEFAULT_SPECS,
                                                    parallelism=p))
            times[par].append(t)
            n_tok_by[par] = r.n_tokens
        for par in levels:
            bw[par].append(_membw_control(s, par))
    spin[8] = _spin_control(s, 8)
    if CPUS != 8:
        spin[CPUS] = _spin_control(s, CPUS)
    s.stop()

    def _med(xs):
        xs = sorted(xs)
        return xs[len(xs) // 2]

    for par in levels:
        spreads[f"tasks{par}"] = [round(x, 3) for x in sorted(times[par])]
        tput[f"tasks{par}"] = n_tok_by[par] / _med(times[par])
        queries[f"build_all_sketches_tasks{par}"] = _med(times[par])
    extras["tokens_per_sec"] = n_tokens / _med(spread8)

    def _effs(lo: int, hi: int, xs: dict[int, list[float]],
              invert: bool = False) -> list[float]:
        f = hi / lo
        pairs = zip(xs[lo], xs[hi])
        return [((b / a) if invert else (a / b)) / f for a, b in pairs]

    eff_2_8 = _effs(2, 8, times)
    bw_2_8 = _effs(2, 8, bw, invert=True)  # bandwidth: higher is better
    scaling = {
        "tokens_per_sec": dict(sorted(tput.items())),
        "build_sec_spread": spreads,
        "rounds": SCALING_ROUNDS,
        "efficiency_2_to_8": _med(eff_2_8),
        "efficiency_2_to_8_per_round": [round(e, 3) for e in sorted(eff_2_8)],
        "efficiency_2_to_8_from_min": min(times[2]) / min(times[8]) / 4.0,
        "membw_control_eff_2_to_8": _med(bw_2_8),
        "efficiency_2_to_8_normalized": _med(
            [e / b for e, b in zip(eff_2_8, bw_2_8)]),
    }
    if CPUS != 8:
        eff_8_32 = _effs(8, CPUS, times)
        bw_8_32 = _effs(8, CPUS, bw, invert=True)
        scaling.update({
            f"efficiency_8_to_{CPUS}": _med(eff_8_32),
            f"efficiency_8_to_{CPUS}_per_round":
                [round(e, 3) for e in sorted(eff_8_32)],
            f"efficiency_8_to_{CPUS}_from_min":
                min(times[8]) / min(times[CPUS]) / (CPUS / 8.0),
            f"membw_control_eff_8_to_{CPUS}": _med(bw_8_32),
            f"efficiency_8_to_{CPUS}_normalized": _med(
                [e / b for e, b in zip(eff_8_32, bw_8_32)]),
            "cpu_control_spin_eff_8_to_32":
                spin[CPUS] / spin[8] / (CPUS / 8.0),
        })
    scaling["note"] = (
        "same job, same input, same session; parallelism = task count "
        "(files per task), the single-box analog of executor count. "
        "Per-round efficiencies are within-phase ratios, medianed; "
        "_from_min uses min-of-K per level (additive-noise estimator); "
        "_normalized divides each round's build efficiency by the same "
        "round's in-Spark memory-bandwidth-control efficiency — the "
        "expected efficiency on a box whose memory system scales "
        "perfectly (e.g. one executor per NUMA node at cluster scale).")
    extras["scaling"] = scaling

    print(json.dumps({
        "metric": "bench_suite_total_sec",  # headline throughput is the
        # top-level tokens_per_sec field (tokens/sec, higher is better)
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]),
        **extras,
    }))


if __name__ == "__main__":
    main()
