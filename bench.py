"""Benchmark harness — prints ONE JSON line for the driver.

Headline: tokens/sec two-phase sketch-build throughput (BASELINE.json)
over a deterministic synthetic tokenized_sequences table (FIXTURES.md
§1, 2M docs ~ 7.7e8 tokens), measured warm (steady state: Spark reuses
Python workers, so a long job's allocator arenas stay faulted-in — the
cold number is also reported).

Scaling evidence (north rule: two parallelism levels on the same
input): the same build runs at N=2, 4N=8, and 16N=32 cores; the JSON
carries throughput at each + efficiencies, PLUS two controls that
separate engine behavior from this microVM's memory system:
  * cpu_control: pure-CPU spin inside Spark tasks (framework+scheduler
    efficiency, no memory traffic),
  * the host's own first-touch/stream bandwidth scaling is documented
    in BASELINE.md — build efficiency tracks it ~1:1, i.e. the engine
    adds no cross-worker coupling of its own (zero data shuffle; only
    log-depth state merges).

Reproducibility: every throughput-bearing measurement is the MEDIAN of
QSKETCH_BENCH_RUNS (default 3) warm runs, and the JSON carries the full
[min, median, max] spread per parallelism level — single warm samples
on this host are not evidence (run-to-run variance up to 9x under
32-way oversubscription, see BASELINE.md host controls).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     QSKETCH_BENCH_DOCS (default 2000000),
     QSKETCH_BENCH_RUNS (default 3).
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


def main() -> None:
    from qsketch.spark.session import make_session

    queries: dict[str, float] = {}
    extras: dict[str, object] = {}
    tput: dict[int, float] = {}
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
    tput[8] = n_tokens / t_warm
    spreads = {"8": [round(t, 3) for t in spread8]}
    extras["tokens"] = n_tokens
    extras["tokens_per_sec"] = tput[8]
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

    # ---- scaling: INTERLEAVED rounds.  The host's memory bandwidth
    # drifts on a minutes scale, so measuring each level N times in a
    # row and ratioing medians mixes different host phases into the
    # efficiency (observed 0.58 vs 0.85 across otherwise-clean runs).
    # Instead each round measures every level back-to-back (fresh
    # session, one warmup build, one measured build) and the efficiency
    # is computed WITHIN the round, then medianed across rounds.
    levels = (2, 8, CPUS) if CPUS != 8 else (2, 8)
    times: dict[int, list[float]] = {c: [] for c in levels}
    n_tok_by: dict[int, int] = {}
    for _ in range(N_RUNS):
        for cpus in levels:
            s = make_session(cpus)
            # warm up with the FULL spec set: an hll-only warmup leaves
            # the other five sketches' allocator arenas unfaulted and
            # the measured run lands half-cold (observed +30-80%)
            _timed(lambda: build_files(s, CACHE, DEFAULT_SPECS))
            t, r = _timed(lambda: build_files(s, CACHE, DEFAULT_SPECS))
            times[cpus].append(t)
            n_tok_by[cpus] = r.n_tokens
            if cpus == CPUS and CPUS not in spin:
                spin[CPUS] = _spin_control(s, cpus)
            s.stop()

    def _med(xs):
        xs = sorted(xs)
        return xs[len(xs) // 2]

    for cpus in levels:
        spreads[str(cpus)] = [round(x, 3) for x in sorted(times[cpus])]
        tput[cpus] = n_tok_by[cpus] / _med(times[cpus])
        queries[f"build_all_sketches_local{cpus}"] = _med(times[cpus])
    # headline 8-core throughput: median over ALL 8-core runs this
    # bench made (main-session warms + interleaved rounds); the
    # reported spread covers that same sample set
    all8 = sorted(spread8 + times[8])
    spreads["8"] = [round(x, 3) for x in all8]
    tput[8] = n_tokens / _med(all8)
    extras["tokens_per_sec"] = tput[8]

    eff_2_8 = sorted(t2 / t8 / 4.0 for t2, t8 in zip(times[2], times[8]))
    eff_8_32 = (sorted(t8 / t32 / (CPUS / 8.0)
                       for t8, t32 in zip(times[8], times[CPUS]))
                if CPUS != 8 else [])
    extras["scaling"] = {
        "tokens_per_sec": {str(k): v for k, v in sorted(tput.items())},
        "build_sec_spread_min_med_max": spreads,
        "runs_per_level": N_RUNS,
        "efficiency_2_to_8": _med(eff_2_8),
        "efficiency_2_to_8_per_round": [round(e, 3) for e in eff_2_8],
        f"efficiency_8_to_{CPUS}": _med(eff_8_32) if eff_8_32 else None,
        f"efficiency_8_to_{CPUS}_per_round":
            [round(e, 3) for e in eff_8_32],
        "cpu_control_spin_eff_8_to_32":
            (spin.get(32, 0) / spin[8] / 4.0) if spin.get(32) else None,
        "note": ("per-round interleaved efficiencies (ratio taken within "
                 "one host phase), medianed; build efficiency tracks this "
                 "microVM's raw memory bandwidth (see BASELINE.md); "
                 "CPU-only control shows framework scaling"),
    }

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
