"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: tokens/sec two-phase sketch-build throughput
(BASELINE.json) over a deterministic synthetic tokenized_sequences
table (FIXTURES.md §1 'bench' shape, scaled down to keep per-round
runtime sane), plus the sf-dir query suite.

Scaling evidence (north rule: >=0.8 efficiency from N to 4N executors,
evidenced in-sandbox as local[8] vs local[32] on the SAME input):
the build runs at both parallelism levels; efficiency =
(throughput_4N / throughput_N) / 4.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     QSKETCH_BENCH_DOCS (default 400000 docs ~ 1.2e8 tokens).
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
SCALING_CPUS = max(2, CPUS // 4)
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_cache", f"tokenized_{N_DOCS}")


def _session(cpus: int):
    from pyspark.sql import SparkSession

    return (SparkSession.builder.master(f"local[{cpus}]")
            .appName(f"qsketch-bench-{cpus}")
            .config("spark.sql.shuffle.partitions", str(cpus))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.driver.memory", "48g")
            .config("spark.ui.enabled", "false")
            .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
            .config("spark.sql.files.maxPartitionBytes", "64m")
            .getOrCreate())


def _ensure_synth(spark):
    from qsketch.spark.io import write_tokenized

    if not os.path.exists(os.path.join(CACHE, "_SUCCESS")):
        write_tokenized(spark, CACHE, N_DOCS, seed=42,
                        num_partitions=max(CPUS * 2, 32))
    return CACHE


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def _build_once(spark, path):
    from qsketch.spark.agg import DEFAULT_SPECS, build

    df = spark.read.parquet(path)
    return build(df, DEFAULT_SPECS, fanin=16)


def main() -> None:
    queries: dict[str, float] = {}
    extras: dict[str, object] = {}

    spark = _session(CPUS)
    path = _ensure_synth(spark)

    # warm the JVM + every Python worker so the headline number measures
    # the pipeline, not interpreter startup
    from qsketch.spark.agg import SketchSpec as _S, build as _b
    from qsketch.spark.io import generate_tokenized as _g
    _b(_g(spark, 5000, num_partitions=CPUS * 2), (_S("hll", "tokens"),))

    t_build, res = _timed(lambda: _build_once(spark, path))
    queries["build_all_sketches"] = t_build
    n_tokens = res.n_tokens
    tput_4n = n_tokens / t_build
    extras["tokens"] = n_tokens
    extras["tokens_per_sec"] = tput_4n
    extras["qf_cardinality"] = res.sketches["quotient:tokens"].cardinality()

    from qsketch.spark.agg import SketchSpec, build_grouped

    t_grouped, _ = _timed(lambda: build_grouped(
        spark.read.parquet(path),
        (SketchSpec("quotient", "tokens"), SketchSpec("hll", "tokens")),
        "source").collect())
    queries["grouped_build_by_source"] = t_grouped

    # sf-dir query suite (the driver's correctness queries, timed)
    import __spark_entry__ as entrymod

    for name in ("qf_membership", "cms_heavy_hitters", "token_counts_top50",
                 "kll_nchars_quantiles"):
        fn = entrymod.queries()[name]
        t, _ = _timed(lambda: fn(spark, SF_DIR).collect())
        queries[name] = t
    spark.stop()

    # scaling run at N = CPUS/4 cores, same input
    spark8 = _session(SCALING_CPUS)
    t8, _ = _timed(lambda: _build_once(spark8, path))
    spark8.stop()
    queries[f"build_all_sketches_local{SCALING_CPUS}"] = t8
    tput_n = n_tokens / t8
    eff = (tput_4n / tput_n) / (CPUS / SCALING_CPUS)
    extras["scaling"] = {
        "cpus_n": SCALING_CPUS, "cpus_4n": CPUS,
        "tokens_per_sec_n": tput_n, "tokens_per_sec_4n": tput_4n,
        "efficiency": eff,
    }

    print(json.dumps({
        "metric": "sketch_build_tokens_per_sec",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]),
        **extras,
    }))


if __name__ == "__main__":
    main()
