"""Round-6 per-query timing harness (bench.py is frozen for the driver;
this file carries the optimization round's extra measurements).

Times every declared query bench.py times, with the same methodology
(local[8] session via make_session, median of 3 warm .collect() runs),
plus optional noop-sink isolation for any query named on the command
line.  Prints one JSON line.

Usage:
    python bench_extra.py                # all bench queries
    python bench_extra.py q1 q2 ...      # just these queries
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH_QUERIES = (
    "qf_membership", "cms_heavy_hitters", "cms_heavy_hitters_sketch",
    "cms_heavy_hitters_by_source", "token_counts_top50",
    "kll_nchars_quantiles", "near_duplicates", "simhash_near_duplicates",
    "simhash_near_duplicates_idf", "near_duplicate_rescue",
    "contamination_check", "repeated_ngrams", "duplicated_spans",
    "scrub_duplicated_spans", "pack_sequences", "budget_sample_sources",
    "cosine_topk", "source_token_overlap", "kmv_saturated_overlap",
    "embedding_near_duplicates_lsh", "sample_docs_per_source",
    "mix_sources", "pii_scrub_counts", "quantile_trim_stats",
    "curation_pipeline", "source_token_divergence", "stratified_split",
    "split_leakage", "epoch_shuffle", "token_frequency_histogram",
    "token_rarity_scores", "vocabulary_growth",
    "stream_windowed_token_rate",
)


def main(*names: str) -> None:
    import __spark_entry__ as entrymod
    from qsketch.spark.session import make_session

    spark = make_session(8)
    qs = entrymod.queries()
    todo = names or BENCH_QUERIES
    out: dict[str, float] = {}
    for name in todo:
        fn = qs[name]
        runs = 1 if name == "stream_windowed_token_rate" else 3
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        out[name] = round(ts[len(ts) // 2], 3)
    spark.stop()
    print(json.dumps({"sf_dir": SF_DIR,
                      "total": round(sum(out.values()), 3),
                      "queries": out}, separators=(",", ":")))


if __name__ == "__main__":
    main(*sys.argv[1:])
