"""Scale drill for the text-pipeline operators: 100k+ documents
(20x the sf0.1 corpus) with PLANTED exact and near duplicates, on
local[8].  Checks that the vectorized paths hold their shape at volume
(no quadratic blowups, planted dups recovered) and prints one JSON line
of wall times.

Usage: python tools/stress_textops.py [n_docs] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
N_CLONES = 500       # exact duplicates of distinct base docs
N_NEAR = 500         # single-token-edited near duplicates


def main() -> None:
    from pyspark.sql import functions as F

    from qsketch.spark.io import generate_tokenized
    from qsketch.spark.session import make_session
    from qsketch.spark.textops import (dedupe_exact, language_id,
                                       near_duplicates,
                                       simhash_near_duplicates,
                                       winnow_fingerprints)

    spark = make_session(CPUS, app="qsketch-stress")
    # text corpus derived deterministically from the tokenized table:
    # token ids -> 't<id>' words (same Zipf shape as real tokens)
    base = (generate_tokenized(spark, N_DOCS, seed=77,
                               num_partitions=CPUS * 4)
            .select(F.xxhash64("doc_id").alias("doc_id"),
                    F.array_join(
                        F.transform("tokens",
                                    lambda t: F.concat(F.lit("t"),
                                                       t.cast("string"))),
                        " ").alias("text")))
    # plant exact clones and one-token-edited near-dups of the first rows
    seeds = base.limit(N_CLONES + N_NEAR).collect()
    clones = [(r["doc_id"] + 1, r["text"]) for r in seeds[:N_CLONES]]
    near = []
    for r in seeds[N_CLONES:]:
        w = r["text"].split(" ")
        if len(w) >= 8:
            w[3] = "EDITED"
        near.append((r["doc_id"] + 2, " ".join(w)))
    planted = spark.createDataFrame(clones + near, "doc_id long, text string")
    docs = base.unionByName(planted).persist()
    n = docs.count()

    times: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        times[name] = round(time.perf_counter() - t0, 2)
        return out

    n_groups = timed("dedupe_exact",
                     lambda: dedupe_exact(docs).count())
    assert n_groups <= n - N_CLONES, (n_groups, n)

    # near-dup at volume NEEDS the bucket cap (planted clones flood
    # bands); exact clones are exact-dedup's job, near-edits survive
    pairs = timed("near_duplicates_capped",
                  lambda: near_duplicates(docs, threshold=0.8,
                                          max_bucket=200).count())
    # clone pairs (jaccard 1.0) AND near-edit pairs must both surface:
    # clone-only recovery would still pass a N_NEAR*0.9 bar
    assert pairs >= (N_CLONES + N_NEAR) * 0.9, pairs

    sh_pairs = timed("simhash_near_duplicates",
                     lambda: simhash_near_duplicates(
                         docs, max_hamming=3, max_bucket=200).count())
    assert sh_pairs >= N_CLONES * 0.9, sh_pairs  # clones are hamming-0

    # idf-weighted simhash: the Zipf head no longer dominates the
    # sign-sums, so the spurious unrelated-doc pairs collapse while
    # exact clones (identical hash at any weighting) remain
    shw_pairs = timed("simhash_near_duplicates_idf",
                      lambda: simhash_near_duplicates(
                          docs, max_hamming=3, max_bucket=200,
                          idf_weighted=True).count())
    assert shw_pairs >= N_CLONES * 0.9, shw_pairs
    assert shw_pairs < sh_pairs / 4, (shw_pairs, sh_pairs)

    timed("language_id", lambda: language_id(docs).count())
    timed("winnow_fingerprints",
          lambda: winnow_fingerprints(docs).count())

    # --- rescue at volume: a 10k-doc flooded near-identical cluster
    # (10% of 100k) that any cap must sacrifice; the rescue path must
    # recover it at LINEAR cost and grouping must collapse it to ONE
    # group while every other doc stays a singleton
    from qsketch.spark.textops import connected_components, near_duplicate_groups

    base_text = " ".join(f"c{i:03d}" for i in range(58))
    n_cluster = min(max(N_DOCS // 10, 1000), N_DOCS)

    def gen_cluster(it):
        import pandas as pd
        for pdf in it:
            ids = pdf["id"].to_numpy()
            yield pd.DataFrame({
                "doc_id": ids,
                "text": [f"{base_text} u{i}a u{i}b" if i < n_cluster
                         else " ".join(f"v{i}_{j}" for j in range(40))
                         for i in ids]})

    rdocs = (spark.range(0, N_DOCS, 1, CPUS * 4)
             .mapInPandas(gen_cluster, "doc_id long, text string")
             .persist())
    rdocs.count()
    rescued = timed("near_dup_groups_rescued", lambda: (
        near_duplicate_groups(rdocs, max_bucket=64, rescue_oversized=True)
        .groupBy((F.col("group_id") == F.col("doc_id")).alias("own"))
        .count().collect()))
    by_own = {r["own"]: r["count"] for r in rescued}
    # one group rep (doc 0) + all fillers map to self; cluster members
    # (minus the rep) map elsewhere
    assert by_own.get(False, 0) == n_cluster - 1, by_own
    rdocs.unpersist()

    # --- connected-components depth at volume: a 50k-node PATH graph
    # (diameter 49,999) must converge within the default 25 rounds —
    # the O(log diameter) path-halving claim, measured
    chain = spark.range(0, 50_000 - 1, 1, CPUS).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b"))
    n_comp = timed("cc_50k_path", lambda: (
        connected_components(chain).select("comp").distinct().count()))
    assert n_comp == 1, n_comp

    print(json.dumps({"n_docs": int(n), "cpus": CPUS,
                      "near_pairs": int(pairs),
                      "simhash_pairs": int(sh_pairs),
                      "simhash_pairs_idf": int(shw_pairs),
                      "rescued_cluster_docs": n_cluster,
                      "sec": times}))
    spark.stop()


if __name__ == "__main__":
    main()
