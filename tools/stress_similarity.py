"""Scale drill for the similarity operators: 100k embedding vectors
(50x the sf0.1 table), local[8].  Builds the persisted IVF index,
queries it at n_probe << n_cells, and measures recall against the
brute-force exact top-k for the same queries; also runs the SRP-LSH
path.  Prints one JSON line of wall times + recalls.

Usage: python tools/stress_similarity.py [n_vecs] [dim] [cpus]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_VECS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 64
CPUS = int(sys.argv[3]) if len(sys.argv) > 3 else 8
N_QUERIES = 10
K = 10


def main() -> None:
    import numpy as np
    import pyarrow as pa

    from pyspark.sql import functions as F

    from qsketch.hash import splitmix64
    from qsketch.spark.session import make_session
    from qsketch.spark.similarity import (IVFIndex, cosine_topk_bruteforce,
                                          cosine_topk_lsh)

    spark = make_session(CPUS, app="qsketch-stress-sim")

    N_CENTERS = 256  # real embedding spaces are clustered; isotropic
    # gaussians are the no-structure worst case where ANN degrades to
    # sampling by construction (documented in SCALE.md)

    def _gauss(base: "np.ndarray") -> "np.ndarray":
        u1 = (splitmix64(base) >> np.uint64(11)).astype(np.float64) \
            / float(1 << 53)
        u2 = (splitmix64(base + np.uint64(0x9E37)) >> np.uint64(11)) \
            .astype(np.float64) / float(1 << 53)
        return np.sqrt(-2.0 * np.log(np.maximum(u1, 1e-12))) \
            * np.cos(2 * np.pi * u2)

    def gen(batches):
        # deterministic per-id clustered vectors: center(id % 256) + noise
        for batch in batches:
            ids = batch.column("id").to_numpy()
            n = len(ids)
            dims = np.arange(DIM, dtype=np.uint64)[None, :]
            cent_base = ((ids % N_CENTERS)[:, None].astype(np.uint64)
                         * np.uint64(DIM) + dims + np.uint64(0xCE17E5))
            noise_base = (ids[:, None].astype(np.uint64) * np.uint64(DIM)
                          + dims)
            g = _gauss(cent_base) + 0.35 * _gauss(noise_base)
            flat = g.reshape(-1)
            offs = pa.array(np.arange(0, (n + 1) * DIM, DIM, dtype=np.int32))
            arr = pa.ListArray.from_arrays(offs, pa.array(flat))
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids), arr], names=["vec_id", "embedding"])

    emb = (spark.range(0, N_VECS, 1, CPUS * 4)
           .mapInArrow(gen, "vec_id long, embedding array<double>")
           .persist())
    emb.count()
    qs = (emb.where(F.col("vec_id") < N_QUERIES)
             .select(F.col("vec_id").alias("query_id"), "embedding"))

    times: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        times[name] = round(time.perf_counter() - t0, 2)
        return out

    exact = timed("bruteforce_topk", lambda: {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk_bruteforce(emb, qs, k=K).collect()})

    path = tempfile.mkdtemp(prefix="qsketch-stress-ivf-")
    try:
        idx = timed("ivf_index_build",
                    lambda: IVFIndex.build(emb, dim=DIM, path=path,
                                           n_cells=64))
        got = timed("ivf_index_query_probe8", lambda: {
            (r["query_id"], r["vec_id"])
            for r in idx.query(spark, qs, k=K, n_probe=8).collect()})
        ivf_recall = len(got & exact) / len(exact)

        lsh = timed("lsh_topk", lambda: {
            (r["query_id"], r["vec_id"])
            for r in cosine_topk_lsh(emb, qs, dim=DIM, k=K, n_bits=12,
                                     n_tables=8).collect()})
        lsh_recall = len(lsh & exact) / len(exact)
    finally:
        shutil.rmtree(path, ignore_errors=True)

    print(json.dumps({"n_vecs": N_VECS, "dim": DIM, "cpus": CPUS,
                      "ivf_recall_probe8of64": round(ivf_recall, 3),
                      "lsh_recall": round(lsh_recall, 3),
                      "sec": times}))
    spark.stop()


if __name__ == "__main__":
    main()
