"""Embedding similarity search: brute-force cosine top-k + LSH-bucketed scale path.

Brute force is the exactness baseline: query vectors are BROADCAST
(they are few), the corpus side streams through a crossJoin with the
dot product computed JVM-side (zip_with + aggregate — whole-stage
codegen, no Python).  At 100 TB the scale path is sign-random-
projection LSH: each vector gets a compact bucket key from the sign
pattern of d_r random projections; candidates share a bucket, then
exact cosine re-ranks candidates only — the same
candidates-then-verify shape as textops.near_duplicates.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..hash import splitmix64


def _norm_expr(col: str):
    """L2 norm, floored at a denormal so a zero vector yields cosine 0.0

    instead of 0/0=NaN — Spark orders NaN above every number, so an
    unguarded NaN would pass any >= threshold filter and rank first in
    top-k.  For any nonzero norm greatest() is exact (no value change)."""
    return F.greatest(
        F.sqrt(F.aggregate(
            F.col(col), F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"))),
        F.lit(1e-300))


def _batch_matrix(col: pa.Array, dtype=np.float64) -> np.ndarray:
    """(n, dim) matrix from a list<float> Arrow column: flatten + reshape

    — one buffer copy for the whole batch, never a per-row Python list
    materialization."""
    if col.null_count:
        raise ValueError("embedding column contains nulls")
    n = len(col)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(dtype, copy=False)
    if n == 0:
        return flat.reshape(0, 0)
    offs = np.asarray(col.offsets)
    dims = np.diff(offs)
    if not np.all(dims == dims[0]):
        raise ValueError("ragged embedding column: rows differ in dim")
    return flat.reshape(n, int(dims[0]))


def _dot_expr(a: str, b: str):
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b),
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)


def _safe_cosine_expr(dot, n1: str, n2: str):
    """dot / (n1 * n2) with cosine = NULL for a zero-norm side: an
    all-zeros embedding (padding row, failed encoder) has no defined
    angle, and the raw division would raise DIVIDE_BY_ZERO under
    Spark's ANSI default instead of scoring the pair.  NULL is dropped
    by every ``cosine >= t`` filter and sorts below all scores in the
    top-k windows (desc => nulls last)."""
    denom = F.col(n1) * F.col(n2)
    return F.when(denom != 0.0, dot / denom)


def cosine_topk_bruteforce(corpus: DataFrame, queries: DataFrame, k: int = 10,
                           id_col: str = "vec_id", vec_col: str = "embedding",
                           query_id_col: str = "query_id") -> DataFrame:
    """Exact top-k neighbors per query vector.

    queries: (query_id, embedding).  The query side is broadcast; the
    big corpus never shuffles — a single narrow pass + a tiny top-k
    window on (query, sim).
    """
    # norms are hoisted into per-side projections BELOW the join, so each
    # is computed once per row, not once per (query, corpus-row) pair
    q = queries.select(F.col(query_id_col),
                       F.col(vec_col).alias("__qvec"),
                       _norm_expr(vec_col).alias("__qnorm"))
    c = corpus.select(id_col, vec_col, _norm_expr(vec_col).alias("__cnorm"))
    joined = c.crossJoin(F.broadcast(q))
    scored = joined.select(
        query_id_col, id_col,
        _safe_cosine_expr(_dot_expr(vec_col, "__qvec"),
                          "__cnorm", "__qnorm").alias("cosine"))
    return _topk(scored, k, query_id_col, id_col)


def _topk(scored: DataFrame, k: int, query_id_col: str,
          id_col: str) -> DataFrame:
    """row_number window top-k per query, deterministic tie-break on id.

    NULL-cosine rows (zero-norm corpus row against a zero-norm query —
    see _safe_cosine_expr) still receive ranks: desc ordering puts
    NULLs last, so they surface in the output only when k exceeds the
    number of defined scores.  Callers that must never return an
    unscored neighbor should filter cosine IS NOT NULL before calling."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"),
                                                 F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select(query_id_col, id_col, "cosine", "rank"))


def _probe_cells(qrows, centroids: np.ndarray, vec_col: str,
                 query_id_col: str, n_probe: int) -> list[tuple[int, int]]:
    """(query_id, cell) pairs for each query's n_probe nearest centroids;
    empty queries -> empty list (no numpy axis errors)."""
    if not qrows:
        return []
    qv = np.asarray([r[vec_col] for r in qrows], dtype=np.float64)
    qn = qv / np.maximum(np.linalg.norm(qv, axis=1, keepdims=True), 1e-12)
    cells = np.argsort(-(qn @ centroids.T), axis=1)[:, :n_probe]
    return [(int(r[query_id_col]), int(c))
            for r, cc in zip(qrows, cells) for c in cc]


def _rerank(cand: DataFrame, corpus: DataFrame, queries: DataFrame,
            id_col: str, vec_col: str, query_id_col: str) -> DataFrame:
    """Exact-cosine scoring of (query, candidate) pairs.  Norms are

    computed in per-side projections below the joins — once per corpus
    row / query row, not once per surviving pair."""
    q = queries.select(query_id_col, F.col(vec_col).alias("__qvec"),
                       _norm_expr(vec_col).alias("__qnorm"))
    c = corpus.select(id_col, vec_col, _norm_expr(vec_col).alias("__cnorm"))
    return (cand.join(c, id_col)
                .join(F.broadcast(q), query_id_col)
                .select(query_id_col, id_col,
                        _safe_cosine_expr(_dot_expr(vec_col, "__qvec"),
                                          "__cnorm", "__qnorm")
                        .alias("cosine")))


def srp_bucket_keys(df: DataFrame, dim: int, n_bits: int = 16,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    seed: int = 0xA11CE, n_tables: int = 4,
                    include_vec: bool = False) -> DataFrame:
    """Sign-random-projection LSH keys: ``n_tables`` independent

    ``n_bits``-bit bucket ids per vector (vectorized per Arrow batch).
    Deterministic projections derived from splitmix64(seed) — every
    executor regenerates the same planes, nothing is shipped.

    ``include_vec=True`` additionally carries the embedding on every
    key row (one copy per table) — the input to the bucket-local
    verify (:func:`_lsh_pairs_bucketed`), which needs each bucket's
    vectors co-located."""
    def planes(table: int) -> np.ndarray:
        raw = splitmix64(
            np.arange(dim * n_bits, dtype=np.uint64)
            + np.uint64(seed + 0x9E37 * table))
        # uniform [-1, 1) from the top 53 bits
        u = (raw >> np.uint64(11)).astype(np.float64) / float(1 << 53)
        return (2.0 * u - 1.0).reshape(n_bits, dim)

    mats = [planes(t) for t in range(n_tables)]
    # id column passes through with its incoming type — the API is
    # generic over id_col (string ids are common for document keys)
    id_t = df.schema[id_col].dataType.simpleString()
    vec_t = df.schema[vec_col].dataType.simpleString()

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        bit_w = (np.uint64(1) << np.arange(n_bits, dtype=np.uint64))
        for batch in batches:
            if batch.num_rows == 0:
                continue
            ids = batch.column(id_col)
            vcol = batch.column(vec_col)
            vecs = _batch_matrix(vcol)
            out_tab, out_key = [], []
            for t, m in enumerate(mats):
                signs = (vecs @ m.T) > 0
                keys = (signs.astype(np.uint64) * bit_w).sum(axis=1)
                out_tab.append(np.full(len(keys), t, dtype=np.int32))
                out_key.append(keys.view(np.int64))
            cols = [pa.concat_arrays([ids] * n_tables),
                    pa.array(np.concatenate(out_tab)),
                    pa.array(np.concatenate(out_key))]
            names = [id_col, "table", "bucket"]
            if include_vec:
                cols.append(pa.concat_arrays([vcol] * n_tables))
                names.append(vec_col)
            yield pa.RecordBatch.from_arrays(cols, names=names)

    schema = f"{id_col} {id_t}, table int, bucket long"
    if include_vec:
        schema += f", {vec_col} {vec_t}"
    return df.select(id_col, vec_col).mapInArrow(fn, schema)


def _grouped_pair_scores(keyed: DataFrame, key_cols: tuple[str, str],
                         threshold: float, id_col: str, vec_col: str,
                         block_col: str | None = None,
                         dedup: bool = True) -> DataFrame:
    """(a, b, cosine) with a < b and cosine >= threshold, scored PER

    ``key_cols`` group without ever materializing a pair-level frame:

      * no candidate-pair exchange: the only wide op is ONE hash
        exchange of the (id, keys, vector) rows — linear in the input;
      * no pair-level Python boundary: each group's vectors cross once
        and all i<j pairs score in-batch with a float64 einsum;
      * only above-threshold pairs leave Python.

    ``block_col`` is the blocked all-pairs mode (each row carries its
    block id; group key = an (i, j) block pair with i <= j): an
    off-diagonal group scores only cross-block pairs, the diagonal
    group scores everything — so every pair is emitted EXACTLY once
    and ``dedup=False`` skips the final collapse.  Without it (the LSH
    mode) a pair can appear once per shared bucket and ``dedup=True``
    collapses the repeats with a deterministic max (values differ by
    at most ~1 ulp between groups from einsum summation order —
    callers round to 6 dp before comparison, where a flip would need
    a cosine within 1e-10 of a rounding boundary).

    Groups are streamed from sortWithinPartitions(*key_cols) order
    with a carry across Arrow batch boundaries, so a group split over
    two batches still scores its cross-batch pairs.  Zero-norm sides
    reproduce the _safe_cosine_expr semantics (denominator underflow
    -> pair dropped, never a NaN passing the threshold)."""
    k0, k1 = key_cols
    part = (keyed.repartition(*key_cols)
                 .sortWithinPartitions(*key_cols))
    id_t = keyed.schema[id_col].dataType.simpleString()

    def pairs_of(ids: np.ndarray, X: np.ndarray,
                 blocks: np.ndarray | None, diagonal: bool):
        """All qualifying i<j pairs of one group via BLOCKED GEMM:
        row-block x full-matrix products keep peak scratch at
        ~RB x g x 8 B regardless of group size (a triu_indices
        materialization would be O(g^2) index memory — 800 MB for a
        10k-row group), and the dense product is what BLAS is fastest
        at anyway.  Only pairs passing the threshold are gathered."""
        g = len(ids)
        if g < 2:
            return None
        norms = np.maximum(np.sqrt(np.einsum("ij,ij->i", X, X)), 1e-300)
        out_a, out_b, out_c = [], [], []
        RB = max(1, (1 << 22) // g)  # ~32 MB of float64 scores per block
        for r0 in range(0, g - 1, RB):
            r1 = min(r0 + RB, g)
            scores = X[r0:r1] @ X.T                    # (b, g)
            denom = norms[r0:r1, None] * norms[None, :]
            ok = denom != 0.0
            cos = np.divide(scores, denom,
                            out=np.full_like(scores, -np.inf), where=ok)
            ri, j = np.nonzero(cos >= threshold)
            if not len(ri):
                continue
            i = ri + r0
            m = j > i                                  # upper triangle
            if blocks is not None and not diagonal:
                m &= blocks[i] != blocks[j]
            if not m.any():
                continue
            i, j = i[m], j[m]
            ia, jb = ids[i], ids[j]
            out_a.append(np.minimum(ia, jb))
            out_b.append(np.maximum(ia, jb))
            out_c.append(cos[ri[m], j])
        if not out_a:
            return None
        return (np.concatenate(out_a), np.concatenate(out_b),
                np.concatenate(out_c))

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pend = None  # (key, ids, X, blocks) of the trailing group

        def emit(res):
            a, b, c = res
            return pa.RecordBatch.from_arrays(
                [pa.array(a), pa.array(b),
                 pa.array(c, type=pa.float64())],
                names=["a", "b", "cosine"])

        def score(key, gids, gX, gblk):
            return pairs_of(gids, gX, gblk, diagonal=key[0] == key[1])

        for batch in batches:
            if batch.num_rows == 0:
                continue
            c0 = batch.column(k0).to_numpy(zero_copy_only=False)
            c1 = batch.column(k1).to_numpy(zero_copy_only=False)
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            blk = (batch.column(block_col).to_numpy(zero_copy_only=False)
                   if block_col else None)
            X = _batch_matrix(batch.column(vec_col))
            change = np.flatnonzero((c0[1:] != c0[:-1])
                                    | (c1[1:] != c1[:-1])) + 1
            bounds = np.concatenate(([0], change, [len(c0)]))
            outs = []
            # a deferred group that ended EXACTLY at the previous batch
            # boundary must flush now, or the next deferral would
            # silently drop it
            if pend is not None and pend[0] != (int(c0[0]), int(c1[0])):
                res = score(pend[0], pend[1], pend[2], pend[3])
                if res is not None:
                    outs.append(res)
                pend = None
            for k in range(len(bounds) - 1):
                s, e = int(bounds[k]), int(bounds[k + 1])
                gids, gX = ids[s:e], X[s:e]
                gblk = blk[s:e] if blk is not None else None
                key = (int(c0[s]), int(c1[s]))
                if pend is not None and pend[0] == key:
                    gids = np.concatenate([pend[1], gids])
                    gX = np.vstack([pend[2], gX])
                    if gblk is not None:
                        gblk = np.concatenate([pend[3], gblk])
                    pend = None
                if e == len(c0):
                    # the batch's last group may continue in the next
                    # batch of this partition — defer it
                    pend = (key, gids, gX, gblk)
                    break
                res = score(key, gids, gX, gblk)
                if res is not None:
                    outs.append(res)
            if outs:
                yield emit(tuple(np.concatenate(x)
                                 for x in zip(*outs)))
        if pend is not None:
            res = score(pend[0], pend[1], pend[2], pend[3])
            if res is not None:
                yield emit(res)

    scored = part.mapInArrow(fn, f"a {id_t}, b {id_t}, cosine double")
    if not dedup:
        return scored
    return scored.groupBy("a", "b").agg(F.max("cosine").alias("cosine"))


def _lsh_pairs_bucketed(keyed: DataFrame, threshold: float,
                        id_col: str, vec_col: str) -> DataFrame:
    """LSH mode of :func:`_grouped_pair_scores`: same candidate set as
    the bucket self-join + distinct + vector-attach joins + pair-level
    verify it replaced (a pair is emitted iff it shares >= 1
    (table, bucket) and passes the threshold), with the quadratic
    intermediates never materializing."""
    return _grouped_pair_scores(keyed, ("table", "bucket"), threshold,
                                id_col, vec_col)


def _allpairs_blocked(corpus: DataFrame, threshold: float, id_col: str,
                      vec_col: str, n_blocks: int | None = None) -> DataFrame:
    """Exact all-pairs cosine >= threshold via deterministic block
    pairs — the distributed replacement for a crossJoin + per-element
    Catalyst dot product (measured ~11 s at sf0.1: one interpreted
    lambda eval per vector ELEMENT per pair).

    Each vector gets block b = pmod(xxhash64(id), B) and is routed to
    every block-pair group (min(b, x), max(b, x)); an off-diagonal
    group scores only cross-block pairs and the diagonal scores
    within-block pairs, so every pair is scored exactly once — no
    cartesian join node, no corpus broadcast/collect, and the shuffle
    is B x corpus bytes (B ~ sqrt(2 x shuffle partitions), so group
    count ~ partition count).  Still O(n^2) COMPUTE by definition —
    that is what "exact" means — but vectorized einsum instead of
    interpreted expression evaluation."""
    spark = corpus.sparkSession
    if n_blocks is None:
        parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        n_blocks = max(2, int(np.ceil(np.sqrt(2.0 * parts))))
    blk = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int")
    groups = F.array(*[
        F.struct(F.least(F.col("__blk"), F.lit(x)).alias("gi"),
                 F.greatest(F.col("__blk"), F.lit(x)).alias("gj"))
        for x in range(n_blocks)])
    keyed = (corpus.select(id_col, vec_col, blk.alias("__blk"))
             .select(id_col, vec_col, "__blk",
                     F.explode(groups).alias("__g"))
             .select(id_col, vec_col, "__blk",
                     F.col("__g.gi").alias("__gi"),
                     F.col("__g.gj").alias("__gj")))
    return _grouped_pair_scores(keyed, ("__gi", "__gj"), threshold,
                                id_col, vec_col, block_col="__blk",
                                dedup=False)


def train_ivf_centroids(corpus: DataFrame, dim: int, n_cells: int = 64,
                        sample: int = 4096, iters: int = 10,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        seed: int = 0x1F5) -> np.ndarray:
    """Deterministic spherical k-means centroids from a hash-sampled

    subset (no RNG on workers: the sample is ``xxhash-style`` selected by
    id, initial centroids are splitmix-chosen sample rows, Lloyd
    iterations run driver-side on the small sample)."""
    from ..hash import splitmix64

    # ORDER BY a content hash makes the limit deterministic regardless of
    # partition layout or scan order (a bare limit() is plan-dependent).
    # Spark executes orderBy+limit as TakeOrdered (per-partition top-k,
    # no full sort, no extra count() scan of the corpus).
    samp = (corpus.select(id_col, vec_col)
            .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
            .limit(sample).collect())
    if not samp:
        raise ValueError("empty corpus: cannot train IVF centroids")
    x = np.asarray([r[vec_col] for r in samp], dtype=np.float64)
    if x.ndim != 2 or x.size == 0:
        raise ValueError("empty/degenerate IVF training sample")
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    n_cells = min(n_cells, len(x))
    idx = (splitmix64(np.arange(n_cells, dtype=np.uint64) + np.uint64(seed))
           % np.uint64(len(x))).astype(np.int64)
    cent = x[np.unique(idx)]
    while len(cent) < n_cells:  # pad duplicates-collapsed init
        cent = np.vstack([cent, x[len(cent) % len(x)]])
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(n_cells):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def ivf_assign(df: DataFrame, centroids: np.ndarray,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(id, cell) — vectorized nearest-centroid assignment per batch."""
    cent = np.ascontiguousarray(centroids)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            vecs = _batch_matrix(batch.column(vec_col))
            # not in-place: _batch_matrix may be a read-only zero-copy
            # view when the source column is already float64
            vecs = vecs / np.maximum(
                np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
            cells = (vecs @ cent.T).argmax(axis=1).astype(np.int32)
            yield pa.RecordBatch.from_arrays(
                [batch.column(id_col), pa.array(cells)], names=[id_col, "cell"])

    return df.select(id_col, vec_col).mapInArrow(fn, f"{id_col} long, cell int")


def cosine_topk_ivf(corpus: DataFrame, queries: DataFrame, dim: int,
                    k: int = 10, n_cells: int = 64, n_probe: int = 8,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    query_id_col: str = "query_id",
                    centroids: np.ndarray | None = None) -> DataFrame:
    """IVF-flat ANN: corpus bucketed by nearest centroid; each query

    scans its ``n_probe`` closest cells; exact cosine re-ranks the
    candidates.  At 100 TB the assignment is a narrow pass, the bucketed
    corpus is written partitioned by cell, and a query touches
    n_probe/n_cells of the data."""
    if centroids is None:
        centroids = train_ivf_centroids(corpus, dim, n_cells,
                                        id_col=id_col, vec_col=vec_col)
    ck = ivf_assign(corpus, centroids, id_col, vec_col)
    pairs = _probe_cells(queries.collect(), centroids, vec_col,
                         query_id_col, n_probe)
    spark = corpus.sparkSession
    probes = spark.createDataFrame(pairs, f"{query_id_col} long, cell int")
    cand = (ck.join(F.broadcast(probes), "cell")
              .select(query_id_col, id_col).distinct())
    scored = _rerank(cand, corpus, queries, id_col, vec_col, query_id_col)
    return _topk(scored, k, query_id_col, id_col)


def embedding_near_duplicates(corpus: DataFrame, threshold: float = 0.95,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              method: str = "lsh", dim: int | None = None,
                              n_bits: int = 8, n_tables: int = 16) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b, cosine) with a < b

    and cosine >= threshold.

    method="exact": all pairs scored, via deterministic block pairs
    (:func:`_allpairs_blocked`) — every pair lands in exactly one
    block-pair group and scores there with a vectorized einsum, so
    there is no cartesian join node and no pair-level frame; O(n^2)
    compute by definition (that is what exact means), distributed over
    ~partition-count groups.  method="lsh": SRP buckets generate
    candidates, exact cosine verifies — the 100-TB path; recall grows
    with n_tables (P[miss] = (1-(1-theta/pi)^bits)^tables for angle
    theta; defaults give >0.999 at cosine 0.95)."""
    if method == "exact":
        return _allpairs_blocked(corpus, threshold, id_col, vec_col)
    elif method == "lsh":
        if dim is None:
            first = corpus.select(vec_col).first()
            dim = len(first[0]) if first is not None else 1  # empty corpus
        # bucket-LOCAL verify (see _lsh_pairs_bucketed): same candidate
        # semantics as the bucket self-join it replaces, but the only
        # wide op is one linear key-row exchange — no quadratic
        # candidate distinct, no per-pair vector shipping (at a LOW
        # threshold the candidate set approaches all-pairs, which made
        # both of those the dominant cost of this query)
        keys = srp_bucket_keys(corpus, dim, n_bits, id_col, vec_col,
                               n_tables=n_tables, include_vec=True)
        return _lsh_pairs_bucketed(keys, threshold, id_col, vec_col)
    else:
        raise ValueError(f"unknown method {method!r}")


class IVFIndex:
    """Persisted IVF index: corpus written partitioned by cell, centroids

    stored alongside.  A query scans ONLY its n_probe cells — partition
    pruning at the file source (cell is a hive partition column), so at
    100 TB a top-k touches n_probe/n_cells of the files instead of
    re-assigning the corpus per call (which is what cosine_topk_ivf does
    when handed a raw corpus)."""

    def __init__(self, path: str, centroids: np.ndarray,
                 id_col: str, vec_col: str):
        self.path = path
        self.centroids = centroids
        self.id_col = id_col
        self.vec_col = vec_col

    @classmethod
    def build(cls, corpus: DataFrame, dim: int, path: str, n_cells: int = 64,
              id_col: str = "vec_id", vec_col: str = "embedding",
              sample: int = 4096, seed: int = 0x1F5) -> "IVFIndex":
        import pyarrow as _pa
        import pyarrow.parquet as _pq

        centroids = train_ivf_centroids(corpus, dim, n_cells, sample,
                                        id_col=id_col, vec_col=vec_col,
                                        seed=seed)
        ck = ivf_assign(corpus, centroids, id_col, vec_col)
        (corpus.select(id_col, vec_col).join(ck, id_col)
               .write.partitionBy("cell").mode("overwrite")
               .parquet(f"{path}/cells"))
        flat = _pa.table({
            "cell": np.repeat(np.arange(len(centroids), dtype=np.int32),
                              centroids.shape[1]),
            "component": np.tile(np.arange(centroids.shape[1],
                                           dtype=np.int32), len(centroids)),
            "value": centroids.reshape(-1),
        })
        _pq.write_table(flat, f"{path}/centroids.parquet")
        return cls(path, centroids, id_col, vec_col)

    @classmethod
    def load(cls, path: str, id_col: str = "vec_id",
             vec_col: str = "embedding") -> "IVFIndex":
        import pyarrow.parquet as _pq

        t = _pq.read_table(f"{path}/centroids.parquet")
        cells = t.column("cell").to_numpy()
        comp = t.column("component").to_numpy()
        vals = t.column("value").to_numpy()
        n_cells = int(cells.max()) + 1
        dim = int(comp.max()) + 1
        cent = np.zeros((n_cells, dim), dtype=np.float64)
        cent[cells, comp] = vals
        return cls(path, cent, id_col, vec_col)

    def query(self, spark, queries: DataFrame, k: int = 10,
              n_probe: int = 8, query_id_col: str = "query_id") -> DataFrame:
        """Exact cosine over the n_probe nearest cells per query; the

        cell IN (...) filter prunes partitions at the scan."""
        pairs = _probe_cells(queries.collect(), self.centroids,
                             self.vec_col, query_id_col, n_probe)
        wanted = sorted({c for _, c in pairs})
        probes = spark.createDataFrame(pairs, f"{query_id_col} long, cell int")
        corpus = (spark.read.parquet(f"{self.path}/cells")
                  .where(F.col("cell").isin(wanted or [-1])))
        cand = (corpus.join(F.broadcast(probes), "cell")
                      .select(query_id_col, self.id_col).distinct())
        scored = _rerank(cand, corpus.drop("cell"), queries,
                         self.id_col, self.vec_col, query_id_col)
        return _topk(scored, k, query_id_col, self.id_col)


def cosine_topk_lsh(corpus: DataFrame, queries: DataFrame, dim: int,
                    k: int = 10, n_bits: int = 12, n_tables: int = 8,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    query_id_col: str = "query_id") -> DataFrame:
    """Approximate top-k: SRP buckets generate candidates (corpus rows

    sharing any bucket with a query), exact cosine re-ranks candidates
    only.  Recall rises with n_tables; cost scales with bucket
    collision counts, not |corpus| x |queries|."""
    ck = srp_bucket_keys(corpus, dim, n_bits, id_col, vec_col,
                         n_tables=n_tables)
    qk = srp_bucket_keys(
        queries.select(F.col(query_id_col).alias(id_col), vec_col),
        dim, n_bits, id_col, vec_col, n_tables=n_tables)
    cand = (ck.join(qk.withColumnRenamed(id_col, query_id_col)
                    .hint("broadcast"), ["table", "bucket"])
              .select(query_id_col, id_col).distinct())
    scored = _rerank(cand, corpus, queries, id_col, vec_col, query_id_col)
    return _topk(scored, k, query_id_col, id_col)
