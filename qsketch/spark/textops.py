"""Training-data pipeline text operators: dedup, fingerprints, quality.

Large-scale-pipeline additions around the sketch core (the MinHash /
SimHash paths REUSE the library's vectorized FNV-1a fingerprints and
the same map-side-partial philosophy: signatures are computed per
partition with zero pre-shuffle, and only compact signatures shuffle).

Scale notes (100 TB):
  * exact dedup: one hash-aggregate shuffle on a 16-byte digest — the
    minimum possible; AQE handles the (rare) giant duplicate-group skew.
  * MinHash LSH: candidate generation shuffles (band_id, band_sig) pairs
    (b rows/doc, ~24 bytes each), NOT shingle sets; verification joins
    token sets only for candidate pairs (semi-join pruned).
  * banding parameters choose recall: P(pair at sim s survives) =
    1-(1-s^r)^b; defaults (b=32, r=4) give miss prob < 1e-7 at s=0.8,
    which is what lets the LSH path match an exact-Jaccard oracle.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..hash import fnv1a64, fnv1a64_str_array, splitmix64

U64 = np.uint64


# ---------------- exact dedup ----------------------------------------------


def dedupe_exact(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per exact-duplicate text group.

    One shuffle on md5(text); duplicate detection is a plain
    hash-aggregate so Catalyst gets partial aggregation for free.
    """
    return (df.withColumn("__h", F.md5(F.col(text_col)))
              .groupBy("__h")
              .agg(F.min(id_col).alias(id_col),
                   F.count("*").alias("dup_count"))
              .drop("__h"))


def exact_dup_groups(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(digest, dup_count, keep_id) for groups with >1 copy."""
    return (df.groupBy(F.md5(F.col(text_col)).alias("digest"))
              .agg(F.count("*").alias("dup_count"),
                   F.min(id_col).alias("keep_id"))
              .where(F.col("dup_count") > 1))


# ---------------- shingles & MinHash ---------------------------------------


def _shingle_hashes(tokens: list[str], n: int) -> np.ndarray:
    """Distinct FNV-1a64 hashes of word n-gram shingles."""
    if len(tokens) < n:
        return np.empty(0, dtype=np.uint64)
    grams = [" ".join(tokens[i:i + n]) for i in range(len(tokens) - n + 1)]
    return np.unique(fnv1a64_str_array(grams))


def _minhash_sig(sh: np.ndarray, perm_mults: np.ndarray,
                 perm_adds: np.ndarray) -> np.ndarray:
    """k-permutation MinHash: min over (a_i * h + b_i) per permutation."""
    if sh.size == 0:
        return np.full(len(perm_mults), np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        vals = perm_mults[:, None] * sh[None, :] + perm_adds[:, None]
    return vals.min(axis=1)


def _perms(k: int, seed: int = 0x5EED) -> tuple[np.ndarray, np.ndarray]:
    base = splitmix64(np.arange(2 * k, dtype=np.uint64) + U64(seed))
    return (base[:k] | U64(1)), base[k:]


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", shingle_n: int = 3,
                       num_perm: int = 128) -> DataFrame:
    """(id, sig array<long>) — per-partition vectorized, zero shuffle."""
    mults, adds = _perms(num_perm)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(id_col)
            texts = batch.column(text_col).to_pylist()
            sigs = [
                _minhash_sig(_shingle_hashes(t.split(" ") if t else [],
                                             shingle_n),
                             mults, adds).view(np.int64)
                for t in texts
            ]
            arr = pa.array([s.tolist() for s in sigs],
                           type=pa.list_(pa.int64()))
            yield pa.RecordBatch.from_arrays([ids, arr], names=[id_col, "sig"])

    return df.select(id_col, text_col).mapInArrow(
        fn, f"{id_col} long, sig array<long>")


def lsh_candidate_pairs(sig_df: DataFrame, id_col: str = "doc_id",
                        bands: int = 32, rows: int = 4) -> DataFrame:
    """Band the signatures and self-join on (band, band-signature).

    Only (band_id, 8-byte band hash, id) rows shuffle.  Output: distinct
    (a, b) candidate id pairs with a < b.
    """
    def band_fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            ids = batch.column(id_col).to_numpy()
            sig = np.asarray(batch.column("sig").to_pylist(),
                             dtype=np.int64).view(np.uint64)
            out_ids, out_band, out_key = [], [], []
            for b in range(bands):
                chunk = sig[:, b * rows:(b + 1) * rows]
                key = fnv1a64(chunk[:, 0])
                with np.errstate(over="ignore"):
                    for r in range(1, rows):
                        key = (key ^ fnv1a64(chunk[:, r])) * U64(0x100000001B3)
                out_ids.append(ids)
                out_band.append(np.full(len(ids), b, dtype=np.int32))
                out_key.append(key.view(np.int64))
            yield pa.RecordBatch.from_arrays(
                [pa.array(np.concatenate(out_ids)),
                 pa.array(np.concatenate(out_band)),
                 pa.array(np.concatenate(out_key))],
                names=[id_col, "band", "band_key"])

    banded = sig_df.mapInArrow(band_fn, f"{id_col} long, band int, band_key long")
    left = banded.alias("l")
    right = banded.alias("r")
    return (left.join(right, ["band", "band_key"])
            .where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
            .select(F.col(f"l.{id_col}").alias("a"),
                    F.col(f"r.{id_col}").alias("b"))
            .distinct())


def jaccard_verify(df: DataFrame, pairs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", shingle_n: int = 3,
                   threshold: float = 0.8) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs; keeps sim >= threshold.

    Shingle sets are joined ONLY for candidate ids (semi-join pruned),
    so verification cost scales with candidates, not with the corpus.
    """
    ids = (pairs.select(F.col("a").alias(id_col))
                .union(pairs.select(F.col("b").alias(id_col))).distinct())
    docs = (df.join(ids, id_col, "semi")
              # guard: docs shorter than one shingle have no shingle set
              .where(F.size(F.split(F.col(text_col), " ")) >= shingle_n))
    shingles = (docs.select(
        id_col,
        F.explode(F.expr(
            f"transform(sequence(0, size(split({text_col}, ' ')) - {shingle_n}), "
            f"i -> array_join(slice(split({text_col}, ' '), i + 1, {shingle_n}), ' '))"
        )).alias("shingle")).distinct())
    sa = shingles.select(F.col(id_col).alias("a"), F.col("shingle"))
    sb = shingles.select(F.col(id_col).alias("b"), F.col("shingle"))
    inter = (pairs.join(sa, "a").join(sb, ["b", "shingle"])
                  .groupBy("a", "b").agg(F.count("*").alias("n_inter")))
    sizes = shingles.groupBy(id_col).agg(F.count("*").alias("n"))
    return (inter
            .join(sizes.select(F.col(id_col).alias("a"), F.col("n").alias("na")), "a")
            .join(sizes.select(F.col(id_col).alias("b"), F.col("n").alias("nb")), "b")
            .withColumn("jaccard", F.col("n_inter")
                        / (F.col("na") + F.col("nb") - F.col("n_inter")))
            .where(F.col("jaccard") >= threshold)
            .select("a", "b", "jaccard"))


def near_duplicates(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", shingle_n: int = 3,
                    threshold: float = 0.8, num_perm: int = 128,
                    bands: int = 32, rows: int = 4) -> DataFrame:
    """MinHash LSH -> exact-Jaccard verify.  With the default banding the

    miss probability at sim>=0.8 is <1e-7, so the output matches the
    exact O(n^2) Jaccard join while scaling as O(candidates)."""
    sigs = minhash_signatures(df, text_col, id_col, shingle_n, num_perm)
    cands = lsh_candidate_pairs(sigs, id_col, bands, rows)
    return jaccard_verify(df, cands, text_col, id_col, shingle_n, threshold)


# ---------------- SimHash ---------------------------------------------------


def simhash(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over word unigrams (charikar): sign-sum of

    fingerprint bits weighted by term frequency."""
    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        bit_idx = np.arange(64, dtype=np.uint64)
        for batch in batches:
            ids = batch.column(id_col)
            out = np.zeros(batch.num_rows, dtype=np.uint64)
            for i, t in enumerate(batch.column(text_col).to_pylist()):
                words = [w for w in t.split(" ") if w] if t else []
                if not words:
                    continue
                uniq, cnt = np.unique(words, return_counts=True)
                h = fnv1a64_str_array(uniq.tolist())
                bits = ((h[:, None] >> bit_idx[None, :]) & U64(1)).astype(np.int64)
                acc = ((2 * bits - 1) * cnt[:, None]).sum(axis=0)
                out[i] = np.sum((acc > 0).astype(np.uint64) << bit_idx)
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(out.view(np.int64))], names=[id_col, "simhash"])

    return df.select(id_col, text_col).mapInArrow(
        fn, f"{id_col} long, simhash long")


# ---------------- text analysis --------------------------------------------

_STOPWORDS = ("the a an and or of to in is are was were be been on at for "
              "with as by it this that").split()


def text_quality(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Deterministic quality features, all JVM-side (whole-stage codegen):

    char/token counts, mean word length, stopword ratio, alpha ratio."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_tok = F.size(toks)
    return df.select(
        id_col,
        F.length(text_col).alias("n_chars"),
        n_tok.alias("n_tokens"),
        (F.length(F.regexp_replace(F.col(text_col), " ", ""))
         / F.greatest(n_tok, F.lit(1))).alias("mean_word_len"),
        (F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
         / F.greatest(n_tok, F.lit(1))).alias("stopword_ratio"),
        (F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z]", ""))
         / F.greatest(F.length(text_col), F.lit(1))).alias("alpha_ratio"),
    )


def token_count_bpe_ish(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Token counting two ways: whitespace words and a BPE-ish regex

    (word pieces + digits + punctuation runs), both JVM-side."""
    words = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    pieces = F.expr(
        f"regexp_count({text_col}, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]+')")
    return df.select(id_col,
                     F.size(words).alias("n_words"),
                     pieces.cast("long").alias("n_pieces"))
