"""North-rule invariants: per-row token-array equality + Spark-builtin

cross-checks of our sketch estimates (SURVEY.md §2.5 table)."""

import numpy as np
import pytest

import pyspark.sql.functions as F

from qsketch.spark.agg import DEFAULT_SPECS, SketchSpec, build
from qsketch.spark.io import generate_tokenized


def test_per_row_token_array_equality(spark, tmp_path):
    """BASELINE.json: 'token-array equality is preserved per row against
    the reference input' — generation is a pure function of (seed,
    doc_id) regardless of partitioning, and a build pass over the table
    mutates nothing."""
    p = str(tmp_path / "inv")
    df1 = generate_tokenized(spark, 300, seed=42, num_partitions=4)
    df1.write.parquet(p)
    before = {r["doc_id"]: r["tokens"] for r in
              spark.read.parquet(p).collect()}

    # run a full build over the stored table (the 'processing')
    build(spark.read.parquet(p), DEFAULT_SPECS)

    after = {r["doc_id"]: r["tokens"] for r in
             spark.read.parquet(p).collect()}
    regen = {r["doc_id"]: r["tokens"] for r in
             generate_tokenized(spark, 300, seed=42, num_partitions=11).collect()}
    assert before == after, "build mutated the input table"
    assert before == regen, "generation is not partition-independent"
    # invariant n_tok == size(tokens) holds on every row
    bad = (spark.read.parquet(p)
           .where(F.size("tokens") != F.col("n_tok")).count())
    assert bad == 0


def test_hll_matches_spark_builtin(spark, tiny_df):
    """Cross-check vs Spark's own HLL++ (approx_count_distinct) and the
    exact count — both must land inside our published bound."""
    res = build(tiny_df, (SketchSpec("hll", "tokens"),))
    ours = res.sketches["hll:tokens"].estimate()
    ex = tiny_df.select(F.explode("tokens").alias("t"))
    exact = ex.select("t").distinct().count()
    spark_est = ex.agg(F.approx_count_distinct("t", rsd=0.01).alias("e")).first()["e"]
    bound = 4 * res.sketches["hll:tokens"].rel_std_error()
    assert abs(ours - exact) / exact <= bound
    assert abs(ours - spark_est) / exact <= bound + 0.03  # both near exact


def test_cms_matches_spark_builtin(spark, tiny_df):
    """Spark SQL count_min_sketch exists as a builtin aggregate; our CMS
    point estimates must agree with exact counts at least as well."""
    ex = tiny_df.select(F.explode("tokens").alias("t"))
    exact = {r["t"]: r["c"] for r in
             ex.groupBy("t").agg(F.count("*").alias("c")).collect()}
    res = build(tiny_df, (SketchSpec("cms", "tokens"),))
    cms = res.sketches["cms:tokens"]
    top = sorted(exact, key=exact.get, reverse=True)[:50]
    est = cms.estimate(np.array(top, dtype=np.int64))
    true = np.array([exact[t] for t in top])
    assert (est >= true).all()
    assert (est - true <= cms.error_bound()).all()


def test_quantiles_match_spark_builtin(spark, tiny_df):
    """percentile_approx (GK) vs our KLL on the same column."""
    res = build(tiny_df, (SketchSpec("kll", "n_tok"),))
    qs = [0.25, 0.5, 0.75]
    ours = res.sketches["kll:n_tok"].quantiles(qs)
    spark_q = tiny_df.agg(F.percentile_approx(
        "n_tok", qs, 10000).alias("q")).first()["q"]
    n = tiny_df.count()
    vals = np.sort(np.array([r["n_tok"] for r in tiny_df.select("n_tok").collect()]))
    for q, a, b in zip(qs, ours, spark_q):
        ra = np.searchsorted(vals, a, side="right") / n
        rb = np.searchsorted(vals, b, side="right") / n
        assert abs(ra - q) <= 0.02
        assert abs(ra - rb) <= 0.03
