"""End-to-end spark-submit entry point (qsketch.cli.main) drills:
plain build, grouped build, checkpointed resume with auto run-id."""

import json
import os

import numpy as np
import pytest

from qsketch import base
from qsketch.spark.io import generate_tokenized


@pytest.fixture(scope="module")
def input_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("cli") / "toks")
    generate_tokenized(spark, 300, seed=9, num_partitions=3) \
        .write.mode("overwrite").parquet(p)
    return p


def _run(capsys, argv):
    from qsketch.cli import main

    assert main(argv) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_cli_plain_build(spark, input_path, tmp_path, capsys):
    out_dir = str(tmp_path / "states")
    m = _run(capsys, ["--input", input_path, "--output", out_dir,
                      "--sketches", "quotient:tokens", "hll:tokens"])
    assert m["kinds"] == ["hll:tokens", "quotient:tokens"]
    assert m["n_rows"] == 300 and m["n_tokens"] > 0
    rows = {r["kind"]: r for r in spark.read.parquet(out_dir).collect()}
    qf = base.from_bytes(bytes(rows["quotient:tokens"]["state"]))
    # exact distinct tokens vs the state table
    import pyspark.sql.functions as F
    exact = (spark.read.parquet(input_path)
             .select(F.explode("tokens").alias("t"))
             .agg(F.countDistinct("t")).first()[0])
    assert qf.cardinality() == exact


def test_cli_grouped_build_with_ckpt_resume(spark, input_path, tmp_path,
                                            capsys):
    out1 = str(tmp_path / "g1")
    out2 = str(tmp_path / "g2")
    ck = str(tmp_path / "ck")
    args = ["--input", input_path, "--group-by", "source",
            "--sketches", "quotient:tokens", "--ckpt", ck]
    m1 = _run(capsys, args + ["--output", out1])
    assert m1["groups"] >= 3
    # auto run-id is deterministic for identical input+config: the
    # second run must RESUME (state files untouched) and match bytes
    run_dirs = os.listdir(ck)
    assert len(run_dirs) == 1 and run_dirs[0].startswith("auto-")
    files = sorted(os.listdir(os.path.join(ck, run_dirs[0])))
    mtimes = [os.path.getmtime(os.path.join(ck, run_dirs[0], f))
              for f in files]
    m2 = _run(capsys, args + ["--output", out2])
    assert [os.path.getmtime(os.path.join(ck, run_dirs[0], f))
            for f in files] == mtimes
    s1 = {(r["group"], r["kind"]): bytes(r["state"])
          for r in spark.read.parquet(out1).collect()}
    s2 = {(r["group"], r["kind"]): bytes(r["state"])
          for r in spark.read.parquet(out2).collect()}
    assert s1 == s2
