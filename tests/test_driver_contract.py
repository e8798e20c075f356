"""Every queries() entry must RUN on every shipped scale factor — the
smallest (sf0.001) has different doc shapes than the oracle-gated
sf0.01, which is exactly where degenerate-input crashes (empty docs,
one-word docs, tiny candidate sets) hide."""

import os

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"),
    reason="sf0.001 testdata not present")


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs_on_smallest_sf(spark, name):
    fn = entrymod.queries()[name]
    df = fn(spark, SF_DIR)
    rows = df.collect()
    assert df.columns, name
    assert rows is not None  # >= 0 rows with a stable schema


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0 and df.columns
