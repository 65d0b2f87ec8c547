"""Driver-contract smoke tests: entry() runs, every oracle key has a
query, every query executes at sf0.001."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as se  # noqa: E402


def test_oracle_keys_subset_of_queries():
    qs, oracles = se.queries(), se.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) > 0


def test_entry_returns_rows(spark):
    df = se.entry(spark)
    assert df.count() > 0


def test_all_queries_run_sf0001(spark, sf_dir):
    for name, fn in se.queries().items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name
