"""Differential tests: every registered query vs its DuckDB oracle.

This mirrors the driver's correctness gate (sf0.01) at sf0.001 for
fast local iteration; the comparison logic is scale-invariant.
"""

from __future__ import annotations

import pytest

from cdc_debezium_spark import registry
from cdc_debezium_spark.testing import compare_query

registry.load_all()

ORACLE_KEYS = sorted(registry.ORACLES)
ROWS_ONLY_KEYS = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_oracle_match(spark, sf_dir, key):
    compare_query(spark, key, sf_dir)


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only_runs(spark, sf_dir, key):
    df = registry.QUERIES[key](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_every_query_has_callable():
    assert registry.QUERIES, "registry must not be empty"
    for key in registry.ORACLES:
        assert key in registry.QUERIES
