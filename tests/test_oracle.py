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


def test_harness_rejects_hugeint_drift(spark, sf_dir):
    """A deliberately uncast HUGEINT oracle must fail locally — this is
    the exact class that slipped through to the driver in r1/r2
    (sum(BIGINT) -> HUGEINT -> pandas float64 vs Spark int64)."""
    import pandas as pd

    from cdc_debezium_spark.testing import assert_driver_hashable

    spark_pdf = pd.DataFrame({"total": pd.array([10, 20], dtype="int64")})
    duck_pdf = pd.DataFrame({"total": pd.array([10.0, 20.0], dtype="float64")})
    with pytest.raises(AssertionError, match="dtype mismatch"):
        assert_driver_hashable("fake_key", spark_pdf, duck_pdf)


def test_harness_rejects_array_columns(spark, sf_dir):
    """Array-typed output cells are unhashable at the driver's
    canonicalizer (numpy.ndarray in sort_values) — must fail locally."""
    import numpy as np
    import pandas as pd

    from cdc_debezium_spark.testing import assert_driver_hashable

    arr = pd.Series([np.array([1.0]), np.array([2.0])], dtype=object)
    pdf = pd.DataFrame({"feature": arr})
    with pytest.raises(AssertionError, match="un-hashable"):
        assert_driver_hashable("fake_key", pdf, pdf)


def test_priority_keys_all_registered():
    """Every key in the driver-sampling priority list must exist —
    a typo here silently wastes the round's external signal."""
    from cdc_debezium_spark.registry import _PRIORITY

    missing = [k for k in _PRIORITY if k not in registry.QUERIES]
    assert not missing, missing
    # priority keys must also lead the ordered registry
    head = list(registry.QUERIES)[: len(_PRIORITY)]
    assert head == [k for k in _PRIORITY if k in registry.QUERIES]
