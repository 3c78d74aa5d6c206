"""Smoke test of the driver contract in __spark_entry__.py."""

from __future__ import annotations


def test_entry_runs(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_last_val" in df.columns


def test_contract_shapes():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert all(callable(f) for f in q.values())


def test_every_key_has_docstring_and_index_row():
    """Every registered operator documents itself, and the generated
    operator index stays in sync with the registry."""
    import os

    from cdc_debezium_spark import registry

    registry.load_all()
    for key, fn in registry.QUERIES.items():
        assert (fn.__doc__ or "").strip(), f"{key} lacks a docstring"
    idx = os.path.join(os.path.dirname(__file__), "..", "docs", "OPERATORS.md")
    text = open(idx).read()
    missing = [k for k in registry.QUERIES if f"`{k}`" not in text]
    assert not missing, f"docs/OPERATORS.md missing keys: {missing[:5]}"
