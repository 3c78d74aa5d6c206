"""Local differential-testing harness mirroring the driver's oracle gate.

Runs a registered Spark query and its DuckDB oracle on the same parquet
fixtures and compares row count, column-name set, and order-insensitive
values (floats with tolerance, everything else exactly).
"""

from __future__ import annotations

import decimal
import math
from datetime import date, datetime

import duckdb

from .sources.catalog import TABLES

FLOAT_RTOL = 1e-9
FLOAT_ATOL = 1e-9


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        return ("f", v)
    if isinstance(v, datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _values_equal(a, b) -> bool:
    if type(a) is tuple and type(b) is tuple and a and b and a[0] == "f" == b[0]:
        x, y = a[1], b[1]
        if math.isnan(x) and math.isnan(y):
            return True
        return math.isclose(x, y, rel_tol=FLOAT_RTOL, abs_tol=FLOAT_ATOL)
    if type(a) is tuple and type(b) is tuple and len(a) == len(b):
        if a and b and isinstance(a[0], str) and a[0] in ("dec", "ts", "d"):
            return a == b
        return all(_values_equal(x, y) for x, y in zip(a, b))
    return a == b


def assert_driver_hashable(key, spark_pdf, duck_pdf) -> None:
    """Mirror the driver's canonicalizer hazards so they fail HERE.

    The driver compares via pandas (sort_values over every column,
    then a value hash), which makes two silent killers possible:

    1. dtype drift — DuckDB HUGEINT (e.g. sum(BIGINT), or integer
       division of a HUGEINT window sum) lands in pandas as float64
       while Spark's long lands as int64; values print equal, hashes
       differ. Oracles must CAST back to BIGINT.
    2. array/struct output columns — numpy.ndarray cells are
       unhashable in pandas sort_values; the driver errors out before
       comparing anything. Queries must flatten to scalar columns.
    """
    for col in spark_pdf.columns:
        for side, pdf in (("spark", spark_pdf), ("duck", duck_pdf)):
            if pdf[col].dtype == object and len(pdf):
                v = pdf[col].iloc[0]
                assert not isinstance(v, (list, tuple, dict)) and not hasattr(
                    v, "__array__"
                ), (
                    f"{key}: column {col!r} ({side}) holds {type(v).__name__} "
                    "cells — array/struct outputs are un-hashable at the "
                    "driver; flatten to scalar columns"
                )
        s_dt, d_dt = spark_pdf[col].dtype, duck_pdf[col].dtype
        # Compare dtype KIND: int64-vs-float64 (the HUGEINT drift
        # class) must fail; datetime64 unit differences (ns vs us)
        # share kind 'M' and hash identically, so they pass. One more
        # tolerated combo, proven green at the driver (type_coercion,
        # scalar_datetime in r1/r2): Spark DateType arrives as object
        # cells of datetime.date while DuckDB DATE arrives datetime64.
        if {s_dt.kind, d_dt.kind} == {"O", "M"}:
            obj = spark_pdf[col] if s_dt.kind == "O" else duck_pdf[col]
            if len(obj) and isinstance(obj.iloc[0], (date, datetime)):
                continue
        assert s_dt.kind == d_dt.kind, (
            f"{key}: dtype mismatch on {col!r}: spark={s_dt} duck={d_dt} "
            "— likely a DuckDB HUGEINT/array oracle; CAST to BIGINT (or "
            "matching type) in the oracle SQL"
        )


def compare_query(spark, key: str, sf_dir: str) -> None:
    """Assert a registered query hash-matches its oracle. Raises AssertionError."""
    from .registry import ORACLES, QUERIES

    sdf = QUERIES[key](spark, sf_dir)
    spark_cols = sorted(sdf.columns)
    spark_rows = [tuple(_norm(r[c]) for c in spark_cols) for r in sdf.collect()]

    con = duck_connection(sf_dir)
    rel = con.sql(ORACLES[key])
    duck_cols_raw = list(rel.columns)
    assert sorted(duck_cols_raw) == spark_cols, (
        f"{key}: column mismatch spark={spark_cols} duck={sorted(duck_cols_raw)}"
    )
    duck_pdf = rel.df()
    spark_pdf = sdf.toPandas()
    assert_driver_hashable(key, spark_pdf, duck_pdf[list(spark_pdf.columns)])
    idx = [duck_cols_raw.index(c) for c in spark_cols]
    duck_rows = [tuple(_norm(row[i]) for i in idx) for row in rel.fetchall()]
    con.close()

    assert len(spark_rows) == len(duck_rows), (
        f"{key}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    spark_rows.sort(key=repr)
    duck_rows.sort(key=repr)
    bad = 0
    first = None
    for s, d in zip(spark_rows, duck_rows):
        if not _values_equal(s, d):
            bad += 1
            if first is None:
                first = (s, d)
    assert bad == 0, f"{key}: {bad}/{len(spark_rows)} rows differ; first: {first}"
