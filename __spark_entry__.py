"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship CDC-spine query on sf0.001.
``queries()``   — one callable per implemented SURVEY.md §2 operator.
``oracle_sql()``— matching DuckDB SQL per key (column names aligned).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from cdc_debezium_spark import registry  # noqa: E402
from cdc_debezium_spark.session import tune  # noqa: E402

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full CDC spine (SURVEY.md §3.2) on sf0.001.

    envelope view → unwrap/delete-rewrite → dedup → latest-state per key
    → broadcast-join the customer dim → revenue by market segment.
    """
    import pyspark.sql.functions as F

    from cdc_debezium_spark.operators import cdc
    from cdc_debezium_spark.sources.catalog import load_table

    tune(spark)
    sf_dir = "/root/testdata/sf0.001"
    ce = cdc.cdc_events(spark, sf_dir)
    deduped = cdc.dedup_exact(ce, ["pk", "ord2"])
    state = cdc.latest_state(deduped)
    customer = load_table(spark, sf_dir, "customer")
    enriched = state.join(
        F.broadcast(customer), state.pk == customer.c_custkey, "inner"
    )
    return (
        enriched.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_users"),
            F.round(F.sum("val"), 2).alias("sum_last_val"),
        )
        .orderBy("c_mktsegment")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
