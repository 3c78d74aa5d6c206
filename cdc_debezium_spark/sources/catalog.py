"""Table catalog: batch readers over the test parquet fixtures.

Stands in for the reference's Schema Registry + per-table Kafka topics
(reference values.yaml:63-69, prod-resources.yaml:94-95): one logical
table per name, schema known to the engine, storage columnar.

At 100 TB each of these would be a partitioned parquet/iceberg table or
a Kafka topic; the loader API is the single seam where that swap
happens — every operator downstream is storage-agnostic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..session import tune

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table; normalize the `events` stream table.

    `events.ts` is parquet TIMESTAMP(NANOS): with the nanosAsLong
    legacy conf it arrives as int64 ns. We derive
      - ``ts_us``  : int64 epoch microseconds (exact: integer division —
                     double division would lose precision at ~1.7e18)
      - ``ts``     : timestamp_ntz at microsecond precision
    matching the reference's microsecond time mode
    (postgresql-connector.yaml:49 adaptive_time_microseconds) and
    DuckDB's ns→µs truncation on the oracle side.
    """
    from ..functions.scalars import micros_to_ts, ns_to_us, ts_to_micros

    tune(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        dtypes = dict(df.dtypes)
        if dtypes.get("ts") == "bigint":
            df = df.withColumn("ts_us", ns_to_us("ts"))
        else:  # already a timestamp type (µs)
            df = df.withColumn("ts_us", ts_to_micros("ts"))
        df = df.withColumn(
            "ts", micros_to_ts(F.col("ts_us")).cast("timestamp_ntz")
        )
        df = df.select("event_id", "ts", "ts_us", "user_id", "event_type", "value", "props")
    return df


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register fixture tables as temp views for spark.sql access."""
    for name in names or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
