"""Sink analogs for the reference's four declared consumers
(README.md:48-51): Elasticsearch (enriched docs), Data Warehouse
(aggregates), ClickHouse (analytical copy), Redis (latest-value KV).

Test/local realization targets the filesystem; each writer is also
usable inside `foreachBatch` for streaming (E7/E10) — the function
signature is (DataFrame, path) either way. At scale the DW/CH writers
partition by a date key so downstream scans prune partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .operators.cdc import latest_state


def write_dw_table(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """DW/ClickHouse analog: columnar append/overwrite, optionally
    date-partitioned (partition pruning is the 100 TB read path)."""
    w = df.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*list(partition_cols))
    w.parquet(path)


def write_es_docs(df: DataFrame, path: str, id_col: str, mode: str = "overwrite") -> None:
    """Elasticsearch analog: one JSON document per row, `_id` from the
    key column (the enriched-documents sink, README.md:48,77)."""
    doc = df.withColumn("_id", F.col(id_col).cast("string"))
    doc.write.mode(mode).json(path)


def write_kv_latest(
    df: DataFrame,
    path: str,
    keys: Sequence[str] = ("pk",),
    order: Sequence[str] = ("ts_us", "ord2"),
    mode: str = "overwrite",
) -> None:
    """Redis analog: latest value per key, deleted keys absent
    (values.yaml:95-99; the B6 log-compaction contract)."""
    latest_state(df, keys=keys, order=order).write.mode(mode).parquet(path)


def to_kafka_wire(
    df: DataFrame,
    key_cols: Sequence[str],
    topic: str | Column,
    num_partitions: int = 12,
) -> DataFrame:
    """Encode rows to the Kafka wire shape the reference produces:
    JSON key/value bytes, schemaless (JsonConverter schemas.enable=false,
    prod-resources.yaml:10-13), hash-partitioned by key into the
    default 12 partitions (prod-resources.yaml:94-95).

    ``topic`` may be a constant name or a per-row Column — the latter
    is what topic-routing SMTs (RegexRouter, the outbox EventRouter)
    produce; Kafka's producer API takes the topic per record, so a
    routed stream is still ONE producer/one sink.

    Feed the result to ``writeStream.format("kafka")`` in prod or to
    `sources.debezium.parse_envelope` in tests — the roundtrip is the
    wire-format contract (A6/A12).
    """
    keys = [F.col(c) for c in list(key_cols)]
    topic_col = F.lit(topic) if isinstance(topic, str) else topic
    wire = df.select(
        topic_col.alias("topic"),
        F.encode(F.to_json(F.struct(*keys)), "utf-8").alias("key"),
        F.encode(F.to_json(F.struct(*df.columns)), "utf-8").alias("value"),
        F.pmod(F.hash(*keys), num_partitions).alias("partition"),
    )
    return wire.repartition(num_partitions, F.col("partition"))


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 12,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: the co-located-join storage layout.

    Both sides of a recurring join written with the same bucket spec
    join WITHOUT any exchange — the shuffle is paid once at write time
    and amortized over every subsequent join/aggregation on the bucket
    key (verified by tests/test_plans.py::test_bucketed_join_no_shuffle).
    12 buckets mirrors the reference's 12-partition keyed topics
    (prod-resources.yaml:94-95) — same idea, at rest.
    """
    cols = list(bucket_cols)
    (
        df.write.mode(mode)
        .bucketBy(num_buckets, *cols)
        .sortBy(*cols)
        .format("parquet")
        .saveAsTable(table)
    )
