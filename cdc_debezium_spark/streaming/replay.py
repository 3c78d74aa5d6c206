"""File-stream replay of the events fixture.

Stands in for the Kafka source in tests (SURVEY §2.A A1: prod is
``readStream.format("kafka")``; the envelope/transform/sink code is
source-agnostic). Events are split into ts-ordered chunk files and
streamed with ``maxFilesPerTrigger=1`` so each chunk becomes one
micro-batch — the replay analog of consuming a topic from offset 0
(reference backup/DR replay, setup-infrastructure.sh:386-441).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources.catalog import load_table

EVENT_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def write_event_chunks(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_chunks: int = 5,
    repeat: int = 1,
) -> int:
    """Write the events table as `n_chunks` ts-ordered parquet files.

    ``repeat > 1`` duplicates every chunk file — the at-least-once
    redelivery simulation (offset replay after crash,
    prod-resources.yaml:14-20). Test-fixture generator: collects to the
    driver by design (bounded test data, never a production path).

    Chunk files get STRICTLY INCREASING mtimes (``os.utime``): Spark's
    file streaming source orders pending files by modification time
    with ties broken arbitrarily, so back-to-back writes under load
    can land in one mtime tick and be delivered out of log order. The
    explicit stamps make "one chunk per micro-batch, in log order" a
    guarantee of the fixture rather than a timing accident — the
    per-partition offset ordering a keyed Kafka topic gives every
    consumer.
    """
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts_us", "user_id", "event_type", "value", "props")
        .orderBy("ts_us", "event_id")
        .toPandas()
    )
    os.makedirs(out_dir, exist_ok=True)
    n = len(ev)
    per = (n + n_chunks - 1) // n_chunks
    total = 0
    t0 = time.time() - (n_chunks * repeat + 1)  # stay in the past
    seq = 0
    for i in range(n_chunks):
        chunk = ev.iloc[i * per : (i + 1) * per]
        if chunk.empty:
            continue
        table = pa.Table.from_pandas(chunk, preserve_index=False)
        for r in range(repeat):
            path = f"{out_dir}/chunk_{i:04d}_{r}.parquet"
            pq.write_table(table, path)
            os.utime(path, (t0 + seq, t0 + seq))
            seq += 1
            total += len(chunk)
    return total


def read_event_stream(spark: SparkSession, chunk_dir: str) -> DataFrame:
    """One chunk file per micro-batch (the Kafka-trigger analog)."""
    return (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(chunk_dir)
    )
