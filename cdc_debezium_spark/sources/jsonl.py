"""JSONL corpus source/sink — the interchange format LLM training
corpora actually ship in (one JSON document per line, usually
gzip-sharded).

Spark's native json reader already handles line-delimited JSON and
transparent .gz decompression; what this module adds is the same
contract the Debezium parser gives wire data:

- an EXPLICIT schema (no inference pass over 100 TB — schema
  inference is a full extra scan),
- a PERMISSIVE corrupt-record lane instead of job failure, so a
  malformed shard surfaces as rows to quarantine (the drift-lane
  pattern of sources.debezium.split_drift),
- sharded writes sized by records-per-file, so downstream list/scan
  parallelism is controlled by the writer, not accident.

Gzip shards are NOT splittable — one .gz file = one task at read
time, which is why `write_jsonl` defaults to many small shards rather
than few large ones; at 100 TB the shard count, not the shard size,
sets the read parallelism.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """Read line-delimited JSON (plain or .gz) with an explicit schema.
    Returns (good, corrupt): well-formed rows minus the guard column,
    and the raw text of lines that failed to parse."""
    # text + from_json, the same shape sources.debezium uses for wire
    # payloads — not spark.read.json, whose corrupt-record column is
    # not queryable on its own (QUERY_ONLY_CORRUPT_RECORD_COLUMN) and
    # whose schema path would otherwise tempt an inference scan.
    # copy — StructType.add mutates the receiver in place
    full = StructType(
        list(schema.fields) + [StructField("_corrupt_record", StringType())]
    )
    parsed = spark.read.text(path).select(
        F.from_json(
            F.col("value"),
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("_d"),
        F.col("value"),
    )
    bad = F.col("_d._corrupt_record").isNotNull()
    good = parsed.where(~bad).select(
        *[F.col(f"_d.{f.name}").alias(f.name) for f in schema.fields]
    )
    corrupt = parsed.where(bad).select(F.col("value").alias("raw"))
    return good, corrupt


def write_jsonl(
    df: DataFrame, path: str, records_per_file: int, compress: bool = True
) -> None:
    """Shard a DataFrame to JSONL files of ~records_per_file each.
    maxRecordsPerFile does the sizing inside whatever partitioning the
    frame already has — no extra shuffle; gzip codec optional."""
    w = df.write.mode("overwrite").option("maxRecordsPerFile", records_per_file)
    if compress:
        w = w.option("compression", "gzip")
    w.json(path)
