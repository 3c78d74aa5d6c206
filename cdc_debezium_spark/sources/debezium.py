"""Debezium change-event envelope: schema, parsing, SMT chain.

Reproduces, as declarative Spark transforms, the wire semantics the
reference activates by config:

- envelope ``{before, after, source{...}, op, ts_ms}`` — connector class
  `io.debezium.connector.postgresql.PostgresConnector`
  (reference k8s-manifests/connectors/postgresql-connector.yaml:32)
- schemaless JSON value (JsonConverter, ``schemas.enable=false``,
  reference prod-resources.yaml:10-13) → we must supply the schema at
  parse time (`from_json`) with a permissive corrupt-record lane
- SMT chain (reference postgresql-connector.yaml:50-56):
  RegexRouter → ExtractNewRecordState(rewrite deletes, keep tombstones)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

# Topic re-route regex — reference postgresql-connector.yaml:51-53:
#   transforms.route.regex = "([^.]+)\\.([^.]+)\\.([^.]+)"
#   transforms.route.replacement = "$3"
ROUTE_REGEX = r"([^.]+)\.([^.]+)\.([^.]+)"

SOURCE_SCHEMA = StructType(
    [
        StructField("db", StringType()),
        StructField("schema", StringType()),
        StructField("table", StringType()),
        StructField("lsn", LongType()),
        StructField("ts_ms", LongType()),
        StructField("snapshot", StringType()),
    ]
)


def envelope_schema(row_schema: StructType) -> StructType:
    """Debezium envelope for a given source-row schema."""
    return StructType(
        [
            StructField("before", row_schema),
            StructField("after", row_schema),
            StructField("source", SOURCE_SCHEMA),
            StructField("op", StringType()),
            StructField("ts_ms", LongType()),
        ]
    )


def parse_envelope(
    raw: DataFrame,
    row_schema: StructType,
    value_col: str = "value",
    topic_col: str = "topic",
) -> DataFrame:
    """Deserialize JSON change events (Kafka `value`) into the envelope.

    PERMISSIVE mode + ``_corrupt_record`` keeps schema drift visible
    without failing the stream (reference emits DDL to a schema-change
    topic rather than breaking: postgresql-connector.yaml:44-46).
    """
    schema = envelope_schema(row_schema).add("_corrupt_record", StringType())
    parsed = raw.withColumn(
        "_event",
        F.from_json(
            F.col(value_col).cast("string"),
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ),
    )
    cols = [F.col(f"_event.{f.name}").alias(f.name) for f in schema.fields]
    if topic_col in raw.columns:
        cols.insert(0, route_topic(F.col(topic_col)).alias("table_name"))
    return parsed.select(*cols)


def kafka_cdc_stream(
    spark,
    bootstrap_servers: str,
    topics: list[str],
    row_schema: StructType,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """The production source: Kafka topics → parsed CDC envelope stream.

    Mirrors the reference's consumer side exactly: per-table topics,
    keyed JSON values (reference prod-resources.yaml:10-13,94-95),
    resumable offsets via the streaming checkpoint (the offset-flush
    analog, prod-resources.yaml:14-20). Tests replay the same wire
    shape from files (streaming.replay) — every transform downstream of
    `load()` is identical, which is what the wire-chain tests pin.
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", ",".join(topics))
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return parse_envelope(raw, row_schema)


def route_topic(topic: Column) -> Column:
    """RegexRouter SMT: `prod.postgres.public.orders` → `orders`."""
    return F.regexp_extract(topic, ROUTE_REGEX, 3)


def split_drift(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Schema-drift side output (A7 analog).

    The reference routes DDL/schema events to a dedicated topic instead
    of breaking the stream (include.schema.changes=true,
    postgresql-connector.yaml:44-46). The Spark analog: rows the
    permissive parser could not fit the current schema land in the
    drift lane (with the raw payload preserved in _corrupt_record for
    reprocessing after a schema update); well-formed rows continue.
    Both lanes share one scan — Catalyst collapses the two filters into
    the same source read.
    """
    is_drift = F.col("_corrupt_record").isNotNull()
    good = parsed.where(~is_drift).drop("_corrupt_record")
    drift = parsed.where(is_drift).select("_corrupt_record")
    return good, drift


def unwrap(parsed: DataFrame, extra_cols: list[str] | None = None) -> DataFrame:
    """ExtractNewRecordState + delete-rewrite, as one projection.

    - non-deletes: the flat `after` row
    - deletes (op='d'): the `before` image with ``__deleted=true``
      (reference ``delete.handling.mode=rewrite``,
      postgresql-connector.yaml:56)
    - tombstones (null before AND after) are retained as null rows
      (``drop.tombstones=false``, line 55); callers compact them via
      operators.cdc.latest_state.
    """
    row = F.when(F.col("op") == "d", F.col("before")).otherwise(F.col("after"))
    keep = extra_cols or ["op", "ts_ms"]
    return (
        parsed.withColumn("_row", row)
        .select("_row.*", *keep)
        .withColumn("__deleted", (F.col("op") == "d"))
    )


# Schema-change topic (A7) ---------------------------------------------------

SCHEMA_CHANGE_SCHEMA = StructType(
    [
        StructField("source", SOURCE_SCHEMA),
        StructField("databaseName", StringType()),
        StructField("schemaName", StringType()),
        StructField("ddl", StringType()),
    ]
)


def parse_schema_change(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Deserialize the DDL events Debezium emits to its schema-change
    topic (``include.schema.changes`` — the reference's connectors keep
    it on by default; the public docs document the message shape:
    {source, databaseName, schemaName, ddl, tableChanges}). Consumers
    use the ddl string + source.table to evolve downstream schemas;
    `tableChanges` is connector-internal and not declared, so
    from_json ignores it."""
    return raw.select(
        F.from_json(
            F.col(value_col).cast("string"), SCHEMA_CHANGE_SCHEMA
        ).alias("_e")
    ).select("_e.*")
