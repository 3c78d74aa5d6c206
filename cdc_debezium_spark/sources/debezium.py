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
    ArrayType,
    BooleanType,
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
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

# MySQL-connector `source` block (public Debezium MySQL docs; the
# reference configures the connector at
# k8s-manifests/connectors/postgresql-connector.yaml:88-101). The
# ordering coordinate is (binlog file, position) — there is no LSN —
# plus the optional GTID; `server_id`/`thread`/`query` are
# MySQL-specific provenance fields.
MYSQL_SOURCE_SCHEMA = StructType(
    [
        StructField("db", StringType()),
        StructField("table", StringType()),
        StructField("server_id", LongType()),
        StructField("gtid", StringType()),
        StructField("file", StringType()),
        StructField("pos", LongType()),
        StructField("row", LongType()),
        StructField("thread", LongType()),
        StructField("query", StringType()),
        StructField("ts_ms", LongType()),
        StructField("snapshot", StringType()),
    ]
)

# MongoDB-connector `source` block (public Debezium MongoDB docs; the
# reference declares the connector at values.yaml:60-61). The ordering
# coordinate is the oplog position (`ord` within the `ts_ms` second on
# replica set `rs`); rows live in `collection`, not schema.table.
MONGO_SOURCE_SCHEMA = StructType(
    [
        StructField("db", StringType()),
        StructField("rs", StringType()),
        StructField("collection", StringType()),
        StructField("ord", LongType()),
        StructField("h", LongType()),
        StructField("ts_ms", LongType()),
        StructField("snapshot", StringType()),
    ]
)


def envelope_schema(
    row_schema: StructType, source_schema: StructType = SOURCE_SCHEMA
) -> StructType:
    """Debezium envelope for a given source-row schema. The envelope
    shape {before, after, source, op, ts_ms} is connector-agnostic;
    pass MYSQL_SOURCE_SCHEMA / MONGO_SOURCE_SCHEMA to type the
    connector-specific `source` block."""
    return StructType(
        [
            StructField("before", row_schema),
            StructField("after", row_schema),
            StructField("source", source_schema),
            StructField("op", StringType()),
            StructField("ts_ms", LongType()),
        ]
    )


def mysql_binlog_ordinal(
    file_col: Column | str = "source.file", pos_col: Column | str = "source.pos"
) -> Column:
    """Total order for MySQL events: (binlog file index, position) as
    one long. Binlog files are named ``<basename>.NNNNNN`` with a
    monotonically increasing numeric suffix; positions are bounded by
    max_binlog_size (≤1 GiB), so ``idx * 2^32 + pos`` never collides.
    This is the MySQL analog of the PostgreSQL envelope's ``lsn`` —
    every CDC kernel (latest-state, SCD2, as-of) takes it as its
    ``order`` column unchanged."""
    f = F.col(file_col) if isinstance(file_col, str) else file_col
    p = F.col(pos_col) if isinstance(pos_col, str) else pos_col
    idx = F.regexp_extract(f, r"\.(\d+)$", 1).cast("long")
    return idx * F.lit(4294967296).cast("long") + p


def parse_envelope(
    raw: DataFrame,
    row_schema: StructType,
    value_col: str = "value",
    topic_col: str = "topic",
    source_schema: StructType = SOURCE_SCHEMA,
    route=None,
) -> DataFrame:
    """Deserialize JSON change events (Kafka `value`) into the envelope.

    PERMISSIVE mode + ``_corrupt_record`` keeps schema drift visible
    without failing the stream (reference emits DDL to a schema-change
    topic rather than breaking: postgresql-connector.yaml:44-46).
    `source_schema` selects the connector-specific `source` block
    (PostgreSQL default; MYSQL_SOURCE_SCHEMA / MONGO_SOURCE_SCHEMA for
    the reference's other declared connectors).
    """
    schema = envelope_schema(row_schema, source_schema).add(
        "_corrupt_record", StringType()
    )
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
        # `route` overrides the table-name derivation (default: the
        # reference's RegexRouter shape). A caller whose topics are
        # ALREADY routed passes ``route=lambda c: c``.
        router = route_topic if route is None else route
        cols.insert(0, router(F.col(topic_col)).alias("table_name"))
    return parsed.select(*cols)


# MongoDB change events carry the document as EXTENDED-JSON STRINGS
# (`after`/`before` are strings, not structs — the document store has
# no fixed row schema), plus the change-stream `updateDescription`
# block (public Debezium MongoDB docs; capture.mode
# change_streams_update_full populates `after` on updates).
MONGO_ENVELOPE_SCHEMA = StructType(
    [
        StructField("before", StringType()),
        StructField("after", StringType()),
        StructField(
            "updateDescription",
            StructType(
                [
                    StructField("removedFields", ArrayType(StringType())),
                    StructField("updatedFields", StringType()),
                    StructField(
                        "truncatedArrays",
                        ArrayType(
                            StructType(
                                [
                                    StructField("field", StringType()),
                                    StructField("size", LongType()),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        ),
        StructField("source", MONGO_SOURCE_SCHEMA),
        StructField("op", StringType()),
        StructField("ts_ms", LongType()),
    ]
)


def parse_mongo_envelope(
    raw: DataFrame, value_col: str = "value", topic_col: str = "topic"
) -> DataFrame:
    """Deserialize MongoDB-connector change events. Same permissive
    drift lane as parse_envelope; the document payload stays a JSON
    string column for unwrap_mongo to shred."""
    # StructType.add mutates in place — build a fresh copy so repeated
    # calls never stack _corrupt_record fields onto the module schema
    schema = StructType(
        MONGO_ENVELOPE_SCHEMA.fields + [StructField("_corrupt_record", StringType())]
    )
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


def unwrap_mongo(parsed: DataFrame, fields: dict[str, str]) -> DataFrame:
    """ExtractNewDocumentState analog: shred the document JSON string
    into typed top-level columns. `fields` maps field name -> Spark
    type DDL (e.g. {"_id": "long", "email": "string"}). Deletes take
    the `before` image (when the capture mode provides one) and carry
    ``__deleted=true``; the oplog coordinate (ts_ms, source.ord) is
    the per-key order, mirroring the lsn/binlog lanes. All JSON-path
    extraction is JVM-side codegen — one narrow projection, zero
    exchanges."""
    doc = F.when(F.col("op") == "d", F.col("before")).otherwise(F.col("after"))
    cols = [
        F.get_json_object(doc, f"$.{name}").cast(ddl).alias(name)
        for name, ddl in fields.items()
    ]
    if "table_name" in parsed.columns:
        cols.insert(0, F.col("table_name"))
    return parsed.select(
        *cols,
        "op",
        "ts_ms",
        F.col("source.ord").alias("ord"),
        (F.col("op") == "d").alias("__deleted"),
    )


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


# Schema evolution (A7 consumer side) ---------------------------------------

_DDL_TYPES = {
    "varchar": StringType(),
    "text": StringType(),
    "char": StringType(),
    "bigint": LongType(),
    "int": LongType(),
    "integer": LongType(),
    "smallint": LongType(),
    # floating point: postgres emits "double precision" / "real" /
    # "float8"; the regex keys on the leading word
    "double": DoubleType(),
    "float": DoubleType(),
    "real": DoubleType(),
    "boolean": BooleanType(),
    "bool": BooleanType(),
    "date": DateType(),
    "timestamp": TimestampType(),
    # numeric/decimal stay OUT on purpose: they fall through to
    # StringType, the decimal.handling.mode=string wire contract
    # (postgresql-connector.yaml:48)
}


def apply_ddl(schema: StructType, ddl: str) -> StructType:
    """Evolve a table StructType from a schema-change-topic DDL string
    — the consumer half of include.schema.changes: the reference emits
    DDL events instead of breaking the stream (postgresql-connector
    .yaml:44-46), and the downstream engine must fold them into its
    schema catalog so the permissive from_json lane starts typing the
    new shape instead of routing rows to the drift lane.

    Supported (the forms Debezium's relational connectors emit for the
    common migrations): ADD COLUMN, DROP COLUMN, RENAME COLUMN x TO y,
    ALTER/MODIFY COLUMN type change. Unknown SQL types land as
    StringType (the safe wire type — decimal.handling.mode=string is
    precedent); unrecognized DDL returns the schema unchanged (a drift
    row, not a crash). Everything here is driver-side metadata — no
    data movement; the NEXT batch/restart parses with the new schema
    (batch = rescan, streaming = restart — SURVEY §7.3.3 documents
    this as explicit, not hidden).
    """
    import re

    def parse_type(t: str):
        base = re.match(r"[a-z]+", t.strip().lower())
        return _DDL_TYPES.get(base.group(0) if base else "", StringType())

    fields = list(schema.fields)
    m = re.search(
        r"add\s+column\s+(?:if\s+not\s+exists\s+)?\"?(\w+)\"?\s+([\w()]+)",
        ddl,
        re.I,
    )
    if m:
        name, typ = m.group(1), parse_type(m.group(2))
        if all(f.name != name for f in fields):
            fields.append(StructField(name, typ))
        return StructType(fields)
    m = re.search(r"drop\s+column\s+(?:if\s+exists\s+)?\"?(\w+)\"?", ddl, re.I)
    if m:
        return StructType([f for f in fields if f.name != m.group(1)])
    m = re.search(r"rename\s+column\s+\"?(\w+)\"?\s+to\s+\"?(\w+)\"?", ddl, re.I)
    if m:
        return StructType(
            [
                StructField(m.group(2), f.dataType, f.nullable)
                if f.name == m.group(1)
                else f
                for f in fields
            ]
        )
    m = re.search(
        r"(?:alter|modify)\s+column\s+\"?(\w+)\"?\s+(?:set\s+data\s+)?"
        r"(?:type\s+)?([\w()]+)",
        ddl,
        re.I,
    )
    if m:
        return StructType(
            [
                StructField(f.name, parse_type(m.group(2)), f.nullable)
                if f.name == m.group(1)
                else f
                for f in fields
            ]
        )
    return StructType(fields)  # unrecognized DDL: no-op, stay permissive
