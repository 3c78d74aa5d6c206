"""Wire-chain tests: the exact Kafka byte shape through the full SMT
chain (SURVEY §3.2). Builds records shaped like Kafka rows — binary
key/value, dotted topic — and drives parse → route → unwrap → compact,
including the corrupt-record and tombstone lanes the config demands
(reference postgresql-connector.yaml:50-56, prod-resources.yaml:10-13).
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from cdc_debezium_spark.operators import cdc
from cdc_debezium_spark.sources.debezium import parse_envelope, unwrap

ROW_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("amount", DoubleType()),
    ]
)


def _event(op, id_, name=None, amount=None, lsn=0, before=None):
    after = None if op == "d" else {"id": id_, "name": name, "amount": amount}
    return json.dumps(
        {
            "before": before,
            "after": after,
            "source": {
                "db": "prod",
                "schema": "public",
                "table": "orders",
                "lsn": lsn,
                "ts_ms": 1000 + lsn,
                "snapshot": "false" if op != "r" else "true",
            },
            "op": op,
            "ts_ms": 1000 + lsn,
        }
    )


def _wire_df(spark, rows):
    """(topic, value-json-or-None) -> Kafka-shaped binary columns."""
    df = spark.createDataFrame(rows, "topic string, value_s string")
    return df.select(
        "topic", F.encode("value_s", "utf-8").alias("value")
    )


def test_wire_chain_parse_route_unwrap_compact(spark):
    rows = [
        ("prod.public.orders", _event("r", 1, "a", 10.0, lsn=1)),
        ("prod.public.orders", _event("c", 2, "b", 20.0, lsn=2)),
        ("prod.public.orders", _event("u", 1, "a2", 11.0, lsn=3)),
        (
            "prod.public.orders",
            _event("d", 2, lsn=4, before={"id": 2, "name": "b", "amount": 20.0}),
        ),
        ("prod.public.orders", "{not json"),  # corrupt lane
    ]
    parsed = parse_envelope(_wire_df(spark, rows), ROW_SCHEMA)

    # routing stripped env+schema (RegexRouter, yaml:50-53)
    assert {r.table_name for r in parsed.select("table_name").collect()} == {"orders"}

    # corrupt record lands in the drift lane, not an exception
    corrupt = parsed.where(F.col("_corrupt_record").isNotNull())
    assert corrupt.count() == 1

    good = parsed.where(F.col("_corrupt_record").isNull())
    flat = unwrap(good, extra_cols=["op", "ts_ms", "source.lsn"])

    # delete-rewrite: op='d' carries the before image + __deleted=true
    d = flat.where(F.col("op") == "d").collect()
    assert len(d) == 1 and d[0]["__deleted"] and d[0].id == 2 and d[0].name == "b"

    # compact to latest state: id=1 at its update, id=2 gone
    state = (
        cdc.latest_state(
            flat.select(
                F.col("id").alias("pk"),
                F.col("lsn").alias("ord2"),
                F.col("ts_ms").alias("ts_us"),
                "op",
                F.col("amount").alias("val"),
            )
        )
        .collect()
    )
    assert {(r.pk, r.val) for r in state} == {(1, 11.0)}


def test_wire_tombstone_retained_by_parse(spark):
    """drop.tombstones=false: null values survive parsing as null
    envelopes (compaction is the latest-state op's job, not the
    parser's)."""
    rows = [
        ("prod.public.orders", _event("c", 7, "x", 1.0, lsn=1)),
        ("prod.public.orders", None),  # tombstone: null value bytes
    ]
    parsed = parse_envelope(_wire_df(spark, rows), ROW_SCHEMA)
    assert parsed.count() == 2
    tomb = parsed.where(
        F.col("op").isNull() & F.col("_corrupt_record").isNull()
    )
    assert tomb.count() == 1


def test_schema_drift_side_output(spark):
    """A7: drift rows split to the side lane with the raw payload
    preserved; good rows flow on without the corrupt column."""
    from cdc_debezium_spark.sources.debezium import split_drift

    rows = [
        ("prod.public.orders", _event("c", 1, "a", 10.0, lsn=1)),
        ("prod.public.orders", '{"op": "c", "after": {"id": "NOT A NUMBER'),
        ("prod.public.orders", "definitely not json"),
    ]
    parsed = parse_envelope(_wire_df(spark, rows), ROW_SCHEMA)
    good, drift = split_drift(parsed)
    assert good.count() == 1
    assert "_corrupt_record" not in good.columns
    raws = [r._corrupt_record for r in drift.collect()]
    assert len(raws) == 2 and all(raws)  # raw payloads kept for replay
