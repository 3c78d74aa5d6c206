"""Config-driven pipeline assembly: Kafka-Connect connector properties
in, Spark CDC pipeline out.

The reference deploys by POSTing a JSON connector config to Kafka
Connect (k8s-manifests/connectors/postgresql-connector.yaml:29-58,
mysql job :78-100) — the config IS its user interface. This module
accepts that same flat property map and assembles the equivalent
pipeline from this repo's operators, so a reference user can bring
their connector config unchanged:

- ``connector.class``            -> envelope dialect (postgres / mysql
                                    source block, mongo extended-JSON)
- ``table.include.list``         -> routed-table filter (yaml:39)
- ``transforms`` + per-transform -> an ordered SMT chain; supported
  types are the ones the reference declares (RegexRouter,
  ExtractNewRecordState with drop.tombstones / delete.handling.mode,
  yaml:50-56) plus Kafka's MaskField
- ``include.schema.changes``     -> whether the drift lane is exposed

Unknown transform types fail fast at build time (the Connect worker
would, too) rather than silently dropping a stage.

Everything here is assembly — each stage delegates to the operator
modules, so a config-built pipeline and a hand-built one produce the
same plans (asserted by tests/test_config_pipeline.py parity tests).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.types import StructType

from .debezium import (
    MONGO_SOURCE_SCHEMA,
    MYSQL_SOURCE_SCHEMA,
    SOURCE_SCHEMA,
    parse_envelope,
    parse_mongo_envelope,
    split_drift,
    unwrap,
    unwrap_mongo,
)

_DIALECTS = {
    "io.debezium.connector.postgresql.PostgresConnector": SOURCE_SCHEMA,
    "io.debezium.connector.mysql.MySqlConnector": MYSQL_SOURCE_SCHEMA,
    "io.debezium.connector.mongodb.MongoDbConnector": MONGO_SOURCE_SCHEMA,
}


def regex_router(regex: str, replacement: str) -> Callable[[Column], Column]:
    """Kafka's RegexRouter semantics: if `regex` matches the ENTIRE
    topic, rewrite it with `replacement` ($1-style backrefs); topics
    that don't match pass through unchanged. The reference routes
    `<prefix>.<schema>.<table>` to the bare table name with
    regex ([^.]+)\\.([^.]+)\\.([^.]+) -> $3 (yaml:50-53)."""
    anchored = f"^(?:{regex})$"
    def route(topic: Column) -> Column:
        return F.when(
            topic.rlike(anchored), F.regexp_replace(topic, anchored, replacement)
        ).otherwise(topic)
    return route


@dataclass
class ConnectorPipeline:
    """A connector config compiled into callable pipeline stages.

    ``build(config)`` validates and compiles once; ``apply(raw)`` runs
    the chain on any Kafka-shaped frame (topic string, value binary) —
    batch or streaming, the stages are identical projections.
    """

    row_schema: StructType
    source_schema: StructType
    topic_route: Callable[[Column], Column] | None
    include_tables: list[str] | None
    drop_tombstones: bool
    delete_mode: str  # rewrite | drop | none
    mask_fields: list[str]
    expose_drift: bool
    is_mongo: bool
    mongo_fields: dict[str, str] = field(default_factory=dict)

    @staticmethod
    def build(
        config: dict[str, str],
        row_schema: StructType,
        mongo_fields: dict[str, str] | None = None,
    ) -> "ConnectorPipeline":
        cls_name = config.get("connector.class", "")
        if cls_name not in _DIALECTS:
            raise ValueError(f"unsupported connector.class: {cls_name!r}")
        names = [
            t.strip() for t in config.get("transforms", "").split(",") if t.strip()
        ]
        topic_route = None
        delete_mode = "none"
        drop_tombstones = False
        unwrapped = False
        mask_fields: list[str] = []
        # apply() runs a fixed route -> unwrap -> mask shape. A config
        # whose declared chain order differs (e.g. mask BEFORE unwrap,
        # which on a Connect worker masks envelope fields, not row
        # fields) would be silently reordered — reject it instead, and
        # reject duplicate stages of one type (Connect runs both; we
        # would silently last-win).
        _STAGE_RANK = {"route": 0, "unwrap": 1, "mask": 2}
        seen_stages: list[str] = []

        def _stage(kind: str, name: str) -> None:
            if kind in seen_stages:
                raise ValueError(
                    f"duplicate {kind} transform {name!r}: chains with "
                    "repeated stages of one type are not supported"
                )
            if seen_stages and _STAGE_RANK[kind] < _STAGE_RANK[seen_stages[-1]]:
                raise ValueError(
                    f"unsupported transform order at {name!r}: this "
                    "pipeline applies route -> unwrap -> mask; declare "
                    "transforms in that order (a Connect worker honors "
                    "the declared order, so reordering would change "
                    "semantics)"
                )
            seen_stages.append(kind)

        for name in names:
            t_type = config.get(f"transforms.{name}.type", "")
            short = t_type.rsplit(".", 1)[-1]
            if short == "RegexRouter":
                _stage("route", name)
                topic_route = regex_router(
                    config[f"transforms.{name}.regex"],
                    config[f"transforms.{name}.replacement"],
                )
            elif short == "ExtractNewRecordState":
                _stage("unwrap", name)
                unwrapped = True
                drop_tombstones = (
                    config.get(f"transforms.{name}.drop.tombstones", "true")
                    == "true"
                )
                delete_mode = config.get(
                    f"transforms.{name}.delete.handling.mode", "drop"
                )
                if delete_mode not in ("rewrite", "drop", "none"):
                    raise ValueError(f"unknown delete.handling.mode: {delete_mode}")
            elif short in ("MaskField$Value", "MaskField"):
                _stage("mask", name)
                mask_fields = [
                    c.strip()
                    for c in config[f"transforms.{name}.fields"].split(",")
                ]
            else:
                raise ValueError(f"unsupported transform type: {t_type!r}")
        include = config.get("table.include.list")
        return ConnectorPipeline(
            row_schema=row_schema,
            source_schema=_DIALECTS[cls_name],
            topic_route=topic_route,
            include_tables=(
                [t.strip() for t in include.split(",")] if include else None
            ),
            drop_tombstones=drop_tombstones,
            delete_mode=delete_mode if unwrapped else "__envelope__",
            mask_fields=mask_fields,
            expose_drift=config.get("include.schema.changes", "false") == "true",
            is_mongo="mongodb" in cls_name,
            mongo_fields=mongo_fields or {},
        )

    def apply(self, raw: DataFrame) -> dict[str, DataFrame]:
        """Run the compiled chain. Returns lanes:
        ``changes`` (the configured output shape); ``drift`` (when
        include.schema.changes=true, mirroring the reference's
        schema-change topic) or ``quarantine`` (when it is false —
        malformed payloads are still diverted, never unwrapped into
        the changes lane); ``tombstones`` (only when
        drop.tombstones=false and the chain unwraps)."""
        if self.topic_route is not None and "topic" in raw.columns:
            raw = raw.withColumn("topic", self.topic_route(F.col("topic")))
        if self.is_mongo:
            parsed = parse_mongo_envelope(raw)
        else:
            # a routed topic IS the table name — don't re-extract
            parsed = parse_envelope(
                raw,
                self.row_schema,
                source_schema=self.source_schema,
                route=(lambda c: c) if self.topic_route is not None else None,
            )
        lanes: dict[str, DataFrame] = {}
        # Malformed payloads (_corrupt_record set, op/before/after all
        # null) are ALWAYS split off before tombstone detection and
        # unwrap — with include.schema.changes=false they would
        # otherwise dodge the tombstone predicate and unwrap into
        # all-null change rows (silent data pollution). When drift is
        # exposed they are the reference's schema-change topic
        # ("drift"); when it is not, they still leave the changes lane,
        # as a quarantine side output.
        parsed, drift = split_drift(parsed)
        lanes["drift" if self.expose_drift else "quarantine"] = drift
        if self.include_tables is not None:
            # Debezium applies table.include.list at CAPTURE, against
            # the database object name — match the source block
            # (schema.table for postgres, db.table for mysql,
            # db.collection for mongo), not the (re-routable) topic.
            # Tombstones have a null source; they only exist for
            # captured tables, so they pass.
            src_fields = {f.name for f in self.source_schema.fields}
            container = "schema" if "schema" in src_fields else "db"
            obj = "collection" if "collection" in src_fields else "table"
            qualified = F.concat_ws(
                ".", F.col(f"source.{container}"), F.col(f"source.{obj}")
            )
            parsed = parsed.where(
                qualified.isin(self.include_tables)
                | F.col("source").isNull()
            )
        is_tombstone = (
            F.col("op").isNull()
            & F.col("before").isNull()
            & F.col("after").isNull()
        )
        if self.delete_mode == "__envelope__":
            out = parsed if not self.drop_tombstones else parsed.where(~is_tombstone)
        else:
            if self.drop_tombstones:
                parsed = parsed.where(~is_tombstone)
            else:
                lanes["tombstones"] = parsed.where(is_tombstone)
                parsed = parsed.where(~is_tombstone)
            if self.delete_mode == "drop":
                parsed = parsed.where(F.col("op") != "d")
            if self.is_mongo:
                out = unwrap_mongo(parsed, self.mongo_fields)
            else:
                out = unwrap(parsed)
            if self.delete_mode == "drop" and "__deleted" in out.columns:
                out = out.drop("__deleted")
            elif self.delete_mode == "none" and not self.is_mongo:
                # Debezium "none": the delete survives but its payload
                # does not — null row fields, no __deleted marker.
                row_fields = set(self.row_schema.fieldNames())
                dtypes = dict(out.dtypes)
                out = out.select(
                    *[
                        F.when(F.col("op") == "d", F.lit(None).cast(dtypes[c]))
                        .otherwise(F.col(c))
                        .alias(c)
                        if c in row_fields
                        else F.col(c)
                        for c in out.columns
                        if c != "__deleted"
                    ]
                )
        for c in self.mask_fields:
            if c in out.columns:
                out = out.withColumn(
                    c, F.lit(None).cast(dict(out.dtypes)[c])
                )
        lanes["changes"] = out
        return lanes
