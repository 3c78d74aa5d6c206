"""Three-tier environment parity (r9 verdict item 6).

The reference ships dev / staging / prod tiers; until r10 the engine's
config surface exercised dev and prod but never parsed the staging
overlay. These tests compile all three through EnvProfile and assert
the documented deltas:

* helm overlays (values.yaml base + values-{dev,staging,prod}.yaml):
  staging sits strictly between dev and prod on every replica and
  storage axis (kafka 1/2/5, connect 1/2/3, ES data 1/2/5,
  kafka storage 20/50/500 Gi).
* raw-k8s worker properties (dev-resources.yaml:20 /
  prod-resources.yaml:20): offset flush 10 s rf=1 vs 5 s rf=3; the
  helm tiers leave flush unset -> Kafka Connect's 60 s default.

Fixture dicts below are derived from the reference's documented
values (file:line cited inline), not embedded files; when the
reference checkout is present the same assertions also run against
the actual YAML.
"""

from __future__ import annotations

import os

import pytest

from cdc_debezium_spark.sources.envprofile import (
    DEFAULT_OFFSET_FLUSH_MS,
    EnvProfile,
    deep_merge,
    load_values_yaml,
    parse_properties,
)

# helm-charts/cdc-system/values.yaml:5-99 (base chart defaults)
BASE_VALUES = {
    "environment": "dev",
    "kafka": {
        "replicaCount": 3,
        "persistence": {"size": "100Gi"},
        "zookeeper": {"persistence": {"size": "20Gi"}},
    },
    "kafkaConnect": {
        "replicaCount": 2,
        "config": {"group.id": "cdc-connect-cluster"},
    },
    "elasticsearch": {
        "master": {"replicaCount": 2},
        "data": {"replicaCount": 2, "persistence": {"size": "100Gi"}},
    },
}

# values-dev.yaml:1-28
DEV_OVERLAY = {
    "environment": "dev",
    "kafka": {
        "replicaCount": 1,
        "persistence": {"size": "20Gi"},
        "zookeeper": {"replicaCount": 1, "persistence": {"size": "5Gi"}},
    },
    "kafkaConnect": {"replicaCount": 1},
    "elasticsearch": {
        "master": {"replicaCount": 1},
        "data": {"replicaCount": 1, "persistence": {"size": "50Gi"}},
    },
}

# values-staging.yaml:1-18 — the tier r9 never parsed
STAGING_OVERLAY = {
    "environment": "staging",
    "kafka": {
        "replicaCount": 2,
        "persistence": {"size": "50Gi"},
        "zookeeper": {"replicaCount": 2},
    },
    "kafkaConnect": {"replicaCount": 2},
    "elasticsearch": {
        "master": {"replicaCount": 2},
        "data": {"replicaCount": 2, "persistence": {"size": "100Gi"}},
    },
}

# values-prod.yaml:1-27
PROD_OVERLAY = {
    "environment": "prod",
    "kafka": {
        "replicaCount": 5,
        "persistence": {"size": "500Gi"},
        "zookeeper": {"replicaCount": 5, "persistence": {"size": "100Gi"}},
    },
    "kafkaConnect": {"replicaCount": 3},
    "elasticsearch": {
        "master": {"replicaCount": 3},
        "data": {"replicaCount": 5, "persistence": {"size": "1Ti"}},
    },
}

# k8s-manifests/environments/{dev,prod}/…-resources.yaml:8-20 —
# the engine-meaningful worker properties (converters, storage
# topics and RFs, flush cadence); staging has no raw-k8s variant.
DEV_PROPS = """
bootstrap.servers=kafka:9092
group.id=connect-cluster-dev
offset.storage.replication.factor=1
offset.flush.interval.ms=10000
"""
PROD_PROPS = """
bootstrap.servers=kafka-0.kafka:9092,kafka-1.kafka:9092,kafka-2.kafka:9092
group.id=connect-cluster-prod
offset.storage.replication.factor=3
offset.flush.interval.ms=5000
"""

OVERLAYS = {
    "dev": (DEV_OVERLAY, DEV_PROPS),
    "staging": (STAGING_OVERLAY, None),
    "prod": (PROD_OVERLAY, PROD_PROPS),
}


def _profile(env: str) -> EnvProfile:
    overlay, props = OVERLAYS[env]
    return EnvProfile.from_values(deep_merge(BASE_VALUES, overlay), props)


@pytest.mark.parametrize("env", ["dev", "staging", "prod"])
def test_tier_compiles(env):
    p = _profile(env)
    assert p.name == env
    assert p.kafka_replicas >= 1
    assert p.connect_workers >= 1
    confs = p.spark_confs()
    assert int(confs["spark.sql.shuffle.partitions"]) >= 1


def test_documented_tier_deltas():
    dev, stg, prod = _profile("dev"), _profile("staging"), _profile("prod")
    # staging is strictly between dev and prod on every scale axis
    assert dev.kafka_replicas < stg.kafka_replicas < prod.kafka_replicas
    assert (1, 2, 5) == (
        dev.kafka_replicas,
        stg.kafka_replicas,
        prod.kafka_replicas,
    )
    assert (1, 2, 3) == (
        dev.connect_workers,
        stg.connect_workers,
        prod.connect_workers,
    )
    assert (1, 2, 5) == (
        dev.es_data_replicas,
        stg.es_data_replicas,
        prod.es_data_replicas,
    )
    assert (20, 50, 500) == (
        dev.kafka_storage_gi,
        stg.kafka_storage_gi,
        prod.kafka_storage_gi,
    )
    assert prod.es_storage_gi == 1024  # 1Ti


def test_offset_flush_deltas():
    dev, stg, prod = _profile("dev"), _profile("staging"), _profile("prod")
    # dev-resources.yaml:20 vs prod-resources.yaml:20
    assert dev.offset_flush_interval_ms == 10_000
    assert prod.offset_flush_interval_ms == 5_000
    # the helm staging tier pins no worker properties -> Connect default
    assert stg.offset_flush_interval_ms == DEFAULT_OFFSET_FLUSH_MS
    assert (dev.offset_storage_replication, prod.offset_storage_replication) == (1, 3)
    # staging durability defaults to min(3, brokers) = 2
    assert stg.offset_storage_replication == 2
    # trigger cadence mapping
    assert prod.trigger_interval() == "5000 milliseconds"


def test_sink_partition_scaling():
    dev, stg, prod = _profile("dev"), _profile("staging"), _profile("prod")
    # prod: 12 partitions across 5 brokers >= the documented 12
    assert prod.sink_partitions() == 20
    # staging scales down proportionally, dev hits the floor path
    assert stg.sink_partitions() == 8
    assert dev.sink_partitions() == 4
    assert EnvProfile.from_values({"kafka": {"replicaCount": 0}}).sink_partitions() == 1


def test_properties_parser_tolerates_comments_and_blanks():
    props = parse_properties(
        "# comment\n\n key = value \nplugin.path=/a,/b\nbad-line\n"
    )
    assert props == {"key": "value", "plugin.path": "/a,/b"}


def test_deep_merge_is_helm_coalesce():
    merged = deep_merge(
        {"a": {"x": 1, "y": 2}, "l": [1, 2], "s": "base"},
        {"a": {"y": 3}, "l": [9], "n": {"z": 0}},
    )
    assert merged == {"a": {"x": 1, "y": 3}, "l": [9], "s": "base", "n": {"z": 0}}


REF_CHART = "/root/reference/helm-charts/cdc-system"


@pytest.mark.skipif(
    not os.path.isdir(REF_CHART), reason="reference checkout not present"
)
@pytest.mark.parametrize("env", ["dev", "staging", "prod"])
def test_real_reference_values_match_fixtures(env):
    """When the reference checkout is available, the spec-derived
    fixture dicts above must agree with the actual YAML on every
    engine-meaningful knob — catching fixture drift."""
    base = load_values_yaml(os.path.join(REF_CHART, "values.yaml"))
    overlay = load_values_yaml(os.path.join(REF_CHART, f"values-{env}.yaml"))
    real = EnvProfile.from_values(deep_merge(base, overlay), OVERLAYS[env][1])
    assert real == _profile(env)
