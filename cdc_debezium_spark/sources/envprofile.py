"""Environment-tier profile compiler (dev / staging / prod parity).

The reference deploys the same pipeline at three tiers: helm value
overlays (helm-charts/cdc-system/values.yaml + values-dev.yaml /
values-staging.yaml / values-prod.yaml) and, for the raw-k8s variant,
per-env Kafka Connect worker properties
(k8s-manifests/environments/dev/dev-resources.yaml:20 flushes offsets
every 10 s with replication factor 1; prod-resources.yaml:20 every 5 s
with replication factor 3). This module re-expresses the
ENGINE-MEANINGFUL subset of that tiering:

* ``deep_merge`` — helm value coalescing: an overlay map merges
  per-key into the base, scalars and lists replace (the semantics
  ``helm install -f values-<env>.yaml`` applies).
* ``parse_properties`` — the java-properties subset
  ``connect-distributed.properties`` uses (``k=v``, ``#`` comments,
  whitespace-tolerant).
* ``EnvProfile`` — the compiled tier: worker/broker parallelism,
  offset-flush cadence, durability posture — and its mapping onto the
  Spark runtime (micro-batch trigger cadence, sink partition count,
  checkpoint redundancy posture).

Pure-k8s rows (namespaces, ingress hosts, probes, image registries,
RBAC) carry no engine meaning and are deliberately not modeled
(SURVEY.md §0).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

# Kafka Connect's documented default when a tier's worker properties
# don't pin offset.flush.interval.ms (the helm chart tiers don't —
# only the raw-k8s dev/prod properties files do).
DEFAULT_OFFSET_FLUSH_MS = 60_000


def deep_merge(base: dict, overlay: dict) -> dict:
    """Helm-style value coalescing: maps merge recursively, anything
    else (scalars, lists) in the overlay replaces the base value."""
    out = dict(base)
    for k, v in overlay.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def parse_properties(text: str) -> dict[str, str]:
    """connect-distributed.properties parser (java-properties subset:
    ``key=value`` lines, ``#`` comments, surrounding whitespace
    ignored; later keys win)."""
    props: dict[str, str] = {}
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        k, _, v = line.partition("=")
        props[k.strip()] = v.strip()
    return props


def load_values_yaml(path: str) -> dict:
    """Parse a helm values file. PyYAML is an optional dependency —
    profiles can always be built from plain dicts instead."""
    try:
        import yaml
    except ImportError as ex:  # pragma: no cover
        raise NotImplementedError(
            "load_values_yaml requires PyYAML; pass a dict to "
            "EnvProfile.from_values instead"
        ) from ex
    with open(path) as f:
        return yaml.safe_load(f) or {}


def _dig(values: dict, *path: str, default: Any = None) -> Any:
    cur: Any = values
    for p in path:
        if not isinstance(cur, dict) or p not in cur:
            return default
        cur = cur[p]
    return cur


def _gi(size: Any) -> float | None:
    """'50Gi' / '1Ti' / '512Mi' -> GiB as float (None when absent)."""
    if size is None:
        return None
    s = str(size).strip()
    for suffix, mult in (("Ti", 1024.0), ("Gi", 1.0), ("Mi", 1.0 / 1024)):
        if s.endswith(suffix):
            return float(s[: -len(suffix)]) * mult
    return float(s)


@dataclass(frozen=True)
class EnvProfile:
    """One deployment tier, compiled to engine-meaningful knobs."""

    name: str
    kafka_replicas: int
    zookeeper_replicas: int
    connect_workers: int
    es_master_replicas: int
    es_data_replicas: int
    kafka_storage_gi: float | None
    es_storage_gi: float | None
    offset_flush_interval_ms: int
    offset_storage_replication: int

    @classmethod
    def from_values(
        cls,
        values: dict,
        connect_props: str | dict[str, str] | None = None,
    ) -> "EnvProfile":
        """Compile a (merged) helm values dict plus optional Kafka
        Connect worker properties into a profile. Replica defaults
        follow the chart's base values; flush/durability defaults
        follow Kafka Connect's documented defaults (the helm tiers
        leave them unset; the raw-k8s tiers pin them)."""
        props: dict[str, str] = {}
        if connect_props is not None:
            props = (
                parse_properties(connect_props)
                if isinstance(connect_props, str)
                else dict(connect_props)
            )
        kafka_replicas = int(_dig(values, "kafka", "replicaCount", default=3))
        return cls(
            name=str(values.get("environment", "dev")),
            kafka_replicas=kafka_replicas,
            zookeeper_replicas=int(
                _dig(
                    values,
                    "kafka",
                    "zookeeper",
                    "replicaCount",
                    default=kafka_replicas,
                )
            ),
            connect_workers=int(
                _dig(values, "kafkaConnect", "replicaCount", default=2)
            ),
            es_master_replicas=int(
                _dig(values, "elasticsearch", "master", "replicaCount", default=2)
            ),
            es_data_replicas=int(
                _dig(values, "elasticsearch", "data", "replicaCount", default=2)
            ),
            kafka_storage_gi=_gi(
                _dig(values, "kafka", "persistence", "size")
            ),
            es_storage_gi=_gi(
                _dig(values, "elasticsearch", "data", "persistence", "size")
            ),
            offset_flush_interval_ms=int(
                props.get("offset.flush.interval.ms", DEFAULT_OFFSET_FLUSH_MS)
            ),
            offset_storage_replication=int(
                props.get(
                    "offset.storage.replication.factor",
                    min(3, kafka_replicas),
                )
            ),
        )

    # ---- Spark runtime mapping ------------------------------------

    def trigger_interval(self) -> str:
        """Micro-batch cadence: the offset-flush window IS the
        at-least-once redelivery bound the streaming lanes replay
        (a crash re-delivers at most one flush window)."""
        return f"{self.offset_flush_interval_ms} milliseconds"

    def sink_partitions(self, topic_partitions: int = 12) -> int:
        """Write parallelism for the topic-sink analog: the broker
        fleet serves `topic_partitions` per topic (prod pins 12 —
        prod-resources.yaml KAFKA_NUM_PARTITIONS); a tier with fewer
        brokers than prod's 3 scales the partition count down
        proportionally rather than hot-spotting small brokers."""
        return max(1, topic_partitions * self.kafka_replicas // 3)

    def spark_confs(self) -> dict[str, str]:
        """The tier's knobs expressed as Spark conf deltas."""
        return {
            "spark.sql.shuffle.partitions": str(self.sink_partitions()),
            "spark.sql.streaming.minBatchesToRetain": str(
                max(2, self.offset_storage_replication)
            ),
        }
