"""cdc_debezium_spark — a PySpark-native CDC/analytics engine.

Re-expresses the query & data-processing capabilities of the reference
CDC pipeline (tuannh6495/cdc-debezium: Debezium → Kafka → processors →
ES/DW/ClickHouse/Redis sinks) as an idiomatic Spark library:

- ``sources``   : batch/stream readers, Debezium envelope parsing
                  (ref: k8s-manifests/connectors/postgresql-connector.yaml:32-57)
- ``operators`` : CDC kernels (route/unwrap/delete-rewrite/latest-state/
                  SCD2/as-of), relational helpers, LLM-data-pipeline ops
- ``functions`` : scalar-surface helpers
- ``streaming`` : Structured Streaming replay, stateful upsert, metrics
                  (ref: README.md:21-24 "Spark Streaming" processing layer)
- ``plans``     : scale posture — AQE, broadcast, salting, partitioning

Catalyst is the optimizer and Structured Streaming the runtime; this
package is declarative DataFrame glue, no custom engine internals.
"""

__version__ = "0.1.0"
