#!/usr/bin/env bash
# Vendor the spark-avro jar so the JVM Avro codec lanes
# (sources/avro_wire.py: to_avro_wire_jvm / from_avro_wire_jvm) go
# live. This image has NO network and ships no spark-avro jar, so the
# lanes are probe-gated dormant (jvm_avro_available() == False) and
# tests/test_wire.py::test_jvm_avro_codec_parity skips. Run this where
# network (or an artifact mirror) exists, then rerun pytest: the
# parity test un-skips and avro_roundtrip switches to the zero-Python
# whole-stage codec automatically.
set -euo pipefail

SPARK_VER="$(python -c 'import pyspark; print(pyspark.__version__)')"
SCALA_VER="2.13"
JAR="spark-avro_${SCALA_VER}-${SPARK_VER}.jar"
DEST="$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "jars"))')"
URL="https://repo1.maven.org/maven2/org/apache/spark/spark-avro_${SCALA_VER}/${SPARK_VER}/${JAR}"

if [ -f "${DEST}/${JAR}" ]; then
    echo "already vendored: ${DEST}/${JAR}"
    exit 0
fi
echo "fetching ${URL} -> ${DEST}/${JAR}"
curl -fSL --retry 3 -o "${DEST}/${JAR}.part" "${URL}"
mv "${DEST}/${JAR}.part" "${DEST}/${JAR}"
echo "done; restart the Spark session to pick up the jar"
