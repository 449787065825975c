#!/usr/bin/env bash
# Real-connector run of the Kafka gate (KafkaIntegrationSpec's first
# test). Needs network access (docker pull + maven) — it cannot run in
# the offline build sandbox, where the spec cancels cleanly and the
# wire-faithful FakeKafkaSource test covers the decode seam instead.
#
# Usage: tools/kafka-ci/run.sh [spark_version] [scala_binary]
set -euo pipefail
cd "$(dirname "$0")/../.."

SPARK_VERSION="${1:-4.1.2}"
SCALA_BIN="${2:-2.13}"

# 1. broker
docker compose -f tools/kafka-ci/docker-compose.yml up -d --wait

# 2. connector jars onto sbt's unmanaged test classpath (lib/ is on the
#    unmanagedBase path; these never ship in the library itself)
mkdir -p lib
for coord in \
  "org.apache.spark:spark-sql-kafka-0-10_${SCALA_BIN}:${SPARK_VERSION}" \
  "org.apache.spark:spark-token-provider-kafka-0-10_${SCALA_BIN}:${SPARK_VERSION}" \
  "org.apache.kafka:kafka-clients:3.8.0" \
  "org.apache.commons:commons-pool2:2.12.0"; do
  cs fetch "$coord" | while read -r jar; do cp -n "$jar" lib/ || true; done
done

# 3. the gate itself: with the jars present AND the broker reachable the
#    end-to-end test RUNS (produce -> KafkaTopic -> decode -> file sink)
GRAFT_KAFKA_BOOTSTRAP=localhost:9092 \
  sbt -batch "testOnly graft.streaming.KafkaIntegrationSpec"

docker compose -f tools/kafka-ci/docker-compose.yml down -v
