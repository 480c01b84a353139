#!/usr/bin/env bash
# Multi-JVM falsification gate (r14 VERDICT "Next round" #1): run the
# oracle gate under a local-cluster master — real executor JVM processes,
# real closure/broadcast serialization over the wire, real remote shuffle
# fetches, real cross-process reliable-checkpoint re-reads — on one
# machine. `local[n]` can never falsify those claims; this is the
# cheapest rig that can.
#
#   tools/cluster_gate.sh                       # full 184-entry gate, sf0.001
#   tools/cluster_gate.sh /root/testdata/sf0.01 # heavier corpus
#   tools/cluster_gate.sh sfDir outDir p01_dedup_exact,p20_dedup_clusters
#
# Env overrides:
#   SPARK_GRAFT_MASTER   default local-cluster[2,8,8192]
#   GRAFT_JAVA_OPTS      default -Dgraft.checkpointMode=reliable (the
#                        cluster-recommended durable mode — the exact
#                        configuration the 100 TB story recommends)
#
# Plumbing notes (why each line exists):
#  - SPARK_HOME points at target/sparkhome, a symlink shim over
#    /opt/spark: the in-process standalone Worker creates executor work
#    dirs under $SPARK_HOME/work, which must land inside the repo, not
#    in the read-only-by-policy /opt tree.
#  - SPARK_SCALA_VERSION=2.13: executor commands are built by the
#    launcher library directly (no bin/load-spark-env.sh shell step), and
#    without the env it probes source-checkout build dirs and dies with
#    "Cannot find any build directories".
#  - SPARK_GRAFT_JARS ships the application classes: separate executor
#    JVMs fetch spark.jars from the driver's file server; sbt's
#    classes dir never reaches them.
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.001}
OUT=${2:-/tmp/cluster_gate_out}
ONLY=${3:-}
mkdir -p target/sparkhome
for d in jars bin conf sbin data RELEASE LICENSE NOTICE README.md; do
  ln -sfn "/opt/spark/$d" "target/sparkhome/$d"
done
sbt -batch package > /dev/null
JAR=$(ls target/scala-2.13/snowflakeemulatorspark_2.13-*.jar | head -1)
export SPARK_HOME="$PWD/target/sparkhome"
export SPARK_SCALA_VERSION=2.13
export SPARK_GRAFT_MASTER="${SPARK_GRAFT_MASTER:-local-cluster[2,8,8192]}"
export SPARK_GRAFT_JARS="$PWD/$JAR"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}"
export GRAFT_JAVA_OPTS="${GRAFT_JAVA_OPTS:--Dgraft.checkpointMode=reliable}"
echo "[cluster_gate] master=$SPARK_GRAFT_MASTER sf=$SF opts=$GRAFT_JAVA_OPTS"
if [ -n "$ONLY" ]; then
  sbt -batch "runMain graft.Verify $SF $OUT $ONLY"
else
  sbt -batch "runMain graft.Verify $SF $OUT"
fi
SF_DIR="$SF" VERIFY_OUT="$OUT" python3 tools/oracle_check.py
