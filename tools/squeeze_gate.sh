#!/usr/bin/env bash
# Memory-squeeze gate (r16 rig, scripted in r17): run the FULL 196-line
# bench surface at a large SF under local-cluster with deliberately tiny
# executors (default 2 GiB), so working sets that merely fit at sf0.1
# must spill — proving the operators degrade to disk instead of dying.
# r16 ran this by hand and the artifact died in gitignored target/; this
# script writes it straight to a tracked path.
#
#   tools/squeeze_gate.sh [sfDir] [outJson] [executorMb]
#
# Env: GRAFT_JAVA_OPTS extra dials (e.g. -Dgraft.evalQueries=2000 — the
# designed 100 TB form for the eval family, which is exactly what the
# r16 squeeze's one failure (p35) was missing).
set -uo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata-local/sf1}
OUT=${2:-gates/bench_sf1_memsqueeze_2048_r17.json}
MB=${3:-2048}
LOG=target/squeeze_gate.log

sbt -batch package > /dev/null
JAR=$(ls -t target/scala-2.13/snowflakeemulatorspark_2.13-*.jar | head -1)
mkdir -p target/sparkhome
for d in jars bin conf sbin data RELEASE LICENSE NOTICE README.md; do
  ln -sfn "/opt/spark/$d" "target/sparkhome/$d"
done
export SPARK_HOME="$PWD/target/sparkhome"
export SPARK_SCALA_VERSION=2.13
export SPARK_GRAFT_MASTER="local-cluster[2,8,$MB]"
export SPARK_GRAFT_JARS="$PWD/$JAR"
export SPARK_GRAFT_CPUS=16
export SPARK_GRAFT_SF_DIR="$SF"
export SPARK_GRAFT_BENCH_OUT="$OUT"
echo "[squeeze_gate] bench $SF under local-cluster[2,8,$MB] -> $OUT"
tools/run_main.sh graft.Bench > "$LOG" 2>&1
RC=$?
tail -2 "$LOG"
if [ $RC -ne 0 ]; then echo "[squeeze_gate] FAIL: bench exited $RC"; exit $RC; fi
python3 - "$OUT" << 'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
det = d.get("details", {})
errs = {k: v["err"] for k, v in det.items() if v.get("err")}
spill = sum(v.get("spillMB", 0) for v in det.values())
print(f"[squeeze_gate] {len(det)} lines, {len(errs)} errors, "
      f"total spill {spill} MB, wall {d.get('value', 0):.1f} s")
if errs:
    print(json.dumps(errs, indent=1))
    sys.exit(1)
EOF
