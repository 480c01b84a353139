#!/usr/bin/env bash
# Large-SF correctness gate (r17): run the full Verify dump at a given
# corpus dir, then shard the DuckDB oracle compare across N parallel
# oracle_check.py processes (ONLY= slices), and merge the per-shard
# partials into one committed artifact. This is the recipe the r16 sf1
# gate ran by hand — scripted so the receipt lands in a tracked path
# instead of dying in target/ (the r16 lesson: a claim's artifact must
# land in the close commit).
#
#   tools/scale_gate.sh <sfDir> <outJson> [shards] [verifyOut]
#
# Env: GRAFT_JAVA_OPTS forwarded to Verify (e.g. -Dgraft.evalQueries=2000);
#      DUCK_MEM per-shard DuckDB memory_limit (default 12GB);
#      DUCK_THREADS per-shard DuckDB threads (default 4);
#      SKIP_VERIFY=1 reuses an existing verifyOut dump.
set -uo pipefail
cd "$(dirname "$0")/.."
SF=${1:?sfDir}
OUT_JSON=${2:?output json path}
SHARDS=${3:-8}
VOUT=${4:-/tmp/scale_verify_$(basename "$SF")}
LOG_DIR=${VOUT}_logs
mkdir -p "$LOG_DIR"

if [ "${SKIP_VERIFY:-0}" != 1 ]; then
  echo "[scale_gate] Verify $SF -> $VOUT"
  rm -rf "$VOUT"
  # 16g, not 48g: r16's operational note — a 48 GiB driver heap at sf1
  # spends its time in giant mixed GCs (observed: 5 of 32 cores busy,
  # 34 GB RSS, 10x slower than the 16g run of the same suite)
  SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-16g} SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
    tools/run_main.sh graft.Verify "$SF" "$VOUT" > "$LOG_DIR/verify.log" 2>&1 \
    || { echo "[scale_gate] FAIL: Verify errored"; tail -20 "$LOG_DIR/verify.log"; exit 2; }
fi

# entry list = the dumped query dirs; round-robin into shards so heavy
# truth-class oracles spread instead of landing in one shard
mapfile -t ENTRIES < <(find "$VOUT" -mindepth 1 -maxdepth 1 -type d -printf '%f\n' | sort)
echo "[scale_gate] ${#ENTRIES[@]} entries across $SHARDS oracle shards"
PIDS=()
for s in $(seq 0 $((SHARDS - 1))); do
  ONLY_LIST=$(for i in "${!ENTRIES[@]}"; do
    [ $((i % SHARDS)) -eq "$s" ] && printf '%s,' "${ENTRIES[$i]}"; done)
  SF_DIR="$SF" VERIFY_OUT="$VOUT" ONLY="${ONLY_LIST%,}" \
    DUCK_MEM=${DUCK_MEM:-12GB} DUCK_THREADS=${DUCK_THREADS:-4} \
    python3 tools/oracle_check.py > "$LOG_DIR/oracle_shard$s.json" \
    2> "$LOG_DIR/oracle_shard$s.log" &
  PIDS+=($!)
done
FAILED=0
for p in "${PIDS[@]}"; do wait "$p" || FAILED=1; done

python3 - "$OUT_JSON" "$LOG_DIR"/oracle_shard*.json << 'EOF'
import json, sys
out, shards = sys.argv[1], sys.argv[2:]
merged = {}
for f in shards:
    with open(f) as fh:
        txt = fh.read().strip()
    if not txt:
        print(f"[scale_gate] WARNING: empty shard output {f}", file=sys.stderr)
        continue
    merged.update(json.loads(txt))
merged = dict(sorted(merged.items()))
bad = {k: v for k, v in merged.items()
       if v.get("err") not in (None, "no_oracle") or
          (v.get("err") is None and not (v.get("rows_match") and
           v.get("schema_match") and v.get("hash_match")))}
with open(out, "w") as fh:
    json.dump(merged, fh, indent=1)
print(f"[scale_gate] merged {len(merged)} entries -> {out}; {len(bad)} BAD")
if bad:
    print(json.dumps(bad, indent=1))
    sys.exit(1)
EOF
MERGE_RC=$?
[ "$FAILED" = 1 ] && echo "[scale_gate] note: at least one shard exited nonzero (see logs)"
exit $MERGE_RC
