#!/usr/bin/env bash
# North-rule scaling evidence: the SAME spark-submit job on a real
# multi-executor standalone cluster at N=1 and 4N=4 executors
# (4 cores / 8g each), identical input. Separate JVM per executor —
# the faithful single-box stand-in for cluster scaling (local[N] shares
# one JVM/GC and measures contention instead).
#
# Usage: scripts/scaling_bench.sh <world_dir> [out_json]
set -euo pipefail

WORLD="${1:?world dir}"
OUT="${2:-/tmp/scaling_standalone.json}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SPARK_HOME=/opt/spark
MASTER_URL="spark://127.0.0.1:7077"
LOCAL_DIR=/dev/shm/spark-local
mkdir -p "$LOCAL_DIR"

ZIP="$(mktemp -d)/osm_addr_bot_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" osm_addr_bot_spark -x '*__pycache__*')

cleanup() {
  "$SPARK_HOME/sbin/stop-worker.sh" >/dev/null 2>&1 || true
  "$SPARK_HOME/sbin/stop-master.sh" >/dev/null 2>&1 || true
  pkill -f 'deploy.worker.Worker' 2>/dev/null || true
  pkill -f 'deploy.master.Master' 2>/dev/null || true
  sleep 2
}
trap cleanup EXIT
cleanup

run_at() {
  local n_workers="$1"
  cleanup
  "$SPARK_HOME/sbin/start-master.sh" --host 127.0.0.1 --port 7077 --webui-port 0 >/dev/null
  sleep 3
  for i in $(seq 1 "$n_workers"); do
    SPARK_WORKER_DIR="/tmp/spark-worker-$i" \
    "$SPARK_HOME/sbin/start-worker.sh" "$MASTER_URL" \
      --cores 4 --memory 8g --webui-port 0 >/dev/null
    sleep 1
  done
  sleep 3
  local t0 t1
  t0=$(python3 -c 'import time; print(time.time())')
  SPARK_SUBMIT_MODE=1 "$SPARK_HOME/bin/spark-submit" \
    --master "$MASTER_URL" \
    --py-files "$ZIP" \
    --conf spark.executor.cores=4 \
    --conf spark.executor.memory=7g \
    --conf spark.cores.max=$((4 * n_workers)) \
    --conf spark.sql.shuffle.partitions=$((4 * n_workers)) \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.sql.session.timeZone=UTC \
    --conf spark.local.dir="$LOCAL_DIR" \
    --conf spark.sql.files.maxPartitionBytes=16m \
    "$REPO/jobs/run_pipeline.py" \
    --data-dir "$WORLD" --start-ts 1700000000 --end-ts 1700028800 \
    > "/tmp/scaling_run_${n_workers}.out" 2>"/tmp/scaling_run_${n_workers}.err"
  t1=$(python3 -c 'import time; print(time.time())')
  python3 -c "print($t1 - $t0)"
}

T1=$(run_at 1)
T4=$(run_at 4)
cleanup

python3 - "$T1" "$T4" "$WORLD" "$OUT" <<'EOF'
import json, sys
t1, t4, world, out = float(sys.argv[1]), float(sys.argv[2]), sys.argv[3], sys.argv[4]
stats1 = json.loads(open("/tmp/scaling_run_1.out").read().strip().splitlines()[-1])
stats4 = json.loads(open("/tmp/scaling_run_4.out").read().strip().splitlines()[-1])
# use the job's own pipeline seconds (excludes cluster spin-up)
s1, s4 = stats1["seconds"], stats4["seconds"]
res = {
    "mode": "standalone cluster, 4-core/8g executors",
    "world": world,
    "executors_1": {"seconds": s1, "wall_with_startup": round(t1, 1), "stats": stats1},
    "executors_4": {"seconds": s4, "wall_with_startup": round(t4, 1), "stats": stats4},
    "speedup": round(s1 / s4, 3),
    "efficiency_n_to_4n": round((s1 / s4) / 4.0, 3),
}
print(json.dumps(res))
open(out, "w").write(json.dumps(res, indent=2))
EOF
