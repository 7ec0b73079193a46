#!/usr/bin/env bash
# North-rule reproducibility protocol (round 3): run the canonical
# N-vs-4N executor pair (scripts/scaling_cluster.sh) REPEATS times
# back-to-back on the same world with identical knobs, and report the
# per-pair efficiencies plus their MEDIAN — the round-2 verdict's
# criterion ("median >= 0.8 across >= 3 pairs, same honest protocol"),
# so the headline no longer hinges on a favorable single repeat.
#
# Usage: scripts/scaling_repeats.sh <world_dir> [out_json] [repeats]
set -euo pipefail

WORLD="${1:?world dir}"
OUT="${2:-/tmp/scaling_repeats.json}"
REPEATS="${3:-3}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export SHUFFLE_PARTS="${SHUFFLE_PARTS:-32}"   # adaptive config (BENCH.md: fastest at every level)
# EXEC_CORES=1 runs the r3-canonical identical-1-core-worker pairs (both
# levels inside the box's DRAM envelope — the pair that isolates
# cluster-SIZE scaling); default 2 keeps the r2/r3 2-core protocol.
export EXEC_CORES="${EXEC_CORES:-2}"

PAIRS=()
for i in $(seq 1 "$REPEATS"); do
  pair_out="/tmp/scaling_pair_${i}.json"
  # per-pair event-log base so later pairs don't clobber earlier pairs'
  # logs (the core-second / shuffle-byte receipts live there)
  EVLOG_BASE="${EVLOG_ROOT:-/tmp/spark-events}/pair${i}" \
    bash "$REPO/scripts/scaling_cluster.sh" "$WORLD" "$pair_out"
  PAIRS+=("$pair_out")
done

python3 - "$OUT" "${PAIRS[@]}" <<'EOF'
import json, statistics, sys
out, pair_files = sys.argv[1], sys.argv[2:]
pairs = [json.load(open(p)) for p in pair_files]
effs = [p["efficiency_n_to_4n"] for p in pairs]
import os
res = {
    "protocol": "back-to-back full pairs (T1 then T4 each), identical world and knobs, "
                "fresh cluster per level; median efficiency is the headline",
    "exec_cores_per_worker": int(os.environ.get("EXEC_CORES", "2")),
    "world": pairs[0]["world"],
    "pairs": pairs,
    "efficiencies": effs,
    "median_efficiency": round(statistics.median(effs), 3),
    "t1_seconds": [p["executors_1"]["seconds"] for p in pairs],
    "t4_seconds": [p["executors_4"]["seconds"] for p in pairs],
}
print(json.dumps({k: res[k] for k in ("efficiencies", "median_efficiency")}))
open(out, "w").write(json.dumps(res, indent=2))
EOF
