#!/bin/bash
# Sharded verify_local driver: most oracles are single-threaded
# interpreted DuckDB work, so a sequential full-suite compare wastes
# 30 of 32 cores. Split the query names into N shards and run
# verify_local once per shard concurrently; logs land per shard for
# assemble_scale_gate.py to merge (later labels override earlier).
#
# Usage: tools/shard_verify.sh <outDir> <sfDir> <nShards> <logPrefix>
set -euo pipefail
OUT="$1"; SF="$2"; N="$3"; PREFIX="$4"
NAMES=$(python3 - "$OUT" <<'EOF'
import json, sys
print("\n".join(sorted(json.load(open(sys.argv[1] + "/oracle_sql.json")))))
EOF
)
i=0
PIDS=()
for shard in $(seq 0 $((N - 1))); do
  LIST=$(echo "$NAMES" | awk -v n="$N" -v s="$shard" 'NR % n == s' \
    | paste -sd, -)
  [ -z "$LIST" ] && continue
  ORACLE_TIMEOUT_SEC="${ORACLE_TIMEOUT_SEC:-900}" \
    python3 tools/verify_local.py "$OUT" "$SF" "$LIST" \
    > "${PREFIX}_shard${shard}.log" 2>&1 &
  PIDS+=($!)
done
RC=0
for p in "${PIDS[@]}"; do wait "$p" || RC=1; done
grep -h "^PASS\|^FAIL\|^TIMEOUT" "${PREFIX}"_shard*.log | sort | uniq -c \
  | awk '{print $2}' | sort | uniq -c
exit $RC
