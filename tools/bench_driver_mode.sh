#!/usr/bin/env bash
# Reproduce the driver's bench invocation exactly: a FRESH sbt JVM per run,
# SPARK_GRAFT_CPUS=32, 8 GiB driver heap, sf0.1 — run N times back-to-back
# so builder self-numbers and driver numbers are the same experiment
# (VERDICT r2 "Next round" item 8). Results land in bench_driver_run<i>.json.
#
# Usage: tools/bench_driver_mode.sh [runs] [sfdir]
set -euo pipefail
cd "$(dirname "$0")/.."
RUNS="${1:-3}"
SFDIR="${2:-/root/testdata/sf0.1}"
for i in $(seq 1 "$RUNS"); do
  out="bench_driver_run${i}.json"
  echo "=== driver-mode bench run $i/$RUNS (fresh sbt JVM, 32 cpus, 8g) ==="
  SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=8g \
    SPARK_GRAFT_BENCH_OUT="$out" \
    sbt -batch "runMain graft.Bench" >/dev/null 2>&1 || true
  if [[ -f "$out" ]]; then
    python3 - "$out" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
qs = sorted(d["queries"].items(), key=lambda kv: -kv[1])
print(f"total={d['value']:.1f}s  slowest: " +
      ", ".join(f"{k}={v:.1f}s" for k, v in qs[:5]))
EOF
  else
    echo "run $i produced no $out (bench failed?)" >&2
  fi
done
