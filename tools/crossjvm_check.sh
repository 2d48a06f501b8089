#!/usr/bin/env bash
# Cross-JVM artifact adoption proof (round-13 verdict item #2).
#
# Runs graft.CrossJvmProbe twice, each as its own `sbt -batch` process
# (run/fork := true — two genuinely separate JVMs), against one shared
# GRAFT_ARTIFACT_ROOT, and asserts:
#   run 1: built=true   (cold root — the build fires)
#   run 2: built=false  (fresh JVM, warm root — marker adoption, no build)
#   n_indexed identical (the adopted artifact serves the same rows)
# Driver-side tooling only — not part of the shipped library.
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${1:-/root/testdata/sf0.01}"
ROOT="$(mktemp -d /tmp/graft-crossjvm-root-XXXXXX)"
trap 'rm -rf "$ROOT"' EXIT

run_probe() {
  GRAFT_ARTIFACT_ROOT="$ROOT" SPARK_GRAFT_CPUS=8 \
    sbt -batch "runMain graft.CrossJvmProbe $SF" 2>/dev/null \
    | grep '"probe":"crossjvm"' | tail -1
}

echo "[crossjvm] root=$ROOT sf=$SF"
OUT1="$(run_probe)"; echo "[crossjvm] jvm1: $OUT1"
OUT2="$(run_probe)"; echo "[crossjvm] jvm2: $OUT2"

echo "$OUT1" | grep -q '"built":true'  || { echo "FAIL: jvm1 did not build"; exit 1; }
echo "$OUT2" | grep -q '"built":false' || { echo "FAIL: jvm2 rebuilt instead of adopting"; exit 1; }
N1="$(sed 's/.*"n_indexed":\([0-9]*\).*/\1/' <<<"$OUT1")"
N2="$(sed 's/.*"n_indexed":\([0-9]*\).*/\1/' <<<"$OUT2")"
[ "$N1" = "$N2" ] || { echo "FAIL: n_indexed differs ($N1 vs $N2)"; exit 1; }
echo "PASS: second JVM adopted the on-disk artifact without rebuilding (n_indexed=$N1)"
