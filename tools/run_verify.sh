#!/usr/bin/env bash
# Local correctness loop: compile, run graft.Verify on a testdata SF dir,
# then replay the DuckDB oracle via tools/check.py (now including the
# strict type-level schema gate). Usage:
#   tools/run_verify.sh [sf_dir] [out_dir] [cpus]
# Env: GRAFT_ONLY=a,b,c to subset; CHECK_TIMEOUT_S / CHECK_SKIP pass through.
set -euo pipefail
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/verify_out}
CPUS=${3:-16}
cd "$(dirname "$0")/.."
CP=target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')
SPARK_GRAFT_CPUS=$CPUS java -cp "$CP" \
  $(for m in java.lang java.nio java.util sun.nio.ch sun.util.calendar \
             java.util.concurrent java.lang.invoke; do
      echo --add-opens=java.base/$m=ALL-UNNAMED; done) \
  -Xmx96g graft.Verify "$SF" "$OUT"
python3 tools/check.py "$OUT" "$SF"
