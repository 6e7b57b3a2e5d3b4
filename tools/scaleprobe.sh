#!/usr/bin/env bash
# Beyond-sf0.1 correctness probe: amplify sf0.1 ~10x, dump every
# registered query over the amplified dir, and run the DuckDB oracle
# selfcheck against the same parquet. One-shot evidence that the
# cross-engine parity classes that only appear with scale (wide
# decimal -> double was sf0.1-only) stay closed an order of magnitude
# beyond the shipped testdata. Usage:
#   tools/scaleprobe.sh [copies]   # default 10
set -euo pipefail
cd "$(dirname "$0")/.."
COPIES="${1:-10}"
AMP_DIR="${AMP_DIR:-/tmp/graft_sfamp}"
OUT_DIR="${OUT_DIR:-/tmp/graft_verify_amp}"
sbt -batch "runMain graft.Amplify /root/testdata/sf0.1 $AMP_DIR $COPIES"
SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify $AMP_DIR $OUT_DIR"
python3 tools/selfcheck.py "$AMP_DIR" "$OUT_DIR"
