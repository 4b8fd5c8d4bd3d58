#!/bin/bash
# Full result-invariance matrix in one command (COVERAGE.md logs runs):
#
#   {sf0.001, sf0.01, sf0.1}  x  Spark {local[7], local[32]}  ->  Verify dump
#   each dump checked against DuckDB at {1, 8} threads
#
# Any layout dependence (partition-count-sensitive sampling, collect-order
# nondeterminism, parallel-agg float drift) shows up as a FAIL in exactly
# one cell of the matrix. Every query result must be identical across all
# 12 cells.
#
# Usage: scripts/invariance_sweep.sh            # full matrix
#        SWEEP_SFS="sf0.01" scripts/invariance_sweep.sh   # subset
set -e
cd "$(dirname "$0")/.."
SFS=${SWEEP_SFS:-"sf0.001 sf0.01 sf0.1"}
CPUSET=${SWEEP_CPUS:-"7 32"}
fail=0
for sf in $SFS; do
  for cpus in $CPUSET; do
    out=/tmp/graft_sweep_${sf}_c${cpus}
    echo "=== Verify $sf @ local[$cpus] -> $out"
    # A stale dump from a previous run must never be hash-checked green:
    # clear the output dir first, and fail the sweep if Verify itself
    # exits nonzero (a crashed Verify would otherwise be invisible).
    rm -rf "$out"
    sbtlog=/tmp/graft_sweep_sbt_${sf}_c${cpus}.log
    if ! SPARK_GRAFT_CPUS=$cpus sbt -batch \
        "runMain graft.Verify /root/testdata/$sf $out" >"$sbtlog" 2>&1; then
      echo "Verify FAILED ($sf local[$cpus]) — tail of $sbtlog:"
      tail -20 "$sbtlog"
      fail=1
      continue
    fi
    grep "\[verify\]" "$sbtlog" || true
    for th in 1 8; do
      echo "--- oracle check $sf local[$cpus] duckdb-threads=$th"
      if ! DUCKDB_THREADS=$th python3 scripts/check_oracle.py /root/testdata/$sf $out \
          | tail -1; then
        fail=1
      fi
    done
  done
done
if [ $fail -ne 0 ]; then echo "SWEEP: FAIL"; exit 1; fi
echo "SWEEP: all cells green"
