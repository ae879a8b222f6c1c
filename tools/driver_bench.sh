#!/bin/bash
# Reproduce driver bench conditions locally (VERDICT r9 #1): cold page
# cache at battery start, the same real-disk artifact/shuffle mounts,
# full battery in driver order, and per-query disk-IO + GC metrics via
# SPARK_GRAFT_IOSTAT (see Bench.scala) so a driver-only heavy
# decomposes into disk re-reads vs GC vs compute locally.
#
# Usage: tools/driver_bench.sh [sfDir] [iostatOut]
set -e -o pipefail
SF=${1:-/root/testdata/sf0.1}
OUT=${2:-/tmp/bench_iostat.jsonl}
rm -f "$OUT"
sbt -batch compile >/dev/null 2>&1   # compile OUTSIDE the cold window
sync
echo 3 > /proc/sys/vm/drop_caches
# pipefail + a kept stderr log: a crashed bench must not exit 0 with
# stale/partial lines while its failure messages vanish
ERR=${3:-/tmp/bench_stderr.log}
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  SPARK_GRAFT_IOSTAT="$OUT" \
  sbt -batch "runMain graft.Bench" 2>"$ERR" | tail -3
echo "per-query iostat: $OUT" >&2
