#!/bin/bash
# Round-13 scale measurements (verdict #2 graph hub straggler, #8 s18 rows).
# Runs from the class SNAPSHOT (tools/scale_run.sh) so sbt never shares the
# box with a measurement window. a13_small_qty_parts rides every run as the
# linearity canary (SCALE.md round-10 protocol).
set -x
cd /root/repo
R=${GRAFT_SCALE_OUT:-/tmp/graftscale13}
mkdir -p "$R"

# corpora (hash-derived, reruns byte-identical)
tools/scale_run.sh graft.ScaleGen /tmp/gm1 1        > "$R/gen_m1.log"   2>&1
tools/scale_run.sh graft.ScaleGen /tmp/gm10 10      > "$R/gen_m10.log"  2>&1
tools/scale_run.sh graft.ScaleGen /tmp/gm30 30      > "$R/gen_m30.log"  2>&1
tools/scale_run.sh graft.ScaleGen /tmp/gh30 30 hub  > "$R/gen_h30.log"  2>&1
tools/scale_run.sh graft.ScaleGen /tmp/gh100 100 hub > "$R/gen_h100.log" 2>&1
sleep 60

GQ="a13_small_qty_parts,x110_trade_pagerank,x241_harmonic,x200_kcore,x231_label_prop"
SQ="a13_small_qty_parts,s18_stream_two_level"

for d in gh30 gh100; do
  SPARK_GRAFT_SF_DIR=/tmp/$d SPARK_GRAFT_CPUS=16 \
    SPARK_GRAFT_BENCH_ONLY=$GQ SPARK_GRAFT_BENCH=both \
    tools/scale_run.sh graft.Bench > "$R/bench_graph_$d.log" 2>&1
  sleep 90
done

for d in gm1 gm10 gm30; do
  SPARK_GRAFT_SF_DIR=/tmp/$d SPARK_GRAFT_CPUS=16 \
    SPARK_GRAFT_BENCH_ONLY=$SQ SPARK_GRAFT_BENCH=both \
    tools/scale_run.sh graft.Bench > "$R/bench_s18_$d.log" 2>&1
  sleep 90
done
echo DONE > "$R/done"
