#!/bin/bash
# Round-4 scaling evidence chain. Runs sequentially (one measurement at a
# time — parallel runs would contend for the box and corrupt timings).
set -x
cd /root/repo
JAR=target/scala-2.13/geomesaspark_2.13-0.1.0.jar
OUT=BENCH/cluster_runs_r4.jsonl
SUBMIT=/opt/spark/bin/spark-submit
rm -f "$OUT"

run() { # executors cores pages label
  local n=$1 c=$2 pages=$3 label=$4
  $SUBMIT --master "local-cluster[$n,$c,6144]" \
    --conf spark.executor.memory=6g \
    --conf spark.driver.memory=4g \
    --conf spark.sql.shuffle.partitions=$((n*c)) \
    --class graft.tools.ClusterScaling "$JAR" \
    /root/testdata/sf0.1 "$pages" "$label" "$OUT" '' 3 \
    > "BENCH/log_cluster_${label}.txt" 2>&1
}

# Canonical pair: 1 -> 4 executors (2 cores, 6g each), 40M pages / 4M docs
run 1 2 40000000 1x2
run 4 2 40000000 4x2
# Corroborating pair: 2 -> 8 executors, 80M pages / 8M docs
run 2 2 80000000 2x2
run 8 2 80000000 8x2

$SUBMIT --master 'local[2]' --class graft.tools.ClusterScaling "$JAR" \
  report "$OUT" 1x2 4x2 BENCH/CLUSTER_r4_canonical.md > BENCH/log_report1.txt 2>&1
$SUBMIT --master 'local[2]' --class graft.tools.ClusterScaling "$JAR" \
  report "$OUT" 2x2 8x2 BENCH/CLUSTER_r4_corr.md > BENCH/log_report2.txt 2>&1

# Thread-mode tables (rewrites BENCH/BASELINE.md) — VERDICT task 4
sbt -batch "runMain graft.tools.Scaling /root/testdata/sf0.1 40000000" \
  > BENCH/log_thread_scaling.txt 2>&1
echo DONE
