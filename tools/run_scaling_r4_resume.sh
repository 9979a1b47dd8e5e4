#!/bin/bash
# Round-4 scaling chain, resumed: the original run's 1x2 leg completed but
# the session hosting it was SIGTERM'd during 4x2 (exit 143 in
# log_cluster_4x2.txt — external kill, not an app failure). 1x2 rows are
# kept in cluster_runs_r4.jsonl; this script runs the remaining legs.
# Sequential on purpose — parallel runs would contend and corrupt timings.
set -x
cd /root/repo
JAR=target/scala-2.13/geomesaspark_2.13-0.1.0.jar
OUT=BENCH/cluster_runs_r4.jsonl
SUBMIT=/opt/spark/bin/spark-submit

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

run 4 2 40000000 4x2
# Corroborating pair: 2 -> 8 executors, 80M pages / 8M docs
run 2 2 80000000 2x2
run 8 2 80000000 8x2

$SUBMIT --master 'local[2]' --class graft.tools.ClusterScaling "$JAR" \
  report "$OUT" 1x2 4x2 BENCH/CLUSTER_r4_canonical.md > BENCH/log_report1.txt 2>&1
$SUBMIT --master 'local[2]' --class graft.tools.ClusterScaling "$JAR" \
  report "$OUT" 2x2 8x2 BENCH/CLUSTER_r4_corr.md > BENCH/log_report2.txt 2>&1
echo DONE
