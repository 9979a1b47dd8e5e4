#!/bin/bash
# Round-5 scaling legs:
#  - minhash canonical 1x2 -> 4x2 pair after the pre-shingled-verify +
#    hash-join bucket-guard change (the r4 canonical row read 0.79).
#  - below-knee 2x1 -> 8x1 pairs (2 -> 8 total cores, 2 -> 8 executor
#    JVMs) for tube_select and s2_contains_join, whose r4 2x2->8x2 rows
#    (0.69/0.66) sat above the box's shared-memory-bus knee.
set -x
cd /root/repo
JAR=target/scala-2.13/geomesaspark_2.13-0.1.0.jar
OUT=BENCH/cluster_runs_r5.jsonl
SUBMIT=/opt/spark/bin/spark-submit

run() { # executors cores pages label jobs
  local n=$1 c=$2 pages=$3 label=$4 jobs=$5
  $SUBMIT --master "local-cluster[$n,$c,6144]" \
    --conf spark.executor.memory=6g \
    --conf spark.driver.memory=4g \
    --conf spark.sql.shuffle.partitions=$((n*c)) \
    --class graft.tools.ClusterScaling "$JAR" \
    /root/testdata/sf0.1 "$pages" "$label" "$OUT" "$jobs" 3 \
    >> "BENCH/log_cluster_r5_${label}.txt" 2>&1
}

run 1 2 40000000 1x2 minhash_dedup
run 4 2 40000000 4x2 minhash_dedup
run 2 1 40000000 2x1 tube_select,s2_contains_join
run 8 1 40000000 8x1 tube_select,s2_contains_join

$SUBMIT --master 'local[2]' --class graft.tools.ClusterScaling "$JAR" \
  report "$OUT" 1x2 4x2 BENCH/CLUSTER_r5_canonical.md > BENCH/log_r5_report1.txt 2>&1
$SUBMIT --master 'local[2]' --class graft.tools.ClusterScaling "$JAR" \
  report "$OUT" 2x1 8x1 BENCH/CLUSTER_r5_belowknee.md > BENCH/log_r5_report2.txt 2>&1
echo DONE
