#!/bin/bash
# Re-measure the minhash legs after the big-input materialization change
# (localCheckpoint -> columnar persist): the report merges best per
# (label, job), and these runs are strictly the current default code path.
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
    /root/testdata/sf0.1 "$pages" "$label" "$OUT" minhash_dedup 3 \
    >> "BENCH/log_cluster_${label}.txt" 2>&1
}

run 1 2 40000000 1x2
run 4 2 40000000 4x2
run 2 2 80000000 2x2
run 8 2 80000000 8x2

$SUBMIT --master 'local[2]' --class graft.tools.ClusterScaling "$JAR" \
  report "$OUT" 1x2 4x2 BENCH/CLUSTER_r4_canonical.md > BENCH/log_report1.txt 2>&1
$SUBMIT --master 'local[2]' --class graft.tools.ClusterScaling "$JAR" \
  report "$OUT" 2x2 8x2 BENCH/CLUSTER_r4_corr.md > BENCH/log_report2.txt 2>&1
echo DONE
