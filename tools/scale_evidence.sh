#!/bin/bash
# Round-10 at-scale evidence runner (r9 verdict ask #1):
#  1. ScaleUp sf0.1 -> 10x (/tmp/graft_sf1) and 100x (/tmp/graft_sf10)
#  2. full-suite Bench at sf1 -> BENCH_SF1.out
#  3. Verify + DuckDB compare at sf1 -> CORRECTNESS_SF1.raw.json
#  4. headline-operator Bench at sf10 -> BENCH_SF10.out
#  5. knn_join PQ-vs-exact crossover at sf1 and sf10
# Sequential: sbt holds a global build lock.
set -x
cd /root/repo
R=/tmp/scale_evidence
mkdir -p $R

if [ ! -d /tmp/graft_sf1/lineitem.parquet ]; then
  SPARK_GRAFT_CPUS=16 sbt -batch 'runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/graft_sf1 10' > $R/scaleup_sf1.log 2>&1
fi
if [ ! -d /tmp/graft_sf10/lineitem.parquet ]; then
  SPARK_GRAFT_CPUS=32 sbt -batch 'runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/graft_sf10 100' > $R/scaleup_sf10.log 2>&1
fi

SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 SPARK_GRAFT_TIME_BUDGET=2400 \
  SPARK_GRAFT_STATE_DIR=$R \
  sbt -batch 'runMain graft.Bench' > $R/bench_sf1.out 2>&1

SPARK_GRAFT_CPUS=32 sbt -batch 'runMain graft.Verify /tmp/graft_sf1 /tmp/vout_sf1' > $R/verify_sf1.log 2>&1
python3 tools/verify_local.py /tmp/graft_sf1 /tmp/vout_sf1 $R/CORRECTNESS_SF1.raw.json > $R/verify_local_sf1.out 2>&1

PROBE=dedup_lsh_verify,dedup_keep,dedup_clusters,dedup_incremental_indexed,knn_join,split_assign,bpe_encode,storage_stats
SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 SPARK_GRAFT_TIME_BUDGET=5000 \
  SPARK_GRAFT_QUERIES=$PROBE SPARK_GRAFT_STATE_DIR=$R \
  sbt -batch 'runMain graft.Bench' > $R/bench_sf10.out 2>&1

SPARK_GRAFT_CPUS=32 sbt -batch 'runMain graft.tools.KnnCrossover /tmp/graft_sf1 2' > $R/knn_sf1.out 2>&1
SPARK_GRAFT_CPUS=32 sbt -batch 'runMain graft.tools.KnnCrossover /tmp/graft_sf10 2' > $R/knn_sf10.out 2>&1

echo DONE > $R/DONE
