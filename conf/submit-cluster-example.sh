#!/usr/bin/env bash
# Cluster deployment template for the index-build pipeline at real scale
# (the sandbox proxy is scripts/scaling_bench.py at local[8]/local[32]).
#
# Sizing rationale for a ~100 TB transcripts table on ~1000 executors:
# - input ~100 TB → ~800k input splits at 128 MB; executors 4 cores ×
#   16 GB (shuffle-heavy; keep cores low to bound concurrent spill).
# - shuffle partitions ≈ 2-3× total cores: 1000 execs × 4 cores → ~10k;
#   AQE coalesces the small post-agg stages back down.
# - postings layout salt (index_build.py, doc_id // 2^20) spreads a
#   10^11-posting stopword over ~10^5 reducers → ≤~10^6 postings/task.
# - maxPartitionBytes 256m: the postings scan is sequential + pruned,
#   bigger splits amortize open costs.
set -euo pipefail

PKG_ZIP=${1:?usage: submit-cluster-example.sh pkg.zip corpus_path index_out}
CORPUS=${2:?corpus path}
OUT=${3:?index output path}

spark-submit \
  --deploy-mode cluster \
  --num-executors 1000 \
  --executor-cores 4 \
  --executor-memory 16g \
  --driver-memory 32g \
  --conf spark.sql.shuffle.partitions=10000 \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.coalescePartitions.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.files.maxPartitionBytes=256m \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.serializer=org.apache.spark.serializer.KryoSerializer \
  --py-files "$PKG_ZIP" \
  scripts/build_job.py "$CORPUS" "$OUT"
