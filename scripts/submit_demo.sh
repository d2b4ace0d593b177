#!/bin/bash
# Demonstrates the north-rule deployment shape: package the engine, run the
# extraction job via spark-submit --py-files, then re-submit to show
# checkpoint-resume (second run skips all completed buckets).
# Verified in round 1:
#   run 1: run_id=demo processed=8 skipped=0 docs=500 spans=2409
#   run 2: run_id=demo processed=0 skipped=8 docs=0 spans=0
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="${1:-/tmp/submit_demo}"
SPARK_SUBMIT=$(python -c "import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__),'bin','spark-submit'))")
mkdir -p "$WORK"
python "$REPO/scripts/package_pyfiles.py" "$WORK/learnhtml_spark.zip"
# input docs table (synthesized from testdata; in production: the real
# Iceberg spans table)
python - <<PY
import sys; sys.path.insert(0, "$REPO")
from pyspark.sql import SparkSession
from learnhtml_spark.corpus import synthesize_docs
spark = SparkSession.builder.master("local[8]").config("spark.ui.enabled","false").getOrCreate()
synthesize_docs(spark.read.parquet("/root/testdata/sf0.001/documents.parquet")) \
    .write.mode("overwrite").parquet("$WORK/docs")
spark.stop()
PY
"$SPARK_SUBMIT" --master 'local[8]' --driver-memory 6g \
  --py-files "$WORK/learnhtml_spark.zip" \
  "$REPO/scripts/run_extraction_job.py" "$WORK/docs" "$WORK/out" --run-id demo --buckets 8
echo "--- resubmitting: checkpoint-resume should skip all buckets ---"
"$SPARK_SUBMIT" --master 'local[8]' --driver-memory 6g \
  --py-files "$WORK/learnhtml_spark.zip" \
  "$REPO/scripts/run_extraction_job.py" "$WORK/docs" "$WORK/out" --run-id demo --buckets 8
