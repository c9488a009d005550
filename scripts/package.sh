#!/bin/sh
# Build the --py-files artifact for spark-submit.
set -e
cd "$(dirname "$0")/.."
python -m zipfile -c spider_core_spark.zip spider_core_spark
echo "wrote spider_core_spark.zip"
echo "example:"
echo "  spark-submit --master spark://head:7077 --py-files spider_core_spark.zip \\"
echo "    main.py --pages /data/pages --seeds /data/seeds.parquet \\"
echo "    --workdir /data/run1 --max-epochs 50"
