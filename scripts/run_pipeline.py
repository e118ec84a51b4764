"""spark-submit entry point for the KG-construction pipeline.

Usage:
  spark-submit --py-files table_annotation_spark.zip scripts/run_pipeline.py \
      --sf-dir /root/testdata/sf0.001 --output /tmp/kg_out \
      [--checkpoint-dir /tmp/kg_ckpt] [--max-tables N]

Packaging: `scripts/package.sh` builds the zip. The job prints one JSON line
of stage metrics and writes the canonical triples as parquet to --output.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--max-tables", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("table-annotation-kg").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from table_annotation_spark.flagship import run_flagship

    metrics: dict = {}
    triples = run_flagship(
        spark,
        args.sf_dir,
        max_tables=args.max_tables,
        checkpoint_dir=args.checkpoint_dir,
        metrics=metrics,
    )
    triples.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(json.dumps({"triples": n, **metrics}))
    spark.stop()


if __name__ == "__main__":
    main()
