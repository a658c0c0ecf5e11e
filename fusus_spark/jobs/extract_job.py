"""Cluster extraction job — the ``spark-submit --py-files`` entry point.

North-rule launch shape:

    tools/package.sh                       # builds dist/fusus_spark.zip
    spark-submit --py-files dist/fusus_spark.zip \\
        fusus_spark/jobs/extract_job.py \\
        --input  <bucketed documents table dir> \\
        --output <words table dir> \\
        --ledger <progress ledger dir> \\
        --buckets 256

The job is resumable: buckets already marked done in the ledger (with
matching input lineage) are skipped; kill it at any point and re-submit
with the same arguments to resume exactly (tests/test_resume.py).

On a real cluster the input is an Iceberg table partitioned by
``days(warc_ts) + bucket(N, url)``; here the same layout is plain
parquet ``bucket=k/`` directories (written by
fusus_spark.sources.ledger.write_bucketed_input).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="bucketed documents dir")
    p.add_argument("--output", required=True, help="words output dir")
    p.add_argument("--ledger", required=True, help="progress ledger dir")
    p.add_argument("--buckets", type=int, required=True)
    p.add_argument("--max-html-bytes", type=int, default=4 * 1024 * 1024)
    args = p.parse_args(argv)

    # Under spark-submit, the session already exists; standalone, build one.
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("fusus-extract").getOrCreate()
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")

    from fusus_spark.sources.ledger import run_extraction_job

    summary = run_extraction_job(
        spark,
        args.input,
        args.output,
        args.ledger,
        args.buckets,
        max_html_bytes=args.max_html_bytes,
    )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
