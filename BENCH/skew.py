"""Skew-defense evidence: clustered input vs salted repartition.

Simulates host-level skew the way it arrives in a real crawl table:
the input is sorted by host so one host's pages (here 50% of all
bytes, on 3x-large payloads) occupy a few input partitions. The SAME
extraction job is then timed two ways on local[N]:

  * clustered — extraction runs directly on the skewed partitioning
    (a handful of straggler tasks own half the bytes);
  * salted    — ``repartition_salted`` (pmod(xxhash64(url, salt), P))
    spreads rows uniformly first.

Writes one JSON line; BENCH/BASELINE.md quotes the result.
Usage: python BENCH/skew.py [replicate] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from fusus_spark.extraction.pipeline import (
        extract_stage,
        repartition_salted,
        words_from_stage,
    )
    from fusus_spark.session import get_spark
    from fusus_spark.sources.testdata import WRAP_HEAD, WRAP_TAIL

    spark = get_spark("skew-bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")

    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = raw.select(
        "doc_id", "text",
        F.explode(F.sequence(F.lit(0), F.lit(replicate - 1))).alias("r"),
    )
    # hot host: doc_id % 2 == 0 -> host-a with 3x-replicated payload text
    hot = F.col("doc_id") % 2 == 0
    docs = rep.select(
        F.concat(
            F.when(hot, F.lit("https://host-a.example/")).otherwise(
                F.concat(F.lit("https://host-"), F.col("doc_id") % 997, F.lit(".example/"))
            ),
            "doc_id", F.lit("/"), "r",
        ).alias("url"),
        F.encode(
            F.concat(
                F.lit(WRAP_HEAD),
                F.when(hot, F.concat("text", F.lit(" "), "text", F.lit(" "), "text"))
                .otherwise(F.col("text")),
                F.lit(WRAP_TAIL),
            ),
            "utf-8",
        ).alias("html"),
        F.lit("en").alias("lang"),
    )
    parts = 64
    # clustered layout: hash-partition by HOST (what a crawl table
    # partitioned/bucketed on host or sorted input produces) => the hot
    # host's 50% of rows / 75% of bytes land in ONE partition
    host = F.regexp_extract("url", r"https://([^/]+)/", 1)
    clustered = docs.repartition(parts, host).localCheckpoint()
    n_docs = clustered.count()
    total_bytes = clustered.agg(F.sum(F.octet_length("html"))).first()[0]
    # warm codegen + python workers
    words_from_stage(extract_stage(clustered.limit(256))).count()

    def best_of(df, trials=2):
        best = float("inf")
        for _ in range(trials):
            t0 = time.time()
            words_from_stage(extract_stage(df)).count()
            best = min(best, time.time() - t0)
        return round(best, 3)

    t_clustered = best_of(clustered)
    t_salted = best_of(repartition_salted(clustered, parts))

    # task-level balance: bytes per partition, both layouts
    def max_share(df):
        sizes = (
            df.withColumn("p", F.spark_partition_id())
            .groupBy("p").agg(F.sum(F.octet_length("html")).alias("b"))
            .agg(F.max("b"), F.sum("b")).first()
        )
        return round(sizes[0] / sizes[1], 4)

    out = {
        "cpus": cpus,
        "n_docs": n_docs,
        "bytes_in": int(total_bytes),
        "wall_clustered_s": t_clustered,
        "wall_salted_s": t_salted,
        "speedup": round(t_clustered / t_salted, 3),
        "max_partition_byte_share_clustered": max_share(clustered),
        "max_partition_byte_share_salted": max_share(
            repartition_salted(clustered, parts)
        ),
    }
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "skew.json"), "w") as f:
        json.dump(out, f)
    spark.stop()


if __name__ == "__main__":
    main()
