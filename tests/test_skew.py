"""Skew defense: salted repartition must spread host-clustered input.

The host-level skew scenario (BASELINE.json north_rule): millions of
pages from one host arrive sorted together in the input files; without
salting they land in few partitions and serialize the heavy UDF stage.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fusus_spark.extraction.pipeline import repartition_salted
from fusus_spark.schema import DOCUMENTS_SCHEMA


def _partition_sizes(df):
    return [
        r["n"]
        for r in df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid").agg(F.count("*").alias("n")).collect()
    ]


def test_salting_spreads_one_host(spark):
    # 2000 urls, ALL from one host, arriving in one input partition.
    rows = [
        (f"https://megahost.example/page/{i:06d}", None, b"<p>x</p>", "", "en")
        for i in range(2000)
    ]
    docs = spark.createDataFrame(rows, DOCUMENTS_SCHEMA).coalesce(1)
    assert docs.rdd.getNumPartitions() == 1

    salted = repartition_salted(docs, 16)
    sizes = _partition_sizes(salted)
    assert len(sizes) == 16
    assert max(sizes) < 2 * (2000 / 16), f"unbalanced: {sizes}"
    assert min(sizes) > 0.5 * (2000 / 16), f"unbalanced: {sizes}"


def test_salting_is_deterministic(spark):
    rows = [(f"https://h/{i}", None, b"<p>x</p>", "", "en") for i in range(100)]
    docs = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    a = sorted(
        (r["url"], r["pid"])
        for r in repartition_salted(docs, 8)
        .withColumn("pid", F.spark_partition_id()).select("url", "pid").collect()
    )
    b = sorted(
        (r["url"], r["pid"])
        for r in repartition_salted(docs, 8)
        .withColumn("pid", F.spark_partition_id()).select("url", "pid").collect()
    )
    assert a == b
