"""Loaders for the driver-provided parquet tables + the web-document view.

``docs_as_web`` synthesizes the BASELINE.json input_hint shape
(url, warc_ts, html, text, lang) from the driver's ``documents`` table
entirely inside the Spark plan (encode/concat are JVM built-ins): each
row's text is wrapped in deterministic HTML chrome with boilerplate
header/nav/ads/footer. Because the wrap is deterministic and the text
column is also available raw, a pure-SQL oracle can verify the FULL
extraction pipeline: extract(wrap(text)) must equal tokenize(text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# The deterministic HTML chrome. Text payloads in the test tables are
# strictly [a-z ] (verified), so no escaping is required.
WRAP_HEAD = (
    "<html><head><title>doc</title><meta charset='utf-8'>"
    "<style>p{margin:0}</style><script>var t=1;</script></head><body>"
    "<header class='site-header'><a href='/'>Home</a> <a href='/about'>About</a></header>"
    "<nav><ul><li><a href='/s1'>One</a></li><li><a href='/s2'>Two</a></li></ul></nav>"
    "<div class='ads-banner'><a href='/buy'>buy</a> <a href='/now'>now</a></div>"
    "<main><article><p>"
)
WRAP_TAIL = (
    "</p></article></main>"
    "<div class='social-share'><a href='#'>tw</a> <a href='#'>fb</a></div>"
    "<footer><a href='/tos'>terms</a> <a href='/priv'>privacy</a></footer>"
    "</body></html>"
)

# Rules the chrome above triggers, in document order (oracle-known).
WRAP_REMOVED_RULES = ("tag:header", "tag:nav", "class:ads", "class:social", "tag:footer")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table, restoring scan parallelism for tiny files.

    The driver tables are single-file / single-row-group parquet, which
    Spark cannot split — every downstream map-side computation would run
    on ONE core. At the design scale the input is an Iceberg table with
    thousands of partitions (days(warc_ts) + bucket(url)), so the scan
    is naturally parallel; the round-robin repartition below substitutes
    for that (only) when the file is too small to split, and costs one
    shuffle of the raw (small) table. Values are unchanged — all query
    results are order-insensitive.
    """
    import os

    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    path = f"{sf_dir}/{name}.parquet"
    try:
        if os.path.isdir(path):
            # directory-style parquet: os.stat on the dir returns the
            # inode size (~4KB), not the data size — sum the files
            size = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(path) for f in fs
            )
        else:
            size = os.stat(path).st_size
    except OSError:
        return df
    cores = spark.sparkContext.defaultParallelism
    if size < 64 * 1024 * 1024 and cores > 1:
        return df.repartition(cores)
    return df


def docs_as_web(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents parquet -> input_hint-shaped web documents table."""
    raw = load(spark, sf_dir, "documents")
    return raw.select(
        F.concat(F.lit("https://ex.com/doc/"), F.col("doc_id")).alias("url"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("warc_ts"),
        F.encode(
            F.concat(F.lit(WRAP_HEAD), F.col("text"), F.lit(WRAP_TAIL)), "utf-8"
        ).alias("html"),
        F.col("text"),
        F.col("lang"),
        F.col("doc_id"),
    )
