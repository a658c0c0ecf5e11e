"""JSONL ingest: C4/OSCAR-style web-text dumps -> the documents shape.

The other ubiquitous distribution format for web corpora (one JSON
object per line, gzip-splittable per file): Common Crawl derivatives
like C4, OSCAR, RedPajama ship as JSONL with slightly different field
names per dataset. This reader pins an EXPLICIT schema (no inference —
at 10^12 rows a schema-inference pass is a full extra scan, and a
drifting field type mid-corpus silently corrupts columns) and maps the
dataset's field names onto the mandated (url, warc_ts, html, text,
lang) shape in one JVM projection.

Rows with no url get a deterministic synthetic one (jsonl://<file
fingerprint>) so downstream bucketing/dedup never sees nulls in the key
column. ``html`` is null — JSONL corpora carry extracted text; jobs
that want re-extraction feed WARC instead (sources/warc.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T


def read_jsonl_docs(
    spark: SparkSession,
    path: str,
    *,
    url_field: str = "url",
    text_field: str = "text",
    ts_field: str = "timestamp",
    lang_field: str = "lang",
) -> DataFrame:
    """JSONL corpus files -> documents rows (url, warc_ts, html, text, lang).

    Field names are per-dataset knobs (C4: url/text/timestamp; OSCAR:
    id/content/...). Unmapped fields are simply absent from the pinned
    schema and never parsed. Files (.jsonl / .jsonl.gz / .json.gz) are
    read line-wise by Spark's json source with the explicit schema —
    malformed lines yield null columns (PERMISSIVE) rather than killing
    the task, and the synthetic-url fallback keeps every row keyed.
    """
    schema = T.StructType(
        [
            T.StructField(url_field, T.StringType(), True),
            T.StructField(text_field, T.StringType(), True),
            T.StructField(ts_field, T.StringType(), True),
            T.StructField(lang_field, T.StringType(), True),
        ]
    )
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .json(path)
    )
    url = F.col(url_field)
    synthetic = F.concat(
        F.lit("jsonl://"),
        F.md5(F.concat_ws("\x1f", F.coalesce(F.col(text_field), F.lit("")))),
    )
    return raw.select(
        F.coalesce(url, synthetic).alias("url"),
        F.to_timestamp(F.col(ts_field)).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col(text_field).alias("text"),
        F.col(lang_field).alias("lang"),
    )
