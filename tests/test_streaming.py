"""Streaming ingest variant: same extraction semantics, streaming source."""

from __future__ import annotations

from pyspark.sql import functions as F

from fusus_spark.schema import DOCUMENTS_SCHEMA
from fusus_spark.streaming import extraction_stream
from tests.fixtures import fixture_documents


def test_streaming_matches_batch(spark, tmp_path):
    rows = [
        (d["url"], d["warc_ts"], d["html"], d["text"], d["lang"])
        for d in fixture_documents()
        if len(d["html"] or b"") < 64 * 1024  # keep the stream light
    ]
    docs = spark.createDataFrame(rows, schema=DOCUMENTS_SCHEMA)
    in_dir = str(tmp_path / "in")
    docs.repartition(4).write.parquet(in_dir)

    out_dir = str(tmp_path / "out")
    q = extraction_stream(
        spark, in_dir, out_dir, str(tmp_path / "ckpt"), max_files_per_trigger=2
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir + "/extracted")
    assert got.count() == len(rows)  # every url accounted once

    # byte-identical vs the batch path
    from fusus_spark.extraction.pipeline import extract_all, extracted_from_stage

    batch = extracted_from_stage(extract_all(docs)).select("url", "extracted_text")
    stream = got.select("url", "extracted_text")
    assert batch.exceptAll(stream).count() == 0
    assert stream.exceptAll(batch).count() == 0

    words = spark.read.parquet(out_dir + "/words")
    assert words.where(F.col("word").isNull()).count() == 0
