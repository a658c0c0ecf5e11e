"""End-to-end Spark tests: fixture corpus -> words/extracted/removals."""

from __future__ import annotations

from pyspark.sql import functions as F

from fusus_spark.extraction.pipeline import (
    count_extracted,
    extract_all,
    extract_removals,
    extracted_from_stage,
    size_route,
    words_from_stage,
)
from fusus_spark.schema import DOCUMENTS_SCHEMA
from tests.fixtures import FIXTURE_MAX_HTML_BYTES, fixture_documents

CAP = FIXTURE_MAX_HTML_BYTES


def _docs_df(spark):
    rows = [
        (d["url"], d["warc_ts"], d["html"], d["text"], d["lang"])
        for d in fixture_documents()
    ]
    return spark.createDataFrame(rows, schema=DOCUMENTS_SCHEMA)


def test_end_to_end_byte_identical(spark):
    docs = _docs_df(spark)
    stage = extract_all(docs, num_partitions=8, max_html_bytes=CAP).cache()
    extracted = {r["url"]: r for r in extracted_from_stage(stage).collect()}

    fixture = fixture_documents()
    assert len(extracted) == len(fixture), "every url must get a status row"
    for doc in fixture:
        row = extracted[doc["url"]]
        assert row["status"] == doc["status"], doc["url"]
        if doc["golden"] is not None and doc["status"] == "extracted":
            assert row["extracted_text"] == doc["golden"], doc["url"]

    counts = count_extracted(stage)
    n_extracted = sum(1 for d in fixture if d["status"] == "extracted")
    assert counts["extracted"] == n_extracted
    stage.unpersist()


def test_words_table_invariants(spark):
    docs = _docs_df(spark)
    stage = extract_all(docs, num_partitions=8, max_html_bytes=CAP).cache()
    words = words_from_stage(stage)

    # schema sanity
    assert [f.name for f in words.schema.fields] == [
        "url", "block_id", "line_id", "word_seq", "word", "punc",
        "char_start", "char_end",
    ]
    # span reconstruction against extracted_text (join through envelope)
    env = extracted_from_stage(stage).select("url", "extracted_text")
    joined = words.join(env, "url")
    bad = joined.where(
        F.expr("substring(extracted_text, char_start + 1, char_end - char_start)")
        != F.concat("word", "punc")
    ).count()
    assert bad == 0

    # monotone non-overlapping spans per url
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy("block_id", "line_id", "word_seq")
    overlap = (
        words.withColumn("prev_end", F.lag("char_end").over(w))
        .where(F.col("prev_end").isNotNull() & (F.col("char_start") < F.col("prev_end")))
        .count()
    )
    assert overlap == 0
    stage.unpersist()


def test_removals_diagnostics(spark):
    docs = _docs_df(spark)
    removals = extract_removals(docs)
    agg = {
        r["rule_id"]: r["n"]
        for r in removals.where(~F.col("kept"))
        .groupBy("rule_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert agg.get("tag:header", 0) >= 20  # chrome on plain + bulk pages
    assert agg.get("tag:footer", 0) >= 20
    kept = removals.where(F.col("kept")).count()
    assert kept >= 1  # the lookalike guard case


def test_emit_words_false_keeps_envelope_counts(spark):
    """extract_stage(emit_words=False): no word rows cross the Arrow
    channel, but envelopes (incl. n_words) and removals are identical
    to the full stage — the removals-only fast path contract."""
    from fusus_spark.extraction.pipeline import extract_stage, removals_from_stage

    docs = _docs_df(spark)
    full = extract_stage(docs, max_html_bytes=CAP)
    slim = extract_stage(docs, max_html_bytes=CAP, emit_words=False)
    assert slim.where(F.col("word_seq") >= 0).count() == 0
    assert full.where(F.col("word_seq") >= 0).count() > 0
    env_cols = ["url", "status", "n_blocks", "n_lines", "n_words", "n_removed"]
    a = extracted_from_stage(full).select(env_cols)
    b = extracted_from_stage(slim).select(env_cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    ra = removals_from_stage(full)
    rb = removals_from_stage(slim)
    assert ra.exceptAll(rb).count() == 0 and rb.exceptAll(ra).count() == 0


def test_size_route_matches_single_lane(spark):
    docs = _docs_df(spark)
    a = words_from_stage(extract_all(docs, num_partitions=4, max_html_bytes=CAP))
    b = words_from_stage(size_route(docs, big_bytes=64 * 1024,
                                    big_partitions=2, small_partitions=4,
                                    max_html_bytes=CAP))
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_deterministic_across_runs(spark):
    docs = _docs_df(spark)
    h1 = (
        words_from_stage(extract_all(docs, num_partitions=8, max_html_bytes=CAP))
        .orderBy("url", "block_id", "line_id", "word_seq")
        .select(F.md5(F.concat_ws("", "url", "word", "punc", "char_start")).alias("h"))
        .agg(F.md5(F.concat_ws("", F.collect_list("h"))).alias("corpus_hash"))
        .first()["corpus_hash"]
    )
    h2 = (
        words_from_stage(extract_all(docs, num_partitions=3, max_html_bytes=CAP))
        .orderBy("url", "block_id", "line_id", "word_seq")
        .select(F.md5(F.concat_ws("", "url", "word", "punc", "char_start")).alias("h"))
        .agg(F.md5(F.concat_ws("", F.collect_list("h"))).alias("corpus_hash"))
        .first()["corpus_hash"]
    )
    assert h1 == h2
