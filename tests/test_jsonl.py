"""JSONL source tests: C4-shaped and OSCAR-shaped dumps -> documents rows."""

from __future__ import annotations

import gzip
import json

from pyspark.sql import functions as F

from fusus_spark.sources.jsonl import read_jsonl_docs


def test_read_jsonl_c4_shape(spark, tmp_path):
    rows = [
        {"url": "http://a.com/1", "text": "alpha beta", "timestamp": "2026-01-02T03:04:05Z", "lang": "en"},
        {"url": "http://a.com/2", "text": "gamma", "timestamp": "2026-01-03T00:00:00Z", "lang": "de"},
        {"text": "no url row", "timestamp": None, "lang": "en"},  # url missing
    ]
    p = tmp_path / "part-0.jsonl.gz"
    p.write_bytes(gzip.compress("\n".join(json.dumps(r) for r in rows).encode()))
    # a malformed line must not kill the read
    (tmp_path / "part-1.jsonl").write_text('{"url": "http://a.com/3", "text": "delta"}\n{broken\n')

    docs = read_jsonl_docs(spark, str(tmp_path))
    got = {r["url"]: r for r in docs.where(F.col("text").isNotNull()).collect()}
    assert got["http://a.com/1"]["text"] == "alpha beta"
    assert got["http://a.com/1"]["lang"] == "en"
    assert got["http://a.com/1"]["warc_ts"] is not None
    assert got["http://a.com/2"]["html"] is None
    assert got["http://a.com/3"]["warc_ts"] is None
    # url-less row got a deterministic synthetic key
    synth = [u for u in got if u.startswith("jsonl://")]
    assert len(synth) == 1 and got[synth[0]]["text"] == "no url row"
    # schema is the mandated documents shape
    assert docs.columns == ["url", "warc_ts", "html", "text", "lang"]


def test_read_jsonl_oscar_shape(spark, tmp_path):
    (tmp_path / "d.jsonl").write_text(
        '{"id": "doc-1", "content": "omega words here", "meta_lang": "fr"}\n'
    )
    docs = read_jsonl_docs(
        spark, str(tmp_path),
        url_field="id", text_field="content", ts_field="date", lang_field="meta_lang",
    )
    r = docs.collect()[0]
    assert r["url"] == "doc-1" and r["text"] == "omega words here" and r["lang"] == "fr"


def test_jsonl_feeds_downstream_operators(spark, tmp_path):
    """The ingested shape drives the text operators directly."""
    from fusus_spark.operators.textstats import doc_token_stats

    lines = [json.dumps({"url": f"http://x/{i}", "text": f"w{i} common words"})
             for i in range(20)]
    (tmp_path / "d.jsonl").write_text("\n".join(lines))
    docs = read_jsonl_docs(spark, str(tmp_path)).withColumn(
        "doc_id", F.monotonically_increasing_id()
    )
    stats = doc_token_stats(docs)
    assert stats.count() == 20
    assert stats.agg(F.min("n_tokens")).first()[0] == 3
