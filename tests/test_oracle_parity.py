"""Pytest wrapper over the oracle-parity harness (driver-contract guard).

Runs a representative subset at sf0.001 (fast) — the full sweep is
``python tools/parity.py /root/testdata/sf0.01``.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from fusus_spark.sources.testdata import TABLES
from tools.parity import value_hash

SF_DIR = "/root/testdata/sf0.001"

FAST_SUBSET = [
    "extract_words",
    "extract_text",
    "token_stats",
    "top_words",
    "dedup_exact",
    "dedup_minhash_lsh",
    "knn_bruteforce",
    "pricing_summary",
    "sessionize",
    "events_daily",
    "multimodal_meta",
    "events_asof",
    "lineitem_rollup",
    "curate_corpus",
    # round-2 surface
    "extract_words_hard",
    "align_merged",
    "align_quality",
    "normalize_rewrites",
    "translit_schemes",
    "toc_distill",
    "multimodal_resize",
    "multimodal_frames",
    "dedup_embedding",
    "levenshtein_pairs",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", FAST_SUBSET)
def test_query_matches_oracle(spark, duck, name):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    sdf = qs[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    orc = duck.sql(oracles[name])
    orows = [tuple(r) for r in orc.fetchall()]
    assert len(srows) == len(orows), f"{name}: row count"
    assert sorted(sdf.columns) == sorted(orc.columns), f"{name}: schema"
    assert value_hash(sdf.columns, srows) == value_hash(orc.columns, orows), (
        f"{name}: value hash"
    )


@pytest.mark.parametrize("name", ["extract_text", "extract_text_hard", "extract_words_hard"])
def test_extraction_parity_with_empty_docs(spark, tmp_path, name):
    """Empty / whitespace-only documents: the engine emits an empty token
    array while DuckDB string_split('', ' ') yields [''] — the oracles'
    guarded token expression must agree (advisor round-2 latent bug)."""
    import duckdb as ddb

    sf_dir = str(tmp_path)
    ddb.sql(
        "COPY (SELECT * FROM (VALUES "
        "(0::BIGINT, 'alpha beta gamma', 'en', 'web', 16::BIGINT), "
        "(1::BIGINT, '', 'en', 'web', 0::BIGINT), "
        "(2::BIGINT, '   ', 'en', 'web', 3::BIGINT), "
        "(3::BIGINT, 'solo', 'en', 'web', 4::BIGINT)"
        ") t(doc_id, text, lang, source, n_chars)) "
        f"TO '{sf_dir}/documents.parquet' (FORMAT PARQUET)"
    )
    con = ddb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    sdf = entrymod.queries()[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    orc = con.sql(entrymod.oracle_sql()[name])
    orows = [tuple(r) for r in orc.fetchall()]
    assert len(srows) == len(orows), f"{name}: row count"
    assert value_hash(sdf.columns, srows) == value_hash(orc.columns, orows), name


def test_entry_contract(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "word" in df.columns and "char_start" in df.columns


def test_every_oracle_key_has_query():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 30
