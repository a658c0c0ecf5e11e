"""Spark wiring: the fused extraction stage as one ``mapInArrow`` pass.

Physical design (SURVEY.md §2.10, §4.3):

* ONE Arrow round-trip per document batch — decode/parse/strip/segment
  are fused so the per-document DOM never serializes (the reference's
  per-page stage dict stays inside ``_doPage``; ours stays inside one
  UDF call);
* no per-row Python at the Spark level — batches arrive as Arrow
  RecordBatches and leave as pyarrow arrays built in bulk (input_hint
  compliance; the pandas block-manager round-trip of ``mapInPandas``
  costs ~20% of stage wall at full width, so the stage is Arrow-native);
* skew defense is explicit: ``repartition_salted`` hashes url+salt so
  one host's pages spread over all tasks; oversized payloads can be
  routed to a dedicated pass (``size_route``);
* empty/error/capped urls still emit exactly one accounting row
  (word_seq = -1), unlike the reference which writes nothing for empty
  pages (fusus/page.py:640-647) — at 10^12 documents silent drops are
  unacceptable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fusus_spark.extraction.extract import (
    DEFAULT_MAX_HTML_BYTES,
    STATUS_EXTRACTED,
    extract_document,
)
from fusus_spark.schema import (
    EXTRACTION_STAGE_SCHEMA,
    REMOVALS_SCHEMA,
)

_STAGE_COLS = [f.name for f in EXTRACTION_STAGE_SCHEMA.fields]


# Arrow schema mirroring EXTRACTION_STAGE_SCHEMA (IntegerType = int32).
_ARROW_STAGE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("lang", pa.string()),
        ("status", pa.string()),
        ("block_id", pa.int32()),
        ("line_id", pa.int32()),
        ("word_seq", pa.int32()),
        ("word", pa.string()),
        ("punc", pa.string()),
        ("char_start", pa.int32()),
        ("char_end", pa.int32()),
        ("n_blocks", pa.int32()),
        ("n_lines", pa.int32()),
        ("n_words", pa.int32()),
        ("n_removed", pa.int32()),
        ("extracted_text", pa.string()),
        ("error", pa.string()),
        ("rule_id", pa.string()),
        ("node_path", pa.string()),
        ("kept", pa.bool_()),
        ("score", pa.float64()),
        ("guard_ratio", pa.float64()),
    ]
)

_I32 = pa.int32()
_STR = pa.string()
_F64 = pa.float64()


def _extract_batches_arrow(
    urls: list, htmls: list, langs: list, max_html_bytes: int,
    emit_words: bool = True, charsets: list | None = None,
) -> tuple[pa.RecordBatch, pa.RecordBatch, pa.RecordBatch]:
    """One input batch of documents -> (word, envelope, removal rows).

    Layout: every url emits exactly ONE envelope row (word_seq = -1,
    carrying status/counts/extracted_text), one row per word
    (word_seq >= 0, envelope columns null), and one row per
    boilerplate-removal record (word_seq = -2, REMOVALS columns) — all
    from a SINGLE ``extract_document`` call, so a job consuming words +
    stats + removals parses the corpus once, not three times.
    ``emit_words=False`` skips building the word rows entirely (the
    dominant accumulator + Arrow payload of the stage) for consumers
    that only want envelopes/removals; counts on the envelope are
    unaffected. Arrays
    are built directly with pyarrow (``pa.array`` on python lists +
    ``pa.nulls`` for the all-null stretches): at 10^12 scale the
    words-table materialization dominates this stage, and skipping the
    pandas block-manager round-trip roughly halves its cost vs
    ``mapInPandas``.
    """
    # word-row accumulators
    w_url: list[str] = []
    w_block: list[int] = []
    w_line: list[int] = []
    w_seq: list[int] = []
    w_word: list[str] = []
    w_punc: list[str] = []
    w_cs: list[int] = []
    w_ce: list[int] = []
    # envelope-row accumulators (one per url)
    e_status: list[str] = []
    e_blocks: list[int] = []
    e_lines: list[int] = []
    e_words: list[int] = []
    e_removed: list[int] = []
    e_text: list[str | None] = []
    e_err: list[str | None] = []
    # removal-row accumulators (one per markData record)
    r_url: list[str] = []
    r_rule: list[str] = []
    r_path: list[str] = []
    r_kept: list[bool] = []
    r_score: list[float] = []
    r_guard: list[float] = []

    for url, html, lang, cs in zip(
        urls, htmls, langs, charsets or [None] * len(urls)
    ):
        res = extract_document(
            html, lang=lang, charset=cs, max_html_bytes=max_html_bytes
        )
        for rule_id, node_path, kept, score, guard in res["removals"]:
            r_url.append(url)
            r_rule.append(rule_id)
            r_path.append(node_path)
            r_kept.append(kept)
            r_score.append(score)
            r_guard.append(guard)
        rows = res["words"]
        if rows and emit_words:
            bl, ln, sq, wd, pc, cs, ce = zip(*rows)
            n = len(rows)
            w_url.extend([url] * n)
            w_block.extend(bl)
            w_line.extend(ln)
            w_seq.extend(sq)
            w_word.extend(wd)
            w_punc.extend(pc)
            w_cs.extend(cs)
            w_ce.extend(ce)
        e_status.append(res["status"])
        e_blocks.append(res["n_blocks"])
        e_lines.append(res["n_lines"])
        e_words.append(res["n_words"])
        e_removed.append(res["n_removed"])
        e_text.append(res["extracted_text"] if rows else None)
        e_err.append(res["error"])

    nw, ne, nr = len(w_url), len(urls), len(r_url)
    # lang/status live on the envelope row only: repeating them per word
    # would cost 2 string cells x rows in the Arrow channel; the removal
    # columns are pa.nulls on word/envelope rows (a validity bitmap, not
    # data — widening the schema costs ~nothing in the Arrow channel).
    words_rb = pa.RecordBatch.from_arrays(
        [
            pa.array(w_url, _STR),
            pa.nulls(nw, _STR),          # lang
            pa.nulls(nw, _STR),          # status
            pa.array(w_block, _I32),
            pa.array(w_line, _I32),
            pa.array(w_seq, _I32),
            pa.array(w_word, _STR),
            pa.array(w_punc, _STR),
            pa.array(w_cs, _I32),
            pa.array(w_ce, _I32),
            pa.nulls(nw, _I32),          # n_blocks
            pa.nulls(nw, _I32),          # n_lines
            pa.nulls(nw, _I32),          # n_words
            pa.nulls(nw, _I32),          # n_removed
            pa.nulls(nw, _STR),          # extracted_text
            pa.nulls(nw, _STR),          # error
            pa.nulls(nw, _STR),          # rule_id
            pa.nulls(nw, _STR),          # node_path
            pa.nulls(nw, pa.bool_()),    # kept
            pa.nulls(nw, _F64),          # score
            pa.nulls(nw, _F64),          # guard_ratio
        ],
        schema=_ARROW_STAGE_SCHEMA,
    )
    env_rb = pa.RecordBatch.from_arrays(
        [
            pa.array(urls, _STR),
            pa.array(langs, _STR),
            pa.array(e_status, _STR),
            pa.nulls(ne, _I32),          # block_id
            pa.nulls(ne, _I32),          # line_id
            pa.array([-1] * ne, _I32),   # word_seq marks the envelope
            pa.nulls(ne, _STR),          # word
            pa.nulls(ne, _STR),          # punc
            pa.nulls(ne, _I32),          # char_start
            pa.nulls(ne, _I32),          # char_end
            pa.array(e_blocks, _I32),
            pa.array(e_lines, _I32),
            pa.array(e_words, _I32),
            pa.array(e_removed, _I32),
            pa.array(e_text, _STR),
            pa.array(e_err, _STR),
            pa.nulls(ne, _STR),          # rule_id
            pa.nulls(ne, _STR),          # node_path
            pa.nulls(ne, pa.bool_()),    # kept
            pa.nulls(ne, _F64),          # score
            pa.nulls(ne, _F64),          # guard_ratio
        ],
        schema=_ARROW_STAGE_SCHEMA,
    )
    rem_rb = pa.RecordBatch.from_arrays(
        [
            pa.array(r_url, _STR),
            pa.nulls(nr, _STR),          # lang
            pa.nulls(nr, _STR),          # status
            pa.nulls(nr, _I32),          # block_id
            pa.nulls(nr, _I32),          # line_id
            pa.array([-2] * nr, _I32),   # word_seq marks removal rows
            pa.nulls(nr, _STR),          # word
            pa.nulls(nr, _STR),          # punc
            pa.nulls(nr, _I32),          # char_start
            pa.nulls(nr, _I32),          # char_end
            pa.nulls(nr, _I32),          # n_blocks
            pa.nulls(nr, _I32),          # n_lines
            pa.nulls(nr, _I32),          # n_words
            pa.nulls(nr, _I32),          # n_removed
            pa.nulls(nr, _STR),          # extracted_text
            pa.nulls(nr, _STR),          # error
            pa.array(r_rule, _STR),
            pa.array(r_path, _STR),
            pa.array(r_kept, pa.bool_()),
            pa.array(r_score, _F64),
            pa.array(r_guard, _F64),
        ],
        schema=_ARROW_STAGE_SCHEMA,
    )
    return words_rb, env_rb, rem_rb


def extract_stage(
    docs: DataFrame,
    *,
    max_html_bytes: int = DEFAULT_MAX_HTML_BYTES,
    emit_words: bool = True,
) -> DataFrame:
    """documents(url, warc_ts, html, text, lang) -> extraction stage rows.

    Only (url, html, lang) are read — plus ``charset`` when the input
    carries it (the transport-layer decode hint the WARC envelope
    retains; consulted only when strict UTF-8 fails) — column pruning
    keeps warc_ts/text out of the Arrow channel (the reference's
    minimal=True page handle analog, fusus/page.py:98-99). ``emit_words=False`` drops the word
    row kind at the source for envelope/removals-only consumers: the
    words table dominates the stage's accumulator + Arrow cost, and a
    removals query that builds it only to filter it out would pay the
    whole bill at 100 TB.
    """
    has_charset = "charset" in docs.columns
    pruned = docs.select(
        "url", "html", "lang", *(["charset"] if has_charset else [])
    )

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            if rb.num_rows == 0:
                continue
            cols = {name: i for i, name in enumerate(rb.schema.names)}
            urls = rb.column(cols["url"]).to_pylist()
            htmls = rb.column(cols["html"]).to_pylist()
            langs = rb.column(cols["lang"]).to_pylist()
            charsets = (
                rb.column(cols["charset"]).to_pylist() if has_charset else None
            )
            words_rb, env_rb, rem_rb = _extract_batches_arrow(
                urls, htmls, langs, max_html_bytes, emit_words, charsets
            )
            if words_rb.num_rows:
                yield words_rb
            yield env_rb
            if rem_rb.num_rows:
                yield rem_rb

    return pruned.mapInArrow(run, schema=EXTRACTION_STAGE_SCHEMA)


def words_from_stage(stage: DataFrame) -> DataFrame:
    """Stage rows -> the words table (one row per word, WORDS_SCHEMA)."""
    return stage.where(F.col("word_seq") >= 0).select(
        "url", "block_id", "line_id", "word_seq", "word", "punc",
        "char_start", "char_end",
    )


def extracted_from_stage(stage: DataFrame) -> DataFrame:
    """Stage rows -> per-url envelope (EXTRACTED_SCHEMA order).

    Exactly one row per url (the word_seq = -1 envelope row), including
    empty/error/capped urls.
    """
    env = stage.where(F.col("word_seq") == -1)
    return env.select(
        "url",
        "status",
        "lang",
        F.coalesce("n_blocks", F.lit(0)).alias("n_blocks"),
        F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
        F.coalesce("n_words", F.lit(0)).alias("n_words"),
        F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
        "extracted_text",
        "error",
    )


def removals_from_stage(stage: DataFrame) -> DataFrame:
    """Stage rows -> removal diagnostics (markData analog,
    REMOVALS_SCHEMA): the word_seq = -2 rows of the fused pass."""
    return stage.where(F.col("word_seq") == -2).select(
        *[f.name for f in REMOVALS_SCHEMA.fields]
    )


def extract_removals(docs: DataFrame, *, max_html_bytes: int = DEFAULT_MAX_HTML_BYTES) -> DataFrame:
    """documents -> removal diagnostics via the SAME fused ``mapInArrow``
    pass that produces words and envelopes — a job wanting words + stats
    + removals parses each document exactly once (the reference writes
    markData inside the same per-page pass, fusus/page.py:927-1017;
    round-2's standalone re-parse doubled the 100-TB scan).
    """
    pruned = docs
    if "lang" not in docs.columns:
        pruned = docs.withColumn("lang", F.lit(None).cast("string"))
    return removals_from_stage(
        extract_stage(pruned, max_html_bytes=max_html_bytes, emit_words=False)
    )


# ---------------------------------------------------------------------------
# Skew defense (SURVEY.md §4.2 item 1)


def repartition_salted(docs: DataFrame, num_partitions: int, salt: int = 42) -> DataFrame:
    """Spread url-keyed rows uniformly: hash(url, salt) % N.

    Host-level skew (one host contributing millions of pages that sort
    together in the input files) is defused because the salted hash
    ignores input order entirely. AQE only fixes join/agg skew; a heavy
    UDF stage needs explicit redistribution.

    Partitioning key is the raw 64-bit hash (NOT pre-modded to N): a
    pre-modded key gets re-hashed by the partitioner and the N distinct
    values collide birthday-style, leaving partitions empty/doubled.
    """
    return docs.repartition(num_partitions, F.xxhash64(F.col("url"), F.lit(salt)))


def size_route(
    docs: DataFrame,
    *,
    big_bytes: int = 1 * 1024 * 1024,
    big_partitions: int = 8,
    small_partitions: int = 64,
    max_html_bytes: int = DEFAULT_MAX_HTML_BYTES,
) -> DataFrame:
    """Two-lane extraction: oversized payloads get their own partitions.

    A 50 MB page in a batch of 1 KB pages serializes that task; routing
    giants to a dedicated narrow lane keeps the common lane's Arrow
    batches small and uniform (maxHits-guard philosophy: bound the
    pathological case explicitly).
    """
    size = F.octet_length(F.col("html"))
    small = repartition_salted(docs.where(size < F.lit(big_bytes)), small_partitions)
    big = repartition_salted(docs.where(size >= F.lit(big_bytes)), big_partitions, salt=7)
    return extract_stage(small, max_html_bytes=max_html_bytes).unionByName(
        extract_stage(big, max_html_bytes=max_html_bytes)
    )


def extract_all(
    docs: DataFrame,
    *,
    num_partitions: int | None = None,
    max_html_bytes: int = DEFAULT_MAX_HTML_BYTES,
    route_oversize: bool = True,
    big_bytes: int = 1 * 1024 * 1024,
) -> DataFrame:
    """End-to-end: documents -> extraction stage.

    Default path (the one entry()/extract_words run): size_route — the
    oversize lane keeps giants out of the common lane's Arrow batches,
    each lane salted-repartitioned. Cost note for the 100-TB plan: the
    two lanes each filter the source, so a columnar store scans the
    html column twice; that is the deliberate trade against a giant
    serializing a whole common-lane task (parse cost dominates scan
    cost ~10:1 for web HTML). route_oversize=False restores the
    single-scan salted repartition for inputs known to be size-capped
    upstream.
    """
    if num_partitions:
        if route_oversize:
            return size_route(
                docs,
                big_bytes=big_bytes,
                big_partitions=max(num_partitions // 8, 1),
                small_partitions=num_partitions,
                max_html_bytes=max_html_bytes,
            )
        docs = repartition_salted(docs, num_partitions)
    return extract_stage(docs, max_html_bytes=max_html_bytes)


def count_extracted(stage: DataFrame) -> dict[str, int]:
    """Driver-side accounting (A4/A5 metrics analog): status counts."""
    rows = (
        stage.where(F.col("word_seq") == -1)
        .groupBy("status")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    out = {r["status"]: r["n"] for r in rows}
    out.setdefault(STATUS_EXTRACTED, 0)
    return out
