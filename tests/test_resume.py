"""Kill/resume acceptance test (north rule: resume-exactly).

Run the bucketed extraction job, inject a crash after k buckets,
resume, and assert the final output is byte-identical to a single
uninterrupted run — plus ledger completeness and lineage invalidation.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fusus_spark.schema import DOCUMENTS_SCHEMA
from fusus_spark.sources.ledger import (
    BucketLock,
    Ledger,
    input_lineage,
    run_extraction_job,
    write_bucketed_input,
)
from tests.fixtures import fixture_documents

N_BUCKETS = 4


@pytest.fixture(scope="module")
def bucketed_input(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("job") / "input")
    rows = [
        (d["url"], d["warc_ts"], d["html"], d["text"], d["lang"])
        for d in fixture_documents()
    ]
    docs = spark.createDataFrame(rows, schema=DOCUMENTS_SCHEMA)
    write_bucketed_input(docs, path, N_BUCKETS)
    return path


def _corpus_hash(spark, out_path: str) -> str:
    df = spark.read.parquet(out_path)
    return (
        df.orderBy("url", "block_id", "line_id", "word_seq")
        .select(
            F.md5(
                F.concat_ws("\x1f", "url", "block_id", "line_id", "word_seq",
                            "word", "punc", "char_start", "char_end")
            ).alias("h")
        )
        .agg(F.md5(F.concat_ws("", F.collect_list("h"))).alias("ch"))
        .first()["ch"]
    )


def test_kill_and_resume_identical(spark, bucketed_input, tmp_path):
    # Reference run: uninterrupted.
    ref_out = str(tmp_path / "ref_out")
    ref_ledger = str(tmp_path / "ref_ledger")
    summary = run_extraction_job(
        spark, bucketed_input, ref_out, ref_ledger, N_BUCKETS
    )
    assert summary["processed"] == N_BUCKETS
    ref_hash = _corpus_hash(spark, ref_out + "/bucket=*")

    # Killed run: crash after 2 buckets.
    out = str(tmp_path / "out")
    ledger_path = str(tmp_path / "ledger")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_extraction_job(
            spark, bucketed_input, out, ledger_path, N_BUCKETS, fail_after=2
        )
    ledger = Ledger(ledger_path)
    done_after_crash = [r["partition_id"] for r in ledger.rows()]
    assert len(done_after_crash) == 2

    # Resume: must process exactly the remaining buckets.
    summary2 = run_extraction_job(spark, bucketed_input, out, ledger_path, N_BUCKETS)
    assert summary2["skipped"] == 2
    assert summary2["processed"] == N_BUCKETS - 2

    # Final state identical to uninterrupted run.
    assert _corpus_hash(spark, out + "/bucket=*") == ref_hash

    # Ledger: one row per bucket with lineage + metrics.
    rows = ledger.rows()
    assert len(rows) == N_BUCKETS
    for r in rows:
        assert r["status"] == "done"
        assert r["rows_in"] > 0
        assert r["bytes_in"] > 0
        assert r["input_snapshot_id"]
        assert r["wall_ms"] >= 0

    # Idempotence: immediate re-run skips everything.
    summary3 = run_extraction_job(spark, bucketed_input, out, ledger_path, N_BUCKETS)
    assert summary3["processed"] == 0
    assert summary3["skipped"] == N_BUCKETS


def test_kill_between_write_and_rename(spark, bucketed_input, tmp_path):
    """Crash AFTER the staging write but BEFORE the atomic rename: the
    bucket must not be visible to readers (no partial dir under the
    final name), the ledger must not mark it, and the resumed run must
    converge to the byte-identical final state with no stale staging
    dirs left behind."""
    ref_out = str(tmp_path / "ref_out")
    run_extraction_job(
        spark, bucketed_input, ref_out, str(tmp_path / "ref_ledger"), N_BUCKETS
    )
    ref_hash = _corpus_hash(spark, ref_out + "/bucket=*")

    out = str(tmp_path / "out")
    ledger_path = str(tmp_path / "ledger")
    with pytest.raises(RuntimeError, match="between write and rename"):
        run_extraction_job(
            spark, bucketed_input, out, ledger_path, N_BUCKETS,
            fail_before_commit=1,
        )
    ledger = Ledger(ledger_path)
    assert len(ledger.rows()) == 1  # only the bucket committed before the crash
    committed = {r["partition_id"] for r in ledger.rows()}
    # the crashed bucket left a dir in the SIBLING staging tree but no
    # final dir — a concurrent reader of out/ sees only complete buckets
    victims = [d for d in os.listdir(out + ".staging") if d.startswith("bucket=")]
    assert len(victims) == 1
    finals = set(os.listdir(out))
    assert finals == committed
    # the table root stays readable mid-crash (no partial/conflicting dirs)
    visible = spark.read.parquet(out).count()
    assert visible > 0

    summary = run_extraction_job(spark, bucketed_input, out, ledger_path, N_BUCKETS)
    assert summary["skipped"] == 1
    assert summary["processed"] == N_BUCKETS - 1
    assert _corpus_hash(spark, out + "/bucket=*") == ref_hash
    # every staging dir was either swept (the crashed attempt) or
    # renamed into the table — the staging tree drains to empty
    assert os.listdir(out + ".staging") == []


def test_multi_emit_one_parse_three_tables(spark, bucketed_input, tmp_path):
    """emit=(words, extracted, removals): one fused parse per bucket
    feeds all three tables, each bucket-committed atomically; the
    contents match the batch accessors and a killed run resumes."""
    from pyspark.sql import functions as F

    from fusus_spark.extraction.pipeline import (
        extract_all,
        extract_removals,
        extracted_from_stage,
    )

    out = str(tmp_path / "out3")
    ledger_path = str(tmp_path / "ledger3")
    emit = ("words", "extracted", "removals")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_extraction_job(
            spark, bucketed_input, out, ledger_path, N_BUCKETS,
            emit=emit, fail_after=2,
        )
    summary = run_extraction_job(
        spark, bucketed_input, out, ledger_path, N_BUCKETS, emit=emit
    )
    assert summary["processed"] == N_BUCKETS - 2 and summary["skipped"] == 2

    docs = spark.read.parquet(bucketed_input).drop("bucket")
    want_env = extracted_from_stage(extract_all(docs, num_partitions=4))
    got_env = spark.read.parquet(out + "/extracted/bucket=*")
    assert got_env.count() == want_env.count()
    assert got_env.exceptAll(want_env).count() == 0

    want_rem = extract_removals(docs).where(~F.col("kept")).count()
    got_rem = (
        spark.read.parquet(out + "/removals/bucket=*")
        .where(~F.col("kept")).count()
    )
    assert got_rem == want_rem
    assert spark.read.parquet(out + "/words/bucket=*").count() > 0

    # ledger carries per-kind metrics
    rows = Ledger(ledger_path).rows()
    assert all(set(r["outputs"]) == set(emit) for r in rows)


def test_lineage_invalidation(spark, bucketed_input, tmp_path):
    out = str(tmp_path / "out2")
    ledger_path = str(tmp_path / "ledger2")
    run_extraction_job(spark, bucketed_input, out, ledger_path, N_BUCKETS)
    ledger = Ledger(ledger_path)
    # the stored key is input lineage + the emit-set suffix
    lineage0 = input_lineage(bucketed_input, 0) + "+emit=words"
    assert ledger.is_done(0, lineage0)
    # If the input bucket changes, the bucket is no longer considered done.
    assert not ledger.is_done(0, "different-lineage")
    # Corrupt ledger file -> treated as not-done (safe redo, not crash).
    with open(os.path.join(ledger_path, "bucket=1.json"), "w") as f:
        f.write("{broken json")
    assert not ledger.is_done(1, input_lineage(bucketed_input, 1) + "+emit=words")


def test_by_date_grid_resume_and_reprocess(spark, tmp_path):
    """Crawl-date layout: (date, bucket) restart units, per-date
    reprocessing, and output identical to the undated run."""
    from fusus_spark.sources.ledger import (
        list_crawl_dates,
        run_extraction_job_by_date,
    )

    rows = [
        (d["url"], d["warc_ts"], d["html"], d["text"], d["lang"])
        for d in fixture_documents()
    ]
    docs = spark.createDataFrame(rows, schema=DOCUMENTS_SCHEMA)
    inp = str(tmp_path / "dated_input")
    write_bucketed_input(docs, inp, N_BUCKETS, date_col="warc_ts")
    assert list_crawl_dates(inp) == ["2026-01-01", "2026-01-02"]

    out = str(tmp_path / "dated_out")
    led = str(tmp_path / "dated_ledger")
    s1 = run_extraction_job_by_date(spark, inp, out, led, N_BUCKETS)
    assert s1["_total"]["processed"] == 2 * N_BUCKETS
    assert s1["_total"]["skipped"] == 0

    # resume: everything skips, on both date grids
    s2 = run_extraction_job_by_date(spark, inp, out, led, N_BUCKETS)
    assert s2["_total"]["processed"] == 0
    assert s2["_total"]["skipped"] == 2 * N_BUCKETS

    # the dated output equals the undated single-table run byte-for-byte
    flat_inp = str(tmp_path / "flat_input")
    flat_out = str(tmp_path / "flat_out")
    write_bucketed_input(docs, flat_inp, N_BUCKETS)
    run_extraction_job(spark, flat_inp, flat_out, str(tmp_path / "flat_led"), N_BUCKETS)
    assert _corpus_hash(spark, out) == _corpus_hash(spark, flat_out)

    # reprocess ONE date: only that date's grid runs
    s3 = run_extraction_job_by_date(
        spark, inp, out, led, N_BUCKETS, dates=["2026-01-02"]
    )
    assert set(s3) == {"2026-01-02", "_total"}
    assert s3["_total"]["skipped"] == N_BUCKETS

    # a changed input on one date invalidates only that date's buckets
    day1 = [r for r in rows if str(r[1])[:10] == "2026-01-01"]
    spark.createDataFrame(day1, schema=DOCUMENTS_SCHEMA).createOrReplaceTempView("d1")
    write_bucketed_input(
        spark.table("d1"), inp + "/crawl_date=2026-01-01", N_BUCKETS
    )
    s4 = run_extraction_job_by_date(spark, inp, out, led, N_BUCKETS)
    assert s4["2026-01-02"]["skipped"] == N_BUCKETS
    assert s4["2026-01-01"]["processed"] > 0


def test_crawl_date_is_session_timezone_independent(spark, tmp_path):
    """crawl_date must be UTC epoch-day arithmetic: the same instants
    land in the same partitions whatever the session timezone."""
    import datetime as dt

    from fusus_spark.sources.ledger import list_crawl_dates

    # 00:30 UTC on Jan 2 — a tz-dependent to_date would put this on
    # Jan 1 under a western-hemisphere session timezone
    rows = [("https://ex.com/a", dt.datetime(2026, 1, 2, 0, 30,
                                             tzinfo=dt.timezone.utc),
             b"<p>x</p>", "x", "en")]
    docs = spark.createDataFrame(rows, schema=DOCUMENTS_SCHEMA)
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
        p1 = str(tmp_path / "tz_la")
        write_bucketed_input(docs, p1, 2, date_col="warc_ts")
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    p2 = str(tmp_path / "tz_utc")
    write_bucketed_input(docs, p2, 2, date_col="warc_ts")
    assert list_crawl_dates(p1) == list_crawl_dates(p2) == ["2026-01-02"]


def test_bucket_lock_concurrent_writer_semantics(spark, bucketed_input, tmp_path):
    """Single-writer bucket locks: a LIVE foreign lock makes a writer
    skip that bucket (concurrent instances partition the work); a STALE
    lock (dead pid) is broken and taken over; a completed run leaves no
    locks behind."""
    import json
    import socket
    import time as _time

    out = str(tmp_path / "lk_out")
    ledger_path = str(tmp_path / "lk_ledger")
    locks = os.path.join(ledger_path, "locks")
    os.makedirs(locks, exist_ok=True)
    # bucket 1: held by a LIVE other process (pid 1 exists and is not us)
    with open(os.path.join(locks, "bucket=1.lock"), "w") as f:
        json.dump({"pid": 1, "host": socket.gethostname(), "ts": _time.time()}, f)
    # bucket 2: stale holder (dead pid) -> broken and taken over
    with open(os.path.join(locks, "bucket=2.lock"), "w") as f:
        json.dump({"pid": 2**22 + 12345, "host": socket.gethostname(),
                   "ts": _time.time()}, f)

    s1 = run_extraction_job(spark, bucketed_input, out, ledger_path, N_BUCKETS)
    assert s1["locked"] == 1 and s1["processed"] == N_BUCKETS - 1
    done = {r["partition_id"] for r in Ledger(ledger_path).rows()}
    assert "bucket=1" not in done and "bucket=2" in done

    # the foreign writer "finishes" (lock released): a second run takes
    # the remaining bucket and the output converges to all buckets done
    os.unlink(os.path.join(locks, "bucket=1.lock"))
    s2 = run_extraction_job(spark, bucketed_input, out, ledger_path, N_BUCKETS)
    assert s2["processed"] == 1 and s2["skipped"] == N_BUCKETS - 1
    assert s2["locked"] == 0
    assert not os.listdir(locks)  # no locks left behind


def test_bucket_lock_exception_release_and_reentrancy(spark, bucketed_input, tmp_path):
    """An in-process failure releases the lock (finally), so a transient
    error never blocks other instances for the staleness window; the
    lock is also reentrant by pid as defense in depth, and age-stale
    foreign locks are broken."""
    out = str(tmp_path / "re_out")
    ledger_path = str(tmp_path / "re_ledger")
    with pytest.raises(RuntimeError, match="between write and rename"):
        run_extraction_job(
            spark, bucketed_input, out, ledger_path, N_BUCKETS,
            fail_before_commit=1,
        )
    locks = os.path.join(ledger_path, "locks")
    # the failed attempt RELEASED its lock on the way out
    assert os.listdir(locks) == []
    s = run_extraction_job(spark, bucketed_input, out, ledger_path, N_BUCKETS)
    assert s["locked"] == 0 and s["processed"] + s["skipped"] == N_BUCKETS
    assert not os.listdir(locks)

    lk = BucketLock(ledger_path, stale_after_s=3600.0)
    # reentrancy: our own live leftover (the process-crash simulation a
    # finally cannot cover) does not block re-acquisition
    assert lk.acquire(0) is True
    assert lk.acquire(0) is True
    lk.release(0)

    # age-based staleness: a foreign LIVE pid but ancient timestamp
    import json
    import socket

    lk0 = BucketLock(ledger_path, stale_after_s=0.0)
    with open(os.path.join(locks, "bucket=0.lock"), "w") as f:
        json.dump({"pid": 1, "host": socket.gethostname(), "ts": 0}, f)
    assert lk0.acquire(0) is True
    lk0.release(0)

    # a live foreign lock with an UNREADABLE payload younger than the
    # write-grace window is treated as held (mid-creation race), not junk
    with open(os.path.join(locks, "bucket=1.lock"), "w") as f:
        f.write("")  # empty: exactly what a mid-write lock looks like
    assert BucketLock(ledger_path).acquire(1) is False
    os.unlink(os.path.join(locks, "bucket=1.lock"))


def test_extraction_job_respect_robots(spark, tmp_path):
    """respect_robots drops meta-noindex pages BEFORE the parse: they
    appear in no output table and rows_in counts processed docs only."""
    from tests.fixtures import fixture_documents

    rows = []
    for i, d in enumerate(fixture_documents()[:12]):
        html = d["html"]
        if i % 3 == 0:  # every third page opts out
            html = b'<meta name="robots" content="noindex">' + html
        rows.append((d["url"], d["warc_ts"], html, d["text"], d["lang"]))
    docs = spark.createDataFrame(rows, schema=DOCUMENTS_SCHEMA)
    inp = str(tmp_path / "rb_in")
    write_bucketed_input(docs, inp, 2)

    out = str(tmp_path / "rb_out")
    summary = run_extraction_job(
        spark, inp, out, str(tmp_path / "rb_ledger"), 2, respect_robots=True
    )
    assert summary["processed"] == 2
    opted = {r[0] for i, r in enumerate(rows) if i % 3 == 0}
    words = spark.read.parquet(out + "/bucket=*")
    assert words.where(words["url"].isin(list(opted))).count() == 0
    assert words.count() > 0
    rows_in = sum(r["rows_in"] for r in Ledger(str(tmp_path / "rb_ledger")).rows())
    assert rows_in == 12 - len(opted)


def test_respect_robots_is_part_of_the_resume_key(spark, bucketed_input, tmp_path):
    """Toggling --respect-robots must invalidate done buckets: a resume
    under a different consent policy reprocesses, never skips."""
    out = str(tmp_path / "rk_out")
    ledger_path = str(tmp_path / "rk_ledger")
    s1 = run_extraction_job(spark, bucketed_input, out, ledger_path, N_BUCKETS)
    assert s1["processed"] == N_BUCKETS
    s2 = run_extraction_job(spark, bucketed_input, out, ledger_path, N_BUCKETS,
                            respect_robots=True)
    assert s2["processed"] == N_BUCKETS and s2["skipped"] == 0
    # and the robots-mode run is itself resumable
    s3 = run_extraction_job(spark, bucketed_input, out, ledger_path, N_BUCKETS,
                            respect_robots=True)
    assert s3["skipped"] == N_BUCKETS


def test_doc_level_emit_kinds_side_tables(spark, tmp_path):
    """emit mixing parse-derived and doc-level kinds: image_pairs /
    pagemeta / jsonld / media_refs ride the same bucket grid, staged
    commit, and resume semantics; contents match the direct operators
    over the same (consent-filtered) rows."""
    from fusus_spark.operators.multimodal import image_text_pairs
    from fusus_spark.operators.pagemeta import page_metadata

    inp = str(tmp_path / "input")
    rows = []
    for i in range(40):
        html = (
            f'<html><head><title>T{i}</title>'
            f'<script type="application/ld+json">'
            f'{{"@type":"Article","headline":"H{i}"}}</script></head>'
            f"<body><figure><img src='/i/{i}.jpg' alt='a{i}'>"
            f"<figcaption>cap {i}</figcaption></figure>"
            f'<video src="/v/{i}.mp4"></video>'
            f"<p>body {i}</p></body></html>"
        ).encode()
        rows.append((f"http://h{i % 5}.com/p/{i}", None, html, None, "en"))
    docs = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    write_bucketed_input(docs, inp, N_BUCKETS)

    out = str(tmp_path / "out")
    ledger_path = str(tmp_path / "ledger")
    emit = ("words", "image_pairs", "pagemeta", "jsonld", "media_refs")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_extraction_job(
            spark, inp, out, ledger_path, N_BUCKETS, emit=emit, fail_after=2
        )
    summary = run_extraction_job(
        spark, inp, out, ledger_path, N_BUCKETS, emit=emit
    )
    assert summary["processed"] == N_BUCKETS - 2 and summary["skipped"] == 2

    raw = spark.read.parquet(inp).drop("bucket")
    got_pairs = spark.read.parquet(out + "/image_pairs/bucket=*")
    want_pairs = image_text_pairs(raw)
    assert got_pairs.count() == want_pairs.count() == 40
    assert got_pairs.exceptAll(want_pairs).count() == 0

    got_meta = spark.read.parquet(out + "/pagemeta/bucket=*")
    want_meta = page_metadata(raw)
    assert got_meta.count() == 40
    assert got_meta.exceptAll(want_meta).count() == 0

    assert spark.read.parquet(out + "/jsonld/bucket=*").count() == 40
    assert spark.read.parquet(out + "/media_refs/bucket=*").count() == 40
    assert spark.read.parquet(out + "/words/bucket=*").count() > 0

    rows_l = Ledger(ledger_path).rows()
    assert all(set(r["outputs"]) == set(emit) for r in rows_l)


def test_doc_level_emit_only_skips_parse(spark, tmp_path):
    """emit with ONLY doc-level kinds never builds the parse stage —
    the job completes and emits the side table alone (layout stays
    multi-kind? no: single kind keeps the legacy flat layout)."""
    from fusus_spark.operators.pagemeta import jsonld_records

    inp = str(tmp_path / "input")
    rows = [
        (f"http://ex.com/{i}", None,
         (f'<script type="application/ld+json">'
          f'{{"@type":"Recipe","name":"r{i}"}}</script>').encode(),
         None, "en")
        for i in range(12)
    ]
    docs = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    write_bucketed_input(docs, inp, 2)

    out = str(tmp_path / "out")
    summary = run_extraction_job(
        spark, inp, out, str(tmp_path / "ledger"), 2, emit=("jsonld",)
    )
    assert summary["processed"] == 2
    got = spark.read.parquet(out + "/bucket=*")
    want = jsonld_records(spark.read.parquet(inp).drop("bucket"))
    assert got.count() == want.count() == 12
    assert got.exceptAll(want).count() == 0


def test_emit_set_is_part_of_the_resume_key(spark, tmp_path):
    """Adding a kind to a finished run must REDO buckets (and produce
    the new side table) rather than skip-all and silently emit
    nothing (review finding)."""
    inp = str(tmp_path / "input")
    rows = [
        (f"http://ex.com/{i}", None,
         (f'<p>body {i}</p><script type="application/ld+json">'
          f'{{"@type":"Article","headline":"H{i}"}}</script>').encode(),
         None, "en")
        for i in range(12)
    ]
    docs = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    write_bucketed_input(docs, inp, 2)
    out = str(tmp_path / "out")
    led = str(tmp_path / "ledger")

    s1 = run_extraction_job(spark, inp, out, led, 2, emit=("words",))
    assert s1["processed"] == 2
    s2 = run_extraction_job(spark, inp, out, led, 2, emit=("words", "jsonld"))
    assert s2["processed"] == 2 and s2["skipped"] == 0   # invalidated
    assert spark.read.parquet(out + "/jsonld/bucket=*").count() == 12
    # identical emit resumes as before
    s3 = run_extraction_job(spark, inp, out, led, 2, emit=("words", "jsonld"))
    assert s3["skipped"] == 2 and s3["processed"] == 0
