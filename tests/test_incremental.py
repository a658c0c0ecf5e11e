"""Incremental snapshot dedup: bloom prefilter correctness (no false
drops), exact equivalence to a plain anti-join, measured fpp, snapshot
accumulation, and the partition-pruned verify scan."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from fusus_spark.operators.dedup import (
    HashBloom,
    bloom_params,
    build_hash_bloom,
    incremental_dedup,
    write_hash_store,
)


def _snapshot_rows(start: int, n: int) -> list[tuple[int, str]]:
    return [(i, f"snapshot document number {i} body text with words") for i in range(start, start + n)]


def _new_batch(n_dup: int, n_new: int) -> list[tuple[int, str]]:
    rows = [(10_000 + i, f"snapshot document number {i} body text with words") for i in range(n_dup)]
    rows += [(20_000 + i, f"fresh never seen content item {i} here") for i in range(n_new)]
    return rows


def test_incremental_dedup_exact_and_bloom_agree(spark, tmp_path):
    store = str(tmp_path / "store")
    snap = spark.createDataFrame(_snapshot_rows(0, 1000), "doc_id long, text string")
    write_hash_store(snap, store)
    new = spark.createDataFrame(_new_batch(50, 150), "doc_id long, text string")

    plain = {r["doc_id"]: r["is_seen"] for r in incremental_dedup(new, store).collect()}
    assert sum(plain.values()) == 50
    assert all(plain[10_000 + i] for i in range(50))
    assert not any(plain[20_000 + i] for i in range(150))

    bloom = build_hash_bloom(
        snap.select(F.md5(F.trim(F.regexp_replace("text", r"\s+", " "))).alias("content_hash")),
        expected_items=1000,
    )
    with_bloom = {r["doc_id"]: r["is_seen"] for r in
                  incremental_dedup(new, store, bloom=bloom).collect()}
    # bloom path returns the byte-identical verdict set: false positives
    # are corrected by the exact verify, and true dups always probe maybe
    assert with_bloom == plain


def test_bloom_fpp_measured(spark):
    m, k = bloom_params(1000, fpp=0.01)
    snap = spark.createDataFrame(_snapshot_rows(0, 1000), "doc_id long, text string")
    bloom = build_hash_bloom(
        snap.select(F.md5(F.trim(F.regexp_replace("text", r"\s+", " "))).alias("content_hash")),
        expected_items=1000,
    )
    assert (bloom.m_bits, bloom.k) == (m, k)
    # every member probes positive (blooms have no false negatives)
    member_hashes = [
        r[0] for r in snap.select(
            F.md5(F.trim(F.regexp_replace("text", r"\s+", " ")))).collect()
    ]
    assert all(bloom.maybe_contains(h) for h in member_hashes)
    # measured fpp on 2000 non-members stays near the design point
    import hashlib

    probes = [hashlib.md5(f"not in snapshot {i}".encode()).hexdigest() for i in range(2000)]
    fp = sum(bloom.maybe_contains(h) for h in probes)
    assert fp / 2000 < 0.05  # 1% design, generous host-independent bound


def test_incremental_dedup_accumulates_snapshots(spark, tmp_path):
    store = str(tmp_path / "store")
    write_hash_store(
        spark.createDataFrame(_snapshot_rows(0, 100), "doc_id long, text string"), store
    )
    write_hash_store(
        spark.createDataFrame(_snapshot_rows(100, 100), "doc_id long, text string"), store
    )
    # one dup from each snapshot + one novel doc
    new = spark.createDataFrame(
        [
            (1, "snapshot document number 5 body text with words"),
            (2, "snapshot document number 150 body text with words"),
            (3, "entirely new material"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["is_seen"] for r in incremental_dedup(new, store).collect()}
    assert got == {1: True, 2: True, 3: False}


def test_incremental_verify_scan_is_partition_pruned(spark, tmp_path):
    store = str(tmp_path / "store")
    write_hash_store(
        spark.createDataFrame(_snapshot_rows(0, 500), "doc_id long, text string"), store
    )
    # bloom path with a single maybe row -> the verify scan must carry a
    # prefix PartitionFilter, not read all 256 directories (the
    # bloom-less path deliberately skips pruning: every row is a maybe)
    snap_hashes = spark.createDataFrame(
        _snapshot_rows(0, 500), "doc_id long, text string"
    ).select(F.md5(F.trim(F.regexp_replace("text", r"\s+", " "))).alias("content_hash"))
    bloom = build_hash_bloom(snap_hashes, expected_items=500)
    new = spark.createDataFrame(
        [(1, "snapshot document number 5 body text with words")], "doc_id long, text string"
    )
    df = incremental_dedup(new, store, bloom=bloom)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(True)
    plan = buf.getvalue()
    import re

    assert re.search(r"PartitionFilters: \[[^\]]*prefix", plan), plan[-2000:]
    assert {r["is_seen"] for r in df.collect()} == {True}


def test_bloom_params_gate():
    import pytest

    with pytest.raises(ValueError):
        bloom_params(10**12, fpp=0.01)
    m, k = bloom_params(10**6, 0.01)
    assert m % 64 == 0 and 5 <= k <= 10


def test_hashbloom_probe_matches_builder_expression(spark):
    """The python prober and the JVM builder must derive identical
    positions — set exactly one hash and probe it."""
    one = spark.createDataFrame([("cafe" * 8,)], "content_hash string")
    bloom = build_hash_bloom(one, expected_items=1, fpp=0.01)
    assert bloom.maybe_contains("cafe" * 8)
    assert not bloom.maybe_contains("beef" * 8)


def test_incremental_dedup_null_text_does_not_crash(spark, tmp_path):
    """A null text (dirty crawl row) must flow through BOTH probe paths
    as definite-new (a null hash can never equal a store hash), never
    crash the Arrow batch (regression: the numpy probe once applied
    `>>` to NaN positions)."""
    store = str(tmp_path / "nstore")
    snap = spark.createDataFrame(_snapshot_rows(0, 50), "doc_id long, text string")
    write_hash_store(snap, store)
    rows = [(1000, None),
            (1001, "snapshot document number 7 body text with words"),
            (1002, "novel text")]
    new = spark.createDataFrame(rows, "doc_id long, text string")
    bloom = build_hash_bloom(
        snap.select(F.md5(F.trim(F.regexp_replace("text", r"\s+", " "))).alias("content_hash")),
        expected_items=50,
    )
    for b in (bloom, None):
        got = {r["doc_id"]: r["is_seen"]
               for r in incremental_dedup(new, store, bloom=b).collect()}
        assert got == {1000: False, 1001: True, 1002: False}, b
