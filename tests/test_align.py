"""Alignment operator tests: ladder semantics + check() invariants."""

from __future__ import annotations

import random

from fusus_spark.operators.align import _lev, _match, align_editions, align_sequences


def test_lev_basic():
    assert _lev("kitten", "sitting") == 3
    assert _lev("", "abc") == 3
    assert _lev("abc", "abc") == 0


def test_ladder():
    assert _match("word", "word") == (0, 1.0)
    assert _match("word", "ward") is not None  # d=1, r=0.75.. wait 3/4
    assert _match("a", "z") is None  # d=1 but ratio 0 < 0.8
    assert _match("abcdefgh", "abcdefgX") is not None  # d=1 r=0.875
    assert _match("abc", "xyz") is None


def _check_invariants(rows, a, b):
    """Every slot of each side appears exactly once, in order (A9)."""
    slots_a = [r[0] for r in rows if r[0] is not None]
    slots_b = [r[5] for r in rows if r[5] is not None]
    assert slots_a == [s for s, _ in a]
    assert slots_b == [s for s, _ in b]


def test_align_exact():
    a = [(i, w) for i, w in enumerate("alpha beta gamma delta".split())]
    rows = align_sequences(a, a)
    _check_invariants(rows, a, a)
    assert all(r[2] == 0 for r in rows)


def test_align_with_noise_and_gaps():
    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    a = [(i, w) for i, w in enumerate(words)]
    # edition B: typo in gamma, delta dropped, extra word inserted
    b_words = ["alpha", "beta", "gamme", "epsilon", "inserted", "zeta", "eta", "theta"]
    b = [(i, w) for i, w in enumerate(b_words)]
    rows = align_sequences(a, b)
    _check_invariants(rows, a, b)
    by_a = {r[0]: r for r in rows if r[0] is not None}
    assert by_a[2][4] == "gamme" and by_a[2][2] == 1  # fuzzy match
    assert by_a[3][5] is None  # dropped word -> null pad
    ins = [r for r in rows if r[0] is None]
    assert len(ins) == 1 and ins[0][4] == "inserted"


def test_align_random_property():
    rng = random.Random(7)
    vocab = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf"]
    for _ in range(25):
        a = [(i, rng.choice(vocab)) for i in range(rng.randint(0, 40))]
        b_words = []
        for _, w in a:
            roll = rng.random()
            if roll < 0.1:
                continue  # drop
            if roll < 0.2:
                w = w + "x"  # perturb
            b_words.append(w)
            if rng.random() < 0.05:
                b_words.append("novel" + str(rng.randint(0, 9)))
        b = list(enumerate(b_words))
        rows = align_sequences(a, b)
        _check_invariants(rows, a, b)


def test_align_spark_cogroup(spark):
    data_a, data_b = [], []
    for url in ("u1", "u2"):
        words = "the quick brown fox jumps over the lazy dog".split()
        for i, w in enumerate(words):
            data_a.append((url, i, w))
        shifted = words[:2] + ["brwn"] + words[3:]  # typo in slot 2 (brown->brwn)
        for i, w in enumerate(shifted):
            data_b.append((url, i, w))
    a = spark.createDataFrame(data_a, "url string, slot long, word string")
    b = spark.createDataFrame(data_b, "url string, slot long, word string")
    rows = align_editions(a, b).collect()
    for url in ("u1", "u2"):
        sub = sorted(
            [r for r in rows if r["url"] == url and r["slot_a"] is not None],
            key=lambda r: r["slot_a"],
        )
        assert [r["slot_a"] for r in sub] == list(range(9))
        typo = [r for r in sub if r["slot_a"] == 2][0]
        assert typo["word_b"] == "brwn" and typo["distance"] == 1
