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


def test_align_combi_split_word():
    """J1 n:m: one word in A split into two in B -> a 1:2 combination
    row pair (shared distance/ratio), not a lookahead null-pad."""
    a = [(0, "alpha"), (1, "foobar"), (2, "omega")]
    b = [(0, "alpha"), (1, "foo"), (2, "bar"), (3, "omega")]
    rows = align_sequences(a, b)
    _check_invariants(rows, a, b)
    combi = [r for r in rows if r[0] == 1 or (r[5] in (1, 2))]
    # slot_a=1 pairs with slot_b=1; slot_b=2 is the one-sided leftover
    assert (1, "foobar", 0, 1.0, "foo", 1) in rows
    assert (None, None, 0, 1.0, "bar", 2) in rows
    assert len(combi) == 2
    # no null-padded (lookahead) rows at all
    assert all(r[2] is not None for r in rows)


def test_align_combi_merged_word():
    """J1 n:m: two words in A merged into one in B -> a 2:1 combination."""
    a = [(0, "alpha"), (1, "foo"), (2, "bar"), (3, "omega")]
    b = [(0, "alpha"), (1, "foobar"), (2, "omega")]
    rows = align_sequences(a, b)
    _check_invariants(rows, a, b)
    assert (1, "foo", 0, 1.0, "foobar", 1) in rows
    assert (2, "bar", 0, 1.0, None, None) in rows


def test_align_combi_fuzzy_and_rung_order():
    """A rung-1 combination must beat a rung-2+ direct match (reference
    compare() order); combined texts go through the ladder too."""
    # direct: "abcdefgh" vs "abcdefgXYZ" d=3 r=0.7 -> would match at rung
    # (3, 0.6); combi 1:2 "abcdefgh" vs "abcdefgX"+"YZ"... same concat —
    # instead use a case where the 1:2 combi is EXACT (rung 1):
    a = [(0, "abcdef"), (1, "tail")]
    b = [(0, "abc"), (1, "def"), (2, "tail")]
    rows = align_sequences(a, b)
    _check_invariants(rows, a, b)
    assert (0, "abcdef", 0, 1.0, "abc", 0) in rows
    assert (None, None, 0, 1.0, "def", 1) in rows
    assert (1, "tail", 0, 1.0, "tail", 2) in rows


def test_align_long_lookahead():
    """Lookahead reaches far past the old 20-word bound (reference: 100)."""
    a = [(0, "needle")] + [(i + 1, f"aaaa{i:02d}qq") for i in range(60)]
    b = [(i, f"bbbb{i:02d}zz") for i in range(60)] + [(60, "needle")]
    rows = align_sequences(a, b)
    _check_invariants(rows, a, b)
    matched = [r for r in rows if r[0] is not None and r[5] is not None]
    assert any(r[1] == "needle" and r[4] == "needle" for r in matched)


def test_align_manual_exception_forces_pair():
    """doCase analog: words the ladder would NEVER match (disjoint
    strings) are force-paired by the exception table, with the skipped
    stretch emitted as one-sided catch-up rows."""
    from fusus_spark.operators.align import MANUAL_DISTANCE

    a = [(0, "alpha"), (1, "totally"), (2, "omega")]
    b = [(0, "alpha"), (1, "noise"), (2, "different"), (3, "omega")]
    # ladder alone: 'totally' vs 'noise'/'different' never match
    base = align_sequences(a, b)
    _check_invariants(base, a, b)
    assert not any(r[0] == 1 and r[5] is not None for r in base)
    # exception: A slot 1 corresponds to B slot 2
    rows = align_sequences(a, b, exceptions={1: 2})
    _check_invariants(rows, a, b)
    forced = [r for r in rows if r[0] == 1][0]
    assert forced[5] == 2 and forced[2] == MANUAL_DISTANCE and forced[3] == 1.0
    # the skipped B slot 1 appears as a one-sided catch-up row
    assert any(r[0] is None and r[5] == 1 for r in rows)


def test_align_manual_exception_reverse_side():
    """The consult is symmetric: an excepted B slot whose partner lies
    AHEAD on the A side catches A up (catchupLK direction)."""
    from fusus_spark.operators.align import MANUAL_DISTANCE

    a = [(0, "alpha"), (1, "skipme"), (2, "strange"), (3, "tail")]
    b = [(0, "alpha"), (1, "unrelated"), (2, "tail")]
    rows = align_sequences(a, b, exceptions={2: 1})
    _check_invariants(rows, a, b)
    forced = [r for r in rows if r[5] == 1][0]
    assert forced[0] == 2 and forced[2] == MANUAL_DISTANCE
    assert any(r[0] == 1 and r[5] is None for r in rows)  # A slot 1 padded


def test_align_manual_exception_out_of_reach_ignored():
    """An exception whose partner never appears degrades gracefully to
    the normal ladder walk (every slot still emitted exactly once)."""
    a = [(i, w) for i, w in enumerate("one two three four".split())]
    b = [(i, w) for i, w in enumerate("one two three four".split())]
    rows = align_sequences(a, b, exceptions={1: 99})
    _check_invariants(rows, a, b)
    assert all(r[2] == 0 for r in rows if r[0] is not None and r[5] is not None)


def test_align_editions_exception_table(spark):
    """End-to-end: the (url, slot_a, slot_b) override table reaches the
    cogrouped walk, per url."""
    a = spark.createDataFrame(
        [("u1", 0, "alpha"), ("u1", 1, "xxxx"), ("u1", 2, "omega"),
         ("u2", 0, "alpha"), ("u2", 1, "xxxx"), ("u2", 2, "omega")],
        "url string, slot long, word string",
    )
    b = spark.createDataFrame(
        [("u1", 0, "alpha"), ("u1", 1, "yyyy"), ("u1", 2, "omega"),
         ("u2", 0, "alpha"), ("u2", 1, "yyyy"), ("u2", 2, "omega")],
        "url string, slot long, word string",
    )
    exc = spark.createDataFrame(
        [("u1", 1, 1)], "url string, slot_a long, slot_b long"
    )
    rows = align_editions(a, b, exceptions=exc).collect()
    u1 = [r for r in rows if r["url"] == "u1" and r["slot_a"] == 1][0]
    u2 = [r for r in rows if r["url"] == "u2" and r["slot_a"] == 1][0]
    assert u1["slot_b"] == 1 and u1["distance"] == -1  # overridden
    assert u2["slot_b"] is None  # untouched url: ladder finds no match


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
