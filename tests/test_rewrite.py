"""T26 rewrite-engine semantics tests — the reference's hand cases.

Each test pins one of the trimLine behaviors (lakhnawi.py:2387-2622):
longest-first per anchor, apply-once, match-against-results,
replacement distribution with surplus append, and the no-revisit rule.
"""

from __future__ import annotations

from fusus_spark.extraction.rewrite import (
    DEFAULT_COMPILED,
    apply_rewrites,
    compile_rules,
)


def _run(text, rules):
    return apply_rewrites(text, compile_rules(tuple(rules)))


def test_longest_first_per_anchor():
    # both rules anchor at 'a'; the longer match must win
    assert _run("abc", [("ab", "X"), ("abc", "Y")]) == "Y"
    # shorter fires when the long one cannot match
    assert _run("abd", [("ab", "X"), ("abc", "Y")]) == "Xd"


def test_tie_broken_by_string_order():
    # equal length: sorted by match string, first in order wins
    assert _run("ab", [("ab", "1")]) == "1"
    out = _run("ab", [("ab", "2"), ("ab", "1")])
    assert out == "2"  # ("ab","2") vs ("ab","1"): same key, stable sort keeps input order? no —
    # sort key is (-len, src) and src is equal, python sort is stable, so
    # the FIRST listed rule stays first. Pin that.


def test_apply_once_per_anchor_no_revisit():
    # after ab->b applies at position 0, the new 'b' result at that
    # position is NOT re-examined (the scan moves to i+1), so the b->Z
    # rule does not fire there — the reference's "will not be changed
    # anymore" guarantee (lakhnawi.py:2461-2466)
    assert _run("ab", [("ab", "b"), ("b", "Z")]) == "b"
    # but an ORIGINAL 'b' elsewhere still rewrites
    assert _run("ab b", [("ab", "b"), ("b", "Z")]) == "b Z"


def test_match_against_results():
    # ab->cd rewrites positions 0,1 to 'c','d'; the later rule dq->W
    # then matches the REWRITTEN 'd' at position 1 plus the original 'q'
    # (lakhnawi.py:2440-2445: matching reads result strings)
    assert _run("abq", [("ab", "cd"), ("dq", "W")]) == "cW"
    # and a consumed (emptied) position can no longer match
    assert _run("abq", [("ab", "c"), ("bq", "W")]) == "cq"


def test_replacement_distribution_and_surplus():
    # shorter replacement: trailing matched positions become empty
    assert _run("abcd", [("abc", "xy")]) == "xyd"
    # longer replacement: surplus appends to the LAST matched position
    assert _run("abd", [("ab", "pqrs")]) == "pqrsd"
    # deletion rule
    assert _run("xaby", [("ab", "")]) == "xy"


def test_overlapping_matches_leftmost_wins():
    # 'aba' with rule ab->X: leftmost anchor consumes the b, so the
    # second 'a' cannot start a match
    assert _run("abab", [("ab", "X")]) == "XX"
    assert _run("aba", [("ab", "X")]) == "Xa"


def test_default_table_families():
    # cp1252-flavor mojibake
    assert apply_rewrites("cafÃ©") == "café"
    assert apply_rewrites("donâ€™t") == "don't"
    # latin-1-flavor mojibake (what decode_html's fallback produces)
    bad = "isn’t “ok”… ﬁne".encode().decode("latin-1")
    assert apply_rewrites(bad) == 'isn\'t "ok"... fine'
    # zero-width scrub + double-escaped entity
    assert apply_rewrites("a​b &amp; c­d") == "ab & cd"
    # clean ascii passes through the fast path untouched (same object)
    s = "plain ascii words"
    assert apply_rewrites(s) is s


def test_lang_keyed_arabic_normalization():
    """T30: the 'ar' table (Lucene ArabicNormalizer rule set) layers
    onto the default rules through the same engine and end-to-end
    through extract_document(lang='ar'); lang=None leaves Arabic
    untouched."""
    from fusus_spark.extraction import extract_document
    from fusus_spark.extraction.rewrite import compiled_for_lang

    # alef-hamza + tashkeel + teh marbuta + alef maksura + tatweel
    raw = "أَلِف مدرسة هدى كتـاب"
    want = "الف مدرسه هدي كتاب"
    assert apply_rewrites(raw, compiled_for_lang("ar")) == want
    # defaults still active alongside (mojibake repaired in same pass)
    assert apply_rewrites("cafÃ© أَب", compiled_for_lang("ar")) == "café اب"

    html = f"<html><body dir='rtl'><p>{raw}</p></body></html>".encode()
    assert extract_document(html, lang="ar")["extracted_text"] == want
    assert extract_document(html)["extracted_text"] == raw.replace("أَ", "أَ")
    # unknown langs share the default compiled table (cache hit)
    assert compiled_for_lang("en") is compiled_for_lang(None)


def test_engine_equals_chained_replace_on_disjoint_corpus():
    """For rule-disjoint text the engine must agree with a sorted-order
    global replace chain — the property the DuckDB oracle of the
    normalize_rewrites query relies on."""
    from fusus_spark.extraction.rewrite import DEFAULT_REWRITE_RULES

    text = (
        "cafÃ© donâ€™t â€œokâ€\x9d "
        "ﬁne… body words here end&amp;done&nbsp;zw​sp i­tem "
        "“q”"
    )
    chained = text
    for src, repl in sorted(DEFAULT_REWRITE_RULES, key=lambda r: (-len(r[0]), r[0])):
        chained = chained.replace(src, repl)
    assert apply_rewrites(text, DEFAULT_COMPILED) == chained


def test_empty_rule_table_is_noop():
    """compile_rules(()) must produce a valid no-op table, not a regex
    syntax error from an empty character class."""
    compiled = compile_rules(())
    assert apply_rewrites("plain text", compiled) == "plain text"
    assert apply_rewrites("", compiled) == ""
    mojibake = "cafÃ©"  # a rule SOURCE for the default table
    assert apply_rewrites(mojibake, compiled) == mojibake  # nothing fires
