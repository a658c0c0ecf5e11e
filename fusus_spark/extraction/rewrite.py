"""T26 rewrite-rule engine: leftmost, longest-first-per-anchor,
apply-once, match-against-results sequence rewriting.

Faithful port of the reference's trimLine rule application semantics
(/root/reference/fusus/lakhnawi.py:2387-2622 behavior; rule compilation
at 670-743), re-targeted from PDF private-use glyph repair to the web
payload analog: mojibake sequences (UTF-8 read as cp1252), double-
escaped entities, zero-width/bidi control scrubbing, presentation-form
ligatures.

Semantics (the parts that make this an ENGINE, not a replace chain):

* rules are sorted by ``(-len(match), match)`` and indexed by their
  first match character (the anchor trie; lakhnawi.py:739-741);
* the scan walks input positions left to right; at each position the
  anchored rules are tried longest-first, and the FIRST match is
  applied — no further rule fires at that anchor (apply-once);
* matching reads each position's current RESULT string, not the
  original character — a position consumed (emptied or rewritten) by an
  earlier rule no longer matches its original form, which is what makes
  chained rule sets simple (lakhnawi.py:2440-2445 "we look into the
  result strings");
* on application the replacement is distributed one character per
  matched position; if the replacement is shorter the remaining
  positions become empty strings, if longer the surplus is appended to
  the LAST matched position (lakhnawi.py:2448-2456);
* after applying, the scan moves to the NEXT position (i + 1), so later
  anchors inside the match window are still visited against their new
  result strings.
"""

from __future__ import annotations

# (match, replacement) rules — the web-payload REPLACE_DEFS analog.
# Written with explicit escapes (each mojibake source = the cp1252
# reading of the target char's UTF-8 bytes); none of the sources anchor
# on plain [a-z ] text except the &...; entity repairs, which need a
# literal '&' — so the plain-ascii oracle corpora are never touched.
DEFAULT_REWRITE_RULES: tuple[tuple[str, str], ...] = (
    # UTF-8 bytes mis-decoded as cp1252 (the classic mojibake families)
    ("\u00c3\u00a9", "\u00e9"),          # A~(C) -> e-acute
    ("\u00c3\u00a8", "\u00e8"),          # -> e-grave
    ("\u00c3\u00a4", "\u00e4"),          # -> a-umlaut
    ("\u00c3\u00b6", "\u00f6"),          # -> o-umlaut
    ("\u00c3\u00bc", "\u00fc"),          # -> u-umlaut
    ("\u00c3\u00b1", "\u00f1"),          # -> n-tilde
    ("\u00e2\u20ac\u2122", "'"),         # a^ euro TM -> right single quote (as ')
    ("\u00e2\u20ac\u02dc", "'"),         # -> left single quote (as ')
    ("\u00e2\u20ac\u0153", '"'),         # -> left double quote (as ")
    ("\u00e2\u20ac\x9d", '"'),           # -> right double quote (as ")
    ("\u00e2\u20ac\u201c", "-"),         # -> en dash (as -)
    ("\u00e2\u20ac\u201d", "-"),         # -> em dash (as -)
    ("\u00e2\u20ac\u00a6", "..."),       # -> ellipsis (as ...)
    # the same family in its latin-1-decode flavor (raw C1 controls) \u2014
    # this is what OUR decode fallback produces from stray UTF-8 bytes
    ("\u00e2\x80\x99", "'"),
    ("\u00e2\x80\x98", "'"),
    ("\u00e2\x80\x9c", '"'),
    ("\u00e2\x80\x9d", '"'),
    ("\u00e2\x80\x93", "-"),
    ("\u00e2\x80\x94", "-"),
    ("\u00e2\x80\xa6", "..."),
    ("\u00ef\u00ac\x81", "fi"),          # fi ligature, latin-1 flavor
    ("\u00ef\u00ac\x82", "fl"),          # fl ligature, latin-1 flavor
    # double-escaped entities that survive one unescape pass
    ("&amp;", "&"),
    ("&nbsp;", " "),
    # zero-width / bidi controls (glue-invisible scrub)
    ("\u200b", ""),                        # zero-width space
    ("\u200c", ""),                        # ZWNJ
    ("\u200d", ""),                        # ZWJ
    ("\u200e", ""),                        # LRM
    ("\u200f", ""),                        # RLM
    ("\u00ad", ""),                        # soft hyphen
    ("\ufeff", ""),                        # stray BOM mid-text
    # presentation forms -> plain sequences (lakhnawi presentational
    # normalization analog)
    ("\ufb01", "fi"),                      # fi ligature
    ("\ufb02", "fl"),                      # fl ligature
    ("\u2026", "..."),                     # ellipsis
    ("\u2018", "'"),
    ("\u2019", "'"),
    ("\u201c", '"'),
    ("\u201d", '"'),
)

# Deterministic corruption wrap for the normalize_rewrites driver query:
# rule-source material around the clean [a-z ] payload. Occurrences are
# mutually disjoint and no replacement creates a new rule source, so
# the engine's output equals a sorted-order global replace chain — the
# property that makes the DuckDB oracle expressible (and which
# tests/test_rewrite.py pins).
MOJIBAKE_WRAP_PRE = (
    "cafÃ© donâ€™t â€œokâ€\x9d "
    "ﬁne… "
)
MOJIBAKE_WRAP_POST = " end&amp;done&nbsp;zw​sp i­tem “q”"

class CompiledRules:
    """Anchor-bucketed rule index + a single-scan anchor detector.

    ``index`` maps anchor char -> rules sorted (-len, match);
    ``anchor_re`` is one character-class regex over all anchors so the
    no-op fast path costs ONE C-level scan per line, not one scan per
    anchor."""

    __slots__ = ("index", "anchor_re")

    def __init__(self, index: dict[str, list[tuple[str, str]]]):
        import re

        self.index = index
        # empty table -> a never-matching pattern ('[]' would be a
        # regex syntax error), so compile_rules(()) is a valid no-op
        self.anchor_re = re.compile(
            "[" + "".join(re.escape(a) for a in sorted(index)) + "]"
            if index
            else r"(?!x)x"
        )


def compile_rules(
    rules: tuple[tuple[str, str], ...] = DEFAULT_REWRITE_RULES,
) -> CompiledRules:
    """Sort by (-len(match), match) and bucket by anchor char
    (getDictFromDef analog, lakhnawi.py:739-741)."""
    index: dict[str, list[tuple[str, str]]] = {}
    for src, repl in sorted(rules, key=lambda r: (-len(r[0]), r[0])):
        if not src:
            raise ValueError("empty match sequence")
        index.setdefault(src[0], []).append((src, repl))
    return CompiledRules(index)


DEFAULT_COMPILED: CompiledRules = compile_rules()


def apply_rewrites(text: str, compiled: CompiledRules = DEFAULT_COMPILED) -> str:
    """Run the rewrite engine over one string.

    Per-position result strings start as the original characters; rules
    match against results (so a consumed position cannot re-match) and
    the replacement is distributed across the matched window.
    """
    if not text:
        return text
    # fast path: no anchor character present at all (the overwhelmingly
    # common case for clean lines) — one C-level scan, zero allocation
    if compiled.anchor_re.search(text) is None:
        return text
    index = compiled.index
    results: list[str] = list(text)
    n = len(results)
    for i in range(n):
        c = results[i]
        rules = index.get(c)
        if not rules:
            continue
        for src, repl in rules:
            m = len(src)
            if i + m > n:
                continue
            ok = True
            for j in range(m):
                if results[i + j] != src[j]:
                    ok = False
                    break
            if not ok:
                continue
            # distribute the replacement over the matched window
            r = len(repl)
            for j in range(m):
                results[i + j] = repl[j] if j < r else ""
            if r > m:
                results[i + m - 1] += repl[m:]
            break  # apply-once per anchor; scan resumes at i + 1
    return "".join(results)


# ---------------------------------------------------------------------------
# Lang-keyed rule tables (T30 analog: the reference applies
# language-specific character repair — proclitic/final-alef fixes — on
# top of the general rules; here per-lang orthographic normalization
# layered onto DEFAULT_REWRITE_RULES through the same engine).

# Arabic orthographic normalization (the public Lucene
# ArabicNormalizer rule set): alef variants -> bare alef, alef maksura
# -> ya, teh marbuta -> heh, tatweel removed, tashkeel removed.
ARABIC_REWRITE_RULES: tuple[tuple[str, str], ...] = (
    ("\u0622", "\u0627"),  # alef madda -> alef
    ("\u0623", "\u0627"),  # alef hamza above -> alef
    ("\u0625", "\u0627"),  # alef hamza below -> alef
    ("\u0671", "\u0627"),  # alef wasla -> alef
    ("\u0649", "\u064a"),  # alef maksura (final-alef form) -> ya
    ("\u0629", "\u0647"),  # teh marbuta -> heh
    ("\u0640", ""),          # tatweel
    ("\u064b", ""),          # fathatan
    ("\u064c", ""),          # dammatan
    ("\u064d", ""),          # kasratan
    ("\u064e", ""),          # fatha
    ("\u064f", ""),          # damma
    ("\u0650", ""),          # kasra
    ("\u0651", ""),          # shadda
    ("\u0652", ""),          # sukun
)

LANG_REWRITE_RULES: dict[str, tuple[tuple[str, str], ...]] = {
    "ar": ARABIC_REWRITE_RULES,
}

_LANG_COMPILED: dict[str | None, CompiledRules] = {}


def compiled_for_lang(lang: str | None) -> CompiledRules:
    """DEFAULT rules + the language's table, compiled once per process
    (rule sources are disjoint across tables, so composition is safe)."""
    key = lang if lang in LANG_REWRITE_RULES else None
    got = _LANG_COMPILED.get(key)
    if got is None:
        rules = DEFAULT_REWRITE_RULES
        if key is not None:
            rules = rules + LANG_REWRITE_RULES[key]
        got = compile_rules(rules)
        _LANG_COMPILED[key] = got
    return got
