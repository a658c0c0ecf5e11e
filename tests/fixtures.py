"""Deterministic synthetic document corpus (seed=42) with goldens.

The reference's regression corpus is golden outputs checked into the
repo (`example/` happy pages + `pathological/` hard cases — SURVEY.md
§5.1). This module is our analog: byte-for-byte stable HTML payloads
per fixture class plus hand-verified expected extracted text.

No external data; every payload is generated here.
"""

from __future__ import annotations

import datetime as dt
import random

WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega"
).split()

TS0 = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)

# Cap used by ALL tests (passed as max_html_bytes): small enough that the
# 'giant' fixture truncates fast, large enough that nothing else caps.
FIXTURE_MAX_HTML_BYTES = 128 * 1024


def _para(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _boiler(title: str) -> tuple[str, str]:
    head = (
        f"<head><title>{title}</title><meta charset='utf-8'>"
        "<style>body{margin:0}</style><script>var x=1;</script></head>"
    )
    chrome_top = (
        "<header class='site-header'><a href='/'>Home</a> <a href='/about'>About</a></header>"
        "<nav><ul><li><a href='/a'>SecA</a></li><li><a href='/b'>SecB</a></li></ul></nav>"
    )
    chrome_bot = (
        "<div class='social-share'><a href='#'>Tweet</a> <a href='#'>Share</a></div>"
        "<footer>copyright example corp all rights reserved</footer>"
    )
    return head + "<body>" + chrome_top, chrome_bot + "</body></html>"


def fixture_documents() -> list[dict]:
    """The full fixture corpus: list of input rows + goldens.

    Each dict: url, warc_ts, html (bytes), text, lang, golden (expected
    extracted_text or None when only invariants are asserted), status.
    """
    rng = random.Random(42)
    docs: list[dict] = []

    def add(url: str, html: bytes, golden: str | None, status: str,
            lang: str = "en", text: str = "") -> None:
        docs.append(
            {
                "url": url,
                "warc_ts": TS0 + dt.timedelta(hours=len(docs)),
                "html": html,
                "text": text,
                "lang": lang,
                "golden": golden,
                "status": status,
            }
        )

    # 1. plain article: boilerplate chrome + 3 content paragraphs
    p1, p2, p3 = (_para(rng, 12) for _ in range(3))
    head, tail = _boiler("plain")
    add(
        "https://ex.com/plain",
        (
            f"<!doctype html><html>{head}<main><h1>plain article</h1>"
            f"<p>{p1}</p><p>{p2}</p><p>{p3}</p></main>{tail}"
        ).encode(),
        f"plain article\n{p1}\n{p2}\n{p3}",
        "extracted",
    )

    # 2. two-column / sectioned layout (stripes/blocks analog)
    c1, c2 = _para(rng, 8), _para(rng, 8)
    head, tail = _boiler("cols")
    add(
        "https://ex.com/cols",
        (
            f"<!doctype html><html>{head}"
            f"<div class='content'><section><h2>left col</h2><p>{c1}</p></section>"
            f"<section><h2>right col</h2><p>{c2}</p></section></div>{tail}"
        ).encode(),
        f"left col\n{c1}\nright col\n{c2}",
        "extracted",
    )

    # 3. <hr>-separated footnotes (footnote-rule cutoff analog):
    # fusus drops content below the rule only when it IS a footnote
    # region; our analog keeps post-hr text as separate blocks but strips
    # footer chrome. Golden: hr creates a block break.
    body = _para(rng, 10)
    note = "footnote one text"
    add(
        "https://ex.com/footnotes",
        (
            "<html><body><main><p>" + body + "</p><hr><p>" + note + "</p></main>"
            "<footer>site footer</footer></body></html>"
        ).encode(),
        f"{body}\n{note}",
        "extracted",
    )

    # 4. multi-segment line: table row -> one line, cells joined by space
    add(
        "https://ex.com/table",
        (
            "<html><body><table>"
            "<tr><td>first verse</td><td>second verse</td></tr>"
            "<tr><td>third verse</td><td>fourth verse</td></tr>"
            "</table></body></html>"
        ).encode(),
        "first verse second verse\nthird verse fourth verse",
        "extracted",
    )

    # 5. rtl content with mixed ltr tokens; lang='ar' routes through the
    # T30 Arabic rule table (alef-hamza normalizes to bare alef)
    ar = "الكتاب الأول"
    ar_norm = "الكتاب الاول"
    add(
        "https://ex.com/rtl",
        f"<html><body dir='rtl'><p>{ar} HTML5 {ar}</p></body></html>".encode(),
        f"{ar_norm} HTML5 {ar_norm}",
        "extracted",
        lang="ar",
    )

    # 6a. mojibake: latin-1 bytes with no charset decl (decode fallback)
    add(
        "https://ex.com/latin1",
        "<html><body><p>café naïve résumé</p></body></html>".encode("latin-1"),
        "café naïve résumé",
        "extracted",
    )
    # 6b. declared charset wins over failed utf-8
    add(
        "https://ex.com/cp1252",
        (
            "<html><head><meta charset='windows-1252'></head>"
            "<body><p>smart “quotes” here</p></body></html>"
        ).encode("windows-1252"),
        "smart \"quotes\" here",  # T26 rewrites normalize smart quotes
        "extracted",
    )
    # 6c. NFC normalization: decomposed e + combining acute -> é
    add(
        "https://ex.com/nfc",
        "<html><body><p>café latte</p></body></html>".encode(),
        "café latte",
        "extracted",
    )

    # 7a. empty page  7b. script-only page  7c. whitespace-only
    add("https://ex.com/empty", b"", None, "empty")
    add(
        "https://ex.com/script-only",
        b"<html><head><script>alert(1)</script></head><body><script>x</script></body></html>",
        None,
        "empty",
    )
    add("https://ex.com/blank", b"<html><body>  \n\t  </body></html>", None, "empty")

    # 8. giant page (size cap): content then pathological tail past cap.
    giant_body = _para(rng, 50)
    giant = (
        "<html><body><p>" + giant_body + "</p>"
        + "<p>" + "pad " * 80_000 + "</p></body></html>"  # > FIXTURE cap
    ).encode()
    add("https://ex.com/giant", giant, None, "capped")

    # 9. boilerplate-lookalike kept by the connectedness guard:
    # class says 'related' but it is long, link-free prose.
    prose = _para(rng, 60)
    add(
        "https://ex.com/lookalike",
        (
            "<html><body><div class='related'><p>" + prose + "</p></div></body></html>"
        ).encode(),
        prose,
        "extracted",
    )

    # 10. page-number-only first block (page furniture)
    add(
        "https://ex.com/pageno",
        (
            "<html><body><div>42</div><p>real content starts here</p></body></html>"
        ).encode(),
        "42\nreal content starts here",
        "extracted",
    )

    # 11. punctuation-heavy line (word/punc splitter semantics, T22)
    add(
        "https://ex.com/punc",
        b"<html><body><p>(hello) world... 'quoted' end-of-line!</p></body></html>",
        "(hello) world... 'quoted' end-of-line!",
        "extracted",
    )

    # 12. <br> line breaks + <pre> newlines
    add(
        "https://ex.com/lines",
        b"<html><body><p>line one<br>line two<br/>line three</p>"
        b"<pre>pre one\npre two</pre></body></html>",
        "line one\nline two\nline three\npre one\npre two",
        "extracted",
    )

    # 13. malformed markup: unclosed tags, stray end tags
    add(
        "https://ex.com/broken",
        b"<html><body><p>first para<p>second para</div></b><ul><li>item a<li>item b</body>",
        "first para\nsecond para\nitem a\nitem b",
        "extracted",
    )

    # 14-33. bulk deterministic articles (throughput + stability corpus)
    for i in range(20):
        paras = [_para(rng, 10 + (i % 5)) for _ in range(3 + (i % 3))]
        head, tail = _boiler(f"bulk{i}")
        html = (
            f"<!doctype html><html>{head}<article><h1>bulk {i}</h1>"
            + "".join(f"<p>{p}</p>" for p in paras)
            + f"</article>{tail}"
        ).encode()
        add(
            f"https://bulk.ex.com/{i:03d}",
            html,
            "bulk " + str(i) + "\n" + "\n".join(paras),
            "extracted",
        )

    return docs


# Hand-verified word rows for the punctuation fixture (T22 semantics):
# (block_id, line_id, word_seq, word, punc, char_start, char_end)
PUNC_GOLDEN_WORDS = [
    (0, 0, 0, "", "(", 0, 1),
    (0, 0, 1, "hello", ")", 1, 7),
    (0, 0, 2, "world", "...", 8, 16),
    (0, 0, 3, "", "'", 17, 18),
    (0, 0, 4, "quoted", "'", 18, 25),
    (0, 0, 5, "end", "-", 26, 30),
    (0, 0, 6, "of", "-", 30, 33),
    (0, 0, 7, "line", "!", 33, 38),
]
