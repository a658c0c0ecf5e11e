"""Adversarial real-world-HTML corpus with hand-verified goldens.

The reference's regression method is a corpus of HARD pages with golden
outputs (/root/reference/pathological/ in+out pairs; example/out/*.tsv).
tests/fixtures.py covers the happy chrome; this module is the
adversarial set: boilerplate nested inside <main>, content-bearing
<aside>, div-soup with no semantic tags, markup broken beyond the
auto-close table, charset/entity edge cases, huge flat pages, deep
nesting. Every golden below was derived BY HAND from EXTRACTION_SPEC.md
(and then locked byte-for-byte); where behavior is a deliberate
engineering decision (e.g. link farms with no matching rule are kept),
the case documents it.

No external data; every payload is generated here, deterministically.
"""

from __future__ import annotations

import random

WORDS = (
    "stone river cloud ember forest hollow spark meadow frost harbor "
    "willow crane summit vale breeze tide fern grove slate moss"
).split()


def _prose(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


def pathological_documents() -> list[dict]:
    """List of dicts: url, html (bytes), golden (extracted_text or None),
    status, note. seed fixed; byte-stable across runs."""
    rng = random.Random(97)
    docs: list[dict] = []

    def add(name: str, html: str | bytes, golden: str | None,
            status: str = "extracted", note: str = "") -> None:
        docs.append({
            "url": f"https://hard.ex.com/{name}",
            "html": html if isinstance(html, bytes) else html.encode(),
            "golden": golden,
            "status": status,
            "note": note,
        })

    # -- boilerplate position attacks ----------------------------------

    # 1. boilerplate nested INSIDE <main>: rules fire anywhere, not only
    # at body level.
    p = _prose(rng, 12)
    add(
        "boiler-in-main",
        f"<html><body><main><nav><a href='/a'>A</a> <a href='/b'>B</a></nav>"
        f"<p>{p}</p><div class='ads-inline'><a href='/buy'>buy now</a></div>"
        f"</main></body></html>",
        p,
        note="nav+ads removed even inside main",
    )

    # 2. content-bearing <aside>: long link-free prose -> the
    # connectedness guard KEEPS it (>=150 chars, density <= 0.25).
    aside_prose = _prose(rng, 40)  # ~200+ chars
    body_prose = _prose(rng, 10)
    add(
        "content-aside",
        f"<html><body><p>{body_prose}</p><aside><p>{aside_prose}</p></aside></body></html>",
        f"{body_prose}\n{aside_prose}",
        note="guard veto: aside with long linkless prose is kept",
    )

    # 3. boilerplate <aside>: short and linky -> removed.
    add(
        "boiler-aside",
        f"<html><body><p>{body_prose}</p>"
        f"<aside><a href='/x'>more</a> <a href='/y'>links</a></aside></body></html>",
        body_prose,
    )

    # 4. div-soup: no semantic tags at all; nav-ness only in class names.
    s1, s2 = _prose(rng, 11), _prose(rng, 13)
    add(
        "div-soup",
        f"<html><body><div class='topbar menu'><a href='/'>home</a><a href='/x'>x</a></div>"
        f"<div><div><p>{s1}</p></div><div><p>{s2}</p></div></div>"
        f"<div class='bottom footer-links'><a href='/t'>terms</a></div></body></html>",
        f"{s1}\n{s2}",
        note="class tokens 'menu'/'footer-links' match the catalog",
    )

    # 5. link farm with NO matching class/tag: no rule fires, so it is
    # kept — documented engine decision (rule-based, not density-based,
    # removal; the farm is visible in the output).
    add(
        "unlabeled-linkfarm",
        f"<html><body><div><a href='/1'>one</a> <a href='/2'>two</a></div>"
        f"<p>{s1}</p></body></html>",
        f"one two\n{s1}",
        note="no rule matches an unlabeled link farm: kept (documented)",
    )

    # 6. lookalike class on real content: class says 'related' but the
    # guard keeps the long, link-free prose.
    long_prose = _prose(rng, 45)
    add(
        "lookalike-kept",
        f"<html><body><div class='related'><p>{long_prose}</p></div></body></html>",
        long_prose,
    )

    # 7. lookalike class on a SHORT caption: removed (below guard
    # threshold) — the false-positive cost of rule-based removal,
    # recorded in removals, documented here.
    add(
        "lookalike-removed",
        f"<html><body><div class='hero-header'>short caption text</div>"
        f"<p>{s2}</p></body></html>",
        s2,
        note="'header' class token + <150 chars: caption is removed",
    )

    # 8. footer whose body is long link-free prose: guard keeps the
    # whole footer (outermost match, guard veto at the footer level).
    footer_prose = _prose(rng, 40)
    add(
        "guarded-footer",
        f"<html><body><p>{s1}</p><footer><p>{footer_prose}</p></footer></body></html>",
        f"{s1}\n{footer_prose}",
    )

    # 9. content div nested inside a linky footer: outermost match wins,
    # the whole subtree goes (no descent into removed nodes).
    add(
        "content-inside-footer",
        f"<html><body><p>{s1}</p><footer><a href='/t'>terms</a> <a href='/p'>privacy</a>"
        f"<div class='content'><p>inner words lost</p></div></footer></body></html>",
        s1,
        note="outermost-match-wins: inner 'content' div is not rescued",
    )

    # 10. role-based landmarks (ARIA instead of semantic tags).
    add(
        "aria-roles",
        f"<html><body><div role='navigation'><a href='/'>nav</a></div>"
        f"<div role='banner'>site banner</div><p>{s2}</p>"
        f"<div role='contentinfo'>fine print</div></body></html>",
        s2,
    )

    # -- markup soup ---------------------------------------------------

    # 11. misnested inline formatting: </b> closes <i> too (stack pops
    # to the matching open tag); trailing text re-parents to <p>.
    add(
        "misnested-inline",
        "<html><body><p><b>bold <i>both</b> after</i> tail</p></body></html>",
        "bold both after tail",
    )

    # 12. p-in-p: a block start auto-closes the open <p>.
    add(
        "p-in-p",
        "<html><body><p>one <span>two</span><p>three</p></body></html>",
        "one two\nthree",
    )

    # 13. table nested in a list item; li auto-closes li but not table.
    add(
        "table-in-list",
        "<html><body><ul><li>a<table><tr><td>cell</td></tr></table><li>b</ul></body></html>",
        "a\ncell\nb",
    )

    # 14. stray end tags + unclosed everything.
    add(
        "stray-ends",
        "<html><body></div></p><p>first<p>second</strong></em><ul><li>x<li>y</body>",
        "first\nsecond\nx\ny",
    )

    # 15. text after </body></html> is still content (tolerant parse).
    add(
        "trailing-text",
        "<html><body><p>inside</p></body></html>trailing words",
        "inside\ntrailing words",
    )

    # 16. unquoted/weird attribute quoting still matches rules.
    add(
        "unquoted-attrs",
        f"<html><body><div class=ads>buy stuff</div><p>{s1}</p>"
        f"<div class='ADS'>more ads</div></body></html>",
        s1,
        note="unquoted and uppercase class values both match (case-insensitive)",
    )

    # 17. comments, conditional comments, CDATA, PIs: all dropped;
    # adjacent text joins WITHOUT whitespace (comment is not a space).
    add(
        "comment-glue",
        "<html><body><p>foo<!-- hidden -->bar "
        "<!--[if IE]><p>ie only</p><![endif]--> baz<?php echo ?> qux"
        "<![CDATA[raw bytes]]></p></body></html>",
        "foobar baz qux",
        note="comments/PI/CDATA are not word boundaries",
    )

    # 18. rawtext trap: </style> inside a CSS string still ends the
    # element (per HTML5 rawtext rules); the remainder leaks as text.
    add(
        "style-string-trap",
        '<html><body><style>a::before{content:"</style>"}</style><p>real</p></body></html>',
        '"}\nreal',
        note='HTML5 rawtext: first </style> wins; the tail "}" renders as its own block',
    )

    # 19. script containing fake markup: fully dropped (no </script in
    # the payload).
    add(
        "script-markup",
        "<html><body><script>var s='<p>not content</p><div class=x>';</script>"
        f"<p>{s2}</p></body></html>",
        s2,
    )

    # 20. form controls / select options / textarea payloads: pruned.
    add(
        "form-controls",
        "<html><body><form><input value='iv'><select><option>opt a</option>"
        "<option>opt b</option></select><textarea>draft text</textarea>"
        "<button>press</button></form><p>content line</p></body></html>",
        "press\ncontent line",
        note="input/select/textarea pruned; <button> text renders (form is a block)",
    )

    # -- charset / entity / unicode edge cases -------------------------

    # 21. UTF-8 BOM stripped (not glued to the first word).
    add("bom", "<p>hello world</p>".encode("utf-8-sig"), "hello world")

    # 22. entity torture: double-escape stays once-decoded; numeric
    # hex/dec; bare '&'; HTML5 prefix entity without semicolon
    # (&notit; -> '¬it;' — html5 longest-prefix rule, as browsers do).
    add(
        "entities",
        "<html><body><p>&amp;amp; &#x41;&#66; a&amp;b &notit;</p></body></html>",
        "& AB a&b ¬it;",  # &amp; repaired by T26
    )

    # 23. nbsp IS whitespace for normalization (U+00A0 collapses).
    add(
        "nbsp",
        "<html><body><p>alpha&nbsp;beta&nbsp;&nbsp;gamma</p></body></html>",
        "alpha beta gamma",
    )

    # 24. zero-width space U+200B: scrubbed by the T26 rewrite engine
    # (it is not whitespace, so without the rule it would glue tokens).
    add(
        "zwsp",
        "<html><body><p>a&#8203;b</p></body></html>",
        "ab",  # scrubbed by the T26 zero-width rule
    )

    # 25. NFD input -> NFC output (e + combining acute becomes é).
    add(
        "nfd",
        "<html><body><p>café latte</p></body></html>",
        "café latte",
    )

    # 26. declared charset beats the latin-1 fallback (cp1252 smart
    # quotes in the 0x80-0x9F range latin-1 maps to C1 controls).
    add(
        "cp1252-decl",
        "<html><head><meta http-equiv='Content-Type' "
        "content='text/html; charset=windows-1252'></head>"
        "<body><p>it\x92s \x93fine\x94</p></body></html>".encode("latin-1"),
        "it's \"fine\"",  # T26 normalizes smart quotes
    )

    # -- structure stress ----------------------------------------------

    # 27. deep nesting (2000 divs): must extract, not recurse out.
    add(
        "deep-nest",
        "<html><body>" + "<div>" * 2000 + "deep text" + "</div>" * 2000 + "</body></html>",
        "deep text",
    )

    # 28. huge flat page: one block, one line, thousands of words.
    flat = _prose(rng, 5000)
    add("huge-flat", f"<html><body><p>{flat}</p></body></html>", flat)

    # 29. many tiny blocks (500 divs) — block ids 0..499.
    many = [f"b{i} {rng.choice(WORDS)}" for i in range(500)]
    add(
        "many-blocks",
        "<html><body>" + "".join(f"<div>{t}</div>" for t in many) + "</body></html>",
        "\n".join(many),
    )

    # 30. br storm + hr runs coalesce (strongest break wins, no empty
    # lines/blocks).
    add(
        "break-storm",
        "<html><body><p>a<br><br><br>b</p><hr><hr><hr><p>c</p></body></html>",
        "a\nb\nc",
    )

    # 31. wide table: rows are lines, cells joined by single spaces.
    cells = [(f"r{i}", rng.choice(WORDS), rng.choice(WORDS)) for i in range(50)]
    tbl_html = "".join(
        f"<tr><td>{a}</td><td>{b}</td><td>{c}</td></tr>" for a, b, c in cells
    )
    add(
        "wide-table",
        "<html><body><table>" + tbl_html + "</table></body></html>",
        "\n".join(f"{a} {b} {c}" for a, b, c in cells),
    )

    # 32. only boilerplate -> empty status.
    add(
        "all-boiler",
        "<html><body><header><a href='/'>home</a></header>"
        "<nav><a href='/x'>x</a></nav><footer>fine print</footer></body></html>",
        None,
        status="empty",
    )

    # 33. definition lists + blockquotes + figure/figcaption blocks.
    add(
        "dl-quote",
        "<html><body><dl><dt>term</dt><dd>meaning</dd><dt>other</dt><dd>sense</dd></dl>"
        "<blockquote>quoted words</blockquote>"
        "<figure>img here<figcaption>caption text</figcaption></figure></body></html>",
        "term\nmeaning\nother\nsense\nquoted words\nimg here\ncaption text",
    )

    return docs
