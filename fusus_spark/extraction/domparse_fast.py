"""Fast regex-driven HTML -> Node tree (drop-in for domparse.parse_html).

The stdlib ``html.parser`` costs ~60% of extraction CPU (its
char-by-char ``goahead`` loop + per-tag regexes). This tokenizer walks
the document with ``str.find``/one compiled tag regex instead, while
producing the IDENTICAL tree semantics as domparse._TreeBuilder:

* same Node type, same auto-close table, same void-element handling,
* stray end tags ignored, unclosed elements closed at EOF,
* comments / doctypes / PIs / CDATA dropped,
* <script>/<style> content captured raw (case-insensitive end tag),
* character references unescaped in text nodes (only when '&' present),
* attribute names lowercased; values unescaped.

Equivalence with the stdlib builder is asserted by
tests/test_parser_equivalence.py over the fixture corpus and random
fuzz documents.
"""

from __future__ import annotations

import re
from html import unescape

from fusus_spark.extraction.domparse import (
    AUTO_CLOSE,
    RAWTEXT_TAGS,
    VOID_TAGS,
    Node,
    decode_html,
)

# Tag names (matched after dispatching on the char following '<' —
# a single-alternation regex with named groups costs ~6 C-API group()
# calls per tag; first-char dispatch + one anonymous match is ~25%
# faster over the whole parse).
_NAME_RE = re.compile(r"[a-zA-Z][a-zA-Z0-9:._-]*")

# Attributes: name (=value)? with quoted/unquoted values.
_ATTR_RE = re.compile(
    r"""([a-zA-Z_:][-a-zA-Z0-9_:.]*)
        (?:\s*=\s*("[^"]*"|'[^']*'|[^\s>]*))?""",
    re.X,
)

# Attr region + closing '>', skipping quoted values (C-level scan).
_TAGEND_RE = re.compile(r"""(?:"[^"]*"|'[^']*'|[^>"'])*>""")


def _parse_attrs(s: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _ATTR_RE.finditer(s):
        name = m.group(1).lower()
        val = m.group(2)
        if val is None:
            val = ""
        elif val[:1] in ("'", '"'):
            val = val[1:-1]
        if "&" in val:
            val = unescape(val)
        if name not in out:
            out[name] = val
    return out


def parse_html_fast(payload: bytes | str, charset_hint: str | None = None) -> Node:
    """Tokenize HTML into the same Node tree as domparse.parse_html."""
    text = (decode_html(payload, charset_hint)
            if isinstance(payload, (bytes, bytearray)) else payload)
    root = Node("#root")
    stack: list[Node] = [root]
    n = len(text)
    pos = 0
    lower: str | None = None  # lazily lowercased copy for rawtext end search

    def emit_text(chunk: str) -> None:
        if chunk:
            if "&" in chunk:
                chunk = unescape(chunk)
            stack[-1].children.append(chunk)

    while pos < n:
        lt = text.find("<", pos)
        if lt == -1:
            emit_text(text[pos:])
            break
        if lt > pos:
            emit_text(text[pos:lt])
        c = text[lt + 1 : lt + 2]
        # dispatch on the char after '<'; the common case (a start tag)
        # first. Unterminated constructs at EOF degrade to text
        # ('<' + rest), matching html.parser's close() behavior.
        if ("a" <= c <= "z") or ("A" <= c <= "Z"):
            m = _NAME_RE.match(text, lt + 1)
            is_end = False
        elif c == "/":
            m = _NAME_RE.match(text, lt + 2)
            is_end = True
        elif c == "!":
            if text.startswith("--", lt + 2):
                end = text.find("-->", lt + 4)
                if end == -1:
                    emit_text("<")
                    pos = lt + 1
                    continue
                pos = end + 3
                continue
            if text.startswith("[CDATA[", lt + 2):
                end = text.find("]]>", lt + 9)
                if end == -1:
                    emit_text("<")
                    pos = lt + 1
                    continue
                pos = end + 3
                continue
            d = text[lt + 2 : lt + 3]
            if ("a" <= d <= "z") or ("A" <= d <= "Z"):
                end = text.find(">", lt + 2)
                if end == -1:
                    emit_text("<")
                    pos = lt + 1
                    continue
                pos = end + 1
                continue
            emit_text("<")
            pos = lt + 1
            continue
        elif c == "?":
            end = text.find(">", lt + 2)
            if end == -1:
                emit_text("<")
                pos = lt + 1
                continue
            pos = end + 1
            continue
        else:
            emit_text("<")  # literal '<' (html.parser treats as text)
            pos = lt + 1
            continue

        if m is None:
            emit_text("<")
            pos = lt + 1
            continue
        name = m.group().lower()
        after = m.end()
        if text[after : after + 1] == ">":
            # attribute-less tag — the common case; skip the attr regex
            attr_str = ""
            self_closing = False
            pos = after + 1
        else:
            # find the tag-closing '>' skipping quoted attribute values
            endm = _TAGEND_RE.match(text, after)
            if endm is None:
                emit_text("<")  # unterminated tag at EOF -> text, like stdlib
                pos = lt + 1
                continue
            attr_str = text[after : endm.end() - 1]
            self_closing = attr_str.endswith("/")
            pos = endm.end()

        if is_end:
            if name in VOID_TAGS:
                continue
            for k in range(len(stack) - 1, 0, -1):
                if stack[k].tag == name:
                    del stack[k:]
                    break
            continue

        # start tag
        closers = AUTO_CLOSE.get(name)
        if closers:
            while len(stack) > 1 and stack[-1].tag in closers:
                stack.pop()
        attrs = _parse_attrs(attr_str[:-1] if self_closing else attr_str) if attr_str.strip("/ \t\r\n") else {}
        node = Node(name, attrs)
        stack[-1].children.append(node)
        if name in RAWTEXT_TAGS and not self_closing:
            # raw text until case-insensitive </name
            if lower is None:
                lower = text.lower()
            end = lower.find("</" + name, pos)
            if end == -1:
                pos = n  # unterminated rawtext: payload dropped (stdlib too)
                continue
            if end > pos:
                node.children.append(text[pos:end])
            gt = text.find(">", end)
            pos = n if gt == -1 else gt + 1
            continue
        if name not in VOID_TAGS and not self_closing:
            stack.append(node)

    return root
