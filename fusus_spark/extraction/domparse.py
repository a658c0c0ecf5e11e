"""Tolerant HTML -> DOM tree on the stdlib ``html.parser``.

Role analog of the reference's "normalize to analyzable form" stage
(fusus/page.py:577-647 ``doNormalize``: raw scan -> binarized image;
here: raw bytes -> element tree). No lxml in this environment, so we
build a small, deterministic, forgiving tree builder:

* void elements never take children,
* a fixed auto-close table repairs unclosed <p>/<li>/<td>/... the way
  browsers do,
* stray end tags are ignored, unclosed elements are closed at EOF,
* <script>/<style> payloads arrive as raw data and are kept as text
  children of their element (pruned later, never rendered).

Charset handling (T1 analog): try UTF-8 strictly, then any charset
announced in the first 2 KiB (``<meta charset=..>`` /
``content="..charset=.."``), then latin-1, then UTF-8 with replacement —
fully deterministic for any byte string.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# Tags whose open implicitly closes a set of currently-open tags
# (subset of the HTML5 tree-construction rules; deterministic).
_BLOCKISH = frozenset(
    "address article aside blockquote details dialog dd div dl dt fieldset "
    "figcaption figure footer form h1 h2 h3 h4 h5 h6 header hgroup hr main "
    "menu nav ol p pre section table ul".split()
)
AUTO_CLOSE: dict[str, frozenset[str]] = {t: frozenset(["p"]) for t in _BLOCKISH}
AUTO_CLOSE.update(
    {
        "li": frozenset(["li", "p"]),
        "dt": frozenset(["dt", "dd", "p"]),
        "dd": frozenset(["dt", "dd", "p"]),
        "tr": frozenset(["tr", "td", "th", "p"]),
        "td": frozenset(["td", "th", "p"]),
        "th": frozenset(["td", "th", "p"]),
        "option": frozenset(["option"]),
        "thead": frozenset(["tr", "td", "th"]),
        "tbody": frozenset(["tr", "td", "th", "thead"]),
        "tfoot": frozenset(["tr", "td", "th", "tbody"]),
    }
)

# Raw-text elements: parser emits their payload as data; we keep it as a
# text child but extraction prunes these tags entirely.
RAWTEXT_TAGS = frozenset(["script", "style"])


class Node:
    """One element. ``children`` holds Node or str (text) in document order."""

    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict[str, str] | None = None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list[Node | str] = []

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"<{self.tag} kids={len(self.children)}>"

    def iter_text(self) -> str:
        """All descendant text concatenated (whitespace NOT normalized)."""
        out: list[str] = []
        stack: list[Node | str] = [self]
        while stack:
            n = stack.pop()
            if isinstance(n, str):
                out.append(n)
            else:
                stack.extend(reversed(n.children))
        return "".join(out)


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#root")
        self.stack: list[Node] = [self.root]

    # -- helpers ----------------------------------------------------------
    def _open_tags(self) -> list[str]:
        return [n.tag for n in self.stack]

    def _autoclose_for(self, tag: str) -> None:
        closers = AUTO_CLOSE.get(tag)
        if not closers:
            return
        # Close innermost run of auto-closable tags (never past a table
        # cell boundary for p-closers, kept simple & deterministic).
        while len(self.stack) > 1 and self.stack[-1].tag in closers:
            self.stack.pop()

    # -- HTMLParser callbacks ---------------------------------------------
    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        tag = tag.lower()
        self._autoclose_for(tag)
        node = Node(tag, {k.lower(): (v or "") for k, v in attrs})
        self.stack[-1].children.append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        tag = tag.lower()
        self._autoclose_for(tag)
        self.stack[-1].children.append(
            Node(tag, {k.lower(): (v or "") for k, v in attrs})
        )

    def handle_endtag(self, tag: str) -> None:
        tag = tag.lower()
        if tag in VOID_TAGS:
            return
        # Find matching open element; ignore stray end tags.
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data: str) -> None:
        if data:
            self.stack[-1].children.append(data)

    # comments / decls / PIs dropped (the reference drops non-content ink)
    def handle_comment(self, data: str) -> None:
        pass

    def handle_decl(self, decl: str) -> None:
        pass

    def handle_pi(self, data: str) -> None:
        pass


_CHARSET_RE = re.compile(rb"charset\s*=\s*[\"']?\s*([A-Za-z0-9_\-]+)", re.I)


def decode_html(payload: bytes, charset_hint: str | None = None) -> str:
    """Deterministic bytes -> str (T1 charset-sniff analog).

    Decode order: strict UTF-8 first (a page that survives strict
    UTF-8 IS UTF-8 — this also defuses the very common mis-declared
    transport charset), then the transport-layer ``charset_hint``
    (the Content-Type parameter the WARC envelope retains), then the
    in-page meta charset sniff, then the latin-1 total fallback.
    Unknown/invalid hints fall through silently — the hint can only
    ADD a decode path, never lose a document.

    A leading BOM (U+FEFF) is stripped: it is an encoding artifact, not
    content — left in place it glues to the first word (ZWNBSP is not
    whitespace) and poisons the first token of every BOM'd page.
    """
    if not payload:
        return ""
    text = None
    try:
        text = payload.decode("utf-8")
    except UnicodeDecodeError:
        pass
    if text is None and charset_hint:
        enc = charset_hint.strip().strip("'\"").lower()
        if enc not in ("utf-8", "utf8"):
            try:
                text = payload.decode(enc)
            except (UnicodeError, LookupError):
                # UnicodeError, not just UnicodeDecodeError: codecs like
                # 'undefined'/'idna' raise the plain superclass, and a
                # hint must never turn a decodable page into an error
                pass
    if text is None:
        m = _CHARSET_RE.search(payload[:2048])
        if m:
            enc = m.group(1).decode("ascii", "replace").lower()
            if enc not in ("utf-8", "utf8"):
                try:
                    text = payload.decode(enc)
                except (UnicodeError, LookupError):
                    pass
    if text is None:
        try:
            text = payload.decode("latin-1")
        except UnicodeDecodeError:  # pragma: no cover - latin-1 never fails
            text = payload.decode("utf-8", "replace")
    return text[1:] if text.startswith("\ufeff") else text


def parse_html(payload: bytes | str, charset_hint: str | None = None) -> Node:
    """Parse HTML bytes/str into a Node tree rooted at ``#root``.

    Never raises on malformed markup; worst case returns a tree holding
    whatever could be salvaged (the reference's tolerance analog:
    empty-page short-circuit, fusus/page.py:640-647). ``charset_hint``
    is the transport-layer charset (see decode_html).
    """
    text = (decode_html(payload, charset_hint)
            if isinstance(payload, (bytes, bytearray)) else payload)
    builder = _TreeBuilder()
    try:
        builder.feed(text)
        builder.close()
    except Exception:
        # html.parser is robust, but guarantee no exception escapes.
        pass
    return builder.root
