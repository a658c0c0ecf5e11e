"""Block / line / word segmentation with character-span offsets.

Reference semantics carried over:

* **blocks** — reading-order block tree from the stripped DOM
  (stripes/blocks analog, fusus/layout.py:309-518 getStripes/getBlocks):
  block-level elements in document order, each maximal run of inline
  content = one block;
* **lines** — within a block, ``<br>`` boundaries, ``<tr>`` rows and
  ``<pre>`` newlines split lines (ink-histogram line segmentation
  analog, fusus/lines.py:232-507 getInkY); table cells within a row are
  the em-space "column" analog (lakhnawi.py:2701-2777) and join with a
  single space;
* **words** — split on whitespace AND punctuation class exactly as the
  OCR word segmenter (fusus/ocr.py:340-371): ``punc`` carries the
  trailing non-alphanumeric run, a word may be empty-letters with only
  punc, and a letter following punc inside one whitespace token starts
  a new word;
* **normalization** — per line: collapse ``\\s+`` to single spaces,
  strip, Unicode NFC (T27 analog, lakhnawi.py:2624-2660); empty lines
  are dropped (F8);
* **extracted_text** — all lines in reading order joined with ``\\n``;
  word ``char_start/char_end`` index into it and
  ``extracted_text[char_start:char_end] == word + punc`` always holds
  (the byte-identical golden target).
"""

from __future__ import annotations

import unicodedata

from fusus_spark.extraction.domparse import Node
from fusus_spark.extraction.rewrite import (
    DEFAULT_COMPILED,
    CompiledRules,
    apply_rewrites,
)

# Elements that open/close a block (stripe/block analog).
BLOCK_TAGS = frozenset(
    "address article blockquote body caption center dd details dialog div dl "
    "dt fieldset figcaption figure h1 h2 h3 h4 h5 h6 hr html li main menu ol "
    "p pre section summary table tbody tfoot thead ul".split()
)

# Elements that break a line but not a block.
LINE_TAGS = frozenset(["tr"])

# Table cells: column separator within a row (em-space/hemistic analog).
CELL_TAGS = frozenset(["td", "th"])

_BLOCK_BREAK = 2
_LINE_BREAK = 1


def walk_segments(root: Node) -> list[tuple[int, str]]:
    """Flatten the DOM into ``(kind, payload)`` events in document order.

    kind: 0 = text, 1 = line break, 2 = block break. Deterministic
    recursive walk (document order == reading order for web documents;
    the reference must *recover* reading order from pixel geometry —
    T25 — while the DOM already encodes it).
    """
    events: list[tuple[int, str]] = []

    def emit_break(level: int) -> None:
        # Coalesce: keep only the strongest pending break.
        if events and events[-1][0] > 0:
            if level > events[-1][0]:
                events[-1] = (level, "")
        else:
            events.append((level, ""))

    # Iterative DFS (explicit stack): real web pages nest thousands of
    # divs deep; Python recursion would hit the C stack. Sentinels mark
    # the close action of a container; children are pushed reversed so
    # they pop in document order — identical event stream to the
    # recursive formulation.
    _EXIT_BLOCK, _EXIT_LINE, _EXIT_CELL = object(), object(), object()
    stack: list[tuple[object, bool]] = [
        (c, False) for c in reversed(root.children)
    ]
    while stack:
        obj, in_pre = stack.pop()
        if obj is _EXIT_BLOCK:
            emit_break(_BLOCK_BREAK)
            continue
        if obj is _EXIT_LINE:
            emit_break(_LINE_BREAK)
            continue
        if obj is _EXIT_CELL:
            events.append((0, " "))
            continue
        if isinstance(obj, str):
            if in_pre:
                # <pre>: explicit newlines are line breaks.
                parts = obj.split("\n")
                for i, part in enumerate(parts):
                    if i:
                        emit_break(_LINE_BREAK)
                    if part:
                        events.append((0, part))
            elif obj:
                events.append((0, obj))
            continue
        tag = obj.tag
        if tag == "br":
            emit_break(_LINE_BREAK)
            continue
        if tag in BLOCK_TAGS:
            emit_break(_BLOCK_BREAK)
            stack.append((_EXIT_BLOCK, False))
            child_pre = in_pre or tag == "pre"
            for c in reversed(obj.children):
                stack.append((c, child_pre))
        elif tag in LINE_TAGS:
            emit_break(_LINE_BREAK)
            stack.append((_EXIT_LINE, False))
            for c in reversed(obj.children):
                stack.append((c, in_pre))
        elif tag in CELL_TAGS:
            # Column separator: a single space between cells.
            events.append((0, " "))
            stack.append((_EXIT_CELL, False))
            for c in reversed(obj.children):
                stack.append((c, in_pre))
        else:  # inline: no break
            for c in reversed(obj.children):
                stack.append((c, in_pre))
    return events


def segment_blocks(
    root: Node, rewrites: CompiledRules | None = DEFAULT_COMPILED
) -> list[list[str]]:
    """DOM -> list of blocks; block = list of normalized non-empty lines.

    Per line, in order: the T26 rewrite engine (mojibake/entity/control
    repair — the trimLine analog, applied BEFORE whitespace handling
    exactly as the reference applies rules before space insertion,
    lakhnawi.py:2405-2407), then whitespace collapse, then NFC.

    Hot-loop fast paths (the flagship-throughput guard): the rewrite
    engine's no-op check is hoisted to ONE C-level regex scan over the
    document's concatenated text payloads — an anchor char present in
    some line is necessarily present in some payload, so a clean
    document (the overwhelming case for web text) skips the per-line
    engine entirely; and NFC is skipped for pure-ASCII lines (identity
    by definition — ASCII is NFC-closed).
    """
    events = walk_segments(root)
    if rewrites is not None and rewrites.anchor_re.search(
        "".join(p for k, p in events if k == 0)
    ) is None:
        rewrites = None
    blocks: list[list[str]] = []
    cur_block: list[str] = []
    cur_line: list[str] = []

    def flush_line() -> None:
        raw = "".join(cur_line)
        cur_line.clear()
        if rewrites is not None:
            raw = apply_rewrites(raw, rewrites)
        line = " ".join(raw.split())
        if not line.isascii():
            line = unicodedata.normalize("NFC", line)
        if line:
            cur_block.append(line)

    def flush_block() -> None:
        flush_line()
        if cur_block:
            blocks.append(list(cur_block))
            cur_block.clear()

    for kind, payload in events:
        if kind == 0:
            cur_line.append(payload)
        elif kind == _LINE_BREAK:
            flush_line()
        else:
            flush_block()
    flush_block()
    return blocks


def split_words(line: str, offset: int) -> list[tuple[str, str, int, int]]:
    """OCR-style word/punc segmentation of one normalized line (T22/T31).

    Returns ``(word, punc, char_start, char_end)`` with offsets relative
    to ``offset`` (the line's start in extracted_text). Semantics
    (fusus/ocr.py:340-371): whitespace separates tokens; within a token,
    a run of alphanumerics is a word, the following run of
    non-alphanumerics is its punc; a token starting with punctuation
    yields an empty-letters word; alphanumerics after punc start a new
    word. ``line[s-offset:e-offset] == word + punc`` for every row.
    """
    out: list[tuple[str, str, int, int]] = []
    # bulk fast path: a line with no punctuation at all (very common for
    # clean prose) — every token is (word, "") and offsets are a
    # running sum; skips the per-token scan loop below
    if line.replace(" ", "").isalnum():
        pos = offset
        for tok in line.split(" "):
            if tok:
                out.append((tok, "", pos, pos + len(tok)))
            pos += len(tok) + 1
        return out
    i = 0
    n = len(line)
    while i < n:
        if line[i] == " ":
            i += 1
            continue
        # token = run up to the next space (C-speed find)
        j = line.find(" ", i)
        if j == -1:
            j = n
        token = line[i : j]
        if token.isalnum():
            # fast path: the whole token is one word with empty punc —
            # the overwhelmingly common case; one C-level call
            out.append((token, "", offset + i, offset + j))
            i = j
            continue
        # general case: alternate (alnum run, non-alnum run) pairs
        k = 0
        m = len(token)
        base = offset + i
        while k < m:
            ws = k
            while k < m and token[k].isalnum():
                k += 1
            we = k
            while k < m and not token[k].isalnum():
                k += 1
            out.append((token[ws:we], token[we:k], base + ws, base + k))
        i = j
    return out


def assemble(
    blocks: list[list[str]],
) -> tuple[str, list[tuple[int, int, int, str, str, int, int]]]:
    """Blocks -> (extracted_text, word rows).

    Word rows: (block_id, line_id, word_seq, word, punc, char_start,
    char_end). extracted_text = all lines joined with "\\n"; deterministic
    slot ordering (W7: stable sequence numbering for byte-identical
    goldens).
    """
    text_parts: list[str] = []
    rows: list[tuple[int, int, int, str, str, int, int]] = []
    offset = 0
    for block_id, lines in enumerate(blocks):
        for line_id, line in enumerate(lines):
            if text_parts:
                text_parts.append("\n")
                offset += 1
            text_parts.append(line)
            for word_seq, (word, punc, s, e) in enumerate(split_words(line, offset)):
                rows.append((block_id, line_id, word_seq, word, punc, s, e))
            offset += len(line)
    return "".join(text_parts), rows
