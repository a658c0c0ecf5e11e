"""Cross-edition word alignment: the fuzzy ordered as-of join (J1).

Reference semantics (fusus/align.py:603-815 ``doDiffs``): a 2-pointer
walk over two word sequences with a decision ladder —

  1. exact match;
  2. Levenshtein match through an escalating ``(maxD, minRatio)``
     ladder: (1, 0.8) -> (2, 0.7) -> (3, 0.6);
  3. bounded lookahead (jump) with catch-up null-padding for the side
     that skipped (align.py:293-331 catchupAF/LK).

The algorithm is inherently sequential per document pair, so the Spark
plan is: **block by url, cogroup, align inside an Arrow
``applyInPandas``** (SURVEY.md J1 mapping) — each group is one small
sequential problem; the cluster runs millions of them in parallel.

Invariant (align.py:892-976 ``check``): every slot of each side
appears exactly once, in order — asserted by tests/test_align.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

LADDER = ((1, 0.8), (2, 0.7), (3, 0.6))
MAX_LOOKAHEAD = 20

ALIGN_OUT_SCHEMA = (
    "url string, slot_a long, word_a string, distance int, "
    "ratio double, word_b string, slot_b long"
)


def _lev(a: str, b: str) -> int:
    """Levenshtein distance, small-string DP (no external lib)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _ratio(a: str, b: str, d: int) -> float:
    m = max(len(a), len(b))
    return 1.0 if m == 0 else round(1.0 - d / m, 6)


def _match(a: str, b: str) -> tuple[int, float] | None:
    """Ladder decision: (distance, ratio) if the pair matches."""
    if a == b:
        return 0, 1.0
    d = _lev(a, b)
    r = _ratio(a, b, d)
    for max_d, min_r in LADDER:
        if d <= max_d and r >= min_r:
            return d, r
    return None


def align_sequences(
    a: list[tuple[int, str]], b: list[tuple[int, str]]
) -> list[tuple[int | None, str | None, int | None, float | None, str | None, int | None]]:
    """Align two (slot, word) sequences; every slot emitted exactly once."""
    out: list = []
    i, j = 0, 0
    na, nb = len(a), len(b)
    while i < na and j < nb:
        m = _match(a[i][1], b[j][1])
        if m is not None:
            out.append((a[i][0], a[i][1], m[0], m[1], b[j][1], b[j][0]))
            i += 1
            j += 1
            continue
        # lookahead: smallest total jump (k_a + k_b) that re-synchronizes
        best: tuple[int, int, int] | None = None  # (cost, ka, kb)
        for ka in range(MAX_LOOKAHEAD + 1):
            if i + ka >= na:
                break
            for kb in range(MAX_LOOKAHEAD + 1):
                if (ka, kb) == (0, 0) or j + kb >= nb:
                    if (ka, kb) == (0, 0):
                        continue
                    break
                if best is not None and ka + kb >= best[0]:
                    break
                if _match(a[i + ka][1], b[j + kb][1]) is not None:
                    best = (ka + kb, ka, kb)
                    break
        if best is None:
            break  # tails emitted below
        _, ka, kb = best
        for s in range(ka):  # catch-up null padding (catchupLK analog)
            out.append((a[i + s][0], a[i + s][1], None, None, None, None))
        for s in range(kb):  # catchupAF analog
            out.append((None, None, None, None, b[j + s][1], b[j + s][0]))
        i += ka
        j += kb
    for s in range(i, na):
        out.append((a[s][0], a[s][1], None, None, None, None))
    for s in range(j, nb):
        out.append((None, None, None, None, b[s][1], b[s][0]))
    return out


def align_editions(edition_a: DataFrame, edition_b: DataFrame) -> DataFrame:
    """Align two word tables (url, slot, word) -> alignment rows per url.

    Plan: cogroup on url (one shuffle per side), Arrow applyInPandas.
    """

    def do_align(key: tuple, pa: pd.DataFrame, pb: pd.DataFrame) -> pd.DataFrame:
        url = key[0]
        sa = list(
            pa.sort_values("slot")[["slot", "word"]].itertuples(index=False, name=None)
        )
        sb = list(
            pb.sort_values("slot")[["slot", "word"]].itertuples(index=False, name=None)
        )
        rows = align_sequences(sa, sb)
        return pd.DataFrame(
            rows, columns=["slot_a", "word_a", "distance", "ratio", "word_b", "slot_b"]
        ).assign(url=url)[
            ["url", "slot_a", "word_a", "distance", "ratio", "word_b", "slot_b"]
        ]

    return (
        edition_a.groupBy("url")
        .cogroup(edition_b.groupBy("url"))
        .applyInPandas(do_align, schema=ALIGN_OUT_SCHEMA)
    )
