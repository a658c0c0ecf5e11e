"""Composed curation gate: the keep/drop decision of a training-data
pipeline, with machine-readable reasons.

Combines the repo's quality signals into one verdict per document —
the Gopher-rules shape (Rae et al. 2021 §A1.1): token-count bounds,
mean-token-length bounds, stopword floor, and repetition caps. Each
failed rule contributes its name to a ``reasons`` array (sorted,
deterministic), because at 10^12 docs the FILTER AUDIT (how many docs
each rule killed, alone or together) matters as much as the surviving
corpus; ``keep`` is simply ``reasons == []``.

Plan shape: every signal is computed from the single token array in
one map-side projection (no joins between signal operators, no
shuffle); downstream aggregation of reasons is the caller's choice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from fusus_spark.functions.text import shingles, stopword_hits, tokens

# Gopher-flavored defaults, scaled-integer thresholds (e6 where ratio).
DEFAULT_RULES = {
    "min_tokens": 5,
    "max_tokens": 100_000,
    "min_mean_token_len_e6": 1_500_000,   # 1.5 chars
    "max_mean_token_len_e6": 12_000_000,  # 12 chars
    "min_stop_ratio_e6": 20_000,          # 2% stopwords
    "max_top_bigram_share_e6": 200_000,   # 20%
}


def _top_run_share(arr) -> Column:
    """Mode multiplicity / size via sorted-run-max (textstats.repetition_
    stats shape): O(n log n) per doc, map-side."""
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    best = F.aggregate(F.array_sort(arr), zero, step)["best"]
    return F.when(F.size(arr) > 0, best / F.size(arr)).otherwise(F.lit(0.0))


def curation_gate(
    docs: DataFrame,
    rules: dict[str, int] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    stop_lang: str = "en",
) -> DataFrame:
    """(doc_id, n_tokens, keep, reasons) — one projection per doc.

    ``reasons`` lists every failed rule name in sorted order; an empty
    array means keep. Ratios compare as e6-scaled integers so the gate
    is oracle-exact.
    """
    r = {**DEFAULT_RULES, **(rules or {})}
    t = tokens(text_col)
    n = F.size(t)
    mean_len_e6 = F.when(
        n > 0,
        F.round(
            F.aggregate(t, F.lit(0), lambda a, x: a + F.length(x)) / n * 1000000
        ),
    ).otherwise(F.lit(0)).cast("bigint")
    stop_e6 = F.when(
        n > 0, F.round(stopword_hits(t, stop_lang) / n * 1000000)
    ).otherwise(F.lit(0)).cast("bigint")
    big = F.when(n >= 2, shingles(t, 2)).otherwise(F.array().cast("array<string>"))
    bigram_e6 = F.round(_top_run_share(big) * 1000000).cast("bigint")

    checks = [
        ("too_few_tokens", n < F.lit(r["min_tokens"])),
        ("too_many_tokens", n > F.lit(r["max_tokens"])),
        ("mean_token_too_short", mean_len_e6 < F.lit(r["min_mean_token_len_e6"])),
        ("mean_token_too_long", mean_len_e6 > F.lit(r["max_mean_token_len_e6"])),
        ("too_few_stopwords", stop_e6 < F.lit(r["min_stop_ratio_e6"])),
        ("repetitive_bigrams", bigram_e6 > F.lit(r["max_top_bigram_share_e6"])),
    ]
    reasons = F.array_sort(
        F.filter(
            F.array(
                *[F.when(cond, F.lit(name)).otherwise(F.lit(None)) for name, cond in checks]
            ),
            lambda x: x.isNotNull(),
        )
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n.cast("int").alias("n_tokens"),
        (F.size(reasons) == 0).alias("keep"),
        reasons.alias("reasons"),
    )
