"""Declared-canonical collapse — the ``rel=canonical`` consolidation
tier (RFC 6596).

Real corpora are full of pages that DECLARE their duplicate-ness:
``<link rel="canonical" href="...">`` says "I am an alternate of that
url" (print views, tracking-parameter variants, m.-subdomain mirrors,
paginated listings pointing at page 1). Collapsing on the declaration
is tier-0 dedup — cheaper than any content comparison (MinHash, SimHash
— operators/dedup.py) because the page hands the cluster key to us, and
it catches pairs content dedup can miss (an alternate rendered with
different chrome). Search engines apply exactly this consolidation
before indexing.

The declaration is a SIGNAL, not a command: a cross-site canonical is a
common spam/misconfiguration vector, so collapse is scoped (same
registrable domain by default, PSL-backed — functions/psl.py) and
out-of-scope declarations are FLAGGED, never followed. The href is
resolved like any other link (relative forms are legal in rel=canonical)
through :func:`fusus_spark.operators.webgraph.resolve_links`'s RFC 3986
page-level merge, then folded through
:func:`fusus_spark.functions.url.canonical_url` so a declared target and
a crawled url meet in the same keyspace — the convention every join in
this repo uses (operators/robots.py module header).

Reference analog: the reference engine dedupes editions by explicit
page-mapping tables (among/fusus: convert.py edition merge keys); the
web analog of an explicit "this page IS that page" mapping is the
canonical link element.

Scale shape: :func:`canonical_collapse` is a pure per-row projection
(zero shuffle — the RFC 3986 merge and the canonical fold are all JVM
expressions); :func:`canonical_representatives` is ONE groupBy
max-of-struct (the cluster_representatives convention — no window, no
per-group sort, big clusters can't straggle);
:func:`apply_canonical_collapse` is one equi-join. Nothing here is
per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from fusus_spark.functions.psl import registrable_domain
from fusus_spark.functions.url import canonical_url, url_host
from fusus_spark.operators.webgraph import resolve_links


def canonical_collapse(
    signals: DataFrame,
    url_col: str = "url",
    href_col: str = "canonical_href",
    *,
    scope: str = "domain",
    psl_rules: dict | None = None,
) -> DataFrame:
    """Map every url to its collapse target from the page's declared
    canonical.

    Input: (url, canonical_href, ...) — :func:`operators.robots.
    robots_signals` output shape; ``canonical_href`` is the RAW href
    (absolute or relative; '' or null when the page declares nothing).

    Output, one row per input row:

    * ``self_canonical`` — canonical_url(url), the url's own key;
    * ``canonical_target`` — the group key: the declared canonical
      (resolved against the page url per RFC 3986, then canonical_url-
      folded) when it is present, non-degenerate and in scope;
      otherwise ``self_canonical``. A page with no declaration, a junk
      href (``javascript:``, fragment-only), or an out-of-scope target
      groups with itself — the declaration is advisory and failure is
      always safe;
    * ``collapsed`` — true iff the declaration moved this url into a
      DIFFERENT group (self-canonical pages and protocol/tracking twins
      whose declared key equals their own key read false);
    * ``out_of_scope`` — true iff a resolvable declaration was REJECTED
      by the scope guard (the spam-signal bit, worth counting per
      host).

    ``scope``: ``'domain'`` (default) accepts targets on the same
    registrable domain (PSL; ``psl_rules`` as in functions/psl.py —
    m.example.com -> www.example.com collapses, evil.com does not);
    ``'host'`` requires exact host equality; ``'any'`` trusts every
    declaration (closed-world corpora).

    Plan: one projection, zero shuffle, no UDF.
    """
    if scope not in ("domain", "host", "any"):
        raise ValueError(f"scope must be domain|host|any, got {scope!r}")
    base = signals.select(
        F.col(url_col).alias("src_url"),
        F.when(F.col(href_col) == "", None)
        .otherwise(F.col(href_col))
        .alias("href"),
    )
    resolved = resolve_links(base, page_level=True)
    self_key = canonical_url(F.col("src_url"))
    decl = F.when(
        F.col("resolved").isNotNull(), canonical_url(F.col("resolved"))
    )
    src_h = url_host(F.col("src_url"))
    dst_h = url_host(F.col("resolved"))
    if scope == "host":
        in_scope = dst_h == src_h
    elif scope == "domain":
        sd = registrable_domain(src_h, psl_rules)
        dd = registrable_domain(dst_h, psl_rules)
        # '' = host IS a public suffix / dotless: never a valid target
        in_scope = (dd != "") & (dd == sd)
    else:
        in_scope = F.lit(True)
    # degenerate folds ('http://', empty authority) can't be targets
    valid = decl.isNotNull() & decl.rlike(r"^http://[^/?#]")
    accepted = valid & in_scope
    target = F.when(accepted, decl).otherwise(self_key)
    return resolved.select(
        F.col("src_url").alias(url_col),
        self_key.alias("self_canonical"),
        target.alias("canonical_target"),
        (accepted & (decl != self_key)).alias("collapsed"),
        (valid & ~in_scope).alias("out_of_scope"),
    )


def canonical_representatives(
    mapped: DataFrame, url_col: str = "url"
) -> DataFrame:
    """One representative per canonical group: the canonical page
    ITSELF when the corpus holds it (its own key equals the group key —
    the copy the publisher nominated), else the smallest url (the
    determinism fallback, per the cluster_representatives convention).

    Input: :func:`canonical_collapse` output. Returns (canonical_target,
    rep_url, rep_is_target, n_members) — ``n_members`` counts input
    rows, so singleton groups (nothing declared) are n_members=1 and
    downstream stats stay per-corpus-complete.

    Plan: ONE groupBy min-of-struct (the target-first bit is the
    struct's leading key), partial-agg'd; no window, no join.
    """
    m = mapped.select(
        "canonical_target",
        F.col(url_col).alias("__u__"),
        (F.col("self_canonical") != F.col("canonical_target"))
        .cast("int")
        .alias("__nt__"),
    )
    best = F.min(F.struct(F.col("__nt__"), F.col("__u__")))
    return (
        m.groupBy("canonical_target")
        .agg(best.alias("b"), F.count(F.lit(1)).alias("n_members"))
        .select(
            "canonical_target",
            F.col("b.__u__").alias("rep_url"),
            (F.col("b.__nt__") == 0).alias("rep_is_target"),
            "n_members",
        )
    )


def apply_canonical_collapse(
    docs: DataFrame, mapped: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Keep only each canonical group's representative row of ``docs``
    — the consolidation filter (the dedup_by_canonical_url analog for
    DECLARED rather than heuristic equivalence). One semi-join on url;
    reps are corpus-sized, so no broadcast assumption.
    """
    reps = canonical_representatives(mapped, url_col).select(
        F.col("rep_url").alias(url_col)
    )
    return docs.join(reps, url_col, "left_semi")
