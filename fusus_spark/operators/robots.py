"""Robots/opt-out signals: in-page crawl-consent directives.

A training-data pipeline that respects publisher opt-outs needs the
in-page half of the robots protocol: ``<meta name="robots"
content="noindex, nofollow">`` (the page asked to be left out of
indexes — the standard conservative reading excludes it from corpora
too) and ``<link rel="canonical" href="...">`` (the page DECLARES its
canonical url — stronger than any heuristic canonicalization, and the
natural key to fold syndicated copies with). The HTTP-header half of
the protocol (``X-Robots-Tag``) is merged too when the input carries
the fetch layer's header column (sources/warc.py retains it at
ingest): a header directive is tested with the same whole-token rules
as the meta content, and a user-agent-scoped value (``googlebot:
noindex``) counts as an opt-out — the conservative reading.

Same design as webgraph.extract_links: a linear codegen'd regexp scan
over the raw html cast — RE2-safe patterns (no lookarounds/backrefs)
so the DuckDB oracle tokenizes identically; one projection per row,
zero Python, zero shuffle. Attribute order is free in real markup, so
each signal is the coalesce of a name-first and a content-first
pattern. The robots CONTENT is matched case-insensitively on a
lowered copy; the canonical HREF is extracted from the ORIGINAL bytes
(url paths are case-sensitive) with case-classes on the keywords only.

Reference role analog: the reference's per-page skip/exclusion flags
(empty-page detection, fusus/book.py page selection) — the "this page
asked out" bit, here sourced from the page itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# lowered-copy patterns (robots content is case-insensitive by spec).
# Attribute VALUES may be double-quoted, single-quoted, or unquoted
# (valid HTML: <meta name=robots content=noindex>) — each value is a
# 3-way alternation whose capture lands in exactly one of groups 1-3
# (extracted via _first_group); the unquoted robots name must be
# DELIMITED ([\s/>]) so name=robotsx never matches. All alternations
# are RE2-safe (no lookarounds/backrefs) so the DuckDB oracle
# tokenizes identically.
_CONTENT_VAL = r"""content\s*=\s*(?:"([^"<>]*)"|'([^'<>]*)'|([^\s"'<>]+))"""
_NAME_ROBOTS = r"""name\s*=\s*(?:"robots"|'robots'|robots[\s/>])"""
_META_NAME_FIRST = r"<meta\s[^>]*" + _NAME_ROBOTS + r"[^>]*" + _CONTENT_VAL
_META_CONTENT_FIRST = r"<meta\s[^>]*" + _CONTENT_VAL + r"[^>]*" + _NAME_ROBOTS
# original-bytes patterns (href case preserved); keyword case-classes
_REL = r"[rR][eE][lL]"
_CANON = r"[cC][aA][nN][oO][nN][iI][cC][aA][lL]"
_HREF = r"[hH][rR][eE][fF]"
_LINK = r"<[lL][iI][nN][kK]\s"
_HREF_VAL = (
    _HREF + r"""\s*=\s*(?:"([^"<>]+)"|'([^'<>]+)'|([^\s"'<>]+))"""
)
_REL_CANON = (
    _REL + r"\s*=\s*(?:\"" + _CANON + r"\"|'" + _CANON + r"'|"
    + _CANON + r"[\s/>])"
)
_LINK_REL_FIRST = _LINK + r"[^>]*" + _REL_CANON + r"[^>]*" + _HREF_VAL
_LINK_HREF_FIRST = _LINK + r"[^>]*" + _HREF_VAL + r"[^>]*" + _REL_CANON


def _first_group(col: Column, pat: str) -> Column:
    """The one non-empty capture among the pattern's three value
    alternations (null when the pattern does not match or the value is
    empty — '' means absent throughout this module)."""
    return F.coalesce(
        *[F.nullif(F.regexp_extract(col, pat, g), F.lit("")) for g in (1, 2, 3)]
    )


def _directive(content: Column, name: str) -> Column:
    """True when a robots content list contains the directive as a
    whole token (comma/space separated — 'noindex' must not match
    'noindexing'). The ``none`` directive is defined by the robots
    meta spec as 'noindex, nofollow', so it implies both."""
    pat = rf"(^|[\s,]){name}([\s,]|$)"
    if name in ("noindex", "nofollow"):
        pat = rf"(^|[\s,])({name}|none)([\s,]|$)"
    return content.rlike(pat)


def _robots_content(html_col: str) -> Column:
    """The raw (lowered) robots meta content — the ONE expression both
    the signals table and the opt-out filter compile against, so the
    audit and the filter can never disagree."""
    low = F.lower(F.col(html_col).cast("string"))
    return F.coalesce(
        _first_group(low, _META_NAME_FIRST),
        _first_group(low, _META_CONTENT_FIRST),
        F.lit(""),
    )


def _header_content(docs: DataFrame, xrobots_col: str | None) -> Column:
    """The lowered X-Robots-Tag value to merge ('' when the column is
    not present / null). ``xrobots_col=None`` auto-detects the column
    ``x_robots_tag`` (what sources/warc.py emits), so any caller whose
    input went through the WARC envelope parse honors headers without
    wiring."""
    if xrobots_col is None:
        xrobots_col = "x_robots_tag" if "x_robots_tag" in docs.columns else ""
    if not xrobots_col:
        return F.lit("")
    return F.lower(F.coalesce(F.col(xrobots_col), F.lit("")))


def robots_signals(
    docs: DataFrame, url_col: str = "url", html_col: str = "html",
    xrobots_col: str | None = None,
) -> DataFrame:
    """(url, robots_content, header_content, noindex, nofollow,
    noarchive, canonical_href) — one codegen'd projection per document.

    ``robots_content`` is the raw (lowered) content of the first
    matching robots meta ('' when absent); ``header_content`` the
    lowered X-Robots-Tag header value ('' when absent — auto-detected
    from the ``x_robots_tag`` column, see ``_header_content``). The
    booleans are whole-token tests over the UNION of both surfaces
    (either half of the protocol opts the page out; a UA-scoped header
    value like ``googlebot: noindex`` still contains the token, the
    conservative reading). ``canonical_href`` is the declared canonical
    url (null when absent) — feed it through webgraph.resolve_links /
    functions.url.canonical_url before joining, exactly like any other
    harvested href.
    """
    orig = F.col(html_col).cast("string")
    content = _robots_content(html_col)
    header = _header_content(docs, xrobots_col)
    canon = F.coalesce(
        _first_group(orig, _LINK_REL_FIRST),
        _first_group(orig, _LINK_HREF_FIRST),
    )
    return docs.select(
        F.col(url_col).alias("url"),
        content.alias("robots_content"),
        header.alias("header_content"),
        (_directive(content, "noindex")
         | _directive(header, "noindex")).alias("noindex"),
        (_directive(content, "nofollow")
         | _directive(header, "nofollow")).alias("nofollow"),
        (_directive(content, "noarchive")
         | _directive(header, "noarchive")).alias("noarchive"),
        canon.alias("canonical_href"),
    )


def apply_robots_optout(
    docs: DataFrame, url_col: str = "url", html_col: str = "html",
    xrobots_col: str | None = None,
) -> DataFrame:
    """Drop documents whose page declares ``noindex`` — via the robots
    meta OR the X-Robots-Tag header when the input carries the header
    column (auto-detected, see ``_header_content``) — the conservative
    opt-out reading; everything else passes through unchanged. Pure
    map-side filter — the signals are computed inline via the same
    expressions the audit table uses, no join. Pages with no html, no
    robots meta and no header are KEPT (absence of a directive is
    consent under the robots protocol); ``none`` counts as noindex per
    the spec."""
    return docs.where(
        ~_directive(_robots_content(html_col), "noindex")
        & ~_directive(_header_content(docs, xrobots_col), "noindex")
    )
