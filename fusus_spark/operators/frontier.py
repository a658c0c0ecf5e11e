"""Crawl-frontier signals: cross-snapshot change tracking and revisit
priority.

A recurring crawl holds multiple snapshots of every url ((url,
content_hash, crawl_date) rows — exactly what ``write_hash_store``
accumulates per snapshot). The frontier question is WHERE TO SPEND THE
NEXT FETCH: urls whose content churns every snapshot deserve frequent
revisits, static pages do not, and hosts that never change can be
demoted wholesale. The classic formulation (Cho & Garcia-Molina 2003,
"Effective Page Refresh Policies for Web Crawlers") estimates per-page
change frequency from observed change/no-change samples; these
operators compute that evidence with two shuffles total.

Plan shapes:

* ``url_change_stats`` — ONE window per url ordered by crawl_date
  (lag(content_hash) -> changed flag) folded by ONE groupBy(url):
  the shuffle carries (url, hash, date) rows once; no self-joins.
* ``host_change_stats`` — map-side host extract over the per-url
  stats + one groupBy(host): hosts aggregate url-level ratios, so
  the second shuffle carries one row per url, not per observation.

Scaled-integer ratios (e6) keep the DuckDB oracles hash-exact; the
deterministic tie-breaks (crawl_date, content_hash) make reruns
byte-stable even when two snapshots of a url share a date.

Reference role analog: the reference's per-page reprocessing decision
(fusus/book.py:463-485 — which pages to re-run) lifted to the crawl's
time axis: which urls to re-FETCH.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from fusus_spark.functions.url import url_host


def url_change_stats(snaps: DataFrame, hash_col: str = "content_hash") -> DataFrame:
    """Per-url churn evidence from snapshot history rows
    (url, content_hash, crawl_date). ``hash_col`` names the change
    signal: the content hash by default, or a cheaper HTTP validator
    column (``etag`` — retained at WARC ingest) when the store carries
    one; output column names are identical either way.

    Returns (url, n_snapshots, n_changes, change_ratio_e6, first_date,
    last_date, last_hash): ``n_changes`` counts hash transitions
    between consecutive OBSERVED values — a null hash (a validator the
    server omitted on that fetch) carries no information, so each
    non-null value compares against the last non-null one and
    ``change_ratio_e6`` = round(n_changes / (n_observed-1) * 1e6)
    counts only informative comparisons (0 when fewer than two —
    no evidence is not evidence of change). Without this, an
    intermittently-omitted ETag (e1, null, e2) reads as perfectly
    static and the frontier starves the url. ``last_hash`` is the
    last OBSERVED validator (still valid for a conditional GET; a
    stale If-None-Match just returns 200). Content hashes are never
    null, so the default column is unaffected. ``n_snapshots`` counts
    all rows. Duplicate (url, crawl_date) rows are deterministic via
    the (crawl_date, content_hash) ordering tie-break.
    """
    snaps = snaps.select(
        "url", F.col(hash_col).alias("content_hash"), "crawl_date"
    )
    w = Window.partitionBy("url").orderBy("crawl_date", "content_hash")
    obs = snaps.withColumn(
        "__prev__",
        F.last("content_hash", ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
    )
    changed = (
        F.col("content_hash").isNotNull()
        & F.col("__prev__").isNotNull()
        & (F.col("content_hash") != F.col("__prev__"))
    ).cast("int")
    return (
        obs.withColumn("__chg__", changed)
        .groupBy("url")
        .agg(
            F.count("*").cast("int").alias("n_snapshots"),
            F.count("content_hash").cast("int").alias("__n_obs__"),
            F.sum("__chg__").cast("int").alias("n_changes"),
            F.min("crawl_date").alias("first_date"),
            F.max("crawl_date").alias("last_date"),
            # last OBSERVED hash (max over non-null rows by the same
            # ordering; null-hash rows contribute nothing)
            F.max(
                F.when(
                    F.col("content_hash").isNotNull(),
                    F.struct("crawl_date", "content_hash"),
                )
            )["content_hash"].alias("last_hash"),
        )
        .withColumn(
            "change_ratio_e6",
            F.when(
                F.col("__n_obs__") > 1,
                F.round(F.col("n_changes") / (F.col("__n_obs__") - 1) * 1_000_000),
            ).otherwise(F.lit(0)).cast("bigint"),
        )
        .drop("__n_obs__")
    )


def host_change_stats(url_stats: DataFrame) -> DataFrame:
    """Host-level churn rollup over ``url_change_stats`` output:
    (host, n_urls, mean_change_ratio_e6, n_hot_urls, hot_ratio_e6)
    where a url is HOT when it changed in more than half its observed
    intervals (change_ratio_e6 > 500000). The revisit-priority signal
    a frontier scheduler keys on — and the demotion signal for
    never-changing hosts. Urls whose host cannot be parsed ('') are
    dropped (no host to schedule)."""
    h = url_stats.select(
        url_host(F.col("url")).alias("host"),
        "change_ratio_e6",
        (F.col("change_ratio_e6") > 500_000).cast("int").alias("__hot__"),
    ).where(F.col("host") != "")
    return h.groupBy("host").agg(
        F.count("*").cast("int").alias("n_urls"),
        F.round(F.avg("change_ratio_e6")).cast("bigint").alias("mean_change_ratio_e6"),
        F.sum("__hot__").cast("int").alias("n_hot_urls"),
        F.round(F.sum("__hot__") / F.count("*") * 1_000_000)
        .cast("bigint")
        .alias("hot_ratio_e6"),
    )


def revisit_priority(
    url_stats: DataFrame, *, as_of_date: str, halflife_days: int = 30
) -> DataFrame:
    """Fetch-priority score per url: churn evidence x staleness.

    ``priority_e6 = round(smoothed_change_ratio * staleness_days /
    halflife_days * 1e6)`` where ``smoothed_change_ratio`` is the
    Laplace-smoothed (n_changes+1)/(n_intervals+2) — single-snapshot
    urls get the 0.5 prior rather than a hard 0, so NEW urls are not
    starved — and ``staleness_days`` counts from ``last_date`` to
    ``as_of_date`` (pass the schedule date explicitly: a wall-clock
    default would make the plan nondeterministic, the repo contract).
    Integer-exact: datediff is an int, the smoothed ratio has an exact
    decimal form, and the product is rounded once at e6. Map-side only
    over the url_change_stats output (no further shuffle).
    """
    return url_stats.select(
        "url",
        "n_snapshots",
        "n_changes",
        "last_date",
        _priority_e6(as_of_date, halflife_days),
    )


def _priority_e6(as_of_date: str, halflife_days: int):
    """The revisit-priority column expression over url_change_stats
    columns — shared by revisit_priority and fetch_queue so the two
    can never drift."""
    intervals = F.col("n_snapshots") - 1
    smoothed = (F.col("n_changes") + 1) / (intervals + 2)
    staleness = F.datediff(F.to_date(F.lit(as_of_date)), F.to_date("last_date"))
    return (
        F.round(
            smoothed * F.greatest(staleness, F.lit(0)) / halflife_days * 1_000_000
        )
        .cast("bigint")
        .alias("priority_e6")
    )


# ---------------------------------------------------------------------------
# Sitemap ingestion — the other half of the frontier's seed supply
# (robots.robots_sitemaps harvests the pointers; this parses the files).


def _xml_unescape(c):
    """The five predefined XML entities, innermost-last so '&amp;lt;'
    round-trips to '&lt;' not '<' — identical replace chain in the
    DuckDB oracle."""
    for src, repl in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                      ("&apos;", "'"), ("&amp;", "&")):
        c = F.replace(c, F.lit(src), F.lit(repl))
    return c


# one <url> entry-block pattern and one tag-field pull, shared by the
# entry parser and the media-extension parser — a tolerance fix (CDATA,
# attributes) must land in both or their oracles drift (review finding)
_SITEMAP_URL_BLOCK = r"<url>([\s\S]*?)</url>"


def _sitemap_field(src, tag):
    return F.nullif(
        F.regexp_extract(src, rf"<{tag}>\s*([\s\S]*?)\s*</{tag}>", 1),
        F.lit(""),
    )


def parse_sitemap_entries(
    sitemaps: DataFrame, url_col: str = "sitemap_url", xml_col: str = "xml"
) -> DataFrame:
    """(sitemap_url, xml) -> one row per entry: (sitemap_url, kind,
    loc, lastmod, changefreq, priority_e6).

    ``kind`` is ``index`` for <sitemapindex> files (whose <sitemap>
    entries point at FURTHER sitemaps — the caller fetches and feeds
    them back through) and ``urlset`` for leaf files; ``loc`` is the
    XML-unescaped url (sitemaps legally carry &amp; in query strings),
    lastmod/changefreq verbatim-trimmed, priority e6-scaled (null when
    absent/non-numeric). Entries with no <loc> are dropped — a url-less
    entry schedules nothing.

    Plan shape: one codegen'd projection per file — regexp_extract_all
    over the xml for the entry blocks, per-entry field extracts inside
    ``transform``, one explode. Zero Python, no shuffle, RE2-safe (the
    sitemaps protocol at sitemaps.org caps one file at 50k entries /
    50 MB, so per-row work is bounded); byte-level XML pathologies
    (CDATA, processing instructions) degrade to dropped entries, never
    an error — the frontier can always refetch. DuckDB oracle over the
    identical patterns in tests/test_frontier.py.
    """
    xml = F.coalesce(F.col(xml_col).cast("string"), F.lit(""))
    is_index = xml.rlike(r"<\s*sitemapindex[\s>]")
    kind = F.when(is_index, "index").otherwise("urlset")
    block = F.when(
        is_index, F.regexp_extract_all(xml, F.lit(r"<sitemap>([\s\S]*?)</sitemap>"), F.lit(1))
    ).otherwise(
        F.regexp_extract_all(xml, F.lit(_SITEMAP_URL_BLOCK), F.lit(1))
    )

    field = _sitemap_field

    entries = F.transform(
        block,
        lambda e: F.struct(
            _xml_unescape(field(e, "loc")).alias("loc"),
            field(e, "lastmod").alias("lastmod"),
            field(e, "changefreq").alias("changefreq"),
            F.round(
                # try_cast: a malformed <priority> is a null score, not
                # an ANSI cast error killing the whole fetch batch
                field(e, "priority").try_cast("double") * 1_000_000
            ).cast("bigint").alias("priority_e6"),
        ),
    )
    return (
        sitemaps.select(
            F.col(url_col).alias("sitemap_url"),
            kind.alias("kind"),
            F.explode(entries).alias("e"),
        )
        .where(F.col("e.loc").isNotNull())
        .select(
            "sitemap_url", "kind", F.col("e.loc").alias("loc"),
            F.col("e.lastmod").alias("lastmod"),
            F.col("e.changefreq").alias("changefreq"),
            F.col("e.priority_e6").alias("priority_e6"),
        )
    )


def sitemap_fetch_list(
    entries: DataFrame,
    roots: DataFrame | None = None,
    attempted: DataFrame | None = None,
) -> DataFrame:
    """Sitemap FILES still to fetch — the recursion step of the
    sitemap protocol that :func:`fetch_queue` deliberately excludes
    from the document queue: ``index`` entries name further sitemap
    files (sitemaps.org: a sitemap index must not contain page urls),
    so they feed the SITEMAP fetcher for the next round, not the
    crawler. Returns distinct (sitemap_url) rows = index-entry locs
    not yet fetched. Optional ``roots`` — e.g.
    :func:`fusus_spark.operators.robots.robots_sitemaps` output with
    its ``sitemap_url`` column — adds robots-declared roots that have
    no entries yet, so round 0 starts from the declarations alone.

    "Already fetched" is ``entries.sitemap_url`` (a file we hold
    entries FROM was necessarily fetched) unioned with ``attempted``
    when given — the sitemap fetch layer's own (sitemap_url) log.
    The log is what makes iteration converge: a file that 404'd, was
    empty, or parsed to zero entries (the junk pathologies
    :func:`parse_sitemap_entries` degrades on) contributes no entries
    rows but was still attempted and must not requeue forever.
    Folding the entries side in even when the log is given makes the
    operator robust to an INCOMPLETE log (e.g. entries restored from
    an archive predating the log): a file already parsed never
    requeues regardless of which evidence survives. Urls join
    EXACTLY: both sides must carry the same form (robots_sitemaps
    emits declarations verbatim — run both sides through
    ``canonical_url``, or record the attempted log in the request
    form, before joining).

    Iterating fetch → :func:`parse_sitemap_entries` → this operator
    with the accumulated ``attempted`` log converges: each round's
    output shrinks to empty once every reachable file was tried
    (tested). Plan: per-side distincts + one left_anti equi-join on
    the file url — both crawl-scale, no broadcast assumption, no
    window. DuckDB oracle in tests/test_frontier.py.
    """
    # entries feeds BOTH join sides; checkpoint so Catalyst does not
    # recompute the upstream parse per consumer (exchange-reuse
    # limitation, same as fetch_queue's inputs).
    entries = entries.localCheckpoint()
    children = (
        entries.where(F.col("kind") == "index")
        .select(F.col("loc").alias("sitemap_url"))
    )
    if roots is not None:
        children = children.unionByName(roots.select("sitemap_url"))
    fetched = entries.select("sitemap_url")
    if attempted is not None:
        fetched = fetched.unionByName(attempted.select("sitemap_url"))
    # distinct before the anti-join: up to 50k entry rows per file
    # collapse to one sitemap_url map-side instead of in the shuffle
    return children.distinct().join(
        fetched.distinct(), "sitemap_url", "left_anti"
    )


# ---------------------------------------------------------------------------
# RSS/Atom feeds — the OTHER standard discovery channel next to
# sitemaps: publishers announce NEW content in feeds minutes after
# posting, days before it shows up in a sitemap crawl. Same parsing
# discipline as parse_sitemap_entries: one codegen'd projection per
# feed file, regexp block extraction + per-entry field pulls inside
# ``transform``, RE2-safe so the DuckDB oracle tokenizes identically,
# zero Python, no shuffle. Feeds are small (tens to hundreds of
# entries), so per-row work is bounded.


def _feed_field(e, tag: str):
    """Text content of the first ``<tag ...>text</tag>`` inside an
    entry block ('' -> null). The open tag may carry attributes but
    the tag NAME is delimited (``<link>`` never matches
    ``<linkxyz>``; ``<atom:link>`` is a different byte sequence and
    never matches either)."""
    return F.nullif(
        F.trim(
            F.regexp_extract(
                e, rf"<{tag}(?:\s[^>]*)?>\s*([\s\S]*?)\s*</{tag}>", 1
            )
        ),
        F.lit(""),
    )


def _feed_text(raw):
    """Display text of a feed field: CDATA bodies are literal (strip
    the wrapper, no unescape), everything else gets the XML entity
    fold — mirrored verbatim in the DuckDB oracle."""
    stripped = F.replace(
        F.replace(raw, F.lit("<![CDATA["), F.lit("")), F.lit("]]>"), F.lit("")
    )
    return F.when(raw.contains("<![CDATA["), stripped).otherwise(
        _xml_unescape(raw)
    )


# Atom link href: rel="alternate" wins (attribute order free), else the
# first href of any <link>. XML requires quoted attribute values;
# both quote styles are honored, captures land in group 1/2.
_ATOM_REL_HREF = (
    r"""<link\s[^>]*rel\s*=\s*["']alternate["'][^>]*"""
    r"""href\s*=\s*(?:"([^"]*)"|'([^']*)')"""
)
_ATOM_HREF_REL = (
    r"""<link\s[^>]*href\s*=\s*(?:"([^"]*)"|'([^']*)')"""
    r"""[^>]*rel\s*=\s*["']alternate["']"""
)
_ATOM_ANY_HREF = r"""<link\s[^>]*href\s*=\s*(?:"([^"]*)"|'([^']*)')"""
# RSS guid: group 1 = open-tag attributes, group 2 = text
_GUID_RE = r"<guid([^>]*)>\s*([\s\S]*?)\s*</guid>"
# CDATA sections are DATA, not markup: structural fields (loc/guid/
# dates) extract from a copy with every CDATA section REMOVED, so a
# literal <link>http://evil.com/x</link> inside an earlier element's
# CDATA body can never become the announced url (review finding). A
# feed that wraps its real link in CDATA degrades to a dropped/
# guid-fallback entry — "dropped, never wrong", the module contract.
# Title still reads the RAW block (its CDATA body is the value).
_CDATA_RE = r"<!\[CDATA\[(?s:.*?)\]\]>"
# atom-vs-rss by the ROOT element, anchored: optional BOM, xml decl,
# doctype/comments, then <feed (optionally ns-prefixed). An unanchored
# '<feed' scan misclassified RSS files whose CDATA bodies contain the
# byte sequence (review finding), silently dropping every item.
_ATOM_ROOT_RE = (
    "^\ufeff?" + r"\s*"
    + r"(?:<\?(?s:.*?)\?>\s*)?(?:<!(?s:.*?)>\s*)*"
    + r"<(?:[A-Za-z0-9.-]+:)?feed[\s>]"
)


def _href2(e, pat: str):
    """First non-empty capture of a 2-group quoted-href pattern."""
    return F.coalesce(
        *[F.nullif(F.regexp_extract(e, pat, g), F.lit("")) for g in (1, 2)]
    )


def parse_feed_entries(
    feeds: DataFrame, url_col: str = "feed_url", xml_col: str = "xml"
) -> DataFrame:
    """(feed_url, xml) -> one row per entry: (feed_url, kind, loc,
    published, title, guid).

    ``kind`` is ``atom`` for <feed> documents, ``rss`` otherwise
    (RSS 2.0's <rss><channel><item> and RDF/RSS 1.0's <item> both
    land here). ``loc`` is the announced page url: RSS takes the
    <link> text (XML-unescaped — feeds legally carry &amp; in query
    strings) falling back to a PERMALINK <guid> (isPermaLink
    defaults true per the RSS spec; an explicit false or a
    non-http(s) guid never becomes a url); Atom takes the
    rel="alternate" <link href>, else the first <link href>.
    ``published`` is the verbatim-trimmed date string (RFC 822 in
    RSS pubDate, ISO-8601 in Atom published/updated — parse at the
    consumer; :func:`feed_entries_as_announcements` folds both to
    W3C dates). ``title`` is CDATA-stripped / entity-folded display
    text. Entries with no resolvable loc are dropped — they
    schedule nothing. CDATA sections are DATA for every structural
    field (see ``_CDATA_RE``): markup embedded in a description body
    can neither supply the loc nor flip the dialect. Byte-level XML
    pathologies degrade to dropped entries, never an error: the
    frontier can always refetch.
    """
    xml = F.coalesce(F.col(xml_col).cast("string"), F.lit(""))
    is_atom = xml.rlike(_ATOM_ROOT_RE)
    kind = F.when(is_atom, "atom").otherwise("rss")
    block = F.when(
        is_atom,
        F.regexp_extract_all(xml, F.lit(r"<entry(?:\s[^>]*)?>([\s\S]*?)</entry>"), F.lit(1)),
    ).otherwise(
        F.regexp_extract_all(xml, F.lit(r"<item(?:\s[^>]*)?>([\s\S]*?)</item>"), F.lit(1))
    )

    def entry(raw):
        # structural fields never read CDATA bodies (see _CDATA_RE)
        e = F.regexp_replace(raw, _CDATA_RE, "")
        guid_attrs = F.regexp_extract(e, _GUID_RE, 1)
        guid_text = F.nullif(
            F.trim(F.regexp_extract(e, _GUID_RE, 2)), F.lit("")
        )
        guid_url = F.when(
            ~F.lower(guid_attrs).rlike(r"""ispermalink\s*=\s*["']?false""")
            & _xml_unescape(F.coalesce(guid_text, F.lit(""))).rlike(
                r"^https?://"
            ),
            _xml_unescape(guid_text),
        )
        rss_loc = F.coalesce(_xml_unescape(_feed_field(e, "link")), guid_url)
        atom_loc = F.coalesce(
            _href2(e, _ATOM_REL_HREF),
            _href2(e, _ATOM_HREF_REL),
            _href2(e, _ATOM_ANY_HREF),
        )
        return F.struct(
            F.when(is_atom, _xml_unescape(atom_loc)).otherwise(rss_loc).alias("loc"),
            F.when(
                is_atom,
                F.coalesce(
                    _feed_field(e, "published"), _feed_field(e, "updated")
                ),
            ).otherwise(_feed_field(e, "pubDate")).alias("published"),
            _feed_text(_feed_field(raw, "title")).alias("title"),
            F.coalesce(guid_text, _feed_field(e, "id")).alias("guid"),
        )

    return (
        feeds.select(
            F.col(url_col).alias("feed_url"),
            kind.alias("kind"),
            F.explode(F.transform(block, entry)).alias("e"),
        )
        .where(F.col("e.loc").isNotNull())
        .select(
            "feed_url", "kind", F.col("e.loc").alias("loc"),
            F.col("e.published").alias("published"),
            F.col("e.title").alias("title"),
            F.col("e.guid").alias("guid"),
        )
    )


def feed_entries_as_announcements(entries: DataFrame) -> DataFrame:
    """Feed entries in :func:`parse_sitemap_entries`'s output schema,
    so one ``unionByName`` folds them into :func:`fetch_queue`'s
    sitemap-seed supply AND its ``--announce-boost`` machinery with
    zero new join paths: (sitemap_url=feed_url, kind='urlset', loc,
    lastmod, changefreq=null, priority_e6=null).

    ``lastmod`` is the published date folded to a W3C ``YYYY-MM-DD``
    string — the ONE format the announce gate accepts: ISO-8601
    prefixes pass through, RFC 822 dates ("Mon, 02 Jan 2026 ...")
    are re-assembled day-by-month-name and parsed with an explicit
    format (both branches regexp-gated so the DuckDB oracle is
    byte-identical; month names are the RFC 822 English tokens in
    both engines). Unparseable dates become null lastmod — the entry
    still seeds the queue, it just announces nothing.
    """
    iso = F.when(
        F.col("published").rlike(r"^\d{4}-\d{2}-\d{2}([Tt ].*)?$"),
        F.substring("published", 1, 10),
    )
    # RFC 822: "[Mon, ]02 Jan 2026 03:04:05 GMT" — pull d/MMM/yyyy,
    # zero-pad the day, parse "dd MMM yyyy"
    d = F.regexp_extract("published", r"(?:^|,\s*)(\d{1,2}) ([A-Z][a-z]{2}) (\d{4})", 1)
    mon = F.regexp_extract("published", r"(?:^|,\s*)(\d{1,2}) ([A-Z][a-z]{2}) (\d{4})", 2)
    yr = F.regexp_extract("published", r"(?:^|,\s*)(\d{1,2}) ([A-Z][a-z]{2}) (\d{4})", 3)
    rfc = F.when(
        yr != "",
        F.date_format(
            F.try_to_date(
                F.concat_ws(" ", F.lpad(d, 2, "0"), mon, yr), "dd MMM yyyy"
            ),
            "yyyy-MM-dd",
        ),
    )
    return entries.select(
        F.col("feed_url").alias("sitemap_url"),
        F.lit("urlset").alias("kind"),
        "loc",
        F.coalesce(iso, rfc).alias("lastmod"),
        F.lit(None).cast("string").alias("changefreq"),
        F.lit(None).cast("bigint").alias("priority_e6"),
    )


def fetch_queue(
    url_stats: DataFrame,
    sitemap_entries: DataFrame,
    *,
    as_of_date: str,
    halflife_days: int = 30,
    default_seed_e6: int = 500_000,
    redirects: DataFrame | None = None,
    links: DataFrame | None = None,
    link_step_e6: int = 10_000,
    link_cap_e6: int = 990_000,
    failures: DataFrame | None = None,
    max_consecutive_fails: int = 3,
    announce_boost_e6: int | None = None,
) -> DataFrame:
    """The unified fetch queue: every url the crawler should consider
    this cycle, scored. (url, source, priority_e6, last_hash).

    Up to four supplies merge:

    * ``revisit`` — urls with snapshot history (``url_change_stats``
      output), scored by :func:`revisit_priority` (Laplace-smoothed
      churn x staleness). ``last_hash`` carries the stored validator
      (content hash or etag, whichever fed url_change_stats) so the
      fetcher can issue a conditional GET (If-None-Match).
    * ``seed`` — urls discovered in sitemaps (:func:`
      parse_sitemap_entries` output, ``urlset`` rows only — ``index``
      rows name further sitemap FILES, not content) that have never
      been crawled. Scored by the publisher's ``<priority>`` (max
      across sitemaps when a url appears in several), defaulting to
      0.5 — the sitemaps.org protocol default — when absent.
      ``last_hash`` is null: nothing to validate against.
    * ``redirect`` (optional, when ``redirects`` — a
      :func:`fusus_spark.operators.webgraph.resolve_redirects` frame —
      is given) — TERMINAL chain endpoints that were never crawled:
      the archive proves the content moved there, so the target is
      known-missing, not merely hinted. Scored ``default_seed_e6``
      (the neutral default; the ``source`` column lets policy rank
      supplies downstream). Non-terminal endpoints (cycles, over-cap
      chains) are never queued — fetching a cycle member buys nothing.
    * ``link`` (optional, when ``links`` — a :func:`fusus_spark.
      operators.webgraph.resolve_links` frame — is given) — urls
      DISCOVERED as outlinks of crawled pages but never themselves
      crawled: the crawl loop's own discovery channel, and the only
      supply that grows the frontier beyond what publishers or
      redirects announce. Scored by linking evidence:
      ``default_seed_e6 + link_step_e6 * (distinct linking hosts - 1)``
      capped at ``link_cap_e6`` — more independent hosts pointing at
      an uncrawled url is more evidence it matters (in-degree
      seeding, the crawl-ordering baseline of Cho et al. 1998),
      while the cap keeps any hint supply below a genuinely stale
      churner's revisit score. Null ``resolved`` rows (unresolvable
      hrefs) are ignored. When ``redirects`` is also given, link
      targets are first collapsed through the terminal chains
      (:func:`~fusus_spark.operators.webgraph.follow_redirects`) and
      any url the archive knows to be a redirect SOURCE is dropped —
      otherwise every 301 shell the corpus links to gets queued as a
      "discovered" url the archive already proved serves no content,
      and the serving url's host-count evidence splits across its
      aliases.

    A url present in several supplies appears ONCE, strongest evidence
    wins: history beats sitemap hint beats redirect inference beats
    link discovery (seeds are anti-joined against the history;
    redirect targets against both; link targets against all three).

    ``announce_boost_e6`` (optional) turns the sitemap ``<lastmod>``
    into a CHANGE ANNOUNCEMENT for urls the crawler already holds: a
    revisit row whose max announced lastmod DATE (the sitemaps.org
    W3C set: YYYY / YYYY-MM / YYYY-MM-DD with an optional time part,
    partials folded to the first day of the period; junk — including
    non-zero-padded dates — is null) is strictly
    newer than its ``last_date`` snapshot gets ``priority_e6 =
    greatest(priority_e6, announce_boost_e6)`` — the publisher says
    the page changed since we last saw it, which is stronger evidence
    than any churn model, while ``greatest`` keeps genuinely hotter
    urls above the floor. Only revisit rows are affected (a lastmod
    for a never-crawled url adds nothing beyond its seed priority —
    there is no stored copy to invalidate), and a lastmod OLDER than
    the last crawl is silently inert (already observed). Off by
    default; the publisher-honesty tradeoff (spammy always-now
    lastmods) is policy — cap abuse upstream by dropping lastmod from
    untrusted hosts before this operator.

    ``failures`` (optional, a :func:`url_failure_stats` frame) demotes
    DEAD urls: any url with ``n_consecutive_fails >=
    max_consecutive_fails`` is dropped from EVERY supply by one final
    left_anti equi-join — without it a url that started 404ing stays
    queued forever at ever-growing staleness priority, burning a fetch
    per cycle on a gone page. The failure-stats table itself is the
    audit trail of what was demoted (flag-don't-drop lives there, not
    in the queue).

    Plan shape: one groupBy(loc) over the sitemap entries + one
    distinct-host groupBy(url) over the links + left_anti equi-joins
    on url — hash-partitioned, no broadcast assumption (at crawl scale
    BOTH sides are billions of rows) — and a map-side union with the
    revisit projection. With ``announce_boost_e6``, one more
    groupBy(loc) + one left equi-join on url against the revisit
    projection (same scale discipline). No window, no all-pairs.
    DuckDB oracle in tests/test_frontier.py.
    """
    # url_stats feeds BOTH branches (revisit projection + anti-join
    # right side) and Catalyst does not reuse exchanges across
    # self-join sides (repo gotcha; the two consumers prune different
    # columns) — snapshot it so the crawl-scale churn window+groupBy
    # pipeline computes once. Eager localCheckpoint per the dedup-LSH
    # convention; executor loss recomputes, acceptable for one cycle's
    # queue build.
    url_stats = url_stats.localCheckpoint()
    if announce_boost_e6 is not None:
        # the announcement branch adds a THIRD consumer of the entries
        # frame (seeds groupBy, urlset locs, announced groupBy) — same
        # exchange-reuse gotcha as url_stats above
        sitemap_entries = sitemap_entries.localCheckpoint()
    revisit = url_stats.select(
        "url",
        F.lit("revisit").alias("source"),
        _priority_e6(as_of_date, halflife_days),
        "last_hash",
        "last_date",
    )
    if announce_boost_e6 is not None:
        announced = (
            sitemap_entries.where(
                (F.col("kind") == "urlset") & F.col("lastmod").isNotNull()
            )
            .select(
                F.col("loc").alias("url"),
                # W3C datetime per sitemaps.org: full dates (with an
                # optional time part) plus the YYYY / YYYY-MM partial
                # granularities, folded to the first day of the period
                # (pad then re-truncate); anything else is junk ->
                # null. The regexp gate keeps Spark and the DuckDB
                # oracle byte-identical — Spark's bare try_to_date
                # accepts forms ('2026-1-5') DuckDB's DATE cast won't.
                F.when(
                    F.col("lastmod").rlike(
                        r"^\d{4}(-\d{2})?$|^\d{4}-\d{2}-\d{2}([Tt ].*)?$"
                    ),
                    F.try_to_date(
                        F.substring(
                            F.concat(
                                F.substring("lastmod", 1, 10),
                                F.lit("-01-01"),
                            ),
                            1,
                            10,
                        )
                    ),
                ).alias("__lm__"),
            )
            .where(F.col("__lm__").isNotNull())
            .groupBy("url")
            .agg(F.max("__lm__").alias("__announced__"))
        )
        revisit = (
            revisit.join(announced, "url", "left")
            .withColumn(
                "priority_e6",
                F.when(
                    F.col("__announced__") > F.to_date("last_date"),
                    F.greatest(
                        "priority_e6",
                        F.lit(announce_boost_e6).cast("bigint"),
                    ),
                ).otherwise(F.col("priority_e6")),
            )
            .drop("__announced__")
        )
    revisit = revisit.select("url", "source", "priority_e6", "last_hash")
    seeds = (
        sitemap_entries.where(F.col("kind") == "urlset")
        .groupBy(F.col("loc").alias("url"))
        .agg(
            F.max(F.coalesce("priority_e6", F.lit(default_seed_e6)))
            .cast("bigint")
            .alias("priority_e6")
        )
        .join(url_stats.select("url"), "url", "left_anti")
        .select(
            "url",
            F.lit("seed").alias("source"),
            "priority_e6",
            F.lit(None).cast("string").alias("last_hash"),
        )
    )
    queue = revisit.unionByName(seeds)
    # raw urlset locs, not the seeds subplan: same exclusion, no
    # recompute of the seed groupBy+anti-join. With a third/fourth
    # supply the locs subtree gains a second consumer — snapshot it
    # (exchange-reuse gotcha, same contract as url_stats above); ditto
    # redirects, which the link branch reads three ways.
    urlset_locs = sitemap_entries.where(F.col("kind") == "urlset").select(
        F.col("loc").alias("url")
    )
    if redirects is not None and links is not None:
        if announce_boost_e6 is None:
            # skip when the entries frame itself is already
            # checkpointed above — locs is a cheap projection of it
            urlset_locs = urlset_locs.localCheckpoint()
        redirects = redirects.localCheckpoint()
    terminal_targets = (
        redirects.where(F.col("terminal")).select(
            F.col("final_url").alias("url")
        )
        if redirects is not None
        else None
    )
    if terminal_targets is not None:
        targets = (
            terminal_targets.distinct()
            .join(url_stats.select("url"), "url", "left_anti")
            .join(urlset_locs, "url", "left_anti")
            .select(
                "url",
                F.lit("redirect").alias("source"),
                F.lit(default_seed_e6).cast("bigint").alias("priority_e6"),
                F.lit(None).cast("string").alias("last_hash"),
            )
        )
        queue = queue.unionByName(targets)
    if links is not None:
        links = links.where(F.col("resolved").isNotNull())
        if redirects is not None:
            from fusus_spark.operators.webgraph import follow_redirects

            # collapse link targets onto serving urls; whatever still
            # names a known redirect source afterwards is a cycle /
            # over-cap shell — fetching it buys nothing (the same
            # reasoning that keeps non-terminal endpoints out of the
            # redirect supply)
            links = follow_redirects(links, redirects).join(
                redirects.select("url").withColumnRenamed("url", "resolved"),
                "resolved",
                "left_anti",
            )
        discovered = (
            links.select(
                F.col("resolved").alias("url"),
                url_host(F.col("src_url")).alias("src_host"),
            )
            .groupBy("url")
            .agg(F.count_distinct("src_host").alias("n_hosts"))
            .join(url_stats.select("url"), "url", "left_anti")
            .join(urlset_locs, "url", "left_anti")
        )
        if terminal_targets is not None:
            discovered = discovered.join(terminal_targets, "url", "left_anti")
        discovered = discovered.select(
            "url",
            F.lit("link").alias("source"),
            F.least(
                F.lit(link_cap_e6).cast("bigint"),
                F.lit(default_seed_e6)
                + F.lit(link_step_e6) * (F.col("n_hosts") - 1),
            )
            .cast("bigint")
            .alias("priority_e6"),
            F.lit(None).cast("string").alias("last_hash"),
        )
        queue = queue.unionByName(discovered)
    if failures is not None:
        dead = failures.where(
            F.col("n_consecutive_fails") >= max_consecutive_fails
        ).select("url")
        queue = queue.join(dead, "url", "left_anti")
    return queue


def url_failure_stats(fetch_log: DataFrame) -> DataFrame:
    """Per-url failure evidence from the accumulated fetch log
    ((url, crawl_date, http_status) rows across cycles): (url,
    n_consecutive_fails, last_status, last_date). A fetch SUCCEEDS
    when it observes content — status 200 or 304 (a 304 proves the
    url alive); everything else (3xx/4xx/5xx) fails.
    ``n_consecutive_fails`` counts failures STRICTLY AFTER the last
    success (0 for a url whose latest fetch succeeded) — the signal
    dead-url demotion keys on: one transient 503 in a sea of 200s
    must not demote, N failures since the last success must.

    Plan shape: ONE per-url unbounded window (max of success dates —
    no ordering, no row_number) + one groupBy on the SAME key, so the
    second agg reuses the window's hash partitioning: one shuffle
    total. Deterministic last_status via max-of-struct with the
    (crawl_date, http_status) tie-break. DuckDB oracle in
    tests/test_frontier.py.
    """
    success = F.col("http_status").isin(200, 304)
    w = Window.partitionBy("url")
    marked = fetch_log.withColumn(
        "__last_ok__", F.max(F.when(success, F.col("crawl_date"))).over(w)
    )
    return marked.groupBy("url").agg(
        F.sum(
            F.when(
                ~success
                & (
                    F.col("__last_ok__").isNull()
                    | (F.col("crawl_date") > F.col("__last_ok__"))
                ),
                1,
            ).otherwise(0)
        )
        .cast("int")
        .alias("n_consecutive_fails"),
        F.max(F.struct("crawl_date", "http_status"))["http_status"]
        .cast("int")
        .alias("last_status"),
        F.max("crawl_date").alias("last_date"),
    )


def extend_snapshots(
    snaps: DataFrame,
    fetches: DataFrame,
    *,
    crawl_date: str,
    hash_col: str = "content_hash",
) -> DataFrame:
    """Fold one crawl cycle's fetch results back into the snapshot
    history — the RETURN path of the conditional-GET loop that
    :func:`fetch_queue` opens by emitting ``last_hash`` validators.
    Returns the NEW (url, content_hash, crawl_date) rows to append to
    the store :func:`url_change_stats` reads:

    * ``http_status == 200`` with a non-null hash — a fresh
      observation: the body's hash, stamped ``crawl_date``.
    * ``http_status == 304`` — the origin asserts Not Modified: the
      url's LATEST prior hash is carried forward under the new date.
      Without this row the saved fetch would look like a missed
      observation and :func:`url_change_stats` would under-count the
      url's stability — a 304 is exactly one "no change" sample, and
      recording it as such is what makes conditional GETs free instead
      of evidence-destroying. "Latest prior" skips null values (with a
      validator ``hash_col`` a null is "server omitted it on that
      fetch", per url_change_stats) — the 304 confirms the validator
      the store actually ISSUED. A 304 for a url with NO observed
      prior (a validator the store never issued) is dropped: there is
      nothing to confirm.
    * anything else (3xx/4xx/5xx, hashless 200s) — no content was
      observed; no snapshot row. Fetch-level bookkeeping (retry
      budgets, dead-url demotion) is policy above this operator.

    A url appearing with both a 200 and a 304 in one cycle yields two
    rows; ``url_change_stats``'s deterministic (crawl_date, hash)
    tie-break already absorbs duplicate-date rows (tested).

    Plan shape: ONE groupBy(url) max-of-struct for the latest prior
    hash (same (crawl_date, hash) ordering as url_change_stats — and
    agg-only per the cluster_representatives convention: a per-url
    window would straggle on exactly the hottest urls) + one inner
    equi-join on url for the 304s + a map-side union with the 200
    projection. Hash-partitioned on url throughout, no broadcast
    assumption, no window. DuckDB oracle in tests/test_frontier.py.
    """
    # latest OBSERVED value only (same null-skipping max-of-struct as
    # url_change_stats' last_hash): with a validator column a null at
    # the newest date is "server omitted it", not "no prior" — the 304
    # confirms the validator the store actually ISSUED
    latest = (
        snaps.groupBy("url")
        .agg(
            F.max(
                F.when(
                    F.col(hash_col).isNotNull(),
                    F.struct("crawl_date", hash_col),
                )
            ).alias("m")
        )
        .select("url", F.col(f"m.{hash_col}").alias("__prior__"))
        .where(F.col("__prior__").isNotNull())
    )
    fresh = fetches.where(
        (F.col("http_status") == 200) & F.col(hash_col).isNotNull()
    ).select("url", hash_col, F.lit(crawl_date).alias("crawl_date"))
    confirmed = (
        fetches.where(F.col("http_status") == 304)
        .select("url")
        .distinct()
        .join(latest, "url")
        .select(
            "url",
            F.col("__prior__").alias(hash_col),
            F.lit(crawl_date).alias("crawl_date"),
        )
    )
    return fresh.unionByName(confirmed)


def host_budgets_from_delays(
    delays: DataFrame, *, cycle_seconds: int, k_per_host: int
) -> DataFrame:
    """(host, crawl_delay_ms) — :func:`fusus_spark.operators.robots.
    robots_crawl_delays` output — to the per-host fetch budgets one
    cycle can spend while honoring each host's declared spacing:
    ``k = min(k_per_host, cycle_seconds*1000 div crawl_delay_ms)``.
    A delay longer than the cycle yields k=0 — the host is skipped
    this cycle rather than fetched at a spacing it forbade (the
    publisher chose starvation; honoring it is the point). Integer
    arithmetic throughout, pure projection, zero shuffle."""
    return delays.select(
        "host",
        F.least(
            F.lit(k_per_host).cast("bigint"),
            F.floor(
                F.lit(int(cycle_seconds) * 1000)
                / F.greatest(F.col("crawl_delay_ms"), F.lit(1))
            ),
        )
        .cast("int")
        .alias("k"),
    )


def schedule_fetches(
    queue: DataFrame, *, k_per_host: int,
    host_budgets: DataFrame | None = None,
    by: str = "host",
) -> DataFrame:
    """Politeness cap over the fetch queue: keep the top ``k_per_host``
    urls per host by priority. A crawler is rate-limited PER HOST
    (robots crawl-delay, connection budgets), so the binding constraint
    on one cycle's queue is per-host depth, not a global budget — a
    global top-N would let one giant host starve every small one.

    Optional ``host_budgets`` (host, k) — e.g.
    :func:`host_budgets_from_delays` over harvested Crawl-delays —
    OVERRIDES the default depth per listed host (k=0 skips the host
    this cycle); unlisted hosts keep ``k_per_host``. Duplicate budget
    rows for a host (a robots store re-fetched across cycles) fold to
    the conservative MIN before the join — a join fan-out here would
    duplicate schedule rows and defeat the politeness cap it
    implements. One groupBy + one left equi-join on host, no broadcast
    assumption (at crawl scale the budget table is one row per
    opting-in host — large).

    ``by='domain'`` ranks within the PSL REGISTRABLE DOMAIN instead of
    the host (``a.x.com`` and ``b.x.com`` usually share servers and
    rate limits; a crawler polite per-host can still hammer one
    origin through its subdomains — the wildcard-subdomain spam
    pattern). Hosts that ARE a public suffix (or dotless) fall back to
    their own host as the group. ``host_budgets`` keys — robots
    budgets are naturally HOST-keyed — are folded through the SAME
    domain expression before the min-agg, so a Crawl-delay declared
    on any subdomain caps its whole domain group (the conservative
    read; a silent key mismatch here would bypass the politeness the
    budgets exist for). ``rank_in_host`` reads as rank within the
    politeness GROUP (name kept for schema stability).

    Deterministic: ties broken by url. Urls whose host cannot be
    parsed are dropped (nothing to rate-limit against — and nothing to
    fetch). Plan shape: one per-group window row_number (partitioned
    by host or registrable domain — NEVER a single global partition;
    hot groups bound the straggler at k reads each, acceptable because
    the window input is one row per QUEUED url, already capped
    upstream by the frontier's own scoring; the domain itself is pure
    InSet expressions, no extra shuffle). DuckDB oracle in
    tests/test_frontier.py.
    """
    if by not in ("host", "domain"):
        raise ValueError(f"by must be 'host' or 'domain', got {by!r}")
    ranked = queue.withColumn("host", url_host(F.col("url"))).where(
        F.col("host") != ""
    )
    if by == "domain":
        from fusus_spark.functions.psl import registrable_domain

        dom = registrable_domain(F.col("host"))
        key = F.when(dom != "", dom).otherwise(F.col("host"))
    else:
        key = F.col("host")
    ranked = ranked.withColumn("__pk__", key)
    w = Window.partitionBy("__pk__").orderBy(
        F.col("priority_e6").desc(), "url"
    )
    ranked = ranked.withColumn(
        "rank_in_host", F.row_number().over(w).cast("int")
    )
    if host_budgets is None:
        ranked = ranked.where(F.col("rank_in_host") <= k_per_host)
    else:
        if by == "domain":
            # fold the (host-keyed) budgets through the SAME key
            # expression; min-agg makes any subdomain's declared
            # budget bind its whole group
            bdom = registrable_domain(F.col("host"))
            bkey = F.when(bdom != "", bdom).otherwise(F.col("host"))
        else:
            bkey = F.col("host")
        b = host_budgets.groupBy(bkey.alias("__bh__")).agg(
            F.min("k").alias("__bk__")
        )
        ranked = (
            ranked.join(b, ranked["__pk__"] == b["__bh__"], "left")
            .where(
                F.col("rank_in_host")
                <= F.coalesce("__bk__", F.lit(k_per_host))
            )
            .drop("__bh__", "__bk__")
        )
    return ranked.select(
        "host", "url", "source", "priority_e6", "last_hash", "rank_in_host"
    )


def parse_sitemap_media(
    sitemaps: DataFrame, url_col: str = "sitemap_url", xml_col: str = "xml"
) -> DataFrame:
    """Google sitemap media extensions: (sitemap_url, page_loc,
    media_kind, media_loc, thumbnail_loc, title, caption,
    duration_s) — one row per ``<image:image>`` / ``<video:video>``
    declaration inside a urlset entry. The image extension is how
    publishers announce gallery/CDN images that never appear in
    crawlable markup; the video extension carries the content/player
    url plus the human-written title and description — supply-side
    rows for the image-text / video-text pair corpus (join
    media_loc against the fetch frontier, pair title/caption as the
    text half; the markup-side analogs are multimodal.
    image_text_pairs / media_refs).

    ``media_loc`` is content_loc for videos (player_loc the
    fallback); ``caption`` is image:caption / video:description;
    ``duration_s`` is the declared seconds (try_cast — malformed
    never errors). All text fields are XML-unescaped + trimmed; rows
    without a media loc are dropped. The literal ``image:`` /
    ``video:`` prefixes are matched — the namespace prefix is
    technically declarable as anything, but the extension spec's own
    examples fix these spellings and real sitemaps follow them
    (documented signal grade).

    Plan: one projection + two Generates (url-entry explode, media
    explode) — map-side, zero shuffle, zero Python; DuckDB mirror in
    tests/test_frontier.py (beyond-cap contract); plan_audit pins
    Generate + Exchange==1 + no python stage.
    """
    xml = F.coalesce(F.col(xml_col).cast("string"), F.lit(""))
    blocks = F.regexp_extract_all(xml, F.lit(_SITEMAP_URL_BLOCK), F.lit(1))
    entries = sitemaps.select(
        F.col(url_col).alias("sitemap_url"),
        F.explode(blocks).alias("entry"),
    )
    e = F.col("entry")
    field = _sitemap_field

    page_loc = _xml_unescape(field(e, "loc"))
    imgs = F.regexp_extract_all(
        e, F.lit(r"<image:image>([\s\S]*?)</image:image>"), F.lit(1)
    )
    vids = F.regexp_extract_all(
        e, F.lit(r"<video:video>([\s\S]*?)</video:video>"), F.lit(1)
    )
    ns = F.lit(None).cast("string")

    def rec(kind, loc, thumb, title, caption, duration):
        return F.struct(
            F.lit(kind).alias("media_kind"),
            loc.alias("media_loc"),
            thumb.alias("thumbnail_loc"),
            title.alias("title"),
            caption.alias("caption"),
            duration.alias("duration_s"),
        )

    media = F.filter(
        F.concat(
            F.transform(
                imgs,
                lambda m: rec(
                    "image",
                    _xml_unescape(field(m, "image:loc")),
                    ns,
                    _xml_unescape(field(m, "image:title")),
                    _xml_unescape(field(m, "image:caption")),
                    F.lit(None).cast("int"),
                ),
            ),
            F.transform(
                vids,
                lambda m: rec(
                    "video",
                    F.coalesce(
                        _xml_unescape(field(m, "video:content_loc")),
                        _xml_unescape(field(m, "video:player_loc")),
                    ),
                    _xml_unescape(field(m, "video:thumbnail_loc")),
                    _xml_unescape(field(m, "video:title")),
                    _xml_unescape(field(m, "video:description")),
                    field(m, "video:duration").try_cast("int"),
                ),
            ),
        ),
        lambda x: x["media_loc"].isNotNull(),
    )
    return (
        entries.select(
            "sitemap_url",
            page_loc.alias("page_loc"),
            F.explode(media).alias("m"),
        )
        .where(F.col("page_loc").isNotNull())
        .select(
            "sitemap_url",
            "page_loc",
            F.col("m.media_kind").alias("media_kind"),
            F.col("m.media_loc").alias("media_loc"),
            F.col("m.thumbnail_loc").alias("thumbnail_loc"),
            F.col("m.title").alias("title"),
            F.col("m.caption").alias("caption"),
            F.col("m.duration_s").alias("duration_s"),
        )
    )
