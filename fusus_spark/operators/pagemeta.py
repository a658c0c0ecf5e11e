"""Page-level metadata: the document's self-description from its head.

The extraction pipeline deliberately prunes ``<head>`` as chrome (the
body is the payload — extraction/boilerplate.py PRUNE_TAGS), but the
head carries the columns a corpus needs for grouping, display and
citation: the ``<title>``, the meta description, the Open Graph card
(og:title/og:description/og:image/...), article timestamps
(``article:published_time``), the declared JSON-LD type/headline, the
``rel=next``/``rel=prev`` pagination hints, and the ``hreflang``
language-alternate cluster. This module recovers them WITHOUT a DOM
parse: the same design as robots.robots_signals / webgraph.
extract_links — linear codegen'd regexp scans over the raw html cast,
RE2-safe patterns (no lookarounds/backrefs) so a DuckDB oracle
tokenizes identically, one projection per row, zero Python, zero
shuffle. Keyword case-insensitivity is spelled as explicit ASCII case
classes (house style — ``(?i)`` folds Unicode differently in RE2 vs
Java, e.g. the Kelvin sign), so attribute VALUES keep their original
bytes.

Scale shape: ``page_metadata`` is a pure projection (pipelines into
whatever scan feeds it, no exchange); ``hreflang_alternates`` is a
projection + one Generate (explode over the matched link tags), still
shuffle-free. At 10^12 rows both are map-side only.

Reference role analog: the reference harvests per-page self-
description the same way — getToc piece extraction and the per-page
metadata fields of fusus/book.py — as side tables next to the
extracted text, never inside it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from fusus_spark.operators.robots import _FILLER, _HREF_VAL, _first_group


def _ci(word: str) -> str:
    """ASCII case-class spelling of a literal keyword: ``og:title`` ->
    ``[oO][gG]:[tT]...``. Digits pass through; every other non-alpha
    char is backslash-escaped (punctuation escapes are literal in both
    Java regex and RE2 — an unescaped ``.`` would silently become a
    wildcard)."""
    out = []
    for ch in word:
        if ch.isalpha():
            out.append(f"[{ch}{ch.upper()}]")
        elif ch.isdigit():
            out.append(ch)
        else:
            out.append("\\" + ch)
    return "".join(out)


def _attr3(attr_name: str) -> str:
    """attr="..." value in the 3-way quoting form (quoted / single /
    unquoted), captures in groups 1-3 (the _first_group contract);
    anchored by the caller. THE quoting grammar — every value pull in
    this module and multimodal delegates here so the Spark and DuckDB
    pattern pairs can never drift apart."""
    return (
        _ci(attr_name)
        + r"""\s*=\s*(?:"([^"<>]*)"|'([^'<>]*)'|([^\s"'<>]+))"""
    )


# content= value on ORIGINAL bytes (robots' _CONTENT_VAL runs on a
# lowered copy; metadata values keep their case). Matched inside a tag
# REGION, not the whole document (see _tag_regions below).
_CONTENT_VAL_CI = _attr3("content")
# a tag region: from '<meta '/'<link ' up to (not including) the
# unquoted '>' that closes the tag — _FILLER walks quoted values but
# cannot cross into the next tag or a text node.
_META_TAG_RE = "<" + _ci("meta") + r"\s" + _FILLER
_LINK_TAG_RE = "<" + _ci("link") + r"\s" + _FILLER

# in-region attribute anchor: the tag prefix, then optionally
# filler ENDING IN a delimiter. Two containment rules fall out:
# the attribute name must sit at the tag start or right after
# [\s/] (so data-name=... / a quoted value's ...name=... never
# match — _FILLER walks quoted values ATOMICALLY, a quote char is
# reachable only as part of a whole quoted unit, never as the
# delimiter), and a match can never begin inside another
# attribute's quoted value. The naive unanchored region search
# lost exactly this (caught in review: content= inside a
# data-attr's quoted value, hreflang= inside a quoted href's
# query string).
_IN_REGION = r"^<[a-zA-Z]+\s(?:" + _FILLER + r"[\s/])?"


def _attr_in_region(attr: str, value: str) -> str:
    """``attr="value"`` in any quoting form, anchored INSIDE a tag
    region (see ``_IN_REGION``); the unquoted form is right-delimited
    so ``name=descriptionx`` never matches (``[\\s/]`` mid-region,
    end-of-region when the attribute closes the tag — regions carry
    no trailing '>')."""
    v = _ci(value)
    return (
        _IN_REGION + _ci(attr) + r"\s*=\s*(?:\"" + v + r"\"|'" + v + r"'|" + v
        + r"(?:[\s/]|$))"
    )


def _first_region(tags: Column, attr: str, value: str) -> Column:
    """The first tag region carrying ``attr="value"`` (null when
    none). A higher-order filter over the pre-extracted region array —
    the document was scanned ONCE for all tags of the family; each
    field then pays one small-pattern pass over tag-sized strings
    instead of a full-document scan per field. (The lambda is a
    closure factory per the repo's F.transform gotcha; ArrayFilter is
    CodegenFallback, which keeps each field's generated code tiny —
    the naive 16-field whole-document design overflowed the JVM's
    64 KB method limit and dropped the whole stage to interpreted.)"""
    pat = _attr_in_region(attr, value)

    def pred(tag: Column) -> Column:
        return tag.rlike(pat)

    return F.get(F.filter(tags, pred), 0)


def _meta_content(metas: Column, attr: str, name: str) -> Column:
    """The content of the first ``<meta attr="name" content="...">``
    (attribute order free — region matching does not care which comes
    first). The value pull is ``_IN_REGION``-anchored too, so a
    ``content=`` inside another attribute's quoted value is never the
    extracted value."""
    return _first_group(
        _first_region(metas, attr, name), _IN_REGION + _CONTENT_VAL_CI
    )


def _og(metas: Column, name: str) -> Column:
    """Open Graph value: ``property=`` is the spec spelling, ``name=``
    the common-in-the-wild variant — property wins even when the
    name= tag appears earlier in the document."""
    return F.coalesce(
        _meta_content(metas, "property", name),
        _meta_content(metas, "name", name),
    )


def _rel_link_href(links: Column, rel: str) -> Column:
    """``href`` of the first ``<link rel="<rel>" href="...">``."""
    return _first_group(
        _first_region(links, "rel", rel), _IN_REGION + _HREF_VAL
    )


# <title> text: tag-name delimited (no '<titlearea'), text up to the
# first '<' (the closing tag; entity refs survive into the capture and
# are folded by _entity_lite).
_TITLE_RE = "<" + _ci("title") + r"(?:[\s/][^>]*)?>([^<]*)"

# first <script type="application/ld+json"> block: the type value in
# any quoting form (the unquoted form may sit against the closing '>'),
# then a scoped-dotall non-greedy capture up to the closing tag.
_LDJ = r"application/ld\+json"
_LDJSON_BLOCK = (
    "<" + _ci("script") + r"\s" + _FILLER + _ci("type") + r"\s*=\s*"
    + '(?:"' + _LDJ + '"' + _FILLER + "|'" + _LDJ + "'" + _FILLER
    + "|" + _LDJ + r"(?:[\s/]" + _FILLER + r")?)>((?s:.*?))</" + _ci("script")
)
# JSON string fields inside the block. First simple-string value wins;
# an array @type or an escaped quote inside the value cuts the match —
# documented signal-grade fidelity, not a JSON parser.
_JSON_TYPE_RE = r'"@type"\s*:\s*"([^"]*)"'
_JSON_HEADLINE_RE = r'"headline"\s*:\s*"([^"]*)"'
_JSON_DATE_RE = r'"datePublished"\s*:\s*"([^"]*)"'


def _extract1(col: Column, pat: str) -> Column:
    """Group-1 extract, null when absent/empty ('' means absent,
    module-wide)."""
    return F.nullif(F.regexp_extract(col, pat, 1), F.lit(""))


def _entity_lite(col: Column) -> Column:
    """Fold the six entity references that dominate real titles/
    descriptions (&lt; &gt; &quot; &#39; &nbsp; &amp;) — &amp; LAST so
    double-escapes decode one level, the correct reading. Full entity
    handling lives in the extraction pipeline (domparse); this is the
    signal-column approximation, JVM-only so the DuckDB oracle can
    mirror it with the same replace chain."""
    c = F.replace(col, F.lit("&lt;"), F.lit("<"))
    c = F.replace(c, F.lit("&gt;"), F.lit(">"))
    c = F.replace(c, F.lit("&quot;"), F.lit('"'))
    c = F.replace(c, F.lit("&#39;"), F.lit("'"))
    c = F.replace(c, F.lit("&nbsp;"), F.lit(" "))
    return F.replace(c, F.lit("&amp;"), F.lit("&"))


def _clean_text(col: Column) -> Column:
    """Entity-lite fold + whitespace collapse + trim (explicit ws
    class — Java \\s and RE2 \\s disagree on vertical tab), nulled
    when the result is empty."""
    c = F.regexp_replace(_entity_lite(col), r"[ \t\r\n\f]+", " ")
    return F.nullif(F.trim(c), F.lit(""))


def page_metadata(
    docs: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, title, meta_description, og_title, og_description,
    og_image, og_url, og_type, og_site_name, published_time,
    modified_time, jsonld_type, jsonld_headline, jsonld_date,
    rel_next, rel_prev) — one codegen'd projection per document, every
    field null when the page does not declare it.

    ``title`` and the two description fields are entity-lite-folded
    and whitespace-collapsed (display-grade text); url-valued fields
    (og_image, og_url, rel_next, rel_prev) keep their original bytes —
    resolve them like any harvested href (webgraph.resolve_links, then
    functions.url.canonical_url) before joining. ``published_time`` /
    ``modified_time`` are the raw declared strings (usually ISO-8601;
    parse at the consumer, a bad date must not null out the row).

    Cost shape: FOUR full-document scans (meta-tag harvest, link-tag
    harvest, title, ldjson block) no matter how many fields; all
    per-field matching runs over the tag-sized region arrays.
    """
    orig = F.col(html_col).cast("string")
    metas = F.regexp_extract_all(orig, F.lit(_META_TAG_RE), F.lit(0))
    links = F.regexp_extract_all(orig, F.lit(_LINK_TAG_RE), F.lit(0))
    ldjson = F.regexp_extract(orig, _LDJSON_BLOCK, 1)
    return docs.select(
        F.col(url_col).alias("url"),
        _clean_text(_extract1(orig, _TITLE_RE)).alias("title"),
        _clean_text(_meta_content(metas, "name", "description")).alias(
            "meta_description"
        ),
        _clean_text(_og(metas, "og:title")).alias("og_title"),
        _clean_text(_og(metas, "og:description")).alias("og_description"),
        _og(metas, "og:image").alias("og_image"),
        _og(metas, "og:url").alias("og_url"),
        _og(metas, "og:type").alias("og_type"),
        _clean_text(_og(metas, "og:site_name")).alias("og_site_name"),
        _og(metas, "article:published_time").alias("published_time"),
        _og(metas, "article:modified_time").alias("modified_time"),
        _extract1(ldjson, _JSON_TYPE_RE).alias("jsonld_type"),
        _clean_text(_extract1(ldjson, _JSON_HEADLINE_RE)).alias(
            "jsonld_headline"
        ),
        _extract1(ldjson, _JSON_DATE_RE).alias("jsonld_date"),
        _rel_link_href(links, "next").alias("rel_next"),
        _rel_link_href(links, "prev").alias("rel_prev"),
    )


# ---------------------------------------------------------------------------
# JSON-LD structured-data records (the full-parse upgrade of the three
# signal-grade jsonld_* columns above): EVERY ld+json block on the page,
# EVERY entity in each block, real JSON parsing JVM-side.

# publishers wrap ld+json in HTML comments or CDATA guards for ancient
# browsers; both forms are anchored strips (comment/CDATA markers, with
# the surrounding whitespace), mirrored verbatim in the DuckDB oracle
_JSONLD_WRAP_LEAD = (
    r"^[ \t\r\n\f]*(?:<!--|/\*[ \t\r\n\f]*<!\[CDATA\[[ \t\r\n\f]*\*/"
    r"|//[ \t\r\n\f]*<!\[CDATA\[)"
)
_JSONLD_WRAP_TAIL = (
    r"(?:-->|/\*[ \t\r\n\f]*\]\]>[ \t\r\n\f]*\*/|//[ \t\r\n\f]*\]\]>)"
    r"[ \t\r\n\f]*$"
)
_WS_EDGES = r"^[ \t\r\n\f]+|[ \t\r\n\f]+$"

#: entity-enumeration cap per block (static literal JSON paths keep the
#: whole operator codegen'd; ``n_entities`` makes the truncation visible
#: per row — no silent cap). Real pages carry 1-3 entities per block;
#: @graph blocks rarely exceed a handful.
JSONLD_MAX_ENTITIES = 8


def _json_scalar(c: Column) -> Column:
    """JSON SCALAR values only: ``get_json_object`` returns the raw
    JSON text for object/array values, which must not leak into a
    string column — they fall through to the next coalesce arm (the
    same first-byte test the oracle runs). '' means absent."""
    return F.nullif(F.when(~F.substring(c, 1, 1).isin("{", "["), c), F.lit(""))


def jsonld_records(
    docs: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    max_entities: int = JSONLD_MAX_ENTITIES,
) -> DataFrame:
    """Every schema.org entity declared in ``application/ld+json``
    blocks: one row per (url, block_idx, entity_idx) with the fields a
    training-data pipeline keys on — (jsonld_type, name, headline,
    description, date_published, date_modified, author_name,
    publisher_name, entity_url, image_url, in_language) plus
    ``n_entities`` (the block's TOTAL entity count, so the
    ``max_entities`` enumeration cap is visible, never silent).

    Root-shape normalization covers the three JSON-LD publication
    forms: a bare object (one entity), a top-level array, and the
    ``@graph`` envelope (its array is the entity list). Entities must
    be JSON OBJECTS (the schema.org data model); scalar/array elements
    are dropped. Per-entity field pulls run through ``get_json_object``
    (JVM Jackson — real JSON parsing, not regex): ``@type`` honors the
    array form (first element wins), author/publisher accept the
    object, object-array, and plain-string spellings, ``image`` the
    string / object.url / array-of-either spellings, ``inLanguage``
    the string and Language-object spellings. Display-text fields
    (name/headline/description) get the module's entity-lite +
    whitespace fold; type/date/url fields keep their bytes. Malformed
    JSON yields no rows for that block (Jackson null — curation-grade;
    the block text itself is not worth a quarantine row).

    Plan: one codegen'd projection + two Generates (block posexplode,
    entity posexplode over static-path pulls) — map-side only, zero
    shuffle, zero Python; at 10^12 rows the cost is the one html scan
    it pipelines into. DuckDB mirrors every step (same block regex,
    same wrapper strips, json_extract_string on the same paths) —
    tests/test_pagemeta.py hash-verifies; the one documented
    divergence is Jackson's leniency (single-quoted/trailing-garbage
    JSON parses in Spark, rejected by DuckDB) — kept out of oracle
    corpora, pinned by Spark-side hand cases.

    Reference role analog: getToc piece extraction
    (/root/reference/fusus/book.py) — typed side-tables distilled from
    in-band declarations, emitted next to the text, never inside it.
    """
    orig = F.col(html_col).cast("string")
    blocks = F.regexp_extract_all(orig, F.lit(_LDJSON_BLOCK), F.lit(1))
    exploded = docs.select(
        F.col(url_col).alias("url"),
        F.posexplode(blocks).alias("block_idx", "raw"),
    )
    j = F.regexp_replace(
        F.regexp_replace(F.col("raw"), _JSONLD_WRAP_LEAD, ""),
        _JSONLD_WRAP_TAIL,
        "",
    )
    j = F.regexp_replace(j, _WS_EDGES, "")
    g = F.get_json_object(j, "$['@graph']")
    arr = (
        F.when(F.substring(j, 1, 1) == "[", j)
        .when(g.isNotNull() & (F.substring(g, 1, 1) == "["), g)
        .otherwise(F.concat(F.lit("["), j, F.lit("]")))
    )
    base = exploded.select(
        "url",
        "block_idx",
        arr.alias("arr"),
        F.json_array_length(arr).alias("n_entities"),
    )
    pulls = F.array(
        *[F.get_json_object("arr", f"$[{i}]") for i in range(max_entities)]
    )
    ent = (
        base.where(F.col("n_entities") >= 1)
        .select(
            "url",
            "block_idx",
            "n_entities",
            F.posexplode(
                F.slice(
                    pulls, 1, F.least(F.col("n_entities"), F.lit(max_entities))
                )
            ).alias("entity_idx", "entity"),
        )
        # entities are OBJECTS; scalar/array/null elements are not
        # schema.org entities (the decoded-string form of a scalar
        # element could even alias JSON — the first-byte test drops it)
        .where(F.substring("entity", 1, 1) == "{")
    )
    e = F.col("entity")

    def js(path: str) -> Column:
        # Jackson re-serializes a JSON null VALUE as the string 'null'
        # (DuckDB's json_extract_string gives SQL NULL) — fold the
        # token to absent on both sides. Cost: a literal string value
        # "null" is also treated as absent (indistinguishable at this
        # layer; declaring your author is named "null" loses — the
        # Parahoy problem, accepted and pinned by the generated-corpus
        # cross-engine test).
        return F.nullif(F.get_json_object(e, path), F.lit("null"))

    return ent.select(
        "url",
        F.col("block_idx").cast("int").alias("block_idx"),
        F.col("entity_idx").cast("int").alias("entity_idx"),
        F.col("n_entities").cast("int").alias("n_entities"),
        F.coalesce(js("$['@type'][0]"), _json_scalar(js("$['@type']"))).alias(
            "jsonld_type"
        ),
        _clean_text(_json_scalar(js("$.name"))).alias("name"),
        _clean_text(_json_scalar(js("$.headline"))).alias("headline"),
        _clean_text(_json_scalar(js("$.description"))).alias("description"),
        _json_scalar(js("$.datePublished")).alias("date_published"),
        _json_scalar(js("$.dateModified")).alias("date_modified"),
        F.coalesce(
            js("$.author.name"),
            js("$.author[0].name"),
            _json_scalar(js("$.author")),
        ).alias("author_name"),
        F.coalesce(
            js("$.publisher.name"), _json_scalar(js("$.publisher"))
        ).alias("publisher_name"),
        _json_scalar(js("$.url")).alias("entity_url"),
        F.coalesce(
            js("$.image.url"),
            js("$.image[0].url"),
            _json_scalar(js("$.image[0]")),
            _json_scalar(js("$.image")),
        ).alias("image_url"),
        F.coalesce(
            _json_scalar(js("$.inLanguage")), js("$.inLanguage.name")
        ).alias("in_language"),
    )


# hreflang alternates: every <link rel="alternate" hreflang=...> tag.
# Multi-valued per page, so the shape is extract-all + explode over the
# matched tag regions (a region is a full _FILLER match: it walks
# quoted values but stops at the unquoted '>' that closes the tag).
_REL_ALT_IN_REGION = _attr_in_region("rel", "alternate")
_HREFLANG_VAL = (
    _ci("hreflang") + r"""\s*=\s*(?:"([^"<>]+)"|'([^'<>]+)'|([^\s"'<>]+))"""
)


def hreflang_alternates(
    docs: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, hreflang, href) — one row per declared language alternate
    (``<link rel="alternate" hreflang="de" href="...">``), hreflang
    lowered (BCP-47 tags are case-insensitive; ``x-default`` is the
    spec's fallback marker and passes through). Pages declare the
    FULL cluster on every member, so grouping by resolved href yields
    the translation cluster directly — the language analog of the
    rel=canonical group. Projection + one Generate, zero shuffle."""
    regions = F.regexp_extract_all(
        F.col(html_col).cast("string"), F.lit(_LINK_TAG_RE), F.lit(0)
    )
    tag = F.col("tag")
    return (
        docs.select(F.col(url_col).alias("url"), F.explode(regions).alias("tag"))
        .where(tag.rlike(_REL_ALT_IN_REGION))
        .select(
            "url",
            F.lower(
                _first_group(tag, _IN_REGION + _HREFLANG_VAL)
            ).alias("hreflang"),
            _first_group(tag, _IN_REGION + _HREF_VAL).alias("href"),
        )
        .where(F.col("hreflang").isNotNull() & F.col("href").isNotNull())
    )


def hreflang_clusters(
    alternates: DataFrame, *, scope: str = "domain", psl_rules: dict | None = None
) -> DataFrame:
    """Per-url translation-cluster mapping from the declared hreflang
    alternates: (url, self_canonical, cluster_id, self_lang, n_alts,
    n_langs, has_x_default).

    Pages that publish language alternates declare the FULL cluster on
    every member (the hreflang return-link requirement), so the
    cluster key needs no transitive closure: ``cluster_id`` = the
    minimum canonical key over the url's own key plus its ACCEPTED
    alternate targets — identical on every member when the
    declarations are complete. Incomplete or one-sided declarations
    degrade to split clusters (documented; the iterative machinery for
    adversarial graphs is operators/dedup.dedup_clusters). The cluster
    is the unit a curation pipeline needs for translation-aware
    mixture (one representative per language per cluster — compose
    with cluster_representatives) and for keeping parallel text
    together.

    Alternate hrefs resolve and fold exactly like declared canonicals
    (resolve_links page-level merge -> canonical_url; the hreflang
    spec requires absolute urls but relative ones still resolve), and
    the same scope guard applies (``domain``/``host``/``any``,
    canonical.py semantics): a cross-site alternate is ignored — spam
    never pulls a page into a foreign cluster. ``self_lang`` is the
    language whose alternate resolves to the url's own key (the page
    naming itself in the cluster; null when it doesn't), ``n_alts``
    counts accepted alternates, ``n_langs`` their distinct language
    tags (``x-default`` is the fallback marker, not a language —
    excluded from both self_lang and n_langs), ``has_x_default``
    whether an accepted x-default exists.

    Plan: one projection (all-JVM resolve + fold + PSL InSet) and ONE
    groupBy(url) — the shuffle carries (url, key, lang) rows only.
    """
    from fusus_spark.functions.psl import registrable_domain
    from fusus_spark.functions.url import canonical_url, url_host
    from fusus_spark.operators.webgraph import resolve_links

    if scope not in ("domain", "host", "any"):
        raise ValueError(f"scope must be domain|host|any, got {scope!r}")
    base = alternates.select(
        F.col("url").alias("src_url"),
        F.lower(F.col("hreflang")).alias("hreflang"),
        F.when(F.col("href") == "", None).otherwise(F.col("href")).alias("href"),
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
        in_scope = (dd != "") & (dd == sd)
    else:
        in_scope = F.lit(True)
    accepted = decl.isNotNull() & decl.rlike(r"^http://[^/?#]") & in_scope
    rows = resolved.select(
        "src_url",
        self_key.alias("self_key"),
        F.when(accepted, decl).alias("alt_key"),
        "hreflang",
    )
    return rows.groupBy("src_url").agg(
        F.min("self_key").alias("self_canonical"),
        # least() skips nulls: min accepted target, floored by self
        F.least(F.min("alt_key"), F.min("self_key")).alias("cluster_id"),
        # x-default is the fallback MARKER, not a language — a page
        # that is both the default and a language member reports the
        # language
        F.max(
            F.when(
                (F.col("alt_key") == F.col("self_key"))
                & (F.col("hreflang") != "x-default"),
                F.col("hreflang"),
            )
        ).alias("self_lang"),
        F.count("alt_key").cast("int").alias("n_alts"),
        # size(collect_set) not count_distinct: the distinct-agg
        # rewrite costs a THIRD exchange; the per-url language set is
        # a handful of tags, so the set agg is one shuffle and cheap
        F.size(
            F.collect_set(
                F.when(
                    F.col("alt_key").isNotNull()
                    & (F.col("hreflang") != "x-default"),
                    F.col("hreflang"),
                )
            )
        ).cast("int").alias("n_langs"),
        F.max(
            (F.col("hreflang") == "x-default") & F.col("alt_key").isNotNull()
        ).alias("has_x_default"),
    ).withColumnRenamed("src_url", "url")



# ---------------------------------------------------------------------------
# Microdata (the second structured-data syntax after JSON-LD): a FLAT
# itemprop/value harvest — signal-grade by design. Nesting (itemscope
# tree reconstruction) is out of regex-harvest scope: rows carry the
# page, property, per-tag value, and tag name so a consumer can
# regroup; itemtype on the rows that declare it gives the vocabulary.

_ITEMPROP_W = _ci("itemprop")
_ITEMSCOPE_W = _ci("itemscope")
# _IN_REGION's '<[a-zA-Z]+\s' anchor rejects digit-bearing tag names —
# and headline-on-h1 is the single most common microdata idiom, so the
# microdata pulls use this digit-tolerant variant (same containment
# discipline otherwise)
_IN_REGION_D = r"^<[a-zA-Z][a-zA-Z0-9]*\s(?:" + _FILLER + r"[\s/])?"


def _microdata_tag_pattern() -> str:
    """A tag region that DECLARES itemprop or itemscope, plus its
    immediate text run. The keyword requirement lives in the SCAN
    pattern (same anchoring discipline as _IN_REGION: the optional
    filler before the keyword ends in a delimiter and walks quoted
    values atomically, so 'data-itemprop=' and quoted-value payloads
    never match) — pages without microdata cost one failed scan, and
    the Generate only ever sees declaring tags."""
    kw = r"(?:" + _ITEMPROP_W + "|" + _ITEMSCOPE_W + r")"
    return (
        r"<[a-zA-Z][a-zA-Z0-9]*\s(?:" + _FILLER + r"[\s/])?" + kw
        + r"(?:[\s/=]" + _FILLER + r")?>[^<]*"
    )


_MICRO_TAG_RE = _microdata_tag_pattern()


def microdata_records(
    docs: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, tag_idx, tag, prop, value, itemtype, has_itemscope) — one
    row per tag declaring ``itemprop`` or ``itemscope`` (schema.org
    microdata, the attribute syntax; the page-level complement of
    jsonld_records).

    Value semantics follow the microdata spec's per-element rules,
    the subset expressible per-tag: ``meta`` -> ``content``, ``time``
    -> ``datetime`` (text-run fallback), ``a``/``link`` -> ``href``,
    ``img``/``audio``/``video``/``source``/``iframe``/``embed`` ->
    ``src``, anything else -> the element's immediate text run
    (entity-lite folded, whitespace collapsed, cut at the first child
    tag — the flat-harvest approximation of the spec's descendant
    text). ``itemtype`` rides the rows that declare it (itemscope
    roots); nesting is NOT reconstructed — documented signal grade;
    the tree-accurate syntax is jsonld_records. Url-valued properties
    keep their bytes — resolve like any harvested href.

    One whole-document scan whose pattern requires the declaring
    keyword (microdata-free pages pay one failed regex, and the
    Generate sees only declaring tags), one posexplode, zero shuffle,
    zero Python. DuckDB mirrors every step (tests/test_pagemeta.py
    hash oracle); plan_audit pins Generate + Exchange==1 + no python
    stage.
    """
    orig = F.col(html_col).cast("string")
    exploded = docs.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(orig, F.lit(_MICRO_TAG_RE), F.lit(0))
        ).alias("tag_idx", "tag"),
    )
    tag = F.col("tag")

    def attr(name: str) -> Column:
        return _first_group(tag, _IN_REGION_D + _attr3(name))

    has_scope = tag.rlike(_IN_REGION_D + _ITEMSCOPE_W + r"(?:[\s/=>]|$)")
    name = F.lower(F.regexp_extract(tag, r"^<([a-zA-Z][a-zA-Z0-9]*)", 1))
    text_run = _clean_text(F.regexp_extract(tag, r">((?s:[^<]*))$", 1))
    value = (
        F.when(name == "meta", attr("content"))
        .when(name == "time", F.coalesce(attr("datetime"), text_run))
        .when(name.isin("a", "link"), attr("href"))
        .when(
            name.isin("img", "audio", "video", "source", "iframe", "embed"),
            attr("src"),
        )
        .otherwise(text_run)
    )
    return exploded.select(
        "url",
        F.col("tag_idx").cast("int").alias("tag_idx"),
        name.alias("tag"),
        attr("itemprop").alias("prop"),
        value.alias("value"),
        attr("itemtype").alias("itemtype"),
        has_scope.alias("has_itemscope"),
    )


def article_tags(
    docs: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, tag_idx, tag) — one row per declared ``article:tag`` /
    ``keywords`` topic label: every ``<meta property="article:tag"
    content=...>`` (the Open Graph article taxonomy, one tag per
    element) plus the legacy ``<meta name="keywords">`` list (ONE
    element, comma-split). The page's self-declared topics are the
    cheapest stratification key a curation mixture has (compose with
    mixture_ppm / stratified_sample); tags are entity-folded,
    whitespace-collapsed and lowercased (taxonomy keys, not display
    text), blank entries dropped, order preserved (article:tag
    elements first, then the keywords list split in source order).

    One meta-region harvest (the page_metadata scan family), one
    posexplode over the per-region values, zero shuffle, zero
    Python. DuckDB mirror in tests/test_pagemeta.py (beyond-cap
    contract); plan_audit pins Generate + Exchange==1.
    """
    orig = F.col(html_col).cast("string")
    metas = F.regexp_extract_all(orig, F.lit(_META_TAG_RE), F.lit(0))
    tag_pat_prop = _attr_in_region("property", "article:tag")
    tag_pat_name = _attr_in_region("name", "article:tag")
    kw_pat = _attr_in_region("name", "keywords")
    content = _IN_REGION + _CONTENT_VAL_CI

    def content_of(region: Column) -> Column:
        return _first_group(region, content)

    art = F.transform(
        F.filter(
            metas,
            lambda t: t.rlike(tag_pat_prop) | t.rlike(tag_pat_name),
        ),
        lambda t: content_of(t),
    )
    kw_region = F.get(F.filter(metas, lambda t: t.rlike(kw_pat)), 0)
    kws = F.split(F.coalesce(content_of(kw_region), F.lit("")), ",")
    vals = F.concat(art, kws)
    cleaned = F.filter(
        F.transform(
            vals,
            lambda v: F.translate(
                _clean_text(v), "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
            ),
        ),
        lambda v: v.isNotNull(),
    )
    return docs.select(
        F.col(url_col).alias("url"),
        F.posexplode(cleaned).alias("tag_idx", "tag"),
    ).select("url", F.col("tag_idx").cast("int").alias("tag_idx"), "tag")
