"""Page metadata: hand-pinned semantics per quoting/order form, junk
tolerance, and RE2-identical DuckDB hash oracles for both the
projection and the hreflang explode (the beyond-cap operator
contract)."""

from __future__ import annotations

import duckdb

from fusus_spark.operators.pagemeta import (
    _CONTENT_VAL_CI,
    _HREFLANG_VAL,
    _IN_REGION,
    _LDJSON_BLOCK,
    _LINK_TAG_RE,
    _META_TAG_RE,
    _REL_ALT_IN_REGION,
    _TITLE_RE,
    _JSON_DATE_RE,
    _JSON_HEADLINE_RE,
    _JSON_TYPE_RE,
    _attr_in_region,
    hreflang_alternates,
    page_metadata,
)
from fusus_spark.operators.robots import _HREF_VAL
from tools.parity import value_hash

_SCHEMA = "url string, html binary"


def _pages() -> list[tuple[str, str]]:
    return [
        # 1: the full card — every field declared, title with entities
        # and ragged whitespace, ldjson multiline
        ("http://ex.com/full", """<html><head>
<title>  News &amp; Views &#39;26
  &nbsp;daily</title>
<meta name="description" content="All the &quot;news&quot; that fits">
<meta property="og:title" content="News &amp; Views">
<meta property="og:description" content="OG blurb">
<meta property="og:image" content="https://cdn.ex.com/i.png">
<meta property="og:url" content="https://ex.com/full">
<meta property="og:type" content="article">
<meta property="og:site_name" content="ExCom">
<meta property="article:published_time" content="2026-01-02T03:04:05Z">
<meta property="article:modified_time" content="2026-01-03T00:00:00Z">
<script type="application/ld+json">
{"@context": "https://schema.org",
 "@type": "NewsArticle",
 "headline": "News &amp; Views",
 "datePublished": "2026-01-02T03:04:05Z"}
</script>
<link rel="next" href="/page/2">
<link rel="prev" href="/page/0">
</head><body>b</body></html>"""),
        # 2: single quotes + content-first attribute order
        ("http://ex.com/q2", "<meta content='rev desc' name='description'>"
                             "<LINK HREF='/n2' REL='NEXT'>"),
        # 3: unquoted values; name=descriptionx must NOT match
        ("http://ex.com/unq", "<meta name=descriptionx content=wrong>"
                              "<meta name=description content=short>"),
        # 4: og via name= (the in-the-wild variant), and property
        # beating name when both are present
        ("http://ex.com/ogname", '<meta name="og:title" content="from name">'
                                 '<meta name="og:type" content=website>'),
        ("http://ex.com/ogboth", '<meta name="og:title" content="loser">'
                                 '<meta property="og:title" content="winner">'),
        # 5: title variants — upper tag, attributes, a non-title tag,
        # an empty title
        ("http://ex.com/t1", "<TITLE>Upper</TITLE>"),
        ("http://ex.com/t2", '<title class="x">With attr</title>'),
        ("http://ex.com/t3", "<titlearea>nope</titlearea>"),
        ("http://ex.com/t4", "<title>   </title>"),
        # 6: ldjson type unquoted and last-attribute-against-'>'
        ("http://ex.com/ld1", "<script type=application/ld+json>"
                              '{"@type":"Recipe"}</script>'),
        ("http://ex.com/ld2", "<script async type='application/ld+json' id=a>"
                              '{"headline":"H only"}</script>'),
        # 7: junk — binary-ish bytes, no html at all
        ("http://ex.com/junk", "\x00\xff<<>>&&&"),
        ("http://ex.com/empty", ""),
        # 8: double-escape decodes exactly one level
        ("http://ex.com/ent", "<title>&amp;lt;b&amp;gt;</title>"),
        # 9: containment regressions (review findings): attr=value text
        # inside ANOTHER attribute's quoted value must never match, and
        # data-name= is not name=
        ("http://ex.com/adv1",
         "<meta data-x='content=\"fake\"' name=\"description\" content=\"real\">"),
        ("http://ex.com/adv2",
         "<meta name=\"author\" content='see name=description docs'>"),
        ("http://ex.com/adv3",
         "<link title='use rel=\"next\" here' href=\"/x\">"),
        ("http://ex.com/adv4",
         '<meta data-name=description content=nope>'),
    ]


def _hreflang_pages() -> list[tuple[str, str]]:
    return [
        # the full cluster declared on one member, mixed case + forms
        ("http://ex.com/en", '<link rel="alternate" hreflang="EN" href="https://ex.com/en">'
                             "<link rel='alternate' hreflang='de' href='https://ex.com/de'>"
                             '<link hreflang=x-default href=https://ex.com/ rel=alternate>'
                             '<link rel="stylesheet" href="/s.css">'
                             '<link rel="alternate" hreflang="fr">'),
        # a quoted href whose query string SPELLS hreflang= must not
        # override the real attribute (review finding)
        ("http://ex.com/qs", '<link rel="alternate" '
                             'href="https://ex.com/x?hreflang=pt" '
                             'hreflang="sv">'),
        ("http://ex.com/none", "<p>no links</p>"),
        ("http://ex.com/junk", "\x00<link rel=alternate"),
    ]


def _df(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode("utf-8", "surrogateescape")) for u, h in rows], _SCHEMA
    )


def test_page_metadata_hand_cases(spark):
    got = {r["url"]: r for r in page_metadata(_df(spark, _pages())).collect()}

    full = got["http://ex.com/full"]
    assert full["title"] == "News & Views '26 daily"
    assert full["meta_description"] == 'All the "news" that fits'
    assert full["og_title"] == "News & Views"
    assert full["og_description"] == "OG blurb"
    assert full["og_image"] == "https://cdn.ex.com/i.png"
    assert full["og_url"] == "https://ex.com/full"
    assert full["og_type"] == "article"
    assert full["og_site_name"] == "ExCom"
    assert full["published_time"] == "2026-01-02T03:04:05Z"
    assert full["modified_time"] == "2026-01-03T00:00:00Z"
    assert full["jsonld_type"] == "NewsArticle"
    assert full["jsonld_headline"] == "News & Views"
    assert full["jsonld_date"] == "2026-01-02T03:04:05Z"
    assert full["rel_next"] == "/page/2"
    assert full["rel_prev"] == "/page/0"

    assert got["http://ex.com/q2"]["meta_description"] == "rev desc"
    assert got["http://ex.com/q2"]["rel_next"] == "/n2"
    assert got["http://ex.com/unq"]["meta_description"] == "short"
    assert got["http://ex.com/ogname"]["og_title"] == "from name"
    assert got["http://ex.com/ogname"]["og_type"] == "website"
    assert got["http://ex.com/ogboth"]["og_title"] == "winner"
    assert got["http://ex.com/t1"]["title"] == "Upper"
    assert got["http://ex.com/t2"]["title"] == "With attr"
    assert got["http://ex.com/t3"]["title"] is None
    assert got["http://ex.com/t4"]["title"] is None
    assert got["http://ex.com/ld1"]["jsonld_type"] == "Recipe"
    assert got["http://ex.com/ld2"]["jsonld_headline"] == "H only"
    assert got["http://ex.com/ld2"]["jsonld_type"] is None
    # one unescape level: &amp;lt; -> &lt; (literal text, not '<')
    assert got["http://ex.com/ent"]["title"] == "&lt;b&gt;"
    # containment: quoted-value payloads and data- prefixes never match
    assert got["http://ex.com/adv1"]["meta_description"] == "real"
    assert got["http://ex.com/adv2"]["meta_description"] is None
    assert got["http://ex.com/adv3"]["rel_next"] is None
    assert got["http://ex.com/adv4"]["meta_description"] is None
    for u in ("http://ex.com/junk", "http://ex.com/empty"):
        r = got[u]
        assert all(r[c] is None for c in r.asDict() if c != "url")


def test_hreflang_hand_cases(spark):
    rows = hreflang_alternates(_df(spark, _hreflang_pages())).collect()
    got = sorted((r["url"], r["hreflang"], r["href"]) for r in rows)
    assert got == [
        ("http://ex.com/en", "de", "https://ex.com/de"),
        ("http://ex.com/en", "en", "https://ex.com/en"),
        ("http://ex.com/en", "x-default", "https://ex.com/"),
        ("http://ex.com/qs", "sv", "https://ex.com/x?hreflang=pt"),
    ]


def _fg_sql(expr: str, pat: str) -> str:
    p = pat.replace("'", "''")
    return ("coalesce(" + ", ".join(
        f"nullif(regexp_extract({expr}, '{p}', {g}), '')" for g in (1, 2, 3)
    ) + ")")


def _region_sql(tags: str, attr: str, name: str) -> str:
    """First tag region carrying attr="name" — DuckDB's list_filter
    lambda mirrors Spark's ArrayFilter, 1-indexed [1] mirrors
    F.get(_, 0) (both NULL on empty)."""
    pat = _attr_in_region(attr, name).replace("'", "''")
    return f"(list_filter({tags}, x -> regexp_matches(x, '{pat}')))[1]"


def _meta_sql(attr: str, name: str) -> str:
    return _fg_sql(_region_sql("metas", attr, name), _IN_REGION + _CONTENT_VAL_CI)


def _og_sql(name: str) -> str:
    return f"coalesce({_meta_sql('property', name)}, {_meta_sql('name', name)})"


def _clean_sql(expr: str) -> str:
    for a, b in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                 ("&#39;", "''"), ("&nbsp;", " "), ("&amp;", "&")):
        expr = f"replace({expr}, '{a}', '{b}')"
    # single backslashes reach DuckDB verbatim (no literal escape
    # processing) and RE2 interprets them — see CLAUDE.md
    return (f"nullif(trim(regexp_replace({expr}, '[ \\t\\r\\n\\f]+', ' ', 'g')),"
            " '')")


def _rel_sql(rel: str) -> str:
    return _fg_sql(_region_sql("links", "rel", rel), _IN_REGION + _HREF_VAL)


def test_page_metadata_matches_duckdb_oracle(spark):
    sdf = page_metadata(_df(spark, _pages()))
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.sql("CREATE TABLE pages (url VARCHAR, html VARCHAR)")
    con.executemany("INSERT INTO pages VALUES (?, ?)", _pages())
    title_p = _TITLE_RE.replace("'", "''")
    ldj_p = _LDJSON_BLOCK.replace("'", "''")
    meta_tag_p = _META_TAG_RE.replace("'", "''")
    link_tag_p = _LINK_TAG_RE.replace("'", "''")
    orc = con.sql(f"""
WITH s AS (SELECT url, html AS orig FROM pages),
b AS (
  SELECT *, regexp_extract(orig, '{ldj_p}', 1) AS ldjson,
         regexp_extract_all(orig, '{meta_tag_p}', 0) AS metas,
         regexp_extract_all(orig, '{link_tag_p}', 0) AS links
  FROM s
)
SELECT url,
  {_clean_sql(f"nullif(regexp_extract(orig, '{title_p}', 1), '')")} AS title,
  {_clean_sql(_meta_sql("name", "description"))} AS meta_description,
  {_clean_sql(_og_sql("og:title"))} AS og_title,
  {_clean_sql(_og_sql("og:description"))} AS og_description,
  {_og_sql("og:image")} AS og_image,
  {_og_sql("og:url")} AS og_url,
  {_og_sql("og:type")} AS og_type,
  {_clean_sql(_og_sql("og:site_name"))} AS og_site_name,
  {_og_sql("article:published_time")} AS published_time,
  {_og_sql("article:modified_time")} AS modified_time,
  nullif(regexp_extract(ldjson, '{_JSON_TYPE_RE}', 1), '') AS jsonld_type,
  {_clean_sql(f"nullif(regexp_extract(ldjson, '{_JSON_HEADLINE_RE}', 1), '')")}
    AS jsonld_headline,
  nullif(regexp_extract(ldjson, '{_JSON_DATE_RE}', 1), '') AS jsonld_date,
  {_rel_sql("next")} AS rel_next,
  {_rel_sql("prev")} AS rel_prev
FROM b
""")
    orows = [tuple(r) for r in orc.fetchall()]
    assert len(srows) == len(orows)
    assert sorted(sdf.columns) == sorted(orc.columns)
    assert value_hash(sdf.columns, srows) == value_hash(orc.columns, orows)


def test_hreflang_matches_duckdb_oracle(spark):
    sdf = hreflang_alternates(_df(spark, _hreflang_pages()))
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.sql("CREATE TABLE pages (url VARCHAR, html VARCHAR)")
    con.executemany("INSERT INTO pages VALUES (?, ?)", _hreflang_pages())
    ltr = _LINK_TAG_RE.replace("'", "''")
    alt = _REL_ALT_IN_REGION.replace("'", "''")
    orc = con.sql(f"""
WITH t AS (
  SELECT url, unnest(regexp_extract_all(html, '{ltr}', 0)) AS tag FROM pages
),
x AS (
  SELECT url,
         lower({_fg_sql("tag", _IN_REGION + _HREFLANG_VAL)}) AS hreflang,
         {_fg_sql("tag", _IN_REGION + _HREF_VAL)} AS href
  FROM t WHERE regexp_matches(tag, '{alt}')
)
SELECT * FROM x WHERE hreflang IS NOT NULL AND href IS NOT NULL
""")
    orows = [tuple(r) for r in orc.fetchall()]
    assert len(srows) == len(orows)
    assert value_hash(sdf.columns, srows) == value_hash(orc.columns, orows)


# ---------------------------------------------------------------------------
# hreflang translation clusters


def test_hreflang_clusters_hand_cases(spark):
    from fusus_spark.operators.pagemeta import hreflang_clusters

    full = [  # the complete 3-member cluster declared on every member
        ("https://www.ex.com/en?utm_source=x", "EN", "http://www.ex.com/en"),
        ("https://www.ex.com/en?utm_source=x", "de", "http://m.ex.com/de"),
        ("https://www.ex.com/en?utm_source=x", "x-default", "http://www.ex.com/en"),
        ("http://m.ex.com/de", "en", "http://www.ex.com/en"),
        ("http://m.ex.com/de", "de", "http://m.ex.com/de"),
        ("http://m.ex.com/de", "x-default", "http://www.ex.com/en"),
    ]
    spam = [  # cross-site alternate is ignored, never followed
        ("http://ex.com/solo", "en", "http://ex.com/solo"),
        ("http://ex.com/solo", "pt", "http://evil.com/pt"),
    ]
    df = spark.createDataFrame(
        full + spam, "url string, hreflang string, href string"
    )
    got = {r["url"]: r for r in hreflang_clusters(df).collect()}

    en = got["https://www.ex.com/en?utm_source=x"]
    de = got["http://m.ex.com/de"]
    # one cluster id on both members: the min canonical key
    assert en["cluster_id"] == de["cluster_id"] == "http://m.ex.com/de"
    assert en["self_canonical"] == "http://www.ex.com/en"
    assert en["self_lang"] == "en"       # tracking twin folds to self
    assert de["self_lang"] == "de"
    assert en["n_alts"] == 3 and en["n_langs"] == 2  # x-default not a lang
    assert en["has_x_default"] and de["has_x_default"]

    solo = got["http://ex.com/solo"]
    assert solo["cluster_id"] == "http://ex.com/solo"  # spam ignored
    assert solo["n_alts"] == 1 and solo["n_langs"] == 1
    assert solo["self_lang"] == "en" and not solo["has_x_default"]

    # 'any' trusts the cross-site declaration
    trusting = {r["url"]: r for r in
                hreflang_clusters(df, scope="any").collect()}
    assert trusting["http://ex.com/solo"]["cluster_id"] == "http://evil.com/pt"
    assert trusting["http://ex.com/solo"]["n_alts"] == 2


def _hl_corpus() -> list[tuple[str, str, str]]:
    """SQL-expressible href forms (absolute / protocol-relative /
    root-relative / self / junk) across plain and co.uk hosts; the
    RFC 3986 merge forms are hand-cased + code-oracled elsewhere."""
    hosts = ["example.com", "www.example.com", "blog.example.co.uk",
             "m.example.co.uk", "evil.com", "sub.evil.com"]
    langs = ["en", "de", "fr", "PT-br", "x-default"]
    rows = []
    for i in range(120):
        h = hosts[i % 6]
        u = f"https://{h}/p{i % 5}/doc{i % 30}?utm_source=x&id={i % 7}"
        k = i % 5
        if k == 0:
            href = f"http://{hosts[(i + 1) % 6]}/alt{i % 4}"
        elif k == 1:
            href = f"//{h}/alt{i % 4}"
        elif k == 2:
            href = f"/alt{i % 4}"
        elif k == 3:
            href = u
        else:
            href = "javascript:void(0)"
        rows.append((u, langs[i % 5], href))
    return rows


def test_hreflang_clusters_match_duckdb_oracle(spark):
    from fusus_spark.operators.pagemeta import hreflang_clusters
    from tests.psl_oracle import PSL_DOMAIN_EXPR, PSL_PS_CASE, install_psl_rules
    from tests.test_url import _ORC_IDX, _ORC_KEPT, _ORC_PNORM, _ORC_PRE

    rows = _hl_corpus()
    sdf = hreflang_clusters(spark.createDataFrame(
        rows, "url string, hreflang string, href string"))
    srows = [tuple(r) for r in sdf.collect()]

    _HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"
    con = duckdb.connect()
    install_psl_rules(con)
    con.sql("CREATE TABLE t (url VARCHAR, hreflang VARCHAR, href VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    orc = con.sql(f"""
WITH t0 AS (
  SELECT url AS src, lower(hreflang) AS lang,
         CASE WHEN href = '' THEN NULL ELSE href END AS href
  FROM t
),
r1 AS (
  SELECT src, lang, href,
    regexp_replace(coalesce(href, ''), '#.*$', '') AS hnof,
    lower(regexp_extract(src, '{_HOST_RE}', 1)) AS srchost
  FROM t0
),
r3 AS (
  SELECT src, lang,
    CASE WHEN regexp_matches(hnof, '^[hH][tT][tT][pP][sS]?://') THEN hnof
         WHEN hnof LIKE '//%' THEN 'http:' || hnof
         WHEN href LIKE '/%' AND srchost <> '' THEN 'http://' || srchost || hnof
         ELSE NULL END AS resolved
  FROM r1
),
uall AS (
  SELECT src AS url FROM r3
  UNION
  SELECT resolved FROM r3 WHERE resolved IS NOT NULL
),
c0 AS (SELECT url, {_ORC_PRE} AS pre FROM uall),
c1 AS (SELECT *, {_ORC_PNORM} AS pn FROM c0),
c2 AS (
  SELECT *, regexp_replace(regexp_replace(pn, '\\?.*$', ''), '{_ORC_IDX}', '/')
              AS base,
         {_ORC_KEPT} AS kept
  FROM c1
),
canon AS (
  SELECT url,
    regexp_replace(CASE WHEN kept = '' THEN base
                        ELSE base || '?' || kept END,
                   '([^:/])/$', '\\1') AS c
  FROM c2
),
h AS (
  SELECT r3.src, r3.lang, cs.c AS selfc, cr.c AS declc,
    lower(regexp_extract(r3.src, '{_HOST_RE}', 1)) AS sh,
    lower(regexp_extract(r3.resolved, '{_HOST_RE}', 1)) AS dh
  FROM r3
  JOIN canon cs ON cs.url = r3.src
  LEFT JOIN canon cr ON cr.url = r3.resolved
),
hs AS (SELECT sh AS host FROM h UNION SELECT dh FROM h WHERE dh IS NOT NULL),
hl AS (SELECT host, string_split(host, '.') AS ls,
              len(string_split(host, '.')) AS n FROM hs),
hp AS (SELECT host, ls, n, {PSL_PS_CASE} AS ps FROM hl),
hd AS (SELECT host, {PSL_DOMAIN_EXPR} AS dom FROM hp),
acc AS (
  SELECT h.src, h.lang, h.selfc,
    CASE WHEN h.declc IS NOT NULL
              AND regexp_matches(h.declc, '^http://[^/?#]')
              AND dd.dom <> '' AND dd.dom = ds.dom
         THEN h.declc END AS alt_key
  FROM h
  LEFT JOIN hd ds ON ds.host = h.sh
  LEFT JOIN hd dd ON dd.host = h.dh
)
SELECT src AS url, min(selfc) AS self_canonical,
  least(min(alt_key), min(selfc)) AS cluster_id,
  max(CASE WHEN alt_key = selfc AND lang <> 'x-default' THEN lang END) AS self_lang,
  count(alt_key)::INT AS n_alts,
  count(DISTINCT CASE WHEN alt_key IS NOT NULL AND lang <> 'x-default' THEN lang END)::INT AS n_langs,
  bool_or(lang = 'x-default' AND alt_key IS NOT NULL) AS has_x_default
FROM acc GROUP BY src
""")
    orows = [tuple(r) for r in orc.fetchall()]
    assert len(srows) == len(orows) > 0
    assert sorted(sdf.columns) == sorted(orc.columns)
    assert value_hash(sdf.columns, srows) == value_hash(orc.columns, orows)


# ---------------------------------------------------------------------------
# JSON-LD structured-data records


def _jsonld_pages() -> list[tuple[str, str]]:
    ten = ",".join('{"@type":"Thing","name":"e%d"}' % i for i in range(10))
    return [
        # 1: full NewsArticle object root — every field, entity text
        # with an entity ref and ragged whitespace, author/publisher
        # objects, image string, inLanguage string
        ("http://ex.com/art", """<html><head>
<script type="application/ld+json">
{"@context": "https://schema.org",
 "@type": "NewsArticle",
 "headline": "News &amp; Views\\n  daily",
 "name": "Card  name",
 "description": "All the news",
 "datePublished": "2026-01-02T03:04:05Z",
 "dateModified": "2026-01-03T00:00:00Z",
 "author": {"@type": "Person", "name": "A. Writer"},
 "publisher": {"@type": "Organization", "name": "ExCom"},
 "url": "https://ex.com/art",
 "image": "https://cdn.ex.com/i.png",
 "inLanguage": "en-US"}
</script></head><body>b</body></html>"""),
        # 2: @graph envelope, two entities; author ARRAY of objects,
        # image OBJECT form, inLanguage Language-object form; plus a
        # SECOND block on the same page (block_idx 1)
        ("http://ex.com/graph", """<head>
<script type='application/ld+json'>
{"@context":"https://schema.org","@graph":[
 {"@type":"WebPage","url":"https://ex.com/graph"},
 {"@type":"Article","headline":"G2",
  "author":[{"name":"A1"},{"name":"A2"}],
  "image":{"@type":"ImageObject","url":"https://cdn.ex.com/g.jpg"},
  "inLanguage":{"@type":"Language","name":"de"}}]}
</script>
<script type=application/ld+json>{"@type":"BreadcrumbList","name":"crumbs"}</script>
</head>"""),
        # 3: top-level ARRAY root; @type array (first wins), author
        # plain string, image array-of-objects then array-of-strings
        ("http://ex.com/arr", '<script type="application/ld+json">'
         '[{"@type":["Recipe","Thing"],"name":"Pie","author":"A. Cook",'
         '"image":[{"url":"https://i/1.jpg"},"x"]},'
         '{"@type":"Review","image":["https://i/2.jpg"]}]</script>'),
        # 4: comment- and CDATA-wrapped blocks (legacy guards)
        ("http://ex.com/wrap", '<script type="application/ld+json"><!--\n'
         '{"@type":"Event","name":"E1"}\n--></script>'
         '<script type="application/ld+json">/*<![CDATA[*/'
         '{"@type":"Place","name":"P1"}/*]]>*/</script>'),
        # 5: ten entities -> capped at 8 rows, n_entities says 10
        ("http://ex.com/cap", '<script type="application/ld+json">['
         + ten + "]</script>"),
        # 6: degenerate blocks — malformed JSON, empty array, scalar
        # root, array of scalars: NO rows from any of them
        ("http://ex.com/bad", '<script type="application/ld+json">{broken'
         "</script>"
         '<script type="application/ld+json">[]</script>'
         '<script type="application/ld+json">"just a string"</script>'
         '<script type="application/ld+json">[1, "two", null]</script>'),
        # 7: no ld+json at all / junk bytes
        ("http://ex.com/none", "<p>plain</p>"),
        ("http://ex.com/junk", "\x00\xff<<>>"),
    ]


def test_jsonld_records_hand_cases(spark):
    from fusus_spark.operators.pagemeta import jsonld_records

    rows = jsonld_records(_df(spark, _jsonld_pages())).collect()
    by_key = {(r["url"], r["block_idx"], r["entity_idx"]): r for r in rows}

    art = by_key[("http://ex.com/art", 0, 0)]
    assert art["jsonld_type"] == "NewsArticle"
    assert art["headline"] == "News & Views daily"
    assert art["name"] == "Card name"
    assert art["description"] == "All the news"
    assert art["date_published"] == "2026-01-02T03:04:05Z"
    assert art["date_modified"] == "2026-01-03T00:00:00Z"
    assert art["author_name"] == "A. Writer"
    assert art["publisher_name"] == "ExCom"
    assert art["entity_url"] == "https://ex.com/art"
    assert art["image_url"] == "https://cdn.ex.com/i.png"
    assert art["in_language"] == "en-US"
    assert art["n_entities"] == 1

    g0 = by_key[("http://ex.com/graph", 0, 0)]
    g1 = by_key[("http://ex.com/graph", 0, 1)]
    gb = by_key[("http://ex.com/graph", 1, 0)]
    assert g0["jsonld_type"] == "WebPage" and g0["n_entities"] == 2
    assert g1["jsonld_type"] == "Article" and g1["headline"] == "G2"
    assert g1["author_name"] == "A1"          # array-of-objects: first
    assert g1["image_url"] == "https://cdn.ex.com/g.jpg"
    assert g1["in_language"] == "de"          # Language-object form
    assert gb["jsonld_type"] == "BreadcrumbList" and gb["name"] == "crumbs"

    a0 = by_key[("http://ex.com/arr", 0, 0)]
    a1 = by_key[("http://ex.com/arr", 0, 1)]
    assert a0["jsonld_type"] == "Recipe"      # @type array: first wins
    assert a0["author_name"] == "A. Cook"     # plain-string author
    assert a0["image_url"] == "https://i/1.jpg"
    assert a1["jsonld_type"] == "Review"
    assert a1["image_url"] == "https://i/2.jpg"  # array-of-strings

    w0 = by_key[("http://ex.com/wrap", 0, 0)]
    w1 = by_key[("http://ex.com/wrap", 1, 0)]
    assert (w0["jsonld_type"], w0["name"]) == ("Event", "E1")
    assert (w1["jsonld_type"], w1["name"]) == ("Place", "P1")

    caps = [r for r in rows if r["url"] == "http://ex.com/cap"]
    assert len(caps) == 8                     # enumeration cap
    assert all(r["n_entities"] == 10 for r in caps)  # ...and visible
    assert {r["entity_idx"] for r in caps} == set(range(8))

    for u in ("http://ex.com/bad", "http://ex.com/none", "http://ex.com/junk"):
        assert not [r for r in rows if r["url"] == u]


def test_jsonld_records_lenient_divergence(spark):
    """Jackson parses single-quoted JSON (and tolerates trailing
    garbage after the root value); DuckDB rejects both. The divergence
    is DOCUMENTED as Spark-lenient-extra-rows and kept out of oracle
    corpora — this pins the Spark side so a behavior change is
    caught."""
    from fusus_spark.operators.pagemeta import jsonld_records

    pages = [("http://ex.com/sq", '<script type="application/ld+json">'
              "{'@type':'Article','name':'SQ'}</script>")]
    rows = jsonld_records(_df(spark, pages)).collect()
    assert len(rows) == 1
    assert rows[0]["jsonld_type"] == "Article" and rows[0]["name"] == "SQ"


def _jsonld_scalar_sql(c: str) -> str:
    return (f"nullif(CASE WHEN substr({c},1,1) NOT IN ('{{','[') "
            f"THEN {c} END, '')")


def _jsonld_oracle(pages: list[tuple[str, str]]):
    """The full DuckDB mirror of jsonld_records over (url, html) rows."""
    from fusus_spark.operators.pagemeta import (
        _JSONLD_WRAP_LEAD,
        _JSONLD_WRAP_TAIL,
        _WS_EDGES,
    )

    con = duckdb.connect()
    con.sql("CREATE TABLE pages (url VARCHAR, html VARCHAR)")
    con.executemany("INSERT INTO pages VALUES (?, ?)", pages)
    ldj_p = _LDJSON_BLOCK.replace("'", "''")
    lead_p = _JSONLD_WRAP_LEAD.replace("'", "''")
    tail_p = _JSONLD_WRAP_TAIL.replace("'", "''")
    ws_p = _WS_EDGES.replace("'", "''")

    def js(path: str) -> str:
        # the 'null'-token fold mirrors the Spark side (see
        # jsonld_records.js): JSON null is absent in both engines, and
        # so is a literal "null" string value
        return f"nullif(json_extract_string(entity, '{path}'), 'null')"

    def clean(expr: str) -> str:
        return _clean_sql(expr)

    sc = _jsonld_scalar_sql
    orc = con.sql(f"""
WITH b0 AS (
  SELECT url, regexp_extract_all(html, '{ldj_p}', 1) AS blocks FROM pages
),
bi AS (
  SELECT url, unnest(generate_series(1, len(blocks))) AS i, blocks FROM b0
),
b AS (
  SELECT url, (i - 1)::INT AS block_idx,
    regexp_replace(regexp_replace(regexp_replace(
      blocks[i], '{lead_p}', ''), '{tail_p}', ''), '{ws_p}', '', 'g') AS j
  FROM bi
),
g0 AS (
  SELECT url, block_idx, j,
    CASE WHEN json_valid(j)
         THEN json_extract_string(j, '$."@graph"') END AS gj
  FROM b
),
a AS (
  SELECT url, block_idx,
    CASE WHEN substr(j,1,1) = '[' THEN j
         WHEN gj IS NOT NULL AND substr(gj,1,1) = '[' THEN gj
         ELSE '[' || j || ']' END AS arr
  FROM g0
),
n AS (
  SELECT url, block_idx, arr,
    CASE WHEN json_valid(arr)
         THEN json_array_length(arr)::INT END AS n_entities
  FROM a
),
i0 AS (
  SELECT url, block_idx, n_entities, arr,
    unnest(generate_series(1, least(n_entities, 8)::BIGINT)) AS i
  FROM n WHERE n_entities >= 1
),
ent AS (
  SELECT url, block_idx, (i - 1)::INT AS entity_idx, n_entities,
    json_extract_string(arr, '$[' || (i - 1) || ']') AS entity
  FROM i0
),
sel AS (SELECT * FROM ent WHERE substr(entity,1,1) = '{{')
SELECT url, block_idx, entity_idx, n_entities,
  coalesce({js('$."@type"[0]')}, {sc(js('$."@type"'))}) AS jsonld_type,
  {clean(sc(js('$.name')))} AS name,
  {clean(sc(js('$.headline')))} AS headline,
  {clean(sc(js('$.description')))} AS description,
  {sc(js('$.datePublished'))} AS date_published,
  {sc(js('$.dateModified'))} AS date_modified,
  coalesce({js('$.author.name')}, {js('$.author[0].name')},
           {sc(js('$.author'))}) AS author_name,
  coalesce({js('$.publisher.name')}, {sc(js('$.publisher'))}) AS publisher_name,
  {sc(js('$.url'))} AS entity_url,
  coalesce({js('$.image.url')}, {js('$.image[0].url')},
           {sc(js('$.image[0]'))}, {sc(js('$.image'))}) AS image_url,
  coalesce({sc(js('$.inLanguage'))}, {js('$.inLanguage.name')}) AS in_language
FROM sel
""")
    cols, rows = list(orc.columns), orc.fetchall()
    con.close()
    return cols, rows


def test_jsonld_records_matches_duckdb_oracle(spark):
    from fusus_spark.operators.pagemeta import jsonld_records

    sdf = jsonld_records(_df(spark, _jsonld_pages()))
    srows = [tuple(r) for r in sdf.collect()]
    ocols, orows = _jsonld_oracle(_jsonld_pages())
    orows = [tuple(r) for r in orows]
    assert len(srows) == len(orows) > 0
    assert sorted(sdf.columns) == sorted(ocols)
    assert value_hash(sdf.columns, srows) == value_hash(ocols, orows)


def test_jsonld_records_generated_corpus_cross_engine(spark):
    """Seeded-random strictly-valid JSON (json.dumps output: every
    root shape, nested author/image objects, arrays, ints, booleans,
    nulls, non-ascii, embedded quotes/newlines) must hash-identically
    through Spark and the DuckDB mirror — the generative complement
    of the hand corpus. Floats, single quotes, and trailing garbage
    stay excluded (the documented Jackson-leniency divergences)."""
    import json
    import random

    rng = random.Random(20260819)
    alphabet = "abc DEF 123 &amp; \"q\" \n\t é 漢字 <b> :,}{]["

    def text():
        return "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))

    def value(depth=0):
        k = rng.randint(0, 6)
        if k == 0:
            return text()
        if k == 1:
            return rng.randint(-10**6, 10**6)
        if k == 2:
            return rng.choice([True, False, None])
        if k == 3 and depth < 2:
            return {"name": text(), "@type": text()}
        if k == 4 and depth < 2:
            return [value(depth + 1) for _ in range(rng.randint(0, 3))]
        return text()

    def entity():
        keys = ["@type", "name", "headline", "description", "datePublished",
                "dateModified", "author", "publisher", "url", "image",
                "inLanguage"]
        return {k: value() for k in keys if rng.random() < 0.6}

    def block():
        shape = rng.randint(0, 2)
        if shape == 0:
            root = entity()
        elif shape == 1:
            root = [entity() for _ in range(rng.randint(0, 11))]
        else:
            root = {"@context": "https://schema.org",
                    "@graph": [entity() for _ in range(rng.randint(0, 4))]}
        return ('<script type="application/ld+json">'
                + json.dumps(root, ensure_ascii=bool(rng.getrandbits(1)))
                + "</script>")

    pages = [
        (f"http://gen.com/{i}", "".join(block() for _ in range(rng.randint(1, 3))))
        for i in range(60)
    ]

    from fusus_spark.operators.pagemeta import jsonld_records

    sdf = jsonld_records(_df(spark, pages))
    srows = [tuple(r) for r in sdf.collect()]
    ocols, orows = _jsonld_oracle(pages)
    orows = [tuple(r) for r in orows]
    assert len(srows) == len(orows) > 0
    assert value_hash(sdf.columns, srows) == value_hash(ocols, orows)


# ---------------------------------------------------------------------------
# microdata records


def _micro_pages() -> list[tuple[str, str]]:
    return [
        # 1: a full Recipe — scope root with itemtype, every value rule
        # (text run with entity, meta/content, time/datetime, a/href,
        # img/src), plus a nested scope WITHOUT itemtype
        ("http://ex.com/r", """<div itemscope itemtype="https://schema.org/Recipe">
  <span itemprop="name">Pie &amp; Mash</span>
  <meta itemprop="cookTime" content="PT30M">
  <time itemprop="datePublished" datetime="2026-01-01">Jan 1</time>
  <a itemprop="url" href="/r/1">the page</a>
  <img itemprop="image" src="/i.jpg">
  <div itemprop="author" itemscope><b itemprop="name">A. Cook</b></div>
</div>"""),
        # 2: unquoted + single-quoted forms; time with no datetime
        # falls back to its text run; digit-bearing tag names (h1 —
        # the most common microdata idiom) keep their declarations
        ("http://ex.com/q", "<span itemprop=headline>Plain</span>"
                            "<time itemprop='dateModified'>yesterday</time>"
                            '<h1 itemprop="name" itemscope>Big Title</h1>'),
        # 3: containment — data-itemprop is not itemprop, and the
        # keyword inside a quoted value never matches
        ("http://ex.com/adv", '<span data-itemprop="x">no</span>'
                              '<span title="use itemprop=name here">no</span>'
                              '<i itemscoped>no</i>'),
        ("http://ex.com/none", "<p>nothing</p>"),
        ("http://ex.com/junk", "\x00\xff<<>>"),
    ]


def test_microdata_records_hand_cases(spark):
    from fusus_spark.operators.pagemeta import microdata_records

    rows = microdata_records(_df(spark, _micro_pages())).collect()
    r = sorted([x for x in rows if x["url"] == "http://ex.com/r"],
               key=lambda x: x["tag_idx"])
    assert [(x["tag"], x["prop"], x["value"]) for x in r] == [
        ("div", None, None),                       # scope root, no text
        ("span", "name", "Pie & Mash"),
        ("meta", "cookTime", "PT30M"),
        ("time", "datePublished", "2026-01-01"),   # datetime beats text
        ("a", "url", "/r/1"),
        ("img", "image", "/i.jpg"),
        ("div", "author", None),                   # nested scope root
        ("b", "name", "A. Cook"),
    ]
    assert r[0]["itemtype"] == "https://schema.org/Recipe"
    assert r[0]["has_itemscope"] and not r[1]["has_itemscope"]
    assert r[6]["has_itemscope"] and r[6]["itemtype"] is None

    q = sorted([x for x in rows if x["url"] == "http://ex.com/q"],
               key=lambda x: x["tag_idx"])
    assert [(x["tag"], x["prop"], x["value"]) for x in q] == [
        ("span", "headline", "Plain"),
        ("time", "dateModified", "yesterday"),     # text-run fallback
        ("h1", "name", "Big Title"),               # digit tag name
    ]
    assert q[2]["has_itemscope"]

    for u in ("http://ex.com/adv", "http://ex.com/none", "http://ex.com/junk"):
        assert not [x for x in rows if x["url"] == u]


def test_microdata_records_matches_duckdb_oracle(spark):
    from fusus_spark.operators.pagemeta import (
        _IN_REGION_D,
        _ITEMSCOPE_W,
        _MICRO_TAG_RE,
        _attr3,
        microdata_records,
    )

    sdf = microdata_records(_df(spark, _micro_pages()))
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.sql("CREATE TABLE pages (url VARCHAR, html VARCHAR)")
    con.executemany("INSERT INTO pages VALUES (?, ?)", _micro_pages())
    tag_p = _MICRO_TAG_RE.replace("'", "''")
    scope_p = (_IN_REGION_D + _ITEMSCOPE_W + r"(?:[\s/=>]|$)").replace("'", "''")

    def attr(name: str) -> str:
        return _fg_sql("tag", _IN_REGION_D + _attr3(name))

    text_run = _clean_sql(
        "nullif(regexp_extract(tag, '>((?s:[^<]*))$', 1), '')"
    )
    orc = con.sql(f"""
WITH t0 AS (
  SELECT url, regexp_extract_all(html, '{tag_p}', 0) AS tags FROM pages
),
t1 AS (
  SELECT url, unnest(generate_series(1, len(tags))) AS i, tags FROM t0
),
t AS (
  SELECT url, (i - 1)::INT AS tag_idx, tags[i] AS tag FROM t1
),
x AS (
  SELECT url, tag_idx,
    lower(regexp_extract(tag, '^<([a-zA-Z][a-zA-Z0-9]*)', 1)) AS tag,
    {attr('itemprop')} AS prop,
    {attr('itemtype')} AS itemtype,
    regexp_matches(tag, '{scope_p}') AS has_itemscope,
    {attr('content')} AS a_content, {attr('datetime')} AS a_datetime,
    {attr('href')} AS a_href, {attr('src')} AS a_src,
    {text_run} AS trun
  FROM t
)
SELECT url, tag_idx, tag, prop,
  CASE WHEN tag = 'meta' THEN a_content
       WHEN tag = 'time' THEN coalesce(a_datetime, trun)
       WHEN tag IN ('a', 'link') THEN a_href
       WHEN tag IN ('img', 'audio', 'video', 'source', 'iframe', 'embed')
            THEN a_src
       ELSE trun END AS value,
  itemtype, has_itemscope
FROM x
""")
    orows = [tuple(r) for r in orc.fetchall()]
    assert len(srows) == len(orows) > 0
    assert sorted(sdf.columns) == sorted(orc.columns)
    assert value_hash(sdf.columns, srows) == value_hash(orc.columns, orows)


# ---------------------------------------------------------------------------
# article tags


def _tag_pages() -> list[tuple[str, str]]:
    return [
        # og article:tag elements (one tag each, property= and the
        # in-the-wild name= variant) + a keywords list with ragged
        # spacing and entities; dense idx across both sources
        ("http://ex.com/t", '<meta property="article:tag" content="AI">'
         "<meta name='article:tag' content='Machine  Learning'>"
         '<meta name="keywords" content="nlp, Data &amp; Stats, ,AI">'),
        # keywords only; empty entries drop but order stays
        ("http://ex.com/k", "<meta name=keywords content='a,,b'>"),
        # non-ascii values keep their bytes (ASCII-only fold — Unicode
        # case-mapping is engine-divergent)
        ("http://ex.com/gr", '<meta property="article:tag" content="ΟΣ Foo">'),
        # containment: data-name= / quoted-value payloads never match
        ("http://ex.com/adv", '<meta data-name="keywords" content="no">'
         "<meta name='author' content='use name=keywords here'>"),
        ("http://ex.com/none", "<p>no tags</p>"),
    ]


def test_article_tags_hand_cases(spark):
    from fusus_spark.operators.pagemeta import article_tags

    rows = sorted(
        [tuple(r) for r in article_tags(_df(spark, _tag_pages())).collect()]
    )
    assert rows == [
        ("http://ex.com/gr", 0, "ΟΣ foo"),
        ("http://ex.com/k", 0, "a"),
        ("http://ex.com/k", 1, "b"),
        ("http://ex.com/t", 0, "ai"),
        ("http://ex.com/t", 1, "machine learning"),
        ("http://ex.com/t", 2, "nlp"),
        ("http://ex.com/t", 3, "data & stats"),
        ("http://ex.com/t", 4, "ai"),
    ]


def test_article_tags_matches_duckdb_oracle(spark):
    from fusus_spark.operators.pagemeta import _attr_in_region, article_tags

    sdf = article_tags(_df(spark, _tag_pages()))
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.sql("CREATE TABLE pages (url VARCHAR, html VARCHAR)")
    con.executemany("INSERT INTO pages VALUES (?, ?)", _tag_pages())
    mt = _META_TAG_RE.replace("'", "''")
    pp = _attr_in_region("property", "article:tag").replace("'", "''")
    pn = _attr_in_region("name", "article:tag").replace("'", "''")
    kw = _attr_in_region("name", "keywords").replace("'", "''")
    content = _fg_sql("t", _IN_REGION + _CONTENT_VAL_CI)
    kw_content = _fg_sql(
        "(list_filter(metas, t -> regexp_matches(t, '" + kw + "')))[1]",
        _IN_REGION + _CONTENT_VAL_CI,
    )
    orc = con.sql(f"""
WITH m AS (
  SELECT url, regexp_extract_all(html, '{mt}', 0) AS metas FROM pages
),
v AS (
  SELECT url,
    list_transform(
      list_filter(metas, t -> regexp_matches(t, '{pp}')
                            OR regexp_matches(t, '{pn}')),
      t -> {content})
    || string_split(coalesce({kw_content}, ''), ',') AS vals
  FROM m
),
c AS (
  SELECT url,
    list_filter(list_transform(vals,
                v -> translate({_clean_sql('v')}, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')),
                x -> x IS NOT NULL) AS tags
  FROM v
),
e AS (
  SELECT url, unnest(generate_series(1, len(tags))) AS i, tags FROM c
)
SELECT url, (i - 1)::INT AS tag_idx, tags[i] AS tag FROM e
""")
    orows = [tuple(r) for r in orc.fetchall()]
    assert len(srows) == len(orows) > 0
    assert sorted(sdf.columns) == sorted(orc.columns)
    assert value_hash(sdf.columns, srows) == value_hash(orc.columns, orows)


def test_microdata_records_tag_soup_cross_engine(spark):
    """Seeded adversarial markup through the Java-regex Spark plan and
    the RE2 DuckDB mirror — engine agreement for the microdata
    harvest far beyond the hand corpus."""
    import random

    from fusus_spark.operators.pagemeta import (
        _IN_REGION_D,
        _ITEMSCOPE_W,
        _MICRO_TAG_RE,
        _attr3,
        microdata_records,
    )

    rng = random.Random(11)
    pieces = ['<span itemprop="name">', "<h1 itemprop=headline itemscope>",
              "<meta itemprop='cookTime' content='PT1M'>",
              '<div itemscope itemtype="https://schema.org/Thing">',
              "<time itemprop=date datetime=2026-01-01>", "</span>",
              "</div>", "<a itemprop=url href=/x>", "text &amp; more",
              "itemprop", "itemscope", "=", "'", '"', ">", "<", " ",
              "é 漢", "/", "<i itemscoped>", "data-itemprop=x",
              "<img itemprop=image src=/i.jpg>"]
    pages = [
        (f"http://ms.com/{i}",
         "".join(rng.choice(pieces) for _ in range(rng.randint(4, 50))))
        for i in range(120)
    ]
    sdf = microdata_records(_df(spark, pages))
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.sql("CREATE TABLE pages (url VARCHAR, html VARCHAR)")
    con.executemany("INSERT INTO pages VALUES (?, ?)", pages)
    tag_p = _MICRO_TAG_RE.replace("'", "''")
    scope_p = (_IN_REGION_D + _ITEMSCOPE_W + r"(?:[\s/=>]|$)").replace("'", "''")

    def attr(name: str) -> str:
        return _fg_sql("tag", _IN_REGION_D + _attr3(name))

    text_run = _clean_sql(
        "nullif(regexp_extract(tag, '>((?s:[^<]*))$', 1), '')"
    )
    orc = con.sql(f"""
WITH t0 AS (
  SELECT url, regexp_extract_all(html, '{tag_p}', 0) AS tags FROM pages
),
t1 AS (
  SELECT url, unnest(generate_series(1, len(tags))) AS i, tags FROM t0
),
t AS (
  SELECT url, (i - 1)::INT AS tag_idx, tags[i] AS tag FROM t1
),
x AS (
  SELECT url, tag_idx,
    lower(regexp_extract(tag, '^<([a-zA-Z][a-zA-Z0-9]*)', 1)) AS tag,
    {attr('itemprop')} AS prop,
    {attr('itemtype')} AS itemtype,
    regexp_matches(tag, '{scope_p}') AS has_itemscope,
    {attr('content')} AS a_content, {attr('datetime')} AS a_datetime,
    {attr('href')} AS a_href, {attr('src')} AS a_src,
    {text_run} AS trun
  FROM t
)
SELECT url, tag_idx, tag, prop,
  CASE WHEN tag = 'meta' THEN a_content
       WHEN tag = 'time' THEN coalesce(a_datetime, trun)
       WHEN tag IN ('a', 'link') THEN a_href
       WHEN tag IN ('img', 'audio', 'video', 'source', 'iframe', 'embed')
            THEN a_src
       ELSE trun END AS value,
  itemtype, has_itemscope
FROM x
""")
    orows = [tuple(r) for r in orc.fetchall()]
    assert len(srows) == len(orows) > 0
    assert value_hash(sdf.columns, srows) == value_hash(list(orc.columns), orows)
