"""RSS/Atom feed parsing: hand-pinned semantics per feed dialect,
junk tolerance, RE2-identical DuckDB oracles, and the announcement
adapter folding feeds into fetch_queue's sitemap supply (the
beyond-cap operator contract)."""

from __future__ import annotations

import duckdb

from fusus_spark.operators.frontier import (
    feed_entries_as_announcements,
    parse_feed_entries,
)
from tools.parity import value_hash

_RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel>
<title>Chan</title><link>http://ex.com/</link>
<item>
  <title><![CDATA[Big &amp; bold]]></title>
  <link>http://ex.com/a?x=1&amp;y=2</link>
  <guid isPermaLink="false">tag:ex.com,2026:a</guid>
  <pubDate>Mon, 02 Feb 2026 03:04:05 GMT</pubDate>
</item>
<item>
  <title>Entity &amp; title</title>
  <guid>http://ex.com/b</guid>
  <pubDate>3 Feb 2026 00:00:00 +0000</pubDate>
</item>
<item>
  <guid isPermaLink="false">not-a-url</guid>
  <title>dropped: no resolvable loc</title>
</item>
</channel></rss>"""

_ATOM = """<feed xmlns="http://www.w3.org/2005/Atom">
<title>AFeed</title>
<entry>
  <title>First</title>
  <link rel="self" href="http://ex.org/feed.xml"/>
  <link rel="alternate" href="http://ex.org/p/1"/>
  <id>urn:uuid:1</id>
  <published>2026-02-05T10:00:00Z</published>
</entry>
<entry>
  <title>Href-first attr order</title>
  <link href='http://ex.org/p/2' rel='alternate'/>
  <updated>2026-02-06T11:00:00Z</updated>
</entry>
<entry>
  <title>Only a self link: fallback href</title>
  <link rel="self" href="http://ex.org/p/3"/>
</entry>
</feed>"""

_RDF = """<rdf:RDF xmlns="http://purl.org/rss/1.0/">
<item rdf:about="http://ex.net/x">
  <title>RDF item</title>
  <link>http://ex.net/x</link>
  <dc:date>2026-02-07</dc:date>
</item>
</rdf:RDF>"""


_INJ = ("<rss><channel><item>"
        "<description><![CDATA[see <link>http://evil.com/x</link>"
        " and <feed> docs]]></description>"
        "<link>http://ex.com/real</link>"
        "<title><![CDATA[Safe]]></title>"
        "</item></channel></rss>")


def _feeds() -> list[tuple[str, str]]:
    return [
        ("http://ex.com/rss.xml", _RSS),
        ("http://ex.com/inject.xml", _INJ),
        ("http://ex.org/atom.xml", _ATOM),
        ("http://ex.net/rdf.xml", _RDF),
        ("http://junk.com/f.xml", "\x00<<not xml &&"),
        ("http://empty.com/f.xml", ""),
    ]


def _df(spark, rows):
    return spark.createDataFrame(rows, "feed_url string, xml string")


def test_parse_feed_hand_cases(spark):
    rows = parse_feed_entries(_df(spark, _feeds())).collect()
    by_loc = {r["loc"]: r for r in rows}

    a = by_loc["http://ex.com/a?x=1&y=2"]          # entity-unescaped link
    assert a["kind"] == "rss"
    assert a["title"] == "Big &amp; bold"          # CDATA body is literal
    assert a["published"] == "Mon, 02 Feb 2026 03:04:05 GMT"
    assert a["guid"] == "tag:ex.com,2026:a"

    b = by_loc["http://ex.com/b"]                  # permalink guid fallback
    assert b["title"] == "Entity & title"          # entity fold
    # the isPermaLink=false non-url guid entry is dropped
    assert len([r for r in rows if r["feed_url"] == "http://ex.com/rss.xml"]) == 2

    p1 = by_loc["http://ex.org/p/1"]               # rel=alternate beats self
    assert p1["kind"] == "atom"
    assert p1["published"] == "2026-02-05T10:00:00Z"
    assert p1["guid"] == "urn:uuid:1"
    p2 = by_loc["http://ex.org/p/2"]               # href-before-rel order
    assert p2["published"] == "2026-02-06T11:00:00Z"   # updated fallback
    p3 = by_loc["http://ex.org/p/3"]               # any-href fallback
    assert p3["published"] is None

    assert by_loc["http://ex.net/x"]["kind"] == "rss"  # RDF items land as rss

    # CDATA bodies are data: an embedded <link> never becomes the loc,
    # an embedded '<feed>' never flips the dialect (review findings)
    inj = by_loc["http://ex.com/real"]
    assert inj["kind"] == "rss" and inj["title"] == "Safe"
    assert "http://evil.com/x" not in {r["loc"] for r in rows}

    assert {r["feed_url"] for r in rows} == {
        "http://ex.com/rss.xml", "http://ex.org/atom.xml",
        "http://ex.net/rdf.xml", "http://ex.com/inject.xml",
    }


def test_feed_announcements(spark):
    entries = parse_feed_entries(_df(spark, _feeds()))
    ann = {r["loc"]: r for r in feed_entries_as_announcements(entries).collect()}
    assert ann["http://ex.com/a?x=1&y=2"]["lastmod"] == "2026-02-02"  # RFC822
    assert ann["http://ex.com/b"]["lastmod"] == "2026-02-03"  # no day-name
    assert ann["http://ex.org/p/1"]["lastmod"] == "2026-02-05"        # ISO
    assert ann["http://ex.org/p/3"]["lastmod"] is None                # absent
    assert all(r["kind"] == "urlset" and r["priority_e6"] is None
               for r in ann.values())


def test_feed_seeds_and_announces_in_fetch_queue(spark):
    """The adapter output unions straight into fetch_queue's sitemap
    supply: a feed-announced change boosts a stale revisit url, a
    never-crawled feed url becomes a seed."""
    from fusus_spark.operators.frontier import fetch_queue, url_change_stats

    stats = url_change_stats(spark.createDataFrame(
        [("http://ex.com/a?x=1&y=2", "h1", "2026-01-10"),
         ("http://ex.com/a?x=1&y=2", "h1", "2026-01-20")],
        "url string, content_hash string, crawl_date string"))
    ann = feed_entries_as_announcements(
        parse_feed_entries(_df(spark, _feeds())))
    q = {r["url"]: r for r in fetch_queue(
        stats, ann, as_of_date="2026-02-21", announce_boost_e6=900_000
    ).collect()}
    # announced 2026-02-02 > last crawl 2026-01-20 -> boosted to floor
    assert q["http://ex.com/a?x=1&y=2"]["priority_e6"] == 900_000
    assert q["http://ex.com/a?x=1&y=2"]["source"] == "revisit"
    # never-crawled feed urls seed at the sitemaps.org default
    assert q["http://ex.org/p/1"]["source"] == "seed"
    assert q["http://ex.org/p/1"]["priority_e6"] == 500_000


_ENT = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&apos;", "''"), ("&amp;", "&"))


def _unesc_sql(expr: str) -> str:
    for a, b in _ENT:
        expr = f"replace({expr}, '{a}', '{b}')"
    return expr


def _field_sql(tag: str, src: str = "enc") -> str:
    pat = rf"<{tag}(?:\s[^>]*)?>\s*([\s\S]*?)\s*</{tag}>"
    return f"nullif(trim(regexp_extract({src}, '{pat}', 1)), '')"


def _href2_sql(pat: str) -> str:
    p = pat.replace("'", "''")
    return ("coalesce(" + ", ".join(
        f"nullif(regexp_extract(enc, '{p}', {g}), '')" for g in (1, 2)
    ) + ")")


def test_parse_feed_matches_duckdb_oracle(spark):
    from fusus_spark.operators.frontier import (
        _ATOM_ANY_HREF, _ATOM_HREF_REL, _ATOM_REL_HREF, _ATOM_ROOT_RE,
        _CDATA_RE, _GUID_RE)

    sdf = parse_feed_entries(_df(spark, _feeds()))
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.sql("CREATE TABLE feeds (feed_url VARCHAR, xml VARCHAR)")
    con.executemany("INSERT INTO feeds VALUES (?, ?)", _feeds())
    guid_p = _GUID_RE.replace("'", "''")
    root_p = _ATOM_ROOT_RE.replace("'", "''")
    cdata_p = _CDATA_RE.replace("'", "''")
    cdata_strip = "replace(replace(t, '<![CDATA[', ''), ']]>', '')"
    orc = con.sql(f"""
WITH f AS (
  SELECT feed_url, coalesce(xml, '') AS xml,
         regexp_matches(coalesce(xml, ''), '{root_p}') AS is_atom
  FROM feeds
),
x AS (
  SELECT feed_url, is_atom,
         CASE WHEN is_atom THEN 'atom' ELSE 'rss' END AS kind,
         unnest(CASE WHEN is_atom
           THEN regexp_extract_all(xml, '<entry(?:\\s[^>]*)?>([\\s\\S]*?)</entry>', 1)
           ELSE regexp_extract_all(xml, '<item(?:\\s[^>]*)?>([\\s\\S]*?)</item>', 1)
         END) AS e
  FROM f
),
g0 AS (
  SELECT *, regexp_replace(e, '{cdata_p}', '', 'g') AS enc FROM x
),
g AS (
  SELECT *, regexp_extract(enc, '{guid_p}', 1) AS guid_attrs,
         nullif(trim(regexp_extract(enc, '{guid_p}', 2)), '') AS guid_text,
         {_field_sql("title", "e")} AS t
  FROM g0
),
y AS (
  SELECT feed_url, kind,
    CASE WHEN is_atom
      THEN {_unesc_sql(f"coalesce({_href2_sql(_ATOM_REL_HREF)}, {_href2_sql(_ATOM_HREF_REL)}, {_href2_sql(_ATOM_ANY_HREF)})")}
      ELSE coalesce(
        {_unesc_sql(_field_sql("link"))},
        CASE WHEN NOT regexp_matches(lower(guid_attrs), 'ispermalink\\s*=\\s*["'']?false')
                  AND regexp_matches({_unesc_sql("coalesce(guid_text, '')")}, '^https?://')
             THEN {_unesc_sql("guid_text")} END)
    END AS loc,
    CASE WHEN is_atom
      THEN coalesce({_field_sql("published")}, {_field_sql("updated")})
      ELSE {_field_sql("pubDate")} END AS published,
    CASE WHEN position('<![CDATA[' in t) > 0
         THEN {cdata_strip} ELSE {_unesc_sql("t")} END AS title,
    coalesce(guid_text, {_field_sql("id")}) AS guid
  FROM g
)
SELECT * FROM y WHERE loc IS NOT NULL
""")
    orows = [tuple(r) for r in orc.fetchall()]
    assert len(srows) == len(orows)
    assert sorted(sdf.columns) == sorted(orc.columns)
    assert value_hash(sdf.columns, srows) == value_hash(orc.columns, orows)


def test_announcements_match_duckdb_oracle(spark):
    entries = parse_feed_entries(_df(spark, _feeds()))
    sdf = feed_entries_as_announcements(entries)
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.sql("CREATE TABLE e (feed_url VARCHAR, kind VARCHAR, loc VARCHAR, "
            "published VARCHAR, title VARCHAR, guid VARCHAR)")
    con.executemany(
        "INSERT INTO e VALUES (?, ?, ?, ?, ?, ?)",
        [tuple(r) for r in entries.collect()],
    )
    rfc = r"(?:^|,\s*)(\d{1,2}) ([A-Z][a-z]{2}) (\d{4})"
    orc = con.sql(f"""
SELECT feed_url AS sitemap_url, 'urlset' AS kind, loc,
  coalesce(
    CASE WHEN regexp_matches(published, '^\\d{{4}}-\\d{{2}}-\\d{{2}}([Tt ].*)?$')
         THEN substring(published, 1, 10) END,
    CASE WHEN regexp_extract(published, '{rfc}', 3) <> ''
         THEN strftime(try_strptime(concat_ws(' ',
                lpad(regexp_extract(published, '{rfc}', 1), 2, '0'),
                regexp_extract(published, '{rfc}', 2),
                regexp_extract(published, '{rfc}', 3)), '%d %b %Y'),
              '%Y-%m-%d') END
  ) AS lastmod,
  CAST(NULL AS VARCHAR) AS changefreq, CAST(NULL AS BIGINT) AS priority_e6
FROM e
""")
    orows = [tuple(r) for r in orc.fetchall()]
    assert len(srows) == len(orows)
    assert value_hash(sdf.columns, srows) == value_hash(orc.columns, orows)
