"""Robots/opt-out signal tests: hand-pinned directive cases + DuckDB
hash cross-check with the identical RE2 patterns (beyond the 50-query
registry, so the oracle runs in-test)."""

from __future__ import annotations

import duckdb

from fusus_spark.operators.robots import apply_robots_optout, robots_signals
from tools.parity import value_hash


def _pages() -> list[tuple[str, str]]:
    return [
        ("http://a.com/1",
         '<html><head><meta name="robots" content="noindex, nofollow">'
         '<link rel="canonical" href="http://a.com/Canon"></head><p>x</p></html>'),
        # attribute order flipped, single directive, uppercase markup
        ("http://a.com/2",
         '<META CONTENT="NOINDEX" NAME="robots"><p>y</p>'),
        ("http://a.com/3",
         '<meta name="robots" content="index, follow"><p>clean</p>'),
        # directive must match as a whole token
        ("http://a.com/4",
         '<meta name="robots" content="noindexing"><p>lookalike</p>'),
        # canonical href keeps its CASE; rel after href
        ("http://a.com/5",
         '<link href="/MixedCase/Path" rel="canonical"><p>z</p>'),
        # other meta tags must not shadow (name=viewport with content)
        ("http://a.com/6",
         '<meta name="viewport" content="width=1"><p>plain</p>'),
        ("http://a.com/7", "<p>no head markup at all</p>"),
        ("http://a.com/8",
         '<meta name="robots" content="noarchive,nofollow"><p>w</p>'),
        # 'none' is spec-defined as 'noindex, nofollow'
        ("http://a.com/9", '<meta name="robots" content="none"><p>n</p>'),
        # unquoted attribute values are valid HTML (r4 verdict item #5)
        ("http://a.com/10", "<meta name=robots content=noindex><p>u</p>"),
        ("http://a.com/11", "<meta content=nofollow name=robots ><p>u2</p>"),
        ("http://a.com/12", "<link rel=canonical href=/plain/Path><p>u3</p>"),
        # the unquoted name must be DELIMITED: robotsx is another meta
        ("http://a.com/13", "<meta name=robotsx content=noindex><p>u4</p>"),
        # single-quoted values
        ("http://a.com/14",
         "<meta name='robots' content='noarchive'>"
         "<link rel='canonical' href='/Sq/q'><p>u5</p>"),
        # cross-tag containment (review finding): a value-less robots
        # meta must NOT harvest content= from the NEXT tag or from a
        # text node after the tag
        ("http://a.com/15",
         '<meta name=robots><meta name=description '
         'content="noindex tips for seo"><p>v</p>'),
        ("http://a.com/16",
         "<meta name=robots> content=noindex in prose<p>v2</p>"),
        ("http://a.com/17",
         '<link rel=canonical><a href="http://evil.example/">x</a>'),
        # a QUOTED attribute value containing '<' between the attributes
        # must not break same-tag detection (the filler walks quoted
        # spans; an explicit opt-out must never be missed)
        ("http://a.com/18",
         '<meta data-x="a<b" name="robots" content="noindex"><p>q</p>'),
        ("http://a.com/19",
         '<link data-y="x<y" rel="canonical" href="/Lt/p"><p>q2</p>'),
    ]


def _docs(spark):
    rows = [(u, h.encode()) for u, h in _pages()]
    return spark.createDataFrame(rows, "url string, html binary")


def test_robots_signals_hand_cases(spark):
    got = {r["url"]: r for r in robots_signals(_docs(spark)).collect()}
    assert got["http://a.com/1"]["noindex"] is True
    assert got["http://a.com/1"]["nofollow"] is True
    assert got["http://a.com/1"]["canonical_href"] == "http://a.com/Canon"
    assert got["http://a.com/2"]["noindex"] is True  # flipped attrs, caps
    assert got["http://a.com/3"]["noindex"] is False
    assert got["http://a.com/4"]["noindex"] is False  # whole-token only
    assert got["http://a.com/5"]["canonical_href"] == "/MixedCase/Path"
    assert got["http://a.com/6"]["robots_content"] == ""
    assert got["http://a.com/7"]["canonical_href"] is None
    assert got["http://a.com/8"]["noarchive"] is True
    assert got["http://a.com/8"]["noindex"] is False
    assert got["http://a.com/9"]["noindex"] is True   # none == noindex
    assert got["http://a.com/9"]["nofollow"] is True  # none == nofollow
    assert got["http://a.com/10"]["noindex"] is True  # unquoted values
    assert got["http://a.com/11"]["nofollow"] is True
    assert got["http://a.com/11"]["noindex"] is False
    assert got["http://a.com/12"]["canonical_href"] == "/plain/Path"
    assert got["http://a.com/13"]["robots_content"] == ""  # delimited name
    assert got["http://a.com/14"]["noarchive"] is True
    assert got["http://a.com/14"]["canonical_href"] == "/Sq/q"
    assert got["http://a.com/15"]["robots_content"] == ""  # next-tag bleed
    assert got["http://a.com/15"]["noindex"] is False
    assert got["http://a.com/16"]["robots_content"] == ""  # text-node bleed
    assert got["http://a.com/17"]["canonical_href"] is None
    assert got["http://a.com/18"]["noindex"] is True  # '<' in quoted attr
    assert got["http://a.com/19"]["canonical_href"] == "/Lt/p"


def test_apply_robots_optout(spark):
    kept = {r["url"] for r in apply_robots_optout(_docs(spark)).collect()}
    assert kept == {"http://a.com/3", "http://a.com/4", "http://a.com/5",
                    "http://a.com/6", "http://a.com/7", "http://a.com/8",
                    "http://a.com/11", "http://a.com/12", "http://a.com/13",
                    "http://a.com/14", "http://a.com/15", "http://a.com/16",
                    "http://a.com/17", "http://a.com/19"}


def test_robots_signals_match_duckdb_oracle(spark):
    from fusus_spark.operators.robots import (
        _LINK_HREF_FIRST,
        _LINK_REL_FIRST,
        _META_CONTENT_FIRST,
        _META_NAME_FIRST,
    )

    sdf = robots_signals(_docs(spark))
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    con.sql("CREATE TABLE pages (url VARCHAR, html VARCHAR)")
    con.executemany("INSERT INTO pages VALUES (?, ?)", _pages())
    # identical patterns; DuckDB needs the embedded quotes doubled
    mnf = _META_NAME_FIRST.replace("'", "''")
    mcf = _META_CONTENT_FIRST.replace("'", "''")
    lrf = _LINK_REL_FIRST.replace("'", "''")
    lhf = _LINK_HREF_FIRST.replace("'", "''")
    # 'none' implies noindex and nofollow, mirroring _directive
    tok = r"(^|[\s,])({d}|none)([\s,]|$)"
    tok_plain = r"(^|[\s,]){d}([\s,]|$)"
    orc = con.sql(f"""
WITH s AS (
  SELECT url, lower(html) AS low, html AS orig FROM pages
),
c AS (
  SELECT url,
    coalesce(nullif(regexp_extract(low, '{mnf}', 1), ''),
             nullif(regexp_extract(low, '{mnf}', 2), ''),
             nullif(regexp_extract(low, '{mnf}', 3), ''),
             nullif(regexp_extract(low, '{mcf}', 1), ''),
             nullif(regexp_extract(low, '{mcf}', 2), ''),
             nullif(regexp_extract(low, '{mcf}', 3), ''), '') AS robots_content,
    coalesce(nullif(regexp_extract(orig, '{lrf}', 1), ''),
             nullif(regexp_extract(orig, '{lrf}', 2), ''),
             nullif(regexp_extract(orig, '{lrf}', 3), ''),
             nullif(regexp_extract(orig, '{lhf}', 1), ''),
             nullif(regexp_extract(orig, '{lhf}', 2), ''),
             nullif(regexp_extract(orig, '{lhf}', 3), '')) AS canonical_href
  FROM s
)
SELECT url, robots_content, '' AS header_content,
       regexp_matches(robots_content, '{tok.format(d="noindex")}') AS noindex,
       regexp_matches(robots_content, '{tok.format(d="nofollow")}') AS nofollow,
       regexp_matches(robots_content, '{tok_plain.format(d="noarchive")}') AS noarchive,
       canonical_href
FROM c
""")
    orows = [tuple(r) for r in orc.fetchall()]
    assert len(srows) == len(orows)
    assert sorted(sdf.columns) == sorted(orc.columns)
    assert value_hash(sdf.columns, srows) == value_hash(orc.columns, orows)


def test_x_robots_tag_header_merge(spark):
    """The header half of the protocol (r4 verdict item #9): a column
    named x_robots_tag is auto-detected and its whole-token directives
    union with the meta's — including UA-scoped values, conservatively."""
    rows = [
        ("http://h.com/1", b"<p>plain</p>", "noindex"),
        ("http://h.com/2", b"<p>plain</p>", "googlebot: noindex"),
        ("http://h.com/3", b"<p>plain</p>", "noarchive, nofollow"),
        ("http://h.com/4", b"<p>plain</p>", "noindexing"),  # whole-token only
        ("http://h.com/5", b"<p>plain</p>", None),
        ("http://h.com/6", b'<meta name="robots" content="noindex">', None),
        ("http://h.com/7", b"<p>plain</p>", "none"),  # none == noindex
    ]
    docs = spark.createDataFrame(
        rows, "url string, html binary, x_robots_tag string"
    )
    sig = {r["url"]: r for r in robots_signals(docs).collect()}
    assert sig["http://h.com/1"]["noindex"] is True
    assert sig["http://h.com/1"]["header_content"] == "noindex"
    assert sig["http://h.com/2"]["noindex"] is True  # UA-scoped: conservative
    assert sig["http://h.com/3"]["noindex"] is False
    assert sig["http://h.com/3"]["nofollow"] is True
    assert sig["http://h.com/3"]["noarchive"] is True
    assert sig["http://h.com/4"]["noindex"] is False
    assert sig["http://h.com/5"]["noindex"] is False
    assert sig["http://h.com/6"]["noindex"] is True  # meta half still works
    assert sig["http://h.com/7"]["noindex"] is True

    kept = {r["url"] for r in apply_robots_optout(docs).collect()}
    assert kept == {"http://h.com/3", "http://h.com/4", "http://h.com/5"}

    # without the column, nothing changes (the pre-envelope behavior)
    plain = docs.drop("x_robots_tag")
    kept_plain = {r["url"] for r in apply_robots_optout(plain).collect()}
    assert kept_plain == {u for u, _h, _x in rows} - {"http://h.com/6"}


ROBOTS_TXT = """\
# site policy
User-agent: specialbot
Disallow: /private/

User-agent: *
Disallow: /tmp/
Disallow: /search$
Allow: /tmp/public/
Disallow: /*.pdf$
Allow:
Crawl-delay: 2

User-agent: otherbot
User-agent: thirdbot
Disallow: /
"""


def test_parse_robots_txt_rules():
    from fusus_spark.operators.robots import _rule_regex, parse_robots_txt_rules

    # '*' agent gets the wildcard group (empty Allow: dropped per RFC)
    assert parse_robots_txt_rules(ROBOTS_TXT, "*") == [
        (False, "/tmp/"), (False, "/search$"),
        (True, "/tmp/public/"), (False, "/*.pdf$"),
    ]
    # a named agent gets ITS group, never the wildcard fallback
    assert parse_robots_txt_rules(ROBOTS_TXT, "specialbot") == [(False, "/private/")]
    # two user-agent lines share one group
    assert parse_robots_txt_rules(ROBOTS_TXT, "thirdbot") == [(False, "/")]
    # a matching group with no rules governs (allow-all), no fallback;
    # the empty Disallow closes the group (RFC: consecutive user-agent
    # lines — even across blank lines — would otherwise share a group)
    txt = "User-agent: emptybot\nDisallow:\n\nUser-agent: *\nDisallow: /\n"
    assert parse_robots_txt_rules(txt, "emptybot") == []
    assert parse_robots_txt_rules(txt, "someone") == [(False, "/")]
    # and WITHOUT a rule line between them, both agents share the group
    shared = "User-agent: emptybot\n\nUser-agent: *\nDisallow: /\n"
    assert parse_robots_txt_rules(shared, "emptybot") == [(False, "/")]
    assert parse_robots_txt_rules("", "*") == []
    # pattern translation: wildcards, anchors, escaped metacharacters
    assert _rule_regex("/a/*.pdf$") == r"^/a/.*\.pdf$"
    assert _rule_regex("/plain") == "^/plain"
    assert _rule_regex("/q?x=(1)") == r"^/q\?x=\(1\)"


def test_parse_robots_crawl_delay():
    from fusus_spark.operators.robots import parse_robots_crawl_delay

    txt = (
        "User-agent: fastbot\n"
        "Disallow: /tmp/\n"
        "Crawl-delay: 2\n"
        "\n"
        "User-agent: *\n"
        "Crawl-delay: 10\n"
        "Disallow: /x\n"
    )
    # specific group's delay; '*' fallback for everyone else
    assert parse_robots_crawl_delay(txt, "fastbot") == 2.0
    assert parse_robots_crawl_delay(txt, "otherbot") == 10.0
    # a specific group EXISTS but declares no delay: no fallback
    silent = "User-agent: quietbot\nDisallow: /a\n\nUser-agent: *\nCrawl-delay: 9\n"
    assert parse_robots_crawl_delay(silent, "quietbot") is None
    # several delays in the governing union fold to the MAX
    multi = ("User-agent: bot\nCrawl-delay: 3\nDisallow: /a\n"
             "User-agent: bot\nCrawl-delay: 7\nDisallow: /b\n")
    assert parse_robots_crawl_delay(multi, "bot") == 7.0
    # sub-second floats pass; junk/negative/inf ignored
    assert parse_robots_crawl_delay("User-agent: *\nCrawl-delay: 0.5\n", "*") == 0.5
    assert parse_robots_crawl_delay("User-agent: *\nCrawl-delay: soon\n", "*") is None
    assert parse_robots_crawl_delay("User-agent: *\nCrawl-delay: -1\n", "*") is None
    assert parse_robots_crawl_delay("User-agent: *\nCrawl-delay: inf\n", "*") is None
    # delay before any group line: no governing agent, ignored
    assert parse_robots_crawl_delay("Crawl-delay: 4\nUser-agent: *\n", "*") is None
    assert parse_robots_crawl_delay("", "*") is None
    # consecutive delay-ONLY groups stay separate groups: a crawl-delay
    # line is group body here (review finding — without this, fastbot
    # inherited slowbot's 7200 via the merged group and got k=0)
    only = ("User-agent: fastbot\nCrawl-delay: 1\n\n"
            "User-agent: slowbot\nCrawl-delay: 7200\n")
    assert parse_robots_crawl_delay(only, "fastbot") == 1.0
    assert parse_robots_crawl_delay(only, "slowbot") == 7200.0
    # absurd-but-finite values are junk, not an int64 overflow later
    assert parse_robots_crawl_delay("User-agent: *\nCrawl-delay: 1e17\n", "*") is None


def test_robots_crawl_delays_frame(spark):
    from fusus_spark.operators.robots import robots_crawl_delays

    robots = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nCrawl-delay: 1.5\nDisallow: /x\n"),
            ("b.com", "User-agent: *\nDisallow: /x\n"),   # no delay: no row
            ("c.com", None),                              # junk-safe
            ("d.com", "User-agent: *\nCrawl-delay: 1e17\n"),  # junk: no row,
            # and crucially no Arrow int64 overflow crash
        ],
        "host string, robots_txt string",
    )
    got = {r["host"]: r["crawl_delay_ms"]
           for r in robots_crawl_delays(robots).collect()}
    assert got == {"a.com": 1500}


def test_apply_robots_txt_matches_duckdb_oracle(spark):
    """The file half of the protocol: parse goldens above; here the
    JVM match/precedence stage (longest match wins, allow wins ties,
    absence is consent) against a DuckDB oracle over the SAME parsed
    rules table — beyond-cap in-test oracle discipline."""
    import duckdb

    from fusus_spark.operators.robots import apply_robots_txt, robots_txt_rules

    a_txt = ROBOTS_TXT.replace(
        "Disallow: /tmp/\n", "Disallow: /tmp/\nDisallow: /*?sessionid=\n"
    )
    robots = spark.createDataFrame(
        [("a.com", a_txt),
         ("b.com", "User-agent: *\nDisallow: /\nAllow: /pub/\n")],
        "host string, robots_txt string",
    )
    rules = robots_txt_rules(robots, agent="*")
    urls = [
        "http://a.com/",                    # no match: allowed
        "http://a.com/tmp/x",               # /tmp/ disallow
        "http://a.com/tmp/public/x",        # longer allow wins
        "http://a.com/search",              # $-anchored disallow
        "http://a.com/search/results",      # anchor must NOT match
        "http://a.com/search?q=x",          # query defeats the $ anchor
        "http://a.com/page?sessionid=7",    # query-targeting rule fires
        "http://a.com/docs/file.pdf",       # /*.pdf$ wildcard disallow
        "http://a.com/docs/file.pdf.html",  # $ anchor: allowed
        "http://b.com/anything",            # blanket disallow
        "http://b.com/pub/ok",              # allow same-length+ wins
        "http://c.com/no/robots/at/all",    # host without rules
    ]
    docs = spark.createDataFrame([(u,) for u in urls], "url string")
    kept = {r["url"] for r in apply_robots_txt(docs, rules).collect()}
    assert kept == {
        "http://a.com/",
        "http://a.com/tmp/public/x",
        "http://a.com/search/results",
        "http://a.com/search?q=x",
        "http://a.com/docs/file.pdf.html",
        "http://b.com/pub/ok",
        "http://c.com/no/robots/at/all",
    }

    from tools.parity import value_hash

    con = duckdb.connect()
    con.sql("CREATE TABLE urls (url VARCHAR)")
    con.executemany("INSERT INTO urls VALUES (?)", [(u,) for u in urls])
    con.sql("CREATE TABLE rules (host VARCHAR, allow BOOLEAN, pattern VARCHAR, "
            "pattern_len INT, regex VARCHAR)")
    con.executemany("INSERT INTO rules VALUES (?, ?, ?, ?, ?)",
                    [tuple(r) for r in rules.collect()])
    host_re = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"
    path_re = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
    orc = con.sql(f"""
WITH k0 AS (
  SELECT url, lower(regexp_extract(url, '{host_re}', 1)) AS host,
         CASE WHEN regexp_extract(url, '{path_re}', 1) = '' THEN '/'
              ELSE regexp_extract(url, '{path_re}', 1) END AS p,
         regexp_extract(url, '\\?([^#]*)', 1) AS q
  FROM urls
),
k AS (
  SELECT url, host,
         CASE WHEN q = '' THEN p ELSE p || '?' || q END AS path
  FROM k0
),
j AS (
  SELECT k.url, r.allow, r.pattern_len,
         r.regex IS NOT NULL AND regexp_matches(k.path, r.regex) AS m
  FROM k LEFT JOIN rules r ON k.host = r.host
),
v AS (
  SELECT url, max(CASE WHEN m THEN struct_pack(l := pattern_len, a := allow) END) AS verdict
  FROM j GROUP BY url
)
SELECT url FROM v WHERE verdict IS NULL OR verdict.a
""")
    orows = [tuple(r) for r in orc.fetchall()]
    assert {r[0] for r in orows} == kept
    sdf = apply_robots_txt(docs, rules).select("url")
    assert value_hash(["url"], [tuple(r) for r in sdf.collect()]) == \
        value_hash(["url"], orows)


def test_robots_sitemaps(spark):
    """Sitemap lines are group-independent (RFC 9309 §2.3): harvested
    from anywhere in the file, mixed case, comments stripped; DuckDB
    oracle over the identical regexp."""
    import duckdb

    from fusus_spark.operators.robots import robots_sitemaps
    from tools.parity import value_hash

    rows = [
        ("a.com", ROBOTS_TXT
         + "Sitemap: https://a.com/sitemap.xml\n"
           "  sitemap:https://a.com/news.xml # indented + the news one\n"),
        ("b.com", "SITEMAP: https://b.com/s.xml\nUser-agent: *\nDisallow: /\n"),
        ("c.com", "User-agent: *\nDisallow:\n"),   # none declared
        ("d.com", None),
    ]
    robots = spark.createDataFrame(rows, "host string, robots_txt string")
    sdf = robots_sitemaps(robots)
    got = {(r["host"], r["sitemap_url"]) for r in sdf.collect()}
    assert got == {
        ("a.com", "https://a.com/sitemap.xml"),
        ("a.com", "https://a.com/news.xml"),
        ("b.com", "https://b.com/s.xml"),
    }

    con = duckdb.connect()
    con.sql("CREATE TABLE robots (host VARCHAR, robots_txt VARCHAR)")
    con.executemany("INSERT INTO robots VALUES (?, ?)", rows)
    orc = con.sql(r"""
WITH l AS (
  SELECT host, unnest(string_split_regex(coalesce(robots_txt, ''), '\r?\n')) AS ln
  FROM robots
),
m AS (
  SELECT host, regexp_extract(regexp_replace(ln, '#.*$', ''),
         '^[ \t]*[sS][iI][tT][eE][mM][aA][pP]\s*:\s*(\S+)', 1) AS sitemap_url
  FROM l
)
SELECT host, sitemap_url FROM m WHERE sitemap_url <> ''
""")
    orows = [tuple(r) for r in orc.fetchall()]
    assert value_hash(sdf.columns, [tuple(r) for r in sdf.collect()]) == \
        value_hash(orc.columns, orows)


def test_robots_never_raise_on_junk(spark):
    rows = [("http://x.com/a", b"\xff\xfe<meta name='robots' content='noindex'>"),
            ("http://x.com/b", None),
            ("http://x.com/c", b"")]
    docs = spark.createDataFrame(rows, "url string, html binary")
    got = {r["url"]: r for r in robots_signals(docs).collect()}
    assert got["http://x.com/a"]["noindex"] is True
    assert got["http://x.com/b"]["robots_content"] == ""
    assert got["http://x.com/c"]["noindex"] is False


def _robots_fetch_log() -> list[tuple[str, int | None, str]]:
    """(host, http_status, fetched_at): one host per RFC 9309 §2.3.1
    policy branch, plus staleness variants."""
    return [
        ("ok.com", 200, "2026-02-20 12:00:00"),          # parse, fresh
        ("stale.com", 200, "2026-02-19 00:00:00"),       # parse, stale
        ("gone.com", 404, "2026-02-20 12:00:00"),        # unavailable
        ("redir.com", 301, "2026-02-20 12:00:00"),       # loop residue
        # fresh outage: reachable 3 days ago -> MUST disallow
        ("down.com", 200, "2026-02-18 00:00:00"),
        ("down.com", 503, "2026-02-20 12:00:00"),
        # continuously unreachable 51 days WITH a cached body
        ("longdown.com", 200, "2025-12-01 00:00:00"),
        ("longdown.com", 503, "2026-01-01 00:00:00"),
        ("longdown.com", 503, "2026-02-19 00:00:00"),
        # unreachable 51 days, never served a body
        ("neverup.com", None, "2026-01-01 00:00:00"),
        ("neverup.com", 503, "2026-02-20 12:00:00"),
        # network failure half a day ago -> grace not reached
        ("freshdown.com", None, "2026-02-20 12:00:00"),
        # fine 51 days ago, UNOBSERVED since, one failure yesterday:
        # the streak clock starts at the failure, not the last success
        ("blip.com", 200, "2026-01-01 00:00:00"),
        ("blip.com", 503, "2026-02-20 12:00:00"),
        # body served, then 404 (cache invalidated), then a long
        # outage: the dead body must NOT be resurrected after grace
        ("deadbody.com", 200, "2025-11-01 00:00:00"),
        ("deadbody.com", 404, "2025-11-05 00:00:00"),
        ("deadbody.com", 503, "2025-12-01 00:00:00"),
        ("deadbody.com", 503, "2026-02-19 00:00:00"),
    ]


def test_robots_fetch_policy(spark):
    """RFC 9309 §2.3.1 access policy + §2.4 cache staleness from the
    robots fetch log; every branch hand-pinned, DuckDB-oracled."""
    from fusus_spark.operators.robots import robots_fetch_policy

    rows = _robots_fetch_log()
    df = spark.createDataFrame(
        rows, "host string, http_status int, fetched_at string")
    sdf = robots_fetch_policy(df, as_of_ts="2026-02-21 00:00:00")
    got = {r["host"]: r for r in sdf.collect()}
    assert got["ok.com"]["policy"] == "parse"
    assert not got["ok.com"]["needs_refetch"]          # 12 h old
    assert got["stale.com"]["policy"] == "parse"
    assert got["stale.com"]["needs_refetch"]           # 48 h old
    assert got["gone.com"]["policy"] == "allow_all"
    assert got["redir.com"]["policy"] == "allow_all"
    assert got["down.com"]["policy"] == "disallow_all"  # 3 d, within grace
    assert got["down.com"]["last_status"] == 503
    assert got["longdown.com"]["policy"] == "parse_cached"  # 51 d, had body
    assert got["longdown.com"]["needs_refetch"]        # 48 h old
    assert got["neverup.com"]["policy"] == "allow_all"  # 51 d, no body ever
    assert got["freshdown.com"]["policy"] == "disallow_all"
    assert got["freshdown.com"]["last_status"] == 0     # no HTTP response
    # streak anchored on the first TRAILING failure: half a day of
    # observed outage, not 51 days since the last success
    assert got["blip.com"]["policy"] == "disallow_all"
    # last reachable fetch was a 404 -> cached body is dead; after
    # grace the fallback is allow_all, never parse_cached
    assert got["deadbody.com"]["policy"] == "allow_all"

    con = duckdb.connect()
    con.sql("CREATE TABLE log (host VARCHAR, http_status INT, fetched_at VARCHAR)")
    con.executemany("INSERT INTO log VALUES (?, ?, ?)", rows)
    orc = con.sql("""
WITH l AS (
  SELECT host, coalesce(http_status, 0)::INT AS s, fetched_at FROM log
),
mk AS (
  SELECT host, s, fetched_at,
         max(CASE WHEN s BETWEEN 200 AND 499 THEN fetched_at END)
           OVER (PARTITION BY host ORDER BY fetched_at, s
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS rev_reach
  FROM l
),
g AS (
  SELECT host,
         string_split(max(fetched_at || chr(1) || lpad(s::VARCHAR, 3, '0')), chr(1)) AS m,
         min(CASE WHEN s NOT BETWEEN 200 AND 499 AND rev_reach IS NULL
                  THEN fetched_at END) AS since,
         string_split(max(CASE WHEN s BETWEEN 200 AND 499
             THEN fetched_at || chr(1) || lpad(s::VARCHAR, 3, '0') END), chr(1)) AS r
  FROM mk GROUP BY host
),
p AS (
  SELECT host, CAST(m[2] AS INT) AS last_status, m[1] AS last_fetch_ts,
         (epoch(TIMESTAMP '2026-02-21 00:00:00') - epoch(CAST(m[1] AS TIMESTAMP))) / 3600.0 AS age_h,
         (epoch(TIMESTAMP '2026-02-21 00:00:00')
          - epoch(CAST(since AS TIMESTAMP))) / 86400.0 AS unreach_d,
         CAST(r[2] AS INT) BETWEEN 200 AND 299 AS cached_live
  FROM g
)
SELECT host, last_status, last_fetch_ts,
       CASE WHEN last_status BETWEEN 200 AND 299 THEN 'parse'
            WHEN last_status BETWEEN 300 AND 499 THEN 'allow_all'
            WHEN unreach_d > 30 THEN
              CASE WHEN cached_live THEN 'parse_cached' ELSE 'allow_all' END
            ELSE 'disallow_all' END AS policy,
       age_h > 24 AS needs_refetch
FROM p
""")
    srows = [tuple(r) for r in sdf.collect()]
    orows = [tuple(r) for r in orc.fetchall()]
    assert len(srows) == len(orows) > 0
    assert sorted(sdf.columns) == sorted(orc.columns)
    assert value_hash(sdf.columns, srows) == value_hash(orc.columns, orows)
