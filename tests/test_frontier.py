"""Crawl-frontier signal tests: hand-pinned churn cases + DuckDB hash
cross-checks (beyond the 50-query registry, so the oracles run
in-test), plus the deterministic revisit-priority arithmetic."""

from __future__ import annotations

import duckdb

from fusus_spark.functions.url import _HOST_RE
from fusus_spark.operators.frontier import (
    host_change_stats,
    revisit_priority,
    url_change_stats,
)
from tools.parity import value_hash

# the IMPORTED host pattern (single-backslash python-level escapes for
# DuckDB's verbatim string literals) — never a hand-copied duplicate
_HOST_RE_SQL = _HOST_RE.replace("'", "''")


def _snapshots() -> list[tuple[str, str, str]]:
    """(url, content_hash, crawl_date): a churner, a static page, a
    single-observation url, and a host mixing both."""
    rows = []
    # churns every snapshot
    for i, d in enumerate(["2026-01-01", "2026-01-08", "2026-01-15", "2026-01-22"]):
        rows.append(("http://news.com/front", f"h{i}", d))
    # static across 3 snapshots
    for d in ["2026-01-01", "2026-01-08", "2026-01-15"]:
        rows.append(("http://docs.com/page", "same", d))
    # changes once in 3 intervals
    for hsh, d in [("a", "2026-01-01"), ("a", "2026-01-08"),
                   ("b", "2026-01-15"), ("b", "2026-01-22")]:
        rows.append(("http://mix.com/x", hsh, d))
    rows.append(("http://mix.com/once", "solo", "2026-01-10"))
    # duplicate (url, date) rows: tie-break must stay deterministic
    rows.append(("http://docs.com/page", "same", "2026-01-15"))
    return rows


def test_url_change_stats_hand_cases(spark):
    df = spark.createDataFrame(
        _snapshots(), "url string, content_hash string, crawl_date string"
    )
    got = {r["url"]: r for r in url_change_stats(df).collect()}
    assert got["http://news.com/front"]["n_changes"] == 3
    assert got["http://news.com/front"]["change_ratio_e6"] == 1_000_000
    assert got["http://news.com/front"]["last_hash"] == "h3"
    assert got["http://docs.com/page"]["n_changes"] == 0
    assert got["http://docs.com/page"]["n_snapshots"] == 4  # incl. the dup row
    assert got["http://mix.com/x"]["n_changes"] == 1
    assert got["http://mix.com/x"]["change_ratio_e6"] == 333_333
    assert got["http://mix.com/once"]["n_snapshots"] == 1
    assert got["http://mix.com/once"]["change_ratio_e6"] == 0


def test_url_change_stats_on_etag_validator(spark):
    """hash_col='etag': the HTTP validator retained at WARC ingest is
    a drop-in change signal — same math, no content hashing. Output
    columns stay identically named, so downstream rollups are blind to
    which signal fed them."""
    rows = [(u, h, d) for u, h, d in _snapshots()]
    df = spark.createDataFrame(
        rows, "url string, etag string, crawl_date string"
    )
    got = {r["url"]: r for r in url_change_stats(df, hash_col="etag").collect()}
    assert got["http://news.com/front"]["n_changes"] == 3
    assert got["http://news.com/front"]["last_hash"] == "h3"
    assert got["http://docs.com/page"]["n_changes"] == 0
    assert got["http://mix.com/x"]["change_ratio_e6"] == 333_333


def test_url_change_stats_null_validators(spark):
    """A null validator (the server omitted ETag on that fetch) carries
    no information: each observed value compares against the last
    OBSERVED one, the ratio counts only informative comparisons, and
    last_hash is the last observed validator — e1, null, e2 must read
    as ONE change, not as perfectly static."""
    rows = [
        ("http://flaky.com/a", "e1", "2026-01-01"),
        ("http://flaky.com/a", None, "2026-01-02"),
        ("http://flaky.com/a", "e2", "2026-01-03"),
        # trailing omission: the change signal and validator survive
        ("http://trail.com/b", "e1", "2026-01-01"),
        ("http://trail.com/b", "e1", "2026-01-02"),
        ("http://trail.com/b", None, "2026-01-03"),
        # never observed: no evidence is not evidence of change
        ("http://naked.com/c", None, "2026-01-01"),
        ("http://naked.com/c", None, "2026-01-02"),
    ]
    df = spark.createDataFrame(
        rows, "url string, etag string, crawl_date string"
    )
    got = {r["url"]: r for r in url_change_stats(df, hash_col="etag").collect()}
    f = got["http://flaky.com/a"]
    assert f["n_snapshots"] == 3 and f["n_changes"] == 1
    assert f["change_ratio_e6"] == 1_000_000  # 1 change / 1 comparison
    assert f["last_hash"] == "e2"
    t = got["http://trail.com/b"]
    assert t["n_changes"] == 0 and t["last_hash"] == "e1"
    n = got["http://naked.com/c"]
    assert n["n_changes"] == 0 and n["change_ratio_e6"] == 0
    assert n["last_hash"] is None


def test_url_and_host_change_stats_match_duckdb(spark):
    df = spark.createDataFrame(
        _snapshots(), "url string, content_hash string, crawl_date string"
    )
    sdf = url_change_stats(df)
    con = duckdb.connect()
    con.sql("CREATE TABLE snaps (url VARCHAR, content_hash VARCHAR, crawl_date VARCHAR)")
    con.executemany("INSERT INTO snaps VALUES (?, ?, ?)", _snapshots())
    orc = con.sql("""
WITH o AS (
  SELECT url, content_hash, crawl_date,
         lag(content_hash) OVER (PARTITION BY url ORDER BY crawl_date, content_hash) AS prev
  FROM snaps
),
g AS (
  SELECT url, count(*)::INT AS n_snapshots,
         sum(CASE WHEN prev IS NOT NULL AND content_hash != prev THEN 1 ELSE 0 END)::INT AS n_changes,
         min(crawl_date) AS first_date, max(crawl_date) AS last_date,
         max(crawl_date || chr(1) || content_hash) AS mx
  FROM o GROUP BY url
)
SELECT url, n_snapshots, n_changes, first_date, last_date,
       string_split(mx, chr(1))[2] AS last_hash,
       CASE WHEN n_snapshots > 1
            THEN round(n_changes / (n_snapshots - 1) * 1000000)
            ELSE 0 END::BIGINT AS change_ratio_e6
FROM g
""")
    srows = [tuple(r) for r in sdf.collect()]
    orows = [tuple(r) for r in orc.fetchall()]
    assert len(srows) == len(orows)
    assert sorted(sdf.columns) == sorted(orc.columns)
    assert value_hash(sdf.columns, srows) == value_hash(orc.columns, orows)

    hdf = host_change_stats(sdf)
    horc = con.sql(f"""
WITH o AS (
  SELECT url, content_hash, crawl_date,
         lag(content_hash) OVER (PARTITION BY url ORDER BY crawl_date, content_hash) AS prev
  FROM snaps
),
g AS (
  SELECT url, count(*) AS n_snapshots,
         sum(CASE WHEN prev IS NOT NULL AND content_hash != prev THEN 1 ELSE 0 END) AS n_changes
  FROM o GROUP BY url
),
u AS (
  SELECT lower(regexp_extract(url, '{_HOST_RE_SQL}', 1)) AS host,
         CASE WHEN n_snapshots > 1
              THEN round(n_changes / (n_snapshots - 1) * 1000000)
              ELSE 0 END::BIGINT AS cr
  FROM g
)
SELECT host, count(*)::INT AS n_urls,
       round(avg(cr))::BIGINT AS mean_change_ratio_e6,
       sum(CASE WHEN cr > 500000 THEN 1 ELSE 0 END)::INT AS n_hot_urls,
       round(sum(CASE WHEN cr > 500000 THEN 1 ELSE 0 END) / count(*) * 1000000)::BIGINT AS hot_ratio_e6
FROM u WHERE host != '' GROUP BY host
""")
    hrows = [tuple(r) for r in hdf.collect()]
    horows = [tuple(r) for r in horc.fetchall()]
    assert len(hrows) == len(horows)
    assert value_hash(hdf.columns, hrows) == value_hash(horc.columns, horows)


def test_revisit_priority(spark):
    df = spark.createDataFrame(
        _snapshots(), "url string, content_hash string, crawl_date string"
    )
    sdf = revisit_priority(
        url_change_stats(df), as_of_date="2026-02-21", halflife_days=30
    )
    got = {r["url"]: r for r in sdf.collect()}

    # DuckDB oracle: identical Laplace-smoothed churn x staleness rule
    con = duckdb.connect()
    con.sql("CREATE TABLE snaps (url VARCHAR, content_hash VARCHAR, crawl_date VARCHAR)")
    con.executemany("INSERT INTO snaps VALUES (?, ?, ?)", _snapshots())
    orc = con.sql("""
WITH o AS (
  SELECT url, content_hash, crawl_date,
         lag(content_hash) OVER (PARTITION BY url ORDER BY crawl_date, content_hash) AS prev
  FROM snaps
),
g AS (
  SELECT url, count(*)::INT AS n_snapshots,
         sum(CASE WHEN prev IS NOT NULL AND content_hash != prev THEN 1 ELSE 0 END)::INT AS n_changes,
         max(crawl_date) AS last_date
  FROM o GROUP BY url
)
SELECT url, n_snapshots, n_changes, last_date,
       round((n_changes + 1) / (n_snapshots - 1 + 2)
             * greatest(datediff('day', CAST(last_date AS DATE), DATE '2026-02-21'), 0)
             / 30 * 1000000)::BIGINT AS priority_e6
FROM g
""")
    orows = [tuple(r) for r in orc.fetchall()]
    srows = [tuple(r) for r in sdf.collect()]
    assert len(srows) == len(orows)
    assert sorted(sdf.columns) == sorted(orc.columns)
    assert value_hash(sdf.columns, srows) == value_hash(orc.columns, orows)
    # churner: smoothed (3+1)/(3+2)=0.8, stale 30d -> 0.8 * 30/30 = 0.8
    assert got["http://news.com/front"]["priority_e6"] == 800_000
    # static: (0+1)/(3+2)=0.2, stale 37d -> round(0.2*37/30*1e6)
    assert got["http://docs.com/page"]["priority_e6"] == round(0.2 * 37 / 30 * 1e6)
    # single snapshot: 0.5 prior, stale 42d
    assert got["http://mix.com/once"]["priority_e6"] == round(0.5 * 42 / 30 * 1e6)
    # churny urls outrank static ones at comparable staleness
    assert (got["http://news.com/front"]["priority_e6"]
            > got["http://docs.com/page"]["priority_e6"])


# ---------------------------------------------------------------------------
# Sitemap entry parsing (parse_sitemap_entries)


def _sitemap_rows() -> list[tuple[str, str]]:
    """(sitemap_url, xml): a urlset with full/partial/loc-less/bad-
    priority entries, a sitemapindex, empty + NULL payloads, and an
    entity-ordering probe (&amp;lt; must round-trip to a literal
    '&lt;', never '<')."""
    return [
        ("https://a.com/sitemap.xml",
         '<?xml version="1.0" encoding="UTF-8"?>\n'
         '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
         '<url><loc>https://a.com/page?x=1&amp;y=2</loc>'
         '<lastmod>2026-01-05</lastmod><changefreq>daily</changefreq>'
         '<priority>0.8</priority></url>\n'
         '<url><loc>\n  https://a.com/plain  \n</loc></url>\n'
         '<url><lastmod>2026-01-01</lastmod></url>\n'
         '<url><loc>https://a.com/bad</loc><priority>high</priority></url>\n'
         '</urlset>'),
        ("https://a.com/sitemap_index.xml",
         '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
         '<sitemap><loc>https://a.com/s1.xml</loc>'
         '<lastmod>2026-02-01</lastmod></sitemap>'
         '<sitemap><loc>https://a.com/s2.xml</loc></sitemap>'
         '</sitemapindex>'),
        ("https://b.com/empty.xml", ""),
        ("https://b.com/null.xml", None),
        ("https://c.com/esc.xml",
         '<urlset><url><loc>https://c.com/?q=&amp;lt;tag&amp;gt;&quot;&apos;'
         '</loc></url></urlset>'),
    ]


def test_parse_sitemap_entries_hand_cases(spark):
    from fusus_spark.operators.frontier import parse_sitemap_entries

    df = spark.createDataFrame(_sitemap_rows(), "sitemap_url string, xml string")
    rows = parse_sitemap_entries(df).collect()
    by_loc = {r["loc"]: r for r in rows}

    # loc-less entry dropped; empty/NULL xml contribute nothing
    assert len(rows) == 6
    full = by_loc["https://a.com/page?x=1&y=2"]  # &amp; unescaped
    assert full["kind"] == "urlset"
    assert full["lastmod"] == "2026-01-05"
    assert full["changefreq"] == "daily"
    assert full["priority_e6"] == 800_000
    plain = by_loc["https://a.com/plain"]  # whitespace-trimmed loc
    assert plain["lastmod"] is None and plain["priority_e6"] is None
    assert by_loc["https://a.com/bad"]["priority_e6"] is None  # non-numeric
    # index entries point at further sitemaps
    assert by_loc["https://a.com/s1.xml"]["kind"] == "index"
    assert by_loc["https://a.com/s1.xml"]["lastmod"] == "2026-02-01"
    assert by_loc["https://a.com/s2.xml"]["kind"] == "index"
    # &amp;lt; -> literal &lt; (amp replaced LAST), quot/apos unescaped
    assert by_loc["https://c.com/?q=&lt;tag&gt;\"'"]["kind"] == "urlset"


def test_parse_sitemap_entries_matches_duckdb(spark):
    from fusus_spark.operators.frontier import parse_sitemap_entries

    df = spark.createDataFrame(_sitemap_rows(), "sitemap_url string, xml string")
    sdf = parse_sitemap_entries(df)
    con = duckdb.connect()
    con.sql("CREATE TABLE sm (sitemap_url VARCHAR, xml VARCHAR)")
    con.executemany("INSERT INTO sm VALUES (?, ?)", _sitemap_rows())
    orc = con.sql("""
WITH b AS (
  SELECT sitemap_url,
         CASE WHEN regexp_matches(x, '<\\s*sitemapindex[\\s>]')
              THEN 'index' ELSE 'urlset' END AS kind,
         unnest(CASE WHEN regexp_matches(x, '<\\s*sitemapindex[\\s>]')
                THEN regexp_extract_all(x, '<sitemap>([\\s\\S]*?)</sitemap>', 1)
                ELSE regexp_extract_all(x, '<url>([\\s\\S]*?)</url>', 1) END) AS e
  FROM (SELECT sitemap_url, coalesce(xml, '') AS x FROM sm)
), f AS (
  SELECT sitemap_url, kind,
         nullif(regexp_extract(e, '<loc>\\s*([\\s\\S]*?)\\s*</loc>', 1), '') AS raw_loc,
         nullif(regexp_extract(e, '<lastmod>\\s*([\\s\\S]*?)\\s*</lastmod>', 1), '') AS lastmod,
         nullif(regexp_extract(e, '<changefreq>\\s*([\\s\\S]*?)\\s*</changefreq>', 1), '') AS changefreq,
         nullif(regexp_extract(e, '<priority>\\s*([\\s\\S]*?)\\s*</priority>', 1), '') AS rawp
  FROM b
)
SELECT sitemap_url, kind,
       replace(replace(replace(replace(replace(raw_loc,
         '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&apos;', ''''),
         '&amp;', '&') AS loc,
       lastmod, changefreq,
       CAST(round(try_cast(rawp AS DOUBLE) * 1000000) AS BIGINT) AS priority_e6
FROM f WHERE raw_loc IS NOT NULL
""")
    srows = [tuple(r) for r in sdf.collect()]
    orows = [tuple(r) for r in orc.fetchall()]
    assert len(srows) == len(orows) > 0
    assert sorted(sdf.columns) == sorted(orc.columns)
    assert value_hash(sdf.columns, srows) == value_hash(orc.columns, orows)


# ---------------------------------------------------------------------------
# Unified fetch queue + politeness schedule


def test_sitemap_fetch_list(spark):
    """The sitemap recursion step: unparsed index children + unparsed
    robots roots queue for the sitemap fetcher; parsed files never
    requeue; iteration converges to empty. DuckDB-oracled."""
    from fusus_spark.operators.frontier import sitemap_fetch_list

    entry_rows = [
        # root index already parsed: names two children
        ("https://h.com/root.xml", "index", "https://h.com/a.xml",
         None, None, None),
        ("https://h.com/root.xml", "index", "https://h.com/b.xml",
         None, None, None),
        # a.xml also parsed already: one urlset entry + a grandchild
        ("https://h.com/a.xml", "urlset", "http://h.com/p/1",
         None, None, None),
        ("https://h.com/a.xml", "index", "https://h.com/c.xml",
         None, None, None),
    ]
    entries = spark.createDataFrame(
        entry_rows,
        "sitemap_url string, kind string, loc string, lastmod string, "
        "changefreq string, priority_e6 bigint",
    )
    roots = spark.createDataFrame(
        [("h.com", "https://h.com/root.xml"),   # parsed: not requeued
         ("h.com", "https://h.com/extra.xml")],  # declared, never seen
        "host string, sitemap_url string",
    )
    sdf = sitemap_fetch_list(entries, roots)
    got = {r["sitemap_url"] for r in sdf.collect()}
    assert got == {"https://h.com/b.xml", "https://h.com/c.xml",
                   "https://h.com/extra.xml"}

    con = duckdb.connect()
    con.sql("CREATE TABLE sm (sitemap_url VARCHAR, kind VARCHAR, loc VARCHAR, "
            "lastmod VARCHAR, changefreq VARCHAR, priority_e6 BIGINT)")
    con.executemany("INSERT INTO sm VALUES (?, ?, ?, ?, ?, ?)", entry_rows)
    con.sql("CREATE TABLE rt (host VARCHAR, sitemap_url VARCHAR)")
    con.executemany("INSERT INTO rt VALUES (?, ?)",
                    [("h.com", "https://h.com/root.xml"),
                     ("h.com", "https://h.com/extra.xml")])
    orows = con.sql("""
SELECT DISTINCT u FROM (
  SELECT loc AS u FROM sm WHERE kind = 'index'
  UNION ALL SELECT sitemap_url FROM rt
) WHERE u NOT IN (SELECT DISTINCT sitemap_url FROM sm)
""").fetchall()
    srows = [tuple(r) for r in sdf.collect()]
    assert len(srows) == len(orows) > 0
    assert value_hash(sdf.columns, srows) == value_hash(
        ["sitemap_url"], [tuple(r) for r in orows]
    )

    # convergence via the attempted log (the real contract): the next
    # round fetches b/c/extra — b parses fine, c 404s, extra is an
    # empty urlset. The failed/empty files contribute NO entries rows,
    # but the attempted log still retires them: nothing requeues.
    next_entries = entries.unionByName(spark.createDataFrame(
        [("https://h.com/b.xml", "urlset", "http://h.com/p/2",
          None, None, None)],
        entries.schema,
    ))
    attempted = spark.createDataFrame(
        [(u,) for u in ["https://h.com/root.xml", "https://h.com/a.xml",
                        "https://h.com/b.xml", "https://h.com/c.xml",
                        "https://h.com/extra.xml"]],
        "sitemap_url string",
    )
    assert sitemap_fetch_list(next_entries, roots, attempted).count() == 0
    # an INCOMPLETE log (e.g. restarted after the archive was built)
    # is repaired by the entries side: root/a/b are absent from the
    # log but we hold entries from them, so only the genuinely
    # entry-less failures (c 404'd, extra was empty) requeue
    partial = spark.createDataFrame(
        [("https://never-seen.example/x.xml",)], "sitemap_url string")
    got_partial = {r["sitemap_url"] for r in
                   sitemap_fetch_list(next_entries, roots, partial).collect()}
    assert got_partial == {"https://h.com/c.xml", "https://h.com/extra.xml"}
    # whereas the entries-only fallback WOULD requeue the entry-less
    # files — exactly why iteration must feed the fetch log
    fallback = {r["sitemap_url"] for r in
                sitemap_fetch_list(next_entries, roots).collect()}
    assert fallback == {"https://h.com/c.xml", "https://h.com/extra.xml"}


def test_fetch_queue_hand_cases(spark):
    from fusus_spark.operators.frontier import (
        fetch_queue, parse_sitemap_entries, url_change_stats)

    stats = url_change_stats(spark.createDataFrame(
        _snapshots(), "url string, content_hash string, crawl_date string"
    ))
    sm = parse_sitemap_entries(spark.createDataFrame([
        ("https://news.com/sm.xml",
         # known url (anti-joined away) + two fresh seeds, one twice
         # with different priorities (max wins), one priority-less
         "<urlset>"
         "<url><loc>http://news.com/front</loc><priority>0.9</priority></url>"
         "<url><loc>http://news.com/new</loc><priority>0.3</priority></url>"
         "<url><loc>http://other.com/page</loc></url>"
         "</urlset>"),
        ("https://news.com/sm2.xml",
         "<urlset><url><loc>http://news.com/new</loc>"
         "<priority>0.7</priority></url></urlset>"),
        ("https://news.com/index.xml",
         # index rows name sitemap FILES — never queued as content
         "<sitemapindex><sitemap><loc>https://news.com/sm.xml</loc>"
         "</sitemap></sitemapindex>"),
    ], "sitemap_url string, xml string"))
    q = {r["url"]: r for r in
         fetch_queue(stats, sm, as_of_date="2026-02-21").collect()}

    # 4 history urls + 2 fresh seeds; the known url stays a revisit
    assert len(q) == 6
    assert q["http://news.com/front"]["source"] == "revisit"
    assert q["http://news.com/front"]["priority_e6"] == 800_000
    assert q["http://news.com/front"]["last_hash"] == "h3"
    assert q["http://news.com/new"]["source"] == "seed"
    assert q["http://news.com/new"]["priority_e6"] == 700_000  # max of 0.3/0.7
    assert q["http://news.com/new"]["last_hash"] is None
    assert q["http://other.com/page"]["priority_e6"] == 500_000  # default
    assert "https://news.com/sm.xml" not in q  # index entry excluded


def test_fetch_queue_and_schedule_match_duckdb(spark):
    from fusus_spark.operators.frontier import (
        fetch_queue, schedule_fetches, url_change_stats)

    stats = url_change_stats(spark.createDataFrame(
        _snapshots(), "url string, content_hash string, crawl_date string"
    ))
    entries = [
        ("https://news.com/sm.xml", "urlset", "http://news.com/front", None, None, 900_000),
        ("https://news.com/sm.xml", "urlset", "http://news.com/new", None, None, 300_000),
        ("https://news.com/sm2.xml", "urlset", "http://news.com/new", None, None, 700_000),
        ("https://news.com/sm.xml", "urlset", "http://other.com/page", None, None, None),
        ("https://news.com/index.xml", "index", "https://news.com/sm.xml", None, None, None),
    ]
    sm = spark.createDataFrame(
        entries, "sitemap_url string, kind string, loc string, "
                 "lastmod string, changefreq string, priority_e6 bigint")
    qdf = fetch_queue(stats, sm, as_of_date="2026-02-21")
    sdf = schedule_fetches(qdf, k_per_host=1)

    con = duckdb.connect()
    con.sql("CREATE TABLE snaps (url VARCHAR, content_hash VARCHAR, crawl_date VARCHAR)")
    con.executemany("INSERT INTO snaps VALUES (?, ?, ?)", _snapshots())
    con.sql("CREATE TABLE sm (sitemap_url VARCHAR, kind VARCHAR, loc VARCHAR, "
            "lastmod VARCHAR, changefreq VARCHAR, priority_e6 BIGINT)")
    con.executemany("INSERT INTO sm VALUES (?, ?, ?, ?, ?, ?)", entries)
    queue_sql = """
WITH o AS (
  SELECT url, content_hash, crawl_date,
         lag(content_hash) OVER (PARTITION BY url ORDER BY crawl_date, content_hash) AS prev
  FROM snaps
),
g AS (
  SELECT url, count(*)::INT AS n_snapshots,
         sum(CASE WHEN prev IS NOT NULL AND content_hash != prev THEN 1 ELSE 0 END)::INT AS n_changes,
         max(crawl_date) AS last_date,
         string_split(max(crawl_date || chr(1) || content_hash), chr(1))[2] AS last_hash
  FROM o GROUP BY url
),
r AS (
  SELECT url, 'revisit' AS source,
         round((n_changes + 1) / (n_snapshots - 1 + 2)
               * greatest(datediff('day', CAST(last_date AS DATE), DATE '2026-02-21'), 0)
               / 30 * 1000000)::BIGINT AS priority_e6,
         last_hash
  FROM g
),
s AS (
  SELECT loc AS url, max(coalesce(priority_e6, 500000))::BIGINT AS priority_e6
  FROM sm WHERE kind = 'urlset' GROUP BY loc
)
SELECT * FROM r
UNION ALL
SELECT s.url, 'seed' AS source, s.priority_e6, NULL AS last_hash
FROM s LEFT JOIN g ON s.url = g.url WHERE g.url IS NULL
"""
    orc = con.sql(queue_sql)
    srows = [tuple(r) for r in qdf.collect()]
    orows = [tuple(r) for r in orc.fetchall()]
    assert len(srows) == len(orows) > 0
    assert sorted(qdf.columns) == sorted(orc.columns)
    assert value_hash(qdf.columns, srows) == value_hash(orc.columns, orows)

    sorc = con.sql(f"""
WITH q AS ({queue_sql}),
h AS (
  SELECT lower(regexp_extract(url, '{_HOST_RE_SQL}', 1)) AS host, *
  FROM q
)
SELECT host, url, source, priority_e6, last_hash, rank_in_host FROM (
  SELECT *, row_number() OVER (
    PARTITION BY host ORDER BY priority_e6 DESC, url)::INT AS rank_in_host
  FROM h WHERE host != ''
) WHERE rank_in_host <= 1
""")
    s2 = [tuple(r) for r in sdf.collect()]
    o2 = [tuple(r) for r in sorc.fetchall()]
    assert len(s2) == len(o2) > 0
    assert sorted(sdf.columns) == sorted(sorc.columns)
    assert value_hash(sdf.columns, s2) == value_hash(sorc.columns, o2)
    # politeness: exactly one url per host survives k=1
    hosts = [r[0] for r in s2]
    assert len(hosts) == len(set(hosts))


def test_fetch_queue_lastmod_announcements(spark):
    """announce_boost_e6: a sitemap <lastmod> newer than the url's
    last snapshot boosts its revisit priority to the floor; older or
    junk lastmods are inert; seeds are untouched. DuckDB-oracled."""
    from fusus_spark.operators.frontier import fetch_queue, url_change_stats

    stats = url_change_stats(spark.createDataFrame(
        _snapshots(), "url string, content_hash string, crawl_date string"
    ))
    entries = [
        # static page, publisher announces a change after our last
        # crawl (W3C datetime form) -> boosted to the floor
        ("https://d.com/sm.xml", "urlset", "http://docs.com/page",
         "2026-02-01T09:30:00+00:00", None, None),
        # announced BEFORE our last crawl (2026-01-22) -> inert
        ("https://n.com/sm.xml", "urlset", "http://news.com/front",
         "2026-01-20", None, 900_000),
        # two sitemaps disagree: max lastmod wins; the winner is a
        # W3C MONTH granularity (folds to 2026-02-01 > last crawl
        # 2026-01-22) -> boost, and the fold must agree with DuckDB
        ("https://m.com/sm.xml", "urlset", "http://mix.com/x",
         "2026-01-10", None, None),
        ("https://m.com/sm2.xml", "urlset", "http://mix.com/x",
         "2026-02", None, None),
        # junk lastmod parses to null -> ignored; a NON-ZERO-PADDED
        # date is junk BY CONTRACT (Spark's bare try_to_date would
        # parse '2026-2-5' and boost; DuckDB's DATE cast nulls it —
        # the regexp gate pins both to null), and YEAR granularity
        # folds to Jan 1 (2026-01-01 < last crawl 2026-01-10: inert)
        ("https://m.com/sm.xml", "urlset", "http://mix.com/once",
         "not-a-date", None, None),
        ("https://m.com/sm.xml", "urlset", "http://mix.com/once",
         "2026-2-5", None, None),
        ("https://m.com/sm.xml", "urlset", "http://mix.com/once",
         "2026", None, None),
        # never-crawled url: lastmod adds nothing beyond seed priority
        ("https://m.com/sm.xml", "urlset", "http://m.com/new",
         "2026-02-10", None, 300_000),
    ]
    sm = spark.createDataFrame(
        entries, "sitemap_url string, kind string, loc string, "
                 "lastmod string, changefreq string, priority_e6 bigint")
    qdf = fetch_queue(stats, sm, as_of_date="2026-02-21",
                      announce_boost_e6=900_000)
    q = {r["url"]: r for r in qdf.collect()}
    assert q["http://docs.com/page"]["priority_e6"] == 900_000   # boosted
    assert q["http://news.com/front"]["priority_e6"] == 800_000  # inert
    assert q["http://mix.com/x"]["priority_e6"] == 900_000       # max lastmod
    assert q["http://mix.com/once"]["priority_e6"] == 700_000    # junk
    assert q["http://m.com/new"]["source"] == "seed"
    assert q["http://m.com/new"]["priority_e6"] == 300_000
    # greatest(): a hotter-than-floor url keeps its own score
    # (docs/page: 4 snapshots incl. the duplicate row, 0 changes ->
    # smoothed 1/5, 37 days stale -> 246667 > the 100k floor)
    q2 = {r["url"]: r for r in
          fetch_queue(stats, sm, as_of_date="2026-02-21",
                      announce_boost_e6=100_000).collect()}
    assert q2["http://docs.com/page"]["priority_e6"] == 246_667

    con = duckdb.connect()
    con.sql("CREATE TABLE snaps (url VARCHAR, content_hash VARCHAR, crawl_date VARCHAR)")
    con.executemany("INSERT INTO snaps VALUES (?, ?, ?)", _snapshots())
    con.sql("CREATE TABLE sm (sitemap_url VARCHAR, kind VARCHAR, loc VARCHAR, "
            "lastmod VARCHAR, changefreq VARCHAR, priority_e6 BIGINT)")
    con.executemany("INSERT INTO sm VALUES (?, ?, ?, ?, ?, ?)", entries)
    orc = con.sql("""
WITH o AS (
  SELECT url, content_hash, crawl_date,
         lag(content_hash) OVER (PARTITION BY url ORDER BY crawl_date, content_hash) AS prev
  FROM snaps
),
g AS (
  SELECT url, count(*)::INT AS n_snapshots,
         sum(CASE WHEN prev IS NOT NULL AND content_hash != prev THEN 1 ELSE 0 END)::INT AS n_changes,
         max(crawl_date) AS last_date,
         string_split(max(crawl_date || chr(1) || content_hash), chr(1))[2] AS last_hash
  FROM o GROUP BY url
),
a AS (
  SELECT loc AS url,
         max(CASE WHEN regexp_matches(lastmod,
                  '^\\d{4}(-\\d{2})?$|^\\d{4}-\\d{2}-\\d{2}([Tt ].*)?$')
              THEN try_cast(substr(substr(lastmod, 1, 10) || '-01-01', 1, 10)
                            AS DATE) END) AS lm
  FROM sm WHERE kind = 'urlset' AND lastmod IS NOT NULL GROUP BY loc
),
r AS (
  SELECT g.url, 'revisit' AS source,
         CASE WHEN a.lm > CAST(g.last_date AS DATE)
              THEN greatest(round((n_changes + 1) / (n_snapshots - 1 + 2)
                   * greatest(datediff('day', CAST(last_date AS DATE), DATE '2026-02-21'), 0)
                   / 30 * 1000000)::BIGINT, 900000)
              ELSE round((n_changes + 1) / (n_snapshots - 1 + 2)
                   * greatest(datediff('day', CAST(last_date AS DATE), DATE '2026-02-21'), 0)
                   / 30 * 1000000)::BIGINT END AS priority_e6,
         last_hash
  FROM g LEFT JOIN a ON g.url = a.url
),
s AS (
  SELECT loc AS url, max(coalesce(priority_e6, 500000))::BIGINT AS priority_e6
  FROM sm WHERE kind = 'urlset' GROUP BY loc
)
SELECT * FROM r
UNION ALL
SELECT s.url, 'seed' AS source, s.priority_e6, NULL AS last_hash
FROM s LEFT JOIN g ON s.url = g.url WHERE g.url IS NULL
""")
    srows = [tuple(r) for r in qdf.collect()]
    orows = [tuple(r) for r in orc.fetchall()]
    assert len(srows) == len(orows) > 0
    assert sorted(qdf.columns) == sorted(orc.columns)
    assert value_hash(qdf.columns, srows) == value_hash(orc.columns, orows)


def test_fetch_queue_redirect_supply(spark):
    """Third supply: terminal redirect targets that were never crawled
    and are not sitemap-hinted — strongest-evidence-wins precedence,
    cycles never queued. Hash-checked against the DuckDB oracle."""
    from fusus_spark.operators.frontier import fetch_queue, url_change_stats

    stats = url_change_stats(spark.createDataFrame(
        _snapshots(), "url string, content_hash string, crawl_date string"
    ))
    entries = [
        ("https://news.com/sm.xml", "urlset", "http://news.com/new",
         None, None, 700_000),
    ]
    sm = spark.createDataFrame(
        entries, "sitemap_url string, kind string, loc string, "
                 "lastmod string, changefreq string, priority_e6 bigint")
    rd_rows = [
        # fresh terminal target (two chains converge on it: ONE row)
        ("http://old.com/a", "http://fresh.com/x", 2, True),
        ("http://old.com/b", "http://fresh.com/x", 1, True),
        # target already in history -> stays a revisit
        ("http://old.com/c", "http://news.com/front", 1, True),
        # target already a sitemap seed -> stays a seed
        ("http://old.com/d", "http://news.com/new", 1, True),
        # cycle member: never queued
        ("http://loop.com/a", "http://loop.com/b", 4, False),
    ]
    rd = spark.createDataFrame(
        rd_rows, "url string, final_url string, hops int, terminal boolean")
    qdf = fetch_queue(stats, sm, as_of_date="2026-02-21", redirects=rd)
    q = {r["url"]: r for r in qdf.collect()}
    assert q["http://fresh.com/x"]["source"] == "redirect"
    assert q["http://fresh.com/x"]["priority_e6"] == 500_000
    assert q["http://fresh.com/x"]["last_hash"] is None
    assert q["http://news.com/front"]["source"] == "revisit"
    assert q["http://news.com/new"]["source"] == "seed"
    assert "http://loop.com/b" not in q
    assert len([r for r in q.values() if r["source"] == "redirect"]) == 1

    con = duckdb.connect()
    con.sql("CREATE TABLE snaps (url VARCHAR, content_hash VARCHAR, crawl_date VARCHAR)")
    con.executemany("INSERT INTO snaps VALUES (?, ?, ?)", _snapshots())
    con.sql("CREATE TABLE sm (sitemap_url VARCHAR, kind VARCHAR, loc VARCHAR, "
            "lastmod VARCHAR, changefreq VARCHAR, priority_e6 BIGINT)")
    con.executemany("INSERT INTO sm VALUES (?, ?, ?, ?, ?, ?)", entries)
    con.sql("CREATE TABLE rd (url VARCHAR, final_url VARCHAR, hops INT, "
            "terminal BOOLEAN)")
    con.executemany("INSERT INTO rd VALUES (?, ?, ?, ?)", rd_rows)
    orc = con.sql("""
WITH o AS (
  SELECT url, content_hash, crawl_date,
         lag(content_hash) OVER (PARTITION BY url ORDER BY crawl_date, content_hash) AS prev
  FROM snaps
),
g AS (
  SELECT url, count(*)::INT AS n_snapshots,
         sum(CASE WHEN prev IS NOT NULL AND content_hash != prev THEN 1 ELSE 0 END)::INT AS n_changes,
         max(crawl_date) AS last_date,
         string_split(max(crawl_date || chr(1) || content_hash), chr(1))[2] AS last_hash
  FROM o GROUP BY url
),
r AS (
  SELECT url, 'revisit' AS source,
         round((n_changes + 1) / (n_snapshots - 1 + 2)
               * greatest(datediff('day', CAST(last_date AS DATE), DATE '2026-02-21'), 0)
               / 30 * 1000000)::BIGINT AS priority_e6,
         last_hash
  FROM g
),
s AS (
  SELECT loc AS url, max(coalesce(priority_e6, 500000))::BIGINT AS priority_e6
  FROM sm WHERE kind = 'urlset' GROUP BY loc
),
t AS (
  SELECT DISTINCT final_url AS url FROM rd WHERE terminal
)
SELECT * FROM r
UNION ALL
SELECT s.url, 'seed', s.priority_e6, NULL FROM s
LEFT JOIN g ON s.url = g.url WHERE g.url IS NULL
UNION ALL
SELECT t.url, 'redirect', 500000::BIGINT, NULL FROM t
LEFT JOIN g ON t.url = g.url
LEFT JOIN (SELECT DISTINCT loc FROM sm WHERE kind = 'urlset') sl ON t.url = sl.loc
WHERE g.url IS NULL AND sl.loc IS NULL
""")
    srows = [tuple(r) for r in qdf.collect()]
    orows = [tuple(r) for r in orc.fetchall()]
    assert len(srows) == len(orows) > 0
    assert value_hash(qdf.columns, srows) == value_hash(
        ["url", "source", "priority_e6", "last_hash"], orows
    )


def test_fetch_queue_link_supply(spark):
    """Fourth supply: urls discovered as outlinks, scored by distinct
    linking hosts (step + cap), excluded by every stronger supply.
    Hash-checked against the DuckDB four-supply oracle."""
    from fusus_spark.operators.frontier import fetch_queue, url_change_stats

    stats = url_change_stats(spark.createDataFrame(
        _snapshots(), "url string, content_hash string, crawl_date string"
    ))
    entries = [
        ("https://news.com/sm.xml", "urlset", "http://news.com/new",
         None, None, 700_000),
    ]
    sm = spark.createDataFrame(
        entries, "sitemap_url string, kind string, loc string, "
                 "lastmod string, changefreq string, priority_e6 bigint")
    rd_rows = [
        ("http://old.com/a", "http://fresh.com/x", 2, True),
        ("http://loop.com/a", "http://loop.com/b", 4, False),
    ]
    rd = spark.createDataFrame(
        rd_rows, "url string, final_url string, hops int, terminal boolean")
    link_rows = [
        # 3 distinct hosts (one duplicated) -> capped at link_cap_e6
        ("http://a.com/p1", "http://disc.com/hot"),
        ("http://a.com/p2", "http://disc.com/hot"),
        ("http://b.com/p", "http://disc.com/hot"),
        ("http://c.com/p", "http://disc.com/hot"),
        # 2 distinct hosts -> default + step
        ("http://a.com/p1", "http://disc.com/warm"),
        ("http://b.com/p", "http://disc.com/warm"),
        # 1 host -> default
        ("http://a.com/p1", "http://disc.com/cold"),
        # every stronger supply wins over a link hint
        ("http://a.com/p1", "http://news.com/front"),   # history
        ("http://a.com/p1", "http://news.com/new"),     # sitemap
        ("http://a.com/p1", "http://fresh.com/x"),      # redirect
        # a link into a 301 shell collapses to its target (which the
        # redirect supply already queues) — the shell never queued
        ("http://z.com/p", "http://old.com/a"),
        # a link into a cycle member: a known redirect source that
        # never re-aims — dropped outright
        ("http://z.com/p", "http://loop.com/a"),
        # unresolvable href: ignored
        ("http://a.com/p1", None),
    ]
    links = spark.createDataFrame(link_rows, "src_url string, resolved string")
    qdf = fetch_queue(
        stats, sm, as_of_date="2026-02-21", redirects=rd, links=links,
        link_step_e6=300_000,
    )
    q = {r["url"]: r for r in qdf.collect()}
    assert q["http://disc.com/hot"]["source"] == "link"
    assert q["http://disc.com/hot"]["priority_e6"] == 990_000   # capped
    assert q["http://disc.com/warm"]["priority_e6"] == 800_000  # 500k + 300k
    assert q["http://disc.com/cold"]["priority_e6"] == 500_000
    assert q["http://disc.com/cold"]["last_hash"] is None
    assert q["http://news.com/front"]["source"] == "revisit"
    assert q["http://news.com/new"]["source"] == "seed"
    assert q["http://fresh.com/x"]["source"] == "redirect"
    assert "http://old.com/a" not in q    # collapsed into fresh.com/x
    assert "http://loop.com/a" not in q   # cycle shell: dropped
    assert len([r for r in q.values() if r["source"] == "link"]) == 3

    con = duckdb.connect()
    con.sql("CREATE TABLE snaps (url VARCHAR, content_hash VARCHAR, crawl_date VARCHAR)")
    con.executemany("INSERT INTO snaps VALUES (?, ?, ?)", _snapshots())
    con.sql("CREATE TABLE sm (sitemap_url VARCHAR, kind VARCHAR, loc VARCHAR, "
            "lastmod VARCHAR, changefreq VARCHAR, priority_e6 BIGINT)")
    con.executemany("INSERT INTO sm VALUES (?, ?, ?, ?, ?, ?)", entries)
    con.sql("CREATE TABLE rd (url VARCHAR, final_url VARCHAR, hops INT, "
            "terminal BOOLEAN)")
    con.executemany("INSERT INTO rd VALUES (?, ?, ?, ?)", rd_rows)
    con.sql("CREATE TABLE lk (src_url VARCHAR, resolved VARCHAR)")
    con.executemany("INSERT INTO lk VALUES (?, ?)", link_rows)
    orc = con.sql(f"""
WITH o AS (
  SELECT url, content_hash, crawl_date,
         lag(content_hash) OVER (PARTITION BY url ORDER BY crawl_date, content_hash) AS prev
  FROM snaps
),
g AS (
  SELECT url, count(*)::INT AS n_snapshots,
         sum(CASE WHEN prev IS NOT NULL AND content_hash != prev THEN 1 ELSE 0 END)::INT AS n_changes,
         max(crawl_date) AS last_date,
         string_split(max(crawl_date || chr(1) || content_hash), chr(1))[2] AS last_hash
  FROM o GROUP BY url
),
r AS (
  SELECT url, 'revisit' AS source,
         round((n_changes + 1) / (n_snapshots - 1 + 2)
               * greatest(datediff('day', CAST(last_date AS DATE), DATE '2026-02-21'), 0)
               / 30 * 1000000)::BIGINT AS priority_e6,
         last_hash
  FROM g
),
s AS (
  SELECT loc AS url, max(coalesce(priority_e6, 500000))::BIGINT AS priority_e6
  FROM sm WHERE kind = 'urlset' GROUP BY loc
),
t AS (
  SELECT DISTINCT final_url AS url FROM rd WHERE terminal
),
d AS (
  -- collapse through terminal chains, then drop any remaining known
  -- redirect source (cycle/over-cap shells) — mirrors follow_redirects
  -- + the left_anti on rd.url
  SELECT coalesce(m.final_url, l.resolved) AS url,
         count(DISTINCT lower(regexp_extract(l.src_url, '{_HOST_RE_SQL}', 1))) AS n_hosts
  FROM lk l
  LEFT JOIN (SELECT url, final_url FROM rd WHERE terminal) m ON l.resolved = m.url
  WHERE l.resolved IS NOT NULL
    AND coalesce(m.final_url, l.resolved) NOT IN (SELECT url FROM rd)
  GROUP BY 1
)
SELECT * FROM r
UNION ALL
SELECT s.url, 'seed', s.priority_e6, NULL FROM s
LEFT JOIN g ON s.url = g.url WHERE g.url IS NULL
UNION ALL
SELECT t.url, 'redirect', 500000::BIGINT, NULL FROM t
LEFT JOIN g ON t.url = g.url
LEFT JOIN (SELECT DISTINCT loc FROM sm WHERE kind = 'urlset') sl ON t.url = sl.loc
WHERE g.url IS NULL AND sl.loc IS NULL
UNION ALL
SELECT d.url, 'link', least(990000, 500000 + 300000 * (d.n_hosts - 1))::BIGINT, NULL
FROM d
LEFT JOIN g ON d.url = g.url
LEFT JOIN (SELECT DISTINCT loc FROM sm WHERE kind = 'urlset') sl ON d.url = sl.loc
LEFT JOIN t ON d.url = t.url
WHERE g.url IS NULL AND sl.loc IS NULL AND t.url IS NULL
""")
    srows = [tuple(r) for r in qdf.collect()]
    orows = [tuple(r) for r in orc.fetchall()]
    assert len(srows) == len(orows) > 0
    assert value_hash(qdf.columns, srows) == value_hash(
        ["url", "source", "priority_e6", "last_hash"], orows
    )


def test_host_budgets_from_delays(spark):
    from fusus_spark.operators.frontier import host_budgets_from_delays

    delays = spark.createDataFrame(
        [
            ("slow.com", 600_000),    # 10 min spacing, 1h cycle -> 6
            ("glacial.com", 7_200_000),  # 2h spacing > cycle -> 0 (skip)
            ("zero.com", 0),          # no constraint -> capped at default
            ("subsec.com", 500),      # 0.5s spacing -> capped at default
        ],
        "host string, crawl_delay_ms bigint",
    )
    bdf = host_budgets_from_delays(delays, cycle_seconds=3600, k_per_host=100)
    got = {r["host"]: r["k"] for r in bdf.collect()}
    assert got == {"slow.com": 6, "glacial.com": 0,
                   "zero.com": 100, "subsec.com": 100}

    # the least/floor/greatest derivation is plain SQL — oracle it
    con = duckdb.connect()
    con.sql("CREATE TABLE d (host VARCHAR, crawl_delay_ms BIGINT)")
    con.executemany("INSERT INTO d VALUES (?, ?)",
                    [(r["host"], r["crawl_delay_ms"]) for r in delays.collect()])
    orows = con.sql("""
SELECT host,
       least(100, 3600000 // greatest(crawl_delay_ms, 1))::INT AS k
FROM d
""").fetchall()
    srows = [tuple(r) for r in bdf.collect()]
    assert len(srows) == len(orows) > 0
    assert value_hash(bdf.columns, srows) == value_hash(
        ["host", "k"], [tuple(r) for r in orows]
    )


def test_schedule_fetches_host_budgets(spark):
    """Per-host budget overrides: listed hosts get their k (0 = skip),
    unlisted hosts keep the default. Hash-checked against the DuckDB
    window+join oracle."""
    from fusus_spark.operators.frontier import schedule_fetches

    queue_rows = [
        (f"http://big.com/p{i}", "revisit", 1_000_000 - i, None)
        for i in range(5)
    ] + [
        ("http://slow.com/a", "revisit", 900_000, None),
        ("http://slow.com/b", "revisit", 800_000, None),
        ("http://banned.com/x", "seed", 500_000, None),
        ("http://free.com/y", "seed", 500_000, None),
    ]
    queue = spark.createDataFrame(
        queue_rows, "url string, source string, priority_e6 bigint, last_hash string"
    )
    budget_rows = [("slow.com", 1), ("banned.com", 0),
                   ("slow.com", 2)]  # dup host: folds to MIN, never fans out
    budgets = spark.createDataFrame(budget_rows, "host string, k int")
    sdf = schedule_fetches(queue, k_per_host=3, host_budgets=budgets)
    rows = sdf.collect()
    got = {r["url"] for r in rows}
    assert len(rows) == len(got)                              # no dup rows
    assert len([u for u in got if "big.com" in u]) == 3      # default
    assert got & {"http://slow.com/a", "http://slow.com/b"} == {
        "http://slow.com/a"}                                  # min(1,2), top priority
    assert "http://banned.com/x" not in got                   # k=0: skipped
    assert "http://free.com/y" in got                         # unlisted

    con = duckdb.connect()
    con.sql("CREATE TABLE q (url VARCHAR, source VARCHAR, priority_e6 BIGINT, "
            "last_hash VARCHAR)")
    con.executemany("INSERT INTO q VALUES (?, ?, ?, ?)", queue_rows)
    con.sql("CREATE TABLE b (host VARCHAR, k INT)")
    con.executemany("INSERT INTO b VALUES (?, ?)", budget_rows)
    orc = con.sql(f"""
WITH h AS (
  SELECT lower(regexp_extract(url, '{_HOST_RE_SQL}', 1)) AS host, *
  FROM q
),
r AS (
  SELECT host, url, source, priority_e6, last_hash, row_number() OVER (
    PARTITION BY host ORDER BY priority_e6 DESC, url)::INT AS rank_in_host
  FROM h WHERE host != ''
),
bm AS (SELECT host, min(k) AS k FROM b GROUP BY host)
SELECT r.* FROM r LEFT JOIN bm ON r.host = bm.host
WHERE r.rank_in_host <= coalesce(bm.k, 3)
""")
    srows = [tuple(r) for r in sdf.collect()]
    orows = [tuple(r) for r in orc.fetchall()]
    assert len(srows) == len(orows) > 0
    assert value_hash(sdf.columns, srows) == value_hash(
        ["host", "url", "source", "priority_e6", "last_hash", "rank_in_host"],
        orows,
    )


def test_schedule_fetches_by_domain(spark):
    """by='domain': subdomains of one registrable domain share a
    politeness group (the wildcard-subdomain pattern); public-suffix
    hosts fall back to themselves. Hash-checked against a DuckDB
    oracle (fixture hosts chosen so last-2-labels == the PSL answer)."""
    from fusus_spark.operators.frontier import schedule_fetches

    queue_rows = [
        ("http://a.x.com/1", "revisit", 900_000, None),
        ("http://b.x.com/2", "revisit", 800_000, None),
        ("http://c.x.com/3", "revisit", 700_000, None),
        ("http://only.y.com/4", "seed", 600_000, None),
        ("http://co.uk/5", "seed", 500_000, None),  # host IS a suffix
    ]
    queue = spark.createDataFrame(
        queue_rows, "url string, source string, priority_e6 bigint, last_hash string"
    )
    sdf = schedule_fetches(queue, k_per_host=2, by="domain")
    got = {r["url"]: r["rank_in_host"] for r in sdf.collect()}
    # x.com group: only the top-2 across THREE hosts survive
    assert got == {"http://a.x.com/1": 1, "http://b.x.com/2": 2,
                   "http://only.y.com/4": 1, "http://co.uk/5": 1}

    con = duckdb.connect()
    con.sql("CREATE TABLE q (url VARCHAR, source VARCHAR, priority_e6 BIGINT, "
            "last_hash VARCHAR)")
    con.executemany("INSERT INTO q VALUES (?, ?, ?, ?)", queue_rows)
    orc = con.sql(f"""
WITH h AS (
  SELECT lower(regexp_extract(url, '{_HOST_RE_SQL}', 1)) AS host, *
  FROM q
),
g AS (
  SELECT *, regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS grp
  FROM h WHERE host != ''
)
SELECT host, url, source, priority_e6, last_hash, row_number() OVER (
  PARTITION BY grp ORDER BY priority_e6 DESC, url)::INT AS rank_in_host
FROM g QUALIFY rank_in_host <= 2
""")
    srows = [tuple(r) for r in sdf.collect()]
    orows = [tuple(r) for r in orc.fetchall()]
    assert len(srows) == len(orows) > 0
    assert value_hash(sdf.columns, srows) == value_hash(
        ["host", "url", "source", "priority_e6", "last_hash", "rank_in_host"],
        orows,
    )

    try:
        schedule_fetches(queue, k_per_host=2, by="ip")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass

    # HOST-keyed budgets (the robots producer's natural key) fold
    # through the same domain expression: a Crawl-delay declared on
    # one subdomain caps its whole registrable-domain group
    budgets = spark.createDataFrame(
        [("b.x.com", 1)], "host string, k int"
    )
    capped = {r["url"] for r in schedule_fetches(
        queue, k_per_host=2, by="domain", host_budgets=budgets
    ).collect()}
    assert capped == {"http://a.x.com/1",       # x.com group capped at 1
                      "http://only.y.com/4", "http://co.uk/5"}


def test_url_failure_stats_and_queue_demotion(spark):
    """Consecutive-fail counting (strictly after the last success) and
    the dead-url anti-join in fetch_queue. Hash-checked against the
    DuckDB oracle."""
    from fusus_spark.operators.frontier import (
        fetch_queue, url_change_stats, url_failure_stats)

    log_rows = [
        # transient blip then recovery: 0 consecutive
        ("http://news.com/front", "2026-01-01", 503),
        ("http://news.com/front", "2026-01-08", 200),
        # alive via 304
        ("http://docs.com/page", "2026-01-08", 304),
        # dead: three straight failures AFTER a success
        ("http://mix.com/x", "2026-01-01", 200),
        ("http://mix.com/x", "2026-01-08", 404),
        ("http://mix.com/x", "2026-01-15", 404),
        ("http://mix.com/x", "2026-01-22", 500),
        # never succeeded at all
        ("http://never.com/a", "2026-01-08", 404),
        ("http://never.com/a", "2026-01-15", 404),
    ]
    log = spark.createDataFrame(
        log_rows, "url string, crawl_date string, http_status int"
    )
    fdf = url_failure_stats(log)
    got = {r["url"]: (r["n_consecutive_fails"], r["last_status"], r["last_date"])
           for r in fdf.collect()}
    assert got["http://news.com/front"] == (0, 200, "2026-01-08")
    assert got["http://docs.com/page"] == (0, 304, "2026-01-08")
    assert got["http://mix.com/x"] == (3, 500, "2026-01-22")
    assert got["http://never.com/a"] == (2, 404, "2026-01-15")

    con = duckdb.connect()
    con.sql("CREATE TABLE fl (url VARCHAR, crawl_date VARCHAR, http_status INT)")
    con.executemany("INSERT INTO fl VALUES (?, ?, ?)", log_rows)
    orows = con.sql("""
WITH m AS (
  SELECT *, max(CASE WHEN http_status IN (200, 304) THEN crawl_date END)
            OVER (PARTITION BY url) AS last_ok
  FROM fl
)
SELECT url,
  sum(CASE WHEN http_status NOT IN (200, 304)
            AND (last_ok IS NULL OR crawl_date > last_ok)
      THEN 1 ELSE 0 END)::INT AS n_consecutive_fails,
  string_split(max(crawl_date || chr(1) || lpad(http_status::VARCHAR, 3, '0')),
               chr(1))[2]::INT AS last_status,
  max(crawl_date) AS last_date
FROM m GROUP BY url
""").fetchall()
    srows = [tuple(r) for r in fdf.collect()]
    assert len(srows) == len(orows) > 0
    assert value_hash(fdf.columns, srows) == value_hash(
        ["url", "n_consecutive_fails", "last_status", "last_date"],
        [tuple(r) for r in orows],
    )

    # the dead url (3 >= max) leaves every supply; the blipped and
    # never-tried urls stay
    stats = url_change_stats(spark.createDataFrame(
        _snapshots(), "url string, content_hash string, crawl_date string"
    ))
    sm = spark.createDataFrame(
        [], "sitemap_url string, kind string, loc string, lastmod string, "
            "changefreq string, priority_e6 bigint")
    q = {r["url"] for r in fetch_queue(
        stats, sm, as_of_date="2026-02-21", failures=fdf,
        max_consecutive_fails=3,
    ).collect()}
    assert "http://mix.com/x" not in q
    assert "http://news.com/front" in q and "http://docs.com/page" in q


def test_extend_snapshots_hand_cases(spark):
    """The conditional-GET return path: 200s append fresh hashes, 304s
    carry the latest prior hash forward, everything else is silent."""
    from fusus_spark.operators.frontier import extend_snapshots

    snaps = spark.createDataFrame(
        _snapshots()
        # validator-store shape: the newest fetch omitted the etag —
        # the 304 confirms the validator the store actually ISSUED
        + [("http://etag.com/v", "e1", "2026-01-01"),
           ("http://etag.com/v", None, "2026-01-15"),
           ("http://omit.com/w", None, "2026-01-15")],
        "url string, content_hash string, crawl_date string",
    )
    fetches = spark.createDataFrame(
        [
            ("http://news.com/front", 200, "h-new"),     # fresh observation
            ("http://docs.com/page", 304, None),         # confirmed unchanged
            ("http://docs.com/page", 304, None),         # dup 304: ONE row
            ("http://mix.com/x", 404, None),             # no observation
            ("http://mix.com/once", 301, None),          # no observation
            ("http://ghost.com/q", 304, None),           # no prior: dropped
            ("http://news.com/front", 200, None),        # hashless 200: dropped
            ("http://etag.com/v", 304, None),            # null-latest: skip to e1
            ("http://omit.com/w", 304, None),            # never observed: dropped
        ],
        "url string, http_status int, content_hash string",
    )
    got = {
        (r["url"], r["crawl_date"]): r["content_hash"]
        for r in extend_snapshots(
            snaps, fetches, crawl_date="2026-02-01"
        ).collect()
    }
    assert got == {
        ("http://news.com/front", "2026-02-01"): "h-new",
        ("http://docs.com/page", "2026-02-01"): "same",
        ("http://etag.com/v", "2026-02-01"): "e1",
    }


def test_extend_snapshots_matches_duckdb_and_feeds_change_stats(spark):
    """Oracle for the append rows, then the loop property: appending a
    304-confirmation adds exactly one no-change sample to the url's
    churn evidence."""
    from fusus_spark.operators.frontier import extend_snapshots, url_change_stats

    snap_rows = _snapshots() + [
        ("http://etag.com/v", "e1", "2026-01-01"),
        ("http://etag.com/v", None, "2026-01-15"),
        ("http://omit.com/w", None, "2026-01-15"),
    ]
    snaps = spark.createDataFrame(
        snap_rows, "url string, content_hash string, crawl_date string"
    )
    fetch_rows = [
        ("http://news.com/front", 200, "h-new"),
        ("http://docs.com/page", 304, None),
        ("http://mix.com/x", 304, None),
        ("http://mix.com/once", 500, None),
        ("http://ghost.com/q", 304, None),
        ("http://etag.com/v", 304, None),
        ("http://omit.com/w", 304, None),
    ]
    fetches = spark.createDataFrame(
        fetch_rows, "url string, http_status int, content_hash string"
    )
    sdf = extend_snapshots(snaps, fetches, crawl_date="2026-02-01")

    con = duckdb.connect()
    con.sql("CREATE TABLE snaps (url VARCHAR, content_hash VARCHAR, crawl_date VARCHAR)")
    con.executemany("INSERT INTO snaps VALUES (?, ?, ?)", snap_rows)
    con.sql("CREATE TABLE ftc (url VARCHAR, http_status INT, content_hash VARCHAR)")
    con.executemany("INSERT INTO ftc VALUES (?, ?, ?)", fetch_rows)
    orows = con.sql("""
WITH latest AS (
  -- NULL-propagating concat skips null hashes, same as the Spark
  -- null-guarded max-of-struct
  SELECT url,
         string_split(max(crawl_date || chr(1) || content_hash), chr(1))[2] AS prior
  FROM snaps GROUP BY url
)
SELECT url, content_hash, '2026-02-01' AS crawl_date
FROM ftc WHERE http_status = 200 AND content_hash IS NOT NULL
UNION ALL
SELECT f.url, l.prior, '2026-02-01'
FROM (SELECT DISTINCT url FROM ftc WHERE http_status = 304) f
JOIN latest l ON f.url = l.url
WHERE l.prior IS NOT NULL
""").fetchall()
    srows = [tuple(r) for r in sdf.collect()]
    assert len(srows) == len(orows) > 0
    assert value_hash(sdf.columns, srows) == value_hash(
        ["url", "content_hash", "crawl_date"], [tuple(r) for r in orows]
    )

    # loop property: one more snapshot, zero more changes for the
    # 304-confirmed static page; the churner gains a change sample
    before = {r["url"]: r for r in url_change_stats(snaps).collect()}
    after = {
        r["url"]: r
        for r in url_change_stats(snaps.unionByName(sdf)).collect()
    }
    assert after["http://docs.com/page"]["n_snapshots"] == \
        before["http://docs.com/page"]["n_snapshots"] + 1
    assert after["http://docs.com/page"]["n_changes"] == \
        before["http://docs.com/page"]["n_changes"]
    assert after["http://news.com/front"]["n_changes"] == \
        before["http://news.com/front"]["n_changes"] + 1
    assert "http://ghost.com/q" not in after


def test_parse_sitemap_entries_never_raises_on_junk(spark):
    """XML pathologies degrade to dropped entries, never an error —
    the frontier can always refetch (the operator's own contract)."""
    from fusus_spark.operators.frontier import parse_sitemap_entries

    rows = [
        ("u1", None),
        ("u2", ""),
        ("u3", "not xml at all \x00\x01\x02"),
        ("u4", "<urlset><url><loc>"),                    # truncated
        ("u5", "<urlset><url></url></urlset>"),          # empty entry
        ("u6", "<urlset><url><loc><![CDATA[http://c.com/x]]></loc></url></urlset>"),
        ("u7", "<?xml-stylesheet?><urlset><url><loc>http://p.com/i</loc></url></urlset>"),
        ("u8", "<URLSET><URL><LOC>http://caps.com/</LOC></URL></URLSET>"),  # wrong case: dropped
        ("u9", "<urlset>" + "<url><loc>http://m.com/p</loc></url>" * 500 + "</urlset>"),
        ("u10", "<sitemapindex><sitemap><loc></loc></sitemap></sitemapindex>"),
    ]
    out = parse_sitemap_entries(
        spark.createDataFrame(rows, "sitemap_url string, xml string")
    ).collect()
    by_sm = {}
    for r in out:
        by_sm.setdefault(r["sitemap_url"], []).append(r)
    assert set(by_sm) <= {"u6", "u7", "u9"}
    # CDATA survives as verbatim bytes inside loc (degraded, not wrong)
    assert "http://c.com/x" in by_sm["u6"][0]["loc"]
    assert by_sm["u7"][0]["loc"] == "http://p.com/i"
    assert len(by_sm["u9"]) == 500


# ---------------------------------------------------------------------------
# sitemap media extensions


def _media_sitemaps() -> list[tuple[str, str]]:
    return [
        # 1: two images (one with title+caption, entities unescape) and
        # a full video on one page entry; a second entry image-less
        ("https://h.com/media.xml", """<urlset>
<url><loc>https://h.com/gallery</loc>
  <image:image><image:loc>https://cdn.h.com/1.jpg</image:loc>
    <image:title>Sunset &amp; sea</image:title>
    <image:caption>A &quot;golden&quot; hour</image:caption>
  </image:image>
  <image:image><image:loc>https://cdn.h.com/2.jpg</image:loc></image:image>
  <video:video>
    <video:content_loc>https://cdn.h.com/v.mp4</video:content_loc>
    <video:thumbnail_loc>https://cdn.h.com/v.jpg</video:thumbnail_loc>
    <video:title>Clip</video:title>
    <video:description>Short clip</video:description>
    <video:duration>93</video:duration>
  </video:video>
</url>
<url><loc>https://h.com/plain</loc><lastmod>2026-01-01</lastmod></url>
</urlset>"""),
        # 2: player_loc fallback when content_loc absent; malformed
        # duration -> null; loc-less image dropped
        ("https://h.com/v2.xml",
         "<urlset><url><loc>https://h.com/p</loc>"
         "<video:video><video:player_loc>https://h.com/player?id=9"
         "</video:player_loc><video:duration>soon</video:duration>"
         "</video:video>"
         "<image:image><image:title>no loc</image:title></image:image>"
         "</url></urlset>"),
        # 3: index files / junk have no <url> entries -> no rows
        ("https://h.com/idx.xml",
         "<sitemapindex><sitemap><loc>https://h.com/a.xml</loc></sitemap>"
         "</sitemapindex>"),
        ("https://h.com/junk.xml", "\x00not xml"),
    ]


def test_parse_sitemap_media_hand_cases(spark):
    from fusus_spark.operators.frontier import parse_sitemap_media

    df = spark.createDataFrame(_media_sitemaps(), "sitemap_url string, xml string")
    rows = sorted(
        [tuple(r) for r in parse_sitemap_media(df).collect()],
        key=lambda t: (t[0], t[3] or ""),
    )
    assert rows == [
        ("https://h.com/media.xml", "https://h.com/gallery", "image",
         "https://cdn.h.com/1.jpg", None, "Sunset & sea",
         'A "golden" hour', None),
        ("https://h.com/media.xml", "https://h.com/gallery", "image",
         "https://cdn.h.com/2.jpg", None, None, None, None),
        ("https://h.com/media.xml", "https://h.com/gallery", "video",
         "https://cdn.h.com/v.mp4", "https://cdn.h.com/v.jpg", "Clip",
         "Short clip", 93),
        ("https://h.com/v2.xml", "https://h.com/p", "video",
         "https://h.com/player?id=9", None, None, None, None),
    ]


def test_parse_sitemap_media_matches_duckdb_oracle(spark):
    from fusus_spark.operators.frontier import parse_sitemap_media

    df = spark.createDataFrame(_media_sitemaps(), "sitemap_url string, xml string")
    sdf = parse_sitemap_media(df)
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.sql("CREATE TABLE sm (sitemap_url VARCHAR, xml VARCHAR)")
    con.executemany("INSERT INTO sm VALUES (?, ?)", _media_sitemaps())

    def unesc(x: str) -> str:
        return (f"replace(replace(replace(replace(replace({x}, "
                "'&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), "
                "'&apos;', ''''), '&amp;', '&')")

    def fld(src: str, tag: str) -> str:
        return (f"nullif(regexp_extract({src}, "
                f"'<{tag}>\\s*([\\s\\S]*?)\\s*</{tag}>', 1), '')")

    orc = con.sql(f"""
WITH b AS (
  SELECT sitemap_url,
         unnest(regexp_extract_all(coalesce(xml, ''),
                '<url>([\\s\\S]*?)</url>', 1)) AS e
  FROM sm
), p AS (
  SELECT sitemap_url, {unesc(fld('e', 'loc'))} AS page_loc,
    list_transform(regexp_extract_all(e,
        '<image:image>([\\s\\S]*?)</image:image>', 1),
      m -> struct_pack(media_kind := 'image',
        media_loc := {unesc(fld('m', 'image:loc'))},
        thumbnail_loc := NULL::VARCHAR,
        title := {unesc(fld('m', 'image:title'))},
        caption := {unesc(fld('m', 'image:caption'))},
        duration_s := NULL::INT)) ||
    list_transform(regexp_extract_all(e,
        '<video:video>([\\s\\S]*?)</video:video>', 1),
      m -> struct_pack(media_kind := 'video',
        media_loc := coalesce({unesc(fld('m', 'video:content_loc'))},
                              {unesc(fld('m', 'video:player_loc'))}),
        thumbnail_loc := {unesc(fld('m', 'video:thumbnail_loc'))},
        title := {unesc(fld('m', 'video:title'))},
        caption := {unesc(fld('m', 'video:description'))},
        duration_s := try_cast({fld('m', 'video:duration')} AS INT)))
      AS media
  FROM b
), q AS (
  SELECT sitemap_url, page_loc,
         unnest(list_filter(media, x -> x.media_loc IS NOT NULL)) AS m
  FROM p WHERE page_loc IS NOT NULL
)
SELECT sitemap_url, page_loc, m.media_kind AS media_kind,
       m.media_loc AS media_loc, m.thumbnail_loc AS thumbnail_loc,
       m.title AS title, m.caption AS caption, m.duration_s AS duration_s
FROM q
""")
    orows = [tuple(r) for r in orc.fetchall()]
    assert len(srows) == len(orows) > 0
    assert sorted(sdf.columns) == sorted(orc.columns)
    assert value_hash(sdf.columns, srows) == value_hash(orc.columns, orows)
