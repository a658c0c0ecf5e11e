"""Webgraph operator tests: hand-pinned link extraction/resolution +
DuckDB oracle hash cross-check (outside the 50-query registry budget,
so the oracle runs in-test)."""

from __future__ import annotations

import duckdb

from fusus_spark.operators.webgraph import (
    extract_links,
    host_link_stats,
    resolve_links,
)
from tools.parity import value_hash


def _pages() -> list[tuple[str, str]]:
    return [
        ("http://a.com/1",
         '<html><body><a href="http://b.com/x">to B</a>'
         '<a class="nav" href=\'/local\'>home</a>'
         '<a href="//c.com/y">proto-rel</a>'
         '<a href="rel/path">rel</a>'
         '<a href="mailto:x@y.z">mail</a>'
         '<p>no links here</p></body></html>'),
        ("http://b.com/2",
         '<html><A HREF="http://a.com/1">back to <b>A</b></A>'
         '<a href="https://b.com/self">self</a></html>'),
        ("http://d.com/3", "<html><p>linkless page</p></html>"),
        ("http://e.com/4", '<a href="http://b.com/z">e to b</a>'),
        # attribute lookalikes and a/A-prefixed OTHER tags must not match
        ("http://f.com/5",
         '<a href="/real" data-href="http://tracker.com/x">t</a>'
         '<area href="http://m.com/z"><abbr href="http://n.com/q">n</abbr>'),
    ]


def _docs(spark):
    rows = [(u, h.encode()) for u, h in _pages()]
    return spark.createDataFrame(rows, "url string, html binary")


def test_extract_and_resolve_hand_cases(spark):
    links = resolve_links(extract_links(_docs(spark))).collect()
    by_src = {}
    for r in links:
        by_src.setdefault(r["src_url"], []).append(r)
    a = {r["href"]: r for r in by_src["http://a.com/1"]}
    assert set(a) == {"http://b.com/x", "/local", "//c.com/y", "rel/path", "mailto:x@y.z"}
    assert a["http://b.com/x"]["anchor"] == "to B"
    assert a["http://b.com/x"]["resolved"] == "http://b.com/x"
    assert a["/local"]["resolved"] == "http://a.com/local"
    assert a["//c.com/y"]["resolved"] == "http://c.com/y"
    assert a["rel/path"]["resolved"] is None      # path-relative: dropped
    assert a["mailto:x@y.z"]["resolved"] is None
    # uppercase tag + markup inside anchor: first text run only
    b = {r["href"]: r for r in by_src["http://b.com/2"]}
    assert b["http://a.com/1"]["anchor"] == "back to"
    assert "http://d.com/3" not in by_src          # linkless page: no rows
    # data-href must not shadow or fabricate; <area>/<abbr> excluded
    f = by_src["http://f.com/5"]
    assert [(r["href"], r["resolved"]) for r in f] == [("/real", "http://f.com/real")]


def test_host_link_stats_hand_cases(spark):
    got = {r["host"]: r for r in host_link_stats(_docs(spark)).collect()}
    # edges: a->b, a->c, b->a, e->b (self b->b and intra dropped)
    assert got["b.com"]["in_degree"] == 2 and got["b.com"]["out_degree"] == 1
    assert got["a.com"]["in_degree"] == 1 and got["a.com"]["out_degree"] == 2
    assert got["c.com"]["in_degree"] == 1 and got["c.com"]["out_degree"] == 0
    assert got["e.com"]["in_degree"] == 0 and got["e.com"]["out_degree"] == 1
    assert "d.com" not in got  # no edges either way
    # the data-href decoy never became an edge; f.com's only link is
    # intra-host, so it has no graph presence at all
    assert "tracker.com" not in got and "f.com" not in got


def test_extract_links_matches_duckdb_oracle(spark):
    sdf = extract_links(_docs(spark))
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    con.sql("CREATE TABLE pages (url VARCHAR, html VARCHAR)")
    con.executemany("INSERT INTO pages VALUES (?, ?)", _pages())
    # the IDENTICAL RE2-safe pattern; '' escapes the quote inside the class
    pat = """<[aA](?:\\s[^>]*?)?\\s[hH][rR][eE][fF]=["'']([^"''<>]+)["''][^>]*>([^<]*)"""
    orc = con.sql(f"""
WITH e AS (
  SELECT url AS src_url,
         regexp_extract_all(html, '{pat}', 1) AS hrefs,
         regexp_extract_all(html, '{pat}', 2) AS anchors
  FROM pages
)
SELECT src_url, hrefs[i] AS href, trim(anchors[i]) AS anchor
FROM e, unnest(generate_series(1, len(hrefs))) AS u(i)
""")
    orows = [tuple(r) for r in orc.fetchall()]
    assert len(srows) == len(orows)
    assert sorted(sdf.columns) == sorted(orc.columns)
    assert value_hash(sdf.columns, srows) == value_hash(orc.columns, orows)


def test_links_never_raise_on_junk_bytes(spark):
    rows = [
        ("http://x.com/a", b"\xff\xfe\x00garbage<a href='http://y.com/'>ok</a>"),
        ("http://x.com/b", None),
        ("http://x.com/c", b""),
    ]
    docs = spark.createDataFrame(rows, "url string, html binary")
    got = resolve_links(extract_links(docs)).collect()
    assert [(r["href"], r["resolved"]) for r in got] == [
        ("http://y.com/", "http://y.com/")
    ]
