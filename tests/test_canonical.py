"""Declared-canonical collapse (RFC 6596): hand-pinned semantics per
href form and scope, plus a DuckDB hash oracle over a synthetic corpus
for BOTH the per-url mapping and the group representatives (the
beyond-cap operator contract)."""

from __future__ import annotations

import duckdb

from fusus_spark.operators.canonical import (
    apply_canonical_collapse,
    canonical_collapse,
    canonical_representatives,
)
from tests.psl_oracle import PSL_DOMAIN_EXPR, PSL_PS_CASE, install_psl_rules
from tests.test_url import _ORC_IDX, _ORC_KEPT, _ORC_PNORM, _ORC_PRE
from tools.parity import value_hash

_SCHEMA = "url string, canonical_href string"


def test_collapse_hand_cases(spark):
    rows = [
        # same registrable domain, other host -> collapses ('domain')
        ("https://blog.example.com/post?utm_source=x",
         "http://www.example.com/post"),
        # cross-domain declaration -> rejected + flagged
        ("http://example.com/a", "http://evil.com/a"),
        # relative href resolves against the page url (RFC 3986)
        ("http://example.com/print/x", "../x"),
        # protocol twin: declared key EQUALS own key -> not collapsed
        ("https://example.com/a#frag", "https://example.com/a"),
        # nothing declared ('' and junk scheme) -> self, no flags
        ("http://example.com/b", ""),
        ("http://example.com/c", "javascript:void(0)"),
        # query-only href: pagination pointing at page 1
        ("http://example.com/d?page=2", "?page=1"),
        # host IS a public suffix: registrable domain '' -> rejected
        ("http://co.uk/x", "http://co.uk/y"),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    got = {r["url"]: r for r in canonical_collapse(df).collect()}

    r = got["https://blog.example.com/post?utm_source=x"]
    assert r["self_canonical"] == "http://blog.example.com/post"
    assert r["canonical_target"] == "http://www.example.com/post"
    assert r["collapsed"] and not r["out_of_scope"]

    r = got["http://example.com/a"]
    assert r["canonical_target"] == "http://example.com/a"
    assert not r["collapsed"] and r["out_of_scope"]

    r = got["http://example.com/print/x"]
    assert r["canonical_target"] == "http://example.com/x"
    assert r["collapsed"]

    r = got["https://example.com/a#frag"]
    assert r["self_canonical"] == "http://example.com/a"
    assert r["canonical_target"] == "http://example.com/a"
    assert not r["collapsed"] and not r["out_of_scope"]

    for u in ("http://example.com/b", "http://example.com/c"):
        r = got[u]
        assert r["canonical_target"] == r["self_canonical"]
        assert not r["collapsed"] and not r["out_of_scope"]

    r = got["http://example.com/d?page=2"]
    assert r["canonical_target"] == "http://example.com/d?page=1"
    assert r["collapsed"]

    r = got["http://co.uk/x"]
    assert r["canonical_target"] == "http://co.uk/x"
    assert r["out_of_scope"]


def test_collapse_scopes(spark):
    rows = [("https://blog.example.com/post", "http://www.example.com/post"),
            ("http://example.com/a", "http://evil.com/a")]
    df = spark.createDataFrame(rows, _SCHEMA)
    # 'host': even a same-domain sibling host is rejected
    strict = {r["url"]: r for r in
              canonical_collapse(df, scope="host").collect()}
    r = strict["https://blog.example.com/post"]
    assert not r["collapsed"] and r["out_of_scope"]
    assert r["canonical_target"] == "http://blog.example.com/post"
    # 'any': every resolvable declaration is trusted
    trusting = {r["url"]: r for r in
                canonical_collapse(df, scope="any").collect()}
    assert trusting["http://example.com/a"]["canonical_target"] == \
        "http://evil.com/a"
    assert trusting["http://example.com/a"]["collapsed"]


def test_representatives_and_apply(spark):
    rows = [
        # the canonical page itself is in the corpus -> it wins
        ("http://example.com/x", ""),
        ("http://example.com/x?utm_source=a", "http://example.com/x"),
        ("http://example.com/print/x", "http://example.com/x"),
        # target NOT in corpus -> smallest member url is the fallback
        ("http://example.com/m2", "http://example.com/zz"),
        ("http://example.com/m1", "http://example.com/zz"),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    mapped = canonical_collapse(df)
    reps = {r["canonical_target"]: r
            for r in canonical_representatives(mapped).collect()}
    x = reps["http://example.com/x"]
    # the utm variant's OWN key also equals the target; min url wins
    # among the is-target members: bare 'x' < 'x?utm_source=a'
    assert x["rep_url"] == "http://example.com/x"
    assert x["rep_is_target"] and x["n_members"] == 3
    z = reps["http://example.com/zz"]
    assert z["rep_url"] == "http://example.com/m1"
    assert not z["rep_is_target"] and z["n_members"] == 2

    kept = sorted(r["url"] for r in
                  apply_canonical_collapse(df, mapped).collect())
    assert kept == ["http://example.com/m1", "http://example.com/x"]


def test_collapse_never_raises_on_junk(spark):
    rows = [(None, "http://a.com/x"), ("http://a.com/b", None),
            ("not a url at all", "also not"), ("http://a.com/c", "#frag"),
            ("http://a.com/d", "   "), ("http://a.com/e", "//")]
    df = spark.createDataFrame(rows, _SCHEMA)
    out = canonical_collapse(df).collect()
    assert len(out) == len(rows)
    got = {r["url"]: r for r in out if r["url"]}
    assert got["http://a.com/b"]["canonical_target"] == "http://a.com/b"
    assert not got["http://a.com/c"]["collapsed"]  # fragment-only


def _corpus() -> list[tuple[str, str | None]]:
    """Deterministic synthetic corpus cycling every SQL-expressible
    href form (absolute same/cross domain, protocol-relative,
    root-relative, query-only, empty, null, junk scheme, self) across
    plain and multi-label-suffix (co.uk) hosts. Path-relative and
    dot-segment hrefs are covered by the hand cases above — their
    RFC 3986 merge is code-oracled in test_webgraph (urljoin), not
    SQL-expressible."""
    hosts = ["example.com", "www.example.com", "blog.example.co.uk",
             "m.example.co.uk", "evil.com", "sub.evil.com"]
    rows: list[tuple[str, str | None]] = []
    for i in range(144):
        h = hosts[i % len(hosts)]
        u = f"https://{h}/p{i % 7}/item{i}?utm_source=feed&id={i % 11}"
        k = i % 8
        href: str | None
        if k == 0:
            href = f"http://{hosts[(i + 1) % len(hosts)]}/canon{i % 5}"
        elif k == 1:
            href = f"//{h}/canon{i % 5}"
        elif k == 2:
            href = f"/canon{i % 5}"
        elif k == 3:
            href = f"?id={i % 3}"
        elif k == 4:
            href = ""
        elif k == 5:
            href = None
        elif k == 6:
            href = "javascript:void(0)"
        else:
            href = u
        rows.append((u, href))
    return rows


_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"


def test_collapse_matches_duckdb_oracle(spark):
    """Full mapping + representatives vs an independent DuckDB
    implementation (resolution for the SQL-expressible href subset,
    the shared canonical_url SQL from test_url, the shared PSL rules
    tables from psl_oracle) — hash-compared."""
    rows = _corpus()
    df = spark.createDataFrame(rows, _SCHEMA)
    mapped = canonical_collapse(df)
    sdf = mapped
    srows = [tuple(r) for r in sdf.collect()]
    rdf = canonical_representatives(mapped)
    rrows = [tuple(r) for r in rdf.collect()]

    con = duckdb.connect()
    install_psl_rules(con)
    con.sql("CREATE TABLE t (url VARCHAR, canonical_href VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    con.sql(f"""
CREATE TABLE m AS
WITH t0 AS (
  SELECT url AS src,
         CASE WHEN canonical_href = '' THEN NULL
              ELSE canonical_href END AS href
  FROM t
),
r1 AS (
  SELECT src, href,
    regexp_replace(coalesce(href, ''), '#.*$', '') AS hnof,
    lower(regexp_extract(src, '{_HOST_RE}', 1)) AS srchost,
    regexp_extract(src, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1)
      AS srcpath
  FROM t0
),
r2 AS (
  SELECT src, srchost, srcpath, hnof, href,
    regexp_replace(hnof, '\\?.*$', '') AS hpath,
    regexp_extract(hnof, '\\?(.*)$', 1) AS hq,
    CASE WHEN regexp_matches(hnof, '^[hH][tT][tT][pP][sS]?://') THEN hnof
         WHEN hnof LIKE '//%' THEN 'http:' || hnof END AS habs
  FROM r1
),
r3 AS (
  SELECT src,
    CASE
      WHEN habs IS NOT NULL THEN
        regexp_extract(habs, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1)
        || regexp_extract(habs,
             '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1)
        || CASE WHEN hq = '' THEN '' ELSE '?' || hq END
      WHEN href LIKE '/%' AND srchost <> '' THEN
        'http://' || srchost || hpath
        || CASE WHEN hq = '' THEN '' ELSE '?' || hq END
      WHEN href LIKE '?%' AND srchost <> '' THEN
        'http://' || srchost || srcpath || hnof
      ELSE NULL END AS resolved
  FROM r2
),
uall AS (
  SELECT src AS url FROM r3
  UNION
  SELECT resolved FROM r3 WHERE resolved IS NOT NULL
),
c0 AS (SELECT url, {_ORC_PRE} AS pre FROM uall),
c1 AS (SELECT *, {_ORC_PNORM} AS pn FROM c0),
c2 AS (
  SELECT *,
    regexp_replace(regexp_replace(pn, '\\?.*$', ''), '{_ORC_IDX}', '/')
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
  SELECT r3.src, r3.resolved, cs.c AS selfc, cr.c AS declc,
    lower(regexp_extract(r3.src, '{_HOST_RE}', 1)) AS sh,
    lower(regexp_extract(r3.resolved, '{_HOST_RE}', 1)) AS dh
  FROM r3
  JOIN canon cs ON cs.url = r3.src
  LEFT JOIN canon cr ON cr.url = r3.resolved
),
hs AS (
  SELECT sh AS host FROM h
  UNION
  SELECT dh FROM h WHERE dh IS NOT NULL
),
hl AS (
  SELECT host, string_split(host, '.') AS ls,
         len(string_split(host, '.')) AS n
  FROM hs
),
hp AS (SELECT host, ls, n, {PSL_PS_CASE} AS ps FROM hl),
hd AS (SELECT host, {PSL_DOMAIN_EXPR} AS dom FROM hp)
SELECT h.src AS url, h.selfc AS self_canonical,
  CASE WHEN h.declc IS NOT NULL
            AND regexp_matches(h.declc, '^http://[^/?#]')
            AND dd.dom <> '' AND dd.dom = ds.dom
       THEN h.declc ELSE h.selfc END AS canonical_target,
  (h.declc IS NOT NULL AND regexp_matches(h.declc, '^http://[^/?#]')
   AND dd.dom <> '' AND dd.dom = ds.dom
   AND h.declc <> h.selfc) AS collapsed,
  (h.declc IS NOT NULL AND regexp_matches(h.declc, '^http://[^/?#]')
   AND NOT coalesce(dd.dom <> '' AND dd.dom = ds.dom, FALSE))
    AS out_of_scope
FROM h
LEFT JOIN hd ds ON ds.host = h.sh
LEFT JOIN hd dd ON dd.host = h.dh
""")
    orc = con.sql("SELECT * FROM m")
    orows = [tuple(r) for r in orc.fetchall()]
    assert len(srows) == len(orows) == len(rows)
    assert sorted(sdf.columns) == sorted(orc.columns)
    assert value_hash(sdf.columns, srows) == value_hash(orc.columns, orows)

    rorc = con.sql("""
WITH rep AS (
  SELECT canonical_target,
    string_split(min(
      CASE WHEN self_canonical = canonical_target THEN '0' ELSE '1' END
      || chr(1) || url), chr(1)) AS b,
    count(*) AS n_members
  FROM m GROUP BY canonical_target
)
SELECT canonical_target, b[2] AS rep_url, b[1] = '0' AS rep_is_target,
       n_members
FROM rep
""")
    ororws = [tuple(r) for r in rorc.fetchall()]
    assert len(rrows) == len(ororws) > 0
    assert sorted(rdf.columns) == sorted(rorc.columns)
    assert value_hash(rdf.columns, rrows) == value_hash(rorc.columns, ororws)
