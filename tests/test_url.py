"""URL curation tests: hand-pinned canonical forms + a DuckDB oracle
cross-check (the same hash-verification discipline as the registry
queries, run in-test since the driver registry is capped at 50)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from fusus_spark.functions.url import dedup_by_canonical_url, url_features
from tools.parity import value_hash

CASES = [
    # (url, canonical)
    ("http://Example.COM/a/b", "http://example.com/a/b"),
    ("https://example.com/a/b", "http://example.com/a/b"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "http://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("http://example.com/a/b/", "http://example.com/a/b"),
    ("http://example.com/", "http://example.com"),
    ("http://example.com/a#frag", "http://example.com/a"),
    ("http://example.com/p#a#b", "http://example.com/p"),  # doubled '#'
    ("http://example.com/a?utm_source=x", "http://example.com/a"),
    ("http://example.com/a?utm_source=x&q=1", "http://example.com/a?q=1"),
    ("http://example.com/a?q=1&utm_medium=y", "http://example.com/a?q=1"),
    ("http://example.com/a?gclid=123&fbclid=456", "http://example.com/a"),
    ("http://example.com/a?q=1&r=2", "http://example.com/a?q=1&r=2"),
    ("http://user:pw@example.com/a", "http://user:pw@example.com/a"),
    ("http://example.com/A/B?Q=Case", "http://example.com/A/B?Q=Case"),
    # anchoring: params whose name merely ENDS in a tracking name are
    # ordinary params — ?my_gclid=5 and ?my_gclid=7 must NOT merge
    ("http://example.com/p?my_gclid=5", "http://example.com/p?my_gclid=5"),
    ("http://example.com/p?my_gclid=7", "http://example.com/p?my_gclid=7"),
    ("http://example.com/p?xutm_source=1", "http://example.com/p?xutm_source=1"),
    ("http://example.com/p?gclid=5&id=3", "http://example.com/p?id=3"),
    # ADJACENT tracking params (a single regexp_replace pass misses the
    # second one: its separator is consumed by the first match)
    ("http://example.com/p?utm_a=1&utm_b=2&id=3", "http://example.com/p?id=3"),
    ("http://example.com/p?id=3&utm_a=1&utm_b=2", "http://example.com/p?id=3"),
    ("http://example.com/p?utm_a=1&utm_b=2", "http://example.com/p"),
    ("http://example.com/p?a=1&&b=2", "http://example.com/p?a=1&b=2"),
    ("http://example.com/p?", "http://example.com/p"),
    # percent-encoding normalization: unreserved escapes decode,
    # reserved escapes uppercase, malformed pass through
    ("http://example.com/a%7eb", "http://example.com/a~b"),
    ("http://example.com/%41bc%2fd", "http://example.com/Abc%2Fd"),
    ("http://example.com/100%zz", "http://example.com/100%zz"),
    ("http://example.com/p?x=%41&%75tm_source=t", "http://example.com/p?x=A"),
    # default index pages collapse to the directory
    ("http://example.com/index.html", "http://example.com"),
    ("http://example.com/docs/index.html", "http://example.com/docs"),
    ("http://example.com/dir/default.aspx?q=1", "http://example.com/dir/?q=1"),
    ("http://example.com/indexes.html", "http://example.com/indexes.html"),
    ("http://example.com/my_index.html", "http://example.com/my_index.html"),
]


def test_canonical_url_hand_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = {r["url"]: r["canonical"] for r in url_features(df).collect()}
    for url, want in CASES:
        assert got[url] == want, url


def test_url_features_hand_cases(spark):
    df = spark.createDataFrame(
        [("https://User@a.b.Example.com:8443/x/y/z?a=1&utm_source=s#f",)],
        "url string",
    )
    r = url_features(df).collect()[0]
    assert r["host"] == "a.b.example.com"
    assert r["domain"] == "example.com"
    assert r["path_depth"] == 3
    assert r["n_params"] == 2
    assert r["has_tracking"] is True


def test_idna_fold_hand_cases(spark):
    """IDN punycode fold (r4 verdict item #7): xn-- labels decode to
    their unicode form so IDN twins unify; junk punycode and plain
    ASCII pass through verbatim (total + idempotent)."""
    from fusus_spark.functions.url import idna_fold, url_host

    cases = [
        ("http://xn--bcher-kva.de/x", "bücher.de"),
        ("http://www.xn--mnchen-3ya.de/", "www.münchen.de"),
        ("http://bücher.de/x", "bücher.de"),           # already unicode
        ("http://plain.example.com/x", "plain.example.com"),
        ("http://xn--zzzz!!.com/", "xn--zzzz!!.com"),  # junk: verbatim
        ("http://mixed.xn--bcher-kva.co.uk/", "mixed.bücher.co.uk"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {
        r["url"]: r["h"]
        for r in df.select(
            "url", idna_fold(url_host(F.col("url"))).alias("h")
        ).collect()
    }
    for url, want in cases:
        assert got[url] == want, url
    # idempotent: folding the folded host is the identity
    df2 = spark.createDataFrame([(h,) for _, h in cases], "host string")
    got2 = [r["h"] for r in df2.select(idna_fold(F.col("host")).alias("h")).collect()]
    assert got2 == [h for _, h in cases]


def test_url_features_fold_idna_matches_duckdb_fold_join(spark):
    """fold_idna=True: host/domain computed over the decoded form; the
    oracle joins DuckDB's regexp-extracted raw host against a
    precomputed (raw -> folded) table — the independent ground truth —
    then reuses the PSL rules join for the domain."""
    from tests.psl_oracle import PSL_DOMAIN_EXPR, PSL_PS_CASE, install_psl_rules
    from tools.parity import value_hash

    urls = [
        "http://xn--bcher-kva.de/x",
        "https://shop.xn--mnchen-3ya.de/p?utm_source=a",
        "http://xn--bcher-kva.blogspot.com/post",   # PSL over folded host
        "http://plain.example.co.uk/y",
        "http://xn--zzzz!!.com/",                    # junk punycode
    ]
    folds = {  # hand-maintained ground truth (precomputed folds)
        "xn--bcher-kva.de": "bücher.de",
        "shop.xn--mnchen-3ya.de": "shop.münchen.de",
        "xn--bcher-kva.blogspot.com": "bücher.blogspot.com",
    }
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    sdf = url_features(df, fold_idna=True).select("url", "host", "domain")
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.sql("CREATE TABLE u (url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?)", [(u,) for u in urls])
    con.sql("CREATE TABLE folds (raw VARCHAR, folded VARCHAR)")
    con.executemany("INSERT INTO folds VALUES (?, ?)", list(folds.items()))
    install_psl_rules(con)
    host_re = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"
    orc = con.sql(f"""
WITH h AS (
  SELECT url, lower(regexp_extract(url, '{host_re}', 1)) AS raw FROM u
),
f AS (
  SELECT url, coalesce(folds.folded, h.raw) AS host
  FROM h LEFT JOIN folds ON h.raw = folds.raw
),
l AS (
  SELECT url, host, string_split(host, '.') AS ls,
         len(string_split(host, '.')) AS n
  FROM f
),
p AS (SELECT url, host, ls, n, {PSL_PS_CASE} AS ps FROM l)
SELECT url, host, {PSL_DOMAIN_EXPR} AS domain FROM p
""")
    orows = [tuple(r) for r in orc.fetchall()]
    assert len(srows) == len(orows)
    assert value_hash(sdf.columns, srows) == value_hash(orc.columns, orows)


def _synthetic_urls() -> list[str]:
    """Deterministic corpus mixing every curation axis."""
    out = []
    hosts = ["example.com", "News.Site.org", "sub.a.example.com", "x.io",
             "Shop.Example.co.uk", "blog.ex.com.au"]
    for i in range(200):
        h = hosts[i % len(hosts)]
        scheme = "https" if i % 3 == 0 else "http"
        port = ":443" if i % 7 == 0 and scheme == "https" else (
            ":8080" if i % 11 == 0 else "")
        path = "/".join(f"p{j}" for j in range(i % 4))
        q = ""
        if i % 5 == 0:
            q = f"?q={i}&utm_source=feed"
        elif i % 5 == 1:
            q = f"?id={i}"
        elif i % 5 == 2:
            q = f"?utm_a={i}&utm_b=x&id={i}"  # adjacent tracking params
        elif i % 5 == 3:
            q = f"?my_gclid={i}&xutm_source=1"  # lookalike names: KEEP
        frag = f"#sec{i}" if i % 6 == 0 else ""
        slash = "/" if i % 2 == 0 and path else ""
        out.append(f"{scheme}://{h}{port}/{path}{slash}{q}{frag}")
    # percent-encoding + index-page axes (hand-shaped, deterministic)
    out += [
        "http://example.com/a%7eb/index.html?x=%41&utm_source=t",
        "https://x.io/%2Fesc/default.asp",
        "http://news.site.org/dir/index.htm#f",
        "http://example.com/100%zz?id=%7E1",
        "https://Shop.Example.co.uk/%6Aacket/INDEX.html",
        # '?' INSIDE a fragment: neither a query nor a tracking param
        "http://example.com/frag#sec?utm_source=x&id=9",
    ]
    return out


@pytest.fixture(scope="module")
def duck_urls():
    con = duckdb.connect()
    con.sql("CREATE TABLE urls (url VARCHAR)")
    con.executemany("INSERT INTO urls VALUES (?)", [(u,) for u in _synthetic_urls()])
    return con


# canonical_url as a DuckDB expression — same RE2-safe patterns,
# DuckDB backref syntax (\1, verbatim backslashes) and the same
# split/filter/rejoin query rewrite with the ANCHORED tracking-name
# pattern (list_filter mirrors Spark's F.filter higher-order fn).
_ORC_PRE = r"""
regexp_replace(
 regexp_replace(
  regexp_replace(
   regexp_replace(
    lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1))
      || regexp_replace(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', ''),
    '^https://', 'http://'),
   '^(http://[^/?#:]+):(?:80|443)([/?#])', '\1\2'),
  '^(http://[^/?#:]+):(?:80|443)$', '\1'),
 '#.*$', '')
"""
# RFC 3986 percent normalization (uppercase hex, decode unreserved) as
# a DuckDB expression over column `pre` — the same split/transform as
# functions/url.normalize_percent; decode(unhex(..)) is DuckDB's chr.
_ORC_PNORM = r"""
CASE WHEN len(string_split(pre, '%')) = 1 THEN pre
ELSE string_split(pre, '%')[1] || array_to_string(list_transform(
  string_split(pre, '%')[2:], p ->
    CASE WHEN NOT regexp_matches(p, '^[0-9a-fA-F]{2}') THEN '%' || p
         WHEN (upper(substring(p,1,2)) BETWEEN '30' AND '39')
           OR (upper(substring(p,1,2)) BETWEEN '41' AND '5A')
           OR (upper(substring(p,1,2)) BETWEEN '61' AND '7A')
           OR upper(substring(p,1,2)) IN ('2D','2E','5F','7E')
           THEN decode(unhex(upper(substring(p,1,2))))
                || regexp_replace(p, '^[0-9a-fA-F]{2}', '')
         ELSE '%' || upper(substring(p,1,2))
                || regexp_replace(p, '^[0-9a-fA-F]{2}', '')
    END), '')
END"""
_ORC_IDX = r"/(index|default)\.(html?|htm|php|aspx?)$"
# coalesce: DuckDB array_to_string([]) is NULL where Spark array_join is ''
_ORC_KEPT = r"""
coalesce(array_to_string(
  list_filter(string_split(regexp_extract(pn, '\?(.*)$', 1), '&'),
              p -> p <> '' AND NOT regexp_matches(
                p, '^(utm_[a-zA-Z]+|gclid|fbclid|mc_cid|mc_eid)=')),
  '&'), '')
"""


def test_url_features_match_duckdb_oracle(spark, duck_urls):
    df = spark.createDataFrame([(u,) for u in _synthetic_urls()], "url string")
    sdf = url_features(df)
    srows = [tuple(r) for r in sdf.collect()]
    # registrable domain: the ONE shared PSL rules-table oracle
    # (url_domain is PSL-backed; the corpus includes co.uk/com.au hosts)
    from tests.psl_oracle import PSL_DOMAIN_EXPR, PSL_PS_CASE, install_psl_rules

    install_psl_rules(duck_urls)
    orc = duck_urls.sql(f"""
WITH u0 AS (
  SELECT url,
       lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1)) AS host,
       len(list_filter(string_split(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/'), s -> s != ''))::INT AS path_depth,
       CASE WHEN regexp_extract(url, '^[^#]*?\\?([^#]*)', 1) = '' THEN 0
            ELSE len(list_filter(string_split(regexp_extract(url, '^[^#]*?\\?([^#]*)', 1), '&'), s -> s != '')) END::INT AS n_params,
       regexp_extract(regexp_replace(url, '#.*$', ''), '[?&](utm_[a-z]+|gclid|fbclid|mc_cid|mc_eid)=', 1) != '' AS has_tracking,
       {_ORC_PRE} AS pre
  FROM urls
),
u1 AS (SELECT *, {_ORC_PNORM} AS pn FROM u0),
u2 AS (
  SELECT *, regexp_replace(regexp_replace(pn, '\\?.*$', ''), '{_ORC_IDX}', '/') AS base,
         {_ORC_KEPT} AS kept
  FROM u1
),
u AS (
  SELECT url, host, path_depth, n_params, has_tracking,
       regexp_replace(
         CASE WHEN kept = '' THEN base ELSE base || '?' || kept END,
         '([^:/])/$', '\\1') AS canonical
  FROM u2
),
l AS (
  SELECT u.*, string_split(host, '.') AS ls, len(string_split(host, '.')) AS n
  FROM u
),
p AS (SELECT l.*, {PSL_PS_CASE} AS ps FROM l)
SELECT url, host, {PSL_DOMAIN_EXPR} AS domain,
       path_depth, n_params, has_tracking, canonical
FROM p
""")
    orows = [tuple(r) for r in orc.fetchall()]
    assert len(srows) == len(orows)
    assert sorted(sdf.columns) == sorted(orc.columns)
    assert value_hash(sdf.columns, srows) == value_hash(orc.columns, orows)


def test_canonical_url_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) — the property that makes
    the canonical key a stable dedup identity."""
    from pyspark.sql import functions as F

    from fusus_spark.functions.url import canonical_url

    urls = [u for u, _ in CASES] + _synthetic_urls()
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = df.select(canonical_url(F.col("url")).alias("c1")).select(
        "c1", canonical_url(F.col("c1")).alias("c2")
    )
    assert out.where(F.col("c1") != F.col("c2")).count() == 0


def test_dedup_by_canonical_url(spark):
    urls = [
        "http://example.com/a",
        "https://example.com/a",                 # protocol twin
        "http://EXAMPLE.com:80/a#x",             # case + port + fragment twin
        "http://example.com/a?utm_source=feed",  # tracking twin
        "http://example.com/b",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = {r["url"]: r for r in dedup_by_canonical_url(df).collect()}
    a_group = {u for u in urls[:4]}
    reps = {out[u]["rep_url"] for u in a_group}
    assert reps == {"http://EXAMPLE.com:80/a#x"}  # min-url representative
    assert all(out[u]["group_size"] == 4 for u in a_group)
    assert out["http://example.com/b"]["group_size"] == 1


# ------------------------------------------------- host stats + host policy

_HOST_ORC = "lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1))"


def _host_corpus() -> list[tuple[int, str, str]]:
    rows = []
    did = 0
    for i in range(60):  # big host, every third text a duplicate
        txt = f"unique body {i} with words" if i % 3 else "the shared mirror body text"
        rows.append((did, f"http://big.com/page/{i}", txt)); did += 1
    for i in range(5):
        rows.append((did, f"https://small.org/a{i}", f"small doc {i} body")); did += 1
    for i in range(3):
        rows.append((did, f"http://ads.blocked.net/x{i}", f"spam doc {i}")); did += 1
    return rows


def test_host_stats_hand_and_oracle(spark):
    from fusus_spark.operators.curate import host_stats

    docs = spark.createDataFrame(_host_corpus(), "doc_id long, url string, text string")
    sdf = host_stats(docs)
    got = {r["host"]: r for r in sdf.collect()}
    assert got["big.com"]["n_docs"] == 60
    # 40 unique bodies + 1 shared mirror body
    assert got["big.com"]["n_distinct_texts"] == 41
    assert got["big.com"]["dup_ratio_e6"] == round((1 - 41 / 60) * 1e6)
    assert got["small.org"]["dup_ratio_e6"] == 0

    con = duckdb.connect()
    con.sql("CREATE TABLE documents (doc_id BIGINT, url VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", _host_corpus())
    orc = con.sql(f"""
WITH d AS (
  SELECT {_HOST_ORC} AS host,
         CASE WHEN length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) = 0 THEN 0
              ELSE len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '))
         END AS n_tok,
         md5(text) AS th
  FROM documents
)
SELECT host, count(*)::INT AS n_docs, sum(n_tok)::BIGINT AS total_tokens,
       round(avg(n_tok) * 10000)::BIGINT AS mean_tokens_e4,
       count(DISTINCT th)::INT AS n_distinct_texts,
       round((1 - count(DISTINCT th) / count(*)) * 1000000)::BIGINT AS dup_ratio_e6
FROM d GROUP BY host
""")
    srows = [tuple(r) for r in sdf.collect()]
    orows = [tuple(r) for r in orc.fetchall()]
    assert len(srows) == len(orows)
    assert value_hash(sdf.columns, srows) == value_hash(orc.columns, orows)


def test_apply_host_policy(spark):
    from pyspark.sql import functions as F

    from fusus_spark.operators.curate import apply_host_policy

    docs = spark.createDataFrame(_host_corpus(), "doc_id long, url string, text string")
    block = spark.createDataFrame([("blocked.net",)], "domain string")
    out = apply_host_policy(docs, block_domains=block, cap_per_host=20).cache()
    kept = [r["doc_id"] for r in out.select("doc_id").collect()]
    # blocklist kills the subdomain too (registrable-domain match; these
    # hosts are all default-rule, so the oracle's last-two regex agrees)
    assert all(d < 65 for d in kept)
    # small host untouched; big host capped ~20 (deterministic binomial draw)
    assert sum(1 for d in kept if d >= 60) == 5
    n_big = sum(1 for d in kept if d < 60)
    assert 8 <= n_big <= 34
    # schema passes through unchanged and the selection is rerun-stable
    assert out.columns == docs.columns
    again = [r["doc_id"] for r in
             apply_host_policy(docs, block_domains=block, cap_per_host=20)
             .select("doc_id").collect()]
    assert sorted(kept) == sorted(again)

    # unattributable urls (NULL / no scheme) bypass the cap by policy —
    # they are kept, not pooled into a fake '' host and mass-dropped
    weird = spark.createDataFrame(
        [(1000 + i, None if i % 2 else f"relative/path/{i}", f"text {i}") for i in range(40)],
        "doc_id long, url string, text string",
    )
    mixed = docs.unionByName(weird)
    out2 = apply_host_policy(mixed, cap_per_host=20)
    kept2 = {r["doc_id"] for r in out2.select("doc_id").collect()}
    assert all(1000 + i in kept2 for i in range(40))

    # DuckDB oracle reproduces the exact surviving set
    con = duckdb.connect()
    con.sql("CREATE TABLE documents (doc_id BIGINT, url VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", _host_corpus())
    orows = con.sql(f"""
WITH d AS (
  SELECT doc_id, {_HOST_ORC} AS host,
         regexp_extract({_HOST_ORC}, '([^.]+\\.[^.]+)$', 1) AS domain
  FROM documents
),
b AS (SELECT d.* FROM d WHERE domain != 'blocked.net'),
c AS (SELECT host AS h, count(*) AS n FROM b GROUP BY host HAVING count(*) > 20),
t AS (SELECT h, printf('%05x', (20 * 1048576) // n) AS thr FROM c)
SELECT b.doc_id FROM b LEFT JOIN t ON b.host = t.h
WHERE t.thr IS NULL OR substring(md5(b.host || ':' || b.doc_id), 1, 5) < t.thr
""").fetchall()
    assert sorted(kept) == sorted(r[0] for r in orows)


def test_canonical_url_fuzz_idempotent_and_total(spark):
    """Adversarial url soup (random %-sequences, repeated #/?/&, junk
    schemes, unicode, empty parts): canonical_url and url_features must
    be TOTAL (no exception for any string) and canonicalization must
    stay idempotent — the property that makes the key a dedup identity.
    Deterministic seeded generator: failures reproduce exactly."""
    import random

    from pyspark.sql import functions as F

    from fusus_spark.functions.url import canonical_url

    rng = random.Random(0xF00D)
    alphabet = (
        "abcXYZ019-._~%#?&=/:@+!$'()*,;[]é中 "
        "%%2525%7e%7E%zz%4"
    )
    urls = []
    for i in range(400):
        n = rng.randint(0, 40)
        body = "".join(rng.choice(alphabet) for _ in range(n))
        scheme = rng.choice(["http://", "https://", "HTTPS://", "ftp://", "", "//"])
        urls.append(f"{scheme}{body}")
    urls += ["", "%", "??", "##", "http://", "https://?", "http://#", "%%%",
             "http://h.com/%", "http://h.com/%%41", "http://h.com/??a=%",
             "http://example.co.uk:443/%7e/index.html?utm_a=%26&#x#y"]

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = df.select(
        "url", canonical_url(F.col("url")).alias("c1")
    ).withColumn("c2", canonical_url(F.col("c1")))
    rows = out.collect()  # totality: no exception for any input
    bad = [(r["url"], r["c1"], r["c2"]) for r in rows if r["c1"] != r["c2"]]
    assert bad == [], bad[:5]
    # url_features is total too (host/domain/path on the same soup)
    assert url_features(df).count() == len(urls)


def test_url_trap_features(spark):
    """Crawl-trap signals: repeated-segment loops, infinite descent,
    parameter explosion — from the url string alone, before any fetch.
    Hand-pinned cases + DuckDB list-function oracle over the full
    synthetic corpus."""
    from fusus_spark.functions.url import url_trap_features

    hand = [
        "http://h.com/a/b/a/b/a/b",                # relative-link loop
        "http://h.com/cal/2026/01/cal/2026/01",    # calendar trap
        "http://h.com/docs/api/docs",              # one repeat: fine
        "http://h.com/" + "/".join(f"d{i}" for i in range(13)),  # deep
        "http://h.com/p?" + "&".join(f"a{i}=1" for i in range(9)),
        "http://h.com/x/y/z?a=1&b=2",              # clean
        "http://h.com",                            # bare host
    ]
    urls = hand + _synthetic_urls()
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    sdf = url_trap_features(df)
    got = {r["url"]: r for r in sdf.collect()}
    assert got[hand[0]]["n_repeated_segments"] == 4 and got[hand[0]]["is_trap"]
    assert got[hand[1]]["n_repeated_segments"] == 3 and got[hand[1]]["is_trap"]
    assert got[hand[2]]["n_repeated_segments"] == 1
    assert not got[hand[2]]["is_trap"]
    assert got[hand[3]]["path_depth"] == 13 and got[hand[3]]["is_trap"]
    assert got[hand[4]]["n_params"] == 9 and got[hand[4]]["is_trap"]
    assert not got[hand[5]]["is_trap"]
    assert got[hand[6]]["path_depth"] == 0 and not got[hand[6]]["is_trap"]

    con = duckdb.connect()
    con.sql("CREATE TABLE urls (url VARCHAR)")
    con.executemany("INSERT INTO urls VALUES (?)", [(u,) for u in urls])
    orc = con.sql(r"""
WITH s AS (
  SELECT url,
         list_filter(string_split(
           regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1),
           '/'), x -> x != '') AS segs,
         CASE WHEN regexp_extract(url, '^[^#]*?\?([^#]*)', 1) = '' THEN 0
              ELSE len(list_filter(string_split(
                regexp_extract(url, '^[^#]*?\?([^#]*)', 1), '&'), x -> x != ''))
         END::INT AS n_params
  FROM urls
)
SELECT url, len(segs)::INT AS path_depth, n_params,
       (len(segs) - len(list_distinct(segs)))::INT AS n_repeated_segments,
       ((len(segs) - len(list_distinct(segs))) > 2
        OR len(segs) > 12 OR n_params > 8) AS is_trap
FROM s
""")
    srows = [tuple(r) for r in sdf.collect()]
    orows = [tuple(r) for r in orc.fetchall()]
    assert len(srows) == len(orows) > 0
    assert sorted(sdf.columns) == sorted(orc.columns)
    assert value_hash(sdf.columns, srows) == value_hash(orc.columns, orows)
