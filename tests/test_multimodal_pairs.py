"""Image-text pair mining: hand-pinned semantics per harvest form
(figure captions, alt/title fallback, srcset best-width, data: URIs)
and an RE2-identical DuckDB hash oracle (the beyond-cap operator
contract)."""

from __future__ import annotations

import duckdb

from fusus_spark.operators.multimodal import (
    _FIG_OR_IMG_RE,
    _FIGCAP_RE,
    _IMG_TAG_RE,
    _SRCSET_CAND,
    _attr_val_pat,
    image_text_pairs,
)
from fusus_spark.operators.pagemeta import _IN_REGION
from tools.parity import value_hash

_SCHEMA = "url string, html binary"


def _pages() -> list[tuple[str, str]]:
    return [
        # 1: figure with caption (nested markup + entity in caption),
        # two imgs in one figure share the caption; a standalone img
        # after it keeps only its alt
        ("http://ex.com/fig", """<article>
<figure class="hero">
  <img src="/a.jpg" alt="alt A" width="640" height="480">
  <img src='/b.jpg' alt='alt B'>
  <figcaption>A <b>bold</b> cat &amp; dog</figcaption>
</figure>
<img src=/c.jpg alt="solo C" title="title C">
</article>"""),
        # 2: srcset picks the largest width descriptor; 2x (density)
        # candidates are ignored; width attr with px junk -> null
        ("http://ex.com/srcset",
         '<img src="/s.jpg" width="12px" '
         'srcset="/s-320.jpg 320w, /s-1280.jpg 1280w, /s-2x.jpg 2x, '
         '/s-640.jpg 640w">'),
        # 3: alt missing -> title fallback; both missing -> text null;
        # empty alt ('' = decorative per HTML) also falls through
        ("http://ex.com/fallback",
         '<img src="/t.jpg" title="only title">'
         '<img src="/n.jpg">'
         '<img src="/e.jpg" alt="" title="t2">'),
        # 4: data: URI flagged; unclosed figure degrades imgs to bare
        ("http://ex.com/data",
         '<img src="data:image/png;base64,AAAA" alt="inline">'
         '<figure><img src="/u.jpg" alt="unclosed">'),
        # 4b: an UNCLOSED figure must NOT swallow the next closed one —
        # its img degrades to bare while the intact figure keeps its
        # own caption (review finding: tempered region body)
        ("http://ex.com/broken",
         '<figure class=a><img src="/first.jpg" alt="first"> stray '
         '<figure><img src="/second.jpg"><figcaption>second cap'
         "</figcaption></figure>"),
        # 4c: a CLOSED figure whose body ends in stray '<' chars must
        # still match closed (second-pass review: the <* pre-close run)
        ("http://ex.com/stray",
         '<figure><img src="/st.jpg"><figcaption>St cap</figcaption>'
         "x<</figure>"),
        # 5: figure with caption BEFORE the img; figcaption with
        # attributes; uppercase tags
        ("http://ex.com/pre", "<FIGURE><FIGCAPTION class=c>Cap first"
                              "</FIGCAPTION><IMG SRC='/p.jpg'></FIGURE>"),
        # 6: img-less figure, img-less page, junk bytes
        ("http://ex.com/nofig", "<figure><figcaption>no img</figcaption></figure>"),
        ("http://ex.com/none", "<p>text only</p>"),
        ("http://ex.com/junk", "\x00\xff<<img>>"),
    ]


def _df(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode("utf-8", "surrogateescape")) for u, h in rows], _SCHEMA
    )


def test_image_text_pairs_hand_cases(spark):
    rows = image_text_pairs(_df(spark, _pages())).collect()
    by_src = {(r["url"], r["src"]): r for r in rows}

    a = by_src[("http://ex.com/fig", "/a.jpg")]
    b = by_src[("http://ex.com/fig", "/b.jpg")]
    c = by_src[("http://ex.com/fig", "/c.jpg")]
    assert a["caption"] == b["caption"] == "A bold cat & dog"
    assert a["text"] == "A bold cat & dog"      # caption beats alt
    assert a["alt"] == "alt A" and b["alt"] == "alt B"
    assert (a["width"], a["height"]) == (640, 480)
    assert a["in_figure"] and b["in_figure"] and not c["in_figure"]
    assert (a["img_idx"], b["img_idx"]) == (0, 1)  # order inside figure
    assert c["caption"] is None and c["text"] == "solo C"

    s = by_src[("http://ex.com/srcset", "/s.jpg")]
    assert s["srcset_best_url"] == "/s-1280.jpg"
    assert s["srcset_best_w"] == 1280
    assert s["width"] == 12                     # digit prefix of "12px"

    t = by_src[("http://ex.com/fallback", "/t.jpg")]
    n = by_src[("http://ex.com/fallback", "/n.jpg")]
    e = by_src[("http://ex.com/fallback", "/e.jpg")]
    assert t["text"] == "only title" and n["text"] is None
    assert e["alt"] is None and e["text"] == "t2"   # '' alt = absent

    d = by_src[("http://ex.com/data", "data:image/png;base64,AAAA")]
    u = by_src[("http://ex.com/data", "/u.jpg")]
    assert d["is_data_uri"] and not u["is_data_uri"]
    assert not u["in_figure"] and u["text"] == "unclosed"  # degraded

    b1 = by_src[("http://ex.com/broken", "/first.jpg")]
    b2 = by_src[("http://ex.com/broken", "/second.jpg")]
    assert not b1["in_figure"] and b1["caption"] is None
    assert b1["text"] == "first"
    assert b2["in_figure"] and b2["text"] == "second cap"

    st = by_src[("http://ex.com/stray", "/st.jpg")]
    assert st["in_figure"] and st["text"] == "St cap"

    p = by_src[("http://ex.com/pre", "/p.jpg")]
    assert p["in_figure"] and p["text"] == "Cap first"

    urls = {r["url"] for r in rows}
    for absent in ("http://ex.com/nofig", "http://ex.com/none",
                   "http://ex.com/junk"):
        assert absent not in urls


def _fg_sql(expr: str, pat: str) -> str:
    p = pat.replace("'", "''")
    return ("coalesce(" + ", ".join(
        f"nullif(regexp_extract({expr}, '{p}', {g}), '')" for g in (1, 2, 3)
    ) + ")")


def _clean_sql(expr: str) -> str:
    for x, y in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                 ("&#39;", "''"), ("&nbsp;", " "), ("&amp;", "&")):
        expr = f"replace({expr}, '{x}', '{y}')"
    return (f"nullif(trim(regexp_replace({expr}, '[ \\t\\r\\n\\f]+', ' ', 'g')),"
            " '')")


def _pairs_oracle(pages: list[tuple[str, str]]):
    """The full DuckDB mirror of image_text_pairs over (url, html)."""
    con = duckdb.connect()
    con.sql("CREATE TABLE pages (url VARCHAR, html VARCHAR)")
    con.executemany("INSERT INTO pages VALUES (?, ?)", pages)
    forimg = _FIG_OR_IMG_RE.replace("'", "''")
    imgtag = _IMG_TAG_RE.replace("'", "''")
    figcap = _FIGCAP_RE.replace("'", "''")
    cand = _SRCSET_CAND.replace("'", "''")

    def attr(name: str) -> str:
        return _fg_sql("tag", _IN_REGION + _attr_val_pat(name))

    def dim(name: str) -> str:
        return (f"nullif(regexp_extract({attr(name)}, '^(\\d{{1,9}})', 1), '')"
                "::INT")

    cap_strip = "regexp_replace(regexp_extract(region, '" + figcap + \
        "', 1), '<[^>]*>', ' ', 'g')"
    orc = con.sql(f"""
WITH r0 AS (
  SELECT url, regexp_extract_all(html, '{forimg}', 0) AS regions FROM pages
),
r1 AS (
  SELECT url, unnest(generate_series(1, len(regions))) AS ri, regions FROM r0
),
r AS (
  SELECT url, (ri - 1)::INT AS region_idx, regions[ri] AS region FROM r1
),
rc AS (
  SELECT url, region_idx, region,
    lower(substr(region, 1, 7)) = '<figure' AS in_figure,
    CASE WHEN lower(substr(region, 1, 7)) = '<figure'
         THEN {_clean_sql(cap_strip)} END AS caption
  FROM r
),
i0 AS (
  SELECT url, region_idx, in_figure, caption,
    unnest(generate_series(1, len(regexp_extract_all(region, '{imgtag}', 0))))
      AS ii,
    regexp_extract_all(region, '{imgtag}', 0) AS tags
  FROM rc
),
i AS (
  SELECT url, region_idx, in_figure, caption, (ii - 1)::INT AS img_idx,
    tags[ii] AS tag
  FROM i0
),
sc AS (
  SELECT url, region_idx, img_idx,
    unnest(regexp_extract_all({attr("srcset")}, '{cand}', 0)) AS c
  FROM i
),
scp AS (
  SELECT url, region_idx, img_idx,
    regexp_extract(c, '{cand}', 1) AS u,
    regexp_extract(c, '{cand}', 2)::INT AS w
  FROM sc
),
best AS (
  SELECT url, region_idx, img_idx, u AS srcset_best_url, w AS srcset_best_w
  FROM (SELECT *, row_number() OVER (
          PARTITION BY url, region_idx, img_idx
          ORDER BY w DESC, u DESC) AS rn FROM scp)
  WHERE rn = 1
),
flat AS (
  SELECT i.url, i.region_idx, i.img_idx,
    {attr("src")} AS src,
    b.srcset_best_url, b.srcset_best_w,
    {dim("width")} AS width, {dim("height")} AS height,
    {_clean_sql(attr("alt"))} AS alt,
    {_clean_sql(attr("title"))} AS title,
    i.caption,
    coalesce(i.caption, {_clean_sql(attr("alt"))},
             {_clean_sql(attr("title"))}) AS text,
    i.in_figure
  FROM i LEFT JOIN best b USING (url, region_idx, img_idx)
)
SELECT *, lower(substr(src, 1, 5)) = 'data:' AS is_data_uri
FROM flat WHERE src IS NOT NULL
""")
    cols, rows = list(orc.columns), orc.fetchall()
    con.close()
    return cols, rows


def test_image_text_pairs_matches_duckdb_oracle(spark):
    sdf = image_text_pairs(_df(spark, _pages()))
    srows = [tuple(r) for r in sdf.collect()]
    ocols, orows = _pairs_oracle(_pages())
    orows = [tuple(r) for r in orows]
    assert len(srows) == len(orows) > 0
    assert sorted(sdf.columns) == sorted(ocols)
    assert value_hash(sdf.columns, srows) == value_hash(ocols, orows)


def test_image_text_pairs_tag_soup_cross_engine(spark):
    """Seeded adversarial tag soup (broken quotes, stray '<'/'>',
    half-open figures, keyword fragments, unicode) must hash
    IDENTICALLY through the Java-regex Spark plan and the RE2 DuckDB
    mirror — the cross-engine guarantee the per-operator oracles rest
    on, exercised far beyond the hand corpus."""
    import random

    rng = random.Random(7)
    # half assembled fragments (so img/src rows actually occur), half
    # raw junk that stresses the quoting/containment rules
    pieces = ['<img src="/a.jpg"', "<img src='/b é.png' alt='x'",
              "<img src=/c.gif", ' alt="cap &amp; text"', " width=320",
              ' srcset="/a.jpg 320w, /b.jpg 640w"', " title='t'", ">",
              "<figure>", "<figure class=x>", "</figure>",
              "<figcaption>Cap <b>bold</b></figcaption>",
              "<img", " ", "'", '"', "=", "src", "/a.jpg", "640w", ",",
              "\n", "<", "/", ">", "x y", "é", "alt", "<FIGURE >",
              "figure", "data:x,"]
    pages = [
        (f"http://fz.com/{i}",
         "".join(rng.choice(pieces) for _ in range(rng.randint(5, 60))))
        for i in range(150)
    ]
    sdf = image_text_pairs(_df(spark, pages))
    srows = [tuple(r) for r in sdf.collect()]
    ocols, orows = _pairs_oracle(pages)
    orows = [tuple(r) for r in orows]
    assert len(srows) == len(orows) > 0
    assert value_hash(sdf.columns, srows) == value_hash(ocols, orows)


# ---------------------------------------------------------------------------
# media refs (video/audio/source/track)


def _media_pages() -> list[tuple[str, str]]:
    return [
        # 1: full video — self src, poster, dims, two sources with
        # MIME types, subtitle + caption tracks (label with entity)
        ("http://ex.com/v", """<article>
<video src="/v.mp4" poster="/v.jpg" width="1280" height="720" controls>
  <source src="/v.webm" type="video/webm">
  <source src='/v-hi.mp4' type='video/mp4; codecs="avc1"'>
  <track src="/v.en.vtt" kind="subtitles" srclang="en" label="English">
  <track src=/v.de.vtt kind=captions srclang=de label="Deutsch &amp; Co">
</video></article>"""),
        # 2: audio with nested source only (no self src)
        ("http://ex.com/a", "<AUDIO controls><SOURCE SRC='/a.ogg' "
                            "TYPE='audio/ogg'></AUDIO>"),
        # 3: unclosed video degrades to the open tag: self src kept,
        # children lost
        ("http://ex.com/u", '<video src="/u.mp4" width=640>'
                            '<source src="/lost.webm">'),
        # 3b: the unclosed video must not swallow a later closed one
        ("http://ex.com/vb", '<video src="/b1.mp4"> stray '
                             '<video src="/b2.mp4">'
                             '<track src="/b2.vtt" kind=subtitles>'
                             "</video>"),
        # 3c: closed audio with a stray '<' before its close tag keeps
        # its children (the <* pre-close run)
        ("http://ex.com/astray", "<audio><source src='/as.ogg'>x<</audio>"),
        # 4: audio self src as data: URI, unquoted
        ("http://ex.com/d", "<audio src=data:audio/wav;base64,AAAA></audio>"),
        # 5: nothing / junk
        ("http://ex.com/none", "<p>plain</p>"),
        ("http://ex.com/junk", "\x00<video"),
    ]


def test_media_refs_hand_cases(spark):
    from fusus_spark.operators.multimodal import media_refs

    rows = media_refs(_df(spark, _media_pages())).collect()
    v = sorted(
        [r for r in rows if r["url"] == "http://ex.com/v"],
        key=lambda r: r["ref_idx"],
    )
    assert [(r["ref_kind"], r["src"]) for r in v] == [
        ("src", "/v.mp4"), ("poster", "/v.jpg"),
        ("source", "/v.webm"), ("source", "/v-hi.mp4"),
        ("track", "/v.en.vtt"), ("track", "/v.de.vtt"),
    ]
    assert all(r["element"] == "video" for r in v)
    assert all((r["width"], r["height"]) == (1280, 720) for r in v)
    assert v[2]["mime"] == "video/webm"
    assert v[3]["mime"] == 'video/mp4; codecs="avc1"'
    assert (v[4]["track_kind"], v[4]["srclang"], v[4]["label"]) == (
        "subtitles", "en", "English")
    assert (v[5]["track_kind"], v[5]["srclang"], v[5]["label"]) == (
        "captions", "de", "Deutsch & Co")

    a = [r for r in rows if r["url"] == "http://ex.com/a"]
    assert [(r["element"], r["ref_kind"], r["src"], r["mime"]) for r in a] == [
        ("audio", "source", "/a.ogg", "audio/ogg")]

    u = [r for r in rows if r["url"] == "http://ex.com/u"]
    assert [(r["ref_kind"], r["src"]) for r in u] == [("src", "/u.mp4")]
    assert u[0]["width"] == 640 and u[0]["height"] is None

    vb = sorted([r for r in rows if r["url"] == "http://ex.com/vb"],
                key=lambda r: (r["region_idx"], r["ref_idx"]))
    assert [(r["region_idx"], r["ref_kind"], r["src"]) for r in vb] == [
        (0, "src", "/b1.mp4"),          # degraded bare open tag
        (1, "src", "/b2.mp4"),          # the intact element, own region
        (1, "track", "/b2.vtt"),
    ]

    ast = [r for r in rows if r["url"] == "http://ex.com/astray"]
    assert [(r["element"], r["ref_kind"], r["src"]) for r in ast] == [
        ("audio", "source", "/as.ogg")]

    d = [r for r in rows if r["url"] == "http://ex.com/d"]
    assert d[0]["src"] == "data:audio/wav;base64,AAAA" and d[0]["is_data_uri"]

    assert not [r for r in rows
                if r["url"] in ("http://ex.com/none", "http://ex.com/junk")]


def test_media_refs_matches_duckdb_oracle(spark):
    from fusus_spark.operators.multimodal import (
        _MEDIA_REGION_RE,
        _SOURCE_TAG_RE,
        _TRACK_TAG_RE,
        media_refs,
    )

    sdf = media_refs(_df(spark, _media_pages()))
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.sql("CREATE TABLE pages (url VARCHAR, html VARCHAR)")
    con.executemany("INSERT INTO pages VALUES (?, ?)", _media_pages())
    reg_p = _MEDIA_REGION_RE.replace("'", "''")
    src_p = _SOURCE_TAG_RE.replace("'", "''")
    trk_p = _TRACK_TAG_RE.replace("'", "''")

    def attr(var: str, name: str) -> str:
        return _fg_sql(var, _IN_REGION + _attr_val_pat(name))

    def dim(name: str) -> str:
        return (f"nullif(regexp_extract({attr('region', name)}, "
                "'^(\\d{1,9})', 1), '')::INT")

    def pack(kind: str, var: str, src_attr: str = "src", mime="NULL",
             tkind="NULL", lang="NULL", label="NULL") -> str:
        return (f"struct_pack(ref_kind := '{kind}',"
                f" src := {attr(var, src_attr)},"
                f" mime := ({mime})::VARCHAR, track_kind := ({tkind})::VARCHAR,"
                f" srclang := ({lang})::VARCHAR, label := ({label})::VARCHAR)")

    orc = con.sql(f"""
WITH r0 AS (
  SELECT url, regexp_extract_all(html, '{reg_p}', 0) AS regions FROM pages
),
r1 AS (
  SELECT url, unnest(generate_series(1, len(regions))) AS ri, regions FROM r0
),
r AS (
  SELECT url, (ri - 1)::INT AS region_idx, regions[ri] AS region FROM r1
),
w AS (
  SELECT url, region_idx, region,
    lower(substr(region, 2, 5)) AS element,
    {dim('width')} AS width, {dim('height')} AS height,
    list_filter(
      [{pack('src', 'region')}] ||
      [{pack('poster', 'region', src_attr='poster')}] ||
      list_transform(regexp_extract_all(region, '{src_p}', 0),
        s -> {pack('source', 's', mime=attr('s', 'type'))}) ||
      list_transform(regexp_extract_all(region, '{trk_p}', 0),
        t -> {pack('track', 't', tkind=attr('t', 'kind'),
                   lang=attr('t', 'srclang'),
                   label=_clean_sql(attr('t', 'label')))}),
      x -> x.src IS NOT NULL) AS refs
  FROM r
),
e AS (
  SELECT url, region_idx, element, width, height, refs,
    unnest(generate_series(1, len(refs))) AS fi
  FROM w
)
SELECT url, region_idx, element, (fi - 1)::INT AS ref_idx,
  refs[fi].ref_kind AS ref_kind, refs[fi].src AS src,
  refs[fi].mime AS mime, refs[fi].track_kind AS track_kind,
  refs[fi].srclang AS srclang, refs[fi].label AS label,
  width, height,
  lower(substr(refs[fi].src, 1, 5)) = 'data:' AS is_data_uri
FROM e
""")
    orows = [tuple(r) for r in orc.fetchall()]
    assert len(srows) == len(orows) > 0
    assert sorted(sdf.columns) == sorted(orc.columns)
    assert value_hash(sdf.columns, srows) == value_hash(orc.columns, orows)
