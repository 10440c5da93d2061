"""Outlink extraction + host webgraph (operators/weblinks.py).

The href regex is shared verbatim between the Spark plan (Java regex),
the DuckDB oracle (RE2) and the pure-Python reference below (CPython
`re`); the first test pins that three-way parity on adversarial html.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from tiger_etl_spark.operators import graph, weblinks


def _py_hrefs(html: str) -> list[str]:
    """Pure-Python reference extractor (same pattern source of truth)."""
    return re.findall(weblinks.HREF_PATTERN, html)


TRICKY_PAGES = [
    # attribute order, extra attrs, whitespace around '='
    ('https://a.example.com/x/page.html',
     b'<a class="nav" href = "https://b.example.com/top">t</a>'
     b"<a href='/rooted'>r</a>"
     b'<A HREF="ignored-uppercase">u</A>'  # regex is case-sensitive: dropped
     b'<link rel="stylesheet" href="style.css">'
     b'<a href="//c.example.com:8080/pp">proto-rel</a>'
     b'<a href="#frag">f</a><a href="mailto:x@y.z">m</a>'
     b'<a href="javascript:void(0)">j</a>'),
    # multiline tag, duplicate link (multiplicity kept), query string
    ('http://b.example.com/dir/sub/',
     b'<a\n  href="../up.html">u</a>\n'
     b'<a href="https://a.example.com/q?k=v&x=1#h">q</a>\n'
     b'<a href="https://a.example.com/q?k=v&x=1#h">q-dup</a>'),
    # no links at all / empty body
    ('https://empty.example.com/', b'<html><body>nothing here</body></html>'),
]


def test_raw_hrefs_matches_python_reference(spark):
    df = spark.createDataFrame(TRICKY_PAGES, "url string, html binary")
    got = {
        r["url"]: r["hrefs"]
        for r in df.select(
            "url", weblinks.raw_hrefs(F.col("html")).alias("hrefs")
        ).collect()
    }
    for url, html in TRICKY_PAGES:
        assert got[url] == _py_hrefs(html.decode()), url


def test_resolution_rules(spark):
    df = spark.createDataFrame(TRICKY_PAGES[:1], "url string, html binary")
    links = sorted(
        r["link"]
        for r in weblinks.extract_outlinks(df).collect()
    )
    assert links == sorted([
        "https://b.example.com/top",          # absolute kept
        "https://a.example.com/rooted",       # root-relative -> origin
        "https://a.example.com/x/style.css",  # relative -> base dir
        "https://c.example.com:8080/pp",      # protocol-relative -> scheme
        # uppercase HREF, mailto, javascript, #frag all dropped
    ])


def test_relative_walk_and_multiplicity(spark):
    df = spark.createDataFrame(TRICKY_PAGES[1:2], "url string, html binary")
    links = [r["link"] for r in weblinks.extract_outlinks(df).collect()]
    # '../up.html' resolves against the base DIRECTORY (kept verbatim —
    # dot-segment normalization is out of scope and deterministic)
    assert "http://b.example.com/dir/sub/../up.html" in links
    # duplicate hrefs kept (weighted edges downstream)
    assert links.count("https://a.example.com/q?k=v&x=1#h") == 2


def test_host_edges_aggregation_and_self_loops(spark):
    df = spark.createDataFrame(TRICKY_PAGES, "url string, html binary")
    out = weblinks.extract_outlinks(df)
    edges = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in weblinks.host_edges(out).collect()
    }
    # self-loops (a->a from the relative links) are dropped by default
    assert all(s != d for s, d in edges)
    # duplicate q-link from page 2 counted with multiplicity
    assert edges[("b.example.com", "a.example.com")] == 2
    # port is NOT part of the host
    assert ("a.example.com", "c.example.com") in edges
    with_loops = weblinks.host_edges(out, drop_self_loops=False)
    loops = with_loops.where(F.col("src_host") == F.col("dst_host"))
    # a->a (page-1 relative links collapse) and b->b (../up.html)
    assert loops.count() == 2


def test_extract_anchors_matches_python_reference(spark):
    """Anchor regex parity (Java vs CPython) + resolution + trimming."""
    df = spark.createDataFrame(TRICKY_PAGES, "url string, html binary")
    got = sorted(
        (r["url"], r["link"], r["anchor_text"])
        for r in weblinks.extract_anchors(df).collect()
    )
    want = []
    for url, html in TRICKY_PAGES:
        for m in re.finditer(weblinks.ANCHOR_PATTERN, html.decode()):
            raw, txt = m.group(1), m.group(2).strip()
            if re.match(r"^(javascript:|mailto:|tel:|data:|#)", raw):
                continue
            if re.match(r"^https?://", raw):
                link = raw
            elif raw.startswith("//"):
                link = re.match(r"^(https?):", url).group(1) + ":" + raw
            elif raw.startswith("/"):
                link = re.match(r"^(https?://[^/?#]+)", url).group(1) + raw
            else:
                link = re.sub(r"[^/]*$", "", url) + raw
            want.append((url, link, txt))
    assert got == sorted(want) and got
    # the multiline-tag anchor made it through with its text
    assert ("http://b.example.com/dir/sub/",
            "http://b.example.com/dir/sub/../up.html", "u") in got


def test_feeds_graph_operators(spark):
    df = spark.createDataFrame(TRICKY_PAGES, "url string, html binary")
    e = weblinks.host_edges(weblinks.extract_outlinks(df))
    ranks = graph.pagerank(e, iterations=2, src_col="src_host", dst_col="dst_host")
    rows = {r["node_key"]: r["rank"] for r in ranks.collect()}
    # a.example.com receives links from b -> highest rank
    assert max(rows, key=rows.get) == "a.example.com"
    deg = graph.degrees(e, src_col="src_host", dst_col="dst_host")
    d = {r["node_key"]: (r["out_degree"], r["in_degree"]) for r in deg.collect()}
    assert d["a.example.com"][0] >= 1 and d["a.example.com"][1] >= 1


META_PAGES = [
    # all fields present, mixed case tags, attr whitespace
    ('https://a.example.com/x/page.html',
     b'<TITLE>Hello World</TITLE>'
     b'<meta name = "description" content = "a page about things">'
     b"<meta name='robots' content='NOINDEX, nofollow'>"
     b'<link rel="canonical" href="https://canon.example.com/x">'),
    # no head metadata at all
    ('https://b.example.com/bare', b'<html><body>text</body></html>'),
    # root-relative canonical, empty title (-> NULL), robots index-only
    ('https://c.example.com/dir/page',
     b'<title></title>'
     b'<meta name="robots" content="index,follow">'
     b'<link rel="canonical" href="/canonical/path">'),
    # relative canonical resolves against the page directory;
    # single-quoted description
    ('https://d.example.com/dir/sub/page.html',
     b"<meta name='description' content='single quoted'>"
     b'<link rel="canonical" href="other.html">'),
    # pseudo-link canonical -> NULL
    ('https://e.example.com/p',
     b'<link rel="canonical" href="javascript:void(0)">'),
]


def test_extract_page_meta_fields(spark):
    df = spark.createDataFrame(META_PAGES, "url string, html binary")
    rows = {
        r["url"]: r
        for r in weblinks.extract_page_meta(df).collect()
    }
    a = rows["https://a.example.com/x/page.html"]
    assert a["title"] == "Hello World"
    assert a["meta_description"] == "a page about things"
    assert a["canonical_url"] == "https://canon.example.com/x"
    assert a["robots"] == "noindex, nofollow"  # lower-cased
    assert a["noindex"] and a["nofollow"]

    b = rows["https://b.example.com/bare"]
    assert b["title"] is None
    assert b["meta_description"] is None
    assert b["canonical_url"] is None
    assert b["robots"] is None
    assert not b["noindex"] and not b["nofollow"]

    c = rows["https://c.example.com/dir/page"]
    assert c["title"] is None  # empty metadata is no metadata
    assert c["canonical_url"] == "https://c.example.com/canonical/path"
    assert c["robots"] == "index,follow"
    assert not c["noindex"] and not c["nofollow"]

    d = rows["https://d.example.com/dir/sub/page.html"]
    assert d["meta_description"] == "single quoted"
    assert d["canonical_url"] == "https://d.example.com/dir/sub/other.html"

    e = rows["https://e.example.com/p"]
    assert e["canonical_url"] is None


def test_extract_page_meta_passthrough_and_shape(spark):
    df = spark.createDataFrame(
        [(7, "https://a.example.com/", b"<title>t</title>")],
        "doc_id long, url string, html binary",
    )
    out = weblinks.extract_page_meta(df)
    assert out.columns == [
        "doc_id", "url", "title", "meta_description",
        "canonical_url", "robots", "noindex", "nofollow",
    ]
    assert out.collect()[0]["doc_id"] == 7


ROBOTS_BODY = """# example robots
User-agent: *
Disallow: /private
Allow: /private/pub
Disallow:

User-agent: TigerBot
Disallow: /tb
Allow: /tb/ok
"""


def test_parse_robots_grouping_and_grammar(spark):
    df = spark.createDataFrame(
        [("a.example.com", ROBOTS_BODY),
         ("empty.example.com", "# only comments\n\n")],
        "host string, robots_txt string",
    )
    rules = {
        (r["host"], r["agent"], r["rule"], r["path_prefix"])
        for r in weblinks.parse_robots(df).collect()
    }
    assert rules == {
        ("a.example.com", "*", "disallow", "/private"),
        ("a.example.com", "*", "allow", "/private/pub"),
        ("a.example.com", "tigerbot", "disallow", "/tb"),
        ("a.example.com", "tigerbot", "allow", "/tb/ok"),
    }  # empty Disallow dropped; comment-only host yields nothing


def test_robots_allowed_rep_semantics(spark):
    robots = spark.createDataFrame(
        [("a.example.com", ROBOTS_BODY)], "host string, robots_txt string"
    )
    rules = weblinks.parse_robots(robots)
    pages = spark.createDataFrame(
        [(u,) for u in (
            "https://a.example.com/",                 # no match -> allowed
            "https://a.example.com/private/x",        # disallow /private
            "https://a.example.com/private/pub/x",    # longest prefix: allow
            "https://a.example.com/tb/ok/1",          # agent group
            "https://b.example.com/anything",         # no robots -> allowed
        )],
        "url string",
    )
    # default agent '*': tigerbot group invisible
    star = {r["url"]: r for r in weblinks.robots_allowed(pages, rules).collect()}
    assert star["https://a.example.com/"]["allowed"] is True
    assert star["https://a.example.com/"]["matched_prefix"] is None
    assert star["https://a.example.com/private/x"]["allowed"] is False
    assert star["https://a.example.com/private/pub/x"]["allowed"] is True
    assert star["https://a.example.com/private/pub/x"]["matched_prefix"] == "/private/pub"
    assert star["https://a.example.com/tb/ok/1"]["allowed"] is True  # '*' has no /tb rule
    assert star["https://b.example.com/anything"]["allowed"] is True

    # exact agent: its group SHADOWS '*' (no /private rule anymore)
    tb = {
        r["url"]: r
        for r in weblinks.robots_allowed(pages, rules, agent="TigerBot").collect()
    }
    assert tb["https://a.example.com/private/x"]["allowed"] is True
    assert tb["https://a.example.com/tb/ok/1"]["allowed"] is True   # allow /tb/ok
    p = spark.createDataFrame(
        [("https://a.example.com/tb/secret",)], "url string"
    )
    tb2 = weblinks.robots_allowed(p, rules, agent="tigerbot").collect()[0]
    assert tb2["allowed"] is False and tb2["matched_prefix"] == "/tb"


def test_robots_allowed_equal_length_allow_wins_and_plan(spark):
    robots = spark.createDataFrame(
        [("t.example.com",
          "User-agent: *\nDisallow: /d\nAllow: /d\nDisallow: /")],
        "host string, robots_txt string",
    )
    rules = weblinks.parse_robots(robots)
    pages = spark.createDataFrame(
        [("https://t.example.com/d/x",), ("https://t.example.com/y",)],
        "url string",
    )
    out = weblinks.robots_allowed(pages, rules)
    got = {r["url"]: r["allowed"] for r in out.collect()}
    assert got["https://t.example.com/d/x"] is True   # tie -> allow wins
    assert got["https://t.example.com/y"] is False    # Disallow: /
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the page side must not shuffle: one broadcast join, no page exchange
    assert "BroadcastHashJoin" in plan, plan


def test_main_content_link_density(spark):
    """Boilerplate removal: nav/footer chrome (short, link-saturated)
    drops; body prose survives; block splitting handles nesting and
    case-insensitive tags."""
    html = (
        b'<NAV><a href="/">Home</a> <a href="/a">About</a> '
        b'<a href="/c">Contact</a></NAV>'
        b"<p>This paragraph is genuine body prose with many plain words "
        b"and zero links at all.</p>"
        b"<p>ok</p>"  # too few words -> dropped
        b'<div>Read the <a href="/d">docs</a> for this project; mostly '
        b"prose with one short link inside a long sentence.</div>"
        b'<footer><a href="/tos">terms of service</a> '
        b'<a href="/priv">privacy policy</a> &copy;</footer>'
    )
    df = spark.createDataFrame([(1, html)], "id long, html binary")
    out = weblinks.extract_main_content(df).collect()[0]
    assert "genuine body prose" in out["main_text"]
    assert "docs" in out["main_text"]  # low-density block kept, tags gone
    assert "Home" not in out["main_text"]
    assert "terms of service" not in out["main_text"]
    assert "<" not in out["main_text"]
    assert out["n_blocks_kept"] == 2
    assert out["n_blocks_total"] == 5
    # empty page
    empty = spark.createDataFrame([(1, b"")], "id long, html binary")
    e = weblinks.extract_main_content(empty).collect()[0]
    assert e["main_text"] == "" and e["n_blocks_total"] == 0
