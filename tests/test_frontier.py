"""Crawl-frontier operator: resolution branches against hand-computed
expectations (the reference Crawler's link handling, Crawler.java:121-307 +
:219-251), then full frontier_step semantics (seen anti-join + politeness
cap) on a tiny synthetic page set."""

from __future__ import annotations

from pyspark.sql import functions as F

from search_engine_spark.operators import frontier as FR

BASE = "https://www.Example.com/a/b/page.html?q=1"

# (href, expected resolved+canonicalized url or None when filtered out by
# frontier_step's scheme/extension rules)
CASES = [
    # absolute passes through; canonicalization lowercases prefix, strips :80
    ("HTTP://Other.example:80/X/y.html", "http://other.example/X/y.html"),
    # protocol-relative inherits base scheme
    ("//cdn.example/lib/j.js", "https://cdn.example/lib/j.js"),
    # root-relative resolves against the origin (query of base ignored)
    ("/top/z", "https://www.example.com/top/z"),
    # path-relative resolves against the base DIRECTORY
    ("sub/p.html", "https://www.example.com/a/b/sub/p.html"),
    # one ../ hop drops one directory
    ("../up.html", "https://www.example.com/a/up.html"),
    # chained hops clamp at the path root
    ("../../../deep.html", "https://www.example.com/deep.html"),
    # trailing slash stripped by canonicalization
    ("/dir/", "https://www.example.com/dir"),
    # extension blacklist is case-insensitive on the normalized url
    ("/img/pic.PNG", None),
    ("/notes.txt", None),
    # non-http(s) schemes filtered
    ("mailto:u@example.org", None),
    ("ftp://files.example/f", None),
]


def _page(spark, href):
    return spark.createDataFrame(
        [(BASE, f'<p><a class="l" href="{href}">t</a></p>')],
        "url string, html string",
    )


def test_resolution_branches(spark):
    for href, expected in CASES:
        got = [
            r["url"]
            for r in FR.frontier_step(_page(spark, href)).collect()
        ]
        assert got == ([expected] if expected else []), (href, got)


def test_fragment_only_and_self_links_dropped(spark):
    html = f'<a href="#top">x</a><a href="{BASE}">self</a>'
    df = spark.createDataFrame([(BASE, html)], "url string, html string")
    assert FR.frontier_step(df).count() == 0


def test_seen_anti_join(spark):
    html = '<a href="/a">1</a><a href="/b">2</a>'
    pages = spark.createDataFrame(
        [("https://h.example/p", html)], "url string, html string"
    )
    seen = spark.createDataFrame(
        [("https://h.example/a",)], "url string"
    )
    got = sorted(
        r["url"] for r in FR.frontier_step(pages, seen=seen).collect()
    )
    assert got == ["https://h.example/b"]


def test_per_host_cap_is_deterministic_lowest_urls(spark):
    html = "".join(f'<a href="/p/{i:02d}">x</a>' for i in range(10))
    pages = spark.createDataFrame(
        [("https://h.example/", html)], "url string, html string"
    )
    out = FR.frontier_step(pages, per_host_cap=3).collect()
    assert sorted(r["url"] for r in out) == [
        f"https://h.example/p/{i:02d}" for i in range(3)
    ]
    assert {r["host"] for r in out} == {"h.example"}


def test_dedup_across_pages(spark):
    # the same target reached from two pages appears once
    pages = spark.createDataFrame(
        [
            ("https://h.example/x", '<a href="/t">a</a>'),
            ("https://h.example/y", '<a href="/t#frag">b</a>'),
        ],
        "url string, html string",
    )
    rows = FR.frontier_step(pages).collect()
    assert [r["url"] for r in rows] == ["https://h.example/t"]


def test_apply_robots_prefix_semantics(spark):
    html = (
        '<a href="/p/10.html">a</a><a href="/p/9.html">b</a>'
        '<a href="/ok/1">c</a>'
    )
    pages = spark.createDataFrame(
        [("https://h.example/", html)], "url string, html string"
    )
    robots = spark.createDataFrame(
        [("h.example", "/p/1"), ("other.example", "/ok")],
        "host string, disallow string",
    )
    got = sorted(
        r["url"]
        for r in FR.frontier_step(pages, robots=robots).collect()
    )
    # /p/10.html blocked (prefix /p/1); /p/9.html allowed; other host's
    # rule does not apply here
    assert got == ["https://h.example/ok/1", "https://h.example/p/9.html"]


def test_url_pattern_blacklist_glob_full_match(spark):
    """Reference Crawler.java isBlacklisted semantics: '*' is a glob
    wildcard, the whole url must match, any pattern drops the candidate;
    other regex metacharacters in a pattern are literal."""
    html = (
        '<a href="/p/4/a.html">a</a><a href="/p/5/b.html">b</a>'
        '<a href="/x.y/c">c</a>'
    )
    pages = spark.createDataFrame(
        [("https://h.example/", html)], "url string, html string"
    )
    got = sorted(
        r["url"]
        for r in FR.frontier_step(
            pages, blacklist=["https://h.example/p/4*", "*/x.y/*"]
        ).collect()
    )
    assert got == ["https://h.example/p/5/b.html"]
    # full-match: a PREFIX pattern without trailing '*' matches nothing
    got2 = sorted(
        r["url"]
        for r in FR.frontier_step(
            pages, blacklist=["https://h.example/p"]
        ).collect()
    )
    assert len(got2) == 3
    # '.' is literal: the x.y pattern must not match an 'xzy' path
    html3 = '<a href="/xzy/c">c</a>'
    pages3 = spark.createDataFrame(
        [("https://h.example/", html3)], "url string, html string"
    )
    got3 = [
        r["url"]
        for r in FR.frontier_step(pages3, blacklist=["*/x.y/*"]).collect()
    ]
    assert got3 == ["https://h.example/xzy/c"]


def test_apply_robots_first_match_wins_allow(spark):
    """Extended (host, rule, allow, rule_order) table: an Allow listed
    BEFORE a Disallow wins for urls it matches (Crawler.java breaks on
    the first matching prefix), and the DuckDB mirror agrees."""
    html = (
        '<a href="/p/1/a.html">a</a><a href="/p/2/b.html">b</a>'
        '<a href="/q/c.html">c</a>'
    )
    pages = spark.createDataFrame(
        [("https://h.example/", html)], "url string, html string"
    )
    # robots.txt order: Allow /p/1  then  Disallow /p  — so /p/1/* is
    # allowed, /p/2/* blocked, /q/* untouched (no rule matches)
    robots = spark.createDataFrame(
        [("h.example", "/p/1", True, 0), ("h.example", "/p", False, 1)],
        "host string, rule string, allow boolean, rule_order int",
    )
    got = sorted(
        r["url"] for r in FR.frontier_step(pages, robots=robots).collect()
    )
    assert got == ["https://h.example/p/1/a.html", "https://h.example/q/c.html"]

    # flipping the order (Disallow /p first) blocks /p/1/* too
    robots_flipped = spark.createDataFrame(
        [("h.example", "/p/1", True, 1), ("h.example", "/p", False, 0)],
        "host string, rule string, allow boolean, rule_order int",
    )
    got2 = sorted(
        r["url"]
        for r in FR.frontier_step(pages, robots=robots_flipped).collect()
    )
    assert got2 == ["https://h.example/q/c.html"]

    # DuckDB mirror parity on the first ordering
    import duckdb

    sql = FR.apply_robots_fmw_sql(
        "SELECT * FROM (VALUES "
        "('h.example', 'https://h.example/p/1/a.html'), "
        "('h.example', 'https://h.example/p/2/b.html'), "
        "('h.example', 'https://h.example/q/c.html')) AS t(host, url)",
        "SELECT * FROM (VALUES "
        "('h.example', '/p/1', TRUE, 0), "
        "('h.example', '/p', FALSE, 1)) AS r(host, rule, allow, rule_order)",
    )
    mirror = sorted(u for (_h, u) in duckdb.sql(sql).fetchall())
    assert mirror == got


def test_bfs_hops_chain_and_bound(spark):
    # 0→1→2→…→9 chain: hop == node id, bounded at max_hops
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["hop"] for r in FR.bfs_hops(edges, seeds).collect()}
    assert got == {i: i for i in range(10)}
    bounded = {
        r["node"]: r["hop"]
        for r in FR.bfs_hops(edges, seeds, max_hops=3).collect()
    }
    assert bounded == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_hops_min_distance_on_cycle(spark):
    # cycle 0→1→2→0 plus shortcut 0→2: node 2 is 1 hop, not 2
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (0, 2)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["hop"] for r in FR.bfs_hops(edges, seeds).collect()}
    assert got == {0: 0, 1: 1, 2: 1}


def test_resolve_redirects_chain_and_cycle(spark):
    # chain a→b→c→T plus a 2-cycle x⇄y; T is terminal
    aliases = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "T"), ("x", "y"), ("y", "x")],
        "src string, dst string",
    )
    out = {r["src"]: (r["final"], r["resolved"])
           for r in FR.resolve_redirects(aliases).collect()}
    assert out == {
        "a": ("T", True), "b": ("T", True), "c": ("T", True),
        "x": (None, False), "y": (None, False),
    }


def test_resolve_redirects_log_rounds(spark):
    # a 30-hop chain resolves with max_rounds=5 (2^5 = 32 ≥ 30): the
    # pointer-doubling guarantee, impossible for hop-at-a-time in 5 rounds
    aliases = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(30)], "src string, dst string"
    )
    out = {r["src"]: (r["final"], r["resolved"])
           for r in FR.resolve_redirects(aliases, max_rounds=5).collect()}
    assert all(v == ("n30", True) for v in out.values()) and len(out) == 30


def test_anchor_texts_aggregation(spark):
    pages = spark.createDataFrame(
        [
            ("https://h.example/a/p1", '<a href="/t">big data</a>'),
            ("https://h.example/b/p2", "<a href='../t'>Big DATA engine</a>"),
            # nested markup → skipped by the plain-text contract;
            # mailto → scheme-filtered after resolution
            ("https://h.example/c", '<a href="/t"><b>x</b></a>'
                                    '<a href="mailto:u@h.io">mail</a>'),
        ],
        "url string, html string",
    )
    got = {
        (r["dst"], r["term"]): r["tf"]
        for r in FR.anchor_texts(pages).collect()
    }
    # both text anchors resolve to the SAME canonical target and their
    # tokenized words aggregate (case-folded)
    assert got == {
        ("https://h.example/t", "big"): 2,
        ("https://h.example/t", "data"): 2,
        ("https://h.example/t", "engine"): 1,
    }


def test_anchor_bm25_equals_body_bm25_on_pseudo_docs(spark):
    """The anchor scorer must equal the body scorer run on pseudo-docs
    built from each target's anchor bag (term repeated tf times) — same
    constants, idf, rounding, tie-break."""
    from search_engine_spark.operators.text_ops import bm25_topk

    pages = spark.createDataFrame(
        [
            (f"https://h{i}.example/p{i}",
             f'<a href="/t{i % 4}">big data {"rare" if i == 5 else "engine"}</a>'
             f'<a href="https://hub.example/x">data hub</a>')
            for i in range(12)
        ],
        "url string, html string",
    )
    anchors = FR.anchor_texts(pages)
    q = "big data rare hub"
    got = [tuple(r) for r in FR.anchor_bm25_topk(anchors, q, k=10).collect()]
    pseudo = anchors.groupBy("dst").agg(
        F.concat_ws(
            " ",
            F.flatten(
                F.collect_list(
                    F.array_repeat(F.col("term"), F.col("tf").cast("int"))
                )
            ),
        ).alias("text")
    )
    want = [
        (r["docid"], r["score"])
        for r in bm25_topk(pseudo, q, k=10, docid="dst", text="text").collect()
    ]
    assert got == want and len(got) > 3


def test_bm25f_reduces_to_bm25_at_zero_weight(spark):
    from search_engine_spark.operators.text_ops import bm25_topk, bm25f_topk

    docs = spark.createDataFrame(
        [(i, f"https://w.example/p{i}",
          ["spark joins data", "tables and rows", "spark spark table",
           "query engines", "data tables"][i])
         for i in range(5)],
        "doc_id long, url string, text string",
    )
    anchors = spark.createDataFrame(
        [("https://w.example/p3", "spark", 4),
         ("https://w.example/p3", "table", 1),
         ("https://w.example/p1", "query", 2)],
        "dst string, term string, tf long",
    )
    q = "spark table"
    zero = [tuple(r) for r in bm25f_topk(docs, anchors, q, w_anchor=0.0).collect()]
    plain = [tuple(r) for r in bm25_topk(docs, q, k=20).collect()]
    assert zero == plain
    # with weight, the anchor-only match (doc 3: 'query engines' has NO
    # body tf for either term) enters the result purely via anchors
    w = {r["docid"]: r["score"] for r in bm25f_topk(docs, anchors, q).collect()}
    assert 3 in w and w[3] > 0


def test_frontier_sql_rejects_both_robots_variants():
    """The prefix and first-match-wins robots branches define identically
    named CTEs; passing both must fail loudly, not emit invalid SQL
    (review finding)."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not both"):
        FR.frontier_sql(
            "pages AS (SELECT 'u' AS url, '' AS html)",
            robots_sql="SELECT 'h' AS host, '/x' AS disallow",
            robots_fmw_sql=(
                "SELECT 'h' AS host, '/x' AS rule, FALSE AS allow,"
                " 1 AS rule_order"
            ),
        )


def test_politeness_schedule_slots_and_delays(spark):
    """Wave planner contract: slots are 0-based, contiguous, lowest-url-
    first within each host; not_before_s = slot x the host's crawl delay,
    falling back to default_delay_s for hosts absent from the delays
    table; the DuckDB mirror matches row-for-row."""
    wave = spark.createDataFrame(
        [("a.example", f"http://a.example/p/{i}") for i in range(4)]
        + [("b.example", "http://b.example/x"),
           ("b.example", "http://b.example/a")],
        "host string, url string",
    )
    delays = spark.createDataFrame(
        [("a.example", 2.5)], "host string, delay_s double"
    )
    got = {
        (r["host"], r["url"]): (r["slot"], r["not_before_s"])
        for r in FR.politeness_schedule(
            wave, default_delay_s=1.0, delays=delays
        ).collect()
    }
    # a.example: crawl-delay 2.5s, slots follow url sort order
    for i in range(4):
        assert got[("a.example", f"http://a.example/p/{i}")] == (i, i * 2.5)
    # b.example: no delays row -> default 1.0; '/a' sorts before '/x'
    assert got[("b.example", "http://b.example/a")] == (0, 0.0)
    assert got[("b.example", "http://b.example/x")] == (1, 1.0)

    import duckdb

    sql = FR.politeness_schedule_sql(
        "SELECT * FROM (VALUES "
        + ", ".join(
            f"('{h}', '{u}')" for (h, u) in sorted(got)
        )
        + ") AS w(host, url)",
        default_delay_s=1.0,
        delays_sql="SELECT 'a.example' AS host, 2.5 AS delay_s",
    )
    mirror = {
        (h, u): (s, nb) for h, u, s, nb in duckdb.sql(sql).fetchall()
    }
    assert mirror == got


def test_blacklist_pred_equals_regex_semantics(spark):
    """blacklist_pred compiles each glob to the cheapest JVM predicate
    (equality / startswith / endswith / residual regex) — it must keep
    blacklist_regex's exact full-url-match semantics on every pattern
    shape, including the interior-star fallback."""
    pats = ["http://site4.example/p/1*", "*.pdf",
            "http://exact.example/x", "http://a*/mid/*"]
    urls = spark.createDataFrame(
        [("http://site4.example/p/199",), ("http://site4.example/p/2",),
         ("http://x/file.pdf",), ("http://exact.example/x",),
         ("http://exact.example/xy",), ("http://abc/mid/z",),
         ("http://abc/other",), ("http://site4.example/q/1",)],
        "url string",
    )
    a = {r["url"] for r in urls.filter(FR.blacklist_pred(pats)).collect()}
    b = {
        r["url"]
        for r in urls.filter(
            F.col("url").rlike(FR.blacklist_regex(pats))
        ).collect()
    }
    assert a == b == {
        "http://abc/mid/z", "http://exact.example/x",
        "http://site4.example/p/199", "http://x/file.pdf",
    }


# ---------------------------------------------------------------------------
# Sitemap parsing (sitemaps.org; operators/frontier.py sitemap_entries)
# ---------------------------------------------------------------------------


def test_sitemap_entries_urlset_index_trim_malformed(spark):
    from search_engine_spark.operators.frontier import sitemap_entries

    urlset = (
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>https://a.example/1.html</loc>"
        "<lastmod>2026-03-01</lastmod></url>"
        "<url><loc>\n   https://a.example/2.html \n</loc></url>"
        "<url><priority>0.9</priority></url>"
        "</urlset>"
    )
    index = (
        "<sitemapindex>"
        "<sitemap><loc>https://a.example/sm1.xml</loc></sitemap>"
        "<sitemap><loc>https://a.example/sm2.xml</loc>"
        "<lastmod>2026-04-05</lastmod></sitemap>"
        "</sitemapindex>"
    )
    df = spark.createDataFrame(
        [
            ("https://a.example/sitemap.xml", urlset),
            ("https://a.example/sitemap_index.xml", index),
            ("https://a.example/not-a-sitemap.xml", "<html>nope</html>"),
        ],
        "url string, xml string",
    )
    got = sorted(tuple(r) for r in sitemap_entries(df).collect())
    assert got == [
        ("https://a.example/sitemap.xml", "url",
         "https://a.example/1.html", "2026-03-01"),
        ("https://a.example/sitemap.xml", "url",
         "https://a.example/2.html", ""),
        ("https://a.example/sitemap_index.xml", "sitemap",
         "https://a.example/sm1.xml", ""),
        ("https://a.example/sitemap_index.xml", "sitemap",
         "https://a.example/sm2.xml", "2026-04-05"),
    ]
