"""Crawl-index operators (late r11): SURT urlkeys, CDX-J parsing,
robots.txt rules + gating."""
from __future__ import annotations

from pyspark.sql import functions as F


def test_surt_key_variants(spark):
    """Canonical-form collapse: scheme/case/www/default-port/query-
    order/fragment variants of one resource share ONE urlkey;
    non-default ports and real host differences keep distinct keys."""
    from lwetl_spark.functions.text import surt_key

    variants = [
        "http://www.Example.com/a/B?b=2&a=1",
        "https://EXAMPLE.com:443/a/b?a=1&b=2#frag",
        "http://example.com:80/a/B?b=2&a=1",
        "https://u:pw@www2.example.com/a/b?a=1&b=2",
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(variants)],
                               "id long, url string")
    keys = {r["k"] for r in df.select(surt_key("url").alias("k")).collect()}
    assert keys == {"com,example)/a/b?a=1&b=2"}
    other = spark.createDataFrame([
        (1, "http://example.com:8080/a/b"),
        (2, "http://sub.example.com/a/b"),
        (3, "http://example.com/"),
        (4, "example.com/x?&"),  # scheme-less, empty query params
    ], "id long, url string")
    got = {r["id"]: r["k"] for r in other.select(
        "id", surt_key("url").alias("k")).collect()}
    assert got[1] == "com,example:8080)/a/b"
    assert got[2] == "com,example,sub)/a/b"
    assert got[3] == "com,example)/"
    assert got[4] == "com,example)/x"


def test_cdx_records_parse_and_corruption(spark):
    """Field extraction, numeric casts, and the two failure legs:
    malformed JSON nulls the payload fields; a non-14-digit timestamp
    keeps them but flags the line — neither kills the task."""
    from lwetl_spark.operators.crawl import cdx_records

    lines = [
        (1, 'com,ex)/p 20240301120000 {"url": "http://ex.com/p",'
            ' "mime": "text/html", "status": "200", "digest": "d1",'
            ' "length": "321", "offset": "99", "filename": "c.warc.gz"}'),
        (2, "com,ex)/q 2024 "
            '{"url": "http://ex.com/q", "status": "301"}'),
        (3, "com,ex)/r 20240301120000 {nope"),
        (4, ""),
    ]
    out = {r["doc_id"]: r for r in cdx_records(
        spark.createDataFrame(lines, "doc_id long, line string"))
        .collect()}
    r1 = out[1]
    assert r1["valid"] and r1["urlkey"] == "com,ex)/p"
    assert (r1["status"], r1["length"], r1["offset"]) == (200, 321, 99)
    assert r1["filename"] == "c.warc.gz"
    assert out[2]["valid"] is False and out[2]["url"] == "http://ex.com/q"
    assert out[2]["ts"] is None
    assert out[3]["valid"] is False and out[3]["url"] is None
    assert out[4]["valid"] is False


def test_robots_rules_grouping(spark):
    """REP group formation: shared user-agent runs, comment
    stripping, empty-Disallow dropped, sitemap group-independence,
    case-insensitive directives, CRLF tolerance."""
    from lwetl_spark.operators.crawl import robots_rules

    txt = ("# top comment\r\n"
           "USER-AGENT: BotA\r\n"
           "user-agent: BotB\r\n"
           "disallow: /x/  # trailing comment\r\n"
           "Disallow:\r\n"          # empty: no restriction, dropped
           "\r\n"
           "User-agent: *\r\n"
           "Allow: /ok\r\n"
           "Sitemap: https://s/map.xml\r\n")
    rows = robots_rules(spark.createDataFrame(
        [(7, txt)], "doc_id long, robots string")).collect()
    got = {(r["agent"], r["directive"], r["pattern"]) for r in rows}
    assert got == {
        ("bota", "disallow", "/x/"),
        ("botb", "disallow", "/x/"),
        ("*", "allow", "/ok"),
        (None, "sitemap", "https://s/map.xml"),
    }


def test_robots_gate_precedence(spark):
    """RFC 9309 precedence: specific group SHADOWS `*` entirely,
    longest match wins, allow wins length ties, `$` anchors, `*`
    wildcards, unknown hosts allowed."""
    from lwetl_spark.operators.crawl import robots_gate, robots_rules

    txt = ("User-agent: Me\n"
           "Disallow: /a/\n"
           "Allow: /a/pub*\n"
           "Disallow: /exact$\n"
           "Allow: /tie/\n"
           "Disallow: /tie/\n"
           "\n"
           "User-agent: *\n"
           "Disallow: /\n")
    rules = robots_rules(spark.createDataFrame(
        [(1, txt)], "doc_id long, robots string")) \
        .withColumn("host", F.lit("h"))
    urls = spark.createDataFrame(
        [("/a/secret", "h"), ("/a/public1", "h"), ("/exact", "h"),
         ("/exactly", "h"), ("/tie/x", "h"), ("/other", "h"),
         ("/any", "unknown-host")],
        "url string, host string")
    got = {(r["url"], r["host"]): r for r in
           robots_gate(urls, rules, agent="Me").collect()}
    assert got[("/a/secret", "h")]["allowed"] is False
    assert got[("/a/public1", "h")]["allowed"] is True
    assert got[("/a/public1", "h")]["matched_pattern"] == "/a/pub*"
    assert got[("/exact", "h")]["allowed"] is False
    assert got[("/exactly", "h")]["allowed"] is True  # $ anchored
    assert got[("/tie/x", "h")]["allowed"] is True    # allow wins tie
    # the * group's Disallow / must NOT leak into Me's verdicts
    assert got[("/other", "h")]["allowed"] is True
    assert got[("/any", "unknown-host")]["allowed"] is True
    # an agent with no specific group falls back to *
    star = {(r["url"], r["host"]): r for r in
            robots_gate(urls, rules, agent="Stranger").collect()}
    assert star[("/other", "h")]["allowed"] is False
    assert star[("/any", "unknown-host")]["allowed"] is True


def test_sitemap_entries_kinds_and_truncation(spark):
    """urlset vs sitemapindex kinds, optional fields, loc-less entry
    dropped, truncated tail block keeps closed entries, non-XML
    payload yields the invalid sentinel row."""
    from lwetl_spark.operators.crawl import sitemap_entries

    xmls = [
        (1, '<urlset xmlns="http://www.sitemaps.org/schemas/'
            'sitemap/0.9"><url><loc>https://a/p1</loc>'
            "<lastmod>2024-01-01</lastmod><priority>0.8</priority>"
            "</url><url><loc> https://a/p2 </loc>"
            "<changefreq>daily</changefreq></url>"
            "<url><lastmod>2024-02-02</lastmod></url></urlset>"),
        (2, "<sitemapindex><sitemap><loc>https://a/s1.xml</loc>"
            "<lastmod>2024-03-03</lastmod></sitemap></sitemapindex>"),
        (3, "not xml at all"),
        (4, "<urlset><url><loc>https://b/x</loc></url>"
            "<url><loc>https://b/y</loc>"),
    ]
    out = sitemap_entries(spark.createDataFrame(
        xmls, "doc_id long, xml string"))
    rows = sorted((tuple(r) for r in out.collect()))
    assert rows == [
        (1, "urlset", 0, "https://a/p1", "2024-01-01", "", "0.8", True),
        (1, "urlset", 1, "https://a/p2", "", "daily", "", True),
        (2, "index", 0, "https://a/s1.xml", "2024-03-03", "", "", True),
        (3, "invalid", None, None, None, None, None, False),
        (4, "urlset", 0, "https://b/x", "", "", "", True),
    ]


def test_resolve_url_rfc3986(spark):
    """Reference-resolution forms (RFC 3986 §5.2/§5.4): absolute,
    scheme-relative, root-relative, relative, ./ and ../ chains (incl.
    climbing past the root), terminal dot segments keeping the
    trailing slash, fragment-only, query-only, and foreign schemes."""
    from lwetl_spark.functions.text import html_links, resolve_url

    base = "https://WWW.H1.example/dir2/sub/page.html?x=1#top"
    cases = [
        ("", "https://WWW.H1.example/dir2/sub/page.html?x=1"),
        ("http://abs.ex/a", "http://abs.ex/a"),
        ("//cdn.ex/z", "https://cdn.ex/z"),
        ("/r/x", "https://WWW.H1.example/r/x"),
        ("rel/y", "https://WWW.H1.example/dir2/sub/rel/y"),
        ("../up", "https://WWW.H1.example/dir2/up"),
        ("../../top", "https://WWW.H1.example/top"),
        ("../../../over", "https://WWW.H1.example/over"),
        ("./here", "https://WWW.H1.example/dir2/sub/here"),
        ("a/./b/../c", "https://WWW.H1.example/dir2/sub/a/c"),
        ("#sec", "https://WWW.H1.example/dir2/sub/page.html?x=1"),
        ("q?only=2", "https://WWW.H1.example/dir2/sub/q?only=2"),
        ("mailto:x@y.z", "mailto:x@y.z"),
        ("..", "https://WWW.H1.example/dir2/"),
        (".", "https://WWW.H1.example/dir2/sub/"),
        ("../", "https://WWW.H1.example/dir2/"),
        ("x/..", "https://WWW.H1.example/dir2/sub/"),
    ]
    df = spark.createDataFrame(
        [(i, base, r) for i, (r, _) in enumerate(cases)],
        "id long, b string, r string")
    got = {r["id"]: r["res"] for r in df.select(
        "id", resolve_url("b", "r").alias("res")).collect()}
    for i, (ref, exp) in enumerate(cases):
        assert got[i] == exp, (ref, got[i], exp)

    html = ('<p><a href="/x">1</a><A CLASS="z" HREF=\'rel/y\'>2</A>'
            '<a data-x="1" href = "#s">3</a><a>nohref</a></p>')
    refs = spark.createDataFrame([(1, html)], "id long, h string") \
        .select(html_links("h").alias("l")).collect()[0]["l"]
    assert refs == ["/x", "rel/y", "#s"]


def test_fetch_schedule_delays_and_slots(spark):
    """Crawl-delay resolution (agent group beats `*`, default when
    absent or non-numeric) and per-host slot sequencing ordered by
    url."""
    from lwetl_spark.operators.crawl import fetch_schedule, robots_rules

    txts = [
        (1, "User-agent: Me\nCrawl-delay: 5\n\n"
            "User-agent: *\nCrawl-delay: 2\n"),
        (2, "User-agent: *\nCrawl-delay: 7\n"),
        (3, "User-agent: *\nCrawl-delay: soon\n"),  # non-numeric
    ]
    rules = robots_rules(spark.createDataFrame(
        txts, "doc_id long, robots string")) \
        .withColumn("host", F.format_string("h%d", F.col("doc_id")))
    urls = spark.createDataFrame(
        [("/b", "h1"), ("/a", "h1"), ("/c", "h1"),
         ("/x", "h2"), ("/y", "h3"), ("/z", "h4")],
        "url string, host string")
    got = {(r["host"], r["url"]): r for r in fetch_schedule(
        urls, rules, agent="Me", default_delay_s=4).collect()}
    assert [got[("h1", u)]["fetch_at_ms"]
            for u in ("/a", "/b", "/c")] == [0, 5000, 10000]
    assert got[("h2", "/x")]["delay_s"] == 7   # * fallback
    assert got[("h3", "/y")]["delay_s"] == 4   # non-numeric -> default
    assert got[("h4", "/z")]["delay_s"] == 4   # no rules -> default
    assert all(r["slot"] == 0 for k, r in got.items() if k[0] != "h1")


def test_resolve_redirects_outcomes(spark):
    """Chains land ('ok' with hop counts), cycles detect via the
    visited array ('loop', including self-loops), snapshot holes are
    'dangling', and over-long chains hit 'cap' at max_hops."""
    from lwetl_spark.operators.crawl import resolve_redirects

    rows = [
        ("a", 301, "b"), ("b", 301, "c"), ("c", 200, None),
        ("x", 302, "y"), ("y", 302, "x"),
        ("d", 301, "missing"),
        ("e", 200, None),
        ("f", 301, "f"),
        ("l1", 301, "l2"), ("l2", 301, "l3"), ("l3", 301, "l4"),
        ("l4", 301, "l5"), ("l5", 200, None),
    ]
    df = spark.createDataFrame(
        rows, "urlkey string, status int, redirect_key string")
    got = {r["urlkey"]: r for r in
           resolve_redirects(df, max_hops=3).collect()}
    assert (got["a"]["final_key"], got["a"]["hops"],
            got["a"]["outcome"]) == ("c", 2, "ok")
    assert got["c"]["hops"] == 0 and got["c"]["outcome"] == "ok"
    assert got["x"]["outcome"] == "loop" and got["x"]["hops"] == 2
    assert got["f"]["outcome"] == "loop" and got["f"]["hops"] == 1
    assert got["d"]["outcome"] == "dangling"
    assert got["d"]["final_key"] == "missing"
    assert got["e"]["outcome"] == "ok" and got["e"]["hops"] == 0
    # l1 needs 4 hops; at max_hops=3 it's capped mid-chain
    assert got["l1"]["outcome"] == "cap" and got["l1"]["hops"] == 3
    assert got["l2"]["outcome"] == "ok" and got["l2"]["hops"] == 3


def test_html_tables_extraction(spark):
    """Case-insensitive table/tr/th/td blocks with attributes, entity
    decode + tag strip through the html_text chain, header flags,
    multiple tables, and the no-table / truncated-table behaviors."""
    from lwetl_spark.operators.webmine import html_tables

    html = ('<html><p>junk</p><TABLE class="z">'
            "<tr><TH>Name</th><th>Qty</th></tr>"
            "<tr><td> Apple &amp; co </td><td><b>5</b></td></tr>"
            "</TABLE><table><tr><td>solo</td></tr></table></html>")
    rows = [(1, html), (2, "<p>no tables</p>"),
            (3, "<table><tr><td>done</td></tr><tr><td>cut")]
    out = html_tables(spark.createDataFrame(
        rows, "doc_id long, html string"))
    got = sorted(tuple(r) for r in out.collect())
    assert got == [
        (1, 0, 0, 0, True, "Name"),
        (1, 0, 0, 1, True, "Qty"),
        (1, 0, 1, 0, False, "Apple & co"),
        (1, 0, 1, 1, False, "5"),
        (1, 1, 0, 0, False, "solo"),
    ]  # doc 2: no rows; doc 3: unterminated table -> no block


def test_feed_entries_rss_and_atom(spark):
    """RSS element-text links / pubDate / guid vs Atom href links
    (rel=alternate preferred over rel=self), entity-decoded titles,
    invalid sentinel, and complete-blocks-before-truncation."""
    from lwetl_spark.operators.webmine import feed_entries

    rss = ('<rss version="2.0"><channel><title>B</title>'
           "<item><title>Post &amp; one</title>"
           "<link>https://b/p1</link>"
           "<pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate>"
           '<guid isPermaLink="true">https://b/p1</guid></item>'
           "<item><title>Two</title><link> https://b/p2 </link>"
           "</item></channel></rss>")
    atom = ('<feed xmlns="http://www.w3.org/2005/Atom"><title>F</title>'
            '<entry><title type="text">A1</title>'
            '<link rel="self" href="https://a/self"/>'
            '<link rel="alternate" href="https://a/e1"/>'
            "<updated>2024-02-02T00:00:00Z</updated>"
            "<id>tag:a,e1</id></entry>"
            '<entry><title>A2</title><link href="https://a/e2"/>'
            "</entry></feed>")
    rows = [(1, rss), (2, atom), (3, "not a feed"),
            (4, "<rss><channel><item><title>ok</title>"
                "<link>u</link></item><item><title>cut")]
    out = {(r["doc_id"], r["entry_idx"]): r for r in feed_entries(
        spark.createDataFrame(rows, "doc_id long, xml string"))
        .collect()}
    assert out[(1, 0)]["title"] == "Post & one"
    assert out[(1, 0)]["link"] == "https://b/p1"
    assert out[(1, 1)]["link"] == "https://b/p2"
    assert out[(2, 0)]["link"] == "https://a/e1"   # alternate wins
    assert out[(2, 0)]["guid"] == "tag:a,e1"
    assert out[(2, 1)]["link"] == "https://a/e2"
    assert out[(3, None)]["valid"] is False
    assert out[(4, 0)]["title"] == "ok" and len(
        [k for k in out if k[0] == 4]) == 1


def test_page_meta_and_jsonld(spark):
    """Attribute order both ways, case-insensitive tags, robots
    lowercased, entity-decoded titles; JSON-LD blocks parse with the
    malformed-flag contract and bare pages yield empty/no rows."""
    from lwetl_spark.operators.webmine import jsonld_blocks, page_meta

    html = ('<html><head><TITLE>My &amp; Page</TITLE>'
            '<meta name="description" content="A test page">'
            '<meta content="NOINDEX, nofollow" name="robots">'
            '<meta property="og:title" content="OG Title"/>'
            '<meta content="https://c/i.jpg" property="og:image"/>'
            '<link href="https://c/page" rel="canonical"/>'
            '<script type="application/ld+json">'
            '{"@type": "Article", "name": "N1", "url": "https://c/a"}'
            "</script>"
            '<script type="application/ld+json">{bad json</script>'
            "</head><body>x</body></html>")
    df = spark.createDataFrame(
        [(1, html), (2, "<p>bare</p>")], "doc_id long, html string")
    pm = {r["doc_id"]: r for r in page_meta(df).collect()}
    assert pm[1]["title"] == "My & Page"
    assert pm[1]["description"] == "A test page"
    assert pm[1]["robots"] == "noindex, nofollow"
    assert pm[1]["og_title"] == "OG Title"
    assert pm[1]["og_image"] == "https://c/i.jpg"
    assert pm[1]["canonical"] == "https://c/page"
    assert all(pm[2][c] == "" for c in
               ("title", "description", "robots", "og_title",
                "og_image", "canonical"))
    ld = {(r["doc_id"], r["block_idx"]): r
          for r in jsonld_blocks(df).collect()}
    assert ld[(1, 0)]["ld_type"] == "Article" and ld[(1, 0)]["parsed"]
    assert ld[(1, 1)]["parsed"] is False
    assert not [k for k in ld if k[0] == 2]
