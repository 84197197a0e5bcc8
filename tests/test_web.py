"""URL canonicalization / dedup and HTML→text operator contracts —
the edge cases the registry's synthetic-frontier fixture doesn't
reach (http default port, NULL urls, double-escaped entities)."""

from pyspark.sql import functions as F

from firewatch_spark.operators import web
from tests.conftest import rows


def _canon(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "doc_id long, url string")
    out = rows(web.with_canonical_url(df), "doc_id")
    return [r["canonical_url"] for r in out]


def test_canonical_scheme_host_case_and_www(spark):
    assert _canon(spark, ["HTTP://WWW.Example.COM/A"]) == ["http://example.com/A"]
    # www only strips as a whole leading label; path case preserved
    assert _canon(spark, ["http://wwwx.example.com/A"]) == ["http://wwwx.example.com/A"]


def test_canonical_ports(spark):
    assert _canon(
        spark,
        [
            "http://example.com:80/a",
            "https://example.com:443/a",
            "http://example.com:8080/a",
            "https://example.com:80/a",  # :80 is NOT default for https
        ],
    ) == [
        "http://example.com/a",
        "https://example.com/a",
        "http://example.com:8080/a",
        "https://example.com:80/a",
    ]


def test_canonical_path_and_fragment(spark):
    assert _canon(
        spark,
        [
            "https://example.com",
            "https://example.com/",
            "https://example.com/a/b/",
            "https://example.com/a#frag",
        ],
    ) == [
        "https://example.com/",
        "https://example.com/",
        "https://example.com/a/b",
        "https://example.com/a",
    ]


def test_canonical_query_filter_sort_drop(spark):
    assert _canon(
        spark,
        [
            "https://example.com/a?b=2&utm_source=x&a=1&fbclid=zz",
            "https://example.com/a?utm_campaign=x&gclid=1",  # all tracking -> dropped
            "https://example.com/a?ref=abc&id=7",
        ],
    ) == [
        "https://example.com/a?a=1&b=2",
        "https://example.com/a",
        "https://example.com/a?id=7",
    ]


def test_canonical_pathless_query(spark):
    # ADVICE r7 #1: a query with no path must not absorb '?query' into
    # the host — the authority ends at the first of '/' or '?'
    assert _canon(
        spark,
        [
            "http://example.com?utm_source=x",
            "https://Example.com:8080?b=2&a=1",
            "https://www.example.com:443?a=1#f",
        ],
    ) == [
        "http://example.com/",
        "https://example.com:8080/?a=1&b=2",
        "https://example.com/?a=1",
    ]


def test_canonical_null_passthrough(spark):
    assert _canon(spark, [None]) == [None]


def test_url_dedup_keeper_and_count(spark):
    df = spark.createDataFrame(
        [
            (10, "https://www.Example.com/page/?utm_source=a"),
            (3, "HTTPS://example.com/page"),
            (7, "https://example.com:443/page#x"),
            (5, "https://other.com/page"),
        ],
        "doc_id long, url string",
    )
    out = {r["canonical_url"]: r for r in rows(web.url_dedup(df))}
    grp = out["https://example.com/page"]
    assert grp["keeper_id"] == 3 and grp["n_variants"] == 3
    assert out["https://other.com/page"]["n_variants"] == 1


def _extract(spark, html):
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return rows(df.select(web.html_to_text_expr("html").alias("t")))[0]["t"]


def test_html_script_style_removed_with_contents(spark):
    # script bodies contain < and > that must not confuse the stripper
    html = "<p>keep</p><script>if (a < b && c > d) { x(); }</script><style>p{x:1}</style><p>also</p>"
    assert _extract(spark, html) == "keep also"


def test_html_block_tags_separate_text(spark):
    assert _extract(spark, "<p>a</p><p>b</p>") == "a b"
    assert _extract(spark, "line1<br>line2<br/>line3") == "line1 line2 line3"
    # inline tags do NOT insert breaks
    assert _extract(spark, "<em>a</em>b") == "ab"


def test_html_entity_decode_order(spark):
    # &amp; decodes LAST: double-escaped entities stay escaped one level
    assert _extract(spark, "&amp;lt;") == "&lt;"
    assert _extract(spark, "a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;") == (
        "a & b <tag> \"q\" 's'"
    )


def test_html_whitespace_collapse(spark):
    assert _extract(spark, "<p>a\n\n  b\t c</p>") == "a b c"


def test_html_extract_metrics(spark):
    df = spark.createDataFrame([(1, "<p>abcd</p>")], "doc_id long, html string")
    out = rows(web.html_extract(df))[0]
    assert out["text_len"] == 4 and out["html_len"] == 11
    assert abs(out["extraction_ratio"] - 4 / 11) < 1e-12


# --- link graph: extract_links / host_edges / pagerank ---------------------


def test_extract_links_case_multiplicity_and_carry(spark):
    df = spark.createDataFrame(
        [
            (1, "s1", '<a href="/rel">r</a><A HREF="https://A.com/x">u</A>'),
            (2, "s2", "<p>no links</p>"),
        ],
        "doc_id long, src string, html string",
    )
    out = rows(web.extract_links(df), "doc_id", "href")
    # doc 2 vanishes (explode, not explode_outer: no-link pages carry
    # no frontier information); non-html columns ride along
    assert [(r["doc_id"], r["src"], r["href"]) for r in out] == [
        (1, "s1", "/rel"),
        (1, "s1", "https://A.com/x"),
    ]


def test_host_edges_rules(spark):
    df = spark.createDataFrame(
        [
            ("a.com", "https://B.com:8443/x"),   # lowercase + port strip
            ("a.com", "http://b.com/y"),         # same edge after normalize
            ("a.com", "/relative"),              # dropped: not absolute
            ("a.com", "mailto:x@b.com"),         # dropped: not http(s)
            ("a.com", "https://a.com/self"),     # dropped: self-loop
            ("a.com", "https://WWW.a.com/s2"),    # dropped: www self-loop (ADVICE r7 #3)
            ("a.com", "http://www.b.com/w"),      # www strip -> same b.com edge
            ("a.com", "https://c.com?x=1"),       # path-less query: host ends at '?'
            ("b.com", "https://a.com/z"),
        ],
        "src_host string, href string",
    )
    out = rows(web.host_edges(df), "src_host", "dst_host")
    assert [(r["src_host"], r["dst_host"]) for r in out] == [
        ("a.com", "b.com"),
        ("a.com", "c.com"),
        ("b.com", "a.com"),
    ]


def _pagerank_mirror(edges, iterations=5, damping=85):
    """Pure-Python integer mirror of web.pagerank's round formula."""
    scale = web.PAGERANK_SCALE
    hosts = sorted({h for e in edges for h in e})
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    n = len(hosts)
    r = {h: scale // n for h in hosts}
    for _ in range(iterations):
        in_mass = {h: 0 for h in hosts}
        for s, d in edges:
            in_mass[d] += r[s] // out[s]
        r = {
            h: ((100 - damping) * (scale // n) + damping * in_mass[h]) // 100
            for h in hosts
        }
    return r


def _pr(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    return {r["host"]: r["pr"] for r in rows(web.pagerank(df, **kw))}


def test_pagerank_symmetric_cycle_is_fixed_point(spark):
    # A<->B: uniform mass is the exact fixed point of the integer update
    out = _pr(spark, [("a", "b"), ("b", "a")], iterations=3)
    assert out == {"a": web.PAGERANK_SCALE // 2, "b": web.PAGERANK_SCALE // 2}


def test_pagerank_dangling_and_asymmetry_match_mirror(spark):
    # b is dangling (its mass evaporates); c has two in-edges
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")][:3] + [("c", "a")]
    assert _pr(spark, edges) == _pagerank_mirror(edges)


def test_pagerank_duplicate_edges_collapse(spark):
    # the operator distinct's its input: a duplicated edge changes nothing
    edges = [("a", "b"), ("b", "a")]
    assert _pr(spark, edges + edges, iterations=2) == _pr(
        spark, edges, iterations=2
    )


def test_html_metadata_first_element_decode_and_fanout(spark):
    df = spark.createDataFrame(
        [
            (1, '<html><head><title> A &amp; B </title></head>'
                '<body><h1>First</h1><h1>Second</h1>'
                '<a href="/x">x</a><A HREF="https://y.com">y</A></body></html>'),
            (2, "<p>no title, no h1, no links</p>"),
        ],
        "doc_id long, html string",
    )
    out = {r["doc_id"]: r for r in rows(web.with_html_metadata(df))}
    assert out[1]["title"] == "A & B"          # entity decode + trim
    assert out[1]["h1"] == "First"             # lazy match: FIRST h1 only
    assert out[1]["n_links"] == 2              # case-insensitive href
    assert out[2]["title"] == "" and out[2]["h1"] == "" and out[2]["n_links"] == 0


def test_keeper_per_canonical_identical_payloads_extract_once(spark):
    # VERDICT r8 "What's wrong" #2: two crawl variants of one canonical
    # URL with byte-identical payloads must yield ONE keeper row (the
    # downstream HTML→text chain runs once per unique page, not once
    # per re-crawl), while n_variants still counts every variant.
    canon = spark.createDataFrame(
        [
            ("https://a.com/", "mx", "<p>A</p>"),
            ("https://a.com/", "mx", "<p>A</p>"),   # byte-identical re-crawl
            ("https://a.com/", "my", "<p>A2</p>"),  # changed content
            ("https://b.com/", "mz", "<p>B</p>"),
        ],
        "canonical_url string, payload_md5 string, payload string",
    )
    out = {r["canonical_url"]: r for r in rows(web.keeper_per_canonical(canon))}
    assert len(out) == 2  # exactly one row per canonical URL
    a = out["https://a.com/"]
    assert (a["n_variants"], a["keeper_md5"], a["html"]) == (3, "mx", "<p>A</p>")
    b = out["https://b.com/"]
    assert (b["n_variants"], b["keeper_md5"], b["html"]) == (1, "mz", "<p>B</p>")


def test_frontier_schedule_matches_naive_window_and_politeness(spark):
    """two-phase per-host slot == one-task row_number per host (same
    md5(url) order), and no wave contains more than per_host_rate URLs
    of one host."""
    from pyspark.sql import Window

    urls = [
        ("h1", f"https://h1/{i}") for i in range(7)
    ] + [("h2", "https://h2/a"), ("h3", "https://h3/a"), ("h3", "https://h3/b")]
    df = spark.createDataFrame(urls, "host string, canonical_url string")
    out = rows(web.frontier_schedule(df, per_host_rate=2), "host", "slot_in_host")
    w = Window.partitionBy("host").orderBy(
        F.md5(F.col("canonical_url").cast("binary")), "canonical_url"
    )
    naive = {
        (r["host"], r["canonical_url"]): r["rk"]
        for r in rows(df.withColumn("rk", F.row_number().over(w)))
    }
    waves = {}
    for r in out:
        assert r["slot_in_host"] == naive[(r["host"], r["canonical_url"])]
        assert r["fetch_wave"] == (r["slot_in_host"] - 1) // 2
        waves[(r["host"], r["fetch_wave"])] = waves.get((r["host"], r["fetch_wave"]), 0) + 1
    assert max(waves.values()) <= 2  # politeness bound
    # h1 (7 urls, rate 2) stretches over ceil(7/2) = 4 waves
    assert max(w for (h, w) in waves if h == "h1") == 3


def test_parse_robots_and_filter_precedence(spark):
    """RFC 9309 precedence pinned: longest prefix wins, Allow beats
    Disallow on a length tie, no match -> allowed, bytewise-prefix
    semantics, empty-path rules dropped at parse."""
    robots = spark.createDataFrame(
        [
            (
                "a.com",
                "User-agent: *\nDisallow: /a\nAllow: /a/b\n"
                "Disallow:\nAllow: /c\nDisallow: /c",  # tie at len 2
            ),
        ],
        "host string, robots_txt string",
    )
    rules = web.parse_robots(robots)
    got = {(r["rule"], r["path_prefix"]) for r in rows(rules)}
    # the empty-path Disallow is dropped at parse
    assert got == {
        ("disallow", "/a"), ("allow", "/a/b"), ("allow", "/c"), ("disallow", "/c"),
    }
    frontier = spark.createDataFrame(
        [
            ("a.com", "https://a.com/a"),        # blocked by /a
            ("a.com", "https://a.com/ab"),       # bytewise: /a blocks /ab
            ("a.com", "https://a.com/a/b/c"),    # longest match /a/b allows
            ("a.com", "https://a.com/c/x"),      # tie /c vs /c -> Allow wins
            ("a.com", "https://a.com/zzz"),      # no match -> allowed
            ("b.com", "https://b.com/a"),        # no robots -> allowed
        ],
        "host string, canonical_url string",
    )
    out = {
        r["canonical_url"]: (r["allowed"], r["matched_rule"])
        for r in rows(web.robots_filter(frontier, rules))
    }
    assert out["https://a.com/a"] == (False, "/a")
    assert out["https://a.com/ab"] == (False, "/a")
    assert out["https://a.com/a/b/c"] == (True, "/a/b")
    assert out["https://a.com/c/x"] == (True, "/c")
    assert out["https://a.com/zzz"] == (True, "")
    assert out["https://b.com/a"] == (True, "")


def test_parse_sitemap_block_scoped_fields(spark):
    """lastmod must pair with ITS OWN url block (two-level extract),
    loc-less entries drop, whitespace trims, missing lastmod -> ''."""
    xml = (
        "<?xml version=\"1.0\"?><urlset>"
        "<url><loc> https://a.com/1 </loc><lastmod>2026-01-02</lastmod></url>"
        "<url><loc>https://a.com/2</loc></url>"          # no lastmod
        "<url><lastmod>2026-03-04</lastmod></url>"       # no loc: dropped
        "<url><loc>https://a.com/3</loc><lastmod>2026-05-06</lastmod></url>"
        "</urlset>"
    )
    df = spark.createDataFrame([("a.com", xml)], "host string, sitemap_xml string")
    out = {r["loc"]: r["lastmod"] for r in rows(web.parse_sitemap(df))}
    assert out == {
        "https://a.com/1": "2026-01-02",
        "https://a.com/2": "",
        "https://a.com/3": "2026-05-06",
    }


def test_rule_regex_translation(spark):
    """Wildcard rule -> anchored regex: * -> .*, trailing $ anchors,
    everything else literal (regex metachars escaped), mid-pattern $
    is literal."""
    df = spark.createDataFrame(
        [("/*?",), ("/articles/*.html$",), ("/plain",), ("/p$q",), ("$",)],
        "path_prefix string",
    )
    got = {
        r["path_prefix"]: r["rx"]
        for r in rows(df.select("path_prefix", web.rule_regex_expr().alias("rx")))
    }
    assert got == {
        "/*?": r"^\/.*\?",
        "/articles/*.html$": r"^\/articles\/.*\.html$",
        "/plain": r"^\/plain",
        "/p$q": r"^\/p\$q",
        "$": "^$",
    }


def test_robots_filter_wildcard_precedence(spark):
    """RFC 9309 §2.2.2: * spans any sequence, trailing $ anchors,
    longest RAW pattern wins, Allow beats Disallow on ties, prefix
    semantics preserved for literal rules."""
    rules = spark.createDataFrame(
        [
            ("a.com", "disallow", "/*?", 3),
            ("a.com", "allow", "/articles/*.html$", 17),
            ("a.com", "disallow", "/articles/", 10),
            ("a.com", "disallow", "/p$q", 4),
        ],
        "host string, rule string, path_prefix string, prefix_len long",
    )
    frontier = spark.createDataFrame(
        [
            ("a.com", "https://a.com/articles/x.html"),   # allow beats shorter disallow
            ("a.com", "https://a.com/articles/x.htmlz"),  # $ fails -> /articles/ blocks
            ("a.com", "https://a.com/search?q=1"),        # /*? blocks any query
            ("a.com", "https://a.com/plain"),             # no match -> allowed
            ("a.com", "https://a.com/p$q"),               # mid-pattern $ literal
        ],
        "host string, canonical_url string",
    )
    out = {
        r["canonical_url"]: (r["allowed"], r["matched_rule"])
        for r in rows(web.robots_filter_wildcard(frontier, rules))
    }
    assert out["https://a.com/articles/x.html"] == (True, "/articles/*.html$")
    assert out["https://a.com/articles/x.htmlz"] == (False, "/articles/")
    assert out["https://a.com/search?q=1"] == (False, "/*?")
    assert out["https://a.com/plain"] == (True, "")
    assert out["https://a.com/p$q"] == (False, "/p$q")


def test_robots_wildcard_fuzz_against_python_reference(spark):
    """Randomized WILDCARD rule sets vs a Python RFC 9309 reference
    built on the same translation (re.match of the anchored regex):
    longest raw pattern wins, Allow beats Disallow on ties."""
    import random
    import re

    rng = random.Random(31337)
    segs = ["a", "b", "cc", "d1"]
    hosts = [f"h{i}.test" for i in range(3)]
    rules_py = []
    for h in hosts[:2]:
        for _ in range(rng.randint(2, 7)):
            parts = []
            for _ in range(rng.randint(0, 3)):
                parts.append(rng.choice(segs + ["*"]))
            pat = "/" + "/".join(parts) if parts else "/"
            if rng.random() < 0.3:
                pat += "$"
            rules_py.append((h, rng.choice(["allow", "disallow"]), pat))
    urls = []
    for h in hosts:
        for _ in range(40):
            depth = rng.randint(0, 4)
            path = "/" + "/".join(rng.choice(segs) for _ in range(depth))
            urls.append((h, f"https://{h}{path}"))
    urls = sorted(set(urls))

    def to_rx(p):
        anchored = p.endswith("$")
        base = p[:-1] if anchored else p
        esc = re.sub(r"([^a-zA-Z0-9*])", r"\\\1", base)
        return "^" + esc.replace("*", ".*") + ("$" if anchored else "")

    def ref(host, url):
        path = url.split("://", 1)[1]
        path = path[path.index("/"):] if "/" in path else "/"
        matched = [
            (len(p), r == "allow", p)
            for (rh, r, p) in rules_py
            if rh == host and re.match(to_rx(p), path)
        ]
        if not matched:
            return True, ""
        ln, is_allow, p = max(matched)
        return is_allow, p

    rules = spark.createDataFrame(
        [(h, r, p, len(p)) for (h, r, p) in rules_py],
        "host string, rule string, path_prefix string, prefix_len long",
    )
    frontier = spark.createDataFrame(urls, "host string, canonical_url string")
    out = {
        r["canonical_url"]: (r["allowed"], r["matched_rule"])
        for r in rows(web.robots_filter_wildcard(frontier, rules))
    }
    mism = [
        (u, out[u], ref(h, u)) for h, u in urls if out[u] != ref(h, u)
    ]
    assert not mism, mism[:5]


def test_select_agent_section_group_semantics(spark):
    """RFC 9309 §2.2.1 group selection: consecutive UA lines head one
    group, longest case-insensitive prefix token wins, '*' is the
    specificity-0 fallback, equally-specific groups COMBINE, rules
    before any UA line are dropped."""
    robots = spark.createDataFrame(
        [
            (
                "a.com",
                "Disallow: /orphan\n"           # no group yet: dropped
                "User-agent: googlebot\nDisallow: /\n"
                "# comment\n"
                "User-agent: MyBot\nUser-agent: other\n"
                "allow: /mb\nDisallow: /mb/x\n"
                "User-agent: my\nDisallow: /short\n"
                "User-agent: mybot\nDisallow: /second\n"  # same spec: combines
                "User-agent: *\nDisallow: /star",
            ),
            ("b.com", "User-agent: *\nDisallow: /star"),   # fallback host
            ("c.com", "User-agent: nomatch\nDisallow: /x"),  # no group matches
        ],
        "host string, robots_txt string",
    )
    out = {
        r["host"]: r["robots_txt"]
        for r in rows(web.select_agent_section(robots, "MyBot/2.1"))
    }
    # 'mybot' (5) beats 'my' (2) and '*'; BOTH spec-5 groups combine
    assert out["a.com"] == "allow: /mb\nDisallow: /mb/x\nDisallow: /second"
    assert out["b.com"] == "Disallow: /star"
    assert "c.com" not in out  # no matching group -> no section at all


def test_parse_crawl_delay_and_per_host_rate_waves(spark):
    """Crawl-delay extraction (case-insensitive, trimmed, try_cast,
    max-of-several) and frontier_schedule's per-host rate_col: waves
    divide by each host's OWN rate."""
    section = spark.createDataFrame(
        [
            ("a.com", "Disallow: /x\ncrawl-delay:  3 \nCrawl-delay: 2"),
            ("b.com", "Crawl-delay: nan\nAllow: /"),   # non-numeric -> dropped
            ("c.com", "Crawl-delay: 0"),                # non-positive -> dropped
        ],
        "host string, robots_txt string",
    )
    got = {r["host"]: r["crawl_delay"] for r in rows(web.parse_crawl_delay(section))}
    assert got == {"a.com": 3}  # max of 3 and 2; b/c dropped
    fr = spark.createDataFrame(
        [("h1", f"https://h1/{i}", 3) for i in range(7)]
        + [("h2", f"https://h2/{i}", 1) for i in range(3)],
        "host string, canonical_url string, rate long",
    )
    out = rows(web.frontier_schedule(fr, rate_col="rate"), "host", "slot_in_host")
    for r in out:
        assert r["fetch_wave"] == (r["slot_in_host"] - 1) // (3 if r["host"] == "h1" else 1)
    # politeness bound per host's own rate
    waves = {}
    for r in out:
        waves.setdefault((r["host"], r["fetch_wave"]), 0)
        waves[(r["host"], r["fetch_wave"])] += 1
    assert max(v for (h, w), v in waves.items() if h == "h1") <= 3
    assert max(v for (h, w), v in waves.items() if h == "h2") <= 1


def test_select_agent_section_keeps_crawl_delay_lines(spark):
    robots = spark.createDataFrame(
        [("a.com", "User-agent: mybot\nDisallow: /x\nCrawl-delay: 5\n"
                    "User-agent: *\nCrawl-delay: 9")],
        "host string, robots_txt string",
    )
    out = rows(web.select_agent_section(robots, "mybot"))
    # the mybot group's delay is kept, the losing * group's is not
    assert out[0]["robots_txt"] == "Disallow: /x\nCrawl-delay: 5"


def test_select_agent_section_fuzz_against_python_reference(spark):
    """Randomized multi-group robots files vs a Python mirror of the
    RFC 9309 §2.2.1 semantics: UA-after-non-UA starts a group,
    consecutive UA lines share one, longest case-insensitive prefix
    token wins ('*' = 0), equal-spec groups combine, pre-group and
    non-policy lines drop.  Deterministic seed."""
    import random

    rng = random.Random(42424)
    agent = "fwbot/1.0"
    tokens = ["*", "fw", "FWBot", "fwb", "other", "googlebot"]
    policies = ["Allow: /a", "Disallow: /b", "disallow: /c", "Crawl-delay: 2"]
    fillers = ["# comment", "", "Sitemap: https://x/s.xml"]
    cases = []
    for i in range(40):
        lines = []
        if rng.random() < 0.3:
            lines.append(rng.choice(policies))  # orphan rule: dropped
        for _ in range(rng.randint(1, 4)):  # groups
            for _ in range(rng.randint(1, 2)):  # consecutive UA lines
                lines.append(f"User-agent: {rng.choice(tokens)}")
            for _ in range(rng.randint(0, 3)):
                lines.append(rng.choice(policies + fillers))
        cases.append((f"h{i}.test", "\n".join(lines)))

    def ref(text):
        lines = text.split("\n")
        gid, groups, prev_ua = 0, {}, False
        for pos, ln in enumerate(lines):
            is_ua = ln.lower().startswith("user-agent:")
            if is_ua and not prev_ua:
                gid += 1
                groups.setdefault(gid, {"toks": [], "rules": []})
            if gid == 0:
                prev_ua = is_ua
                continue
            if is_ua:
                groups[gid]["toks"].append(ln[11:].strip().lower())
            elif any(
                ln.lower().startswith(p)
                for p in ("allow:", "disallow:", "crawl-delay:")
            ):
                groups[gid]["rules"].append(ln)
            prev_ua = is_ua
        def spec(t):
            if t == "*":
                return 0
            return len(t) if agent.lower().startswith(t) else None
        best = None
        for g in groups.values():
            specs = [s for s in map(spec, g["toks"]) if s is not None]
            g["spec"] = max(specs) if specs else None
            if g["spec"] is not None:
                best = g["spec"] if best is None else max(best, g["spec"])
        if best is None:
            return None
        rules = []
        for g in groups.values():
            if g["spec"] == best:
                rules.extend(g["rules"])
        return "\n".join(rules) if rules else None

    df = spark.createDataFrame(cases, "host string, robots_txt string")
    got = {
        r["host"]: r["robots_txt"]
        for r in rows(web.select_agent_section(df, agent))
    }
    mism = []
    for h, text in cases:
        want = ref(text)
        if got.get(h) != want:
            mism.append((h, got.get(h), want, text))
    assert not mism, mism[:3]


def test_recrawl_outcomes_all_four(spark):
    sm = spark.createDataFrame(
        [
            ("h", "u_changed", "2026-05-01"),
            ("h", "u_unchanged", "2026-03-01"),
            ("h", "u_equal", "2026-04-15"),     # equal stamp -> unchanged
            ("h", "u_unknown", ""),
            ("h", "u_new", "2026-06-01"),
        ],
        "host string, canonical_url string, lastmod string",
    )
    fetched = spark.createDataFrame(
        [(u, "2026-04-15") for u in ("u_changed", "u_unchanged", "u_equal", "u_unknown")],
        "canonical_url string, last_fetch string",
    )
    out = {
        r["canonical_url"]: (r["outcome"], r["due"], r["last_fetch"])
        for r in rows(web.recrawl_outcomes(sm, fetched))
    }
    assert out["u_changed"] == ("changed", True, "2026-04-15")
    assert out["u_unchanged"] == ("unchanged", False, "2026-04-15")
    assert out["u_equal"] == ("unchanged", False, "2026-04-15")
    assert out["u_unknown"] == ("unknown", True, "2026-04-15")
    assert out["u_new"] == ("new", True, "")


def test_frontier_seen_filter_bloom_independent(spark):
    """Output must equal frontier ANTI seen at ANY m_bits — including
    a saturated 2-bit filter where everything lands possibly-seen and
    the exact join decides alone (no false negatives ever)."""
    frontier = spark.createDataFrame(
        [("h", f"https://h/{i}") for i in range(30)],
        "host string, canonical_url string",
    )
    seen = spark.createDataFrame(
        [(f"https://h/{i}",) for i in range(0, 30, 3)] + [("https://h/zzz",)],
        "canonical_url string",
    )
    want = {f"https://h/{i}" for i in range(30) if i % 3 != 0}
    for m in (2, 1 << 10, 1 << 18):
        got = {
            r["canonical_url"]
            for r in web.frontier_seen_filter(frontier, seen, m_bits=m).collect()
        }
        assert got == want, m


def test_robots_filter_fuzz_against_python_reference(spark):
    """Randomized rule sets + URLs vs a hand-rolled RFC 9309 reference:
    longest prefix wins, Allow beats Disallow on ties, no match ->
    allowed.  Deterministic seed — same draw every run."""
    import random

    rng = random.Random(90210)
    segs = ["a", "b", "c", "d"]
    hosts = [f"h{i}.test" for i in range(4)]
    rules_py = []  # (host, rule, prefix)
    for h in hosts[:3]:  # one host stays robots-less
        for _ in range(rng.randint(1, 6)):
            depth = rng.randint(0, 3)
            prefix = "/" + "/".join(rng.choice(segs) for _ in range(depth))
            rules_py.append((h, rng.choice(["allow", "disallow"]), prefix))
    urls = []
    for h in hosts:
        for _ in range(25):
            depth = rng.randint(0, 4)
            path = "/" + "/".join(rng.choice(segs) for _ in range(depth))
            urls.append((h, f"https://{h}{path}"))
    urls = sorted(set(urls))

    def ref(host, url):
        path = url.split("://", 1)[1]
        path = path[path.index("/"):] if "/" in path else "/"
        matched = [
            (len(p), r == "allow", p)
            for (rh, r, p) in rules_py
            if rh == host and path.startswith(p)
        ]
        if not matched:
            return True, ""
        ln, is_allow, p = max(matched)
        return is_allow, p

    rules = spark.createDataFrame(
        [(h, r, p, len(p)) for (h, r, p) in rules_py],
        "host string, rule string, path_prefix string, prefix_len long",
    )
    frontier = spark.createDataFrame(urls, "host string, canonical_url string")
    out = {
        r["canonical_url"]: (r["allowed"], r["matched_rule"])
        for r in rows(web.robots_filter(frontier, rules))
    }
    assert len(out) == len(urls)
    mism = []
    for h, u in urls:
        want = ref(h, u)
        if out[u] != want:
            mism.append((u, out[u], want))
    assert not mism, mism[:5]


def test_domain_blocklist_suffix_match_and_precedence(spark):
    hosts = [
        (1, "ads.src1.example.com"),       # exact deep entry
        (2, "sub.ads.src1.example.com"),   # deep entry as parent
        (3, "blog.src2.example.org"),      # registrable-level entry
        (4, "cdn.media.src2.example.org"), # overlap: mid beats registrable
        (5, "anything.example.net"),       # below-registrable entry
        (6, "clean.example.com"),          # no match
        (7, "com"),                        # 1-label host: no suffixes
    ]
    bl = spark.createDataFrame(
        [
            ("ads.src1.example.com", "ads"),
            ("media.src2.example.org", "tracker"),
            ("src2.example.org", "adult"),
            ("example.net", "malware"),
        ],
        "entry string, category string",
    )
    df = spark.createDataFrame(hosts, "doc_id long, host string")
    out = {r["doc_id"]: r for r in rows(web.domain_blocklist_filter(df, bl), "doc_id")}

    assert out[1]["blocked"] and out[1]["category"] == "ads"
    assert out[1]["match_labels"] == 4
    # parent-domain semantics: a deeper host is blocked by its suffix
    assert out[2]["blocked"] and out[2]["matched_entry"] == "ads.src1.example.com"
    assert out[3]["blocked"] and out[3]["category"] == "adult"
    # longest match attributes the block
    assert out[4]["matched_entry"] == "media.src2.example.org"
    assert out[4]["category"] == "tracker" and out[4]["match_labels"] == 4
    assert out[5]["blocked"] and out[5]["category"] == "malware"
    assert not out[6]["blocked"] and out[6]["matched_entry"] is None
    assert not out[7]["blocked"]
    # substring matches must NOT block: 'xample.net' is not a label
    # boundary suffix of 'anything.example.net' — covered by the
    # equi-join on whole suffixes, pinned here with a lookalike host
    df2 = spark.createDataFrame([(8, "notexample.net")], "doc_id long, host string")
    assert not rows(web.domain_blocklist_filter(df2, bl), "doc_id")[0]["blocked"]


def test_domain_blocklist_duplicate_entries_attribute_consistently(spark):
    # ADVICE r10: duplicate blocklist entry rows with differing
    # categories tie on match_labels; the struct-max must take entry
    # AND category from the SAME row (deterministically the
    # lexicographically-largest category for the tied entry)
    bl = spark.createDataFrame(
        [
            ("ads.example.com", "ads"),
            ("ads.example.com", "tracker"),
            ("example.com", "zzz-parent"),
        ],
        "entry string, category string",
    )
    df = spark.createDataFrame(
        [(1, "ads.example.com")], "doc_id long, host string"
    )
    r = rows(web.domain_blocklist_filter(df, bl), "doc_id")[0]
    # longest match still wins over the parent entry, and the tied
    # duplicate resolves to (entry, category) from one row
    assert r["matched_entry"] == "ads.example.com"
    assert r["category"] == "tracker" and r["match_labels"] == 3


def test_parse_sitemap_index_blocks_and_messy_loc(spark):
    xml = (
        '<?xml version="1.0"?><sitemapindex>'
        "<sitemap><loc>https://a.example.com/sitemap-1.xml</loc>"
        "<lastmod>2026-01-01</lastmod></sitemap>"
        "<sitemap><loc> https://WWW.a.Example.COM/sitemap-2.xml </loc></sitemap>"
        "<sitemap><loc></loc></sitemap>"
        "</sitemapindex>"
    )
    df = spark.createDataFrame([(1, xml)], "n int, sitemap_xml string")
    out = rows(web.parse_sitemap_index(df, keep=("n",)), "sm_loc")
    # the empty-loc block is dropped, both real entries survive
    assert len(out) == 2
    assert out[0]["sm_loc"] == "https://WWW.a.Example.COM/sitemap-2.xml"
    assert out[1]["sm_lastmod"] == "2026-01-01"
    # lastmod never leaks across blocks
    assert out[0]["sm_lastmod"] == ""


def test_sitemap_index_ingest_flags_missing_subsitemaps(spark):
    from firewatch_spark.queries import registry

    df = registry()["sitemap_index_ingest"].fn(spark, "/root/testdata/sf0.001")
    out = rows(df, "host", "sub_path", "status", "canonical_url")
    missing = [r for r in out if r["status"] == "missing"]
    ok = [r for r in out if r["status"] == "ok"]
    # every 5th of the 97 hosts plants a dead sitemap-old.xml entry
    assert len(missing) == 20
    assert all(r["sub_path"] == "/sitemap-old.xml" for r in missing)
    assert all(r["canonical_url"] is None for r in missing)
    # 97 hosts x (2 articles + 1 promo) live pages
    assert len(ok) == 97 * 3
    # the messy WWW./mixed-case promo loc canonicalized before the join
    promo = [r for r in ok if r["sub_path"] == "/sitemap-promo.xml"]
    assert len(promo) == 97
    assert all(r["canonical_url"].startswith("https://h") for r in promo)


def test_parse_sitemap_directives_case_and_colon_handling(spark):
    robots = (
        "User-agent: *\n"
        "Disallow: /private\n"
        "sitemap: https://a.example.com/one.xml\n"
        "SITEMAP:   https://a.example.com/two.xml\n"
        "Sitemap:https://a.example.com/three.xml\n"
        "# Sitemap: commented out — still a directive line? no: leading #\n"
        "NotASitemap: https://a.example.com/four.xml"
    )
    df = spark.createDataFrame([("a.example.com", robots)], "host string, robots_txt string")
    out = rows(web.parse_sitemap_directives(df), "sm_url")
    urls = [r["sm_url"] for r in out]
    # case-insensitive key, optional space, URL's scheme colon intact
    assert urls == [
        "https://a.example.com/one.xml",
        "https://a.example.com/three.xml",
        "https://a.example.com/two.xml",
    ]


def test_extract_anchors_and_agg(spark):
    df = spark.createDataFrame(
        [
            (1, '<p><a href="https://A.com/x">Big Topic</a>'
                '<a class="z" href="https://b.com/">read more</a>'
                '<a href="/rel">Home</a>'
                '<a href="https://a.com/x#f">big news</a></p>'),
            (2, '<p><a href="https://a.com/x/">big</a>'
                '<a href="https://a.com/x">big <b>bold</b></a></p>'),
        ],
        "doc_id long, html string",
    )
    anchors = web.extract_anchors(df)
    got = {(r["doc_id"], r["href"], r["anchor_text"])
           for r in rows(anchors, "doc_id")}
    # the inner-<b> anchor does NOT match (text must be tag-free);
    # relative and absolute both extract
    assert (1, "https://A.com/x", "Big Topic") in got
    assert (1, "/rel", "Home") in got
    assert (2, "https://a.com/x/", "big") in got
    assert not any("bold" in t for _, _, t in got)

    agg = {
        r["target"]: r
        for r in rows(
            web.anchor_text_agg(
                anchors.filter(F.col("href").rlike("^(?i)https?://"))
            ),
            "target",
        )
    }
    # case, fragment and trailing slash collapse to one target
    a = agg["https://a.com/x"]
    assert a["n_inlinks"] == 3 and a["n_src_docs"] == 2
    assert a["n_distinct_texts"] == 3
    # modal term: 'big' appears 3x across the target's anchors
    assert a["top_term"] == "big" and a["top_term_count"] == 3
    assert agg["https://b.com/"]["top_term"] in ("read", "more")
