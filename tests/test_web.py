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
