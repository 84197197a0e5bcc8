"""Web-crawl text-pipeline operators: URL canonicalization / dedup and
HTML→text main-content extraction.

These are the stage-zero operators of a crawl-to-training-data
pipeline (the reference has no crawl surface — this is parity-plus
LLM-pack scope, like operators/text.py): before any text cleaning can
run, raw crawl records must be (a) deduplicated by canonical URL —
the same page is fetched under dozens of spellings (scheme/host case,
`www.`, default ports, trailing slashes, tracking parameters, param
order, fragments) — and (b) reduced from HTML to text.

Everything is pure Column expressions (scan-side, whole-stage codegen,
zero shuffle for the row-wise forms; one hash-partitioned groupBy for
the dedup) and engine-portable: the same split_part / list-lambda /
regexp chain runs in DuckDB for the value-hash oracle.  Regexes follow
the PII_PATTERNS portability rules (text.py): RE2/Java-common syntax
only — no backreferences, no lookaround.  The canonicalizer is built
as LET-BOUND intermediate columns (scheme/host/path/query), not one
inlined mega-expression — the repo-wide defense against the optimizer
substitution trap (each piece is referenced several times).

At 100 TB: URL canonicalization is a free rider on the ingest scan;
the dedup groupBy shuffles only (canonical_url, doc_id) pairs — bytes
per row ≈ one short string, never the document.  HTML extraction is a
per-row regexp chain over the payload — heavy per byte but
embarrassingly parallel, and it PRUNES: downstream stages see the
extracted text (typically 10-30 % of the raw HTML), so running it
first shrinks every later shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tracking parameters dropped during canonicalization: any utm_* key
# plus the ad-click identifiers.  Key-prefix match for utm_, exact key
# match for the rest.
TRACKING_KEYS = ("fbclid", "gclid", "ref", "mc_eid", "igshid")

_TEMPS = ("_scheme", "_rest", "_hostport", "_hname", "_hport", "_pathq", "_path", "_q")


def with_canonical_url(
    df: DataFrame, url_col: str = "url", out_col: str = "canonical_url"
) -> DataFrame:
    """Attach the canonical form of an absolute http(s) URL:

    * scheme and host lowercased (path/query stay case-sensitive),
    * leading ``www.`` stripped,
    * default port stripped (``:80`` http / ``:443`` https);
      non-default ports are PRESERVED,
    * fragment dropped,
    * tracking params dropped (utm_* prefix + TRACKING_KEYS), the
      survivors sorted bytewise, an empty query dropped entirely,
    * empty path normalized to ``/``, one trailing slash stripped
      otherwise.

    Assumes ``scheme://host[:port][/path][?query][#fragment]`` shape
    (crawl frontiers store absolute URLs; relative-link resolution
    belongs upstream) and an ASCII host (IDNs arrive punycoded from
    any sane frontier).  NULL url → NULL canonical.
    """
    drop_keys = ", ".join(f"'{k}'" for k in TRACKING_KEYS)
    df = (
        df.withColumn("_scheme", F.expr(f"lower(split_part({url_col}, '://', 1))"))
        .withColumn("_rest", F.expr(f"split_part(split_part({url_col}, '://', 2), '#', 1)"))
        .withColumn("_hostport", F.expr("lower(split_part(_rest, '/', 1))"))
        .withColumn("_hname", F.expr("split_part(_hostport, ':', 1)"))
        .withColumn("_hport", F.expr("split_part(_hostport, ':', 2)"))
        # ASCII lower() preserves length, so the offset into _rest holds
        .withColumn("_pathq", F.expr("substr(_rest, length(_hostport) + 1)"))
        .withColumn("_path", F.expr("split_part(_pathq, '?', 1)"))
        .withColumn("_q", F.expr("split_part(_pathq, '?', 2)"))
    )
    host = F.expr(
        "CASE WHEN substr(_hname, 1, 4) = 'www.' THEN substr(_hname, 5) ELSE _hname END"
    )
    port = F.expr(
        "CASE WHEN _hport = '' OR (_scheme = 'https' AND _hport = '443') "
        "       OR (_scheme = 'http' AND _hport = '80') THEN '' "
        "ELSE concat(':', _hport) END"
    )
    path = F.expr(
        "CASE WHEN _path IN ('', '/') THEN '/' "
        "WHEN substr(_path, length(_path), 1) = '/' "
        "  THEN substr(_path, 1, length(_path) - 1) "
        "ELSE _path END"
    )
    query = F.expr(
        "concat_ws('&', array_sort(filter(split(_q, '&'), "
        "p -> p <> '' AND substr(p, 1, 4) <> 'utm_' "
        f"     AND NOT split_part(p, '=', 1) IN ({drop_keys}))))"
    )
    canon = F.concat(
        F.col("_scheme"),
        F.lit("://"),
        host,
        port,
        path,
        F.when(query == "", "").otherwise(F.concat(F.lit("?"), query)),
    )
    return df.withColumn(out_col, canon).drop(*_TEMPS)


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Canonical-URL dedup: one keeper (lowest id — fetch-order-stable
    under the usual monotone crawl ids) per canonical URL, plus the
    variant count.  The groupBy shuffles only (canonical_url, id)
    pairs; the same first-occurrence shape as dedup_exact, keyed on
    the canonical string instead of a content hash."""
    return (
        with_canonical_url(df, url_col)
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).cast("long").alias("n_variants"),
        )
    )


# HTML entities decoded after tag-stripping (the inverse of the
# escaping every templating engine applies to text nodes).  &amp; MUST
# decode last: decoding it first would re-activate double-escaped
# entities (&amp;lt; → &lt; → '<'), the classic double-decode bug.
HTML_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)

# block-level closers and <br>/<hr> become whitespace before the
# generic strip, so "<p>a</p><p>b</p>" extracts as "a b" — while the
# generic strip itself inserts NOTHING, so inline markup keeps text
# contiguous: "<em>a</em>b" extracts as "ab", never "a b"
_BLOCK_TAG_RE = (
    "(?i)</(p|div|h[1-6]|li|tr|section|article|nav|header|footer"
    "|title|ul|ol|blockquote|pre)>|<[bh]r */?>"
)


def html_to_text_expr(html_col: str = "html") -> Column:
    """Main-content text of an HTML payload, as one Column chain:

    1. ``<script>``/``<style>`` elements removed WITH their contents
       (``(?is)`` dot-matches-newline + lazy body — RE2/Java-common),
    2. block-tag closers and ``<br>``/``<hr>`` become whitespace,
    3. every remaining tag stripped to NOTHING (inline markup keeps
       text contiguous),
    4. entities decoded (``&amp;`` last — see HTML_ENTITIES),
    5. whitespace runs collapsed, ends trimmed.

    The chain is linear (each regexp consumes the previous output once)
    — no nested-expression blowup.
    """
    c: Column = F.col(html_col)
    c = F.regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, "(?is)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, _BLOCK_TAG_RE, " ")
    c = F.regexp_replace(c, "<[^>]*>", "")
    for ent, ch in HTML_ENTITIES:
        c = F.regexp_replace(c, ent, ch)
    c = F.regexp_replace(c, "[ \\t\\n\\r\\f]+", " ")
    return F.btrim(c)


def html_extract(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Extraction projection: (id, extracted text, extracted_md5,
    html_len, text_len, extraction_ratio).  The ratio (text bytes /
    html bytes) is the standard boilerplate-density quality signal —
    pages below ~0.1 are mostly chrome and get filtered downstream."""
    out = df.withColumn("extracted", html_to_text_expr(html_col))
    return out.select(
        F.col(id_col),
        "extracted",
        F.md5(F.col("extracted")).alias("extracted_md5"),
        F.length(F.col(html_col)).cast("long").alias("html_len"),
        F.length("extracted").cast("long").alias("text_len"),
        (
            F.length("extracted").cast("double")
            / F.length(F.col(html_col)).cast("double")
        ).alias("extraction_ratio"),
    )
