"""WARC-shaped crawl-dump ingest — the record-framed raw format the
crawl stage-zero operators (operators/web.py) start from.

Real crawl dumps arrive as concatenated record-framed text (the WARC
container: a ``WARC/1.0`` header line, ``Name: value`` header block,
blank line, ``Content-Length`` bytes of payload), not as one row per
line — so before url_canonicalize → html_extract → link_extract can
run, the dump must be split into records, parsed, and the malformed
tail routed to a dead-letter channel (the csv_ingest/jsonl_ingest
convention: never kill the job, never silently drop).

Spark-first split: ``spark.read.option("lineSep", "WARC/1.0\\n")``
makes Hadoop's record reader emit ONE ROW PER RECORD regardless of
how files are split across tasks — records spanning an input-split
boundary are stitched by the reader, so a 100 TB dump parallelizes by
byte range with no per-file driver loop and no record loss at split
edges.  Everything after the split is pure Column regex/substr (scan
side, whole-stage codegen, zero shuffle).

Documented simplifications vs a byte-exact WARC parser (ADVICE r8):

* SENTINEL COLLISION — payload bytes are honored via
  ``Content-Length`` AFTER delimiter-splitting, so a payload that
  itself contains the record sentinel at line start would be split
  early (surfacing as a length_mismatch dead-letter, never a silent
  wrong parse).  Production crawl dumps (e.g. Common Crawl) gzip each
  record individually, which removes the collision by construction; a
  binary member-split reader is the extension seam.
* CHARACTER FRAMING — ``Content-Length`` is honored in CHARACTERS
  (``length``/``substr`` over the decoded string), while the real
  WARC spec declares OCTETS.  For ASCII payloads (this repo's
  fixtures) the two coincide; a non-ASCII payload from an external
  dump whose declared octet count exceeds its character count would
  be over-sliced into the separator junk or dead-lettered as
  length_mismatch — again loud, never a silent wrong parse.  External
  dumps need the same binary-member reader seam, framing with byte
  slicing over a ``binary`` column (``spark.read.format("binaryFile")``
  member split + octet ``substr``) instead of decoded-text substr.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_SENTINEL = "WARC/1.0\n"

# dead-letter reasons, in precedence order (first failing rule wins)
REASON_NO_SEPARATOR = "missing_separator"
REASON_NO_URI = "missing_uri"
REASON_NO_LENGTH = "missing_length"
REASON_LENGTH_MISMATCH = "length_mismatch"


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read a concatenated WARC-shaped dump: one parsed row per record
    (see ``parse_warc_records`` for the output contract)."""
    raw = spark.read.option("lineSep", WARC_SENTINEL).text(path)
    return parse_warc_records(raw)


def parse_warc_records(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse record chunks (text AFTER each ``WARC/1.0`` sentinel) into

    (url, warc_type, declared_len, payload_len, payload, payload_md5,
    is_malformed, reason)

    * header block = chunk up to the first blank line; payload = the
      next ``Content-Length`` characters after it (trailing
      record-separator newlines are framing, not payload),
    * ``WARC-Target-URI`` / ``WARC-Type`` / ``Content-Length`` parsed
      with anchored multiline regex (RE2/Java-common — the oracle
      replays them),
    * dead-letter rows keep the diagnosing reason and sentinel data
      fields (-1 / '' — the csv_ingest convention) so downstream
      stages can count and audit them without special-casing NULLs,
    * the empty chunk before a file's first sentinel is dropped.
    """
    hdr = "split_part(_chunk, '\n\n', 1)"
    after = "substr(_chunk, length(" + hdr + ") + 3)"
    df = (
        raw.select(F.col(value_col).alias("_chunk"))
        .filter(F.expr("length(trim(_chunk)) > 0"))
        .withColumn("_has_sep", F.expr("contains(_chunk, '\n\n')"))
        # header fields parse from the HEADER BLOCK only — a payload
        # line that happens to look like a WARC header must not leak
        # into the record's metadata
        .withColumn("_hdr", F.expr(hdr))
        .withColumn(
            "url",
            F.expr(r"regexp_extract(_hdr, '(?m)^WARC-Target-URI: (\\S+)$', 1)"),
        )
        .withColumn(
            "warc_type",
            F.expr(r"regexp_extract(_hdr, '(?m)^WARC-Type: (\\S+)$', 1)"),
        )
        .withColumn(
            "_cl",
            F.expr(
                r"try_cast(regexp_extract(_hdr, '(?m)^Content-Length: ([0-9]+)$', 1) AS BIGINT)"
            ),
        )
        .withColumn("_after", F.expr(f"CASE WHEN _has_sep THEN {after} ELSE '' END"))
    )
    reason = F.expr(
        f"""CASE
            WHEN NOT _has_sep THEN '{REASON_NO_SEPARATOR}'
            WHEN url = '' THEN '{REASON_NO_URI}'
            WHEN _cl IS NULL THEN '{REASON_NO_LENGTH}'
            WHEN length(_after) < _cl THEN '{REASON_LENGTH_MISMATCH}'
            ELSE '' END"""
    )
    out = df.withColumn("reason", reason).withColumn(
        "is_malformed", F.col("reason") != ""
    )
    payload = F.expr("CASE WHEN is_malformed THEN '' ELSE substr(_after, 1, _cl) END")
    return out.select(
        "url",
        "warc_type",
        F.when(F.col("is_malformed"), F.lit(-1).cast("long"))
        .otherwise(F.col("_cl"))
        .alias("declared_len"),
        payload.alias("payload"),
        F.when(F.col("is_malformed"), F.lit(-1).cast("long"))
        .otherwise(F.length(payload).cast("long"))
        .alias("payload_len"),
        F.when(F.col("is_malformed"), F.lit(""))
        .otherwise(F.md5(payload.cast("binary")))
        .alias("payload_md5"),
        "is_malformed",
        "reason",
    )
