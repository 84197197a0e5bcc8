"""WARC record-splitter contracts (sources/warc.py): framing,
header parsing from the header block only, Content-Length payload
framing, dead-letter reasons and their precedence."""

import os

from firewatch_spark.sources import warc


def _rec(url, body, cl=None, sep=True, typ="response"):
    return (
        "WARC/1.0\n"
        + (f"WARC-Type: {typ}\n" if typ else "")
        + (f"WARC-Target-URI: {url}\n" if url else "")
        + f"Content-Length: {cl if cl is not None else len(body)}\n"
        + ("\n" + body + "\n\n" if sep else "")
    )


def _parse(spark, tmp_path, dump):
    d = str(tmp_path)
    with open(os.path.join(d, "part0.warc"), "w") as f:
        f.write(dump)
    return {
        r["url"]: r for r in warc.read_warc(spark, d).collect()
    }


def test_warc_good_record_roundtrip(spark, tmp_path):
    out = _parse(spark, tmp_path, _rec("http://a.com/x", "<html>hello</html>"))
    r = out["http://a.com/x"]
    assert (r["declared_len"], r["payload_len"]) == (18, 18)
    assert r["payload"] == "<html>hello</html>"
    assert not r["is_malformed"] and r["reason"] == ""


def test_warc_payload_may_contain_header_lookalikes_and_blank_lines(spark, tmp_path):
    body = "line one\n\nWARC-Target-URI: http://fake.example/\nlast"
    out = _parse(spark, tmp_path, _rec("http://real.com/p", body))
    r = out["http://real.com/p"]
    # Content-Length framing keeps the WHOLE body, blank line included,
    # and the lookalike header inside the payload never leaks out
    assert r["payload"] == body and not r["is_malformed"]
    assert len(out) == 1


def test_warc_dead_letter_reasons(spark, tmp_path):
    dump = (
        _rec(None, "abc")
        + _rec("http://bad/trunc", "short", cl=100)
        + _rec("http://bad/nosep", "", cl=5, sep=False)
        + "WARC/1.0\nWARC-Type: response\nWARC-Target-URI: http://bad/nolen\n\nx\n\n"
    )
    out = _parse(spark, tmp_path, dump)
    assert out[""]["reason"] == "missing_uri"
    assert out["http://bad/trunc"]["reason"] == "length_mismatch"
    assert out["http://bad/nosep"]["reason"] == "missing_separator"
    assert out["http://bad/nolen"]["reason"] == "missing_length"
    for r in out.values():
        assert r["is_malformed"]
        assert (r["declared_len"], r["payload_len"], r["payload_md5"]) == (-1, -1, "")


def test_warc_declared_longer_payload_is_truncated_to_length(spark, tmp_path):
    # Content-Length SHORTER than the bytes present: the framing wins
    # (trailing bytes are separator junk, not payload)
    out = _parse(spark, tmp_path, _rec("http://a.com/t", "abcdefgh", cl=5))
    r = out["http://a.com/t"]
    assert r["payload"] == "abcde" and r["payload_len"] == 5
    assert not r["is_malformed"]
