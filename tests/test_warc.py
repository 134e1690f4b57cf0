"""WARC codec unit tests (the Spark-side differential runs in
tests/test_queries.py like every oracle-backed query)."""

import pytest

from mapreduce_go_spark.operators import warc


def test_roundtrip_multi_record():
    docs = [(0, "first doc"), (1, ""), (2, "third é doc")]
    recs = warc.parse_warc(
        b"".join(warc.make_warc_record(d, t) for d, t in docs))
    assert len(recs) == 3
    for (doc_id, text), r in zip(docs, recs):
        assert r["http_status"] == 200
        assert r["body"] == text.encode()
        assert r["headers"]["WARC-Target-URI"].endswith(f"/doc/{doc_id}")
        assert r["headers"]["WARC-Type"] == "response"


@pytest.mark.parametrize("mutate", [
    lambda p: p[4:],                                   # no version line
    lambda p: p.replace(b"WARC/1.0", b"WARC/9.9", 1),  # wrong version
    lambda p: p[:-10],                                 # short payload/sep
    lambda p: p.replace(b"Content-Length", b"X-Length"),
])
def test_rejects_malformed(mutate):
    good = warc.make_warc_record(5, "some body text here")
    with pytest.raises(ValueError):
        warc.parse_warc(mutate(good))


def test_strict_length_no_resync():
    """A record whose Content-Length under-counts must fail the walk
    (the next read lands mid-payload), not silently resync — strict
    length is the data-integrity contract."""
    rec = bytearray(warc.make_warc_record(9, "abcdefghij"))
    i = rec.find(b"Content-Length: ")
    j = rec.find(b"\r\n", i)
    n = int(rec[i + 16:j])
    rec[i:j] = f"Content-Length: {n - 4}".encode()
    with pytest.raises(ValueError):
        warc.parse_warc(bytes(rec))


def test_corrupt_bucket_truncates():
    with pytest.raises(ValueError):
        warc.parse_warc(warc.make_warc(warc.WARC_CORRUPT_EVERY * 2,
                                       [(50, "x" * 300)]))


def test_body_len_is_bytes_not_chars(duck):
    """The SCALE.md r11 latent, closed: body_len is the BYTE length of
    the HTTP payload (what the parser consumed, what Content-Length
    declared) — so for non-ASCII text the parser's value must differ
    from the character count and must equal DuckDB strlen(), the
    derivation the oracles now use."""
    text = "héllo wörld — ¡señal! ✓"   # 23 chars, more bytes in UTF-8
    recs = warc.parse_warc(warc.make_warc_record(7, text))
    assert len(recs) == 1
    got = len(recs[0]["body"])
    assert got == len(text.encode("utf-8"))
    assert got != len(text)
    duck_bytes, duck_chars = duck.execute(
        "SELECT strlen(?), length(?)", [text, text]).fetchone()
    assert got == duck_bytes
    assert duck_chars == len(text)
