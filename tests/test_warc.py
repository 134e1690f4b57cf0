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


def test_parse_warc_rejects_negative_length_and_colonless_header():
    """r14 review: a negative Content-Length slipped past the
    short-payload guard (len(block) < n never fires for n < 0), the
    offset walked BACKWARDS onto the header terminator and a bogus
    empty record was emitted — the silent resync the module contract
    forbids; a colon-less header line likewise parsed 'successfully'
    and later escaped the corrupt-skip as KeyError."""
    import pytest

    from mapreduce_go_spark.operators import warc

    good = warc.make_warc_record(1, "hello")
    neg = good.replace(b"Content-Length: 63", b"Content-Length: -4")
    # (the WARC-level length is the one the walker trusts)
    neg2 = good.replace(
        next(ln for ln in good.split(b"\r\n")
             if ln.startswith(b"Content-Length:")),
        b"Content-Length: -4")
    with pytest.raises(ValueError, match="negative Content-Length"):
        warc.parse_warc(neg2)
    bad = good.replace(b"WARC-Type: response",
                       b"WARC-Type response")
    with pytest.raises(ValueError, match="no colon"):
        warc.parse_warc(bad)


def test_corrupt_bucket_truncates_inside_payload():
    """r14 review: the corrupt fixture's cut must land INSIDE the
    first record's payload (the docstring's claim) so the parser's
    'truncated record payload' branch is the one the corpus
    exercises — an 80-byte cut stopped mid-header-line."""
    import pytest

    from mapreduce_go_spark.operators import warc

    b = warc.WARC_CORRUPT_EVERY
    stream = warc.make_warc(b, [(1, "hello world")])
    hdr_end = stream.index(b"\r\n\r\n") + 4
    assert len(stream) > hdr_end  # the cut kept payload bytes
    with pytest.raises(ValueError, match="truncated record payload"):
        warc.parse_warc(stream)
