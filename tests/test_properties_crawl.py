"""Property-based invariants for the crawl-ingestion stack (hypothesis,
pure Python — no Spark session needed):

- WARC serialize→parse round-trips arbitrary binary payloads and header
  values bit-exactly, in both plain and per-record-gzip-member layouts;
- the HTTP envelope strip recovers arbitrary bodies under every
  supported transfer (identity / gzip / deflate / chunked at random
  split points);
- html_to_text is IDEMPOTENT on its own output (extracted text
  re-extracts to itself — there is no half-stripped state), and never
  emits blank lines, leading/trailing spaces, or tab runs.
"""

from __future__ import annotations

import gzip
import zlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.html import (
    html_to_text,
)
from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.sources.warc import (
    http_response_body,
    parse_warc_bytes,
    write_warc_bytes,
)

_SETTINGS = dict(
    max_examples=50,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

payloads = st.binary(min_size=0, max_size=2048)
uris = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
    min_size=1,
    max_size=60,
).map(lambda s: "http://x/" + s)


@settings(**_SETTINGS)
@given(st.lists(st.tuples(payloads, uris), min_size=1, max_size=6), st.booleans())
def test_warc_round_trip_arbitrary_payloads(recs, member_gzip):
    blobs = [
        {"warc_type": "response", "target_uri": u, "content": body}
        for body, u in recs
    ]
    if member_gzip:
        data = b"".join(gzip.compress(write_warc_bytes([r])) for r in blobs)
    else:
        data = write_warc_bytes(blobs)
    back = list(parse_warc_bytes(data))
    assert [(r["content"], r["target_uri"]) for r in back] == [
        (body, u) for body, u in recs
    ]


@settings(**_SETTINGS)
@given(payloads, st.integers(min_value=0, max_value=3), st.integers(min_value=1, max_value=7))
def test_http_envelope_recovers_arbitrary_bodies(body, mode, pieces):
    if mode == 0:
        msg = b"HTTP/1.1 200 OK\r\nContent-Type: x\r\n\r\n" + body
    elif mode == 1:
        msg = (
            b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n"
            + gzip.compress(body)
        )
    elif mode == 2:
        msg = (
            b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n"
            + zlib.compress(body)
        )
    else:
        # chunked at random split points
        step = max(1, len(body) // pieces) if body else 1
        chunks = [body[i : i + step] for i in range(0, len(body), step)]
        enc = b"".join(
            f"{len(c):x}".encode() + b"\r\n" + c + b"\r\n" for c in chunks
        )
        msg = (
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
            + enc
            + b"0\r\n\r\n"
        )
    assert http_response_body(msg) == body


# visible text with no tag/entity metacharacters — what survives a
# round trip through an HTML body byte-exactly
visible = st.text(
    alphabet=st.characters(
        min_codepoint=32,
        max_codepoint=0x24F,
        exclude_characters="<>&\t",
    ),
    min_size=0,
    max_size=120,
)


@settings(**_SETTINGS)
@given(st.lists(visible, min_size=0, max_size=5))
def test_html_to_text_idempotent_and_normalized(paras):
    html = "".join(f"<p>{p}</p>" for p in paras)
    out = html_to_text(html)
    # idempotent: extracting the extraction changes nothing (the output
    # contains no markup left to strip; '&' never appears bare above)
    assert html_to_text(out) == out
    for line in out.split("\n") if out else []:
        assert line == line.strip() and line != ""
        assert "  " not in line and "\t" not in line


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=512))
def test_parse_warc_total_failure_contract(data):
    """Arbitrary bytes either parse to records or raise ValueError —
    never another exception type, never a hang (the negative
    Content-Length backward walk and zlib.error leaks are pinned
    here)."""
    try:
        list(parse_warc_bytes(data, origin="fuzz"))
    except ValueError:
        pass


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=256))
def test_parse_warc_gzip_prefixed_garbage(data):
    try:
        list(parse_warc_bytes(b"\x1f\x8b" + data, origin="fuzz"))
    except ValueError:
        pass


def test_negative_content_length_rejected():
    import pytest as _pytest

    rec = b"WARC/1.0\r\nWARC-Type: x\r\nContent-Length: -4\r\n\r\nabcd\r\n\r\n"
    with _pytest.raises(ValueError, match="negative Content-Length"):
        list(parse_warc_bytes(rec, origin="unit"))
