"""run_curate CLI: WARC→HTML→gate→dedup→parquet end to end, JSONL
input, stage accounting, and the status-path contract."""

from __future__ import annotations

import gzip
import json
import os

import pytest

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.cli.run_curate import (
    main as curate_main,
)
from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.sources.warc import (
    write_warc_bytes,
)


def _page(body: str) -> bytes:
    return (
        "<html><head><script>var decoy='<p>x</p>';</script></head>"
        f"<body><p>{body}</p></body></html>"
    ).encode()


def _warc_input(d) -> None:
    os.makedirs(d)
    long_a = "alpha " + " ".join(f"w{i}" for i in range(20))
    recs = [
        {"warc_type": "warcinfo", "content": b"info"},
        {"warc_type": "response", "target_uri": "http://a/", "content": _page(long_a)},
        {"warc_type": "request", "content": b"GET /"},  # dropped by type
        {"warc_type": "response", "target_uri": "http://short/", "content": _page("too short")},
        # exact duplicate of http://a/ under a later url — dedup victim
        {"warc_type": "response", "target_uri": "http://z-dup/", "content": _page(long_a)},
        {"warc_type": "response", "target_uri": "http://b/",
         "content": _page("beta " + " ".join(f"v{i}" for i in range(20)))},
    ]
    with open(os.path.join(d, "crawl.warc.gz"), "wb") as f:
        for r in recs:
            f.write(gzip.compress(write_warc_bytes([r])))


def test_warc_curation_end_to_end(spark, tmp_path, capsys):
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    _warc_input(inp)
    curate_main(["--input", inp, "--output", out, "--min-tokens", "10"])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # 5 text-bearing records parsed (request + warcinfo dropped by type)
    assert report["parsed"] == 4
    assert report["after_gate"] == 3  # 'too short' gated out
    assert report["written"] == 2  # dup collapsed
    rows = {r.url: r.text for r in spark.read.parquet(out).collect()}
    assert set(rows) == {"http://a/", "http://b/"}  # min url survived
    assert rows["http://a/"].startswith("alpha ")
    assert "decoy" not in rows["http://a/"]


def test_jsonl_input_and_no_dedup(spark, tmp_path, capsys):
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    os.makedirs(inp)
    doc = "gamma " + " ".join(f"u{i}" for i in range(15))
    with open(os.path.join(inp, "a.jsonl"), "w") as f:
        for url in ("http://1/", "http://2/"):
            f.write(json.dumps({"url": url, "text": doc}) + "\n")
        f.write(json.dumps({"url": "http://3/", "text": "tiny"}) + "\n")
    curate_main([
        "--input", inp, "--output", out, "--input-format", "jsonl",
        "--min-tokens", "10", "--no-dedup",
    ])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert (report["parsed"], report["after_gate"], report["written"]) == (3, 2, 2)


def test_status_path_contract(tmp_path, capsys):
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    _warc_input(inp)
    ok_status = str(tmp_path / "ok")
    curate_main([
        "--input", inp, "--output", out, "--min-tokens", "10",
        "--status-path", ok_status,
    ])
    capsys.readouterr()
    assert open(ok_status).read() == "0"
    bad_status = str(tmp_path / "bad")
    with pytest.raises(Exception):
        # output exists -> mode("error") refuses, status records 1
        curate_main([
            "--input", inp, "--output", out, "--min-tokens", "10",
            "--status-path", bad_status,
        ])
    assert open(bad_status).read() == "1"


def test_http_envelope_stripped_and_wet_not_html_parsed(spark, tmp_path, capsys):
    """'response' records carry full HTTP messages — headers must NOT
    leak into the corpus; 'conversion' (WET) records are plain text —
    the HTML tokenizer must NOT eat their angle-bracket spans."""
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    os.makedirs(inp)
    doc = "delta " + " ".join(f"h{i}" for i in range(15))
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + _page(doc)
    )
    wet_text = "for i <b and j > 2: loop " + " ".join(f"w{i}" for i in range(12))
    recs = [
        {"warc_type": "response", "target_uri": "http://h/", "content": http},
        {"warc_type": "conversion", "target_uri": "http://wet/",
         "content": wet_text.encode()},
    ]
    with open(os.path.join(inp, "c.warc.gz"), "wb") as f:
        for r in recs:
            f.write(gzip.compress(write_warc_bytes([r])))
    curate_main(["--input", inp, "--output", out, "--min-tokens", "5"])
    capsys.readouterr()
    rows = {r.url: r.text for r in spark.read.parquet(out).collect()}
    assert rows["http://h/"] == doc  # no 'HTTP/1.1 200 OK' prefix
    assert rows["http://wet/"] == wet_text  # '<b ... >' span intact


def test_null_url_rows_keep_their_text(spark, tmp_path, capsys):
    """min_by skips NULL ordering values — without the coalesce, a
    NULL-url group wrote url=NULL AND text=NULL (destroyed text)."""
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    os.makedirs(inp)
    doc = "epsilon " + " ".join(f"n{i}" for i in range(15))
    with open(os.path.join(inp, "a.jsonl"), "w") as f:
        f.write(json.dumps({"text": doc}) + "\n")  # no url field
    curate_main([
        "--input", inp, "--output", out, "--input-format", "jsonl",
        "--min-tokens", "5",
    ])
    capsys.readouterr()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1 and rows[0].text == doc and rows[0].url == ""
