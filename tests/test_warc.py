"""Op 3–4 golden tests: WARC record parse (plain + gzip + truncated +
non-HTTP records) and write→read round-trip through Spark."""

from __future__ import annotations

from datetime import datetime, timezone

from shaman_scraping_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    write_warc_bytes,
)

TS = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)

RECORDS = [
    {"url": "http://a.example/", "warc_ts": TS, "payload": b"<p>hello</p>",
     "http_status": 200, "content_type": "text/html"},
    {"url": "http://a.example/x", "warc_ts": TS, "payload": b"<p>x</p>",
     "http_status": 404, "content_type": "text/html"},
    {"url": "http://b.example/", "warc_ts": TS,
     "payload": "caf\xe9".encode("latin-1"),
     "http_status": 200, "content_type": "text/html; charset=iso-8859-1"},
]


def test_roundtrip_plain():
    raw = write_warc_bytes(RECORDS)
    got = parse_warc_bytes(raw, "f.warc")
    assert len(got) == 3
    assert got[0]["url"] == "http://a.example/"
    assert got[0]["payload"] == b"<p>hello</p>"
    assert got[0]["http_status"] == 200
    assert got[1]["http_status"] == 404
    assert got[2]["content_type"].startswith("text/html")
    assert got[0]["warc_ts"] == TS


def test_roundtrip_gzip_members():
    raw = write_warc_bytes(RECORDS, compress=True)
    got = parse_warc_bytes(raw, "f.warc.gz")
    assert [r["url"] for r in got] == [r["url"] for r in RECORDS]
    assert got[2]["payload"] == "caf\xe9".encode("latin-1")


def test_truncated_record_dropped():
    raw = write_warc_bytes(RECORDS)
    got = parse_warc_bytes(raw[: len(raw) - 40])
    assert len(got) == 2  # last record truncated → dropped, no crash


def test_non_http_record():
    warcinfo = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nWARC-Date: 2024-03-01T12:00:00Z\r\n"
        b"Content-Length: 9\r\n\r\nsoftware\n\r\n\r\n"
    )
    got = parse_warc_bytes(warcinfo + write_warc_bytes(RECORDS[:1]))
    assert got[0]["record_type"] == "warcinfo"
    assert got[0]["http_status"] is None
    assert got[0]["payload"] == b"software\n"
    assert got[1]["record_type"] == "response"


def test_read_warc_spark(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(write_warc_bytes(RECORDS))
    (tmp_path / "b.warc.gz").write_bytes(
        write_warc_bytes(RECORDS[:1], compress=True)
    )
    (tmp_path / "noise.txt").write_text("ignored")
    df = read_warc(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 4
    by_file = {}
    for r in rows:
        by_file.setdefault(r["warc_file"].rsplit("/", 1)[-1], []).append(r)
    assert len(by_file["a.warc"]) == 3
    assert len(by_file["b.warc.gz"]) == 1
    r0 = sorted(by_file["a.warc"], key=lambda r: r["url"])[0]
    assert r0["payload"] == b"<p>hello</p>"
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan and "BatchEvalPython" not in plan
