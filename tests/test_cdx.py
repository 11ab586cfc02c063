"""CDX index + WARC revisit content-dedup — SURVEY.md §2K ops 59–60."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from shaman_scraping_spark.functions.url import (
    canonicalize_url_py, surt_key, surt_key_py,
)
from shaman_scraping_spark.sources.cdx import (
    build_cdx, cdx_lookup, cdx_prefix, resolve_revisits, write_cdx,
)
from shaman_scraping_spark.sources.warc import (
    parse_warc_bytes, read_warc, read_warc_record, write_warc_archive,
    write_warc_bytes,
)

TS = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)

SURT_URLS = [
    "http://example.com/",
    "http://www.example.com/a/b?q=1",
    "https://sub.deep.example.org/path",
    "http://example.com:8080/x",
    "http://h1.example/a?b=2&c=3",
]


def test_surt_twin_property(spark):
    canon = [canonicalize_url_py(u) for u in SURT_URLS]
    assert all(canon)
    df = spark.createDataFrame([(c,) for c in canon], "u string")
    got = [r["k"] for r in df.select(surt_key(F.col("u")).alias("k"))
           .orderBy("u").collect()]
    want = [surt_key_py(c) for c in sorted(canon)]
    assert got == want
    # spot-check the shape: reversed host labels, ')' separator
    assert surt_key_py("http://www.example.com/a/b?q=1") == \
        "com,example,www)/a/b?q=1"


def test_surt_twin_generated_property(spark):
    """Generated-corpus property run (repo's property-test style): 300
    seeded random URLs through canonicalize -> Catalyst surt_key must
    byte-equal the Python twin on every row."""
    import random

    rng = random.Random(42)
    tlds = ["com", "org", "example", "co.uk"]
    urls = []
    for i in range(300):
        labels = [f"l{rng.randrange(10)}" for _ in range(rng.randrange(1, 4))]
        host = ".".join(labels + [rng.choice(tlds)])
        port = f":{rng.randrange(1, 65535)}" if rng.random() < 0.2 else ""
        segs = "/".join(f"p{rng.randrange(100)}"
                        for _ in range(rng.randrange(0, 4)))
        q = ("?" + "&".join(f"k{j}={rng.randrange(9)}"
                            for j in range(rng.randrange(0, 3)))
             if rng.random() < 0.5 else "")
        q = "" if q == "?" else q
        urls.append(f"http://{host}{port}/{segs}{q}")
    canon = [c for c in (canonicalize_url_py(u) for u in urls) if c]
    assert len(canon) >= 290
    df = spark.createDataFrame([(c,) for c in canon], "u string")
    rows = df.select(
        "u", surt_key(F.col("u")).alias("k")
    ).collect()
    for r in rows:
        assert r["k"] == surt_key_py(r["u"]), r["u"]


def test_revisit_record_roundtrip():
    recs = [
        {"url": "http://a.example/", "warc_ts": TS, "payload": b"<p>x</p>",
         "http_status": 200, "digest": "d" * 40},
        {"url": "http://a.example/copy", "warc_ts": TS, "payload": b"IGNORED",
         "http_status": 200, "digest": "d" * 40,
         "record_type": "revisit", "refers_to": "http://a.example/"},
    ]
    got = parse_warc_bytes(write_warc_bytes(recs), "f.warc")
    assert got[0]["record_type"] == "response"
    assert got[0]["digest"] == "d" * 40
    assert got[0]["payload"] == b"<p>x</p>"
    assert got[1]["record_type"] == "revisit"
    assert got[1]["payload"] == b""  # revisit stores no payload bytes
    assert got[1]["refers_to"] == "http://a.example/"
    assert got[1]["http_status"] == 200


DUP_BYTES = b"<p>" + b"same bytes " * 200 + b"</p>"


@pytest.fixture()
def archive(spark, tmp_path):
    """4 pages, 2 sharing identical bytes -> dedup sink + index."""
    rows = [
        ("http://h1.example/", TS, b"<p>front page</p>", 200),
        ("http://h1.example/a", TS, DUP_BYTES, 200),
        ("http://h2.example/b", TS, DUP_BYTES, 200),
        ("http://h2.example/c", TS, b"<p>unique</p>", 200),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, status int"
    ).repartition(1)  # one part-file: offsets deterministic for asserts
    out = tmp_path / "warc"
    out.mkdir()
    # uncompressed: the record-size assertion compares raw byte costs
    # (gzip would shrink the deliberately repetitive payload below the
    # revisit header overhead and invert the comparison)
    idx = write_warc_archive(df, str(out), compress=False, dedup=True)
    pdf = idx.toPandas()
    return out, pdf


def test_dedup_sink_writes_revisits(spark, archive):
    out, pdf = archive
    by_url = pdf.set_index("url")
    assert by_url.loc["http://h1.example/", "record_type"] == "response"
    # same digest: min-url row is the response, the other a revisit
    assert by_url.loc["http://h1.example/a", "record_type"] == "response"
    assert by_url.loc["http://h2.example/b", "record_type"] == "revisit"
    assert by_url.loc["http://h2.example/c", "record_type"] == "response"
    dup_digests = set(pdf[pdf.record_type == "revisit"].digest)
    assert dup_digests == {by_url.loc["http://h1.example/a", "digest"]}
    # the revisit record is smaller than its response twin (no payload)
    assert (by_url.loc["http://h2.example/b", "length"]
            < by_url.loc["http://h1.example/a", "length"])
    # read-back: revisit carries the pointer, not the bytes
    recs = {r["url"]: r for r in read_warc(spark, str(out)).collect()}
    assert recs["http://h2.example/b"]["record_type"] == "revisit"
    assert recs["http://h2.example/b"]["refers_to"] == "http://h1.example/a"
    assert bytes(recs["http://h1.example/a"]["payload"]) == DUP_BYTES


def test_prior_digests_cross_commit(spark, tmp_path, archive):
    out, pdf = archive
    prior = spark.createDataFrame(pdf[["digest", "url", "record_type"]])
    prior = prior.filter(F.col("record_type") == "response") \
                 .select("digest", "url")
    df2 = spark.createDataFrame(
        [("http://h3.example/later", TS, DUP_BYTES, 200)],
        "url string, warc_ts timestamp, html binary, status int",
    )
    out2 = tmp_path / "warc2"
    out2.mkdir()
    idx2 = write_warc_archive(
        df2, str(out2), dedup=True, prior_digests=prior
    ).toPandas()
    assert list(idx2.record_type) == ["revisit"]
    # points at the earlier commit's response copy
    assert (read_warc(spark, str(out2)).collect()[0]["refers_to"]
            == "http://h1.example/a")


def test_cdx_lookup_and_prefix(spark, tmp_path, archive):
    out, pdf = archive
    idx = spark.createDataFrame(pdf)
    cdx_path = str(tmp_path / "cdx")
    write_cdx(idx, cdx_path, n_partitions=2)

    hit = cdx_lookup(spark, cdx_path, "http://h2.example/c").collect()
    assert len(hit) == 1 and hit[0]["urlkey"] == "example,h2)/c"
    # the point predicate reaches the parquet scan (file/row-group pruning)
    plan = (
        cdx_lookup(spark, cdx_path, "http://h2.example/c")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters" in plan and "urlkey" in plan

    site = cdx_prefix(spark, cdx_path, "http://h1.example/").collect()
    assert [r["url"] for r in site] == [
        "http://h1.example/", "http://h1.example/a",
    ]


def test_resolve_revisits_payload_pointer(spark, tmp_path, archive):
    out, pdf = archive
    cdx = build_cdx(spark.createDataFrame(pdf))
    resolved = {r["url"]: r for r in resolve_revisits(cdx).collect()}
    rv = resolved["http://h2.example/b"]
    rs = resolved["http://h1.example/a"]
    assert (rv["payload_file"], rv["payload_offset"], rv["payload_length"]) \
        == (rs["warc_file"], rs["offset"], rs["length"])
    rec = read_warc_record(
        rv["payload_file"], rv["payload_offset"], rv["payload_length"]
    )
    assert bytes(rec["payload"]) == DUP_BYTES


def test_engine_warc_dedup_e2e(spark, tmp_path):
    """Crawl with --warc-dedup: duplicate-content pages become revisit
    records across the wave, payload recoverable through the CDX."""
    from shaman_scraping_spark.config import CrawlConfig
    from shaman_scraping_spark.plans.engine import CrawlEngine

    seed_html = (b'<html><body><a href="/a">a</a> '
                 b'<a href="/b">b</a></body></html>')
    dup_html = b"<html><body>identical leaf page</body></html>"
    rows = [
        ("http://h1.example/", TS, seed_html, "", "en"),
        ("http://h1.example/a", TS, dup_html, "", "en"),
        ("http://h1.example/b", TS, dup_html, "", "en"),
    ]
    pages = tmp_path / "pages.parquet"
    spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string",
    ).write.parquet(str(pages))

    warc_dir = tmp_path / "warc"
    cfg = CrawlConfig(
        seeds=("http://h1.example/",), max_waves=2,
        warc_dir=str(warc_dir), warc_dedup=True,
    )
    eng = CrawlEngine(spark, cfg, str(pages), str(tmp_path / "state"))
    eng.run()

    idx = eng.io.load("warc_index")
    got = {r["url"]: r["record_type"] for r in idx.collect()}
    assert got == {
        "http://h1.example/": "response",
        "http://h1.example/a": "response",
        "http://h1.example/b": "revisit",
    }
    resolved = {
        r["url"]: r for r in resolve_revisits(build_cdx(idx)).collect()
    }
    rec = read_warc_record(
        resolved["http://h1.example/b"]["payload_file"],
        resolved["http://h1.example/b"]["payload_offset"],
        resolved["http://h1.example/b"]["payload_length"],
    )
    assert bytes(rec["payload"]) == dup_html


@pytest.mark.slow
def test_streaming_warc_tee_dedup(spark, tmp_path_factory):
    """Op 4/59 streaming leg: the micro-batch WARC tee archives every
    payload-bearing fetch, and with warc_dedup each distinct payload is
    stored exactly once — later copies (same batch or a later one)
    become revisit records resolving to the stored response."""
    from shaman_scraping_spark.config import CrawlConfig
    from shaman_scraping_spark.streaming.crawl_stream import StreamingCrawl

    dup_html = b'<html><body>dup page <a href="/c">c</a></body></html>'
    seed_html = (b'<html><body><a href="/a">a</a> '
                 b'<a href="/b">b</a></body></html>')
    rows = [
        ("http://h1.example/", TS, seed_html, "", "en"),
        ("http://h1.example/a", TS, dup_html, "", "en"),
        ("http://h1.example/b", TS, dup_html, "", "en"),
        ("http://h1.example/c", TS, dup_html, "", "en"),
    ]
    base = tmp_path_factory.mktemp("stream_warc")
    pages = base / "pages.parquet"
    spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string",
    ).write.parquet(str(pages))

    warc_dir = base / "warc"
    cfg = CrawlConfig(
        seeds=("http://h1.example/",), max_waves=50,
        default_crawl_delay=0.0,
        warc_dir=str(warc_dir), warc_dedup=True,
    )
    sc = StreamingCrawl(spark, cfg, str(pages), str(base / "work"))
    sc.run(idle_timeout_s=15.0)

    fetched_urls = {
        r["url_canon"]
        for r in sc.fetched().filter(F.col("status") == 200).collect()
    }
    idx = sc.warc_index().collect()
    assert {r["url"] for r in idx} == fetched_urls == {
        "http://h1.example/", "http://h1.example/a",
        "http://h1.example/b", "http://h1.example/c",
    }
    # exactly one stored copy per distinct payload, rest are revisits
    responses = {r["url"]: r for r in idx if r["record_type"] == "response"}
    revisits = [r for r in idx if r["record_type"] == "revisit"]
    digests = {}
    for r in idx:
        digests.setdefault(r["digest"], []).append(r["record_type"])
    for d, types in digests.items():
        assert types.count("response") == 1, (d, types)
    assert len(revisits) == 2  # two of the three dup-payload pages
    # every revisit resolves to the response copy holding the bytes
    cdx = build_cdx(spark.createDataFrame(idx))
    resolved = {r["url"]: r for r in resolve_revisits(cdx).collect()}
    for rv in revisits:
        rec = read_warc_record(
            resolved[rv["url"]]["payload_file"],
            resolved[rv["url"]]["payload_offset"],
            resolved[rv["url"]]["payload_length"],
        )
        assert bytes(rec["payload"]) == dup_html


def test_wet_conversion_roundtrip():
    """Op 62 kernel: plain conversion records round-trip — block is the
    text bytes verbatim (no HTTP wrapper), Content-Type text/plain."""
    recs = [{
        "url": "http://a.example/", "warc_ts": TS,
        "payload": "extracted text caf\xe9".encode("utf-8"),
        "record_type": "conversion", "plain": True,
    }]
    raw = write_warc_bytes(recs)
    assert b"HTTP/1.1" not in raw
    got = parse_warc_bytes(raw, "f.wet")[0]
    assert got["record_type"] == "conversion"
    assert got["content_type"] == "text/plain"
    assert got["http_status"] is None
    assert got["payload"].decode("utf-8") == "extracted text caf\xe9"


def test_engine_wet_tee_e2e(spark, tmp_path):
    """Crawl with --wet-dir: every 200 fetch's EXTRACTED TEXT lands as
    a conversion record, byte-equal to the fetched table's text."""
    from shaman_scraping_spark.config import CrawlConfig
    from shaman_scraping_spark.plans.engine import CrawlEngine

    rows = [
        ("http://h1.example/", TS,
         b'<html><body>Front page. <a href="/a">a</a></body></html>',
         "", "en"),
        ("http://h1.example/a", TS,
         "<html><body>Leaf caf\xe9 text.</body></html>".encode("utf-8"),
         "", "en"),
    ]
    pages = tmp_path / "pages.parquet"
    spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string",
    ).write.parquet(str(pages))

    cfg = CrawlConfig(
        seeds=("http://h1.example/",), max_waves=2,
        wet_dir=str(tmp_path / "wet"),
    )
    eng = CrawlEngine(spark, cfg, str(pages), str(tmp_path / "state"))
    eng.run()

    want = {
        r["url_canon"]: r["text"]
        for r in eng.io.load("fetched")
        .filter(F.col("text").isNotNull()).collect()
    }
    assert len(want) == 2
    idx = {r["url"]: r for r in eng.io.load("wet_index").collect()}
    assert set(idx) == set(want)
    for url, row in idx.items():
        rec = read_warc_record(
            row["warc_file"], row["offset"], row["length"]
        )
        assert rec["record_type"] == "conversion"
        assert rec["payload"].decode("utf-8") == want[url]


def test_engine_wat_tee_e2e(spark, tmp_path):
    """Op 63: crawl with --wat-dir — every fetch gets a metadata record
    whose JSON envelope carries status + out-links; link-graph
    consumers can rebuild edges without payloads."""
    import json

    from shaman_scraping_spark.config import CrawlConfig
    from shaman_scraping_spark.plans.engine import CrawlEngine

    rows = [
        ("http://h1.example/", TS,
         b'<html><body><a href="/a">a</a></body></html>', "", "en"),
        ("http://h1.example/a", TS,
         b"<html><body>leaf</body></html>", "", "en"),
    ]
    pages = tmp_path / "pages.parquet"
    spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string",
    ).write.parquet(str(pages))

    cfg = CrawlConfig(
        seeds=("http://h1.example/",), max_waves=2,
        wat_dir=str(tmp_path / "wat"),
    )
    eng = CrawlEngine(spark, cfg, str(pages), str(tmp_path / "state"))
    eng.run()

    idx = {r["url"]: r for r in eng.io.load("wat_index").collect()}
    assert set(idx) == {"http://h1.example/", "http://h1.example/a"}
    envs = {}
    for url, row in idx.items():
        rec = read_warc_record(row["warc_file"], row["offset"],
                               row["length"])
        assert rec["record_type"] == "metadata"
        assert rec["content_type"] == "application/json"
        envs[url] = json.loads(rec["payload"].decode("utf-8"))
    assert envs["http://h1.example/"]["status"] == 200
    # the engine's links column is already base-resolved to absolute
    assert envs["http://h1.example/"]["links"] == ["http://h1.example/a"]
    assert envs["http://h1.example/a"]["links"] == []
    assert envs["http://h1.example/a"]["n_bytes"] > 0


def test_cdx_cli_verbs(spark, tmp_path, archive, capsys):
    """The `cdx` (build) and `cdx-lookup` (query) CLI verbs end-to-end
    over a TableIO state carrying a warc_index table."""
    from shaman_scraping_spark.cli import main
    from shaman_scraping_spark.io.tableio import TableIO

    out, pdf = archive
    state = tmp_path / "state"
    TableIO(spark, str(state)).commit(
        "warc_index", spark.createDataFrame(pdf), 0, mode="append"
    )
    cdx_path = tmp_path / "cdx"
    assert main(["cdx", "--state", str(state),
                 "--output", str(cdx_path)]) == 0
    assert "4 index rows" in capsys.readouterr().out

    assert main(["cdx-lookup", "--cdx", str(cdx_path),
                 "--url", "http://h2.example/c"]) == 0
    got = capsys.readouterr().out
    assert "example,h2)/c" in got and "response" in got

    assert main(["cdx-lookup", "--cdx", str(cdx_path),
                 "--url", "http://h1.example/", "--prefix"]) == 0
    got = capsys.readouterr().out
    assert "example,h1)/" in got and "example,h1)/a" in got
