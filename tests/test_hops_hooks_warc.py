"""Round-2 features: in-wave redirect-hop chains (op 20, spec in
config.py), CollectAdditionalLinks-style link hooks, and the WARC
archive sink + index (op 4 — the reference's actual persistent output).
Each runs engine vs the sequential oracle on a purpose-built corpus.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from shaman_scraping_spark.config import CrawlConfig
from shaman_scraping_spark.corpus.generator import Corpus
from shaman_scraping_spark.corpus.simulator import simulate
from shaman_scraping_spark.plans.engine import CrawlEngine

TS = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _page(links, body="content words here") -> bytes:
    anchors = "".join(f'<a href="{u}">x</a>' for u in links)
    return f"<html><body><p>{body}</p>{anchors}</body></html>".encode()


def _redirect(target) -> bytes:
    return (f'<html><head><meta http-equiv="refresh" '
            f'content="0; url={target}"></head></html>').encode()


def _mk_corpus(rows, seeds) -> Corpus:
    c = Corpus()
    for url, html in rows:
        c.rows.append((url, TS, html, "", "en"))
    c.seeds = list(seeds)
    return c


def _run(spark, corpus, cfg, tmp, tag):
    d = tmp.mktemp(f"{tag}_corpus")
    corpus.write(d)
    state = tmp.mktemp(f"{tag}_state")
    eng = CrawlEngine(spark, cfg, str(d / "pages.parquet"), str(state), record_emission=True)
    eng.run()
    return eng


def _emissions(eng):
    return sorted(
        (r["wave"], r["emit_rank"], r["url"], r["depth"], r["host"])
        for r in eng.io.load("emission").collect()
    )


# --- redirect hop chains -----------------------------------------------------

@pytest.fixture(scope="module")
def chain_corpus():
    h = "http://c.example"
    rows = [
        (f"{h}/", _page([f"{h}/a"])),
        (f"{h}/a", _redirect(f"{h}/b")),      # hop 1
        (f"{h}/b", _redirect(f"{h}/c")),      # hop 2
        (f"{h}/c", _redirect(f"{h}/d")),      # hop 3
        (f"{h}/d", _page([], "final target page")),
        # a 4-deep chain that exceeds the cap
        (f"{h}/long0", _redirect(f"{h}/long1")),
        (f"{h}/long1", _redirect(f"{h}/long2")),
        (f"{h}/long2", _redirect(f"{h}/long3")),
        (f"{h}/long3", _redirect(f"{h}/long4")),
        (f"{h}/long4", _page([], "past the cap")),
    ]
    c = _mk_corpus(rows, [f"{h}/", f"{h}/long0"])
    return c


def test_three_hop_chain_resolves_in_one_wave(spark, chain_corpus,
                                              tmp_path_factory):
    cfg = CrawlConfig(seeds=tuple(chain_corpus.seeds), max_waves=5,
                      max_redirect_hops=3)
    sim = simulate(chain_corpus, cfg)
    eng = _run(spark, chain_corpus, cfg, tmp_path_factory, "chain")
    assert _emissions(eng) == sorted(sim.emissions)
    fetched = {(r["url_canon"], r["wave"], r["status"])
               for r in eng.io.load("fetched").collect()}
    assert fetched == set(sim.fetched)
    # /a scheduled at wave 1 → b, c, d hop-fetched in the SAME wave
    by_url = {u: (w, s) for u, w, s in fetched}
    wave_a = by_url["http://c.example/a"][0]
    for tail, status in (("b", 302), ("c", 302), ("d", 200)):
        assert by_url[f"http://c.example/{tail}"] == (wave_a, status)
    # the 4-deep chain: long1..long3 hop-fetched with long0 (wave 0),
    # long4 exceeds the cap → ordinary frontier link, next wave
    w0 = by_url["http://c.example/long0"][0]
    assert by_url["http://c.example/long3"][0] == w0
    assert by_url["http://c.example/long4"] == (w0 + 1, 200)
    # hops consumed no quota: emissions = scheduled only
    emitted_urls = {e[2] for e in sim.emissions}
    assert "http://c.example/b" not in emitted_urls
    assert "http://c.example/long4" in emitted_urls  # re-queued at cap


def test_hops_disabled_restores_one_hop_per_wave(spark, chain_corpus,
                                                 tmp_path_factory):
    cfg = CrawlConfig(seeds=tuple(chain_corpus.seeds), max_waves=6,
                      max_redirect_hops=0)
    sim = simulate(chain_corpus, cfg)
    eng = _run(spark, chain_corpus, cfg, tmp_path_factory, "nohop")
    assert _emissions(eng) == sorted(sim.emissions)
    by_url = {r["url_canon"]: r["wave"]
              for r in eng.io.load("fetched").collect()}
    # each hop costs one wave now
    assert by_url["http://c.example/d"] == by_url["http://c.example/a"] + 3


# --- link-collection hooks ---------------------------------------------------

def test_link_hook_reaches_img_only_page(spark, tmp_path_factory):
    h = "http://i.example"
    img_html = (f'<html><body><img src="{h}/gallery/1">'
                f'<p>words</p></body></html>').encode()
    rows = [
        (f"{h}/", img_html),
        (f"{h}/gallery/1", _page([], "only reachable via img hook")),
    ]
    corpus = _mk_corpus(rows, [f"{h}/"])
    hook = (r'<img\b[^>]*?\bsrc\s*=\s*"([^"]*)"',)

    cfg_no = CrawlConfig(seeds=(f"{h}/",), max_waves=3)
    eng_no = _run(spark, corpus, cfg_no, tmp_path_factory, "hookless")
    got_no = {r["url_canon"] for r in eng_no.io.load("fetched").collect()}
    assert f"{h}/gallery/1" not in got_no

    cfg = CrawlConfig(seeds=(f"{h}/",), max_waves=3, link_patterns=hook)
    sim = simulate(corpus, cfg)
    eng = _run(spark, corpus, cfg, tmp_path_factory, "hooked")
    assert _emissions(eng) == sorted(sim.emissions)
    got = {r["url_canon"] for r in eng.io.load("fetched").collect()}
    assert f"{h}/gallery/1" in got


# --- WARC archive sink + index -----------------------------------------------

def test_warc_sink_round_trip(spark, tiny_corpus, tiny_corpus_dir,
                              tmp_path_factory):
    from shaman_scraping_spark.sources.warc import (
        read_warc, read_warc_record,
    )

    warc_dir = tmp_path_factory.mktemp("warc_out")
    state = tmp_path_factory.mktemp("warc_state")
    cfg = CrawlConfig(seeds=tuple(tiny_corpus.seeds), max_waves=3,
                      warc_dir=str(warc_dir))
    eng = CrawlEngine(spark, cfg,
                      str(tiny_corpus_dir / "pages.parquet"), str(state), record_emission=True)
    eng.run()

    fetched = {
        r["url_canon"]: bytes(r["html"])
        for r in eng.io.load("fetched")
        .filter(F.col("html").isNotNull())
        .select("url_canon", "html").collect()
    }
    assert fetched, "corpus crawl produced no payloads"

    # 1. full archive read-back: payloads byte-equal to the fetched table
    recs = read_warc(spark, str(warc_dir) + "/*").select(
        "url", "payload", "http_status"
    ).collect()
    got = {r["url"]: bytes(r["payload"]) for r in recs}
    assert got == fetched

    # 2. the sidecar index covers every record and supports random
    #    access (WarcItem.OpenStream analogue: seek + one-record read)
    idx = eng.io.load("warc_index").collect()
    assert {r["url"] for r in idx} == set(fetched)
    probe = sorted(idx, key=lambda r: r["url"])[:5]
    for r in probe:
        rec = read_warc_record(r["warc_file"], r["offset"], r["length"])
        assert rec["url"] == r["url"]
        assert bytes(rec["payload"]) == fetched[r["url"]]
