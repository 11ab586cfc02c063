"""Sitemap ingestion (op 49, sources/sitemap.py): robots `Sitemap:`
directives, urlset/sitemapindex parsing, and the engine ≡ oracle e2e
including sitemap-only orphan pages."""

from __future__ import annotations

import pytest

from shaman_scraping_spark.config import CrawlConfig
from shaman_scraping_spark.corpus.generator import CorpusSpec, generate_corpus
from shaman_scraping_spark.corpus.simulator import simulate
from shaman_scraping_spark.plans.engine import CrawlEngine
from shaman_scraping_spark.sources.sitemap import (
    is_sitemap_index, sitemap_locs, sitemap_urls_of_robots,
)


def test_robots_sitemap_directive_parse():
    body = (
        "User-agent: *\nDisallow: /x\n"
        "Sitemap: http://a.example/sitemap.xml\n"
        "  sitemap:\thttp://a.example/other.xml\n"
        "# Sitemap: http://a.example/commented.xml\n"
    )
    assert sitemap_urls_of_robots(body) == [
        "http://a.example/sitemap.xml",
        "http://a.example/other.xml",
    ]
    assert sitemap_urls_of_robots(None) == []
    assert sitemap_urls_of_robots("User-agent: *\n") == []


def test_sitemap_loc_parse_and_index_detection():
    urlset = (
        '<?xml version="1.0"?><urlset><url><loc> http://h/a </loc></url>'
        "<url><loc>http://h/b</loc></url></urlset>"
    )
    assert sitemap_locs(urlset) == ["http://h/a", "http://h/b"]
    assert not is_sitemap_index(urlset)
    idx = "<sitemapindex><sitemap><loc>http://h/s0.xml</loc></sitemap></sitemapindex>"
    assert is_sitemap_index(idx)
    assert sitemap_locs(idx) == ["http://h/s0.xml"]


@pytest.fixture(scope="module")
def sm_corpus(tmp_path_factory):
    corpus = generate_corpus(
        CorpusSpec(n_hosts=6, n_pages=120, sitemap_frac=1.0)
    )
    d = tmp_path_factory.mktemp("sm_corpus")
    corpus.write(d)
    return corpus, d


def test_sitemap_corpus_shape(sm_corpus):
    corpus, _d = sm_corpus
    assert corpus.sitemaps and corpus.orphans
    urls = {r[0] for r in corpus.rows}
    # every sitemap host has its /sitemap.xml row; the first exercises
    # the index path with two children
    assert any(u.endswith("/sitemap-0.xml") for u in urls)
    for h in corpus.sitemaps:
        assert f"http://{h}/sitemap.xml" in urls
        for ou in corpus.orphans[h]:
            assert ou in urls


def test_sitemap_crawl_matches_oracle_and_reaches_orphans(
    spark, sm_corpus, tmp_path_factory
):
    corpus, d = sm_corpus
    cfg = CrawlConfig(seeds=tuple(corpus.seeds), max_waves=6,
                      use_sitemaps=True)
    sim = simulate(corpus, cfg)
    state = tmp_path_factory.mktemp("sm_state")
    eng = CrawlEngine(spark, cfg, str(d / "pages.parquet"), str(state),
                      record_emission=True)
    eng.run()
    got = sorted(
        (r["wave"], r["emit_rank"], r["url"], r["depth"], r["host"])
        for r in eng.io.load("emission").collect()
    )
    assert got == sorted(sim.emissions)
    seen = {r["url_canon"] for r in eng.io.load("seen").collect()}
    assert seen == sim.seen
    fetched = {r["url_canon"] for r in eng.io.load("fetched").collect()}
    # orphans are reachable ONLY via sitemaps — and they were fetched
    # (seeded hosts' orphans at least; seeds cover ≤10 hosts)
    seeded_hosts = {s.split("://", 1)[1].split("/", 1)[0].lower()
                    for s in corpus.seeds}
    orphan_hit = {
        ou for h, ous in corpus.orphans.items() if h in seeded_hosts
        for ou in ous
    }
    assert orphan_hit and orphan_hit <= fetched
    # sitemap documents themselves are out-of-band: never seen/fetched
    sm_docs = {u for u in fetched if "/sitemap" in u}
    assert not sm_docs
    eng.close()


def test_sitemaps_off_by_default_orphans_unreached(
    spark, sm_corpus, tmp_path_factory
):
    corpus, d = sm_corpus
    cfg = CrawlConfig(seeds=tuple(corpus.seeds), max_waves=6)
    assert cfg.use_sitemaps is False
    sim = simulate(corpus, cfg)
    state = tmp_path_factory.mktemp("sm_off_state")
    eng = CrawlEngine(spark, cfg, str(d / "pages.parquet"), str(state),
                      record_emission=True)
    eng.run()
    got = sorted(
        (r["wave"], r["emit_rank"], r["url"], r["depth"], r["host"])
        for r in eng.io.load("emission").collect()
    )
    assert got == sorted(sim.emissions)
    fetched = {r["url_canon"] for r in eng.io.load("fetched").collect()}
    all_orphans = {ou for ous in corpus.orphans.values() for ou in ous}
    assert not (all_orphans & fetched)
    eng.close()


@pytest.mark.slow
def test_streaming_sitemap_orphans_fetched(spark, tmp_path_factory):
    """op 49 in streaming mode: sitemap locs of newly-sighted hosts
    enqueue at depth 0; orphans get fetched; sitemap docs never do."""
    from shaman_scraping_spark.streaming.crawl_stream import StreamingCrawl

    corpus = generate_corpus(
        CorpusSpec(n_hosts=4, n_pages=60, crawl_delays=(0,),
                   sitemap_frac=1.0)
    )
    d = tmp_path_factory.mktemp("sm_stream_corpus")
    corpus.write(d)
    cfg = CrawlConfig(seeds=tuple(corpus.seeds), max_waves=50,
                      use_sitemaps=True)
    work = tmp_path_factory.mktemp("sm_stream_work")
    sc = StreamingCrawl(spark, cfg, str(d / "pages.parquet"), str(work))
    sc.run(idle_timeout_s=12.0, max_wall_s=60.0)
    fetched = {r["url_canon"] for r in sc.fetched().collect()}
    seeded_hosts = {s.split("://", 1)[1].split("/", 1)[0].lower()
                    for s in corpus.seeds}
    orphan_hit = {
        ou for h, ous in corpus.orphans.items() if h in seeded_hosts
        for ou in ous
    }
    assert orphan_hit and orphan_hit <= fetched
    assert not {u for u in fetched if "/sitemap" in u}
