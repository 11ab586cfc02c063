"""robots.txt politeness — RFC 9309 user-agent group selection
(SURVEY.md §2A op 7; VERDICT r1 item 6: only the `*` group was
honored, so a specific-agent group never overrode it).

Unit tests pin the parse spec; the e2e run asserts engine ≡ simulator
on a corpus whose robots files give the crawler's own agent different
rules than `*`.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from shaman_scraping_spark.config import CrawlConfig
from shaman_scraping_spark.corpus.generator import Corpus
from shaman_scraping_spark.corpus.simulator import simulate
from shaman_scraping_spark.operators.politeness import parse_robots
from shaman_scraping_spark.plans.engine import CrawlEngine

BODY = """
User-agent: *
Disallow: /
Crawl-delay: 5

User-agent: shaman
Allow: /public
Disallow: /public/private
Crawl-delay: 1

User-agent: shaman-spark-wide
Disallow: /wide
"""


def test_specific_group_overrides_star():
    rules, delay = parse_robots(BODY, 0.0, user_agent="shaman-spark")
    # 'shaman' (len 6) beats '*' (0); 'shaman-spark-wide' does not
    # prefix-match 'shaman-spark' so it is out
    assert rules == [(True, "/public"), (False, "/public/private")]
    assert delay == 1.0


def test_longer_token_wins():
    rules, delay = parse_robots(BODY, 0.0, user_agent="shaman-spark-wide-2")
    assert rules == [(False, "/wide")]
    assert delay == 0.0  # selected group has no crawl-delay → default


def test_star_group_for_unmatched_agent():
    rules, delay = parse_robots(BODY, 0.0, user_agent="otherbot")
    assert rules == [(False, "/")]
    assert delay == 5.0


def test_consecutive_agent_lines_share_group():
    body = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert parse_robots(body, 0.0, "a")[0] == [(False, "/x")]
    assert parse_robots(body, 0.0, "b")[0] == [(False, "/x")]


def test_equal_specificity_groups_merge():
    body = ("User-agent: bot\nDisallow: /a\n\n"
            "User-agent: bot\nDisallow: /b\nCrawl-delay: 2\n")
    rules, delay = parse_robots(body, 0.0, "bot")
    assert rules == [(False, "/a"), (False, "/b")]
    assert delay == 2.0


def test_case_insensitive_token_match():
    body = "User-agent: ShAmAn\nDisallow: /x\n"
    assert parse_robots(body, 0.0, "shaman-spark")[0] == [(False, "/x")]


def test_empty_body_and_no_groups():
    assert parse_robots(None, 3.0, "shaman") == ([], 3.0)
    assert parse_robots("# comment only\n", 3.0, "shaman") == ([], 3.0)


# --- e2e: engine ≡ simulator under agent-specific robots --------------------

def _page(links) -> bytes:
    anchors = "".join(f'<a href="{u}">x</a>' for u in links)
    return f"<html><body>{anchors}</body></html>".encode()


@pytest.fixture(scope="module")
def agent_corpus():
    """Host a: `*` disallows everything, `shaman` allows /public only.
    Host b: `*`-only disallow of /hidden (regression: `*` still works)."""
    ts = datetime(2024, 1, 1, tzinfo=timezone.utc)
    c = Corpus()
    robots_a = (
        "User-agent: *\nDisallow: /\n\n"
        "User-agent: shaman\nDisallow: /secret\n"
    )
    robots_b = "User-agent: *\nDisallow: /hidden\n"
    rows = [
        ("http://a.example/robots.txt", robots_a.encode()),
        ("http://a.example/", _page(
            ["http://a.example/public/1", "http://a.example/secret/1"])),
        ("http://a.example/public/1", _page(["http://a.example/public/2"])),
        ("http://a.example/public/2", _page([])),
        ("http://a.example/secret/1", _page([])),
        ("http://b.example/robots.txt", robots_b.encode()),
        ("http://b.example/", _page(
            ["http://b.example/hidden/1", "http://b.example/open/1"])),
        ("http://b.example/hidden/1", _page([])),
        ("http://b.example/open/1", _page([])),
    ]
    for url, html in rows:
        c.rows.append((url, ts, html, "", "en"))
    c.seeds = ["http://a.example/", "http://b.example/"]
    return c


def test_wildcard_and_anchor_rules():
    """RFC 9309 §2.2.3 special characters in rule paths: ``*`` matches
    any character run, trailing ``$`` anchors the end; specificity =
    rule octet length; ties → allow; plain prefixes unchanged."""
    from shaman_scraping_spark.operators.politeness import robots_allowed

    rules = [(False, "/*.pdf$"), (True, "/docs/")]
    assert not robots_allowed("/a/b/file.pdf", rules)       # * + $ hit
    assert robots_allowed("/a/b/file.pdfx", rules)          # $ anchored
    assert robots_allowed("/docs/file.html", rules)
    # /docs/*.pdf$: the disallow (len 8) beats the allow (len 6)
    assert not robots_allowed("/docs/x.pdf", rules)
    # wildcard mid-pattern
    w = [(False, "/private*/x")]
    assert not robots_allowed("/private123/x", w)
    assert not robots_allowed("/private/x", w)              # * matches empty
    assert robots_allowed("/private123/y", w)
    # specificity tie → allow
    t = [(False, "/a/b$"), (True, "/a/*$")]
    assert robots_allowed("/a/b", t)
    # plain-prefix behavior byte-identical to the pre-wildcard kernel
    p = [(False, "/private"), (True, "/private/ok")]
    assert robots_allowed("/private/ok/1", p)
    assert not robots_allowed("/private/2", p)


def test_wildcard_rules_through_engine_udf(spark):
    """The pandas-UDF path (apply_robots_filter) uses the same kernel:
    wildcard verdicts survive parse → broadcast join → UDF."""
    from shaman_scraping_spark.operators.politeness import (
        apply_robots_filter, build_host_state,
    )
    from shaman_scraping_spark.functions.url import with_url_columns

    body = b"User-agent: *\nDisallow: /*.pdf$\nAllow: /docs/\n"
    pages = spark.createDataFrame(
        [("http://w.example/robots.txt", body)], "url string, html binary"
    )
    pages = with_url_columns(pages)
    hosts = spark.createDataFrame([("w.example",)], "host string")
    hs = build_host_state(pages, hosts)
    frontier = with_url_columns(spark.createDataFrame(
        [("http://w.example/x/file.pdf",),
         ("http://w.example/docs/a.pdf",),
         ("http://w.example/docs/a.html",)], "url string",
    ))
    got = {
        r["url_canon"]: r["allowed"]
        for r in apply_robots_filter(frontier, hs).collect()
    }
    assert got["http://w.example/x/file.pdf"] is False
    assert got["http://w.example/docs/a.pdf"] is False   # len 8 > len 6
    assert got["http://w.example/docs/a.html"] is True


def test_agent_group_e2e(spark, agent_corpus, tmp_path_factory):
    cfg = CrawlConfig(seeds=tuple(agent_corpus.seeds), max_waves=4,
                      user_agent="shaman-spark")
    sim = simulate(agent_corpus, cfg)
    corpus_dir = tmp_path_factory.mktemp("agent_corpus")
    agent_corpus.write(corpus_dir)
    state = tmp_path_factory.mktemp("agent_state")
    eng = CrawlEngine(spark, cfg, str(corpus_dir / "pages.parquet"),
                      str(state), record_emission=True)
    eng.run()
    got = sorted(
        (r["wave"], r["emit_rank"], r["url"], r["depth"], r["host"])
        for r in eng.io.load("emission").collect()
    )
    assert got == sorted(sim.emissions)
    seen = {r["url_canon"] for r in eng.io.load("seen").collect()}
    assert seen == sim.seen
    fetched = {r["url_canon"] for r in eng.io.load("fetched").collect()}
    # the shaman group (not `*`, which disallows EVERYTHING on host a)
    # governed: root + /public crawled, /secret blocked
    assert "http://a.example/" in fetched
    assert "http://a.example/public/1" in fetched
    assert "http://a.example/public/2" in fetched
    assert "http://a.example/secret/1" not in fetched
    # `*` still governs host b
    assert "http://b.example/open/1" in fetched
    assert "http://b.example/hidden/1" not in fetched


def test_wildcard_robots_e2e(spark, tmp_path_factory):
    """Engine ≡ sequential oracle on a corpus whose robots carry an
    RFC 9309 wildcard rule (`Disallow: /p/*3$`): wildcard-blocked
    pages are seen-but-never-fetched, parity is exact."""
    from shaman_scraping_spark.corpus.generator import (
        CorpusSpec, generate_corpus,
    )
    from shaman_scraping_spark.corpus.simulator import simulate

    corpus = generate_corpus(
        CorpusSpec(n_hosts=4, n_pages=80, crawl_delays=(0,),
                   private_frac=1.0, wildcard_robots=True)
    )
    assert any(
        any(p == "/p/*3$" for _a, p in rules)
        for rules, _d in corpus.robots.values()
    )
    d = tmp_path_factory.mktemp("wc_corpus")
    corpus.write(d)
    cfg = CrawlConfig(seeds=tuple(corpus.seeds), max_waves=6)
    sim = simulate(corpus, cfg)
    state = tmp_path_factory.mktemp("wc_state")
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
    blocked = {
        u for u in seen
        if u.split(".example", 1)[1].endswith("3")
        and "/p/" in u and "?" not in u
    }
    assert blocked, "no wildcard-blocked URL was ever discovered"
    assert not (blocked & fetched)
    eng.close()
