"""Op 52: deterministic retry with exponential backoff (config.py
spec) — engine ≡ sequential-oracle twins.

A url_canon is flaky iff pmod(xxhash64(url_canon), 1000) <
flaky_permille; flaky URLs 503 on attempts 0..flaky_fail_attempts-1.
503s consume quota, carry no body/links, and re-enter the frontier at
wave + 2^(attempt-1); past max_retries they dead-letter.  The
simulator implements the identical rule through the XXH64 twin, so
full emission-log / fetched / seen / dead equality is the oracle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shaman_scraping_spark.config import CrawlConfig
from shaman_scraping_spark.corpus.generator import CorpusSpec, generate_corpus
from shaman_scraping_spark.corpus.simulator import simulate
from shaman_scraping_spark.functions.hashing import xxh64
from shaman_scraping_spark.plans.engine import CrawlEngine

SPEC = CorpusSpec(n_hosts=6, n_pages=260, seed=11, crawl_delays=(0, 1),
                  branching=4)


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(SPEC)


@pytest.fixture(scope="module")
def corpus_dir(corpus, tmp_path_factory):
    out = tmp_path_factory.mktemp("retry_corpus")
    corpus.write(out)
    return out


def _cfg(corpus, **kw):
    base = dict(seeds=tuple(corpus.seeds), max_waves=14, max_depth=16,
                wave_seconds=10.0, bucket_cap=100.0,
                flaky_permille=250, flaky_fail_attempts=2, max_retries=3)
    base.update(kw)
    return CrawlConfig(**base)


def _run(spark, corpus_dir, cfg, tmp_path_factory, tag):
    state = tmp_path_factory.mktemp(f"retry_state_{tag}")
    eng = CrawlEngine(spark, cfg, str(corpus_dir / "pages.parquet"),
                      str(state), record_emission=True)
    eng.run()
    return eng


def _fetched(eng):
    return sorted(
        (r["url_canon"], r["wave"], r["status"])
        for r in eng.io.load("fetched").select(
            "url_canon", "wave", "status").collect()
    )


def _emissions(eng):
    return sorted(
        (r["wave"], r["emit_rank"], r["url"], r["depth"], r["host"])
        for r in eng.io.load("emission").collect()
    )


def _dead(eng):
    df = eng.io.load("dead")
    if df is None:
        return []
    return sorted(
        (r["url_canon"], r["host"], r["depth"], r["attempt"], r["wave"])
        for r in df.collect()
    )


def test_retry_twin_e2e(spark, corpus, corpus_dir, tmp_path_factory):
    """Flaky URLs 503 twice then succeed within max_retries: the full
    emission log, fetched multiset (incl. 503 rows), seen set and
    (empty) dead set all equal the sequential oracle's."""
    cfg = _cfg(corpus)
    sim = simulate(corpus, cfg)
    eng = _run(spark, corpus_dir, cfg, tmp_path_factory, "twin")

    got_f = _fetched(eng)
    assert got_f == sorted(sim.fetched)
    assert _emissions(eng) == sorted(sim.emissions)
    seen = {r["url_canon"] for r in eng.io.load("seen").collect()}
    assert seen == sim.seen
    assert _dead(eng) == sorted(sim.dead) == []

    # the corpus genuinely exercised the path: some URL 503'd exactly
    # flaky_fail_attempts times and then succeeded
    by_url: dict = {}
    for u, w, s in got_f:
        by_url.setdefault(u, []).append((w, s))
    flaky_urls = [u for u in by_url
                  if xxh64(u.encode()) % 1000 < cfg.flaky_permille]
    assert flaky_urls
    recovered = 0
    for u in flaky_urls:
        rows = sorted(by_url[u])
        statuses = [s for _w, s in rows]
        if statuses[:2] == [503, 503] and len(statuses) == 3:
            assert statuses[2] in (200, 302)
            # backoff spacing: retry 1 at +1 wave, retry 2 at +2 more
            waves = [w for w, _s in rows]
            assert waves[1] >= waves[0] + 1 and waves[2] >= waves[1] + 2
            recovered += 1
    assert recovered > 0
    # no flaky URL was fetched-successful without paying its failures
    for u in flaky_urls:
        statuses = [s for _w, s in sorted(by_url[u])]
        if 200 in statuses or 302 in statuses:
            assert statuses.count(503) == cfg.flaky_fail_attempts

    # seen-set hygiene: retries did not duplicate membership rows
    seen_rows = eng.io.load("seen").count()
    assert seen_rows == len(seen)


def test_retry_dead_letter_twin(spark, corpus, corpus_dir,
                                tmp_path_factory):
    """fail_attempts > 1 + max_retries: flaky URLs exhaust their
    budget and dead-letter identically in engine and oracle — and are
    never fetched successfully."""
    cfg = _cfg(corpus, flaky_fail_attempts=5, max_retries=2)
    sim = simulate(corpus, cfg)
    eng = _run(spark, corpus_dir, cfg, tmp_path_factory, "dead")

    got_dead = _dead(eng)
    assert got_dead == sorted(sim.dead)
    assert got_dead, "corpus must exercise the dead-letter path"
    got_f = _fetched(eng)
    assert got_f == sorted(sim.fetched)
    dead_urls = {u for u, *_ in got_dead}
    for u, _w, s in got_f:
        if u in dead_urls:
            assert s == 503
    # each dead URL burned exactly 1 + max_retries attempts
    from collections import Counter
    per_url = Counter(u for u, _w, s in got_f if u in dead_urls)
    assert set(per_url.values()) == {1 + cfg.max_retries}


def test_retry_resume_fidelity(spark, corpus, corpus_dir,
                               tmp_path_factory):
    """Kill mid-crawl (pending retries in flight), resume → identical
    emission log / fetched / dead vs the uninterrupted oracle run —
    the marker's retry_due ledger survives the restart."""
    cfg = _cfg(corpus)
    sim = simulate(corpus, cfg)
    state = tmp_path_factory.mktemp("retry_state_resume")
    short = CrawlConfig(**{**cfg.__dict__, "max_waves": 3})
    eng1 = CrawlEngine(spark, short, str(corpus_dir / "pages.parquet"),
                       str(state), record_emission=True)
    eng1.run()
    assert eng1.last_complete_wave() == 2
    eng2 = CrawlEngine(spark, cfg, str(corpus_dir / "pages.parquet"),
                       str(state), record_emission=True)
    eng2.run(resume=True)
    assert _emissions(eng2) == sorted(sim.emissions)
    assert _fetched(eng2) == sorted(sim.fetched)
    assert _dead(eng2) == sorted(sim.dead)
    seen = {r["url_canon"] for r in eng2.io.load("seen").collect()}
    assert seen == sim.seen


def test_retry_off_leaves_no_trace(spark, tmp_path_factory):
    """Default config: no retries/dead tables, no attempt column, no
    503 branch — the op-52 machinery is absent, not merely idle."""
    corpus = generate_corpus(CorpusSpec(n_hosts=3, n_pages=40, seed=5))
    cdir = tmp_path_factory.mktemp("retry_off_corpus")
    corpus.write(cdir)
    cfg = CrawlConfig(seeds=tuple(corpus.seeds), max_waves=4)
    eng = _run_dir(spark, cdir, cfg, tmp_path_factory)
    assert eng.io.load("retries") is None
    assert eng.io.load("dead") is None
    fetched = eng.io.load("fetched")
    assert "attempt" not in fetched.columns
    assert {r["status"] for r in
            fetched.select("status").distinct().collect()} <= {200, 302, 404}


def _run_dir(spark, cdir, cfg, tmp_path_factory):
    state = tmp_path_factory.mktemp("retry_state_off")
    eng = CrawlEngine(spark, cfg, str(cdir / "pages.parquet"),
                      str(state), record_emission=False)
    eng.run()
    return eng


def test_retry_layout_toggle_guard(spark, corpus, corpus_dir,
                                   tmp_path_factory):
    """Resuming a retry-enabled state dir with retries off (or vice
    versa) is refused — toggling would change the fetched schema and
    orphan pending retries."""
    cfg = _cfg(corpus, max_waves=2)
    state = tmp_path_factory.mktemp("retry_state_guard")
    eng = CrawlEngine(spark, cfg, str(corpus_dir / "pages.parquet"),
                      str(state))
    eng.run()
    off = CrawlConfig(**{**cfg.__dict__, "flaky_permille": 0})
    with pytest.raises(ValueError, match="retry_enabled"):
        CrawlEngine(spark, off, str(corpus_dir / "pages.parquet"),
                    str(state))
