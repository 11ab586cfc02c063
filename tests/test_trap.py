"""Op 54: crawl-trap guard / URL pattern mining (config.py spec) —
engine ≡ sequential-oracle twins.

template(url) = path+query with digit runs collapsed to '#'; once a
(host, template) family accumulates trap_threshold first-attempt
fetches, later frontier rows matching it are dropped permanently and
marked seen (like robots-blocked rows).  The generator's /p/{j} and
/p/{j}?id={j}&ref=tree URL families collapse to two hot templates per
host, so a small threshold fires the guard on every host.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shaman_scraping_spark.config import CrawlConfig
from shaman_scraping_spark.corpus.generator import CorpusSpec, generate_corpus
from shaman_scraping_spark.corpus.simulator import simulate
from shaman_scraping_spark.functions.url import url_template, url_template_of
from shaman_scraping_spark.plans.engine import CrawlEngine

SPEC = CorpusSpec(n_hosts=6, n_pages=260, seed=11, crawl_delays=(0, 1),
                  branching=4)


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(SPEC)


@pytest.fixture(scope="module")
def corpus_dir(corpus, tmp_path_factory):
    out = tmp_path_factory.mktemp("trap_corpus")
    corpus.write(out)
    return out


def _cfg(corpus, **kw):
    base = dict(seeds=tuple(corpus.seeds), max_waves=12, max_depth=16,
                wave_seconds=10.0, bucket_cap=100.0, trap_threshold=4)
    base.update(kw)
    return CrawlConfig(**base)


def _run(spark, corpus_dir, cfg, tmp_path_factory, tag):
    state = tmp_path_factory.mktemp(f"trap_state_{tag}")
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


def test_template_native_twin(spark, corpus):
    """url_template (Catalyst) ≡ url_template_of (Python) byte-for-byte
    over every canonical corpus URL plus adversarial literals."""
    from shaman_scraping_spark.functions.url import canonicalize_url_py
    urls = sorted({
        c for c in (canonicalize_url_py(r[0]) for r in corpus.rows)
        if c is not None
    })
    urls += [
        "http://h.example/",
        "http://h.example/a1b22c333",
        "http://h.example:8080/p/7?id=7&x=9y9",
        "http://h.example/p/1?next=http://other.example/p/2",
        "http://h.example/no-digits?q=v",
        "http://h.example/2024/01/31?session=deadbeef99",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url_canon"])
    got = {
        r["url_canon"]: r["tpl"]
        for r in df.withColumn(
            "tpl", url_template(F.col("url_canon"))).collect()
    }
    for u in urls:
        assert got[u] == url_template_of(u), u
    # the collapse genuinely merges a numbered family
    assert url_template_of("http://h/p/17?id=17") == \
        url_template_of("http://h/p/90210?id=90210") == "/p/#?id=#"


def test_trap_twin_e2e(spark, corpus, corpus_dir, tmp_path_factory):
    """Trap guard on: emission log, fetched multiset and seen set all
    equal the sequential oracle's, and the guard demonstrably fired
    (fewer fetches than an unguarded run; trapped URLs are seen but
    never fetched)."""
    cfg = _cfg(corpus)
    sim = simulate(corpus, cfg)
    eng = _run(spark, corpus_dir, cfg, tmp_path_factory, "twin")

    got_f = _fetched(eng)
    assert got_f == sorted(sim.fetched)
    assert _emissions(eng) == sorted(sim.emissions)
    seen = {r["url_canon"] for r in eng.io.load("seen").collect()}
    assert seen == sim.seen

    # the guard fired: strictly fewer fetches than the unguarded run
    base = simulate(corpus, _cfg(corpus, trap_threshold=0))
    assert len(sim.fetched) < len(base.fetched)
    # trapped-but-seen URLs exist, and every one matches a template
    # that reached the threshold among fetched first attempts
    fetched_urls = {u for u, _w, _s in got_f}
    trapped = seen - fetched_urls - {
        u for u in seen if u.endswith("/robots.txt")
    }
    by_tpl: dict = {}
    for u in fetched_urls:
        k = (u.split("/")[2], url_template_of(u))
        by_tpl[k] = by_tpl.get(k, 0) + 1
    hot = {k for k, v in by_tpl.items() if v >= cfg.trap_threshold}
    trapped_hot = [
        u for u in trapped
        if (u.split("/")[2], url_template_of(u)) in hot
    ]
    assert trapped_hot, "no URL was trapped by a hot template"

    # trap_counts table: cumulative first-attempt counts per family
    tc = eng.io.load("trap_counts")
    assert tc is not None
    agg = {
        (r["host"], r["template"]): r["tot"]
        for r in tc.groupBy("host", "template")
        .agg(F.sum("n").alias("tot")).collect()
    }
    assert agg == by_tpl  # engine counts ≡ recount from fetched urls


def test_trap_with_retries_twin(spark, corpus, corpus_dir,
                                tmp_path_factory):
    """Ops 52 + 54 compose: retries bypass the gate but their first
    attempt counted; full fetched/dead/emission equality holds."""
    cfg = _cfg(corpus, flaky_permille=250, flaky_fail_attempts=2,
               max_retries=3, max_waves=14)
    sim = simulate(corpus, cfg)
    eng = _run(spark, corpus_dir, cfg, tmp_path_factory, "retry")
    assert _fetched(eng) == sorted(sim.fetched)
    assert _emissions(eng) == sorted(sim.emissions)
    assert sorted(
        (r["url_canon"], r["host"], r["depth"], r["attempt"], r["wave"])
        for r in (eng.io.load("dead") or
                  spark.createDataFrame([], "url_canon string")).collect()
    ) == sorted(sim.dead)
    # at least one 503 retry completed on a host with active traps —
    # the bypass path was exercised
    f = _fetched(eng)
    retried = {u for u, _w, s in f if s == 503}
    assert retried & {u for u, _w, s in f if s in (200, 302)}


def test_trap_resume_fidelity(spark, corpus, corpus_dir,
                              tmp_path_factory):
    """Kill mid-crawl (trap counts partially accumulated), resume →
    identical results vs the uninterrupted oracle run: the trap_counts
    chain reconstructs the guard exactly."""
    cfg = _cfg(corpus)
    sim = simulate(corpus, cfg)
    state = tmp_path_factory.mktemp("trap_state_resume")
    short = CrawlConfig(**{**cfg.__dict__, "max_waves": 3})
    eng1 = CrawlEngine(spark, short, str(corpus_dir / "pages.parquet"),
                       str(state), record_emission=True)
    eng1.run()
    eng2 = CrawlEngine(spark, cfg, str(corpus_dir / "pages.parquet"),
                       str(state), record_emission=True)
    eng2.run(resume=True)
    assert _emissions(eng2) == sorted(sim.emissions)
    assert _fetched(eng2) == sorted(sim.fetched)
    seen = {r["url_canon"] for r in eng2.io.load("seen").collect()}
    assert seen == sim.seen


def test_trap_gate_plan_broadcasts(spark, corpus, corpus_dir,
                                   tmp_path_factory):
    """100-TB shape: the hot-family dim broadcasts into the gate — the
    frontier side takes NO exchange for trap detection."""
    cfg = _cfg(corpus, max_waves=4)
    eng = _run(spark, corpus_dir, cfg, tmp_path_factory, "plan")
    dim = eng._load_trap_dim(eng.last_complete_wave() + 1)
    assert dim is not None
    frontier = eng.io.load("frontier")
    assert frontier is not None and "host" in frontier.columns
    marked = frontier.withColumn(
        "__tpl", url_template(F.col("url_canon"))
    ).join(
        F.broadcast(dim.withColumnRenamed("template", "__tpl")
                    .withColumn("__trap", F.lit(True))),
        ["host", "__tpl"], "left",
    )
    plan = marked._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the streamed (frontier) side must not shuffle for the gate
    assert "Exchange hashpartitioning" not in plan.split(
        "BroadcastHashJoin")[0]


def test_trap_off_leaves_no_trace(spark, tmp_path_factory):
    """Default config: no trap_counts table, no gate in the plan."""
    corpus = generate_corpus(CorpusSpec(n_hosts=3, n_pages=40, seed=5))
    cdir = tmp_path_factory.mktemp("trap_off_corpus")
    corpus.write(cdir)
    cfg = CrawlConfig(seeds=tuple(corpus.seeds), max_waves=4)
    state = tmp_path_factory.mktemp("trap_state_off")
    eng = CrawlEngine(spark, cfg, str(cdir / "pages.parquet"),
                      str(state), record_emission=False)
    eng.run()
    assert eng.io.load("trap_counts") is None


def test_trap_toggle_guard(spark, corpus, corpus_dir, tmp_path_factory):
    """Resuming under a different trap_threshold is refused — the
    remaining waves would fetch a different URL set."""
    cfg = _cfg(corpus, max_waves=2)
    state = tmp_path_factory.mktemp("trap_state_guard")
    eng = CrawlEngine(spark, cfg, str(corpus_dir / "pages.parquet"),
                      str(state))
    eng.run()
    for bad in (0, cfg.trap_threshold + 1):
        off = CrawlConfig(**{**cfg.__dict__, "trap_threshold": bad})
        with pytest.raises(ValueError, match="trap_threshold"):
            CrawlEngine(spark, off, str(corpus_dir / "pages.parquet"),
                        str(state))
