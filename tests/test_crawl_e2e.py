"""End-to-end crawl equality: Spark CrawlEngine vs sequential oracle.

This is the BASELINE.json gate — "matching the reference's crawl
ordering and URL-seen set under the same seed list + politeness
budget" — with corpus/simulator.py standing in for the reference's
single-threaded scheduler (checkout empty, SURVEY.md §0).

Asserts, over a multi-host zipf corpus with robots rules, crawl
delays {0,1,5}, redirects and variant-spelled links:
  * full emission log equality (wave, emit_rank, url, depth, host)
  * URL-seen set equality after the final wave
  * per-host per-wave quota/emitted equality (token-bucket math)
  * per-wave lineage totals (urls_emitted, bytes_fetched)
  * resume fidelity: 3 waves + kill + resume == uninterrupted run
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shaman_scraping_spark.config import CrawlConfig
from shaman_scraping_spark.corpus.simulator import simulate
from shaman_scraping_spark.plans.engine import CrawlEngine

WAVES = 6


@pytest.fixture(scope="module")
def config(tiny_corpus):
    return CrawlConfig(
        seeds=tuple(tiny_corpus.seeds),
        max_waves=WAVES,
        wave_seconds=10.0,
        bucket_cap=100.0,
        max_depth=16,
    )


@pytest.fixture(scope="module")
def sim(tiny_corpus, config):
    return simulate(tiny_corpus, config)


@pytest.fixture(scope="module")
def engine_run(spark, tiny_corpus_dir, config, tmp_path_factory):
    state = tmp_path_factory.mktemp("crawl_state")
    eng = CrawlEngine(
        spark, config, str(tiny_corpus_dir / "pages.parquet"), str(state), record_emission=True)
    eng.run()
    return eng


def _engine_emissions(eng):
    df = eng.io.load("emission")
    return sorted(
        (r["wave"], r["emit_rank"], r["url"], r["depth"], r["host"])
        for r in df.collect()
    )


def test_emission_log_equality(engine_run, sim):
    got = _engine_emissions(engine_run)
    want = sorted(sim.emissions)
    assert len(got) == len(want)
    assert got == want


def test_seen_set_equality(engine_run, sim):
    final = engine_run.io.load("seen")
    got = {r["url_canon"] for r in final.collect()}
    assert got == sim.seen


def test_quota_log_equality(engine_run, sim):
    df = engine_run.io.load("quota_log")
    got = sorted(
        (r["host"], r["wave"], r["quota"], r["emitted"]) for r in df.collect()
    )
    want = sorted(sim.quota_log)
    assert got == want


def test_lineage_totals(engine_run, sim):
    df = (
        engine_run.io.load("lineage")
        .groupBy("wave")
        .agg(
            F.sum("urls_emitted").alias("u"), F.sum("bytes_fetched").alias("b")
        )
    )
    got = sorted((r["wave"], r["u"], r["b"]) for r in df.collect())
    want = sorted((w, u, b) for (w, u, b) in sim.wave_totals if u > 0)
    got = [t for t in got if t[1] > 0]
    assert got == want


def test_fetch_statuses(engine_run, sim):
    df = engine_run.io.load("fetched")
    got = sorted(
        (r["url_canon"], r["wave"], r["status"]) for r in df.collect()
    )
    want = sorted(sim.fetched)
    assert got == want


def test_robots_respected(engine_run, tiny_corpus):
    """No disallowed URL was ever fetched (op 18 end-to-end)."""
    from shaman_scraping_spark.operators.politeness import (
        robots_allowed, url_path_of,
    )

    fetched = engine_run.io.load("fetched").select("url_canon", "host").collect()
    for r in fetched:
        rules, _ = tiny_corpus.robots.get(r["host"], ([], 0.0))
        assert robots_allowed(url_path_of(r["url_canon"]), rules), r


def test_bloom_prefilter_identical_results(
    spark, tiny_corpus_dir, config, sim, tmp_path_factory
):
    """Op 12 integration: the flag-gated bloom prefilter must not change
    any output (no false negatives; positives re-check exactly)."""
    state = tmp_path_factory.mktemp("crawl_state_bloom")
    cfg = CrawlConfig(**{
        **config.__dict__, "seen_prefilter": "bloom",
        "bloom_bits": 1 << 18, "fetch_join": "broadcast",
    })
    eng = CrawlEngine(
        spark, cfg, str(tiny_corpus_dir / "pages.parquet"), str(state), record_emission=True)
    eng.run()
    assert _engine_emissions(eng) == sorted(sim.emissions)
    got = {r["url_canon"] for r in eng.io.load("seen").collect()}
    assert got == sim.seen


def test_snapshot_state_layout_identical_results(
    spark, tiny_corpus_dir, config, sim, tmp_path_factory
):
    """VERDICT r2 item 4 twin gate: the snapshot state layout (full
    frontier/host_state rewrite per wave) and the default delta layout
    (append additions/changed-hosts, closed-form lazy refill,
    compaction) must produce byte-identical emission logs, seen sets
    and quota logs — layout is a physical choice only."""
    state = tmp_path_factory.mktemp("crawl_state_snap")
    cfg = CrawlConfig(**{**config.__dict__, "state_layout": "snapshot"})
    eng = CrawlEngine(
        spark, cfg, str(tiny_corpus_dir / "pages.parquet"), str(state), record_emission=True)
    eng.run()
    assert _engine_emissions(eng) == sorted(sim.emissions)
    got = {r["url_canon"] for r in eng.io.load("seen").collect()}
    assert got == sim.seen
    quota = sorted(
        (r["host"], r["wave"], r["quota"], r["emitted"])
        for r in eng.io.load("quota_log").collect()
    )
    assert quota == sorted(sim.quota_log)


def test_delta_layout_compacts_state_tables(
    spark, tiny_corpus_dir, config, sim, tmp_path_factory
):
    """With compact_every=2 over a 6-wave crawl the frontier /
    host_state / seen append chains stay bounded (≤ compact_every
    dirs beyond the last rewrite) and results are unchanged."""
    state = tmp_path_factory.mktemp("crawl_state_compact")
    cfg = CrawlConfig(**{**config.__dict__, "compact_every": 2})
    eng = CrawlEngine(
        spark, cfg, str(tiny_corpus_dir / "pages.parquet"), str(state), record_emission=True)
    eng.run()
    assert _engine_emissions(eng) == sorted(sim.emissions)
    for table in ("frontier", "host_state", "seen"):
        dirs = eng.io.read_manifest(table)["data_dirs"]
        assert len(dirs) <= cfg.compact_every + 1, (table, dirs)


def test_composed_bucketed_pruned_fetch_join_identical_results(
    spark, tiny_corpus_dir, config, sim, tmp_path_factory
):
    """VERDICT r2 item 2 e2e gate: the composed corpus layout
    (bucketed SMJ fetch join + pbucket partition pruning) must produce
    the identical emission log and seen set as the broadcast default —
    layout is a physical choice, never a semantic one."""
    state = tmp_path_factory.mktemp("crawl_state_composed")
    cfg = CrawlConfig(**{
        **config.__dict__, "fetch_join": "bucketed",
        "fetch_join_buckets": 8, "corpus_buckets": 8,
    })
    eng = CrawlEngine(
        spark, cfg, str(tiny_corpus_dir / "pages.parquet"), str(state), record_emission=True)
    eng.run()
    assert _engine_emissions(eng) == sorted(sim.emissions)
    got = {r["url_canon"] for r in eng.io.load("seen").collect()}
    assert got == sim.seen
    fetched = sorted(
        (r["url_canon"], r["wave"], r["status"])
        for r in eng.io.load("fetched").collect()
    )
    assert fetched == sorted(sim.fetched)


def test_cuckoo_prefilter_identical_results(
    spark, tiny_corpus_dir, config, sim, tmp_path_factory
):
    """The PRIMARY seen-set structure (BASELINE.json north_star): the
    partitioned cuckoo filter, updated incrementally per wave, must not
    change any output (no false negatives; positives re-check exactly).
    Small bucket count forces real occupancy + the pow-2 rounding path."""
    state = tmp_path_factory.mktemp("crawl_state_cuckoo")
    cfg = CrawlConfig(**{
        **config.__dict__, "seen_prefilter": "cuckoo",
        "cuckoo_shards": 4, "cuckoo_buckets": 1000,  # rounds to 1024
    })
    eng = CrawlEngine(
        spark, cfg, str(tiny_corpus_dir / "pages.parquet"), str(state), record_emission=True)
    eng.run()
    assert _engine_emissions(eng) == sorted(sim.emissions)
    got = {r["url_canon"] for r in eng.io.load("seen").collect()}
    assert got == sim.seen
    # shards were committed + carried across waves (incremental update)
    assert eng.io.read_manifest("cuckoo") is not None


def test_resume_fidelity(spark, tiny_corpus_dir, config, sim, tmp_path_factory):
    """Kill after wave 2, resume → identical emission log + seen set."""
    state = tmp_path_factory.mktemp("crawl_state_resume")
    short = CrawlConfig(**{**config.__dict__, "max_waves": 3})
    eng1 = CrawlEngine(
        spark, short, str(tiny_corpus_dir / "pages.parquet"), str(state), record_emission=True)
    eng1.run()
    assert eng1.last_complete_wave() == 2
    eng2 = CrawlEngine(
        spark, config, str(tiny_corpus_dir / "pages.parquet"), str(state), record_emission=True)
    eng2.run(resume=True)
    got = _engine_emissions(eng2)
    assert got == sorted(sim.emissions)
    final = {r["url_canon"] for r in eng2.io.load("seen").collect()}
    assert final == sim.seen
