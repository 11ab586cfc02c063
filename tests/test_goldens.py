"""Committed-golden drift gate (FIXTURES.md §B.4): the Spark engine's
crawl must match the goldens produced by tools/make_goldens.py (tiny
corpus, seed 42, pinned config).  Unlike test_crawl_e2e (engine vs
live simulator), these fixtures are static files — a behavioral change
in generator, simulator, AND engine together still trips this."""

from __future__ import annotations

from pathlib import Path

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from shaman_scraping_spark.plans.engine import CrawlEngine

GOLDENS = Path(__file__).parent / "goldens"


@pytest.fixture(scope="module")
def engine_run(spark, tiny_corpus, tiny_corpus_dir, tmp_path_factory):
    import sys

    sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))
    from make_goldens import golden_config

    state = tmp_path_factory.mktemp("golden_state")
    eng = CrawlEngine(
        spark, golden_config(tiny_corpus),
        str(tiny_corpus_dir / "pages.parquet"), str(state), record_emission=True)
    eng.run()
    return eng


def test_emission_matches_golden(engine_run):
    want = pq.read_table(GOLDENS / "golden_emission.parquet").to_pylist()
    got = [
        {"wave": r["wave"], "emit_rank": r["emit_rank"], "url": r["url"],
         "depth": r["depth"], "host": r["host"]}
        for r in engine_run.io.load("emission").collect()
    ]
    key = lambda d: (d["wave"], d["emit_rank"])  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key)


def test_seen_matches_golden(engine_run):
    want = set(
        pq.read_table(GOLDENS / "golden_seen.parquet")
        .column("url_canon").to_pylist()
    )
    got = {r["url_canon"] for r in engine_run.io.load("seen").collect()}
    assert got == want


def test_quota_matches_golden(engine_run):
    want = sorted(
        map(tuple, (
            (d["host"], d["wave"], d["quota"], d["emitted"])
            for d in pq.read_table(
                GOLDENS / "golden_quota.parquet"
            ).to_pylist()
        ))
    )
    got = sorted(
        (r["host"], r["wave"], r["quota"], r["emitted"])
        for r in engine_run.io.load("quota_log").collect()
    )
    assert got == want


def test_wave_totals_match_golden(engine_run):
    want = {
        d["wave"]: (d["urls_emitted"], d["bytes_fetched"])
        for d in pq.read_table(
            GOLDENS / "golden_wave_totals.parquet"
        ).to_pylist()
        if d["urls_emitted"] > 0
    }
    got = {
        r["wave"]: (r["u"], r["b"])
        for r in engine_run.io.load("lineage").groupBy("wave").agg(
            F.sum("urls_emitted").alias("u"),
            F.sum("bytes_fetched").alias("b"),
        ).collect()
        if r["u"] > 0
    }
    assert got == want
