"""Round-4 regression gates: ADVICE r3 fixes + VERDICT r3 items 3/4/8.

Covers: pure-Python XXH64 ≡ Spark xxhash64 (the simulator's corpus-
dedup tiebreak twin), engine≡simulator winner on (warc_ts, url)-tied
captures with differing html, Iceberg manifest bookkeeping without the
jar, non-local path guards, stale corpus_join GC, session-conf restore
on close(), and the emission log being opt-in.
"""

from __future__ import annotations

import json
import random
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from shaman_scraping_spark.config import CrawlConfig
from shaman_scraping_spark.functions.hashing import xxh64
from shaman_scraping_spark.io.tableio import TableIO
from shaman_scraping_spark.plans.engine import (
    CrawlEngine, load_canonical_corpus, local_path,
)

T0 = datetime(2024, 6, 1, tzinfo=timezone.utc)


# --- XXH64 twin (ADVICE r3: simulator tiebreak) -----------------------------

def test_xxh64_matches_spark_xxhash64(spark):
    rng = random.Random(7)
    data = [
        bytes(rng.randrange(256) for _ in range(n))
        for n in list(range(0, 40)) + [63, 64, 65, 255, 1024, 4097]
    ]
    df = spark.createDataFrame([(d,) for d in data], "b binary")
    got = [r[0] for r in df.select(F.xxhash64("b")).collect()]
    assert got == [xxh64(d) for d in data]


def test_tied_capture_dedup_matches_engine_rule(spark, tmp_path):
    """Two captures share (warc_ts, url) but differ in html: the
    corpus loader and the simulator's by_canon must pick the SAME
    winner — min xxhash64(html) (ADVICE r3)."""
    h1 = b"<html><body><p>alpha</p></body></html>"
    h2 = b"<html><body><p>beta</p></body></html>"
    rows = [
        ("http://t.example/p", T0, h1, "alpha", "en"),
        ("http://t.example/p", T0, h2, "beta", "en"),
    ]
    spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, "
              "text string, lang string"
    ).coalesce(1).write.parquet(str(tmp_path / "pages.parquet"))
    pages = load_canonical_corpus(spark, str(tmp_path / "pages.parquet"))
    got = pages.filter(F.col("url_canon") == "http://t.example/p") \
        .select("html").collect()
    assert len(got) == 1
    want = min((h1, h2), key=lambda b: xxh64(b))
    assert bytes(got[0]["html"]) == want


# --- Iceberg bookkeeping without the jar (VERDICT r3 item 8) ----------------

def test_iceberg_manifest_bookkeeping_pure():
    m = TableIO._iceberg_manifest_obj(
        "fetched", 3, "append", snap=111, parent=110,
        summary={"added-records": "42", "total-records": "99"},
    )
    assert m["num_rows"] == 42
    assert m["iceberg_snapshot_id"] == 111
    assert m["iceberg_parent_snapshot_id"] == 110
    m0 = TableIO._iceberg_manifest_obj(
        "frontier", 0, "snapshot", snap=7, parent=None,
        summary={"total-records": "5"},
    )
    assert m0["num_rows"] == 5 and m0["iceberg_parent_snapshot_id"] is None
    # absent/empty summary keys → 0, never a crash
    assert TableIO._iceberg_manifest_obj(
        "t", 0, "append", 1, None, {}
    )["num_rows"] == 0


def test_iceberg_delta_read_options_first_commit():
    """ADVICE r3 (medium): end-snapshot-id without start-snapshot-id is
    rejected by Iceberg — the first commit (parent None) must read the
    snapshot in full instead."""
    assert TableIO._delta_read_options(5, None) == {"snapshot-id": 5}
    assert TableIO._delta_read_options(6, 5) == {
        "start-snapshot-id": 5, "end-snapshot-id": 6,
    }


# --- non-local path guard (ADVICE r3) ---------------------------------------

def test_local_path_scheme_detection(tmp_path):
    assert local_path(str(tmp_path)) == tmp_path
    assert local_path("s3://bucket/prefix/pages") is None
    assert local_path("hdfs://nn:8020/data") is None
    assert local_path("abfss://c@acct.dfs.core.windows.net/x") is None
    # file:// is local; relative paths are local
    assert local_path("file:///x/y") is not None
    assert local_path("relative/dir") is not None
    # a Windows-free world: single-letter scheme-lookalikes stay local
    assert local_path("weird:notascheme") is not None


# --- conf restore on close (VERDICT r3 item 4) ------------------------------

def test_engine_close_restores_session_confs(spark, tiny_corpus_dir,
                                             tmp_path):
    prior_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    prior_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    prior_bucket = spark.conf.get(
        "spark.sql.legacy.bucketedTableScan.outputOrdering")
    cfg = CrawlConfig(
        seeds=("http://host00.example/",), max_waves=1,
        shuffle_partitions=3, pages_partitions=2,
        fetch_join="bucketed", fetch_join_buckets=4,
    )
    eng = CrawlEngine(spark, cfg, str(tiny_corpus_dir / "pages.parquet"),
                      str(tmp_path / "state"))
    # engine mutated all three
    assert spark.conf.get("spark.sql.shuffle.partitions") == "3"
    assert spark.conf.get(
        "spark.sql.legacy.bucketedTableScan.outputOrdering") == "true"
    eng.close()
    assert spark.conf.get("spark.sql.shuffle.partitions") == prior_shuffle
    assert spark.conf.get("spark.sql.files.maxPartitionBytes") == prior_mpb
    assert spark.conf.get(
        "spark.sql.legacy.bucketedTableScan.outputOrdering") == prior_bucket


# --- stale corpus_join GC (ADVICE r3) ---------------------------------------

def test_stale_corpus_join_layouts_are_garbage_collected(
    spark, tiny_corpus_dir, tmp_path
):
    import os

    cache = tmp_path / "cache"
    cache.mkdir()
    pages = str(tiny_corpus_dir / "pages.parquet")
    cfg = CrawlConfig(seeds=("http://host00.example/",), max_waves=1,
                      fetch_join="bucketed", fetch_join_buckets=4,
                      corpus_cache_dir=str(cache))
    eng1 = CrawlEngine(spark, cfg, pages, str(tmp_path / "s1"))
    eng1.close()
    first = [d.name for d in cache.glob("corpus_join_*")]
    assert len(first) == 1
    # touch the corpus → new fingerprint → new layout; the superseded
    # sibling (same source) must be dropped, dir AND catalog entry
    old_table = json.loads(
        (cache / first[0] / "_layout.json").read_text())["table"]
    assert spark.catalog.tableExists(old_table)
    src = tiny_corpus_dir / "pages.parquet"
    targets = [f for f in src.rglob("*") if f.is_file()] \
        if src.is_dir() else [src]
    for f in targets:
        os.utime(f)
    eng2 = CrawlEngine(spark, cfg, pages, str(tmp_path / "s2"))
    eng2.close()
    after = [d.name for d in cache.glob("corpus_join_*")]
    assert len(after) == 1 and after != first
    assert not spark.catalog.tableExists(old_table)
    # an unrelated corpus sharing the cache root is untouched
    other_dir = cache / "corpus_join_deadbeef0000"
    other_dir.mkdir()
    (other_dir / "_layout.json").write_text(json.dumps(
        {"source": "/elsewhere/pages.parquet", "n_buckets": 4,
         "part_buckets": None, "key": "deadbeef0000",
         "table": "ssspark_corpus_deadbeef0000"}))
    src = tiny_corpus_dir / "pages.parquet"
    targets = [f for f in src.rglob("*") if f.is_file()] \
        if src.is_dir() else [src]
    for f in targets:
        os.utime(f)
    eng3 = CrawlEngine(spark, cfg, pages, str(tmp_path / "s3"))
    eng3.close()
    assert other_dir.exists()


# --- emission log is opt-in (VERDICT r3 item 3) -----------------------------

def test_emission_log_is_opt_in(spark, tiny_corpus_dir, tmp_path):
    cfg = CrawlConfig(seeds=("http://host00.example/",), max_waves=2,
                      fetch_join="broadcast")
    eng = CrawlEngine(spark, cfg, str(tiny_corpus_dir / "pages.parquet"),
                      str(tmp_path / "state"))
    assert eng.record_emission is False     # the default
    eng.run()
    eng.close()
    # no emission/quota_log tables → no partition-less window ever ran
    assert eng.io.read_manifest("emission") is None
    assert eng.io.read_manifest("quota_log") is None
    assert eng.io.read_manifest("fetched") is not None


def test_bucketed_seen_layout_identical_results(spark, tmp_path_factory):
    """seen_layout='bucketed' (the 10^10-row anti-join layout) is a
    physical choice only: emission log, seen set and fetched rows must
    be byte-identical to the default dirs layout, and resume must work
    across the layout's catalog re-registration."""
    from shaman_scraping_spark.corpus.generator import (
        CorpusSpec, generate_corpus,
    )
    from shaman_scraping_spark.corpus.simulator import simulate

    corpus = generate_corpus(CorpusSpec(n_hosts=6, n_pages=120))
    cdir = tmp_path_factory.mktemp("bseen_corpus")
    corpus.write(cdir)
    cfg = CrawlConfig(seeds=tuple(corpus.seeds), max_waves=5,
                      seen_layout="bucketed", seen_buckets=8)
    sim = simulate(corpus, cfg)
    state = tmp_path_factory.mktemp("bseen_state")
    eng = CrawlEngine(spark, cfg, str(cdir / "pages.parquet"),
                      str(state), record_emission=True)
    eng.run()
    got = sorted(
        (r["wave"], r["emit_rank"], r["url"], r["depth"], r["host"])
        for r in eng.io.load("emission").collect()
    )
    assert got == sorted(sim.emissions)
    seen = {r["url_canon"] for r in eng.io.load("seen").collect()}
    assert seen == sim.seen
    # layout on disk: wave partitions holding bucket files
    parts = sorted(p.name for p in (state / "seen" / "data").glob("__wave=*"))
    assert parts, "no wave partitions written"
    eng.close()

    # kill-after-2 + resume twin (exercises partition-filtered loads)
    state2 = tmp_path_factory.mktemp("bseen_state2")
    short = CrawlConfig(**{**cfg.__dict__, "max_waves": 2})
    e1 = CrawlEngine(spark, short, str(cdir / "pages.parquet"),
                     str(state2), record_emission=True)
    e1.run()
    e1.close()
    e2 = CrawlEngine(spark, cfg, str(cdir / "pages.parquet"),
                     str(state2), record_emission=True)
    e2.run(resume=True)
    got2 = sorted(
        (r["wave"], r["emit_rank"], r["url"], r["depth"], r["host"])
        for r in e2.io.load("emission").collect()
    )
    assert got2 == sorted(sim.emissions)
    e2.close()


def test_bucketed_seen_anti_join_is_exchange_free(spark, tmp_path_factory):
    """The layout's point: an exact anti-join against the accumulated
    seen set must read the seen side's buckets IN PLACE — exactly one
    exchange (the probe side), seen scan bucketed, wave partitions
    pruned to the committed watermark."""
    from shaman_scraping_spark.corpus.generator import (
        CorpusSpec, generate_corpus,
    )
    from shaman_scraping_spark.operators.frontier import (
        SEEN_KEY, anti_join_seen,
    )

    corpus = generate_corpus(CorpusSpec(n_hosts=4, n_pages=60))
    cdir = tmp_path_factory.mktemp("bseen_plan_corpus")
    corpus.write(cdir)
    cfg = CrawlConfig(seeds=tuple(corpus.seeds), max_waves=3,
                      seen_layout="bucketed", seen_buckets=8)
    state = tmp_path_factory.mktemp("bseen_plan_state")
    eng = CrawlEngine(spark, cfg, str(cdir / "pages.parquet"), str(state))
    eng.run()
    seen = eng.io.load("seen")
    probe = spark.createDataFrame(
        [(1, "http://x.example/a"), (2, "http://x.example/b")],
        "url_hash long, url_canon string",
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            anti_join_seen(probe, seen)
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Bucketed: true" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "__wave" in plan and "PartitionFilters" in plan

    # delta-frontier reconstruction — additions scan ▷ anti-join seen
    # ▷ dedup hash-aggregate, ALL co-partitioned on the bucket key:
    # ZERO exchanges anywhere in the plan
    last = eng.last_complete_wave() + 1
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        recon = eng._load_frontier(last, eng.io.load("seen", last))
        rplan = recon._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert rplan.count("Bucketed: true") == 2, rplan
    assert "Exchange" not in rplan, rplan
    eng.close()


def test_cli_emission_flag_default_off():
    from shaman_scraping_spark.cli import build_parser

    args = build_parser().parse_args(
        ["crawl", "--pages", "p", "--seeds", "s", "--state", "st"]
    )
    assert args.emission_log is False
