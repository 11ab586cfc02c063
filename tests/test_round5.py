"""Round-5 regression tests — ADVICE r4 fixes + VERDICT r4 item 1.

Covers: file:// URI parsing in local_path (ADVICE r4 #4), the
seen_layout resume guard (ADVICE r4 #1), declared-sitemap-URL
resolution without the streaming substring heuristic (ADVICE r4 #2 /
VERDICT r4 What's-wrong #1), and exactly-once requeue via atomic
rename (ADVICE r4 #3).
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from shaman_scraping_spark.config import CrawlConfig
from shaman_scraping_spark.plans.engine import CrawlEngine, local_path


# --- ADVICE r4 #4: file:// URIs parse via urllib ----------------------------

def test_local_path_file_uri_parsing():
    assert local_path("file:///tmp/x") == Path("/tmp/x")
    assert local_path("file://localhost/tmp/y") == Path("/tmp/y")
    # non-empty authority = remote host → treated like s3://, not
    # misparsed as the path root '/host/path'
    assert local_path("file://nfs-host/export/pages") is None
    assert local_path("FILE:///upper/scheme") == Path("/upper/scheme")


# --- ADVICE r4 #1: seen_layout persisted + guarded on resume ----------------

def test_seen_layout_resume_guard(spark, tiny_corpus_dir, tmp_path):
    pages = str(tiny_corpus_dir / "pages.parquet")
    state = tmp_path / "state"
    cfg = CrawlConfig(seeds=("http://host00.example/",), max_waves=1)
    eng = CrawlEngine(spark, cfg, pages, str(state))
    eng.run()
    eng.close()
    meta = json.loads((state / "_engine.json").read_text())
    assert meta["seen_layout"] == "dirs"
    # resuming the dirs-layout state dir under bucketed must refuse at
    # init (ADVICE r4: it silently dropped all dirs-wave seen rows)
    cfg_b = CrawlConfig(seeds=("http://host00.example/",), max_waves=2,
                        seen_layout="bucketed")
    with pytest.raises(ValueError, match="seen_layout"):
        CrawlEngine(spark, cfg_b, pages, str(state))
    # a legacy _engine.json without the key still resumes (no guard)
    (state / "_engine.json").write_text(
        json.dumps({"state_layout": "delta"})
    )
    eng2 = CrawlEngine(spark, cfg, pages, str(state))
    eng2.close()


# --- ADVICE r4 #2: sitemaps resolve by DECLARED canonical URL ---------------

def test_sitemap_dim_resolves_non_sitemap_named_documents(spark):
    """A robots `Sitemap: http://h/feeds/urls.xml` directive (no
    'sitemap' substring anywhere in the URL) must resolve — the old
    streaming registry's substring heuristic silently dropped it."""
    from shaman_scraping_spark.functions.url import with_url_columns
    from shaman_scraping_spark.sources.sitemap import build_sitemap_dim

    rows = [
        ("http://h.example/robots.txt",
         b"User-agent: *\nSitemap: http://h.example/feeds/urls.xml\n"),
        ("http://h.example/feeds/urls.xml",
         b'<urlset><url><loc>http://h.example/orphan-1</loc></url>'
         b"<url><loc> http://h.example/orphan-2 </loc></url></urlset>"),
        ("http://h.example/", b"<html>home</html>"),
    ]
    pages = with_url_columns(
        spark.createDataFrame(rows, "url string, html binary")
    )
    got = {(r["host"], r["sm_src"], r["url"])
           for r in build_sitemap_dim(pages).collect()}
    assert got == {
        ("h.example", "http://h.example/feeds/urls.xml",
         "http://h.example/orphan-1"),
        ("h.example", "http://h.example/feeds/urls.xml",
         "http://h.example/orphan-2"),
    }


def test_streaming_sitemap_dim_matches_batch(spark, tmp_path):
    """Batch engine and streaming crawl now share ONE sitemap
    dimension builder — identical rows over the same corpus, and the
    streaming class holds no driver-side body registry at all."""
    from shaman_scraping_spark.corpus.generator import (
        CorpusSpec, generate_corpus,
    )
    from shaman_scraping_spark.streaming.crawl_stream import StreamingCrawl

    corpus = generate_corpus(
        CorpusSpec(n_hosts=4, n_pages=60, sitemap_frac=1.0)
    )
    d = tmp_path / "corpus"
    corpus.write(d)
    cfg = CrawlConfig(seeds=tuple(corpus.seeds), use_sitemaps=True)
    eng = CrawlEngine(spark, cfg, str(d / "pages.parquet"),
                      str(tmp_path / "state"))
    sc = StreamingCrawl(spark, cfg, str(d / "pages.parquet"),
                        str(tmp_path / "work"))
    batch_rows = {tuple(r) for r in eng.sitemap_dim.collect()}
    stream_rows = {tuple(r) for r in sc.sitemap_dim.collect()}
    assert batch_rows and batch_rows == stream_rows
    assert not hasattr(sc, "_sitemap_locs")
    eng.close()
    sc.sitemap_dim.unpersist()
    sc.pages.unpersist()
    sc.robots_dim.unpersist()


# --- VERDICT r4 item 7: the training-data pipeline is CLI-drivable ----------

def test_clean_cli_end_to_end(spark, tmp_path):
    """`clean` chains exact dedup → MinHash near-dup removal →
    boilerplate strip → annotate+filter over a parquet corpus, e2e
    through the CLI entry point."""
    import json
    from contextlib import redirect_stdout
    from io import StringIO

    from shaman_scraping_spark.cli import main

    import random

    footer = "subscribe to our newsletter today"
    rng = random.Random(5)
    vocab = [f"word{j}" for j in range(400)]
    rows = [
        (i, " ".join(rng.sample(vocab, 40)) + f" item{i} end {footer}")
        for i in range(30)
    ]
    rows.append((100, rows[0][1]))                      # exact dup of 0
    rows.append((101, rows[1][1].replace("item1 ", "item1x ")))  # near dup
    rows.append((102, "tiny"))                          # too short
    src = tmp_path / "docs.parquet"
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.parquet(str(src))
    out = tmp_path / "cleaned"
    buf = StringIO()
    with redirect_stdout(buf):
        rc = main([
            "clean", "--input", str(src), "--output", str(out),
            "--min-tokens", "3", "--minhash-threshold", "0.6",
        ])
    assert rc == 0
    stats = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert stats["input_rows"] == 33
    assert stats["after_exact_dedup"] == 32       # doc 100 dropped
    assert stats["after_neardup"] == 31           # doc 101 dropped
    assert stats["output_rows"] == 30             # doc 102 length-filtered
    assert any("newsletter" in s for s in stats["boilerplate_shingles"])
    got = spark.read.parquet(str(out))
    ids = {r["doc_id"] for r in got.select("doc_id").collect()}
    assert ids == set(range(30))
    # the planted footer is stripped from every surviving text
    assert got.filter(got["text"].contains("newsletter")).count() == 0
    for c in ("n_tokens", "stopword_ratio", "lang_pred"):
        assert c in got.columns


# --- ADVICE r4 #3: requeue commits by atomic rename -------------------------

def test_requeue_replay_is_exactly_once(spark, tiny_corpus_dir, tmp_path):
    from pyspark.sql import functions as F

    from shaman_scraping_spark.functions.url import with_url_columns
    from shaman_scraping_spark.streaming.crawl_stream import StreamingCrawl

    cfg = CrawlConfig(seeds=("http://host00.example/",))
    sc = StreamingCrawl(spark, cfg, str(tiny_corpus_dir / "pages.parquet"),
                        str(tmp_path / "work"))
    rows = (
        with_url_columns(spark.createDataFrame(
            [("http://host00.example/a",), ("http://host00.example/b",)],
            "url string",
        ))
        .withColumn("depth", F.lit(1))
        .withColumn("discovery_ts", F.lit(cfg.t0))
        .withColumn("parent_canon", F.lit(None).cast("string"))
        .withColumn("wave_discovered", F.lit(1))
    )
    sc.requeue(rows, batch_id=7)
    sc.requeue(rows, batch_id=7)  # at-least-once replay of the batch
    deltas = Path(tmp_path / "work" / "deltas")
    files = sorted(p.name for p in deltas.glob("requeue-*"))
    assert files == ["requeue-00000007.parquet"]
    got = spark.read.parquet(str(deltas / files[0]))
    assert got.count() == 2  # one copy of each row, not two
    assert "event_ts" in got.columns
    # no staging debris and no half-committed temp dirs
    staging = Path(tmp_path / "work" / "requeue-staging")
    assert not any(staging.rglob("*.parquet"))
    sc.pages.unpersist()
    sc.robots_dim.unpersist()


# --- VERDICT r4 item 4: merged end-of-wave state commits ---------------------

def _emissions(eng):
    return sorted(
        (r["wave"], r["emit_rank"], r["url"], r["depth"], r["host"])
        for r in eng.io.load("emission").collect()
    )


def test_merged_commits_twin(spark, tiny_corpus, tiny_corpus_dir,
                             tmp_path_factory):
    """merged_commits=True (the default — lineage/seen/frontier/
    host_state written by ONE partitionBy("__table") job) is a
    physical choice only: emission log, seen set, per-wave lineage
    totals, table schemas and resume must be identical to the
    per-table concurrent-commit layout (merged_commits=False)."""
    from pyspark.sql import functions as F

    from shaman_scraping_spark.corpus.simulator import simulate

    base = CrawlConfig(seeds=tuple(tiny_corpus.seeds), max_waves=5,
                       max_depth=16)
    sim = simulate(tiny_corpus, base)
    results = {}
    for merged in (True, False):
        cfg = CrawlConfig(**{**base.__dict__, "merged_commits": merged})
        state = tmp_path_factory.mktemp(f"mcommit_{merged}")
        eng = CrawlEngine(spark, cfg,
                          str(tiny_corpus_dir / "pages.parquet"),
                          str(state), record_emission=True)
        eng.run()
        results[merged] = {
            "emissions": _emissions(eng),
            "seen": {r["url_canon"]
                     for r in eng.io.load("seen").collect()},
            "lineage": sorted(
                (r["wave"], r["urls"], r["bytes"])
                for r in eng.io.load("lineage").groupBy("wave").agg(
                    F.sum("urls_emitted").alias("urls"),
                    F.sum("bytes_fetched").alias("bytes"),
                ).collect()
            ),
            # schema-on-read must be the table's TRUE schema — the
            # multi part-files' superset columns are projected away
            "schemas": {
                t: eng.io.load(t).columns
                for t in ("seen", "frontier", "host_state", "lineage")
            },
        }
        eng.close()
    assert results[True] == results[False]
    assert results[True]["emissions"] == sorted(sim.emissions)
    assert results[True]["seen"] == sim.seen


def test_merged_commits_resume(spark, tiny_corpus, tiny_corpus_dir,
                               tmp_path_factory):
    """Kill after wave 2 under merged commits, resume → identical
    emission log to the one-shot run (manifest chains through the
    _multi partition dirs survive a fresh engine)."""
    from shaman_scraping_spark.corpus.simulator import simulate

    full = CrawlConfig(seeds=tuple(tiny_corpus.seeds), max_waves=5,
                       max_depth=16)
    sim = simulate(tiny_corpus, full)
    state = tmp_path_factory.mktemp("mcommit_resume")
    short = CrawlConfig(**{**full.__dict__, "max_waves": 2})
    e1 = CrawlEngine(spark, short, str(tiny_corpus_dir / "pages.parquet"),
                     str(state), record_emission=True)
    e1.run()
    e1.close()
    e2 = CrawlEngine(spark, full, str(tiny_corpus_dir / "pages.parquet"),
                     str(state), record_emission=True)
    e2.run(resume=True)
    assert _emissions(e2) == sorted(sim.emissions)
    e2.close()


def test_commit_multi_unit(spark, tmp_path):
    """TableIO.commit_multi mechanics: per-table manifests chain like
    plain commits, empty parts fall back with exact schema, re-running
    a wave is idempotent, load_delta resolves multi partition dirs,
    and same-named columns with conflicting types are refused."""
    import pytest as _pytest

    from shaman_scraping_spark.io.tableio import TableIO

    io = TableIO(spark, tmp_path / "t")
    a0 = spark.createDataFrame([(1, "x")], "k long, v string")
    b0 = spark.createDataFrame([(2.5, "h")], "score double, host string")
    io.commit("a", a0, 0, mode="append")
    io.commit("b", b0, 0, mode="append")
    a1 = spark.createDataFrame([(3, "y"), (4, "z")], "k long, v string")
    b1 = spark.createDataFrame([], "score double, host string")
    io.commit_multi(
        [("a", a1, "append", 1), ("b", b1, "append", 1)], group_wave=1
    )
    # a: chained append through the multi dir; true schema on read
    got_a = io.load("a", 1)
    assert got_a.columns == ["k", "v"]
    assert {r["k"] for r in got_a.collect()} == {1, 3, 4}
    assert io.row_count("a", 1) == 2
    # b: empty delta fell back to a plain commit (schema preserved)
    got_b = io.load("b", 1)
    assert got_b.columns == ["score", "host"]
    assert got_b.count() == 1
    assert io.row_count("b", 1) == 0
    # load_delta resolves the multi partition dir for wave 1
    d = io.load_delta("a", 1)
    assert sorted(r["k"] for r in d.collect()) == [3, 4]
    assert d.columns == ["k", "v"]
    # idempotent re-run of the same wave: same rows, no double-append
    io.commit_multi(
        [("a", a1, "append", 1), ("b", b1, "append", 1)], group_wave=1
    )
    assert io.load("a", 1).count() == 3
    # snapshot mode through the multi sink
    io.commit_multi([("a", a1, "snapshot", 2)], group_wave=2)
    assert io.load("a", 2).count() == 2
    # conflicting types for one column name refuse loudly
    c = spark.createDataFrame([("1",)], "k string")
    with _pytest.raises(ValueError, match="k"):
        io.commit_multi(
            [("a", a1, "append", 3), ("c", c, "append", 3)], group_wave=3
        )
