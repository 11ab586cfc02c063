"""SURVEY.md §5.5 plan-shape assertions: the physical plans the engine
relies on at 100 TB must actually materialize at any scale —
column pruning of the fat html column, filter pushdown into parquet
scans, broadcast of the host dimension, salted repartition, partial
top-k, and the absence of row-at-a-time Python anywhere.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shaman_scraping_spark.operators.partitioning import (
    host_skew_probe,
    salted_host_partition,
)


@pytest.fixture(scope="module")
def pages_path(tiny_corpus_dir):
    return str(tiny_corpus_dir / "pages.parquet")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_html_pruned_from_metadata_scan(spark, pages_path):
    """Scheduling-side reads must never drag html:binary through the
    scan (SURVEY.md §4 'never select(*) on pages')."""
    df = spark.read.parquet(pages_path).select("url", "lang")
    plan = _plan(df)
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "html" not in read_schema
    assert "url" in read_schema


def test_filter_pushdown_reaches_scan(spark, pages_path):
    df = spark.read.parquet(pages_path).filter(
        F.col("lang") == "en"
    ).select("url")
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "lang" in pushed


def test_host_dimension_broadcasts(spark, pages_path):
    """Politeness joins must broadcast the host dim, not shuffle the
    frontier (SURVEY.md §4 join-strategy row)."""
    from shaman_scraping_spark.functions.url import with_url_columns
    from shaman_scraping_spark.operators.politeness import (
        apply_robots_filter, build_host_state,
    )

    pages = with_url_columns(spark.read.parquet(pages_path))
    hs = build_host_state(pages, pages.select("host"))
    frontier = pages.select("url_canon", "url_hash", "host")
    plan = _plan(apply_robots_filter(frontier, hs))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_salted_partition_spreads_hosts(spark):
    rows = [(f"host{i % 7}.example", i) for i in range(2000)]
    df = spark.createDataFrame(rows, "host string, x int")
    parted = salted_host_partition(df, 8)
    sizes = (
        parted.groupBy(F.spark_partition_id().alias("p"))
        .count().collect()
    )
    assert len(sizes) > 1          # not collapsed into one partition
    # same host always lands in the same partition
    hp = (
        parted.select("host", F.spark_partition_id().alias("p"))
        .distinct().groupBy("host").count().collect()
    )
    assert all(r["count"] == 1 for r in hp)


def test_topk_hosts_partial_topk_plan(spark, pages_path):
    from shaman_scraping_spark.functions.url import with_url_columns

    pages = with_url_columns(spark.read.parquet(pages_path))
    df = host_skew_probe(pages, k=5)
    assert "TakeOrderedAndProject" in _plan(df)
    rows = df.collect()
    assert len(rows) == 5
    assert rows[0]["n_urls"] >= rows[-1]["n_urls"]


def test_bucketed_corpus_fetch_join_prunes_partitions(
    spark, tiny_corpus, tiny_corpus_dir, tmp_path_factory
):
    """VERDICT r1 item 2: with corpus_buckets set, the fetch join's
    pages-side scan must read a BOUNDED fraction of the corpus when the
    scheduled set is small — partition pruning on the hive `pbucket`
    layout, visible as a PartitionFilters entry and a pruned partition
    count in the scan node.  Crawl outputs stay byte-identical."""
    from shaman_scraping_spark.config import CrawlConfig
    from shaman_scraping_spark.corpus.simulator import simulate
    from shaman_scraping_spark.plans.engine import CrawlEngine

    n_buckets = 16
    state = tmp_path_factory.mktemp("bucketed_state")
    # a SINGLE seed → early waves schedule few URLs → few buckets hit
    # (partition-pruning layout pairs with the broadcast fetch join;
    # fetch_join="bucketed" is the alternative layout)
    cfg = CrawlConfig(seeds=(tiny_corpus.seeds[0],), max_waves=3,
                      corpus_buckets=n_buckets, fetch_join="broadcast")
    eng = CrawlEngine(
        spark, cfg, str(tiny_corpus_dir / "pages.parquet"), str(state), record_emission=True)
    # layout exists and is hive-partitioned
    bdir = state / "corpus_bucketed" / "data"
    parts = sorted(p.name for p in bdir.glob("pbucket=*"))
    assert 1 < len(parts) <= n_buckets

    # plan shape: a one-seed fetch scan prunes to that seed's bucket
    one_key = eng.pages.select(
        "url_canon", "url_hash").limit(1).collect()[0]
    bucket = one_key["url_hash"] % n_buckets
    pruned = eng.pages.filter(F.col("pbucket").isin([bucket])).select(
        "url_canon", "html"
    )
    plan = _plan(pruned)
    assert "PartitionFilters" in plan and "pbucket" in plan
    # behavioral check: the pruned scan reads only that bucket's rows
    total = eng.pages.count()
    in_bucket = pruned.count()
    assert 0 < in_bucket < total

    # end-to-end: bucketed crawl ≡ simulator (pruning changed nothing)
    sim = simulate(tiny_corpus, cfg)
    eng.run()
    got = sorted(
        (r["wave"], r["emit_rank"], r["url"])
        for r in eng.io.load("emission").collect()
    )
    assert got == sorted((w, r, u) for (w, r, u, d, h) in sim.emissions)


def test_composed_bucketed_smj_fetch_join_prunes_and_colocates(
    spark, tiny_corpus, tiny_corpus_dir, tmp_path_factory
):
    """VERDICT r2 item 2: fetch_join='bucketed' + corpus_buckets
    COMPOSE — the per-wave fetch join must be a sort-merge join whose
    corpus side is (a) partition-pruned to the hit pbuckets (literal
    PartitionFilters) and (b) exchange-free (bucketBy co-location: the
    only shuffle in the plan is the skinny scheduled-keys side)."""
    from shaman_scraping_spark.config import CrawlConfig
    from shaman_scraping_spark.plans.engine import CrawlEngine

    state = tmp_path_factory.mktemp("composed_state")
    cfg = CrawlConfig(
        seeds=(tiny_corpus.seeds[0],), max_waves=2,
        fetch_join="bucketed", fetch_join_buckets=8, corpus_buckets=8,
    )
    eng = CrawlEngine(
        spark, cfg, str(tiny_corpus_dir / "pages.parquet"), str(state), record_emission=True)
    # layout: hive pbucket dirs, each holding bucketed files
    loc = next(
        d for d in state.glob("corpus_join_*") if (d / "data").exists()
    )
    parts = sorted(p.name for p in (loc / "data").glob("pbucket=*"))
    assert 1 < len(parts) <= 8
    assert "pbucket" in eng.pages.columns

    one_key = eng.pages.select("url_canon", "url_hash").limit(1).collect()[0]
    bucket = one_key["url_hash"] % 8
    pages_min = eng.pages.filter(F.col("pbucket").isin([bucket])).select(
        "url_canon", "warc_ts", "html"
    )
    keys = spark.createDataFrame(
        [(one_key["url_canon"],)], "url_canon string"
    )
    # at test scale everything fits under autoBroadcastJoinThreshold
    # and Spark (rightly) picks a broadcast join; disable it to expose
    # the structural plan a 100-TB corpus would get
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fetch_input = pages_min.join(keys, "url_canon", "right_outer")
        plan = _plan(fetch_input)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    assert "PartitionFilters" in plan and "pbucket" in plan
    # exactly ONE exchange: the skinny keys side.  The corpus side
    # reads its buckets in place — html never crosses a shuffle.
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


def test_no_batch_eval_python_anywhere_in_engine_wave(spark, pages_path):
    """The whole wave prologue (canonicalize → robots → rank) compiles
    to Catalyst + ArrowEval/MapInArrow only — per-row Python is banned
    by BASELINE.json's input_hint."""
    from shaman_scraping_spark.functions.url import with_url_columns
    from shaman_scraping_spark.operators.politeness import (
        apply_robots_filter, build_host_state, refill_tokens,
    )
    from shaman_scraping_spark.operators.topk import per_host_topk

    pages = with_url_columns(spark.read.parquet(pages_path))
    hs = build_host_state(pages, pages.select("host")).withColumn(
        "tokens", F.lit(0.0)
    ).withColumn("budget_used", F.lit(0).cast("long"))
    hs = refill_tokens(hs, 10.0, 100.0, 10**9)
    frontier = pages.select(
        "url_canon", "url_hash", "host",
        F.lit(0).alias("depth"), F.col("warc_ts").alias("discovery_ts"),
    )
    fr = apply_robots_filter(frontier, hs).filter(F.col("allowed"))
    ranked = per_host_topk(fr.join(F.broadcast(hs.select("host", "quota")),
                                   "host"), "quota")
    plan = _plan(ranked)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan       # the robots pandas UDF
