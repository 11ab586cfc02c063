"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` plus a crawl-
engine throughput run over a deterministically synthesized corpus
(seed 42 — no external data), and prints ONE JSON line::

  {"metric": "...", "value": N, "unit": "sec",
   "queries": {...}, "sf": ..., "crawl": {...}}

Scaling evidence (N vs 4N cores) lives in tools/bench_scaling.py →
BENCH/BASELINE.md per the BASELINE.json two-cluster-size rule.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "scope_filter", "host_extract", "anti_join_seen", "dedup_first",
    "per_host_topk", "frontier_merge", "token_refill", "redirect_hops",
    "lineage_agg", "stats_cube", "window_metrics", "json_props",
    "exact_dedup", "token_count", "quality_score", "minhash_neardup",
    "simhash", "ann_topk", "embedding_norm",
]

BENCH_CORPUS_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "20000"))
BENCH_WAVES = int(os.environ.get("SPARK_GRAFT_BENCH_WAVES", "8"))


def bench_corpus_dir(pages: int, hosts: int = 50, seed: int = 42) -> str:
    """Generate (once, cached) the deterministic crawl-bench corpus."""
    d = Path(tempfile.gettempdir()) / f"ssspark_bench_{pages}_{hosts}_{seed}"
    if not (d / "pages.parquet").exists():
        from shaman_scraping_spark.corpus.generator import (
            CorpusSpec, generate_corpus,
        )
        generate_corpus(
            CorpusSpec(n_hosts=hosts, n_pages=pages, seed=seed)
        ).write(d)
    return str(d)


def run_crawl_bench(spark, cpus: int) -> dict:
    from shaman_scraping_spark.config import CrawlConfig
    from shaman_scraping_spark.plans.engine import CrawlEngine
    from pyspark.sql import functions as F

    corpus = bench_corpus_dir(BENCH_CORPUS_PAGES)
    seeds = tuple(Path(corpus, "seeds.txt").read_text().split())
    state = tempfile.mkdtemp(prefix="ssspark_state_")
    # crawl shuffles are sized by DATA (wave-frontier rows), not by the
    # query suite's 4×cpus: at a 20k-page corpus each wave moves a few
    # thousand skinny rows, and surplus shuffle partitions multiply
    # task-scheduling overhead into every one of the ~10 jobs per wave
    cfg = CrawlConfig(seeds=seeds, max_waves=BENCH_WAVES,
                      shuffle_partitions=max(8, BENCH_CORPUS_PAGES // 2500))
    eng = CrawlEngine(spark, cfg, f"{corpus}/pages.parquet", state,
                      record_emission=False)
    t0 = time.monotonic()
    eng.run()
    wall = time.monotonic() - t0
    lineage = eng.io.load("lineage")
    urls = lineage.agg(F.sum("urls_emitted")).collect()[0][0] or 0
    bytes_ = lineage.agg(F.sum("bytes_fetched")).collect()[0][0] or 0
    eng.close()
    shutil.rmtree(state, ignore_errors=True)
    return {
        "pages": BENCH_CORPUS_PAGES,
        "waves": BENCH_WAVES,
        "urls_fetched": int(urls),
        "bytes_fetched": int(bytes_),
        "wall_sec": round(wall, 2),
        "urls_per_sec": round(urls / wall, 1) if wall > 0 else 0.0,
        "cpus": cpus,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1

    from shaman_scraping_spark.driver_queries import QUERIES
    from shaman_scraping_spark.session import get_spark

    spark = get_spark(
        "bench", master=f"local[{cpus}]", shuffle_partitions=4 * cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/Python-worker warmup (protocol: discard cold start)
    QUERIES["lineage_agg"](spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.monotonic()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        dt = time.monotonic() - t0
        timings[name] = round(dt, 3)
        total += dt

    crawl = run_crawl_bench(spark, cpus)
    total += crawl["wall_sec"]

    print(json.dumps({
        "metric": "headline suite + crawl wall-clock",
        "value": round(total, 2),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "crawl": crawl,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
