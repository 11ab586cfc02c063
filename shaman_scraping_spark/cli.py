"""CLI — the spark-submit entry point (SURVEY.md §3.2 E1′).

Mirrors the reference's command-line crawl surface (site/seed list,
destination, rule knobs → run until drained; SURVEY.md §3.1 E1,
checkout empty §0) as::

  spark-submit --py-files shaman_scraping_spark.zip \
      -m shaman_scraping_spark.cli crawl \
      --pages /data/pages --seeds seeds.txt --state /data/crawl-state \
      --waves 20 [--resume] [--allowed-hosts a.com,b.com] \
      [--include-regex ...] [--exclude-regex ...] [--max-depth N]

Subcommands: ``crawl`` (batch wave loop), ``stream`` (continuous
micro-batch mode), ``stats`` (crawl-state report), ``gen-corpus``
(synthetic corpus), ``clean`` (training-data pipeline: exact dedup →
MinHash near-dup removal → boilerplate strip → quality/lang annotate
over a parquet document corpus — plans/clean.py).  Local runs work
without spark-submit: ``python -m shaman_scraping_spark.cli crawl ...``.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--pages", required=True, help="pages corpus parquet path")
    p.add_argument("--seeds", required=True,
                   help="seed URL file (one per line)")
    p.add_argument("--state", required=True, help="crawl state directory")
    p.add_argument("--waves", type=int, default=20)
    p.add_argument("--max-depth", type=int, default=64)
    p.add_argument("--wave-seconds", type=float, default=10.0)
    p.add_argument("--allowed-hosts", default=None,
                   help="comma-separated host allowlist")
    p.add_argument("--include-regex", default=None)
    p.add_argument("--exclude-regex", default=None)
    p.add_argument("--max-pages-per-host", type=int, default=None)
    p.add_argument("--master", default=None,
                   help="override master URL (default: env/spark-submit)")
    # opt-in: the emission log ranks the schedule through ONE window
    # partition (a test/golden mechanism) — never a production default
    p.add_argument("--emission-log", action="store_true")
    # physical-layout knobs (size crossovers; see config.py rationale)
    p.add_argument("--state-layout", choices=("delta", "snapshot"),
                   default="delta")
    p.add_argument("--seen-layout", choices=("dirs", "bucketed"),
                   default="dirs")
    p.add_argument("--fetch-join", choices=("auto", "broadcast", "bucketed"),
                   default="auto")
    # op 49: robots Sitemap: directives seed the frontier (depth 0)
    p.add_argument("--use-sitemaps", action="store_true")
    # op 4/59: WARC archive tee + content-dedup revisit records
    p.add_argument("--warc-dir", default=None,
                   help="tee fetched payloads into WARC part-files here")
    p.add_argument("--warc-dedup", action="store_true",
                   help="write byte-identical re-fetches as WARC revisit "
                        "records (pointer, no payload)")
    # op 62: extracted-text WET tee (conversion records)
    p.add_argument("--wet-dir", default=None,
                   help="tee extracted text into WET conversion records")
    p.add_argument("--wat-dir", default=None,
                   help="tee capture metadata (url/status/links JSON) "
                        "into WAT metadata records")


def _config_from(args):
    from shaman_scraping_spark.config import CrawlConfig

    seeds = tuple(
        u.strip() for u in Path(args.seeds).read_text().split() if u.strip()
    )
    return CrawlConfig(
        seeds=seeds,
        max_waves=args.waves,
        max_depth=args.max_depth,
        wave_seconds=args.wave_seconds,
        allowed_hosts=(
            tuple(args.allowed_hosts.split(","))
            if args.allowed_hosts else None
        ),
        include_regex=args.include_regex,
        exclude_regex=args.exclude_regex,
        max_pages_per_host=args.max_pages_per_host,
        state_layout=args.state_layout,
        seen_layout=args.seen_layout,
        fetch_join=args.fetch_join,
        use_sitemaps=args.use_sitemaps,
        warc_dir=args.warc_dir,
        warc_dedup=args.warc_dedup,
        wet_dir=args.wet_dir,
        wat_dir=args.wat_dir,
    )


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="shaman_scraping_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_crawl = sub.add_parser("crawl", help="batch BSP wave crawl")
    _add_common(p_crawl)
    p_crawl.add_argument("--resume", action="store_true")

    p_stream = sub.add_parser("stream", help="continuous streaming crawl")
    _add_common(p_stream)
    p_stream.add_argument("--idle-timeout", type=float, default=30.0)

    p_stats = sub.add_parser("stats", help="report on a crawl state dir")
    p_stats.add_argument("--state", required=True)
    p_stats.add_argument("--master", default=None)

    p_gen = sub.add_parser("gen-corpus", help="synthesize a pages corpus")
    p_gen.add_argument("out_dir")
    p_gen.add_argument("--pages", type=int, default=20_000)
    p_gen.add_argument("--hosts", type=int, default=50)
    p_gen.add_argument("--seed", type=int, default=42)

    p_rank = sub.add_parser(
        "rank", help="host PageRank over the crawl's own fetched link graph"
    )
    p_rank.add_argument("--state", required=True)
    p_rank.add_argument("--output", default=None,
                        help="optional parquet path for the (host, rank) dim")
    p_rank.add_argument("--iterations", type=int, default=10)
    p_rank.add_argument("--damping", type=float, default=0.85)
    p_rank.add_argument("--top", type=int, default=20)
    p_rank.add_argument("--master", default=None)

    p_cdx = sub.add_parser(
        "cdx", help="build the sorted CDX lookup index from a crawl's "
                    "warc_index table"
    )
    p_cdx.add_argument("--state", required=True)
    p_cdx.add_argument("--output", required=True)
    p_cdx.add_argument("--partitions", type=int, default=None)
    p_cdx.add_argument("--master", default=None)

    p_cdxq = sub.add_parser(
        "cdx-lookup", help="point/prefix query against a built CDX index"
    )
    p_cdxq.add_argument("--cdx", required=True, help="write_cdx output path")
    p_cdxq.add_argument("--url", required=True)
    p_cdxq.add_argument("--prefix", action="store_true",
                        help="treat --url as a site prefix (range scan)")
    p_cdxq.add_argument("--limit", type=int, default=20)
    p_cdxq.add_argument("--master", default=None)

    p_clean = sub.add_parser(
        "clean", help="training-data cleaning pipeline over a parquet corpus"
    )
    p_clean.add_argument("--input", required=True,
                         help="document corpus parquet path")
    p_clean.add_argument("--output", required=True,
                         help="cleaned corpus output dir")
    p_clean.add_argument("--id-col", default="doc_id")
    p_clean.add_argument("--text-col", default="text")
    p_clean.add_argument("--minhash-threshold", type=float, default=0.6)
    p_clean.add_argument("--min-tokens", type=int, default=0)
    p_clean.add_argument("--boilerplate-min-docs", type=int, default=None)
    p_clean.add_argument("--boilerplate-top", type=int, default=20)
    p_clean.add_argument("--dup-line-min-docs", type=int, default=None,
                         help="strip whole lines duplicated across >= N "
                              "docs (CCNet-style line dedup)")
    p_clean.add_argument("--redact-pii", action="store_true",
                         help="redact emails/phones/IPv4s and stamp "
                              "per-row match counts")
    p_clean.add_argument("--master", default=None)
    return ap


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    if args.cmd == "gen-corpus":
        from shaman_scraping_spark.corpus.generator import (
            CorpusSpec, generate_corpus,
        )
        out = generate_corpus(
            CorpusSpec(n_hosts=args.hosts, n_pages=args.pages,
                       seed=args.seed)
        ).write(args.out_dir)
        print(f"wrote {out}")
        return 0

    from shaman_scraping_spark.session import get_spark

    spark = get_spark("shaman-scraping-spark-cli", master=args.master)

    if args.cmd == "clean":
        import json

        from shaman_scraping_spark.plans.clean import clean_corpus

        df = spark.read.parquet(args.input)
        cleaned, stats = clean_corpus(
            df, id_col=args.id_col, text_col=args.text_col,
            minhash_threshold=args.minhash_threshold,
            boilerplate_min_docs=args.boilerplate_min_docs,
            boilerplate_top=args.boilerplate_top,
            min_tokens=args.min_tokens,
            dup_line_min_docs=args.dup_line_min_docs,
            redact=args.redact_pii,
        )
        cleaned.write.mode("overwrite").parquet(args.output)
        stats["output_rows"] = spark.read.parquet(args.output).count()
        print(json.dumps(stats, sort_keys=True))
        return 0

    if args.cmd == "cdx":
        from shaman_scraping_spark.io.tableio import TableIO
        from shaman_scraping_spark.sources.cdx import write_cdx

        idx = TableIO(spark, args.state).load("warc_index")
        if idx is None:
            print("cdx: no warc_index table in state dir (crawl with "
                  "--warc-dir first)", file=sys.stderr)
            return 1
        write_cdx(idx, args.output, args.partitions)
        n = spark.read.parquet(args.output).count()
        print(f"cdx: {n} index rows written to {args.output}")
        return 0

    if args.cmd == "cdx-lookup":
        from shaman_scraping_spark.sources.cdx import cdx_lookup, cdx_prefix

        q = (cdx_prefix(spark, args.cdx, args.url) if args.prefix
             else cdx_lookup(spark, args.cdx, args.url))
        q.limit(args.limit).show(truncate=False)
        return 0

    if args.cmd == "rank":
        from pyspark.sql import functions as F

        from shaman_scraping_spark.io.tableio import TableIO
        from shaman_scraping_spark.operators.graph import host_rank

        fetched = TableIO(spark, args.state).load("fetched")
        if fetched is None:
            print("rank: no fetched table in state dir", file=sys.stderr)
            return 1
        ranks = host_rank(
            fetched, damping=args.damping, iterations=args.iterations
        ).withColumnRenamed("node", "host")
        if args.output:
            ranks.write.mode("overwrite").parquet(args.output)
        ranks.orderBy(F.desc("rank")).limit(args.top).show(truncate=False)
        return 0

    if args.cmd == "stats":
        from pyspark.sql import functions as F

        from shaman_scraping_spark.io.tableio import TableIO

        io = TableIO(spark, args.state)
        for table in ("fetched", "lineage"):
            df = io.load(table)
            if df is None:
                print(f"{table}: (absent)")
                continue
            if table == "fetched":
                df.groupBy("status").count().orderBy("status").show()
                df.groupBy("host").count().orderBy(
                    F.desc("count")
                ).limit(10).show(truncate=False)
            else:
                df.groupBy("wave").agg(
                    F.sum("urls_emitted").alias("urls"),
                    F.sum("bytes_fetched").alias("bytes"),
                ).orderBy("wave").show()
        return 0

    cfg = _config_from(args)
    if args.cmd == "crawl":
        from shaman_scraping_spark.plans.engine import CrawlEngine

        eng = CrawlEngine(
            spark, cfg, args.pages, args.state,
            record_emission=args.emission_log,
        )
        waves = eng.run(resume=args.resume)
        n = (eng.io.load("seen") or spark.range(0)).count()
        print(f"crawl: {waves} waves run, seen-set size {n}")
        return 0

    if args.cmd == "stream":
        from shaman_scraping_spark.streaming.crawl_stream import (
            StreamingCrawl,
        )

        sc = StreamingCrawl(spark, cfg, args.pages, args.state)
        sc.run(idle_timeout_s=args.idle_timeout)
        print(f"stream: fetched {sc.fetched().count()} records")
        return 0

    return 1


if __name__ == "__main__":
    raise SystemExit(main())
