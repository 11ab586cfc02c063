"""shaman_scraping_spark — a PySpark-native web-crawl analytics engine.

A brand-new, Spark-first rebuild of the capabilities of the reference
crawler ``antiufo/Shaman.Scraping`` (a C# WebsiteScraper/WARC archiving
crawler).  NOT a port: the crawl loop is expressed as waves of pure
DataFrame transforms over snapshot tables (see SURVEY.md §1.2/§3.2);
the reference checkout at /root/reference is empty (SURVEY.md §0), so
parity is pinned by BASELINE.json's north_star + SURVEY.md's operator
inventory rather than file:line citations.

Layout:
    session      SparkSession builder tuned for the engine
    config       CrawlConfig (host scope, politeness, waves)
    io/          TableIO snapshot tables (parquet+manifest; Iceberg seam),
                 WARC record parsing
    functions/   column-level URL algebra + vectorized pandas UDFs
                 (HTML→text, link extraction, language-ID, quality)
    operators/   dedup, per-host top-k, politeness, sketches, similarity
    plans/       CrawlEngine wave loop, lineage, resume
    corpus/      deterministic synthetic web corpus + sequential oracle
    streaming/   Structured Streaming variants of the crawl loop
"""

__version__ = "0.1.0"
