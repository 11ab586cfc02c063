from shaman_scraping_spark.streaming.crawl_stream import (  # noqa: F401
    StreamingCrawl,
    dedup_within_watermark,
    windowed_fetch_metrics,
)
