from shaman_scraping_spark.plans.engine import CrawlEngine  # noqa: F401
