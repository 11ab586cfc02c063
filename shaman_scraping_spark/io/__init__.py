from shaman_scraping_spark.io.tableio import TableIO  # noqa: F401
