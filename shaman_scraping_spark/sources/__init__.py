from shaman_scraping_spark.sources.warc import (  # noqa: F401
    parse_warc_bytes,
    read_warc,
    write_warc_bytes,
)
