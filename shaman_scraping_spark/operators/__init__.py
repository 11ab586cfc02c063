from shaman_scraping_spark.operators.frontier import (  # noqa: F401
    anti_join_seen,
    dedup_urls,
    merge_frontier,
)
from shaman_scraping_spark.operators.topk import per_host_topk  # noqa: F401
