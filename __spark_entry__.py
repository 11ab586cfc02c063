"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship frontier-scheduling pipeline over sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per SQL-expressible
operator from SURVEY.md §2 plus the training-data suite; bodies live
in ``shaman_scraping_spark.driver_queries`` (each callable documents
which operator it exercises).  Ops without a DuckDB mirror (xxhash64
keying, MinHash/SimHash/LSH) are rows-only by oracle omission.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from shaman_scraping_spark.driver_queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: frontier-scheduling analytics over sf0.001.

    Treats events as a discovery stream (user_id ≙ host, event ≙ URL):
    dedup → seen anti-join → per-host quota top-k → wave stats — the
    crawl engine's scheduling core (SURVEY.md §2 ops 13/14/16/29) in
    one plan.
    """
    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")

    seen = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id"
    )
    dedup_w = Window.partitionBy("event_id").orderBy("ts", "user_id")
    frontier = (
        events.withColumn("rn", F.row_number().over(dedup_w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .join(seen.select("event_id"), "event_id", "left_anti")
    )
    rank_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    scheduled = frontier.withColumn(
        "host_rank", F.row_number().over(rank_w)
    ).filter(F.col("host_rank") <= 5)
    return (
        scheduled.groupBy("event_type")
        .agg(
            F.count("*").alias("urls_emitted"),
            F.round(F.sum("value"), 4).alias("bytes_fetched"),
            F.countDistinct("user_id").alias("n_hosts"),
        )
        .orderBy("event_type")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
