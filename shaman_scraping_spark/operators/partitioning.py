"""Physical layout operators — SURVEY.md §2F ops 33–34, §2E op 32.

The reference is single-process (per-host queues serialize hot hosts
naturally); at 1000 executors the frontier must spread WITHOUT
splitting a host across politeness windows.  Salted-hash partitioning
on host (BASELINE.json: "salted-hash partitioned by host to kill
hot-domain skew") spreads *different* hosts uniformly — per-host
correctness is unaffected because every politeness op windows on the
host value itself, and the per-host quota cap (op 16) bounds any
single host's rows per wave before the shuffle ever sees them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_host_partition(
    df: DataFrame, num_partitions: int, salt: int = 42,
    host_col: str = "host",
) -> DataFrame:
    """Repartition on pmod(xxhash64(host, salt), P).

    The salt decorrelates the partitioner from plain hash(host) so a
    pathological host distribution (e.g. sequential CDN shards that
    collide under the default partitioner) still spreads.
    """
    return df.repartition(
        num_partitions,
        F.pmod(
            F.xxhash64(F.col(host_col), F.lit(salt)),
            F.lit(num_partitions),
        ),
    )


def sort_within_partitions_for_resume(df: DataFrame) -> DataFrame:
    """Op 34: stable per-partition order (depth, discovery_ts,
    url_canon) so snapshot files are byte-comparable across runs."""
    return df.sortWithinPartitions("depth", "discovery_ts", "url_canon")


def host_skew_probe(df: DataFrame, k: int = 10,
                    host_col: str = "host") -> DataFrame:
    """Op 32: top-k hottest hosts (TakeOrderedAndProject — partial
    top-k per partition, no full sort)."""
    return (
        df.groupBy(host_col)
        .agg(F.count("*").alias("n_urls"))
        .orderBy(F.col("n_urls").desc(), F.col(host_col).asc())
        .limit(k)
    )


def partition_stats(df: DataFrame) -> DataFrame:
    """Rows per physical partition — the skew measurement the lineage
    table records per wave."""
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count("*").alias("n_rows"))
    )
