"""Per-host top-k politeness selection — SURVEY.md §2C ops 15–16.

The reference's scheduler picks the next URL per host under a
crawl-delay; a wave discretizes that into "host h may emit at most
quota_h URLs this wave".  Expressed as a rank window partitioned by
host — the shuffle hash-partitions on host, and the per-host quota cap
bounds any partition's emitted width by construction (the structural
answer to hot-host skew, SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: deterministic priority order within a host (op 15)
PRIORITY = ["depth", "discovery_ts", "url_canon"]


def with_priority_rank(df: DataFrame) -> DataFrame:
    w = Window.partitionBy("host").orderBy(
        *[F.col(c).asc() for c in PRIORITY]
    )
    return df.withColumn("host_rank", F.row_number().over(w))


def per_host_topk(df: DataFrame, quota_col: str = "quota") -> DataFrame:
    """Rows whose per-host priority rank ≤ that host's quota.

    *df* must already carry ``quota_col`` (joined from host_state).
    Returns all rows with ``host_rank`` + ``scheduled`` flag so the
    caller can split scheduled vs remaining in one pass.
    """
    ranked = with_priority_rank(df)
    return ranked.withColumn(
        "scheduled", F.col("host_rank") <= F.col(quota_col)
    )
