"""CDX-style archive index — the lookup side of the WARC sink.

Web archives answer "give me page X as of time T" through a CDX index:
one row per archived record, keyed by a SURT urlkey and timestamp,
sorted so a URL (or a whole site prefix) is one contiguous range.  This
module builds that index from the WARC sink's sidecar rows
(``write_warc_archive``'s (url, warc_ts, warc_file, offset, length, …)
output) as a range-partitioned, sorted parquet layout:

* ``build_cdx`` stamps ``urlkey = surt_key(url)`` and globally sorts by
  (urlkey, warc_ts) via ``repartitionByRange`` + ``sortWithinPartitions``
  — one range-exchange, no global sort on a single node.
* Written as parquet, every file carries min/max column statistics for
  ``urlkey``; a point or prefix lookup prunes to the one file (and the
  row groups inside it) covering that key range — the scan cost of a
  lookup is O(one row group), not O(index).  This is the CDX-server
  access pattern re-expressed as parquet predicate pushdown.
* ``cdx_lookup`` (point: url [+ closest timestamp]) and ``cdx_prefix``
  (range: whole host/site) return index rows; feed (warc_file, offset,
  length) to ``sources.warc.read_warc_record`` for the payload — seek +
  read one record, never an archive rescan.

Revisit records (``record_type='revisit'``, from the sink's content
dedup) resolve through the same index: ``resolve_revisits`` rewrites a
revisit row's pointer to the response row holding the payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shaman_scraping_spark.functions.url import surt_key, surt_key_py

#: columns of a CDX row (superset of the classic CDX-J fields)
CDX_COLS = [
    "urlkey", "warc_ts", "url", "warc_file", "offset", "length",
    "http_status", "digest", "record_type",
]


def build_cdx(index_df: DataFrame, n_partitions: int | None = None) -> DataFrame:
    """WARC sidecar index rows → sorted CDX rows.

    One range-exchange on (urlkey, warc_ts); each output partition is
    internally sorted, so the written parquet files form one global
    (urlkey, warc_ts) order with non-overlapping key ranges.
    """
    cdx = index_df.withColumn("urlkey", surt_key(F.col("url"))).select(
        *[c for c in CDX_COLS if c in index_df.columns or c == "urlkey"]
    )
    parts = n_partitions or index_df.sparkSession.sparkContext.defaultParallelism
    return (
        cdx.repartitionByRange(parts, "urlkey", "warc_ts")
        .sortWithinPartitions("urlkey", "warc_ts")
    )


def write_cdx(
    index_df: DataFrame, path: str, n_partitions: int | None = None,
) -> None:
    """Materialize the sorted CDX layout at *path* (overwrite)."""
    build_cdx(index_df, n_partitions).write.mode("overwrite").parquet(path)


def cdx_lookup(
    spark: SparkSession, path: str, url: str, ts=None,
) -> DataFrame:
    """Point lookup: all captures of *url* (canonical), newest-first —
    or closest-to-*ts* first when a timestamp is given.  The urlkey
    equality predicate pushes into the parquet scan and prunes every
    file whose min/max range excludes the key."""
    key = surt_key_py(url)
    df = spark.read.parquet(path).filter(F.col("urlkey") == key)
    if ts is not None:
        return df.orderBy(
            F.abs(F.col("warc_ts").cast("long") - F.lit(ts).cast("long"))
        )
    return df.orderBy(F.col("warc_ts").desc())


def cdx_prefix(spark: SparkSession, path: str, url_prefix: str) -> DataFrame:
    """Range scan: every capture whose urlkey starts with the SURT of
    *url_prefix* (a host root scans the whole site).  A half-open
    [prefix, prefix+MAX) range predicate — sargable, so file/row-group
    pruning applies, unlike a LIKE on an unsorted layout."""
    lo = surt_key_py(url_prefix)
    hi = lo + "￿"
    # range for pruning + startswith for exactness (ADVICE r5 low):
    # Spark compares strings by unsigned UTF-8 bytes, and U+FFFF
    # encodes EF BF BF — BELOW the F0-xx lead byte of supplementary-
    # plane codepoints, so a urlkey whose first char after the prefix
    # is astral would escape the half-open range.  startswith keeps
    # the result exact; the sargable range still drives file/row-group
    # pruning.
    return (
        spark.read.parquet(path)
        .filter(
            (F.col("urlkey") >= lo)
            & F.col("urlkey").startswith(lo)
        )
        .orderBy("urlkey", "warc_ts")
    )


def resolve_revisits(cdx: DataFrame) -> DataFrame:
    """Point every row at the (warc_file, offset, length) that holds
    its payload: responses at themselves, revisits at the response row
    with the same digest (min urlkey/ts — deterministic).  One
    digest-keyed equi-join against the response subset."""
    responses = (
        cdx.filter(F.col("record_type") == "response")
        .groupBy("digest")
        .agg(
            F.min(F.struct("urlkey", "warc_ts", "warc_file",
                           "offset", "length")).alias("__o")
        )
        .select(
            "digest",
            F.col("__o.warc_file").alias("payload_file"),
            F.col("__o.offset").alias("payload_offset"),
            F.col("__o.length").alias("payload_length"),
        )
    )
    out = cdx.join(responses, "digest", "left")
    return out.select(
        *CDX_COLS,
        F.when(F.col("record_type") == "revisit", F.col("payload_file"))
        .otherwise(F.col("warc_file")).alias("payload_file"),
        F.when(F.col("record_type") == "revisit", F.col("payload_offset"))
        .otherwise(F.col("offset")).alias("payload_offset"),
        F.when(F.col("record_type") == "revisit", F.col("payload_length"))
        .otherwise(F.col("length")).alias("payload_length"),
    )
