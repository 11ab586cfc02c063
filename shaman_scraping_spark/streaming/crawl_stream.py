"""Structured-Streaming crawl mode — SURVEY.md §2G ops 36–39.

The reference's main loop runs continuously until the frontier drains,
handling newly found URLs as they arrive (SURVEY.md §3.1; checkout
empty §0).  Streaming mapping: the frontier-delta directory is BOTH
the stream source and the sink — ``foreachBatch`` fetches a
micro-batch of enqueued URLs, extracts links, and enqueues the unseen
ones back into the watched directory, so discovery feeds itself until
no new files appear (micro-batch ≙ wave).

Dedup invariant: a URL enters ``seen`` at ENQUEUE time (when its delta
file is written), not at fetch time — two in-flight micro-batches can
therefore never enqueue the same URL twice.  The in-stream analogue
for late rediscoveries is ``dropDuplicatesWithinWatermark`` (op 37).

Politeness in streaming (op 38) is a per-host token bucket in
``applyInPandasWithState`` — state survives across micro-batches.
"""

from __future__ import annotations

import time
from pathlib import Path

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from shaman_scraping_spark.config import CrawlConfig
from shaman_scraping_spark.functions.html import (
    extract_links_udf, redirect_target_udf,
)
from shaman_scraping_spark.functions.url import with_url_columns
from shaman_scraping_spark.operators.frontier import SEEN_KEY, dedup_urls
from shaman_scraping_spark.plans.engine import FRONTIER_SCHEMA, scope_predicate


# --- op 39: tumbling-window metrics (streaming or batch) --------------------

def windowed_fetch_metrics(
    fetched: DataFrame, window: str = "10 seconds",
    ts_col: str = "fetch_ts",
) -> DataFrame:
    """urls/sec dashboard rollup: count + bytes per tumbling window."""
    return (
        fetched.groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(
            F.count("*").alias("n_fetched"),
            F.sum(F.length("html")).alias("bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"), "n_fetched", "bytes"
        )
    )


# --- op 37: watermark dedup -------------------------------------------------

def dedup_within_watermark(
    frontier_stream: DataFrame, watermark: str = "30 seconds"
) -> DataFrame:
    """Late rediscoveries of a URL within the watermark never refetch."""
    return frontier_stream.withWatermark(
        "discovery_ts", watermark
    ).dropDuplicatesWithinWatermark(["url_hash"])


# --- op 38: stateful per-host token bucket ---------------------------------

def token_bucket_step(
    tokens: float, last_ts: float, now_ts: float,
    refill_per_sec: float, bucket_cap: float,
) -> tuple[float, float]:
    """One refill step of the streaming token bucket — EVENT time, not
    wall clock (VERDICT r2 item 5: ``time.time()`` here broke the
    determinism discipline the batch engine holds everywhere, and made
    the streaming quota path untestable against the simulator).

    ``now_ts`` is the micro-batch's event time (max discovery_ts of
    the group's rows); late batches (now < last) refill nothing and
    never regress the stored clock.  Returns (available_tokens,
    new_last_ts).  Pure function → unit-testable against the batch
    wave-clock math without a streaming query.
    """
    gap = max(0.0, now_ts - last_ts)
    return (
        min(bucket_cap, tokens + gap * refill_per_sec),
        max(last_ts, now_ts),
    )


def stateful_token_bucket(
    frontier_stream: DataFrame,
    refill_per_sec: float,
    bucket_cap: float = 100.0,
    first_grant_s: float = 1.0,
):
    """Per-host token bucket that survives across micro-batches.

    Output rows carry ``scheduled: boolean`` — True for rows within the
    host's budget this batch (ordered by depth, discovery_ts,
    url_canon), False for rows the caller must re-enqueue.
    State: (tokens: double, last_event_unix: double).

    The clock is EVENT time (max discovery_ts per group per batch), so
    replaying the same micro-batches yields the same schedule — with
    discovery_ts stamped on the wave clock (t0 + w·wave_seconds) and
    refill_per_sec = 1/crawl_delay the quota math equals the batch
    engine's refill_tokens (pytest-asserted).  A brand-new host gets
    ``first_grant_s`` seconds of refill (its state has no prior
    event-time reference).
    """
    out_schema = (
        "host string, url_canon string, depth int, scheduled boolean"
    )
    state_schema = "tokens double, last_unix double"

    def fn(key, pdfs, state: GroupState):
        host = key[0]
        rows = pd.concat(list(pdfs), ignore_index=True)
        now = float(rows["discovery_ts"].max().timestamp())
        if state.exists:
            tokens, last = state.get
            tokens, now = token_bucket_step(
                tokens, last, now, refill_per_sec, bucket_cap
            )
        else:
            tokens = min(bucket_cap, first_grant_s * refill_per_sec)
        rows = rows.sort_values(
            ["depth", "discovery_ts", "url_canon"]
        ).reset_index(drop=True)
        quota = int(tokens)
        scheduled = rows.index < quota
        tokens -= int(scheduled.sum())
        state.update((float(tokens), float(now)))
        yield pd.DataFrame(
            {
                "host": host,
                "url_canon": rows["url_canon"],
                "depth": rows["depth"],
                "scheduled": scheduled,
            }
        )

    return frontier_stream.groupBy("host").applyInPandasWithState(
        fn, out_schema, state_schema, "update",
        GroupStateTimeout.NoTimeout,
    )


# --- op 36: the continuous crawl loop ---------------------------------------

class StreamingCrawl:
    """Self-feeding micro-batch crawl over a pages corpus.

    ``deltas/`` is the watched frontier source; ``fetched/`` the
    append sink; ``seen/`` the enqueue-time membership log.  Shares the
    batch engine's canonicalization/extraction/scope semantics — the
    emission *set* matches the batch engine (ordering is micro-batch-
    dependent, which is exactly the reference's continuous behavior).
    """

    def __init__(self, spark: SparkSession, config: CrawlConfig,
                 pages_path: str, work_dir: str):
        self.spark = spark
        self.config = config
        self.work = Path(work_dir)
        (self.work / "deltas").mkdir(parents=True, exist_ok=True)
        (self.work / "seen").mkdir(parents=True, exist_ok=True)
        (self.work / "fetched").mkdir(parents=True, exist_ok=True)
        from shaman_scraping_spark.plans.engine import load_canonical_corpus

        # streaming probes the corpus every micro-batch → cache it here
        # (micro-batches are small relative to the corpus)
        self.pages = load_canonical_corpus(
            spark, pages_path, config.pages_partitions
        ).persist()
        self._batch_no = 0

    # -- enqueue: seen-at-enqueue-time discipline --------------------------

    def _seen(self) -> DataFrame:
        try:
            return self.spark.read.parquet(str(self.work / "seen"))
        except Exception:  # noqa: BLE001 - empty dir on first batch
            return self.spark.createDataFrame(
                [], "url_hash long, url_canon string"
            )

    def enqueue(self, frontier_rows: DataFrame) -> int:
        """Anti-join seen → dedup → write delta + seen entries."""
        fresh = dedup_urls(
            frontier_rows.join(self._seen(), SEEN_KEY, "left_anti")
        ).persist()
        n = fresh.count()
        if n > 0:
            # append part-files into the flat watched dir — each new
            # file is a fresh micro-batch input for the stream source
            fresh.select(*[f.name for f in FRONTIER_SCHEMA.fields]) \
                .write.mode("append") \
                .parquet(str(self.work / "deltas"))
            fresh.select(*SEEN_KEY).write.mode("append") \
                .parquet(str(self.work / "seen"))
        fresh.unpersist()
        return n

    def seed(self) -> int:
        cfg = self.config
        seeds = self.spark.createDataFrame(
            [(u,) for u in cfg.seeds], "url string"
        )
        frontier = (
            with_url_columns(seeds)
            .withColumn("depth", F.lit(0))
            .withColumn("discovery_ts", F.lit(cfg.t0))
            .withColumn("parent_canon", F.lit(None).cast("string"))
            .withColumn("wave_discovered", F.lit(0))
            .filter(scope_predicate(cfg))
        )
        return self.enqueue(frontier)

    # -- the micro-batch body ----------------------------------------------

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        self._batch_no = batch_id + 1
        if batch_df.isEmpty():
            return
        cfg = self.config
        pages_min = self.pages.select(
            "url_canon", "html", F.col("lang").alias("page_lang")
        )
        # hits via broadcast inner join + skinny anti-join for misses —
        # the fat corpus side never shuffles (see plans/engine.py)
        hits = pages_min.join(F.broadcast(batch_df), "url_canon", "inner")
        misses = (
            batch_df.join(pages_min.select("url_canon"), "url_canon",
                          "left_anti")
            .withColumn("html", F.lit(None).cast("binary"))
            .withColumn("page_lang", F.lit(None).cast("string"))
        )
        fetched = (
            hits.unionByName(misses)
            .withColumn(
                "redirect_to", redirect_target_udf("html", "url_canon")
            )
            .withColumn(
                "status",
                F.when(F.col("html").isNull(), F.lit(404))
                .when(F.col("redirect_to").isNotNull(), F.lit(302))
                .otherwise(F.lit(200)),
            )
            .withColumn("fetch_ts", F.current_timestamp())
            .persist()
        )
        # Per-batch directory keyed by batch_id, written with OVERWRITE:
        # foreachBatch is at-least-once under checkpoint recovery, so a
        # replayed micro-batch must replace its own output rather than
        # append a second copy (ADVICE.md r1 — the seen anti-join
        # prevents duplicate *enqueues* but not duplicate fetched rows).
        fetched.drop("html", "redirect_to").write.mode("overwrite").parquet(
            str(self.work / "fetched" / f"batch-{batch_id:08d}")
        )
        links = fetched.filter(F.col("status") == 200).select(
            F.col("url_canon").alias("parent_canon"),
            F.col("depth").alias("parent_depth"),
            F.explode(extract_links_udf("html", "url_canon")).alias("url"),
        ).unionByName(
            fetched.filter(F.col("status") == 302).select(
                F.col("url_canon").alias("parent_canon"),
                F.col("depth").alias("parent_depth"),
                F.col("redirect_to").alias("url"),
            )
        )
        new_links = (
            with_url_columns(links)
            .withColumn("depth", F.col("parent_depth") + 1)
            .withColumn("discovery_ts", F.current_timestamp())
            .withColumn("wave_discovered", F.lit(self._batch_no))
            .filter(scope_predicate(cfg))
        )
        self.enqueue(new_links)
        fetched.unpersist()

    def run(self, idle_timeout_s: float = 30.0,
            trigger_s: str = "1 second") -> None:
        """Seed, then stream until no new deltas appear (drain)."""
        self.seed()
        stream = (
            self.spark.readStream.schema(FRONTIER_SCHEMA)
            .parquet(str(self.work / "deltas"))
        )
        query = (
            stream.writeStream.foreachBatch(self._process_batch)
            .option(
                "checkpointLocation", str(self.work / "checkpoint")
            )
            .trigger(processingTime=trigger_s)
            .start()
        )
        try:
            idle_since = None
            while True:
                time.sleep(1.0)
                progress = query.lastProgress
                active = progress and progress["numInputRows"] > 0
                if active:
                    idle_since = None
                else:
                    idle_since = idle_since or time.monotonic()
                    if time.monotonic() - idle_since > idle_timeout_s:
                        break
        finally:
            query.stop()

    # -- results -----------------------------------------------------------

    def fetched(self) -> DataFrame:
        return self.spark.read.parquet(
            str(self.work / "fetched" / "batch-*")
        )

    def seen_set(self) -> DataFrame:
        return self._seen()
