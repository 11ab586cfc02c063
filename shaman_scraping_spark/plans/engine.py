"""CrawlEngine — the BSP wave loop (SURVEY.md §3.2 E1′/E2′).

The reference's async main loop (pick URL under per-host delay → HTTP
GET → archive → parse → enqueue; SURVEY.md §3.1, checkout empty §0)
becomes a driver-side loop of pure DataFrame waves: each wave is one
Spark DAG ending in atomic snapshot commits, so a killed job resumes
mid-frontier with identical downstream ordering (BASELINE.json).

Scale notes (the 100 TB design point):
* per-wave state lives in snapshot tables, never in driver memory —
  the only driver-side values are tiny scalars (row counts, wave no.);
* every politeness join broadcasts the host dimension (hosts ≪ URLs);
* the per-host quota cap bounds any host's scheduled rows per wave →
  bounded partition width under the host-keyed window shuffle even for
  hot domains (structural skew kill, SURVEY.md §4);
* each wave reads back what it wrote (write-read barrier) so plan
  lineage never grows across waves — the classic iterative-Spark trap;
* `html:binary` (the fat column) is touched only downstream of the
  fetch join and never carried into the frontier/seen tables.

Crash model: per-table manifests commit atomically (TableIO); a wave
is visible to resume only once the root `wave-complete` marker is
renamed in, after all table commits.  A crash mid-wave leaves the
previous marker → the wave re-runs idempotently (same inputs → same
deterministic outputs → same files overwritten).
"""

from __future__ import annotations

import json
import os
from datetime import timedelta
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType, TimestampType,
)

from shaman_scraping_spark.config import UNLIMITED_QUOTA, CrawlConfig
from shaman_scraping_spark.functions.html import (
    extract_links_udf, extract_text_udf, redirect_target_udf,
)
from shaman_scraping_spark.functions.url import with_url_columns
from shaman_scraping_spark.io.tableio import TableIO
from shaman_scraping_spark.operators.frontier import (
    FRONTIER_COLS, SEEN_KEY, anti_join_seen, dedup_urls, merge_frontier,
)
from shaman_scraping_spark.operators.politeness import (
    apply_robots_filter, build_host_state, refill_tokens, spend_tokens,
)
from shaman_scraping_spark.operators.topk import per_host_topk

FRONTIER_SCHEMA = StructType([
    StructField("url_canon", StringType()),
    StructField("url_hash", LongType()),
    StructField("host", StringType()),
    StructField("depth", IntegerType()),
    StructField("discovery_ts", TimestampType()),
    StructField("parent_canon", StringType()),
    StructField("wave_discovered", IntegerType()),
])


def load_canonical_corpus(spark: SparkSession, pages_path: str,
                          pages_partitions: int | None = None) -> DataFrame:
    """Canonicalized, unique-per-canonical-URL pages corpus, persisted.

    The fat ``html`` column never crosses an exchange: read splits are
    steered via maxPartitionBytes, and duplicate-canonical collapse
    (earliest capture wins) runs on a skinny projection + semi-join,
    and only when duplicates actually exist.
    """
    if pages_partitions:
        total = sum(
            f.stat().st_size for f in Path(pages_path).rglob("*")
            if f.is_file()
        ) or (Path(pages_path).stat().st_size
              if Path(pages_path).is_file() else 0)
        tgt = max(4 << 20, total // pages_partitions)
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(tgt))
    raw = spark.read.parquet(pages_path)
    pages = with_url_columns(raw)
    tot, dist = pages.agg(
        F.count("*"), F.count_distinct("url_canon")
    ).first()
    if tot != dist:
        winners = dedup_urls(
            pages.select(
                "url_canon", "url_hash",
                F.lit(0).alias("depth"),
                F.col("warc_ts").alias("discovery_ts"),
                F.col("url").alias("parent_canon"),
            )
        ).select("url_canon", F.col("parent_canon").alias("url"))
        pages = pages.join(winners, ["url_canon", "url"], "left_semi")
    return pages


def scope_predicate(config: CrawlConfig):
    """The ShouldScrape-style rule set as one Catalyst predicate (op 11)."""
    pred = F.lit(True)
    if config.allowed_hosts is not None:
        pred = pred & F.col("host").isin(*config.allowed_hosts)
    if config.include_regex:
        pred = pred & F.col("url_canon").rlike(config.include_regex)
    if config.exclude_regex:
        pred = pred & ~F.col("url_canon").rlike(config.exclude_regex)
    pred = pred & (F.col("depth") <= F.lit(config.max_depth))
    return pred


class CrawlEngine:
    """Drive a crawl over a pages corpus (parquet dir or DataFrame)."""

    def __init__(
        self,
        spark: SparkSession,
        config: CrawlConfig,
        pages_path: str,
        state_dir: str,
        record_emission: bool = True,
    ):
        self.spark = spark
        self.config = config
        self.io = TableIO(spark, state_dir)
        self.state_dir = Path(state_dir)
        self.record_emission = record_emission
        # Corpus strategy (measured, see BENCH/BASELINE.md notes):
        # the fat html column is NEVER cached and NEVER shuffled —
        # caching 6 GB of columnar-compressed html cost 55 s up-front
        # and saved ~12 s/scan; a parquet re-scan with column pruning
        # scales with cores instead.  Only a SKINNY metadata projection
        # persists (keys for anti-joins, hosts for politeness).
        self.pages = load_canonical_corpus(
            spark, pages_path, config.pages_partitions
        )
        self.pages_meta = self.pages.drop("html", "text").persist()
        # robots dimension parsed once for every corpus host (tiny);
        # per-wave host_state growth joins against this, so the pandas
        # UDF parse never re-runs inside the wave loop.
        self.pages_meta.count()  # materialize meta before dependents
        corpus_hosts = self.pages_meta.select("host").distinct()
        self.robots_dim = build_host_state(
            self.pages, corpus_hosts, config.default_crawl_delay
        ).persist()
        self.robots_dim.count()

    # --- wave-complete marker (cross-table atomicity) -----------------------

    def _marker_path(self) -> Path:
        return self.state_dir / "wave-complete.json"

    def _mark_complete(self, wave: int) -> None:
        tmp = self._marker_path().with_suffix(".tmp")
        tmp.write_text(json.dumps({"wave": wave}))
        os.rename(tmp, self._marker_path())

    def last_complete_wave(self) -> int | None:
        p = self._marker_path()
        if not p.exists():
            return None
        return json.loads(p.read_text())["wave"]

    # --- initialization -----------------------------------------------------

    def init_state(self) -> None:
        """Wave 0 frontier from seeds; empty seen/host_state."""
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
        )
        frontier = dedup_urls(frontier).filter(scope_predicate(cfg))
        self.io.commit("frontier", frontier.select(*FRONTIER_COLS), wave=0)
        empty_seen = self.spark.createDataFrame(
            [], "url_hash long, url_canon string"
        )
        self.io.commit("seen", empty_seen, wave=0, mode="append")
        empty_hs = self.spark.createDataFrame(
            [],
            "host string, rules array<struct<allow:boolean,prefix:string>>, "
            "crawl_delay double, tokens double, budget_used long",
        )
        self.io.commit("host_state", empty_hs, wave=0)
        self._mark_complete(-1)  # no wave executed yet; wave 0 inputs ready

    # --- one wave -----------------------------------------------------------

    def run_wave(self, wave: int) -> int:
        """Execute wave *wave*; returns number of URLs scheduled."""
        import sys
        import time as _time

        profile = os.environ.get("SSSPARK_PROFILE") == "1"
        _last = _time.monotonic()

        def _t(label: str) -> None:
            nonlocal _last
            if profile:
                now = _time.monotonic()
                print(f"[wave {wave}] {label}: {now - _last:.2f}s",
                      file=sys.stderr, flush=True)
                _last = now

        cfg = self.config
        spark = self.spark
        frontier = self.io.load("frontier", wave)
        seen = self.io.load("seen", wave)
        host_state = self.io.load("host_state", wave)

        _t("load+isEmpty")
        if frontier.isEmpty():
            self._commit_empty(wave, seen, host_state)
            return 0

        # 1. extend host_state with newly-discovered hosts (robots fetch
        #    is out-of-band: no quota cost, not in the emission log);
        #    robots_dim is precomputed — hosts outside the corpus get
        #    allow-all defaults here
        hosts = frontier.select("host").distinct()
        new_hosts = hosts.join(host_state.select("host"), "host", "left_anti")
        new_state = (
            new_hosts.join(F.broadcast(self.robots_dim), "host", "left")
            .select(
                "host",
                F.coalesce(F.col("rules"), F.array()).alias("rules"),
                F.coalesce(
                    F.col("crawl_delay"), F.lit(cfg.default_crawl_delay)
                ).alias("crawl_delay"),
            )
            .withColumn("tokens", F.lit(0.0))
            .withColumn("budget_used", F.lit(0).cast("long"))
        )
        host_state = host_state.unionByName(new_state)
        host_state = refill_tokens(
            host_state, cfg.wave_seconds, cfg.bucket_cap, UNLIMITED_QUOTA
        )
        if cfg.max_pages_per_host is not None:
            host_state = host_state.withColumn(
                "quota",
                F.least(
                    F.col("quota"),
                    F.greatest(
                        F.lit(0).cast("long"),
                        F.lit(cfg.max_pages_per_host) - F.col("budget_used"),
                    ),
                ),
            )

        # 2. robots gate → 3. per-host top-k under quota
        fr = apply_robots_filter(frontier, host_state)
        blocked = fr.filter(~F.col("allowed"))
        eligible = fr.filter(F.col("allowed")).join(
            F.broadcast(host_state.select("host", "quota")), "host"
        )
        ranked = per_host_topk(eligible, "quota").persist()
        scheduled = ranked.filter(F.col("scheduled"))
        remaining = ranked.filter(~F.col("scheduled")).select(*FRONTIER_COLS)

        # 4. fetch + content processing, ONE pass over the wave's html,
        # materialized directly by the fetched-table commit (the
        # write-read barrier then feeds links/lineage from the skinny
        # read-back — html is never cached, never shuffled):
        #   hits   = pages ⋈ broadcast(scheduled)  [inner BHJ, build =
        #            skinny side; corpus parquet merely streamed]
        #   misses = scheduled ∖ pages-keys         [skinny anti-join]
        # At 10^10-page scale the broadcast is replaced by bucketing
        # pages on url_hash at write time — same no-fat-shuffle goal.
        pages_min = self.pages.select(
            F.col("url_canon"), F.col("warc_ts"), F.col("html"),
            F.col("lang").alias("page_lang"),
        )
        fetch_ts = cfg.t0 + timedelta(seconds=wave * cfg.wave_seconds)
        sched_keys = scheduled.select("url_canon", "url_hash", "host",
                                      "depth")
        hits = pages_min.join(F.broadcast(sched_keys), "url_canon", "inner")
        misses = (
            sched_keys.join(self.pages_meta.select("url_canon"),
                            "url_canon", "left_anti")
            .withColumn("warc_ts", F.lit(None).cast("timestamp"))
            .withColumn("html", F.lit(None).cast("binary"))
            .withColumn("page_lang", F.lit(None).cast("string"))
        )
        enriched = (
            hits.unionByName(misses)
            .withColumn("redirect_to", redirect_target_udf("html", "url_canon"))
            .withColumn(
                "status",
                F.when(F.col("html").isNull(), F.lit(404))
                .when(F.col("redirect_to").isNotNull(), F.lit(302))
                .otherwise(F.lit(200)),
            )
            .withColumn("text", F.when(F.col("status") == 200,
                                       extract_text_udf("html")))
            .withColumn(
                "links",
                F.when(F.col("status") == 200,
                       extract_links_udf("html", "url_canon"))
                .otherwise(F.array().cast("array<string>")),
            )
            .withColumn("n_bytes",
                        F.coalesce(F.length("html"), F.lit(0)))
            .withColumn("wave", F.lit(wave))
            .withColumn("fetch_ts", F.lit(fetch_ts))
        )
        if not cfg.archive_html:
            enriched = enriched.drop("html")
        _t("plan-build")
        self.io.commit("fetched", enriched, wave, mode="append")
        _t("fetched-commit")
        # read back this wave's slice (skinny columns only from here on)
        fdf = self.io.load_delta("fetched", wave)

        # 5. link discovery: a[href] from 200s + redirect targets
        links_200 = fdf.filter(F.col("status") == 200).select(
            F.col("url_canon").alias("parent_canon"),
            F.col("depth").alias("parent_depth"),
            F.explode("links").alias("url"),
        )
        links_302 = fdf.filter(F.col("status") == 302).select(
            F.col("url_canon").alias("parent_canon"),
            F.col("depth").alias("parent_depth"),
            F.col("redirect_to").alias("url"),
        )
        discovery_ts = cfg.t0 + timedelta(seconds=(wave + 1) * cfg.wave_seconds)
        new_links = (
            with_url_columns(links_200.unionByName(links_302))
            .withColumn("depth", F.col("parent_depth") + 1)
            .withColumn("discovery_ts", F.lit(discovery_ts))
            .withColumn("wave_discovered", F.lit(wave + 1))
            .filter(scope_predicate(cfg))
            .select(*FRONTIER_COLS)
        )

        # 6. state updates.  No distinct() on seen: frontier rows were
        # anti-joined against seen at merge time, and scheduled/blocked
        # partition the frontier — the union is duplicate-free by
        # construction.  The seen table is append-mode: each wave
        # persists only its delta (WARC-index pattern), never rewrites
        # the accumulated set.
        seen_delta = scheduled.select(*SEEN_KEY).unionByName(
            blocked.select(*SEEN_KEY)
        )
        seen_next = seen.unionByName(seen_delta)
        if cfg.seen_prefilter == "bloom":
            # op 12: cheap membership probe before the exact anti-join.
            # Definitely-unseen links (no false negatives) skip the
            # anti-join entirely; only maybe-seen rows pay for it.
            # `remaining` rows are unseen by construction.  The delta
            # folds in BEFORE probing — links rediscovering a URL
            # scheduled this very wave must read as maybe-seen.
            self._save_bloom(wave, seen_delta)
            bloom = self._load_bloom(wave + 1)
            from shaman_scraping_spark.operators.frontier import (
                FRONTIER_COLS as _FC,
            )
            if bloom is not None:
                from shaman_scraping_spark.operators.sketch import bloom_probe

                probed = bloom_probe(
                    new_links.select(*_FC), bloom
                ).persist()
                definite = probed.filter(~F.col("maybe_seen")).drop(
                    "maybe_seen"
                )
                maybe = anti_join_seen(
                    probed.filter(F.col("maybe_seen")).drop("maybe_seen"),
                    seen_next,
                )
                frontier_next = dedup_urls(
                    remaining.select(*_FC)
                    .unionByName(definite)
                    .unionByName(maybe)
                )
            else:
                frontier_next = merge_frontier(remaining, new_links,
                                               seen_next)
        else:
            frontier_next = merge_frontier(remaining, new_links, seen_next)
        # per-host emitted counts: collected driver-side (≤ #hosts rows)
        # so one action yields both the scheduled total and the
        # token-spend dimension
        emitted_rows = scheduled.groupBy("host").agg(
            F.count("*").alias("emitted_count")
).collect()
        _t("emitted-collect")
        n_scheduled = sum(r["emitted_count"] for r in emitted_rows)
        emitted = self.spark.createDataFrame(
            emitted_rows or [], "host string, emitted_count long"
        )
        host_state_next = spend_tokens(
            host_state.drop("quota"), emitted
        ).select("host", "rules", "crawl_delay", "tokens", "budget_used")

        # 7. lineage: per-partition per-wave rows (SURVEY.md §2A op 6),
        # from the read-back slice (pruned scan: n_bytes only)
        lineage = fdf.groupBy(
            F.spark_partition_id().alias("partition_id")
        ).agg(
            F.count("*").alias("urls_emitted"),
            F.coalesce(F.sum("n_bytes"), F.lit(0)).alias("bytes_fetched"),
        ).withColumn("wave", F.lit(wave))

        # 8. remaining commits — data tables first, marker last
        self.io.commit("lineage", lineage, wave, mode="append")
        _t("lineage-commit")
        if self.record_emission:
            # golden_quota fixture (test/golden path only)
            quota_log = (
                host_state.select("host", "quota")
                .join(emitted, "host", "left")
                .select(
                    "host", F.lit(wave).alias("wave"),
                    F.col("quota"),
                    F.coalesce(F.col("emitted_count"), F.lit(0))
                    .alias("emitted"),
                )
            )
            self.io.commit("quota_log", quota_log, wave, mode="append")
        if self.record_emission:
            # test/golden path only: the global rank forces a single
            # window partition — the engine's hot path never needs it
            emission = scheduled.withColumn(
                "emit_rank",
                F.row_number().over(
                    Window.orderBy("depth", "discovery_ts", "url_canon")
                ),
            ).select(
                F.lit(wave).alias("wave"), "emit_rank",
                F.col("url_canon").alias("url"), "depth", "host",
            )
            self.io.commit("emission", emission, wave, mode="append")
        self.io.commit("seen", seen_delta, wave + 1, mode="append")
        _t("seen-commit")
        self.io.commit("frontier", frontier_next, wave + 1)
        _t("frontier-commit")
        self.io.commit("host_state", host_state_next, wave + 1)
        _t("hoststate-commit")
        self._mark_complete(wave)
        ranked.unpersist()
        if cfg.seen_prefilter == "bloom":
            try:
                probed.unpersist()
            except NameError:
                pass  # first wave: no bloom yet → no probed df
        return n_scheduled

    # --- bloom prefilter state (op 12; flag-gated) --------------------------

    def _bloom_path(self, wave: int) -> Path:
        return self.state_dir / f"bloom-{wave:06d}.bin"

    def _load_bloom(self, wave: int):
        import numpy as np

        from shaman_scraping_spark.operators.sketch import BloomFilter

        p = self._bloom_path(wave)
        if not p.exists():
            return None
        return BloomFilter(
            np.frombuffer(p.read_bytes(), dtype=np.uint8),
            self.config.bloom_bits, self.config.bloom_hashes,
        )

    def _save_bloom(self, wave: int, seen_delta: DataFrame) -> None:
        """bits(wave+1) = bits(wave) | build(delta) — incremental, so
        the filter never rebuilds over the full seen set."""
        import numpy as np

        from shaman_scraping_spark.operators.sketch import bloom_build

        delta = bloom_build(
            seen_delta, m_bits=self.config.bloom_bits,
            k=self.config.bloom_hashes,
        )
        prev = self._load_bloom(wave)
        bits = delta.bits if prev is None else np.bitwise_or(
            prev.bits, delta.bits
        )
        tmp = self._bloom_path(wave + 1).with_suffix(".tmp")
        tmp.write_bytes(bits.tobytes())
        os.rename(tmp, self._bloom_path(wave + 1))

    def _commit_empty(self, wave: int, seen: DataFrame,
                      host_state: DataFrame) -> None:
        """Frontier drained: carry state forward so resume stays valid."""
        self.io.commit("seen", seen.limit(0), wave + 1, mode="append")
        self.io.commit(
            "frontier",
            self.spark.createDataFrame([], FRONTIER_SCHEMA),
            wave + 1,
        )
        self.io.commit("host_state", host_state, wave + 1)
        self._mark_complete(wave)

    # --- full run / resume --------------------------------------------------

    def run(self, resume: bool = False) -> int:
        """Run to frontier-drain or max_waves; returns waves executed.

        resume=True continues after the last complete wave (op 5).
        """
        if resume and self.last_complete_wave() is not None:
            start = self.last_complete_wave() + 1
        else:
            self.init_state()
            start = 0
        waves_run = 0
        for w in range(start, self.config.max_waves):
            n = self.run_wave(w)
            waves_run += 1
            if n == 0:
                frontier = self.io.load("frontier", w + 1)
                if frontier.isEmpty():
                    break
        return waves_run
