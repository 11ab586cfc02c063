"""CrawlEngine — the BSP wave loop (SURVEY.md §3.2 E1′/E2′).

The reference's async main loop (pick URL under per-host delay → HTTP
GET → archive → parse → enqueue; SURVEY.md §3.1, checkout empty §0)
becomes a driver-side loop of pure DataFrame waves: each wave is one
Spark DAG ending in atomic snapshot commits, so a killed job resumes
mid-frontier with identical downstream ordering (BASELINE.json).

Scale notes (the 100 TB design point):
* per-wave state lives in snapshot tables, never in driver memory —
  the only driver-side values are tiny scalars (manifest row counts,
  wave no., ≤n_buckets bucket ids);
* a wave runs exactly ONE Python boundary (the combined redirect+
  text+links pandas UDF) and ZERO bookkeeping actions: frontier
  emptiness and scheduled counts come from parquet-footer counts
  recorded in the manifests at commit time;
* the independent end-of-wave commits (lineage, seen, frontier,
  host_state, …) run as CONCURRENT Spark jobs from driver threads —
  wall cost ≈ max(job), not Σ(job);
* redirect chains resolve via a closure table precomputed at init
  (one extra equi-join per wave, constant plan size in the hop cap);
* every politeness join broadcasts the host dimension (hosts ≪ URLs);
* the per-host quota cap bounds any host's scheduled rows per wave →
  bounded partition width under the host-keyed window shuffle even for
  hot domains (structural skew kill, SURVEY.md §4);
* each wave reads back what it wrote (write-read barrier) so plan
  lineage never grows across waves — the classic iterative-Spark trap;
* `html:binary` (the fat column) is touched only downstream of the
  fetch join and never carried into the frontier/seen tables; with
  `corpus_buckets` set the fetch join also PRUNES the corpus scan to
  the hive buckets the scheduled keys hit.

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
from shaman_scraping_spark.functions.html import make_process_html_udf
from shaman_scraping_spark.functions.url import url_template, with_url_columns
from shaman_scraping_spark.io.tableio import TableIO
from shaman_scraping_spark.operators.frontier import (
    FRONTIER_COLS, SEEN_KEY, anti_join_seen, dedup_urls,
)
from shaman_scraping_spark.operators.politeness import (
    apply_robots_filter, build_host_state, refill_tokens,
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


def local_path(path: str) -> Path | None:
    """*path* as a local ``Path``, or None for scheme-prefixed storage
    (s3://, hdfs://, …) that ``Path.stat()`` cannot probe — callers
    must then skip driver-side sizing/fingerprinting (ADVICE r3: the
    probes crashed engine init on exactly the cluster paths the
    bucketed strategy targets).

    file:// URIs parse via urllib (ADVICE r4: slicing at len(match)-1
    yielded the implementation-defined ``//tmp/x`` anchor for
    ``file:///tmp/x`` and misread ``file://host/path``'s authority as
    the path root); a non-local authority is treated like any other
    remote scheme."""
    import re
    from urllib.parse import urlsplit
    from urllib.request import url2pathname

    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", path)
    if m is None:
        return Path(path)
    if m.group(1).lower() == "file":
        parts = urlsplit(path)
        if parts.netloc not in ("", "localhost"):
            return None  # remote authority — not a driver-local path
        return Path(url2pathname(parts.path))
    return None


def _path_bytes(p: Path) -> int:
    """Total bytes under a local file or directory."""
    if p.is_dir():
        return sum(f.stat().st_size for f in p.rglob("*") if f.is_file())
    return p.stat().st_size if p.exists() else 0


def canonical_pages(spark: SparkSession, pages_path: str,
                    pages_partitions: int | None = None) -> DataFrame:
    """The raw corpus with URL columns stamped — the lazy prologue of
    :func:`load_canonical_corpus` (no Spark action)."""
    src = local_path(pages_path) if pages_partitions else None
    if pages_partitions and src is not None:
        total = _path_bytes(src)
        tgt = max(4 << 20, total // pages_partitions)
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(tgt))
    raw = spark.read.parquet(pages_path)
    return with_url_columns(raw)


def collapse_duplicate_canon(pages: DataFrame) -> DataFrame:
    """Collapse duplicate-canonical captures to the earliest one.

    Winner = earliest (warc_ts, url) per canonical URL, so a
    RECRAWL — two captures of the same url string — collapses to
    the earliest capture.  The semi-join keys on a per-row id
    (NOT the natural key): two BYTE-IDENTICAL captures share
    (url_canon, url, warc_ts), so a natural-key semi-join keeps
    both and duplicates every downstream fetched row (ADVICE.md
    r2).  monotonically_increasing_id is partition-offset-based —
    deterministic for a parquet read under fixed splits, and
    recomputed identically on both join branches (same lineage).
    xxhash64(html) precedes __rid in the tiebreak so the winner
    among same-key captures is content-deterministic; only the
    skinny key columns + two hashes cross the window shuffle —
    html itself never does.  Matches the simulator's by_canon
    min-(ts, url) rule.
    """
    pages = pages.withColumn("__rid", F.monotonically_increasing_id())
    w = Window.partitionBy("url_canon").orderBy(
        F.col("warc_ts").asc(), F.col("url").asc(),
        F.col("__h").asc(), F.col("__rid").asc(),
    )
    winners = (
        pages.select(
            "url_canon", "url", "warc_ts", "__rid",
            F.xxhash64("html").alias("__h"),
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("__rid")
    )
    return pages.join(winners, "__rid", "left_semi").drop("__rid")


def load_canonical_corpus(spark: SparkSession, pages_path: str,
                          pages_partitions: int | None = None) -> DataFrame:
    """Canonicalized, unique-per-canonical-URL pages corpus, persisted.

    The fat ``html`` column never crosses an exchange: read splits are
    steered via maxPartitionBytes, and duplicate-canonical collapse
    (earliest capture wins) runs on a skinny projection + semi-join,
    and only when duplicates actually exist.
    """
    pages = canonical_pages(spark, pages_path, pages_partitions)
    tot, dist = pages.agg(
        F.count("*"), F.count_distinct("url_canon")
    ).first()
    if tot != dist:
        pages = collapse_duplicate_canon(pages)
    return pages


def static_scope_predicate(config: CrawlConfig):
    """The depth-independent ShouldScrape rules (host allowlist +
    include/exclude regex) — precomputable on static inputs like the
    redirect map."""
    pred = F.lit(True)
    if config.allowed_hosts is not None:
        pred = pred & F.col("host").isin(*config.allowed_hosts)
    if config.include_regex:
        pred = pred & F.col("url_canon").rlike(config.include_regex)
    if config.exclude_regex:
        pred = pred & ~F.col("url_canon").rlike(config.exclude_regex)
    return pred


def scope_predicate(config: CrawlConfig):
    """The ShouldScrape-style rule set as one Catalyst predicate (op 11)."""
    return static_scope_predicate(config) & (
        F.col("depth") <= F.lit(config.max_depth)
    )


class CrawlEngine:
    """Drive a crawl over a pages corpus (parquet dir or DataFrame)."""

    def __init__(
        self,
        spark: SparkSession,
        config: CrawlConfig,
        pages_path: str,
        state_dir: str,
        record_emission: bool = False,
    ):
        import sys
        import time as _time

        _prof = os.environ.get("SSSPARK_PROFILE") == "1"
        _last = _time.monotonic()

        def _t(label: str) -> None:
            nonlocal _last
            if _prof:
                now = _time.monotonic()
                print(f"[init] {label}: {now - _last:.2f}s",
                      file=sys.stderr, flush=True)
                _last = now

        self.spark = spark
        self.config = config
        if config.warc_dir and not config.archive_html:
            raise ValueError("warc_dir requires archive_html=True "
                             "(the archive needs the payload bytes)")
        self.io = TableIO(spark, state_dir)
        self.state_dir = Path(state_dir)
        # opt-in (VERDICT r3 item 3): the emission log's global-order
        # window is a one-task global sort — a test/golden mechanism,
        # never a production default (at a 10^7-row wave it serializes
        # the whole schedule through one partition)
        self.record_emission = record_emission
        # capture every session conf this engine mutates so close()
        # restores them — a shared session running other queries after
        # a bucketed engine must not inherit engine-tuned values
        # (VERDICT r3 item 4)
        self._saved_confs: dict[str, str | None] = {
            k: spark.conf.get(k, None)
            for k in ("spark.sql.shuffle.partitions",
                      "spark.sql.files.maxPartitionBytes",
                      "spark.sql.legacy.bucketedTableScan.outputOrdering")
        }
        if config.shuffle_partitions:
            # a DATA-size knob (frontier/seen rows per wave), not a
            # core-count knob: the wave loop runs ~10 jobs × several
            # shuffle stages per wave, so surplus partitions multiply
            # pure task-scheduling overhead into every one of them
            # (measured: 128 → 8 partitions cut the 20k-page bench
            # crawl wall 2.4×; the scan-side parallelism that feeds
            # the extraction UDF comes from input splits, not this)
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(config.shuffle_partitions),
            )
        if config.state_layout not in ("snapshot", "delta"):
            raise ValueError(f"unknown state_layout: {config.state_layout}")
        self.state_layout = config.state_layout
        if config.seen_layout not in ("dirs", "bucketed"):
            raise ValueError(f"unknown seen_layout: {config.seen_layout}")
        self.seen_layout = config.seen_layout
        # op 52: deterministic retry/backoff (spec in config.py)
        self.retry_enabled = config.flaky_permille > 0
        # op 54: crawl-trap guard (spec in config.py)
        self.trap_enabled = config.trap_threshold > 0
        # a state dir is laid out for exactly one layout pair — resuming
        # it under another would misread frontier/host_state manifests
        # (state_layout) or silently drop / crash on the seen chain
        # (seen_layout; ADVICE r4: a dirs→bucketed resume read only the
        # bucketed catalog rows, dropping every earlier dirs-wave seen
        # row, and bucketed→dirs died on manifest chaining)
        lp = self.state_dir / "_engine.json"
        if lp.exists():
            meta = json.loads(lp.read_text())
            got = meta.get("state_layout")
            if got != self.state_layout:
                raise ValueError(
                    f"state dir was written with state_layout={got!r}; "
                    f"config asks for {self.state_layout!r} — clear the "
                    "state dir or match the existing layout"
                )
            got_seen = meta.get("seen_layout")
            # pre-r5 state dirs did not record seen_layout — skip the
            # guard there rather than refuse every legacy resume
            if got_seen is not None and got_seen != self.seen_layout:
                raise ValueError(
                    f"state dir was written with seen_layout={got_seen!r}; "
                    f"config asks for {self.seen_layout!r} — clear the "
                    "state dir or match the existing layout"
                )
            # op 52: toggling retries mid-state would change the
            # fetched schema (attempt column) and orphan pending
            # retry rows — refuse, like the layout guards above
            got_retry = meta.get("retry_enabled")
            if got_retry is not None and got_retry != \
                    (config.flaky_permille > 0):
                raise ValueError(
                    f"state dir was written with retry_enabled="
                    f"{got_retry!r}; config asks for "
                    f"{config.flaky_permille > 0!r} — clear the state "
                    "dir or match the existing setting"
                )
            # op 54: toggling (or re-thresholding) the trap guard
            # mid-state would change which URLs the remaining waves
            # may fetch — the resumed run would diverge from both an
            # uninterrupted run at either setting
            got_trap = meta.get("trap_threshold")
            if got_trap is not None and got_trap != config.trap_threshold:
                raise ValueError(
                    f"state dir was written with trap_threshold="
                    f"{got_trap!r}; config asks for "
                    f"{config.trap_threshold!r} — clear the state dir "
                    "or match the existing setting"
                )
        # Corpus strategy (measured, see BENCH/BASELINE.md notes):
        # the fat html column is NEVER cached and NEVER shuffled —
        # caching 6 GB of columnar-compressed html cost 55 s up-front
        # and saved ~12 s/scan; a parquet re-scan with column pruning
        # scales with cores instead.  Only a SKINNY metadata projection
        # persists (keys for anti-joins, hosts for politeness).
        _t("guards")
        if config.fetch_join not in ("auto", "broadcast", "bucketed"):
            raise ValueError(f"unknown fetch_join: {config.fetch_join}")
        self.fetch_join = config.fetch_join
        if self.fetch_join == "auto":
            # corpus bytes decide the strategy (config.py rationale):
            # the SMJ exists to avoid the driver-serial broadcast
            # build, which only matters once the corpus outgrows a
            # single cheap scan pass.  Non-local corpus paths (s3://,
            # hdfs://) can't be stat'd from the driver — a remote
            # corpus is cluster-sized by assumption, so default to the
            # scale strategy instead of crashing (ADVICE r3).
            src = local_path(pages_path)
            self.fetch_join = (
                "broadcast"
                if src is not None
                and _path_bytes(src) <= config.fetch_join_broadcast_max_bytes
                else "bucketed"
            )
        if config.pages_partitions is None:
            # documented default (config.py): size read splits from the
            # CORPUS, not a constant — the session's 32 MB default
            # leaves a small corpus (e.g. the 20k-page bench file, one
            # 3.9 MB file of 10 row groups) as ONE unsplittable scan
            # task, serializing every wave's fetch-join + extraction
            # UDF leg onto one core (guide §2.5 "input skew").
            # total/(4·parallelism) targets ~4 waves of scan tasks per
            # core; clamped to [1 MB, session default] so a large
            # corpus keeps the measured 32 MB pipelining granularity
            # and tiny corpora don't explode into per-kilobyte tasks.
            src0 = local_path(pages_path)
            if src0 is not None:
                total0 = _path_bytes(src0)
                try:
                    cur = int(spark.conf.get(
                        "spark.sql.files.maxPartitionBytes"))
                except (TypeError, ValueError):
                    cur = 128 << 20
                par = spark.sparkContext.defaultParallelism
                tgt0 = max(1 << 20, total0 // max(1, 4 * par))
                if tgt0 < cur:
                    spark.conf.set(
                        "spark.sql.files.maxPartitionBytes", str(tgt0))
        if self.fetch_join == "broadcast" and not config.corpus_buckets:
            # r6 single-scan init (guide §1.2 — remove unnecessary
            # passes): the old order ran the duplicate-canonical probe
            # agg over the RAW corpus (full canonicalization pass) and
            # then pinned the skinny meta projection in a SECOND
            # canonicalization pass.  Pinning first and probing the
            # pinned leaf scan computes the same (tot, dist) —
            # pages_meta has exactly the corpus rows — for one corpus
            # pass plus a cheap skinny-scan agg; tot comes free from
            # the written parquet footers.  The (rare) duplicate-canon
            # corpus pays one extra collapse + re-pin, as before.
            pages = canonical_pages(spark, pages_path,
                                    config.pages_partitions)
            meta = self._pin("pages_meta", pages.drop("html", "text"))
            tot = TableIO._dir_row_count(
                self.state_dir / "_dims" / "pages_meta")
            dist = meta.agg(F.count_distinct("url_canon")).first()[0]
            if tot != dist:
                pages = collapse_duplicate_canon(pages)
                meta = self._pin("pages_meta", pages.drop("html", "text"))
            self.pages = pages
            self.pages_meta = meta
        else:
            self.pages = load_canonical_corpus(
                spark, pages_path, config.pages_partitions
            )
        _t("canonical-corpus")
        if self.fetch_join == "bucketed":
            # corpus_buckets COMPOSES here (VERDICT r2 item 2): the
            # bucketBy join table is additionally hive-partitioned by
            # pbucket, so each wave's SMJ corpus side is both
            # exchange-free AND pruned to the hit buckets
            self.pages = self._bucketize_join_table(
                config.fetch_join_buckets, pages_path,
                part_buckets=config.corpus_buckets,
            )
            # honor the table's sortBy files: without this Spark
            # ignores bucket sort metadata and RE-SORTS the fat corpus
            # side inside every wave's SMJ (measured: the dominant
            # fetched-commit cost at the 600k-page scaling corpus).
            # Spark applies it only when a bucket is one file — true
            # for the flat layout (we repartition on the bucket key at
            # write); with hive pbucket partitions (>1 file/bucket)
            # Spark falls back to sorting the then-pruned, small scan.
            spark.conf.set(
                "spark.sql.legacy.bucketedTableScan.outputOrdering",
                "true",
            )
        elif config.corpus_buckets:
            self.pages = self._bucketize_corpus(config.corpus_buckets)
        if not hasattr(self, "pages_meta"):
            self.pages_meta = self.pages.drop("html", "text")
            if self.fetch_join == "broadcast":
                # broadcast mode keeps the raw corpus plan
                # (canonicalization expression tree over the parquet
                # scan) — pin the skinny projection so per-wave plans
                # embed a leaf scan instead (bucketed mode reads a
                # materialized table already)
                self.pages_meta = self._pin("pages_meta", self.pages_meta)
        # no eager .count() here (r6): the pin already materialized the
        # projection to parquet — the expensive part; the persist cache
        # fills lazily on the robots-dim build below, saving one init
        # Spark job per engine
        self.pages_meta = self.pages_meta.persist()
        _t("fetch-join-setup")
        # robots dimension parsed once for every corpus host (tiny);
        # per-wave host_state growth joins against this, so the pandas
        # UDF parse never re-runs inside the wave loop.
        corpus_hosts = self.pages_meta.select("host").distinct()
        # the wave loop's single Python boundary (redirect+text+links
        # in one Arrow pass over the fat html column)
        self.process_udf = make_process_html_udf(config.link_patterns)
        # Init dimension builds (robots / sitemap / raw redirect map)
        # are INDEPENDENT corpus passes — run their pin jobs as
        # concurrent driver-thread jobs (guide §2.6 "overlap
        # independent jobs"): wall ≈ max(pass), not Σ(pass).  Only the
        # closure join below depends on robots, and it runs over two
        # already-pinned tiny leaf scans.
        from concurrent.futures import ThreadPoolExecutor

        def _build_robots():
            return self._pin(
                "robots_dim",
                build_host_state(
                    self.pages, corpus_hosts, config.default_crawl_delay,
                    config.user_agent,
                ),
            ).persist()

        init_jobs = {"robots": _build_robots}
        # sitemap dimension (op 49, spec in sources/sitemap.py): built
        # ONCE at init like the robots dim — (host, sm_src, url) rows
        # of every <loc> a host's robots-declared sitemaps list, with
        # sitemapindex documents expanded one level.  Pure Catalyst
        # (UTF-8 cast + regexp_extract_all, the SAME patterns the
        # oracle's `re` uses); per-wave cost is one tiny join against
        # the newly-discovered hosts.
        if config.use_sitemaps:
            from shaman_scraping_spark.sources.sitemap import (
                build_sitemap_dim,
            )

            def _build_sitemap():
                return self._pin(
                    "sitemap_dim", build_sitemap_dim(self.pages)
                ).persist()

            init_jobs["sitemap"] = _build_sitemap
        # redirect map (src → target), built ONCE at init so in-wave
        # hop chains resolve as bounded lazy joins — never an extra
        # per-wave corpus scan or Spark action (SURVEY.md §2C op 20).
        # JVM substring prefilter: every §B.2-decodable charset is
        # ASCII-transparent, so a meta-refresh page always contains the
        # literal bytes "http-equiv" — only those rows (~redirect_frac)
        # cross into the exact Python kernel.  Everything that is
        # STATIC per target — canonicalization, depth-free scope rules,
        # the robots verdict — is also precomputed here, so each wave's
        # per-hop plan is a tiny join+window+anti-join (the first cut
        # re-derived all of it per level per wave and drowned the
        # driver in Catalyst analysis time).
        if config.max_redirect_hops > 0:
            from shaman_scraping_spark.functions.html import (
                redirect_target_udf,
            )

            raw_map = (
                self.pages
                .filter(F.col("html").cast("string").contains("http-equiv"))
                .select("url_canon", "html")
                .withColumn("rt", redirect_target_udf("html", "url_canon"))
                .filter(F.col("rt").isNotNull())
                .select(F.col("url_canon").alias("src_canon"),
                        F.col("rt").alias("url"))
            )

            def _build_redirect_map():
                return self._pin("redirect_map", raw_map)

            init_jobs["redirect_map"] = _build_redirect_map
        with ThreadPoolExecutor(max_workers=len(init_jobs)) as pool:
            futs = {n: pool.submit(fn) for n, fn in init_jobs.items()}
            dims = {n: f.result() for n, f in futs.items()}
        self.robots_dim = dims["robots"]
        self.sitemap_dim = dims.get("sitemap")
        _t("robots-dim")
        if config.max_redirect_hops > 0:
            base = apply_robots_filter(
                with_url_columns(dims["redirect_map"])
                .filter(static_scope_predicate(config)),
                self.robots_dim.select("host", "rules"),
            ).select("src_canon", "url_canon", "url_hash", "host",
                     "allowed")
            # ≤k-hop closure: row (src, dst@hop_no, pred, allowed).
            # Chains extend only through allowed targets (a blocked
            # target is never fetched, so its redirect is never seen).
            level = base.select(
                "src_canon", "url_canon", "url_hash", "host", "allowed",
                F.col("src_canon").alias("pred_canon"),
                F.lit(1).alias("hop_no"),
            )
            parts = [level]
            for k in range(2, config.max_redirect_hops + 1):
                level = (
                    level.filter(F.col("allowed")).alias("p")
                    .join(base.alias("m"),
                          F.col("p.url_canon") == F.col("m.src_canon"))
                    .select(
                        F.col("p.src_canon").alias("src_canon"),
                        F.col("m.url_canon").alias("url_canon"),
                        F.col("m.url_hash").alias("url_hash"),
                        F.col("m.host").alias("host"),
                        F.col("m.allowed").alias("allowed"),
                        F.col("p.url_canon").alias("pred_canon"),
                        F.lit(k).alias("hop_no"),
                    )
                )
                parts.append(level)
            closure = parts[0]
            for p in parts[1:]:
                closure = closure.unionByName(p)
            self.redirect_closure = self._pin(
                "redirect_closure", closure
            ).persist()
            _t("redirect-closure")
        else:
            self.redirect_closure = None

    def _pin(self, name: str, df: DataFrame) -> DataFrame:
        """Materialize an init-time dimension to parquet under the
        state dir and return its scan.

        Why (VERDICT r4 item 5): PySpark analyzes the full logical
        plan eagerly on every DataFrame transformation, so a deep
        init-time subtree (the robots pandas-UDF parse, the ≤k-hop
        redirect closure's join union, the sitemap regex dimension)
        embedded in every wave's plan is RE-analyzed dozens of times
        per wave — ~6 s/run of pure Catalyst time on the 6-wave
        BASELINE profile.  Persisting does not help: persist caches
        execution, not analysis.  A write-read barrier truncates the
        lineage to a leaf scan — the same trick the wave loop itself
        uses (§4 "iterative-loop lineage growth").  Compared to
        localCheckpoint this is also reliable storage: resume-safe
        and executor-loss-safe, the honest cluster analogue.  The
        write doubles as the materialization the old `.count()`
        forced, and the dims are tiny (hosts / redirect pages, never
        the corpus).
        """
        out = self.state_dir / "_dims" / name
        df.write.mode("overwrite").parquet(str(out))
        return self.spark.read.parquet(str(out))

    def close(self) -> None:
        """Release the engine's init-time persisted state (skinny
        corpus metadata, robots dimension, redirect closure) and
        restore every session conf the engine mutated at init
        (VERDICT r3 item 4).  Long sessions that construct several
        engines (benchmarks, tests) MUST call this between engines —
        leaked cache blocks degrade every later run in the JVM."""
        for df in (getattr(self, "pages_meta", None),
                   getattr(self, "robots_dim", None),
                   getattr(self, "sitemap_dim", None),
                   getattr(self, "redirect_closure", None)):
            if df is not None:
                try:
                    df.unpersist()
                except Exception:  # noqa: BLE001 — already released
                    pass
        for k, v in getattr(self, "_saved_confs", {}).items():
            try:
                if v is None:
                    self.spark.conf.unset(k)
                else:
                    self.spark.conf.set(k, v)
            except Exception:  # noqa: BLE001 — stopped session
                pass

    # --- bucketed corpus layout (config.corpus_buckets) ----------------------

    def _bucketize_corpus(self, n_buckets: int) -> DataFrame:
        """One-time rewrite of the canonical corpus hive-partitioned by
        ``pbucket = pmod(xxhash64(url_canon), n_buckets)`` into the
        state dir (cached across runs via a marker file).  Each wave's
        fetch join prunes its corpus scan to the partitions the
        scheduled keys hit — see CrawlConfig.corpus_buckets.

        The rewrite repartitions ON pbucket first so each partition
        directory holds one file (without it, every input task writes
        a sliver into every bucket dir → tasks × buckets tiny files).
        This is the single place the fat html column ever crosses a
        shuffle, once, at prep time — the same one-time cost a real
        cluster pays to bucket a Common-Crawl dump at ingest.
        """
        bdir = self.state_dir / "corpus_bucketed"
        marker = bdir / "_layout.json"
        if not marker.exists():
            (
                self.pages
                .withColumn(
                    "pbucket",
                    F.pmod(F.xxhash64("url_canon"),
                           F.lit(n_buckets)).cast("int"),
                )
                .repartition(n_buckets, "pbucket")
                .write.mode("overwrite")
                .partitionBy("pbucket")
                .parquet(str(bdir / "data"))
            )
            TableIO._atomic_write_json(marker, {"n_buckets": n_buckets})
        else:
            got = json.loads(marker.read_text())["n_buckets"]
            if got != n_buckets:
                raise ValueError(
                    f"corpus_bucketed layout has {got} buckets; "
                    f"config asks for {n_buckets} — clear the state dir "
                    "or match the existing layout"
                )
        return self.spark.read.parquet(str(bdir / "data"))

    def _bucketize_join_table(self, n_buckets: int, pages_path: str,
                              part_buckets: int | None = None) -> DataFrame:
        """One-time rewrite of the canonical corpus as a
        ``bucketBy(n_buckets, url_canon)`` + ``sortBy(url_canon)``
        saved table (fetch_join="bucketed", see CrawlConfig).

        With *part_buckets* set (config.corpus_buckets) the table is
        ADDITIONALLY hive-partitioned by ``pbucket =
        pmod(xxhash64(url_canon), part_buckets)`` — the composed layout
        (VERDICT r2 item 2): the per-wave fetch join stays an
        exchange-free co-located SMJ via the bucket spec, while the
        bounded hit-bucket literal filter prunes the corpus scan to the
        hive partitions the scheduled keys hit.  File count is
        part_buckets × n_buckets — each (pbucket, bucket) pair is one
        file, the layout a real cluster writes once at ingest.

        The table registers in the session catalog under a name keyed
        by (corpus path, cache root, bucket counts, corpus
        fingerprint) and its files live in ``corpus_cache_dir``
        (default: the state dir), so repeated engines — bench runs,
        resumes — reuse the layout.  If the files exist but the
        catalog entry doesn't (new session), the table is re-registered
        with the same DDL (+ partition recovery).  The repartition ON
        the bucket key before write yields one file per bucket per
        hive partition (Spark's bucketBy hash == repartition's
        Murmur3, so no cross-writing).  This is the single place the
        fat html column ever crosses a shuffle — once, at prep,
        exactly the one-time cost a real cluster pays to bucket a
        Common-Crawl dump at ingest.
        """
        import hashlib

        cache_root = Path(self.config.corpus_cache_dir or self.state_dir)
        # The catalog name and the file location must always agree, and
        # a changed corpus at the same path must never serve a stale
        # layout (ADVICE.md r2): key on the resolved cache root (two
        # engines with different state dirs get different table names)
        # AND a corpus content fingerprint (total size + max mtime of
        # the parquet files).  A non-local corpus path can't be stat'd
        # from the driver — skip the fingerprint there (the layout is
        # then keyed on path alone; rewriting after a corpus change is
        # the operator's call, as with any ingest-time bucketing).
        src = local_path(pages_path)
        if src is not None:
            files = sorted(f for f in src.rglob("*") if f.is_file()) \
                if src.is_dir() else [src]
            fp = f"{sum(f.stat().st_size for f in files)}-" \
                 f"{max((f.stat().st_mtime_ns for f in files), default=0)}"
            src_id = str(src.resolve())
        else:
            fp = "remote"
            src_id = pages_path
        key = hashlib.md5(
            f"{src_id}|{cache_root.resolve()}|{n_buckets}|"
            f"{part_buckets}|{fp}".encode()
        ).hexdigest()[:12]
        name = f"ssspark_corpus_{key}"
        loc = cache_root / f"corpus_join_{key}"
        marker = loc / "_layout.json"
        spark = self.spark
        if not marker.exists():
            df = self.pages.repartition(n_buckets, F.col("url_canon"))
            writer = df.write.mode("overwrite")
            if part_buckets:
                df = df.withColumn(
                    "pbucket",
                    F.pmod(F.xxhash64("url_canon"),
                           F.lit(part_buckets)).cast("int"),
                )
                writer = df.write.mode("overwrite").partitionBy("pbucket")
            (
                writer
                .bucketBy(n_buckets, "url_canon")
                .sortBy("url_canon")
                .option("path", str(loc / "data"))
                .saveAsTable(name)
            )
            TableIO._atomic_write_json(
                marker,
                {"n_buckets": n_buckets, "part_buckets": part_buckets,
                 "source": src_id, "key": key, "table": name},
            )
            # GC superseded layouts of the SAME source corpus (ADVICE
            # r3: every fingerprint change — a corpus touch — abandoned
            # a full 8GB-scale corpus copy forever).  Only siblings
            # whose marker records this source are dropped; other
            # corpora sharing the cache root are untouched.
            import shutil
            for sib in cache_root.glob("corpus_join_*"):
                if sib == loc:
                    continue
                sm = sib / "_layout.json"
                try:
                    meta = json.loads(sm.read_text()) if sm.exists() else {}
                except (OSError, json.JSONDecodeError):
                    continue
                if meta.get("source") != src_id:
                    continue
                old_table = meta.get("table")
                if old_table and spark.catalog.tableExists(old_table):
                    spark.sql(f"DROP TABLE IF EXISTS {old_table}")
                shutil.rmtree(sib, ignore_errors=True)
        elif not spark.catalog.tableExists(name):
            cols = ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}"
                for f in self.pages.schema.fields
            )
            part_ddl = ""
            if part_buckets:
                cols += ", `pbucket` int"
                part_ddl = "PARTITIONED BY (pbucket) "
            spark.sql(
                f"CREATE TABLE {name} ({cols}) USING parquet "
                f"{part_ddl}"
                f"CLUSTERED BY (url_canon) SORTED BY (url_canon) "
                f"INTO {n_buckets} BUCKETS "
                f"LOCATION '{loc / 'data'}'"
            )
            if part_buckets:
                spark.sql(f"ALTER TABLE {name} RECOVER PARTITIONS")
        return spark.table(name)

    def _commit_seen(self, df: DataFrame, wave: int) -> None:
        """Seen delta commit under the configured physical layout
        (config.seen_layout) — dirs-append or bucketed-append; the
        logical content is identical (twin-tested)."""
        if self.seen_layout == "bucketed":
            self.io.commit_bucketed(
                "seen", df, wave,
                n_buckets=self.config.seen_buckets,
                cols=list(SEEN_KEY),
            )
        else:
            self.io.commit("seen", df, wave, mode="append")

    def _commit_frontier(self, df: DataFrame, wave: int) -> None:
        """Frontier commit under the configured layouts.  With delta
        state AND the bucketed seen layout, frontier ADDITIONS are
        bucketed on the same SEEN_KEY: the per-wave reconstruction
        ``dedup_urls(anti_join_seen(additions, seen))`` then runs with
        ZERO exchanges — the scan, the anti-join (both sides bucketed)
        and the dedup hash-aggregate (groupBy on exactly the bucket
        key) are all co-partitioned (plan-tested)."""
        if self.state_layout == "delta" and self.seen_layout == "bucketed":
            self.io.commit_bucketed(
                "frontier", df.select(*FRONTIER_COLS), wave,
                n_buckets=self.config.seen_buckets,
                cols=list(SEEN_KEY),
            )
        else:
            mode = "append" if self.state_layout == "delta" else "snapshot"
            self.io.commit("frontier", df.select(*FRONTIER_COLS), wave,
                           mode=mode)

    # --- wave-complete marker (cross-table atomicity) -----------------------

    def _marker_path(self) -> Path:
        return self.state_dir / "wave-complete.json"

    def _mark_complete(self, wave: int,
                       frontier_empty: bool | None = None,
                       retry_due: dict | None = None) -> None:
        """*frontier_empty* (delta layout): whether the NEXT wave's
        frontier is empty, recorded here because the delta layout has
        no per-wave frontier snapshot whose manifest row count could
        answer it for free.  *retry_due* (op 52): exact pending-retry
        ledger {due_wave(str): count}, maintained at every commit so
        emptiness/termination decisions stay action-free."""
        obj: dict = {"wave": wave}
        if frontier_empty is not None:
            obj["frontier_empty"] = bool(frontier_empty)
        if retry_due is not None:
            obj["retry_due"] = retry_due
        tmp = self._marker_path().with_suffix(".tmp")
        tmp.write_text(json.dumps(obj))
        os.rename(tmp, self._marker_path())

    def _forwarded_retry_due(self, wave: int) -> dict | None:
        """The previous marker's retry ledger minus entries consumed
        at or before *wave* (None when retries are off)."""
        if not self.retry_enabled:
            return None
        rd = (self._marker_info() or {}).get("retry_due") or {}
        return {k: v for k, v in rd.items() if int(k) > wave}

    def _load_due_retries(self, wave: int):
        """FRONTIER_COLS + attempt for retry rows due at *wave* (op
        52), or None before any retry commit.  discovery_ts /
        wave_discovered are reconstructed from the wave clock so a
        retry's emission priority ties break exactly like links
        discovered into this wave (config.py spec)."""
        # newest retries manifest STRICTLY before this wave (retry
        # rows for wave w are committed by earlier source waves; empty
        # waves commit no retries manifest, so an exact-wave read
        # would miss the chain)
        m = self.io._newest_manifest_before("retries", wave)
        if m is None:
            return None
        df = self.io.load("retries", m["wave"])
        if df is None:
            return None
        cfg = self.config
        ts = cfg.t0 + timedelta(seconds=wave * cfg.wave_seconds)
        return (
            df.filter(F.col("due_wave") == F.lit(wave))
            .select(
                "url_canon", "url_hash", "host", "depth",
                F.lit(ts).alias("discovery_ts"),
                F.lit(None).cast("string").alias("parent_canon"),
                F.lit(wave).cast("int").alias("wave_discovered"),
                "attempt",
            )
        )

    def _load_trap_dim(self, wave: int):
        """(host, template) pairs whose accumulated first-attempt
        fetch count reached trap_threshold strictly before *wave*
        (op 54), or None before any count commit.

        The groupBy-sum runs over per-wave (host, template, n) delta
        rows — bounded by waves × distinct templates, never URL
        volume — and the filtered result is broadcast into the gate,
        so the frontier itself never shuffles for trap detection."""
        m = self.io._newest_manifest_before("trap_counts", wave)
        if m is None:
            return None
        df = self.io.load("trap_counts", m["wave"])
        if df is None:
            return None
        return (
            df.groupBy("host", "template")
            .agg(F.sum("n").alias("n"))
            .filter(F.col("n") >= F.lit(self.config.trap_threshold))
            .select("host", "template")
        )

    def _marker_info(self) -> dict | None:
        p = self._marker_path()
        if not p.exists():
            return None
        return json.loads(p.read_text())

    def last_complete_wave(self) -> int | None:
        mi = self._marker_info()
        return None if mi is None else mi["wave"]

    # --- state loads (layout-aware) -----------------------------------------

    @staticmethod
    def _latest_host_rows(df: DataFrame) -> DataFrame:
        """Delta layout: collapse appended host rows to the newest
        (host_state rows are written only when a host changes)."""
        w = Window.partitionBy("host").orderBy(F.col("wave_updated").desc())
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def _load_host_state(self, wave: int) -> DataFrame:
        hs = self.io.load("host_state", wave)
        if self.state_layout == "delta":
            hs = self._latest_host_rows(hs)
        return hs

    def _load_frontier(self, wave: int, seen: DataFrame) -> DataFrame:
        """snapshot: the committed frontier verbatim.  delta: the live
        frontier reconstructed as dedup_urls(union(additions) ∖ seen)
        — the same anti-join + window the snapshot layout runs at
        merge time, shifted to load time so each wave WRITES only its
        additions (VERDICT r2 item 4)."""
        fr = self.io.load("frontier", wave)
        if self.state_layout != "delta":
            return fr
        return dedup_urls(anti_join_seen(fr.select(*FRONTIER_COLS), seen))

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
        state_mode = "append" if self.state_layout == "delta" else "snapshot"
        self._commit_frontier(frontier, wave=0)
        empty_seen = self.spark.createDataFrame(
            [], "url_hash long, url_canon string"
        )
        self._commit_seen(empty_seen, wave=0)
        empty_hs = self.spark.createDataFrame(
            [],
            "host string, rules array<struct<allow:boolean,prefix:string>>, "
            "crawl_delay double, tokens double, budget_used long, "
            "wave_updated int",
        )
        self.io.commit("host_state", empty_hs, wave=0, mode=state_mode)
        TableIO._atomic_write_json(
            self.state_dir / "_engine.json",
            {"state_layout": self.state_layout,
             "seen_layout": self.seen_layout,
             "retry_enabled": self.retry_enabled,
             "trap_threshold": self.config.trap_threshold},
        )
        # no wave executed yet; wave-0 inputs ready.  The seed delta is
        # the whole frontier, so its manifest count answers emptiness
        # in both layouts.
        self._mark_complete(
            -1,
            frontier_empty=(self.io.row_count("frontier", 0) == 0)
            if self.state_layout == "delta" else None,
        )

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
        seen = self.io.load("seen", wave)
        host_state = self._load_host_state(wave)
        frontier = self._load_frontier(wave, seen)
        if self.retry_enabled:
            # op 52: retry rows re-enter HERE — after the seen
            # anti-join (they are seen by construction; the normal
            # reconstruction would drop them) and before the robots
            # gate / per-host top-k, so a retry competes for quota
            # like any frontier row.  `attempt` rides along as an
            # extra in-memory column; every state commit selects
            # FRONTIER_COLS and never persists it except in the
            # retries/fetched tables, where it is the point.
            frontier = frontier.withColumn("attempt", F.lit(0))
            due = self._load_due_retries(wave)
            if due is not None:
                frontier = frontier.unionByName(due)
        wave_persists = []
        trapped_seen = None
        if self.trap_enabled:
            # op 54: the trap gate runs BEFORE the robots gate (a
            # trapped row must not pay the robots UDF).  Trapped rows
            # are dropped permanently and marked seen, exactly like
            # robots-blocked rows; retries (attempt > 0) bypass —
            # their URL already spent its first fetch.  The marked
            # frame is persisted so the frontier reconstruction under
            # it executes once, not once per derived branch.
            trap_dim = self._load_trap_dim(wave)
            if trap_dim is not None:
                marked = frontier.withColumn(
                    "__tpl", url_template(F.col("url_canon"))
                ).join(
                    F.broadcast(
                        trap_dim.withColumnRenamed("template", "__tpl")
                        .withColumn("__trap", F.lit(True))
                    ),
                    ["host", "__tpl"],
                    "left",
                ).persist()
                wave_persists.append(marked)
                bypass = (
                    (F.col("attempt") > 0) if self.retry_enabled
                    else F.lit(False)
                )
                is_trapped = (
                    F.coalesce(F.col("__trap"), F.lit(False)) & ~bypass
                )
                trapped_seen = marked.filter(is_trapped).select(*SEEN_KEY)
                frontier = marked.filter(~is_trapped).drop(
                    "__tpl", "__trap")
        if self.state_layout == "delta":
            # the reconstructed frontier/host_state are PLANS (union +
            # anti-join + window), not parquet scans like the snapshot
            # layout's — and several of the wave's concurrent commit
            # jobs reference them.  Persist for the wave so the
            # reconstruction runs once, not once per job.
            frontier = frontier.persist()
            wave_persists.append(frontier)

        # frontier emptiness comes free without a Spark action — r1
        # burned a full isEmpty() per wave here.  snapshot layout: the
        # manifest row count recorded from parquet footers at commit
        # time.  delta layout: the previous wave recorded it in the
        # wave-complete marker (the frontier has no per-wave snapshot
        # to count); a marker from an older engine version falls back
        # to one authoritative isEmpty().
        if self.state_layout == "delta":
            mi = self._marker_info()
            if mi is not None and mi.get("wave") == wave - 1 \
                    and "frontier_empty" in mi:
                empty = mi["frontier_empty"]
            else:
                empty = frontier.isEmpty()
        else:
            n_frontier = self.io.row_count("frontier", wave)
            empty = n_frontier == 0 or (
                n_frontier is None and frontier.isEmpty()
            )
        if self.retry_enabled and empty:
            # retries due THIS wave make the frontier non-empty even
            # when no additions landed; the marker's retry_due ledger
            # (exact per-due-wave counts, maintained at every commit)
            # answers it without an action
            rd = (self._marker_info() or {}).get("retry_due") or {}
            empty = rd.get(str(wave), 0) == 0
        _t("load")
        if empty:
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
            .withColumn("wave_updated", F.lit(wave - 1).cast("int"))
        )
        host_state = host_state.unionByName(new_state)
        # closed-form lazy refill (config.py wave-clock spec): stored
        # tokens are as-of END of wave_updated; available-now applies
        # the whole gap in one saturating step.  tokens_stamp keeps
        # the stored value so idle hosts commit UNCHANGED rows — the
        # delta layout writes only hosts that actually changed.
        host_state = host_state.withColumn("tokens_stamp", F.col("tokens"))
        host_state = refill_tokens(
            host_state, cfg.wave_seconds, cfg.bucket_cap, UNLIMITED_QUOTA,
            waves=F.lit(wave) - F.col("wave_updated"),
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
        if self.state_layout == "delta":
            # latest-row window + refill over the delta union — shared
            # by the robots gate, quota_log and host_state commits
            host_state = host_state.persist()
            wave_persists.append(host_state)

        # 2. robots gate → 3. per-host top-k under quota.  fr is
        # persisted (r6): both the eligible branch (→ ranked, its own
        # persist) and the blocked branch (→ seen delta, read by the
        # commit jobs) derive from it — without the persist the
        # robots pandas-UDF stage ran a second time per wave inside
        # the state-commit job just to recompute `blocked`.
        fr = apply_robots_filter(frontier, host_state).persist()
        wave_persists.append(fr)
        blocked = fr.filter(~F.col("allowed"))
        eligible = fr.filter(F.col("allowed")).join(
            F.broadcast(host_state.select("host", "quota")), "host"
        )
        ranked = per_host_topk(eligible, "quota").persist()
        scheduled = ranked.filter(F.col("scheduled"))
        remaining = ranked.filter(~F.col("scheduled"))
        starved_retries = None
        if self.retry_enabled:
            # a quota-starved retry waits in the retries table (same
            # attempt, due next wave) — it is seen, so neither the
            # delta reconstruction nor the snapshot frontier may carry
            # it (the snapshot path would double-deliver it)
            starved_retries = remaining.filter(F.col("attempt") > 0)
            remaining = remaining.filter(F.col("attempt") == 0)
        remaining = remaining.select(*FRONTIER_COLS)

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
        sched_keys = scheduled.select(
            "url_canon", "url_hash", "host", "depth",
            *(["attempt"] if self.retry_enabled else []),
        )
        flaky_now = None
        if self.retry_enabled:
            # deterministic transient failure (config.py op-52 spec):
            # pure function of (url_canon, attempt) — Catalyst-only,
            # mirrored bit-identically by the simulator's XXH64 twin
            flaky_now = (
                F.pmod(F.xxhash64(F.col("url_canon")), F.lit(1000))
                < F.lit(cfg.flaky_permille)
            ) & (F.col("attempt") < F.lit(cfg.flaky_fail_attempts))
        # in-wave redirect-hop resolution (op 20, spec in config.py):
        # chains resolve against the precomputed redirect map as ≤3
        # bounded joins folded into the ONE fetch join below — no extra
        # corpus scan, no extra action.  Hop targets obey scope + seen
        # + robots; blocked targets are marked seen like frontier rows.
        fetch_keys = sched_keys
        hop_seen_frames = []   # keys to fold into seen_delta
        if trapped_seen is not None:
            # op 54: trapped rows join the seen delta through the same
            # fold (and trigger the same persist + remaining anti-join
            # hygiene below; remaining ∩ trapped = ∅ by construction)
            hop_seen_frames.append(trapped_seen)
        if self.redirect_closure is not None:
            # ONE equi-join against the precomputed ≤k-hop closure
            # (already canonicalized, scope-filtered, robots-stamped),
            # then a depth filter, a min-(depth, pred) dedup window and
            # two anti-joins (prior seen; scheduled this wave).  Plan
            # size is constant in the hop cap — the per-level variant
            # nested each level's subtree into the next and drowned the
            # driver in Catalyst analysis.
            hop_src = sched_keys
            if flaky_now is not None:
                # a 503 this wave returns no Location header — its
                # chain resolves on the eventual successful attempt
                hop_src = sched_keys.filter(~flaky_now)
            hop_cand = (
                hop_src.alias("c")
                .join(self.redirect_closure.alias("m"),
                      F.col("c.url_canon") == F.col("m.src_canon"))
                .select(
                    F.col("m.url_canon").alias("url_canon"),
                    F.col("m.url_hash").alias("url_hash"),
                    F.col("m.host").alias("host"),
                    (F.col("c.depth") + F.col("m.hop_no")).alias("depth"),
                    F.col("m.pred_canon").alias("parent_canon"),
                    F.col("m.allowed").alias("allowed"),
                )
                .filter(F.col("depth") <= F.lit(cfg.max_depth))
            )
            w = Window.partitionBy(*SEEN_KEY).orderBy(
                F.col("depth").asc(), F.col("parent_canon").asc()
            )
            hop_cand = (
                hop_cand.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn", "parent_canon")
            )
            hop_cand = anti_join_seen(hop_cand, seen)
            hop_cand = hop_cand.join(sched_keys.select(*SEEN_KEY),
                                     SEEN_KEY, "left_anti")
            hop_ok = hop_cand.filter(F.col("allowed"))
            hop_blocked = hop_cand.filter(~F.col("allowed"))
            hop_keys = hop_ok.select("url_canon", "url_hash", "host",
                                     "depth")
            if self.retry_enabled:
                # hop targets are first fetches (attempt 0) and take
                # the same flaky draw as any fetch: a flaky hop target
                # 503s, is seen, and enters the retry loop as a normal
                # frontier row — the simulator mirrors this rule
                hop_keys = hop_keys.withColumn("attempt", F.lit(0))
            fetch_keys = fetch_keys.unionByName(hop_keys).persist()
            hop_seen_frames.append(hop_ok.select(*SEEN_KEY))
            hop_seen_frames.append(hop_blocked.select(*SEEN_KEY))
        if cfg.corpus_buckets:
            # partition-prune the corpus scan to the hive buckets the
            # fetch keys hit.  The collect is ≤ corpus_buckets ints —
            # bounded driver traffic regardless of frontier size; a
            # frontier spanning every bucket skips the filter (the full
            # scan it would need anyway).
            hit_buckets = [
                r["b"] for r in fetch_keys.select(
                    F.pmod(F.col("url_hash"), F.lit(cfg.corpus_buckets))
                    .cast("int").alias("b")
                ).distinct().collect()
            ]
            _t("bucket-probe")
            if len(hit_buckets) < cfg.corpus_buckets:
                pages_min = (
                    self.pages
                    .filter(F.col("pbucket").isin(hit_buckets))
                    .select(
                        F.col("url_canon"), F.col("warc_ts"),
                        F.col("html"), F.col("lang").alias("page_lang"),
                    )
                )
        if self.fetch_join == "bucketed":
            # ONE co-located right-outer sort-merge join: the corpus
            # side reads its buckets with no exchange and no sort
            # (bucketBy+sortBy layout); the skinny scheduled side
            # shuffles in parallel; misses fall out as null-html rows.
            # No driver-serial broadcast build anywhere — the
            # "broadcast" strategy collects + reships every scheduled
            # key through the driver each wave, which caps scaling at
            # big waves and OOMs at a 10^10-URL frontier.  With
            # corpus_buckets also set, pages_min is already pruned to
            # the hit hive partitions above — the composed layout.
            fetch_input = pages_min.join(fetch_keys, "url_canon",
                                         "right_outer")
        else:
            hits = pages_min.join(F.broadcast(fetch_keys), "url_canon",
                                  "inner")
            misses = (
                fetch_keys.join(self.pages_meta.select("url_canon"),
                                "url_canon", "left_anti")
                .withColumn("warc_ts", F.lit(None).cast("timestamp"))
                .withColumn("html", F.lit(None).cast("binary"))
                .withColumn("page_lang", F.lit(None).cast("string"))
            )
            fetch_input = hits.unionByName(misses)
        # ONE Python boundary: redirect+text+links in a single Arrow
        # pass (r1 shipped the fat html column to Python three times —
        # one UDF each — and charset-decoded it three times)
        enriched = (
            fetch_input
            .withColumn("proc",
                        self.process_udf(F.col("html"), F.col("url_canon")))
            .withColumn("redirect_to", F.col("proc.redirect_to"))
            .withColumn(
                "status",
                # op 52 (when enabled): a flaky URL 503s on its early
                # attempts — the branch sits before the redirect test
                # (a real server fails before it answers Location) and
                # is OMITTED entirely when retries are off, keeping
                # the default plan unchanged.
                (
                    F.when(F.col("html").isNull(), F.lit(404))
                    .when(flaky_now, F.lit(503))
                    .when(F.col("redirect_to").isNotNull(), F.lit(302))
                    .otherwise(F.lit(200))
                ) if flaky_now is not None else (
                    F.when(F.col("html").isNull(), F.lit(404))
                    .when(F.col("redirect_to").isNotNull(), F.lit(302))
                    .otherwise(F.lit(200))
                ),
            )
            .withColumn("text", F.when(F.col("status") == 200,
                                       F.col("proc.text")))
            .withColumn(
                "links",
                F.when(F.col("status") == 200, F.col("proc.links"))
                .otherwise(F.array().cast("array<string>")),
            )
            .drop("proc")
        )
        if flaky_now is not None:
            # a 503 answers no body and no Location: null both so the
            # archive, n_bytes and link paths see exactly what a real
            # failed request would have produced
            enriched = enriched.withColumn(
                "redirect_to",
                F.when(F.col("status") == 503,
                       F.lit(None).cast("string"))
                .otherwise(F.col("redirect_to")),
            ).withColumn(
                "html",
                F.when(F.col("status") == 503,
                       F.lit(None).cast("binary"))
                .otherwise(F.col("html")),
            )
        enriched = (
            enriched
            .withColumn("n_bytes",
                        F.coalesce(F.length("html"), F.lit(0)))
            .withColumn("wave", F.lit(wave))
            .withColumn("fetch_ts", F.lit(fetch_ts))
        )
        if not cfg.archive_html:
            enriched = enriched.drop("html")
        _t("plan-build")
        if os.environ.get("SSSPARK_DECOMP") == "1":
            # Fetched-commit decomposition (VERDICT r3 item 1): the
            # stage below pipelines corpus-scan → fetch-join → Arrow
            # UDF → parquet write in ONE job, so its wall says nothing
            # about which leg is parallelism-invariant.  Time each
            # prefix of the plan under a noop sink (runs the subtree,
            # writes nothing); write-leg ≈ fetched-commit − decomp/udf.
            # Bench-only (extra executions); never on in production.
            for label, sub in (("scan", pages_min),
                               ("join", fetch_input),
                               ("udf", enriched)):
                s = _time.monotonic()
                sub.write.format("noop").mode("overwrite").save()
                print(f"[wave {wave}] decomp/{label}: "
                      f"{_time.monotonic() - s:.2f}s",
                      file=sys.stderr, flush=True)
            _last = _time.monotonic()
        self.io.commit("fetched", enriched, wave, mode="append")
        # fetched rows == scheduled rows (hits ∪ misses partition the
        # scheduled set), so the manifest row count IS n_scheduled —
        # r1 paid a groupBy().collect() action for this number
        n_scheduled = self.io.row_count("fetched", wave) or 0
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
        links_union = links_200.unionByName(links_302)
        if self.sitemap_dim is not None:
            # op 49: newly-registered hosts contribute their sitemaps'
            # <loc> entries as wave-w discoveries at depth 0 (parent =
            # the sitemap document; parent_depth -1 → depth 0 below),
            # flowing through the SAME scope/dedup/seen/robots pipeline
            # as anchor links
            sm_links = new_hosts.join(self.sitemap_dim, "host").select(
                F.col("sm_src").alias("parent_canon"),
                F.lit(-1).alias("parent_depth"),
                "url",
            )
            links_union = links_union.unionByName(sm_links)
        new_links = (
            with_url_columns(links_union)
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
        sched_first = scheduled
        if self.retry_enabled:
            # retry rows are already members — re-appending them would
            # duplicate seen rows (harmless for the anti-join, wrong
            # for the set and wasteful at 10^10 rows)
            sched_first = scheduled.filter(F.col("attempt") == 0)
        seen_delta = sched_first.select(*SEEN_KEY).unionByName(
            blocked.select(*SEEN_KEY)
        )
        for hf in hop_seen_frames:
            seen_delta = seen_delta.unionByName(hf)
        if hop_seen_frames:
            # referenced by the seen/frontier/sketch jobs — persist so
            # the hop subtrees execute once, not once per commit
            seen_delta = seen_delta.persist()
            # a hop target fetched this wave may coincide with a
            # quota-starved `remaining` row — it is seen now and must
            # not re-enter the frontier.  The unprobed merge path's
            # anti-join against seen_next already drops it; the probed
            # path carried `remaining` through unfiltered (r2 latent
            # bug), and the delta layout's emptiness count would
            # overcount it.  remaining ∩ (scheduled ∪ blocked) = ∅ by
            # construction, so anti-joining the whole delta only
            # removes hop rows.
            remaining = remaining.join(seen_delta, SEEN_KEY, "left_anti")
        seen_next = seen.unionByName(seen_delta)
        # op 12: cheap membership probe before the exact anti-join.
        # Definitely-unseen links (no false negatives) skip the
        # anti-join entirely; only maybe-seen rows pay for it.
        # `remaining` rows are unseen by construction.  The delta
        # folds in BEFORE probing — links rediscovering a URL
        # scheduled this very wave must read as maybe-seen.
        probed = None
        if cfg.seen_prefilter == "bloom":
            self._save_bloom(wave, seen_delta)
            bloom = self._load_bloom(wave + 1)
            if bloom is not None:
                from shaman_scraping_spark.operators.sketch import bloom_probe

                probed = bloom_probe(
                    new_links.select(*FRONTIER_COLS), bloom
                ).persist()
        elif cfg.seen_prefilter == "cuckoo":
            # PRIMARY structure (BASELINE.json north_star): partitioned
            # cuckoo shards, committed as a snapshot table so resume
            # restores them, updated incrementally with this wave's
            # delta (never rebuilt over the full seen set)
            from shaman_scraping_spark.operators.sketch import (
                cuckoo_probe, cuckoo_update,
            )

            # newest shards committed STRICTLY before wave+1 (empty
            # waves skip the cuckoo commit; an idempotent re-run of a
            # crashed wave must not see its own half-committed output)
            prev_m = self.io._newest_manifest_before("cuckoo", wave + 1)
            prev_shards = (
                self.io.load("cuckoo", prev_m["wave"]) if prev_m else None
            )
            shards_next = cuckoo_update(
                prev_shards, seen_delta,
                n_shards=cfg.cuckoo_shards, n_buckets=cfg.cuckoo_buckets,
            )
            self.io.commit("cuckoo", shards_next, wave + 1)
            probed = cuckoo_probe(
                new_links.select(*FRONTIER_COLS),
                self.io.load("cuckoo", wave + 1),
                n_shards=cfg.cuckoo_shards, n_buckets=cfg.cuckoo_buckets,
            ).persist()
        if probed is not None:
            definite = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
            maybe = anti_join_seen(
                probed.filter(F.col("maybe_seen")).drop("maybe_seen"),
                seen_next,
            )
            # the genuinely-new links of this wave (unseen, probe-
            # verified); in-wave dups collapse here so the delta
            # append stays minimal
            fresh = dedup_urls(definite.unionByName(maybe))
        else:
            fresh = anti_join_seen(
                dedup_urls(new_links.select(*FRONTIER_COLS)), seen_next
            )
        if self.state_layout == "delta":
            frontier_out = fresh           # append: additions only
        else:
            # full next-frontier snapshot; remaining rows carry
            # earlier (depth, discovery_ts) than any rediscovery in
            # fresh, so dedup_urls keeps them (merge_frontier rule)
            frontier_out = dedup_urls(
                remaining.select(*FRONTIER_COLS).unionByName(fresh)
            )
        # per-host emitted counts stay a DataFrame end-to-end (r1
        # collected them to the driver and re-shipped via
        # createDataFrame — a driver OOM at web-scale host counts)
        emitted = scheduled.groupBy("host").agg(
            F.count("*").alias("emitted_count")
        )
        # spend under the closed-form clock: hosts that emitted store
        # (available - emitted, wave); idle hosts keep their stamp
        # unchanged — so a delta commit of only the changed rows loses
        # nothing, and the snapshot layout stores the same values.
        host_state_next = (
            host_state.drop("quota")
            .join(F.broadcast(emitted), "host", "left")
            .withColumn("__emit", F.coalesce(F.col("emitted_count"), F.lit(0)))
            .withColumn(
                "tokens",
                F.when(
                    F.col("emitted_count").isNotNull(),
                    F.when(F.col("crawl_delay") > 0,
                           F.col("tokens") - F.col("__emit"))
                    .otherwise(F.col("tokens")),
                ).otherwise(F.col("tokens_stamp")),
            )
            .withColumn(
                "wave_updated",
                F.when(F.col("emitted_count").isNotNull(),
                       F.lit(wave).cast("int"))
                .otherwise(F.col("wave_updated")),
            )
            .withColumn("budget_used", F.col("budget_used") + F.col("__emit"))
            .select("host", "rules", "crawl_delay", "tokens",
                    "budget_used", "wave_updated")
        )
        if self.state_layout == "delta":
            changed_hosts = new_state.select("host").unionByName(
                emitted.select("host")
            ).distinct()
            host_state_out = host_state_next.join(
                changed_hosts, "host", "left_semi"
            )
        else:
            host_state_out = host_state_next

        # 7. lineage: per-partition per-wave rows (SURVEY.md §2A op 6),
        # from the read-back slice (pruned scan: n_bytes only)
        lineage = fdf.groupBy(
            F.spark_partition_id().alias("partition_id")
        ).agg(
            F.count("*").alias("urls_emitted"),
            F.coalesce(F.sum("n_bytes"), F.lit(0)).alias("bytes_fetched"),
        ).withColumn("wave", F.lit(wave))

        # 8. remaining commits.  The plain-layout state deltas
        # (lineage/seen/frontier/host_state) are small, so their wall
        # cost is per-JOB driver fixed cost, not data — with
        # merged_commits (default) they write through ONE
        # partitionBy("__table") job (TableIO.commit_multi), paying
        # that fixed cost once per wave instead of four times
        # (BENCH/DECOMP.md §5 located the residual 8→32 inefficiency
        # exactly here).  Bucketed-layout seen/frontier keep their own
        # saveAsTable commits and anything else (warc tee, emission
        # log) stays a separate job; all independent jobs still run
        # CONCURRENTLY from driver threads over already-materialized
        # inputs (ranked is persisted; fdf is a read-back of files on
        # disk): wall ≈ max(job).  Crash-safety is unchanged in both
        # shapes: the wave marker is written strictly after every
        # commit returns, and per-table manifests chain from waves
        # strictly before this one, so any partial subset of committed
        # tables is invisible to resume.
        retry_due_next: dict | None = None
        if self.retry_enabled:
            # op 52: 503s advance their attempt counter; within budget
            # they re-enter at wave + 2^(attempt-1) (exponential wave-
            # clock backoff), past it they dead-letter.  Quota-starved
            # retries wait one wave at the same attempt.
            failed = fdf.filter(F.col("status") == 503).select(
                "url_canon", "url_hash", "host", "depth", "attempt"
            )
            nxt = failed.withColumn("attempt", F.col("attempt") + 1)
            retry_all = (
                nxt.filter(F.col("attempt") <= F.lit(cfg.max_retries))
                .withColumn(
                    "due_wave",
                    (
                        F.lit(wave)
                        + F.pow(
                            F.lit(2.0),
                            (F.col("attempt") - 1).cast("double"),
                        )
                    ).cast("int"),
                )
            )
            dead = (
                nxt.filter(F.col("attempt") > F.lit(cfg.max_retries))
                .withColumn("wave", F.lit(wave))
                .select("url_canon", "host", "depth", "attempt", "wave")
            )
            if starved_retries is not None:
                retry_all = retry_all.unionByName(
                    starved_retries.select(
                        "url_canon", "url_hash", "host", "depth",
                        "attempt",
                    ).withColumn(
                        "due_wave", F.lit(wave + 1).cast("int")
                    )
                )
            retry_all = retry_all.persist()
            wave_persists.append(retry_all)
            # exact pending ledger for the wave marker: the collect is
            # bounded by the number of DISTINCT due waves (≤
            # max_retries + 1), never by data volume
            retry_due_next = self._forwarded_retry_due(wave) or {}
            for r in retry_all.groupBy("due_wave").agg(
                F.count("*").alias("n")
            ).collect():
                k = str(r["due_wave"])
                retry_due_next[k] = retry_due_next.get(k, 0) + r["n"]
            _t("retry-ledger")
        state_mode = "append" if self.state_layout == "delta" else "snapshot"
        plain_parts: list = [("lineage", lineage, "append", wave)]
        if self.retry_enabled:
            plain_parts.append(("retries", retry_all, "append", wave))
            plain_parts.append(("dead", dead, "append", wave))
        if self.trap_enabled:
            # op 54: this wave's first-attempt fetches roll into the
            # per-wave (host, template, n) count delta — fdf is a
            # read-back of the already-committed fetched parquet, so
            # this is a cheap scan + map-side-combined agg, and the
            # delta's row count is bounded by distinct templates
            tc = fdf
            if self.retry_enabled:
                tc = tc.filter(F.col("attempt") == 0)
            trap_delta = (
                tc.select(
                    "host",
                    url_template(F.col("url_canon")).alias("template"),
                )
                .groupBy("host", "template")
                .agg(F.count("*").alias("n"))
            )
            plain_parts.append(("trap_counts", trap_delta, "append", wave))
        commits: list = []
        if self.seen_layout == "bucketed":
            commits.append(
                ("seen", lambda: self._commit_seen(seen_delta, wave + 1)))
        else:
            plain_parts.append(("seen", seen_delta, "append", wave + 1))
        if self.state_layout == "delta" and self.seen_layout == "bucketed":
            commits.append(("frontier", lambda: self._commit_frontier(
                frontier_out, wave + 1)))
        else:
            plain_parts.append((
                "frontier", frontier_out.select(*FRONTIER_COLS),
                state_mode, wave + 1,
            ))
        plain_parts.append(
            ("host_state", host_state_out, state_mode, wave + 1))
        if cfg.merged_commits and len(plain_parts) > 1:
            commits.append(("multi", lambda: self.io.commit_multi(
                plain_parts, group_wave=wave)))
        else:
            for tbl, df_, mode_, w_ in plain_parts:
                commits.append((
                    tbl,
                    lambda t=tbl, d=df_, m=mode_, w=w_:
                        self.io.commit(t, d, w, mode=m),
                ))
        if cfg.warc_dir:
            # WARC archive tee (op 4): part-files written as a side
            # effect of materializing the index rows → archive + index
            # cost ONE job, joining the concurrent commit group
            from shaman_scraping_spark.sources.warc import (
                write_warc_archive,
            )

            wave_dir = Path(cfg.warc_dir) / f"wave-{wave:06d}"
            if wave_dir.exists():
                import shutil
                shutil.rmtree(wave_dir)  # idempotent wave re-run
            wave_dir.mkdir(parents=True, exist_ok=True)
            prior_digests = None
            if cfg.warc_dedup:
                # prior = newest warc_index manifest STRICTLY before
                # this wave (ADVICE r5 high): a crashed attempt of THIS
                # wave may already have committed warc_index at `wave`;
                # reading "latest" back as prior would demote every
                # re-fetched payload to a revisit pointing at response
                # records whose wave dir was just rmtree'd — the
                # payload would be lost from the archive.  Manifests
                # must chain only from waves strictly before the
                # current one (same rule as _load_due_retries /
                # _load_trap_dim; the streaming leg already guards
                # this replay hazard explicitly).
                prior_m = self.io._newest_manifest_before(
                    "warc_index", wave)
                prior_idx = (
                    self.io.load("warc_index", prior_m["wave"])
                    if prior_m is not None else None
                )
                if prior_idx is not None and "digest" in prior_idx.columns:
                    prior_digests = prior_idx.filter(
                        F.col("record_type") == "response"
                    ).select("digest", "url")
            warc_idx = write_warc_archive(
                fdf.filter(F.col("html").isNotNull()).select(
                    "url_canon",
                    F.col("fetch_ts").alias("warc_ts"),
                    "html", "status",
                ),
                str(wave_dir),
                dedup=cfg.warc_dedup,
                prior_digests=prior_digests,
            )
            commits.append(("warc_index", lambda: self.io.commit(
                "warc_index", warc_idx, wave, mode="append")))
        if cfg.wet_dir:
            # op 62: WET tee — extracted-text conversion records, same
            # sink discipline as the WARC tee (idempotent wave dirs,
            # archive written as a side effect of the index commit)
            from shaman_scraping_spark.sources.warc import (
                write_wet_archive,
            )

            wet_wave_dir = Path(cfg.wet_dir) / f"wave-{wave:06d}"
            if wet_wave_dir.exists():
                import shutil
                shutil.rmtree(wet_wave_dir)
            wet_wave_dir.mkdir(parents=True, exist_ok=True)
            wet_idx = write_wet_archive(
                fdf.filter(F.col("text").isNotNull()).select(
                    "url_canon",
                    F.col("fetch_ts").alias("warc_ts"),
                    "text",
                ),
                str(wet_wave_dir),
            )
            commits.append(("wet_index", lambda: self.io.commit(
                "wet_index", wet_idx, wave, mode="append")))
        if cfg.wat_dir:
            # op 63: WAT tee — JSON metadata envelopes (same discipline)
            from shaman_scraping_spark.sources.warc import (
                write_wat_archive,
            )

            wat_wave_dir = Path(cfg.wat_dir) / f"wave-{wave:06d}"
            if wat_wave_dir.exists():
                import shutil
                shutil.rmtree(wat_wave_dir)
            wat_wave_dir.mkdir(parents=True, exist_ok=True)
            wat_idx = write_wat_archive(
                fdf.select(
                    "url_canon",
                    F.col("fetch_ts").alias("warc_ts"),
                    "status", "links", "n_bytes",
                ),
                str(wat_wave_dir),
            )
            commits.append(("wat_index", lambda: self.io.commit(
                "wat_index", wat_idx, wave, mode="append")))
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
            commits.append(("quota_log", lambda: self.io.commit(
                "quota_log", quota_log, wave, mode="append")))
            commits.append(("emission", lambda: self.io.commit(
                "emission", emission, wave, mode="append")))
        from concurrent.futures import ThreadPoolExecutor

        def _timed(name, fn):
            if not profile:
                return fn
            def run():
                import time as _t
                s = _t.monotonic()
                fn()
                print(f"[wave {wave}] commit/{name}: "
                      f"{_t.monotonic() - s:.2f}s",
                      file=sys.stderr, flush=True)
            return run

        with ThreadPoolExecutor(max_workers=len(commits)) as pool:
            futures = {name: pool.submit(_timed(name, fn))
                       for name, fn in commits}
            for name, fut in futures.items():
                fut.result()  # re-raise: no marker if any commit failed
        _t("state-commits")
        if self.state_layout == "delta":
            # record next-wave frontier emptiness in the marker: empty
            # iff no additions were appended (free: manifest count)
            # AND nothing remained unscheduled (isEmpty over the
            # already-persisted `ranked` — no recompute, no shuffle)
            n_added = self.io.row_count("frontier", wave + 1) or 0
            frontier_empty = n_added == 0 and remaining.isEmpty()
            self._mark_complete(wave, frontier_empty=frontier_empty,
                                retry_due=retry_due_next)
            if cfg.compact_every and (wave + 1) % cfg.compact_every == 0:
                seen_now = self.io.load("seen", wave + 1)
                self.io.compact(
                    "frontier",
                    transform=lambda df: dedup_urls(anti_join_seen(
                        df.select(*FRONTIER_COLS), seen_now)),
                )
                self.io.compact("host_state",
                                transform=self._latest_host_rows)
                self.io.compact("seen")
                _t("compact")
        else:
            self._mark_complete(wave, retry_due=retry_due_next)
        ranked.unpersist()
        for df in wave_persists:
            df.unpersist()
        if self.redirect_closure is not None:
            fetch_keys.unpersist()
        if hop_seen_frames:
            seen_delta.unpersist()
        if probed is not None:
            probed.unpersist()
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
        self._commit_seen(seen.limit(0), wave + 1)
        if self.state_layout == "delta":
            # append layout: empty deltas keep the manifest chain
            # intact; the accumulated state needs no carrying
            self._commit_frontier(
                self.spark.createDataFrame([], FRONTIER_SCHEMA),
                wave + 1,
            )
            self.io.commit("host_state", host_state.limit(0), wave + 1,
                           mode="append")
            self._mark_complete(wave, frontier_empty=True,
                                retry_due=self._forwarded_retry_due(wave))
        else:
            self.io.commit(
                "frontier",
                self.spark.createDataFrame([], FRONTIER_SCHEMA),
                wave + 1,
            )
            self.io.commit("host_state", host_state, wave + 1)
            self._mark_complete(wave,
                                retry_due=self._forwarded_retry_due(wave))

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
                # op 52: pending retries keep the crawl alive through
                # frontier-empty waves until their due wave arrives
                if self._forwarded_retry_due(w):
                    continue
                if self.state_layout == "delta":
                    mi = self._marker_info() or {}
                    fe = mi.get("frontier_empty")
                    if fe is None:  # marker from an older engine
                        fe = self._load_frontier(
                            w + 1, self.io.load("seen", w + 1)
                        ).isEmpty()
                    if fe:
                        break
                    continue
                nf = self.io.row_count("frontier", w + 1)
                if nf == 0:
                    break
                if nf is None and self.io.load("frontier", w + 1).isEmpty():
                    break  # pre-num_rows manifest (resumed old state)
        return waves_run
