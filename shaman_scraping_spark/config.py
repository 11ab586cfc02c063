"""CrawlConfig — the engine's crawl-rule surface.

Mirrors the reference's scraper configuration knobs (host scope,
should-crawl predicates, politeness delay, parallelism — SURVEY.md
§1.1 item 5; checkout empty, §0) as declarative fields.  Everything
here is data, not callbacks, so the whole config broadcasts cleanly
and the scope filter stays a Catalyst predicate (pushdown-friendly,
SURVEY.md §4).

Wave-clock semantics (pinned here; the oracle simulator implements the
same spec — tests/test_crawl_e2e.py asserts equality):

* Each wave models ``wave_seconds`` of wall time; ``discovery_ts`` of
  links found at wave w is ``t0 + (w+1)*wave_seconds`` — a
  deterministic clock, never wall time.
* Token bucket per host (closed form — drift-free and layout-
  independent): the stored state is (tokens, wave_updated) where
  ``tokens`` is the value as of the END of wave ``wave_updated``;
  hosts register at 0 tokens with wave_updated = discovery_wave - 1.
  Available tokens at wave w are
  ``min(bucket_cap, tokens + (w - wave_updated) * wave_seconds/crawl_delay)``
  (crawl_delay 0 → unlimited); quota = floor(available).  A host that
  emits n URLs at wave w stores (available - n, w); idle hosts keep
  their stamp.  The closed form equals the per-wave iterated refill
  under saturating min, without per-wave float accumulation — so the
  delta state layout (which evaluates it lazily) and the snapshot
  layout agree bit-for-bit.
* robots.txt is resolved out-of-band at the wave start for every host
  present in the frontier (no quota cost, not in the emission log);
  disallowed URLs are dropped and marked seen.
* Redirects (meta-refresh in the corpus; HTTP 3xx on a live cluster)
  are recorded as status-302 fetches whose target is a discovered
  link at depth+1.
* Emission order within a wave: (depth, discovery_ts, url_canon) —
  url_canon as the final tiebreak makes ordering deterministic under
  any partitioning (SURVEY.md §2C op 15).
* Batch/streaming determinism boundary: every BATCH-engine timestamp
  derives from (t0, wave, wave_seconds) — no wall clock anywhere, so
  identical inputs yield byte-identical state at any parallelism.
  STREAMING mode (streaming/crawl_stream.py) deliberately runs on
  wall clocks instead: ``discovery_ts``/``fetch_ts`` stamp
  ``F.current_timestamp()``, and politeness ``requeue`` re-stamps
  ``event_ts`` to "now" so a quota-starved host's bucket keeps
  refilling as real time passes — the reference's continuous
  behavior, where arrival order IS micro-batch-dependent.  The
  streaming invariants are therefore SET-valued (fetched/seen sets ≡
  batch on a delay-0 corpus; politeness envelope on a throttled one,
  tests/test_streaming.py), never log-ordered; only the stateful
  token-bucket kernel itself is clocked on event time and replays
  deterministically from the checkpoint.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timezone

DEFAULT_T0 = datetime(2024, 6, 1, tzinfo=timezone.utc)
UNLIMITED_QUOTA = 1_000_000_000


@dataclass(frozen=True)
class CrawlConfig:
    seeds: tuple = ()
    max_waves: int = 10
    max_depth: int = 64
    wave_seconds: float = 10.0
    bucket_cap: float = 100.0
    default_crawl_delay: float = 0.0      # hosts without robots.txt
    allowed_hosts: tuple | None = None     # None = any host
    include_regex: str | None = None       # on url_canon
    exclude_regex: str | None = None
    max_pages_per_host: int | None = None  # host budget (budget_used cap)
    t0: datetime = DEFAULT_T0
    # crawler product token for robots.txt group matching (RFC 9309:
    # the most specific matching User-agent group overrides `*`)
    user_agent: str = "shaman-spark"
    # Redirect chains resolve WITHIN the wave, up to this many hops
    # past the original fetch (the reference follows 3xx inside one
    # HTTP request — r1 re-queued targets at one hop per wave, costing
    # a 3-hop chain 3 waves of politeness budget).  Hop semantics
    # (pinned; the simulator mirrors them):
    #   * chains resolve against the corpus's STATIC redirect graph —
    #     an HTTP client follows Location responses without consulting
    #     the seen set mid-chain, so a seen intermediate does NOT stop
    #     the chain (it just isn't re-recorded);
    #   * a chain STOPS at: an out-of-scope/uncanonicalizable target, a
    #     robots-blocked target (politeness holds per request URL; the
    #     blocked target is marked seen), or the hop cap;
    #   * a reached target is fetched/recorded only if unseen and not
    #     already fetched this wave; hop rows land in `fetched` at the
    #     same wave with depth = predecessor depth + 1 and count in
    #     lineage; hop fetches consume NO quota and are not emissions;
    #   * a target whose own redirect lies past the cap enters the
    #     frontier as an ordinary link (one hop per wave from there).
    # Engine mechanics: the ≤k-hop closure of the redirect graph is
    # precomputed at init, so per-wave resolution is ONE equi-join.
    # 0 → no in-wave hops (r1 behavior).
    max_redirect_hops: int = 3
    # --- op 52: retry with exponential backoff (spec pinned here; the
    # oracle simulator mirrors it).  Real servers fail transiently;
    # the reference's scraper retries failed requests with backoff.
    # The sandbox corpus has no live server, so transient failures are
    # SIMULATED deterministically: a url_canon is "flaky" iff
    # ``pmod(xxhash64(url_canon), 1000) < flaky_permille`` (Spark
    # xxhash64 seed 42; the pure-Python twin in functions/hashing.py
    # makes the simulator bit-identical), and a flaky URL answers 503
    # on fetch attempts 0..flaky_fail_attempts-1, succeeding after.
    # Retry semantics (both layouts):
    #   * a 503 fetch consumes quota/budget like any request, is
    #     recorded in `fetched` (status 503, no text/links — link
    #     discovery happens only on the eventual success), and is NOT
    #     re-marked seen;
    #   * the URL re-enters the frontier at wave
    #     ``w + 2**(attempt-1)`` (attempt = retries done, 1-based
    #     after the first failure): +1, +2, +4 ... — exponential
    #     backoff on the wave clock, deterministic, no wall time;
    #   * retry rows carry ``discovery_ts = t0 + due_wave*
    #     wave_seconds`` and ``wave_discovered = due_wave`` so their
    #     emission priority ties break exactly like links discovered
    #     into that wave;
    #   * a retry starved by quota re-enqueues at the next wave with
    #     the SAME attempt count (waiting costs no attempt);
    #   * after ``max_retries`` failed retries the URL dead-letters
    #     into the `dead` table (url, host, depth, attempt, wave) and
    #     is never fetched again;
    #   * retries that would come due past max_waves are simply never
    #     scheduled (documented truncation, same as frontier rows).
    # flaky_permille=0 (default) disables the whole path: no 503
    # branch in the plan, no retries/dead tables, no extra actions.
    # BATCH-ONLY: StreamingCrawl ignores these knobs (its micro-batch
    # clock has no wave numbers to schedule backoff against) — the
    # streaming analogue would re-enqueue failures through requeue's
    # event-time re-stamp, unimplemented by design, not omission.
    flaky_permille: int = 0
    flaky_fail_attempts: int = 2
    max_retries: int = 3
    # --- op 54: crawl-trap guard / URL pattern mining (spec pinned
    # here; the oracle simulator mirrors it).  Calendar pages,
    # session-id links and faceted-search grids generate unbounded URL
    # families differing only in numbers; real crawlers cap such
    # families (Heritrix path-repetition rules, Nutch regex filters).
    # Semantics:
    #   * template(url) = path+query of url_canon with every ASCII
    #     digit run collapsed to '#' (functions/url.url_template,
    #     pure Catalyst; Python twin url_template_of) —
    #     /p/17?id=17 and /p/90210?id=90210 share /p/#?id=#;
    #   * after wave w commits, that wave's FIRST-ATTEMPT fetches
    #     (every fetch when retries are off; attempt-0 rows when on —
    #     each URL counts exactly once, whatever its status: a 404 or
    #     503 burned budget too) append per-wave (host, template, n)
    #     counts to the trap_counts table — delta rows are bounded by
    #     distinct templates per wave, never URL volume;
    #   * at a later wave's gate, frontier rows at attempt 0 whose
    #     (host, template) has accumulated count >= trap_threshold
    #     are TRAPPED: dropped permanently and marked seen (exactly
    #     like robots-blocked rows), before the robots gate runs;
    #   * retries (attempt > 0) bypass the gate — their URL already
    #     spent its first fetch; in-wave redirect hop targets also
    #     bypass it (they never sit in the frontier) but their
    #     fetches COUNT toward the template;
    #   * wave-0 seeds precede any count and are never trapped;
    #   * counts are cumulative over the whole crawl (the trap dim is
    #     a groupBy-sum over the append table — rows bounded by
    #     waves x templates — filtered to >= threshold, then
    #     broadcast: the frontier never shuffles for the gate).
    # trap_threshold=0 (default) disables the operator entirely.
    # BATCH-ONLY for now: StreamingCrawl ignores this knob (the gate
    # would sit in enqueue(), counting from previously committed
    # micro-batches) — documented so batch/stream behavior never
    # silently diverges.
    trap_threshold: int = 0
    shuffle_partitions: int | None = None
    host_salt: int = 42                    # salt for host-hash partitioning
    # approximate seen-set prefilter before the exact anti-join
    # (None | "bloom" | "cuckoo"); correctness never depends on it —
    # both sketches have no false negatives and positives re-check
    # exactly.  "cuckoo" is the primary structure (BASELINE.json
    # north_star: partitioned cuckoo filter, bloom fallback): shards
    # stay distributed and co-partitioned with probes, updated
    # incrementally per wave.
    seen_prefilter: str | None = None
    bloom_bits: int = 1 << 23
    bloom_hashes: int = 7
    cuckoo_shards: int = 32
    cuckoo_buckets: int = 1 << 15   # per shard; rounded up to a power of 2
    # archive payload bytes into the fetched table (the WARC-archive
    # role).  False keeps only metadata + extracted text length —
    # used by single-disk benchmarks where archive IO can't scale
    # with cores the way per-executor storage does on a cluster.
    archive_html: bool = True
    # When set, every wave also tees its fetched payloads into
    # `{warc_dir}/wave-NNNNNN/part-*.warc.gz` (one gzip member per
    # record, seekable) with index rows in the `warc_index` table —
    # the reference's ACTUAL persistent output (WARC archive + sidecar
    # index).  Requires archive_html=True.
    warc_dir: str | None = None
    # Content dedup in the WARC tee: payloads whose sha1 digest was
    # already archived (this wave or any earlier one) are written as
    # WARC `revisit` records (pointer, no payload) — the standard
    # web-archive dedup that collapses byte-identical re-fetches.
    # Costs one window shuffle on digest + one join against the prior
    # index per wave; off by default.
    warc_dedup: bool = False
    # When set, each wave also tees its EXTRACTED TEXT into
    # `{wet_dir}/wave-NNNNNN/part-*.warc.gz` as WET `conversion`
    # records (text/plain blocks, no HTTP wrapper — Common Crawl's
    # text sibling of the WARC) with index rows in `wet_index`.
    wet_dir: str | None = None
    # When set, each wave also tees per-capture metadata (url, status,
    # n_bytes, out-links as a JSON envelope) into WAT `metadata`
    # records at `{wat_dir}/wave-NNNNNN/` with index rows in
    # `wat_index` — link-graph consumers read these, never payloads.
    wat_dir: str | None = None
    # CollectAdditionalLinks-style hooks: regex strings (one capture
    # group = the href) applied to script/comment-stripped html in the
    # same UDF pass as a[href] extraction; hook links append after the
    # anchor links, same resolution + scope rules.  Example:
    #   (r'<img\b[^>]*?\bsrc\s*=\s*"([^"]*)"',)
    link_patterns: tuple = ()
    # Fetch-join strategy against the pages corpus:
    #   "broadcast" — build the scheduled-keys side into a broadcast
    #     hash join.  Fine for small waves, but the build is
    #     DRIVER-SERIAL (collect + rebroadcast of every scheduled key,
    #     every wave) — a scaling wall at big waves and a driver OOM at
    #     10^10-URL frontiers.
    #   "bucketed" — the canonical corpus is written ONCE as a
    #     bucketBy(N, url_canon) sorted table (cached across runs via
    #     corpus_cache_dir); each wave's fetch is then ONE co-located
    #     right-outer sort-merge join: corpus side has no exchange and
    #     no sort, the skinny scheduled side shuffles in parallel, no
    #     driver collect anywhere.  Misses fall out of the same join
    #     (null html → 404).  The 100 TB design point.  COMPOSES with
    #     corpus_buckets (VERDICT r2 item 2): when both are set the
    #     table is additionally hive-partitioned by pbucket, so the
    #     SMJ's corpus side is ALSO partition-pruned to the buckets the
    #     scheduled keys hit — co-located and bounded at once.
    #   "auto" (default) — "broadcast" while the corpus parquet is
    #     smaller than fetch_join_broadcast_max_bytes, else "bucketed".
    #     At a 20k-page bench corpus the per-wave SMJ fixed cost
    #     exceeds the driver-serial broadcast build (BENCH_r02's crawl
    #     regression); at a Common-Crawl corpus the broadcast build is
    #     the wall.  Corpus bytes, known at init, picks the side.
    fetch_join: str = "auto"
    fetch_join_buckets: int = 64
    # "auto" cutover: corpus parquet size below which the broadcast
    # strategy wins (the SMJ's value is never collecting scheduled keys
    # to the driver — irrelevant while the whole corpus fits in one
    # broadcast-scan pass and waves are ≪ autoBroadcastJoinThreshold)
    fetch_join_broadcast_max_bytes: int = 2 << 30
    # where the bucketed corpus table files live (shared across runs /
    # resumes; None → inside the state dir)
    corpus_cache_dir: str | None = None
    # Bucket the canonical corpus on pmod(xxhash64(url_canon), N) at
    # engine init (one-time Spark rewrite into the state dir, hive-
    # partitioned by `pbucket`, cached across runs/resumes).  Each
    # wave's fetch join then PRUNES the corpus scan to the partitions
    # its scheduled keys actually hit — when a crawl touches a small
    # slice of a huge corpus (the "crawl one site inside Common Crawl"
    # case), the pages-side scan reads a bounded fraction of files
    # instead of streaming all of them every wave (VERDICT r1 item 2).
    # A frontier that spans all buckets degrades gracefully to the
    # full scan it would need anyway.  None → flat layout.
    corpus_buckets: int | None = None
    # State-table layout (VERDICT r2 item 4 — per-wave snapshot
    # rewrites of frontier/host_state were 86% of wave wall at the
    # 600k corpus and are O(state) write per wave at 10^10 URLs):
    #   "snapshot" — frontier/host_state rewritten in full every wave
    #     (simple; fine for short crawls / small frontiers).
    #   "delta" (default) — per-wave deltas appended through the same
    #     atomic-manifest machinery as `seen`:
    #       frontier: only NEW-link additions are written; the live
    #         frontier is reconstructed at load as
    #         dedup_urls(union(additions) ∖ seen) — the same windows
    #         and anti-joins snapshot mode pays at merge time, minus
    #         the O(frontier) rewrite;
    #       host_state: only CHANGED hosts (new or emitted) are
    #         written, stamped with wave_updated; token refill is the
    #         closed form min(cap, tokens + gap·rate) at read time.
    #     Compacted every compact_every waves so the union stays
    #     bounded.  Both layouts produce byte-identical emission logs
    #     (twin-tested); resume works in both.
    state_layout: str = "delta"
    # Seen-table physical layout:
    #   "dirs" (default) — per-wave delta dirs unioned at read (the
    #     WARC-index pattern; fine while the seen set fits a shuffle).
    #   "bucketed" — per-wave deltas appended into ONE wave-partitioned
    #     catalog table bucketed on (url_hash, url_canon): every exact
    #     anti-join against seen becomes an SMJ whose seen side reads
    #     its buckets IN PLACE — no shuffle of the accumulated set.
    #     At a 10^10-URL seen set the per-wave reshuffle of the whole
    #     set is the dominant exchange; this kills it (plan-asserted).
    #     Same per-wave atomicity: reads filter __wave <= the last
    #     manifested wave, so a crashed wave's partition is invisible
    #     and re-runs overwrite it.  Cluster analogue: Iceberg bucket
    #     partition transform.
    # Measured trade (r4, 600k-page bench, 335k-row seen set, 32
    # threads): "bucketed" costs ~20% wall (99.5 → 119.8 s) — the
    # per-wave saveAsTable/catalog fixed cost exceeds the avoided
    # shuffle while seen is small.  Like fetch_join, this is a
    # size-crossover knob: dirs below shuffle-pain scale, bucketed at
    # the 10^9+-row seen sets where reshuffling the accumulated set
    # every wave is the dominant exchange (plan-tested exchange-free).
    seen_layout: str = "dirs"
    seen_buckets: int = 64
    # Sitemap ingestion (op 49, sources/sitemap.py — spec pinned
    # there): when a host first enters host_state, the `Sitemap:` URLs
    # of its robots.txt are resolved out-of-band (like robots itself:
    # no quota, not seen, not fetched) and their <loc> entries enter
    # the frontier at the NEXT wave with depth 0 and parent = the
    # sitemap document's canonical URL — scope, seen-dedup and the
    # robots gate apply as for any discovered link.  sitemapindex
    # documents expand one level.  Off by default.
    use_sitemaps: bool = False
    # End-of-wave state commits as ONE Spark job (True, default): the
    # plain-layout lineage/seen/frontier/host_state deltas write
    # through a single partitionBy("__table") sink
    # (TableIO.commit_multi) instead of four concurrent jobs.  The
    # deltas are small, so their wall cost is per-JOB driver fixed
    # cost — the one term that does not shrink with cluster size
    # (BENCH/DECOMP.md §5); one job pays it once per wave.  Manifest
    # chains, atomicity and resume are identical (twin-tested).
    # Bucketed seen/frontier layouts keep their own saveAsTable
    # commits (concurrent with the merged job).  False restores the
    # per-table concurrent jobs.
    merged_commits: bool = True
    # Delta-mode compaction interval: every K waves the frontier /
    # host_state / seen append chains are rewritten into one data dir
    # (frontier: seen-filtered + deduped; host_state: latest row per
    # host), bounding per-wave union width at K dirs.  None → never.
    compact_every: int | None = 8
    # partition count of the canonical corpus cache.  Sized by DATA
    # (≈ bytes/64MB), not by core count — every wave's fetch-join and
    # extraction stages scan this cache, so an inflated count multiplies
    # task-scheduling overhead into each of the ~10 jobs per wave.
    # None → max(defaultParallelism, input splits).
    pages_partitions: int | None = None
