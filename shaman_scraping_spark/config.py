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
* Token bucket per host: before wave-w selection,
  ``tokens = min(bucket_cap, tokens + wave_seconds/crawl_delay)``
  (crawl_delay 0 → unlimited); quota = floor(tokens); after selection
  ``tokens -= emitted``.  Hosts start at 0 tokens.
* robots.txt is resolved out-of-band at the wave start for every host
  present in the frontier (no quota cost, not in the emission log);
  disallowed URLs are dropped and marked seen.
* Redirects (meta-refresh in the corpus; HTTP 3xx on a live cluster)
  are recorded as status-302 fetches whose target is a discovered
  link at depth+1.
* Emission order within a wave: (depth, discovery_ts, url_canon) —
  url_canon as the final tiebreak makes ordering deterministic under
  any partitioning (SURVEY.md §2C op 15).
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
    shuffle_partitions: int | None = None
    host_salt: int = 42                    # salt for host-hash partitioning
    # approximate seen-set prefilter before the exact anti-join
    # (None | "bloom"); correctness never depends on it — the sketch
    # has no false negatives and positives re-check exactly
    seen_prefilter: str | None = None
    bloom_bits: int = 1 << 23
    bloom_hashes: int = 7
    # archive payload bytes into the fetched table (the WARC-archive
    # role).  False keeps only metadata + extracted text length —
    # used by single-disk benchmarks where archive IO can't scale
    # with cores the way per-executor storage does on a cluster.
    archive_html: bool = True
    # partition count of the canonical corpus cache.  Sized by DATA
    # (≈ bytes/64MB), not by core count — every wave's fetch-join and
    # extraction stages scan this cache, so an inflated count multiplies
    # task-scheduling overhead into each of the ~10 jobs per wave.
    # None → max(defaultParallelism, input splits).
    pages_partitions: int | None = None
