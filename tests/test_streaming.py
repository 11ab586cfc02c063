"""§2G streaming ops: continuous crawl (op 36), watermark dedup (37),
stateful token bucket (38), windowed metrics (39).

The streaming crawl's *seen set* must equal the batch engine's under
the same corpus + scope with politeness disabled (ordering is
micro-batch-dependent by design — the reference's continuous mode)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from shaman_scraping_spark.config import CrawlConfig
from shaman_scraping_spark.corpus.simulator import simulate
from shaman_scraping_spark.streaming.crawl_stream import (
    StreamingCrawl,
    dedup_within_watermark,
    stateful_token_bucket,
    windowed_fetch_metrics,
)


def _blocked_urls(corpus, urls):
    """Ground-truth robots verdicts from the corpus side table."""
    from shaman_scraping_spark.operators.politeness import (
        robots_allowed, url_path_of,
    )
    out = set()
    for u in urls:
        host = u.split("://", 1)[1].split("/", 1)[0]
        rules = corpus.robots.get(host, ([], 0.0))[0]
        if not robots_allowed(url_path_of(u), rules):
            out.add(u)
    return out


@pytest.mark.slow
def test_streaming_crawl_matches_batch_seen_set(
    spark, tmp_path_factory
):
    """Politeness-gated streaming (VERDICT r3 item 2) on a delay-0
    corpus: the robots gate is ACTIVE (blocked rows are enqueued-seen
    but never fetched — links behind blocked pages stay undiscovered,
    exactly the batch rule), throttling is not, so the drained stream
    must reproduce the batch engine's seen set and (url, status)
    fetch set exactly."""
    from shaman_scraping_spark.corpus.generator import (
        CorpusSpec, generate_corpus,
    )

    corpus = generate_corpus(
        CorpusSpec(n_hosts=8, n_pages=140, crawl_delays=(0,),
                   private_frac=1.0)
    )
    assert any(r for r, _d in corpus.robots.values())
    cdir = tmp_path_factory.mktemp("stream_corpus")
    corpus.write(cdir)
    cfg = CrawlConfig(
        seeds=tuple(corpus.seeds), max_waves=50, max_depth=16,
        default_crawl_delay=0.0,
    )
    sim = simulate(corpus, cfg)
    work = tmp_path_factory.mktemp("stream_crawl")
    sc = StreamingCrawl(
        spark, cfg, str(cdir / "pages.parquet"), str(work)
    )
    sc.run(idle_timeout_s=15.0)
    got = {r["url_canon"] for r in sc.seen_set().collect()}
    assert got == sim.seen
    fetched = {
        (r["url_canon"], r["status"]) for r in sc.fetched().collect()
    }
    assert fetched == {(u, s) for (u, _w, s) in sim.fetched}
    # the robots gate held: nothing blocked was ever fetched
    blocked = _blocked_urls(corpus, got)
    assert blocked and not (blocked & {u for u, _ in fetched})


@pytest.mark.slow
def test_streaming_politeness_envelope(spark, tmp_path_factory):
    """VERDICT r3 item 2 done-gate on a politeness-MIXED corpus:
    (i) no robots-blocked URL ever lands in fetched/;
    (ii) per-host fetch counts stay inside the token-bucket envelope
    (rate = 1/crawl_delay over the run's wall clock + the first
    grant) — over-quota rows re-enqueue instead of fetching."""
    from shaman_scraping_spark.corpus.generator import (
        CorpusSpec, generate_corpus,
    )

    # zipf counts: host00 gets most pages (delay 0, carries /private
    # robots rules → exercises the blocked gate and drains fast);
    # host01 (delay 2) is the throttled host the envelope watches
    corpus = generate_corpus(
        CorpusSpec(n_hosts=2, n_pages=60, crawl_delays=(0, 2),
                   private_frac=1.0)
    )
    assert any(d == 2.0 for _r, d in corpus.robots.values())
    cdir = tmp_path_factory.mktemp("polite_corpus")
    corpus.write(cdir)
    cfg = CrawlConfig(seeds=tuple(corpus.seeds), max_waves=50,
                      max_depth=16)
    work = tmp_path_factory.mktemp("polite_stream")
    sc = StreamingCrawl(
        spark, cfg, str(cdir / "pages.parquet"), str(work)
    )
    t0 = time.monotonic()
    sc.run(idle_timeout_s=10.0, max_wall_s=45.0)
    wall = time.monotonic() - t0
    rows = sc.fetched().collect()
    assert rows, "politeness starved the whole crawl"
    fetched_urls = {r["url_canon"] for r in rows}
    # (i) the robots gate held
    seen = {r["url_canon"] for r in sc.seen_set().collect()}
    blocked = _blocked_urls(corpus, seen)
    assert blocked and not (blocked & fetched_urls)
    # (ii) token-bucket envelope for the throttled host: rate 0.5/s
    # (delay 2), first grant 1s → ≤ 0.5 + wall·0.5 (+1 slack for the
    # batch in flight when the clock was read); the delay-0 host is
    # unlimited by design
    per_host: dict = {}
    for r in rows:
        h = r["url_canon"].split("://", 1)[1].split("/", 1)[0]
        per_host[h] = per_host.get(h, 0) + 1
    throttled = [h for h, (_r, d) in corpus.robots.items() if d == 2.0]
    assert throttled
    for h in throttled:
        n = per_host.get(h, 0)
        envelope = 0.5 + wall * 0.5 + 1
        assert n <= envelope, (h, n, wall)
        assert n > 0, "throttled host never progressed"


def test_replayed_batch_is_idempotent(spark, tiny_corpus_dir,
                                      tmp_path_factory):
    """ADVICE r1: foreachBatch is at-least-once under checkpoint
    recovery — re-processing a micro-batch with the same batch_id must
    not duplicate fetched rows (per-batch-dir overwrite) and must not
    re-enqueue (seen anti-join)."""
    from shaman_scraping_spark.plans.engine import FRONTIER_SCHEMA

    cfg = CrawlConfig(seeds=("http://host00.example/",), max_waves=5)
    work = tmp_path_factory.mktemp("stream_replay")
    sc = StreamingCrawl(
        spark, cfg, str(tiny_corpus_dir / "pages.parquet"), str(work)
    )
    sc.seed()
    # pin the micro-batch input rows: checkpoint recovery replays the
    # SAME rows; a path-based DataFrame would re-list the (since grown)
    # deltas dir because Spark refreshes relations on any write to the
    # path
    rows = spark.read.schema(FRONTIER_SCHEMA).parquet(
        str(work / "deltas")
    ).collect()
    batch = spark.createDataFrame(rows, FRONTIER_SCHEMA)
    sc._process_batch(batch, batch_id=0)
    first = sorted(
        (r["url_canon"], r["status"]) for r in sc.fetched().collect()
    )
    deltas_first = spark.read.schema(FRONTIER_SCHEMA).parquet(
        str(work / "deltas")
    ).count()
    sc._process_batch(batch, batch_id=0)     # simulated replay
    second = sorted(
        (r["url_canon"], r["status"]) for r in sc.fetched().collect()
    )
    assert second == first                    # no duplicate records
    deltas_second = spark.read.schema(FRONTIER_SCHEMA).parquet(
        str(work / "deltas")
    ).count()
    assert deltas_second == deltas_first      # no duplicate enqueues


def test_windowed_metrics_batch_analogue(spark):
    from datetime import datetime, timezone

    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = [
        (t0.replace(second=s), b"x" * n)
        for s, n in [(1, 10), (2, 20), (11, 30), (12, 40), (25, 50)]
    ]
    df = spark.createDataFrame(rows, "fetch_ts timestamp, html binary")
    out = {
        r["window_start"].second: (r["n_fetched"], r["bytes"])
        for r in windowed_fetch_metrics(df, "10 seconds").collect()
    }
    assert out == {0: (2, 30), 10: (2, 70), 20: (1, 50)}


def _drain_stream(q, timeout=60):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        q.processAllAvailable()
        return
    raise TimeoutError


@pytest.mark.slow
def test_watermark_dedup_stream(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    from shaman_scraping_spark.plans.engine import FRONTIER_SCHEMA
    from datetime import datetime, timezone

    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = [
        ("http://a.example/", 11, "a.example", 0, t0, None, 0),
        ("http://a.example/", 11, "a.example", 0, t0, None, 0),  # dup
        ("http://b.example/", 22, "b.example", 0, t0, None, 0),
    ]
    spark.createDataFrame(rows, FRONTIER_SCHEMA).write.parquet(
        str(src), mode="append"
    )
    stream = spark.readStream.schema(FRONTIER_SCHEMA).parquet(str(src))
    deduped = dedup_within_watermark(stream, "10 seconds")
    q = (
        deduped.writeStream.format("memory").queryName("wm_dedup")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT url_canon FROM wm_dedup").collect()
        assert sorted(r["url_canon"] for r in got) == [
            "http://a.example/", "http://b.example/",
        ]
    finally:
        q.stop()


def test_token_bucket_step_matches_batch_wave_clock():
    """VERDICT r2 item 5 gate: the streaming bucket's event-time refill
    kernel, driven on the wave clock (event time = w * wave_seconds,
    refill_per_sec = 1/crawl_delay), yields the same per-wave quota as
    the batch engine's closed-form refill (config.py wave-clock spec) —
    including idle-gap waves and cap saturation.  Exact-rate delays
    keep both roundings identical (the same discipline the corpus
    generator uses)."""
    import math

    from shaman_scraping_spark.streaming.crawl_stream import (
        token_bucket_step,
    )

    ws, cap = 10.0, 20.0
    for delay in (1.0, 2.0, 5.0):
        rate_s = 1.0 / delay
        bt, bw = 0.0, -1        # batch: (tokens, wave_updated)
        st, sl = 0.0, -1 * ws   # stream: (tokens, last_event_seconds)
        # (wave, emission demand) — includes idle gaps (2→7) that
        # exercise multi-period refill and saturation at the cap
        for w, demand in [(0, 1), (2, 3), (3, 0), (7, 200), (8, 1)]:
            gap = w - bw
            avail_b = min(cap, bt + gap * (ws / delay))
            q_b = math.floor(avail_b)
            avail_s, sl = token_bucket_step(st, sl, w * ws, rate_s, cap)
            q_s = int(avail_s)
            assert q_s == q_b, (delay, w)
            n = min(demand, q_b)
            # batch stores only on emission; stream stores every batch
            # (saturating chain ≡ closed form for exact rates)
            if n:
                bt, bw = avail_b - n, w
            st = avail_s - n
    # late/out-of-order batch: no refill, clock never regresses
    avail, last = token_bucket_step(3.0, 100.0, 90.0, 1.0, 20.0)
    assert avail == 3.0 and last == 100.0


@pytest.mark.slow
def test_stateful_token_bucket(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    from shaman_scraping_spark.plans.engine import FRONTIER_SCHEMA
    from datetime import datetime, timezone

    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = [
        (f"http://a.example/p{i}", i, "a.example", 1, t0, None, 1)
        for i in range(10)
    ] + [(f"http://b.example/p{i}", 100 + i, "b.example", 1, t0, None, 1)
         for i in range(2)]
    spark.createDataFrame(rows, FRONTIER_SCHEMA).write.parquet(
        str(src), mode="append"
    )
    stream = spark.readStream.schema(FRONTIER_SCHEMA).parquet(str(src))
    out = stateful_token_bucket(stream, refill_per_sec=3.0, bucket_cap=3.0)
    q = (
        out.writeStream.format("memory").queryName("bucket")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .outputMode("update").start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM bucket").collect()
        a = [r for r in rows if r["host"] == "a.example"]
        b = [r for r in rows if r["host"] == "b.example"]
        assert sum(r["scheduled"] for r in a) == 3     # capped at bucket
        assert sum(r["scheduled"] for r in b) == 2     # under quota
        # the scheduled ones are the priority-ordered head
        sched_urls = sorted(r["url_canon"] for r in a if r["scheduled"])
        assert sched_urls == [f"http://a.example/p{i}" for i in range(3)]
    finally:
        q.stop()
