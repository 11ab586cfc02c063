"""Driver-contract queries: every SQL-expressible operator from
SURVEY.md §2 (✔ rows) + the training-data-pipeline suite, each as a
(spark, sf_dir) → DataFrame callable with a matching DuckDB oracle.

The crawl-native operators run on the driver's TPC-H-ish views as
*analogues* (per SURVEY.md §5.4): per-host top-k ≙ per-user top-k over
events, seen anti-join ≙ customers∖orders, etc.  Column aliases match
the oracle SQL exactly (the driver hash-compares by sorted column
name).  Ops that DuckDB cannot mirror (xxhash64 keying, MinHash/
SimHash, LSH ANN) return DataFrames without an oracle → rows-only
checks, flagged in __spark_entry__.oracle_sql() by omission.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shaman_scraping_spark.functions.text import quality_features
from shaman_scraping_spark.operators.dedup import (
    minhash_neardup_pairs, ngram_jaccard_pairs, simhash64,
)
from shaman_scraping_spark.operators.similarity import (
    cosine_topk, l2_norm, lsh_cosine_topk,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _t_wide(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Like _t, but fanned out across cores first.  The driver's
    parquet files hold ONE row group each (pyarrow default), so a scan
    is a single unsplittable task — fine for cheap projections, but the
    shingle-explode / 64-agg / LSH queries would otherwise do ALL their
    map-side work on one core.  One small shuffle buys full
    parallelism."""
    return _t(spark, sf_dir, name).repartition(
        spark.sparkContext.defaultParallelism
    )


# ---------------------------------------------------------------------------
# §2B — projections / filters / URL algebra analogues
# ---------------------------------------------------------------------------

def q_scope_filter(spark, sf):
    """Op 11: Catalyst scope predicates (pushdown-friendly)."""
    return (
        _t(spark, sf, "documents")
        .filter(
            (F.col("n_chars") >= 200) & (F.col("n_chars") <= 400)
            & (F.col("lang") == "en")
            & F.col("source").startswith("src1")
        )
        .select("doc_id", "source", "n_chars")
    )


def q_host_extract(spark, sf):
    """Op 10 analogue: split_part host derivation + group count."""
    return (
        _t(spark, sf, "documents")
        .withColumn(
            "host",
            F.concat(F.lit("host"),
                     F.split_part(F.col("source"), F.lit("src"), F.lit(2)),
                     F.lit(".example")),
        )
        .groupBy("host")
        .agg(F.count("*").alias("n_docs"))
    )


def q_canon_sort_key(spark, sf):
    """Op 8 analogue: the split → sort → join canonicalization primitive."""
    toks = F.slice(F.split(F.col("text"), " "), 1, 5)
    return _t(spark, sf, "documents").select(
        "doc_id",
        F.array_join(F.array_sort(toks), " ").alias("canon_key"),
    )


def q_url_hash64(spark, sf):
    """Op 9: xxhash64 keying (no DuckDB equivalent → rows-only)."""
    return _t(spark, sf, "documents").select(
        "doc_id", F.xxhash64(F.col("text")).alias("url_hash")
    )


# ---------------------------------------------------------------------------
# §2C — joins / ordering / scheduling analogues
# ---------------------------------------------------------------------------

def q_anti_join_seen(spark, sf):
    """Op 13: exact seen-set anti-join ≙ customers with no urgent order."""
    cust = _t(spark, sf, "customer")
    seen = (
        _t(spark, sf, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.join(seen, "c_custkey", "left_anti").select(
        "c_custkey", "c_name"
    )


def q_dedup_first(spark, sf):
    """Op 14: deterministic in-wave dedup ≙ first event per user.

    r6 rewrite (guide §2.3 "aggregate before you shuffle"): the
    row_number window shuffled and sorted every event row; a
    ``min(struct(ts, event_id))`` group-agg computes the identical
    earliest row with map-side partial aggregation — the shuffle
    carries one struct per user instead of every event, and the
    per-partition sort disappears.  Struct ordering is field-by-field
    (ts, then event_id) — exactly the window's orderBy tiebreak."""
    return (
        _t(spark, sf, "events")
        .groupBy("user_id")
        .agg(F.min(F.struct("ts", "event_id")).alias("f"))
        .select(
            "user_id",
            F.col("f.event_id").alias("event_id"),
            F.col("f.ts").alias("ts"),
        )
    )


def q_per_host_topk(spark, sf):
    """Op 16: per-host politeness top-k ≙ 3 earliest events per user."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        _t(spark, sf, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", F.col("rn").alias("host_rank"))
    )


def q_priority_rank(spark, sf):
    """Op 15: total priority order (ts, event_id) — first 100 emissions."""
    w = Window.orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        _t(spark, sf, "events")
        .withColumn("emit_rank", F.row_number().over(w))
        .filter(F.col("emit_rank") <= 100)
        .select("emit_rank", "event_id")
    )


def q_frontier_merge(spark, sf):
    """Op 21: (A ∪ B) ∖ seen with dedup ≙ two order slices minus a
    'seen' customer set, one row per order."""
    orders = _t(spark, sf, "orders")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    b = orders.filter(F.col("o_totalprice") > 200000.0)
    seen = _t(spark, sf, "customer").filter(F.col("c_acctbal") < 0.0).select(
        F.col("c_custkey").alias("o_custkey")
    )
    # r6 rewrite (guide §2.3): project the union to the three columns
    # the query ever reads BEFORE the anti-join, and replace the
    # row_number window (full shuffle + sort of every merged row) with
    # a min(struct) group-agg — map-side combined, no sort.  The two
    # union branches contribute byte-identical rows per o_orderkey, so
    # the earliest-(o_orderdate) pick is unchanged.
    merged = (
        a.unionByName(b)
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .join(seen, "o_custkey", "left_anti")
    )
    return (
        merged.groupBy("o_orderkey")
        .agg(F.min(F.struct("o_orderdate", "o_custkey")).alias("f"))
        .select("o_orderkey", F.col("f.o_custkey").alias("o_custkey"))
    )


def q_token_refill(spark, sf):
    """Op 17: token-bucket arithmetic ≙ per-user refill from event count."""
    return (
        _t(spark, sf, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .withColumn(
            "tokens",
            F.least(F.lit(100.0), F.col("n_events").cast("double") * 2.5),
        )
        .withColumn("quota", F.floor(F.col("tokens")))
        .select("user_id", "tokens", "quota")
    )


def q_backoff_schedule(spark, sf):
    """Op 52 analogue: error-driven exponential backoff.

    Crawl semantics: a host whose most recent fetches all errored gets
    its politeness delay doubled per consecutive trailing error, capped
    at 2^6 — classic exponential backoff (the engine's wave-level twin
    retries 503s with the same doubling rule).  Here ≙ per ``user_id``
    (host analogue): count 'error' events AFTER the user's last
    non-error event (trailing-error run, ordered by the unique
    ``event_id``) → ``backoff_s = 2^min(run, 6)``.  Users whose latest
    event succeeded carry no backoff and are omitted.  Pure Catalyst:
    one map-side-combined agg + one shuffle join on user_id — no
    window over the full history, so it scales to 10^10 fetch-log rows
    partitioned by host."""
    ev = _t(spark, sf, "events")
    last_ok = (
        ev.filter(F.col("event_type") != "error")
        .groupBy("user_id")
        .agg(F.max("event_id").alias("last_ok_id"))
    )
    return (
        ev.join(last_ok, "user_id", "left")
        .filter(
            (F.col("event_type") == "error")
            & (
                F.col("last_ok_id").isNull()
                | (F.col("event_id") > F.col("last_ok_id"))
            )
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_trailing_errors"),
            F.max("event_id").alias("last_err_id"),
        )
        .withColumn(
            "backoff_s",
            F.pow(
                F.lit(2.0),
                F.least(F.col("n_trailing_errors"), F.lit(6)).cast("double"),
            ),
        )
    )


def q_recrawl_schedule(spark, sf):
    """Op 53 analogue: change-frequency recrawl scheduling.

    Crawl semantics: a continuous crawler re-visits a page at its
    observed change cadence — estimate per-page mean inter-snapshot
    interval from ``warc_ts`` history and schedule the next fetch one
    mean interval after the last.  Here ≙ per ``user_id``: mean
    interarrival of events in exact integer MICROSECONDS (lag window
    ordered by (ts, event_id)), ``next_due_us = floor(last + mean)``.
    Integer-µs arithmetic keeps Spark and the DuckDB oracle
    bit-identical (timestamp→double roundtrips would not be).  One
    window + one agg, both partitioned by the schedule key — at scale
    this is the same salted-host partitioning as the frontier."""
    ev = _t(spark, sf, "events").withColumn(
        # parquet reads ts as TIMESTAMP_NTZ; the session TZ is pinned
        # UTC (session.py), so the cast is an exact reinterpretation
        # and unix_micros ≡ DuckDB's epoch_us on the naive value
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("gap_us", F.col("ts_us") - F.lag("ts_us").over(w))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("gap_us"), 4).alias("avg_gap_us"),
            F.max("ts_us").alias("last_ts_us"),
        )
        .filter(F.col("avg_gap_us").isNotNull())
        .withColumn(
            "next_due_us",
            F.floor(
                F.col("last_ts_us").cast("double") + F.col("avg_gap_us")
            ).cast("long"),
        )
    )


def q_trap_patterns(spark, sf):
    """Op 54 analogue: URL-pattern mining for crawl-trap detection.

    Crawl semantics: collapse every digit run in the URL path to
    ``#`` and flag (host, template) families whose member count
    reaches the trap threshold — calendar/session-id/faceted-search
    explosions all collapse to one hot template.  Here ≙ per
    ``source`` (host analogue): template = ``lang`` + the
    digit-collapsed ``n_chars`` — rows that differ only in the number
    collapse to one ``lang/#`` template; families with ≥ 10 docs are
    "traps".  Pure Catalyst: regexp_replace + one map-side-combined
    count — the detection dim stays bounded by distinct templates,
    never corpus rows, which is what makes the guard broadcastable
    at 10^10-URL scale."""
    d = _t(spark, sf, "documents")
    template = F.regexp_replace(
        F.concat_ws(
            "/", F.col("lang"), F.col("n_chars").cast("string")
        ),
        "[0-9]+",
        "#",
    )
    return (
        d.select(F.col("source").alias("host"),
                 template.alias("template"))
        .groupBy("host", "template")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 10)
    )


def q_redirect_hops(spark, sf):
    """Op 20: bounded self-join ≙ consecutive order pairs per customer.

    r6 rewrite (guide §1.2 "the distributed algorithm"): the self-join
    materialized every (earlier, later) order pair — O(k²) rows per
    customer — only to count them.  Counting ordered pairs with
    distinct dates needs no join: with per-(custkey, date) counts c_d,
    #pairs = (n² − Σc_d²)/2 where n = Σc_d.  Two map-side-combined
    aggregations replace the join; integer arithmetic, so the result
    is bit-identical.  Customers whose orders all share one date
    produced no joined row before → filter n_hops > 0."""
    per_date = (
        _t(spark, sf, "orders")
        .select("o_custkey", "o_orderdate")
        # one exchange for both aggregations: hash-partitioning on
        # o_custkey satisfies the (o_custkey, o_orderdate) grouping's
        # clustering requirement AND the outer groupBy's, so neither
        # aggregate re-shuffles (guide §2.4 "two operations keyed the
        # same way can share one exchange"); it also fans the 2-task
        # single-row-group scan out to every core (1.77 → 0.60 s at
        # sf1.0, bench_extra.py)
        .repartition(spark.sparkContext.defaultParallelism, "o_custkey")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.count("*").alias("c"))
    )
    return (
        per_date.groupBy("o_custkey")
        .agg(
            F.sum("c").alias("n"),
            F.sum(F.col("c") * F.col("c")).alias("ss"),
        )
        .select(
            "o_custkey",
            ((F.col("n") * F.col("n") - F.col("ss")) / F.lit(2))
            .cast("long").alias("n_hops"),
        )
        .filter(F.col("n_hops") > 0)
    )


def _word_chunks(text_col: str = "text", k: int = 2):
    """Consecutive k-word chunks of *text_col*, split on single spaces —
    the 'line' proxy for the word-soup documents table (it has no
    newlines), chunked identically to the DuckDB oracles' list slicing."""
    w = F.split(F.col(text_col), " ")
    nch = F.ceil(F.size(w) / F.lit(float(k))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), nch - 1),
        lambda i: F.array_join(F.slice(w, i * k + 1, k), " "),
    )
    return F.when(F.size(w) > 0, chunks).otherwise(
        F.array().cast("array<string>")
    )


def q_dup_lines(spark, sf):
    """Op 56 (`operators/dedup.dup_lines` shape): cross-document
    duplicated lines — explode → DISTINCT (line, doc) → count, both
    shuffles map-side combined.  Lines ≙ 2-word chunks here (the
    synthetic corpus has no newlines); the real operator splits \\n."""
    # explode_outer + isNotNull (r6): an inner explode infers a
    # size(chunks)>0 filter pushed below the fan-out exchange, so the
    # chunking expression would run twice — once on the single-task
    # scan (see operators/dedup._explode_expensive)
    pairs = (
        _t_wide(spark, sf, "documents")
        .select("doc_id", F.explode_outer(_word_chunks()).alias("line"))
        .filter(F.col("line").isNotNull())
        .distinct()
    )
    return (
        pairs.groupBy("line")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
    )


def q_repetition_filter(spark, sf):
    """Op 57 (`functions/text.dup_line_frac` / `top_word_count`
    shapes): Gopher-style per-document repetition stats — duplicate-
    line fraction plus the most-frequent-token count."""
    docs = _t_wide(spark, sf, "documents")
    lines = docs.select(
        "doc_id", F.explode_outer(_word_chunks()).alias("line")
    ).filter(F.col("line").isNotNull())
    per_line = (
        lines.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.countDistinct("line").alias("n_distinct"),
        )
        .withColumn(
            "dup_line_frac",
            F.round(
                F.lit(1.0) - F.col("n_distinct") / F.col("n_lines"), 6
            ),
        )
    )
    top = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
        )
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_word_n"))
    )
    return per_line.join(top, "doc_id")


def q_semantic_clusters(spark, sf):
    """Op 61 (`operators/similarity.semantic_clusters`): distributed
    k-means over the embedding column (MLlib, array_to_vector JVM-side).
    Iterative — no SQL oracle; rows-only by documented omission (like
    ann_lsh); geometry correctness is pytest-gated on planted blobs
    (tests/test_semdedup.py)."""
    from shaman_scraping_spark.operators.similarity import (
        semantic_clusters,
    )

    return semantic_clusters(_t_wide(spark, sf, "embeddings"), k=10)


def q_pii_redact(spark, sf):
    """Op 58 (`functions/text.pii_counts` / `redact_pii` machinery):
    regex scan-count + global redaction, exercised on events.props with
    a digit-run pattern whose semantics are identical in Java and RE2
    regex dialects (the PII patterns themselves are applied over text
    corpora by the clean pipeline — tests/test_pii.py)."""
    return _t(spark, sf, "events").select(
        "event_id",
        F.size(
            F.regexp_extract_all(F.col("props"), F.lit("[0-9]+"), F.lit(0))
        ).cast("int").alias("n_digit_runs"),
        F.regexp_replace(F.col("props"), "[0-9]+", "#").alias("redacted"),
    )


def q_pagerank(spark, sf):
    """Op 55: integer PageRank (``operators/graph.pagerank_int_units``,
    the bit-deterministic twin of the float operator) over a synthetic
    3-out-regular graph derived from documents: doc i links to
    (31·i + g) mod N for g ∈ {0,1,2}.  All arithmetic in BIGINT units,
    so sums are order-independent and the result hash-compares against
    the unrolled-CTE DuckDB oracle."""
    from shaman_scraping_spark.operators.graph import pagerank_int_units

    docs = _t(spark, sf, "documents").select(F.col("doc_id").alias("node"))
    n = docs.count()  # bounded: one scalar for the modulus
    g = spark.range(3).select(F.col("id").alias("g"))
    edges = docs.crossJoin(g).select(
        F.col("node").alias("src"),
        ((F.col("node") * 31 + F.col("g")) % n).alias("dst"),
    )
    return pagerank_int_units(docs, edges, iterations=3)


# ---------------------------------------------------------------------------
# §2E — aggregations / metrics
# ---------------------------------------------------------------------------

def q_lineage_agg(spark, sf):
    """Op 29: lineage rollup ≙ count + bytes per event_type."""
    return (
        _t(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("urls_emitted"),
            F.round(F.sum("value"), 4).alias("bytes_fetched"),
        )
    )


def q_stats_cube(spark, sf):
    """Op 30: crawl-stats CUBE ≙ cube(status, priority) over orders."""
    return (
        _t(spark, sf, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


def q_topk_hosts(spark, sf):
    """Op 32: hot-host skew probe ≙ top-5 sources by doc count."""
    return (
        _t(spark, sf, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.col("n_docs").desc(), F.col("source").asc())
        .limit(5)
    )


def q_distinct_urls(spark, sf):
    """Op 31: seen-set cardinality (exact)."""
    return _t(spark, sf, "documents").agg(
        F.countDistinct("source").alias("n_distinct_sources"),
        F.count("*").alias("n_rows"),
    )


def q_window_metrics(spark, sf):
    """Op 39 batch analogue: tumbling-window counts per hour."""
    return (
        _t(spark, sf, "events")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour_ts"))
        .agg(F.count("*").alias("n_events"))
    )


def q_json_props(spark, sf):
    """Op 28: JSON property access + rollup.

    r6: the events parquet is one row group — an unsplittable scan
    (guide §2.5 "input skew"), so the 10^6 JSON parses all ran on one
    core.  Project to the single column the parse needs and fan out
    first; the parse then runs on every core (measured 2.14 → 1.59 s
    at sf1.0, interleaved medians, bench_extra.py)."""
    return (
        _t(spark, sf, "events")
        .select("props")
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn(
            "k", F.get_json_object(F.col("props"), "$.k").cast("int")
        )
        .groupBy("k")
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# training-data pipeline suite
# ---------------------------------------------------------------------------

def q_exact_dedup(spark, sf):
    """Exact dedup: keeper doc per (lang, first word) bucket.

    r6 (guide §2.3): keeper = min doc_id per group is literally a
    min aggregate — map-side combined, no per-group sort (the window
    shuffled and sorted every doc row)."""
    docs = _t(spark, sf, "documents").withColumn(
        "word1", F.split_part(F.col("text"), F.lit(" "), F.lit(1))
    )
    return (
        docs.groupBy("lang", "word1")
        .agg(F.min("doc_id").alias("keeper"))
    )


def q_token_count(spark, sf):
    # r6: _t_wide — single-row-group scan, so the regex tokenization ran
    # on one core (0.49 → 0.33 s at sf1.0, bench_extra.py)
    return _t_wide(spark, sf, "documents").select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
    )


def q_quality_score(spark, sf):
    # r6: _t_wide — the three regex-split feature expressions are the
    # cost; on the unsplittable one-row-group scan they ran on one core
    # (1.22 → 0.47 s at sf1.0, bench_extra.py)
    feats = quality_features("text")
    return _t_wide(spark, sf, "documents").select(
        "doc_id",
        feats["n_tokens"].alias("n_tokens"),
        feats["mean_token_len"].alias("mean_token_len"),
        feats["stopword_ratio"].alias("stopword_ratio"),
    )


def q_lang_score(spark, sf):
    """Language-ID analogue with a SQL-mirrorable scorer: count 'the'
    occurrences as a token (the full profile-vote lang_id() is
    pytest-covered on the crawl corpus, where vocab differs by lang)."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    hits = F.size(F.filter(toks, lambda t: t == F.lit("the")))
    return _t(spark, sf, "documents").select(
        "doc_id",
        hits.alias("en_hits"),
        F.when(hits > 0, F.lit("en-ish")).otherwise(F.lit("other"))
        .alias("guess"),
    )


def q_minhash_neardup(spark, sf):
    """MinHash+LSH near-dup candidates (rows-only; xxhash64-based)."""
    return minhash_neardup_pairs(
        _t_wide(spark, sf, "documents"), "doc_id", "text",
        num_perm=16, bands=4, threshold=0.5,
    )


def q_simhash(spark, sf):
    """SimHash fingerprints (rows-only; xxhash64-based)."""
    return simhash64(_t_wide(spark, sf, "documents"), "doc_id", "text")


def q_ngram_jaccard(spark, sf):
    """Exact 5-gram Jaccard pairs over same-source docs, j ≥ 0.2.

    max_df=32 keeps the web-scale hot-shingle guard ALWAYS on (a
    production call must never run uncapped); the testdata's max
    per-source shingle document frequency is 3 (sf0.1), so no shingle
    is actually pruned and the DuckDB oracle equality is exact."""
    return ngram_jaccard_pairs(
        _t_wide(spark, sf, "documents"), "doc_id", "text",
        k=5, threshold=0.2, group_col="source", max_df=32,
    ).select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


def q_boilerplate(spark, sf):
    """Cross-document duplicated 3-grams (boilerplate detection):
    shingles in ≥ 4 distinct docs, top-20 by (n_docs desc, shingle)."""
    from shaman_scraping_spark.operators.dedup import boilerplate_shingles

    return boilerplate_shingles(
        _t_wide(spark, sf, "documents"), "doc_id", "text",
        k=3, min_docs=4, top=20,
    )


def q_ann_topk(spark, sf):
    """Brute-force cosine top-5 for one query vector (ids+rank only —
    float sims differ across engines in the last ulp).

    r6: _t_wide — the cosine higher-order aggregates otherwise run on
    the one-row-group scan's single task (0.86 → 0.62 s at sf1.0);
    per-row float math is partition-independent, so results are
    unchanged."""
    emb = _t_wide(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk(emb, q, k=5).select(
        "query_id", F.col("vec_id").alias("neighbor_id"), "rank"
    )


def q_ann_lsh(spark, sf):
    """LSH-bucketed approximate ANN (rows-only; hyperplane seed 42)."""
    emb = _t_wide(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_cosine_topk(emb, q, k=5, dim=64).select(
        "query_id", F.col("vec_id").alias("neighbor_id"), "rank"
    )


def q_doc_fingerprint(spark, sf):
    """Winnowing-style doc fingerprint, exploded to one (doc_id,
    fp_hash) row per fingerprint entry (rows-only; xxhash64-based).

    The fingerprint itself is array<bigint>; the driver's pandas
    canonicalization sorts columns and Python lists are unhashable, so
    the driver entry emits scalar rows (VERDICT r2 What's-wrong #1).
    posexplode keeps the within-fingerprint order observable."""
    from shaman_scraping_spark.functions.text import doc_fingerprint

    # prefilter + posexplode_outer (r6): the inner posexplode's
    # inferred size(fp)>0 filter was pushed below the repartition,
    # evaluating the whole winnowing expression twice — once on the
    # unsplittable single-task scan (measured 26.5 → 1.8 s at sf1.0).
    # trim(text) != '' guarantees ≥1 shingle → ≥1 fingerprint entry,
    # so the outer explode emits exactly the inner explode's rows.
    return (
        _t_wide(spark, sf, "documents")
        .filter(F.trim(F.col("text")) != "")
        .select("doc_id", doc_fingerprint("text", k=4, keep=4).alias("fp"))
        .select(
            "doc_id", F.posexplode_outer("fp").alias("fp_pos", "fp_hash")
        )
    )


def q_embedding_norm(spark, sf):
    return _t(spark, sf, "embeddings").select(
        "vec_id", F.round(l2_norm(F.col("embedding")), 3).alias("l2")
    )


QUERIES = {
    "scope_filter": q_scope_filter,
    "host_extract": q_host_extract,
    "canon_sort_key": q_canon_sort_key,
    "url_hash64": q_url_hash64,
    "anti_join_seen": q_anti_join_seen,
    "dedup_first": q_dedup_first,
    "per_host_topk": q_per_host_topk,
    "priority_rank": q_priority_rank,
    "frontier_merge": q_frontier_merge,
    "token_refill": q_token_refill,
    "backoff_schedule": q_backoff_schedule,
    "recrawl_schedule": q_recrawl_schedule,
    "trap_patterns": q_trap_patterns,
    "pagerank": q_pagerank,
    "dup_lines": q_dup_lines,
    "repetition_filter": q_repetition_filter,
    "pii_redact": q_pii_redact,
    "semantic_cluster": q_semantic_clusters,
    "redirect_hops": q_redirect_hops,
    "lineage_agg": q_lineage_agg,
    "stats_cube": q_stats_cube,
    "topk_hosts": q_topk_hosts,
    "distinct_urls": q_distinct_urls,
    "window_metrics": q_window_metrics,
    "json_props": q_json_props,
    "exact_dedup": q_exact_dedup,
    "token_count": q_token_count,
    "quality_score": q_quality_score,
    "lang_score": q_lang_score,
    "minhash_neardup": q_minhash_neardup,
    "simhash": q_simhash,
    "ngram_jaccard": q_ngram_jaccard,
    "boilerplate_ngrams": q_boilerplate,
    "doc_fingerprint": q_doc_fingerprint,
    "ann_topk": q_ann_topk,
    "ann_lsh": q_ann_lsh,
    "embedding_norm": q_embedding_norm,
}

ORACLES = {
    "scope_filter": """
        SELECT doc_id, source, n_chars FROM documents
        WHERE n_chars BETWEEN 200 AND 400 AND lang = 'en'
          AND source LIKE 'src1%'
    """,
    "host_extract": """
        SELECT 'host' || split_part(source, 'src', 2) || '.example' AS host,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY 1
    """,
    "canon_sort_key": """
        SELECT doc_id,
               array_to_string(list_sort(string_split(text, ' ')[1:5]), ' ')
                   AS canon_key
        FROM documents
    """,
    "anti_join_seen": """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN
          (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
    "dedup_first": """
        SELECT user_id, event_id, ts FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) = 1
    """,
    "per_host_topk": """
        SELECT user_id, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS host_rank
        FROM events
        QUALIFY host_rank <= 3
    """,
    "priority_rank": """
        SELECT emit_rank, event_id FROM (
          SELECT row_number() OVER (ORDER BY ts, event_id) AS emit_rank,
                 event_id
          FROM events
        ) WHERE emit_rank <= 100
    """,
    "frontier_merge": """
        WITH merged AS (
          SELECT * FROM orders WHERE o_orderpriority = '1-URGENT'
          UNION ALL
          SELECT * FROM orders WHERE o_totalprice > 200000.0
        ), unseen AS (
          SELECT * FROM merged
          WHERE o_custkey NOT IN
            (SELECT c_custkey FROM customer WHERE c_acctbal < 0.0)
        )
        SELECT o_orderkey, o_custkey FROM unseen
        QUALIFY row_number() OVER (PARTITION BY o_orderkey
                                   ORDER BY o_orderdate) = 1
    """,
    "token_refill": """
        SELECT user_id,
               least(100.0, CAST(count(*) AS DOUBLE) * 2.5) AS tokens,
               CAST(floor(least(100.0, CAST(count(*) AS DOUBLE) * 2.5))
                    AS BIGINT) AS quota
        FROM events GROUP BY user_id
    """,
    "backoff_schedule": """
        WITH last_ok AS (
          SELECT user_id, max(event_id) AS last_ok_id
          FROM events WHERE event_type <> 'error' GROUP BY user_id
        )
        SELECT e.user_id,
               CAST(count(*) AS BIGINT) AS n_trailing_errors,
               CAST(max(e.event_id) AS BIGINT) AS last_err_id,
               CAST(pow(2.0, least(count(*), 6)) AS DOUBLE) AS backoff_s
        FROM events e LEFT JOIN last_ok l USING (user_id)
        WHERE e.event_type = 'error'
          AND (l.last_ok_id IS NULL OR e.event_id > l.last_ok_id)
        GROUP BY e.user_id
    """,
    "recrawl_schedule": """
        WITH gaps AS (
          SELECT user_id,
                 epoch_us(ts) AS ts_us,
                 epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS gap_us
          FROM events
        )
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               round(CAST(avg(gap_us) AS DOUBLE), 4) AS avg_gap_us,
               CAST(max(ts_us) AS BIGINT) AS last_ts_us,
               CAST(floor(CAST(max(ts_us) AS DOUBLE)
                          + round(CAST(avg(gap_us) AS DOUBLE), 4))
                    AS BIGINT) AS next_due_us
        FROM gaps
        GROUP BY user_id
        HAVING avg(gap_us) IS NOT NULL
    """,
    "trap_patterns": """
        SELECT source AS host,
               regexp_replace(
                 concat_ws('/', lang, CAST(n_chars AS VARCHAR)),
                 '[0-9]+', '#', 'g') AS template,
               CAST(count(*) AS BIGINT) AS n
        FROM documents
        GROUP BY 1, 2
        HAVING count(*) >= 10
    """,
    "pagerank": """
        WITH nodes AS (SELECT doc_id AS node FROM documents),
        n AS (SELECT count(*) AS c FROM nodes),
        e AS (
          SELECT node AS src, (node * 31 + g.g) % (SELECT c FROM n) AS dst
          FROM nodes, (VALUES (0), (1), (2)) AS g(g)
        ),
        outdeg AS (SELECT src, count(*) AS od FROM e GROUP BY src),
        r0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS r FROM nodes),
        c1 AS (
          SELECT e.dst AS node, SUM(r0.r // o.od) AS s
          FROM e JOIN outdeg o ON e.src = o.src
                 JOIN r0 ON e.src = r0.node
          GROUP BY e.dst
        ),
        r1 AS (
          SELECT nodes.node,
                 CAST(150000000000 + (17 * COALESCE(c1.s, 0)) // 20
                      AS BIGINT) AS r
          FROM nodes LEFT JOIN c1 USING (node)
        ),
        c2 AS (
          SELECT e.dst AS node, SUM(r1.r // o.od) AS s
          FROM e JOIN outdeg o ON e.src = o.src
                 JOIN r1 ON e.src = r1.node
          GROUP BY e.dst
        ),
        r2 AS (
          SELECT nodes.node,
                 CAST(150000000000 + (17 * COALESCE(c2.s, 0)) // 20
                      AS BIGINT) AS r
          FROM nodes LEFT JOIN c2 USING (node)
        ),
        c3 AS (
          SELECT e.dst AS node, SUM(r2.r // o.od) AS s
          FROM e JOIN outdeg o ON e.src = o.src
                 JOIN r2 ON e.src = r2.node
          GROUP BY e.dst
        ),
        r3 AS (
          SELECT nodes.node,
                 CAST(150000000000 + (17 * COALESCE(c3.s, 0)) // 20
                      AS BIGINT) AS r
          FROM nodes LEFT JOIN c3 USING (node)
        )
        SELECT node, r AS rank_units FROM r3
    """,
    "dup_lines": """
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        idx AS (
          SELECT doc_id, w,
                 CAST(unnest(range(0, CAST(ceil(len(w) / 2.0) AS BIGINT)))
                      AS BIGINT) AS i
          FROM toks
        ),
        chunks AS (
          SELECT DISTINCT doc_id,
                 array_to_string(w[(i * 2 + 1):(i * 2 + 2)], ' ') AS line
          FROM idx
        )
        SELECT line, CAST(count(*) AS BIGINT) AS n_docs
        FROM chunks GROUP BY line HAVING count(*) >= 2
    """,
    "repetition_filter": """
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        idx AS (
          SELECT doc_id, w,
                 CAST(unnest(range(0, CAST(ceil(len(w) / 2.0) AS BIGINT)))
                      AS BIGINT) AS i
          FROM toks
        ),
        chunks AS (
          SELECT doc_id,
                 array_to_string(w[(i * 2 + 1):(i * 2 + 2)], ' ') AS line
          FROM idx
        ),
        per_line AS (
          SELECT doc_id,
                 CAST(count(*) AS BIGINT) AS n_lines,
                 CAST(count(DISTINCT line) AS BIGINT) AS n_distinct,
                 round(1.0 - count(DISTINCT line) / count(*), 6)
                     AS dup_line_frac
          FROM chunks GROUP BY doc_id
        ),
        wcc AS (
          SELECT doc_id, word, count(*) AS c
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                FROM documents)
          GROUP BY doc_id, word
        ),
        top AS (
          SELECT doc_id, CAST(max(c) AS BIGINT) AS top_word_n
          FROM wcc GROUP BY doc_id
        )
        SELECT per_line.doc_id, n_lines, n_distinct, dup_line_frac,
               top_word_n
        FROM per_line JOIN top USING (doc_id)
    """,
    "pii_redact": """
        SELECT event_id,
               CAST(len(regexp_extract_all(props, '[0-9]+'))
                    AS INTEGER) AS n_digit_runs,
               regexp_replace(props, '[0-9]+', '#', 'g') AS redacted
        FROM events
    """,
    "redirect_hops": """
        SELECT o1.o_custkey, CAST(count(*) AS BIGINT) AS n_hops
        FROM orders o1 JOIN orders o2
          ON o1.o_custkey = o2.o_custkey AND o2.o_orderdate > o1.o_orderdate
        GROUP BY o1.o_custkey
    """,
    "lineage_agg": """
        SELECT event_type, CAST(count(*) AS BIGINT) AS urls_emitted,
               round(CAST(sum(value) AS DOUBLE), 4) AS bytes_fetched
        FROM events GROUP BY event_type
    """,
    "stats_cube": """
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS total_price
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "topk_hosts": """
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY source
        ORDER BY n_docs DESC, source ASC LIMIT 5
    """,
    "distinct_urls": """
        SELECT CAST(count(DISTINCT source) AS BIGINT) AS n_distinct_sources,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM documents
    """,
    "window_metrics": """
        SELECT date_trunc('hour', ts) AS hour_ts,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1
    """,
    "json_props": """
        SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    """,
    "exact_dedup": """
        SELECT lang, split_part(text, ' ', 1) AS word1,
               min(doc_id) AS keeper
        FROM documents GROUP BY lang, word1
    """,
    "token_count": """
        SELECT doc_id,
               CAST(CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+'))
                    END AS INT) AS n_tokens
        FROM documents
    """,
    "quality_score": """
        SELECT doc_id,
               CAST(CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+'))
                    END AS INT) AS n_tokens,
               round(CAST(length(text) AS DOUBLE)
                     / greatest(CASE WHEN trim(text) = '' THEN 0
                                ELSE len(string_split_regex(trim(text),
                                                            '\\s+')) END, 1),
                     4) AS mean_token_len,
               round(CAST(len(list_filter(string_split_regex(trim(text),
                         '\\s+'),
                         t -> list_contains(['the','over','lazy','quick',
                                             'jumps'], t))) AS DOUBLE)
                     / greatest(CASE WHEN trim(text) = '' THEN 0
                                ELSE len(string_split_regex(trim(text),
                                                            '\\s+')) END, 1),
                     4) AS stopword_ratio
        FROM documents
    """,
    "lang_score": """
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                    t -> t = 'the')) AS INT) AS en_hits,
               CASE WHEN len(list_filter(string_split_regex(trim(text),
                        '\\s+'), t -> t = 'the')) > 0
                    THEN 'en-ish' ELSE 'other' END AS guess
        FROM documents
    """,
    "boilerplate_ngrams": """
        WITH sh AS (
          SELECT DISTINCT doc_id,
                 array_to_string(toks[i:i+2], ' ') AS shingle
          FROM (
            SELECT doc_id,
                   string_split_regex(trim(text), '\\s+') AS toks
            FROM documents WHERE trim(text) <> ''
          ), unnest(generate_series(1, greatest(len(toks) - 2, 1))) AS g(i)
        )
        SELECT shingle, CAST(count(*) AS BIGINT) AS n_docs
        FROM sh GROUP BY shingle HAVING count(*) >= 4
        ORDER BY n_docs DESC, shingle ASC LIMIT 20
    """,
    "ngram_jaccard": """
        WITH sh AS (
          SELECT DISTINCT doc_id, source,
                 array_to_string(toks[i:i+4], ' ') AS shingle
          FROM (
            SELECT doc_id, source,
                   string_split_regex(trim(text), '\\s+') AS toks
            FROM documents WHERE trim(text) <> ''
          ), unnest(generate_series(1, greatest(len(toks) - 4, 1))) AS g(i)
        ), sizes AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY 1
        ), inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(count(*) AS BIGINT) AS inter
          FROM sh a JOIN sh b
            ON a.shingle = b.shingle AND a.source = b.source
               AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               round(CAST(inter AS DOUBLE)
                     / (sa.n_sh + sb.n_sh - inter), 4) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.2
    """,
    "ann_topk": """
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        scored AS (
          SELECT 0 AS query_id, e.vec_id AS neighbor_id,
                 list_cosine_similarity(e.embedding, q.qv) AS sim
          FROM embeddings e, q WHERE e.vec_id <> 0
        )
        SELECT query_id, neighbor_id,
               CAST(row_number() OVER (ORDER BY sim DESC, neighbor_id)
                    AS INT) AS rank
        FROM scored
        QUALIFY rank <= 5
    """,
    "embedding_norm": """
        SELECT vec_id,
               round(sqrt(list_sum(list_transform(embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 3)
                   AS l2
        FROM embeddings
    """,
}
