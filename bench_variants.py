"""Experimental query variants for bench_extra.py A/B runs.

Scratch space — winners get promoted into
shaman_scraping_spark/driver_queries.py (after oracle verification);
losers stay here as measured evidence for OPTIMIZATION_r06.md.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from shaman_scraping_spark.driver_queries import _t, _t_wide


# json_props: the sf parquet files are single-row-group, so the scan —
# and the 10^6 get_json_object parses — run on ONE core (guide §2.5
# "input skew: one huge unsplittable file").  Repartition the skinny
# props projection first.
def q_json_props_wide(spark, sf):
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


def q_json_props_fromjson(spark, sf):
    return (
        _t(spark, sf, "events")
        .select("props")
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn("k", F.from_json(F.col("props"), "k int").getField("k"))
        .groupBy("k")
        .agg(F.count("*").alias("n"))
    )


def q_quality_score_wide(spark, sf):
    from shaman_scraping_spark.functions.text import quality_features

    feats = quality_features("text")
    return _t_wide(spark, sf, "documents").select(
        "doc_id",
        feats["n_tokens"].alias("n_tokens"),
        feats["mean_token_len"].alias("mean_token_len"),
        feats["stopword_ratio"].alias("stopword_ratio"),
    )


def q_token_count_wide(spark, sf):
    return _t_wide(spark, sf, "documents").select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
    )


def q_pii_redact_wide(spark, sf):
    return _t_wide(spark, sf, "events").select(
        "event_id",
        F.size(
            F.regexp_extract_all(F.col("props"), F.lit("[0-9]+"), F.lit(0))
        ).cast("int").alias("n_digit_runs"),
        F.regexp_replace(F.col("props"), "[0-9]+", "#").alias("redacted"),
    )


def q_dedup_first_wide(spark, sf):
    return (
        _t_wide(spark, sf, "events")
        .groupBy("user_id")
        .agg(F.min(F.struct("ts", "event_id")).alias("f"))
        .select(
            "user_id",
            F.col("f.event_id").alias("event_id"),
            F.col("f.ts").alias("ts"),
        )
    )


def q_simhash_agg(spark, sf):
    """SimHash via per-row higher-order aggregate: no explode, no
    shuffle — each doc's 64 votes accumulate over its token-hash array
    in one pass; must be bit-identical to the explode+64-agg build."""
    from shaman_scraping_spark.operators.dedup import tokens_col
    ths = F.transform(tokens_col("text"), lambda t: F.xxhash64(t))
    votes = F.aggregate(
        ths,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.array(*[
                F.when(
                    F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1)).cast("long")
                for b in range(64)
            ]),
            lambda a, v: a + v,
        ),
    )
    acc = F.lit(0).cast("long")
    for bit in range(64):
        mask = (1 << bit) if bit < 63 else -(1 << 63)
        acc = acc.bitwiseOR(
            F.when(F.element_at(F.col("__v"), bit + 1) > 0,
                   F.lit(mask).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
    return (
        _t_wide(spark, sf, "documents")
        .filter(F.size(tokens_col("text")) > 0)
        .withColumn("__v", votes)
        .select(F.col("doc_id"), acc.alias("simhash"))
    )


def q_per_host_topk_agg(spark, sf):
    top = F.slice(F.array_sort(F.collect_list(F.struct("ts", "event_id"))),
                  1, 3)
    return (
        _t(spark, sf, "events")
        .groupBy("user_id")
        .agg(top.alias("t"))
        .select("user_id", F.posexplode("t").alias("p", "s"))
        .select(
            "user_id",
            F.col("s.event_id").alias("event_id"),
            (F.col("p") + 1).cast("int").alias("host_rank"),
        )
    )


def q_redirect_hops_onex(spark, sf):
    part = (
        _t(spark, sf, "orders")
        .select("o_custkey", "o_orderdate")
        .repartition(spark.sparkContext.defaultParallelism, "o_custkey")
    )
    per_date = part.groupBy("o_custkey", "o_orderdate").agg(
        F.count("*").alias("c"))
    return (
        per_date.groupBy("o_custkey")
        .agg(F.sum("c").alias("n"), F.sum(F.col("c") * F.col("c")).alias("ss"))
        .select(
            "o_custkey",
            ((F.col("n") * F.col("n") - F.col("ss")) / F.lit(2))
            .cast("long").alias("n_hops"),
        )
        .filter(F.col("n_hops") > 0)
    )


def q_anti_join_seen_bcast(spark, sf):
    cust = _t(spark, sf, "customer")
    seen = (
        _t(spark, sf, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.join(F.broadcast(seen), "c_custkey", "left_anti").select(
        "c_custkey", "c_name"
    )


def q_stats_cube_wide(spark, sf):
    return (
        _t(spark, sf, "orders")
        .select("o_orderstatus", "o_orderpriority", "o_totalprice")
        .repartition(spark.sparkContext.defaultParallelism)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


def q_ann_topk_wide(spark, sf):
    from shaman_scraping_spark.operators.similarity import cosine_topk
    emb = _t_wide(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk(emb, q, k=5).select(
        "query_id", F.col("vec_id").alias("neighbor_id"), "rank"
    )


def q_minhash_neardup_innerexplode(spark, sf):
    """minhash with the pre-r6 INNER explode in signatures (A/B probe
    for the _explode_expensive change)."""
    from shaman_scraping_spark.operators.dedup import shingles_col
    df = _t_wide(spark, sf, "documents")
    id_col, text_col, num_perm, bands, threshold = "doc_id", "text", 16, 4, 0.5
    ex = df.select(
        F.col(id_col), F.explode(shingles_col(text_col, 3)).alias("sh")
    )
    aggs = [F.min(F.xxhash64(F.col("sh"), F.lit(i))).alias(f"h{i}")
            for i in range(num_perm)]
    sig = ex.groupBy(id_col).agg(*aggs)
    rows = num_perm // bands
    band_exprs = []
    for bd in range(bands):
        cols = [F.col(f"h{bd * rows + r}") for r in range(rows)]
        band_exprs.append(F.struct(F.lit(bd).alias("band_id"),
                                   F.xxhash64(*cols).alias("band_hash")))
    banded = sig.select(
        F.col(id_col),
        F.struct(*[F.col(f"h{i}") for i in range(num_perm)]).alias("sig"),
        F.explode(F.array(*band_exprs)).alias("band"),
    ).select(id_col, "sig", "band.band_id", "band.band_hash")
    a, b = banded.alias("a"), banded.alias("b")
    matches = sum(
        F.when(F.col(f"a.sig.h{i}") == F.col(f"b.sig.h{i}"), 1).otherwise(0)
        for i in range(num_perm)
    )
    return (
        a.join(b, (F.col("a.band_id") == F.col("b.band_id"))
               & (F.col("a.band_hash") == F.col("b.band_hash"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                (matches / F.lit(16.0)).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
        .distinct()
    )


def _minhash_sig_per_row(text_col="text", num_perm=16, shingle_k=3):
    """Per-row MinHash signature: one aggregate pass over the shingle
    array, 16-long min accumulator — no explode, no shuffle."""
    from shaman_scraping_spark.operators.dedup import shingles_col
    sh = shingles_col(text_col, shingle_k)
    return F.aggregate(
        sh,
        F.array_repeat(F.lit((1 << 63) - 1).cast("long"), num_perm),
        lambda acc, s: F.zip_with(
            acc,
            F.array(*[F.xxhash64(s, F.lit(i)) for i in range(num_perm)]),
            lambda a, h: F.least(a, h),
        ),
    )


def q_minhash_neardup_perrow(spark, sf):
    from shaman_scraping_spark.operators.dedup import shingles_col
    df = _t_wide(spark, sf, "documents")
    id_col, num_perm, bands, threshold = "doc_id", 16, 4, 0.5
    sig_arr = _minhash_sig_per_row("text", num_perm, 3)
    sig = (
        df.filter(F.size(shingles_col("text", 3)) > 0)
        .select(F.col(id_col), sig_arr.alias("__sig"))
        .select(
            F.col(id_col),
            *[F.element_at("__sig", i + 1).alias(f"h{i}")
              for i in range(num_perm)],
        )
    )
    rows = num_perm // bands
    band_exprs = []
    for bd in range(bands):
        cols = [F.col(f"h{bd * rows + r}") for r in range(rows)]
        band_exprs.append(F.struct(F.lit(bd).alias("band_id"),
                                   F.xxhash64(*cols).alias("band_hash")))
    banded = sig.select(
        F.col(id_col),
        F.struct(*[F.col(f"h{i}") for i in range(num_perm)]).alias("sig"),
        F.explode(F.array(*band_exprs)).alias("band"),
    ).select(id_col, "sig", "band.band_id", "band.band_hash")
    a, b = banded.alias("a"), banded.alias("b")
    matches = sum(
        F.when(F.col(f"a.sig.h{i}") == F.col(f"b.sig.h{i}"), 1).otherwise(0)
        for i in range(num_perm)
    )
    return (
        a.join(b, (F.col("a.band_id") == F.col("b.band_id"))
               & (F.col("a.band_hash") == F.col("b.band_hash"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                (matches / F.lit(16.0)).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
        .distinct()
    )


# --- pre-r6 shapes, kept verbatim for before/after interleaved A/Bs ---------

def q_redirect_hops_selfjoin(spark, sf):
    o1 = _t(spark, sf, "orders").select(
        "o_custkey", F.col("o_orderdate").alias("d1"))
    o2 = _t(spark, sf, "orders").select(
        "o_custkey", F.col("o_orderdate").alias("d2"))
    return (
        o1.join(o2, "o_custkey")
        .filter(F.col("d2") > F.col("d1"))
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_hops"))
    )


def q_dedup_first_window(spark, sf):
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc())
    return (
        _t(spark, sf, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts")
    )


def q_frontier_merge_window(spark, sf):
    from pyspark.sql import Window
    orders = _t(spark, sf, "orders")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    b = orders.filter(F.col("o_totalprice") > 200000.0)
    seen = _t(spark, sf, "customer").filter(F.col("c_acctbal") < 0.0).select(
        F.col("c_custkey").alias("o_custkey"))
    merged = a.unionByName(b).join(seen, "o_custkey", "left_anti")
    w = Window.partitionBy("o_orderkey").orderBy(F.col("o_orderdate").asc())
    return (
        merged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderkey", "o_custkey")
    )


def q_exact_dedup_window(spark, sf):
    from pyspark.sql import Window
    docs = _t(spark, sf, "documents").withColumn(
        "word1", F.split_part(F.col("text"), F.lit(" "), F.lit(1)))
    w = Window.partitionBy("lang", "word1").orderBy(F.col("doc_id").asc())
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("lang", "word1", F.col("doc_id").alias("keeper"))
    )


def q_minhash_neardup_oldshape(spark, sf):
    """Pre-r6: candidates first, then two signature re-joins (the
    4-evaluation shape), with the original inner-explode signatures."""
    from shaman_scraping_spark.operators.dedup import (
        lsh_candidate_pairs, shingles_col,
    )
    df = _t_wide(spark, sf, "documents")
    num_perm = 16
    ex = df.select(
        F.col("doc_id"), F.explode(shingles_col("text", 3)).alias("sh"))
    aggs = [F.min(F.xxhash64(F.col("sh"), F.lit(i))).alias(f"h{i}")
            for i in range(num_perm)]
    sig = ex.groupBy("doc_id").agg(*aggs)
    cand = lsh_candidate_pairs(sig, "doc_id", num_perm, 4)
    a = sig.select(F.col("doc_id").alias("id_a"),
                   *[F.col(f"h{i}").alias(f"a{i}") for i in range(num_perm)])
    b = sig.select(F.col("doc_id").alias("id_b"),
                   *[F.col(f"h{i}").alias(f"b{i}") for i in range(num_perm)])
    matches = sum(F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
                  for i in range(num_perm))
    return (cand.join(a, "id_a").join(b, "id_b")
            .withColumn("est_jaccard", matches / F.lit(16.0))
            .filter(F.col("est_jaccard") >= 0.5)
            .select("id_a", "id_b", "est_jaccard"))


def q_simhash_explode64(spark, sf):
    """Pre-r6 simhash: exploded tokens + 64 conditional-sum groupBy."""
    from shaman_scraping_spark.operators.dedup import tokens_col
    df = _t_wide(spark, sf, "documents")
    ex = df.select(
        F.col("doc_id"), F.explode(tokens_col("text")).alias("tok")
    ).withColumn("th", F.xxhash64("tok"))
    aggs = [
        F.sum(F.when(F.shiftright(F.col("th"), b).bitwiseAND(F.lit(1)) == 1,
                     1).otherwise(-1)).alias(f"v{b}")
        for b in range(64)
    ]
    votes = ex.groupBy("doc_id").agg(*aggs)
    acc = F.lit(0).cast("long")
    for bit in range(64):
        mask = (1 << bit) if bit < 63 else -(1 << 63)
        acc = acc.bitwiseOR(
            F.when(F.col(f"v{bit}") > 0, F.lit(mask).cast("long"))
            .otherwise(F.lit(0).cast("long")))
    return votes.select(F.col("doc_id"), acc.alias("simhash"))


def q_minhash_neardup_smj(spark, sf):
    """Current shape + merge-join hint on the band self-join: identical
    shuffle subplans on both sides -> ReuseExchange computes the
    signature subtree ONCE (vs twice under the default broadcast)."""
    from shaman_scraping_spark.operators.dedup import minhash_signatures
    df = _t_wide(spark, sf, "documents")
    id_col, num_perm, bands, threshold = "doc_id", 16, 4, 0.5
    sig = minhash_signatures(df, id_col, "text", num_perm, 3)
    rows = num_perm // bands
    band_exprs = []
    for bd in range(bands):
        cols = [F.col(f"h{bd * rows + r}") for r in range(rows)]
        band_exprs.append(F.struct(F.lit(bd).alias("band_id"),
                                   F.xxhash64(*cols).alias("band_hash")))
    banded = sig.select(
        F.col(id_col),
        F.struct(*[F.col(f"h{i}") for i in range(num_perm)]).alias("sig"),
        F.explode(F.array(*band_exprs)).alias("band"),
    ).select(id_col, "sig", "band.band_id", "band.band_hash")
    a, b = banded.hint("merge").alias("a"), banded.hint("merge").alias("b")
    matches = sum(
        F.when(F.col(f"a.sig.h{i}") == F.col(f"b.sig.h{i}"), 1).otherwise(0)
        for i in range(num_perm)
    )
    return (
        a.join(b, (F.col("a.band_id") == F.col("b.band_id"))
               & (F.col("a.band_hash") == F.col("b.band_hash"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                (matches / F.lit(16.0)).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
        .distinct()
    )
