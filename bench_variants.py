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
