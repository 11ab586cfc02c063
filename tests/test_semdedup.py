"""SemDeDup-style embedding clustering + cluster-pruned near-dup —
SURVEY.md §2K op 61.

The embeddings testdata's `label` column is NOT geometric (measured:
within-label mean cosine ≈ cross-label ≈ 0 — random unit vectors), so
ground truth here is synthesized: 10 well-separated gaussian blobs and
explicitly planted near-copies; the recall measurement vs brute-force
pairs follows the op-44 pattern (measured number + pytest gate)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from shaman_scraping_spark.operators.similarity import (
    cosine, semantic_clusters, semdedup_pairs,
)

SF = "/root/testdata/sf0.001/embeddings.parquet"


def _blob_df(spark, n_blobs=10, per_blob=30, dim=32, noise=0.05, seed=7):
    rng = np.random.default_rng(seed)
    cents = rng.normal(size=(n_blobs, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    rows = []
    vid = 0
    for b in range(n_blobs):
        pts = cents[b] + rng.normal(scale=noise, size=(per_blob, dim))
        for p in pts:
            rows.append((vid, b, [float(x) for x in p]))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, blob int, embedding array<float>"
    )


def test_semantic_clusters_recover_planted_blobs(spark):
    df = _blob_df(spark)
    n = df.count()
    got = semantic_clusters(df, k=10).join(df.select("vec_id", "blob"),
                                           "vec_id")
    # weighted purity: each k-means cell dominated by one planted blob
    purity = (
        got.groupBy("cluster", "blob").count()
        .groupBy("cluster").agg(F.max("count").alias("best"))
        .agg(F.sum("best")).collect()[0][0] / n
    )
    assert purity >= 0.9, purity


def test_semdedup_finds_planted_near_copies(spark):
    emb = spark.read.parquet(SF).limit(120)
    copies = emb.limit(20).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        # near-copy: uniform 0.999 scale — cosine with the original is
        # exactly 1.0 up to float noise
        F.transform("embedding",
                    lambda x: x * F.lit(0.999)).alias("embedding"),
        "label",
    )
    planted = {(r["vec_id"], r["vec_id"] + 100000)
               for r in emb.limit(20).collect()}
    allv = emb.unionByName(copies)
    pairs = semdedup_pairs(allv, k=8, threshold=0.999)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # every planted copy-pair found (same cell by construction), and
    # nothing below the threshold is reported
    assert planted <= got
    assert pairs.filter(F.col("cosine_sim") < 0.999).count() == 0


def test_semdedup_pair_recall_vs_bruteforce(spark):
    """Measured recall of the cluster-pruned pair set against the
    exact within-threshold pair set on the blob corpus (threshold 0.9
    keeps intra-blob pairs only).  Cluster-boundary losses are the
    documented trade; the gate pins the measured floor."""
    emb = _blob_df(spark).drop("blob")
    a, b = emb.alias("a"), emb.alias("b")
    brute = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .withColumn("cs", cosine(F.col("a.embedding"),
                                 F.col("b.embedding")))
        .filter(F.col("cs") >= 0.9)
        .select(F.col("a.vec_id").alias("id_a"),
                F.col("b.vec_id").alias("id_b"))
        .collect()
    }
    assert len(brute) > 100, "blob corpus should be dense in 0.9 pairs"
    got = {
        (r["id_a"], r["id_b"])
        for r in semdedup_pairs(emb, k=10, threshold=0.9).collect()
    }
    assert got <= brute  # no false positives by construction
    recall = len(got & brute) / len(brute)
    # measured 2026-08 (r5): with k = true blob count, boundary losses
    # are near zero; slack left for kmeans seed drift across versions
    assert recall >= 0.8, recall
