"""Op 12/35 property tests: bloom + partitioned cuckoo seen-set sketches.

Obligations (SURVEY.md §5.2):
  * NO false negatives, ever (both sketches)
  * false-positive rate sane at design load
  * treeAggregate merge == single-partition build (bloom)
  * probe stays Arrow-vectorized (MapInArrow in plan, no BatchEvalPython)
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from shaman_scraping_spark.operators.sketch import (
    BloomFilter,
    CuckooShard,
    bloom_build,
    bloom_probe,
    cuckoo_build,
    cuckoo_probe,
)


@pytest.fixture(scope="module")
def hashed(spark):
    df = spark.range(0, 20_000, 1, 8).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash")
    )
    return df.persist()


def test_bloom_no_false_negatives(spark, hashed):
    bloom = bloom_build(hashed, m_bits=1 << 20, k=7)
    probed = bloom_probe(hashed, bloom)
    misses = probed.filter(~F.col("maybe_seen")).count()
    assert misses == 0


def test_bloom_fp_rate(spark, hashed):
    bloom = bloom_build(hashed, m_bits=1 << 20, k=7)
    unseen = spark.range(1_000_000, 1_020_000, 1, 8).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash")
    )
    fp = bloom_probe(unseen, bloom).filter(F.col("maybe_seen")).count()
    # m/n = 52 bits/key, k=7 → theoretical fpr ~1e-6; allow slack
    assert fp / 20_000 < 0.01


def test_bloom_merge_equals_single_partition(spark, hashed):
    multi = bloom_build(hashed, m_bits=1 << 18, k=5)
    single = bloom_build(hashed.coalesce(1), m_bits=1 << 18, k=5)
    assert np.array_equal(multi.bits, single.bits)


def test_bloom_probe_plan_is_arrow(spark, hashed):
    bloom = BloomFilter(np.zeros(1 << 10, dtype=np.uint8), 1 << 13, 3)
    plan = bloom_probe(hashed, bloom)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "MapInArrow" in plan and "BatchEvalPython" not in plan


def test_cuckoo_shard_roundtrip():
    sh = CuckooShard(1 << 12)
    keys = np.arange(5_000, dtype=np.uint64) * np.uint64(2654435761)
    sh.insert_many(keys)
    assert sh.contains(keys).all()
    raw = sh.to_bytes()
    sh2 = CuckooShard.from_bytes(raw, 1 << 12)
    assert sh2.contains(keys).all()
    other = (np.arange(5_000, 10_000, dtype=np.uint64)
             * np.uint64(2654435761))
    fpr = sh2.contains(other).mean()
    assert fpr < 0.05


def test_cuckoo_non_pow2_buckets_no_false_negatives():
    """ADVICE.md r1 regression: b2 = b1 ^ hash(fp) is an involution only
    mod a power of two; n_buckets=1000 at 90% load gave 13/3600 false
    negatives.  CuckooShard now rounds up to a power of two at every
    entry point, restoring the no-FN guarantee for any requested size."""
    sh = CuckooShard(1000)  # rounds to 1024
    assert sh.n_buckets == 1024
    # 90% of the rounded capacity (1024 buckets x 4 slots)
    keys = (np.arange(int(1024 * 4 * 0.9), dtype=np.uint64)
            * np.uint64(0x9E3779B97F4A7C15))
    sh.insert_many(keys)
    assert sh.contains(keys).all()
    raw = sh.to_bytes()
    sh2 = CuckooShard.from_bytes(raw, 1000)
    assert sh2.contains(keys).all()


def test_cuckoo_partitioned_no_false_negatives(spark, hashed):
    shards = cuckoo_build(hashed, n_shards=8, n_buckets=1 << 12)
    probed = cuckoo_probe(hashed, shards, n_shards=8, n_buckets=1 << 12)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_cuckoo_partitioned_fp_rate(spark, hashed):
    shards = cuckoo_build(hashed, n_shards=8, n_buckets=1 << 12).persist()
    unseen = spark.range(2_000_000, 2_020_000, 1, 8).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash")
    )
    fp = cuckoo_probe(unseen, shards, n_shards=8, n_buckets=1 << 12) \
        .filter(F.col("maybe_seen")).count()
    assert fp / 20_000 < 0.05
