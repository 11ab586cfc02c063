"""Approximate URL-seen membership sketches — SURVEY.md §2B op 12,
§2F op 35.

BASELINE.json north_star: "partitioned cuckoo-filter URL-seen set
(bloom fallback per executor, merged via treeAggregate)".  PySpark
exposes no bloom-filter builder (`bloom_filter_agg` is JVM-only,
SURVEY.md §0), so both sketches are custom:

* **Bloom (fallback path)**: each executor partition builds a numpy
  bit-array over its rows inside ``mapInArrow`` (vectorized — no
  per-row Python), emitting ONE shard row per partition; the shards
  are merged with ``rdd.treeAggregate(np.bitwise_or, depth=2)`` — the
  single sanctioned RDD touchpoint, O(log E) merge fan-in.  The merged
  filter broadcasts to probes.
* **Cuckoo (primary path)**: the key space is hash-partitioned into
  ``n_shards``; each shard is a (buckets × 4 slots) uint16-fingerprint
  cuckoo table built per partition after a ``repartition`` on the
  shard id.  Probes route by the same partitioner, so shard and probe
  rows are co-located — membership tests never touch a foreign shard.
  Supports deletion-free insert with bounded eviction kicks (standard
  Fan et al. 2014 semantics); on kick-out overflow the build degrades
  that shard to "saturated" (probe returns maybe=True — still no
  false negatives).

Both are **prefilters**: exactness always comes from the anti-join
(op 13).  No false negatives ⇒ safe to skip exact-checking the
definitely-unseen majority; false positives only cost a redundant
exact check.  Integration into the engine is flag-gated (SURVEY.md §4:
at sandbox scale the prefilter may be pure overhead; at 10^10 URLs the
bloom probe kills the dominant anti-join shuffle).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --- hashing ----------------------------------------------------------------
# All position math derives from the already-computed 64-bit url_hash
# (xxhash64) via splitmix64 remixing — no string re-hashing at probe time.

_SPLITMIX_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_C2 = np.uint64(0x94D049BB133111EB)


def _remix(h: np.ndarray) -> np.ndarray:
    h = h.astype(np.uint64, copy=True)
    h ^= h >> np.uint64(30)
    h *= _SPLITMIX_C1
    h ^= h >> np.uint64(27)
    h *= _SPLITMIX_C2
    h ^= h >> np.uint64(31)
    return h


def _bloom_positions(hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing h1 + i*h2 mod m."""
    h = hashes.astype(np.uint64)
    h1 = _remix(h)
    h2 = _remix(h1) | np.uint64(1)  # odd → full-period stepping
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            % np.uint64(m_bits)).astype(np.int64)


# --- bloom ------------------------------------------------------------------

class BloomFilter:
    """Immutable merged bloom filter (driver-side wrapper)."""

    def __init__(self, bits: np.ndarray, m_bits: int, k: int):
        self.bits = bits              # uint8 array of m_bits/8 bytes
        self.m_bits = m_bits
        self.k = k

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        if hashes.size == 0:
            return np.zeros(0, dtype=bool)
        pos = _bloom_positions(hashes, self.m_bits, self.k)
        byte_idx, bit_idx = pos >> 3, pos & 7
        got = (self.bits[byte_idx] >> bit_idx) & 1
        return got.all(axis=1)


def bloom_build(
    df: DataFrame, hash_col: str = "url_hash",
    m_bits: int = 1 << 23, k: int = 7,
) -> BloomFilter:
    """Build a bloom filter over *df[hash_col]* (one shard row per
    partition via mapInArrow, merged via treeAggregate depth=2)."""
    nbytes = m_bits // 8

    def build_shards(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        bits = np.zeros(nbytes, dtype=np.uint8)
        any_rows = False
        for batch in batches:
            h = batch.column(0).to_numpy(zero_copy_only=False)
            if h.size == 0:
                continue
            any_rows = True
            pos = _bloom_positions(h.astype(np.uint64), m_bits, k)
            np.bitwise_or.at(
                bits, (pos >> 3).ravel(),
                np.left_shift(np.uint8(1), (pos & 7).ravel().astype(np.uint8)),
            )
        if any_rows:
            yield pa.RecordBatch.from_arrays(
                [pa.array([bits.tobytes()], type=pa.binary())], ["bits"]
            )

    shards = df.select(F.col(hash_col)).mapInArrow(
        build_shards, "bits binary"
    )
    zero = np.zeros(nbytes, dtype=np.uint8)
    merged = shards.rdd.treeAggregate(
        zero,
        lambda acc, row: np.bitwise_or(
            acc, np.frombuffer(row["bits"], dtype=np.uint8)
        ),
        np.bitwise_or,
        depth=2,
    )
    return BloomFilter(merged, m_bits, k)


def bloom_probe(
    df: DataFrame, bloom: BloomFilter,
    hash_col: str = "url_hash", out_col: str = "maybe_seen",
) -> DataFrame:
    """Stamp ``out_col: boolean`` (True = possibly in the set; False =
    definitely not).  The filter ships to executors via Spark broadcast;
    the test is fully vectorized numpy inside mapInArrow."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        (bloom.bits.tobytes(), bloom.m_bits, bloom.k)
    )
    in_schema = df.schema
    hash_idx = in_schema.fieldNames().index(hash_col)

    def probe(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        raw, m_bits, k = bc.value
        bf = BloomFilter(np.frombuffer(raw, dtype=np.uint8), m_bits, k)
        for batch in batches:
            h = batch.column(hash_idx).to_numpy(zero_copy_only=False)
            res = bf.contains(h.astype(np.uint64))
            yield batch.append_column(
                out_col, pa.array(res, type=pa.bool_())
            )

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in in_schema.fields
    )
    return df.mapInArrow(probe, f"{fields}, {out_col} boolean")


# --- partitioned cuckoo filter ---------------------------------------------

_EMPTY = np.uint16(0)
_SLOTS = 4
_MAX_KICKS = 250


def _pow2_buckets(n_buckets: int) -> int:
    """Round *n_buckets* up to a power of two.

    The partial-key alt-bucket map ``b2 = b1 ^ hash(fp)`` is an
    involution ONLY modulo a power of two; for other sizes the ``% n``
    wrap breaks round-tripping, so evicted fingerprints can land in
    buckets the probe never checks — false negatives (ADVICE.md r1,
    verified 13/3600 FNs at n=1000, 90% load).  Every entry point
    (build, probe, shard construction) normalizes through here so the
    two sides can never disagree.
    """
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    return 1 << (n_buckets - 1).bit_length()


def _cuckoo_parts(h: np.ndarray, n_buckets: int):
    """fingerprint (uint16, never 0), primary bucket, alt bucket."""
    r = _remix(h.astype(np.uint64))
    fp = (r & np.uint64(0xFFFF)).astype(np.uint16)
    fp = np.where(fp == 0, np.uint16(1), fp)
    b1 = ((r >> np.uint64(16)) % np.uint64(n_buckets)).astype(np.int64)
    # partial-key cuckoo: alt = b1 xor hash(fp)
    fp_h = _remix(fp.astype(np.uint64)) % np.uint64(n_buckets)
    b2 = (b1.astype(np.uint64) ^ fp_h) % np.uint64(n_buckets)
    return fp, b1, b2.astype(np.int64)


class CuckooShard:
    """One shard's table: (n_buckets, 4) uint16; fp 0 = empty."""

    def __init__(self, n_buckets: int):
        n_buckets = _pow2_buckets(n_buckets)
        self.table = np.zeros((n_buckets, _SLOTS), dtype=np.uint16)
        self.n_buckets = n_buckets
        self.saturated = False
        self.rng = np.random.RandomState(42)

    def insert_many(self, hashes: np.ndarray) -> None:
        fps, b1s, b2s = _cuckoo_parts(hashes, self.n_buckets)
        for fp, b1, b2 in zip(fps, b1s, b2s):
            if self._insert_one(fp, b1, b2) is False:
                self.saturated = True

    def _insert_one(self, fp, b1, b2) -> bool:
        for b in (b1, b2):
            row = self.table[b]
            if (row == fp).any():
                return True
            empty = np.nonzero(row == _EMPTY)[0]
            if empty.size:
                row[empty[0]] = fp
                return True
        # evict loop
        b = b1 if self.rng.randint(2) else b2
        cur = fp
        for _ in range(_MAX_KICKS):
            slot = self.rng.randint(_SLOTS)
            cur, self.table[b, slot] = self.table[b, slot], cur
            alt = (
                np.uint64(b)
                ^ (_remix(np.array([cur], dtype=np.uint64))[0]
                   % np.uint64(self.n_buckets))
            ) % np.uint64(self.n_buckets)
            b = int(alt)
            row = self.table[b]
            empty = np.nonzero(row == _EMPTY)[0]
            if empty.size:
                row[empty[0]] = cur
                return True
        return False

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        if self.saturated:
            return np.ones(len(hashes), dtype=bool)
        if hashes.size == 0:
            return np.zeros(0, dtype=bool)
        fps, b1s, b2s = _cuckoo_parts(hashes, self.n_buckets)
        in1 = (self.table[b1s] == fps[:, None]).any(axis=1)
        in2 = (self.table[b2s] == fps[:, None]).any(axis=1)
        return in1 | in2

    def to_bytes(self) -> bytes:
        return (b"S" if self.saturated else b"N") + self.table.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes, n_buckets: int) -> "CuckooShard":
        n_buckets = _pow2_buckets(n_buckets)
        sh = cls.__new__(cls)
        sh.saturated = raw[:1] == b"S"
        sh.table = np.frombuffer(raw[1:], dtype=np.uint16).reshape(
            n_buckets, _SLOTS
        ).copy()
        sh.n_buckets = n_buckets
        sh.rng = np.random.RandomState(42)
        return sh


def shard_id_col(hash_col: str, n_shards: int):
    return F.pmod(F.col(hash_col), F.lit(n_shards)).cast("int")


def cuckoo_build(
    df: DataFrame, hash_col: str = "url_hash",
    n_shards: int = 32, n_buckets: int = 1 << 15,
) -> DataFrame:
    """Partitioned cuckoo filter: DataFrame (shard_id int, blob binary),
    one row per shard, built co-partitioned on pmod(url_hash, n_shards).

    The shard table stays distributed (a 10^10-URL filter is ~TBs in
    aggregate — it must never centralize); probes co-partition by the
    same key (see cuckoo_probe).
    """
    keyed = df.select(
        F.col(hash_col).alias("h"),
        shard_id_col(hash_col, n_shards).alias("shard_id"),
    ).repartition(n_shards, "shard_id")

    def build(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        shards: dict[int, CuckooShard] = {}
        for batch in batches:
            h = batch.column(0).to_numpy(zero_copy_only=False)
            sid = batch.column(1).to_numpy(zero_copy_only=False)
            for s in np.unique(sid):
                shard = shards.setdefault(int(s), CuckooShard(n_buckets))
                shard.insert_many(h[sid == s].astype(np.uint64))
        for s, shard in sorted(shards.items()):
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([s], type=pa.int32()),
                    pa.array([shard.to_bytes()], type=pa.binary()),
                ],
                ["shard_id", "blob"],
            )

    return keyed.mapInArrow(build, "shard_id int, blob binary")


def cuckoo_update(
    shards: DataFrame | None, delta: DataFrame,
    hash_col: str = "url_hash",
    n_shards: int = 32, n_buckets: int = 1 << 15,
) -> DataFrame:
    """Insert *delta[hash_col]* into an existing partitioned cuckoo
    filter, returning the updated (shard_id, blob) table.

    Incremental by design: each wave's seen-delta folds into the
    standing filter without rebuilding over the full seen set (the
    WARC-index pattern the bloom path already follows).  One shuffle:
    blob rows and delta rows co-partition on shard_id, then each group
    deserializes its shard once, inserts vectorized, re-serializes.
    Never centralizes — at a 10^10-URL frontier the shard table is TBs
    in aggregate and stays distributed.
    """
    if shards is None:
        return cuckoo_build(delta, hash_col, n_shards, n_buckets)

    keyed = delta.select(
        shard_id_col(hash_col, n_shards).alias("shard_id"),
        F.col(hash_col).alias("h"),
    )

    # cogroup keeps each side's own schema — no null-padding a long
    # column (pandas would widen int64→float64 and silently corrupt
    # hashes above 2^53)
    def merge(blobs, hashes):
        import pandas as pd

        if len(blobs):
            sid = int(blobs["shard_id"].iloc[0])
            shard = CuckooShard.from_bytes(bytes(blobs["blob"].iloc[0]),
                                           n_buckets)
        else:
            sid = int(hashes["shard_id"].iloc[0])
            shard = CuckooShard(n_buckets)
        hs = hashes["h"].to_numpy()
        if hs.size:
            shard.insert_many(hs.astype(np.uint64))
        return pd.DataFrame({"shard_id": [sid], "blob": [shard.to_bytes()]})

    return (
        shards.groupBy("shard_id")
        .cogroup(keyed.groupBy("shard_id"))
        .applyInPandas(merge, "shard_id int, blob binary")
    )


def cuckoo_probe(
    df: DataFrame, shards: DataFrame, hash_col: str = "url_hash",
    n_shards: int = 32, n_buckets: int = 1 << 15,
    out_col: str = "maybe_seen",
) -> DataFrame:
    """Membership test against a partitioned cuckoo filter.

    Probe rows join their shard blob on shard_id (shards ≪ rows → the
    blob side broadcasts when small; at design scale both sides are
    hash-partitioned on shard_id so the join is co-located), then the
    test runs vectorized per Arrow batch.
    """
    with_sid = df.withColumn("__sid", shard_id_col(hash_col, n_shards))
    joined = with_sid.join(
        shards.withColumnRenamed("shard_id", "__sid"), "__sid", "left"
    )
    in_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
    )
    hash_idx = joined.schema.fieldNames().index(hash_col)
    blob_idx = joined.schema.fieldNames().index("blob")
    sid_idx = joined.schema.fieldNames().index("__sid")
    keep_names = [f.name for f in df.schema.fields]
    keep_idx = [joined.schema.fieldNames().index(n) for n in keep_names]

    def probe(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        cache: dict[bytes, CuckooShard] = {}
        for batch in batches:
            h = batch.column(hash_idx).to_numpy(zero_copy_only=False)
            blobs = batch.column(blob_idx)
            sids = batch.column(sid_idx).to_numpy(zero_copy_only=False)
            res = np.zeros(len(h), dtype=bool)
            # group rows by shard blob (few distinct per batch)
            for s in np.unique(sids):
                mask = sids == s
                idx = np.nonzero(mask)[0]
                raw = blobs[int(idx[0])].as_py()
                if raw is None:
                    continue  # no shard → definitely unseen
                key = int(s)
                shard = cache.get(key)
                if shard is None:
                    shard = CuckooShard.from_bytes(raw, n_buckets)
                    cache[key] = shard
                res[mask] = shard.contains(h[mask].astype(np.uint64))
            arrays = [batch.column(i) for i in keep_idx]
            yield pa.RecordBatch.from_arrays(
                arrays + [pa.array(res, type=pa.bool_())],
                keep_names + [out_col],
            )

    return joined.mapInArrow(probe, f"{in_fields}, {out_col} boolean")
