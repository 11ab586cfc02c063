"""Frontier set algebra — SURVEY.md §2B ops 13–14, §2C op 21.

The reference keeps the frontier as an in-RAM per-host queue with a
HashSet seen-check at enqueue (SURVEY.md §1.1; checkout empty, §0).
Here both are relational: the seen-check is a hash **anti-join** and
in-wave dedup is a deterministic window — Catalyst/AQE pick broadcast
vs shuffled-hash at runtime, and every op carries the full tiebreak
key so results are identical under any partitioning.

Exactness note: joins key on (url_hash, url_canon) — the 64-bit hash
drives shuffle locality, the string equality keeps "fetch once per
URL" exact even at 10^10 URLs where 64-bit birthday collisions are
expected (~10^3 rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: canonical frontier columns (SURVEY.md §1.2)
FRONTIER_COLS = [
    "url_canon", "url_hash", "host", "depth",
    "discovery_ts", "parent_canon", "wave_discovered",
]

SEEN_KEY = ["url_hash", "url_canon"]


def dedup_urls(df: DataFrame) -> DataFrame:
    """Keep one row per URL: min (depth, discovery_ts, parent_canon).

    Deterministic replacement for ``dropDuplicates`` (which keeps an
    arbitrary row — a latent flake under parallelism, SURVEY.md §7).
    Used both for in-wave dedup (same URL found from N parent pages)
    and for the frontier union-merge (earliest discovery wins).

    Implemented as a hash aggregate (``min(struct(tiebreak…))``), not
    a row_number window: the winner is identical (struct ordering is
    lexicographic with null fields FIRST — verified — matching the
    window's ``asc_nulls_first``), but the aggregate gets a MAP-SIDE
    partial combine, so a hub URL discovered by 10^6 pages in one
    wave collapses before the shuffle instead of shipping 10^6 rows
    into one partition and sorting them — the web-graph skew case a
    window cannot pre-reduce.
    """
    order_first = ["depth", "discovery_ts", "parent_canon"]
    rest = [c for c in df.columns
            if c not in SEEN_KEY and c not in order_first]
    return (
        df.groupBy(*SEEN_KEY)
        .agg(F.min(F.struct(*order_first, *rest)).alias("__w"))
        .select(*SEEN_KEY, *[F.col(f"__w.{c}") for c in order_first + rest])
        .select(*df.columns)
    )


def anti_join_seen(df: DataFrame, seen: DataFrame) -> DataFrame:
    """Rows of *df* whose URL is not in *seen* (exact; op 13)."""
    return df.join(seen.select(*SEEN_KEY), on=SEEN_KEY, how="left_anti")


def merge_frontier(
    remaining: DataFrame, new_links: DataFrame, seen: DataFrame
) -> DataFrame:
    """Next wave's frontier: (remaining ∪ new) ∖ seen, deduped (op 21).

    ``remaining`` rows carry earlier discovery_ts/depth than any
    rediscovery in ``new_links``, so dedup_urls keeps them.
    """
    merged = remaining.select(*FRONTIER_COLS).unionByName(
        new_links.select(*FRONTIER_COLS)
    )
    return dedup_urls(anti_join_seen(merged, seen))
