"""Link-graph analytics: host link graph + PageRank — SURVEY.md §2K op 55.

A production crawler orders its frontier not just by (depth, ts) but by
host authority over the link graph it has itself fetched (OPIC /
PageRank-style frontier prioritization).  This module derives the
host-level link graph from the engine's ``fetched`` table and computes
PageRank over it, Spark-first:

* **Graph build is one shuffle.**  ``host_link_edges`` explodes the
  per-page ``links`` arrays, canonicalizes inside Catalyst, and
  aggregates to weighted (src, dst) host edges — map-side combined, so
  the shuffle carries distinct host pairs, never link volume.
* **Ranks are small; edges are big.**  A host-level rank table has one
  row per *host* (10^7 rows at 10^10-URL scale — megabytes), while the
  edge table scales with distinct host pairs.  Each iteration therefore
  BROADCASTS the rank table into the edge join and pays exactly ONE
  shuffle (the groupBy(dst) contribution sum, map-side combined).  For
  page-level graphs where ranks are not broadcastable, pass
  ``broadcast_ranks=False``: the edge table is hash-partitioned on
  ``src`` ONCE and persisted, so every iteration's join reuses that
  layout and only the ranks side shuffles.
* **Iterative lineage is pinned.**  Unpinned, iteration k's plan embeds
  k copies of the full join subtree and Catalyst re-analyzes all of it
  per transformation (the same failure mode BENCH/DECOMP.md §5 measured
  for wave plans).  Each iteration ends in ``localCheckpoint`` (or a
  parquet write-read barrier under ``checkpoint_dir`` — the
  executor-loss-safe choice on a real cluster, same trick as
  ``CrawlEngine._pin``).
* **Dangling mass is folded into the plan.**  Hosts with no out-edges
  would leak rank; their summed mass is redistributed uniformly via a
  1-row crossJoin (BroadcastNestedLoopJoin over one row), keeping each
  iteration a single action — no per-iteration ``collect``.

``pagerank_int_units`` is the deterministic integer twin: all
arithmetic in BIGINT units (order-independent sums, truncating ``div``)
so results are bit-identical across partitionings and engines — this is
the variant the driver contract hash-compares against a DuckDB oracle
(``driver_queries.q_pagerank``).  The float variant is the production
operator; its tests compare against an independent NumPy power
iteration (tests/test_graph.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from shaman_scraping_spark.functions.url import canonicalize_url, url_host

__all__ = ["host_link_edges", "pagerank", "pagerank_int_units", "host_rank"]


def host_link_edges(fetched: DataFrame) -> DataFrame:
    """Weighted host-level link graph from a ``fetched``-shaped table.

    *fetched* needs ``host`` (source host), ``links`` (array<string> of
    raw hrefs) and ``status``; only 200s contribute (redirects carry no
    anchors, errors no body — engine nulls both).  Self-loops are
    dropped: intra-host links dominate raw counts but say nothing about
    cross-host authority.  Returns (src, dst, weight) with weight = the
    number of links src→dst across all fetched pages.
    """
    e = (
        fetched
        .filter(F.col("status") == 200)
        .select(F.col("host").alias("src"), F.explode("links").alias("link"))
        .withColumn("dst", url_host(canonicalize_url(F.col("link"))))
        .filter(F.col("dst").isNotNull() & (F.col("dst") != F.col("src")))
    )
    return e.groupBy("src", "dst").agg(F.count("*").alias("weight"))


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
    broadcast_ranks: bool = True,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Weighted PageRank over (src, dst, weight) edges.

    Returns (node, rank) with ranks summing to 1.0 (dangling mass is
    redistributed uniformly each step, so total mass is conserved).
    One shuffle per iteration when ``broadcast_ranks`` (the contribution
    groupBy); see module docstring for the scale contract.
    """
    spark = edges.sparkSession
    if "weight" not in edges.columns:
        edges = edges.withColumn("weight", F.lit(1).cast("long"))

    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        return spark.createDataFrame([], "node string, rank double")

    out_w = edges.groupBy("src").agg(F.sum("weight").alias("out_w"))
    # share = weight / total outgoing weight: each iteration's join is
    # then a pure multiply — the normalization shuffle happens once.
    norm = edges.join(out_w, "src").select(
        "src", "dst", (F.col("weight") / F.col("out_w")).alias("share")
    )
    if not broadcast_ranks:
        norm = norm.repartition("src")
    norm = norm.persist()
    norm.count()  # materialize once so every iteration reuses the layout

    dangling = nodes.join(
        out_w.select(F.col("src").alias("node")), "node", "left_anti"
    ).persist()

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        r = F.broadcast(ranks) if broadcast_ranks else ranks
        contrib = (
            norm.join(r, norm.src == r.node)
            .groupBy("dst")
            .agg(F.sum(F.col("share") * F.col("rank")).alias("contrib"))
        )
        # dangling mass as a 1-row dim folded into the plan (no
        # per-iteration collect); empty dangling set → coalesce(0)
        dm = (
            ranks.join(dangling, "node")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        # contrib has at most one row per in-linked node — when ranks
        # are broadcastable so is it, which turns the rank update into
        # a second broadcast join (zero extra exchanges per iteration)
        contrib_side = F.broadcast(contrib) if broadcast_ranks else contrib
        ranks = (
            nodes.join(contrib_side, nodes.node == contrib_side.dst, "left")
            .crossJoin(F.broadcast(dm))
            .select(
                nodes.node,
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("contrib"), F.lit(0.0))
                       + F.col("dm") / n)
                ).alias("rank"),
            )
        )
        if checkpoint_dir is not None:
            # cluster-safe lineage barrier: survives executor loss,
            # resumable — the CrawlEngine._pin pattern
            path = f"{checkpoint_dir}/pagerank_iter"
            ranks.write.mode("overwrite").parquet(path)
            ranks = spark.read.parquet(path)
        else:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def pagerank_int_units(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 3,
    unit: int = 10**12,
    damping_num: int = 17,
    damping_den: int = 20,
) -> DataFrame:
    """Deterministic integer PageRank: (node, rank_units) in BIGINT.

    Every node starts with ``unit`` rank units; each iteration a node
    keeps ``(1 - d) * unit`` base units plus ``d *`` the sum of
    ``r div outdeg`` over incoming edges, all in truncating integer
    arithmetic (d = damping_num/damping_den).  Integer sums are
    order-independent, so the result is bit-identical across
    partitionings, shuffle orders, and engines — unlike float PageRank,
    this variant is hash-comparable against an ANSI-SQL oracle.
    Dangling nodes simply decay to the base term (documented
    divergence from the float variant's mass redistribution).

    *nodes*: one ``node`` column (the rank universe — may include
    nodes absent from *edges*).  *edges*: (src, dst), unweighted;
    parallel edges contribute once each.
    """
    nodes = nodes.select("node")
    base = ((damping_den - damping_num) * unit) // damping_den
    outdeg = edges.groupBy("src").agg(F.count("*").alias("od"))
    ranks = nodes.select("node", F.lit(unit).cast("long").alias("r"))
    for _ in range(iterations):
        contrib = (
            edges.join(outdeg, "src")
            .join(ranks, F.col("src") == F.col("node"))
            .groupBy("dst")
            .agg(F.sum(F.expr("r div od")).alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                nodes.node,
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"({damping_num} * coalesce(s, cast(0 as bigint)))"
                        f" div {damping_den}"
                    )
                ).cast("long").alias("r"),
            )
        )
    return ranks.select("node", F.col("r").alias("rank_units"))


def host_rank(
    fetched: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Host authority over the crawl's own fetched link graph:
    ``pagerank(host_link_edges(fetched))``, ranks summing to 1.
    Feed into frontier priority as a broadcast dim (host → rank)."""
    return pagerank(
        host_link_edges(fetched),
        damping=damping,
        iterations=iterations,
        checkpoint_dir=checkpoint_dir,
    )
