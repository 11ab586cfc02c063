"""Link-graph + PageRank tests — SURVEY.md §2K op 55.

The float operator is verified against an independent NumPy power
iteration (with uniform dangling-mass redistribution — the standard
formulation); the integer twin against the same DuckDB oracle the
driver contract uses.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from shaman_scraping_spark.operators.graph import (
    host_link_edges, pagerank, pagerank_int_units,
)


def np_pagerank(n, edges, damping=0.85, iterations=10):
    """Independent oracle: dense power iteration, weighted, uniform
    dangling redistribution.  edges = [(src, dst, weight)] with int
    node ids in [0, n)."""
    out_w = np.zeros(n)
    for s, _, w in edges:
        out_w[s] += w
    P = np.zeros((n, n))
    for s, d, w in edges:
        P[d, s] += w / out_w[s]
    r = np.full(n, 1.0 / n)
    dangling = out_w == 0
    for _ in range(iterations):
        dm = r[dangling].sum()
        r = (1 - damping) / n + damping * (P @ r + dm / n)
    return r


def _edges_df(spark, triples):
    return spark.createDataFrame(
        [(f"n{s}", f"n{d}", w) for s, d, w in triples],
        "src string, dst string, weight long",
    )


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_pagerank_star_matches_numpy(spark):
    # hub: 1,2,3 all link to 0; 0 links back to 1 only
    triples = [(1, 0, 1), (2, 0, 1), (3, 0, 1), (0, 1, 1)]
    # 40 iterations: the 0<->1 cycle makes ranks oscillate toward the
    # fixed point (r0 = 0.4797, r1 = 0.4452), so the ordering check
    # needs convergence, not just a few steps
    got = _ranks(pagerank(_edges_df(spark, triples), iterations=40))
    want = np_pagerank(4, triples, iterations=40)
    for i in range(4):
        assert got[f"n{i}"] == pytest.approx(want[i], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert got["n0"] > got["n1"] > got["n2"]  # hub > its child > leaves


def test_pagerank_dangling_mass_conserved(spark):
    # n2 is dangling (no out-edges): its mass must be redistributed,
    # not leaked — total stays 1.0 and matches the NumPy formulation.
    triples = [(0, 1, 1), (1, 2, 1)]
    got = _ranks(pagerank(_edges_df(spark, triples), iterations=15))
    want = np_pagerank(3, triples, iterations=15)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    for i in range(3):
        assert got[f"n{i}"] == pytest.approx(want[i], abs=1e-9)


def test_pagerank_weights_respected(spark):
    # 0 links to 1 with weight 3 and to 2 with weight 1: n1 must
    # receive 3x n2's contribution from n0.
    triples = [(0, 1, 3), (0, 2, 1), (1, 0, 1), (2, 0, 1)]
    got = _ranks(pagerank(_edges_df(spark, triples), iterations=20))
    want = np_pagerank(3, triples, iterations=20)
    for i in range(3):
        assert got[f"n{i}"] == pytest.approx(want[i], abs=1e-9)
    assert got["n1"] > got["n2"]


def test_pagerank_no_broadcast_path_identical(spark, tmp_path):
    # the broadcast_ranks=False + parquet-pin path (the page-level /
    # cluster-safe configuration) must compute the same ranks
    triples = [(1, 0, 1), (2, 0, 1), (3, 0, 1), (0, 1, 1), (3, 1, 2)]
    a = _ranks(pagerank(_edges_df(spark, triples), iterations=8))
    b = _ranks(
        pagerank(
            _edges_df(spark, triples),
            iterations=8,
            broadcast_ranks=False,
            checkpoint_dir=str(tmp_path),
        )
    )
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-12)


def test_host_link_edges(spark):
    fetched = spark.createDataFrame(
        [
            ("a.example", 200,
             ["http://b.example/x", "http://b.example/y",
              "http://a.example/self", "http://c.example/"]),
            ("b.example", 200, ["http://a.example/"]),
            ("c.example", 404, ["http://a.example/never"]),  # non-200
        ],
        "host string, status int, links array<string>",
    )
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in host_link_edges(fetched).collect()
    }
    # self-loop dropped, non-200 dropped, weight counts multiplicity
    assert got == {
        ("a.example", "b.example"): 2,
        ("a.example", "c.example"): 1,
        ("b.example", "a.example"): 1,
    }


def test_pagerank_int_units_matches_hand_twin(spark):
    """Integer twin vs a direct Python re-implementation on a small
    irregular graph (different outdegs, a dangling node, a node with
    no in-edges)."""
    nodes = spark.createDataFrame([(i,) for i in range(5)], "node long")
    e = [(0, 1), (0, 2), (1, 2), (2, 0), (4, 0)]  # 3 dangling
    edges = spark.createDataFrame(e, "src long, dst long")
    got = {
        r["node"]: r["rank_units"]
        for r in pagerank_int_units(nodes, edges, iterations=3).collect()
    }

    unit, base = 10**12, (3 * 10**12) // 20
    outdeg = {}
    for s, _ in e:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {i: unit for i in range(5)}
    for _ in range(3):
        s = {i: 0 for i in range(5)}
        for src, dst in e:
            s[dst] += r[src] // outdeg[src]
        r = {i: base + (17 * s[i]) // 20 for i in range(5)}
    assert got == r


def test_rank_cli_over_real_crawl(spark, tiny_corpus, tiny_corpus_dir,
                                  tmp_path, capsys):
    """e2e: 2-wave crawl -> `rank` CLI verb computes a host PageRank
    dim from the state dir's fetched table and writes it to parquet."""
    from shaman_scraping_spark.cli import main
    from shaman_scraping_spark.config import CrawlConfig
    from shaman_scraping_spark.plans.engine import CrawlEngine

    state = tmp_path / "state"
    cfg = CrawlConfig(seeds=tuple(tiny_corpus.seeds), max_waves=2)
    CrawlEngine(
        spark, cfg, str(tiny_corpus_dir / "pages.parquet"), str(state)
    ).run()

    out = tmp_path / "rank_dim"
    rc = main([
        "rank", "--state", str(state), "--output", str(out),
        "--iterations", "5", "--top", "3",
    ])
    assert rc == 0
    dim = spark.read.parquet(str(out))
    assert dim.columns == ["host", "rank"]
    rows = dim.collect()
    assert len(rows) >= 2  # the tiny corpus links across hosts
    assert sum(r["rank"] for r in rows) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_driver_query_matches_duckdb_oracle(spark):
    """The driver-contract comparison, run locally at sf0.001: Spark
    q_pagerank vs the unrolled-CTE DuckDB oracle, exact equality."""
    from shaman_scraping_spark.driver_queries import ORACLES, QUERIES

    sf = "/root/testdata/sf0.001"
    got = {
        (r["node"], r["rank_units"])
        for r in QUERIES["pagerank"](spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{sf}/documents.parquet'"
    )
    want = set(map(tuple, con.execute(ORACLES["pagerank"]).fetchall()))
    assert got == want
