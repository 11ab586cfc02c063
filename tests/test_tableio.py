"""TableIO seam: manifest row counts, format dispatch.

The snapshot/append/resume semantics are exercised end-to-end by
tests/test_crawl_e2e.py::test_resume_fidelity; here the round-2
additions get direct coverage.
"""

from __future__ import annotations

import pytest

from shaman_scraping_spark.io.tableio import TableIO


def test_manifest_records_row_counts(spark, tmp_path):
    io = TableIO(spark, tmp_path)
    df = spark.range(0, 123).selectExpr("id", "id * 2 AS x")
    io.commit("t", df, wave=0)
    assert io.row_count("t", 0) == 123
    io.commit("t", df.limit(0), wave=1)
    assert io.row_count("t", 1) == 0
    # append mode: num_rows is the DELTA written at that wave
    io.commit("a", df.limit(10), wave=0, mode="append")
    io.commit("a", df.limit(7), wave=1, mode="append")
    assert io.row_count("a", 0) == 10
    assert io.row_count("a", 1) == 7
    assert io.load("a").count() == 17


def test_compact_append_chain(spark, tmp_path):
    """VERDICT r2 item 6: 20-wave append → compact → same rows under
    the reader, ONE data dir in the latest manifest, further appends
    chain from the compacted dir, resume (load at an old wave) still
    works because superseded dirs are not deleted."""
    io = TableIO(spark, tmp_path)
    for w in range(20):
        io.commit("a", spark.range(w * 10, w * 10 + 10), wave=w,
                  mode="append")
    assert len(io.read_manifest("a")["data_dirs"]) == 20
    before = sorted(r["id"] for r in io.load("a").collect())
    assert io.compact("a") is True
    m = io.read_manifest("a")
    assert m["data_dirs"] == ["data-000019c"] and m["compacted"]
    assert m["total_rows"] == 200
    assert sorted(r["id"] for r in io.load("a").collect()) == before
    # num_rows keeps its per-wave-delta meaning
    assert io.row_count("a", 19) == 10
    # time travel to a pre-compaction wave still reads the old dirs
    assert io.load("a", 5).count() == 60
    # appends continue from the compacted manifest
    io.commit("a", spark.range(200, 203), wave=20, mode="append")
    assert io.load("a").count() == 203
    assert len(io.read_manifest("a")["data_dirs"]) == 2
    # a transform applied during compaction reshapes the materialized
    # content (the delta state layout's frontier/host_state rewrite)
    assert io.compact(
        "a", transform=lambda df: df.filter("id % 2 = 0")
    ) is True
    assert io.load("a").count() == 102
    # single-dir + no transform → no-op
    assert io.compact("a") is False


def test_iceberg_dispatch_requires_catalog(spark, tmp_path):
    """The iceberg branch is the documented one-line swap for real
    clusters; without the runtime jar + catalog conf it must fail FAST
    and loudly, not at first commit."""
    with pytest.raises(RuntimeError, match="iceberg"):
        TableIO(spark, tmp_path, table_format="iceberg")


def test_unknown_format_rejected(spark, tmp_path):
    with pytest.raises(ValueError):
        TableIO(spark, tmp_path, table_format="delta")


@pytest.mark.skipif(
    True, reason="no Iceberg runtime jar in this sandbox (SURVEY.md §0); "
    "runs on clusters with spark.sql.catalog.crawl configured",
)
def test_iceberg_round_trip(spark, tmp_path):  # pragma: no cover
    io = TableIO(spark, tmp_path, table_format="iceberg")
    df = spark.range(0, 5)
    io.commit("t", df, wave=0)
    assert io.load("t", 0).count() == 5


def test_bucketed_commit_crash_rerun_is_idempotent(spark, tmp_path):
    """commit_bucketed's crash model: a wave whose data landed but
    whose manifest write never happened (crash between the two) must
    be invisible to readers and fully replaced by the re-run."""
    io = TableIO(spark, tmp_path)
    df0 = spark.range(0, 100).selectExpr(
        "id AS url_hash", "cast(id AS string) AS url_canon")
    io.commit_bucketed("seen", df0, wave=0, n_buckets=4,
                       cols=["url_hash", "url_canon"])
    assert io.row_count("seen", 0) == 100
    # simulate the crash: wave-1 files written, manifest missing
    df1 = spark.range(100, 150).selectExpr(
        "id AS url_hash", "cast(id AS string) AS url_canon")
    io.commit_bucketed("seen", df1, wave=1, n_buckets=4,
                       cols=["url_hash", "url_canon"])
    (tmp_path / "seen" / "manifest-000001.json").unlink()
    (tmp_path / "seen" / "latest.json").unlink()
    io._atomic_write_json(tmp_path / "seen" / "latest.json", {"wave": 0})
    # reader at the last manifested wave sees only wave 0
    assert io.load("seen", 0).count() == 100
    # idempotent re-run replaces the partial partition — no double rows
    io.commit_bucketed("seen", df1, wave=1, n_buckets=4,
                       cols=["url_hash", "url_canon"])
    assert io.load("seen", 1).count() == 150
    assert io.load_delta("seen", 1).count() == 50
    # fresh-session catalog re-registration path
    io2 = TableIO(spark, tmp_path)
    spark.sql(f"DROP TABLE IF EXISTS {io2._bucketed_name('seen')}")
    assert io2.load("seen", 1).count() == 150
