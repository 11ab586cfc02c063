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
