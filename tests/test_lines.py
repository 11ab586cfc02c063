"""Line-level dedup + repetition quality filters — SURVEY.md §2K ops
56–57 (CCNet line dedup, Gopher repetition rules)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from shaman_scraping_spark.functions.text import (
    dup_line_frac, top_word_count, top_word_frac,
)
from shaman_scraping_spark.operators.dedup import dup_lines, strip_dup_lines

FOOTER = "Copyright 2024 Example Corp. All rights reserved."
COOKIE = "This site uses cookies."


@pytest.fixture()
def docs(spark):
    rows = [
        (0, f"alpha unique zero\n{FOOTER}\n{COOKIE}"),
        (1, f"{COOKIE}\nbeta unique one\n{FOOTER}"),
        (2, f"{FOOTER}\ngamma unique two"),
        (3, "delta unique three\n\n  \ndelta second line"),
        (4, f"{FOOTER}\n{COOKIE}"),  # nothing but boilerplate
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dup_lines_planted(docs):
    got = {r["line"]: r["n_docs"] for r in dup_lines(docs, min_docs=3).collect()}
    assert got == {FOOTER: 4, COOKIE: 3}
    # lower threshold picks up nothing else (unique lines stay unique;
    # blank/whitespace lines are never counted)
    got2 = {r["line"] for r in dup_lines(docs, min_docs=2).collect()}
    assert got2 == {FOOTER, COOKIE}


def test_strip_dup_lines_preserves_order(docs):
    out = {
        r["doc_id"]: r["text"]
        for r in strip_dup_lines(docs, min_docs=3).collect()
    }
    assert out[0] == "alpha unique zero"
    assert out[1] == "beta unique one"
    assert out[2] == "gamma unique two"
    # doc 3 untouched, including its blank lines
    assert out[3] == "delta unique three\n\n  \ndelta second line"
    # doc 4 was pure boilerplate -> empty
    assert out[4] == ""


def test_strip_dup_lines_precomputed_dim(docs, spark):
    dim = spark.createDataFrame([(FOOTER,)], "line string")
    out = {
        r["doc_id"]: r["text"]
        for r in strip_dup_lines(docs, dup=dim).collect()
    }
    assert out[0] == f"alpha unique zero\n{COOKIE}"
    assert out[4] == COOKIE


def test_repetition_feature_columns(spark):
    rows = [
        (0, "a b\na b\nc d"),          # 3 lines, 2 distinct -> 1/3 dup
        (1, "x y z"),                  # no repetition
        (2, "aaa aaa aaa aaa"),        # one word 4x
        (3, ""),                       # empty -> all zeros
        (4, "w w q q q w"),            # w:3 q:3 -> top 3/6
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id",
        dup_line_frac().alias("dlf"),
        top_word_count().alias("twc"),
        top_word_frac().alias("twf"),
    )
    got = {r["doc_id"]: r for r in df.collect()}
    assert got[0]["dlf"] == pytest.approx(1 / 3)
    assert got[1]["dlf"] == 0.0 and got[1]["twc"] == 1
    assert got[2]["twc"] == 4 and got[2]["twf"] == pytest.approx(1.0)
    assert got[3]["dlf"] == 0.0 and got[3]["twf"] == 0.0
    assert got[4]["twc"] == 3 and got[4]["twf"] == pytest.approx(0.5)


def test_repetition_columns_stay_jvm_side(spark):
    df = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    plan = (
        df.select(dup_line_frac().alias("d"), top_word_frac().alias("t"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan  # pure Catalyst, not even Arrow


def test_line_driver_queries_match_duckdb_oracle(spark):
    """Driver-contract comparison at sf0.001 for both new queries:
    exact value equality vs DuckDB (the driver's own check, locally)."""
    from shaman_scraping_spark.driver_queries import ORACLES, QUERIES

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    for name in ("dup_lines", "repetition_filter"):
        sdf = QUERIES[name](spark, sf)
        cols = sorted(sdf.columns)
        got = {
            tuple(r[c] for c in cols) for r in sdf.collect()
        }
        odf = con.execute(ORACLES[name]).fetch_arrow_table().to_pylist()
        want = {tuple(r[c] for c in cols) for r in odf}
        assert got == want, name


def test_clean_pipeline_with_line_dedup(spark, tmp_path):
    """e2e: the clean CLI with --dup-line-min-docs strips the planted
    footer from every surviving doc."""
    import json

    from shaman_scraping_spark.cli import main

    # bodies must dominate the shared footer or the MinHash near-dup
    # stage (correctly) treats the docs as near-duplicates of each other
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(40)) + f"\n{FOOTER}")
        for i in range(8)
    ]
    src = tmp_path / "docs"
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(src)
    )
    out = tmp_path / "cleaned"
    rc = main([
        "clean", "--input", str(src), "--output", str(out),
        "--dup-line-min-docs", "4",
    ])
    assert rc == 0
    cleaned = spark.read.parquet(str(out))
    assert cleaned.filter(F.col("text").contains("Copyright")).count() == 0
    assert cleaned.count() == 8  # nothing else was a duplicate
