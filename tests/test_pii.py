"""PII scan + redaction — SURVEY.md §2K op 58."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from shaman_scraping_spark.functions.text import pii_counts, redact_pii


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_pii_counts_planted(spark):
    df = _df(spark, [
        "contact bob.smith+x@corp.example.org or sue@a.io today",
        "call +1 (555) 123-4567 now",
        "server at 10.0.42.7 and 192.168.1.254 responded",
        "no pii here at all",
        "mixed: a@b.co, 555-867-5309, 8.8.8.8",
    ]).select("doc_id", *[c.alias(n) for n, c in pii_counts().items()])
    got = {r["doc_id"]: (r["n_email"], r["n_phone"], r["n_ipv4"])
           for r in df.collect()}
    assert got[0] == (2, 0, 0)
    assert got[1] == (0, 1, 0)
    assert got[2] == (0, 0, 2)
    assert got[3] == (0, 0, 0)
    assert got[4] == (1, 1, 1)


def test_redact_pii_replaces_everything(spark):
    df = _df(spark, [
        "write bob.smith@corp.example.org or dial 555-123-4567 at 10.0.0.1",
    ]).select(redact_pii().alias("t"))
    out = df.collect()[0]["t"]
    assert "bob" not in out and "555" not in out and "10.0.0.1" not in out
    assert out.count("<PII>") == 3
    # surrounding prose survives
    assert out.startswith("write ") and " or dial " in out and " at " in out


def test_redact_order_emails_before_phones(spark):
    # an all-digit email local part must be redacted as ONE email, not
    # chewed into a phone fragment that leaves a dangling '@domain'
    out = _df(spark, ["mail 12345678901@digits.example now"]).select(
        redact_pii().alias("t")
    ).collect()[0]["t"]
    assert out == "mail <PII> now"


def test_pii_columns_stay_jvm_side(spark):
    df = _df(spark, ["x@y.zz"])
    cols = [c.alias(n) for n, c in pii_counts().items()]
    plan = (
        df.select(*cols, redact_pii().alias("red"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_pii_driver_query_matches_duckdb(spark):
    from shaman_scraping_spark.driver_queries import ORACLES, QUERIES

    sf = "/root/testdata/sf0.001"
    sdf = QUERIES["pii_redact"](spark, sf)
    cols = sorted(sdf.columns)
    got = {tuple(r[c] for c in cols) for r in sdf.collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    want = {
        tuple(r[c] for c in cols)
        for r in con.execute(ORACLES["pii_redact"]).fetch_arrow_table()
        .to_pylist()
    }
    assert got == want


def test_clean_cli_redacts(spark, tmp_path):
    from shaman_scraping_spark.cli import main

    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(40))
            + f" reach me at user{i}@mail.example")
        for i in range(6)
    ]
    src = tmp_path / "docs"
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(src)
    )
    out = tmp_path / "cleaned"
    rc = main([
        "clean", "--input", str(src), "--output", str(out), "--redact-pii",
    ])
    assert rc == 0
    cleaned = spark.read.parquet(str(out))
    assert cleaned.filter(F.col("text").contains("@")).count() == 0
    assert cleaned.filter(F.col("n_email") == 1).count() == 6
