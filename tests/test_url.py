"""Ops 8–10 (SURVEY.md §2B): canonicalization, xxhash64 keying, host.

Property obligations (SURVEY.md §5.2):
  * native Catalyst path == pure-Python twin, byte-for-byte
  * idempotence: c(c(u)) == c(u)
  * variant spellings collapse to one canonical key
  * no Python stage in the native path's physical plan
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from shaman_scraping_spark.corpus.generator import _variant_spelling
from shaman_scraping_spark.functions.url import (
    canonicalize_url,
    canonicalize_url_py,
    url_hash,
    url_host_py,
    with_url_columns,
)

CASES = [
    ("HTTPS://ExAmple.COM/a?b=2&a=1#frag", "https://example.com/a?a=1&b=2"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com:80/x", "http://example.com/x"),
    ("https://example.com:443/x", "https://example.com/x"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("http://example.com/a?z=1&y=2&", "http://example.com/a?y=2&z=1"),
    ("http://example.com/a?", "http://example.com/a"),
    ("http://example.com/#only-frag", "http://example.com/"),
    ("http://EXAMPLE.com/CaseKeptInPath", "http://example.com/CaseKeptInPath"),
    ("http://example.com/p%2Fq?A=1&a=2", "http://example.com/p%2Fq?A=1&a=2"),
    ("ftp://example.com/x", None),
    ("not a url", None),
    ("mailto:a@b.c", None),
    # twin-divergence regressions (ADVICE.md r1): both paths must agree
    ("http://h:99999/a", None),            # out-of-range port
    ("http://h:65535/a", "http://h:65535/a"),
    ("http://h.ex/a b", None),             # raw space → invalid
    ("http://h.ex/a\tb", None),            # raw tab → invalid
    ("http://[::1]:8080/a", "http://[::1]:8080/a"),   # IPv6 keeps brackets
    ("HTTP://[2001:DB8::1]/X", "http://[2001:db8::1]/X"),
]


def test_python_twin_cases():
    for raw, want in CASES:
        assert canonicalize_url_py(raw) == want, raw


def test_python_twin_idempotent():
    for raw, want in CASES:
        if want is not None:
            assert canonicalize_url_py(want) == want


def _spark_canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["c"] for r in
        df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    ]


def test_native_matches_twin_on_cases(spark):
    urls = [raw for raw, _ in CASES]
    got = _spark_canon(spark, urls)
    want = [canonicalize_url_py(u) for u in urls]
    assert got == want


def test_native_matches_twin_on_generated(spark):
    rng = random.Random(7)
    base = [
        f"http://host{i:02d}.example/p/{j}" + (f"?id={j}&ref=x" if j % 3 else "")
        for i in range(8) for j in range(12)
    ]
    urls = base + [_variant_spelling(u, rng) for u in base]
    got = _spark_canon(spark, urls)
    want = [canonicalize_url_py(u) for u in urls]
    assert got == want
    # variants collapse: same canonical set as base
    assert set(got) == {canonicalize_url_py(u) for u in base}


def test_with_url_columns_plan_is_pure_catalyst(spark):
    df = spark.createDataFrame([("http://a.example/x?b=1&a=2",)], "url string")
    out = with_url_columns(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInArrow" not in plan
    row = out.collect()[0]
    assert row["url_canon"] == "http://a.example/x?a=2&b=1"
    assert row["host"] == "a.example"
    assert isinstance(row["url_hash"], int)


def test_hash_stability_and_distinctness(spark):
    urls = [f"http://h{i}.example/p/{i}" for i in range(200)]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    hashes = [
        r["h"] for r in df.select(url_hash(F.col("url")).alias("h")).collect()
    ]
    assert len(set(hashes)) == len(urls)
    hashes2 = [
        r["h"] for r in df.select(url_hash(F.col("url")).alias("h")).collect()
    ]
    assert hashes == hashes2
