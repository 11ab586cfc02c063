"""Op 23–26 (SURVEY.md §2D): HTML→text byte identity, link extraction,
charset decode, redirect targets.

The hand-written fixtures pin the FIXTURES.md §B.2 spec independently of
both the generator and the extractor; the corpus test then cross-checks
the generator's structural golden against the engine extractor on every
row, and the Spark test pushes the same kernel through the pandas-UDF
(Arrow) path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from shaman_scraping_spark.functions.html import (
    decode_html,
    extract_links,
    extract_text,
    extract_text_udf,
    redirect_target,
    sniff_charset,
)

# --- hand-computed spec fixtures (independent of generator) -----------------

SPEC_CASES = [
    (b"<p>hello   world</p>", "hello world"),
    (b"<html><head><title>T</title><script>var a='<x>';</script></head>"
     b"<body>A<!-- c -->B</body></html>", "T A B"),
    (b"<style>p {}</style>text", "text"),
    (b"a&amp;b &lt;tag&gt; &quot;q&quot; &apos;s&apos;", 'a&b <tag> "q" \'s\''),
    (b"one&nbsp;two", "one two"),
    (b"  \t\n spaced \n\n out \t ", "spaced out"),
    (b"", ""),
    (None, ""),
    # double-escaped decodes one level only (&amp;lt; -> &lt;)
    (b"x &amp;lt; y", "x &lt; y"),
    # meta charset latin-1
    ("<meta charset=\"iso-8859-1\"><p>caf\xe9</p>".encode("iso-8859-1"),
     "caf\xe9"),
    # invalid utf-8 -> replacement char
    (b"ok \xff\xfe end", "ok �� end"),
]


def test_extract_text_spec():
    for html, want in SPEC_CASES:
        assert extract_text(html) == want, html


def test_charset_sniff():
    assert sniff_charset(b'<meta charset="iso-8859-1">') == "iso-8859-1"
    assert sniff_charset(
        b'<meta http-equiv="Content-Type" content="text/html; charset=windows-1252">'
    ) == "windows-1252"
    assert sniff_charset(b"<p>plain</p>") == "utf-8"
    assert decode_html("caf\xe9".encode("iso-8859-1")) == "caf�"  # no meta -> utf-8 lossy


def test_extract_links_resolution():
    html = (b'<base href="http://a.example/sub/">'
            b'<a href="x.html">x</a>'
            b"<a href='/abs'>y</a>"
            b'<a href="http://b.example/p?b=2&amp;a=1">z</a>'
            b'<a href="javascript:void(0)">no</a>'
            b'<a href="#frag">no</a>'
            b'<a href="mailto:a@b">no</a>')
    links = extract_links(html, "http://a.example/page")
    assert links == [
        "http://a.example/sub/x.html",
        "http://a.example/abs",
        "http://b.example/p?b=2&a=1",
    ]


def test_links_skip_script_blocks():
    html = b'<script>document.write(\'<a href="http://x.example/js">j</a>\')</script><a href="/ok">k</a>'
    assert extract_links(html, "http://a.example/") == ["http://a.example/ok"]


def test_redirect_target():
    html = b'<meta http-equiv="refresh" content="0; url=/next">'
    assert redirect_target(html, "http://a.example/r/1") == "http://a.example/next"
    assert redirect_target(b"<p>no</p>", "http://a.example/") is None


# --- generator cross-check ---------------------------------------------------

def test_corpus_byte_identity_python(tiny_corpus):
    for url, _ts, html, text, _lang in tiny_corpus.rows:
        assert extract_text(html) == text, url


def test_corpus_byte_identity_spark(spark, pages_df):
    """Arrow/pandas-UDF path produces the same bytes as the golden column."""
    mism = (
        pages_df.withColumn("extracted", extract_text_udf(F.col("html")))
        .filter(F.col("extracted") != F.col("text"))
        .count()
    )
    assert mism == 0


def test_no_row_at_a_time_python_in_plan(spark, pages_df):
    """BASELINE.json input_hint: vectorized UDFs only — the plan must show
    ArrowEvalPython, never BatchEvalPython (SURVEY.md §5.5)."""
    df = pages_df.select(extract_text_udf(F.col("html")).alias("t"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
