"""Round-6 optimization-phase tests: equivalence gates for rewritten
operator internals (minhash/simhash/warc-dedup), the crash-replay and
mixed-schema correctness fixes from ADVICE r5, the SimHash radius
guard, and the self-limiting SemDeDup cells."""

from __future__ import annotations

from datetime import datetime, timezone

import numpy as np
import pytest
from pyspark.sql import functions as F

TS = datetime(2024, 6, 1, tzinfo=timezone.utc)


# --- minhash restructure: old 4-evaluation shape ≡ new carried-signature ----

def test_minhash_neardup_matches_old_shape(spark):
    from shaman_scraping_spark.operators.dedup import (
        lsh_candidate_pairs, minhash_neardup_pairs, minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i % 4} common text body shared tokens {i % 3} tail "
             f"{'dup run ' * (i % 5)}") for i in range(60)],
        "doc_id long, text string",
    )
    new = sorted(
        map(tuple, minhash_neardup_pairs(
            docs, "doc_id", "text", num_perm=16, bands=4, threshold=0.4
        ).collect())
    )
    # the pre-r6 shape: candidates first, then two signature re-joins
    sig = minhash_signatures(docs, "doc_id", "text", 16, 3)
    cand = lsh_candidate_pairs(sig, "doc_id", 16, 4)
    a = sig.select(F.col("doc_id").alias("id_a"),
                   *[F.col(f"h{i}").alias(f"a{i}") for i in range(16)])
    b = sig.select(F.col("doc_id").alias("id_b"),
                   *[F.col(f"h{i}").alias(f"b{i}") for i in range(16)])
    matches = sum(F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
                  for i in range(16))
    old = sorted(
        map(tuple, cand.join(a, "id_a").join(b, "id_b")
            .withColumn("est_jaccard", matches / F.lit(16.0))
            .filter(F.col("est_jaccard") >= 0.4)
            .select("id_a", "id_b", "est_jaccard").collect())
    )
    assert new == old and len(new) > 0


# --- simhash radius guard (VERDICT r5 what's-wrong #3) ----------------------

def _hamming_docs(spark):
    """Docs over a 300-token vocabulary differing by 0..9 substituted
    tokens — the large shared vocabulary keeps per-swap bit flips
    small, so pairwise SimHash distances span 1..8 (probed: 10 pairs
    at exactly distance 4, non-empty at every radius tested below)."""
    base = [f"tok{i}" for i in range(300)]
    rows = []
    for d in range(10):
        toks = list(base)
        for j in range(d):           # replace d tokens
            toks[j] = f"alt{d}_{j}"
        rows.append((d, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("max_hamming", [2, 4, 6])
def test_simhash_blocking_complete_at_radius(spark, max_hamming):
    """The pigeonhole blocking must return EXACTLY the brute-force
    pair set at every radius — the pre-r6 fixed 4-chunk layout was
    silently incomplete above Hamming 3."""
    from shaman_scraping_spark.operators.dedup import (
        simhash64, simhash_neardup_pairs,
    )

    docs = _hamming_docs(spark)
    sh = {r["doc_id"]: r["simhash"]
          for r in simhash64(docs, "doc_id").collect()}
    brute = {
        (a, b)
        for a in sh for b in sh if a < b
        and bin((sh[a] ^ sh[b]) & (2**64 - 1)).count("1") <= max_hamming
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_neardup_pairs(
            docs, "doc_id", max_hamming=max_hamming).collect()
    }
    assert got == brute
    assert brute, "vacuous radius — corpus must exercise it"
    if max_hamming >= 4:
        # the guard's motivating case: true pairs STRICTLY past the
        # old 4-chunk Hamming-3 completeness bound exist, so the old
        # fixed layout's incompleteness would show here
        assert any(
            bin((sh[a] ^ sh[b]) & (2**64 - 1)).count("1") > 3
            for a, b in brute
        )


def test_simhash_radius_guard_raises_on_degenerate(spark):
    from shaman_scraping_spark.operators.dedup import simhash_neardup_pairs

    with pytest.raises(ValueError):
        simhash_neardup_pairs(_hamming_docs(spark), "doc_id",
                              max_hamming=64)


# --- warc dedup de-skew (ADVICE r5 medium / VERDICT what's-wrong #2) --------

def test_warc_dedup_hot_digest_no_window(spark, tmp_path):
    """One digest owning 50% of the batch: verdicts stay exact (one
    min-url response, every other copy a revisit pointing at it), and
    the winner election is a map-side-combinable aggregate — the
    executed plan contains NO Window node, so no single task absorbs
    the hot digest's payload family."""
    from shaman_scraping_spark.sources.warc import (
        read_warc, write_warc_archive,
    )

    hot = b"<html>hot standard body</html>"
    rows = [(f"http://h.example/hot/{i:03d}", TS, hot, 200)
            for i in range(20)]
    rows += [(f"http://h.example/u/{i:03d}", TS,
              f"<html>unique {i}</html>".encode(), 200)
             for i in range(20)]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, status int")
    out = tmp_path / "warc"
    out.mkdir()
    idx = write_warc_archive(df, str(out), dedup=True)
    plan = idx._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    pdf = idx.toPandas()
    hot_rows = pdf[pdf.url.str.startswith("http://h.example/hot/")]
    assert (hot_rows.record_type == "response").sum() == 1
    winner = hot_rows[hot_rows.record_type == "response"].url.iloc[0]
    assert winner == "http://h.example/hot/000"   # min (url, warc_ts)
    recs = {r["url"]: r for r in read_warc(spark, str(out)).collect()}
    assert {
        recs[u]["refers_to"]
        for u in hot_rows[hot_rows.record_type == "revisit"].url
    } == {winner}
    # unique payloads untouched
    uniq = pdf[pdf.url.str.startswith("http://h.example/u/")]
    assert (uniq.record_type == "response").all()


# --- warc_index crash-replay prior chain (ADVICE r5 high) -------------------

def test_warc_dedup_crash_replay_keeps_responses(spark, tmp_path):
    """Idempotent re-run of a wave whose first attempt already
    committed warc_index (crash before the wave marker): the re-run
    must NOT read its own crashed output as 'prior' and demote every
    re-fetched payload to a revisit pointing at deleted records."""
    from shaman_scraping_spark.config import CrawlConfig
    from shaman_scraping_spark.plans.engine import CrawlEngine

    seed_html = (b'<html><body><a href="/a">a</a> '
                 b'<a href="/b">b</a></body></html>')
    rows = [
        ("http://h1.example/", TS, seed_html, "", "en"),
        ("http://h1.example/a", TS, b"<html>leaf a</html>", "", "en"),
        ("http://h1.example/b", TS, b"<html>leaf b</html>", "", "en"),
    ]
    pages = tmp_path / "pages.parquet"
    spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string",
    ).write.parquet(str(pages))
    cfg = CrawlConfig(
        seeds=("http://h1.example/",), max_waves=2,
        warc_dir=str(tmp_path / "warc"), warc_dedup=True,
    )
    eng = CrawlEngine(spark, cfg, str(pages), str(tmp_path / "state"))
    eng.run()
    clean = {r["url"]: r["record_type"]
             for r in eng.io.load("warc_index").collect()}
    assert clean == {
        "http://h1.example/": "response",
        "http://h1.example/a": "response",
        "http://h1.example/b": "response",
    }
    # simulate the crash: wave 1's commits exist but its marker write
    # never happened → resume re-runs wave 1 idempotently
    eng._mark_complete(0, frontier_empty=False)
    eng.run_wave(1)
    replayed = {r["url"]: r["record_type"]
                for r in eng.io.load("warc_index").collect()}
    assert replayed == clean, replayed
    eng.close()


# --- TableIO mixed-schema append chain (ADVICE r5 medium) -------------------

def test_tableio_load_mixed_schema_append_chain(spark, tmp_path):
    from shaman_scraping_spark.io.tableio import TableIO

    io = TableIO(spark, tmp_path / "state")
    io.commit(
        "t",
        spark.createDataFrame([(1, "x")], "a long, b string"),
        wave=0, mode="append",
    )
    io.commit(
        "t",
        spark.createDataFrame([(2, "y", "new")],
                              "a long, b string, c string"),
        wave=1, mode="append",
    )
    got = {r["a"]: (r["b"], r["c"]) for r in io.load("t").collect()}
    # pre-upgrade rows read the added column as null, not AnalysisException
    assert got == {1: ("x", None), 2: ("y", "new")}


# --- cdx_prefix astral-plane exactness (ADVICE r5 low) ----------------------

def test_cdx_prefix_includes_astral_urlkeys(spark, tmp_path):
    from shaman_scraping_spark.sources.cdx import cdx_prefix, write_cdx

    rows = [
        ("http://h.example/plain", TS, "f", 0, 10, 200, "d1", "response"),
        ("http://h.example/\U00010000page", TS, "f", 10, 10, 200, "d2",
         "response"),
        ("http://other.example/x", TS, "f", 20, 10, 200, "d3", "response"),
    ]
    idx = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, warc_file string, offset long, "
        "length long, http_status int, digest string, record_type string",
    )
    path = str(tmp_path / "cdx")
    write_cdx(idx, path, n_partitions=2)
    got = {r["url"] for r in
           cdx_prefix(spark, path, "http://h.example/").collect()}
    # the supplementary-plane key escaped the old lo..lo+U+FFFF range
    assert got == {"http://h.example/plain",
                   "http://h.example/\U00010000page"}


# --- SemDeDup self-limiting cells (VERDICT r5 what's-wrong #1) --------------

def _blobs(spark, n_blobs, per_blob, dim=32, noise=0.05, seed=7):
    rng = np.random.default_rng(seed)
    cents = rng.normal(size=(n_blobs, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    rows = []
    vid = 0
    for b in range(n_blobs):
        for p in cents[b] + rng.normal(scale=noise, size=(per_blob, dim)):
            rows.append((vid, [float(x) for x in p]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.mark.parametrize("per_blob", [30, 60])
def test_semdedup_autok_recall_two_sizes(spark, per_blob):
    """k=None derives cell count from the corpus size; planted-blob
    pair recall stays ≥ 0.8 at both corpus sizes (VERDICT r5 item 2
    done-criterion)."""
    from shaman_scraping_spark.operators.similarity import (
        cosine, semdedup_pairs,
    )

    emb = _blobs(spark, n_blobs=8, per_blob=per_blob)
    a, b = emb.alias("a"), emb.alias("b")
    brute = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .withColumn("cs", cosine(F.col("a.embedding"),
                                 F.col("b.embedding")))
        .filter(F.col("cs") >= 0.9)
        .select(F.col("a.vec_id").alias("id_a"),
                F.col("b.vec_id").alias("id_b")).collect()
    }
    assert len(brute) > 50
    got = {
        (r["id_a"], r["id_b"])
        for r in semdedup_pairs(
            emb, threshold=0.9, target_cell_rows=per_blob).collect()
    }
    assert got <= brute
    assert len(got & brute) / len(brute) >= 0.8


def test_semdedup_cells_respect_row_cap(spark):
    """Cells above max_cell_rows are recursively re-clustered until no
    splittable cell exceeds the cap."""
    from shaman_scraping_spark.operators.similarity import semdedup_cells

    emb = _blobs(spark, n_blobs=2, per_blob=400, noise=0.2)
    cells = semdedup_cells(emb, target_cell_rows=300, max_cell_rows=350)
    sizes = [r["n"] for r in
             cells.groupBy("cell").agg(F.count("*").alias("n")).collect()]
    assert sum(sizes) == 800
    assert max(sizes) <= 350, sizes
