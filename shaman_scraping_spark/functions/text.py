"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID, document fingerprinting.

Native-first (Catalyst expressions, codegen'd); the language-ID
heuristic is a stopword-profile vote that stays entirely in
`pyspark.sql.functions` — no Python in the scoring path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from shaman_scraping_spark.operators.dedup import shingles_col, tokens_col

# tiny stopword profiles for the synthetic corpus languages; a real
# deployment swaps in fastText/CLD3 behind the same column contract
STOPWORDS = {
    "en": ["the", "over", "lazy", "quick", "jumps"],
    "de": ["der", "den", "über", "springt", "schnelle"],
    "fr": ["le", "par", "dessus", "saute", "rapide"],
    "es": ["el", "sobre", "salta", "perro", "rápido"],
}


def token_count(text_col: str = "text") -> Column:
    return F.size(tokens_col(text_col))


def char_count(text_col: str = "text") -> Column:
    return F.length(F.col(text_col))


def stopword_hits(text_col: str, words: list[str]) -> Column:
    """How many tokens of *text_col* are in *words* (array_intersect-free:
    counts multiplicity via filter + size)."""
    lit_words = F.array(*[F.lit(w) for w in words])
    return F.size(
        F.filter(tokens_col(text_col), lambda t: F.array_contains(lit_words, t))
    )


def quality_features(text_col: str = "text"):
    """Standard quality columns: n_tokens, n_chars, mean_token_len,
    punct_ratio, digit_ratio, stopword_ratio (en profile)."""
    n_tok = token_count(text_col)
    n_chr = char_count(text_col)
    txt = F.col(text_col)
    punct = n_chr - F.length(F.regexp_replace(txt, r"[.,;:!?]", ""))
    digit = n_chr - F.length(F.regexp_replace(txt, r"[0-9]", ""))
    safe_tok = F.greatest(n_tok, F.lit(1))
    safe_chr = F.greatest(n_chr, F.lit(1))
    return {
        "n_tokens": n_tok,
        "n_chars": n_chr,
        "mean_token_len": F.round(n_chr.cast("double") / safe_tok, 4),
        "punct_ratio": F.round(punct.cast("double") / safe_chr, 4),
        "digit_ratio": F.round(digit.cast("double") / safe_chr, 4),
        "stopword_ratio": F.round(
            stopword_hits(text_col, STOPWORDS["en"]).cast("double") / safe_tok, 4
        ),
    }


def lang_id(text_col: str = "text") -> Column:
    """Stopword-profile language vote → lang code ('und' if no hits).

    Pure Catalyst: one stopword-hit count per profile, greatest-wins
    with deterministic tie-break by code order.
    """
    scores = [
        (code, stopword_hits(text_col, words))
        for code, words in sorted(STOPWORDS.items())
    ]
    best = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    # reversed so earlier codes win ties (last when() checked first wins;
    # build from lowest priority outward)
    for code, s in reversed(scores):
        out = F.when((s == best) & (best > 0), F.lit(code)).otherwise(out)
    return out


def doc_fingerprint(
    text_col: str = "text", k: int = 4, keep: int = 4
) -> Column:
    """Winnowing-style fingerprint: the *keep* smallest xxhash64 values
    over word k-shingles, as a sorted array (robust to local edits)."""
    sh = shingles_col(text_col, k)
    hashes = F.transform(sh, lambda s: F.xxhash64(s))
    return F.slice(F.array_sort(hashes), 1, keep)


def dup_line_frac(text_col: str = "text") -> Column:
    """Within-document repetition (Gopher-style quality rule): the
    fraction of non-blank lines that are repeats of an earlier line.
    Pure Catalyst (split → filter → array_distinct), per-row — no
    shuffle, no UDF; 0.0 for docs with no non-blank lines."""
    lines = F.filter(
        F.split(F.col(text_col), "\n"), lambda x: F.trim(x) != ""
    )
    n = F.size(lines)
    nd = F.size(F.array_distinct(lines))
    return F.when(
        n > 0, F.lit(1.0) - nd.cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))


def top_word_count(text_col: str = "text") -> Column:
    """Occurrences of the document's most frequent token, computed
    per-row inside Catalyst: sort the token array, then a single
    ``aggregate`` pass tracks the longest equal-run — the mode count
    without any explode/shuffle (Gopher's top-n-gram-fraction family
    needs exactly this shape)."""
    # named_struct accumulator: (cur run, max run, previous token)
    return F.expr(
        f"""
        aggregate(
          array_sort(split(trim({text_col}), '\\\\s+')),
          named_struct('cur', 0, 'mx', 0,
                       'prev', cast(null as string)),
          (a, x) -> named_struct(
            'cur', IF(a.prev IS NOT NULL AND x = a.prev, a.cur + 1, 1),
            'mx', greatest(
              a.mx, IF(a.prev IS NOT NULL AND x = a.prev, a.cur + 1, 1)),
            'prev', x),
          a -> a.mx)
        """
    )


def top_word_frac(text_col: str = "text") -> Column:
    """Share of tokens taken by the most frequent token — the
    degenerate-repetition signal (``aaa aaa aaa`` scores 1.0)."""
    n = token_count(text_col)
    return F.when(
        n > 0, top_word_count(text_col).cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))


# --- PII scanning / redaction ------------------------------------------------
# Training corpora scrub obvious PII before the data ships.  Patterns
# are deliberately conservative ASCII regexes that mean the same thing
# in Java (Spark) and RE2 (DuckDB) so the driver contract can mirror
# the machinery; a production deployment swaps richer patterns (or a
# NER pass) behind the same column contract.  Order matters for
# redaction: emails first (their local parts contain digits), then
# phones, then bare IPv4s.

PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\-\s]{6,}[0-9]",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
}


def pii_counts(text_col: str = "text") -> dict[str, Column]:
    """Per-row match counts for each PII pattern (n_email, n_phone,
    n_ipv4) — pure Catalyst ``regexp_extract_all``, codegen'd, no UDF."""
    return {
        f"n_{name}": F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))
        )
        for name, pat in PII_PATTERNS.items()
    }


def redact_pii(text_col: str = "text", token: str = "<PII>") -> Column:
    """Replace every PII match with *token*, applying the patterns in
    PII_PATTERNS order (emails before phones before IPv4s so digit-
    bearing emails are not half-eaten by the phone pattern)."""
    out = F.col(text_col)
    for pat in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, token)
    return out
