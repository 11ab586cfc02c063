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
