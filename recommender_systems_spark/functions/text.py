"""Text-analysis kernels (training-data-pipeline extensions).

All Column builders on string columns, composed purely from JVM-side
built-ins (split / regexp / higher-order array functions) so they stay
inside whole-stage codegen — no Python in the hot path even at 100 TB.

Design note: the fingerprint is an explicit base-31 rolling hash over
code points rather than Spark's xxhash64 so that the DuckDB oracle can
reproduce it exactly (engine-portable determinism beats a marginally
better avalanche here; for production dedup keys see dedup.minhash which
uses xxhash64).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_PATTERN = r"[a-z0-9]+"
# BPE-ish surface tokenisation: words, numbers, or single punctuation marks.
BPE_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

FINGERPRINT_MOD = (1 << 31) - 1  # Mersenne prime 2^31-1
FINGERPRINT_BASE = 31

# Tiny per-language stopword inventories for the n-gram/stopword
# language-ID heuristic. Deliberately small: language ID at scale is a
# ratio test, not a model.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de", "que", "pour"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "de", "que", "por"],
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str, pattern: str = TOKEN_PATTERN) -> Column:
    """Lowercased word tokens (regexp-extracted, vectorised JVM-side)."""
    return F.regexp_extract_all(F.lower(_c(col)), F.lit(pattern), 0)


def token_count(col: Column | str) -> Column:
    """Whitespace-ish token count (extension op: token counting)."""
    return F.size(tokens(col))


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """All n-token shingles as space-joined strings (MinHash input)."""
    toks = tokens(col)
    k = F.size(toks) - F.lit(n - 1)
    return F.when(k <= 0, F.array(F.array_join(toks, " "))).otherwise(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


def char_ngrams(col: Column | str, n: int = 5) -> Column:
    """All character n-grams of the lowercased text (SimHash/Jaccard input)."""
    s = F.lower(_c(col))
    k = F.length(s) - F.lit(n - 1)
    return F.when(k <= 0, F.array(s)).otherwise(
        F.transform(F.sequence(F.lit(1), k), lambda i: F.substring(s, i, n))
    )


def _stopword_hits(toks: Column, words: list[str]) -> Column:
    vocab = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(vocab, t)))


def language_id(col: Column | str, toks: Column | None = None) -> Column:
    """Heuristic language ID: argmax of per-language stopword hit counts,
    'und' (undetermined) when nothing matches. Ties resolve to the
    earlier language.

    Single-traversal design: one ``aggregate`` walks the token array
    ONCE, accumulating all four per-language counts in an int array;
    the ``finish`` lambda computes the argmax from the bound
    accumulator variable. (A naive expression tree re-instantiates the
    ``regexp_extract_all`` tokeniser per score — Catalyst does not CSE
    across sibling expressions, which made this op ~9× slower.)

    ``toks``: optional pre-materialised token-array column — pass it
    when the surrounding projection already computed ``tokens(col)``
    (composite pipelines), so the tokeniser runs once per row total."""
    langs = list(STOPWORDS)
    vocabs = [F.array(*[F.lit(w) for w in STOPWORDS[lang]]) for lang in langs]

    def step(acc: Column, t: Column) -> Column:
        return F.array(
            *[
                F.element_at(acc, i + 1)
                + F.when(F.array_contains(vocabs[i], t), 1).otherwise(0)
                for i in range(len(langs))
            ]
        )

    def finish(acc: Column) -> Column:
        scores = [F.element_at(acc, i + 1) for i in range(len(langs))]
        best = F.greatest(*scores)
        out = F.lit("und")
        # Reverse iteration: earlier languages win ties (stable argmax).
        for lang, score in zip(reversed(langs), reversed(scores)):
            out = F.when((best > 0) & (score == best), F.lit(lang)).otherwise(out)
        return out

    return F.aggregate(
        tokens(col) if toks is None else toks,
        F.array(*[F.lit(0) for _ in langs]),
        step,
        finish,
    )


def quality_score(col: Column | str, toks: Column | None = None) -> Column:
    """Composite document-quality score in [0, 1]: length band, alpha
    ratio, stopword ratio, mean token length band (extension op: quality
    scoring for training-data curation). ``toks``: optional
    pre-materialised token array (see ``language_id``)."""
    s = _c(col)
    toks = tokens(s) if toks is None else toks
    n_tok = F.size(toks)
    n_chars = F.length(s)
    alpha_ratio = F.length(F.regexp_replace(F.lower(s), r"[^a-z]", "")) / F.greatest(
        n_chars, F.lit(1)
    )
    stop_ratio = _stopword_hits(toks, STOPWORDS["en"]) / F.greatest(n_tok, F.lit(1))
    mean_tok_len = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    ) / F.greatest(n_tok, F.lit(1))
    length_ok = F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    tok_len_ok = F.when((mean_tok_len >= 2.0) & (mean_tok_len <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return (
        F.lit(0.25) * length_ok
        + F.lit(0.25) * F.least(alpha_ratio * F.lit(1.25), F.lit(1.0))
        + F.lit(0.25) * F.least(stop_ratio * F.lit(4.0), F.lit(1.0))
        + F.lit(0.25) * tok_len_ok
    )


def rolling_fingerprint(col: Column | str, base: int = FINGERPRINT_BASE) -> Column:
    """Deterministic rolling hash over the text's code points, mod
    2^31-1 (extension op: document fingerprinting). Reproducible in any
    engine with reduce + ascii — used as the exact-dedup key. Two
    independent bases (31 and 131) give a 62-bit joint key whose
    collision probability is ~n²/2⁶³ — that pair, plus the length, is
    the scale-safe dedup shuffle key (8+8+8 bytes, never the text)."""
    chars = F.split(_c(col), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: F.pmod(
            acc * F.lit(base) + F.ascii(ch), F.lit(FINGERPRINT_MOD)
        ),
    )
