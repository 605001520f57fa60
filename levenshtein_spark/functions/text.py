"""Text-analysis column functions for training-data pipelines.

All JVM-side column expressions (no Python UDFs): tokenization, character
shingles, quality scoring, language-ID heuristic, token counting, rolling
document fingerprints. Each is designed to be reproducible in ANSI SQL so the
driver's DuckDB oracle can verify it exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def ws_tokens(col) -> Column:
    """Whitespace tokens (array<string>), empties removed."""
    return F.filter(F.split(F.trim(_c(col)), r"\s+"), lambda x: x != "")


def word_tokens(col) -> Column:
    """Lowercased word tokens: runs of letters/digits (BPE-ish pre-tokens)."""
    return F.filter(
        F.split(F.lower(_c(col)), r"[^a-z0-9]+"), lambda x: x != ""
    )


def word_ngrams(col, n: int, sep: str = "_") -> Column:
    """Word n-gram shingles (array<string>) over the word tokens of ``col``.
    Documents shorter than ``n`` tokens yield ONE shingle covering the whole
    document (the short-doc rule every shingle consumer here shares); a
    zero-token document yields one ``''`` shingle — consumers that must not
    match empty docs filter it (see q_decontaminate)."""
    toks = word_tokens(col)
    size = F.size(toks)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(size - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(sep, F.slice(toks, i, n)),
    )


def word_bigrams(col) -> Column:
    """Word-bigram shingles (array<string>, 'tok1_tok2') — the MinHash unit
    for content near-dup detection (unigram sets are too coarse on small
    vocabularies). A single-token document yields its token as the shingle."""
    return word_ngrams(col, 2, "_")


def token_count(col) -> Column:
    """Whitespace token count — the unit of LLM-corpus budgeting."""
    return F.size(ws_tokens(col))


def char_shingles(col, n: int = 3) -> Column:
    """Character n-gram set (array<string>, distinct) of a string column.

    Built with sequence+transform (JVM, no UDF). Strings shorter than n yield
    a single shingle = the string itself.
    """
    c = _c(col)
    ln = F.length(c)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(ln - (n - 1), F.lit(1))),
        lambda i: F.substr(c, i, F.lit(n)),
    )
    return F.array_distinct(grams)


def punct_ratio(col) -> Column:
    """Fraction of characters that are ASCII punctuation."""
    c = _c(col)
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[!-/:-@\[-`{-~]", ""))
    return (punct.cast("double") / F.greatest(F.length(c), F.lit(1))).alias("punct_ratio")


def alpha_ratio(col) -> Column:
    """Fraction of characters that are ASCII letters."""
    c = _c(col)
    alpha = F.length(c) - F.length(F.regexp_replace(c, r"[A-Za-z]", ""))
    return alpha.cast("double") / F.greatest(F.length(c), F.lit(1))


def digit_ratio(col) -> Column:
    c = _c(col)
    digits = F.length(c) - F.length(F.regexp_replace(c, r"[0-9]", ""))
    return digits.cast("double") / F.greatest(F.length(c), F.lit(1))


def mean_word_length(col) -> Column:
    toks = ws_tokens(col)
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
    return total.cast("double") / F.greatest(F.size(toks), F.lit(1))


STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "des", "est", "dans", "que", "une", "pour"],
    "es": ["el", "la", "los", "las", "que", "de", "en", "es", "por", "con"],
}


def stopword_count(col, lang: str = "en") -> Column:
    """Number of tokens that are stopwords of ``lang`` (quality signal)."""
    toks = word_tokens(col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def stopword_ratio(col, lang: str = "en") -> Column:
    return stopword_count(col, lang).cast("double") / F.greatest(
        F.size(word_tokens(col)), F.lit(1)
    )


def lang_guess(col) -> Column:
    """Stopword-vote language-ID heuristic over {en,de,fr,es}; 'und' if no vote.

    Deterministic and SQL-reproducible: argmax of per-language stopword
    counts, ties broken by language code order.
    """
    counts = [(lang, stopword_count(col, lang)) for lang in sorted(STOPWORDS)]
    best_count = F.greatest(*[c for _, c in counts])
    out = F.lit("und")
    for lang, cnt in reversed(counts):  # earlier langs win ties -> apply last
        out = F.when((cnt == best_count) & (best_count > 0), F.lit(lang)).otherwise(out)
    return out


def quality_score(col) -> Column:
    """Composite [0,1] quality score: length, alpha ratio, stopword presence.

    A heuristic in the Gopher-rules family: each factor in [0,1], averaged.
    """
    c = _c(col)
    ln = F.length(c).cast("double")
    length_factor = F.least(ln / F.lit(500.0), F.lit(1.0))
    alpha_factor = alpha_ratio(c)
    stop_factor = F.least(stopword_ratio(c).cast("double") * 5.0, F.lit(1.0))
    wordlen = mean_word_length(c)
    wordlen_factor = F.when((wordlen >= 3) & (wordlen <= 10), 1.0).otherwise(0.5)
    return (length_factor + alpha_factor + stop_factor + wordlen_factor) / 4.0


def rolling_fingerprint(col, window: int = 8) -> Column:
    """Deterministic document fingerprint: min rolling-window hash (winnowing).

    Splits into word tokens, hashes each ``window``-gram portably, takes the
    minimum — a 1-of-N winnowing fingerprint usable for containment checks.
    """
    toks = word_tokens(col)
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (window - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, window)),
    )
    hashed = F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long"),
    )
    return F.array_min(hashed)
