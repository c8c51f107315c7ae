"""Text-analysis column expressions — all JVM-side (no Python UDFs).

These power both the covsonar profile-token matching (profiles are arrays
of tokens, like tokenized text) and the training-data-pipeline operators
(dedup, quality scoring, language ID) over the ``documents`` table.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny built-in stopword lists for the n-gram/stopword language heuristic.
# Public knowledge (most frequent function words per language).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "que", "por"],
    "it": ["il", "la", "gli", "le", "e", "è", "un", "una", "che", "per"],
}


def tokens(col: str | Column, sep: str = " ") -> Column:
    r"""Single-space tokenization → array<string> — the corpus contract
    (and every DuckDB oracle twin) splits on the literal separator, so
    the two engines always agree token-for-token.  Pass ``sep=r"\s+"``
    for true whitespace splitting on corpora with tabs/newlines (note
    that leading/repeated separators then still yield '' tokens; trim
    first)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, sep)


def distinct_tokens(col: str | Column) -> Column:
    return F.array_distinct(tokens(col))


def token_count(col: str | Column) -> Column:
    """Whitespace token count (cheap `wc -w`)."""
    return F.size(tokens(col))


def word_shingles(tokens_col: Column, k: int = 3) -> Column:
    """Word k-gram shingles via higher-order functions (JVM-side, no UDF):
    ``transform(sequence(1, n-k+1), i -> concat_ws(' ', slice(toks, i, k)))``.
    Returns an empty array for docs shorter than k tokens.
    """
    n = F.size(tokens_col)
    seq = F.sequence(F.lit(1), n - F.lit(k - 1))
    # short docs: sequence(1, n-k+1<=0) would DESCEND ([1,0,...]) and
    # slice(toks, 0, k) throws — gate the whole expression instead
    return F.when(n >= k,
                  F.transform(seq, lambda i: F.concat_ws(" ", F.slice(tokens_col, i, k)))
                  ).otherwise(F.array().cast("array<string>"))


def stopword_hits(tokens_col: Column, lang: str) -> Column:
    """Count of tokens that are stopwords of ``lang`` (JVM-side filter+size)."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens_col, lambda t: F.array_contains(sw, t)))


def quality_score(col: str | Column) -> Column:
    """Heuristic quality score in [0,1]: combines mean word length,
    alpha-character ratio and distinct-token ratio.  Pure column math so it
    runs inside whole-stage codegen at any scale."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n = F.size(toks)
    mean_word_len = (F.length(c) - (n - F.lit(1))) / n  # chars minus separators
    alpha_ratio = (
        F.length(F.regexp_replace(c, r"[^A-Za-z]", "")) / F.greatest(F.length(c), F.lit(1))
    )
    distinct_ratio = F.size(F.array_distinct(toks)) / n
    # normalize mean word length to [0,1] with a soft cap at 10 chars
    mwl_norm = F.least(mean_word_len / F.lit(10.0), F.lit(1.0))
    return F.round((mwl_norm + alpha_ratio + distinct_ratio) / F.lit(3.0), 6)


def lang_id(col: str | Column, langs: tuple[str, ...] = ("en", "de", "fr")) -> Column:
    """Stopword-vote language ID: argmax over per-language stopword hit
    counts, ``und`` (undetermined) when all are zero.  Ties break by the
    order of ``langs`` (deterministic)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    scores = [(lang, stopword_hits(toks, lang)) for lang in langs]
    greatest = reduce(lambda a, b: F.greatest(a, b), [s for _, s in scores])
    # argmax via CASE; iterate in reverse so earlier langs win ties
    expr = F.lit("und")
    for lang, score in reversed(scores):
        expr = F.when((greatest > 0) & (score == greatest), F.lit(lang)).otherwise(expr)
    return expr
