"""Text analysis for training-data pipelines: token counting, quality
scoring, language ID, document fingerprinting.

All pure column expressions (whole-stage codegen, no Python in the hot
path) and all deterministic — each has an exact ANSI-SQL equivalent so
the DuckDB oracle can verify them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from spotify_app_etl_spark.operators.dedup import normalized

#: Tiny stopword lists for the n-gram-free language-ID heuristic.
#: (Public common-word lists; good enough for a routing heuristic.)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "a"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "por", "una"],
    "de": ["der", "die", "und", "das", "nicht", "von", "ist", "mit", "den", "ein"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour", "que", "sur"],
}


def tokens(text: str | Column) -> Column:
    return F.split(normalized(text), " ")


def token_count(text: str | Column) -> Column:
    return F.size(tokens(text))


def stopword_hits(text: str | Column, lang: str) -> Column:
    """Number of token occurrences that are stopwords of ``lang``."""
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens(text), lambda tk: F.array_contains(words, tk)))


def language_id(text: str | Column) -> Column:
    """Argmax of stopword-hit counts; 'und' (undetermined) when no
    language scores a hit. Ties resolve in en>es>de>fr order
    (deterministic CASE chain — mirrored exactly in the SQL oracle)."""
    hits = {lang: stopword_hits(text, lang) for lang in STOPWORDS}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    for lang in reversed(list(STOPWORDS)):  # build CASE bottom-up
        expr = F.when((hits[lang] == best) & (best > 0), lang).otherwise(expr)
    return expr


#: BPE-ish pre-tokenizer: word pieces with leading space, numbers,
#: punctuation runs — an approximation of the GPT-2 split pattern using
#: capabilities common to Spark's and DuckDB's regex engines (no \p
#: classes, no lookahead), so counts are oracle-exact.
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]+|\s+"


def bpe_ish_token_count(text: str | Column) -> Column:
    """Approximate subword-token count: number of BPE-ish pattern
    matches, digits counted singly (as GPT-2-family tokenizers do).
    Whitespace runs collapse to the following word's leading space, so
    they are not counted separately."""
    col = F.col(text) if isinstance(text, str) else text
    # count matches by deleting them and measuring what disappeared:
    # regexp_count exists in Spark 4 and DuckDB — use it directly
    return F.regexp_count(col, F.lit(r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]+"))


def punct_count(text: str | Column) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    return F.length(F.regexp_replace(col, r"[^.!?,;:]", ""))


def digit_ratio(text: str | Column) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    return F.length(F.regexp_replace(col, r"[^0-9]", "")) / F.greatest(
        F.length(col), F.lit(1)
    ).cast("double")


def mean_token_length(text: str | Column) -> Column:
    tks = tokens(text)
    total = F.aggregate(tks, F.lit(0), lambda acc, tk: acc + F.length(tk))
    return total / F.greatest(F.size(tks), F.lit(1)).cast("double")


def quality_score(text: str | Column) -> Column:
    """Heuristic [0,1] quality score: length band + stopword presence −
    digit noise. Deterministic rational arithmetic (oracle-able)."""
    n_tok = token_count(text).cast("double")
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    stop_score = F.least(
        stopword_hits(text, "en").cast("double") / F.lit(5.0), F.lit(1.0)
    )
    noise = digit_ratio(text)
    return F.round(
        F.greatest(
            F.least(
                F.lit(0.5) * len_score + F.lit(0.5) * stop_score - noise, F.lit(1.0)
            ),
            F.lit(0.0),
        ),
        6,
    )


def fingerprint(
    text: str | Column, mod: int = 2147483647, *, assume_normalized: bool = False
) -> Column:
    """Polynomial rolling hash over characters: acc = (acc*31 + code) % m.

    Left fold in character order — identical to DuckDB's list_reduce —
    and kept under 2^36 so ANSI-mode arithmetic never overflows.

    PERF: the string is indexed per character inside the transform
    lambda — pre-project the normalized text and pass
    ``assume_normalized=True`` on hot paths (an inline normalization
    would re-run its regexp once per character).
    """
    col = F.col(text) if isinstance(text, str) else text
    norm = col if assume_normalized else normalized(col)
    codes = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(norm), F.lit(1))),
        lambda i: F.ascii(F.substring(norm, i, F.lit(1))),
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + c) % F.lit(mod).cast("long"),
    )
