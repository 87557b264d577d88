"""Text-analysis operators over document tables (SURVEY N6).

Everything is a JVM-side Column expression (split/filter/aggregate/regexp
— whole-stage codegen); the only Python is the winnowing fingerprint,
which is an Arrow-batched pandas UDF because a rolling hash is inherently
sequential per document (and still embarrassingly parallel across rows).

Grounded in the reference's text surface: extracted ValueText/vendor
strings (anarcpt/anarcptlib.py:44-78) are exactly the kind of OCR'd text
these operators score, deduplicate, and fingerprint at corpus scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker vocabularies for the n-gram language-ID heuristic. Tiny on purpose:
# the operator shape (token-overlap scoring + argmax) is what matters; real
# deployments swap in real stopword lists per language.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("hash", "sort", "scan", "batch"),
    "en": ("the", "a", "fast", "slow", "big", "small"),
    "es": ("data", "table", "row", "column"),
    "fr": ("query", "filter", "join", "merge"),
    "zh": ("spark", "stream", "window", "vector"),
}

STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "to", "in")

# BPE-ish tokenization: letter runs | digit runs | single punctuation.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _as_col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def let_bound(bound: Column, body) -> Column:
    """Let-binding for Column expressions: evaluate ``bound`` ONCE per row
    and pass the result to ``body`` as a lambda variable.

    Referencing a non-trivial expression tree (e.g. a regex ``tokens()``
    split) directly inside a higher-order-function lambda re-evaluates the
    whole tree per array ELEMENT under Spark's interpreted HOF evaluation
    — O(n²) per row for the per-position lambdas this package builds
    (r10 finding: 5.5 s of the sf0.1 shingle explode was re-splitting).
    The single-element transform is the structural fix: the bound
    expression becomes the HOF's argument (evaluated once), the body only
    sees the materialized lambda variable, and the optimizer cannot
    re-inline through the binding."""
    return F.transform(F.array(bound), body)[0]


def tokens(c: str | Column) -> Column:
    """Whitespace tokens, empties dropped.

    The DuckDB replay of this exact tokenization is :data:`DUCK_TOKENS`
    below — every oracle that mirrors a tokens()-based operator MUST use
    that fragment (not ``string_split(text, ' ')``), or documents with
    double/leading/trailing/tab/newline whitespace diverge between the
    engines. The split pattern is an explicit character class equal to
    Java's ``\\s`` so both regex engines (Java regex here, RE2 in DuckDB)
    see the identical whitespace definition."""
    return F.filter(F.split(F.trim(_as_col(c)), WS_RE), lambda t: t != "")


# Java \s == [ \t\n\x0B\f\r]; spelled out so RE2 (DuckDB) matches it exactly.
WS_RE = "[ \\t\\n\\x0B\\f\\r]+"

# DuckDB expression replaying tokens() bit-for-bit on a column named `text`:
# split on the same whitespace class, drop empty tokens (which also makes
# leading/trailing whitespace irrelevant, mirroring the trim above).
DUCK_TOKENS = "list_filter(regexp_split_to_array(text, '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '')"


def token_count_ws(c: str | Column) -> Column:
    return F.size(tokens(c))


def token_count_bpe(c: str | Column) -> Column:
    """Regex token count approximating subword/BPE pre-tokenization."""
    return F.size(F.regexp_extract_all(_as_col(c), F.lit(BPE_TOKEN_RE), 0))


def marker_score(c: str | Column, markers: tuple[str, ...]) -> Column:
    """Number of tokens (with multiplicity) that are language markers."""
    return F.size(F.filter(tokens(c), lambda t: t.isin(*markers)))


def lang_id(c: str | Column) -> Column:
    """Argmax of marker scores; ties go to the lexicographically smallest
    language code (deterministic). Unknown only if every score is 0."""
    scores = {lang: marker_score(c, m) for lang, m in LANG_MARKERS.items()}
    langs = sorted(scores)  # lexicographic chain ⇒ smallest wins ties
    expr = None
    for i, lang in enumerate(langs):
        others = [scores[o] for o in langs[i + 1 :]]
        cond = scores[lang] > 0
        if others:
            cond = cond & (scores[lang] >= F.greatest(*others) if len(others) > 1 else scores[lang] >= others[0])
        branch = F.when(cond, lang)
        expr = branch if expr is None else expr.when(cond, lang)
    return expr.otherwise(F.lit("unknown"))


def punct_count(c: str | Column) -> Column:
    return F.size(F.regexp_extract_all(_as_col(c), F.lit(r"[^\w\s]"), 0))


def stopword_ratio(c: str | Column) -> Column:
    """Stopword tokens / total tokens as an exact int/int IEEE division."""
    n = token_count_ws(c)
    stop = F.size(F.filter(tokens(c), lambda t: t.isin(*STOPWORDS)))
    return F.when(n > 0, stop.cast("double") / n).otherwise(F.lit(0.0))


def quality_class(c: str | Column) -> Column:
    """Coarse quality bucket from length + stopword signals — the shape of a
    pretraining-corpus quality filter."""
    n = token_count_ws(c)
    return (
        F.when(n < 5, "too_short")
        .when(stopword_ratio(c) > 0.5, "boilerplate")
        .otherwise("ok")
    )


def content_fingerprint(c: str | Column) -> Column:
    """Exact-content fingerprint: md5 of the normalized text. The key for
    exact dedup (the reference's rename-to-hash collision, anarcptlib.py:155-159,
    applied to text instead of pixels)."""
    return F.md5(F.lower(F.trim(_as_col(c))))


def winnow_fingerprints(c: str | Column, k: int = 5, window: int = 4) -> Column:
    """Winnowing fingerprint set (Schleimer et al., SIGMOD'03): rolling-hash
    k-grams, keep the minimum hash in each sliding window. Sequential per
    document → Arrow-batched pandas UDF; returns array<bigint>."""
    from pyspark.sql.types import ArrayType, LongType

    @F.pandas_udf(ArrayType(LongType()))
    def _winnow(texts: pd.Series) -> pd.Series:
        B, M = 131, (1 << 61) - 1

        def fp(text: str) -> list[int]:
            s = " ".join(text.lower().split())
            if len(s) < k:
                return []
            h = 0
            top = pow(B, k - 1, M)
            hashes = []
            for i, ch in enumerate(s):
                h = (h * B + ord(ch)) % M
                if i >= k:
                    h = (h - ord(s[i - k]) * top * B) % M
                if i >= k - 1:
                    hashes.append(h)
            out = sorted({min(hashes[i : i + window]) for i in range(max(1, len(hashes) - window + 1))})
            return out

        return texts.map(fp)

    return _winnow(_as_col(c))


# PII redaction (training-data hygiene). Regexes restricted to syntax valid
# in both Java regex (Spark) and RE2 (DuckDB oracle): no backrefs, no
# lookaround — so the oracle replays the exact transformation.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9 ()\-]{6,}[0-9]"


def count_emails(c: str | Column) -> Column:
    return F.size(F.regexp_extract_all(_as_col(c), F.lit(EMAIL_RE), 0)).cast("long")


def count_phones(c: str | Column) -> Column:
    return F.size(F.regexp_extract_all(_as_col(c), F.lit(PHONE_RE), 0)).cast("long")


def redact_pii(c: str | Column) -> Column:
    """Replace emails then phone-shaped digit runs with typed placeholders.

    Order matters (and is part of the operator contract): emails first so
    their digits can't be half-eaten by the phone pattern. One JVM-side
    regexp_replace chain — no UDF, codegen-friendly, linear per row."""
    no_email = F.regexp_replace(_as_col(c), EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(no_email, PHONE_RE, "<PHONE>")
