"""Text-analysis operators for large-scale training-data pipelines.

Everything here is a pure Catalyst Column expression (JVM-side, whole-stage
codegen, no Python UDFs): at 100 TB these run at scan speed with full
predicate pushdown. Each operator has a deterministic definition that a SQL
oracle (DuckDB) can replicate exactly — see __spark_entry__.

Beyond-reference surface (the reference is a graph DB with no text ops);
part of the LLM-pipeline operator family required by BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# word tokenizer: lowercase, split on non-alphanumerics, drop empties
TOKEN_SPLIT_RE = "[^a-z0-9']+"

# tiny per-language stopword marker sets (n-gram-free heuristic language ID;
# deterministic and SQL-expressible — a real pipeline would swap in fastText)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "of", "and", "to", "in", "is", "a", "that"],
    "es": ["el", "la", "de", "que", "y", "los", "se", "un"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "du"],
    "de": ["der", "die", "und", "das", "von", "mit", "den", "ein"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}
LANG_PRIORITY = ["en", "es", "fr", "de", "zh"]  # tie-break order

EN_STOPWORDS = LANG_MARKERS["en"] + ["it", "for", "on", "with", "as", "was"]


def tokens(col: Column) -> Column:
    """ARRAY<STRING> of lowercase word tokens."""
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT_RE), lambda t: t != "")


def token_count(col: Column) -> Column:
    """Word-token count (regex tokenizer)."""
    return F.size(tokens(col)).cast("long")


def whitespace_token_count(col: Column) -> Column:
    """Whitespace-split token count (the cheap pretokenizer baseline)."""
    return F.size(F.split(F.trim(col), "\\s+")).cast("long")


def char_count(col: Column) -> Column:
    return F.length(col).cast("long")


def stopword_ratio(col: Column) -> Column:
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(EN_STOPWORDS)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def mean_token_length(col: Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Deterministic [0,1] quality heuristic: stopword density + length +
    lexical shape (the usual cheap pre-filter before expensive model scoring).
    """
    toks = tokens(col)
    n = F.size(toks)
    stop = stopword_ratio(col)
    meanlen = mean_token_length(col)
    score = (
        F.least(stop * 5.0, F.lit(1.0)) * 0.4
        + F.least(n / 100.0, F.lit(1.0)) * 0.3
        + F.least(meanlen / 8.0, F.lit(1.0)) * 0.3
    )
    return F.round(score, 4)


def lang_score(col: Column, lang: str) -> Column:
    markers = LANG_MARKERS[lang]
    return F.size(F.filter(tokens(col), lambda t: t.isin(markers))).cast("long")


def lang_id(col: Column) -> Column:
    """Marker-vote language ID; ties resolve by LANG_PRIORITY; all-zero →
    'und'."""
    scores = {lang: lang_score(col, lang) for lang in LANG_PRIORITY}
    best = F.greatest(*scores.values())
    expr = None
    for lang in LANG_PRIORITY:
        cond = scores[lang] == best
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return F.when(best == 0, F.lit("und")).otherwise(expr)


def repetition_ratio(col: Column, n: int = 2) -> Column:
    """Duplicate word-n-gram fraction, 1 - distinct/total (the Gopher-style
    repetition signal used to drop boilerplate/looping text). 0.0 for
    documents with fewer than n tokens. Pure Column expressions — scan
    speed at 100 TB, SQL-reproducible for the oracle."""

    def ratio(toks: Column) -> Column:
        cnt = F.size(toks) - (n - 1)
        idx = F.sequence(F.lit(1), F.greatest(cnt, F.lit(1)))
        grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
        distinct = F.size(F.array_distinct(grams))
        return F.when(
            cnt > 0, F.round(1.0 - distinct / cnt, 6)
        ).otherwise(F.lit(0.0))

    # let-bind the tokenizer (see dedup.word_shingles: inlining re-runs the
    # regex split per gram position)
    return F.get(F.transform(F.array(tokens(col)), ratio), 0)


def fingerprint(col: Column) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token set (near-dup-robust to shuffling/whitespace/case). NULL for a
    token-less document (also DuckDB's natural result — array_to_string of
    an empty list is NULL there, caught by the differential fuzzer)."""
    toks = tokens(col)
    canon = F.array_join(F.array_sort(F.array_distinct(toks)), " ")
    return F.when(F.size(toks) > 0, F.md5(canon))
