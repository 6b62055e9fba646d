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


def let_tokens(col: Column, body) -> Column:
    """Let-bind the tokenizer output: evaluate ``tokens(col)`` ONCE and feed
    the bound array to ``body(toks)``.

    Catalyst does no common-subexpression elimination across higher-order-
    function lambda boundaries (HOFs are CodegenFallback), so an expression
    that references ``tokens(col)`` k times re-runs the regex split k times
    per row — measured r11: quality_score paid ~3x one tokenization and
    lang_id ~8x. Wrapping the consumers in a one-element-array transform
    (the same trick as dedup.word_shingles) makes the split a single
    evaluation at identical arithmetic, so oracle parity is unaffected."""
    return F.get(F.transform(F.array(tokens(col)), body), 0)


def token_count(col: Column) -> Column:
    """Word-token count (regex tokenizer)."""
    return F.size(tokens(col)).cast("long")


def whitespace_token_count(col: Column) -> Column:
    """Whitespace-split token count (the cheap pretokenizer baseline)."""
    return F.size(F.split(F.trim(col), "\\s+")).cast("long")


def char_count(col: Column) -> Column:
    return F.length(col).cast("long")


def _stopword_ratio_of(toks: Column) -> Column:
    hits = F.size(F.filter(toks, lambda t: t.isin(EN_STOPWORDS)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def _mean_token_length_of(toks: Column) -> Column:
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def stopword_ratio(col: Column) -> Column:
    return let_tokens(col, _stopword_ratio_of)


def mean_token_length(col: Column) -> Column:
    return let_tokens(col, _mean_token_length_of)


def quality_score_of(toks: Column) -> Column:
    """quality_score over an already-bound token array (see let_tokens)."""
    n = F.size(toks)
    stop = _stopword_ratio_of(toks)
    meanlen = _mean_token_length_of(toks)
    score = (
        F.least(stop * 5.0, F.lit(1.0)) * 0.4
        + F.least(n / 100.0, F.lit(1.0)) * 0.3
        + F.least(meanlen / 8.0, F.lit(1.0)) * 0.3
    )
    return F.round(score, 4)


def quality_score(col: Column) -> Column:
    """Deterministic [0,1] quality heuristic: stopword density + length +
    lexical shape (the usual cheap pre-filter before expensive model scoring).
    One tokenization per row (let-bound; was ~3x before r11)."""
    return let_tokens(col, quality_score_of)


def _lang_score_of(toks: Column, lang: str) -> Column:
    markers = LANG_MARKERS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(markers))).cast("long")


def lang_score(col: Column, lang: str) -> Column:
    return let_tokens(col, lambda toks: _lang_score_of(toks, lang))


def lang_id(col: Column) -> Column:
    """Marker-vote language ID; ties resolve by LANG_PRIORITY; all-zero →
    'und'. One tokenization per row (let-bound; the 5-language vote paid
    ~8x before r11)."""

    def vote(toks: Column) -> Column:
        scores = {lang: _lang_score_of(toks, lang) for lang in LANG_PRIORITY}
        best = F.greatest(*scores.values())
        expr = None
        for lang in LANG_PRIORITY:
            cond = scores[lang] == best
            expr = (
                F.when(cond, F.lit(lang))
                if expr is None
                else expr.when(cond, F.lit(lang))
            )
        return F.when(best == 0, F.lit("und")).otherwise(expr)

    return let_tokens(col, vote)


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
    an empty list is NULL there, caught by the differential fuzzer).
    One tokenization per row (let-bound; was 2x before r11)."""

    def fp(toks: Column) -> Column:
        canon = F.array_join(F.array_sort(F.array_distinct(toks)), " ")
        return F.when(F.size(toks) > 0, F.md5(canon))

    return let_tokens(col, fp)
