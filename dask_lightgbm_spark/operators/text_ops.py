"""Text-analysis operators for training-data pipelines: token stats,
quality scoring, language-ID heuristic, document fingerprinting.

All pure built-in-function compositions (JVM-side, whole-stage codegen) —
per-document row-parallel, no shuffle except final aggregations, so they
scale linearly with data volume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text: Column) -> Column:
    # explicit whitespace class, NOT \s: Java's \s matches \x0B (vertical
    # tab) while DuckDB/RE2's does not, so \s-tokenization silently breaks
    # cross-engine bit-parity on any document containing \x0B
    return F.filter(F.split(F.trim(text), r"[ \t\n\f\r]+"), lambda x: x != "")


def token_count(text: Column) -> Column:
    """Whitespace token count (BPE-ish subword counting would replace the
    split pattern; the plumbing is identical)."""
    return F.size(_tokens(text)).cast("long")


def text_quality(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc quality features: length, token count, mean token length,
    whitespace ratio, stop-token ratio. Ratios are single divisions of
    exact ints → engine-portable bit-exact. try_divide: Spark 4 runs ANSI
    mode by default, so a plain `/` RAISES on zero (empty/whitespace-only
    docs) while DuckDB — and therefore the oracle — yields NULL."""
    text = F.col(text_col)
    toks = _tokens(text)
    n_chars = F.length(text).cast("long")
    n_tokens = F.size(toks).cast("long")
    n_nonspace = F.length(F.regexp_replace(text, r"\s", "")).cast("long")
    stop_toks = F.size(F.filter(toks, lambda x: x.isin("the", "a", "of", "and"))).cast("long")
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.try_divide(n_nonspace, n_tokens).alias("avg_token_len"),
        F.try_divide(n_chars - n_nonspace, n_chars).alias("space_ratio"),
        F.try_divide(stop_toks, n_tokens).alias("stop_ratio"),
    )


LANG_MARKERS: dict[str, list[str]] = {
    # Deterministic marker-token scoring. NOTE: the fixture corpus is
    # synthetic word-soup whose vocabulary does not differ by the `lang`
    # label, so this demonstrates (and oracle-checks) the *mechanics* of
    # marker-based language-ID — real deployments would plug in character
    # n-gram profiles per language; the plan shape is identical.
    "de": ["der", "die", "und", "ist"],
    "en": ["the", "a", "of", "and"],
    "es": ["el", "la", "de", "que"],
    "fr": ["le", "la", "et", "des"],
    "zh": ["de", "shi", "le", "bu"],
}


def lang_scores(text: Column) -> dict[str, Column]:
    toks = _tokens(text)

    def marker_filter(markers):
        return lambda x: x.isin(*markers)

    return {
        lang: F.size(F.filter(toks, marker_filter(markers))).cast("long")
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(
    df: DataFrame, id_col: str, text_col: str, truth_col: str | None = None
) -> DataFrame:
    """Predict language by marker-token argmax with a fixed CASE-chain
    tie-break (first lang in sorted order wins ties). ``truth_col``
    optionally carries a ground-truth label column through (for accuracy
    eval); the predictor itself needs no such column, so the operator works
    on any (id, text) table."""
    scores = lang_scores(F.col(text_col))
    langs = sorted(scores)
    # CASE chain: first lang (sorted) whose score >= all others wins
    expr = None
    for lang in langs:
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    expr = expr.otherwise(F.lit(langs[0]))
    cols = [F.col(id_col)]
    if truth_col is not None:
        cols.append(F.col(truth_col))
    return df.select(*cols, expr.alias("pred_lang"))


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Normalized-content fingerprint: md5 of lowercased,
    whitespace-collapsed text — the exact-dedup key that survives
    formatting noise."""
    # collapse runs FIRST, then trim: trim() strips only spaces, so a
    # leading/trailing tab would otherwise survive as a residual space
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"[ \t\n\f\r]+", " ")))
    return df.select(F.col(id_col), F.md5(norm).alias("fp"))
