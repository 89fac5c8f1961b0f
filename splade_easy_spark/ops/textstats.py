"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting.  All pure Catalyst expressions (regex + array
HOFs, JVM codegen) so they run at scan speed over 100 TB and are exactly
reproducible in the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from splade_easy_spark.functions.text import tokenize
from splade_easy_spark.ops.dedup import md5_hash64, word_shingles

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
# Deliberately minimal & deterministic — a real pipeline swaps in fastText;
# the Spark-side plumbing (scan-time scoring, argmax) is the deliverable.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "for", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "se", "las"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "im", "ein"],
    "fr": ["le", "la", "les", "de", "des", "et", "est", "une", "dans", "que"],
}


def token_count(text_col: Column) -> Column:
    """Analyzer token count (regex [a-z0-9]+ after lowering)."""
    return F.size(tokenize(text_col))


def whitespace_token_count(text_col: Column) -> Column:
    return F.size(F.filter(F.split(text_col, r"\s+"), lambda t: F.length(t) > 0))


def quality_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Per-doc quality features + a composite [0,1] score:
    n_chars, n_tokens, mean token length, punctuation ratio, stopword
    (en-marker) ratio, uppercase ratio.  ``passthrough`` carries extra
    input columns into the output so composed pipelines (``ops.curate``)
    chain feature stages in ONE projection instead of re-joining on id."""
    text = F.col(text_col)
    toks = tokenize(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    punct = F.length(F.regexp_replace(text, r"[^!-/:-@\[-`{-~]", ""))
    upper = F.length(F.regexp_replace(text, r"[^A-Z]", ""))
    stop = F.size(F.filter(toks, lambda t: t.isin(LANG_MARKERS["en"])))
    safe = lambda num, den: F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(F.lit(0.0))
    out = df.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        safe(F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)), n_tokens).alias("mean_tok_len"),
        safe(punct, n_chars).alias("punct_ratio"),
        safe(upper, n_chars).alias("upper_ratio"),
        safe(stop, n_tokens).alias("stopword_ratio"),
    )
    score = (
        F.least(F.col("n_tokens").cast("double") / F.lit(20.0), F.lit(1.0)) * F.lit(0.5)
        + (F.lit(1.0) - F.least(F.col("punct_ratio") * F.lit(4.0), F.lit(1.0))) * F.lit(0.25)
        + (F.lit(1.0) - F.least(F.col("upper_ratio") * F.lit(4.0), F.lit(1.0))) * F.lit(0.25)
    )
    return out.withColumn("quality", F.round(score, 6))


def language_id(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Heuristic language ID: marker-word hit ratio per language, argmax
    with 'und' (undetermined) when nothing matches.  Deterministic argmax:
    ties break by language code ascending.  ``passthrough`` as in
    ``quality_features``."""
    toks = tokenize(F.col(text_col))
    n = F.size(toks)
    langs = sorted(LANG_MARKERS)

    def score_for(ws: list[str]):
        # factory scope so the single-arg HOF lambda closes over ws correctly
        return F.when(
            n > 0,
            F.size(F.filter(toks, lambda t: t.isin(ws))).cast("double") / n.cast("double"),
        ).otherwise(F.lit(0.0))

    scores = {lang: score_for(LANG_MARKERS[lang]) for lang in langs}
    best = F.greatest(*scores.values())
    # first-match CASE chain in lang-code order = deterministic tiebreak,
    # trivially identical in the SQL oracle
    pred = F.when(best <= 0, F.lit("und"))
    for lang in langs:
        pred = pred.when(scores[lang] == best, F.lit(lang))
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        pred.alias("pred_lang"),
        F.round(best, 6).alias("lang_score"),
    )


def repetition_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1 quality
    filters), the classic crawl-garbage detectors — boilerplate nav bars,
    keyword-stuffed spam, template spew — per doc:

    - ``dup_line_frac``: 1 − distinct/total over non-empty trimmed lines
    - ``dup_word_frac``: 1 − distinct/total over analyzer tokens
    - ``dup_2gram_frac`` / ``dup_3gram_frac``: same over word n-grams

    All pure Catalyst (split / transform / array_distinct — JVM codegen,
    scan-speed over 100 TB, no shuffle) and exactly reproducible in the
    DuckDB oracle.  ``passthrough`` chains extra columns as in
    ``quality_features``.
    """
    text = F.col(text_col)
    toks = tokenize(text)
    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
        lambda l: F.length(l) > 0,
    )

    def dup_frac(arr):
        n = F.size(arr)
        return F.round(
            F.when(
                n > 0,
                F.lit(1.0) - F.size(F.array_distinct(arr)).cast("double") / n.cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        )

    return df.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        F.size(lines).alias("n_lines"),
        dup_frac(lines).alias("dup_line_frac"),
        dup_frac(toks).alias("dup_word_frac"),
        dup_frac(word_shingles(text, 2)).alias("dup_2gram_frac"),
        dup_frac(word_shingles(text, 3)).alias("dup_3gram_frac"),
    )


def fingerprint(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    keep: int = 4,
) -> DataFrame:
    """K-min-values document fingerprint (winnowing-style): the ``keep``
    smallest shingle hashes, sorted — a compact sketch whose overlap
    estimates containment."""
    hashes = F.transform(
        F.array_distinct(word_shingles(F.col(text_col), shingle_k)), lambda s: md5_hash64(s)
    )
    return df.select(
        F.col(id_col),
        F.slice(F.sort_array(hashes), 1, keep).alias("fingerprint"),
    )
