"""Text-analysis operators for the training-data pipeline layer.

These extend the keyword-validation vocabulary (SURVEY §2.2) with the
corpus-hygiene checks a 100 TB text pipeline needs: token counting,
quality scoring, language identification, and document fingerprinting.
All are pure Catalyst ``Column`` pipelines — one narrow projection per
operator, zero Python in the hot path, so at scale each is scan-bound
like the row-rule layer (``operators/row_checks.py``).

Cross-engine determinism: every hash is md5-based (``functions/text``)
so the DuckDB oracle in ``__spark_entry__.py`` reproduces values exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from json_validator_spark.functions.text import (
    BPE_ISH_REGEX,
    STOPWORDS,
    seq1,
    tokens,
)


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token accounting: whitespace tokens, BPE-ish lexer
    tokens, and distinct-token ratio. ``(doc_id, n_ws_tokens,
    n_bpe_tokens, n_distinct_tokens)``."""
    toks = tokens(F.col(text_col))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_REGEX), 0)).alias(
            "n_bpe_tokens"
        ),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    )


def _ratio(num: Column, den: Column) -> Column:
    return F.round(num / F.greatest(den, F.lit(1)).cast("double"), 6)


def quality_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 10,
    max_dup_ratio: float = 0.6,
) -> DataFrame:
    """Heuristic document quality — the length / punctuation / stopword /
    repetition signals common to pretraining-data filters. Emits the raw
    signals plus a ``keep`` verdict so the thresholds stay auditable:
    ``(doc_id, n_tokens, stopword_ratio, alnum_ratio, dup_token_ratio,
    mean_token_len, keep)``."""
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    all_stop = [w for ws in STOPWORDS.values() for w in ws]
    n_stop = F.size(F.filter(toks, lambda t: t.isin(all_stop)))
    n_chars = F.length(F.col(text_col))
    n_alnum = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z0-9]", ""))
    n_distinct = F.size(F.array_distinct(toks))
    dup_ratio = _ratio(n_tok - n_distinct, n_tok)
    mean_len = _ratio(F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)), n_tok)
    keep = (n_tok >= min_tokens) & (dup_ratio <= max_dup_ratio)
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_tok.alias("n_tokens"),
        _ratio(n_stop, n_tok).alias("stopword_ratio"),
        _ratio(n_alnum, n_chars).alias("alnum_ratio"),
        dup_ratio.alias("dup_token_ratio"),
        mean_len.alias("mean_token_len"),
        keep.alias("keep"),
    )


def language_id(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    claimed_col: str | None = None,
) -> DataFrame:
    """Stopword-profile language ID. For each configured language, score =
    count of profile-stopword hits; predicted = argmax (ties broken by
    fixed language order, 'und' when all scores are 0). When
    ``claimed_col`` is given, also emit ``lang_match`` — the
    claimed-vs-predicted consistency check a labeled corpus wants."""
    toks = tokens(F.col(text_col))
    scores = {
        lang: F.size(F.filter(toks, lambda t: t.isin(list(ws))))
        for lang, ws in STOPWORDS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    # reversed so the FIRST language in STOPWORDS wins ties
    for lang in reversed(list(scores)):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    cols = [
        F.col(id_col).alias("doc_id"),
        pred.alias("pred_lang"),
        best.alias("best_score"),
    ]
    if claimed_col is not None:
        cols.append((F.col(claimed_col) == pred).alias("lang_match"))
    return df.select(*cols)


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    window: int = 8,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    hash every k-char gram, keep the minimum hash of each sliding window
    of ``window`` grams, deduplicate. Output: ``(doc_id, fingerprint)``,
    one row per selected gram — the compact signature used for
    plagiarism-style containment detection.

    Shape: explode gram positions (one md5 per gram — computed ONCE) →
    sliding window-min via a rows-window frame partitioned by doc →
    distinct. An in-array fold would re-hash the whole gram array per
    window under Catalyst's lambda evaluation (O(len²) md5 calls per
    document — measured; see ``minhash_signatures``); the window
    function is O(len) and the per-doc partition shuffle is the natural
    distribution unit."""
    from pyspark.sql import Window

    t = F.lower(F.col(text_col))
    # k-char grams as a narrow array (cheap char slices, no hashing yet)
    gram_arr = F.transform(seq1(F.length(t) - (k - 1)), lambda i: t.substr(i, F.lit(k)))
    grams = df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(gram_arr).alias("i", "g")
    ).select("doc_id", "i", F.substring(F.md5("g"), 1, 16).alias("gh"))
    w = Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, window - 1)
    n_w = Window.partitionBy("doc_id")
    return (
        grams.withColumn("wmin", F.min("gh").over(w))
        .withColumn("n_grams", F.count(F.lit(1)).over(n_w))
        # only full windows: 0-based positions 0 .. n_grams-window
        .filter(F.col("i") <= F.col("n_grams") - window)
        .select("doc_id", F.col("wmin").alias("fingerprint"))
        .distinct()
    )
