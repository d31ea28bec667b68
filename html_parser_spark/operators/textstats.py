"""Text-analysis operators for large-scale training-data pipelines.

All JVM-side (`pyspark.sql.functions` only — no Python UDFs): these
run inside whole-stage codegen, so at 100 TB the cost is one columnar
scan + narrow projections; no shuffle, no Python worker round-trip.

These complement the HTML extraction surface (SURVEY.md §2.5): in a
training-data pipeline the extracted text flows straight into
language-ID, quality scoring, token counting and fingerprinting
without leaving the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: regex used for both Spark and the DuckDB oracle — BPE-ish token
#: classes: alpha runs, digit runs, single punctuation marks.
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]"

#: tiny English stopword list for the n-gram/stopword language
#: heuristic (public knowledge; any fixed list works — the point is a
#: deterministic, shuffle-free classifier).
EN_STOPWORDS = (
    "the", "a", "of", "and", "to", "in", "is", "it", "that", "for",
    "on", "with", "as", "was", "at", "by", "an", "be", "this", "are",
)


def words_col(text: Column) -> Column:
    """Whitespace tokenization shared by every operator here."""
    return F.split(F.trim(text), r"\s+")


def token_stats(df: DataFrame, key_cols: list[str],
                text_col: str = "text") -> DataFrame:
    """Per-row token counting: chars, whitespace words, regex tokens.

    Counterpart of the reference's text-event accounting
    (`/root/reference/hparser.c:1631-1679` emits text spans; here we
    measure them) extended with training-pipeline token counts.
    """
    t = F.col(text_col)
    w = words_col(t)
    return df.select(
        *key_cols,
        F.length(t).alias("n_chars"),
        F.size(w).alias("n_words"),
        F.size(F.regexp_extract_all(t, F.lit(TOKEN_RE), 0)).alias("n_tokens"),
    )


def quality_score(df: DataFrame, key_cols: list[str],
                  text_col: str = "text") -> DataFrame:
    """Heuristic document-quality features: length, word stats, alpha
    ratio, stopword ratio — the standard cheap pre-filters applied
    before expensive dedup/model scoring at corpus scale."""
    t = F.col(text_col)
    w = words_col(t)
    n_chars = F.length(t)
    n_words = F.size(w)
    n_alpha = F.length(F.regexp_replace(t, "[^A-Za-z]", ""))
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x)))
    return df.select(
        *key_cols,
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        F.round(n_chars.cast("double") / n_words, 3).alias("avg_word_len"),
        F.round(n_alpha.cast("double") / n_chars, 3).alias("alpha_ratio"),
        F.round(n_stop.cast("double") / n_words, 3).alias("stopword_ratio"),
    )


def lang_id(df: DataFrame, key_cols: list[str],
            text_col: str = "text",
            threshold: float = 0.08) -> DataFrame:
    """Stopword-ratio language ID: 'en' if the English stopword share
    of whitespace words clears ``threshold``, else 'other'.

    A real deployment swaps the word list per language; the operator
    shape (one narrow projection, no shuffle) is what matters at
    100 TB.
    """
    w = words_col(F.col(text_col))
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    ratio = (F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x)))
             .cast("double") / F.size(w))
    return df.select(
        *key_cols,
        F.round(ratio, 3).alias("stopword_ratio"),
        F.when(ratio >= threshold, F.lit("en")).otherwise("other")
        .alias("lang_pred"),
    )


def normalize_text(df: DataFrame, key_cols: list[str],
                   text_col: str = "text",
                   form: str = "NFC") -> DataFrame:
    """Unicode normalization + whitespace/case canonicalization — the
    standard pre-dedup text canonicalizer.

    Unicode normalization has no JVM built-in, so this is one of the
    few legitimately Pandas-UDF-backed operators (Arrow-batched,
    SURVEY.md §2.6); the ws/case steps stay in JVM expressions.
    """
    import unicodedata

    @F.pandas_udf("string")
    def _norm(s):
        return s.map(lambda x: unicodedata.normalize(form, x)
                     if isinstance(x, str) else x)

    canon = F.lower(F.trim(F.regexp_replace(
        _norm(F.col(text_col)), r"\s+", " ")))
    return df.select(*key_cols, canon.alias("norm_text"))


def fingerprint(df: DataFrame, key_cols: list[str],
                text_col: str = "text") -> DataFrame:
    """Canonical document fingerprint: md5 over the whitespace- and
    case-normalized text. The normalization makes near-identical
    crawls (whitespace/case-only diffs) collide, so the fingerprint
    doubles as a cheap fuzzy-dedup key."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return df.select(
        *key_cols,
        F.md5(norm.cast("binary")).alias("fingerprint"),
    )
