"""Text-analysis operators for LLM training-data pipelines
(driver-mandated extension surface, SURVEY.md §2.13).

All hot-path expressions are built-in column functions (JVM-side,
whole-stage-codegen'd) — no Python UDFs. Each operator is a narrow
transform over the ``documents`` table: no shuffle, scales linearly
with input splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from aws_etl_pipeline_financial_streamlit_dashboard_spark.functions.scalars import round_half_up as rhu

# Marker stopwords per language for the heuristic language classifier.
# Scores are plain token-frequency ratios — deterministic and exactly
# replicable in the DuckDB oracle (catalog_ext.x05_lang_id).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "fr": ("le", "la", "et", "les"),
    "es": ("el", "los", "y", "las"),
    "de": ("der", "die", "und", "das"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (split on runs of whitespace)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count; empty text counts as 0."""
    toks = tokens(text)
    return F.when(F.trim(text) == "", F.lit(0)).otherwise(F.size(toks))


def sql_token_count_duck(col: str) -> str:
    """DuckDB oracle twin of :func:`token_count` — THE single SQL
    rendering of the whitespace tokenization rule (x73/x75 oracles
    inline it; keeping one definition prevents the rule drifting
    between entries)."""
    return (
        f"CASE WHEN TRIM({col}) = '' THEN 0"
        f" ELSE LEN(regexp_split_to_array(TRIM({col}), '\\s+'))"
        f" END"
    )


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish token estimate: split on word/non-word boundaries the way
    byte-pair tokenizers fragment text (letters+digits runs vs punct),
    via a single regexp count — a cheap, deterministic proxy for LLM
    token budgeting at corpus scale."""
    # count maximal runs of word chars plus individual non-space,
    # non-word chars.
    words = F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z0-9]+"), 0))
    punct = F.size(F.regexp_extract_all(text, F.lit(r"[^A-Za-z0-9\s]"), 0))
    return words + punct


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality scoring: length, token stats, punctuation and
    stopword ratios (the standard pre-training corpus filters). Adds:

    - ``n_chars``: character length
    - ``n_tokens``: whitespace token count
    - ``avg_token_len``: mean token length
    - ``punct_ratio``: non-alnum-non-space chars / chars
    - ``stopword_ratio``: english-marker tokens / tokens
    - ``quality_score``: composite in [0,1]
    """
    text = F.col(text_col)
    n_chars = F.length(text)
    n_tokens = token_count(text)
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    n_stop = _marker_hits(text, LANG_MARKERS["en"])
    nz = lambda c: F.nullif(c.cast("double"), F.lit(0.0))  # noqa: E731
    return df.withColumns(
        {
            "n_chars": n_chars.cast("bigint"),
            "n_tokens": n_tokens.cast("bigint"),
            "avg_token_len": rhu((n_chars - (n_tokens - 1)) / nz(n_tokens), 6),
            "punct_ratio": rhu(punct / nz(n_chars), 6),
            "stopword_ratio": rhu(n_stop / nz(n_tokens), 6),
        }
    )


def _marker_hits(text: Column, markers: list[str]) -> Column:
    """Count whitespace tokens of ``text`` exactly equal to one of
    ``markers`` — as ONE codegen'd ``regexp_count`` over the
    whitespace-normalized, space-padded text instead of an interpreted
    ``F.filter(tokens, rlike)`` walk (HOF lambdas run interpreted, and
    this was the last per-token interpreted loop in the text family).

    Count-equivalence: tokens are the maximal non-space runs of the
    \\s+-normalized text, so a token equals a marker iff the padded
    string contains the marker between two spaces; the lookarounds are
    zero-width, so adjacent marker tokens sharing one separator space
    both count. NULL text → NULL, same as the HOF form."""
    padded = F.concat(
        F.lit(" "), F.regexp_replace(F.trim(text), r"\s+", " "), F.lit(" ")
    )
    pat = "(?<= )(" + "|".join(markers) + ")(?= )"
    return F.regexp_count(padded, F.lit(pat))


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language marker-token ratio (hits / tokens)."""
    toks = tokens(text)
    n = F.nullif(F.size(toks).cast("double"), F.lit(0.0))
    return {
        lang: _marker_hits(text, markers) / n
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of marker-stopword ratios, 'und'
    (undetermined) when every score is 0/NULL. Deterministic tie-break:
    lexicographically smallest language code wins a tie, so the DuckDB
    oracle can reproduce the argmax exactly."""
    scores = lang_scores(F.col(text_col))
    # Build argmax via a sorted struct array: (-score, lang) min == argmax.
    pairs = F.array(
        *[
            F.struct(
                (-F.coalesce(s, F.lit(0.0))).alias("neg"), F.lit(lang).alias("lang")
            )
            for lang, s in sorted(scores.items())
        ]
    )
    best = F.array_min(pairs)
    pred = F.when(best["neg"] >= 0.0, F.lit("und")).otherwise(best["lang"])
    out = df.withColumn("pred_lang", pred)
    for lang, s in scores.items():
        out = out.withColumn(f"score_{lang}", rhu(F.coalesce(s, F.lit(0.0)), 6))
    return out


def fingerprint_md5(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact-content fingerprint: md5 of the raw text (doc identity key
    for exact dedup across shards)."""
    return df.withColumn("fingerprint", F.md5(F.col(text_col)))


def rolling_hash_fingerprint(
    df: DataFrame, text_col: str = "text", window: int = 5, keep: int = 8
) -> DataFrame:
    """Winnowing-style document fingerprint: xxhash64 each ``window``-gram
    shingle, keep the ``keep`` smallest hashes as the signature
    (Schleimer et al., SIGMOD'03 winnowing family). Near-identical docs
    share most signature elements; used as a cheap near-dup blocking
    key. Engine-specific hash → rows-only oracle check."""
    toks = tokens(F.col(text_col))
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - window, F.lit(0)))
    shingles = F.transform(
        idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, window)))
    )
    signature = F.slice(F.array_sort(F.array_distinct(shingles)), 1, keep)
    return df.withColumn("signature", signature)
