"""Text analysis for training-data pipelines: token stats, quality
scores, language ID, fingerprinting.

All hot-path logic is native Spark SQL functions (regexp/md5/length —
JVM-side, codegen). Each operator has an oracle-SQL twin generated from
the SAME constants so DuckDB computes identical values.

Scale: every operator here is embarrassingly parallel per-row — no
shuffle, no UDF, safe at 100 TB with pure map-side execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_RE = r"\S+"
PUNCT_RE = r"[.,;:!?]"
STOPWORDS_EN = "the|a|of|and|is"

# language marker-word alternations (content-based heuristic; the
# corpus's `lang` column is a label, not ground truth of the content)
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|a|of|and|is)\b",
    "de": r"\b(der|die|das|und|ist)\b",
    "es": r"\b(el|los|las|y|es)\b",
    "fr": r"\b(le|les|et|est|une)\b",
    "zh": r"[一-鿿]",
}
LANG_ORDER = ("en", "de", "es", "fr", "zh")  # deterministic tie-break


def _n_matches(col, pattern: str):
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------
def token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars_nospace, n_punct) — whitespace tokenizer
    + punctuation census, all regexp built-ins."""
    t = F.col("text")
    return docs.select(
        "doc_id",
        _n_matches(t, TOKEN_RE).alias("n_tokens"),
        F.length(F.regexp_replace(t, r"\s", "")).alias("n_chars_nospace"),
        _n_matches(t, PUNCT_RE).alias("n_punct"),
    )


def token_stats_sql() -> str:
    return f"""
SELECT doc_id,
  len(regexp_extract_all(text, '{TOKEN_RE}')) AS n_tokens,
  length(regexp_replace(text, '\\s', '', 'g')) AS n_chars_nospace,
  len(regexp_extract_all(text, '{PUNCT_RE}')) AS n_punct
FROM documents
""".strip()


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------
def quality_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, stop_ratio, quality) — length + stopword-ratio
    heuristic, deterministic arithmetic (round 6)."""
    t = F.col("text")
    n_tok = _n_matches(t, TOKEN_RE)
    n_stop = _n_matches(t, rf"\b({STOPWORDS_EN})\b")
    stop_ratio = n_stop / F.greatest(n_tok, F.lit(1)).cast("double")
    quality = F.round(
        F.least(n_tok, F.lit(100)) / 100.0 * 0.6 + stop_ratio * 0.4, 6
    )
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        quality.alias("quality"),
    )


def quality_scores_sql() -> str:
    n_tok = f"len(regexp_extract_all(text, '{TOKEN_RE}'))"
    n_stop = f"len(regexp_extract_all(text, '\\b({STOPWORDS_EN})\\b'))"
    stop_ratio = f"({n_stop} / CAST(greatest({n_tok}, 1) AS DOUBLE))"
    return f"""
SELECT doc_id,
  {n_tok} AS n_tokens,
  round({stop_ratio}, 6) AS stop_ratio,
  round(least({n_tok}, 100) / 100.0 * 0.6 + {stop_ratio} * 0.4, 6) AS quality
FROM documents
""".strip()


# ---------------------------------------------------------------------------
# language identification (marker-word n-gram heuristic)
# ---------------------------------------------------------------------------
def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, lang_pred) — argmax of per-language marker counts with a
    fixed priority tie-break; 'und' when nothing matches."""
    t = F.col("text")
    scores = {lg: _n_matches(t, pat) for lg, pat in LANG_MARKERS.items()}
    pred = F.lit("und")
    # build the CASE chain in reverse so earlier langs win ties
    for lg in reversed(LANG_ORDER):
        cond = (scores[lg] > 0) & F.lit(True)
        for other in LANG_ORDER:
            if other != lg:
                cond = cond & (scores[lg] >= scores[other])
        pred = F.when(cond, F.lit(lg)).otherwise(pred)
    return docs.select("doc_id", pred.alias("lang_pred"))


def lang_id_sql() -> str:
    score = {
        lg: f"len(regexp_extract_all(text, '{pat}'))"
        for lg, pat in LANG_MARKERS.items()
    }
    whens = []
    for lg in LANG_ORDER:
        conds = [f"{score[lg]} > 0"] + [
            f"{score[lg]} >= {score[o]}" for o in LANG_ORDER if o != lg
        ]
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lg}'")
    return (
        "SELECT doc_id, CASE "
        + " ".join(whens)
        + " ELSE 'und' END AS lang_pred FROM documents"
    )


# ---------------------------------------------------------------------------
# corpus-level token frequency
# ---------------------------------------------------------------------------
def top_tokens(docs: DataFrame, k: int = 50) -> DataFrame:
    """(tok, n, rank) — the k most frequent tokens corpus-wide.

    Skew note: hot tokens (stopwords) are exactly the skewed keys that
    hurt naive groupBys; Spark's map-side partial aggregation collapses
    each partition's counts before the shuffle, so the reducer for
    'the' receives one partial row per partition, not one per
    occurrence. Ties broken lexically for determinism."""
    toks = docs.select(
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), F.lit(0))
        ).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql.window import Window

    # TakeOrderedAndProject (per-partition heaps, driver merge of k) —
    # NOT a partition-less window over the full vocabulary, which would
    # funnel every distinct token through one task at scale. The rank
    # window below only sees the k surviving rows.
    top = counts.orderBy(F.col("n").desc(), "tok").limit(k)
    w = F.row_number().over(Window.orderBy(F.col("n").desc(), F.col("tok")))
    return top.withColumn("rank", w.cast("int"))


def top_tokens_sql(k: int = 50) -> str:
    return f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(text, '{TOKEN_RE}')) AS tok FROM documents),
counts AS (SELECT tok, count(*) AS n FROM toks GROUP BY 1)
SELECT tok, n, rank FROM (
  SELECT tok, n,
         CAST(row_number() OVER (ORDER BY n DESC, tok) AS INT) AS rank
  FROM counts) WHERE rank <= {k}
""".strip()


# ---------------------------------------------------------------------------
# document fingerprinting
# ---------------------------------------------------------------------------
def fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fp) — md5 of whitespace-normalized lowercase text.
    Standard MD5 → identical hex in any engine."""
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return docs.select("doc_id", F.md5(norm).alias("fp"))


def fingerprints_sql() -> str:
    return (
        "SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp "
        "FROM documents"
    )
