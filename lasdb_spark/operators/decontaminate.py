"""Benchmark decontamination: strip training docs that overlap an
evaluation set.

The standard pretraining-hygiene pass (the reference corpus pipelines
behind public LLM datasets run exactly this shape): shingle both the
corpus and the benchmark suite into word n-grams, and any training doc
sharing at least ``min_hits`` distinct shingles with ANY benchmark doc
is contaminated — report it, or drop it from the corpus.

Scale (100 TB): the benchmark side is an EVAL SET — fixed small size
(KBs–MBs of text, by definition not growing with corpus SF), so its
distinct-shingle set broadcasts unconditionally and the corpus-side
probe is a map-side hash semi-join that fuses into the scan; the only
shuffle is the per-doc hit-count aggregation on doc_id (map-side
partials). No all-pairs comparison ever materializes, unlike a naive
doc×benchmark join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import SHINGLE_N, shingles, shingles_sql

#: a doc is contaminated when it shares at least this many distinct
#: n-gram shingles with the benchmark set
MIN_HITS = 1


def contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = SHINGLE_N,
    min_hits: int = MIN_HITS,
) -> DataFrame:
    """(doc_id, n_hits) — corpus docs sharing ≥ min_hits distinct
    n-gram shingles with the benchmark set, with the overlap size.

    ``benchmark`` needs a (doc_id, text) shape (extra columns are
    ignored by the shingler)."""
    bench_sh = shingles(benchmark, n).select("shingle").distinct()
    hits = (
        shingles(docs, n)
        .join(F.broadcast(bench_sh), "shingle")  # eval set: fixed-size
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return hits.filter(F.col("n_hits") >= min_hits)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = SHINGLE_N,
    min_hits: int = MIN_HITS,
) -> DataFrame:
    """The clean corpus: ``docs`` minus contaminated rows (all input
    columns preserved). One broadcast probe + one anti-join on
    doc_id."""
    bad = contamination_report(docs, benchmark, n, min_hits).select("doc_id")
    return docs.join(bad, "doc_id", "left_anti")


#: driver-contract benchmark definition: a deterministic slice of the
#: documents table stands in for the eval suite (every 97th doc)
BENCH_MOD = 97


def driver_benchmark(docs: DataFrame) -> DataFrame:
    return docs.filter(F.col("doc_id") % BENCH_MOD == 0)


def contamination_report_sql(
    n: int = SHINGLE_N, min_hits: int = MIN_HITS, bench_mod: int = BENCH_MOD
) -> str:
    """Oracle twin over the same deterministic benchmark slice."""
    return f"""
WITH sh AS ({shingles_sql(n)}),
bench AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id % {bench_mod} = 0),
hits AS (
  SELECT s.doc_id, count(*) AS n_hits
  FROM sh s JOIN bench b ON s.shingle = b.shingle
  GROUP BY 1)
SELECT doc_id, n_hits FROM hits WHERE n_hits >= {min_hits}
""".strip()


def fuzzy_contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    tau: float | None = None,
) -> DataFrame:
    """(doc_id, n_bench_hits, max_jac) — NEAR-duplicate contamination:
    training docs whose n-gram Jaccard against some benchmark doc is ≥
    ``tau``, even with no shared full shingle run requirement. The
    fuzzy companion of :func:`contamination_report` (exact shingle
    hits miss a lightly-paraphrased eval item; τ-Jaccard catches it —
    the GPT-3-style 13-gram screen's fuzzy upgrade).

    Scale shape — NOT the both-large cross-corpus pipeline: the eval
    set is fixed-size, so its MinHash band keys AND its shingle set
    broadcast, the corpus probes both MAP-SIDE (band join → candidate
    (doc, bench) pairs; shingle join → exact intersection counts), and
    the only shuffles are the corpus-side signature/size aggregations
    on doc_id. Candidate semantics and the Jaccard arithmetic are
    byte-identical to :func:`~.dedup.minhash_lsh_pairs` (same
    permutations, band keys, round-6 verify), so the cross-corpus
    banded oracle reproduces the result exactly."""
    from ..functions.hashing import md5_int60_col, minhash_perm_coeffs
    from .dedup import (
        BAND_SIZE,
        JACCARD_TAU,
        MERSENNE31,
        N_PERMS,
        shingles,
    )

    if tau is None:
        tau = JACCARD_TAU
    coeffs = minhash_perm_coeffs(N_PERMS)
    n_bands = N_PERMS // BAND_SIZE

    def _sig(sh):
        sid = sh.withColumn(
            "sid", md5_int60_col(F.col("shingle")) % MERSENNE31
        )
        return sid.groupBy("doc_id").agg(
            *[
                F.min(
                    (F.lit(a) * F.col("sid") + F.lit(b)) % MERSENNE31
                ).alias(f"mh{j}")
                for j, (a, b) in enumerate(coeffs)
            ],
            F.count(F.lit(1)).alias("n_sh"),
        )

    def _bands(sig):
        band_cols = [
            F.concat_ws(
                "-",
                *[
                    F.col(f"mh{b * BAND_SIZE + k}").cast("string")
                    for k in range(BAND_SIZE)
                ],
            )
            for b in range(n_bands)
        ]
        return sig.select(
            "doc_id", F.posexplode(F.array(*band_cols)).alias("band", "sig")
        )

    bench_sh = shingles(benchmark).localCheckpoint()  # eval-sized
    bench_sig = _sig(bench_sh).localCheckpoint()
    corpus_sh = shingles(docs).cache()
    corpus_sig = _sig(corpus_sh).cache()
    cands = (
        _bands(corpus_sig)
        .join(
            F.broadcast(
                _bands(bench_sig).withColumnsRenamed({"doc_id": "b_id"})
            ),
            ["band", "sig"],
        )
        .select("doc_id", "b_id")
        .distinct()
    )
    inter = (
        cands.join(corpus_sh, "doc_id")
        .join(
            F.broadcast(
                bench_sh.withColumnsRenamed({"doc_id": "b_id"})
            ),
            ["b_id", "shingle"],
        )
        .groupBy("doc_id", "b_id")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jac = F.col("n_inter") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    ).cast("double")
    pairs = (
        inter.join(corpus_sig.select("doc_id", F.col("n_sh").alias("n_a")), "doc_id")
        .join(
            F.broadcast(
                bench_sig.select(
                    F.col("doc_id").alias("b_id"), F.col("n_sh").alias("n_b")
                )
            ),
            "b_id",
        )
        .select("doc_id", "b_id", F.round(jac, 6).alias("jac"))
        .filter(F.col("jac") >= tau)
    )
    return pairs.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bench_hits"),
        F.max("jac").alias("max_jac"),
    )


def fuzzy_decontaminate(
    docs: DataFrame, benchmark: DataFrame, tau: float | None = None
) -> DataFrame:
    """The clean corpus under the fuzzy criterion: ``docs`` minus
    τ-near-duplicates of benchmark docs (all input columns kept)."""
    bad = fuzzy_contamination_report(docs, benchmark, tau).select("doc_id")
    return docs.join(bad, "doc_id", "left_anti")


def fuzzy_contamination_report_sql(
    tau: float | None = None, bench_mod: int = BENCH_MOD
) -> str:
    """Oracle twin: the cross-corpus banded pipeline (identical
    candidate semantics — the broadcast probe is a plan choice, not a
    semantics choice) over (documents, the benchmark slice), then the
    per-doc aggregation."""
    from .dedup import JACCARD_TAU, crosscorpus_neardup_pairs_sql

    if tau is None:
        tau = JACCARD_TAU
    cross = crosscorpus_neardup_pairs_sql(
        tau,
        src_a="SELECT doc_id, text FROM documents",
        src_b=(
            "SELECT doc_id, text FROM documents "
            f"WHERE doc_id % {bench_mod} = 0"
        ),
    )
    return f"""
WITH cross_pairs AS ({cross})
SELECT a_id AS doc_id, CAST(count(*) AS BIGINT) AS n_bench_hits,
       max(jac) AS max_jac
FROM cross_pairs GROUP BY 1
""".strip()
