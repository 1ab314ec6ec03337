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
