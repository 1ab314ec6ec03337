"""Persistent MinHash dedup index — build-once / probe-many (r8).

Every in-plan fuzzy-dedup entry recomputes the corpus's shingles and
signatures inside the query; that is right for a one-shot sweep and
wrong for the ingestion loop a training pipeline actually runs: the
training corpus is INDEXED once, and every new crawl increment probes
the stored index for near-duplicates before it is admitted. This
module is that contract — the dedup cousin of
:mod:`lasdb_spark.operators.ann_index` (same meta-written-last,
encode-only-append discipline; the reference draws the same
index-persisted line for its B-tree,
``/root/reference/db/__init__.py:118-126``).

:func:`build_dedup_index` persists three Parquet tables::

    {path}/buckets/   (band, sig, doc_id)   banded MinHash keys
    {path}/shingles/  (doc_id, sh)          md5-hex shingle ids
    {path}/sizes/     (doc_id, n_sh)        distinct-shingle counts
    {path}/meta.json                        build parameters (LAST)

:func:`probe_dedup_index` runs the increment's band keys against the
stored buckets (hash join on the band key — the increment never
touches corpus text), then verifies candidates by exact Jaccard
against the stored shingle table. Candidate semantics and verify
arithmetic are byte-identical to
:func:`~lasdb_spark.operators.dedup.minhash_lsh_pairs` (same
permutations, band keys, round-6 Jaccard), so the cross-corpus banded
pipeline is the oracle.

Scale: the build is two corpus scans (shingle + signature) and three
partitioned writes; the probe's work is |increment| band rows joined
to the stored buckets plus verify joins on the CANDIDATES only —
independent of corpus size per bucket row touched. Appending a new
increment to the index is the same pure per-doc computation, so
build(all) == build + append row-for-row.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import (
    MERSENNE31,
    md5_int60_col,
    minhash_perm_coeffs,
)
from .dedup import BAND_SIZE, JACCARD_TAU, N_PERMS, SHINGLE_N, shingles


def _sig_and_bands(sh: DataFrame, n_perms: int, band_size: int):
    """(signatures-with-sizes, exploded band keys) from a shingle
    table — the exact expressions of ``_minhash_banded_pairs``."""
    coeffs = minhash_perm_coeffs(n_perms)
    sid = sh.withColumn("sid", md5_int60_col(F.col("shingle")) % MERSENNE31)
    sig = sid.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("sid") + F.lit(b)) % MERSENNE31).alias(
                f"mh{j}"
            )
            for j, (a, b) in enumerate(coeffs)
        ],
        F.count(F.lit(1)).alias("n_sh"),
    )
    n_bands = n_perms // band_size
    band_cols = [
        F.concat_ws(
            "-",
            *[
                F.col(f"mh{b * band_size + k}").cast("string")
                for k in range(band_size)
            ],
        )
        for b in range(n_bands)
    ]
    bands = sig.select(
        "doc_id", F.posexplode(F.array(*band_cols)).alias("band", "sig")
    )
    return sig, bands


def _write_tables(docs: DataFrame, path: str, n: int, n_perms: int,
                  band_size: int, mode: str) -> None:
    sh = shingles(docs, n).localCheckpoint()
    sig, bands = _sig_and_bands(sh, n_perms, band_size)
    bands.write.mode(mode).parquet(os.path.join(path, "buckets"))
    (
        sh.select("doc_id", F.md5(F.col("shingle")).alias("sh"))
        .write.mode(mode)
        .parquet(os.path.join(path, "shingles"))
    )
    sig.select("doc_id", "n_sh").write.mode(mode).parquet(
        os.path.join(path, "sizes")
    )


def build_dedup_index(
    docs: DataFrame,
    path: str,
    n: int = SHINGLE_N,
    n_perms: int = N_PERMS,
    band_size: int = BAND_SIZE,
) -> None:
    """Index the corpus for near-duplicate probing at ``path``.
    ``meta.json`` is written LAST (crash marker, as in
    :func:`~.ann_index.build_ann_index`)."""
    _write_tables(docs, path, n, n_perms, band_size, "overwrite")
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(
            {
                "kind": "minhash_lsh",
                "n": int(n),
                "n_perms": int(n_perms),
                "band_size": int(band_size),
            },
            f,
        )


def append_dedup_index(docs_new: DataFrame, path: str) -> None:
    """Index a new increment into an EXISTING index — per-doc pure
    (shingles/signatures depend only on the text), so increments in
    any order equal a single-shot build row-for-row. Callers own
    doc_id uniqueness across increments."""
    meta = dedup_index_meta(path)
    _write_tables(
        docs_new, path, meta["n"], meta["n_perms"], meta["band_size"],
        "append",
    )


def dedup_index_meta(path: str) -> dict:
    with open(os.path.join(path, "meta.json")) as f:
        return json.load(f)


def probe_dedup_index(
    docs_new: DataFrame,
    spark: SparkSession,
    path: str,
    tau: float = JACCARD_TAU,
) -> DataFrame:
    """(new_id, corpus_id, jac) — near-duplicates of the increment
    against the INDEXED corpus: band-key hash join to the stored
    buckets, exact-Jaccard verify of the candidates against the
    stored shingle/size tables. Same candidate semantics and round-6
    arithmetic as the in-plan banded pipeline."""
    meta = dedup_index_meta(path)
    sh_new = shingles(docs_new, meta["n"]).localCheckpoint()
    sig_new, bands_new = _sig_and_bands(
        sh_new, meta["n_perms"], meta["band_size"]
    )
    buckets = spark.read.parquet(os.path.join(path, "buckets"))
    cands = (
        bands_new.withColumnsRenamed({"doc_id": "new_id"})
        .join(
            buckets.withColumnsRenamed({"doc_id": "corpus_id"}),
            ["band", "sig"],
        )
        .select("new_id", "corpus_id")
        .distinct()
    )
    stored_sh = spark.read.parquet(os.path.join(path, "shingles"))
    stored_sizes = spark.read.parquet(os.path.join(path, "sizes"))
    inter = (
        cands.join(
            sh_new.select(
                F.col("doc_id").alias("new_id"),
                F.md5(F.col("shingle")).alias("sh"),
            ),
            "new_id",
        )
        .join(
            stored_sh.withColumnsRenamed({"doc_id": "corpus_id"}),
            ["corpus_id", "sh"],
        )
        .groupBy("new_id", "corpus_id")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jac = F.col("n_inter") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    ).cast("double")
    return (
        inter.join(
            sig_new.select(
                F.col("doc_id").alias("new_id"), F.col("n_sh").alias("n_a")
            ),
            "new_id",
        )
        .join(
            stored_sizes.select(
                F.col("doc_id").alias("corpus_id"),
                F.col("n_sh").alias("n_b"),
            ),
            "corpus_id",
        )
        .select("new_id", "corpus_id", F.round(jac, 6).alias("jac"))
        .filter(F.col("jac") >= tau)
    )


def probe_dedup_index_sql(
    tau: float = JACCARD_TAU,
    new_mod: str = "doc_id % 2 = 1",
    corpus_mod: str = "doc_id % 2 = 0",
) -> str:
    """Oracle twin of the driver probe: the cross-corpus banded
    pipeline over (increment, corpus) slices — identical candidates
    and verify (the stored-table probe is a plan choice, not a
    semantics choice)."""
    from .dedup import crosscorpus_neardup_pairs_sql

    cross = crosscorpus_neardup_pairs_sql(
        tau,
        src_a=f"SELECT doc_id, text FROM documents WHERE {new_mod}",
        src_b=f"SELECT doc_id, text FROM documents WHERE {corpus_mod}",
    )
    return f"""
WITH cross_pairs AS ({cross})
SELECT a_id AS new_id, b_id AS corpus_id, jac
FROM cross_pairs
""".strip()


def compact_dedup_index(spark: SparkSession, path: str) -> None:
    """Merge appended segments of a persisted dedup index into
    right-sized files (r9 VERDICT missing #3: each
    :func:`append_dedup_index` increment adds one small file per
    table; after many increments every probe pays per-file open cost
    on buckets/shingles/sizes). Each table is rewritten — shuffled by
    its probe-join key so co-access stays clustered — through the
    shared :func:`~.ann_index._swap_dir` side-dir + rename swap (see
    its docstring for the exact two-rename crash window;
    :func:`~.ann_index._recover_swap` runs per table on entry to
    repair an interrupted prior run). Content is untouched, so
    compact(build + append) == build(all) down to probe results —
    pytest-pinned. Maintenance-window op: don't run it concurrently
    with appends — an append landing in the old directory during the
    swap is silently discarded.

    The target file count per table is its post-packing read
    partition count: Spark's file packing (maxPartitionBytes +
    openCostInBytes) already yields a size-proportional partition
    count over the fragmented input, so the rewrite converges to
    ~maxPartitionBytes files per table at any corpus size."""
    from .ann_index import _recover_swap, _swap_dir

    for table, keys in (
        ("buckets", ["band", "sig"]),
        ("shingles", ["sh"]),
        ("sizes", ["doc_id"]),
    ):
        target = os.path.join(path, table)
        _recover_swap(target)
        df = spark.read.parquet(target)
        n = max(1, df.rdd.getNumPartitions())
        tmp = target + "_compacting"
        df.repartition(n, *keys).write.mode("overwrite").parquet(tmp)
        _swap_dir(tmp, target)
