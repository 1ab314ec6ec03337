"""Semantic deduplication over the embedding column (SemDeDup-style).

Method (public: Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", arXiv:2303.09540): k-means
the embeddings, then look for near-duplicate pairs ONLY inside each
cluster — the cross-cluster pairs a full N² sweep would also score are
below threshold by construction of the clustering, so the quadratic
work shrinks from N² to Σ|cell|². The reference engine
(cynthiacai56/lasdb) has no embedding surface at all; this is part of
the training-data-pipeline layer built on the same engine.

Spark shape (the 100 TB design):
- Training reuses :mod:`similarity`'s Lloyd machinery — per-round
  state is the n_cells×dim centroid table, always broadcast-sized;
  assignment is a broadcast cross join + per-vector window, never a
  shuffle of the corpus.
- The intra-cell pair scan is a self-equi-join on ``cell`` — a hash
  join whose output is bounded by Σ|cell|²/2, never N²/2. ``n_cells``
  is the knob: size it ~N/target_cell (same rule as
  :func:`similarity.lsh_bits_for`) so cells stay bounded as the
  corpus grows. A runaway cell (k-means collapse onto one mode) is the
  skew case — raise ``n_cells`` or re-seed; the join plan itself never
  needs a driver-side pass.
- Keepers are one broadcast/shuffled anti-join on the pair table's
  ``vec_b`` side — the greedy keep-lowest-id rule of the paper, fully
  order-independent because pairs are emitted with vec_a < vec_b.

Determinism: centroid means use exact integer micro-unit sums and
cosines round to 6 decimals (the same contract as
:func:`similarity.topk_ivf_trained`), so cell assignments, the pair
set, and the keeper set are identical under any partitioning — which
is what lets a DuckDB oracle hash-match the whole pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import fold_dot_col, fold_product_sql
from .similarity import (
    EMB_DIM,
    IVF_CELLS,
    IVF_ITERS,
    _lloyd_step,
    _nearest_cells,
    ivf_train_ctes,
)

#: cosine threshold for "semantically duplicate" — matches the exact
#: embedding near-dup sweep (dedup.EMB_TAU) so recall is comparable
SEM_TAU = 0.4


def _trained_assign(
    embs: DataFrame, n_cells: int, n_iters: int
) -> DataFrame:
    """(vec_id, embedding, nrm, cell) after ``n_iters`` Lloyd rounds —
    one lazy plan, no driver-side data movement."""
    wn = embs.select(
        "vec_id",
        "embedding",
        F.sqrt(fold_dot_col(F.col("embedding"), F.col("embedding"))).alias(
            "nrm"
        ),
    )
    from .similarity import seed_centroids

    # rank-based seed (n_cells LOWEST vec_ids) — robust to sparse /
    # content-hash id spaces, identical to vec_id < n_cells for the
    # dense 0-based ids of the driver testdata
    cents = seed_centroids(embs, n_cells)
    for _ in range(max(1, n_iters)):
        assign = _nearest_cells(wn, cents).filter(F.col("rk") == 1).select(
            "vec_id", "embedding", "nrm", F.col("cid").alias("cell")
        )
        cents = _lloyd_step(assign)
    return (
        _nearest_cells(wn, cents)
        .filter(F.col("rk") == 1)
        .select("vec_id", "embedding", "nrm", F.col("cid").alias("cell"))
    )


def semantic_pairs(
    embs: DataFrame,
    tau: float = SEM_TAU,
    n_cells: int = IVF_CELLS,
    n_iters: int = IVF_ITERS,
) -> DataFrame:
    """(vec_a, vec_b, cell, cos) — co-clustered pairs with cosine ≥
    ``tau``, vec_a < vec_b. The quadratic scan never leaves a cell."""
    assign = _trained_assign(embs, n_cells, n_iters)
    a = assign.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
        "cell",
    )
    b = assign.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
        F.col("cell").alias("cell_b"),
    )
    cos = F.round(
        fold_dot_col(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")),
        6,
    )
    return (
        a.join(
            # SHUFFLE_HASH: sort-merge would sort both assignment
            # sides by cell (order unused downstream); the hash build
            # side holds one CELL's vectors per key — bounded by the
            # n_cells sizing knob, never by the corpus.
            b.hint("SHUFFLE_HASH"),
            (F.col("cell") == F.col("cell_b"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .select("vec_a", "vec_b", "cell", cos.alias("cos"))
        .filter(F.col("cos") >= tau)
    )


def semantic_keepers(
    embs: DataFrame,
    tau: float = SEM_TAU,
    n_cells: int = IVF_CELLS,
    n_iters: int = IVF_ITERS,
) -> DataFrame:
    """(vec_id, cell) — the deduplicated corpus: every vector not
    semantically dominated by a lower-id vector in its cell (the
    paper's greedy keep-one rule, deterministic by id)."""
    assign = _trained_assign(embs, n_cells, n_iters)
    dropped = semantic_pairs(embs, tau, n_cells, n_iters).select(
        F.col("vec_b").alias("vec_id")
    )
    return assign.join(dropped, "vec_id", "left_anti").select(
        "vec_id", "cell"
    )


def _pairs_cte(tau: float, dim: int) -> str:
    dot = fold_product_sql("x.embedding", "y.embedding", dim)
    return f"""pairs AS (
  SELECT x.vec_id AS vec_a, y.vec_id AS vec_b, x.cell,
         round({dot} / (x.nrm * y.nrm), 6) AS cos
  FROM af x JOIN af y ON x.cell = y.cell AND x.vec_id < y.vec_id)"""


def semantic_pairs_sql(
    tau: float = SEM_TAU,
    n_cells: int = IVF_CELLS,
    n_iters: int = IVF_ITERS,
    dim: int = EMB_DIM,
) -> str:
    """Oracle twin of :func:`semantic_pairs` — the shared k-means CTE
    chain (``similarity.ivf_train_ctes``) plus one intra-cell join."""
    ctes = ivf_train_ctes(n_cells, dim, n_iters)
    ctes.append(_pairs_cte(tau, dim))
    joined = ",\n".join(ctes)
    return f"""
WITH {joined}
SELECT vec_a, vec_b, cell, cos FROM pairs WHERE cos >= {tau}
""".strip()


def semantic_keepers_sql(
    tau: float = SEM_TAU,
    n_cells: int = IVF_CELLS,
    n_iters: int = IVF_ITERS,
    dim: int = EMB_DIM,
) -> str:
    """Oracle twin of :func:`semantic_keepers`."""
    ctes = ivf_train_ctes(n_cells, dim, n_iters)
    ctes.append(_pairs_cte(tau, dim))
    joined = ",\n".join(ctes)
    return f"""
WITH {joined}
SELECT vec_id, cell FROM af
WHERE vec_id NOT IN (SELECT vec_b FROM pairs WHERE cos >= {tau})
""".strip()
