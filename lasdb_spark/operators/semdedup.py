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

#: hot-cell guard for the Σ|cell|² pair scan (r13, guide §2.5): a cell
#: whose population exceeds SEM_SKEW_FACTOR × the mean cell (the same
#: 4× rule as ann_index.KNN_JOIN_REBUILD_SKEW_PPM — far outside the
#: Lloyd steady-state band, reached only when k-means collapses onto
#: one mode or a near-duplicate burst clumps) has its quadratic scan
#: SPLIT SEM_SALT ways: the probe side takes a deterministic salt
#: (pmod(xxhash64(vec_a), SEM_SALT) — never rand(), which breaks
#: under task retry), the build side replicates to every salt, and
#: the join keys on (cell, salt) so the hot cell's |cell|² work lands
#: on SEM_SALT tasks instead of one. Pair set identical (each (a, b)
#: pair matches at exactly one salt — a's). Cold corpora (every bench
#: run here) skip the branch entirely: one n_cells-row count agg over
#: the already-materialized assignment decides.
SEM_SKEW_FACTOR = 4
SEM_SALT = 8


def _assign_to(wn: DataFrame, cents: list) -> DataFrame:
    """Map-side nearest-centroid assignment against a DRIVER-HELD
    centroid list [(cid, ce, cnrm)]: per-cell cosine from literal
    arrays + one array_max over (cos, -cid) structs — no join, no
    window, no shuffle. Tie-break (max cos, then LOWEST cid) and the
    round(·, 6) match ``similarity._nearest_cells``'s rk=1 exactly."""
    structs = []
    for cid, ce, cnrm in cents:
        lit_ce = F.array(*[F.lit(float(v)) for v in ce])
        cos = F.round(
            fold_dot_col(F.col("embedding"), lit_ce)
            / (F.col("nrm") * F.lit(float(cnrm))),
            6,
        )
        structs.append(
            F.struct(
                cos.alias("cos"),
                F.lit(-int(cid)).cast("long").alias("ncid"),
                F.lit(int(cid)).cast("long").alias("cid"),
            )
        )
    best = F.array_max(F.array(*structs))
    return wn.select(
        "vec_id", "embedding", "nrm", best["cid"].alias("cell")
    )


def _lloyd_collect(assign: DataFrame) -> list:
    """One Lloyd refinement with the centroid table COLLECTED to the
    driver: the distributed part is the exact integer micro-unit
    component-mean aggregation of ``similarity._lloyd_step`` (one
    shuffle, associative BIGINT sums); what comes back is n_cells×dim
    doubles — a planning stat, same family as ingest's metadata pass.
    cnrm is the identical left-fold-then-sqrt the Column expression
    computes (same IEEE order → bit-identical)."""
    import math

    comp = (
        assign.select(
            "cell", F.posexplode(F.col("embedding")).alias("pos", "v")
        )
        .select(
            "cell",
            "pos",
            F.round(F.col("v").cast("double") * 1e6).cast("long").alias("q"),
        )
        .groupBy("cell", "pos")
        .agg((F.sum("q") / (F.count(F.lit(1)) * 1e6)).alias("c"))
    )
    by_cell: dict = {}
    for r in comp.collect():
        by_cell.setdefault(r["cell"], {})[r["pos"]] = r["c"]
    cents = []
    for cell in sorted(by_cell):
        ce = [by_cell[cell][p] for p in sorted(by_cell[cell])]
        acc = 0.0
        for x in ce:
            acc = acc + x * x
        cents.append((cell, ce, math.sqrt(acc)))
    return cents


def _trained_assign(
    embs: DataFrame, n_cells: int, n_iters: int,
    materialize: bool = False,
) -> DataFrame:
    """(vec_id, embedding, nrm, cell) after ``n_iters`` Lloyd rounds.

    r5 redesign: the centroid table (n_cells×dim doubles — KBs at any
    corpus size) lives on the DRIVER between rounds, so each round is
    ONE partial-aggregated shuffle (the exact component means) and
    assignment is a pure map with literal centroids. The previous
    all-lazy chain stacked a broadcast-join+window shuffle per round
    into one plan, and every consumer referencing the assignment
    twice re-evaluated the whole chain (measured: semantic_pairs
    scanned embeddings 8x, zero ReusedExchange). Values are
    bit-identical to the old chain and the DuckDB oracle
    (``similarity.ivf_train_ctes``): same integer-exact means, same
    fold order, same round(·,6), same tie-break — the oracle mirror
    re-proves it every run.

    ``materialize=True`` additionally localCheckpoints the final
    assignment so multi-reference consumers (self-join, anti-join,
    labeling aggs) read one materialized table."""
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
    cents = [
        (r["cid"], list(r["ce"]), r["cnrm"])
        for r in seed_centroids(embs, n_cells).collect()
    ]
    for _ in range(max(1, n_iters)):
        cents = _lloyd_collect(_assign_to(wn, cents))
    final = _assign_to(wn, cents)
    return final.localCheckpoint() if materialize else final


def semantic_pairs(
    embs: DataFrame,
    tau: float = SEM_TAU,
    n_cells: int = IVF_CELLS,
    n_iters: int = IVF_ITERS,
    assign: DataFrame | None = None,
) -> DataFrame:
    """(vec_a, vec_b, cell, cos) — co-clustered pairs with cosine ≥
    ``tau``, vec_a < vec_b. The quadratic scan never leaves a cell.
    Pass ``assign=`` to reuse a precomputed assignment (the
    ``clusters=`` reuse contract of dedup.dedup_keepers); the default
    trains once and materializes it so BOTH self-join sides read the
    same table instead of re-running Lloyd."""
    if assign is None:
        assign = _trained_assign(embs, n_cells, n_iters, materialize=True)
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

    def _pairs(aa, bb, extra_keys=()):
        keys = (F.col("cell") == F.col("cell_b")) & (
            F.col("vec_a") < F.col("vec_b")
        )
        for ka, kb in extra_keys:
            keys = keys & (F.col(ka) == F.col(kb))
        return (
            aa.join(
                # SHUFFLE_HASH: sort-merge would sort both assignment
                # sides by cell (order unused downstream); the hash
                # build side holds one CELL's vectors per key —
                # bounded by the n_cells sizing knob, never by the
                # corpus.
                bb.hint("SHUFFLE_HASH"),
                keys,
            )
            .select("vec_a", "vec_b", "cell", cos.alias("cos"))
            .filter(F.col("cos") >= tau)
        )

    # hot-cell guard (r13, guide §2.5 — rationale on SEM_SKEW_FACTOR):
    # one n_cells-row count agg over the materialized assignment finds
    # runaway cells; absent any (the steady state), the plan is the
    # single intra-cell join unchanged.
    counts = [
        (r["cell"], r["n"])
        for r in assign.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    mean = sum(n for _, n in counts) / max(len(counts), 1)
    hot = [c for c, n in counts if n > SEM_SKEW_FACTOR * mean]
    if not hot:
        return _pairs(a, b)
    a_cold, b_cold = (
        a.filter(~F.col("cell").isin(hot)),
        b.filter(~F.col("cell_b").isin(hot)),
    )
    a_hot = a.filter(F.col("cell").isin(hot)).withColumn(
        "salt", F.pmod(F.xxhash64("vec_a"), F.lit(SEM_SALT))
    )
    b_hot = (
        b.filter(F.col("cell_b").isin(hot))
        .withColumn(
            "salt_b", F.explode(F.array(*[F.lit(s) for s in range(SEM_SALT)]))
        )
        .withColumn("salt_b", F.col("salt_b").cast("long"))
    )
    return _pairs(a_cold, b_cold).unionByName(
        _pairs(a_hot, b_hot, extra_keys=(("salt", "salt_b"),))
    )


def semantic_keepers(
    embs: DataFrame,
    tau: float = SEM_TAU,
    n_cells: int = IVF_CELLS,
    n_iters: int = IVF_ITERS,
) -> DataFrame:
    """(vec_id, cell) — the deduplicated corpus: every vector not
    semantically dominated by a lower-id vector in its cell (the
    paper's greedy keep-one rule, deterministic by id). Trains ONCE:
    the materialized assignment feeds both the pair scan and the
    anti-join (previously three separate Lloyd evaluations)."""
    assign = _trained_assign(embs, n_cells, n_iters, materialize=True)
    dropped = semantic_pairs(embs, tau, n_cells, n_iters, assign=assign)
    dropped = dropped.select(F.col("vec_b").alias("vec_id"))
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
