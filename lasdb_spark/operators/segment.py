"""Euclidean point-cloud segmentation (r8): voxel connected components.

Object extraction over the high cloud — the PDAL/PCL "Euclidean
cluster extraction" shape, beyond the reference surface (the reference
has no segmentation; its queries stop at window retrieval,
`/root/reference/pipeline/retrieve_data.py:40-41` never groups points
into objects): filter to z ≥ z_min, voxelize on a metric grid, connect
occupied voxels under the 26-neighborhood, label components with the
shared min-label/path-halving machinery
(:func:`lasdb_spark.operators.dedup.connected_components` — the same
iterative CC that clusters near-duplicate documents), and report a
per-segment voxel/point census.

Scale: voxelization is a map + one groupBy to OCCUPANCY (bounded by
the grid, not the cloud — the point-sized stage never shuffles more
than once); edges are a 26-way fan-out of voxel ids hash-joined back
to occupancy (voxel-sized); components run log-diameter rounds, one
job each; the census is one partial-agg groupBy. Segment ids are the
component-minimum voxel id — deterministic across partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: object slab: the top of the synthetic cloud (z in [-5, 40)); at the
#: default grid this leaves ~4% voxel occupancy — sparse blobs, the
#: regime segmentation is for (a dense uniform slab is one component).
SEG_ZMIN = 38.0
SEG_CELL = 5.0
_OFF = 1 << 20  # shifts any survey-scale voxel index positive
_W = 21  # bits per packed axis; all three shifted axes must be < 2^21
#: admissible |voxel index| for packing: one LESS than the shift so the
#: ±1 neighbor probes of a valid voxel still pack without overflow
_VID_BOUND = _OFF - 1


def _vid(vx, vy, vz):
    """Pack three shifted voxel indexes into one BIGINT key (exact for
    |index| < 2^20 — kilometre-scale surveys at metre cells).
    Occupied voxels are range-checked at the occupancy stage
    (:func:`_segment_labels`) so an out-of-range index raises instead
    of silently wrapping into another voxel's key."""
    return (
        ((vx + F.lit(_OFF)) * F.lit(1 << _W) + (vy + F.lit(_OFF)))
        * F.lit(1 << _W)
    ) + (vz + F.lit(_OFF))


_OFFSETS26 = [
    (dx, dy, dz)
    for dx in (-1, 0, 1)
    for dy in (-1, 0, 1)
    for dz in (-1, 0, 1)
    if (dx, dy, dz) != (0, 0, 0)
]

#: tile side in voxels for the local union-find level. Iterative
#: min-label CC alone crawls on grid graphs: near-critical percolation
#: clusters are snakes hundreds of voxels long, and the propagation
#: tail was measured LINEAR (changed = 2744/669/316 at rounds 5/10/15
#: on the sf0.1 slab — 50 rounds split an 883-voxel component into
#: 606+…). Two-level CC is the scale shape for grids: exact
#: union-find INSIDE each tile (Arrow batch, no shuffle), then the
#: iterative rounds only on the CONTRACTED graph, whose diameter is
#: the tile-path length (diameter / 64) — a handful of rounds.
_TILE = 64


def _tile_cc(pdf):
    """Exact union-find over one tile's intra-tile 26-adjacency;
    emits (vid, root = min vid of the local set)."""
    import pandas as pd

    vids = pdf["vid"].tolist()
    keys = list(zip(pdf["vx"].tolist(), pdf["vy"].tolist(), pdf["vz"].tolist()))
    pos = {k: i for i, k in enumerate(keys)}
    parent = list(range(len(vids)))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i, (x, y, z) in enumerate(keys):
        for dx, dy, dz in _OFFSETS26:
            j = pos.get((x + dx, y + dy, z + dz))
            if j is not None:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    root_min: dict = {}
    for i, v in enumerate(vids):
        r = find(i)
        root_min[r] = min(root_min.get(r, v), v)
    return pd.DataFrame(
        {"vid": vids, "root": [root_min[find(i)] for i in range(len(vids))]}
    )


def _segment_labels(
    pts: DataFrame, z_min: float = SEG_ZMIN, cell: float = SEG_CELL
) -> DataFrame:
    """(vx, vy, vz, n_pts, vid, seg) — every occupied voxel of the
    z ≥ ``z_min`` slab with its component label (min vid of the
    component). The shared first half of the census and shape reports.

    TWO-LEVEL labeling (see :data:`_TILE`): exact union-find inside
    each 64×64-voxel tile (one ``applyInPandas`` pass, Arrow-batched,
    shuffled once on the tile key), then the shared min-label rounds
    run only on the CONTRACTED graph — every edge mapped endpoint→
    local root, intra-tile edges collapsing to self-loops that drop
    out, ``distinct()`` bounding it by the cross-tile surface. The
    global component minimum is the minimum over local roots, so the
    final labels equal single-level CC labels exactly (min vid of the
    component — what the oracle's reachability closure computes)."""
    from .dedup import connected_components

    spark = pts.sparkSession
    vox = pts.where(F.col("z") >= z_min).select(
        F.floor(F.col("x") / cell).alias("vx"),
        F.floor(F.col("y") / cell).alias("vy"),
        F.floor(F.col("z") / cell).alias("vz"),
    )
    in_range = (
        (F.abs(F.col("vx")) < _VID_BOUND)
        & (F.abs(F.col("vy")) < _VID_BOUND)
        & (F.abs(F.col("vz")) < _VID_BOUND)
    )
    occ = (
        vox.groupBy("vx", "vy", "vz")
        .agg(F.count(F.lit(1)).alias("n_pts"))
        .withColumn(
            "vid",
            # voxel-sized stage, so the guard is ~free; a silent wrap
            # would merge unrelated segments in BOTH engines (the
            # oracle packs identically), so fail loudly instead
            F.when(
                in_range, _vid(F.col("vx"), F.col("vy"), F.col("vz"))
            ).otherwise(
                F.raise_error(
                    F.format_string(
                        "voxel index out of packing range (|idx| >= %d):"
                        " vx=%d vy=%d vz=%d — use a larger cell size",
                        F.lit(_VID_BOUND),
                        F.col("vx"),
                        F.col("vy"),
                        F.col("vz"),
                    )
                )
            ),
        )
        .localCheckpoint()
    )
    local = (
        occ.withColumn("tx", F.floor(F.col("vx") / _TILE))
        .withColumn("ty", F.floor(F.col("vy") / _TILE))
        .groupBy("tx", "ty")
        .applyInPandas(_tile_cc, "vid long, root long")
        .localCheckpoint()
    )
    offs = spark.createDataFrame(_OFFSETS26, "dx long, dy long, dz long")
    nbr = occ.crossJoin(F.broadcast(offs)).select(
        "vid",
        _vid(
            F.col("vx") + F.col("dx"),
            F.col("vy") + F.col("dy"),
            F.col("vz") + F.col("dz"),
        ).alias("nbr"),
    )
    edges = (
        nbr.join(occ.select(F.col("vid").alias("nbr")), "nbr")
        .where(F.col("vid") < F.col("nbr"))
        .select("vid", "nbr")
    )
    contracted = (
        edges.join(local.withColumnsRenamed({"root": "ra"}), "vid")
        .join(
            local.withColumnsRenamed({"vid": "nbr", "root": "rb"}), "nbr"
        )
        .where(F.col("ra") != F.col("rb"))
        .select(
            F.least("ra", "rb").alias("doc_a"),
            F.greatest("ra", "rb").alias("doc_b"),
        )
        .distinct()
    )
    comp = connected_components(contracted).withColumnsRenamed(
        {"doc_id": "root", "cluster_id": "seg"}
    )
    return (
        occ.join(local, "vid")
        .join(comp, "root", "left")
        .withColumn("seg", F.coalesce(F.col("seg"), F.col("root")))
        .select("vx", "vy", "vz", "n_pts", "vid", "seg")
    )


def segment_labels(
    pts: DataFrame, z_min: float = SEG_ZMIN, cell: float = SEG_CELL
) -> DataFrame:
    """Public handle on the shared labeling chain: (vx, vy, vz,
    n_pts, vid, seg) for every occupied voxel. Compute (or persist)
    it ONCE and pass it as ``labels=`` to both
    :func:`euclidean_segments` and :func:`segment_shape` — the label
    chain dominates both reports, and it is a pure function of the
    cloud, so sharing it changes nothing but the cost (the
    ``clusters=`` reuse pattern of the dedup family)."""
    return _segment_labels(pts, z_min, cell)


def euclidean_segments(
    pts: DataFrame,
    z_min: float = SEG_ZMIN,
    cell: float = SEG_CELL,
    labels: DataFrame | None = None,
) -> DataFrame:
    """(segment_id, n_voxels, n_points, vx_min, vx_max, vy_min,
    vy_max) — connected components of occupied voxels in the z ≥
    ``z_min`` slab under 26-connectivity; all outputs integer, so the
    census is hash-exact. Labeling is the two-level CC documented on
    :func:`_segment_labels`; pass a precomputed ``labels`` table
    (:func:`segment_labels`) to skip it."""
    labeled = (
        labels if labels is not None else _segment_labels(pts, z_min, cell)
    )
    return (
        labeled.groupBy("seg")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_voxels"),
            F.sum("n_pts").cast("long").alias("n_points"),
            F.min("vx").cast("long").alias("vx_min"),
            F.max("vx").cast("long").alias("vx_max"),
            F.min("vy").cast("long").alias("vy_min"),
            F.max("vy").cast("long").alias("vy_max"),
        )
        .select(
            F.col("seg").cast("long").alias("segment_id"),
            "n_voxels",
            "n_points",
            "vx_min",
            "vx_max",
            "vy_min",
            "vy_max",
        )
        .orderBy("segment_id")
    )


def _segments_cte_sql(
    points_cte: str, z_min: float, cell: float
) -> str:
    """The shared oracle chain through the per-voxel component label
    (``comp(node, seg)`` + ``occ``): recursive-CTE min-label
    reachability closure (the :func:`dedup_clusters_sql` pattern) over
    the voxel edge list. Census and shape twins both finish from it."""
    pack = (
        f"((vx + {_OFF}) * {1 << _W} + (vy + {_OFF})) * {1 << _W}"
        f" + (vz + {_OFF})"
    )
    # the reach member is recursive; RECURSIVE must head the chain —
    # fail loudly if the points CTE format ever drifts, instead of
    # generating silently-broken oracle SQL
    if not points_cte.startswith("WITH "):
        raise ValueError(
            "points_cte must begin with 'WITH ' to be rewritten as "
            f"'WITH RECURSIVE ': got {points_cte[:32]!r}..."
        )
    rec_cte = "WITH RECURSIVE " + points_cte[len("WITH ") :]
    return f"""
{rec_cte},
vox AS (
  SELECT CAST(floor(x / {cell}) AS BIGINT) AS vx,
         CAST(floor(y / {cell}) AS BIGINT) AS vy,
         CAST(floor(z / {cell}) AS BIGINT) AS vz
  FROM points WHERE z >= {z_min}),
occ AS (
  SELECT vx, vy, vz, count(*) AS n_pts, {pack} AS vid
  FROM vox GROUP BY 1, 2, 3),
offs AS (
  SELECT tx.range AS dx, ty.range AS dy, tz.range AS dz
  FROM range(-1, 2) tx, range(-1, 2) ty, range(-1, 2) tz
  WHERE NOT (tx.range = 0 AND ty.range = 0 AND tz.range = 0)),
edges AS (
  SELECT a.vid AS src, b.vid AS dst
  FROM occ a JOIN offs o ON TRUE
  JOIN occ b ON b.vx = a.vx + o.dx AND b.vy = a.vy + o.dy
            AND b.vz = a.vz + o.dz),
reach AS (
  SELECT vid AS node, vid AS label FROM occ
  UNION
  SELECT e.dst AS node, r.label
  FROM reach r JOIN edges e ON e.src = r.node),
comp AS (SELECT node, min(label) AS seg FROM reach GROUP BY 1)""".strip()


def euclidean_segments_sql(
    points_cte: str, z_min: float = SEG_ZMIN, cell: float = SEG_CELL
) -> str:
    """Oracle twin of :func:`euclidean_segments`."""
    return f"""
{_segments_cte_sql(points_cte, z_min, cell)}
SELECT CAST(c.seg AS BIGINT) AS segment_id,
       CAST(count(*) AS BIGINT) AS n_voxels,
       CAST(sum(i.n_pts) AS BIGINT) AS n_points,
       CAST(min(i.vx) AS BIGINT) AS vx_min,
       CAST(max(i.vx) AS BIGINT) AS vx_max,
       CAST(min(i.vy) AS BIGINT) AS vy_min,
       CAST(max(i.vy) AS BIGINT) AS vy_max
FROM occ i JOIN comp c ON c.node = i.vid
GROUP BY 1 ORDER BY 1
""".strip()


#: shape report: ignore fragments below this point count (their 2D
#: covariance is noise); the census still reports them
SHAPE_MIN_POINTS = 5


def segment_shape(
    pts: DataFrame,
    z_min: float = SEG_ZMIN,
    cell: float = SEG_CELL,
    min_points: int = SHAPE_MIN_POINTS,
    labels: DataFrame | None = None,
) -> DataFrame:
    """(segment_id, n_points, z_min_cm, z_max_cm, lam1, lam2, elong) —
    per-segment GEOMETRY descriptors: exact centi-unit height range
    plus the planar covariance eigenvalues (closed-form quadratic —
    no iteration) and the elongation ratio √(λ2/λ1). The
    classification step after extraction: elongated segments are
    linear structures (walls, wires), isotropic ones are blobs.

    Exactness: per-segment sufficient statistics are exact
    DECIMAL(38,0) sums of centi-unit longs; the covariance → mid/disc
    → λ chain runs in doubles in ONE fixed expression order and
    rounds once (6 dp); the λ2 > 0 guard branches on the identical
    doubles in both engines (an FP −ε under the sqrt must not NaN one
    side only).

    Scale: points map to their voxel key and hash-join the
    voxel-count-sized label table; then one partial-agg groupBy on
    segment. Nothing beyond the labeling's own stages is added —
    and a precomputed ``labels`` table (:func:`segment_labels`)
    removes even those: census + shape then share ONE label chain."""
    labeled = (
        labels
        if labels is not None
        else _segment_labels(pts, z_min, cell).localCheckpoint()
    )
    q = lambda c: F.round(F.col(c) * 100).cast("long")  # noqa: E731
    pvox = pts.where(F.col("z") >= z_min).select(
        F.floor(F.col("x") / cell).alias("vx"),
        F.floor(F.col("y") / cell).alias("vy"),
        F.floor(F.col("z") / cell).alias("vz"),
        q("x").alias("xq"),
        q("y").alias("yq"),
        q("z").alias("zq"),
    )
    joined = pvox.join(
        labeled.select("vx", "vy", "vz", "seg"), ["vx", "vy", "vz"]
    )
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    sums = (
        joined.groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("xq").cast("decimal(38,0)")).alias("sx"),
            F.sum(F.col("yq").cast("decimal(38,0)")).alias("sy"),
            F.sum((d19("xq") * d19("xq")).cast("decimal(38,0)")).alias("sxx"),
            F.sum((d19("yq") * d19("yq")).cast("decimal(38,0)")).alias("syy"),
            F.sum((d19("xq") * d19("yq")).cast("decimal(38,0)")).alias("sxy"),
            F.min("zq").alias("z_min_cm"),
            F.max("zq").alias("z_max_cm"),
        )
        .where(F.col("n") >= min_points)
    )
    nd = F.col("n").cast("double")
    cxx = F.col("sxx").cast("double") / nd - (
        F.col("sx").cast("double") / nd
    ) * (F.col("sx").cast("double") / nd)
    cyy = F.col("syy").cast("double") / nd - (
        F.col("sy").cast("double") / nd
    ) * (F.col("sy").cast("double") / nd)
    cxy = F.col("sxy").cast("double") / nd - (
        F.col("sx").cast("double") / nd
    ) * (F.col("sy").cast("double") / nd)
    mid = (cxx + cyy) / F.lit(2.0)
    disc = F.sqrt(
        ((cxx - cyy) / F.lit(2.0)) * ((cxx - cyy) / F.lit(2.0)) + cxy * cxy
    )
    lam1 = mid + disc
    lam2 = mid - disc
    elong = F.when(
        (lam1 > 0) & (lam2 > 0), F.round(F.sqrt(lam2 / lam1), 6)
    ).otherwise(F.lit(0.0))
    return sums.select(
        F.col("seg").cast("long").alias("segment_id"),
        F.col("n").cast("long").alias("n_points"),
        "z_min_cm",
        "z_max_cm",
        F.round(lam1, 6).alias("lam1"),
        F.round(lam2, 6).alias("lam2"),
        elong.alias("elong"),
    ).orderBy("segment_id")


def segment_shape_sql(
    points_cte: str,
    z_min: float = SEG_ZMIN,
    cell: float = SEG_CELL,
    min_points: int = SHAPE_MIN_POINTS,
) -> str:
    """Oracle twin of :func:`segment_shape`: the shared label chain,
    then identical sufficient statistics and the same fixed-order
    eigen chain."""
    # outer parentheses are load-bearing: the template inlines into
    # `cxx - cyy`, which without them would flip cyy's subtrahend sign
    cov = (
        "(CAST({sab} AS DOUBLE) / CAST(n AS DOUBLE)"
        " - (CAST({sa} AS DOUBLE) / CAST(n AS DOUBLE))"
        " * (CAST({sb} AS DOUBLE) / CAST(n AS DOUBLE)))"
    )
    cxx = cov.format(sab="sxx", sa="sx", sb="sx")
    cyy = cov.format(sab="syy", sa="sy", sb="sy")
    cxy = cov.format(sab="sxy", sa="sx", sb="sy")
    return f"""
{_segments_cte_sql(points_cte, z_min, cell)},
pvox AS (
  SELECT CAST(floor(x / {cell}) AS BIGINT) AS vx,
         CAST(floor(y / {cell}) AS BIGINT) AS vy,
         CAST(floor(z / {cell}) AS BIGINT) AS vz,
         CAST(round(x * 100) AS BIGINT) AS xq,
         CAST(round(y * 100) AS BIGINT) AS yq,
         CAST(round(z * 100) AS BIGINT) AS zq
  FROM points WHERE z >= {z_min}),
joined AS (
  SELECT c.seg, p.xq, p.yq, p.zq
  FROM pvox p
  JOIN occ o USING (vx, vy, vz)
  JOIN comp c ON c.node = o.vid),
sums AS (
  SELECT seg, CAST(count(*) AS BIGINT) AS n,
         SUM(CAST(xq AS HUGEINT)) AS sx,
         SUM(CAST(yq AS HUGEINT)) AS sy,
         SUM(CAST(xq AS HUGEINT) * xq) AS sxx,
         SUM(CAST(yq AS HUGEINT) * yq) AS syy,
         SUM(CAST(xq AS HUGEINT) * yq) AS sxy,
         CAST(min(zq) AS BIGINT) AS z_min_cm,
         CAST(max(zq) AS BIGINT) AS z_max_cm
  FROM joined GROUP BY 1
  HAVING count(*) >= {min_points}),
eig AS (
  SELECT seg, n, z_min_cm, z_max_cm,
         ({cxx} + {cyy}) / 2.0
           + sqrt((({cxx} - {cyy}) / 2.0) * (({cxx} - {cyy}) / 2.0)
                  + ({cxy}) * ({cxy})) AS lam1,
         ({cxx} + {cyy}) / 2.0
           - sqrt((({cxx} - {cyy}) / 2.0) * (({cxx} - {cyy}) / 2.0)
                  + ({cxy}) * ({cxy})) AS lam2
  FROM sums)
SELECT CAST(seg AS BIGINT) AS segment_id, n AS n_points,
       z_min_cm, z_max_cm,
       round(lam1, 6) AS lam1, round(lam2, 6) AS lam2,
       CASE WHEN lam1 > 0 AND lam2 > 0
            THEN round(sqrt(lam2 / lam1), 6) ELSE 0.0 END AS elong
FROM eig ORDER BY segment_id
""".strip()
