"""Per-neighborhood geometric features for the point cloud: covariance
eigenvalues and the standard linearity / planarity / sphericity shape
descriptors (Weinmann et al., ISPRS 2015 — the features every LiDAR
classification pipeline derives before labeling ground/vegetation/
building).

The reference engine stores and queries points but computes no
neighborhood statistics; this extends the same cell-join machinery as
:mod:`outliers` (radius neighborhoods without a distance self-join)
into second-moment aggregates.

Plan (the 100 TB shape): sites → radius-sized grid cells → 3×3-cell
probe fan-out → hash equi-join on cell + map-side d² refine — output
bounded by true neighborhood density, never N². The second moments ride
the SAME single aggregation as the counts: ten integer sums per site.

Determinism (what makes a DuckDB value-hash possible for an
eigen-decomposition at all):

- Neighbor offsets are taken RELATIVE TO THE PROBE and quantized to
  exact centi-unit BIGINTs (``round((s.x - p.x) * 100)``) —
  covariance is translation-invariant, so this changes nothing
  mathematically, while making every sum an exact integer (offsets are
  bounded by the radius, so Σ m·dx·dy never overflows BIGINT at any
  corpus scale — no float association order to disagree on).
- The covariance entries and the closed-form symmetric-3×3
  eigenvalues (Smith's trigonometric method, public domain — the
  standard non-iterative route) are then computed with the IDENTICAL
  double-precision expression tree in both engines; the only inexact
  steps (sqrt/acos/cos) are ≤1-ulp library calls absorbed by the
  6-decimal output rounding.

Usage note: filter on x/y/z BEFORE this operator (those predicates
prune the scan); a predicate placed directly on the eigen OUTPUT
columns gets pushdown-substituted through the staged projections into
one expression large enough to overflow whole-stage codegen's 64 KB
method limit (Spark then falls back to interpreted evaluation —
correct, but off the fast path). Aggregations, joins and writes over
the outputs stay fully codegen'd.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .outliers import RADIUS

#: centi-unit quantization of neighbor offsets (matches the cloud's
#: native 0.01 coordinate resolution)
_Q = 100.0


def _eigen_df(points: DataFrame, radius: float) -> DataFrame:
    """Shared staged pipeline through the closed-form eigenvalues:
    (x, y, z, n, cxx..cyz, qq, p2v, e1, e2, e3) per site, raw
    centi-unit² doubles. Both :func:`neighborhood_shape` and
    :func:`surface_normals` finish from this frame; Catalyst prunes
    whichever carried columns a consumer does not touch."""
    r = float(radius)
    if r <= 0:
        raise ValueError(f"need radius > 0, got {radius}")
    sites = points.groupBy("x", "y", "z").agg(F.count(F.lit(1)).alias("m"))
    cx = F.floor(F.col("x") / r).cast("long")
    cy = F.floor(F.col("y") / r).cast("long")
    # materialize the site table once: the probe fan-out and the join
    # build side both consume it, and the planner gave each its own
    # full scan+aggregate of the cloud (measured plan: two independent
    # HashAggregate chains over two parquet scans) (r12, guide §5).
    # persist(DISK_ONLY) in a session slot, not localCheckpoint (r13,
    # ADVICE): distinct (x,y,z) is ~N for a real cloud — corpus-sized
    # at 100 TB — so the materialization must keep a recomputable
    # lineage and stay out of executor memory. The eager count() fills
    # the cache once so the probe and build subtrees can't both miss
    # it cold (the knn_join_ivf stampede precedent).
    from ._matcache import swap_persisted

    sites = swap_persisted(
        "features.sites",
        sites.select("x", "y", "z", "m", cx.alias("cx"), cy.alias("cy")),
    )
    sites.count()
    offs = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    probes = (
        sites.withColumn("dxo", F.explode(offs))
        .withColumn("dyo", F.explode(offs))
        .select(
            F.col("x").alias("px"),
            F.col("y").alias("py"),
            F.col("z").alias("pz"),
            (F.col("cx") + F.col("dxo")).alias("ncx"),
            (F.col("cy") + F.col("dyo")).alias("ncy"),
        )
    )
    d2 = (F.col("x") - F.col("px")) * (F.col("x") - F.col("px")) + (
        F.col("y") - F.col("py")
    ) * (F.col("y") - F.col("py"))
    # SHUFFLE_HASH: sort-merge would SORT both shuffled sides and keep
    # 9×|candidates| rows in sort order nobody downstream uses —
    # measured 3.2× slower than hash (8.8 s vs 2.7 s at sf0.1). The
    # hash build side is one cell's site list per key (bounded by
    # density × cell², a data property independent of corpus size), so
    # the build fits memory at any scale and AQE still splits skew.
    pairs = probes.join(
        sites.select("x", "y", "z", "m", "cx", "cy").hint("SHUFFLE_HASH"),
        (F.col("cx") == F.col("ncx")) & (F.col("cy") == F.col("ncy")),
    ).filter(d2 <= r * r)
    # exact integer centi-offsets relative to the probe site
    dx = F.round((F.col("x") - F.col("px")) * _Q).cast("long")
    dy = F.round((F.col("y") - F.col("py")) * _Q).cast("long")
    dz = F.round((F.col("z") - F.col("pz")) * _Q).cast("long")
    m = F.col("m")
    sums = (
        pairs.select(
            "px",
            "py",
            "pz",
            m.alias("m"),
            (m * dx).alias("wx"),
            (m * dy).alias("wy"),
            (m * dz).alias("wz"),
            (m * dx * dx).alias("wxx"),
            (m * dy * dy).alias("wyy"),
            (m * dz * dz).alias("wzz"),
            (m * dx * dy).alias("wxy"),
            (m * dx * dz).alias("wxz"),
            (m * dy * dz).alias("wyz"),
        )
        .groupBy("px", "py", "pz")
        .agg(
            F.sum("m").alias("n"),
            F.sum("wx").alias("sx"),
            F.sum("wy").alias("sy"),
            F.sum("wz").alias("sz"),
            F.sum("wxx").alias("sxx"),
            F.sum("wyy").alias("syy"),
            F.sum("wzz").alias("szz"),
            F.sum("wxy").alias("sxy"),
            F.sum("wxz").alias("sxz"),
            F.sum("wyz").alias("syz"),
        )
    )

    n = F.col("n").cast("double")

    def cov(sab, sa, sb):
        return F.col(sab).cast("double") / n - (
            F.col(sa).cast("double") / n
        ) * (F.col(sb).cast("double") / n)

    c = sums.select(
        F.col("px").alias("x"),
        F.col("py").alias("y"),
        F.col("pz").alias("z"),
        F.col("n"),
        cov("sxx", "sx", "sx").alias("cxx"),
        cov("syy", "sy", "sy").alias("cyy"),
        cov("szz", "sz", "sz").alias("czz"),
        cov("sxy", "sx", "sy").alias("cxy"),
        cov("sxz", "sx", "sz").alias("cxz"),
        cov("syz", "sy", "sz").alias("cyz"),
    )
    # Smith's closed form for symmetric 3×3 eigenvalues — STAGED
    # projections with named intermediates (qq, p2v, pp, phi). Each
    # stage only references prior-stage attributes, so whole-stage
    # codegen emits each value once instead of re-expanding the full
    # tree per use (the naive single-expression form overflows the
    # 64 KB generated-method limit, which the test session makes
    # fatal). CollapseProject keeps the stages apart because each
    # alias is non-cheap and referenced more than once.
    covs = ["cxx", "cyy", "czz", "cxy", "cxz", "cyz"]
    q = (F.col("cxx") + F.col("cyy") + F.col("czz")) / 3.0
    s1 = c.select("x", "y", "z", "n", *covs, q.alias("qq"))
    p1 = (
        F.col("cxy") * F.col("cxy")
        + F.col("cxz") * F.col("cxz")
        + F.col("cyz") * F.col("cyz")
    )
    p2 = (
        (F.col("cxx") - F.col("qq")) * (F.col("cxx") - F.col("qq"))
        + (F.col("cyy") - F.col("qq")) * (F.col("cyy") - F.col("qq"))
        + (F.col("czz") - F.col("qq")) * (F.col("czz") - F.col("qq"))
        + 2.0 * p1
    )
    s2 = s1.select("x", "y", "z", "n", *covs, "qq", p2.alias("p2v"))
    s3 = s2.select(
        "x",
        "y",
        "z",
        "n",
        *covs,
        "qq",
        "p2v",
        F.sqrt(F.col("p2v") / 6.0).alias("pp"),
    )
    pp = F.col("pp")
    bxx, byy, bzz = (
        (F.col("cxx") - F.col("qq")) / pp,
        (F.col("cyy") - F.col("qq")) / pp,
        (F.col("czz") - F.col("qq")) / pp,
    )
    bxy, bxz, byz = F.col("cxy") / pp, F.col("cxz") / pp, F.col("cyz") / pp
    detb = (
        bxx * (byy * bzz - byz * byz)
        - bxy * (bxy * bzz - byz * bxz)
        + bxz * (bxy * byz - byy * bxz)
    )
    rr = F.least(F.greatest(detb / 2.0, F.lit(-1.0)), F.lit(1.0))
    # the degenerate guard must wrap phi HERE: rr divides by pp, and
    # with pp = 0 an unconditional column would raise under ANSI mode
    # (the divisions were lazily branch-guarded before the staging)
    s4 = s3.select(
        "x",
        "y",
        "z",
        "n",
        *covs,
        "qq",
        "p2v",
        "pp",
        F.when(F.col("p2v") <= F.lit(0.0), F.lit(0.0))
        .otherwise(F.acos(rr) / 3.0)
        .alias("phi"),
    )
    l1r = F.col("qq") + 2.0 * pp * F.cos(F.col("phi"))
    l3r = F.col("qq") + 2.0 * pp * F.cos(
        F.col("phi") + F.lit(2.0 * math.pi / 3.0)
    )
    deg = F.col("p2v") <= F.lit(0.0)
    s5 = s4.select(
        "x",
        "y",
        "z",
        "n",
        *covs,
        "qq",
        "p2v",
        F.when(deg, F.col("qq")).otherwise(l1r).alias("e1"),
        F.when(deg, F.col("qq")).otherwise(l3r).alias("e3"),
    )
    # e2 via the trace identity on the ALREADY-SELECTED e1/e3 — in the
    # non-degenerate branch e1/e3 hold exactly the λ1/λ3 doubles the
    # SQL twin's 3q − λ1 − λ3 uses, so the arithmetic is identical
    return s5.select(
        "x",
        "y",
        "z",
        "n",
        *covs,
        "p2v",
        "e1",
        F.when(F.col("p2v") <= F.lit(0.0), F.col("qq"))
        .otherwise(3.0 * F.col("qq") - F.col("e1") - F.col("e3"))
        .alias("e2"),
        "e3",
    )


def neighborhood_shape(
    points: DataFrame, radius: float = RADIUS
) -> DataFrame:
    """(x, y, z, n, l1, l2, l3, linearity, planarity, sphericity) per
    distinct site — eigenvalues (m², descending) of the 3D covariance
    of the planimetric-``radius`` neighborhood, and the Weinmann shape
    ratios. Degenerate neighborhoods (all mass at one point) report
    zero eigenvalues and 0.0 ratios."""
    e = _eigen_df(points, radius)
    pos = F.col("e1") > 0.0
    return e.select(
        "x",
        "y",
        "z",
        "n",
        # centi-units² → m²; "+ 0.0" collapses IEEE −0.0 so both
        # engines emit the identical bit pattern for zero
        (F.round(F.col("e1") / 10000.0, 6) + 0.0).alias("l1"),
        (F.round(F.col("e2") / 10000.0, 6) + 0.0).alias("l2"),
        (F.round(F.col("e3") / 10000.0, 6) + 0.0).alias("l3"),
        (F.round(
            F.when(pos, (F.col("e1") - F.col("e2")) / F.col("e1")).otherwise(
                0.0
            ),
            6,
        ) + 0.0).alias("linearity"),
        (F.round(
            F.when(pos, (F.col("e2") - F.col("e3")) / F.col("e1")).otherwise(
                0.0
            ),
            6,
        ) + 0.0).alias("planarity"),
        (F.round(
            F.when(pos, F.col("e3") / F.col("e1")).otherwise(0.0), 6
        ) + 0.0).alias("sphericity"),
    )


def surface_normals(points: DataFrame, radius: float = RADIUS) -> DataFrame:
    """(x, y, z, n, nx, ny, nz, verticality) per site — the unit
    surface normal of each planimetric-``radius`` neighborhood: the
    eigenvector of the smallest covariance eigenvalue λ3, computed in
    closed form as the largest cross product of rows of (C − λ3·I)
    (the standard analytic eigenvector for a symmetric 3×3 — no
    iteration, so the DuckDB twin reproduces it bit-for-bit).
    ``verticality`` = 1 − |nz| (Weinmann): 0 on flat ground, →1 on
    walls.

    Orientation: normals flip to the +z hemisphere (then +y, +x on
    exact-horizontal ties) — the deterministic convention every
    downstream consumer needs. Isotropic/degenerate neighborhoods
    (zero cross products) report the vertical (0, 0, 1).

    Plan: identical shuffle shape to :func:`neighborhood_shape` (the
    shared `_eigen_df` staged pipeline); everything past the one
    site aggregation is map-side staged projections."""
    e = _eigen_df(points, radius)
    lam = F.col("e3")
    a = e.select(
        "x",
        "y",
        "z",
        "n",
        "cxy",
        "cxz",
        "cyz",
        (F.col("cxx") - lam).alias("a11"),
        (F.col("cyy") - lam).alias("a22"),
        (F.col("czz") - lam).alias("a33"),
    )
    # cross products of the three row pairs of (C - λI)
    v = a.select(
        "x",
        "y",
        "z",
        "n",
        (F.col("cxy") * F.col("cyz") - F.col("cxz") * F.col("a22")).alias("vx12"),
        (F.col("cxz") * F.col("cxy") - F.col("a11") * F.col("cyz")).alias("vy12"),
        (F.col("a11") * F.col("a22") - F.col("cxy") * F.col("cxy")).alias("vz12"),
        (F.col("cxy") * F.col("a33") - F.col("cxz") * F.col("cyz")).alias("vx13"),
        (F.col("cxz") * F.col("cxz") - F.col("a11") * F.col("a33")).alias("vy13"),
        (F.col("a11") * F.col("cyz") - F.col("cxy") * F.col("cxz")).alias("vz13"),
        (F.col("a22") * F.col("a33") - F.col("cyz") * F.col("cyz")).alias("vx23"),
        (F.col("cyz") * F.col("cxz") - F.col("cxy") * F.col("a33")).alias("vy23"),
        (F.col("cxy") * F.col("cyz") - F.col("a22") * F.col("cxz")).alias("vz23"),
    )

    def n2(sfx):
        return (
            F.col(f"vx{sfx}") * F.col(f"vx{sfx}")
            + F.col(f"vy{sfx}") * F.col(f"vy{sfx}")
            + F.col(f"vz{sfx}") * F.col(f"vz{sfx}")
        )

    nn = v.select(
        "x", "y", "z", "n",
        *[c for c in v.columns if c.startswith("v")],
        n2("12").alias("n12"),
        n2("13").alias("n13"),
        n2("23").alias("n23"),
    )
    pick12 = (F.col("n12") >= F.col("n13")) & (F.col("n12") >= F.col("n23"))
    pick13 = F.col("n13") >= F.col("n23")

    def chosen(axis):
        return (
            F.when(pick12, F.col(f"v{axis}12"))
            .when(pick13, F.col(f"v{axis}13"))
            .otherwise(F.col(f"v{axis}23"))
        )

    ch = nn.select(
        "x", "y", "z", "n",
        chosen("x").alias("wx"),
        chosen("y").alias("wy"),
        chosen("z").alias("wz"),
        F.when(pick12, F.col("n12"))
        .when(pick13, F.col("n13"))
        .otherwise(F.col("n23"))
        .alias("w2"),
    )
    flip = (
        F.when(F.col("wz") < 0.0, F.lit(-1.0))
        .when(
            (F.col("wz") == 0.0) & (F.col("wy") < 0.0), F.lit(-1.0)
        )
        .when(
            (F.col("wz") == 0.0)
            & (F.col("wy") == 0.0)
            & (F.col("wx") < 0.0),
            F.lit(-1.0),
        )
        .otherwise(F.lit(1.0))
    )
    nrm = ch.select(
        "x", "y", "z", "n", "wx", "wy", "wz", "w2",
        F.sqrt(F.col("w2")).alias("nv"),
        flip.alias("s"),
    )
    good = F.col("w2") > 0.0

    def unit(axis, fallback):
        return F.round(
            F.when(
                good, (F.col("s") * F.col(axis)) / F.col("nv")
            ).otherwise(F.lit(fallback)),
            6,
        ) + 0.0

    return nrm.select(
        "x",
        "y",
        "z",
        "n",
        unit("wx", 0.0).alias("nx"),
        unit("wy", 0.0).alias("ny"),
        unit("wz", 1.0).alias("nz"),
        (
            F.round(
                F.when(
                    good,
                    1.0 - F.abs((F.col("s") * F.col("wz")) / F.col("nv")),
                ).otherwise(F.lit(0.0)),
                6,
            )
            + 0.0
        ).alias("verticality"),
    )


def _eigen_exprs() -> tuple[str, str, str]:
    """The closed-form eigenvalue expressions over the covs columns —
    shared by the shape and normals oracle twins."""
    q3 = "((cxx + cyy + czz) / 3.0)"
    p1 = "(cxy*cxy + cxz*cxz + cyz*cyz)"
    p2 = (
        f"((cxx - {q3})*(cxx - {q3}) + (cyy - {q3})*(cyy - {q3}) "
        f"+ (czz - {q3})*(czz - {q3}) + 2.0*{p1})"
    )
    p = f"sqrt({p2} / 6.0)"
    bxx, byy, bzz = (
        f"((cxx - {q3}) / {p})",
        f"((cyy - {q3}) / {p})",
        f"((czz - {q3}) / {p})",
    )
    bxy, bxz, byz = f"(cxy / {p})", f"(cxz / {p})", f"(cyz / {p})"
    detb = (
        f"({bxx}*({byy}*{bzz} - {byz}*{byz}) "
        f"- {bxy}*({bxy}*{bzz} - {byz}*{bxz}) "
        f"+ {bxz}*({bxy}*{byz} - {byy}*{bxz}))"
    )
    rr = f"least(greatest({detb} / 2.0, -1.0), 1.0)"
    phi = f"(acos({rr}) / 3.0)"
    l1 = f"({q3} + 2.0*{p}*cos({phi}))"
    l3 = f"({q3} + 2.0*{p}*cos({phi} + {2.0 * math.pi / 3.0!r}))"
    l2 = f"(3.0*{q3} - {l1} - {l3})"
    deg = f"{p2} <= 0.0"
    e1 = f"CASE WHEN {deg} THEN {q3} ELSE {l1} END"
    e2 = f"CASE WHEN {deg} THEN {q3} ELSE {l2} END"
    e3 = f"CASE WHEN {deg} THEN {q3} ELSE {l3} END"
    return e1, e2, e3


def _eigen_cte_sql(points_cte: str, radius: float) -> str:
    """CTE chain through the per-site covariances (token-for-token the
    Spark `_eigen_df` arithmetic)."""
    r = float(radius)
    return f"""
{points_cte},
sites AS (SELECT x, y, z, count(*) AS m FROM points GROUP BY 1, 2, 3),
cells AS (SELECT x, y, z, m,
                 CAST(floor(x / {r!r}) AS BIGINT) AS cx,
                 CAST(floor(y / {r!r}) AS BIGINT) AS cy
          FROM sites),
probes AS (SELECT c.x AS px, c.y AS py, c.z AS pz,
                  c.cx + dx.d AS ncx, c.cy + dy.d AS ncy
           FROM cells c,
                (VALUES (-1), (0), (1)) dx(d),
                (VALUES (-1), (0), (1)) dy(d)),
pairs AS (SELECT p.px, p.py, p.pz, s.m,
                 CAST(round((s.x - p.px) * {_Q!r}) AS BIGINT) AS dx,
                 CAST(round((s.y - p.py) * {_Q!r}) AS BIGINT) AS dy,
                 CAST(round((s.z - p.pz) * {_Q!r}) AS BIGINT) AS dz
          FROM probes p JOIN cells s
            ON s.cx = p.ncx AND s.cy = p.ncy
           AND (s.x - p.px) * (s.x - p.px)
             + (s.y - p.py) * (s.y - p.py) <= {r!r} * {r!r}),
sums AS (SELECT px, py, pz,
                CAST(sum(m) AS BIGINT) AS n,
                sum(m * dx) AS sx, sum(m * dy) AS sy, sum(m * dz) AS sz,
                sum(m * dx * dx) AS sxx, sum(m * dy * dy) AS syy,
                sum(m * dz * dz) AS szz,
                sum(m * dx * dy) AS sxy, sum(m * dx * dz) AS sxz,
                sum(m * dy * dz) AS syz
         FROM pairs GROUP BY 1, 2, 3),
covs AS (SELECT px AS x, py AS y, pz AS z, n,
  CAST(sxx AS DOUBLE)/CAST(n AS DOUBLE)
    - (CAST(sx AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(sx AS DOUBLE)/CAST(n AS DOUBLE)) AS cxx,
  CAST(syy AS DOUBLE)/CAST(n AS DOUBLE)
    - (CAST(sy AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(sy AS DOUBLE)/CAST(n AS DOUBLE)) AS cyy,
  CAST(szz AS DOUBLE)/CAST(n AS DOUBLE)
    - (CAST(sz AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(sz AS DOUBLE)/CAST(n AS DOUBLE)) AS czz,
  CAST(sxy AS DOUBLE)/CAST(n AS DOUBLE)
    - (CAST(sx AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(sy AS DOUBLE)/CAST(n AS DOUBLE)) AS cxy,
  CAST(sxz AS DOUBLE)/CAST(n AS DOUBLE)
    - (CAST(sx AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(sz AS DOUBLE)/CAST(n AS DOUBLE)) AS cxz,
  CAST(syz AS DOUBLE)/CAST(n AS DOUBLE)
    - (CAST(sy AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(sz AS DOUBLE)/CAST(n AS DOUBLE)) AS cyz
  FROM sums)""".strip()


def neighborhood_shape_sql(points_cte: str, radius: float = RADIUS) -> str:
    """Oracle twin — the same cell grid, the same integer sums, the
    same closed-form eigen expressions, token for token."""
    e1, e2, e3 = _eigen_exprs()
    return f"""
{_eigen_cte_sql(points_cte, radius)},
eig AS (SELECT x, y, z, n, {e1} AS e1, {e2} AS e2, {e3} AS e3 FROM covs)
SELECT x, y, z, n,
  round(e1 / 10000.0, 6) + 0.0 AS l1,
  round(e2 / 10000.0, 6) + 0.0 AS l2,
  round(e3 / 10000.0, 6) + 0.0 AS l3,
  round(CASE WHEN e1 > 0.0 THEN (e1 - e2) / e1 ELSE 0.0 END, 6) + 0.0 AS linearity,
  round(CASE WHEN e1 > 0.0 THEN (e2 - e3) / e1 ELSE 0.0 END, 6) + 0.0 AS planarity,
  round(CASE WHEN e1 > 0.0 THEN e3 / e1 ELSE 0.0 END, 6) + 0.0 AS sphericity
FROM eig
""".strip()


def surface_normals_sql(points_cte: str, radius: float = RADIUS) -> str:
    """Oracle twin of :func:`surface_normals` — staged CTEs mirroring
    the Spark projections expression for expression."""
    _, _, e3 = _eigen_exprs()
    return f"""
{_eigen_cte_sql(points_cte, radius)},
eig AS (SELECT x, y, z, n, cxy, cxz, cyz, cxx, cyy, czz,
               {e3} AS e3 FROM covs),
a AS (SELECT x, y, z, n, cxy, cxz, cyz,
             cxx - e3 AS a11, cyy - e3 AS a22, czz - e3 AS a33 FROM eig),
v AS (SELECT x, y, z, n,
             cxy*cyz - cxz*a22 AS vx12,
             cxz*cxy - a11*cyz AS vy12,
             a11*a22 - cxy*cxy AS vz12,
             cxy*a33 - cxz*cyz AS vx13,
             cxz*cxz - a11*a33 AS vy13,
             a11*cyz - cxy*cxz AS vz13,
             a22*a33 - cyz*cyz AS vx23,
             cyz*cxz - cxy*a33 AS vy23,
             cxy*cyz - a22*cxz AS vz23
      FROM a),
nn AS (SELECT v.*,
              vx12*vx12 + vy12*vy12 + vz12*vz12 AS n12,
              vx13*vx13 + vy13*vy13 + vz13*vz13 AS n13,
              vx23*vx23 + vy23*vy23 + vz23*vz23 AS n23
       FROM v),
ch AS (SELECT x, y, z, n,
  CASE WHEN n12 >= n13 AND n12 >= n23 THEN vx12
       WHEN n13 >= n23 THEN vx13 ELSE vx23 END AS wx,
  CASE WHEN n12 >= n13 AND n12 >= n23 THEN vy12
       WHEN n13 >= n23 THEN vy13 ELSE vy23 END AS wy,
  CASE WHEN n12 >= n13 AND n12 >= n23 THEN vz12
       WHEN n13 >= n23 THEN vz13 ELSE vz23 END AS wz,
  CASE WHEN n12 >= n13 AND n12 >= n23 THEN n12
       WHEN n13 >= n23 THEN n13 ELSE n23 END AS w2
  FROM nn),
nrm AS (SELECT x, y, z, n, wx, wy, wz, w2, sqrt(w2) AS nv,
  CASE WHEN wz < 0.0 THEN CAST(-1.0 AS DOUBLE)
       WHEN wz = 0.0 AND wy < 0.0 THEN CAST(-1.0 AS DOUBLE)
       WHEN wz = 0.0 AND wy = 0.0 AND wx < 0.0 THEN CAST(-1.0 AS DOUBLE)
       ELSE CAST(1.0 AS DOUBLE) END AS s
  FROM ch)
SELECT x, y, z, n,
  round(CASE WHEN w2 > 0.0 THEN (s * wx) / nv ELSE 0.0 END, 6) + 0.0 AS nx,
  round(CASE WHEN w2 > 0.0 THEN (s * wy) / nv ELSE 0.0 END, 6) + 0.0 AS ny,
  round(CASE WHEN w2 > 0.0 THEN (s * wz) / nv ELSE 1.0 END, 6) + 0.0 AS nz,
  round(CASE WHEN w2 > 0.0 THEN 1.0 - abs((s * wz) / nv)
        ELSE 0.0 END, 6) + 0.0 AS verticality
FROM nrm
""".strip()
