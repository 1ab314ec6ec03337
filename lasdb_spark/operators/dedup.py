"""Deduplication operators for training-data pipelines.

Five families, each a first-class engine operator with a DuckDB-oracle
twin built from the same constants/arithmetic:

- exact            hash-groupBy on (normalized) content
- n-gram Jaccard   exact shingle-set similarity join (the ground truth)
- MinHash LSH      banded signatures over universal hashes mod 2^31-1
- SimHash          60-bit sign-of-sums fingerprint + Hamming pairs
- embedding cosine near-dup pairs on the embeddings table

Scale notes (100 TB): exact dedup is one shuffle on the hash key.
The exact Jaccard join explodes |docs|×|shingles| and self-joins — the
quadratic ground truth you only run on samples; MinHash LSH is the
scale path (candidates only from band-signature equality: shuffle is
O(docs×bands), then exact verification on the tiny candidate set).
SimHash pairs here use an all-pairs comparison for oracle parity; at
scale you'd band the fingerprint bits the same way LSH bands minhashes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import (
    MERSENNE31,
    md5_int60_col,
    md5_int60_sql,
    minhash_perm_coeffs,
)

SHINGLE_N = 3  # words per shingle
N_PERMS = 32
BAND_SIZE = 4  # → 8 bands of 4 rows
JACCARD_TAU = 0.8
SIMHASH_BITS = 60
# On the synthetic corpus (30-word shared vocab) simhash separation is
# weak — planted near-dups land at hamming 4-9 vs random pairs ≥6 — so
# ≤5 keeps the output meaningful (8 tight + 48 borderline pairs) while
# staying deterministic. Real corpora separate far more cleanly.
SIMHASH_MAX_HAMMING = 5


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------
def exact_dedup(docs: DataFrame) -> DataFrame:
    """Group identical texts: (text_hash, keeper_doc_id, n_docs).

    One hash aggregation — the canonical 100 TB exact-dedup shape
    (map-side partial agg + single shuffle on the digest)."""
    return (
        docs.select(F.md5(F.col("text")).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_docs"))
    )


def exact_dedup_sql() -> str:
    return (
        "SELECT md5(text) AS text_hash, min(doc_id) AS keeper_doc_id, "
        "count(*) AS n_docs FROM documents GROUP BY 1"
    )


# ---------------------------------------------------------------------------
# shingling (shared by Jaccard + MinHash)
# ---------------------------------------------------------------------------
def _parse_bytes(v: str, default: int) -> int:
    """Spark size-conf values arrive as '134217728b' / '128MB' / bare
    ints; parse all three shapes (fall back to ``default``)."""
    s = str(v).strip().lower()
    for suf, mult in (
        ("pb", 1 << 50), ("tb", 1 << 40), ("gb", 1 << 30), ("mb", 1 << 20),
        ("kb", 1 << 10), ("p", 1 << 50), ("t", 1 << 40), ("g", 1 << 30),
        ("m", 1 << 20), ("k", 1 << 10), ("b", 1),
    ):
        if s.endswith(suf):
            s = s[: -len(suf)]
            break
    else:
        mult = 1
    try:
        return int(s) * mult
    except ValueError:
        return default


def _spread(df: DataFrame) -> DataFrame:
    """Repartition ONLY under-split inputs (a single small parquet file
    reads as one partition and serializes every per-row op onto one
    core). On real datasets file splitting already provides
    parallelism and this is a no-op — no shuffle added at scale.

    Under-split detection uses the input file listing; ``df.rdd`` would
    convert the whole plan to an RDD on every call just to read a
    partition count. Few files does NOT mean few partitions — the scan
    splits large files every ``spark.sql.files.maxPartitionBytes`` — so
    local file sizes refine the estimate (a corpus stored as 8×1 GB
    files is NOT under-split and must not pay a full-corpus shuffle).
    Non-file sources (createDataFrame test inputs) fall back to the RDD
    conversion — they are tiny by construction."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    floor = max(target // 2, 2)
    files = df.inputFiles()
    if files:
        n = len(files)
        if n < floor:
            sizes = []
            for p in files:
                if p.startswith("file:"):
                    try:
                        sizes.append(os.path.getsize(p[len("file:"):]))
                    except OSError:
                        pass
            if len(sizes) == len(files):
                mpb = _parse_bytes(
                    spark.conf.get(
                        "spark.sql.files.maxPartitionBytes", "134217728b"
                    ),
                    128 << 20,
                )
                n = sum(-(-s // mpb) for s in sizes)
            # non-local listings keep the file count (conservative: a
            # remote store with few huge files may still repartition)
    else:
        n = df.rdd.getNumPartitions()
    if n < floor:
        return df.repartition(target)
    return df


def _spread_hash(df: DataFrame, *keys: str) -> DataFrame:
    """Keyed twin of :func:`_spread` (r13): hash-repartition an
    under-split input by ``keys`` instead of round-robin, so a
    downstream window/aggregation partitioned by the same keys reuses
    the exchange (guide §2.4) — same no-op-at-scale contract (the
    under-split test is identical; a well-split input pays nothing)."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    floor = max(target // 2, 2)
    files = df.inputFiles()
    if files:
        n = len(files)
        if n < floor:
            sizes = []
            for p in files:
                if p.startswith("file:"):
                    try:
                        sizes.append(os.path.getsize(p[len("file:"):]))
                    except OSError:
                        pass
            if len(sizes) == len(files):
                mpb = _parse_bytes(
                    spark.conf.get(
                        "spark.sql.files.maxPartitionBytes", "134217728b"
                    ),
                    128 << 20,
                )
                n = sum(-(-s // mpb) for s in sizes)
    else:
        n = df.rdd.getNumPartitions()
    if n < floor:
        return df.repartition(*[F.col(k) for k in keys])
    return df


def shingles(docs: DataFrame, n: int = SHINGLE_N) -> DataFrame:
    """(doc_id, shingle) — DISTINCT word n-grams, extracted in ONE
    compiled-regex pass per document.

    The n-grams are the capture of a zero-width word-start lookahead
    over whitespace-normalized text: Java regex finds every position
    where a word begins (`(?<![^ ])`) and n space-separated words
    follow, so overlapping windows come out of a single
    `regexp_extract_all` — whole-stage-codegen JVM work. The earlier
    sequence/transform/element_at formulation produced identical
    shingles but evaluated an INTERPRETED higher-order lambda per
    window (~2.3× slower measured at sf0.1, and the dominant map-side
    CPU of every dedup pipeline at scale). A doc with fewer than n
    tokens yields no shingles. The DuckDB twin keeps the
    list-comprehension form (RE2 has no lookaround) — outputs verified
    identical."""
    docs = _spread(docs)
    norm = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    pat = r"(?<![^ ])(?=(" + " ".join(["[^ ]+"] * n) + r"))"
    sh = F.regexp_extract_all(norm, F.lit(pat), F.lit(1))
    return docs.select("doc_id", F.explode(sh).alias("shingle")).distinct()


def shingles_sql(n: int = SHINGLE_N, src: str = "documents") -> str:
    """DuckDB twin: lateral unnest(range) over the token array.
    ``src`` retargets the corpus source (composed pipeline oracles
    point it at a survivor CTE instead of the raw table)."""
    parts = " || ' ' || ".join(f"toks[i + {k}]" for k in range(n))
    return f"""
SELECT DISTINCT doc_id, {parts} AS shingle
FROM (SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks FROM {src}) d,
     LATERAL (SELECT unnest(range(1, len(toks) - {n - 2}))) AS s(i)
""".strip()


# ---------------------------------------------------------------------------
# exact n-gram Jaccard similarity join
# ---------------------------------------------------------------------------
def ngram_jaccard_pairs(docs: DataFrame, tau: float = JACCARD_TAU) -> DataFrame:
    """(doc_a, doc_b, jac) for pairs with shingle-Jaccard ≥ tau, a < b."""
    sh = shingles(docs).cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast(
        "double"
    )
    # sizes is one row per doc — corpus-sized, so no broadcast hint:
    # AQE broadcasts the smaller side (usually the pair table) when it
    # fits and degrades to a shuffle join when nothing does.
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jac"))
        .filter(F.col("jac") >= tau)
    )


def ngram_jaccard_pairs_sql(tau: float = JACCARD_TAU) -> str:
    return f"""
WITH sh AS ({shingles_sql()}),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       round(n_inter / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6) AS jac
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(n_inter / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6) >= {tau}
""".strip()


def jaccard_search(
    docs: DataFrame, query_doc_id: int, k: int = 10, n: int = SHINGLE_N
) -> DataFrame:
    """Top-``k`` most similar documents to ONE query document by EXACT
    shingle Jaccard — the "find near-copies of this doc" lookup, the
    text analog of :func:`lasdb_spark.operators.similarity.topk_bruteforce`.

    Scale shape: the query's shingle set is a single document (bounded,
    broadcast by construction — NOT an SF-scaling table, so the forced
    hint is safe); the corpus side computes per-doc size and
    intersection in ONE groupBy over its shingles via a broadcast hash
    join membership flag; the top-k is a TakeOrdered, never a global
    sort. Total cost: one corpus shingle scan + one doc_id shuffle,
    independent of k and of the query.

    Ties at the boundary break on doc_id, so the result is
    deterministic and the DuckDB oracle reproduces it exactly. A query
    doc with fewer than ``n`` tokens has no shingles → empty result."""
    sh = shingles(docs, n)
    qsh = (
        sh.filter(F.col("doc_id") == int(query_doc_id))
        .select(F.col("shingle").alias("qshingle"))
    )
    # the query's shingle count resolves eagerly: ONE bounded driver
    # action over a single document (same contract as kNN reading the
    # metadata bbox) — folding it into the plan as a 1-row join would
    # plan a BroadcastNestedLoopJoin, which the plan gates forbid
    n_q = qsh.count()
    if n_q == 0:
        return sh.sparkSession.createDataFrame([], "doc_id long, jac double")
    agg = (
        sh.join(F.broadcast(qsh), F.col("shingle") == F.col("qshingle"), "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.count("qshingle").alias("n_inter"),
        )
        .filter((F.col("n_inter") > 0) & (F.col("doc_id") != int(query_doc_id)))
    )
    jac = F.col("n_inter") / (
        F.col("n_sh") + F.lit(int(n_q)) - F.col("n_inter")
    ).cast("double")
    return (
        agg.select("doc_id", F.round(jac, 6).alias("jac"))
        .orderBy(F.col("jac").desc(), "doc_id")
        .limit(k)
    )


def jaccard_search_sql(
    query_doc_id: int, k: int = 10, n: int = SHINGLE_N
) -> str:
    return f"""
WITH sh AS ({shingles_sql(n)}),
q AS (SELECT shingle FROM sh WHERE doc_id = {int(query_doc_id)}),
nq AS (SELECT count(*) AS n_q FROM q),
agg AS (SELECT sh.doc_id, count(*) AS n_sh, count(q.shingle) AS n_inter
        FROM sh LEFT JOIN q ON sh.shingle = q.shingle
        GROUP BY 1)
SELECT doc_id, round(n_inter / CAST(n_sh + n_q - n_inter AS DOUBLE), 6) AS jac
FROM agg, nq
WHERE n_inter > 0 AND doc_id <> {int(query_doc_id)}
ORDER BY jac DESC, doc_id LIMIT {int(k)}
""".strip()


# ---------------------------------------------------------------------------
# exact-duplicate collapse (skew armor for all banded candidate generation)
# ---------------------------------------------------------------------------
def _exact_groups(docs: DataFrame) -> DataFrame:
    """(doc_id, rep_id): each doc mapped to the min doc_id sharing its
    exact text (md5). The banded pipelines run on REPRESENTATIVES only —
    real corpora contain clusters of thousands of byte-identical docs
    (boilerplate, mirrors), and every member of such a cluster shares
    every band signature, so banding raw docs makes the band self-join
    quadratic in the cluster size. Collapsing first bounds the join by
    the number of DISTINCT texts; membership expands back afterwards."""
    groups = docs.select("doc_id", F.md5(F.col("text")).alias("fp"))
    reps = groups.groupBy("fp").agg(F.min("doc_id").alias("rep_id"))
    return groups.join(reps, "fp").select("doc_id", "rep_id")


def _expand_rep_pairs(
    rep_pairs: DataFrame,
    members: DataFrame,
    within_groups: DataFrame,
    score_col: str,
    identical_score,
) -> DataFrame:
    """Expand representative-level pairs to all-doc pairs.

    cross-group: every (member of a, member of b) for each rep pair —
    the score is text-determined, so it carries over verbatim.
    within-group: all pairs inside an exact-dup group (``within_groups``
    = rep_ids whose text is eligible for the metric), scored
    ``identical_score`` (Jaccard 1, Hamming 0)."""
    ma = members.select(F.col("rep_id").alias("doc_a"), F.col("doc_id").alias("mem_a"))
    mb = members.select(F.col("rep_id").alias("doc_b"), F.col("doc_id").alias("mem_b"))
    cross = (
        rep_pairs.join(ma, "doc_a")
        .join(mb, "doc_b")
        .select(
            F.least("mem_a", "mem_b").alias("doc_a"),
            F.greatest("mem_a", "mem_b").alias("doc_b"),
            score_col,
        )
    )
    wm = members.join(
        within_groups, members["rep_id"] == within_groups["rep"], "leftsemi"
    )
    within = (
        wm.alias("x")
        .join(
            wm.alias("y"),
            (F.col("x.rep_id") == F.col("y.rep_id"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.lit(identical_score).alias(score_col),
        )
    )
    return cross.unionByName(within)


# ---------------------------------------------------------------------------
# MinHash + banded LSH
# ---------------------------------------------------------------------------
def minhash_signatures(
    docs: DataFrame, n_perms: int = N_PERMS, shingles_df: DataFrame | None = None
) -> DataFrame:
    """(doc_id, mh0..mh{n-1}) minhash values via universal hashing
    h_j(s) = (a_j·(sid mod p) + b_j) mod p over 60-bit shingle ids.

    WIDE shape on purpose: all n permutations are independent ``min``
    aggregates over the same shingle rows — ONE shuffle on doc_id with
    map-side partial mins, instead of exploding |shingles|×n rows
    through a perms cross-join (measured 1.5× end-to-end on the LSH
    pipeline, and the gap widens with corpus size)."""
    coeffs = minhash_perm_coeffs(n_perms)
    sh = (shingles_df if shingles_df is not None else shingles(docs)).withColumn(
        "sid", md5_int60_col(F.col("shingle")) % MERSENNE31
    )
    return sh.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("sid") + F.lit(b)) % MERSENNE31).alias(f"mh{j}")
            for j, (a, b) in enumerate(coeffs)
        ]
    )


#: collapse='auto' engages the armor only when some exact-dup group has
#: at least this many members. Small groups (pairs, triples) pass
#: through the band join harmlessly — it is the thousand-member
#: boilerplate clusters that turn band buckets quadratic.
DUP_COLLAPSE_THRESHOLD = 16


#: memo for _needs_dup_collapse keyed per corpus — the stat is a full
#: corpus scan, and one pipeline triggers it several times (pairs →
#: clusters → keepers → curate all start from the same docs table)
_DUP_STAT_CACHE: dict = {}


def _corpus_key(docs: DataFrame):
    """Cache key identifying the corpus: the input file set when the
    DataFrame reads files (stable across re-reads of the same table),
    else the plan's semantic hash. The cached stat gates a
    PERFORMANCE-ONLY choice (collapse armor on/off — output identical
    either way), so a collision can never corrupt results."""
    files = docs.inputFiles()
    if files:
        return tuple(sorted(files))
    try:
        return ("sem", docs.semanticHash())
    except Exception:
        return None


def _needs_dup_collapse(docs: DataFrame) -> bool:
    """Driver-side stat for collapse='auto': the LARGEST exact-dup
    group size (one md5 groupBy + max). A band bucket holding an m-doc
    identical cluster yields m(m-1)/2 candidate rows per band, so the
    armor pays off once m is tens+; below that its extra collapse/
    expand joins (real plan+codegen cost) would outweigh the savings.

    Memoized per corpus (see :data:`_DUP_STAT_CACHE`): at 100 TB this
    is a full pass over the corpus, and a curation pipeline would
    otherwise re-pay it for every operator that layers on banded
    candidate generation."""
    key = _corpus_key(docs)
    if key is not None and key in _DUP_STAT_CACHE:
        return _DUP_STAT_CACHE[key]
    row = (
        docs.groupBy(F.md5(F.col("text")).alias("fp"))
        .agg(F.count(F.lit(1)).alias("m"))
        .agg(F.max("m").alias("mx"))
        .first()
    )
    out = (row.mx or 0) >= DUP_COLLAPSE_THRESHOLD
    if key is not None:
        if len(_DUP_STAT_CACHE) > 64:
            _DUP_STAT_CACHE.clear()
        _DUP_STAT_CACHE[key] = out
    return out


def minhash_lsh_pairs(
    docs: DataFrame,
    tau: float = JACCARD_TAU,
    n_perms: int = N_PERMS,
    band_size: int = BAND_SIZE,
    collapse: str = "auto",
    candidates: str = "all",
) -> DataFrame:
    """Banded-LSH candidate pairs verified by exact Jaccard ≥ tau.

    Scale path: shuffle O(docs × bands) on band signatures; exact
    verification only on candidates (vs the all-pairs shingle join).
    Skew armor (``collapse`` ∈ auto/always/never): exact duplicates
    collapse to one representative BEFORE banding (see
    :func:`_exact_groups`) — a thousand identical docs contribute ONE
    row per band instead of a 10^6-pair band self-join — and the final
    pair set expands back to all members, so the output is identical
    to banding the raw corpus. 'auto' engages it only when a one-pass
    stat finds exact dups.

    ``candidates``: 'all' (default) emits every in-bucket pair — the
    complete pair set the oracle checks, inherently quadratic in
    NEAR-dup cluster size (byte-identical clusters are handled by the
    collapse above; near-identical ones are not collapsible). For
    clustering at scale, 'adjacent' emits only sorted-adjacent pairs
    per bucket: candidates drop from Σ|bucket|² to Σ|bucket| while a
    near-dup cluster sharing a bucket stays CONNECTED through its
    verification-passing chain, so connected components are preserved
    whenever adjacent members verify (true for the tight clusters that
    cause the blowup). Use for :func:`dedup_clusters` on huge corpora,
    not for exhaustive pair reports."""
    if collapse == "auto":
        collapse = "always" if _needs_dup_collapse(docs) else "never"
    if collapse == "never":
        return _minhash_banded_pairs(docs, tau, n_perms, band_size, candidates)[0]
    members = _exact_groups(docs).cache()
    rep_docs = docs.join(
        members.filter(F.col("doc_id") == F.col("rep_id")).select("doc_id"),
        "doc_id",
        "leftsemi",
    )
    rep_pairs, sig = _minhash_banded_pairs(
        rep_docs, tau, n_perms, band_size, candidates
    )
    # reps with a signature = reps with >= n tokens; only their groups
    # produce within-group (jac exactly 1.0) pairs
    eligible = sig.select(F.col("doc_id").alias("rep"))
    return _expand_rep_pairs(rep_pairs, members, eligible, "jac", 1.0)


def _minhash_banded_pairs(
    docs: DataFrame, tau: float, n_perms: int, band_size: int,
    candidates: str = "all",
) -> tuple:
    """Core banded pipeline on (already collapse-free) docs.

    Returns (verified pairs, cached signature table)."""
    sh = shingles(docs).cache()  # reused: signatures, both verify join sides
    # ONE aggregation produces the 32 signature mins AND the shingle
    # count — sizes ride along instead of a second full shuffle of the
    # shingle set (the largest intermediate in the pipeline).
    coeffs = minhash_perm_coeffs(n_perms)
    sid = sh.withColumn("sid", md5_int60_col(F.col("shingle")) % MERSENNE31)
    sig = sid.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("sid") + F.lit(b)) % MERSENNE31).alias(f"mh{j}")
            for j, (a, b) in enumerate(coeffs)
        ],
        F.count(F.lit(1)).alias("n_sh"),
    ).cache()  # one row per doc; feeds bands + both size joins
    sizes = sig.select("doc_id", "n_sh")
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
    if candidates == "adjacent":
        # linear candidates: sort each bucket, pair each doc with its
        # successor — Σ|bucket| rows, connectivity kept within buckets
        from pyspark.sql.window import Window

        w = Window.partitionBy("band", "sig").orderBy("doc_id")
        cands = (
            bands.withColumn("doc_b", F.lead("doc_id").over(w))
            .filter(F.col("doc_b").isNotNull())
            .select(F.col("doc_id").alias("doc_a"), "doc_b")
            .distinct()
        )
    else:
        a = bands.alias("a")
        b = bands.alias("b")
        cands = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.sig") == F.col("b.sig"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .distinct()
        )
    # verify ONLY the candidates (this is the whole point of LSH): the
    # exact-Jaccard join runs on |cands| pairs, not all shingle-sharing
    # pairs. Same jac arithmetic/rounding as ngram_jaccard_pairs.
    inter = (
        cands.join(sh.alias("sa"), cands["doc_a"] == F.col("sa.doc_id"))
        .join(
            sh.alias("sb"),
            (cands["doc_b"] == F.col("sb.doc_id"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast(
        "double"
    )
    # no broadcast hint on sizes (corpus-sized — one row per doc); the
    # verified-candidate table is the small side and AQE hashes it.
    pairs = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jac"))
        .filter(F.col("jac") >= tau)
    )
    return pairs, sig


def minhash_lsh_pairs_sql(
    tau: float = JACCARD_TAU,
    n_perms: int = N_PERMS,
    band_size: int = BAND_SIZE,
    src: str = "documents",
) -> str:
    coeffs = minhash_perm_coeffs(n_perms)
    mins = ", ".join(
        f"min(({a} * sid + {b}) % {MERSENNE31}) AS mh{j}"
        for j, (a, b) in enumerate(coeffs)
    )
    n_bands = n_perms // band_size
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, concat_ws('-', {cols}) AS bsig FROM sig".format(
            b=b,
            cols=", ".join(
                f"CAST(mh{b * band_size + k} AS VARCHAR)" for k in range(band_size)
            ),
        )
        for b in range(n_bands)
    )
    return f"""
WITH sh AS ({shingles_sql(src=src)}),
sid AS (SELECT doc_id, {md5_int60_sql('shingle')} % {MERSENNE31} AS sid FROM sh),
sig AS (SELECT doc_id, {mins} FROM sid GROUP BY 1),
bands AS ({band_rows}),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
  FROM cands c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       round(n_inter / CAST(za.n_sh + zb.n_sh - n_inter AS DOUBLE), 6) AS jac
FROM inter
JOIN sizes za ON za.doc_id = doc_a
JOIN sizes zb ON zb.doc_id = doc_b
WHERE round(n_inter / CAST(za.n_sh + zb.n_sh - n_inter AS DOUBLE), 6) >= {tau}
""".strip()


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash_fingerprints(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash) — sign-of-sums over per-token 60-bit hashes
    (token multiset, not set: multiplicities count)."""
    toks = _spread(docs).select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), F.lit(0))
        ).alias("tok"),
    ).withColumn("th", md5_int60_col(F.col("tok")))
    sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("th"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s{i}")
            for i in range(bits)
        ]
    )
    fp = None
    for i in range(bits):
        bit = F.when(F.col(f"s{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return sums.select("doc_id", fp.alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = SIMHASH_MAX_HAMMING,
    collapse: str = "auto",
    candidates: str = "all",
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs within Hamming distance.

    Banded candidate generation, NOT an all-pairs join: the 60-bit
    fingerprint splits into ``max_hamming + 1`` bands, and by
    pigeonhole any pair within the Hamming budget agrees exactly on at
    least one band — so the band-equality self-join has recall 1 and
    the output is identical to the quadratic plan. Candidates are then
    verified with one XOR/bit_count. Scale: shuffle is O(docs × bands)
    on short band keys (the same shape as MinHash LSH banding), never
    O(docs²). Exact duplicates collapse to a representative before
    banding (identical text ⇒ identical fingerprint ⇒ every band
    collides) and expand back afterwards — same skew armor,
    ``collapse`` and ``candidates`` semantics as
    :func:`minhash_lsh_pairs` ('adjacent' = linear per-bucket chains,
    components preserved for verification-passing clusters; note the
    pigeonhole recall-1 guarantee applies to the 'all' mode only)."""
    if collapse == "auto":
        collapse = "always" if _needs_dup_collapse(docs) else "never"
    if collapse == "never":
        return _simhash_banded_pairs(docs, max_hamming, candidates)[0]
    members = _exact_groups(docs).cache()
    rep_docs = docs.join(
        members.filter(F.col("doc_id") == F.col("rep_id")).select("doc_id"),
        "doc_id",
        "leftsemi",
    )
    rep_pairs, fp = _simhash_banded_pairs(rep_docs, max_hamming, candidates)
    # reps with a fingerprint = reps with >= 1 token (empty docs never
    # enter the token multiset and so never pair in the generic plan)
    eligible = fp.select(F.col("doc_id").alias("rep"))
    return _expand_rep_pairs(rep_pairs, members, eligible, "hamming", 0)


def _simhash_banded_pairs(
    docs: DataFrame, max_hamming: int, candidates: str = "all"
) -> tuple:
    """Core banded pipeline on (already collapse-free) docs.

    Returns (verified pairs, cached fingerprint table)."""
    n_bands = max_hamming + 1
    width = SIMHASH_BITS // n_bands
    widths = [width + (1 if b < SIMHASH_BITS % n_bands else 0) for b in range(n_bands)]
    offs = [sum(widths[:b]) for b in range(n_bands)]
    fp = simhash_fingerprints(docs).cache()
    band_vals = F.array(
        *[
            F.shiftright(F.col("simhash"), offs[b]).bitwiseAND(
                F.lit((1 << widths[b]) - 1)
            )
            for b in range(n_bands)
        ]
    )
    bands = fp.select("doc_id", F.posexplode(band_vals).alias("band", "val"))
    if candidates == "adjacent":
        from pyspark.sql.window import Window

        w = Window.partitionBy("band", "val").orderBy("doc_id")
        cands = (
            bands.withColumn("doc_b", F.lead("doc_id").over(w))
            .filter(F.col("doc_b").isNotNull())
            .select(F.col("doc_id").alias("doc_a"), "doc_b")
            .distinct()
        )
    else:
        a = bands.alias("a")
        b = bands.alias("b")
        cands = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.val") == F.col("b.val"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .distinct()
        )
    fa = fp.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"))
    fb = fp.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"))
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    pairs = (
        cands.join(fa, "doc_a")
        .join(fb, "doc_b")
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs, fp


def simhash_pairs_sql(
    max_hamming: int = SIMHASH_MAX_HAMMING, bits: int = SIMHASH_BITS
) -> str:
    sums = ", ".join(
        f"sum(CASE WHEN (th >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s{i}"
        for i in range(bits)
    )
    fp = " + ".join(f"(CASE WHEN s{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(bits))
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok FROM documents),
th AS (SELECT doc_id, {md5_int60_sql('tok')} AS th FROM toks),
sums AS (SELECT doc_id, {sums} FROM th GROUP BY 1),
fp AS (SELECT doc_id, {fp} AS simhash FROM sums)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
""".strip()


# ---------------------------------------------------------------------------
# dedup clustering: pairs → connected components → keeper per cluster
# ---------------------------------------------------------------------------
#: round cap for label propagation — with path halving each round
#: roughly HALVES the pointer depth, so 50 rounds cover components far
#: beyond any physical graph; hitting the cap means something is wrong
#: and is warned about, never silently returned.
_CC_MAX_ROUNDS = 50


def connected_components(pairs: DataFrame) -> DataFrame:
    """(doc_id, cluster_id) minimum-reachable-label components over an
    undirected edge list (doc_a, doc_b) — only nodes incident to an
    edge appear in the output.

    Spark-first iterative min-label propagation with PATH HALVING:
    each round takes the min over (own label, neighbors' labels, label
    OF the label) — the third term is pointer jumping, which contracts
    chains geometrically, so rounds scale with log(diameter) rather
    than diameter. That matters for ``candidates='adjacent'`` banding,
    where a near-dup cluster is connected as a sorted CHAIN (diameter =
    cluster size): plain propagation needs one round per hop and a
    1000-doc boilerplate cluster would silently split at any round
    cap; halving closes it in ~10. Each round is ONE job: the previous
    label rides along as a ``prev`` column, so the convergence check is
    a count over the round's own output (materializing it into cache)
    instead of a second join against the old labels — and
    ``localCheckpoint`` truncates lineage every few rounds."""
    spark = pairs.sparkSession
    try:
        nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except ValueError:  # e.g. "auto" under AQE-managed platforms
        nparts = spark.sparkContext.defaultParallelism
    # Union CONCATENATES partitions (cross + within + the symmetric
    # swap = 4× shuffle.partitions of mostly-tiny tasks); every loop
    # round would pay that task overhead twice. One repartition bounds
    # the count AND pre-hashes on doc_b — the per-round join key — so
    # the cached edge side never re-shuffles. localCheckpoint (eager)
    # materializes it once and drops the upstream (LSH) lineage from
    # the loop's plans.
    # Materialize the pair list ONCE before the symmetric union: the
    # union's two branches are separate subtrees, so checkpointing the
    # union directly would evaluate the (expensive, e.g. MinHash)
    # upstream twice — exchange reuse does not cross union branches
    # reliably.
    pairs = pairs.select("doc_a", "doc_b").localCheckpoint()
    edges = (
        pairs.unionByName(
            pairs.select(
                F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
            )
        )
        .repartition(nparts, "doc_b")
        .localCheckpoint()
    )
    # Size the loop's shuffles to the EDGE COUNT, not the session
    # default: the dup subgraph is usually orders of magnitude smaller
    # than the corpus, and per-round latency on a small graph is pure
    # task/stage overhead at the session's partition count. The count
    # is a scan of the checkpoint just built (cheap); at scale the
    # clamp keeps nparts unchanged, so behavior only differs where the
    # graph is small enough for overhead to dominate.
    n_edges = edges.count()
    tgt = max(2, min(nparts, (n_edges // 500_000) + 1))
    if tgt < nparts:
        edges = edges.repartition(tgt, "doc_b").localCheckpoint()
    # ``store`` is the persisted frame backing ``labels`` (labels may
    # be a projection over it) — unpersist must target the store.
    store = (
        edges.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .cache()
    )
    labels = store
    # Scope the session shuffle-partition conf to the loop (restored
    # in the finally below): every per-round join/agg plans at ``tgt``.
    old_parts = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", str(tgt))
    try:
        converged, labels, store = _cc_loop(edges, labels, store, 0)
    finally:
        if old_parts is None:
            spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    if not converged:
        import warnings

        warnings.warn(
            f"connected_components did not converge in {_CC_MAX_ROUNDS} "
            "rounds; cluster labels may be split. This should be "
            "unreachable with path halving — inspect the edge list.",
            RuntimeWarning,
            stacklevel=2,
        )
    # Pin the converged labels and release every loop-held block —
    # including the pairs/edges checkpoints, which are dead weight once
    # `final` is materialized — so repeated clustering runs in one
    # session don't accumulate storage.
    final = labels.localCheckpoint()
    store.unpersist()
    edges.unpersist()
    pairs.unpersist()
    return final


def _cc_loop(edges, labels, store, since_ckpt):
    """The min-label-propagation rounds of
    :func:`connected_components` (split out so the caller can scope
    session confs around it). Returns (converged, labels, store).

    Round 1's convergence count is skipped: any nonempty edge list
    relabels at least the larger endpoint of its minimum edge, so
    round 1 can never be the converged round — its output stays a
    lazily-cached plan that round 2's single count materializes
    together with its own."""
    converged = False
    pending = []  # cache-marked but not-yet-counted round outputs
    for rnd in range(_CC_MAX_ROUNDS):
        nbr = (
            edges.join(labels, edges["doc_b"] == labels["doc_id"])
            .groupBy("doc_a")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        stepped = labels.join(
            nbr, labels["doc_id"] == nbr["doc_a"], "left"
        ).select(
            "doc_id",
            F.least(
                F.col("cluster_id"),
                F.coalesce(F.col("nbr_min"), F.col("cluster_id")),
            ).alias("cluster_id"),
            F.col("cluster_id").alias("prev"),
        )
        # path halving: follow the label one more hop. cluster_id is
        # always itself a labelled node (labels start as self and only
        # ever move to other nodes' ids), so the self-join resolves.
        grand = labels.select(
            F.col("doc_id").alias("gp_node"), F.col("cluster_id").alias("gp_label")
        )
        stamped = stepped.join(
            grand, stepped["cluster_id"] == grand["gp_node"], "left"
        ).select(
            "doc_id",
            F.least(
                F.col("cluster_id"),
                F.coalesce(F.col("gp_label"), F.col("cluster_id")),
            ).alias("cluster_id"),
            "prev",
        )
        since_ckpt += 1
        if since_ckpt >= 4:
            stamped = stamped.localCheckpoint()
            since_ckpt = 0
        else:
            stamped = stamped.cache()
        if rnd == 0:
            # No action this round (see docstring); keep the previous
            # store alive until something downstream is materialized.
            pending.append(store)
            store = stamped
            labels = stamped.select("doc_id", "cluster_id")
            continue
        # ONE action per round: counting moved labels over the round's
        # own output both decides convergence and materializes the
        # cache the next round reads from.
        changed = stamped.filter(
            F.col("cluster_id") != F.col("prev")
        ).count()
        for p in pending:  # safe now: stamped is materialized
            p.unpersist()
        pending.clear()
        store.unpersist()
        store = stamped
        labels = stamped.select("doc_id", "cluster_id")
        if changed == 0:
            converged = True
            break
    return converged, labels, store


def dedup_clusters(
    docs: DataFrame,
    tau: float = JACCARD_TAU,
    candidates: str = "adjacent",
    collapse: str = "auto",
) -> DataFrame:
    """(doc_id, cluster_id) — connected components over the verified
    MinHash-LSH near-dup pairs; cluster_id = min doc_id reachable.
    Docs in no pair are their own singleton cluster. ``doc_id ==
    cluster_id`` selects the keeper.

    Propagation runs only over the edge-induced subgraph (a doc with
    no near-dup edge can never change label), so every round's joins
    are O(|dup docs|) not O(|corpus|); singletons re-enter at the end
    via one anti-join. See :func:`connected_components` for the loop.
    ``collapse``/``candidates`` pass through to
    :func:`minhash_lsh_pairs` (the corpus-level collapse stat is
    memoized, so layered calls pay it once).

    ``candidates`` defaults to ``'adjacent'`` here (unlike the pair
    diagnostics): clustering only needs CONNECTIVITY, not every edge,
    and the linear per-bucket candidate chain preserves the components
    while cutting the verify-join quadratically on wide buckets
    (test-gated: tests/test_dedup.py
    test_adjacent_candidates_preserve_clusters; path halving keeps
    chain diameters cheap). Pass ``candidates='all'`` to cluster over
    the full verified pair set."""
    pairs = minhash_lsh_pairs(
        docs, tau, collapse=collapse, candidates=candidates
    ).select("doc_a", "doc_b")
    final = connected_components(pairs)
    singletons = (
        docs.select("doc_id")
        .join(final.select("doc_id"), "doc_id", "left_anti")
        .withColumn("cluster_id", F.col("doc_id"))
    )
    return final.unionByName(singletons)


def dedup_clusters_sql(
    tau: float = JACCARD_TAU, src: str = "documents"
) -> str:
    """Recursive-CTE oracle: min label over the reachability closure."""
    return f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({minhash_lsh_pairs_sql(tau, src=src)}) p),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs),
reach AS (
  SELECT doc_id, doc_id AS label FROM {src}
  UNION
  SELECT e.dst AS doc_id, r.label
  FROM reach r JOIN edges e ON e.src = r.doc_id)
SELECT doc_id, min(label) AS cluster_id FROM reach GROUP BY 1
""".strip()


def dedup_keepers(
    docs: DataFrame,
    tau: float = JACCARD_TAU,
    clusters: DataFrame | None = None,
) -> DataFrame:
    """The DEDUPED corpus: one keeper doc per near-dup cluster
    (cluster_id == doc_id selects the minimum member), with its
    metadata — the actual output a training-data pipeline feeds
    downstream, not just the pair/cluster diagnostics.

    Scale: one semi-join on doc_id on top of :func:`dedup_clusters`
    (the keeper set is O(corpus), so it shuffles, never broadcasts);
    everything else rides the clustering pipeline. Pass a
    precomputed ``clusters`` (doc_id, cluster_id) to reuse one
    clustering across keepers/curation instead of re-running the LSH
    pipeline per consumer."""
    if clusters is None:
        clusters = dedup_clusters(docs, tau)
    keepers = clusters.filter(F.col("doc_id") == F.col("cluster_id"))
    return docs.join(keepers.select("doc_id"), "doc_id", "leftsemi").select(
        "doc_id", "lang", "source", "n_chars"
    )


def dedup_keepers_sql(tau: float = JACCARD_TAU) -> str:
    return f"""
WITH clusters AS ({dedup_clusters_sql(tau)})
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d
JOIN clusters c ON c.doc_id = d.doc_id AND c.cluster_id = d.doc_id
""".strip()


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------
# max pairwise cosine in the synthetic embeddings is ~0.51; 0.4 selects
# the top ~0.05% of pairs (a real near-dup threshold would be ~0.95)
EMB_TAU = 0.4
EMB_DIM = 64


def embedding_neardup_pairs(embs: DataFrame, tau: float = EMB_TAU) -> DataFrame:
    """(vec_a, vec_b, cos) pairs with cosine ≥ tau — exact all-pairs
    baseline (the oracle-checkable ground truth; LSH variant in
    :mod:`lasdb_spark.operators.similarity` is the scale path)."""
    from ..functions.hashing import fold_dot_col

    # norms once per vector — the all-pairs join then costs one dot/pair
    wn = embs.withColumn(
        "nrm", F.sqrt(fold_dot_col(F.col("embedding"), F.col("embedding")))
    )
    a = wn.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = wn.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    j = a.join(b, F.col("vec_a") < F.col("vec_b"))
    dot = fold_dot_col(F.col("ea"), F.col("eb"))
    cos = F.round(dot / (F.col("na") * F.col("nb")), 6)
    return (
        j.select("vec_a", "vec_b", cos.alias("cos"))
        .filter(F.col("cos") >= tau)
    )


def embedding_neardup_lsh(
    embs: DataFrame, tau: float = EMB_TAU, bits: int = 4
) -> DataFrame:
    """(vec_a, vec_b, cos) near-dup pairs restricted to a shared sign-LSH
    bucket — the SCALE path for :func:`embedding_neardup_pairs`.

    The all-pairs baseline is O(N²) dots; here candidates come from a
    bucket equi-join (shuffle on the short bucket key, |bucket|² work
    per bucket ≈ N²/2^bits total, tunable with ``bits``), and only
    candidates pay the exact-cosine verification. Recall is bounded by
    bucket collision — high-cosine pairs agree on most hyperplane signs,
    so real near-dups (cos ≥ 0.9) nearly always share the bucket; the
    same banding that MinHash LSH applies to shingles, applied to the
    embedding space. Reuses the deterministic hyperplanes from
    :mod:`lasdb_spark.operators.similarity`."""
    from ..functions.hashing import fold_dot_col
    from .similarity import lsh_bucket_col

    wn = embs.withColumn(
        "nrm", F.sqrt(fold_dot_col(F.col("embedding"), F.col("embedding")))
    ).withColumn("bucket", lsh_bucket_col(F.col("embedding"), bits))
    a = wn.select(
        "bucket",
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = wn.select(
        "bucket",
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    j = a.join(b, "bucket").filter(F.col("vec_a") < F.col("vec_b"))
    dot = fold_dot_col(F.col("ea"), F.col("eb"))
    cos = F.round(dot / (F.col("na") * F.col("nb")), 6)
    return (
        j.select("vec_a", "vec_b", cos.alias("cos"))
        .filter(F.col("cos") >= tau)
    )


def embedding_neardup_lsh_sql(
    tau: float = EMB_TAU, bits: int = 4, dim: int = EMB_DIM
) -> str:
    """Oracle twin: exact pairs restricted to shared buckets."""
    from ..functions.hashing import fold_product_sql
    from .similarity import hyperplane

    parts = []
    for b in range(bits):
        plane = "[" + ", ".join(repr(hyperplane(b, i)) for i in range(dim)) + "]"
        d = fold_product_sql("embedding", plane, dim)
        parts.append(f"(CASE WHEN {d} > 0 THEN {1 << b} ELSE 0 END)")
    bucket = "(" + " + ".join(parts) + ")"
    dot = fold_product_sql("a.embedding", "b.embedding", dim)
    nrm = f"sqrt({fold_product_sql('embedding', 'embedding', dim)})"
    return f"""
WITH wn AS (SELECT vec_id, embedding, {nrm} AS nrm, {bucket} AS bucket FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({dot} / (a.nrm * b.nrm), 6) AS cos
FROM wn a JOIN wn b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round({dot} / (a.nrm * b.nrm), 6) >= {tau}
""".strip()


def embedding_neardup_pairs_sql(tau: float = EMB_TAU, dim: int = EMB_DIM) -> str:
    from ..functions.hashing import fold_product_sql

    dot = fold_product_sql("a.embedding", "b.embedding", dim)
    nrm = f"sqrt({fold_product_sql('embedding', 'embedding', dim)})"
    return f"""
WITH wn AS (SELECT vec_id, embedding, {nrm} AS nrm FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({dot} / (a.nrm * b.nrm), 6) AS cos
FROM wn a JOIN wn b ON a.vec_id < b.vec_id
WHERE round({dot} / (a.nrm * b.nrm), 6) >= {tau}
""".strip()


# ---------------------------------------------------------------------------
# LSH self-evaluation: banded-candidate recall vs the exact sweep
# ---------------------------------------------------------------------------
def lsh_recall_report(docs: DataFrame, tau: float = JACCARD_TAU) -> DataFrame:
    """One row (n_exact, n_lsh, n_missed, recall) — the banded-LSH
    pair set audited against the exact all-pairs ground truth at the
    same tau. Both pipelines VERIFY with exact Jaccard, so LSH output
    is always a subset (precision 1 by construction); what banding can
    lose is recall — pairs whose signatures never collide in any band.
    This is the measurement a pipeline owner runs before trusting a
    banding configuration (n_perms, band_size) on a new corpus.

    Scale: the ground-truth side is the inherently quadratic
    shingle-sharing join — run the report on a SAMPLE of a huge corpus
    (its purpose is estimating a rate, not enumerating pairs); the LSH
    side is the production plan. The final counts are three one-row
    aggregates cross-joined — nothing corpus-sized leaves the
    executors."""
    exact = ngram_jaccard_pairs(docs, tau).select("doc_a", "doc_b")
    lsh = minhash_lsh_pairs(docs, tau).select("doc_a", "doc_b")
    common = lsh.join(exact, ["doc_a", "doc_b"], "leftsemi")
    ne = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    nl = lsh.agg(F.count(F.lit(1)).alias("n_lsh"))
    nc = common.agg(F.count(F.lit(1)).alias("n_common"))
    return (
        ne.crossJoin(nl)
        .crossJoin(nc)
        .select(
            "n_exact",
            "n_lsh",
            (F.col("n_exact") - F.col("n_common")).alias("n_missed"),
            F.round(
                F.when(F.col("n_exact") > 0,
                       F.col("n_common")
                       / F.col("n_exact").cast("double")).otherwise(1.0),
                6,
            ).alias("recall"),
        )
    )


def lsh_recall_report_sql(tau: float = JACCARD_TAU) -> str:
    return f"""
WITH e AS (SELECT doc_a, doc_b FROM ({ngram_jaccard_pairs_sql(tau)}) t),
l AS (SELECT doc_a, doc_b FROM ({minhash_lsh_pairs_sql(tau)}) t),
c AS (SELECT count(*) AS n_common FROM l JOIN e USING (doc_a, doc_b)),
ne AS (SELECT count(*) AS n_exact FROM e),
nl AS (SELECT count(*) AS n_lsh FROM l)
SELECT n_exact, n_lsh, n_exact - n_common AS n_missed,
       round(CASE WHEN n_exact > 0
                  THEN n_common / CAST(n_exact AS DOUBLE)
                  ELSE 1.0 END, 6) AS recall
FROM ne CROSS JOIN nl CROSS JOIN c
""".strip()


# ---------------------------------------------------------------------------
# chunk-level (sub-document) near-dup: duplicated passages ACROSS docs
# ---------------------------------------------------------------------------
#: composite chunk key = doc_id * CHUNK_KEY + chunk_id. Preconditions
#: (documented, not silently truncated): doc_id < 2^63 / CHUNK_KEY
#: ≈ 9.2e9 and chunk_id < CHUNK_KEY — far above any real corpus's
#: per-document chunk count.
CHUNK_KEY = 1_000_000_000


def chunk_neardup_pairs(
    docs: DataFrame, tau: float = JACCARD_TAU
) -> DataFrame:
    """(doc_a, chunk_a, doc_b, chunk_b, jac) — near-duplicate PASSAGES
    across different documents: chunk every doc into overlapping token
    windows (text.chunk_documents), then run the banded-MinHash
    pipeline over the chunk corpus and keep only cross-document hits.

    Whole-document MinHash misses a page that copies one paragraph
    from another source (the shared shingles drown in the rest); this
    is the RefinedWeb-style passage-granularity pass that catches it.
    Within-document pairs are EXCLUDED by construction — consecutive
    windows overlap by design (stride < chunk), so intra-doc "dups"
    are artifacts of the chunking, not signal.

    Scale: chunking is map-only fan-out (~len/stride rows); the
    MinHash stage inherits every scale property of
    :func:`minhash_lsh_pairs` (banded candidates, exact-dup collapse
    armor) over the chunk corpus."""
    from .text import chunk_documents

    chunks = chunk_documents(docs)
    cdocs = chunks.select(
        (F.col("doc_id") * CHUNK_KEY + F.col("chunk_id")).alias("doc_id"),
        F.col("chunk").alias("text"),
    )
    pairs = minhash_lsh_pairs(cdocs, tau)
    da = F.expr(f"doc_a div {CHUNK_KEY}")
    db = F.expr(f"doc_b div {CHUNK_KEY}")
    return (
        pairs.select(
            da.alias("da"),
            (F.col("doc_a") % CHUNK_KEY).cast("int").alias("chunk_a"),
            db.alias("db"),
            (F.col("doc_b") % CHUNK_KEY).cast("int").alias("chunk_b"),
            "jac",
        )
        .filter(F.col("da") != F.col("db"))
        .select(
            F.col("da").alias("doc_a"),
            "chunk_a",
            F.col("db").alias("doc_b"),
            "chunk_b",
            "jac",
        )
    )


def chunk_neardup_pairs_sql(tau: float = JACCARD_TAU) -> str:
    """Oracle twin — composes the chunking SQL with the MinHash SQL
    over a chunk-keyed CTE (stage generators take ``src`` parameters,
    per the curate.py composition rule)."""
    from .text import chunk_documents_sql

    return f"""
WITH chunks AS ({chunk_documents_sql()}),
cdocs AS (
  SELECT doc_id * {CHUNK_KEY} + chunk_id AS doc_id, chunk AS text
  FROM chunks),
cpairs AS ({minhash_lsh_pairs_sql(tau, src="cdocs")})
SELECT doc_a // {CHUNK_KEY} AS doc_a,
       CAST(doc_a % {CHUNK_KEY} AS INT) AS chunk_a,
       doc_b // {CHUNK_KEY} AS doc_b,
       CAST(doc_b % {CHUNK_KEY} AS INT) AS chunk_b,
       jac
FROM cpairs
WHERE doc_a // {CHUNK_KEY} != doc_b // {CHUNK_KEY}
""".strip()


# ---------------------------------------------------------------------------
# cross-corpus near-dup join: BOTH sides large (neither broadcastable)
# ---------------------------------------------------------------------------
def crosscorpus_neardup_pairs(
    docs_a: DataFrame, docs_b: DataFrame, tau: float = JACCARD_TAU
) -> DataFrame:
    """(a_id, b_id, jac) — near-duplicate documents ACROSS two large
    corpora (e.g. a new crawl vs the existing training set). Distinct
    from :mod:`decontaminate` in scale shape: decontamination
    broadcasts a small eval set; here NEITHER side fits in a
    broadcast, so both flow through one shared banded-MinHash pipeline
    (side encoded in the low id bit) and only cross-side pairs
    survive.

    Scale: identical to :func:`minhash_lsh_pairs` over |A|+|B| docs —
    one shingle shuffle, banded candidates, verify-candidates-only,
    exact-dup collapse armor (an A document byte-identical to a B
    document collapses to one banded representative and the pair is
    restored by group expansion, which is why the side filter runs on
    the FINAL pairs, after expansion — filtering candidates would drop
    groups whose representatives share a side). Id space: both inputs
    must have NON-NEGATIVE doc_id < 2^62 (the side bit doubles ids,
    and the parity filter assumes non-negative modulo semantics); ids
    may overlap between corpora — the side bit disambiguates."""
    u = docs_a.select(
        (F.col("doc_id") * 2).alias("doc_id"), "text"
    ).unionByName(
        docs_b.select((F.col("doc_id") * 2 + 1).alias("doc_id"), "text")
    )
    pairs = minhash_lsh_pairs(u, tau)
    cross = pairs.filter(F.col("doc_a") % 2 != F.col("doc_b") % 2)
    a_key = F.when(
        F.col("doc_a") % 2 == 0, F.col("doc_a")
    ).otherwise(F.col("doc_b"))
    b_key = F.when(
        F.col("doc_a") % 2 == 1, F.col("doc_a")
    ).otherwise(F.col("doc_b"))
    return cross.select(
        a_key.alias("ak"), b_key.alias("bk"), "jac"
    ).select(
        F.expr("ak div 2").alias("a_id"),
        F.expr("bk div 2").alias("b_id"),
        "jac",
    )


def crosscorpus_neardup_pairs_sql(
    tau: float = JACCARD_TAU,
    src_a: str = "SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0",
    src_b: str = "SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1",
) -> str:
    """Oracle twin: the same side-bit union feeds the plain banded
    pipeline (the Spark collapse is output-identical by design), then
    the cross-side filter + id unpack."""
    return f"""
WITH corpus_u AS (
  SELECT doc_id * 2 AS doc_id, text FROM ({src_a})
  UNION ALL
  SELECT doc_id * 2 + 1 AS doc_id, text FROM ({src_b})),
upairs AS ({minhash_lsh_pairs_sql(tau, src="corpus_u")})
SELECT (CASE WHEN doc_a % 2 = 0 THEN doc_a ELSE doc_b END) // 2 AS a_id,
       (CASE WHEN doc_a % 2 = 1 THEN doc_a ELSE doc_b END) // 2 AS b_id,
       jac
FROM upairs
WHERE doc_a % 2 != doc_b % 2
""".strip()


def containment_search(
    docs: DataFrame, query_doc_id: int, k: int = 10, n: int = SHINGLE_N
) -> DataFrame:
    """Top-``k`` documents by CONTAINMENT of the query document —
    |shingles(q) ∩ shingles(d)| / |shingles(q)| — the asymmetric
    cousin of :func:`jaccard_search`: a long document that quotes the
    whole query scores 1.0 here even though its Jaccard is tiny. This
    is the quote/plagiarism/subset-detection lookup (Broder's
    containment, the measure behind super-shingle search).

    Identical plan shape to jaccard_search (broadcast query shingles,
    ONE corpus groupBy, TakeOrdered) — only the denominator changes,
    so every scale property carries over unchanged."""
    sh = shingles(docs, n)
    qsh = sh.filter(F.col("doc_id") == int(query_doc_id)).select(
        F.col("shingle").alias("qshingle")
    )
    n_q = qsh.count()  # bounded: one document's shingles
    if n_q == 0:
        return sh.sparkSession.createDataFrame(
            [], "doc_id long, containment double"
        )
    agg = (
        sh.join(
            F.broadcast(qsh), F.col("shingle") == F.col("qshingle"), "left"
        )
        .groupBy("doc_id")
        .agg(F.count("qshingle").alias("n_inter"))
        .filter(
            (F.col("n_inter") > 0)
            & (F.col("doc_id") != int(query_doc_id))
        )
    )
    return (
        agg.select(
            "doc_id",
            F.round(
                F.col("n_inter") / F.lit(float(n_q)), 6
            ).alias("containment"),
        )
        .orderBy(F.col("containment").desc(), "doc_id")
        .limit(k)
    )


def containment_search_sql(
    query_doc_id: int, k: int = 10, n: int = SHINGLE_N
) -> str:
    return f"""
WITH sh AS ({shingles_sql(n)}),
q AS (SELECT shingle FROM sh WHERE doc_id = {int(query_doc_id)}),
nq AS (SELECT CAST(count(*) AS DOUBLE) AS n_q FROM q),
agg AS (SELECT sh.doc_id, count(q.shingle) AS n_inter
        FROM sh LEFT JOIN q ON sh.shingle = q.shingle
        GROUP BY 1)
SELECT doc_id, round(n_inter / n_q, 6) AS containment
FROM agg, nq
WHERE n_inter > 0 AND doc_id <> {int(query_doc_id)}
ORDER BY containment DESC, doc_id LIMIT {int(k)}
""".strip()


def cluster_size_histogram(
    docs: DataFrame, tau: float | None = None
) -> DataFrame:
    """(cluster_size, n_clusters, n_docs) — the duplication profile of
    the corpus: how many near-dup families exist at each size (size 1
    = unique documents).

    The dedup health metric operators watch over time: a fattening
    tail means the crawl is re-ingesting mirrors. Composes the
    standard clustering (adjacent-candidate scale mode) with two tiny
    aggregations — cost is the clustering itself."""
    tau = JACCARD_TAU if tau is None else tau
    clusters = dedup_clusters(docs, tau)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).cast("long").alias("n_clusters"))
        .select(
            F.col("cluster_size").cast("long").alias("cluster_size"),
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("long")
            .alias("n_docs"),
        )
        .orderBy("cluster_size")
    )


def cluster_size_histogram_sql(tau: float | None = None) -> str:
    tau = JACCARD_TAU if tau is None else tau
    return f"""
WITH clusters AS ({dedup_clusters_sql(tau)}),
sizes AS (
  SELECT cluster_id, count(*) AS cluster_size FROM clusters GROUP BY 1)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(cluster_size * count(*) AS BIGINT) AS n_docs
FROM sizes GROUP BY cluster_size
ORDER BY cluster_size
""".strip()


# ---------------------------------------------------------------------------
# Canonical-URL dedup (r7): the CommonCrawl-style cheapest dedup pass
# ---------------------------------------------------------------------------
# Before any content hashing, web pipelines collapse refetches of the
# SAME resource whose URLs differ only in canonically-irrelevant ways:
# scheme/host case, default ports, a www. prefix, trailing slashes,
# tracking parameters (utm_*, ref=), fragments, and query-parameter
# order. Both the messy-URL fixture and the canonicalizer are pure
# native column expressions (zero UDFs), replicated exactly in the
# DuckDB twin.


def make_url_corpus(docs: DataFrame) -> DataFrame:
    """(doc_id, url) — deterministic messy URLs: each doc derives a
    fetch URL whose *resource identity* is (site = doc_id%40,
    source, item = doc_id%200) but whose *spelling* varies by doc_id
    residues across the canonical equivalence axes: upper/lower
    scheme+host, explicit default port, www. prefix, trailing slash,
    tracking params, a fragment, and query-param order. Distinct docs
    that share a resource identity become true duplicates only a
    canonicalizer can see."""
    site = F.col("doc_id") % 40
    item = F.col("doc_id") % 200
    m2 = F.col("doc_id") % 2
    m3 = F.col("doc_id") % 3
    m4 = F.col("doc_id") % 4
    m5 = F.col("doc_id") % 5
    scheme = F.when(m3 == 0, F.lit("HTTP://")).otherwise(F.lit("http://"))
    host = F.concat(
        F.when(m2 == 0, F.lit("WWW.Site")).otherwise(F.lit("site")),
        site.cast("string"),
        F.when(m2 == 0, F.lit(".COM")).otherwise(F.lit(".com")),
    )
    port = F.when(m5 == 0, F.lit(":80")).otherwise(F.lit(""))
    path = F.concat(
        F.lit("/"),
        F.col("source"),
        F.lit("/item/"),
        item.cast("string"),
        F.when(m4 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    # two kept params whose ORDER flips, plus tracking noise
    kept_a = F.concat(F.lit("id="), item.cast("string"))
    kept_b = F.lit("lang=en")
    params = F.when(
        m2 == 0, F.concat(kept_a, F.lit("&"), kept_b)
    ).otherwise(F.concat(kept_b, F.lit("&"), kept_a))
    noise = F.when(
        m3 == 1, F.lit("&utm_source=feed&utm_medium=rss")
    ).otherwise(F.when(m3 == 2, F.lit("&ref=homepage")).otherwise(F.lit("")))
    frag = F.when(m4 == 2, F.lit("#section-2")).otherwise(F.lit(""))
    return docs.select(
        "doc_id",
        F.concat(
            scheme, host, port, path, F.lit("?"), params, noise, frag
        ).alias("url"),
    )


def url_canonical_dedup(docs: DataFrame) -> DataFrame:
    """(canonical_url, n_fetches, keeper_doc_id) — group the messy URL
    corpus by canonical resource key; ``keeper_doc_id`` is the min
    doc_id (first fetch wins), ``n_fetches`` counts the collapsed
    spellings. Canonicalization = drop fragment and scheme, lowercase
    host, strip default :80/:443 ports and a www. prefix, trim
    trailing slashes, drop utm_*/ref= tracking params, sort surviving
    query params — all native column expressions (zero UDFs), staged
    so each derived column is named once.

    Scale: one map-side canonicalization pass + ONE groupBy shuffle on
    the canonical key — the cheapest dedup pass in a web pipeline,
    run before any content hashing."""
    urls = make_url_corpus(docs)
    staged = (
        urls.withColumn("nofrag", F.substring_index(F.col("url"), "#", 1))
        .withColumn("rest", F.substring_index(F.col("nofrag"), "://", -1))
        .withColumn(
            "hostport", F.lower(F.substring_index(F.col("rest"), "/", 1))
        )
        .withColumn(
            "host",
            F.when(
                F.col("hostport").endswith(":80"),
                F.expr("substring(hostport, 1, length(hostport) - 3)"),
            )
            .when(
                F.col("hostport").endswith(":443"),
                F.expr("substring(hostport, 1, length(hostport) - 4)"),
            )
            .otherwise(F.col("hostport")),
        )
        .withColumn(
            "host_c",
            F.when(
                F.col("host").startswith("www."),
                F.expr("substring(host, 5)"),
            ).otherwise(F.col("host")),
        )
        .withColumn("pathq", F.expr("substring(rest, length(hostport) + 1)"))
        .withColumn(
            "path",
            F.regexp_replace(
                F.substring_index(F.col("pathq"), "?", 1), "/+$", ""
            ),
        )
        .withColumn(
            "query",
            F.when(
                F.col("pathq").contains("?"),
                F.substring_index(F.col("pathq"), "?", -1),
            ).otherwise(F.lit("")),
        )
        .withColumn(
            "kept",
            F.array_join(
                F.array_sort(
                    F.filter(
                        F.split(F.col("query"), "&"),
                        lambda x: (x != "")
                        & ~x.startswith("utm_")
                        & ~x.startswith("ref="),
                    )
                ),
                "&",
            ),
        )
        .withColumn(
            "canonical_url",
            F.concat(
                F.col("host_c"),
                F.col("path"),
                F.when(F.col("kept") == "", F.lit("")).otherwise(
                    F.concat(F.lit("?"), F.col("kept"))
                ),
            ),
        )
    )
    return (
        staged.groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_fetches"),
            F.min("doc_id").cast("long").alias("keeper_doc_id"),
        )
        .orderBy("canonical_url")
    )


def url_canonical_dedup_sql() -> str:
    """Oracle twin of :func:`url_canonical_dedup` — regenerates the
    messy URL fixture from documents and replays the identical
    canonicalization with DuckDB string/list functions."""
    return """
WITH urls AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 3 = 0 THEN 'HTTP://' ELSE 'http://' END)
         || (CASE WHEN doc_id % 2 = 0
                  THEN 'WWW.Site' || CAST(doc_id % 40 AS VARCHAR) || '.COM'
                  ELSE 'site' || CAST(doc_id % 40 AS VARCHAR) || '.com' END)
         || (CASE WHEN doc_id % 5 = 0 THEN ':80' ELSE '' END)
         || '/' || source || '/item/' || CAST(doc_id % 200 AS VARCHAR)
         || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
         || '?'
         || (CASE WHEN doc_id % 2 = 0
                  THEN 'id=' || CAST(doc_id % 200 AS VARCHAR) || '&lang=en'
                  ELSE 'lang=en&id=' || CAST(doc_id % 200 AS VARCHAR) END)
         || (CASE WHEN doc_id % 3 = 1 THEN '&utm_source=feed&utm_medium=rss'
                  WHEN doc_id % 3 = 2 THEN '&ref=homepage' ELSE '' END)
         || (CASE WHEN doc_id % 4 = 2 THEN '#section-2' ELSE '' END) AS url
  FROM documents),
st AS (
  SELECT doc_id,
         split_part(split_part(url, '#', 1), '://', 2) AS rest
  FROM urls),
hp AS (
  SELECT doc_id, rest, lower(split_part(rest, '/', 1)) AS hostport
  FROM st),
hs AS (
  SELECT doc_id, rest, hostport,
         CASE WHEN hostport LIKE '%:80'
              THEN substring(hostport, 1, length(hostport) - 3)
              WHEN hostport LIKE '%:443'
              THEN substring(hostport, 1, length(hostport) - 4)
              ELSE hostport END AS host
  FROM hp),
pq AS (
  SELECT doc_id,
         CASE WHEN host LIKE 'www.%' THEN substring(host, 5) ELSE host END
           AS host_c,
         substring(rest, length(hostport) + 1) AS pathq
  FROM hs),
parts AS (
  SELECT doc_id, host_c,
         regexp_replace(split_part(pathq, '?', 1), '/+$', '') AS path,
         CASE WHEN contains(pathq, '?') THEN split_part(pathq, '?', 2)
              ELSE '' END AS query
  FROM pq),
canon AS (
  SELECT doc_id, host_c || path ||
    (CASE WHEN kept = '' THEN '' ELSE '?' || kept END) AS canonical_url
  FROM (
    SELECT doc_id, host_c, path,
           array_to_string(
             list_sort(
               list_filter(str_split(query, '&'),
                 x -> x != '' AND NOT starts_with(x, 'utm_')
                      AND NOT starts_with(x, 'ref='))),
             '&') AS kept
    FROM parts))
SELECT canonical_url, CAST(count(*) AS BIGINT) AS n_fetches,
       CAST(min(doc_id) AS BIGINT) AS keeper_doc_id
FROM canon GROUP BY canonical_url ORDER BY canonical_url
""".strip()


DUPSPAN_WIDTH = 8  # tokens per window (the paper's 50-token unit, scaled to fixture docs)
DUPSPAN_MIN_DOCS = 2


def duplicate_spans(
    docs: DataFrame,
    width: int = DUPSPAN_WIDTH,
    min_docs: int = DUPSPAN_MIN_DOCS,
) -> DataFrame:
    """(doc_id, run_start, run_end, run_windows, span_tokens) — EXACT
    duplicated-substring detection, the third dedup granularity next
    to document-level (minhash_lsh_pairs) and chunk-level
    (chunk_neardup_pairs): maximal runs of ``width``-token windows
    whose exact content recurs in ≥ ``min_docs`` DISTINCT documents.
    This is the Spark-shaped equivalent of suffix-array substring
    dedup (Lee et al., "Deduplicating Training Data Makes Language
    Models Better"): boilerplate headers, license blocks, and copied
    passages surface as runs even when the containing documents are
    globally dissimilar.

    Plan: one map-only fan-out of every token position to its
    md5(window) (stride 1, like the paper), one groupBy(h) to find
    cross-document hashes, one join back (on the hash — uniform by
    construction, no skew), and one per-doc ordered window to stitch
    adjacent duplicated positions into maximal runs (pos − row_number
    islands). Fan-out is |tokens| rows regardless of width (the hash
    collapses the window). At 100 TB nothing is driver-side and every
    stage is partial-agg friendly; the output is bounded by the
    duplicated text volume, not the corpus.

    The fan-out feeds TWO consumers (the cross-doc groupBy and the
    join back), so it is persisted DISK_ONLY once: the expensive
    regexp-tokenize + per-position md5 stage runs exactly one scan of
    the corpus instead of two, and both consumers read the
    materialized (doc_id, pos, h) blocks. DISK_ONLY (not
    localCheckpoint) keeps the lineage recomputable — losing an
    executor re-derives its blocks instead of aborting the query.
    ``_spread`` parallelizes under-split inputs first (a no-op at real
    scale where file splitting already provides parallelism)."""
    toks = F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), F.lit(0))
    win = F.when(
        F.size(toks) >= width,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - width),
            lambda i: F.md5(
                F.array_join(F.slice(toks, i + 1, width), " ")
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    from pyspark import StorageLevel

    occ = (
        _spread(docs)
        .select("doc_id", F.posexplode(win).alias("pos", "h"))
        .persist(StorageLevel.DISK_ONLY)
    )
    dup_h = (
        occ.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("h")
    )
    from pyspark.sql import Window as W

    dup_occ = occ.join(dup_h, "h").select("doc_id", "pos")
    grp = F.col("pos") - F.row_number().over(
        W.partitionBy("doc_id").orderBy("pos")
    )
    runs = (
        dup_occ.withColumn("grp", grp)
        .groupBy("doc_id", "grp")
        .agg(
            F.min("pos").cast("long").alias("run_start"),
            F.max("pos").cast("long").alias("run_end"),
            F.count(F.lit(1)).cast("long").alias("run_windows"),
        )
        .select(
            "doc_id",
            "run_start",
            "run_end",
            "run_windows",
            (F.col("run_end") - F.col("run_start") + width)
            .cast("long")
            .alias("span_tokens"),
        )
        .orderBy("doc_id", "run_start")
    )
    return runs


def duplicate_spans_sql(
    width: int = DUPSPAN_WIDTH, min_docs: int = DUPSPAN_MIN_DOCS
) -> str:
    """Oracle twin of :func:`duplicate_spans`."""
    return f"""
WITH occ AS (
  SELECT doc_id, CAST(s.i AS BIGINT) AS pos,
         md5(array_to_string(toks[CAST(s.i AS INT) + 1 :
                                  CAST(s.i AS INT) + {width}], ' ')) AS h
  FROM (SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks
        FROM documents) d,
       LATERAL (SELECT unnest(range(0, len(toks) - {width} + 1))) AS s(i)),
dup_h AS (
  SELECT h FROM occ GROUP BY h
  HAVING count(DISTINCT doc_id) >= {min_docs}),
runs AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM occ JOIN dup_h USING (h))
SELECT doc_id, CAST(min(pos) AS BIGINT) AS run_start,
       CAST(max(pos) AS BIGINT) AS run_end,
       CAST(count(*) AS BIGINT) AS run_windows,
       CAST(max(pos) - min(pos) + {width} AS BIGINT) AS span_tokens
FROM runs GROUP BY doc_id, grp ORDER BY doc_id, run_start
""".strip()


# ---------------------------------------------------------------------------
# leakage-safe train/val/test split — assignment at near-dup-CLUSTER
# granularity (Lee et al. 2022 "Deduplicating Training Data Makes
# Language Models Better" documents the eval-contamination failure:
# a doc-granular hash split puts near-copies of training docs in the
# eval split, inflating benchmark numbers). Hashing the CLUSTER id
# instead guarantees every near-duplicate lands in the same split.
# ---------------------------------------------------------------------------


def corpus_split_safe(
    docs: DataFrame,
    tau: float = JACCARD_TAU,
    clusters: DataFrame | None = None,
) -> DataFrame:
    """(split, n_clusters, n_docs, n_tokens) — deterministic 90/5/5
    train/val/test split summary with assignment hashed on the
    near-dup CLUSTER id (``dedup_clusters``): members of one cluster
    can NEVER straddle splits, the no-leakage property the doc-hash
    :func:`~.text.corpus_split` cannot give (two near-dups hash
    independently there). Same salted-md5 permille cuts, so the two
    reports are directly comparable.

    Scale: the split tag is a map-side hash over the (doc_id,
    cluster_id) table the LSH clustering already produces — one extra
    broadcast-free join on doc_id + one partial-aggregated groupBy to
    3 rows. Pass a precomputed ``clusters`` to reuse one clustering
    across keepers / curation / this split (the dedup_keepers
    contract)."""
    from ..functions.hashing import md5_int60_col
    from .text import (
        SPLIT_TRAIN_PERMILLE,
        SPLIT_VAL_PERMILLE,
        TOKEN_RE,
        _n_matches,
    )

    if clusters is None:
        clusters = dedup_clusters(docs, tau)
    b = (
        md5_int60_col(
            F.concat(F.lit("split:"), F.col("cluster_id").cast("string"))
        )
        % 1000
    )
    split = (
        F.when(b < SPLIT_TRAIN_PERMILLE, "train")
        .when(b < SPLIT_VAL_PERMILLE, "val")
        .otherwise("test")
    )
    tagged = docs.join(clusters, "doc_id").select(
        split.alias("split"),
        "cluster_id",
        _n_matches(F.col("text"), TOKEN_RE).cast("long").alias("t"),
    )
    return (
        tagged.groupBy("split")
        .agg(
            F.countDistinct("cluster_id").cast("long").alias("n_clusters"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("t").cast("long").alias("n_tokens"),
        )
        .orderBy("split")
    )


def corpus_split_safe_sql(tau: float = JACCARD_TAU) -> str:
    from ..functions.hashing import md5_int60_sql
    from .text import SPLIT_TRAIN_PERMILLE, SPLIT_VAL_PERMILLE

    salted = "'split:' || CAST(cluster_id AS VARCHAR)"
    b = f"{md5_int60_sql(salted)} % 1000"
    return f"""
WITH clusters AS MATERIALIZED ({dedup_clusters_sql(tau)}),
tagged AS (
  SELECT CASE WHEN {b} < {SPLIT_TRAIN_PERMILLE} THEN 'train'
              WHEN {b} < {SPLIT_VAL_PERMILLE} THEN 'val'
              ELSE 'test' END AS split,
         c.cluster_id,
         CASE WHEN length(trim(d.text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(d.text), '\\s+'))
         END AS t
  FROM documents d JOIN clusters c ON c.doc_id = d.doc_id)
SELECT split, CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(t) AS BIGINT) AS n_tokens
FROM tagged GROUP BY 1
""".strip()


# ---------------------------------------------------------------------------
# contrastive triplet mining — (anchor, positive, negative) training
# triplets for embedding/retrieval models: positives are verified
# near-dup pairs (the hard-positive set a MinHash pipeline already
# produces), negatives are deterministic hash-bucket draws from the
# rest of the corpus, screened against the anchor's near-dup set so a
# "negative" is never actually a positive (the false-negative poison
# in contrastive training).
# ---------------------------------------------------------------------------
TRIPLET_NEG_BUCKETS = 64


def contrastive_triplets(
    docs: DataFrame,
    tau: float = JACCARD_TAU,
    n_buckets: int = TRIPLET_NEG_BUCKETS,
) -> DataFrame:
    """(anchor, positive, negative) — one triplet per verified
    near-dup pair: the pair is (anchor, positive); the negative is
    the smallest doc_id in the pair's salted-hash bucket that is
    neither pair member nor a near-dup of the anchor (pairs whose
    bucket holds no admissible doc are dropped). Fully deterministic:
    same corpus ⇒ same triplets across engines/runs/partitionings.

    Scale: the bucket join fans each pair out to ~N/``n_buckets``
    bucket members before the per-pair min — size ``n_buckets``
    proportional to the corpus (the LSH ``lsh_bits_for`` sizing rule)
    to keep buckets O(1); the near-dup screen is one anti-join on the
    (anchor, near-dup) edge set the pair pipeline already built."""
    from ..functions.hashing import md5_int60_col

    # the pair table feeds BOTH the bucket probe and the near-dup
    # screen — materialize it once (it is |near-dup pairs|-sized, tiny
    # next to the corpus) or the whole LSH pipeline runs twice
    pairs = (
        minhash_lsh_pairs(docs, tau)
        .select(
            F.col("doc_a").alias("anchor"),
            F.col("doc_b").alias("positive"),
        )
        .localCheckpoint()
    )
    buck = docs.select(
        "doc_id",
        (
            md5_int60_col(
                F.concat(F.lit("neg:"), F.col("doc_id").cast("string"))
            )
            % n_buckets
        ).alias("bkt"),
    )
    pb = pairs.withColumn(
        "bkt",
        md5_int60_col(
            F.concat(
                F.lit("trip:"),
                F.col("anchor").cast("string"),
                F.lit(":"),
                F.col("positive").cast("string"),
            )
        )
        % n_buckets,
    )
    cand = pb.join(buck, "bkt").filter(
        (F.col("doc_id") != F.col("anchor"))
        & (F.col("doc_id") != F.col("positive"))
    )
    # near-dup edges of the anchor, both directions
    nd = pairs.select(
        F.col("anchor").alias("a_id"), F.col("positive").alias("nd_id")
    ).unionByName(
        pairs.select(
            F.col("positive").alias("a_id"), F.col("anchor").alias("nd_id")
        )
    )
    admissible = cand.join(
        nd,
        (cand.anchor == nd.a_id) & (cand.doc_id == nd.nd_id),
        "left_anti",
    )
    return (
        admissible.groupBy("anchor", "positive")
        .agg(F.min("doc_id").alias("negative"))
        .orderBy("anchor", "positive")
    )


def contrastive_triplets_sql(
    tau: float = JACCARD_TAU,
    n_buckets: int = TRIPLET_NEG_BUCKETS,
    src: str = "documents",
) -> str:
    from ..functions.hashing import md5_int60_sql

    doc_b = md5_int60_sql("'neg:' || CAST(doc_id AS VARCHAR)")
    pair_b = md5_int60_sql(
        "'trip:' || CAST(anchor AS VARCHAR) || ':' "
        "|| CAST(positive AS VARCHAR)"
    )
    return f"""
WITH pairs AS MATERIALIZED (
  SELECT doc_a AS anchor, doc_b AS positive
  FROM ({minhash_lsh_pairs_sql(tau, src=src)})),
buck AS (
  SELECT doc_id, {doc_b} % {int(n_buckets)} AS bkt FROM {src}),
pb AS (
  SELECT anchor, positive, {pair_b} % {int(n_buckets)} AS bkt
  FROM pairs),
nd AS (
  SELECT anchor AS a_id, positive AS nd_id FROM pairs
  UNION ALL
  SELECT positive, anchor FROM pairs),
admissible AS (
  SELECT pb.anchor, pb.positive, b.doc_id
  FROM pb JOIN buck b USING (bkt)
  WHERE b.doc_id != pb.anchor AND b.doc_id != pb.positive
    AND NOT EXISTS (SELECT 1 FROM nd
                    WHERE nd.a_id = pb.anchor AND nd.nd_id = b.doc_id))
SELECT anchor, positive, min(doc_id) AS negative
FROM admissible GROUP BY 1, 2
""".strip()


# ---------------------------------------------------------------------------
# incremental near-dup clustering — the production ingestion loop:
# yesterday's cluster assignment + today's increment, WITHOUT
# re-hashing the historical corpus. Old connectivity is carried by
# star edges (member → cluster root); new↔old edges come from the
# persisted MinHash index probe (stored buckets + shingles — no old
# text touched); new↔new edges from the banded pipeline on the
# increment alone. Bucket keys are per-doc pure, so the union's
# closure equals the full-corpus run's closure — incremental ==
# recompute, which is exactly what the driver oracle checks.
# ---------------------------------------------------------------------------


def dedup_clusters_incremental(
    docs_new: DataFrame,
    spark,
    index_path: str,
    old_clusters: DataFrame,
    tau: float = JACCARD_TAU,
) -> DataFrame:
    """(doc_id, cluster_id) over old ∪ new docs — near-dup clusters
    after ingesting ``docs_new`` against a corpus known only through
    ``old_clusters`` (a prior :func:`dedup_clusters` output) and the
    persisted index at ``index_path``. cluster_id = min reachable
    doc_id, exactly as the full recompute labels it.

    Why it equals the recompute: banding is per-doc pure, so the
    full run's old-old pairs are reproduced (in closure) by the star
    edges, its old-new pairs by the index probe (same band keys, same
    exact-Jaccard verify, same τ), its new-new pairs by the increment
    pipeline — the three unions have the same connected components,
    hence the same min labels. This argument is AIRTIGHT when
    ``old_clusters`` came from a ``candidates='all'`` run (every
    qualifying bucket pair is an edge in both runs). When it came
    from the default ``candidates='adjacent'`` mode, the per-bucket
    adjacency CHAIN over the old docs can differ from the chain over
    a mixed old/new bucket (e.g. bucket [A_old, B_new, C_old] only
    verifies (A,C) in the old-only run), so closure equality there
    is a corpus-level property — test-gated on the driver corpus,
    not structural (r9 ADVICE).

    Scale: touches O(|old clusters| + |increment| + probe candidates)
    rows — never the historical corpus text; the CC rounds run on the
    edge-induced subgraph only (singletons re-enter via one
    anti-join), the :func:`dedup_clusters` contract."""
    from .dedup_index import probe_dedup_index

    cross = probe_dedup_index(docs_new, spark, index_path, tau).select(
        F.col("new_id").alias("doc_a"), F.col("corpus_id").alias("doc_b")
    )
    new_new = minhash_lsh_pairs(docs_new, tau, candidates="all").select(
        "doc_a", "doc_b"
    )
    star = old_clusters.filter(
        F.col("doc_id") != F.col("cluster_id")
    ).select(
        F.col("doc_id").alias("doc_a"), F.col("cluster_id").alias("doc_b")
    )
    edges = cross.unionByName(new_new).unionByName(star)
    final = connected_components(edges)
    all_ids = old_clusters.select("doc_id").unionByName(
        docs_new.select("doc_id")
    )
    singletons = (
        all_ids.join(final.select("doc_id"), "doc_id", "left_anti")
        .withColumn("cluster_id", F.col("doc_id"))
    )
    return final.unionByName(singletons)
