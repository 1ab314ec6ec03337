"""Persisted text-retrieval index (r11): build / stored query /
append / compact / stats — the build-once/query-many contract from
the r10 VERDICT missing #1 (retrieval was the last family whose every
call re-tokenized the corpus)."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

QUERY = "fast hash join vector"


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def index_path(docs):
    from lasdb_spark.operators.text_index import build_text_index

    path = tempfile.mkdtemp(prefix="lasdb_text_idx_")
    build_text_index(docs, path)
    return path


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.spark
def test_bm25_stored_equals_inline(spark, docs, index_path):
    """Stored-index BM25 must equal inline bm25_search value-for-value
    (same integer tf/df/dl/stats => bit-equal doubles), and its plan
    must contain NO tokenization machinery — no regexp, no explode —
    only FileScans of the persisted tables."""
    from lasdb_spark.operators.search import bm25_search
    from lasdb_spark.operators.text_index import bm25_search_stored

    stored = bm25_search_stored(spark, index_path, QUERY)
    plan = stored._jdf.queryExecution().executedPlan().toString()
    assert "regexp" not in plan.lower()
    assert "explode" not in plan.lower()
    assert "FileScan" in plan
    assert _rows(stored) == _rows(bm25_search(docs, QUERY))


@pytest.mark.spark
def test_bm25_stored_partition_pruning(spark, index_path):
    """The postings FileScan carries PartitionFilters on tbucket — the
    query reads <= |terms| bucket directories, not the whole postings
    table."""
    from lasdb_spark.operators.text_index import bm25_search_stored

    stored = bm25_search_stored(spark, index_path, QUERY)
    plan = stored._jdf.queryExecution().executedPlan().toString()
    assert "tbucket" in plan
    # the pruned-scan signature: partition filters present on the scan
    assert "PartitionFilters: [" in plan
    seg = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "tbucket" in seg


@pytest.mark.spark
def test_hybrid_stored_equals_inline(spark, docs, embs, index_path):
    from lasdb_spark.operators.search import hybrid_search
    from lasdb_spark.operators.text_index import hybrid_search_stored

    got = _rows(hybrid_search_stored(spark, index_path, embs, QUERY, 0))
    want = _rows(hybrid_search(docs, embs, QUERY, 0))
    assert got == want


@pytest.mark.spark
def test_append_equals_single_shot(spark, docs):
    """build(half) + append(other half) == build(all) down to query
    results — df and stats merge exactly, postings accumulate."""
    from lasdb_spark.operators.search import bm25_search
    from lasdb_spark.operators.text_index import (
        append_text_index,
        build_text_index,
        bm25_search_stored,
    )

    path = tempfile.mkdtemp(prefix="lasdb_text_idx_inc_")
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)
    build_text_index(first, path)
    append_text_index(second, path)
    got = _rows(bm25_search_stored(spark, path, QUERY))
    assert got == _rows(bm25_search(docs, QUERY))


@pytest.mark.spark
def test_compact_identity_and_file_merge(spark, docs):
    """Compaction after appends changes layout only: query results
    identical, the committed segments fold into the base tables and
    disappear, and the meta survives the root swap."""
    import glob

    from lasdb_spark.operators.text_index import (
        _committed_segments,
        append_text_index,
        build_text_index,
        bm25_search_stored,
        compact_text_index,
        text_index_meta,
    )

    path = tempfile.mkdtemp(prefix="lasdb_text_idx_cmp_")
    build_text_index(docs.filter(F.col("doc_id") % 2 == 0), path)
    append_text_index(docs.filter(F.col("doc_id") % 2 == 1), path)
    assert len(_committed_segments(path)) == 1
    before = _rows(bm25_search_stored(spark, path, QUERY))
    n_before = len(
        glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    meta_before = text_index_meta(path)
    compact_text_index(spark, path)
    after = _rows(bm25_search_stored(spark, path, QUERY))
    n_after = len(
        glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    assert after == before
    assert n_after <= n_before
    assert _committed_segments(path) == []
    assert text_index_meta(path) == meta_before


@pytest.mark.spark
def test_append_crash_invisible_and_retry_heals(spark, docs):
    """The r12 crash contract (r11 VERDICT #5): an append that dies
    before its one-rename commit is INVISIBLE — queries equal the
    pre-append index exactly — and re-running the same increment
    heals to the committed state, equal to a single-shot build."""
    from lasdb_spark.operators.search import bm25_search
    from lasdb_spark.operators.text_index import (
        SEGMENT_DIR,
        _committed_segments,
        append_text_index,
        build_text_index,
        bm25_search_stored,
    )

    path = tempfile.mkdtemp(prefix="lasdb_text_idx_crash_")
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)
    build_text_index(first, path)
    base_only = _rows(bm25_search_stored(spark, path, QUERY))
    # run the append, then reconstruct the exact crash-before-commit
    # state: everything written, the final rename never happened
    append_text_index(second, path)
    (seg,) = _committed_segments(path)
    fp = os.path.basename(seg)[len("seg-"):]
    tmp = os.path.join(path, SEGMENT_DIR, f".tmp-{fp}")
    os.rename(seg, tmp)
    # crashed append is invisible: served results == pre-append
    assert _rows(bm25_search_stored(spark, path, QUERY)) == base_only
    assert _committed_segments(path) == []
    # retrying the SAME increment is safe: overwrites the orphaned
    # tmp dir and commits; results equal the single-shot build
    append_text_index(second, path)
    assert len(_committed_segments(path)) == 1
    assert not os.path.exists(tmp)
    got = _rows(bm25_search_stored(spark, path, QUERY))
    assert got == _rows(bm25_search(docs, QUERY))


@pytest.mark.spark
def test_append_rerun_is_idempotent(spark, docs):
    """Appending the same increment twice commits exactly one segment
    — the deterministic doc_id-set fingerprint is the idempotency
    key; df/stats never double-count."""
    from lasdb_spark.operators.search import bm25_search
    from lasdb_spark.operators.text_index import (
        _committed_segments,
        append_text_index,
        build_text_index,
        bm25_search_stored,
    )

    path = tempfile.mkdtemp(prefix="lasdb_text_idx_idem_")
    build_text_index(docs.filter(F.col("doc_id") % 2 == 0), path)
    inc = docs.filter(F.col("doc_id") % 2 == 1)
    append_text_index(inc, path)
    append_text_index(inc, path)
    assert len(_committed_segments(path)) == 1
    got = _rows(bm25_search_stored(spark, path, QUERY))
    assert got == _rows(bm25_search(docs, QUERY))


@pytest.mark.spark
def test_rebucket_plant_breach_rebalance(spark, docs):
    """The decision loop end-to-end (r11 VERDICT #4): plant a hot
    bucket (heavy terms COLLIDING into one md5 bucket at a small
    fan-out), breach the bucket-size budget, rebucket to the larger
    fan-out, verify the layout is back under budget and query
    results are byte-identical (re-bucketing is routing-only)."""
    from lasdb_spark.operators.text_index import (
        _tbucket_py,
        build_text_index,
        bm25_search_stored,
        rebucket_text_index,
        text_index_needs_rebucket,
        text_index_stats,
    )

    # 30 heavy terms that all collide into ONE bucket at B=8; md5
    # routing spreads them over the b, b+8 children at B=16 and
    # further at B=32 (deterministic — md5 is data-independent)
    heavy = []
    i = 0
    while len(heavy) < 30:
        t = f"hotterm{i:04d}"
        if _tbucket_py(t, 8) == 3:
            heavy.append(t)
        i += 1
    spread32 = {_tbucket_py(t, 32) for t in heavy}
    assert len(spread32) >= 3  # precondition: colliders DO separate
    planted = spark.createDataFrame(
        [(100_000 + j, " ".join(heavy)) for j in range(100)],
        ["doc_id", "text"],
    )
    corpus = docs.select("doc_id", "text").unionByName(planted)
    path = tempfile.mkdtemp(prefix="lasdb_text_idx_rbk_")
    build_text_index(corpus, path, n_buckets=8)
    hot = max(
        text_index_stats(spark, path).collect(),
        key=lambda r: r.n_postings,
    )
    assert hot.tbucket == 3  # the planted collision bucket is hottest
    budget = hot.n_postings // 2
    decision = text_index_needs_rebucket(
        spark, path, max_bucket_postings=budget
    )
    assert decision["rebucket"] is True
    assert decision["worst_tbucket"] == 3
    assert decision["worst_bucket_n_terms"] > 1  # splitting CAN help
    # a breach must never suggest a no-op rewrite (r12 review #1):
    # the worst-bucket bound forces a strictly larger fan-out even
    # when the uniform bound is already satisfied
    assert decision["suggested_n_buckets"] > decision["n_buckets"]
    assert decision["suggested_n_buckets"] >= 16
    before = _rows(bm25_search_stored(spark, path, QUERY))
    rebucket_text_index(spark, path, 32)
    after_rows = text_index_stats(spark, path).collect()
    assert max(r.n_postings for r in after_rows) <= budget
    assert (
        text_index_needs_rebucket(
            spark, path, max_bucket_postings=budget
        )["rebucket"]
        is False
    )
    # routing-only: identical results, and pruning still works on the
    # new fan-out (meta and layout agree after the atomic root swap)
    stored = bm25_search_stored(spark, path, QUERY)
    plan = stored._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert _rows(stored) == before


@pytest.mark.spark
def test_stats_totals(spark, docs, index_path):
    """Bucket stats cover every posting exactly once; shares sum to
    ~1e6; skew is the documented integer formula."""
    from lasdb_spark.operators.text_index import text_index_stats

    rows = text_index_stats(spark, index_path).collect()
    total = sum(r.n_postings for r in rows)
    n_postings_direct = (
        spark.read.parquet(os.path.join(index_path, "postings")).count()
    )
    assert total == n_postings_direct
    assert 990_000 <= sum(r.share_ppm for r in rows) <= 1_000_000
    # skew is against the CONFIGURED fan-out, not the non-empty bucket
    # count: an empty bucket is itself skew and shows up by absence
    from lasdb_spark.operators.text_index import TEXT_INDEX_BUCKETS

    for r in rows:
        assert (
            r.skew_ppm
            == r.n_postings * TEXT_INDEX_BUCKETS * 1_000_000 // total
        )


@pytest.mark.spark
def test_bucket_parity_three_engines(spark):
    """The md5-prefix bucket id agrees across the Spark build column,
    the Python driver planner, and the DuckDB oracle rendering."""
    import duckdb

    from lasdb_spark.operators.text_index import (
        TEXT_INDEX_BUCKETS,
        _tbucket_col,
        _tbucket_py,
        tbucket_sql_expr,
    )

    terms = ["fast", "hash", "join", "vector", "x1", "a", "zz9"]
    df = spark.createDataFrame([(t,) for t in terms], ["term"])
    got = {
        r.term: r.b
        for r in df.select(
            "term", _tbucket_col(TEXT_INDEX_BUCKETS).alias("b")
        ).collect()
    }
    con = duckdb.connect()
    for t in terms:
        want = _tbucket_py(t, TEXT_INDEX_BUCKETS)
        assert got[t] == want
        lit = "'" + t.replace("'", "''") + "'"
        dk = con.sql(
            f"SELECT {tbucket_sql_expr(lit, TEXT_INDEX_BUCKETS)}"
        ).fetchall()[0][0]
        assert dk == want


@pytest.mark.spark
def test_hybrid_multi_stored_equals_inline(spark, docs, embs, index_path):
    """The batched serving path from the stored index equals the
    inline batched entry value-for-value (same integer tf/df/dl/stats
    => same micro-unit BIGINT sums => same ranks), and its plan has
    no tokenization machinery."""
    from lasdb_spark.operators.search import hybrid_search_multi
    from lasdb_spark.operators.text_index import hybrid_search_multi_stored

    stored = hybrid_search_multi_stored(spark, index_path, embs)
    plan = stored._jdf.queryExecution().executedPlan().toString()
    assert "regexp" not in plan.lower()
    assert "explode" not in plan.lower()
    assert _rows(stored) == _rows(hybrid_search_multi(docs, embs))


@pytest.mark.spark
def test_stored_query_recovers_interrupted_swap(spark, docs):
    """A crash inside a maintenance op's swap window (table absent,
    *_old holding the complete table) must be repaired BEFORE the
    stored query's first read — not throw path-not-found (r11
    review). r12 (ADVICE): read-time recovery is rename-back ONLY —
    a stale side dir survives the read (so a query can't destroy an
    in-flight compaction) and is cleaned by the next maintenance
    op."""
    import shutil

    from lasdb_spark.operators.search import bm25_search
    from lasdb_spark.operators.text_index import (
        build_text_index,
        bm25_search_stored,
        compact_text_index,
    )

    path = tempfile.mkdtemp(prefix="lasdb_text_idx_rec_")
    build_text_index(docs, path)
    # simulate the crash window: first rename done, second never ran
    os.rename(os.path.join(path, "df"), os.path.join(path, "df_old"))
    os.makedirs(os.path.join(path, "stats_compacting"))  # stale side dir
    got = _rows(bm25_search_stored(spark, path, QUERY))
    assert got == _rows(bm25_search(docs, QUERY))
    assert os.path.isdir(os.path.join(path, "df"))
    assert not os.path.exists(os.path.join(path, "df_old"))
    # read-only recovery leaves the side dir for maintenance to clean
    assert os.path.exists(os.path.join(path, "stats_compacting"))
    compact_text_index(spark, path)
    assert not os.path.exists(os.path.join(path, "stats_compacting"))
    shutil.rmtree(path, ignore_errors=True)


@pytest.mark.spark
def test_stored_query_recovers_interrupted_root_swap(spark, docs):
    """A crash inside a ROOT-level swap (compact/rebucket renamed the
    index root away and died before renaming the new root in) strands
    the whole index at path_old — the stored query's first read must
    rename it back (r11 ADVICE: the recover-before-read discipline
    applied to the root)."""
    import shutil

    from lasdb_spark.operators.search import bm25_search
    from lasdb_spark.operators.text_index import (
        build_text_index,
        bm25_search_stored,
    )

    path = tempfile.mkdtemp(prefix="lasdb_text_idx_rootrec_")
    build_text_index(docs, path)
    os.rename(path, path + "_old")
    got = _rows(bm25_search_stored(spark, path, QUERY))
    assert got == _rows(bm25_search(docs, QUERY))
    assert os.path.isdir(path)
    assert not os.path.exists(path + "_old")
    shutil.rmtree(path, ignore_errors=True)


@pytest.mark.spark
def test_hybrid_multi_stored_ann_plan_and_lexical_parity(
    spark, docs, embs, index_path
):
    """The fully-stored hybrid (r12 — dense arm from the persisted
    kNN-join index): the serve plan must contain NO full embedding
    scan, no tokenization, and partition pruning on BOTH stored
    tables (tbucket for postings, cell for the probed ANN cells);
    the lexical arm must be unchanged vs the stored hybrid without
    the ANN index (bm25_rank per (query, doc) identical)."""
    import tempfile as tf_mod

    from lasdb_spark.operators.ann_index import build_knn_join_index
    from lasdb_spark.operators.text_index import hybrid_search_multi_stored

    ann_path = tf_mod.mkdtemp(prefix="lasdb_hybann_") + "/idx"
    build_knn_join_index(embs, ann_path)
    got = hybrid_search_multi_stored(
        spark, index_path, embs, ann_index_path=ann_path
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "embeddings.parquet" not in plan
    assert "regexp" not in plan.lower()
    assert "explode" not in plan.lower()
    segs = [
        s.split("]", 1)[0] for s in plan.split("PartitionFilters: [")[1:]
    ]
    assert any("tbucket" in s for s in segs)
    assert any("cell" in s for s in segs)
    base = hybrid_search_multi_stored(spark, index_path, embs)
    bm_got = {
        (r.query_id, r.doc_id): r.bm25_rank
        for r in got.collect()
        if r.bm25_rank > 0
    }
    bm_base = {
        (r.query_id, r.doc_id): r.bm25_rank
        for r in base.collect()
        if r.bm25_rank > 0
    }
    shared = set(bm_got) & set(bm_base)
    assert shared  # the lexical arm surfaces in both
    assert all(bm_got[p] == bm_base[p] for p in shared)
    # every query answered with a full top-k page
    per_q = {}
    for r in got.collect():
        per_q[r.query_id] = per_q.get(r.query_id, 0) + 1
    assert set(per_q.values()) == {15}
