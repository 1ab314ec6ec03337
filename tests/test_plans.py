"""Physical-plan quality gates — the scale properties, asserted.

Correctness tests prove the answers match; these prove the PLANS are
the ones that survive a 100x scale-up: pushdown reaches the Parquet
scan, window queries add no shuffle, dimension joins broadcast, and
aggregations combine map-side."""

import tempfile

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _has_shuffle(plan: str) -> bool:
    """True if the plan repartitions data (BroadcastExchange is fine —
    broadcasting a tiny range table is the point, not a shuffle)."""
    return any(
        f"Exchange {kind}" in plan
        for kind in ("hashpartitioning", "rangepartitioning", "SinglePartition")
    )


@pytest.fixture(scope="module")
def stored(spark, sf_dir):
    from lasdb_spark.operators.ingest import ingest_points, load_dataset
    from lasdb_spark.operators.window_query import WindowQuerier
    from lasdb_spark.sources.points import points_df

    base = tempfile.mkdtemp(prefix="lasdb_plans_")
    ingest_points(points_df(spark, sf_dir), "p", base)
    df, meta, layout = load_dataset(spark, base, "p")
    return WindowQuerier(df, meta, layout)


BBOX = [85200.0, 85400.0, 446300.0, 446800.0]


@pytest.mark.spark
def test_window_query_is_shuffle_free(stored):
    """scan -> filter -> project only: a window query must NOT shuffle."""
    for df in (
        stored.bbox(BBOX),
        stored.circle([85500.0, 446700.0], 150.0),
        stored.bbox(BBOX, minz=5.0, maxz=20.0),
    ):
        assert not _has_shuffle(_plan(df))


@pytest.mark.spark
def test_key_ranges_pushed_to_scan(stored):
    """The Morton decomposition must reach the Parquet reader
    (row-group skipping — the engine's replacement for the B-tree)."""
    plan = _plan(stored.bbox(BBOX))
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters")[1][:400]
    assert "sfc_key" in pushed


@pytest.mark.spark
def test_polygon_stays_native(stored):
    """Small-polygon containment must not leave the JVM (no Arrow/
    Python eval node in the plan)."""
    wkt = (
        "POLYGON ((85100.005 446100.005, 85899.995 446100.005, "
        "85899.995 447399.995, 85100.005 447399.995, 85100.005 446100.005), "
        "(85299.995 446499.995, 85700.005 446499.995, 85700.005 447000.005, "
        "85299.995 447000.005, 85299.995 446499.995))"
    )
    plan = _plan(stored.polygon(wkt))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert not _has_shuffle(plan)


@pytest.mark.spark
def test_dimension_joins_broadcast(spark, sf_dir):
    """The fact table must never shuffle for dim joins."""
    from lasdb_spark.operators.relational import revenue_by_nation

    plan = _plan(
        revenue_by_nation(
            spark.read.parquet(f"{sf_dir}/orders.parquet"),
            spark.read.parquet(f"{sf_dir}/customer.parquet"),
            spark.read.parquet(f"{sf_dir}/nation.parquet"),
        )
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


@pytest.mark.spark
def test_agg_has_mapside_partial(spark, sf_dir):
    """Pricing summary must combine before the shuffle."""
    from lasdb_spark.operators.relational import pricing_summary

    plan = _plan(pricing_summary(spark.read.parquet(f"{sf_dir}/lineitem.parquet")))
    assert "partial" in plan.lower()


def _partitionless_windows(plan_fragment: str) -> list:
    """Window specs with no partition key: the first argument of
    windowspecdefinition is an ORDER clause (carries ASC/DESC) instead
    of a partition column."""
    out = []
    for frag in plan_fragment.split("windowspecdefinition(")[1:]:
        first_arg = frag.split(",")[0]
        if " ASC" in first_arg or " DESC" in first_arg:
            out.append(first_arg)
    return out


@pytest.mark.spark
def test_topk_is_take_ordered(spark, sf_dir):
    """Single-query top-k must rank via TakeOrderedAndProject
    (per-partition heaps + driver merge of k) — never by funnelling the
    full scored corpus/vocabulary through a partition-less Window. The
    only allowed partition-less window is the rank attach ABOVE the
    k-row limit."""
    from lasdb_spark.operators.similarity import (
        topk_bruteforce,
        topk_ivf,
        topk_lsh,
    )
    from lasdb_spark.operators.text import top_tokens

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for df in (
        topk_bruteforce(embs),
        topk_lsh(embs),
        topk_ivf(embs),
        top_tokens(docs),
    ):
        plan = _plan(df)
        assert "TakeOrderedAndProject" in plan
        # everything BELOW the take-ordered (the corpus-wide part of the
        # plan) must have no partition-less window
        below = plan[plan.index("TakeOrderedAndProject"):]
        assert not _partitionless_windows(below), below[:800]


@pytest.mark.spark
def test_curation_ops_plan_shapes(spark, sf_dir):
    """Corpus-curation operators keep their scale shapes: centroids
    combine map-side before the (label, pos) shuffle; sampling and
    BPE counting are pure map-side (no shuffle at any size)."""
    from lasdb_spark.operators.similarity import label_centroids
    from lasdb_spark.operators.text import bpe_token_stats, stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assert "partial" in _plan(label_centroids(embs)).lower()
    assert not _has_shuffle(_plan(stratified_sample(docs)))
    assert not _has_shuffle(_plan(bpe_token_stats(docs)))


@pytest.mark.spark
def test_skyline_plan_shape(spark, sf_dir):
    """The skyline must finish with a broadcast dominance anti-join and
    never rank through a partition-less window."""
    from lasdb_spark.operators.skyline import pareto_orders

    plan = _plan(pareto_orders(spark.read.parquet(f"{sf_dir}/orders.parquet")))
    assert "BroadcastNestedLoopJoin" in plan and "LeftAnti" in plan
    assert not _partitionless_windows(plan)


@pytest.mark.spark
def test_scan_prunes_columns(spark, sf_dir):
    """A 2-column projection must not read the whole documents table."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(docs.select("doc_id").filter(F.col("doc_id") > 10))
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" not in read_schema  # big column pruned away


@pytest.mark.spark
def test_decontaminate_broadcasts_benchmark(spark, sf_dir):
    """The eval-set shingle probe must be a broadcast hash join (the
    benchmark is fixed-size); the corpus side must never shuffle for
    the probe itself — only the per-doc hit-count agg may."""
    from lasdb_spark.operators.decontaminate import (
        contamination_report,
        driver_benchmark,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(contamination_report(docs, driver_benchmark(docs)))
    assert "BroadcastHashJoin" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


@pytest.mark.spark
def test_repetition_stats_stays_native_with_partial_aggs(spark, sf_dir):
    """Repetition scoring is regexp/array built-ins only (no Python
    eval nodes) and its bigram counts combine map-side before the
    shuffle (partial_count before the exchange)."""
    from lasdb_spark.operators.text import repetition_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(repetition_stats(docs))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "partial_count" in plan


@pytest.mark.spark
def test_multi_window_is_hash_join_not_nested_loop(stored):
    """The batch spatial join must plan as a broadcast HASH join on the
    shared cell key — never the O(rows × windows) nested loop a
    coordinate-BETWEEN join would give — with the coarse key range
    pushed to the scan."""
    wins = [
        (1, 85200.005, 85399.995, 446300.005, 446799.995),
        (2, 85500.005, 85501.995, 446000.005, 447499.995),
    ]
    plan = _plan(stored.multi_bbox(wins))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "PushedFilters" in plan and "sfc_key" in plan.split("PushedFilters")[1][:400]


@pytest.mark.spark
def test_tfidf_and_surprisal_plan_shapes(spark, sf_dir):
    """TF-IDF / surprisal: pure built-ins (no Python eval nodes), the
    corpus-size/stat side arrives via broadcast, term counts combine
    map-side before their shuffle, and the top-k window partitions by
    doc_id (no partition-less global window)."""
    from lasdb_spark.operators.text import surprisal_scores, tfidf_top_terms

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for df in (tfidf_top_terms(docs), surprisal_scores(docs)):
        plan = _plan(df)
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
        assert "BroadcastExchange" in plan
        assert "partial_count" in plan or "partial_sum" in plan
    tfidf_plan = _plan(tfidf_top_terms(docs))
    # the rank window must partition by doc_id — a partition-less
    # window would funnel the whole vocabulary through one task
    assert "windowspecdefinition(doc_id" in tfidf_plan


@pytest.mark.spark
def test_bm25_filters_terms_before_shuffle(spark, sf_dir):
    """BM25: the query-term IN filter must sit below the first
    aggregation (map-side prune of the exploded token stream), the
    df/stats sides must broadcast, and top-k must be TakeOrdered."""
    from lasdb_spark.operators.search import bm25_search

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(bm25_search(docs, "fast hash join vector"))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastExchange" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # the IN-list filter sits directly on the exploded stream, deeper
    # in the tree than every exchange — i.e. it prunes map-side before
    # any shuffle
    assert "IN (fast,hash,join,vector)" in plan
    assert plan.find("IN (fast,hash,join,vector)") > plan.find(
        "Exchange hashpartitioning"
    )


@pytest.mark.spark
def test_retention_single_user_shuffle(spark, sf_dir):
    """Cohort retention: exactly the two designed exchanges (user_id
    agg + final triangle agg) — no join, no extra distinct shuffle."""
    from lasdb_spark.operators.relational import user_retention
    from lasdb_spark.sources.events import events_df

    plan = _plan(user_retention(events_df(spark, f"{sf_dir}")))
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "partial_collect_set" in plan or "objHashAggregate" in plan.lower()


@pytest.mark.spark
def test_semdedup_pair_join_keys_on_cell(spark, sf_dir):
    """Semantic dedup's pair scan must key on the cell (hash join);
    the only nested-loop join allowed is the broadcast of the tiny
    centroid/one-row tables during assignment."""
    from lasdb_spark.operators.semdedup import semantic_pairs

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = _plan(semantic_pairs(embs))
    assert "CartesianProduct" not in plan
    assert "cell" in plan


@pytest.mark.spark
def test_bigram_surprisal_caches_collapsed_counts(spark, sf_dir):
    """The per-(doc,bigram) count table must be computed ONCE and
    reused by the model tables and the scoring join — the raw token
    shuffle may not re-run per consumer."""
    from lasdb_spark.operators.text import bigram_surprisal

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = bigram_surprisal(docs)
    df.count()  # materialize the cache so the plan shows the reuse
    plan = _plan(df)
    assert plan.count("InMemoryTableScan") >= 4
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


@pytest.mark.spark
def test_crosscorpus_join_is_bucketed(spark, sf_dir):
    """Cross-corpus near-dup: banded equi-joins only — no nested-loop
    join between the two corpora, no python in the hot path."""
    from pyspark.sql import functions as F

    from lasdb_spark.operators.dedup import crosscorpus_neardup_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(
        crosscorpus_neardup_pairs(
            docs.filter(F.col("doc_id") % 2 == 0),
            docs.filter(F.col("doc_id") % 2 == 1),
        )
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


@pytest.mark.spark
def test_sliding_rates_single_shuffle(spark, sf_dir):
    """Sliding windows are a map-side explode + ONE partial-aggregated
    shuffle on (window, type)."""
    from lasdb_spark.operators.relational import sliding_event_rates
    from lasdb_spark.sources.events import events_df

    plan = _plan(sliding_event_rates(events_df(spark, sf_dir)))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan


@pytest.mark.spark
def test_topics_joins_are_bounded(spark, sf_dir):
    """Topic labeling: the only nested-loop allowed is the broadcast
    of the tiny centroid/one-row tables (the k-means assignment
    pattern semdedup already gates); no cartesian, no python."""
    from lasdb_spark.operators.topics import corpus_topics

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = _plan(corpus_topics(docs, embs))
    assert "CartesianProduct" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # doc<->cluster membership and term scoring are hash equi-joins
    assert "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan


@pytest.mark.spark
def test_tpch_growing_sides_unforced_yet_broadcast(spark, sf_dir):
    """r7: Q2/Q3 dropped the forced broadcast hints on the SF-growing
    sides (supplier/part in min_cost_supplier, customer + filtered
    orders in shipping_priority) — a forced hint at 100 TB is an OOM,
    not a fallback. At driver SF those joins must STILL end up
    broadcast via AQE / size estimation, so nothing regressed locally."""
    import __spark_entry__ as entry_mod

    # rel_local_supplier (Q5, r7) follows the same policy from birth:
    # region/nation forced, supplier/customer/orders AQE-gated
    for name in (
        "rel_min_cost_supplier",
        "rel_shipping_priority",
        "rel_local_supplier",
    ):
        df = entry_mod.queries()[name](spark, str(sf_dir))
        df.collect()  # let AQE finalize the plan
        plan = _plan(df)
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name


@pytest.mark.spark
def test_stored_ann_index_query_plan_is_scan_only(spark, sf_dir):
    """r7 (VERDICT #6): the persisted IVF-PQ index must answer with a
    plan that contains NO training stage — exactly ONE FileScan (the
    codes table), partition-pruned to the probed cells — and the
    answer must equal the in-plan trained entry value-for-value."""
    import tempfile

    from lasdb_spark.operators.ann_index import (
        build_ann_index,
        topk_ivfpq_stored,
    )
    from lasdb_spark.operators.similarity import topk_ivfpq_trained

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = tempfile.mkdtemp(prefix="lasdb_ann_idx_")
    build_ann_index(embs, path)
    df = topk_ivfpq_stored(spark, path, embs, query_vec_id=0)
    plan = _plan(df)
    assert plan.count("FileScan") == 1, plan
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1][:200]
    assert "cell" in pf  # the probed-cell IN-list prunes partitions
    # no Lloyd/training machinery in the query plan
    assert "posexplode" not in plan
    stored = [tuple(r) for r in df.collect()]
    trained = [tuple(r) for r in topk_ivfpq_trained(embs, 0).collect()]
    assert stored == trained


@pytest.mark.spark
def test_ann_index_incremental_append_equals_single_shot(spark, sf_dir):
    """r7: append_ann_index is encode-only and per-row pure, so
    building on half the corpus' codes then appending the other half
    must equal a single-shot encode of everything — same code rows,
    same query answers. (Cells/books come from the SAME full-corpus
    training in both paths; only the code ingestion is split.)"""
    import tempfile

    from pyspark.sql import functions as F

    from lasdb_spark.operators.ann_index import (
        append_ann_index,
        build_ann_index,
        topk_ivfpq_stored,
    )

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    single = tempfile.mkdtemp(prefix="lasdb_annidx_a_")
    split = tempfile.mkdtemp(prefix="lasdb_annidx_b_")
    build_ann_index(embs, single)
    build_ann_index(embs, split)
    # rebuild split's codes from scratch in two increments
    import shutil

    shutil.rmtree(f"{split}/codes")
    append_ann_index(embs.where(F.col("vec_id") % 2 == 0), split)
    append_ann_index(embs.where(F.col("vec_id") % 2 == 1), split)
    # r12: the split index's code rows live in committed segments;
    # compare the LOGICAL table (base ∪ segments)
    from lasdb_spark.operators.ann_index import _ann_table

    a = sorted(
        tuple(r) for r in _ann_table(spark, single, "codes").collect()
    )
    b = sorted(
        tuple(r) for r in _ann_table(spark, split, "codes").collect()
    )
    assert a == b and a
    qa = [tuple(r) for r in topk_ivfpq_stored(spark, single, embs).collect()]
    qb = [tuple(r) for r in topk_ivfpq_stored(spark, split, embs).collect()]
    assert qa == qb


@pytest.mark.spark
def test_bucketed_join_is_exchange_free(spark, sf_dir, tmp_path):
    """r7: the bucketed fact⋈dim join must plan with ZERO Exchange —
    both sides read as bucketed scans (Bucketed: true, all buckets
    selected) feeding the SortMergeJoin directly. Broadcast is
    disabled for the gate so AQE can't mask a missing co-location."""
    from lasdb_spark.operators.bucketed import (
        bucketed_enrich_join,
        bucketed_event_user_tables,
    )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        fact, dim = bucketed_event_user_tables(
            spark, ev, str(tmp_path / "bkt"), tag="plangate"
        )
        j = bucketed_enrich_join(fact, dim)
        plan = _plan(j)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert plan.count("Bucketed: true") == 2
        # values: row-level enrichment preserves the fact row count
        assert j.count() == ev.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bkt_fact_plangate")
        spark.sql("DROP TABLE IF EXISTS bkt_dim_plangate")


@pytest.mark.spark
def test_q19_disjunction_halves_pushed_to_both_scans(spark, sf_dir):
    """r7: the OR-of-ANDs hulls must reach BOTH parquet scans — the
    quantity hull on lineitem, the brand IN-list + size hull on part —
    so neither side is scanned unfiltered before the join."""
    from lasdb_spark.operators.relational import discounted_brand_revenue

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    plan = _plan(discounted_brand_revenue(li, pt))
    assert "l_quantity" in plan and ">= 1.0" in plan and "<= 30.0" in plan
    assert "p_brand" in plan and "IN (Brand#1,Brand#9,Brand#13)" in plan
    assert "p_size" in plan


@pytest.mark.spark
def test_embedding_pair_fanout_is_map_local(spark, sf_dir):
    """r8: embedding_cov_pairs / embedding_pca_top build the dim² pair
    fan-out INSIDE the row (nested transform over the embedding array)
    — the plan must contain no Join at all and no Exchange of the
    corpus-sized pair table: the only hashpartitioning Exchange allowed
    is the dim²-bounded partial aggregate (its child must already be
    the partial HashAggregate, not a raw fan-out)."""
    from lasdb_spark.operators.similarity import (
        _local_pair_fanout,
        embedding_cov_pairs,
    )

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = _plan(embedding_cov_pairs(embs))
    assert "Join" not in plan
    # every hashpartitioning exchange must sit above a partial agg,
    # i.e. the fan-out itself is never shuffled
    for chunk in plan.split("Exchange hashpartitioning")[1:]:
        keys = chunk[:200]
        assert "pos_a" in keys and "pos_b" in keys
    # and the raw fan-out is shuffle-free (modulo the _spread
    # RoundRobin repartition for under-split local files)
    fan = _plan(_local_pair_fanout(embs, include_diagonal=False))
    assert "Exchange hashpartitioning" not in fan
    assert "Join" not in fan


@pytest.mark.spark
def test_recall_report_stored_arm_matches_inline_and_scans_codes(
    spark, sf_dir
):
    """r9 (VERDICT #4): ann_recall_report(index_path=...) must answer
    the ivfpq_tr arm from the persisted codes table — the plan scans
    the index directory, partition-pruned — and the report's values
    must equal the inline-trained report row-for-row."""
    import tempfile

    from lasdb_spark.operators.ann_index import build_ann_index
    from lasdb_spark.operators.similarity import ann_recall_report

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = tempfile.mkdtemp(prefix="lasdb_ann_idx_rr_")
    build_ann_index(embs, path)
    df = ann_recall_report(embs, index_path=path)
    plan = _plan(df)
    assert "codes" in plan and "PartitionFilters" in plan, plan
    stored = [tuple(r) for r in df.collect()]
    inline = [tuple(r) for r in ann_recall_report(embs).collect()]
    assert stored == inline and len(stored) == 7
