"""Semantics tests for the r9 operators (hybrid RRF retrieval, MMR
diversification, PSI drift, leakage-safe split, streaming index probe,
TPC-H Q12/Q21 shapes) — hand-checkable fixtures; value-exactness vs
DuckDB is proven separately by the all-entries oracle mirror."""

import pytest


@pytest.mark.spark
def test_hybrid_search_rrf_fusion(spark):
    """A doc present in both arms outranks single-arm docs at equal
    depth; missing-arm ranks report 0, and rrf is the two-term
    reciprocal sum."""
    from lasdb_spark.operators.search import hybrid_search

    docs = spark.createDataFrame(
        [
            (0, "alpha beta alpha beta alpha"),  # lexical hit
            (1, "alpha beta gamma"),             # lexical + dense hit
            (2, "delta epsilon zeta"),           # neither
            (3, "unrelated words here"),         # dense hit only
        ],
        "doc_id long, text string",
    )
    embs = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),   # query vector
            (1, [0.9, 0.1]),   # close
            (2, [-1.0, 0.0]),  # far
            (3, [0.95, 0.05]), # closest
        ],
        "vec_id long, embedding array<double>",
    )
    rows = {
        r.doc_id: r
        for r in hybrid_search(
            docs, embs, "alpha beta", query_vec_id=0, k=4, k_cand=3
        ).collect()
    }
    # doc 1: bm25 rank 2 (doc 0 has more term mass), cos rank 2
    assert rows[1].bm25_rank == 2 and rows[1].cos_rank == 2
    # doc 0 is the query vector -> dense arm excludes it: rank 0
    assert rows[0].bm25_rank == 1 and rows[0].cos_rank == 0
    # doc 3: dense-only
    assert rows[3].bm25_rank == 0 and rows[3].cos_rank == 1
    # two-arm doc 1 fuses 1/62 + 1/62 > either single arm's 1/61
    assert rows[1].rank == 1
    assert rows[1].rrf == round(1 / 62 + 1 / 62, 6)
    assert rows[0].rrf == round(1 / 61, 6)


@pytest.mark.spark
def test_mmr_prefers_diverse_over_near_duplicate(spark):
    """With λ=0.5 the second pick skips the near-duplicate of pick 1
    (relevance-only ranking would take it) and selects the diverse
    candidate instead."""
    from lasdb_spark.operators.similarity import mmr_topk

    embs = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),       # query
            (1, [0.9, 0.436]),     # top relevance (qcos ~0.90)
            (2, [0.89, 0.444]),    # near-duplicate of 1 (cos(1,2)~1.0,
                                   # qcos ~0.895): relevance-only rank 2
            (3, [0.5, -0.866]),    # diverse (cos(1,3)~0.07, qcos 0.5)
        ],
        "vec_id long, embedding array<double>",
    )
    picks = [
        r.vec_id
        for r in mmr_topk(embs, query_vec_id=0, k=2, n_cand=3, lam=0.5)
        .orderBy("rank")
        .collect()
    ]
    assert picks == [1, 3]


@pytest.mark.spark
def test_psi_flags_shifted_dimension_only(spark):
    """dim 0 identical across halves -> psi ~ smoothing floor; dim 1
    shifted clear out of the reference range -> large psi, flagged."""
    from lasdb_spark.operators.similarity import embedding_drift_psi

    rows = []
    for i in range(40):
        base = (i // 2) / 20.0  # same value stream in both halves
        shift = 0.0 if i % 2 == 0 else 10.0
        rows.append((i, [base, base + shift]))
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.pos: r for r in embedding_drift_psi(embs).collect()}
    assert not got[0].drifted and got[0].psi < 0.05
    assert got[1].drifted and got[1].psi > 1.0


@pytest.mark.spark
def test_corpus_split_safe_is_cluster_granular(spark):
    """Every member of one cluster lands in the same split: with all
    docs forced into a single cluster the summary has exactly one
    row carrying the whole corpus."""
    from lasdb_spark.operators.dedup import corpus_split_safe

    docs = spark.createDataFrame(
        [(i, f"doc text {i} " + "tok " * 5) for i in range(30)],
        "doc_id long, text string",
    )
    one_cluster = spark.createDataFrame(
        [(i, 0) for i in range(30)], "doc_id long, cluster_id long"
    )
    rows = corpus_split_safe(docs, clusters=one_cluster).collect()
    assert len(rows) == 1
    assert rows[0].n_docs == 30 and rows[0].n_clusters == 1


@pytest.mark.spark
def test_corpus_split_safe_totals(spark, sf_dir):
    """Split summaries partition the corpus: doc counts sum to N and
    every near-dup cluster is wholly inside one split (cluster counts
    sum to the number of distinct clusters)."""
    from lasdb_spark.operators.dedup import corpus_split_safe, dedup_clusters

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    clusters = dedup_clusters(docs)
    rows = corpus_split_safe(docs, clusters=clusters).collect()
    assert sum(r.n_docs for r in rows) == docs.count()
    n_clusters = clusters.select("cluster_id").distinct().count()
    assert sum(r.n_clusters for r in rows) == n_clusters


@pytest.mark.spark
def test_stream_probe_equals_batch_probe(spark, sf_dir, tmp_path):
    """Drained foreachBatch probe of the increment == the one-shot
    batch probe (per-doc purity across micro-batch boundaries)."""
    from pyspark.sql import functions as F

    from lasdb_spark.operators.dedup_index import (
        build_dedup_index,
        probe_dedup_index,
    )
    from lasdb_spark.streaming.dedup import (
        documents_stream_multibatch,
        stream_probe_dedup_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    build_dedup_index(docs.where(F.col("doc_id") % 2 == 0), idx)
    stream_probe_dedup_index(
        documents_stream_multibatch(spark, sf_dir).where(
            F.col("doc_id") % 2 == 1
        ),
        idx,
        out,
    )
    drained = sorted(
        tuple(r)
        for r in spark.read.schema("new_id long, corpus_id long, jac double")
        .parquet(out)
        .collect()
    )
    batch = sorted(
        tuple(r)
        for r in probe_dedup_index(
            docs.where(F.col("doc_id") % 2 == 1), spark, idx
        ).collect()
    )
    assert drained == batch


@pytest.mark.spark
def test_ship_lag_priority_classes(spark):
    """Known lags fall in their classes; priority columns split
    high (1-URGENT/2-HIGH) vs low; out-of-window lines are dropped."""
    from lasdb_spark.operators.relational import ship_lag_priority

    orders = spark.createDataFrame(
        [
            (1, "1-URGENT", "1996-06-01"),
            (2, "5-LOW", "1996-06-01"),
        ],
        "o_orderkey long, o_orderpriority string, d string",
    ).selectExpr(
        "o_orderkey", "o_orderpriority", "CAST(d AS TIMESTAMP) AS o_orderdate"
    )
    li = spark.createDataFrame(
        [
            (1, "1996-05-01"),  # lag -31 -> early, high
            (1, "1996-07-01"),  # lag 30 -> fast, high
            (2, "1996-10-01"),  # lag 122 -> normal, low
            (2, "1998-06-01"),  # out of window -> dropped
        ],
        "l_orderkey long, d string",
    ).selectExpr("l_orderkey", "CAST(d AS TIMESTAMP) AS l_shipdate")
    got = {
        r.lag_class: (r.high_line_count, r.low_line_count)
        for r in ship_lag_priority(orders, li).collect()
    }
    assert got == {"early": (1, 0), "fast": (1, 0), "normal": (0, 1)}


@pytest.mark.spark
def test_late_sole_blockers_exclusion_shape(spark):
    """Only the sole-late supplier on a multi-supplier finalized order
    counts: both-late orders, single-supplier orders and non-'F'
    orders are all excluded."""
    from lasdb_spark.operators.relational import late_sole_blockers

    supplier = spark.createDataFrame(
        [(1, "S1"), (2, "S2"), (3, "S3")], "s_suppkey long, s_name string"
    )
    orders = spark.createDataFrame(
        [
            (10, "F", "1996-01-01"),  # s1 late, s2 on time -> s1 counts
            (11, "F", "1996-01-01"),  # both late -> nobody counts
            (12, "F", "1996-01-01"),  # single supplier late -> excluded
            (13, "O", "1996-01-01"),  # not finalized -> excluded
        ],
        "o_orderkey long, o_orderstatus string, d string",
    ).selectExpr(
        "o_orderkey", "o_orderstatus", "CAST(d AS TIMESTAMP) AS o_orderdate"
    )
    li = spark.createDataFrame(
        [
            (10, 1, "1996-06-01"),  # late (>60d)
            (10, 2, "1996-01-15"),  # on time
            (11, 1, "1996-06-01"),
            (11, 2, "1996-06-01"),
            (12, 3, "1996-06-01"),
            (13, 1, "1996-06-01"),
            (13, 2, "1996-01-15"),
        ],
        "l_orderkey long, l_suppkey long, d string",
    ).selectExpr(
        "l_orderkey", "l_suppkey", "CAST(d AS TIMESTAMP) AS l_shipdate"
    )
    rows = late_sole_blockers(supplier, orders, li).collect()
    assert [(r.s_name, r.numwait, r.rank) for r in rows] == [("S1", 1, 1)]


@pytest.mark.spark
def test_important_parts_mean_threshold(spark):
    """Membership is rev > permille/1000 x mean: 3 parts with revenue
    100/100/400 -> mean 200, threshold 1.3x = 260 -> only the 400."""
    from lasdb_spark.operators.relational import important_parts

    li = spark.createDataFrame(
        [(1, 100.0, 0.0), (2, 100.0, 0.0), (3, 400.0, 0.0)],
        "l_partkey long, l_extendedprice double, l_discount double",
    )
    part = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "p_partkey long, p_name string"
    )
    rows = important_parts(li, part).collect()
    assert [(r.p_partkey, r.revenue, r.rank) for r in rows] == [(3, 400.0, 1)]


@pytest.mark.spark
def test_part_supplier_variety_exclusions(spark):
    """Complaint suppliers and the excluded brand don't count toward
    the distinct-supplier tally."""
    from lasdb_spark.operators.relational import part_supplier_variety

    li = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 10)],
        "l_partkey long, l_suppkey long",
    )
    part = spark.createDataFrame(
        [(1, "Brand#2", "SMALL", 4), (2, "Brand#1", "SMALL", 4)],
        "p_partkey long, p_brand string, p_type string, p_size int",
    )
    supplier = spark.createDataFrame(
        [(10, 5.0), (11, -1.0), (12, 9.0)],
        "s_suppkey long, s_acctbal double",
    )
    rows = part_supplier_variety(li, part, supplier).collect()
    # part 2 is the excluded brand; supplier 11 is a complainer
    assert [(r.p_brand, r.p_size, r.supplier_cnt) for r in rows] == [
        ("Brand#2", 4, 2)
    ]


@pytest.mark.spark
def test_excess_class_shippers_threshold(spark):
    """Only suppliers above the ppm share of the class total pass;
    out-of-class parts and out-of-window lines don't contribute."""
    from lasdb_spark.operators.relational import excess_class_shippers

    li = spark.createDataFrame(
        [
            (1, 10, 98.0, "1997-05-01"),   # in class+window
            (1, 11, 1.0, "1997-05-01"),    # tiny share
            (1, 10, 50.0, "1998-05-01"),   # out of window
            (2, 11, 500.0, "1997-05-01"),  # out of class
            (1, 12, 1.0, "1997-06-01"),    # tiny share
        ],
        "l_partkey long, l_suppkey long, l_quantity double, d string",
    ).selectExpr(
        "l_partkey", "l_suppkey", "l_quantity",
        "CAST(d AS TIMESTAMP) AS l_shipdate",
    )
    part = spark.createDataFrame(
        [(1, "red widget"), (2, "blue bolt")],
        "p_partkey long, p_name string",
    )
    supplier = spark.createDataFrame(
        [(10, "S10"), (11, "S11"), (12, "S12")],
        "s_suppkey long, s_name string",
    )
    rows = excess_class_shippers(li, part, supplier).collect()
    assert [(r.s_name, r.qty, r.share_ppm) for r in rows] == [
        ("S10", 98.0, 980000)
    ]


@pytest.mark.spark
def test_contrastive_triplets_negative_screen(spark, sf_dir):
    """Every triplet's negative is a real doc distinct from both pair
    members and never a near-dup of the anchor."""
    from lasdb_spark.operators.dedup import (
        contrastive_triplets,
        minhash_lsh_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    trips = contrastive_triplets(docs).collect()
    assert trips, "expected at least one triplet on the test corpus"
    pairs = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(docs).select("doc_a", "doc_b").collect()
    }
    nd = pairs | {(b, a) for a, b in pairs}
    ids = {r.doc_id for r in docs.select("doc_id").collect()}
    for t in trips:
        assert (t.anchor, t.positive) in pairs
        assert t.negative in ids
        assert t.negative not in (t.anchor, t.positive)
        assert (t.anchor, t.negative) not in nd


@pytest.mark.spark
def test_weighted_sample_is_weight_monotone(spark):
    """With equal hash salt streams, the sample favors heavy docs:
    a doc with overwhelming weight is always selected, and the keys
    are valid (ln(u)/w < 0) with ranks dense from 1."""
    from lasdb_spark.operators.text import weighted_sample

    docs = spark.createDataFrame(
        [(i, "x", 10 if i else 10_000_000) for i in range(100)],
        "doc_id long, text string, n_chars long",
    )
    rows = weighted_sample(docs, k=5).orderBy("rank").collect()
    assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
    assert all(r.key < 0 for r in rows)
    assert rows[0].doc_id == 0 and rows[0].weight == 10_000_000


@pytest.mark.spark
def test_incremental_clusters_equal_recompute(spark, sf_dir, tmp_path):
    """Star edges + index probe + increment banding give exactly the
    full recompute's labels (the production ingestion loop contract)."""
    from pyspark.sql import functions as F

    from lasdb_spark.operators.dedup import (
        dedup_clusters,
        dedup_clusters_incremental,
    )
    from lasdb_spark.operators.dedup_index import build_dedup_index

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = str(tmp_path / "idx")
    build_dedup_index(docs.where(F.col("doc_id") % 2 == 0), idx)
    old = dedup_clusters(docs.where(F.col("doc_id") % 2 == 0))
    inc = dedup_clusters_incremental(
        docs.where(F.col("doc_id") % 2 == 1), spark, idx, old
    )
    full = dedup_clusters(docs)
    assert sorted(map(tuple, inc.collect())) == sorted(
        map(tuple, full.collect())
    )


@pytest.mark.spark
def test_label_propagation_finds_planted_communities(spark):
    """Two disjoint repeat-co-purchase cliques converge to two
    communities labeled by their smallest member."""
    from lasdb_spark.operators.graph import copurchase_communities

    rows = []
    # clique A: parts 1-3 bought together in orders 1..3 (weight 3)
    for o in (1, 2, 3):
        for p in (1, 2, 3):
            rows.append((o, p))
    # clique B: parts 10-12 in orders 11..13
    for o in (11, 12, 13):
        for p in (10, 11, 12):
            rows.append((o, p))
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    got = {
        r.community: r.n_members
        for r in copurchase_communities(li).collect()
    }
    assert got == {1: 3, 10: 3}


@pytest.mark.spark
def test_session_transitions_respect_boundaries(spark):
    """Transitions never cross the 30-minute session gap, and ppm
    probabilities are the floored per-prev conditional shares."""
    from lasdb_spark.operators.relational import session_transitions

    ev = spark.createDataFrame(
        [
            (1, 1, "a", "2024-01-01 10:00:00"),
            (2, 1, "b", "2024-01-01 10:05:00"),
            (3, 1, "a", "2024-01-01 10:10:00"),
            # > 30 min gap: new session, no b->? or a->? across it
            (4, 1, "c", "2024-01-01 12:00:00"),
            (5, 1, "a", "2024-01-01 12:01:00"),
        ],
        "event_id long, user_id long, event_type string, d string",
    ).selectExpr(
        "event_id", "user_id", "event_type", "CAST(d AS TIMESTAMP) AS ts"
    )
    got = {
        (r.prev_type, r.next_type): (r.n, r.p_ppm)
        for r in session_transitions(ev).collect()
    }
    # the 10:10 "a" ends session 1 (its next event is 110 min away),
    # so there is NO a->c edge; every observed prev has one successor
    assert got == {
        ("a", "b"): (1, 1000000),
        ("b", "a"): (1, 1000000),
        ("c", "a"): (1, 1000000),
    }


@pytest.mark.spark
def test_copurchase_rules_math(spark):
    """Three orders: {1,2} twice, {1,3} once -> rule 1->2 has
    support 2/3, confidence 2/3, lift (2*3)/(3*2)=1; pair (1,3)
    falls below min_pairs and is cut."""
    from lasdb_spark.operators.graph import copurchase_rules

    li = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 3)],
        "l_orderkey long, l_partkey long",
    )
    got = {
        (r.antecedent, r.consequent): r
        for r in copurchase_rules(li).collect()
    }
    assert set(got) == {(1, 2), (2, 1)}
    r12 = got[(1, 2)]
    assert r12.n_pair == 2
    assert r12.support_ppm == 666666       # floor(2e6/3)
    assert r12.confidence_ppm == 666666    # floor(2e6/3): part 1 in 3 orders
    assert r12.lift == 1.0                 # 2*3/(3*2)
    r21 = got[(2, 1)]
    assert r21.confidence_ppm == 1000000   # part 2 in 2 orders, both with 1


@pytest.mark.spark
def test_stream_psi_counts_equal_batch(spark, sf_dir):
    """Drained per-(pos, bin) monitor counts equal the batch scan's
    counts (commutative fold + shared bin expression), so the
    assembled report equals the batch PSI audit row-for-row."""
    from pyspark.sql import functions as F

    from lasdb_spark.operators.similarity import (
        embedding_drift_psi,
        psi_reference_ranges,
    )
    from lasdb_spark.streaming.drift import (
        embeddings_stream_multibatch,
        stream_psi_cells,
    )
    from lasdb_spark.streaming.events import run_to_memory
    from lasdb_spark.streaming.sketch import drained_final

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rng = psi_reference_ranges(embs)
    run_to_memory(
        stream_psi_cells(
            embeddings_stream_multibatch(spark, sf_dir).where(
                F.col("vec_id") % 2 == 1
            ),
            rng,
        ),
        "psi_cells_t",
        "update",
        state_partitions=8,
    )
    cur = drained_final(spark, "psi_cells_t", ["pos", "bin"], counter="c_cur")
    streamed = sorted(
        map(tuple, embedding_drift_psi(embs, cur_cells=cur).collect())
    )
    batch = sorted(map(tuple, embedding_drift_psi(embs).collect()))
    assert streamed == batch


@pytest.mark.spark
def test_sq8_error_bounded_by_half_step(spark):
    """Reconstruction error of in-range components is bounded by
    step/2; a constant dimension (step 0) reconstructs exactly."""
    from lasdb_spark.operators.similarity import sq8_error_report

    embs = spark.createDataFrame(
        [(i, [i / 10.0, 5.0]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    got = {r.pos: r for r in sq8_error_report(embs).collect()}
    # dim 0: range 1.9, step ~0.00745 -> half-step ~3726 micro
    assert got[0].max_abs_err_micro <= 3727
    assert got[0].rmse_micro <= got[0].max_abs_err_micro
    # dim 1 constant: code 0, decoded == mn == 5.0 -> zero error
    assert got[1].max_abs_err_micro == 0 and got[1].rmse_micro == 0.0


@pytest.mark.spark
def test_cohort_ltv_cumsum(spark):
    """Cohort day is the user's FIRST ACTIVE day (any event type);
    only purchases carry value; cum_cents accumulates within cohort."""
    from lasdb_spark.operators.relational import cohort_ltv

    ev = spark.createDataFrame(
        [
            (1, 1, "click", 0.0, "2024-01-01 01:00:00"),
            (2, 1, "purchase", 10.0, "2024-01-02 01:00:00"),
            (3, 1, "purchase", 2.5, "2024-01-02 02:00:00"),
            (4, 1, "purchase", 5.0, "2024-01-03 01:00:00"),
            (5, 2, "purchase", 1.0, "2024-01-02 01:00:00"),
        ],
        "event_id long, user_id long, event_type string, value double, d string",
    ).selectExpr(
        "event_id", "user_id", "event_type", "value",
        "CAST(d AS TIMESTAMP) AS ts",
    )
    rows = {
        (r.cohort_day, r.day_offset): (r.day_cents, r.cum_cents)
        for r in cohort_ltv(ev).collect()
    }
    d0 = 19723  # 2024-01-01 in epoch days
    assert rows == {
        (d0, 1): (1250, 1250),       # user 1: 10.00 + 2.50 on day 1
        (d0, 2): (500, 1750),        # user 1: 5.00 cumulated
        (d0 + 1, 0): (100, 100),     # user 2 cohort, day 0
    }
