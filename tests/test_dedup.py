"""Dedup operator edge cases the oracle corpus doesn't exercise."""

import pytest
from pyspark.sql import functions as F


@pytest.mark.spark
def test_shingles_short_docs(spark):
    """Docs with fewer than n tokens yield NO shingles (matching the
    DuckDB twin's empty range()) instead of crashing on the descending
    sequence(1, 0) → element_at out-of-bounds path."""
    from lasdb_spark.operators.dedup import shingles

    docs = spark.createDataFrame(
        [
            (1, "one two"),
            (2, "solo"),
            (3, ""),
            (4, "alpha beta gamma delta"),
        ],
        "doc_id int, text string",
    )
    by_doc = {}
    for r in shingles(docs).collect():
        by_doc.setdefault(r.doc_id, set()).add(r.shingle)
    assert set(by_doc) == {4}
    assert by_doc[4] == {"alpha beta gamma", "beta gamma delta"}


@pytest.mark.spark
def test_lsh_pipeline_survives_short_docs(spark):
    """The full MinHash-LSH + clustering path must tolerate sub-n-token
    docs: they carry no shingles, join into no pairs, and come back as
    singleton clusters."""
    from lasdb_spark.operators.dedup import dedup_clusters, minhash_lsh_pairs

    body = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(i, body) for i in range(4)]
        + [(10, "tiny"), (11, "two words"), (12, "")],
        "doc_id int, text string",
    )
    pairs = minhash_lsh_pairs(docs).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {
        (a, b) for a in range(4) for b in range(4) if a < b
    }
    clusters = {r.doc_id: r.cluster_id for r in dedup_clusters(docs).collect()}
    assert clusters == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 11, 12: 12}


@pytest.mark.spark
def test_adjacent_candidates_preserve_clusters(spark):
    """'adjacent' candidate mode (linear per bucket) must produce the
    same connected components as the quadratic 'all' mode on a
    NEAR-dup cluster (not byte-identical — the case the exact-dup
    collapse cannot linearize), with genuinely fewer verified pairs."""
    from lasdb_spark.operators.dedup import dedup_clusters, minhash_lsh_pairs

    base = (
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
        "eiusmod tempor incididunt"
    )
    rows = [(i, f"{base} variant{i}") for i in range(40)] + [
        (100 + i, f"wholly different doc number {i} tokens q{i} r{i} s{i}")
        for i in range(10)
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")

    n_all = minhash_lsh_pairs(docs).count()
    n_adj = minhash_lsh_pairs(docs, candidates="adjacent").count()
    assert n_all == 40 * 39 // 2  # every variant pair verifies (jac 11/13)
    assert 39 <= n_adj < n_all / 4  # linear-ish, not quadratic
    # candidates='all' must be explicit now that the clustering default
    # is 'adjacent' — this test is the gate for that default
    cl_all = {
        r.doc_id: r.cluster_id
        for r in dedup_clusters(docs, candidates="all").collect()
    }
    cl_adj = {
        r.doc_id: r.cluster_id
        for r in dedup_clusters(docs, candidates="adjacent").collect()
    }
    assert cl_all == cl_adj


@pytest.mark.spark
def test_banded_pipelines_survive_exact_dup_skew(spark):
    """1000 byte-identical docs: banding raw docs would make the band
    self-join produce ~10^6 × bands candidate rows (the classic LSH skew
    blowup on real corpora full of boilerplate). The exact-dup collapse
    keeps the band join at one row per distinct text; the quadratic part
    is only the REQUIRED output expansion. Must finish well inside a
    local time budget and produce the exact full pair set."""
    import time

    base = (
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
        "eiusmod tempor incididunt"
    )
    near = base.rsplit(" ", 1)[0] + " mutated"  # jac 10/12 vs base
    rows = (
        [(i, base) for i in range(1000)]
        + [(3000 + i, near) for i in range(3)]
        + [
            (2000 + i, f"distinct doc number {i} with unique words w{i} v{i} u{i}")
            for i in range(20)
        ]
    )
    docs = spark.createDataFrame(rows, "doc_id int, text string")

    from lasdb_spark.operators.dedup import minhash_lsh_pairs, simhash_pairs

    t0 = time.time()
    mh = minhash_lsh_pairs(docs)
    n_within_a = 1000 * 999 // 2
    n_cross = 1000 * 3
    n_within_b = 3
    assert mh.count() == n_within_a + n_cross + n_within_b
    # spot-check scores: within = exactly 1.0, cross = 10/12
    assert mh.filter((F.col("doc_a") == 0) & (F.col("doc_b") == 1)).first().jac == 1.0
    assert (
        mh.filter((F.col("doc_a") == 0) & (F.col("doc_b") == 3000)).first().jac
        == round(10 / 12, 6)
    )
    t_mh = time.time() - t0

    t0 = time.time()
    sh = simhash_pairs(docs)
    # within-cluster pairs are hamming 0; near/distinct cross pairs vary
    assert sh.filter(F.col("hamming") == 0).count() >= n_within_a
    assert sh.filter((F.col("doc_a") == 0) & (F.col("doc_b") == 1)).first().hamming == 0
    t_sh = time.time() - t0
    assert t_mh < 120 and t_sh < 120, (t_mh, t_sh)


def test_spread_accounts_for_file_splitting(spark, tmp_path):
    """A corpus stored as few LARGE splittable files is NOT under-split:
    the scan splits them at maxPartitionBytes, so _spread must not add
    a full-corpus repartition shuffle. A genuinely tiny single file
    still spreads."""
    from lasdb_spark.operators.dedup import _parse_bytes, _spread

    assert _parse_bytes("134217728b", 0) == 128 << 20
    assert _parse_bytes("128mb", 0) == 128 << 20
    assert _parse_bytes("auto", 77) == 77  # unparsable → default

    p = str(tmp_path / "one_big")
    spark.range(0, 20000).selectExpr(
        "id AS doc_id", "repeat(uuid(), 8) AS text"
    ).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "16kb")
        assert _spread(df) is df  # many estimated splits → no shuffle
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert _spread(df) is not df  # one small file at default mpb → spread


@pytest.mark.spark
def test_connected_components_long_chain_path_halving(spark, monkeypatch):
    """A 100-node CHAIN (the shape candidates='adjacent' banding
    produces for a large near-dup cluster) must fully merge well under
    the round cap: path halving contracts pointer depth geometrically,
    so ~log2(100)+1 rounds suffice where plain propagation needs 100."""
    import lasdb_spark.operators.dedup as dd

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(99)], "doc_a long, doc_b long"
    )
    monkeypatch.setattr(dd, "_CC_MAX_ROUNDS", 10)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)  # no non-convergence
        out = dd.connected_components(pairs).collect()
    assert len(out) == 100
    assert {r.cluster_id for r in out} == {0}


@pytest.mark.spark
def test_connected_components_warns_when_capped(spark, monkeypatch):
    import lasdb_spark.operators.dedup as dd

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "doc_a long, doc_b long"
    )
    monkeypatch.setattr(dd, "_CC_MAX_ROUNDS", 2)
    with pytest.warns(RuntimeWarning, match="did not converge"):
        dd.connected_components(pairs)


@pytest.mark.spark
def test_keepers_and_curate_reuse_provided_clustering(spark):
    """clusters= short-circuits the LSH pipeline: identical output,
    strictly fewer Spark jobs, and a hand-built clustering is honored
    verbatim (proof nothing recomputes underneath)."""
    from lasdb_spark.operators.curate import curate_corpus
    from lasdb_spark.operators.dedup import dedup_clusters, dedup_keepers

    body = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(i, body, "en", "web", len(body)) for i in range(3)]
        + [(7, "an unrelated document about maritime law", "en", "web", 40)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sc = spark.sparkContext
    clusters = dedup_clusters(docs).localCheckpoint()

    sc.setJobGroup("full", "recompute path")
    full = {r.doc_id for r in dedup_keepers(docs).collect()}
    n_full = len(sc.statusTracker().getJobIdsForGroup("full"))
    sc.setJobGroup("reuse", "provided clustering")
    reused = {r.doc_id for r in dedup_keepers(docs, clusters=clusters).collect()}
    n_reuse = len(sc.statusTracker().getJobIdsForGroup("reuse"))
    sc.setJobGroup(None, None)
    assert reused == full == {0, 7}
    assert n_reuse < n_full

    cur_full = {r.doc_id for r in curate_corpus(docs).collect()}
    cur_reused = {r.doc_id for r in curate_corpus(docs, clusters=clusters).collect()}
    assert cur_reused == cur_full

    # a hand-built clustering is used verbatim
    fake = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 2), (7, 2)], "doc_id long, cluster_id long"
    )
    assert {
        r.doc_id for r in dedup_keepers(docs, clusters=fake).collect()
    } == {0, 2}


@pytest.mark.spark
def test_jaccard_search_semantics(spark):
    from lasdb_spark.operators.dedup import jaccard_search

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over the lazy cat"),  # near-dup
            (2, "the quick brown fox runs under a red fence"),
            (3, "completely different words about spark plans here"),
            (4, "to be"),  # < n tokens: no shingles, never a hit
        ],
        "doc_id long, text string",
    )
    got = jaccard_search(docs, 0, k=3).collect()
    ids = [r.doc_id for r in got]
    # ranked: 1 (6 of 7+7-6 shared shingles) above 2; 3 and 4 absent
    assert ids[0] == 1 and 2 in ids and 3 not in ids and 4 not in ids
    assert got[0].jac > got[-1].jac
    # the query doc itself is excluded
    assert 0 not in ids
    # short query doc -> no shingles -> empty
    assert jaccard_search(docs, 4, k=3).count() == 0


@pytest.mark.spark
def test_jaccard_search_plan(spark, sf_dir):
    from lasdb_spark.operators.dedup import jaccard_search

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = jaccard_search(docs, 0, k=10)._jdf.queryExecution().executedPlan(
    ).toString()
    assert "TakeOrderedAndProject" in plan  # never a global sort
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


@pytest.mark.spark
def test_chunk_neardup_finds_shared_passage(spark):
    """Two documents that share ONE verbatim paragraph inside
    otherwise-unrelated text: whole-document MinHash at tau=0.8 misses
    them, the chunk-level pass finds the passage; intra-document
    window overlap never surfaces as a pair."""
    from lasdb_spark.operators.dedup import (
        chunk_neardup_pairs,
        minhash_lsh_pairs,
    )

    rng = __import__("random").Random(5)
    vocab = [f"w{i}" for i in range(400)]

    def para(n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    # one full chunk window (64 tokens) starting on a stride boundary
    # (96 = 2×48) so the window at offset 96 IS the shared paragraph in
    # both docs; unaligned placement would split it across windows and
    # dilute per-chunk Jaccard below tau
    shared = para(64)
    rows = [
        (0, para(96) + " " + shared + " " + para(128)),
        (1, para(96) + " " + shared + " " + para(128)),
        (2, para(288)),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    whole = minhash_lsh_pairs(docs).collect()
    assert whole == []  # document-level pass is blind to the passage

    pairs = chunk_neardup_pairs(docs).collect()
    assert pairs, "chunk-level pass must surface the shared paragraph"
    assert all(r.doc_a != r.doc_b for r in pairs)
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(0, 1)}


@pytest.mark.spark
def test_crosscorpus_neardup_pairs(spark):
    """Cross-side pairs only; byte-identical A/B docs survive the
    exact-dup collapse; overlapping id spaces are disambiguated by the
    side bit; a near-dup pair WITHIN one corpus never appears."""
    from lasdb_spark.operators.dedup import crosscorpus_neardup_pairs

    base = " ".join(f"tok{i}" for i in range(40))
    near = " ".join(f"tok{i}" for i in range(39)) + " tokX"
    other = " ".join(f"zzz{i}" for i in range(40))
    a = spark.createDataFrame(
        [(0, base), (1, near), (2, other)], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        # id 0 reused on purpose: side bit must keep it distinct
        [(0, base), (7, "totally unrelated words here " * 8)],
        "doc_id long, text string",
    )
    got = {
        (r.a_id, r.b_id): r.jac
        for r in crosscorpus_neardup_pairs(a, b).collect()
    }
    # A0 == B0 byte-identical (collapse path), A1 near-dup of B0;
    # the A0~A1 within-corpus pair is excluded by construction
    assert set(got) == {(0, 0), (1, 0)}
    assert got[(0, 0)] == 1.0
    assert 0.8 <= got[(1, 0)] < 1.0


@pytest.mark.spark
def test_containment_vs_jaccard_asymmetry(spark):
    """A superset document contains the query fully (containment 1.0)
    while its Jaccard is < 1; containment never falls below Jaccard."""
    from lasdb_spark.operators.dedup import containment_search, jaccard_search

    q = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (0, q),
            (1, q + " " + "filler " * 30),  # superset
            (2, "alpha beta gamma unrelated tail words here"),
            (3, "totally different content with no overlap at all"),
        ],
        "doc_id long, text string",
    )
    cont = {r.doc_id: r.containment for r in containment_search(docs, 0).collect()}
    jac = {r.doc_id: r.jac for r in jaccard_search(docs, 0).collect()}
    assert cont[1] == 1.0 and jac[1] < 1.0
    assert 3 not in cont
    for d, c in cont.items():
        assert c >= jac.get(d, 0.0) - 1e-9


@pytest.mark.spark
def test_cluster_size_histogram_accounting(spark, sf_dir):
    """Histogram accounting: Σ n_docs equals the corpus size, and a
    corpus with planted duplicate families reports them at the right
    sizes."""
    from lasdb_spark.operators.dedup import cluster_size_histogram

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hist = cluster_size_histogram(docs).collect()
    assert sum(r.n_docs for r in hist) == docs.count()
    assert all(r.n_docs == r.cluster_size * r.n_clusters for r in hist)

    planted = spark.createDataFrame(
        [(1, "aa bb cc dd ee ff gg"), (2, "aa bb cc dd ee ff gg"),
         (3, "aa bb cc dd ee ff gg"), (4, "totally different text here now"),
         (5, "another unique document with words")],
        "doc_id long, text string",
    )
    h = {r.cluster_size: r.n_clusters
         for r in cluster_size_histogram(planted).collect()}
    assert h == {1: 2, 3: 1}


@pytest.mark.spark
def test_duplicate_spans_planted_passage(spark):
    """A 12-token passage planted in two otherwise-unrelated docs must
    surface as one maximal run per doc with the exact token extent;
    unique docs must emit nothing; a same-doc repeat must NOT count
    (min_docs is DISTINCT docs)."""
    from lasdb_spark.operators.dedup import duplicate_spans

    passage = "the quick brown fox jumps over the lazy dog near the river"
    docs = spark.createDataFrame(
        [
            (1, "intro words here " + passage + " trailing one"),
            (2, passage + " completely different ending text follows now"),
            (3, "nothing shared with anything else at all in this doc"),
            # doc 4 repeats ITS OWN phrase twice - within-doc repeats
            # alone never cross the distinct-doc threshold
            (4, "solo repeated phrase alpha beta gamma delta epsilon "
                "solo repeated phrase alpha beta gamma delta epsilon"),
        ],
        "doc_id long, text string",
    )
    runs = duplicate_spans(docs, width=8, min_docs=2).collect()
    by_doc = {}
    for r in runs:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 2}
    (r1,), (r2,) = by_doc[1], by_doc[2]
    # doc1: passage tokens 3..14 -> window starts 3..7 (12-8+1=5 wins)
    assert (r1["run_start"], r1["run_end"], r1["span_tokens"]) == (3, 7, 12)
    # doc2: passage at 0 -> starts 0..4
    assert (r2["run_start"], r2["run_end"], r2["span_tokens"]) == (0, 4, 12)
    assert r1["run_windows"] == 5 and r2["run_windows"] == 5


@pytest.mark.spark
def test_duplicate_spans_short_docs_and_merge(spark):
    """Docs shorter than the window emit nothing (no negative-range
    blowup); two disjoint shared passages in one doc yield two runs."""
    from lasdb_spark.operators.dedup import duplicate_spans

    shared_a = "alpha beta gamma delta epsilon zeta eta theta"  # 8 toks
    shared_b = "one two three four five six seven eight"  # 8 toks
    docs = spark.createDataFrame(
        [
            (1, shared_a + " xx yy zz ww " + shared_b),
            (2, shared_a),
            (3, shared_b),
            (4, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    runs = duplicate_spans(docs, width=8, min_docs=2).collect()
    d1 = sorted(
        (r["run_start"], r["run_end"]) for r in runs if r["doc_id"] == 1
    )
    assert d1 == [(0, 0), (12, 12)]
    assert {r["doc_id"] for r in runs} == {1, 2, 3}


@pytest.mark.spark
def test_entity_matching_blocking_and_verify(spark):
    """Every single-typo variant shares a blocking key with its
    canonical form (drop/duplicate keep the suffix key; swap/replace
    keep it too — and the verify knows the exact edit distance);
    unrelated names never pair."""
    from lasdb_spark.operators.entity import (
        entity_match_pairs,
        make_entity_corpus,
    )

    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    ents = make_entity_corpus(docs)
    names = {r.entity_id: r.name for r in ents.collect()}
    # family 0 canonical is 'james smith 0'; the four typo variants
    assert names[0] == "james smith 0"
    assert names[1] == "jaes smith 0"       # drop pos 3
    assert names[2] == "jmaes smith 0"      # swap pos 2,3
    assert names[3] == "jammes smith 0"     # duplicate pos 3
    assert names[4] == "jxmes smith 0"      # replace pos 2
    got = {
        (r.entity_a, r.entity_b): r.lev
        for r in entity_match_pairs(ents).collect()
    }
    # all 10 within-family pairs of family 0 survive; canonical->drop
    # is edit distance 1, swap is 2
    assert got[(0, 1)] == 1
    assert got[(0, 2)] == 2
    assert got[(0, 3)] == 1
    assert got[(0, 4)] == 1
    assert all(a // 5 == b // 5 for (a, b) in got)
    assert sum(1 for (a, b) in got if a // 5 == 0 == b // 5) == 10
