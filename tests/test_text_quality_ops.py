"""Decontamination + repetition-scoring edge cases (the oracle mirror
covers full-corpus parity; these pin the operator semantics)."""

import pytest
from pyspark.sql import functions as F


@pytest.mark.spark
def test_decontaminate_removes_overlapping_docs(spark):
    from lasdb_spark.operators.decontaminate import (
        contamination_report,
        decontaminate,
    )

    docs = spark.createDataFrame(
        [
            (1, "the capital of france is paris indeed"),
            (2, "completely unrelated text about gardening tools"),
            (3, "question: the capital of france is what city"),
            (4, "to be"),  # < n tokens: no shingles, never contaminated
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "what is the capital of france")], "doc_id long, text string"
    )
    rep = {r.doc_id: r.n_hits for r in contamination_report(docs, bench).collect()}
    # docs 1 and 3 share the 'capital of france' / 'the capital of'
    # shingles with the benchmark; 2 and 4 do not
    assert set(rep) == {1, 3} and all(v >= 1 for v in rep.values())

    clean = {r.doc_id for r in decontaminate(docs, bench).collect()}
    assert clean == {2, 4}

    # a higher min_hits threshold spares low-overlap docs
    strict = {
        r.doc_id
        for r in contamination_report(docs, bench, min_hits=99).collect()
    }
    assert strict == set()


@pytest.mark.spark
def test_token_entropy_reference_values(spark):
    """Entropy against hand-computed Shannon values: uniform text hits
    ln(n_distinct), single-token boilerplate hits exactly 0, and a
    skewed mix lands between."""
    import math

    from lasdb_spark.operators.text import token_entropy

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),          # uniform: H = ln(4)
            (2, "spam spam spam"),   # one token: H = 0
            (3, "x x x y"),          # skewed: ln(4) - (3 ln 3)/4
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in token_entropy(docs).collect()}
    assert out[1].n_tokens == 4 and out[1].n_distinct == 4
    assert out[1].entropy == round(math.log(4), 6)
    assert out[2].entropy == 0.0 and out[2].n_distinct == 1
    assert out[3].entropy == round(math.log(4) - 3 * math.log(3) / 4, 6)
    assert 0 < out[3].entropy < out[1].entropy


@pytest.mark.spark
def test_repetition_stats_signals(spark):
    from lasdb_spark.operators.text import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam"),  # one token, one bigram
            (2, "all words here are fully distinct"),
            (3, "solo"),  # no bigram
            (4, ""),  # no tokens at all
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert rows[1].dup_token_ratio == 0.8  # 1 distinct of 5
    assert rows[1].top_bigram_frac == 1.0  # every bigram is 'spam spam'
    assert rows[2].dup_token_ratio == 0.0
    assert rows[2].top_bigram_frac == pytest.approx(1 / 5, abs=1e-6)
    assert rows[3].n_tokens == 1 and rows[3].top_bigram_frac == 0.0
    assert rows[4].n_tokens == 0
    assert rows[4].dup_token_ratio == 0.0 and rows[4].top_bigram_frac == 0.0


@pytest.mark.spark
def test_token_budget_sample_semantics(spark, sf_dir):
    """Budget respected per language; greedy best-first (min kept
    quality >= max dropped quality per lang); quality_floor below the
    cut changes nothing; one lang-partitioned shuffle in the plan."""
    from lasdb_spark.operators.text import quality_scores, token_budget_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    budgets, default = {"en": 800}, 300
    cut = token_budget_sample(docs, budgets, default).cache()
    sums = {r.lang: r.s for r in cut.groupBy("lang").agg(
        F.sum("n_tokens").alias("s")).collect()}
    for lang, s in sums.items():
        assert s <= budgets.get(lang, default), (lang, s)
    # greedy: within a lang, nothing dropped outranks anything kept
    kept_ids = {r.doc_id for r in cut.select("doc_id").collect()}
    q = quality_scores(docs).join(docs.select("doc_id", "lang"), "doc_id")
    rows = q.select("doc_id", "lang", "quality").collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append((r.quality, r.doc_id))
    for lang, items in by_lang.items():
        kept = [(qv, d) for qv, d in items if d in kept_ids]
        dropped = [(qv, -d) for qv, d in items if d not in kept_ids]
        if kept and dropped:
            assert min(kept) > (max(dropped)[0], -max(dropped)[1]) or min(
                kept
            ) > max((qv, d) for qv, d in items if d not in kept_ids)
    # a floor below every kept doc's quality must not change the cut
    min_q = cut.agg(F.min("quality")).first()[0]
    floored = token_budget_sample(docs, budgets, default, quality_floor=min_q)
    assert floored.exceptAll(cut).count() == 0
    assert cut.exceptAll(floored).count() == 0
    # plan gate on a NON-cache-matching parameterization (the cached
    # `cut` plan would otherwise be substituted in wholesale)
    plan = token_budget_sample(docs, {"en": 801}, default)._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    cut.unpersist()


def test_chunking_covers_every_token(spark, sf_dir):
    """Reconstructing each doc from its chunks (first `stride` tokens
    of every chunk, all of the last) must give back the exact token
    stream — no token lost or duplicated at window seams."""
    import re

    from lasdb_spark.operators.text import (
        CHUNK_STRIDE,
        TOKEN_RE,
        chunk_documents,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    chunks = {}
    for r in chunk_documents(docs).collect():
        chunks.setdefault(r.doc_id, {})[r.chunk_id] = r.chunk
    texts = {r.doc_id: r.text for r in docs.collect()}
    assert set(chunks) == {
        d for d, t in texts.items() if re.findall(TOKEN_RE, t)
    }
    for doc_id, by_id in chunks.items():
        toks = re.findall(TOKEN_RE, texts[doc_id])
        rebuilt = []
        last = max(by_id)
        assert sorted(by_id) == list(range(last + 1))
        for cid in range(last + 1):
            ctoks = by_id[cid].split(" ")
            rebuilt.extend(ctoks if cid == last else ctoks[:CHUNK_STRIDE])
        assert rebuilt == toks, doc_id


def test_chunking_boundary_cases(spark):
    """Adversarial corpus: token counts straddling every window
    boundary plus messy whitespace, checked against a pure-python
    reference in one Spark pass."""
    import re

    from lasdb_spark.operators.text import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        TOKEN_RE,
        chunk_documents,
    )

    sizes = [0, 1, 2, 47, 48, 49, 63, 64, 65, 111, 112, 113, 160, 200]
    rows = []
    for i, n in enumerate(sizes):
        sep = [" ", "  ", "\t", "\n", " \t "][i % 5]
        rows.append((i, sep.join(f"w{j}" for j in range(n))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in chunk_documents(docs).collect():
        got.setdefault(r.doc_id, {})[r.chunk_id] = (
            r.n_chunk_tokens,
            r.chunk,
        )
    for i, n in enumerate(sizes):
        toks = re.findall(TOKEN_RE, rows[i][1])
        assert len(toks) == n
        if n == 0:
            assert i not in got
            continue
        want_nc = 1 + max(0, -(-(n - CHUNK_TOKENS) // CHUNK_STRIDE))
        assert len(got[i]) == want_nc, (i, n)
        for cid in range(want_nc):
            piece = toks[cid * CHUNK_STRIDE : cid * CHUNK_STRIDE + CHUNK_TOKENS]
            assert got[i][cid] == (len(piece), " ".join(piece)), (i, cid)


def test_pipeline_materialize_identical(spark, sf_dir):
    """materialize=True (checkpointed survivor tables) must produce
    the byte-same result as the fully lazy plan."""
    from lasdb_spark.operators.curate import pretraining_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lazy = pretraining_corpus(docs, budgets={"en": 2000}, default_budget=800)
    mat = pretraining_corpus(
        docs, budgets={"en": 2000}, default_budget=800, materialize=True
    )
    assert lazy.exceptAll(mat).count() == 0
    assert mat.exceptAll(lazy).count() == 0
    assert mat.count() > 0


def test_retention_matches_python_reference(spark, sf_dir):
    """Cohort triangle recomputed driver-side from the raw events."""
    from collections import defaultdict

    from lasdb_spark.operators.relational import user_retention
    from lasdb_spark.sources.events import events_df

    ev = events_df(spark, sf_dir)
    got = {
        (r.cohort_day, r.day_offset): r.n_users
        for r in user_retention(ev).collect()
    }
    from datetime import timezone

    days = defaultdict(set)
    for r in ev.select("user_id", "ts").collect():
        # same integer day arithmetic: epoch millis floor-div. The
        # collected naive datetime is session-UTC wall time — pin the
        # tz explicitly so .timestamp() doesn't apply the SYSTEM zone
        ms = int(r.ts.replace(tzinfo=timezone.utc).timestamp() * 1000)
        days[r.user_id].add(ms // 86400000)
    want = defaultdict(int)
    for _, ds in days.items():
        c = min(ds)
        for d in ds:
            want[(c, d - c)] += 1
    assert got == dict(want)


@pytest.mark.spark
def test_pii_detection_and_redaction(spark):
    from lasdb_spark.operators.text import pii_redact, pii_stats

    rows = [
        (0, "reach me at jane.doe+spam@mail.example.co or 415-555-0199"),
        (1, "server 10.0.0.7 and 192.168.1.255 pinged"),
        (2, "ssn 123-45-6789 but build 1.2.3 and v10.20.30.40"),
        (3, "clean text with nothing to hide"),
        (4, "double a@b.io c@d.io and dotted phone 123.456.7890"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    st = {r.doc_id: r for r in pii_stats(docs).collect()}
    assert (st[0].n_email, st[0].n_phone) == (1, 1)
    assert st[1].n_ipv4 == 2
    # 1.2.3 has too few octets, and v10.20.30.40 has no \b before the
    # first octet ('v' and '1' are both word chars) — only the SSN hits
    assert (st[2].n_ssn, st[2].n_ipv4) == (1, 0)
    assert st[3].n_pii == 0
    assert (st[4].n_email, st[4].n_phone) == (2, 1)

    red = {r.doc_id: r for r in pii_redact(docs).collect()}
    assert red[0].text == "reach me at <EMAIL> or <PHONE>"
    assert red[1].text == "server <IPV4> and <IPV4> pinged"
    assert red[2].text == "ssn <SSN> but build 1.2.3 and v10.20.30.40"
    assert red[3].text == rows[3][1] and red[3].n_redacted == 0
    # the dotted phone is consumed by the phone pass BEFORE the ipv4
    # pattern could see "123.456.7890" (order-dependence armor)
    assert red[4].text == "double <EMAIL> <EMAIL> and dotted phone <PHONE>"


@pytest.mark.spark
def test_bigram_surprisal_exact_and_order_sensitivity(spark):
    """Exact parity with a pure-python reference model, plus the
    signal the operator exists for: a token-shuffled doc shares its
    unigram profile with the fluent docs but carries globally-rare
    transitions, so it must score strictly higher."""
    import math
    from collections import Counter

    from lasdb_spark.operators.text import (
        BIGRAM_LAMBDA,
        WORD_RE,
        bigram_surprisal,
    )

    fluent = "the cat sat on the mat"
    rows = [(i, fluent) for i in range(5)] + [
        (5, "mat the on sat cat the"),  # same unigrams, scrambled order
        (6, "solo"),  # < 2 tokens -> no bigrams -> absent
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in bigram_surprisal(docs).collect()}
    assert 6 not in got

    import re

    def toks(t):
        return re.findall(WORD_RE, t.lower())

    bigs = {
        i: list(zip(toks(t)[:-1], toks(t)[1:])) for i, t in rows if i != 6
    }
    c12 = Counter(b for bs in bigs.values() for b in bs)
    c1 = Counter()
    uni = Counter()
    for (w1, w2), c in c12.items():
        c1[w1] += c
        uni[w2] += c
    total = sum(uni.values())
    lam, ulam = BIGRAM_LAMBDA, 1.0 - BIGRAM_LAMBDA
    for i, bs in bigs.items():
        want = sum(
            -math.log(
                lam * (c12[b] / c1[b[0]]) + ulam * (uni[b[1]] / total)
            )
            for b in bs
        ) / len(bs)
        assert got[i].n_bigrams == len(bs)
        assert abs(got[i].avg_bigram_surprisal - want) < 1e-5, i
    assert got[5].avg_bigram_surprisal > got[0].avg_bigram_surprisal


@pytest.mark.spark
def test_quality_ensemble_discriminates(spark):
    """The calibrated gate keeps fluent varied prose and drops
    repetitive keyword spam; empty docs score without NULLs."""
    from lasdb_spark.operators.text import quality_ensemble

    fluent = (
        "the quick brown fox jumps over a lazy dog while morning "
        "light spreads across the quiet valley and is slowly warming "
        "every rooftop of the old town with gentle amber color"
    ) * 3
    spam = "buy cheap pills " * 60
    rows = [(0, fluent), (1, spam), (2, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in quality_ensemble(docs).collect()}
    assert len(got) == 3
    assert got[0].keep is True
    assert got[1].keep is False
    assert got[2].keep is False and got[2].score is not None
    assert got[0].score > got[1].score > 0.0


@pytest.mark.spark
def test_novelty_first_doc_is_fully_novel(spark):
    """The first document is 100% novel; an exact copy later is 0%;
    partially-overlapping docs land in between."""
    from lasdb_spark.operators.text import novelty_scores

    docs = spark.createDataFrame(
        [
            (1, "aa bb cc dd ee ff"),
            (2, "aa bb cc dd ee ff"),          # exact copy -> 0 novelty
            (3, "aa bb cc xx yy zz ww"),       # partial overlap
            (4, "qq rr ss tt uu vv"),          # all new
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in novelty_scores(docs).collect()}
    assert out[1].novelty == 1.0
    assert out[2].novelty == 0.0
    assert 0.0 < out[3].novelty < 1.0
    assert out[4].novelty == 1.0


@pytest.mark.spark
def test_conversion_rates_window_semantics(spark):
    """A purchase inside the window converts; outside (or before
    signup) does not; users without signup are excluded."""
    import datetime as dt

    from lasdb_spark.operators.relational import conversion_rates

    t0 = dt.datetime(2024, 1, 5, 0, 0, 0)

    def ev(i, user, etype, hours):
        return (i, t0 + dt.timedelta(hours=hours), user, etype, 1.0, "{}")

    rows = spark.createDataFrame(
        [
            ev(1, 1, "signup", 0), ev(2, 1, "purchase", 5),      # converts
            ev(3, 2, "signup", 0), ev(4, 2, "purchase", 30),     # too late
            ev(5, 3, "purchase", 0), ev(6, 3, "signup", 1),      # pre-signup buy only
            ev(7, 4, "purchase", 2),                             # never signed up
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    out = conversion_rates(rows).collect()
    assert len(out) == 1
    r = out[0]
    assert r.signups == 3 and r.conversions == 1
    assert abs(r.rate - 1 / 3) < 1e-6


@pytest.mark.spark
def test_corpus_split_is_stable_and_exhaustive(spark, sf_dir):
    """Every doc lands in exactly one split; proportions are near
    90/5/5; assignment is independent of partitioning (re-run on a
    repartitioned frame gives the identical summary)."""
    from pyspark.sql import functions as F

    from lasdb_spark.operators.text import corpus_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = corpus_split(docs).collect()
    n_total = docs.count()
    by_split = {}
    for r in out:
        by_split[r.split] = by_split.get(r.split, 0) + r.n_docs
    assert sum(by_split.values()) == n_total
    assert 0.8 < by_split["train"] / n_total < 0.97
    assert by_split.get("val", 0) > 0 and by_split.get("test", 0) > 0
    again = corpus_split(docs.repartition(13)).collect()
    key = lambda rows: sorted(map(tuple, rows))
    assert key(out) == key(again)


@pytest.mark.spark
def test_bpe_pair_stats_counts_and_ties(spark):
    from lasdb_spark.operators.text import bpe_pair_stats

    docs = spark.createDataFrame(
        [(1, "ab ab ba"), (2, "AB cd")], "doc_id long, text string"
    )
    rows = {
        (r.left, r.right): (r.rank, r.pair_count)
        for r in bpe_pair_stats(docs).collect()
    }
    # word types: ab(freq 3, lowercased), ba(1), cd(1)
    assert rows[("a", "b")] == (1, 3)
    # (b,a) and (c,d) tie at 1 -> lexicographic tie-break
    assert rows[("b", "a")] == (2, 1)
    assert rows[("c", "d")] == (3, 1)


@pytest.mark.spark
def test_bpe_train_merges_canonical_greedy(spark):
    """Hand-computed: 'aaaa' x2 -> merge (a,a) with weighted count 6
    (3 adjacent pairs x freq 2), greedy leftmost re-segmentation
    [aa, aa] (NOT [aa, a, a] - the overlap case), then merge (aa, aa)
    with count 2, after which no pairs remain and training stops early."""
    from lasdb_spark.operators.text import bpe_train_merges

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "aaaa")], "doc_id long, text string"
    )
    m = [
        (r.merge_rank, r.left, r.right, r.pair_count, r.new_symbol)
        for r in bpe_train_merges(docs, n_merges=10).collect()
    ]
    assert m == [(1, "a", "a", 6, "aa"), (2, "aa", "aa", 2, "aaaa")]


@pytest.mark.spark
def test_bpe_train_first_merge_matches_pair_stats(spark, sf_dir):
    from lasdb_spark.operators.text import bpe_pair_stats, bpe_train_merges

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p1 = bpe_pair_stats(docs, top_k=1).collect()[0]
    # min_freq=1: pair_stats is the uncapped round-1 kernel, so give
    # the trainer the same (uncapped) vocabulary for the comparison
    m1 = bpe_train_merges(docs, n_merges=1, min_freq=1).collect()[0]
    assert (m1.left, m1.right, m1.pair_count) == (
        p1.left, p1.right, p1.pair_count
    )


@pytest.mark.spark
def test_bpe_train_cap_ignores_low_frequency_noise(spark):
    """r7 (VERDICT #4): the driver-state cap. A corpus of a clean
    repeated phrase plus a flood of UNIQUE noise tokens (the
    URLs/hashes/typos shape of raw web text) must train the same
    merge table with the cap on as the clean corpus alone — the
    hapax types are pruned distributedly before the collect."""
    from lasdb_spark.operators.text import bpe_train_merges

    clean = [(i, "hello hello world") for i in range(5)]
    noisy = clean + [
        (100 + i, f"zq{i}x{i * 7919}noise") for i in range(200)
    ]
    key = lambda df: [
        (r.merge_rank, r.left, r.right, r.pair_count, r.new_symbol)
        for r in df.collect()
    ]
    ref = key(bpe_train_merges(
        spark.createDataFrame(clean, "doc_id long, text string"),
        n_merges=6,
    ))
    capped = key(bpe_train_merges(
        spark.createDataFrame(noisy, "doc_id long, text string"),
        n_merges=6, min_freq=2,
    ))
    assert capped == ref and len(ref) > 0
    # and the max_types ceiling is a hard bound even on clean vocab
    tiny = key(bpe_train_merges(
        spark.createDataFrame(noisy, "doc_id long, text string"),
        n_merges=6, min_freq=1, max_types=2,
    ))
    assert tiny == ref  # top-2 types by freq = hello, world


@pytest.mark.spark
def test_importance_scores_favor_target_sources(spark, sf_dir):
    """Docs drawn FROM the target slice must on average score higher
    than raw docs (their tokens populate the target buckets), and the
    keep gate is exactly affinity > 0."""
    from pyspark.sql import functions as F

    from lasdb_spark.operators.text import (
        DSIR_TARGET_SOURCES,
        importance_scores,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = importance_scores(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    rows = scored.collect()
    assert all((r.affinity > 0) == r.keep for r in rows)
    t = [r.affinity for r in rows if r.source in DSIR_TARGET_SOURCES]
    r_ = [r.affinity for r in rows if r.source not in DSIR_TARGET_SOURCES]
    assert sum(t) / len(t) > sum(r_) / len(r_)


@pytest.mark.spark
def test_bpe_encode_corpus_hand_case(spark):
    """Tokenizer APPLY: a corpus whose first two merges are known
    ('lo', then 'w'+'lo'? — pinned below) must report exactly the
    hand-computed subword counts, including for a word the trainer's
    min_freq prune never saw (encoding covers EVERY word)."""
    from lasdb_spark.operators.text import bpe_encode_corpus

    # 'low' x4, 'lower' x2 -> pair counts: (l,o)=6, (o,w)=6, (w,e)=2,
    # (e,r)=2; ties break lexically: merge1 = (l,o)->'lo';
    # round 2: (lo,w)=6 -> merge2 = 'low'; round 3 on survivors:
    # 'low' is a single symbol (dropped), 'lower' = low|e|r:
    # (low,e)=2, (e,r)=2 -> merge3 = (e,r)? ties: ('e','r') vs
    # ('low','e') -> 'e' < 'low' so merge3 = ('e','r')->'er'
    docs = spark.createDataFrame(
        [(1, "low low low low"), (2, "lower lower"), (3, "lowest")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_words"], r["n_chars"], r["n_bpe_tokens"])
        for r in bpe_encode_corpus(docs, n_merges=3, min_freq=2).collect()
    }
    # doc1: 4 x 'low' -> 1 token each after merge2
    assert out[1] == (4, 12, 4)
    # doc2: 2 x 'lower' -> low|er -> 2 tokens each
    assert out[2] == (2, 10, 4)
    # doc3: 'lowest' appears once (pruned from TRAINING by min_freq=2)
    # but still encodes: low|e|s|t -> 4 tokens
    assert out[3] == (1, 6, 4)


@pytest.mark.spark
def test_bpe_encode_greedy_nonoverlap(spark):
    """aaaa -> [aa][aa], aaa -> [aa][a] under merge (a,a): the fold is
    leftmost-non-overlapping, exactly Java/RE-free greedy BPE."""
    from lasdb_spark.operators.text import bpe_encode_corpus

    docs = spark.createDataFrame(
        [(1, "aaaa aaaa"), (2, "aaa aaa")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_encode_corpus(docs, n_merges=1, min_freq=1).collect()
    }
    assert out[1] == 4  # two words x [aa][aa]
    assert out[2] == 4  # two words x [aa][a]


@pytest.mark.spark
def test_perceptron_learns_separable_labels(spark):
    """On a corpus whose ensemble gate is linearly separable in the
    hashed unigrams (fluent prose vs one-token spam), training
    accuracy must strictly improve from round 1 and reach 100%."""
    from pyspark.sql import functions as F

    from lasdb_spark.operators.text import perceptron_quality_train

    fluent = (
        "the quick brown fox jumps over the lazy dog and rests. "
        "a second sentence, with varied words and punctuation marks!"
    )
    spam = "buy " * 60
    rows = [(i, fluent + f" tail{i}", "en", "web") for i in range(12)] + [
        (100 + i, spam, "en", "web") for i in range(12)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text"))
    rep = {r.round: r for r in perceptron_quality_train(docs, rounds=3).collect()}
    assert rep[1].n_misclassified == rep[1].n_docs  # zero weights
    assert rep[2].n_misclassified < rep[1].n_misclassified
    assert rep[3].accuracy_ppm == 1_000_000


@pytest.mark.spark
def test_pmi_collocations_hand_case(spark):
    """'zig zag' always co-occurs (high lift); 'the the' is frequent
    but independent (lift ~= 1e6 ppm scale); min_count prunes rare
    pairs."""
    from lasdb_spark.operators.text import pmi_collocations

    docs = spark.createDataFrame(
        [(i, "zig zag the end the end rare pair"[: None], ) for i in range(6)],
        "doc_id long, text string",
    )
    got = {
        r.bigram: (r.c_ab, r.lift_ppm)
        for r in pmi_collocations(docs, min_count=6, k=10).collect()
    }
    # every doc: tokens = zig zag the end the end rare pair (8 tokens)
    # N_uni = 48; c(zig)=c(zag)=6, c_ab(zig zag)=6
    # lift(zig zag) = 6*48*48 / (42*6*6) = 9.142... -> 9142857 ppm
    assert got["zig zag"] == (6, 9142857)
    # 'the end' occurs 12x, c(the)=c(end)=12:
    # lift = 12*48*48/(42*12*12) = 4.571 -> 4571428
    assert got["the end"] == (12, 4571428)
    # rare: 'zag the' c_ab=6 >= min_count -> present; 'pair zig' is a
    # cross-doc boundary bigram that never exists
    assert "pair zig" not in got


@pytest.mark.spark
def test_kn_bigram_probabilities_sum_to_one(spark):
    """KN sanity on a hand corpus: for each seen context w1, the
    smoothed P(w2|w1) over the FULL vocabulary sums to 1 (the
    discount mass is exactly redistributed by the continuation
    term), and the per-doc NLL matches a direct computation."""
    import math
    from lasdb_spark.operators.text import kn_bigram_scores

    texts = {1: "a b a b a c", 2: "b a b c"}
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_bigrams, r.avg_nll)
        for r in kn_bigram_scores(docs).collect()
    }
    # model counts from both docs
    import collections
    c12 = collections.Counter()
    for t in texts.values():
        w = t.split()
        for i in range(len(w) - 1):
            c12[(w[i], w[i + 1])] += 1
    c1 = collections.Counter()
    nf = collections.Counter()
    np_ = collections.Counter()
    for (w1, w2), c in c12.items():
        c1[w1] += c
        nf[w1] += 1
        np_[w2] += 1
    T = len(c12)
    D = 0.75

    def p(w1, w2):
        return (
            max(c12.get((w1, w2), 0) - D, 0.0)
            + D * nf[w1] * (np_[w2] / T)
        ) / c1[w1]

    # full-vocab sum per context == 1 (interpolated KN invariant,
    # exact because every w2 in the vocab has np_ > 0 here)
    vocab = set(np_) | set(c1)
    for w1 in c1:
        assert sum(p(w1, w2) for w2 in vocab if np_.get(w2)) == pytest.approx(
            1.0, abs=1e-9
        )
    for doc_id, t in texts.items():
        w = t.split()
        nll = [-math.log(p(w[i], w[i + 1])) for i in range(len(w) - 1)]
        assert got[doc_id][0] == len(nll)
        assert got[doc_id][1] == pytest.approx(
            sum(nll) / len(nll), abs=1e-5
        )


@pytest.mark.spark
def test_quality_calibration_stored_weights_match_inline(spark, tmp_path):
    """Train-once/score-many split: a calibration run from persisted
    weights must emit row-identical output to the inline-trained
    report (weights are a pure function of the corpus), and loading
    without the build-complete marker must refuse."""
    import os

    from pyspark.sql import functions as F

    from lasdb_spark.operators.text import (
        load_quality_weights,
        quality_calibration,
        save_quality_weights,
    )

    fluent = (
        "the quick brown fox jumps over the lazy dog and rests. "
        "a second sentence, with varied words and punctuation marks!"
    )
    spam = "buy " * 60
    rows = [(i, fluent + f" tail{i}", "en", "web") for i in range(12)] + [
        (100 + i, spam, "en", "web") for i in range(12)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text"))

    path = str(tmp_path / "qw")
    with pytest.raises(FileNotFoundError):
        load_quality_weights(spark, path)
    save_quality_weights(docs, path, rounds=2)
    assert os.path.exists(os.path.join(path, "meta.json"))
    w_df, meta = load_quality_weights(spark, path)
    assert meta["rounds"] == 2

    inline = quality_calibration(docs, rounds=2).collect()
    stored = quality_calibration(docs, weights=w_df).collect()
    assert [tuple(r) for r in stored] == [tuple(r) for r in inline]
