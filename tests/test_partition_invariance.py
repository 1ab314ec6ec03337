"""Partitioning-invariance: the determinism contract says results are
identical under ANY shuffle-partition count (exact-integer sums, fixed
fold orders, tie-broken rankings). Spot-check the float-heaviest
entries by re-running them under different spark.sql.shuffle.partitions
— a regression here means some aggregation silently became
order-dependent."""

import pytest

#: entries whose arithmetic would be the first to break if a sum ever
#: became float-order dependent
ENTRIES = [
    "corpus_temp_mix",     # sqrt weights + integer totals
    "sketch_hll",          # register harmonic sums
    "sketch_kmv_setops",   # merged-sketch estimates
    "ann_sq8_topk",        # micro-unit distance sums + re-rank
    "emb_outliers",        # moment sums + sigma thresholds
    "text_surprisal",      # DECIMAL log-prob sums
    "rel_market_share",    # window over decimal aggs
    "pc_shape",            # integer second moments -> eigen
    # r6 additions
    "ann_pq_trained",      # Lloyd rounds: micro-unit centroid means
    "ann_ivfpq",           # residual ADC micro-unit sums
    "ann_ivfpq_trained",   # trained cells + residual books, same sums
    "corpus_importance",   # nano-unit bucket-gap sums
    "rel_rate_anomalies",  # BIGINT window sums -> one z expression
    "pc_volume",           # per-cell micro-metre quantization totals
    "rel_shipping_priority",  # cents-exact revenue + top-k ties
    # r7 additions
    "emb_matryoshka",      # prefix-fold cosine + recall division
    "pc_contours",         # BIGINT sum-vs-level·n corner comparisons
    "ann_ivfpq_stored",    # stored-index ADC micro-unit sums
    # r7 (this session) additions
    "rel_nation_trade",    # cents-exact bilateral revenue per year
    "rel_promo_share",     # conditional cents sums + one division
    "emb_pca",             # power iteration on exact covariance
    "text_perceptron",     # integer weight updates across rounds
    "rel_triangles",       # degree-ordered wedge counting
    # r7 (late-session) additions
    "rel_mkt_share_q8",    # cents numerator/denominator + one division
    "rel_top_supplier",    # integer max-tie semantics
    "mm_phash_pairs",      # integer DCT sign bits + banded join
    "rel_kcore",           # monotone peel rounds over semi-joins
    "mm_audio_fp_pairs",   # frame-energy sign bits + banded join
    "text_kn_scores",      # DECIMAL-summed KN NLL contributions
    "text_collocations",   # integer lift ranking + TakeOrdered ties
    "rel_cusum",           # prefix-sum/running-min centi-units
]


@pytest.mark.spark
@pytest.mark.parametrize("name", ENTRIES)
def test_result_invariant_under_partitioning(spark, sf_dir, name):
    import __spark_entry__ as e

    fn = e.queries()[name]
    baseline = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", baseline)
    assert a == b and a
