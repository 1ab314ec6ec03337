#!/usr/bin/env python
"""Benchmark harness (driver contract: one JSON line on stdout).

Ingests the derived point cloud into the real persisted layout (flat
Parquet, range-partitioned and sorted by sfc_key) and times a query
suite shaped like the reference benchmarks (scripts/query_*.json:
small/large rects, circle, polygon-with-hole, thin D21-style rect,
z-slab composite, kNN — reference suites A1–D21), plus ingest itself,
the LLM-pipeline operator suite, and the continuous-ingest path.

Each entry reports the MEDIAN of ``LASDB_BENCH_RUNS`` (default 3)
repetitions after one unmeasured warm-up: single runs at this corpus
size are dominated by per-plan codegen JIT (±20-40% swings that
masquerade as regressions), and the median absorbs that first-run cost
and stray GC pauses while staying robust to one outlier.

The suite runs in SEVEN sections, each in a FRESH SparkSession
(restarting the JVM-side state between sections): cumulative old-gen
garbage from ~100 executed plans otherwise inflates whatever runs
late in the suite by 2-5x regardless of order — measured r4:
dedup_clusters 7.0 s vs 15.9 s and semdedup_pairs 5.9 s vs 17.3 s for
the SAME code in back-to-back suite runs that only moved section
order, while solo probes stayed flat. Per-rep forced GC is not enough;
a fresh session is. Section startup (~10 s) is unmeasured.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32),
     LASDB_BENCH_RUNS   (default 3).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_RUNS = int(os.environ.get("LASDB_BENCH_RUNS", "3"))


def _session(cpus: int):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("lasdb_spark_bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("LASDB_BENCH_MEM", "24g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _timed(spark, fn) -> float:
    """Median wall-clock of N_RUNS calls after ONE unmeasured warm-up.

    The warm-up absorbs the entry's one-time costs — whole-stage
    codegen compilation (multi-second for the widest dedup plans) and
    JIT — so the medians report steady-state latency, which is the
    quantity that scales with data volume. Between reps: drop leaked
    SQL caches AND force a JVM GC — the allocation-heavy entries are
    otherwise GC-bound at sf0.1 (an in-session A/B measured the SAME
    minhash call at 3.3 s in a clean JVM and up to 35 s in a dirty
    one)."""
    ts = []
    for rep in range(N_RUNS + 1):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        fn()
        if rep > 0:  # rep 0 is the unmeasured warm-up
            ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 4)


def _section_point_cloud(spark, sf_dir, cpus, base, timings) -> None:
    """Ingest + the reference-shaped window-query suite (A1–D21)."""
    from lasdb_spark.operators.ingest import ingest_points, load_dataset
    from lasdb_spark.operators.window_query import WindowQuerier
    from lasdb_spark.sources.points import points_df

    pts = points_df(spark, sf_dir)
    pts.count()  # warm the session/JIT before the measured runs

    timings["ingest"] = _timed(
        spark, lambda: ingest_points(pts, "bench", base, target_partitions=cpus)
    )
    df, meta, layout = load_dataset(spark, base, "bench")
    df.limit(1).count()  # touch the stored table (open footers) once
    q = WindowQuerier(df, meta, layout)
    # one unmeasured window query to JIT the scan+filter codegen
    q.bbox([85150.0, 85160.0, 446200.0, 446210.0]).count()

    timings["ingest_block"] = _timed(
        spark,
        lambda: ingest_points(
            pts, "benchblk", base, target_partitions=cpus, layout="block"
        ),
    )
    dfb, metab, layb = load_dataset(spark, base, "benchblk")
    dfb.limit(1).count()
    qb = WindowQuerier(dfb, metab, layb)

    poly_hole = (
        "POLYGON ((85100.005 446100.005, 85899.995 446100.005, "
        "85899.995 447399.995, 85100.005 447399.995, 85100.005 446100.005), "
        "(85299.995 446499.995, 85700.005 446499.995, 85700.005 447000.005, "
        "85299.995 447000.005, 85299.995 446499.995))"
    )
    polyline = (
        "LINESTRING (85150.005 446150.005, 85450.005 446650.005, "
        "85300.005 447100.005, 85800.005 447300.005)"
    )
    # batch spatial join: a 6x6 grid of windows over the extent in ONE
    # scan (vs 36 independent bbox jobs)
    mw_wins = [
        (6 * i + j + 1,
         85100.005 + 130.0 * i, 85100.005 + 130.0 * i + 125.0,
         446100.005 + 215.0 * j, 446100.005 + 215.0 * j + 210.0)
        for i in range(6)
        for j in range(6)
    ]
    suite = {
        "bbox_small": lambda: q.bbox([85200.0, 85250.0, 446300.0, 446400.0]),
        "bbox_large": lambda: q.bbox([85100.0, 85900.0, 446100.0, 447400.0]),
        "bbox_empty": lambda: q.bbox([10.0, 20.0, 10.0, 20.0]),
        "circle_med": lambda: q.circle([85500.0, 446700.0], 200.0),
        "poly_hole": lambda: q.polygon(poly_hole),
        "thin_rect": lambda: q.bbox([85500.0, 85501.0, 446000.0, 447500.0]),
        "bbox_zslab": lambda: q.bbox(
            [85100.0, 85900.0, 446100.0, 447400.0], minz=0.0, maxz=10.0
        ),
        "knn_1000": lambda: q.knn([85500.0, 446700.0], 1000),
        "polyline_buf": lambda: q.polyline_buffer(polyline, 120.003),
        "bbox_block": lambda: qb.bbox([85200.0, 85400.0, 446300.0, 446800.0]),
        "multi_window_36": lambda: q.multi_bbox(mw_wins),
        "lod_pyramid": lambda: q.lod_pyramid([4, 7, 10]),
        # progressive morphological ground filter (r5)
        "pmf_ground": lambda: _pmf(pts),
        # corridor profile over the pruned polyline selection (r4)
        "profile": lambda: _profile(q, polyline),
        # epoch change detection vs a perturbed second survey (r4)
        "epoch_diff": lambda: _epoch_diff(pts),
        # multi-survey alignment estimators (r4)
        "epoch_shift": lambda: _epoch_shift(pts),
        "registration": lambda: _registration(pts),
    }
    # r7: epoch cut/fill volume (same construction as the driver
    # entry, so the row regression-gates exactly what the driver runs)
    import __spark_entry__ as _entry

    suite["pc_volume"] = lambda: _entry.queries()["pc_volume"](
        spark, sf_dir
    )
    # r7: marching-squares contour census (house rule: every new
    # operator family gets a regression row the round it ships)
    suite["pc_contours"] = lambda: _entry.queries()["pc_contours"](
        spark, sf_dir
    )
    # r7 (this session): coverage/gap density QA over the in-plan grid
    suite["pc_density"] = lambda: _entry.queries()["pc_density"](
        spark, sf_dir
    )
    for name, fn in suite.items():
        timings[name] = _timed(spark, lambda fn=fn: fn().count())

    # COPC source (r6): build a 4-tile fixture from the same points
    # (unmeasured, driver-side writer), then time a node-distributed
    # full read and a hierarchy-pruned bbox query
    import numpy as np

    from lasdb_spark.sources.copc import copc_to_df

    xyz = np.array(
        pts.select("x", "y", "z").collect(), dtype=np.float64
    )
    order = np.argsort(xyz[:, 0], kind="stable")
    xyz = xyz[order]
    copc_dir = os.path.join(base, "copc_fixture")
    os.makedirs(copc_dir, exist_ok=True)
    # one tile per process: the pure-python compressor is the build
    # bottleneck (~40 s serial at sf0.1's 600k points, ~12 s across 4)
    from concurrent.futures import ProcessPoolExecutor

    jobs = [
        (part, os.path.join(copc_dir, f"tile{t}.copc.laz"))
        for t, part in enumerate(np.array_split(xyz, 4))
    ]
    with ProcessPoolExecutor(max_workers=4) as ex:
        list(ex.map(_write_copc_tile, jobs))
    copc_glob = os.path.join(copc_dir, "*.copc.laz")
    timings["copc_read"] = _timed(
        spark,
        lambda: copc_to_df(
            spark, copc_glob, distribute="nodes", target_tasks=cpus
        ).count(),
    )
    timings["copc_bbox"] = _timed(
        spark,
        lambda: copc_to_df(
            spark, copc_glob,
            bbox=(85200.0, 85300.0, 446300.0, 446500.0),
            distribute="nodes", target_tasks=cpus,
        ).count(),
    )


def _write_copc_tile(job) -> None:
    import numpy as np

    from lasdb_spark.sources.copc import write_copc
    from lasdb_spark.sources.las import point_dtype

    part, path = job
    arr = np.zeros(len(part), dtype=point_dtype(6))
    arr["X"] = np.round(part[:, 0] / 0.001).astype(np.int64)
    arr["Y"] = np.round(part[:, 1] / 0.001).astype(np.int64)
    arr["Z"] = np.round(part[:, 2] / 0.001).astype(np.int64)
    arr["returns"] = 0x11
    arr["gps_time"] = np.arange(len(part), dtype=np.float64)
    with open(path, "wb") as f:
        f.write(write_copc(arr, 6, max_node_points=2000))


def _pmf(pts):
    from lasdb_spark.operators.grid import pmf_ground

    return pmf_ground(pts)


def _profile(q, polyline):
    from lasdb_spark.operators.profile import corridor_profile

    sel = q.polyline_buffer(polyline, 120.003)
    return corridor_profile(sel, polyline, 120.003, step=50.0)


def _epoch_diff(pts):
    from pyspark.sql import functions as F

    from lasdb_spark.operators.change import epoch_diff

    key = (
        F.round(F.col("x") * 100).cast("long")
        + F.round(F.col("y") * 100).cast("long")
    ) % 10
    epoch_b = (
        pts.withColumn("_k", key)
        .where(F.col("_k") != 0)
        .withColumn(
            "z",
            F.when(F.col("_k").isin(1, 2), F.col("z") + 3.0).otherwise(
                F.col("z")
            ),
        )
        .drop("_k")
    )
    return epoch_diff(pts, epoch_b, cell=25.0)


def _epoch_shift(pts):
    from pyspark.sql import functions as F

    from lasdb_spark.operators.change import estimate_epoch_shift

    return estimate_epoch_shift(
        pts, pts.withColumn("z", F.col("z") + 0.35), cell=25.0
    )


def _registration(pts):
    from pyspark.sql import functions as F

    from lasdb_spark.operators.change import estimate_epoch_registration

    return estimate_epoch_registration(
        pts, pts.withColumn("z", F.col("z") + 0.4), cell=25.0
    )


def _section_dedup(spark, sf_dir, timings) -> None:
    """The batch dedup family in its OWN fresh session, nothing
    before it (r10 VERDICT #1): dedup_minhash / dedup_clusters are
    the documented cumulative-JVM noise family — identical code has
    read 7.0 s vs 15.9 s depending only on suite position (module
    docstring) and the r10 driver artifact recorded 11.3 / 15.2 s
    against ~2 / ~4.7 s solo bands, the only >2×-baseline rows. A
    dedicated section makes the recorded rows reproduce the solo
    protocol instead of whatever GC state ~60 prior plans left."""
    from pyspark.sql import functions as F

    from lasdb_spark.operators.dedup import (
        chunk_neardup_pairs,
        crosscorpus_neardup_pairs,
        dedup_clusters,
        exact_dedup,
        minhash_lsh_pairs,
    )

    import __spark_entry__ as _entry

    _eq = _entry.queries()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()
    suite = {
        "dedup_exact": lambda: exact_dedup(docs),
        "dedup_minhash": lambda: minhash_lsh_pairs(docs),
        "dedup_clusters": lambda: dedup_clusters(docs),
        "dedup_chunks": lambda: chunk_neardup_pairs(docs),
        "dedup_crosscorpus": lambda: crosscorpus_neardup_pairs(
            docs.filter(F.col("doc_id") % 2 == 0),
            docs.filter(F.col("doc_id") % 2 == 1),
        ),
        "dedup_url_canonical": lambda: _eq["dedup_url_canonical"](
            spark, sf_dir
        ),
        "dedup_spans": lambda: _eq["dedup_spans"](spark, sf_dir),
    }
    for name, fn in suite.items():
        timings[name] = _timed(spark, lambda fn=fn: fn().count())


def _section_ann_inline(spark, sf_dir, timings) -> None:
    """The inline-ANN arms in their OWN fresh session, nothing before
    them (r11 VERDICT #1 — the structural fix that worked for dedup):
    ann_knn_join_ivf's recorded driver rows swung 13.5→17.8 s across
    rounds while its solo pin sat at ~5 s and local in-suite reads at
    6.6–7.0 — the same suite-position/GC noise the dedup family
    showed before it got a dedicated section. These two entries run
    the inline Lloyd chain + a corpus-sized persist, the most
    allocation-sensitive shapes in the suite; isolating them makes
    the recorded rows reproduce the solo protocol."""
    import __spark_entry__ as _entry

    _eq = _entry.queries()
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    embs.count()
    # r9: trained-IVF batch kNN join + pairwise recall audit
    timings["ann_knn_join_ivf"] = _timed(
        spark, lambda: _eq["ann_knn_join_ivf"](spark, sf_dir).count()
    )
    timings["ann_knn_join_recall"] = _timed(
        spark, lambda: _eq["ann_knn_join_recall"](spark, sf_dir).count()
    )
    from lasdb_spark.operators.similarity import release_knn_join_cache

    release_knn_join_cache()


def _section_corpus(spark, sf_dir, timings) -> None:
    """LLM-pipeline operators on the documents/embeddings tables."""
    from pyspark.sql import functions as F
    from lasdb_spark.operators.multimodal import (
        decode_audio_features,
        make_audio_corpus,
    )
    from lasdb_spark.operators.search import bm25_search
    from lasdb_spark.operators.similarity import topk_pq
    from lasdb_spark.operators.text import (
        bigram_surprisal,
        pii_redact,
        quality_ensemble,
        quality_scores,
        surprisal_scores,
        tfidf_top_terms,
    )

    from lasdb_spark.operators.graph import event_type_pagerank
    from lasdb_spark.operators.interval import incident_impact
    from lasdb_spark.operators.relational import sliding_event_rates
    from lasdb_spark.sources.events import events_df

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ev = events_df(spark, sf_dir)
    docs.count(), embs.count(), ev.count()

    suite = {
        "text_quality": lambda: quality_scores(docs),
        "text_tfidf": lambda: tfidf_top_terms(docs),
        "text_surprisal": lambda: surprisal_scores(docs),
        "text_bm25": lambda: bm25_search(docs, "fast hash join vector"),
        "ann_pq_topk": lambda: topk_pq(embs),
        "mm_audio": lambda: decode_audio_features(make_audio_corpus(docs)),
        "text_pii": lambda: pii_redact(docs),
        # r4 second batch
        "text_bigram": lambda: bigram_surprisal(docs),
        "text_ensemble": lambda: quality_ensemble(docs),
        "ev_pagerank": lambda: event_type_pagerank(ev),
        "ev_interval_join": lambda: incident_impact(ev),
        "ev_sliding_rates": lambda: sliding_event_rates(ev),
    }
    # r4 third batch: sketches, quantized ANN, mixing, sweeps
    from lasdb_spark.operators.relational import (
        gapfill_hourly,
        max_concurrency,
    )
    from lasdb_spark.operators.similarity import topk_sq8
    from lasdb_spark.operators.sketch import (
        bloom_probe_report,
        hll_distinct,
        quantile_sketch,
    )
    from lasdb_spark.operators.text import temperature_mix

    suite.update(
        {
            "sketch_hll": lambda: hll_distinct(ev),
            "sketch_quantiles": lambda: quantile_sketch(ev),
            "sketch_bloom": lambda: bloom_probe_report(docs),
            "ann_sq8_topk": lambda: topk_sq8(embs),
            "corpus_temp_mix": lambda: temperature_mix(docs),
            "ev_concurrency": lambda: max_concurrency(ev),
            "ev_gapfill": lambda: gapfill_hourly(ev),
        }
    )
    # r4 fourth batch: CDC merge + embedding curation gate
    from pyspark.sql import functions as _F

    from lasdb_spark.operators.relational import cdc_snapshot, merge_upsert
    from lasdb_spark.operators.similarity import (
        embedding_outliers,
        topk_ivfpq,
        topk_ivfpq_trained,
        topk_pq_trained,
    )

    _split = 1_705_276_800_000
    _ms = _F.unix_millis(_F.col("ts"))
    suite.update(
        {
            "ev_cdc_merge": lambda: merge_upsert(
                cdc_snapshot(ev.filter(_ms < _split)),
                ev.filter(_ms >= _split),
            ),
            "emb_outliers": lambda: embedding_outliers(embs),
            # r6: Lloyd-trained PQ codebooks + IVF-PQ residual index
            "ann_pq_trained": lambda: topk_pq_trained(embs),
            "ann_ivfpq": lambda: topk_ivfpq(embs),
            "ann_ivfpq_trained": lambda: topk_ivfpq_trained(embs),
        }
    )
    # r6: tokenizer-training kernel + importance scoring
    from lasdb_spark.operators.text import bpe_pair_stats, importance_scores

    suite.update(
        {
            "text_bpe_pairs": lambda: bpe_pair_stats(docs),
            "corpus_importance": lambda: importance_scores(docs),
        }
    )
    # r5: embedding health audits
    from lasdb_spark.operators.similarity import (
        embedding_cov_pairs,
        embedding_dim_stats,
    )

    suite.update(
        {
            "emb_dim_stats": lambda: embedding_dim_stats(embs),
            "emb_cov_pairs": lambda: embedding_cov_pairs(embs),
        }
    )
    # r7 (VERDICT #3): regression rows for the r6 families that
    # shipped without one — via the driver's own entry wrappers so
    # the rows gate exactly what CORRECTNESS checks
    import __spark_entry__ as _entry

    _eq = _entry.queries()
    suite.update(
        {
            "rel_min_cost_supplier": lambda: _eq["rel_min_cost_supplier"](
                spark, sf_dir
            ),
            "rel_shipping_priority": lambda: _eq["rel_shipping_priority"](
                spark, sf_dir
            ),
            "rel_rate_anomalies": lambda: _eq["rel_rate_anomalies"](
                spark, sf_dir
            ),
            "mm_scene_cuts": lambda: _eq["mm_scene_cuts"](spark, sf_dir),
            "text_bpe_merges": lambda: _eq["text_bpe_merges"](
                spark, sf_dir
            ),
            # r7 new families (house rule: bench row the round they ship)
            "mm_jpeg": lambda: _eq["mm_jpeg"](spark, sf_dir),
            "emb_matryoshka": lambda: _eq["emb_matryoshka"](spark, sf_dir),
            "text_bpe_encode": lambda: _eq["text_bpe_encode"](spark, sf_dir),
            # r11 new family: stored text-retrieval index (house
            # rule: bench row the round they ship) — stored BM25 and
            # stored-arm hybrid against their inline rows text_bm25 /
            # doc_search_hybrid; the warm-up rep pays the one-time
            # index build at the deterministic temp path
            "doc_search_bm25_stored": lambda: _eq["doc_search_bm25_stored"](
                spark, sf_dir
            ),
            "doc_search_hybrid_stored": lambda: _eq[
                "doc_search_hybrid_stored"
            ](spark, sf_dir),
            "doc_search_hybrid_multi_stored": lambda: _eq[
                "doc_search_hybrid_multi_stored"
            ](spark, sf_dir),
            "text_index_stats": lambda: _eq["text_index_stats"](
                spark, sf_dir
            ),
            # r12 new entries (house rule: bench row the round they
            # ship) — the fully-stored hybrid (dense arm from the
            # persisted kNN-join index; warm-up builds both index
            # fixtures) and BM25 served through a committed append
            # segment
            "doc_search_hybrid_multi_stored_ann": lambda: _eq[
                "doc_search_hybrid_multi_stored_ann"
            ](spark, sf_dir),
            "doc_search_bm25_appended": lambda: _eq[
                "doc_search_bm25_appended"
            ](spark, sf_dir),
            "rel_local_supplier": lambda: _eq["rel_local_supplier"](
                spark, sf_dir
            ),
            "rel_key_skew": lambda: _eq["rel_key_skew"](spark, sf_dir),
            "rel_scd2": lambda: _eq["rel_scd2"](spark, sf_dir),
            "rel_profile": lambda: _eq["rel_profile"](spark, sf_dir),
            # warm-up rep pays the one-time bucketed write; measured
            # reps read the cached tables = the query-many join cost
            "rel_bucketed_join": lambda: _eq["rel_bucketed_join"](
                spark, sf_dir
            ),
            # r7 (this session): TPC-H Q4/Q7/Q9/Q10/Q14 shapes + the
            # table-versioning DIFF (house rule: bench row the round
            # they ship)
            "rel_order_priority": lambda: _eq["rel_order_priority"](
                spark, sf_dir
            ),
            "rel_nation_trade": lambda: _eq["rel_nation_trade"](
                spark, sf_dir
            ),
            "rel_product_profit": lambda: _eq["rel_product_profit"](
                spark, sf_dir
            ),
            "rel_returned_items": lambda: _eq["rel_returned_items"](
                spark, sf_dir
            ),
            "rel_promo_share": lambda: _eq["rel_promo_share"](
                spark, sf_dir
            ),
            "rel_snapshot_diff": lambda: _eq["rel_snapshot_diff"](
                spark, sf_dir
            ),
            # r7 (this session): batch-perceptron classifier training
            "text_perceptron": lambda: _eq["text_perceptron"](
                spark, sf_dir
            ),
            # r7 (this session): Q19 OR-of-ANDs pushdown revenue
            "rel_brand_discounts": lambda: _eq["rel_brand_discounts"](
                spark, sf_dir
            ),
            # r7 (this session): audio silence segmentation (VAD)
            "mm_silence": lambda: _eq["mm_silence"](spark, sf_dir),
            # r7 (this session): Q18 HAVING-on-aggregate + exact PCA
            "rel_big_orders": lambda: _eq["rel_big_orders"](
                spark, sf_dir
            ),
            "emb_pca": lambda: _eq["emb_pca"](spark, sf_dir),
            # r7 (this session): schema-drift profiler + Zipf spectrum
            "rel_json_profile": lambda: _eq["rel_json_profile"](
                spark, sf_dir
            ),
            "text_freq_spectrum": lambda: _eq["text_freq_spectrum"](
                spark, sf_dir
            ),
            # r7 (this session): TPC-H Q8/Q13/Q15/Q17/Q22
            "rel_mkt_share_q8": lambda: _eq["rel_mkt_share_q8"](
                spark, sf_dir
            ),
            "rel_cust_distribution": lambda: _eq["rel_cust_distribution"](
                spark, sf_dir
            ),
            "rel_top_supplier": lambda: _eq["rel_top_supplier"](
                spark, sf_dir
            ),
            "rel_small_qty": lambda: _eq["rel_small_qty"](
                spark, sf_dir
            ),
            "rel_dormant_balance": lambda: _eq["rel_dormant_balance"](
                spark, sf_dir
            ),
            # r7 (this session): perceptual-hash image near-dup pairs
            "mm_phash_pairs": lambda: _eq["mm_phash_pairs"](
                spark, sf_dir
            ),
            # r7 (this session): k-core of the repeat-co-purchase graph
            "rel_kcore": lambda: _eq["rel_kcore"](spark, sf_dir),
            # r7 (this session): audio frame-energy fingerprint pairs
            "mm_audio_fp_pairs": lambda: _eq["mm_audio_fp_pairs"](
                spark, sf_dir
            ),
            # r7 (this session): PMI collocations via exact integer lift
            "text_collocations": lambda: _eq["text_collocations"](
                spark, sf_dir
            ),
            # r7 (this session): k-anonymity generalization ladder
            "rel_k_anonymity": lambda: _eq["rel_k_anonymity"](
                spark, sf_dir
            ),
            # r7 (this session): TPC-H Q6 pure-pushdown revenue
            "rel_forecast_revenue": lambda: _eq["rel_forecast_revenue"](
                spark, sf_dir
            ),
            # r7 (this session): Kneser-Ney bigram LM perplexity
            "text_kn_scores": lambda: _eq["text_kn_scores"](
                spark, sf_dir
            ),
            # r7 (this session): entity resolution (blocked + verify)
            "entity_matches": lambda: _eq["entity_matches"](
                spark, sf_dir
            ),
            # r7 (this session): CUSUM change-point alarms
            "rel_cusum": lambda: _eq["rel_cusum"](spark, sf_dir),
            # r7 (this session): incremental view maintenance
            "rel_ivm_rollup": lambda: _eq["rel_ivm_rollup"](
                spark, sf_dir
            ),
            # r7 (this session): Benford first-digit audit
            "rel_benford": lambda: _eq["rel_benford"](spark, sf_dir),
            # r7 (this session): seasonal-naive forecast backtest
            "rel_forecast_backtest": lambda: _eq["rel_forecast_backtest"](
                spark, sf_dir
            ),
            # r7 (this session): hourly-rate autocorrelation
            "rel_acf": lambda: _eq["rel_acf"](spark, sf_dir),
            # r8: data-loader sharding audit (hash tag + 16-row agg)
            "corpus_shards": lambda: _eq["corpus_shards"](spark, sf_dir),
            # r8: classifier reliability report (train + score + bin)
            "quality_calibration": lambda: _eq["quality_calibration"](
                spark, sf_dir
            ),
            # r8: Euclidean voxel segmentation (two-level CC)
            "pc_segments": lambda: _eq["pc_segments"](spark, sf_dir),
            # r8: per-segment shape descriptors (labels + one agg)
            "pc_segment_shape": lambda: _eq["pc_segment_shape"](
                spark, sf_dir
            ),
            # r8: drained append-mode native session windows
            "stream_sessions": lambda: _eq["stream_sessions"](
                spark, sf_dir
            ),
            # r8: fuzzy (tau-Jaccard banded) decontamination report
            "text_fuzzy_decontaminate": lambda: _eq[
                "text_fuzzy_decontaminate"
            ](spark, sf_dir),
            # r8: intra-doc language-mix audit (map-only, two passes)
            "text_lang_mix": lambda: _eq["text_lang_mix"](spark, sf_dir),
            # r8: anisotropy report (pca chain + projection pass)
            "emb_whiten": lambda: _eq["emb_whiten"](spark, sf_dir),
            # r8: one-row dataset card
            "corpus_report": lambda: _eq["corpus_report"](spark, sf_dir),
            # r8: persisted dedup-index probe (warm-up rep builds it)
            "dedup_index_probe": lambda: _eq["dedup_index_probe"](
                spark, sf_dir
            ),
            # r8: per-language tokenizer fertility (BPE train+apply)
            "text_fertility": lambda: _eq["text_fertility"](
                spark, sf_dir
            ),
            # r8: A/B experiment readout (one user-keyed agg)
            "rel_ab_test": lambda: _eq["rel_ab_test"](spark, sf_dir),
            # r9: stored-weights calibration (score-only half)
            "quality_calibration_stored": lambda: _eq[
                "quality_calibration_stored"
            ](spark, sf_dir),
            # r10: batch kNN join answered from the persisted index
            # (first call builds the shared index fixture; the
            # median-of-3 reads the stored tables — probe-only cost)
            "ann_knn_join_stored": lambda: _eq["ann_knn_join_stored"](
                spark, sf_dir
            ),
            # r10: multi-query MMR (3 queries, one plan, one rerank
            # group per query)
            "emb_mmr_multi": lambda: _eq["emb_mmr_multi"](
                spark, sf_dir
            ),
            # r10: stored IVF-PQ query over the compacted
            # incrementally-grown codes table
            "ann_index_compact": lambda: _eq["ann_index_compact"](
                spark, sf_dir
            ),
            # r9: hybrid RRF retrieval (BM25 arm + dense arm + fusion)
            "doc_search_hybrid": lambda: _eq["doc_search_hybrid"](
                spark, sf_dir
            ),
            # r10: batched hybrid retrieval (3 requests, one plan)
            "doc_search_hybrid_multi": lambda: _eq[
                "doc_search_hybrid_multi"
            ](spark, sf_dir),
            # r10: increment probe against the stored even-slice index
            "ann_knn_probe_stored": lambda: _eq["ann_knn_probe_stored"](
                spark, sf_dir
            ),
            # r10: per-cell health report of the stored join index
            "ann_index_stats": lambda: _eq["ann_index_stats"](
                spark, sf_dir
            ),
            # r9: MMR diversified rerank (candidates + pair sims +
            # one-group greedy)
            "emb_mmr": lambda: _eq["emb_mmr"](spark, sf_dir),
            # r9: per-dimension PSI drift audit (one posexplode pass)
            "emb_drift_psi": lambda: _eq["emb_drift_psi"](spark, sf_dir),
            # r9: leakage-safe split (clustering + one tagged agg)
            "corpus_split_safe": lambda: _eq["corpus_split_safe"](
                spark, sf_dir
            ),
            # r9: drained foreachBatch probe of the persisted index
            "stream_dedup_probe": lambda: _eq["stream_dedup_probe"](
                spark, sf_dir
            ),
            # r9: TPC-H Q12/Q21 shapes
            "rel_ship_lag": lambda: _eq["rel_ship_lag"](spark, sf_dir),
            "rel_late_suppliers": lambda: _eq["rel_late_suppliers"](
                spark, sf_dir
            ),
            # r9: TPC-H Q11/Q16/Q20 shapes (partsupp-free)
            "rel_important_parts": lambda: _eq["rel_important_parts"](
                spark, sf_dir
            ),
            "rel_part_variety": lambda: _eq["rel_part_variety"](
                spark, sf_dir
            ),
            "rel_excess_shippers": lambda: _eq["rel_excess_shippers"](
                spark, sf_dir
            ),
            # r9: contrastive triplet mining over the near-dup pairs
            "corpus_triplets": lambda: _eq["corpus_triplets"](
                spark, sf_dir
            ),
            # r9: exponential-race weighted sample (map + TakeOrdered)
            "corpus_weighted_sample": lambda: _eq[
                "corpus_weighted_sample"
            ](spark, sf_dir),
            # r9: incremental clustering == recompute proof
            "dedup_clusters_inc": lambda: _eq["dedup_clusters_inc"](
                spark, sf_dir
            ),
            # r9: cohort LTV curve (user shuffle + triangle agg)
            "rel_ltv": lambda: _eq["rel_ltv"](spark, sf_dir),
            # r9: SQ8 reconstruction-error QA (map-side + dim agg)
            "emb_sq8_error": lambda: _eq["emb_sq8_error"](spark, sf_dir),
            # r9: drained streaming PSI drift monitor
            "stream_psi": lambda: _eq["stream_psi"](spark, sf_dir),
            # r9: deterministic label-propagation communities
            "rel_communities": lambda: _eq["rel_communities"](
                spark, sf_dir
            ),
            # r9: within-session Markov transition matrix
            "rel_markov": lambda: _eq["rel_markov"](spark, sf_dir),
            # r9: association rules (support/confidence/lift)
            "rel_rules": lambda: _eq["rel_rules"](spark, sf_dir),
        }
    )
    for name, fn in suite.items():
        timings[name] = _timed(spark, lambda fn=fn: fn().count())


def _section_heavy(spark, sf_dir, timings) -> None:
    """The two most expensive operator families, isolated in their own
    session so their allocation volume cannot inflate anything else
    (and nothing inflates them)."""
    from lasdb_spark.operators.features import neighborhood_shape
    from lasdb_spark.operators.semdedup import semantic_pairs
    from lasdb_spark.sources.points import points_df

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    embs.count()
    pts = points_df(spark, sf_dir)
    pts.count()
    # ann_knn_join moved here in r4: at 15 corpus-section entries its
    # in-section reading drifted to 7.1 s while solo steady state is
    # ~4.8 s — the same late-entry JVM-state inflation the sectioned
    # design exists to prevent
    from lasdb_spark.operators.similarity import knn_join_lsh

    timings["ann_knn_join"] = _timed(
        spark, lambda: knn_join_lsh(embs).count()
    )
    timings["semdedup_pairs"] = _timed(
        spark, lambda: semantic_pairs(embs).count()
    )
    timings["pc_shape"] = _timed(
        spark, lambda: neighborhood_shape(pts).count()
    )
    # r4: same shuffle shape as pc_shape (shared _eigen_df pipeline)
    from lasdb_spark.operators.features import surface_normals

    timings["pc_normals"] = _timed(
        spark, lambda: surface_normals(pts).count()
    )
    # r4: trains the same k-means as semdedup, so it lives in the
    # heavy section — its assignment cost dominates the labeling agg
    from lasdb_spark.operators.topics import corpus_topics

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    timings["corpus_topics"] = _timed(
        spark, lambda: corpus_topics(docs, embs).count()
    )
    # r7: recall audit (union of all 7 index plans — the widest ANN
    # entry, so it lives in the heavy section) + the persisted-index
    # split: ann_index_build is the batch job, ann_ivfpq_stored the
    # query-many side answering from the stored codes alone — the row
    # pair that proves query-time ≪ the in-plan trained entries
    import __spark_entry__ as _entry

    timings["ann_recall_report"] = _timed(
        spark,
        lambda: _entry.queries()["ann_recall_report"](spark, sf_dir).count(),
    )
    from lasdb_spark.operators.ann_index import (
        build_ann_index,
        topk_ivfpq_stored,
    )

    idx = tempfile.mkdtemp(prefix="lasdb_bench_annidx_")
    timings["ann_index_build"] = _timed(
        spark, lambda: build_ann_index(embs, idx)
    )
    timings["ann_ivfpq_stored"] = _timed(
        spark, lambda: topk_ivfpq_stored(spark, idx, embs).count()
    )
    # r7: the daily-increment maintenance job — encode-only append of
    # a 10% slice committed as a segment (no training);
    # the row pins append-cost ≪ build-cost round-over-round
    from pyspark.sql import functions as _F

    from lasdb_spark.operators.ann_index import append_ann_index

    inc = embs.where(_F.col("vec_id") % 10 == 3)

    def _append_fresh():
        # r12: appends are idempotent segments keyed by the increment
        # fingerprint — drop the committed segments first so every
        # rep measures a REAL append, not the no-op retry check
        shutil.rmtree(os.path.join(idx, "segments"), ignore_errors=True)
        append_ann_index(inc, idx)

    timings["ann_index_append"] = _timed(spark, _append_fresh)
    shutil.rmtree(idx, ignore_errors=True)
    # r7: degree-ordered triangle counting via per-edge adjacency
    # intersection — the heaviest graph row (adjacency arrays are
    # built and joined per edge), so it lives in the heavy section
    timings["rel_triangles"] = _timed(
        spark,
        lambda: _entry.queries()["rel_triangles"](spark, sf_dir).count(),
    )


def _section_streaming(spark, sf_dir, cpus, base, timings) -> None:
    """Continuous ingest: micro-batch append stream + compaction pass
    (the LSM-ish maintenance path — O(1) appends degrade pruning until
    compact_dataset restores the global key order)."""
    from lasdb_spark.operators.ingest import (
        compact_dataset,
        load_dataset,
        save_metadata,
    )
    from lasdb_spark.sources.points import points_df
    from lasdb_spark.streaming.ingest import (
        read_point_stream,
        stream_ingest_points,
    )

    pts = points_df(spark, sf_dir)
    _, meta, _ = load_dataset(spark, base, "bench")
    stage = tempfile.mkdtemp(prefix="lasdb_bench_stream_")
    try:
        src = os.path.join(stage, "src")
        pts.select("x", "y", "z").repartition(8).write.parquet(src)
        # a streaming file sink dedups by batchId in _spark_metadata,
        # so every repetition needs a FRESH store + checkpoint pair
        # (and compaction must see the freshly-appended store)
        stream_ts, compact_ts = [], []
        for rep in range(N_RUNS):
            sbase = os.path.join(stage, f"store{rep}")
            os.makedirs(sbase, exist_ok=True)
            save_metadata(meta, sbase, layout="flat")
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            sq = stream_ingest_points(
                read_point_stream(spark, src),
                meta,
                sbase,
                os.path.join(stage, f"ckpt{rep}"),
            )
            sq.awaitTermination()
            stream_ts.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            compact_dataset(spark, sbase, meta.name, target_partitions=cpus)
            compact_ts.append(time.perf_counter() - t0)
        timings["stream_ingest"] = round(statistics.median(stream_ts), 4)
        timings["compaction"] = round(statistics.median(compact_ts), 4)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    # r7 (VERDICT #3): the two r6 streaming operators — each rep
    # drains a fresh multi-batch stream into a uniquely-named memory
    # sink (the entry wrappers handle sink naming)
    import __spark_entry__ as _entry

    _eq = _entry.queries()
    timings["stream_quantiles"] = _timed(
        spark, lambda: _eq["stream_quantiles"](spark, sf_dir).count()
    )
    timings["stream_enriched_counts"] = _timed(
        spark, lambda: _eq["stream_enriched_counts"](spark, sf_dir).count()
    )
    # r8: drained streaming curation (gates + stateful exact dedup)
    timings["stream_curate"] = _timed(
        spark, lambda: _eq["stream_curate"](spark, sf_dir).count()
    )
    # r7 (this session): streaming Count-Min sketch probe report
    timings["stream_cm_topk"] = _timed(
        spark, lambda: _eq["stream_cm_topk"](spark, sf_dir).count()
    )
    # r7 (this session): stream-stream watermarked conversion join
    timings["stream_conversions"] = _timed(
        spark, lambda: _eq["stream_conversions"](spark, sf_dir).count()
    )


#: one representative per operator family for the scale study
SCALE_REPS = (
    "ingest", "bbox_small", "text_tfidf", "dedup_minhash",
    "ann_pq_topk", "sketch_hll", "ev_sliding_rates", "rel_triangles",
    "pc_segments", "dedup_index_probe", "stream_sessions",
    "quality_calibration",
    # r10 additions (r9 verdict #7): the heavy r9/r10 shapes —
    # trained-IVF batch kNN join (inline) and its stored-index twin,
    # incremental near-dup clustering, the foreachBatch dedup-index
    # ingestion gate (fixed micro-batch overhead dominates at this
    # corpus size, so its ratio should sit near 1x), hybrid retrieval
    "ann_knn_join_ivf", "ann_knn_join_stored", "dedup_clusters_inc",
    "stream_dedup_probe", "doc_search_hybrid",
    # r11 additions (r10 verdict #7): the batched/probe serving
    # shapes — multi-query hybrid retrieval and MMR (corpus work
    # independent of query count, so their ratios should track the
    # single-query rows), the stored-index increment probe, and the
    # stored text-retrieval query (build amortized in the warm-up;
    # the measured reps are the pruned-scan serving cost)
    "doc_search_hybrid_multi", "emb_mmr_multi", "ann_knn_probe_stored",
    "doc_search_bm25_stored",
    # r12 additions (r11 verdict #7): the rest of the r11 stored-text
    # family — single and batched stored hybrid and the bucket-health
    # stats (serving reads, so ratios should sit well under the data
    # step) — plus the r12 fully-stored hybrid (pruned postings +
    # pruned ANN cells: the production composition's scale gauge)
    "doc_search_hybrid_stored", "doc_search_hybrid_multi_stored",
    "text_index_stats", "doc_search_hybrid_multi_stored_ann",
)
SCALE_SMALL_SF = "sf0.01"


def _section_scale(spark, sf_dir, cpus, timings, ratios) -> None:
    """Scale study: time one representative per family at BOTH the
    main and the next-smaller scale factor INSIDE THIS fresh session
    — identical methodology on numerator and denominator — and record
    t(main)/t(small), so scale regressions are machine-checkable in
    the bench JSON instead of living only in BASELINE.md prose.
    (r5 used the main suite's in-suite readings as numerators against
    fresh-session denominators; accumulated JVM state inflated them
    up to 3.7x the recorded 10x-study ratios — r5 verdict finding #2.)
    A pruned-query family should hold near 1x across a 10x data step;
    linear families should stay well under the data ratio while the
    work fits the core count."""
    small = re.sub(r"sf[\d.]+", SCALE_SMALL_SF, sf_dir)
    if small == sf_dir or not os.path.isdir(small):
        return
    from lasdb_spark.operators.dedup import minhash_lsh_pairs
    from lasdb_spark.operators.ingest import ingest_points, load_dataset
    from lasdb_spark.operators.relational import sliding_event_rates
    from lasdb_spark.operators.similarity import topk_pq
    from lasdb_spark.operators.sketch import hll_distinct
    from lasdb_spark.operators.text import tfidf_top_terms
    from lasdb_spark.operators.window_query import WindowQuerier
    from lasdb_spark.sources.events import events_df
    from lasdb_spark.sources.points import points_df

    import __spark_entry__ as _entry

    _eq = _entry.queries()
    per_sf: dict[str, dict[str, float]] = {}
    for data_dir in (small, sf_dir):
        sbase = tempfile.mkdtemp(prefix="lasdb_bench_scale_")
        try:
            pts = points_df(spark, data_dir)
            pts.count()
            docs = spark.read.parquet(f"{data_dir}/documents.parquet")
            embs = spark.read.parquet(f"{data_dir}/embeddings.parquet")
            ev = events_df(spark, data_dir)
            docs.count(), embs.count(), ev.count()
            t: dict[str, float] = {}
            t["ingest"] = _timed(
                spark,
                lambda: ingest_points(
                    pts, "scale", sbase, target_partitions=cpus
                ),
            )
            df, meta, layout = load_dataset(spark, sbase, "scale")
            q = WindowQuerier(df, meta, layout)
            q.bbox([85150.0, 85160.0, 446200.0, 446210.0]).count()
            from lasdb_spark.operators.graph import copurchase_triangles

            li = spark.read.parquet(f"{data_dir}/lineitem.parquet")
            suite = {
                "bbox_small": lambda: q.bbox(
                    [85200.0, 85250.0, 446300.0, 446400.0]
                ),
                "text_tfidf": lambda: tfidf_top_terms(docs),
                "dedup_minhash": lambda: minhash_lsh_pairs(docs),
                "ann_pq_topk": lambda: topk_pq(embs),
                "sketch_hll": lambda: hll_distinct(ev),
                "ev_sliding_rates": lambda: sliding_event_rates(ev),
                # r7: adjacency-intersect triangle close — its ratio
                # across the 10x step gates the degree-ordering claim
                "rel_triangles": lambda: copurchase_triangles(li),
                # r9 additions (r8 verdict #6): one rep per new r8
                # family — two-level voxel CC, build+probe dedup
                # index, drained session windows (fixed micro-batch
                # overhead dominates at this corpus size, so its
                # ratio should sit NEAR 1x, not at the data ratio),
                # and the perceptron train+report chain.
                "pc_segments": lambda d=data_dir: _eq["pc_segments"](
                    spark, d
                ),
                "dedup_index_probe": lambda d=data_dir: _eq[
                    "dedup_index_probe"
                ](spark, d),
                "stream_sessions": lambda d=data_dir: _eq[
                    "stream_sessions"
                ](spark, d),
                "quality_calibration": lambda d=data_dir: _eq[
                    "quality_calibration"
                ](spark, d),
                "ann_knn_join_ivf": lambda d=data_dir: _eq[
                    "ann_knn_join_ivf"
                ](spark, d),
                "ann_knn_join_stored": lambda d=data_dir: _eq[
                    "ann_knn_join_stored"
                ](spark, d),
                "dedup_clusters_inc": lambda d=data_dir: _eq[
                    "dedup_clusters_inc"
                ](spark, d),
                "stream_dedup_probe": lambda d=data_dir: _eq[
                    "stream_dedup_probe"
                ](spark, d),
                "doc_search_hybrid": lambda d=data_dir: _eq[
                    "doc_search_hybrid"
                ](spark, d),
                "doc_search_hybrid_multi": lambda d=data_dir: _eq[
                    "doc_search_hybrid_multi"
                ](spark, d),
                "emb_mmr_multi": lambda d=data_dir: _eq["emb_mmr_multi"](
                    spark, d
                ),
                "ann_knn_probe_stored": lambda d=data_dir: _eq[
                    "ann_knn_probe_stored"
                ](spark, d),
                "doc_search_bm25_stored": lambda d=data_dir: _eq[
                    "doc_search_bm25_stored"
                ](spark, d),
                "doc_search_hybrid_stored": lambda d=data_dir: _eq[
                    "doc_search_hybrid_stored"
                ](spark, d),
                "doc_search_hybrid_multi_stored": lambda d=data_dir: _eq[
                    "doc_search_hybrid_multi_stored"
                ](spark, d),
                "text_index_stats": lambda d=data_dir: _eq[
                    "text_index_stats"
                ](spark, d),
                "doc_search_hybrid_multi_stored_ann": lambda d=data_dir: _eq[
                    "doc_search_hybrid_multi_stored_ann"
                ](spark, d),
            }
            for name, fn in suite.items():
                t[name] = _timed(spark, lambda fn=fn: fn().count())
            per_sf[data_dir] = t
        finally:
            # knn_join_ivf ran at this sf: release its persisted
            # assignment before the next sf's reps (its documented
            # rep-boundary contract) so disk held stays one relation
            from lasdb_spark.operators.similarity import (
                release_knn_join_cache,
            )

            release_knn_join_cache()
            shutil.rmtree(sbase, ignore_errors=True)
    t_small, t_main = per_sf[small], per_sf[sf_dir]
    for name in SCALE_REPS:
        if t_main.get(name) and t_small.get(name):
            ratios[name] = round(t_main[name] / t_small[name], 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    base = tempfile.mkdtemp(prefix="lasdb_bench_")
    timings: dict[str, float] = {}
    scale_ratios: dict[str, float] = {}
    sections = [
        lambda s: _section_point_cloud(s, sf_dir, cpus, base, timings),
        # dedup runs in its own fresh session with nothing before it
        # (r10 VERDICT #1 — the cumulative-JVM noise family)
        lambda s: _section_dedup(s, sf_dir, timings),
        # the inline-ANN arms likewise (r11 VERDICT #1)
        lambda s: _section_ann_inline(s, sf_dir, timings),
        lambda s: _section_corpus(s, sf_dir, timings),
        lambda s: _section_heavy(s, sf_dir, timings),
        lambda s: _section_streaming(s, sf_dir, cpus, base, timings),
        lambda s: _section_scale(s, sf_dir, cpus, timings, scale_ratios),
    ]
    try:
        for section in sections:
            spark = _session(cpus)
            try:
                section(spark)
            finally:
                spark.stop()
    finally:
        shutil.rmtree(base, ignore_errors=True)

    total = round(sum(timings.values()), 4)
    full = {
        "metric": "suite_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_runs": N_RUNS,
        "stat": "median_per_query",
        # t(main sf) / t(sf0.01) per family representative;
        # the scale-regression gauge (r5)
        "scale_ratios": scale_ratios,
        "scale_small": SCALE_SMALL_SF,
    }
    print(json.dumps(full))
    # also dump the full row set next to the script (r10 VERDICT #8):
    # the recorded bench artifact keeps only a ~2 KB stdout tail,
    # which hides 130+ rows from round-over-round diffing — the file
    # copy is committed per round as BENCH_LOCAL_r{N}.json
    try:
        out_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"
        )
        with open(out_path, "w") as f:
            json.dump(full, f, indent=1, sort_keys=True)
    except OSError:
        pass  # read-only checkout: stdout already carries the data
    # compact SECOND line, printed LAST (r9 verdict #8): the recorded
    # bench artifact keeps only the tail of stdout, which truncated
    # the head of the full JSON line above — so the reference-
    # comparable headline rows (BASELINE.md r1 numbers) and the scale
    # gauge are re-emitted here in <1.5 KB, guaranteed visible.
    headline_keys = (
        "ingest", "bbox_small", "bbox_large", "knn_1000",
        "dedup_minhash", "dedup_clusters", "ann_knn_join",
        "ann_knn_join_ivf", "ann_knn_join_stored", "stream_conversions",
    )
    print(
        json.dumps(
            {
                "metric": "headline_subset",
                "value": total,
                "unit": "sec",
                "queries": {
                    k: timings[k] for k in headline_keys if k in timings
                },
                "sf": sf,
                "scale_ratios": scale_ratios,
            }
        )
    )


if __name__ == "__main__":
    main()
