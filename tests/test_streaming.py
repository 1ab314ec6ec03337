"""Streaming ops: output must converge to the batch twins on finite input."""

import pytest
from pyspark.sql import functions as F

from lasdb_spark.operators.relational import hourly_event_rollup
from lasdb_spark.streaming import events as se


@pytest.fixture(scope="module")
def event_stream(spark, sf_dir):
    return se.read_event_stream(spark, sf_dir)


@pytest.mark.spark
def test_windowed_counts_match_batch(spark, sf_dir, event_stream):
    se.run_to_memory(se.windowed_counts(event_stream), "win_out", "complete")
    got = {
        (r.hour_ms, r.event_type): (r.n, round(r.sum_value, 4))
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    from lasdb_spark.sources.events import events_df

    batch = {
        (r.hour_ms, r.event_type): (r.n, round(r.sum_value, 4))
        for r in hourly_event_rollup(events_df(spark, sf_dir)).collect()
    }
    assert got == batch


@pytest.mark.spark
def test_session_windows_run(spark, event_stream):
    se.run_to_memory(se.session_windows(event_stream), "sess_out", "complete")
    rows = spark.sql("SELECT * FROM sess_out").collect()
    assert len(rows) > 0
    assert all(r.t_end_ms > r.t_start_ms for r in rows)


@pytest.mark.spark
def test_session_windows_append_drain_matches_batch(spark, sf_dir):
    """r8: the append-mode drain (multi-batch replay + watermark-flush
    sentinel replayed last) must emit every session exactly once and
    equal the batch gap-islands computation; the sentinel itself must
    never reach the sink."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from lasdb_spark.sources.events import (
        FLUSH_USER,
        events_df,
        events_stream_multibatch_flushed,
    )

    se.run_to_memory(
        se.session_windows(
            events_stream_multibatch_flushed(spark, sf_dir),
            gap="30 minutes",
            watermark="800 hours",
        ),
        "sess_fl",
        "append",
    )
    got = sorted(tuple(r) for r in spark.table("sess_fl").collect())
    assert got and all(r[0] != FLUSH_USER for r in got)
    gap_us = 30 * 60 * 1_000_000
    ev = events_df(spark, sf_dir).select(
        "user_id", (F.unix_micros("ts")).alias("t")
    )
    w = Window.partitionBy("user_id").orderBy("t")
    brk = F.when(
        F.lag("t").over(w).isNull()
        | ((F.col("t") - F.lag("t").over(w)) > gap_us),
        1,
    ).otherwise(0)
    grp = F.sum(brk).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    batch = sorted(
        tuple(r)
        for r in ev.withColumn("g", grp)
        .groupBy("user_id", "g")
        .agg(
            (F.min("t") / 1000).cast("long").alias("t_start_ms"),
            ((F.max("t") + gap_us) / 1000).cast("long").alias("t_end_ms"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "t_start_ms", "t_end_ms", "n_events")
        .collect()
    )
    assert got == batch


@pytest.mark.spark
def test_stream_exact_dedup_matches_batch(spark, sf_dir):
    """The continuously-maintained dedup table must equal the batch
    exact_dedup output once the finite stream drains."""
    from lasdb_spark.operators.dedup import exact_dedup
    from lasdb_spark.streaming import dedup as sd

    stream = sd.read_document_stream(spark, sf_dir)
    se.run_to_memory(sd.stream_exact_dedup(stream), "dedup_out", "update")
    got = {
        r.text_hash: (r.keeper_doc_id, r.n_docs)
        for r in spark.sql(
            # update mode may emit a hash several times across batches;
            # the LAST update per hash is the converged row (n monotone)
            "SELECT text_hash, max_by(keeper_doc_id, n_docs) AS keeper_doc_id, "
            "max(n_docs) AS n_docs FROM dedup_out GROUP BY 1"
        ).collect()
    }
    batch = {
        r.text_hash: (r.keeper_doc_id, r.n_docs)
        for r in exact_dedup(
            spark.read.parquet(f"{sf_dir}/documents.parquet")
        ).collect()
    }
    assert got == batch


@pytest.mark.spark
def test_native_event_dedup(spark, sf_dir, event_stream):
    """Watermark-bounded native dedup: replay-free input passes through
    with every distinct event id exactly once."""
    se.run_to_memory(se.dedup_events(event_stream), "evdedup_out", "append")
    got = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM evdedup_out"
    ).first()
    want = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id")
        .distinct()
        .count()
    )
    assert got.n == got.d == want


@pytest.mark.spark
def test_stream_curate_matches_batch_gates(spark, sf_dir):
    """Streaming curation (quality ∧ sample gates + exact-dedup state)
    must equal the same gates applied in batch."""
    from lasdb_spark.operators.curate import MIN_QUALITY
    from lasdb_spark.operators.dedup import exact_dedup
    from lasdb_spark.operators.text import quality_col, sample_keep_pred
    from lasdb_spark.streaming import dedup as sd

    stream = sd.read_document_stream(spark, sf_dir)
    se.run_to_memory(sd.stream_curate(stream), "cur_out", "update")
    got = {
        r.text_hash: (r.keeper_doc_id, r.n_docs)
        for r in spark.sql(
            "SELECT text_hash, max_by(keeper_doc_id, n_docs) AS keeper_doc_id, "
            "max(n_docs) AS n_docs FROM cur_out GROUP BY 1"
        ).collect()
    }
    batch_gated = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter((quality_col() >= MIN_QUALITY) & sample_keep_pred())
    )
    batch = {
        r.text_hash: (r.keeper_doc_id, r.n_docs)
        for r in exact_dedup(batch_gated).collect()
    }
    assert got == batch and len(batch) > 0


@pytest.mark.spark
def test_stateful_running_totals(spark, sf_dir, event_stream):
    se.run_to_memory(se.running_user_totals(event_stream), "run_out", "update")
    got = {
        r.user_id: r.n_events
        for r in spark.sql(
            "SELECT user_id, max(n_events) AS n_events FROM run_out GROUP BY 1"
        ).collect()
    }
    batch = {
        r.user_id: r.n
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == batch


@pytest.mark.spark
def test_stream_store_compaction_matches_batch(spark, sf_dir, tmp_path):
    """The layered contract: cheap gates stream docs into an append
    store; compact_document_store later removes near-dups in batch.
    The compacted store must equal the all-candidates batch clustering
    (adjacent banding + path-halving components converge to the same
    keepers), and survive a round trip as a plain parquet table."""
    from lasdb_spark.operators.curate import MIN_QUALITY
    from lasdb_spark.operators.dedup import dedup_clusters
    from lasdb_spark.operators.text import quality_col, sample_keep_pred
    from lasdb_spark.streaming import dedup as sd

    stream = sd.read_document_stream(spark, sf_dir)
    gated = stream.filter(
        (quality_col() >= MIN_QUALITY) & sample_keep_pred()
    )
    store = str(tmp_path / "store")
    q = (
        gated.writeStream.format("parquet")
        .option("path", store)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    sd.compact_document_store(spark, store)
    back = spark.read.parquet(store)
    got = {r.doc_id for r in back.select("doc_id").collect()}
    assert set(back.columns) == {"doc_id", "text", "lang", "source", "n_chars"}

    batch_gated = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        (quality_col() >= MIN_QUALITY) & sample_keep_pred()
    )
    cl = dedup_clusters(batch_gated, candidates="all")
    want = {
        r.doc_id
        for r in cl.filter(F.col("doc_id") == F.col("cluster_id")).collect()
    }
    assert got == want and len(got) > 0


@pytest.mark.spark
def test_sliding_windowed_counts_match_batch(spark, sf_dir, event_stream):
    """The sliding variant converges to the batch sliding_event_rates
    on finite input (same epoch-aligned window starts)."""
    from lasdb_spark.operators.relational import sliding_event_rates
    from lasdb_spark.sources.events import events_df

    se.run_to_memory(
        se.windowed_counts(event_stream, slide="15 minutes"),
        "slide_out",
        "complete",
    )
    got = {
        (r.hour_ms, r.event_type): r.n
        for r in spark.sql("SELECT * FROM slide_out").collect()
    }
    batch = {
        (r.window_start_ms, r.event_type): r.n
        for r in sliding_event_rates(events_df(spark, sf_dir)).collect()
    }
    assert got == batch


@pytest.mark.spark
def test_stream_enriched_counts_converge_to_batch(spark, sf_dir):
    """Drained stream-static enrichment join == batch join + agg
    exactly (centi-unit sums are batch-boundary-independent)."""
    from lasdb_spark.sources.events import events_stream_multibatch
    from lasdb_spark.streaming.events import enriched_segment_counts
    from lasdb_spark.streaming.sketch import drained_final

    customers = spark.read.parquet(f"{sf_dir}/customer.parquet")
    se.run_to_memory(
        enriched_segment_counts(
            events_stream_multibatch(spark, sf_dir), customers
        ),
        "enrich_out",
        "update",
    )
    got = {
        (r.segment, r.event_type): (r.n_events, r.sum_value)
        for r in drained_final(
            spark, "enrich_out", ["segment", "event_type"],
            counter="n_events",
        ).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch = {
        (r.segment, r.event_type): (r.n_events, r.sum_value)
        for r in enriched_segment_counts(ev, customers).collect()
    }
    assert got == batch and len(got) >= 20


@pytest.mark.spark
def test_windowed_counts_drop_late_beyond_watermark(spark, tmp_path):
    """Late-data semantics: an event arriving in a later micro-batch
    with a timestamp older than the watermark horizon is DROPPED from
    its (already finalized) window; append mode emits only windows the
    watermark has passed."""
    import datetime
    import glob
    import os
    import shutil

    sch = (
        "event_id long, user_id long, event_type string, "
        "value double, ts timestamp"
    )
    t0 = datetime.datetime(2024, 1, 1, 0, 30)

    def ev(i, h):
        return (i, 1, "click", 1.0, t0 + datetime.timedelta(hours=h))

    src = tmp_path / "src"
    src.mkdir()
    # three batches: the watermark finalizes hour 0 at the END of the
    # batch where it advances past it (a late row in THAT batch still
    # merges — measured), so the drop needs the late row one batch
    # later, against evicted state
    batches = [
        [ev(i, h) for i, h in enumerate(range(11))],  # hours 0..10
        [ev(101, 11)],  # advances the watermark; hours 0..7 finalize
        [ev(100, 0)],   # LATE hour-0 replay: state evicted -> dropped
    ]
    for bi, rows in enumerate(batches):
        stage = tmp_path / f"stage{bi}"
        spark.createDataFrame(rows, sch).coalesce(1).write.parquet(
            str(stage)
        )
        part = glob.glob(str(stage / "part-*.parquet"))[0]
        dst = src / f"batch{bi}.parquet"
        shutil.copy(part, dst)
        # file-source ordering is by modification time
        os.utime(dst, (1_700_000_000 + bi, 1_700_000_000 + bi))

    stream = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = se.windowed_counts(stream, "1 hour", "2 hours")
    se.run_to_memory(out, "late_out", "append")
    got = {
        r.hour_ms: r.n for r in spark.sql("SELECT * FROM late_out").collect()
    }
    h0_ms = int(
        datetime.datetime(
            2024, 1, 1, 0, tzinfo=datetime.timezone.utc
        ).timestamp() * 1000
    )
    # the finalized hour-0 window holds ONLY the on-time event: the
    # late replay arrived after hour 0's state was emitted + evicted
    # (watermark 9:30) and was dropped
    assert got[h0_ms] == 1
    # windows finalize only up to the last watermark (9:30): hours
    # 0..8 emitted, 9..11 still open at drain
    hours = sorted((ms - h0_ms) // 3_600_000 for ms in got)
    assert hours == list(range(9)), hours
    assert all(n == 1 for n in got.values())


@pytest.mark.spark
def test_stream_conversion_join_cross_batch_and_window(spark, tmp_path):
    """Stream-stream inner join semantics: a purchase in a LATER
    micro-batch joins a view buffered from an earlier one; purchases
    outside the attribution window (before the view, or past
    window_hours) never match; lag and cents are integer-exact."""
    import datetime
    import glob
    import os
    import shutil

    sch = (
        "event_id long, user_id long, event_type string, "
        "value double, ts timestamp"
    )
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def ev(i, typ, user, mins, val=2.5):
        return (i, user, typ, val, t0 + datetime.timedelta(minutes=mins))

    batches = [
        # batch 0: two views + one purchase BEFORE any view
        [ev(1, "view", 7, 0), ev(2, "view", 8, 10),
         ev(3, "purchase", 7, -30)],
        # batch 1: in-window purchase for user 7 (cross-batch match),
        # out-of-window purchase for user 8 (4 h + 1 min later)
        [ev(4, "purchase", 7, 90, 3.33),
         ev(5, "purchase", 8, 10 + 241)],
        # batch 2: same-user purchase exactly AT the view instant
        [ev(6, "purchase", 8, 10, 1.01)],
    ]
    src = tmp_path / "src"
    src.mkdir()
    for bi, rows in enumerate(batches):
        stage = tmp_path / f"stage{bi}"
        spark.createDataFrame(rows, sch).coalesce(1).write.parquet(
            str(stage)
        )
        part = glob.glob(str(stage / "part-*.parquet"))[0]
        dst = src / f"batch{bi}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, (1_700_000_000 + bi, 1_700_000_000 + bi))

    stream = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    se.run_to_memory(
        se.stream_conversion_join(stream), "conv_out", "append"
    )
    got = {
        (r.view_id, r.buy_id): (r.user_id, r.lag_s, r.cents)
        for r in spark.sql("SELECT * FROM conv_out").collect()
    }
    assert got == {
        (1, 4): (7, 5400, 333),   # cross-batch, 90 min lag
        (2, 6): (8, 0, 101),      # boundary: buy_ts == view_ts joins
    }
