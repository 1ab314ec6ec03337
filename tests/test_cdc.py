"""CDC semantics: latest-wins, delete handling, merge associativity."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _ev(i, minute, user, etype, value=1.0):
    return (
        i,
        dt.datetime(2024, 1, 10, 12, minute, 0),
        user,
        etype,
        value,
        "{}",
    )


@pytest.mark.spark
def test_cdc_latest_wins_and_delete(spark):
    from lasdb_spark.operators.relational import cdc_snapshot

    rows = spark.createDataFrame(
        [
            _ev(1, 0, 1, "signup", 1.0),
            _ev(2, 5, 1, "purchase", 9.0),   # latest for user 1
            _ev(3, 0, 2, "click", 2.0),
            _ev(4, 6, 2, "error"),           # delete wins -> user 2 gone
            _ev(5, 1, 3, "error"),
            _ev(6, 2, 3, "view", 3.0),       # resurrect after delete
        ],
        SCHEMA,
    )
    out = {r.user_id: r for r in cdc_snapshot(rows).collect()}
    assert set(out) == {1, 3}
    assert out[1].last_type == "purchase" and out[1].last_value == 9.0
    assert out[1].n_changes == 2
    assert out[3].last_type == "view"


@pytest.mark.spark
def test_merge_final_state_is_associative(spark, sf_dir):
    """snapshot(A) merged with B equals snapshot(A ++ B) in final
    state, for any split point — the incremental-CDC correctness."""
    from lasdb_spark.operators.relational import cdc_snapshot, merge_upsert
    from lasdb_spark.sources.events import events_df

    ev = events_df(spark, sf_dir)
    split = 1_705_276_800_000
    ms = F.unix_millis(F.col("ts"))
    merged = merge_upsert(
        cdc_snapshot(ev.filter(ms < split)), ev.filter(ms >= split)
    )
    key = lambda df: sorted(
        (r.user_id, r.last_type, r.last_value, r.last_ms)
        for r in df.collect()
    )
    assert key(merged) == key(cdc_snapshot(ev))


@pytest.mark.spark
def test_stream_cdc_converges_to_batch(spark, sf_dir):
    """The continuously-maintained streaming profile equals the batch
    latest-wins snapshot once the finite stream drains — including
    delete suppression and change counts."""
    from lasdb_spark.operators.relational import cdc_snapshot
    from lasdb_spark.sources.events import events_df, events_stream
    from lasdb_spark.streaming import events as se
    from lasdb_spark.streaming.sketch import stream_cdc_snapshot

    se.run_to_memory(
        stream_cdc_snapshot(events_stream(spark, sf_dir)),
        "cdc_out",
        "update",
    )
    assert _replay_sink(spark, "cdc_out") == _batch_snapshot(spark, sf_dir)


def _replay_sink(spark, table):
    """Apply the update-mode CDC output the way a sink would: per key,
    the latest emission (n_changes grows monotonically per key, so it
    identifies the last one without relying on row order); op='D'
    tombstones retract the key."""
    last = {}
    for r in spark.sql(f"SELECT * FROM {table}").collect():
        cur = last.get(r.user_id)
        if cur is None or r.n_changes > cur.n_changes:
            last[r.user_id] = r
    return {
        uid: (r.last_type, r.last_value, r.last_ms, r.last_seq, r.n_changes)
        for uid, r in last.items()
        if r.op == "U"
    }


def _batch_snapshot(spark, sf_dir):
    from lasdb_spark.operators.relational import cdc_snapshot
    from lasdb_spark.sources.events import events_df

    return {
        r.user_id: (r.last_type, r.last_value, r.last_ms, r.last_seq,
                    r.n_changes)
        for r in cdc_snapshot(events_df(spark, sf_dir)).collect()
    }


@pytest.mark.spark
def test_stream_cdc_multibatch_emits_tombstones(spark, sf_dir):
    """Across REAL micro-batch boundaries (maxFilesPerTrigger=1 over a
    split table) a key whose update was emitted in an earlier batch
    and whose delete wins later must end RETRACTED at the sink — the
    round-4 ADVICE scenario that the one-file stream could not
    exercise."""
    from lasdb_spark.sources.events import events_stream_multibatch
    from lasdb_spark.streaming import events as se
    from lasdb_spark.streaming.sketch import stream_cdc_snapshot

    se.run_to_memory(
        stream_cdc_snapshot(
            events_stream_multibatch(spark, sf_dir, n_files=4)
        ),
        "cdc_out_mb",
        "update",
    )
    rows = spark.sql("SELECT * FROM cdc_out_mb").collect()
    # the multi-batch replay actually emitted tombstones
    assert any(r.op == "D" for r in rows)
    # at least one tombstoned key had a LIVE update emitted earlier
    # (the stale-row scenario) and is absent from the batch snapshot
    batch = _batch_snapshot(spark, sf_dir)
    emitted_live = {r.user_id for r in rows if r.op == "U"}
    dead = {r.user_id for r in rows if r.op == "D"} - set(batch)
    assert dead & emitted_live
    assert _replay_sink(spark, "cdc_out_mb") == batch


@pytest.mark.spark
def test_top_session_paths_semantics(spark):
    """Paths never cross session boundaries and counts are exact."""
    from lasdb_spark.operators.relational import top_session_paths

    rows = [
        # user 1, one session: a b c d -> paths a>b>c, b>c>d
        _ev(1, 0, 1, "a"), _ev(2, 1, 1, "b"),
        _ev(3, 2, 1, "c"), _ev(4, 3, 1, "d"),
        # user 2: a b | (35 min gap) c d e -> a>b dies at the boundary
        _ev(5, 0, 2, "a"), _ev(6, 1, 2, "b"),
        _ev(7, 40, 2, "c"), _ev(8, 41, 2, "d"), _ev(9, 42, 2, "e"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.path: r.n for r in top_session_paths(df, k=10).collect()}
    assert got == {"a>b>c": 1, "b>c>d": 1, "c>d>e": 1}
