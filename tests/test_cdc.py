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
    got = {}
    for r in spark.sql("SELECT * FROM cdc_out").collect():
        got[r.user_id] = (r.last_type, r.last_value, r.last_ms, r.n_changes)
    batch = {
        r.user_id: (r.last_type, r.last_value, r.last_ms, r.n_changes)
        for r in cdc_snapshot(events_df(spark, sf_dir)).collect()
    }
    assert got == batch
