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


@pytest.mark.spark
def test_scd2_history_versions_and_open_end(spark):
    """Consecutive same-type runs collapse to one version; type flips
    open new versions; the latest version has valid_to_ms NULL and
    each valid_to equals the next valid_from (no gaps/overlaps)."""
    from lasdb_spark.operators.relational import scd2_history

    rows = [
        # user 1: view,view -> click -> view  (3 versions)
        (1, "2024-01-01 00:00:00", 1, "view"),
        (2, "2024-01-01 00:10:00", 1, "view"),
        (3, "2024-01-01 00:20:00", 1, "click"),
        (4, "2024-01-01 00:30:00", 1, "view"),
        # user 2: single event, stays open
        (5, "2024-01-01 01:00:00", 2, "error"),
    ]
    ev = spark.createDataFrame(
        [(i, ts, u, t, 1.0, "{}") for i, ts, u, t in rows],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = scd2_history(ev).collect()
    u1 = [r for r in out if r["user_id"] == 1]
    assert [r["event_type"] for r in u1] == ["view", "click", "view"]
    assert [r["n_events"] for r in u1] == [2, 1, 1]
    # interval chaining: valid_to == next valid_from; last is NULL
    assert u1[0]["valid_to_ms"] == u1[1]["valid_from_ms"]
    assert u1[1]["valid_to_ms"] == u1[2]["valid_from_ms"]
    assert u1[2]["valid_to_ms"] is None
    (u2,) = [r for r in out if r["user_id"] == 2]
    assert u2["valid_to_ms"] is None and u2["n_events"] == 1


@pytest.mark.spark
def test_key_skew_report_salt_math(spark):
    """A planted hot key reads the exact integer share and the salt
    factor that flattens it to mean key load."""
    from lasdb_spark.operators.relational import key_skew_report

    # key 7 -> 60 events, keys 1..4 -> 10 each: total 100, n_keys 5
    rows = []
    eid = 0
    for _ in range(60):
        rows.append((eid, "2024-01-01 00:00:00", 7, "view", 0.0, "{}")); eid += 1
    for k in (1, 2, 3, 4):
        for _ in range(10):
            rows.append((eid, "2024-01-01 00:00:00", k, "view", 0.0, "{}")); eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["key_val"]: r for r in key_skew_report(ev, top_k=3).collect()}
    hot = out[7]
    assert hot["rank"] == 1 and hot["n"] == 60
    assert hot["share_ppm"] == 600_000  # exactly 60%
    # mean key load = 100/5 = 20; 60/20 = 3 -> salt 3
    assert hot["suggested_salt"] == 3
    assert out[1]["suggested_salt"] == 1  # 10 < mean? 10*5/100 = 0.5 -> ceil 1


@pytest.mark.spark
def test_profile_columns_nulls_and_types(spark):
    """Null floods and cardinality read exactly; strings carry NULL
    min/max; timestamps profile as epoch-ms."""
    from lasdb_spark.operators.relational import profile_columns

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 10, "a", 1.5, None),
            (2, "2024-01-02 00:00:00", None, "b", None, "{}"),
            (3, None, 10, "a", 3.5, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["column"]: r for r in profile_columns(ev).collect()}
    assert out["user_id"]["n_null"] == 1
    assert out["user_id"]["n_distinct"] == 1
    assert out["value"]["min_num"] == 1.5 and out["value"]["max_num"] == 3.5
    assert out["event_type"]["min_num"] is None  # strings: no numeric range
    assert out["ts"]["n_null"] == 1
    assert out["ts"]["min_num"] == 1704067200000.0
    assert all(r["n_rows"] == 3 for r in out.values())


@pytest.mark.spark
def test_k_anonymity_ladder_semantics(spark):
    """Class census math: a 2-row class is below k=3 and counts as at
    risk; coarsening merges classes and clears the flag; negative
    balances bucket identically (floor, not truncate-toward-zero)."""
    from lasdb_spark.operators.relational import k_anonymity_ladder

    customer = spark.createDataFrame(
        [
            # level 3 (segment only): AUTO has 4 rows, OK at k=3
            (0, "AUTO", 150.0), (1, "AUTO", 151.0),
            (2, "AUTO", 152.0), (5, "AUTO", -950.0),
            # BIKE: 3 rows, exactly k -> not at risk
            (3, "BIKE", 500.0), (8, "BIKE", 501.0), (13, "BIKE", 502.0),
        ],
        "c_nationkey long, c_mktsegment string, c_acctbal double",
    )
    got = {r.level: r for r in k_anonymity_ladder(customer, k=3).collect()}
    # level 0: nation|segment|$100-bucket -> all classes singletons
    assert got[0].min_class == 1 and not got[0].k_anonymous
    assert got[0].rows_at_risk == 7 and got[0].risk_ppm == 1000000
    # level 3: {AUTO: 4, BIKE: 3} -> k-anonymous at k=3
    assert got[3].n_classes == 2
    assert got[3].min_class == 3 and got[3].k_anonymous
    assert got[3].rows_at_risk == 0 and got[3].risk_ppm == 0


@pytest.mark.spark
def test_cusum_closed_form_matches_recursion(spark):
    """The windowed closed form s_t = P_t - min(0, min P_j) equals
    the textbook recursion s_t = max(0, s_{t-1} + x_t - mu - k) on a
    planted step shift, and alarms fire only after the shift."""
    import datetime
    from lasdb_spark.operators.relational import cusum_alarms

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 20 calm hours of 2 events, then 10 shifted hours of 12 events
    for h in range(30):
        n = 2 if h < 20 else 12
        for _ in range(n):
            rows.append(
                (eid, t0 + datetime.timedelta(hours=h, minutes=30), 1,
                 "click", 1.0, "{}")
            )
            eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        r.hour_ms: r.s_centi for r in cusum_alarms(events).collect()
    }
    # replay the recursion exactly: total=160, hours=30 ->
    # mu_c = 533, k_c = 53
    mu_c, k_c = 16000 // 30, (16000 // 30) * 10 // 100
    s, expect = 0, {}
    for h in range(30):
        n = 2 if h < 20 else 12
        s = max(0, s + n * 100 - mu_c - k_c)
        if s > mu_c * 5:
            hour_ms = int(
                (t0 + datetime.timedelta(hours=h)).timestamp() * 1000
            )
            expect[hour_ms] = s
    assert expect, "fixture must produce alarms"
    assert got == expect
    # no alarm before the shift
    shift_ms = int((t0 + datetime.timedelta(hours=20)).timestamp() * 1000)
    assert all(h >= shift_ms for h in got)


@pytest.mark.spark
def test_ivm_rollup_equals_recompute(spark):
    """Delta-apply == full recompute on a hand stream where the batch
    inserts a new key, updates a key across groups, and deletes the
    only member of a group (which must then VANISH from the rollup)."""
    import datetime
    from lasdb_spark.operators.relational import (
        cdc_snapshot,
        rollup_apply_changes,
        snapshot_rollup,
    )

    t0 = datetime.datetime(2024, 1, 1)

    def ev(eid, user, typ, val, minutes):
        return (eid, t0 + datetime.timedelta(minutes=minutes), user,
                typ, val, "{}")

    sch = ("event_id long, ts timestamp, user_id long, "
           "event_type string, value double, props string")
    base_rows = [
        ev(1, 1, "click", 10.0, 0),
        ev(2, 2, "view", 20.0, 1),
        ev(3, 3, "signup", 30.0, 2),   # only signup member
    ]
    batch_rows = [
        ev(4, 4, "click", 5.5, 60),    # new key
        ev(5, 2, "click", 7.25, 61),   # view -> click group move
        ev(6, 3, "error", 0.0, 62),    # delete the only signup
    ]
    base = spark.createDataFrame(base_rows, sch)
    batch = spark.createDataFrame(batch_rows, sch)
    snap0 = cdc_snapshot(base)
    got = {
        r.last_type: (r.n_users, r.total_value)
        for r in rollup_apply_changes(
            snap0, snapshot_rollup(snap0), batch
        ).collect()
    }
    full = {
        r.last_type: (r.n_users, r.total_value)
        for r in snapshot_rollup(
            cdc_snapshot(base.unionByName(batch))
        ).collect()
    }
    assert got == full
    assert got == {"click": (3, 22.75)}  # 10.0 + 5.5 + 7.25
    assert "signup" not in got and "view" not in got


@pytest.mark.spark
def test_benford_digit_ladder_and_shares(spark):
    """Digit extraction is integer-exact at power-of-ten boundaries
    (the float-log failure case), and ppm shares are floored."""
    from lasdb_spark.operators.relational import benford_audit

    orders = spark.createDataFrame(
        [(10.00,), (99.99,), (100.00,), (0.01,), (12345.67,), (9.99,)],
        "o_totalprice double",
    )
    got = {r.digit: r for r in benford_audit(orders).collect()}
    # cents: 1000, 9999, 10000, 1, 1234567, 999 -> digits 1,9,1,1,1,9
    assert got[1].n_obs == 4 and got[9].n_obs == 2
    assert got[1].share_ppm == 4 * 1000000 // 6
    assert got[1].benford_ppm == 301029
    assert got[1].dev_ppm == got[1].share_ppm - 301029


@pytest.mark.spark
def test_forecast_backtest_known_seasonal_signal(spark):
    """A perfectly periodic signal gives the profile zero error
    (skill 1e6 ppm... modulo the naive floor guard) while the
    persistence baseline also nails it; a shifted test week shows
    positive-but-partial skill arithmetic exactly."""
    import datetime
    from lasdb_spark.operators.relational import forecast_backtest

    t0 = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    # 4 days: hour-of-day pattern n = 1 + (hod % 3); day 4 = test
    for day in range(4):
        for hod in range(24):
            for _ in range(1 + hod % 3):
                rows.append(
                    (eid, t0 + datetime.timedelta(days=day, hours=hod,
                                                  minutes=30),
                     1, "click", 1.0, "{}")
                )
                eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = forecast_backtest(events, train_days=3).collect()
    assert len(got) == 1
    r = got[0]
    # periodic signal: profile == actuals -> MAE 0; persistence also 0
    assert r.mae_milli == 0 and r.naive_mae_milli == 0
    # naive floor guard: err=0 -> skill = 1e6 - 0 = 1e6
    assert r.skill_ppm == 1000000
    assert r.n_test_hours == 24


@pytest.mark.spark
def test_hourly_acf_finds_planted_daily_cycle(spark):
    """A 24h-periodic signal yields acf(24) ~= 1 and a deep
    anti-correlation at lag 12; white-ish lags stay small."""
    import datetime
    from lasdb_spark.operators.relational import hourly_acf

    t0 = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    for day in range(6):
        for hod in range(24):
            n = 5 + (3 if hod < 12 else -3)  # square daily wave
            for _ in range(n):
                rows.append(
                    (eid, t0 + datetime.timedelta(days=day, hours=hod,
                                                  minutes=15),
                     1, "click", 1.0, "{}")
                )
                eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {r.lag: r.acf for r in hourly_acf(events).collect()}
    assert got[24] > 0.99
    assert got[12] < -0.99
    assert abs(got[1]) > 0.5  # square wave: adjacent hours agree
