"""Temporal operators: sessionization, sliding rate limits, as-of join."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from json_validator_spark.operators import temporal as tp


def _ts(minute: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minute)


# microsecond tick of _ts(0): 2024-01-01T00:00 UTC (session tz is UTC)
_E = 1_704_067_200 * 1_000_000


def test_sessionize_gap_boundary(spark):
    # gaps: 29m59.999s stays in-session, exactly 30m stays (> means strict),
    # 30m + 1us breaks
    rows = [
        (1, 10, _ts(0)),
        (2, 10, _ts(29.999983333)),          # +29m59.999s  -> same session
        (3, 10, _ts(59.999983333)),          # +30m exactly -> same (not >)
        (4, 10, _ts(90.0000005)),            # +30m 1us     -> new session
        (5, 20, _ts(0)),                     # other user
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {r["event_id"]: r for r in tp.sessionize(df, gap_minutes=30).collect()}
    assert [out[i]["session_idx"] for i in (1, 2, 3, 4)] == [1, 1, 1, 2]
    assert out[5]["session_idx"] == 1 and out[5]["session_id"] == "20#1"


def test_session_stats_rollup(spark):
    rows = [
        (1, 10, _ts(0)), (2, 10, _ts(5)), (3, 10, _ts(100)), (4, 20, _ts(0)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {
        (r["user_id"], r["session_idx"]): r
        for r in tp.session_stats(df, gap_minutes=30).collect()
    }
    assert got[(10, 1)]["n_events"] == 2 and got[(10, 1)]["duration_s"] == 300
    assert got[(10, 2)]["n_events"] == 1 and got[(10, 2)]["duration_s"] == 0
    assert got[(20, 1)]["n_events"] == 1


def test_rate_limit_sliding_window(spark):
    # 4 events inside one hour, the 4th also within an hour of all three;
    # a later lone event is fine
    rows = [
        (1, 10, _ts(0)), (2, 10, _ts(10)), (3, 10, _ts(20)), (4, 10, _ts(59)),
        (5, 10, _ts(300)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {r["doc_id"]: r for r in
           tp.rate_limit_violations(df, max_events=3, window_minutes=60).collect()}
    assert set(out) == {"4"}
    assert out["4"]["message"].startswith("4 events in 60m")
    # exactly at the window edge: event at +60m from event 1 no longer
    # counts event 1 ((t-window, t] is half-open)
    rows2 = rows[:4] + [(5, 10, _ts(60))]
    df2 = spark.createDataFrame(rows2, "event_id long, user_id long, ts timestamp")
    out2 = {r["doc_id"] for r in
            tp.rate_limit_violations(df2, max_events=3, window_minutes=60).collect()}
    assert out2 == {"4", "5"}  # 5 sees {2,3,4,5}=4 > 3, not event 1


def test_asof_join_semantics(spark):
    ev = spark.createDataFrame(
        [(1, "a", _ts(10)), (2, "a", _ts(30)), (3, "a", _ts(5)), (4, "b", _ts(10))],
        "event_id long, event_type string, ts timestamp",
    )
    snaps = spark.createDataFrame(
        [("a", _ts(0), 1.0), ("a", _ts(10), 2.0), ("a", _ts(40), 3.0)],
        "event_type string, snap_ts timestamp, rate double",
    )
    out = {r["event_id"]: r for r in
           tp.asof_join(ev, snaps, on="event_type").collect()}
    assert out[1]["rate"] == 2.0          # boundary: snapshot AT ts applies
    assert out[2]["rate"] == 2.0          # latest <= 30 is the 10m snapshot
    assert out[3]["rate"] == 1.0
    assert out[4]["rate"] is None and out[4]["snap_ts"] is None  # no key match
    assert out[1]["snap_ts"] == _ts(10)


def test_asof_join_plan_single_exchange(spark):
    """Union-window shape: exactly one Exchange (on the join key), no
    BroadcastNestedLoopJoin / CartesianProduct."""
    ev = spark.createDataFrame(
        [(1, "a", _ts(10))], "event_id long, event_type string, ts timestamp"
    )
    snaps = spark.createDataFrame(
        [("a", _ts(0), 1.0)], "event_type string, snap_ts timestamp, rate double"
    )
    plan = tp.asof_join(ev, snaps, on="event_type")._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_synth_rate_snapshots_deterministic(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    a = sorted(map(tuple, tp.synth_rate_snapshots(ev).collect()))
    b = sorted(map(tuple, tp.synth_rate_snapshots(ev.repartition(7)).collect()))
    assert a == b and len(a) > 0
    # rates are 2-decimal in [0, 100)
    assert all(0.0 <= r[2] < 100.0 for r in a)


def test_session_and_rate_plans_single_exchange(spark):
    """session_stats: the (user, session) groupBy piggybacks on the
    window's hashpartitioning(user) — ONE exchange end-to-end.
    rate_limit: one exchange + one Window."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    p1 = tp.session_stats(ev)._jdf.queryExecution().executedPlan().toString()
    assert p1.count("Exchange hashpartitioning") == 1
    p2 = tp.rate_limit_violations(ev, 2)._jdf.queryExecution().executedPlan().toString()
    assert p2.count("Exchange hashpartitioning") == 1
    assert p2.count("Window") == 1


def test_funnel_greedy_order(spark):
    rows = [
        # user 1: view -> click -> purchase in order, with decoys
        (1, 1, "click", _ts(0)),      # click BEFORE the first view: no match
        (2, 1, "view", _ts(1)),
        (3, 1, "purchase", _ts(2)),   # purchase before click: no match
        (4, 1, "click", _ts(3)),
        (5, 1, "purchase", _ts(4)),
        # user 2: completes only view
        (6, 2, "view", _ts(0)),
        (7, 2, "purchase", _ts(1)),   # skips click: purchase can't match
        # user 3: no step events at all -> not emitted
        (8, 3, "error", _ts(0)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = {r["user_id"]: r for r in
           tp.funnel(df, ["view", "click", "purchase"]).collect()}
    assert set(out) == {1, 2}
    assert out[1]["steps_completed"] == 3
    # matched ticks are the view@1m, click@3m, purchase@4m events
    t = out[1]["step_ts"]
    assert len(t) == 3 and t[0] < t[1] < t[2]
    assert out[2]["steps_completed"] == 1 and len(out[2]["step_ts"]) == 1
    # same-tick step-2 event does NOT count (strictly-after semantics)
    df2 = spark.createDataFrame(
        [(1, 1, "view", _ts(0)), (2, 1, "click", _ts(0))],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    out2 = tp.funnel(df2, ["view", "click"]).collect()[0]
    assert out2["steps_completed"] == 1
    import pytest as _pytest
    with _pytest.raises(ValueError):
        tp.funnel(df, ["view"])


def test_cohort_retention_matrix(spark):
    rows = [
        (1, 10, _ts(0)),                  # user 10: day 0 cohort
        (2, 10, _ts(60 * 24)),            # active day 1
        (3, 10, _ts(60 * 24)),            # same day, counted once
        (4, 20, _ts(60 * 24)),            # user 20: day-1 cohort
        (5, 20, _ts(60 * 24 * 3)),        # active at offset 2
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {(r["cohort_day"], r["day_offset"]): r["n_users"]
           for r in tp.cohort_retention(df).collect()}
    assert got == {
        ("2024-01-01", 0): 1, ("2024-01-01", 1): 1,
        ("2024-01-02", 0): 1, ("2024-01-02", 2): 1,
    }


def test_volume_anomalies_flags_spike(spark):
    import datetime as dt

    # 30 steady hours of 10 events, then an hour with 100
    rows = []
    eid = 0
    for h in range(30):
        n = 100 if h == 29 else 10
        for j in range(n):
            rows.append((eid, 1, dt.datetime(2024, 1, 1) + dt.timedelta(hours=h, seconds=j)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {r["bucket_start"]: r for r in
           tp.volume_anomalies(df, trailing=24, k=4.0).collect()}
    assert len(out) == 30
    spike = out["2024-01-02 05:00:00"]
    # constant history -> std 0 -> z undefined, flagged via the
    # zero-variance equality path
    assert spike["n"] == 100 and spike["anomaly"] and spike["z"] is None
    # steady hours after warm-up: no anomaly; warm-up hours: NULL stats
    assert not out["2024-01-02 04:00:00"]["anomaly"]
    assert out["2024-01-01 05:00:00"]["trail_mean"] is None


def test_funnel_conversion_window(spark):
    rows = [
        (1, 1, "view", _ts(0)),
        (2, 1, "click", _ts(90)),     # 90m after view: outside a 60m window
        (3, 1, "click", _ts(30)),     # within 60m -> this one matches
        (4, 2, "view", _ts(0)),
        (5, 2, "click", _ts(120)),    # only click is outside the window
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = {r["user_id"]: r for r in
           tp.funnel(df, ["view", "click"], max_step_gap_minutes=60).collect()}
    assert out[1]["steps_completed"] == 2
    # the matched click is the 30m one (greedy within the window)
    assert out[1]["step_ts"][1] - out[1]["step_ts"][0] == 30 * 60 * 1_000_000
    assert out[2]["steps_completed"] == 1
    # without the window, user 2 completes both
    unbounded = {r["user_id"]: r["steps_completed"] for r in
                 tp.funnel(df, ["view", "click"]).collect()}
    assert unbounded[2] == 2


def test_funnel_window_reanchors_on_later_step1(spark):
    """ADVICE r03 #1 counterexample: view@0, view@100m, click@130m with a
    60m window — greedy anchored at view@0 finds nothing; the exact DP
    re-anchors on view@100m and completes both steps."""
    rows = [
        (1, 1, "view", _ts(0)),
        (2, 1, "view", _ts(100)),
        (3, 1, "click", _ts(130)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = tp.funnel(df, ["view", "click"], max_step_gap_minutes=60).collect()
    assert len(out) == 1
    r = out[0]
    assert r["steps_completed"] == 2
    assert r["step_ts"] == [_E + 100 * 60 * 1_000_000, _E + 130 * 60 * 1_000_000]


def test_funnel_window_three_step_reanchor_and_ties(spark):
    """Deeper DP coverage: the optimal 3-step chain must drop BOTH the
    earliest view and the earliest in-window click; a same-tick
    view/click pair must not chain off each other (strictly-after)."""
    rows = [
        (1, 1, "view", _ts(0)),        # dead end: its clicks can't reach purchase
        (2, 1, "click", _ts(10)),      # in window of view@0, but purchase@200 too far
        (3, 1, "view", _ts(120)),
        (4, 1, "click", _ts(170)),     # within 60m of view@120
        (5, 1, "purchase", _ts(200)),  # within 60m of click@170 only
        # user 2: view and click at the SAME tick — click can't follow
        (6, 2, "view", _ts(0)),
        (7, 2, "click", _ts(0)),
        (8, 2, "click", _ts(5)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = {r["user_id"]: r for r in
           tp.funnel(df, ["view", "click", "purchase"],
                     max_step_gap_minutes=60).collect()}
    assert out[1]["steps_completed"] == 3
    assert out[1]["step_ts"] == [_E + m * 60 * 1_000_000 for m in (120, 170, 200)]
    assert out[2]["steps_completed"] == 2
    assert out[2]["step_ts"] == [_E, _E + 5 * 60 * 1_000_000]


def test_funnel_window_second_latest_tick_rescues_tie(spark):
    """The c2 (second-latest end tick) slot matters exactly when a later
    step ties the latest step-1 tick: view@0, view@10, click@10 — the
    click ties view@10 (strictly-after fails) but follows view@0."""
    rows = [
        (1, 1, "view", _ts(0)),
        (2, 1, "view", _ts(10)),
        (3, 1, "click", _ts(10)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = tp.funnel(df, ["view", "click"], max_step_gap_minutes=60).collect()
    assert out[0]["steps_completed"] == 2
    assert out[0]["step_ts"] == [_E, _E + 10 * 60 * 1_000_000]


def test_asof_join_null_value_comes_from_latest_snapshot(spark):
    """ADVICE r03 #4: when the latest qualifying snapshot has a NULL
    value column, the event must report THAT snapshot's NULL (and its
    snap_ts) — not an older snapshot's stale value."""
    ev = spark.createDataFrame(
        [(1, "a", _ts(20))], "event_id long, event_type string, ts timestamp"
    )
    snaps = spark.createDataFrame(
        [("a", _ts(0), 1.0), ("a", _ts(10), None)],
        "event_type string, snap_ts timestamp, rate double",
    )
    out = tp.asof_join(ev, snaps, on="event_type").collect()[0]
    assert out["snap_ts"] == _ts(10)
    assert out["rate"] is None
