"""Temporal / event-sequence operators — sessionization, sliding-window
rate checks, and as-of joins over the event stream.

The reference validates each document in isolation; an event corpus adds
CROSS-ROW temporal invariants no per-document keyword can express: "a
session must not exceed N events", "no user may fire more than X events
in any sliding hour", "every event must be joined to the dimension
snapshot that was current at its timestamp". These are the batch
complements of ``streaming/validate_stream`` (which handles the same
semantics incrementally with watermarks).

Scale notes (each operator's docstring has specifics):
- every window is partitioned by a real key (user / join key) — never a
  global ``Window.orderBy``, which would single-task the corpus;
- the sliding rate check orders by microsecond ticks so the RANGE frame
  is exact, not truncated-to-seconds;
- the as-of join uses the union-window technique (one shuffle on the
  join key, no per-row probe) rather than an exploded range join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from json_validator_spark.functions.text import hash_long


def _us(c: Column) -> Column:
    """Microsecond ticks of a timestamp column. Parquet event times load
    as TIMESTAMP_NTZ, which ``unix_micros`` rejects; the session pins
    ``spark.sql.session.timeZone=UTC`` (session.py), so the cast
    reinterprets the naive value as UTC and the ticks equal DuckDB's
    ``epoch_us`` of the same naive timestamp."""
    return F.unix_micros(c.cast("timestamp"))


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign gap-based sessions: a new session starts when a user's
    inter-event gap exceeds ``gap_minutes``. Adds ``session_idx``
    (1-based per user) and ``session_id`` (``user#idx``).

    Shape: ONE hash exchange keyed on the user, then two stacked window
    functions over the same partitioning (lag → boundary flag →
    running sum), both pipelined in a single sort per partition. At
    10^12 events the only skew risk is a viral user; the boundary flag
    is computed per row so AQE's skew handling or an upstream per-user
    cap both compose. Microsecond ticks keep 29m59.999s < gap ≤ 30m
    exact (a seconds cast would round both to 1799/1800)."""
    w = Window.partitionBy(user_col).orderBy(_us(F.col(ts_col)))
    gap_us = gap_minutes * 60 * 1_000_000
    prev = F.lag(_us(F.col(ts_col))).over(w)
    new_session = (
        prev.isNull() | (_us(F.col(ts_col)) - prev > F.lit(gap_us))
    ).cast("long")
    return (
        events.withColumn("__new", new_session)
        .withColumn("session_idx", F.sum("__new").over(w))
        .drop("__new")
        .withColumn(
            "session_id",
            F.concat(
                F.col(user_col).cast("string"), F.lit("#"), F.col("session_idx")
            ),
        )
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session rollup ``(user, session_idx, session_id, n_events,
    start_ts, duration_s)``. The groupBy on (user, session_idx) needs
    ClusteredDistribution on those keys, and the window's existing
    ``hashpartitioning(user)`` already satisfies it (a subset-keyed
    partitioning co-locates every (user, session) group) — the whole
    rollup runs in ONE exchange total, asserted in tests. ``duration_s``
    is whole seconds (unix-truncated per endpoint, the DuckDB
    ``floor(epoch(·))`` contract)."""
    s = sessionize(events, user_col, ts_col, gap_minutes)
    return s.groupBy(user_col, "session_idx", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        (F.unix_timestamp(F.max(ts_col).cast("timestamp"))
         - F.unix_timestamp(F.min(ts_col).cast("timestamp"))).alias(
            "duration_s"
        ),
    )


def rate_limit_violations(
    events: DataFrame,
    max_events: int,
    window_minutes: int = 60,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    rule_id: str | None = None,
) -> DataFrame:
    """Sliding-window rate check: an event violates when its user fired
    more than ``max_events`` events in the window ``(t − window, t]``
    (inclusive of the event itself and of ts-ties, which a RANGE frame
    keeps as peers on both engines). One violation row per offending
    event, message carrying the exact in-window count.

    Shape: one hash exchange on the user + a RANGE-framed count over
    microsecond ticks — frame arithmetic on integers, no interval
    truncation; no self-join (the naive events×events range join is
    O(rate²) per user where this is O(log) sort + O(1) per row)."""
    rid = rule_id or f"rate.{user_col}.{window_minutes}m"
    us = _us(F.col(ts_col))
    frame = window_minutes * 60 * 1_000_000 - 1  # (t − window, t]
    w = (
        Window.partitionBy(user_col)
        .orderBy(us)
        .rangeBetween(-frame, Window.currentRow)
    )
    return (
        events.withColumn("__n", F.count(F.lit(1)).over(w))
        .filter(F.col("__n") > max_events)
        .select(
            F.col(id_col).cast("string").alias("doc_id"),
            F.lit(f"/{ts_col}").alias("span_path"),
            F.lit(rid).alias("rule_id"),
            F.lit("warning").alias("severity"),
            F.concat(
                F.col("__n").cast("string"),
                F.lit(f" events in {window_minutes}m (max {max_events})"),
            ).alias("message"),
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "snap_ts",
    value_cols: Sequence[str] = ("rate",),
) -> DataFrame:
    """As-of join: each left row picks up the value columns of the
    LATEST right row with the same key and ``right_ts <= left_ts``
    (DuckDB ``ASOF JOIN`` semantics; rows with no prior snapshot keep
    NULL values).

    Union-window technique: tag both sides, union, ONE hash exchange on
    the join key, per-partition sort on (ts, side) with snapshots
    ordered before events at equal timestamps, then a SINGLE
    ``last(struct, ignorenulls=True)`` carries each snapshot row — its
    timestamp and every value column together — forward to the events
    that follow it. Carrying one struct (not one ``last`` per column)
    guarantees all carried fields come from the SAME snapshot row even
    when a value column is NULL in the latest qualifying snapshot: the
    event then reports that snapshot's NULL, never an older snapshot's
    stale value (the DuckDB ``ASOF JOIN`` row-level contract). No range
    join (which Catalyst would plan as a broadcast-nested-loop or an
    exploded interval join), no per-row probe; cost is one shuffle +
    one sort of |left| + |right|. The key must be real (partitioning =
    the ``on`` column); a single global key would single-task the
    sort — use the broadcast-array variant in that case."""
    lcols = left.columns
    rdt = dict(right.dtypes)
    pack_type = (
        "struct<__snap:" + rdt[right_ts] + ","
        + ",".join(f"`{v}`:{rdt[v]}" for v in value_cols) + ">"
    )
    tagged_l = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        F.lit(None).cast(pack_type).alias("__pack"),
    )
    tagged_r = right.select(
        *[
            F.col(on) if c == on
            else F.col(right_ts).cast(dict(left.dtypes)[left_ts]).alias(left_ts)
            if c == left_ts
            else F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__side"),
        F.struct(
            F.col(right_ts).alias("__snap"),
            *[F.col(v).alias(v) for v in value_cols],
        ).cast(pack_type).alias("__pack"),
    )
    w = (
        Window.partitionBy(on)
        .orderBy(_us(F.col(left_ts)), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    snap = F.last("__pack", ignorenulls=True).over(w)
    carried = tagged_l.unionByName(tagged_r).select(
        *lcols,
        "__side",
        *[snap.getField(v).alias(v) for v in value_cols],
        snap.getField("__snap").alias("snap_ts"),
    )
    return carried.filter(F.col("__side") == 1).drop("__side")


def synth_rate_snapshots(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Deterministic snapshot dimension for the as-of join: for each
    observed (event_type, hour) cell, keep the ~1/3 of hours whose
    md5 selects them and derive a 2-decimal rate from the same digest —
    pure md5 arithmetic, reproducible verbatim in the DuckDB oracle
    (the ``frame_sample`` discipline). Snapshot times are irregular by
    construction, which is what makes the join genuinely as-of."""
    cell = events.select(
        "event_type",
        F.date_trunc("hour", F.col(ts_col)).alias("snap_ts"),
    ).distinct()
    key = F.concat(
        F.col("event_type"),
        F.lit("@"),
        F.date_format("snap_ts", "yyyy-MM-dd HH:00"),
    )
    h = hash_long(key)
    return cell.filter(h % 3 == 0).select(
        "event_type",
        "snap_ts",
        (F.round((h % 10000) / F.lit(100.0), 2)).alias("rate"),
    )


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_step_gap_minutes: int | None = None,
) -> DataFrame:
    """Ordered-funnel conversion: for each user, match the ``steps``
    sequence against their chronologically-ordered events — step *i+1*
    counts only strictly AFTER the matched step *i*. Returns ``(user,
    steps_completed, step_ts)`` where ``step_ts[i]`` is the microsecond
    tick of the matched step *i* (NULL-free array, length =
    steps_completed); users with no step-typed events at all are not
    emitted.

    Unwindowed form: greedy-earliest per step, which is optimal (taking
    the earliest possible event for each step can never complete fewer
    steps). With ``max_step_gap_minutes`` set, step *i+1* additionally
    must occur within that window of the matched step *i* — and greedy
    is NOT optimal there (matching step *i* earlier NARROWS the
    ``(t_i, t_i+gap]`` window for step *i+1*: view@0, view@100m,
    click@130m with a 60m window converts only via the LATER view), so
    the windowed form runs an exact DP instead: for every prefix length
    *j* it keeps the two latest-distinct-ending viable chains. Two
    suffice — a future event at tick *v* extends the chain whose end is
    the largest tick < *v* within the gap; that is either the latest
    chain (if it ends before *v*) or, when it ties *v* exactly, the
    second-latest (strictly earlier by construction). ``step_ts`` is
    the maximal-length chain with the LATEST end tick (deterministic:
    ties keep the first-recorded chain). ``steps_completed`` is the
    true maximum over all event subsequences in both forms.

    Shape: filter to step types (narrow, pushed to the scan) → ONE
    hash exchange on the user → per-user sorted event array → a single
    ``aggregate`` fold (state: matched-tick array, or the k×2 chain
    table for the windowed DP — O(k²) per event, k = funnel depth).
    The fold compares ticks, not array positions, so same-tick ties
    resolve identically to the SQL ``min(ts) > prev`` formulation
    regardless of sort tie order. Per-user array size = that user's
    step-typed event count — the same viral-user skew budget as
    ``sessionize`` (cap upstream if a key can exceed memory)."""
    k = len(steps)
    if k < 2:
        raise ValueError("a funnel needs at least two steps")
    steps_lit = F.array(*[F.lit(s) for s in steps])
    seq = (
        events.filter(F.col(type_col).isin(list(steps)))
        .groupBy(F.col(user_col).alias("user_id"))
        .agg(
            F.sort_array(
                F.collect_list(F.struct(_us(F.col(ts_col)).alias("us"),
                                        F.col(type_col).alias("t")))
            ).alias("__seq")
        )
    )
    gap_us = (
        max_step_gap_minutes * 60 * 1_000_000
        if max_step_gap_minutes is not None
        else None
    )
    if gap_us is None:
        # greedy-earliest fold (optimal without a window); state: array
        # of matched ticks. F.get returns NULL (not an ANSI error) past
        # the end, so the strict-after check coalesces to true for the
        # first step.
        def _merge(acc, x):
            prev = F.get(acc, F.size(acc) - 1)
            after_prev = F.coalesce(x["us"] > prev, F.lit(True))
            matches = (F.size(acc) < k) & (
                x["t"] == F.element_at(steps_lit, F.size(acc) + 1)
            ) & after_prev
            return F.when(matches, F.concat(acc, F.array(x["us"]))).otherwise(acc)

        state = F.aggregate(
            F.col("__seq"), F.array().cast("array<bigint>"), _merge
        )
        return seq.select(
            "user_id",
            F.size(state).alias("steps_completed"),
            state.alias("step_ts"),
        )

    # windowed form — exact DP with re-anchoring. State: for each
    # prefix length j (1..k) the chain of matched ticks whose END tick
    # is the latest achievable (c1) plus the latest chain ending
    # STRICTLY earlier (c2). Each event updates every j from the
    # PRE-event state (one transform over the state array), so a step
    # never matches itself as its own predecessor.
    empty = F.array().cast("array<bigint>")
    init = F.transform(
        F.sequence(F.lit(1), F.lit(k)),
        lambda j: F.struct(
            F.lit(None).cast("array<bigint>").alias("c1"),
            F.lit(None).cast("array<bigint>").alias("c2"),
        ),
    )

    def _merge(acc, x):
        u, t = x["us"], x["t"]

        def upd(st, i0):
            j = i0 + F.lit(1)  # 1-based step index
            type_ok = t == F.element_at(steps_lit, j.cast("int"))

            def viable(chain):
                lastu = F.element_at(chain, -1)
                return (
                    chain.isNotNull()
                    & (lastu < u)
                    & (u - lastu <= F.lit(gap_us))
                )

            # lazy CASE keeps element_at(acc, 0) from ever evaluating
            prev = F.when(
                j > 1, F.element_at(acc, (j - 1).cast("int"))
            )
            pred = F.when(j == 1, empty).otherwise(
                F.when(viable(prev["c1"]), prev["c1"]).otherwise(
                    F.when(viable(prev["c2"]), prev["c2"])
                )
            )
            cand = F.concat(pred, F.array(u))  # NULL pred → NULL cand
            old1 = st["c1"]
            last1 = F.element_at(old1, -1)
            take = type_ok & cand.isNotNull()
            # equal end ticks are interchangeable for the future — on a
            # tie keep the incumbent (deterministic representative)
            promote = take & (old1.isNull() | (u > last1))
            return F.struct(
                F.when(promote, cand).otherwise(old1).alias("c1"),
                F.when(promote & old1.isNotNull(), old1)
                .otherwise(st["c2"])
                .alias("c2"),
            )

        return F.transform(acc, upd)

    state = F.aggregate(F.col("__seq"), init, _merge)
    # achievable prefixes are contiguous (any length-j chain contains a
    # length-(j-1) prefix chain), so the non-null c1 entries form a
    # prefix of the state array
    done = F.filter(state, lambda st: st["c1"].isNotNull())
    return seq.select(
        "user_id",
        F.size(done).alias("steps_completed"),
        F.coalesce(
            F.when(F.size(done) > 0, F.element_at(done, -1)["c1"]), empty
        ).alias("step_ts"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention matrix at day granularity: users are cohorted
    by their FIRST active day; each (cohort_day, day_offset) cell
    counts the cohort's users active that many days later (offset 0 =
    the cohort's size). ``(cohort_day, day_offset, n_users)``.

    Shape: first-seen groupBy on the user (one exchange) feeds a
    user-keyed join against the distinct (user, day) activity set —
    both sides hash on the user, co-partitioned; the final rollup keys
    on the tiny (cohort, offset) grid. No window, no self-join over
    events. At 10^12 events the activity distinct is the dominant
    shuffle and it is exactly the user×day footprint, already
    partial-aggregated map-side."""
    day = F.date_trunc("day", F.col(ts_col))
    first = (
        events.groupBy(F.col(user_col).alias("user_id"))
        .agg(F.min(day).alias("cohort_day"))
    )
    active = events.select(
        F.col(user_col).alias("user_id"), day.alias("day")
    ).distinct()
    return (
        active.join(first, "user_id")
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def volume_anomalies(
    events: DataFrame,
    ts_col: str = "ts",
    bucket: str = "hour",
    trailing: int = 24,
    k: float = 4.0,
) -> DataFrame:
    """Ingest-volume anomaly detection: per time bucket, compare the
    event count against the TRAILING ``trailing``-bucket mean/stddev
    and flag buckets whose |z| exceeds ``k`` — the "did a producer die
    / double-fire" check that per-row validation cannot see. One row
    per bucket: ``(bucket_start, n, trail_mean, trail_std, z, anomaly)``;
    the first ``trailing`` buckets (incomplete history) emit NULL
    z / false anomaly rather than unstable early flags.

    Shape: the corpus collapses to bucket counts in one partial-agg
    groupBy; the trailing window runs over the BUCKET frame (hours →
    8,760 rows/year — driver-scale), so the unpartitioned window is on
    a tiny frame, never the corpus. z is rounded to 4 on the rounded-6
    mean/std contract values (cross-engine stddev parity discipline)."""
    from pyspark.sql import Window as W

    counts = (
        events.groupBy(F.date_trunc(bucket, F.col(ts_col)).alias("bucket_start"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.orderBy("bucket_start").rowsBetween(-trailing, -1)
    mean = F.round(F.avg("n").over(w), 6)
    std = F.round(F.stddev_samp("n").over(w), 6)
    cnt = F.count("n").over(w)
    withstats = counts.select(
        F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
        "n",
        F.when(cnt >= trailing, mean).alias("trail_mean"),
        F.when(cnt >= trailing, std).alias("trail_std"),
    )
    z = F.when(
        F.col("trail_std") > 0.0,
        F.round((F.col("n") - F.col("trail_mean")) / F.col("trail_std"), 4),
    )
    # zero-variance history (perfectly steady producer): ANY deviation
    # is anomalous, but z is undefined — flag via the equality path
    flat_break = (
        (F.col("trail_std") == 0.0) & (F.col("n") != F.col("trail_mean"))
    )
    return withstats.select(
        "bucket_start", "n", "trail_mean", "trail_std",
        z.alias("z"),
        (F.coalesce(F.abs(z) > k, F.lit(False)) | F.coalesce(flat_break, F.lit(False))).alias("anomaly"),
    )
