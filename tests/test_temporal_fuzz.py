"""Differential fuzz: temporal operators vs brute-force pure-Python
references on seeded random event frames (the keyword-layer fuzz
discipline applied to the newest code). Edge cases are salted in
deliberately: exact-gap ties, same-tick events, window-boundary hits.
"""

from __future__ import annotations

import datetime as dt
import random

from json_validator_spark.operators import temporal as tp

GAP_MIN = 30
GAP_US = GAP_MIN * 60 * 1_000_000
WIN_MIN = 60
WIN_US = WIN_MIN * 60 * 1_000_000
T0 = dt.datetime(2024, 1, 1)


def _gen_events(seed: int, n_users: int = 6, n_events: int = 120):
    rng = random.Random(seed)
    rows = []
    eid = 0
    for u in range(1, n_users + 1):
        t_us = rng.randrange(0, 10**9)
        for _ in range(rng.randrange(5, n_events // n_users + 5)):
            # jumps chosen to hit exact-gap and window boundaries often
            jump = rng.choice(
                [0, 1, rng.randrange(1, 10**7), GAP_US, GAP_US + 1,
                 WIN_US - 1, WIN_US, rng.randrange(1, 3 * GAP_US)]
            )
            t_us += jump
            rows.append((eid, u, T0 + dt.timedelta(microseconds=t_us)))
            eid += 1
    rng.shuffle(rows)
    return rows


def _ticks(t: dt.datetime) -> int:
    return (t - dt.datetime(1970, 1, 1)) // dt.timedelta(microseconds=1)


def _py_sessionize(rows):
    out = {}
    by_user: dict[int, list] = {}
    for eid, u, t in rows:
        by_user.setdefault(u, []).append((_ticks(t), eid))
    for u, evs in by_user.items():
        evs.sort()
        idx, last = 0, None
        for t_us, eid in evs:
            if last is None or t_us - last > GAP_US:
                idx += 1
            out[eid] = idx
            last = t_us
    return out


def _py_rate_violations(rows, max_events):
    by_user: dict[int, list] = {}
    for eid, u, t in rows:
        by_user.setdefault(u, []).append((_ticks(t), eid))
    bad = set()
    for evs in by_user.values():
        for t, eid in evs:
            n = sum(1 for s, _ in evs if t - WIN_US < s <= t)
            if n > max_events:
                bad.add(str(eid))
    return bad


def _py_funnel(rows, steps, types):
    by_user: dict[int, list] = {}
    for eid, u, t in rows:
        by_user.setdefault(u, []).append((_ticks(t), types[eid]))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        matched = []
        for t, ty in evs:
            want = steps[len(matched)] if len(matched) < len(steps) else None
            if ty == want and (not matched or t > matched[-1]):
                matched.append(t)
        if any(ty in steps for _, ty in evs):
            out[u] = len(matched)
    return out


def test_fuzz_sessionize_matches_python(spark):
    for seed in (11, 22, 33):
        rows = _gen_events(seed)
        df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
        got = {r["event_id"]: r["session_idx"]
               for r in tp.sessionize(df, gap_minutes=GAP_MIN).collect()}
        assert got == _py_sessionize(rows), f"seed {seed}"


def test_fuzz_rate_limit_matches_bruteforce(spark):
    for seed in (7, 42):
        rows = _gen_events(seed)
        df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
        got = {r["doc_id"] for r in
               tp.rate_limit_violations(df, max_events=3, window_minutes=WIN_MIN).collect()}
        assert got == _py_rate_violations(rows, 3), f"seed {seed}"


def test_fuzz_funnel_matches_greedy_python(spark):
    steps = ["a", "b", "c"]
    for seed in (5, 17):
        rows = _gen_events(seed)
        rng = random.Random(seed * 1000)
        types = {eid: rng.choice(["a", "b", "c", "x"]) for eid, _, _ in rows}
        data = [(eid, u, types[eid], t) for eid, u, t in rows]
        df = spark.createDataFrame(
            data, "event_id long, user_id long, event_type string, ts timestamp"
        )
        got = {r["user_id"]: r["steps_completed"]
               for r in tp.funnel(df, steps).collect()}
        assert got == _py_funnel(rows, steps, types), f"seed {seed}"


def _py_funnel_windowed(rows, steps, types, gap_us):
    """Exact brute-force DP: f[i][j] = steps[:j+1] can be matched with
    the step-(j+1) match ending at event i; predecessor must be any
    event strictly earlier in tick AND within gap_us. O(n²k) — the
    reference the two-chain fold must equal on every input."""
    by_user: dict[int, list] = {}
    for eid, u, t in rows:
        by_user.setdefault(u, []).append((_ticks(t), types[eid]))
    out = {}
    k = len(steps)
    for u, evs in by_user.items():
        evs.sort()
        n = len(evs)
        f = [[False] * k for _ in range(n)]
        best = 0
        for i, (t, ty) in enumerate(evs):
            for j in range(k):
                if ty != steps[j]:
                    continue
                if j == 0:
                    f[i][0] = True
                else:
                    f[i][j] = any(
                        f[i2][j - 1] and evs[i2][0] < t and t - evs[i2][0] <= gap_us
                        for i2 in range(n)
                    )
                if f[i][j]:
                    best = max(best, j + 1)
        if any(ty in steps for _, ty in evs):
            out[u] = best
    return out


def test_fuzz_funnel_windowed_matches_exact_dp(spark):
    """The windowed funnel's two-chain re-anchoring fold vs the exact
    O(n²k) DP, on boundary-salted random frames (exact-window ticks,
    same-tick events, multiple step-1 candidates where only a later
    one converts — the case greedy-earliest gets wrong). Also asserts
    the returned step_ts chain is a valid WITNESS: right types, right
    user, strictly increasing ticks, every gap within the window."""
    steps = ["a", "b", "c"]
    for seed in (7, 23, 41):
        rows = _gen_events(seed)
        rng = random.Random(seed * 1001)
        types = {eid: rng.choice(["a", "b", "c", "x"]) for eid, _, _ in rows}
        data = [(eid, u, types[eid], t) for eid, u, t in rows]
        df = spark.createDataFrame(
            data, "event_id long, user_id long, event_type string, ts timestamp"
        )
        res = tp.funnel(df, steps, max_step_gap_minutes=WIN_MIN).collect()
        got = {r["user_id"]: r["steps_completed"] for r in res}
        assert got == _py_funnel_windowed(rows, steps, types, WIN_US), f"seed {seed}"
        evset: dict[int, set] = {}
        for eid, u, t in rows:
            evset.setdefault(u, set()).add((_ticks(t), types[eid]))
        for r in res:
            chain = list(r["step_ts"])
            assert len(chain) == r["steps_completed"], f"seed {seed}"
            for i, tick in enumerate(chain):
                assert (tick, steps[i]) in evset[r["user_id"]], f"seed {seed}"
                if i:
                    assert 0 < tick - chain[i - 1] <= WIN_US, f"seed {seed}"


def test_fuzz_asof_join_matches_bruteforce(spark):
    rng = random.Random(99)
    ev = [(i, rng.choice(["a", "b", "c"]),
           T0 + dt.timedelta(microseconds=rng.randrange(0, 10**8)))
          for i in range(200)]
    # snapshots share some exact event timestamps (boundary inclusion)
    snaps = [(rng.choice(["a", "b"]),
              ev[rng.randrange(len(ev))][2] if rng.random() < 0.3
              else T0 + dt.timedelta(microseconds=rng.randrange(0, 10**8)),
              round(rng.uniform(0, 100), 2))
             for _ in range(40)]
    snaps = list({(k, t): (k, t, r) for k, t, r in snaps}.values())  # unique (key, ts)
    edf = spark.createDataFrame(ev, "event_id long, event_type string, ts timestamp")
    sdf = spark.createDataFrame(snaps, "event_type string, snap_ts timestamp, rate double")
    got = {r["event_id"]: (r["rate"], r["snap_ts"])
           for r in tp.asof_join(edf, sdf, on="event_type").collect()}
    for eid, k, t in ev:
        cands = [(st, rt) for sk, st, rt in snaps if sk == k and st <= t]
        exp = max(cands) if cands else None
        if exp is None:
            assert got[eid] == (None, None), eid
        else:
            assert got[eid] == (exp[1], exp[0]), eid


def test_fuzz_grouped_median_mad_matches_statistics(spark):
    import statistics

    from json_validator_spark.operators.set_checks import grouped_median_mad

    rng = random.Random(123)
    rows = [(rng.choice(["g1", "g2", "g3"]),
             round(rng.uniform(0, 50), 1))  # 1-dec grid -> heavy duplicates
            for _ in range(500)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: (r["med"], r["mad"], r["n"])
           for r in grouped_median_mad(df, "g", "v").collect()}
    for g in ("g1", "g2", "g3"):
        vals = [v for gg, v in rows if gg == g]
        med = round(statistics.median(vals), 6)
        mad = round(statistics.median(sorted(abs(v - med) for v in vals)), 6)
        assert got[g] == (med, mad, len(vals)), g
