"""Property tests: behavior operators vs brute-force Python definitions —
for ANY event stream (duplicate days, single-event users, sessions at the
gap boundary), retention/funnel/session-paths must equal the per-user
reference computation.
"""

from __future__ import annotations

import pytest

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from staticql_spark.operators.behavior import (
    funnel_report,
    retention_matrix,
    session_paths,
)

BASE = dt.datetime(2024, 1, 1)

events_strategy = st.lists(
    st.tuples(
        st.integers(1, 4),                 # user
        st.integers(0, 2000),              # minutes offset
        st.sampled_from(["a", "b", "c"]),  # type
    ),
    min_size=1,
    max_size=25,
)


def _df(spark, events):
    rows = [
        (u, i, et, BASE + dt.timedelta(minutes=m))
        for i, (u, m, et) in enumerate(events)
    ]
    return spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts timestamp"
    )


@given(events=events_strategy)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_retention_matches_bruteforce(spark, events):
    got = {
        (str(r["cohort_day"]), r["age"]): (
            r["n_active"],
            r["cohort_size"],
        )
        for r in retention_matrix(_df(spark, events), max_age_days=30).collect()
    }

    # brute force: distinct (user, day), cohort = min day per user
    active = {(u, (BASE + dt.timedelta(minutes=m)).date()) for u, m, _ in events}
    cohort = {}
    for u, d in active:
        cohort[u] = min(cohort.get(u, d), d)
    counts: dict = {}
    for u, d in active:
        age = (d - cohort[u]).days
        if age <= 30:
            counts[(str(cohort[u]), age)] = counts.get((str(cohort[u]), age), 0) + 1
    sizes = {}
    for (cd, age), n in counts.items():
        if age == 0:
            sizes[cd] = n
    want = {k: (n, sizes[k[0]]) for k, n in counts.items()}
    assert got == want


@given(events=events_strategy)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow  # soak-grade: excluded from the default gate (pytest.ini)
def test_funnel_matches_bruteforce(spark, events):
    steps = ["a", "b", "c"]
    got = {
        r["step_idx"]: r["n_users"]
        for r in funnel_report(_df(spark, events), steps).collect()
    }

    # brute force: per user, chained min-qualifying timestamps.  The
    # event_id tiebreak never matters for the COUNTS (>= on ts only).
    per_user: dict = {}
    for i, (u, m, et) in enumerate(events):
        per_user.setdefault(u, []).append((BASE + dt.timedelta(minutes=m), i, et))
    reached = {1: 0, 2: 0, 3: 0}
    for u, evs in per_user.items():
        t_prev = None
        for k, s in enumerate(steps, start=1):
            cand = [
                t for (t, _, et) in evs
                if et == s and (t_prev is None or t >= t_prev)
            ]
            if not cand:
                break
            t_prev = min(cand)
            reached[k] += 1
    assert got == reached


@given(events=events_strategy)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_session_paths_match_bruteforce(spark, events):
    got = {
        r["path"]: r["n_sessions"]
        for r in session_paths(
            _df(spark, events), gap_minutes=30, max_len=5, top_k=1000
        ).collect()
    }

    per_user: dict = {}
    for i, (u, m, et) in enumerate(events):
        per_user.setdefault(u, []).append((m, i, et))
    paths: dict = {}
    for u, evs in per_user.items():
        evs.sort()
        sessions: list = []
        for m, i, et in evs:
            if not sessions or m - sessions[-1][-1][0] > 30:
                sessions.append([])
            sessions[-1].append((m, i, et))
        for sess in sessions:
            path = ">".join(et for _, _, et in sess[:5])
            paths[path] = paths.get(path, 0) + 1
    assert got == paths


series_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),        # group
        st.integers(0, 12),       # period
        st.integers(-50, 50),     # value
    ),
    min_size=1,
    max_size=40,
)


@given(pts=series_strategy)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_theil_sen_property_matches_bruteforce(spark, pts):
    # for ANY series (duplicate periods collapse to the last-written?
    # no — the operator takes the series as given, so dedupe (g, t)
    # driver-side to honor the pre-aggregated input contract),
    # including singleton groups and all-tied values, the lower-median
    # pairwise slope must equal the direct definition
    from staticql_spark.operators.behavior import theil_sen

    byg = {}
    for g, t, v in pts:
        byg.setdefault(g, {})[t] = float(v)  # last write wins pre-agg
    rows = [(str(g), t, v) for g, tv in byg.items() for t, v in tv.items()]
    df = spark.createDataFrame(rows, "grp string, t long, v double")
    got = {
        r["grp"]: (r["n_periods"], r["n_pairs"], r["slope"])
        for r in theil_sen(df).collect()
    }
    for g, tv in byg.items():
        srt = sorted(tv.items())
        slopes = sorted(
            round((v2 - v1) / (t2 - t1), 9)
            for i, (t1, v1) in enumerate(srt)
            for (t2, v2) in srt[i + 1:]
        )
        m = len(slopes)
        med = slopes[(m + 1) // 2 - 1] if m else 0.0
        assert got[str(g)] == (len(srt), m, round(med, 6)), (g, slopes)


@given(pts=series_strategy)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_mann_kendall_property_matches_bruteforce(spark, pts):
    # ANY series — heavy ties, all-flat groups, n=1 groups (the r13
    # LEFT-join fix) — must equal the exact-integer S / tie-corrected
    # variance / continuity-corrected z definition
    import math
    from collections import Counter

    from staticql_spark.operators.behavior import mann_kendall

    byg = {}
    for g, t, v in pts:
        byg.setdefault(g, {})[t] = float(v)
    rows = [(str(g), t, v) for g, tv in byg.items() for t, v in tv.items()]
    df = spark.createDataFrame(rows, "grp string, t long, v double")
    got = {
        r["grp"]: (r["n_periods"], r["s_stat"], r["var_s"], r["z"], r["trend"])
        for r in mann_kendall(df).collect()
    }
    assert set(got) == {str(g) for g in byg}
    for g, tv in byg.items():
        vs = [v for _, v in sorted(tv.items())]
        n = len(vs)
        s = sum(
            (0 if vs[j] == vs[i] else (1 if vs[j] > vs[i] else -1))
            for i in range(n) for j in range(i + 1, n)
        )
        tie = sum(t * (t - 1) * (2 * t + 5) for t in Counter(vs).values())
        var = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
        if s > 0 and var > 0:
            z = (s - 1) / math.sqrt(var)
        elif s < 0 and var > 0:
            z = (s + 1) / math.sqrt(var)
        else:
            z = 0.0
        z = round(z, 6)
        trend = (
            "increasing" if z > 1.96
            else "decreasing" if z < -1.96
            else "no_trend"
        )
        assert got[str(g)] == (n, s, round(var, 6), z, trend), (g, vs)


@given(pts=series_strategy)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_cusum_property_matches_recursion(spark, pts):
    # ANY series — including those starting above their mean (the r13
    # P_0 = 0 baseline clamp) — must equal the textbook recursion
    import math

    from staticql_spark.operators.behavior import cusum_counts

    byg = {}
    for g, t, v in pts:
        byg.setdefault(g, {})[t] = int(v)
    rows = [(str(g), t, v) for g, tv in byg.items() for t, v in tv.items()]
    df = spark.createDataFrame(rows, "grp string, t long, v long")
    got = {
        (r["grp"], r["t"]): (r["cusum"], r["alarm"])
        for r in cusum_counts(df, k_sigma=2.0).collect()
    }
    for g, tv in byg.items():
        srt = sorted(tv.items())
        vs = [v for _, v in srt]
        n = len(vs)
        mean = sum(vs) / n
        var = sum(v * v for v in vs) / n - mean * mean
        sigma = math.sqrt(max(var, 0.0))
        s = 0.0
        for t, v in srt:
            s = max(0.0, s + (v - mean))
            cus, alarm = got[(str(g), t)]
            assert abs(cus - round(s, 6)) < 1e-6, (g, t, cus, s)
            assert alarm == (round(s, 6) > round(2.0 * sigma, 6)), (g, t)
