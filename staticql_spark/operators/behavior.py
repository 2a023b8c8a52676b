"""User-behavior analytics over event logs — cohort retention and
ordered funnels.  (The first-order transition matrix lives as the
`events_markov` entry composition and its stateful streaming twin
`streaming.stream_event_transitions` — not duplicated here.)

The product-analytics layer a training-data pipeline's upstream event
store answers questions from (parity surface: the reference's events
fixtures exercise grouped aggregation + ordering, reference
src/query/*.ts; these operators extend that family the way a warehouse
would).  Every operator reduces the raw event stream to a per-user or
per-pair frame FIRST — group sizes bound the shuffle, raw events never
cross the wire more than once — and every output is deterministic
(explicit tiebreaks, 6-dp rounding before any threshold/ordering) so
the DuckDB oracles hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def retention_matrix(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_age_days: int = 30,
) -> DataFrame:
    """Cohort retention triangle: users grouped by FIRST-active day, one
    row per (cohort_day, age) with the count still active ``age`` days
    later and the retention rate vs the cohort's size.

    Classic growth-analytics shape: cohort_day = min(active day) per
    user; a user contributes one row per distinct active day, aged
    relative to their cohort.  Age 0 covers every cohort member by
    construction (everyone is active on their first day), so the cohort
    size is the age-0 count — computed with a window over the output
    frame, never a second scan.

    Scale: the raw stream reduces to the distinct (user, day) frame in
    one map-side-combined aggregate (bounded by users x days, ~1000x
    smaller than events); the cohort day is a whole-partition window MIN
    over that frame — no cohort aggregate, no join back, no broadcast
    risk (the repo-wide derived-column rule: a window beats
    owner-aggregate+join because the derivation computes once, not once
    per join side); output is |cohorts| x |ages| rows.
    """
    active = (
        df.select(
            F.col(user_col).alias("u"), F.to_date(F.col(ts_col)).alias("d")
        )
        .filter(F.col("u").isNotNull() & F.col("d").isNotNull())
        .distinct()
    )
    cohort_day = F.min("d").over(W.partitionBy("u"))
    aged = active.select(
        cohort_day.alias("cohort_day"),
        F.datediff(F.col("d"), cohort_day).alias("age"),
    ).filter(F.col("age") <= max_age_days)
    counts = aged.groupBy("cohort_day", "age").agg(
        F.count("*").cast("long").alias("n_active")
    )
    size = F.max(F.when(F.col("age") == 0, F.col("n_active"))).over(
        W.partitionBy("cohort_day")
    )
    return counts.select(
        "cohort_day",
        "age",
        "n_active",
        size.cast("long").alias("cohort_size"),
        F.round(F.col("n_active") / size, 6).alias("retention"),
    )



def funnel_report(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_gap_minutes: int | None = None,
) -> DataFrame:
    """Ordered funnel: per step, how many users reached it IN ORDER —
    step k counts users with an event of type ``steps[k]`` at or after
    their earliest qualifying step-(k-1) time (the same >= convention at
    every stage, mirrored in the oracle).  Returns one row per step:
    (step_idx, step, n_users, conv_from_prev, conv_from_first), ratios
    rounded to 6.  ``max_gap_minutes`` adds the conversion-window
    constraint real funnels use: step k must land within the gap of the
    step-(k-1) time (both bounds inclusive, mirrored in the oracle) —
    note the windowed chain is still greedy on the earliest qualifying
    time, so like all windowed funnels it can miss a conversion a later
    anchor would have caught (the industry-standard trade).

    The sequential constraint is computed as a chain of per-user MIN
    timestamps: t_k = min ts of step-k events with ts >= t_{k-1} — the
    time_to_convert idiom extended to k steps.  Each stage is one
    filtered events frame joined to the (user, t_{k-1}) frame on the
    SAME user key (Catalyst reuses the hash partitioning across stages,
    and each stage's frame only shrinks), never a per-user event-array
    collect — so a bot user with 10^6 events costs aggregate time, not
    executor memory.
    """
    stage = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t"))
    )
    reached = stage.select(
        F.lit(1).alias("step_idx"), F.col(user_col).alias("u")
    )
    for i, s in enumerate(steps[1:], start=2):
        within = F.col(ts_col) >= F.col("t")
        if max_gap_minutes is not None:
            within = within & (
                F.col(ts_col)
                <= F.col("t") + F.expr(f"INTERVAL {int(max_gap_minutes)} MINUTES")
            )
        stage = (
            df.filter(F.col(type_col) == s)
            .join(stage, user_col)
            .filter(within)
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("t"))
        )
        reached = reached.unionByName(
            stage.select(F.lit(i).alias("step_idx"), F.col(user_col).alias("u"))
        )
    counts = reached.groupBy("step_idx").agg(
        F.count("*").cast("long").alias("n_users")
    )
    # every step keeps a row (an empty stage reports 0, not a hole) and
    # the ratios run on the |steps|-row frame: windows, not rescans
    all_steps = df.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], "step_idx INT, step STRING"
    )
    full = all_steps.join(counts, "step_idx", "left").select(
        "step_idx", "step", F.coalesce("n_users", F.lit(0)).cast("long").alias("n_users")
    )
    prev = F.lag("n_users").over(W.orderBy("step_idx"))
    first = F.first("n_users").over(
        W.orderBy("step_idx").rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return full.select(
        "step_idx",
        "step",
        "n_users",
        F.when(prev > 0, F.round(F.col("n_users") / prev, 6)).alias(
            "conv_from_prev"
        ),
        F.when(first > 0, F.round(F.col("n_users") / first, 6)).alias(
            "conv_from_first"
        ),
    )


def session_paths(
    df: DataFrame,
    gap_minutes: int = 30,
    max_len: int = 5,
    top_k: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """Top-k session paths: gap-sessionize each user's stream, take each
    session's first ``max_len`` event types in (ts, order) order as a
    ``a>b>c`` path string, count sessions per path — the "how do users
    actually move" report next to the per-edge transition matrix
    (events_markov), which can't see multi-step routes.

    Session boundaries are the lag-gap rule (new session when the gap to
    the previous event exceeds ``gap_minutes``), computed in exact
    integer microseconds so both engines cut identically.  The per-
    session event collect is bounded by the session itself (gap-bounded,
    inherently short) TIMES nothing — only (ts, order, type) triples are
    collected, and the path truncates at ``max_len``.  Ranking is
    (count desc, path asc) — deterministic at the top_k boundary.

    Scale: one user-key window pass (two window functions share the
    frame), one (user, session) aggregate, one path count — all
    map-side combined; output is ``top_k`` rows.
    """
    from .asof import epoch_us

    w = W.partitionBy(user_col).orderBy(ts_col, order_col)
    us = epoch_us(df, ts_col)
    gap_us = gap_minutes * 60 * 1_000_000
    seq = df.select(
        F.col(user_col).alias("u"),
        us.alias("e"),
        F.col(order_col).alias("o"),
        F.col(type_col).alias("et"),
    )
    w = W.partitionBy("u").orderBy("e", "o")
    seq = seq.withColumn(
        "ns",
        F.when(
            F.lag("e").over(w).isNull()
            | ((F.col("e") - F.lag("e").over(w)) > gap_us),
            1,
        ).otherwise(0),
    ).withColumn(
        "sid", F.sum("ns").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    )
    sessions = seq.groupBy("u", "sid").agg(
        F.sort_array(F.collect_list(F.struct("e", "o", "et"))).alias("evs")
    )
    path = F.concat_ws(
        ">", F.transform(F.slice(F.col("evs"), 1, max_len), lambda s: s["et"])
    )
    counts = sessions.select(path.alias("path")).groupBy("path").agg(
        F.count("*").cast("long").alias("n_sessions")
    )
    return counts.orderBy(F.desc("n_sessions"), F.asc("path")).limit(top_k)
