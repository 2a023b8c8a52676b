"""Single-pass table profiling — the data-quality audit step every
pipeline run should emit before training jobs consume a snapshot.

One aggregation computes null count, exact distinct count, and min/max
for every requested column; the wide 1-row result unpivots to one row
per column.  Exact `count(distinct)` over k columns makes Catalyst plan
an Expand (k passes' worth of rows into one shuffle) — the documented
price of exactness; pass ``approx=True`` to swap in HLL
(`approx_count_distinct`) for a single-pass profile at 100 TB where a
±2 % ndv is fine (the approx variant has no cross-engine oracle, so the
driver query keeps the exact form).

Min/max are computed on the NATIVE type and cast to string afterwards —
casting first would compare "10" < "9" lexicographically.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def histogram(
    df: DataFrame, col: str, lo: float, hi: float, nbins: int
) -> DataFrame:
    """Exact equi-width histogram of a numeric column over [lo, hi].

    bin = floor(((x - lo) / (hi - lo)) * nbins), with x == hi folded into
    the top bin and out-of-range rows dropped.  The bin expression is
    written in ONE fixed operation order so any IEEE-double engine
    reproduces the boundary bins bit-for-bit (no rounding fudge needed).
    One map-side-combined groupBy over at most ``nbins`` groups.
    Returns (bin, bin_lo, bin_hi, n) for non-empty bins.
    """
    x = F.col(col).cast("double")
    span = float(hi - lo)
    b = F.least(
        F.floor((x - F.lit(float(lo))) / F.lit(span) * F.lit(float(nbins))).cast(
            "long"
        ),
        F.lit(nbins - 1),
    )
    w = span / nbins
    return (
        df.filter((x >= lo) & (x <= hi))
        .groupBy(b.alias("bin"))
        .agg(F.count("*").alias("n"))
        .select(
            "bin",
            F.round(F.lit(float(lo)) + F.col("bin") * F.lit(w), 6).alias("bin_lo"),
            F.round(F.lit(float(lo)) + (F.col("bin") + 1) * F.lit(w), 6).alias(
                "bin_hi"
            ),
            "n",
        )
    )


def table_profile(
    df: DataFrame, cols: Sequence[str], approx: bool = False
) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct, min_str, max_str) per column.

    Two single-row aggregates, crossed (r13 optimization): min/max over a
    STRING column cannot live in a HashAggregate buffer (non-fixed-width),
    so putting them in the SAME aggregate as the exact countDistincts
    forced the whole Expand (|cols|+1 copies of every row) through
    SortAggregate — a full sort of the expanded frame on the 6-part
    distinct key (measured 2.6-3.4 s at sf0.1; the sort is the cost, not
    the Expand).  Split, the nulls/min/max pass is a KEYLESS fold (no
    grouping keys -> no required ordering -> no sort, one scan), and the
    ndv pass's Expand aggregates hash-based (its buffers are only
    counts).  Values are byte-identical: the same aggregate functions run
    over the same rows, only in two jobs whose 1-row outputs cross-join.
    """
    ndv = F.approx_count_distinct if approx else F.countDistinct
    base_aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        base_aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__{c}__nulls"),
            F.min(F.col(c)).cast("string").alias(f"__{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"__{c}__max"),
        ]
    ndv_aggs = [ndv(F.col(c)).alias(f"__{c}__ndv") for c in cols]
    wide = df.agg(*base_aggs).crossJoin(df.agg(*ndv_aggs))
    stack_args = ", ".join(
        f"'{c}', __{c}__nulls, __{c}__ndv, __{c}__min, __{c}__max" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_nulls, n_distinct, min_str, max_str)"
        ),
        F.col("__rows").alias("n_rows"),
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_str", "max_str")


def corr_matrix(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Pairwise Pearson correlations of numeric columns from ONE pass.

    All k·(k+1)/2 moments (sums, squares, cross-products) come out of a
    single map-side-combined aggregation — never a pass per pair — and the
    correlations are assembled arithmetically from the 1-row moment frame.
    Values rounded to 6 (cross-engine float-sum stability).
    Returns (col_a, col_b, corr) for a < b.
    """
    aggs = [F.count(F.lit(1)).cast("double").alias("__n")]
    for c in cols:
        x = F.col(c).cast("double")
        aggs += [F.sum(x).alias(f"__s_{c}"), F.sum(x * x).alias(f"__ss_{c}")]
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            aggs.append(
                F.sum(F.col(a).cast("double") * F.col(b).cast("double")).alias(
                    f"__sp_{a}_{b}"
                )
            )
    wide = df.agg(*aggs)
    pairs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            n, sa, sb = F.col("__n"), F.col(f"__s_{a}"), F.col(f"__s_{b}")
            cov = F.col(f"__sp_{a}_{b}") - sa * sb / n
            va = F.col(f"__ss_{a}") - sa * sa / n
            vb = F.col(f"__ss_{b}") - sb * sb / n
            pairs.append(
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    F.round(cov / F.sqrt(va * vb), 6).alias("corr"),
                )
            )
    return wide.select(F.explode(F.array(*pairs)).alias("p")).select("p.*")


def exact_quantiles(
    df: DataFrame,
    col: str,
    qs: Sequence[float],
    num_buckets: int = 1024,
) -> DataFrame:
    """EXACT distributed quantiles without a global sort or a driver
    collect — the scale-safe alternative to SQL ``percentile`` (which
    buffers every group value in memory) and the exactness ``
    percentile_approx`` gives up.

    Definition shared with the oracle: quantile q = the element at rank
    ceil(q * n) (1-based) of the ascending sort — so both engines agree
    without depending on either's built-in quantile interpolation mode.

    Two passes, classic count-bucket scheme:
    1. one aggregate for (min, max, n); one aggregate for per-bucket
       counts over ``num_buckets`` equal-width buckets (tiny frame);
       a running sum over that frame locates, for each q, the bucket
       containing the target rank and the rank offset within it.
    2. rows of ONLY the target buckets rank locally (window per bucket,
       expected n/num_buckets rows per partition) and the row whose
       local rank matches is the answer.

    Returns (q, value, rank, n).  NULLs are excluded (ranks are over
    non-null values).  Raise ``num_buckets`` to shrink pass-2 partitions
    at extreme scale; a skewed-to-one-value column degrades to a single
    hot bucket — exactly the distribution where any exact quantile needs
    to touch those rows.
    """
    vals = df.select(F.col(col).cast("double").alias("x")).filter(
        F.col("x").isNotNull()
    )
    # vals feeds three passes (min/max/n stats, bucket counts, the
    # target-bucket rank scan) but is deliberately NOT pinned here: AQE's
    # ReusedExchange already shares the repeated subtree for plain-scan
    # sources, and an r13 A/B measured a cache pin NET-NEGATIVE for
    # derived-frame callers (events_time_to_convert 1.0 -> 1.7 s).
    # Callers whose source re-evaluation is genuinely expensive pin it
    # themselves (robust_outlier_summary).
    stats = vals.agg(
        F.min("x").alias("mn"), F.max("x").alias("mx"), F.count("*").alias("n")
    )
    # bucket width; degenerate all-equal column -> width 0 -> bucket 0
    b = vals.crossJoin(F.broadcast(stats)).select(
        "x",
        F.when(
            F.col("mx") > F.col("mn"),
            F.least(
                F.floor(
                    (F.col("x") - F.col("mn"))
                    / ((F.col("mx") - F.col("mn")) / F.lit(num_buckets))
                ).cast("int"),
                F.lit(num_buckets - 1),
            ),
        )
        .otherwise(F.lit(0))
        .alias("bkt"),
    )
    counts = b.groupBy("bkt").agg(F.count("*").alias("cnt"))
    wcum = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    cum = counts.withColumn("below", F.coalesce(F.sum("cnt").over(wcum), F.lit(0)))
    targets = (
        stats.select("n")
        .crossJoin(
            F.broadcast(
                df.sparkSession.createDataFrame(
                    [(float(q),) for q in qs], ["q"]
                )
            )
        )
        .select(
            "q",
            F.col("n").cast("long").alias("n_total"),
            F.greatest(F.ceil(F.col("q") * F.col("n")), F.lit(1)).alias("rank"),
        )
    )
    # locate each q's bucket: the first bucket whose cumulative count
    # reaches the rank (tiny |buckets| x |qs| join)
    located = (
        targets.join(
            F.broadcast(cum),
            (F.col("rank") > F.col("below"))
            & (F.col("rank") <= F.col("below") + F.col("cnt")),
        )
        .select(
            "q", "n_total", "rank", "bkt",
            (F.col("rank") - F.col("below")).alias("lrank"),
        )
    )
    wloc = Window.partitionBy("bkt").orderBy("x")
    in_bucket = (
        b.join(F.broadcast(located.select("bkt").distinct()), "bkt")
        .withColumn("lr", F.row_number().over(wloc))
    )
    return (
        in_bucket.join(
            located, (in_bucket.bkt == located.bkt) & (F.col("lr") == F.col("lrank"))
        )
        .select("q", F.col("x").alias("value"), "rank", F.col("n_total").alias("n"))
    )


def fd_discovery(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Functional-dependency discovery over a column set (the pairwise
    core of profiling systems like Metanome): A -> B holds iff every A
    value maps to exactly one B value, i.e. countDistinct(A) ==
    countDistinct(A, B).  Emits one row per ordered pair:
    (determinant, dependent, n_det, n_pairs, violations, holds).

    Scale: one distinct-aggregate per pair over a two-column projection —
    |cols|² passes but each reads only two columns off the scan (column
    pruning does the heavy lifting); for wide audits run the pairs you
    care about, not the cross product.
    """
    out = None
    for a in cols:
        for bcol in cols:
            if a == bcol:
                continue
            pair = df.agg(
                F.count_distinct(F.col(a)).alias("n_det"),
                F.count_distinct(F.col(a), F.col(bcol)).alias("n_pairs"),
            ).select(
                F.lit(a).alias("determinant"),
                F.lit(bcol).alias("dependent"),
                F.col("n_det").cast("long").alias("n_det"),
                F.col("n_pairs").cast("long").alias("n_pairs"),
                (F.col("n_pairs") - F.col("n_det")).cast("long").alias("violations"),
                (F.col("n_pairs") == F.col("n_det")).alias("holds"),
            )
            out = pair if out is None else out.unionByName(pair)
    return out


def ri_report(
    relationships: Sequence[tuple[str, DataFrame, str, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit: for each (name, child, fk, pk_name,
    parent, pk) relationship, the orphan count (child rows whose fk has
    no parent; NULL fks excluded — SQL RI semantics) and rate.

    One row per relationship: (relationship, n_child, n_orphans,
    orphan_rate).  Scale: each check is a left-anti join on the key —
    broadcast when the parent's key projection is small, shuffle
    otherwise (AQE's call); the child streams through one projection.
    """
    out = None
    for name, child, fk, _pk_name, parent, pk in relationships:
        c = child.select(F.col(fk).alias("__fk")).filter(F.col("__fk").isNotNull())
        p = parent.select(F.col(pk).alias("__fk")).distinct()
        orphans = c.join(p, "__fk", "left_anti")
        row = (
            c.agg(F.count("*").alias("n_child"))
            .crossJoin(orphans.agg(F.count("*").alias("n_orphans")))
            .select(
                F.lit(name).alias("relationship"),
                F.col("n_child").cast("long").alias("n_child"),
                F.col("n_orphans").cast("long").alias("n_orphans"),
                F.round(F.col("n_orphans") / F.col("n_child"), 6).alias("orphan_rate"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def grouped_exact_quantiles(
    df: DataFrame,
    col: str,
    group_col: str,
    qs: Sequence[float],
    num_buckets: int = 256,
) -> DataFrame:
    """Per-group EXACT quantiles with the same two-phase counting scheme
    as :func:`exact_quantiles` — and the same definition (value at rank
    ceil(q*n), 1-based ascending within the group), so grouped and
    global answers compose.

    Per group: (min, max, n) and bucket counts from ONE pass over the
    data (group-keyed aggregates, map-side combined); rank location on
    the |groups x buckets| frame; pass 2 ranks rows of only the target
    (group, bucket) pairs.  No per-group value buffering (SQL
    ``percentile``'s hazard) and no global sort; window partitions are
    (group, bucket) — group size over ``num_buckets``, never a whole
    group.

    Returns (group, q, value, rank, n).
    """
    vals = df.select(
        F.col(group_col).alias("g"), F.col(col).cast("double").alias("x")
    ).filter(F.col("x").isNotNull())
    stats = vals.groupBy("g").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx"), F.count("*").alias("n")
    )
    b = vals.join(stats, "g").select(
        "g",
        "x",
        F.when(
            F.col("mx") > F.col("mn"),
            F.least(
                F.floor(
                    (F.col("x") - F.col("mn"))
                    / ((F.col("mx") - F.col("mn")) / F.lit(num_buckets))
                ).cast("int"),
                F.lit(num_buckets - 1),
            ),
        )
        .otherwise(F.lit(0))
        .alias("bkt"),
    )
    counts = b.groupBy("g", "bkt").agg(F.count("*").alias("cnt"))
    wcum = (
        Window.partitionBy("g").orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = counts.withColumn("below", F.coalesce(F.sum("cnt").over(wcum), F.lit(0)))
    qdf = df.sparkSession.createDataFrame([(float(q),) for q in qs], ["q"])
    targets = (
        stats.select("g", "n")
        .crossJoin(F.broadcast(qdf))
        .select(
            "g",
            "q",
            F.col("n").cast("long").alias("n_total"),
            F.greatest(F.ceil(F.col("q") * F.col("n")), F.lit(1)).alias("rank"),
        )
    )
    located = targets.join(
        F.broadcast(cum),
        (targets.g == cum.g)
        & (F.col("rank") > F.col("below"))
        & (F.col("rank") <= F.col("below") + F.col("cnt")),
    ).select(
        targets.g.alias("g"),
        "q",
        "n_total",
        "rank",
        "bkt",
        (F.col("rank") - F.col("below")).alias("lrank"),
    )
    wloc = Window.partitionBy("g", "bkt").orderBy("x")
    in_bucket = b.join(
        F.broadcast(located.select("g", "bkt").distinct()), ["g", "bkt"]
    ).withColumn("lr", F.row_number().over(wloc))
    return (
        in_bucket.alias("ib")
        .join(
            located.alias("lc"),
            (F.col("ib.g") == F.col("lc.g"))
            & (F.col("ib.bkt") == F.col("lc.bkt"))
            & (F.col("ib.lr") == F.col("lc.lrank")),
        )
        .select(
            F.col("ib.g").alias(group_col),
            "q",
            F.col("x").alias("value"),
            F.col("lc.rank").alias("rank"),
            F.col("lc.n_total").alias("n"),
        )
    )


def robust_outlier_summary(
    df: DataFrame, col: str, z_thresh: float = 3.5, num_buckets: int = 1024
) -> DataFrame:
    """Median/MAD robust outlier report for a numeric column — the
    outlier detector that, unlike mean/std (table_profile), is not
    dragged by the outliers it is looking for.  Median and MAD are both
    EXACT, via two :func:`exact_quantiles` passes (the shared
    ceil(q·n)-rank definition), so the report is engine-portable with no
    quantile-interpolation ambiguity; robust z = |x - med| / (1.4826 ·
    MAD), the normal-consistency scaling.

    One row: (n, median, mad, n_outliers, max_robust_z) — rounded 6.
    A zero-MAD column (>= half the values identical) reports 0 outliers
    by convention (robust z undefined).
    """
    from . import _persist_scoped

    # one pinned pass over the source; the median pass, the deviation
    # frame, and (via devs) the MAD pass all derive from this cache —
    # unpinned, exact_quantiles(devs) re-evaluated devs per internal
    # pass and each evaluation re-ran the ENTIRE median computation
    # (r13: 162 parquet scans in the before plan, 2.4 s at sf0.1).
    vals = _persist_scoped(
        df.select(F.col(col).cast("double").alias("x")).filter(F.col("x").isNotNull())
    )
    med = (
        exact_quantiles(vals, "x", [0.5], num_buckets)
        .select(F.col("value").alias("__med"), F.col("n").alias("__n"))
    )
    devs = _persist_scoped(
        vals.crossJoin(F.broadcast(med)).select(
            (F.abs(F.col("x") - F.col("__med"))).alias("dev"), "x", "__med", "__n"
        )
    )
    mad = (
        exact_quantiles(devs, "dev", [0.5], num_buckets)
        .select(F.col("value").alias("__mad"))
    )
    scored = devs.crossJoin(F.broadcast(mad)).select(
        "x",
        "__med",
        "__mad",
        "__n",
        F.when(
            F.col("__mad") > 0, F.col("dev") / (F.lit(1.4826) * F.col("__mad"))
        ).alias("rz"),
    )
    return scored.agg(
        F.first("__n").alias("n"),
        F.round(F.first("__med"), 6).alias("median"),
        F.round(F.first("__mad"), 6).alias("mad"),
        F.sum(
            F.coalesce((F.col("rz") > z_thresh).cast("long"), F.lit(0))
        ).alias("n_outliers"),
        F.round(F.coalesce(F.max("rz"), F.lit(0.0)), 6).alias("max_robust_z"),
    )


def numeric_psi(
    old: DataFrame,
    new: DataFrame,
    col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Population Stability Index over a numeric column between two
    snapshots — the numeric member of the drift family (vocab_drift
    buckets terms, embedding_drift buckets cells; this buckets VALUES by
    the OLD snapshot's exact quantiles, the standard scorecard-drift
    recipe). One row per bucket: (bucket, n_old, n_new, p_old, p_new,
    psi_term); sum(psi_term) is the headline PSI (< 0.1 stable, > 0.25
    action).

    Bucket edges are the old frame's exact ``k/n_buckets`` quantiles
    (rank ceil(q*n) — the :func:`exact_quantiles` definition shared with
    the oracle), deduplicated, so a skewed column merges buckets rather
    than emitting empty ones; value x lands in bucket
    ``1 + |{edges < x}|``.  Shares use the same +0.5 Laplace smoothing
    as vocab_drift, so empty buckets contribute finite terms.

    Scale: the edge collect is <= n_buckets-1 doubles (bounded, a
    one-off CONSTRUCT cost like pq codebooks); each snapshot then takes
    ONE map-side-combined bucket count — the n_buckets-row frames join
    and smooth driver-free.
    """
    qs = [k / n_buckets for k in range(1, n_buckets)]
    edges = sorted(
        {r["value"] for r in exact_quantiles(old, col, qs).collect()}
    )
    spark = old.sparkSession

    def bucket_counts(df: DataFrame, alias: str) -> DataFrame:
        x = F.col(col).cast("double")
        b = F.lit(1)
        for e in edges:
            b = b + (x > F.lit(float(e))).cast("int")
        return (
            df.filter(x.isNotNull())
            .groupBy(b.cast("long").alias("bucket"))
            .agg(F.count("*").cast("long").alias(alias))
        )

    all_buckets = spark.range(1, len(edges) + 2).select(
        F.col("id").cast("long").alias("bucket")
    )
    cells = (
        all_buckets.join(bucket_counts(old, "n_old"), "bucket", "left")
        .join(bucket_counts(new, "n_new"), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_old", F.lit(0)).cast("long").alias("n_old"),
            F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
        )
    )
    tot = cells.agg(
        F.sum("n_old").cast("double").alias("__to"),
        F.sum("n_new").cast("double").alias("__tn"),
        F.count("*").cast("double").alias("__nb"),
    )
    sm = F.lit(0.5)
    p = cells.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_old",
        "n_new",
        ((F.col("n_old") + sm) / (F.col("__to") + sm * F.col("__nb"))).alias("__po"),
        ((F.col("n_new") + sm) / (F.col("__tn") + sm * F.col("__nb"))).alias("__pn"),
    )
    return p.select(
        "bucket",
        "n_old",
        "n_new",
        F.round(F.col("__po"), 6).alias("p_old"),
        F.round(F.col("__pn"), 6).alias("p_new"),
        F.round(
            (F.col("__po") - F.col("__pn")) * F.log(F.col("__po") / F.col("__pn")), 6
        ).alias("psi_term"),
    )


def grouped_psi(
    old: DataFrame,
    new: DataFrame,
    col: str,
    strata_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Per-stratum PSI — :func:`numeric_psi` with a stratum key: which
    SEGMENT drifted, not just whether the corpus did (the per-source /
    per-language drill-down a drift alert needs before anyone re-trains
    anything).  Bucket edges stay GLOBAL (the old snapshot's corpus-wide
    exact quantiles), so strata are comparable: a stratum's psi_term
    measures its movement against the same grid as every other stratum.

    One row per (stratum, bucket): (stratum, bucket, n_old, n_new,
    p_old, p_new, psi_term); sum(psi_term) per stratum is that
    segment's PSI.  Shares are +0.5 Laplace-smoothed within the
    stratum, so segments of very different sizes still yield finite,
    comparable terms.

    Scale: identical to numeric_psi — the edge collect is bounded, each
    snapshot takes one map-side-combined (stratum, bucket) count, and
    the per-stratum totals are windows over the |strata| x |buckets|
    cell frame, never a rescan.
    """
    qs = [k / n_buckets for k in range(1, n_buckets)]
    edges = sorted(
        {r["value"] for r in exact_quantiles(old, col, qs).collect()}
    )
    spark = old.sparkSession

    def bucket_counts(df: DataFrame, alias: str) -> DataFrame:
        x = F.col(col).cast("double")
        b = F.lit(1)
        for e in edges:
            b = b + (x > F.lit(float(e))).cast("int")
        return (
            df.filter(x.isNotNull() & F.col(strata_col).isNotNull())
            .groupBy(
                F.col(strata_col).alias("stratum"),
                b.cast("long").alias("bucket"),
            )
            .agg(F.count("*").cast("long").alias(alias))
        )

    co = bucket_counts(old, "n_old")
    cn = bucket_counts(new, "n_new")
    strata = co.select("stratum").union(cn.select("stratum")).distinct()
    all_buckets = spark.range(1, len(edges) + 2).select(
        F.col("id").cast("long").alias("bucket")
    )
    grid = strata.crossJoin(all_buckets)
    cells = (
        grid.join(co, ["stratum", "bucket"], "left")
        .join(cn, ["stratum", "bucket"], "left")
        .select(
            "stratum",
            "bucket",
            F.coalesce("n_old", F.lit(0)).cast("long").alias("n_old"),
            F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
        )
    )
    w = Window.partitionBy("stratum")
    sm = F.lit(0.5)
    to = F.sum("n_old").over(w).cast("double")
    tn = F.sum("n_new").over(w).cast("double")
    nb = F.count("*").over(w).cast("double")
    p = cells.select(
        "stratum",
        "bucket",
        "n_old",
        "n_new",
        ((F.col("n_old") + sm) / (to + sm * nb)).alias("__po"),
        ((F.col("n_new") + sm) / (tn + sm * nb)).alias("__pn"),
    )
    return p.select(
        "stratum",
        "bucket",
        "n_old",
        "n_new",
        F.round(F.col("__po"), 6).alias("p_old"),
        F.round(F.col("__pn"), 6).alias("p_new"),
        F.round(
            (F.col("__po") - F.col("__pn")) * F.log(F.col("__po") / F.col("__pn")), 6
        ).alias("psi_term"),
    )


def benford_digits(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "grp",
    out_round: int = 6,
    scale: int = 100,
) -> DataFrame:
    """Benford first-significant-digit audit per group -> (grp, digit,
    n_obs, obs_share, expected_share, chi2_term).

    Naturally occurring positive quantities follow Benford's law
    (P(d) = log10(1 + 1/d)); synthetic, capped, or fabricated value
    streams do not — the classic cheap audit for an event feed whose
    ``value`` column someone started filling with constants or uniform
    noise.  Nine rows per group; sum(chi2_term) is the Pearson
    chi-square against the Benford expectation (8 dof).

    Determinism across engines: values are fixed-pointed to integers
    FIRST (``floor(v * scale)`` — IEEE-identical in both engines even
    where it differs from infinite precision), and the first digit
    comes from integer-division by 10^(decimal length - 1) — no
    float log10 near a power-of-ten boundary.  ``scale`` (default 100 =
    cents, matching currency-like feeds) sets the fixed-point
    resolution: a value column with more than 2 significant decimals
    (rates, latencies in fractional ms) should pass scale=10**6 or
    similar so sub-cent magnitudes are not silently truncated to zero
    and dropped by the positivity filter.  Because Benford's law is
    scale-invariant, changing ``scale`` only affects which tiny values
    survive the cents>0 cut, never the expected shares.  Expected
    shares are driver-side repr-inlined literals; shares and chi2 terms
    are rounded once.  One (group, digit) count shuffle, map-side
    combined.
    """
    import math

    if scale < 1:
        raise ValueError(f"benford_digits: scale must be >= 1, got {scale}")
    cents = F.floor(F.col(value_col).cast("double") * float(scale)).cast("long")
    pos = df.filter(F.col(value_col).isNotNull() & (cents > 0)).select(
        F.col(group_col).alias("grp"), cents.alias("n")
    )
    digit = (
        F.col("n")
        / F.pow(F.lit(10.0), (F.length(F.col("n").cast("string")) - 1).cast("double"))
    ).cast("int")
    cnt = (
        pos.select("grp", digit.alias("digit"))
        .groupBy("grp", "digit")
        .agg(F.count("*").cast("long").alias("n_obs"))
    )
    tot = cnt.groupBy("grp").agg(F.sum("n_obs").cast("long").alias("n_tot"))
    exp_map = F.map_from_arrays(
        F.array(*[F.lit(d) for d in range(1, 10)]),
        F.array(*[F.lit(math.log10(1 + 1 / d)) for d in range(1, 10)]),
    )
    j = cnt.join(F.broadcast(tot), "grp").withColumn("e", exp_map[F.col("digit")])
    obs = F.col("n_obs").cast("double") / F.col("n_tot").cast("double")
    expn = F.col("e") * F.col("n_tot").cast("double")
    return j.select(
        "grp",
        "digit",
        "n_obs",
        F.round(obs, out_round).alias("obs_share"),
        F.round("e", out_round).alias("expected_share"),
        F.round(
            (F.col("n_obs").cast("double") - expn) * (F.col("n_obs").cast("double") - expn)
            / expn,
            out_round,
        ).alias("chi2_term"),
    )
