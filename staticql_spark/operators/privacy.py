"""Privacy-threshold release operators.

The PII family (text.pii_scrub) redacts identifiers INSIDE documents;
this module governs what aggregate statistics may leave the pipeline at
all.  k-anonymity suppression is the standard release rule for usage /
telemetry aggregates: a cell (combination of quasi-identifier values)
backed by fewer than k distinct subjects is suppressed and rolled into a
single residual bucket, so no released row isolates a small group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import ensure_parallelism


def kanon_release(
    df: DataFrame,
    dims: list[str],
    k: int = 5,
    subject_col: str | None = None,
    other_label: str = "__other__",
) -> DataFrame:
    """k-anonymous aggregate release -> (dims..., n_rows, n_subjects,
    suppressed).

    Cells (groupings of ``dims``) with fewer than ``k`` distinct subjects
    (``subject_col``; row count if None) are suppressed: their dims are
    replaced by ``other_label`` and they re-aggregate into ONE residual
    row, so the released total is preserved while no row isolates a
    group smaller than k.  The residual row's ``n_subjects`` is the SUM of
    the suppressed cells' subject counts (an upper bound on its distinct
    subjects — one subject can span cells), and the row itself may still
    be small; it is flagged ``suppressed = true`` so a downstream policy
    can drop it entirely (strict mode) or keep it (totals mode).

    Scale: one shuffle to the cell aggregate; the suppression re-group
    touches only the (rare) sub-threshold cells — the second aggregate's
    input is at most |cells| rows, never the raw data.  String dims only
    (the sentinel label must be representable); cast upstream.
    """
    df = ensure_parallelism(df)
    subject = F.count_distinct(F.col(subject_col)) if subject_col else F.count("*")
    cells = df.groupBy(*dims).agg(
        F.count("*").alias("n_rows"),
        subject.cast("long").alias("n_subjects"),
    )
    ok = cells.filter(F.col("n_subjects") >= k).withColumn(
        "suppressed", F.lit(False)
    )
    residual = (
        cells.filter(F.col("n_subjects") < k)
        .groupBy()
        .agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum("n_subjects").cast("long").alias("n_subjects"),
        )
        .filter(F.col("n_rows").isNotNull())
        .select(
            *[F.lit(other_label).alias(d) for d in dims],
            "n_rows",
            "n_subjects",
            F.lit(True).alias("suppressed"),
        )
    )
    return ok.unionByName(residual)


def ldiversity_report(
    df: DataFrame,
    dims: list[str],
    sensitive_col: str,
    l: int = 3,
    subject_col: str | None = None,
) -> DataFrame:
    """l-diversity audit -> (dims..., n_rows, n_subjects, l_div, ok).

    k-anonymity (:func:`kanon_release`) only bounds GROUP SIZE; a cell
    can still leak when every subject in it shares one sensitive value
    (the homogeneity attack — Machanavajjhala et al. 2007). Distinct
    l-diversity additionally requires every cell to contain at least
    ``l`` distinct non-null values of ``sensitive_col``. This is the
    audit half: per-cell row/subject counts plus the cell's diversity
    ``l_div`` and an ``ok = l_div >= l`` release flag, so a policy layer
    can suppress / generalize the failing cells before export.

    Scale: one shuffle to the cell aggregate (two count-distincts share
    the same grouping); output is |cells| rows, never raw data.

    Without a ``subject_col`` there is no subject identity to count, so
    ``n_subjects`` is NULL (r6 ADVICE: the old row-count fallback
    OVERSTATED distinct subjects whenever one subject contributed
    several rows, weakening the audit the column name implies);
    ``n_rows`` already carries the row count.
    """
    df = ensure_parallelism(df)
    subject = (
        F.count_distinct(F.col(subject_col))
        if subject_col
        else F.lit(None)
    )
    return (
        df.groupBy(*dims)
        .agg(
            F.count("*").alias("n_rows"),
            subject.cast("long").alias("n_subjects"),
            F.count_distinct(F.col(sensitive_col)).cast("long").alias("l_div"),
        )
        .withColumn("ok", F.col("l_div") >= F.lit(l))
    )


def tcloseness_report(
    df: DataFrame,
    dims: list[str],
    sensitive_col: str,
    t: float = 0.2,
    max_m: int = 10_000,
    out_round: int = 6,
) -> DataFrame:
    """t-closeness audit -> (dims..., n_rows, emd, ok).

    l-diversity still leaks when a cell's sensitive values are diverse
    but SKEWED relative to the population (the skewness attack — Li,
    Li & Venkatasubramanian, ICDE 2007): a cohort where 90% of incomes
    sit in the top bucket reveals plenty even with l distinct values.
    t-closeness bounds, per cell, the Earth Mover's Distance between
    the cell's sensitive-value distribution and the GLOBAL one.  For an
    ordered attribute with m distinct global values and unit ground
    distances this is the normalized cumulative-difference form
    ``EMD = sum_i |cumsum_i(p - q)| / (m - 1)`` (Li et al. §5.2), with
    p the cell's distribution and q the global distribution over the
    sorted value domain; m = 1 degrades to EMD 0.  ``ok = emd <= t`` is
    the release flag.  NULL sensitive values are excluded from both
    distributions (they carry no orderable mass).

    Determinism: p, q are single divisions of exact integer counts; each
    (p - q) term is rounded to 9dp and cast to DECIMAL(38,9) BEFORE the
    cumulative window sum, so the running sum is exact integer
    arithmetic — identical on any engine regardless of how its window
    sum associates additions (DuckDB evaluates running sums via segment
    trees, tree-order float addition; Spark folds sequentially — with
    float terms a ulp difference landing on a rounding boundary could
    flip the result, r9 ADVICE).  The per-cell |cum| fold and the final
    divide-by-(m - 1) then operate on exact decimals, rounded once.

    Scale: one shuffle to (dims, value) counts; the global value table
    (m rows) broadcasts into a |cells| × m grid — aggregated data, never
    raw rows; the cumulative window is bounded by m per cell.
    """
    df = ensure_parallelism(df).filter(F.col(sensitive_col).isNotNull())
    glob = df.groupBy(F.col(sensitive_col).alias("v")).agg(
        F.count("*").alias("gc")
    )
    # Cardinality CONTRACT (the supplier_pareto guard idiom): the grid
    # is |cells| x m — sized for ORDINAL sensitive attributes.  A
    # continuous column passed unbucketed fails LOUDLY here instead of
    # silently exploding the broadcast; the fix is to bucket upstream.
    guarded_m = F.coalesce(
        F.assert_true(
            F.count("*") <= F.lit(max_m),
            F.lit(
                "tcloseness_report: sensitive domain exceeded its "
                f"{max_m}-value cardinality contract - bucket the "
                "attribute upstream"
            ),
        ).cast("long"),
        F.count("*").cast("long"),
    )
    tot = glob.agg(F.sum("gc").alias("gt"), guarded_m.alias("m"))
    gq = glob.crossJoin(F.broadcast(tot)).select(
        "v",
        (F.col("gc").cast("double") / F.col("gt").cast("double")).alias("q"),
        "m",
    )
    cv = df.groupBy(*dims, F.col(sensitive_col).alias("v")).agg(
        F.count("*").alias("c")
    )
    n_cell = cv.groupBy(*dims).agg(F.sum("c").cast("long").alias("n_rows"))
    full = (
        n_cell.crossJoin(F.broadcast(gq))
        .join(cv, [*dims, "v"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
    )
    w = (
        Window.partitionBy(*dims)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(
        F.round(
            F.col("c").cast("double") / F.col("n_rows").cast("double")
            - F.col("q"),
            9,
        ).cast("decimal(38,9)")
    ).over(w)
    emd = (
        F.sum(F.abs(F.col("cum"))).cast("double")
        / (F.max("m") - F.lit(1)).cast("double")
    )
    return (
        full.withColumn("cum", cum)
        .groupBy(*dims)
        .agg(
            F.max("n_rows").alias("n_rows"),
            F.when(F.max("m") > 1, F.round(emd, out_round))
            .otherwise(F.lit(0.0))
            .alias("emd"),
        )
        .withColumn("ok", F.col("emd") <= F.lit(t))
    )
