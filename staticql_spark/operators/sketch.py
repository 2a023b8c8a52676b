"""Deterministic distinct-count sketching (KMV / bottom-k).

HyperLogLog (`approx_count_distinct`) is the built-in answer, but its
estimate is implementation-specific — no cross-engine oracle can verify
it. The K-Minimum-Values sketch is the classic alternative (Bar-Yossef
et al. 2002) with a fully deterministic definition: hash every value with
a fixed function, keep the k smallest distinct hashes, and estimate
ndv ≈ (k-1) / h_(k) where h_(k) is the k-th smallest hash normalized to
[0, 1). Same md5-derived 60-bit integer hash as the rest of the repo
(text.hash_sample, dedup shingles), so DuckDB reproduces the sketch —
and the estimate — bit-for-bit.

Scale shape: the distinct() shuffles only 8-byte hashes with map-side
combine, and the k-smallest step compiles to TakeOrderedAndProject —
per-partition top-k heaps merged on the driver, never a global sort.
Sketches of two tables can be unioned (merge = k smallest of the union),
which is what makes KMV a sketch rather than just a sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# 15 hex chars = 60 bits: exact in long AND in double (< 2^53 after the
# normalize divide's rounding is irrelevant — the ratio is one division).
_HASH_SPACE = float(16 ** 15)


def kmv_hash(col, salt: str = "kmv1"):
    """60-bit uniform hash of a value, identical in Spark and DuckDB."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + "|"), col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")


def kmv_distinct(df: DataFrame, col: str, k: int = 256, salt: str = "kmv1") -> DataFrame:
    """One-row summary: KMV estimate of ndv(col) next to the exact count.

    Columns: sketch_k (rows actually in the sketch — min(k, ndv)),
    kth_hash (the sketch's max hash, exact long), est_ndv (the (k-1)/u
    estimator rounded to 2, or the exact count when ndv < k), exact_ndv.
    """
    hashes = (
        df.select(kmv_hash(F.col(col), salt).alias("h"))
        .filter(F.col("h").isNotNull())
        .distinct()
    )
    sketch = hashes.orderBy("h").limit(k)
    agg = sketch.agg(
        F.count("h").alias("sketch_k"), F.max("h").alias("kth_hash")
    )
    est = F.when(
        F.col("sketch_k") < F.lit(k), F.col("sketch_k").cast("double")
    ).otherwise(
        (F.lit(float(k - 1)) / (F.col("kth_hash").cast("double") / F.lit(_HASH_SPACE)))
    )
    exact = df.select(F.countDistinct(col).alias("exact_ndv"))
    return agg.withColumn("est_ndv", F.round(est, 2)).crossJoin(exact)


def kmv_bottom_k(df: DataFrame, col: str, k: int = 256, salt: str = "kmv1") -> DataFrame:
    """The KMV sketch itself: the k smallest distinct hashes of ``col`` as
    a one-column frame (h).  This is the persistable / mergeable artifact;
    :func:`kmv_estimate_from` turns any such sketch into an ndv estimate."""
    return (
        df.select(kmv_hash(F.col(col), salt).alias("h"))
        .filter(F.col("h").isNotNull())
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_union_distinct(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    k: int = 256,
    salt: str = "kmv1",
) -> DataFrame:
    """Sketch ALGEBRA: ndv(A ∪ B) from the two per-table sketches alone.

    The merged sketch is the k smallest of the union of the two bottom-k
    sets — the defining property that makes KMV a sketch rather than a
    sample: each side is summarized independently (e.g. per partition, per
    day, per table), and union-merge composes without touching the raw
    data again.  The merge input here is at most 2k hash rows.

    Returns one row: (sketch_k, kth_hash, est_ndv, exact_ndv) with the
    same estimator and exact-count twin columns as :func:`kmv_distinct`.
    """
    merged = (
        kmv_bottom_k(df_a, col, k, salt)
        .union(kmv_bottom_k(df_b, col, k, salt))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    agg = merged.agg(F.count("h").alias("sketch_k"), F.max("h").alias("kth_hash"))
    est = F.when(
        F.col("sketch_k") < F.lit(k), F.col("sketch_k").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) / (F.col("kth_hash").cast("double") / F.lit(_HASH_SPACE))
    )
    exact = (
        df_a.select(F.col(col).alias("_v"))
        .union(df_b.select(col))
        .agg(F.countDistinct("_v").alias("exact_ndv"))
    )
    return agg.withColumn("est_ndv", F.round(est, 2)).crossJoin(exact)


def _cm_bucket(col, d, width: int, salt: str):
    """Row-d count-min bucket of a value: md5-derived 60-bit hash mod width,
    identical in Spark and DuckDB."""
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + "|"), d.cast("string"), F.lit("|"), col.cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(width),
    )


def cm_sketch(
    df: DataFrame, col: str, depth: int = 4, width: int = 256, salt: str = "cm1"
) -> DataFrame:
    """Count-min sketch build: (d, bucket, n) counts over ``depth``
    independent md5-derived hash rows of ``width`` buckets.

    One groupBy keyed on (d, bucket) — at most depth x width groups, so
    map-side combine collapses the shuffle to a few KB per partition no
    matter how large the input: the sketch of a 100 TB column ships in a
    single small table. Sketches add: union two builds and re-sum to merge
    streams or partitions.
    """
    rows = df.select(F.col(col).cast("string").alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    exploded = rows.select(
        "_v", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    )
    return (
        exploded.select("d", _cm_bucket(F.col("_v"), F.col("d"), width, salt).alias("bucket"))
        .groupBy("d", "bucket")
        .agg(F.count("*").alias("n"))
    )


def cm_estimate(
    df: DataFrame,
    col: str,
    probes: list[str],
    depth: int = 4,
    width: int = 256,
    salt: str = "cm1",
) -> DataFrame:
    """Count-min frequency estimates for a probe set, next to exact counts.

    est(v) = min over hash rows d of sketch[d][h_d(v)] — an upper bound on
    the true count (collisions only inflate). The probe side is a tiny
    literal frame: its (d, bucket) pairs BROADCAST against the sketch, so
    estimation never shuffles the sketch, and the exact-count join is one
    aggregate over the (already filtered) probed values.
    """
    spark = df.sparkSession
    sketch = cm_sketch(df, col, depth, width, salt)
    probe_df = spark.createDataFrame([(p,) for p in probes], f"{col} string")
    probe_buckets = probe_df.select(
        col, F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    ).select(col, "d", _cm_bucket(F.col(col), F.col("d"), width, salt).alias("bucket"))
    est = (
        F.broadcast(probe_buckets)
        .join(sketch, ["d", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce("n", F.lit(0))).alias("est_count"))
    )
    exact = (
        df.select(F.col(col).cast("string").alias(col))
        .filter(F.col(col).isin(probes))
        .groupBy(col)
        .agg(F.count("*").alias("exact_count"))
    )
    return est.join(exact, col, "left").select(
        col, "est_count", F.coalesce("exact_count", F.lit(0)).alias("exact_count")
    )


def kmv_grouped(
    df: DataFrame, group_col: str, col: str, k: int = 64, salt: str = "kmv1"
) -> DataFrame:
    """Per-group KMV distinct sketch + estimate: one row per group with
    (grp, sketch_k, kth_hash, est_ndv, exact_ndv) — the grouped cousin of
    :func:`kmv_distinct` (e.g. distinct users per event type, distinct
    domains per language).  The per-group bottom-k replaces the global
    TakeOrdered with a window rank: WindowGroupLimit keeps a k-size heap
    per group inside each task before the single hash-key shuffle, so a
    hot group never materializes its full distinct set in one partition.
    The exact twin column is for verification; at production scale drop
    it and ship the sketch columns only (they merge across partitions /
    days by union + re-rank, the KMV algebra of kmv_union_distinct).
    """
    from pyspark.sql import Window as W

    hashes = (
        df.select(
            F.col(group_col).alias("grp"), kmv_hash(F.col(col), salt).alias("h")
        )
        .filter(F.col("h").isNotNull())
        .distinct()
    )
    w = W.partitionBy("grp").orderBy("h")
    sk = (
        hashes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy("grp")
        .agg(F.count("h").alias("sketch_k"), F.max("h").alias("kth_hash"))
    )
    est = F.when(
        F.col("sketch_k") < F.lit(k), F.col("sketch_k").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) / (F.col("kth_hash").cast("double") / F.lit(_HASH_SPACE))
    )
    exact = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.countDistinct(col).alias("exact_ndv")
    )
    return (
        sk.join(exact, "grp")
        .select("grp", "sketch_k", "kth_hash", F.round(est, 2).alias("est_ndv"), "exact_ndv")
    )


def kmv_join_estimate(
    df_a: DataFrame,
    col_a: str,
    df_b: DataFrame,
    col_b: str,
    k: int = 256,
    salt: str = "kmv1",
) -> DataFrame:
    """Join-cardinality planning from per-table KMV sketches alone — the
    optimizer-style estimate you compute BEFORE running a join to pick a
    strategy (broadcast vs shuffle, or refuse a blow-up): distinct keys
    on each side, of the union (sketch merge), and of the INTERSECTION
    by inclusion-exclusion est(A) + est(B) - est(A∪B), clamped at >= 0.

    One row: (est_a, est_b, est_union, est_intersection, exact_a,
    exact_b, exact_intersection) — exact twins computed for the oracle /
    calibration; a production planner would drop them.  All sketch math
    runs on at most 3k hash rows; each side is summarized independently
    (the sketches persist per table/partition and merge without
    re-reading data).
    """
    sa = kmv_bottom_k(df_a, col_a, k, salt)
    sb = kmv_bottom_k(df_b, col_b, k, salt)

    def est_of(sk):
        agg = sk.agg(F.count("h").alias("sk"), F.max("h").alias("kh"))
        return agg.select(
            F.when(F.col("sk") < F.lit(k), F.col("sk").cast("double"))
            .otherwise(
                F.lit(float(k - 1)) / (F.col("kh").cast("double") / F.lit(_HASH_SPACE))
            )
            .alias("e")
        )
    merged = sa.union(sb).distinct().orderBy("h").limit(k)
    ea = est_of(sa).select(F.round("e", 2).alias("est_a"))
    eb = est_of(sb).select(F.round("e", 2).alias("est_b"))
    eu = est_of(merged).select(F.round("e", 2).alias("est_union"))
    exact = (
        df_a.select(F.col(col_a).alias("_v"))
        .distinct()
        .join(df_b.select(F.col(col_b).alias("_v")).distinct(), "_v")
        .agg(F.count("*").cast("long").alias("exact_intersection"))
        .crossJoin(df_a.agg(F.countDistinct(col_a).cast("long").alias("exact_a")))
        .crossJoin(df_b.agg(F.countDistinct(col_b).cast("long").alias("exact_b")))
    )
    return (
        ea.crossJoin(eb)
        .crossJoin(eu)
        .select(
            "est_a",
            "est_b",
            "est_union",
            F.round(
                F.greatest(
                    F.col("est_a") + F.col("est_b") - F.col("est_union"), F.lit(0.0)
                ),
                2,
            ).alias("est_intersection"),
        )
        .crossJoin(exact)
    )


# ---------------------------------------------------------------------
# HyperLogLog — deterministic, oracle-checkable construction
# ---------------------------------------------------------------------
#
# Spark's approx_count_distinct IS HyperLogLog++, but its registers are
# implementation-private — no cross-engine oracle can verify the
# estimate. This is the textbook HLL (Flajolet et al. 2007) rebuilt on
# the repo's shared 60-bit md5 hash so DuckDB reproduces every register
# and the estimate bit-for-bit:
#
#   j   = h mod m            (m = 2^p registers)
#   w   = h div m            (the remaining 60-p bits)
#   rho = (60-p) - bitlen(w) + 1   (leading-zero rank; bitlen via the
#                                   base-2 string length — exact integer
#                                   in both engines, no floating log2)
#   M_j = max rho
#
# The harmonic mean is kept EXACT: instead of summing 2^-M_j in floats
# (summation order differs across engines), we sum the integer
# 2^(maxrho - M_j) — every term and the sum fit in a long — and divide
# once: Z = S / 2^maxrho. The estimate alpha*m^2/Z is then a single
# IEEE division of two exactly-agreed numbers, so round(.,2) matches.
#
# Scale shape: identical to kmv — one distinct() on 8-byte hashes, then
# a <=m-row register aggregate; registers merge by per-j MAX (hll_merge),
# which is what makes it a sketch (per-day/per-partition builds compose
# without re-reading data). m=512 gives ~1.04/sqrt(512) = 4.6% rel error
# in 512 longs — 4 KB summarizing any number of rows.

_HLL_P = 9
_HLL_M = 1 << _HLL_P           # 512 registers
_HLL_WBITS = 60 - _HLL_P       # bits left in w after the register index
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)


def hll_registers(df: DataFrame, col: str, salt: str = "hll1") -> DataFrame:
    """The HLL sketch itself: (j, m_j) — register index and max
    leading-zero rank. At most 2^p rows; this is the persistable /
    mergeable artifact (:func:`hll_merge` composes them, per-j MAX)."""
    h = kmv_hash(F.col(col), salt)
    # No distinct() over the hash stream: per-register MAX is duplicate-
    # insensitive, so map-side combine reduces every partition to <=m
    # rows — an O(m) exchange instead of the O(ndv) one a distinct costs
    # (ADVICE r6; the streaming twin always worked this way and the merge
    # property test proves identical registers).
    hashes = df.select(h.alias("h")).filter(F.col("h").isNotNull())
    j, rho = _hll_j_rho()
    return (
        hashes.select(j.alias("j"), rho.alias("rho"))
        .groupBy("j")
        .agg(F.max("rho").cast("int").alias("m_j"))
    )


def _hll_j_rho():
    """(register index, leading-zero rank) expressions over a 60-bit hash
    column ``h``.  h div m / h mod m as BIT OPS (m is 2^p): a double-
    division here would silently corrupt w — the 60-bit hash exceeds
    2^53.  Bitlen via base-2 string length: exact-integer, portable."""
    w = F.shiftright(F.col("h"), _HLL_P)
    rho = F.when(w == 0, F.lit(_HLL_WBITS + 1)).otherwise(
        F.lit(_HLL_WBITS + 1) - F.length(F.conv(w.cast("string"), 10, 2))
    )
    return F.col("h").bitwiseAND(F.lit(_HLL_M - 1)), rho


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """HLL sketch algebra: merge = per-register MAX. Exactly equals the
    sketch of the unioned inputs (max of maxima) — the defining property;
    locked by the property test in tests/test_operators.py."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("j").agg(F.max("m_j").cast("int").alias("m_j"))


def hll_estimate(registers: DataFrame) -> DataFrame:
    """One-row ndv estimate from an (j, m_j) register frame.

    Columns: n_regs (non-empty registers), sum_inv (the exact-integer
    harmonic sum S = sum_j 2^(maxrho - m_j), empty registers contributing
    2^maxrho each — a long, hash-stable across engines), est_raw (the
    alpha*m^2/Z estimate), est_linear (linear counting m*ln(m/V), the
    small-range correction, NULL when no register is empty), est_ndv
    (the standard selection: linear counting when est_raw <= 2.5m and
    empties exist, else raw).
    """
    return _hll_estimate_from_agg(registers.agg(*_hll_agg_exprs()), [])


def _hll_agg_exprs():
    """Register-frame fold: (n_regs, s_present) where s_present is the
    exact-integer harmonic sum over PRESENT registers (every term a
    long — hash-stable across engines, summation-order-free)."""
    maxrho = _HLL_WBITS + 1
    return [
        F.count("*").cast("long").alias("n_regs"),
        F.sum(
            F.pow(F.lit(2.0), F.lit(float(maxrho)) - F.col("m_j").cast("double"))
            .cast("long")
        ).cast("long").alias("s_present"),
    ]


def _hll_estimate_from_agg(agg: DataFrame, keys: list[str]) -> DataFrame:
    """Shared estimate tail over an (keys..., n_regs, s_present) frame —
    the single home of the alpha/linear-counting/selection math (r6
    ADVICE: hll_grouped previously duplicated it inline)."""
    maxrho = _HLL_WBITS + 1
    # numerator alpha * m^2 * 2^maxrho as ONE python-float literal shared
    # with the oracle SQL: the estimate is a single IEEE division
    num = _HLL_ALPHA * _HLL_M * _HLL_M * float(1 << maxrho)
    zeros = F.lit(_HLL_M) - F.col("n_regs")
    s = (F.col("s_present") + zeros * F.lit(1 << maxrho)).alias("sum_inv")
    est_raw = F.lit(num) / F.col("sum_inv").cast("double")
    est_lin = F.when(
        zeros > 0,
        F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / zeros.cast("double")),
    )
    sel = F.when(
        (F.col("est_raw") <= F.lit(2.5 * _HLL_M)) & F.col("est_linear").isNotNull(),
        F.col("est_linear"),
    ).otherwise(F.col("est_raw"))
    return (
        agg.select(*keys, "n_regs", s)
        .withColumn("est_raw", F.round(est_raw, 2))
        .withColumn("est_linear", F.round(est_lin, 2))
        .withColumn("est_ndv", F.round(sel, 2))
    )


def hll_distinct(df: DataFrame, col: str, salt: str = "hll1") -> DataFrame:
    """One-row HLL summary of ndv(col) next to the exact count — the
    HyperLogLog twin of :func:`kmv_distinct` (same scan shape, constant
    4 KB state instead of k hash rows; registers merge by MAX where KMV
    merges by re-rank)."""
    est = hll_estimate(hll_registers(df, col, salt))
    exact = df.select(F.countDistinct(col).cast("long").alias("exact_ndv"))
    return est.crossJoin(exact)


def hll_union_distinct(
    df_a: DataFrame, df_b: DataFrame, col: str, salt: str = "hll1"
) -> DataFrame:
    """ndv(A ∪ B) from the two per-table register sketches alone — the
    HLL union algebra (per-register MAX), next to the exact union count.
    Merge input is at most 2m register rows."""
    merged = hll_merge(
        hll_registers(df_a, col, salt), hll_registers(df_b, col, salt)
    )
    exact = (
        df_a.select(F.col(col).alias("_v"))
        .union(df_b.select(col))
        .agg(F.countDistinct("_v").cast("long").alias("exact_ndv"))
    )
    return hll_estimate(merged).crossJoin(exact)


def hll_grouped(
    df: DataFrame, group_col: str, col: str, salt: str = "hll1"
) -> DataFrame:
    """Per-group HLL distinct estimate next to its exact twin — the
    grouped cousin of :func:`hll_distinct` (and the HLL counterpart of
    :func:`kmv_grouped`): one row per group with (grp, n_regs, sum_inv,
    est_raw, est_linear, est_ndv, exact_ndv).

    Scale: the register build shuffles (grp, j) keys with map-side
    combine — at most |groups| x m rows cross the wire regardless of
    input size — and the estimate folds each group's registers in the
    SAME aggregate (the empty-register complement is arithmetic on
    n_regs, so absent registers cost nothing). Per-day grouped sketches
    merge by per-(grp, j) MAX, the :func:`hll_merge` algebra.
    """
    h = kmv_hash(F.col(col), salt)
    # No distinct() (ADVICE r6): (grp, j) MAX is duplicate-insensitive —
    # map-side combine caps the exchange at |groups| x m rows regardless
    # of input size, where a distinct shuffles every distinct value.
    hashes = df.select(F.col(group_col).alias("grp"), h.alias("h")).filter(
        F.col("h").isNotNull()
    )
    j, rho = _hll_j_rho()
    regs = (
        hashes.select("grp", j.alias("j"), rho.alias("rho"))
        .groupBy("grp", "j")
        .agg(F.max("rho").cast("int").alias("m_j"))
    )
    agg = regs.groupBy("grp").agg(*_hll_agg_exprs())
    exact = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.countDistinct(col).cast("long").alias("exact_ndv")
    )
    return _hll_estimate_from_agg(agg, ["grp"]).join(exact, "grp")


# ---------------------------------------------------------------------------
# Bottom-k quantile sketch: a deterministic, MERGEABLE uniform row sample
# ---------------------------------------------------------------------------

def qsketch(
    df: DataFrame, value_col: str, key_col: str, k: int = 512,
    salt: str = "qsk1",
) -> DataFrame:
    """Quantile sketch = the ``k`` rows whose md5 row-key hashes are
    smallest, carrying their values -> frame (h, v).

    approx_percentile is the built-in answer, but (like HLL) its result
    is implementation-specific — no cross-engine oracle can verify it.
    The bottom-k-by-hash row sample is the deterministic alternative:
    hashing a UNIQUE row key makes the sample uniform over rows, and
    "k smallest hashes" makes it a sketch rather than a sample —
    bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪ bottom-k(B)) exactly
    (row keys are unique, so no hash collides across sides), which is
    the same union-merge algebra as :func:`kmv_bottom_k`.  Per-shard /
    per-day sketches compose without touching raw data again.

    Scale: the exchange carries (8-byte hash, value) with TakeOrdered's
    per-partition k-heaps — never a global sort, never raw rows.
    """
    return (
        df.select(
            kmv_hash(F.col(key_col), salt).alias("h"),
            F.col(value_col).cast("double").alias("v"),
        )
        .filter(F.col("v").isNotNull())
        .orderBy("h")
        .limit(k)
    )


def qsketch_quantiles(sketch: DataFrame, qs: tuple = (0.5,)) -> DataFrame:
    """Type-1 (lower empirical) quantiles of a :func:`qsketch` frame ->
    (q, est_v, sketch_n): for each q, the value at 1-based rank
    ``max(1, ceil(q * n))`` of the sketch ordered by (v, h) — integer
    rank arithmetic and a value passed through bit-exactly, so any
    engine reproduces the estimate from the same sketch.  All ops run
    on <= k rows."""
    from pyspark.sql import Window as W

    ranked = sketch.withColumn(
        "rn", F.row_number().over(W.orderBy("v", "h"))
    ).withColumn("n", F.count("*").over(W.partitionBy()))
    qdf = ranked.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q: double"
    )
    target = F.greatest(F.lit(1), F.ceil(F.col("q") * F.col("n")).cast("int"))
    return (
        qdf.crossJoin(ranked)
        .filter(F.col("rn") == target)
        .select(
            "q", F.col("v").alias("est_v"), F.col("n").cast("long").alias("sketch_n")
        )
    )


def qsketch_union_quantiles(
    sk_a: DataFrame, sk_b: DataFrame, k: int = 512, qs: tuple = (0.5,)
) -> DataFrame:
    """Sketch ALGEBRA: quantiles of A ∪ B from the two per-side sketches
    alone — union the (at most 2k) sketch rows, re-take the k smallest
    hashes, read quantiles.  Equals :func:`qsketch` of the concatenated
    data exactly (tested), which is what lets a fleet sketch per shard
    and merge driver-side."""
    merged = sk_a.unionByName(sk_b).orderBy("h").limit(k)
    return qsketch_quantiles(merged, qs)
