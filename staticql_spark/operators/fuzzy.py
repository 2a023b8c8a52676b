"""Fuzzy (approximate string-key) join — q-gram blocking + exact edit-
distance verification.

Entity resolution / record linkage over dirty keys: the join a user
mis-writes as a cross join with a `levenshtein() <= d` filter.  Here the
quadratic candidate space is cut by the standard q-gram filter: an edit
operation destroys at most q character q-grams, so two strings within
edit distance d share at least max(|a|,|b|) - q + 1 - d·q grams — any
pair worth verifying shares at least ONE gram once the keys are longer
than q·(d+1).  Shorter keys block on the whole key (exact-prefix bucket),
so nothing silently disappears below that length.

Scale shape: explode each side to (id, gram) with per-side dedup, one
equi join on the gram, a deterministic per-gram bucket cap (the same
boilerplate guard as every LSH path in dedup.py — a stop-gram shared by
m keys would emit O(m²) candidates), then one join back to the raw keys
for the exact `levenshtein` verify.  Never a cross join; candidate
volume is bounded by gram-bucket density × cap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def char_grams(col: Column, q: int = 3) -> Column:
    """Distinct character q-grams of a string column; the whole string
    when shorter than q.  ``col`` must be a plain attribute reference —
    an expensive derived expression would be re-inlined per position
    (the repo's documented optimizer-substitution hazard)."""
    n = F.length(col)
    return F.array_distinct(
        F.when(
            n >= q,
            F.transform(
                F.sequence(F.lit(1), n - F.lit(q - 1)),
                lambda i: col.substr(i, F.lit(q)),
            ),
        ).otherwise(F.array(col))
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_id: str,
    right_id: str,
    max_distance: int = 2,
    q: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """(left_id, right_id, left_key, right_key, distance) for key pairs
    with Levenshtein distance <= ``max_distance``, candidates blocked by
    shared q-grams.

    ``max_bucket`` drops gram buckets shared by more keys than the cap
    (deterministically — whole bucket, both sides counted together), the
    boilerplate-gram guard; recall for pairs whose ONLY shared grams are
    such stop-grams is sacrificed knowingly, exactly like the LSH caps.
    """
    lg = (
        left.select(F.col(left_id).alias("__fl_id"), F.col(left_key).alias("__fl_k"))
        .select("__fl_id", "__fl_k", F.explode(char_grams(F.col("__fl_k"), q)).alias("g"))
    )
    rg = (
        right.select(F.col(right_id).alias("__fr_id"), F.col(right_key).alias("__fr_k"))
        .select("__fr_id", "__fr_k", F.explode(char_grams(F.col("__fr_k"), q)).alias("g"))
    )
    tagged = lg.select("g", F.lit(True).alias("is_l")).unionByName(
        rg.select("g", F.lit(False).alias("is_l"))
    )
    keep = (
        tagged.groupBy("g")
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") <= max_bucket)
        .select("g")
    )
    cands = (
        lg.join(keep, "g")
        .join(rg, "g")
        .select("__fl_id", "__fl_k", "__fr_id", "__fr_k")
        .distinct()
    )
    dist = F.levenshtein(F.col("__fl_k"), F.col("__fr_k"))
    return cands.filter(dist <= max_distance).select(
        F.col("__fl_id").alias(left_id),
        F.col("__fr_id").alias(right_id),
        F.col("__fl_k").alias(left_key),
        F.col("__fr_k").alias(right_key),
        dist.alias("distance"),
    )
