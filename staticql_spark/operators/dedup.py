"""Deduplication operators — exact and near-dup — built for 100 TB corpora.

Design rules:
- Everything is DataFrame ops (explode / groupBy / join); no Python in the
  hot path, no driver-side collection, no O(n^2) full cross joins — every
  pairwise step is blocked by a bucketing key (LSH band, simhash chunk,
  shared shingle) so candidate generation is an equi join that shuffles on
  the bucket key.
- Hashing is md5-based (not murmur3) so the DuckDB oracle reproduces the
  exact signatures: min(md5(salt || shingle)) is a valid min-hash family
  over the md5 value space and is engine-portable.

At cluster scale the shingle explode is the big intermediate (docs x
shingles); it shuffles once for the per-(doc,salt) min — map-side partial
aggregation (Spark's hash agg) compresses it before the exchange. Band keys
then shuffle only |docs| x |bands| rows, and the candidate-pair verify joins
only within buckets. Skewed buckets (a shingle shared by every doc) are the
classic hazard: ``max_bucket`` caps runaway buckets the same way production
dedup pipelines drop stop-shingles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from . import ensure_parallelism
from .text import tokens


def normalize_text(col: Column) -> Column:
    return F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on normalized text: keep the lowest id per group.

    Returns (doc_id, group_size) for kept docs — a hash-groupBy, one
    shuffle on the md5 key, map-side combined.
    """
    key = F.md5(normalize_text(F.col(text_col)))
    return (
        df.groupBy(key.alias("fp"))
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("group_size"))
        .select(id_col, "group_size")
    )


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(id, shingle) pairs: distinct word n-grams of normalized text."""
    # Bind tokens to a concrete column FIRST: referencing the tokenize
    # expression inside the transform() lambda would re-run the regex+split
    # once per shingle index (O(tokens^2) regex work per doc — measured 10x
    # slowdown at 5k docs before this was split into two selects).
    toks_df = ensure_parallelism(df).select(
        F.col(id_col), tokens(normalize_text(F.col(text_col))).alias("_toks")
    )
    t = F.col("_toks")
    # guard: sequence(1, 0) in Spark yields a DESCENDING [1, 0], so short
    # docs must short-circuit to an empty shingle set explicitly
    sh = F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(t, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toks_df.select(F.col(id_col), F.explode(F.array_distinct(sh)).alias("shingle"))


# Universal-hash min-hash family: ONE md5 per shingle, then k cheap
# arithmetic projections (a_k*h + b_k) mod P — the standard datasketch
# construction. 16x fewer cryptographic hashes than salting md5 per k,
# and every operation is plain BIGINT math DuckDB reproduces exactly.
# Bounds guarantee no int64 overflow in either engine:
#   h mod 2^40 (< 2^40) * a_k (< 2^22) + b_k (< P < 2^61) < 2^63.
MINHASH_P = 2305843009213693951  # 2^61 - 1 (Mersenne prime)
MINHASH_HM = 1 << 40


def minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_k, b_k) pairs, identical formula on the oracle side."""
    return [
        (
            ((2654435761 * (k + 1)) % 4194304) | 1,
            (40503 * (k + 1) * 65537 + 17) % MINHASH_P,
        )
        for k in range(num_hashes)
    ]


def shingle_hash(col: Column) -> Column:
    """60-bit integer hash of a shingle string (md5-derived, portable)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def minhash_signatures(
    sh: DataFrame, id_col: str = "doc_id", num_hashes: int = 16
) -> DataFrame:
    """(id, sig: array<long>) — k independent min-hashes per doc.

    One aggregation: min((a_k*h + b_k) mod P) over shingle hashes h.
    Partial (map-side) min keeps the shuffle at |docs| rows x k values.
    """
    hm = (shingle_hash(F.col("shingle")) % MINHASH_HM).alias("hm")
    hashed = sh.select(F.col(id_col), hm)
    aggs = [
        F.min((F.col("hm") * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P)).alias(f"h{k}")
        for k, (a, b) in enumerate(minhash_params(num_hashes))
    ]
    per_doc = hashed.groupBy(id_col).agg(*aggs)
    return per_doc.select(
        id_col, F.array(*[F.col(f"h{k}") for k in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs via MinHash + LSH banding, Jaccard-verified.

    1. shingle -> 2. k min-hashes -> 3. band keys (r = k/b rows per band)
    -> 4. candidates = equi-self-join on (band_idx, band_key), id_a < id_b
    -> 5. verify exact Jaccard on shingle sets -> filter >= threshold.

    Returns (id_a, id_b, jaccard). All joins are bucketed equi joins.
    """
    rows_per_band = num_hashes // bands
    sh = shingles(df, text_col, id_col, n).cache()
    sig = minhash_signatures(sh, id_col, num_hashes)

    band_cols = []
    for b in range(bands):
        band_key = F.md5(
            F.array_join(
                F.transform(
                    F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                    lambda x: x.cast("string"),
                ),
                "|",
            )
        )
        band_cols.append(F.struct(F.lit(b).alias("band"), band_key.alias("key")))
    banded = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    left = banded.alias("l")
    right = banded.alias("r")
    cands = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )

    verified = verify_jaccard(cands, sh, id_col)
    return verified.filter(F.col("jaccard") >= threshold)


def verify_jaccard(pairs: DataFrame, sh: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exact Jaccard over shingle sets for candidate pairs.

    |A ∩ B| via a (pair x shared-shingle) equi join; |A ∪ B| = |A|+|B|-∩.
    """
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        pairs.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_bucket: int = 1000,
) -> DataFrame:
    """All-pairs n-gram Jaccard >= threshold, blocked by shared shingles.

    Candidate pairs = docs sharing >= 1 shingle (skipping stop-shingles in
    buckets larger than ``max_bucket`` — they cannot discriminate and they
    quadratically blow up the join).
    """
    sh = shingles(df, text_col, id_col, n).cache()
    bucket_ok = sh.groupBy("shingle").agg(F.count("*").alias("bc")).filter(
        F.col("bc") <= max_bucket
    )
    sh_ok = sh.join(bucket_ok.select("shingle"), "shingle")
    a = sh_ok.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh_ok.select(F.col(id_col).alias("id_b"), "shingle")
    cands = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return verify_jaccard(cands, sh, id_col).filter(F.col("jaccard") >= threshold)


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 60) -> DataFrame:
    """60-bit SimHash per doc (60 keeps the value in a signed int64 for
    engine portability; md5-derived token hashes).

    fingerprint bit i = sign of sum over tokens of (2*bit_i(h(token)) - 1).
    Implemented as explode(tokens) x explode(bit positions) -> two-level
    groupBy — pure SQL, map-side combined, no UDFs.
    """
    toks = F.array_distinct(tokens(normalize_text(F.col(text_col))))
    tok = ensure_parallelism(df).select(F.col(id_col), F.explode(toks).alias("tok"))
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
    tok_h = tok.select(id_col, h.alias("h"))
    pos = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("pos")
    # shiftright/shiftleft with a *column* shift amount need the SQL form
    # (the Python wrappers only accept int literals)
    bit_rows = tok_h.select(id_col, "h", pos).select(
        id_col,
        "pos",
        F.expr("(shiftright(h, CAST(pos AS INT)) & 1) * 2 - 1").alias("sign"),
    )
    per_pos = bit_rows.groupBy(id_col, "pos").agg(F.sum("sign").alias("s"))
    fp = per_pos.groupBy(id_col).agg(
        F.sum(
            F.when(
                F.col("s") > 0,
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos AS INT))"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )
    return fp


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    chunks: int = 4,
    bits: int = 60,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Blocking: split the fingerprint into ``chunks`` bit-ranges; by
    pigeonhole any pair within distance < chunks shares one exact chunk, so
    candidates come from equi joins on (chunk_idx, chunk_value).
    """
    fp = simhash(df, text_col, id_col, bits).cache()
    chunk_bits = bits // chunks
    chunk_cols = [
        F.struct(
            F.lit(i).alias("ci"),
            F.shiftright(F.col("simhash"), i * chunk_bits)
            .bitwiseAND(F.lit((1 << chunk_bits) - 1))
            .alias("cv"),
        )
        for i in range(chunks)
    ]
    chunked = fp.select(
        id_col, "simhash", F.explode(F.array(*chunk_cols)).alias("c")
    ).select(id_col, "simhash", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))
    l = chunked.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "ci", "cv"
    )
    r = chunked.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "ci", "cv"
    )
    cands = (
        l.join(r, ["ci", "cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cands.select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.98,
    block_col: Column | None = None,
) -> DataFrame:
    """Embedding near-dups: cosine >= threshold, blocked by ``block_col``
    (default: the sign pattern of the first 8 dims — a cheap deterministic
    hyperplane LSH; identical vectors always collide)."""
    from .similarity import cosine

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    if block_col is None:
        block_col = F.array_join(
            F.transform(F.slice(v, 1, 8), lambda x: (x >= 0).cast("int").cast("string")),
            "",
        )
    side = ensure_parallelism(df).select(F.col(id_col), v.alias("v"), block_col.alias("blk"))
    l = side.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"), "blk")
    r = side.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"), "blk")
    pairs = l.join(r, "blk").filter(F.col("id_a") < F.col("id_b"))
    cos = cosine(F.col("va"), F.col("vb"))
    return pairs.select("id_a", "id_b", F.round(cos, 6).alias("cosine")).filter(
        F.col("cosine") >= threshold
    )
