"""Text-analysis operators for large-scale training-data pipelines.

All hot paths are built-in Spark SQL expressions (JVM, whole-stage codegen;
no Python UDFs), so they vectorize and scale linearly with executors. Each
operator has an exact ANSI-SQL twin (see __spark_entry__.oracle_sql) — the
computations are deliberately engine-portable (md5, regex, length ratios)
so DuckDB reproduces them bit-for-bit.

Operators:
- tokenize / token_count: whitespace + BPE-ish regex token streams
- quality_score: length / punctuation / stopword / digit ratios + a
  composite score — the usual C4/Gopher-style cheap filters
- lang_id: character-class + stopword heuristic (n-gram-free, deterministic)
- fingerprint: md5 document fingerprint over normalized text and a
  rolling-hash (shingle) fingerprint for near-dup keys
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from . import ensure_parallelism

# BPE-ish pre-tokenizer: word pieces or single non-space symbols.
# RE2/Java-portable (no lookarounds).
TOKEN_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"

STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]


def tokens(col: Column) -> Column:
    """Whitespace tokens (empty string -> empty array)."""
    t = F.split(F.trim(col), r"\s+")
    return F.when(F.trim(col) == "", F.array().cast("array<string>")).otherwise(t)


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc whitespace and regex token counts."""
    df = ensure_parallelism(df)
    c = F.col(text_col)
    return df.select(
        "doc_id",
        F.size(tokens(c)).alias("ws_tokens"),
        F.size(F.regexp_extract_all(c, F.lit(TOKEN_RE), 0)).alias("re_tokens"),
        F.length(c).alias("n_chars_computed"),
    )


def quality_score(
    df: DataFrame, text_col: str = "text", keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Cheap quality heuristics (C4/Gopher-style), all ratios in [0,1].

    score = mean of: token-length sanity, stopword presence, alpha ratio.
    Deterministic closed-form — the SQL oracle reproduces it exactly.
    ``keep_cols`` pass extra input columns through, so a pipeline can
    score-and-keep in ONE projection instead of joining the scores back
    (a derived-column self-join recomputes the input subtree per side).
    """
    df = ensure_parallelism(df)
    c = F.col(text_col)
    # bind the token array once — every later reference reuses the column
    # instead of re-running regex+split (see dedup.shingles for the same
    # pattern and the measured cost of not doing this)
    df = df.withColumn("_toks", tokens(c))
    toks = F.col("_toks")
    n_chars = F.length(c)
    n_tokens = F.size(toks)
    n_alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(c, r"[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    stop_hits = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(STOPWORDS_EN))
    )
    mean_tok_len = F.when(n_tokens > 0, n_chars.cast("double") / n_tokens).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_chars > 0, n_alpha.cast("double") / n_chars).otherwise(F.lit(0.0))
    digit_ratio = F.when(n_chars > 0, n_digit.cast("double") / n_chars).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, stop_hits.cast("double") / n_tokens).otherwise(F.lit(0.0))
    len_ok = ((mean_tok_len >= F.lit(3.0)) & (mean_tok_len <= F.lit(12.0))).cast("int")
    has_stop = (stop_ratio > 0).cast("int")
    score = (
        len_ok.cast("double") + has_stop.cast("double") + alpha_ratio
    ) / F.lit(3.0)
    return df.select(
        "doc_id",
        *keep_cols,
        F.size(toks).alias("n_tokens"),
        F.round(mean_tok_len, 4).alias("mean_tok_len"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(digit_ratio, 4).alias("digit_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(score, 4).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic language-ID heuristic.

    Character-class evidence first (CJK / Cyrillic / Greek / Arabic are
    unambiguous), then Latin-script diacritic classes, then an English
    stopword-rate fallback. Pure regex + length arithmetic -> portable.
    """
    df = ensure_parallelism(df)
    c = F.col(text_col)
    n = F.length(c).cast("double")

    def ratio(pattern: str) -> Column:
        kept = F.length(F.regexp_replace(c, pattern, ""))
        return F.when(n > 0, (n - kept) / n).otherwise(F.lit(0.0))

    cjk = ratio(r"[\x{4e00}-\x{9fff}]")
    kana = ratio(r"[\x{3040}-\x{30ff}]")
    hangul = ratio(r"[\x{ac00}-\x{d7af}]")
    cyr = ratio(r"[\x{0400}-\x{04ff}]")
    arabic = ratio(r"[\x{0600}-\x{06ff}]")
    de_chars = ratio(r"[äöüßÄÖÜ]")
    fr_chars = ratio(r"[àâçéèêëîïôûùüÿœ]")
    es_chars = ratio(r"[áéíóúñ¿¡]")
    df = df.withColumn("_toks", tokens(c))
    toks = F.col("_toks")
    n_tokens = F.size(toks)
    stop_ratio = F.when(
        n_tokens > 0,
        F.size(F.filter(toks, lambda t: F.lower(t).isin(STOPWORDS_EN))).cast("double")
        / n_tokens,
    ).otherwise(F.lit(0.0))

    pred = (
        F.when(kana > 0.05, F.lit("ja"))
        .when(hangul > 0.05, F.lit("ko"))
        .when(cjk > 0.05, F.lit("zh"))
        .when(cyr > 0.05, F.lit("ru"))
        .when(arabic > 0.05, F.lit("ar"))
        .when(de_chars > 0.002, F.lit("de"))
        .when(es_chars > 0.002, F.lit("es"))
        .when(fr_chars > 0.002, F.lit("fr"))
        .when(stop_ratio >= 0.03, F.lit("en"))
        .otherwise(F.lit("und"))
    )
    return df.select(
        "doc_id",
        pred.alias("lang_pred"),
        F.round(stop_ratio, 4).alias("en_stop_ratio"),
    )


# PII patterns — RE2-safe (no backrefs/lookarounds) so the Java regex
# engine and DuckDB's RE2 match byte-for-byte identically
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+?\d[\d -]{7,}\d"


def pii_scrub(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Count and redact emails, IPv4 addresses, and phone-like numbers.

    Pure regexp_extract_all/regexp_replace — JVM-side, codegen'd, linear in
    text bytes, zero shuffles. Redaction order is load-bearing and fixed:
    emails, then IPs, then phones — phone counting runs on IP-redacted text
    so an address's digit runs are never double-counted as phone numbers.
    Returns (id, n_emails, n_ips, n_phones, redacted).
    """
    df = ensure_parallelism(df)
    c = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL_RE), F.lit(0)))
    no_email = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    # bind intermediate redaction stages as columns so each regex pass runs
    # once (same optimizer-substitution hazard as dedup.doc_shingles)
    step1 = df.select(
        F.col(id_col), n_emails.alias("n_emails"), no_email.alias("_t1")
    )
    n_ips = F.size(F.regexp_extract_all(F.col("_t1"), F.lit(PII_IPV4_RE), F.lit(0)))
    step2 = step1.select(
        F.col(id_col),
        "n_emails",
        n_ips.alias("n_ips"),
        F.regexp_replace(F.col("_t1"), PII_IPV4_RE, "<IP>").alias("_t2"),
    )
    n_phones = F.size(
        F.regexp_extract_all(F.col("_t2"), F.lit(PII_PHONE_RE), F.lit(0))
    )
    return step2.select(
        F.col(id_col),
        "n_emails",
        "n_ips",
        n_phones.alias("n_phones"),
        F.regexp_replace(F.col("_t2"), PII_PHONE_RE, "<PHONE>").alias("redacted"),
    )


def repetition_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals per doc over whitespace tokens.

    dup_token_frac = 1 - distinct/total; top_token_frac = mode count/total.
    explode -> (doc, token) count -> per-doc agg: both aggregations are
    map-side combined, the shuffle carries one row per distinct (doc,
    token). Docs with no tokens produce no row.
    """
    tok = ensure_parallelism(df).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    per_tok = tok.groupBy(id_col, "tok").agg(F.count("*").alias("cnt"))
    return (
        per_tok.groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.count("*").alias("n_distinct"),
            F.max("cnt").alias("top_cnt"),
        )
        .select(
            F.col(id_col),
            "n_tokens",
            F.round(1.0 - F.col("n_distinct") / F.col("n_tokens"), 4).alias(
                "dup_token_frac"
            ),
            F.round(F.col("top_cnt") / F.col("n_tokens"), 4).alias("top_token_frac"),
        )
    )


def hash_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang_pred",
    id_col: str = "doc_id",
    salt: str = "sample1",
) -> DataFrame:
    """Deterministic stratified sampling — training-data mixture control.

    Keeps a row iff md5(salt || id) mod 10^6 < fraction * 10^6 for its
    stratum. Unlike Bernoulli `sample()`, this is reproducible across
    engines and runs (no RNG state), stable under re-partitioning, and a
    row's fate never changes when other rows appear — the property that
    lets incremental pipeline runs extend a sample instead of redrawing it.
    Strata missing from ``fractions`` are dropped.
    """
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string"))), 1, 15), 16, 10)
        .cast("long")
        % 1_000_000
    )
    frac = None
    for stratum, p in sorted(fractions.items()):
        cond = F.when(F.col(strata_col) == stratum, F.lit(int(p * 1_000_000)))
        frac = cond if frac is None else frac.when(F.col(strata_col) == stratum, F.lit(int(p * 1_000_000)))
    frac = frac.otherwise(F.lit(0)) if frac is not None else F.lit(0)
    return df.filter(bucket < frac)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "wsample1",
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement (top-k of
    Efraimidis-Spirakis A-Res keys): each row draws u = md5-uniform in
    (0, 1] and survives by key = u^(1/w) — the k largest keys are a
    weighted sample where inclusion probability tracks the weight (e.g.
    quality-weighted corpus selection).

    Same md5-draw discipline as :func:`hash_sample`: reproducible across
    engines/runs, stable under repartitioning, and append-stable — a new
    row displaces at most the boundary row instead of redrawing the
    sample.  Keys are rounded (12 dp) BEFORE ordering with an id tiebreak
    so the k-boundary cannot flip between engines (the repo-wide
    rounded-top-k rule).  Rows with weight <= 0 are excluded.

    Scale: map-only key computation + TakeOrderedAndProject — per-
    partition heaps, no global sort, no shuffle of the corpus.
    Returns df columns + ws_key.
    """
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
    )
    # long add BEFORE the double cast, matching the oracle's evaluation
    # order exactly (h is near 2^60 where double rounding is coarse)
    u = (h + F.lit(1)).cast("double") / F.lit(float(16**15 + 1))
    key = F.round(F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double")), 12)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("ws_key", key)
        .orderBy(F.col("ws_key").desc(), F.col(id_col).asc())
        .limit(k)
    )


def token_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Shannon entropy (bits) of each doc's whitespace-token distribution —
    the information-density quality signal: keyword-stuffed/repetitive docs
    score near 0, fluent text scores high.  Complements repetition_score
    (which captures only the mode token and the distinct ratio).

    Token-level rather than char-level on purpose: whitespace
    tokenization is bit-identical across engines on any UTF-8 text (the
    proven _TOKS_NORM twin), while per-character splitting disagrees
    between UTF-16 code units (JVM) and codepoints (DuckDB) on non-ASCII.

    Two map-side-combined aggregations keyed by (doc, token) then (doc):
    shuffle volume is |distinct (doc, token)| then |docs|.  Empty docs
    drop (no distribution).  Returns (id, n_tokens, entropy).
    """
    df = ensure_parallelism(df)
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    t = F.when(
        F.trim(F.col(text_col)) != "", F.split(norm, r"\s+")
    ).otherwise(F.array().cast("array<string>"))
    tok = df.select(F.col(id_col), F.explode(t).alias("term"))
    cnt = tok.groupBy(id_col, "term").agg(F.count("*").cast("double").alias("__n"))
    return (
        cnt.groupBy(id_col)
        .agg(
            F.sum("__n").cast("long").alias("n_tokens"),
            F.round(
                F.log2(F.sum("__n"))
                - F.sum(F.col("__n") * F.log2("__n")) / F.sum("__n"),
                6,
            ).alias("entropy"),
        )
    )


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 100,
) -> DataFrame:
    """Corpus-scale adjacent-token-pair frequencies — the counting step of
    one BPE merge round (the most frequent pair is the next merge).

    Normalized whitespace tokens; adjacent pairs are built in-row by
    zipping the array against its own 1-shift (``zip_with`` over two
    ``slice``s), exploded, and counted by ONE map-side-combined groupBy,
    so the shuffle carries |distinct pairs| partial counts, not one row
    per corpus position.  Top-k is TakeOrdered with a full deterministic
    tiebreak (count desc, then pair lexicographically) so engines agree
    on the boundary.

    NOT the index-generation form (``transform(sequence(1, n-1),
    i -> element_at(t, i))``): every ``element_at`` reference inlines the
    underlying ``split`` expression, so that shape re-splits the document
    once per token position — O(tokens²) per doc, measured 21.5 s vs
    0.35 s at sf0.1.  The two ``slice`` operands evaluate the split a
    constant number of times per row.
    """
    df = ensure_parallelism(df)
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    t = F.split(norm, r"\s+")
    n1 = F.greatest(F.size(t) - 1, F.lit(0))
    prs = F.when(
        (F.trim(F.col(text_col)) != "") & (F.size(t) >= 2),
        F.zip_with(
            F.slice(t, F.lit(1), n1),
            F.slice(t, F.lit(2), n1),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    return (
        df.select(F.explode(prs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count("*").alias("n_pairs"))
        .orderBy(F.col("n_pairs").desc(), "a", "b")
        .limit(top_k)
    )


#: Symbol wrappers for :func:`bpe_train` word representations.  Each BPE
#: symbol is stored as ``\x02<sym>\x03``, so a merge of the adjacent pair
#: (a, b) is ONE literal string replace of ``\x02a\x03\x02b\x03`` with
#: ``\x02ab\x03`` — adjacent matches share no characters, which makes
#: engine replace-all (left-to-right, non-overlapping) EXACTLY the greedy
#: single-scan merge that reference BPE trainers apply.  (A delimiter-
#: joined encoding would make adjacent merges overlap on the shared
#: delimiter and diverge from greedy on odd runs of a self-pair.)
_BPE_SOW = "\x02"
_BPE_EOW = "\x03"
_BPE_END = "#"  # end-of-word marker; word chars are [a-z], so unambiguous


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    merges: int = 3,
) -> DataFrame:
    """Distributed BPE vocabulary training (Sennrich-style merge learning):
    ``merges`` rounds of (count adjacent symbol pairs over the word vocab,
    weighted by word frequency) -> (argmax pair, deterministic tiebreak)
    -> (apply the merge to every word) -> repeat.

    Returns the learned merge table: one row per round with
    (merge_round, sym_a, sym_b, merged, n_pairs).

    Scale shape — the classic trick that makes corpus-scale BPE cheap:
    after ONE initial shuffle that collapses the corpus to its distinct
    word vocabulary with counts, every round touches only |vocab| rows.
    Per round: a map-side-combined pair aggregation (shuffle carries
    |distinct pairs| partials, not corpus positions), a TakeOrdered(1)
    argmax, and a broadcast of that single row back over the vocab
    (crossJoin of a 1-row side) for a map-only string replace.  Rounds are
    inherently sequential; each intermediate is lazily localCheckpointed so
    round k's vocab materializes once instead of re-deriving rounds 1..k-1
    per downstream use.

    Everything is deterministic (no RNG; total argmax tiebreak on
    count desc, then pair lexicographically) and every operation is a
    portable string op, so a fixed ``merges`` unrolls into an exact DuckDB
    oracle (__spark_entry__._bpe_train_sql).  Words are lowercase ``[a-z]+``
    runs; initial symbols are single characters plus a ``#`` end-of-word
    marker.
    """
    df = ensure_parallelism(df)
    words = df.select(
        F.explode(F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")).alias("word")
    )
    vocab = words.groupBy("word").agg(F.count("*").alias("cnt")).select(
        F.concat(
            F.regexp_replace("word", "(.)", _BPE_SOW + "$1" + _BPE_EOW),
            F.lit(_BPE_SOW + _BPE_END + _BPE_EOW),
        ).alias("repr"),
        "cnt",
    )
    bests, _ = _bpe_rounds(vocab, merges)
    out = [
        best.select(
            F.lit(rnd).alias("merge_round"),
            F.col("a").alias("sym_a"),
            F.col("b").alias("sym_b"),
            F.concat("a", "b").alias("merged"),
            "n_pairs",
        )
        for rnd, best in enumerate(bests, 1)
    ]
    res = out[0]
    for o in out[1:]:
        res = res.unionAll(o)
    return res.orderBy("merge_round")


def _bpe_rounds(vocab: DataFrame, merges: int) -> tuple[list[DataFrame], DataFrame]:
    """The shared merge loop: returns ([argmax row per round], final
    vocab with ALL merges applied). The input vocab and each round's
    argmax and merged vocab are lazily localCheckpointed so round k
    materializes rounds 1..k-1 (and the corpus word-collapse) exactly
    once — without the input checkpoint the corpus explode re-runs for
    every consumer of round-0 vocab (measured 2x at the sf1 soak)."""
    bests: list[DataFrame] = []
    vocab = vocab.localCheckpoint(eager=False)
    for _ in range(merges):
        syms = F.split(
            F.expr("substring(repr, 2, length(repr) - 2)"), _BPE_EOW + _BPE_SOW
        )
        n1 = F.greatest(F.size(syms) - 1, F.lit(0))
        prs = F.zip_with(
            F.slice(syms, F.lit(1), n1),
            F.slice(syms, F.lit(2), n1),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        )
        best = (
            vocab.filter(F.size(syms) >= 2)
            .select(F.explode(prs).alias("p"), "cnt")
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("n_pairs"))
            .orderBy(F.col("n_pairs").desc(), "a", "b")
            .limit(1)
            .localCheckpoint(eager=False)
        )
        bests.append(best)
        vocab = (
            vocab.crossJoin(F.broadcast(best.select("a", "b")))
            .select(
                F.replace(
                    F.col("repr"),
                    F.concat(
                        F.lit(_BPE_SOW), "a", F.lit(_BPE_EOW),
                        F.lit(_BPE_SOW), "b", F.lit(_BPE_EOW),
                    ),
                    F.concat(F.lit(_BPE_SOW), "a", "b", F.lit(_BPE_EOW)),
                ).alias("repr"),
                "cnt",
            )
            .localCheckpoint(eager=False)
        )
    return bests, vocab


def bpe_encode_stats(
    df: DataFrame,
    text_col: str = "text",
    merges: int = 4,
) -> DataFrame:
    """Corpus tokenization stats under a freshly trained ``merges``-round
    BPE vocab: one row (n_words, n_base_symbols, n_tokens, compression).

    The encode step never touches the corpus again: applying learned
    merges word-by-word is a function of the WORD alone, so it runs over
    the |vocab| distinct-word table and the corpus totals come out of the
    word counts (sum(cnt * symbols_per_word)) — the same vocab-collapse
    trick that makes the training loop cheap. ``compression`` =
    base symbols (chars + end-of-word) per post-merge token, the usual
    fertility-style measure of how much the merges bought.
    """
    df = ensure_parallelism(df)
    words = df.select(
        F.explode(F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")).alias("word")
    )
    vocab = words.groupBy("word").agg(F.count("*").alias("cnt")).select(
        F.concat(
            F.regexp_replace("word", "(.)", _BPE_SOW + "$1" + _BPE_EOW),
            F.lit(_BPE_SOW + _BPE_END + _BPE_EOW),
        ).alias("repr"),
        "cnt",
    )
    _, final_vocab = _bpe_rounds(vocab, merges)
    n_syms = lambda c: F.size(  # noqa: E731
        F.split(F.expr(f"substring({c}, 2, length({c}) - 2)"), _BPE_EOW + _BPE_SOW)
    )
    base = vocab.agg(
        F.sum("cnt").alias("n_words"),
        F.sum(F.col("cnt") * n_syms("repr")).cast("bigint").alias("n_base_symbols"),
    )
    enc = final_vocab.agg(
        F.sum(F.col("cnt") * n_syms("repr")).cast("bigint").alias("n_tokens")
    )
    return base.crossJoin(enc).select(
        "n_words",
        "n_base_symbols",
        "n_tokens",
        F.round(F.col("n_base_symbols") / F.col("n_tokens"), 6).alias("compression"),
    )


# Gopher rule thresholds (Rae et al. 2021) — single home shared by
# gopher_rules (the keep flag) and gopher_gate_report (per-rule fail
# fractions), so the report can never drift from the gate (r6 ADVICE).
GOPHER_MEAN_WL_MIN = 3.0
GOPHER_MEAN_WL_MAX = 10.0
GOPHER_SYMBOL_MAX = 0.1
GOPHER_BULLET_MAX = 0.9
GOPHER_ELLIPSIS_MAX = 0.3
GOPHER_ALPHA_MIN = 0.8
GOPHER_STOPS_MIN = 2


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """The Gopher repetition-free quality rules (Rae et al. 2021, publicly
    documented): word-count bounds, mean-word-length in [3, 10], symbol-
    to-word ratio (#/…) <= 0.1, <= 90% bullet-point lines, <= 30%
    ellipsis-ending lines, >= 80% of words containing an alphabetic
    character, and >= 2 distinct common-English stopwords. Returns every
    doc with its rule metrics and the composite ``keep`` flag (report
    form — the filter is one extra predicate).

    Map-only: every rule is regex/length/array arithmetic on the row, no
    shuffle anywhere; ratios are rounded to 4 before thresholding so both
    engines cut identically.  ``extra_cols`` pass through untouched (so a
    downstream stratum aggregate needs no join back — which also keeps
    the gate STREAMABLE: map + one agg, no stream-stream join).
    """
    df = ensure_parallelism(df)
    c = F.col(text_col)
    df = df.withColumn("_toks", tokens(c)).withColumn(
        "_lines", F.split(c, "\n")
    )
    toks, lines = F.col("_toks"), F.col("_lines")
    n_words = F.size(toks)
    mean_wl = F.round(
        F.when(
            n_words > 0,
            F.length(F.regexp_replace(c, r"\s", "")).cast("double") / n_words,
        ).otherwise(F.lit(0.0)),
        4,
    )
    symbol_ratio = F.round(
        F.when(
            n_words > 0,
            F.size(F.regexp_extract_all(c, F.lit("[#…]"), F.lit(0))).cast("double")
            / n_words,
        ).otherwise(F.lit(0.0)),
        4,
    )
    bullet_frac = F.round(
        F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]"))).cast("double")
        / F.size(lines),
        4,
    )
    ellipsis_frac = F.round(
        F.size(F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$"))).cast("double")
        / F.size(lines),
        4,
    )
    alpha_frac = F.round(
        F.when(
            n_words > 0,
            F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))).cast("double")
            / n_words,
        ).otherwise(F.lit(0.0)),
        4,
    )
    stop_hits = F.size(
        F.array_intersect(
            F.transform(toks, F.lower),
            F.array(*[F.lit(s) for s in STOPWORDS_EN]),
        )
    )
    out = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_frac"),
        ellipsis_frac.alias("ellipsis_frac"),
        alpha_frac.alias("alpha_frac"),
        stop_hits.alias("stop_hits"),
        *[F.col(c) for c in (extra_cols or [])],
    )
    keep = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= GOPHER_MEAN_WL_MIN)
        & (F.col("mean_word_len") <= GOPHER_MEAN_WL_MAX)
        & (F.col("symbol_ratio") <= GOPHER_SYMBOL_MAX)
        & (F.col("bullet_frac") <= GOPHER_BULLET_MAX)
        & (F.col("ellipsis_frac") <= GOPHER_ELLIPSIS_MAX)
        & (F.col("alpha_frac") >= GOPHER_ALPHA_MIN)
        & (F.col("stop_hits") >= GOPHER_STOPS_MIN)
    )
    return out.withColumn("keep", keep)


def gopher_gate_report(
    df: DataFrame,
    strata_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Per-stratum rule-level kill rates for the Gopher gate — the "WHY
    was my data dropped" observability a curation pipeline publishes next
    to its keep counts: one row per stratum with the fraction of docs
    failing EACH rule plus the composite keep rate, so a collapsed source
    points at the specific rule (too-short docs vs symbol spam vs missing
    stopwords) instead of a single opaque keep number.

    Fail fractions are over all docs of the stratum (rules fire
    independently; they can sum past 1).  Scale: the map-only
    :func:`gopher_rules` metrics (the stratum rides along as an
    ``extra_cols`` passthrough — no join back) + one |strata|-row
    map-side-combined aggregate.  Join-free map + one agg also makes
    this report STREAMABLE as-is: run it on a ``readStream`` frame in
    complete output mode and every micro-batch leaves the per-stratum
    rates equal to the batch report over everything ingested (locked by
    test_stream_gopher_gate_matches_batch).
    """
    j = gopher_rules(
        df, text_col, id_col, min_words, max_words, extra_cols=[strata_col]
    )

    def frac(cond):
        return F.round(F.avg(cond.cast("int")), 6)

    return j.groupBy(strata_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        frac(
            (F.col("n_words") < min_words) | (F.col("n_words") > max_words)
        ).alias("fail_words"),
        frac(
            (F.col("mean_word_len") < GOPHER_MEAN_WL_MIN)
            | (F.col("mean_word_len") > GOPHER_MEAN_WL_MAX)
        ).alias("fail_word_len"),
        frac(F.col("symbol_ratio") > GOPHER_SYMBOL_MAX).alias("fail_symbol"),
        frac(F.col("bullet_frac") > GOPHER_BULLET_MAX).alias("fail_bullet"),
        frac(F.col("ellipsis_frac") > GOPHER_ELLIPSIS_MAX).alias("fail_ellipsis"),
        frac(F.col("alpha_frac") < GOPHER_ALPHA_MIN).alias("fail_alpha"),
        frac(F.col("stop_hits") < GOPHER_STOPS_MIN).alias("fail_stops"),
        frac(F.col("keep")).alias("keep_rate"),
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_k: int = 50_000,
) -> DataFrame:
    """Per-doc mean unigram negative log2-probability — the cheap
    perplexity proxy a CCNet-style LM quality filter thresholds on
    (gibberish and boilerplate score high, fluent text low).

    The corpus LM is its own unigram distribution: term frequencies from
    one map-side-combined groupBy (|vocab| rows shuffle, not positions),
    capped to the ``vocab_k`` most frequent terms (deterministic
    tiebreak), broadcast to the scoring join; out-of-vocab tokens get the
    floor probability 1/total. Per-doc scoring is explode → broadcast
    join → one groupBy(doc) with partial aggregation. Returns
    (id, n_tokens, nll); docs with zero tokens drop (no distribution to
    score against).
    """
    df = ensure_parallelism(df)
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    t = F.when(
        F.trim(F.col(text_col)) != "", F.split(norm, r"\s+")
    ).otherwise(F.array().cast("array<string>"))
    from . import _persist_scoped

    tok = df.select(F.col(id_col), F.explode(t).alias("term"))
    # freq is consumed twice (the grand total + the top-k vocab cut);
    # unpinned, the full tokenize + term shuffle ran once per consumer
    # (r13).  One row per distinct term — the LM table a CCNet-style
    # build materializes anyway; persist spills to disk at corpus scale.
    freq = _persist_scoped(
        tok.groupBy("term").agg(F.count("*").cast("double").alias("__cnt"))
    )
    total = freq.agg(F.sum("__cnt").alias("__total"))
    vocab = freq.orderBy(F.col("__cnt").desc(), "term").limit(vocab_k)
    lp = -F.log2(F.coalesce(F.col("__cnt"), F.lit(1.0)) / F.col("__total"))
    return (
        tok.join(F.broadcast(vocab), "term", "left")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(lp), 4).alias("nll"),
        )
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
    salt: str = "pack1",
) -> DataFrame:
    """Assign documents to fixed-length training sequences (chunks).

    Global document order is the deterministic (md5-bucket, id) sort; each
    doc's whitespace-token span [start_tok, start_tok + n_tokens) maps to
    chunks ``chunk_first = start div L`` .. ``chunk_last`` — the packing
    table a tokenize-and-pack job shards its writers by.

    Scale shape — the global running token offset is a TWO-PHASE prefix
    sum, not one global window (which would serialize the corpus into a
    single partition): phase 1 cumsums within each of ``buckets`` md5
    buckets (parallel windows); phase 2 running-sums the per-bucket totals
    — a |buckets|-row window, bounded by construction — and broadcasts
    each bucket's base offset back. Returns (id, n_tokens, start_tok,
    chunk_first, chunk_last).
    """
    from pyspark.sql import Window

    from . import _persist_scoped

    # the tokenized-count frame feeds both the within-bucket cumsum and
    # the per-bucket totals; pin so the corpus tokenize runs once (r13).
    # Narrow (id, n_tokens, bucket) rows, no text.
    d = _persist_scoped(
        ensure_parallelism(df).select(
            F.col(id_col),
            F.size(tokens(F.col(text_col))).alias("n_tokens"),
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string"))),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long")
                % buckets
            ).alias("__bkt"),
        )
    )
    w_in = (
        Window.partitionBy("__bkt")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("__run", F.sum("n_tokens").over(w_in))
    totals = d.groupBy("__bkt").agg(F.sum("n_tokens").alias("__tot"))
    w_b = (
        Window.orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = totals.withColumn("__base", F.sum("__tot").over(w_b) - F.col("__tot"))
    start = F.col("__base") + F.col("__run") - F.col("n_tokens")
    return (
        d.join(F.broadcast(base.select("__bkt", "__base")), "__bkt")
        .select(
            id_col,
            "n_tokens",
            start.alias("start_tok"),
            F.expr(f"(__base + __run - n_tokens) div {int(seq_len)}").alias(
                "chunk_first"
            ),
            F.expr(
                f"(__base + __run - n_tokens + greatest(n_tokens, 1) - 1) "
                f"div {int(seq_len)}"
            ).alias("chunk_last"),
        )
    )


def rebalance_sample(
    df: DataFrame,
    target_shares: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "rebal1",
) -> DataFrame:
    """Downsample strata to a TARGET MIXTURE, deterministically.

    Where :func:`hash_sample` takes per-stratum fractions as given,
    this derives them from the corpus itself: the largest total the data
    can support at the target mixture is ``T = min_s(count_s / share_s)``
    (the binding stratum survives whole); every stratum then keeps
    ``f_s = share_s * T / count_s`` of its rows. The keep rule is the
    same md5-bucket draw as hash_sample — reproducible across engines,
    stable under repartitioning, append-stable. Strata absent from
    ``target_shares`` are dropped.

    Fully distributed: the only aggregation is the per-stratum count
    (|strata| rows), broadcast back onto the corpus — the 100 TB side is
    touched by exactly one map-side filter pass.
    """
    spark = df.sparkSession
    shares = spark.createDataFrame(
        sorted(target_shares.items()), f"{strata_col} string, __share double"
    )
    from . import _persist_scoped

    counts = df.groupBy(strata_col).agg(F.count("*").cast("double").alias("__c"))
    # joined feeds both the binding-stratum total and the keep-fraction
    # select; unpinned, the per-stratum corpus count ran twice (r13).
    joined = _persist_scoped(counts.join(shares, strata_col, "inner"))
    total = joined.agg(F.min(F.col("__c") / F.col("__share")).alias("__t"))
    keep = (
        joined.crossJoin(F.broadcast(total))
        .select(
            strata_col,
            (F.col("__share") * F.col("__t") / F.col("__c")).alias("__keep"),
        )
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 1_000_000
    )
    return (
        df.join(F.broadcast(keep), strata_col)
        .filter(bucket < F.col("__keep") * 1_000_000)
        .select(*df.columns)
    )


def winnow_fingerprints(
    df: DataFrame, text_col: str = "text", k: int = 8, window: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., MOSS): hash every
    char k-gram of the normalized text, then keep the MINIMUM hash of each
    sliding window of ``window`` consecutive k-grams — the classic
    rolling-hash fingerprint family that guarantees any shared substring of
    length >= k + window - 1 yields a shared fingerprint.

    Pure built-in expressions (sequence/transform/slice/array_min): one
    narrow projection + one explode, map-side distinct before the shuffle.
    Returns (doc_id, fp) — fp is a 60-bit portable integer hash.
    """
    df = ensure_parallelism(df)
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    d = df.select("doc_id", norm.alias("_n"))
    n = F.length(F.col("_n"))
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(k - 1)),
            lambda i: F.conv(
                F.substring(F.md5(F.col("_n").substr(i, F.lit(k))), 1, 15), 16, 10
            ).cast("long"),
        ),
    ).otherwise(F.array().cast("array<long>"))
    d = d.select("doc_id", grams.alias("_g"))
    m = F.size(F.col("_g"))
    fps = F.when(
        m >= window,
        F.transform(
            F.sequence(F.lit(1), m - F.lit(window - 1)),
            lambda j: F.array_min(F.slice(F.col("_g"), j, window)),
        ),
    ).otherwise(F.col("_g"))
    return d.select(
        "doc_id", F.explode(F.array_distinct(fps)).alias("fp")
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints:

    - ``fp_md5``: md5 of whitespace-normalized lowercased text (exact-dup key)
    - ``fp_head``: first-64-chars fingerprint (cheap prefix clustering)
    """
    df = ensure_parallelism(df)
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return df.select(
        "doc_id",
        F.md5(norm).alias("fp_md5"),
        F.md5(F.substring(norm, 1, 64)).alias("fp_head"),
    )


# ------------------------------------------------- benchmark decontamination

NGRAM_SEP = "\x1f"  # unit separator — cannot occur inside whitespace tokens


def ngram_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 8
) -> DataFrame:
    """(id, gram) — DISTINCT word n-gram md5 fingerprints per doc, any n.

    md5 over the n normalized tokens joined by a separator: one hash per
    position, portable to any engine, collision-free at 128 bits (unlike
    the 61-bit arithmetic shingles capped at n=3 by int64 headroom). All
    map-side: tokenize -> positional transform -> array_distinct ->
    explode; nothing shuffles here.
    """
    from .dedup import normalize_text

    df = ensure_parallelism(df).filter(
        F.size(tokens(normalize_text(F.col(text_col)))) >= F.lit(n)
    )
    d = df.select(F.col(id_col), tokens(normalize_text(F.col(text_col))).alias("_t"))
    m = F.size(F.col("_t"))
    # totality guard stays inside the expression (optimizer clones it into
    # predicates on unfiltered rows — the established ANSI sequence() trap)
    grams = F.when(
        m >= n,
        F.transform(
            F.sequence(F.lit(1), m - F.lit(n - 1)),
            lambda i: F.md5(F.array_join(F.slice(F.col("_t"), i, n), NGRAM_SEP)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return d.select(
        F.col(id_col), F.explode_outer(F.array_distinct(grams)).alias("gram")
    ).filter(F.col("gram").isNotNull())


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    bench_id_col: str | None = None,
    n: int = 8,
    min_shared: int = 1,
) -> DataFrame:
    """Benchmark decontamination: (doc_id, n_shared) for every corpus doc
    sharing >= ``min_shared`` distinct word n-grams with ANY benchmark doc
    — the standard eval-leakage filter for training corpora (13-gram
    overlap in GPT-3/Pile writeups; n is a knob here).

    100 TB shape: the benchmark side is tiny (eval sets are thousands of
    docs, the corpus is billions) — its distinct gram set is BROADCAST, so
    the corpus never shuffles for the join; the only exchange is the final
    per-doc count, map-side combined to one row per contaminated doc.
    """
    corpus = ngram_fingerprints(docs, text_col, id_col, n)
    bench = ngram_fingerprints(
        benchmark, bench_text_col or text_col, bench_id_col or id_col, n
    ).select("gram").distinct()
    return (
        corpus.join(F.broadcast(bench), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def decontaminate_bloom(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    bench_id_col: str | None = None,
    n: int = 8,
    min_shared: int = 1,
    m_bits: int = 1 << 20,
    num_hashes: int = 2,
) -> DataFrame:
    """Bloom-prefiltered decontamination — output identical to
    :func:`decontaminate` (same oracle twin).

    :func:`decontaminate` broadcasts the raw benchmark gram set, which is
    right while eval suites are small. When the bench side is too big to
    broadcast (corpus-vs-corpus decontamination, multi-GB suites), this
    variant broadcasts a FIXED-SIZE Bloom bitmap instead: ``m_bits`` bits
    packed as ``m_bits/64`` longs (2^20 bits = 16 KiB of payload) no
    matter how many grams feed it. Corpus grams probe the broadcast
    word-table with ``num_hashes`` independent xxhash64 probes — map-side,
    no corpus shuffle — and only bloom survivors (true hits + the fp
    sliver) reach the exact gram join that removes false positives, so
    the big shuffle join's probe side shrinks from |corpus grams| to
    |survivors|. The bloom hashes never cross engines (the prefilter is
    semantics-transparent), so they can be fast native xxhash64 rather
    than the portable md5 idiom.
    """
    corpus = ngram_fingerprints(docs, text_col, id_col, n)
    bench = ngram_fingerprints(
        benchmark, bench_text_col or text_col, bench_id_col or id_col, n
    ).select("gram").distinct()

    def pos(i: int) -> Column:
        return F.pmod(F.xxhash64("gram", F.lit(i)), F.lit(m_bits))

    words = (
        bench.select(
            F.explode(F.array(*[pos(i) for i in range(num_hashes)])).alias("_pos")
        )
        .select(
            F.shiftright("_pos", 6).alias("_widx"),
            F.expr("shiftleft(1L, cast(_pos % 64 as int))").alias("_mask"),
        )
        .groupBy("_widx")
        .agg(F.bit_or("_mask").alias("_word"))
    )
    cand = corpus
    for i in range(num_hashes):
        probe = words.select(
            F.col("_widx").alias(f"_w{i}"), F.col("_word").alias(f"_bits{i}")
        )
        cand = (
            cand.withColumn("_pos", pos(i))
            .withColumn(f"_w{i}", F.shiftright("_pos", 6))
            .join(F.broadcast(probe), f"_w{i}")
            .filter(
                F.expr(f"_bits{i} & shiftleft(1L, cast(_pos % 64 as int))") != 0
            )
            .drop("_pos", f"_w{i}", f"_bits{i}")
        )
    return (
        cand.join(bench, "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def decontaminate_keep(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_shared: int = 1,
) -> DataFrame:
    """The clean corpus: docs minus contaminated ones (left anti join on
    the decontamination hit list)."""
    hits = decontaminate(docs, benchmark, text_col, id_col, n=n, min_shared=min_shared)
    return docs.join(hits.select(id_col), id_col, "left_anti")


def ngram_coverage(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    bench_id_col: str | None = None,
    n: int = 5,
) -> DataFrame:
    """Eval-coverage report — the aggregate complement to
    :func:`decontaminate`: what fraction of the benchmark's DISTINCT word
    n-grams occur anywhere in the corpus.  Decontamination asks "which
    training docs leak the eval set"; this asks the reporting question
    the GPT-3/Pile overlap appendices answer corpus-wide: "how much of
    the eval set is covered at all" — near-0 means the eval is genuinely
    held out, near-1 means eval-set memorization is structurally possible
    and the per-doc filter is load-bearing.

    Returns ONE row: (n_bench_grams, n_covered, coverage[6dp]).

    100 TB shape: the benchmark gram set is tiny and BROADCAST into a
    join against the corpus gram stream (map-side, no corpus shuffle);
    the distinct-covered count then aggregates at most |bench| gram
    hashes per partition (map-side combined), so the only exchange
    carries <= |bench grams| rows regardless of corpus size.
    """
    bench = ngram_fingerprints(
        benchmark, bench_text_col or text_col, bench_id_col or id_col, n
    ).select("gram").distinct()
    covered = (
        ngram_fingerprints(corpus, text_col, id_col, n)
        .select("gram")
        .join(F.broadcast(bench), "gram")
        .distinct()
        .agg(F.count("*").cast("long").alias("n_covered"))
    )
    totals = bench.agg(F.count("*").cast("long").alias("n_bench_grams"))
    return totals.crossJoin(covered).select(
        "n_bench_grams",
        "n_covered",
        F.round(F.col("n_covered") / F.col("n_bench_grams"), 6).alias("coverage"),
    )


# ------------------------------------------------- normalization & self-dedup

def normalize_corpus(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical text normalization for dedup keys and downstream NLP:
    lowercase -> strip non-alphanumeric (keeping spaces) -> collapse
    whitespace -> trim. Emits the normalized text, its md5 (the exact-dup
    key after aggressive normalization — catches punctuation-only edits
    that ``fingerprint`` misses) and its token count.

    Pure regexp_replace chain: map-only, codegen'd, zero shuffles.
    """
    df = ensure_parallelism(df)
    c = F.lower(F.col(text_col))
    c = F.regexp_replace(c, r"[^a-z0-9\s]", "")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return df.select(
        "doc_id",
        c.alias("norm_text"),
        F.md5(c).alias("norm_hash"),
        F.when(c == "", F.lit(0)).otherwise(F.size(F.split(c, " "))).alias("n_norm_tokens"),
    )


def selfdedup_grams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Substring-level self-dedup à la Lee et al. 2022 ("Deduplicating
    Training Data Makes Language Models Better"), n-gram formulation:
    every distinct word n-gram is owned by the lowest doc_id containing
    it; a doc's duplication fraction is the share of its grams owned by an
    earlier doc. ``keep`` = dup_frac < threshold.

    The suffix-array original is inherently sequential; this n-gram owner
    pass is its scalable twin: ONE shuffle keyed on the gram hash where a
    whole-partition window computes min(doc_id) per gram, then one
    per-doc ratio shuffle. The window formulation beats the obvious
    owner-aggregate + self-join (measured 2x at sf0.1): a join re-runs
    the gram tokenize/hash pipeline once per side, while the window reads
    it once and WindowExec spills oversized gram groups instead of
    materializing per-gram lists. Gram keys are md5s — uniform, so the
    gram shuffle has no skew by construction.
    """
    grams = ngram_fingerprints(df, text_col, id_col, n)  # (id, distinct gram)
    w = Window.partitionBy("gram")
    per_doc = (
        grams.select(
            id_col,
            (F.min(id_col).over(w) < F.col(id_col)).cast("long").alias("_dup"),
        )
        .groupBy(id_col)
        .agg(F.count("*").alias("n_grams"), F.sum("_dup").alias("n_dup"))
    )
    dup_frac = F.round(F.col("n_dup") / F.col("n_grams"), 4)
    return per_doc.select(
        id_col,
        "n_grams",
        "n_dup",
        dup_frac.alias("dup_frac"),
        (dup_frac < F.lit(threshold)).alias("keep"),
    )


def corpus_report(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Mixture report per (lang, source): doc count, token mass, and each
    cell's share of total corpus tokens — the table a data-mixture owner
    reads before weighting sources.

    Two-level aggregation: the per-cell groupBy map-side combines; the
    total-token denominator is an unpartitioned window over the (tiny)
    cell table, not a second pass over the corpus.
    """
    cells = (
        ensure_parallelism(df)
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(tokens(F.col(text_col))).cast("long")).alias("n_tokens"),
        )
    )
    total = F.sum("n_tokens").over(Window.partitionBy())
    return cells.select(
        "lang",
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / total, 6).alias("token_share"),
    )


def bm25_rank(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 50,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 keyword retrieval: top-k docs for a bag of query terms.

    tf comes from one map-only pass (aggregate over the token array —
    no explode, no shuffle per term); df(term) and avgdl come from one
    tiny global aggregate that is BROADCAST back (scalar subquery shape),
    so the corpus is scanned twice and shuffled only for the final top-k,
    which compiles to TakeOrderedAndProject (per-partition heaps, no
    global sort).

    Scores are rounded to 4dp BEFORE ranking so the (score, id) order is
    reproducible across engines despite last-ulp log/divide noise.
    """
    from .dedup import normalize_text

    toks = tokens(normalize_text(F.col(text_col)))
    base = ensure_parallelism(df).select(
        F.col(id_col), toks.alias("_t"), F.size(toks).cast("double").alias("_dl")
    )
    for i, term in enumerate(terms):
        base = base.withColumn(
            f"_tf{i}",
            F.size(F.filter(F.col("_t"), lambda x: x == F.lit(term))).cast("double"),
        )
    stats = base.agg(
        F.count("*").cast("double").alias("_n"),
        F.sum("_dl").cast("double").alias("_suml"),
        *[F.sum((F.col(f"_tf{i}") > 0).cast("double")).alias(f"_df{i}") for i in range(len(terms))],
    )
    scored = base.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i in range(len(terms)):
        idf = F.log((F.col("_n") - F.col(f"_df{i}") + F.lit(0.5)) / (F.col(f"_df{i}") + F.lit(0.5)) + F.lit(1.0))
        tf = F.col(f"_tf{i}")
        denom = tf + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("_dl") / (F.col("_suml") / F.col("_n")))
        score = score + idf * (tf * F.lit(k1 + 1.0)) / denom
    return (
        scored.select(F.col(id_col), F.round(score, 4).alias("bm25"))
        .filter(F.col("bm25") > 0)
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(k)
    )


def cap_per_stratum(
    df: DataFrame,
    cap: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "cap1",
) -> DataFrame:
    """Per-stratum document cap (RefinedWeb-style per-domain cap): keep at
    most ``cap`` docs per stratum, chosen by a deterministic md5 draw so
    the survivors are an unbiased sample of the stratum and the choice is
    reproducible across engines/runs and stable under repartitioning.

    The kept rows carry ``strat_rank`` (1-based position in the stratum's
    draw order) so downstream stages can tighten the cap without
    re-ranking.

    Scale: the rank<=cap filter compiles to WindowGroupLimit with a
    PARTIAL pass before the stratum exchange (plan-locked,
    test_cap_per_stratum_is_window_group_limit) — every map task keeps
    only its cap-smallest draws per stratum, so the shuffle carries at
    most cap x tasks rows per stratum and a billion-page hot domain
    never lands raw on one partition. No ensure_parallelism round-robin:
    the per-row work here is one md5 (not compute-dense), and the partial
    heap shrinks a single-file input to <= cap x strata rows before the
    exchange anyway, so the extra shuffle buys nothing (A/B at 500k docs /
    32 files: equal within noise — ensure_parallelism passes through at
    >= defaultParallelism files, and the order-reversed rerun showed the
    first measurement's 1.8x gap was JIT warmup, not the exchange).
    """
    from pyspark.sql import Window

    draw = F.md5(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(draw.asc(), F.col(id_col).asc())
    return (
        df.withColumn("strat_rank", F.row_number().over(w))
        .filter(F.col("strat_rank") <= int(cap))
    )


def dsir_weights(
    df: DataFrame,
    target: DataFrame,
    buckets: int = 10_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir1",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every corpus
    doc by how target-like its hashed-unigram distribution is.

    Both the target subset and the raw corpus get a hashed unigram LM over
    ``buckets`` md5 buckets with add-1 smoothing; a doc's weight is the
    sum over its tokens of ``ln p_target(b) - ln p_raw(b)``. Selecting
    top-weight (or Gumbel-top-k) docs shifts the corpus mixture toward
    the target domain without a trained classifier.

    Scale shape: the two LMs are |buckets|-row aggregates (map-side
    combined), joined into one broadcast table of per-bucket log-ratios;
    the corpus is exploded to tokens, broadcast-joined, and summed per
    doc — one shuffle on ``id_col`` proportional to token count, same as
    :func:`unigram_logprob`. Per-token log-ratios are computed in doubles
    and the per-doc sum is rounded to 4dp (repo-wide engine-portability
    rule). Returns (id, n_tokens, dsir_w); zero-token docs drop.
    """
    from .dedup import normalize_text

    B = int(buckets)

    def tok_buckets(frame: DataFrame) -> DataFrame:
        t = tokens(normalize_text(F.col(text_col)))
        return ensure_parallelism(frame).select(
            F.col(id_col),
            F.explode(t).alias("__term"),
        ).select(
            F.col(id_col),
            (
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(salt + "|"), F.col("__term"))), 1, 15),
                    16,
                    10,
                ).cast("long")
                % B
            ).alias("__b"),
        )

    from . import _persist_scoped

    corpus_tok = tok_buckets(df)
    target_tok = tok_buckets(target)
    # Each LM count frame is consumed twice (its total + the log-ratio
    # join); unpinned, the full tokenize+explode of the corpus/target ran
    # once per consumer (3 corpus passes instead of the algorithm's 2).
    # <= |buckets| rows each, bounded.
    raw_cnt = _persist_scoped(
        corpus_tok.groupBy("__b").agg(F.count("*").cast("double").alias("__rc"))
    )
    tgt_cnt = _persist_scoped(
        target_tok.groupBy("__b").agg(F.count("*").cast("double").alias("__tc"))
    )
    # coalesce(total, 0): an EMPTY target must degrade to the uniform
    # add-1 prior (weight = ln(B/(R+B)) per token), not NULL weights
    raw_tot = raw_cnt.agg(F.coalesce(F.sum("__rc"), F.lit(0.0)).alias("__rt"))
    tgt_tot = tgt_cnt.agg(F.coalesce(F.sum("__tc"), F.lit(0.0)).alias("__tt"))
    lm = (
        raw_cnt.join(tgt_cnt, "__b", "outer")
        .crossJoin(F.broadcast(raw_tot))
        .crossJoin(F.broadcast(tgt_tot))
        .select(
            "__b",
            (
                F.log((F.coalesce(F.col("__tc"), F.lit(0.0)) + 1.0) / (F.col("__tt") + F.lit(float(B))))
                - F.log((F.coalesce(F.col("__rc"), F.lit(0.0)) + 1.0) / (F.col("__rt") + F.lit(float(B))))
            ).alias("__lr"),
        )
    )
    return (
        corpus_tok.join(F.broadcast(lm), "__b")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.sum("__lr"), 4).alias("dsir_w"),
        )
    )


def mixture_epochs(
    df: DataFrame,
    budget_tokens: int,
    max_epochs: float = 4.0,
    strata_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Data-constrained mixture plan (Muennighoff et al. 2023 repeat
    recipe): given a total training token budget split evenly across
    strata, compute how many EPOCHS of each stratum to run, capped at
    ``max_epochs`` (past ~4 repeats, marginal value of a repeat decays to
    noise). Emits one row per stratum: doc/token counts, its even-split
    target, the capped epoch multiplier (4dp), and the effective token
    contribution — the plan a shard-writer repeats each stratum by.

    Scale: one map-side-combined aggregate to |strata| rows; the budget
    arithmetic runs on that tiny frame. The corpus is scanned once.
    """
    from . import _persist_scoped

    # counts feeds both the stratum-count probe and the budget select;
    # unpinned, the full corpus tokenize-and-count ran once per consumer
    # (r13).  |strata| rows, bounded.
    counts = _persist_scoped(
        ensure_parallelism(df).groupBy(strata_col).agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(tokens(F.col(text_col)))).cast("double").alias("n_tokens"),
        )
    )
    n_strata = counts.agg(F.count("*").cast("double").alias("__ns"))
    return (
        counts.crossJoin(F.broadcast(n_strata))
        .select(
            strata_col,
            "n_docs",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(F.lit(float(budget_tokens)) / F.col("__ns"), 4).alias("target_tokens"),
            # zero-token strata (all-whitespace docs): target/0 is NULL and
            # least() skips NULLs, which would silently report the CAP for
            # a stratum that contributes nothing — emit 0.0 epochs instead
            # (mirrored in the oracle SQL's CASE)
            F.when(F.col("n_tokens") > 0, F.round(
                F.least(
                    F.lit(float(max_epochs)),
                    (F.lit(float(budget_tokens)) / F.col("__ns")) / F.col("n_tokens"),
                ),
                4,
            )).otherwise(F.lit(0.0)).alias("epochs"),
        )
        .withColumn(
            "effective_tokens",
            F.round(F.col("epochs") * F.col("n_tokens"), 4),
        )
    )


def length_budget(
    df: DataFrame,
    seq_len: int = 512,
    bin_width: int = 64,
    max_bin: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """Sequence-length budget report: docs bucketed by whitespace-token
    length, with the padding waste (tokens of pad if each doc were its
    own ``seq_len`` sequence, Lewis-style un-packed batching) and the
    truncation loss (tokens beyond one ``seq_len`` window) per bucket —
    the report that decides seq_len and whether packing is worth it for
    a corpus.

    Bins are [0, bin_width), [bin_width, 2*bin_width), ... capped at
    ``max_bin`` (the last bin is open-ended).  Returns one row per
    non-empty bin: (bin_lo, n_docs, n_tokens, pad_waste, trunc_loss).
    Scale: map-only token count + one bounded groupBy (<= max_bin + 1
    groups), map-side combined.
    """
    L = int(seq_len)
    d = ensure_parallelism(df).select(
        F.size(tokens(F.col(text_col))).alias("nt")
    )
    b = F.least(F.floor(F.col("nt") / bin_width), F.lit(int(max_bin)))
    pad = (F.ceil(F.col("nt") / F.lit(L)) * L - F.col("nt"))
    return (
        d.select(
            (b * bin_width).cast("long").alias("bin_lo"),
            F.col("nt"),
            # empty docs still occupy one padded sequence
            F.when(F.col("nt") == 0, F.lit(L)).otherwise(pad).alias("pad"),
            F.greatest(F.col("nt") - L, F.lit(0)).alias("trunc"),
        )
        .groupBy("bin_lo")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nt").alias("n_tokens"),
            F.sum("pad").alias("pad_waste"),
            F.sum("trunc").alias("trunc_loss"),
        )
    )


def vocab_coverage(
    df: DataFrame,
    vocab_sizes: list[int] = (100, 1000, 10000),
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary-size planning curve: for each candidate vocab size N,
    the fraction of the corpus token mass covered by the N most frequent
    terms — the head/tail report that picks a tokenizer vocab size (the
    knee of this curve is where marginal vocab entries stop paying for
    themselves).

    Terms rank by (count DESC, term ASC) so ties are engine-stable.
    Returns one row per N: (vocab_size, covered_tokens, total_tokens,
    coverage) with coverage rounded 6dp.

    Scale: term counts are ONE explode + map-side-combined groupBy
    (|vocab| rows, corpus-independent after that); then ONE distributed
    TakeOrdered at max(vocab_sizes) (per-partition heaps, no global sort
    shuffle) and every N's coverage is derived from that tiny
    (<= max N rows) frame — the counts subtree is never re-evaluated per
    N (the per-N union-of-limits formulation re-ran it |sizes| times).
    """
    sizes = sorted(int(n) for n in vocab_sizes)
    # Cardinality contract (r8 verdict #6): the rank window below is
    # bounded by max(vocab_sizes) BY CONSTRUCTION (the limit() feeds it
    # <= sizes[-1] rows via a distributed TakeOrdered), so the only way
    # to serialize a huge frame through it is to ASK for a huge N —
    # refuse that loudly at construct time instead.
    if sizes[-1] > 1_000_000:
        raise ValueError(
            f"vocab_coverage: max vocab_size {sizes[-1]} exceeds the "
            "1M-row single-task rank contract; shard the request"
        )
    d = ensure_parallelism(df).select(
        F.explode(tokens(F.col(text_col))).alias("term")
    )
    counts = d.groupBy("term").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").cast("long").alias("total_tokens"))
    topn = counts.orderBy(F.col("cnt").desc(), F.col("term").asc()).limit(sizes[-1])
    # rank within the <= max(N)-row top frame: the single-partition window
    # is bounded by construction (same contract as rrf_fuse's tiny sets)
    w = Window.orderBy(F.col("cnt").desc(), F.col("term").asc())
    ranked = topn.withColumn("__rn", F.row_number().over(w))
    per_n = ranked.select(
        F.explode(F.array(*[F.lit(n) for n in sizes])).alias("vocab_size"),
        "__rn",
        "cnt",
    ).filter(F.col("__rn") <= F.col("vocab_size"))
    cov = per_n.groupBy("vocab_size").agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("covered_tokens")
    )
    # a vocab size larger than the whole vocabulary still gets a row
    base = topn.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(n) for n in sizes])).alias("vocab_size")
    )
    return (
        base.join(cov, "vocab_size", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "vocab_size",
            F.coalesce("covered_tokens", F.lit(0)).alias("covered_tokens"),
            "total_tokens",
            F.round(
                F.coalesce("covered_tokens", F.lit(0)) / F.col("total_tokens"), 6
            ).alias("coverage"),
        )
    )


def term_pmi(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_pair_df: int = 5,
    top: int = 100,
    max_terms: int = 50,
) -> DataFrame:
    """Document-level pointwise mutual information of term pairs — the
    collocation / topic-structure report (Church & Hanks 1990): which
    terms co-occur in the same documents far more often than chance.

    Per doc the DISTINCT term list is sorted and capped at ``max_terms``
    (deterministic: the lexicographically first ``max_terms`` terms), so
    the per-doc pair fan-out is bounded by max_terms^2/2 regardless of
    document size — the cap that keeps this linear at corpus scale.
    pmi = ln(n_ab * N / (n_a * n_b)) over document frequencies, pairs
    with n_ab < ``min_pair_df`` dropped, top ``top`` by
    (pmi DESC, term_a, term_b) — rounded 6dp before ranking so ordering
    is engine-stable.  Returns (term_a, term_b, n_ab, pmi).

    Scale: one map pass builds the capped term lists; pair counts are an
    equi self-join on doc_id with per-doc bounded fan-out + one
    map-side-combined groupBy; term document frequencies broadcast back.
    """
    d = ensure_parallelism(df).select(
        F.col(id_col).alias("__d"),
        F.slice(
            F.array_sort(F.array_distinct(tokens(F.col(text_col)))), 1, max_terms
        ).alias("ts"),
    )
    n_docs = d.agg(F.count("*").cast("double").alias("__N"))
    e = d.select("__d", F.explode("ts").alias("t"))
    uni = e.groupBy("t").agg(F.count("*").alias("n_t"))
    pairs = (
        e.alias("x")
        .join(e.alias("y"), "__d")
        .filter(F.col("x.t") < F.col("y.t"))
        .groupBy(F.col("x.t").alias("term_a"), F.col("y.t").alias("term_b"))
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair_df)
    )
    ua = uni.select(F.col("t").alias("term_a"), F.col("n_t").alias("n_a"))
    ub = uni.select(F.col("t").alias("term_b"), F.col("n_t").alias("n_b"))
    return (
        pairs.join(F.broadcast(ua), "term_a")
        .join(F.broadcast(ub), "term_b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term_a",
            "term_b",
            "n_ab",
            F.round(
                F.log(F.col("n_ab") * F.col("__N") / (F.col("n_a") * F.col("n_b"))),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "term_a", "term_b")
        .limit(top)
    )


def bigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc add-1-smoothed bigram negative log-likelihood — the LM
    quality signal one order above :func:`unigram_logprob` (CCNet-style
    perplexity filtering; a bigram model penalizes scrambled word order
    that a unigram model cannot see).

    P(w2|w1) = (n12 + 1) / (n1 + V) with V = distinct unigram count;
    per-doc nll = -mean ln P over its bigram positions (docs with < 2
    tokens emit 0 bigrams and nll 0.0).  Returns (id, n_bigrams,
    bigram_nll) rounded 4dp.

    Scale (r13 rewrite): bigram positions are built MAP-SIDE from the
    bound token array (the doc_shingles idiom) — the previous
    posexplode + lag-window form shuffled and sorted the whole position
    stream on doc id once PER CONSUMER (counts, unigram contexts, and
    the scoring stream each re-derived the window; 3 corpus-stream
    shuffles).  Now the stream never shuffles: bigram counts are ONE
    map-side-combined groupBy, the unigram context count folds from the
    bigram-count frame itself (n1 = sum of n12 over w2 — the identity,
    not another corpus pass), and scoring re-derives the map-side
    stream against broadcast count frames (at open-vocabulary scale,
    hash the bigram to a fixed bucket space first — the dsir_weights
    recipe — so the broadcast stays bounded).  Per-row values and
    per-doc fold order are unchanged: bigrams are emitted in position
    order inside the same map partition the window form kept them in.
    """
    d0 = ensure_parallelism(df).select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    )
    t = F.col("_toks")
    # guard stays INSIDE the expression (InferFiltersFromGenerate can
    # clone it onto unfiltered rows, where sequence(2, 1) descends and
    # element_at faults under ANSI — the doc_shingles rule)
    bigrams = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(2), F.size(t)),
            lambda i: F.struct(
                F.element_at(t, i - 1).alias("w1"), F.element_at(t, i).alias("w2")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bi = (
        d0.select(F.col(id_col), F.explode_outer(bigrams).alias("b"))
        .filter(F.col("b").isNotNull())
        .select(id_col, F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    counts = bi.groupBy("w1", "w2").agg(F.count("*").alias("n12"))
    uni = counts.groupBy("w1").agg(F.sum("n12").alias("n1"))
    vocab = d0.select(
        F.col(id_col), F.explode_outer("_toks").alias("w")
    ).filter(F.col("w").isNotNull()).agg(
        F.count_distinct("w").cast("double").alias("__V")
    )
    scored = (
        bi.join(F.broadcast(counts), ["w1", "w2"])
        .join(F.broadcast(uni), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.log(
                (F.col("n12") + F.lit(1.0)) / (F.col("n1") + F.col("__V"))
            ).alias("lp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.round(-F.avg("lp"), 4).alias("bigram_nll"),
    )
    all_docs = df.select(F.col(id_col))
    return (
        all_docs.join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("bigram_nll", F.lit(0.0)).alias("bigram_nll"),
        )
    )


def shuffle_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: str = "shuf1",
    pos_buckets: int = 64,
) -> DataFrame:
    """Deterministic global training shuffle -> (id, shard, pos).

    The last step of every pretraining pipeline: the curated corpus must
    be globally shuffled (so a training batch is not one crawl-domain or
    one time slice) and split into shards with a stable within-shard
    order for resumable data loading.  A seeded md5 draw gives every doc
    a 60-bit key; shard = key mod ``n_shards``, pos = the key's rank
    within its shard.  Re-running with the same seed reproduces the exact
    layout — no RNG state, no sampleBy.

    Scale shape: the rank is NOT one row_number per shard (that would be
    ``n_shards`` whale partitions — a global sort in disguise).  It is the
    module's two-phase bucketed idiom (see pack_sequences): rank within
    (shard, bucket) where bucket = the key's HIGH bits (so bucket order =
    key order within a shard), plus a broadcast per-(shard,bucket) base
    offset — |shards x buckets| tiny rows.  Window partitions stay
    ~|corpus| / (shards x buckets) regardless of corpus size; raise
    ``pos_buckets`` to keep them executor-sized.
    """
    df = ensure_parallelism(df)
    key = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed + "|"), F.col(id_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    # 60-bit key: high bits via integer division keep bucket order aligned
    # with key order inside a shard (required for the offset math).
    span = (1 << 60) // pos_buckets
    # keyed feeds both the per-bucket base-offset aggregate and the
    # ranked join; pin so the corpus scan + md5 keying runs once (r13).
    from . import _persist_scoped

    keyed = _persist_scoped(
        df.select(
            F.col(id_col),
            key.alias("_k"),
            F.pmod(key, F.lit(n_shards)).cast("int").alias("shard"),
            F.floor(key / F.lit(span)).cast("int").alias("_b"),
        )
    )
    base = (
        keyed.groupBy("shard", "_b")
        .agg(F.count("*").alias("_n"))
        .withColumn(
            "_base",
            F.coalesce(
                F.sum("_n").over(
                    Window.partitionBy("shard")
                    .orderBy("_b")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("shard", "_b", "_base")
    )
    w = Window.partitionBy("shard", "_b").orderBy(F.col("_k").asc(), F.col(id_col).asc())
    return (
        keyed.join(F.broadcast(base), ["shard", "_b"])
        .withColumn("pos", (F.row_number().over(w) + F.col("_base")).cast("long"))
        .select(id_col, "shard", "pos")
    )


def training_order(
    df: DataFrame,
    budget_tokens: int,
    n_shards: int = 8,
    seed: str = "order1",
    max_epochs: float = 4.0,
    strata_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    pos_buckets: int = 64,
) -> DataFrame:
    """The final mile of the curation pipeline: materialize the actual
    training ORDER -> (id, rep, shard, pos).

    Composes :func:`mixture_epochs` (Muennighoff-style per-stratum epoch
    multipliers under a token budget) with the :func:`shuffle_shards`
    idiom: every doc is expanded to ``floor(epochs)`` full repeats plus
    one more with probability ``frac(epochs)`` (a seeded md5-Bernoulli
    draw, so the expansion hits the planned token budget in expectation
    and is exactly reproducible), then every (doc, rep) instance gets an
    independent shuffle key — repeats of one doc land in DIFFERENT
    shards/positions, which is the point of epoch-aware shuffling (a
    repeat adjacent to its twin trains like a duplicate).

    Scale: the plan frame is |strata| rows broadcast back; expansion is
    a map-side explode bounded by ceil(max_epochs) per doc; the
    within-shard rank is the same two-phase bucketed scheme as
    shuffle_shards (per-(shard, high-bits bucket) windows + broadcast
    base offsets) — no whale partitions at any corpus size.
    """
    df = ensure_parallelism(df)
    plan = mixture_epochs(df, budget_tokens, max_epochs, strata_col, text_col)
    docs = df.join(
        F.broadcast(plan.select(strata_col, "epochs")), strata_col
    )
    full = F.floor(F.col("epochs")).cast("int")
    fracm = F.round(
        (F.col("epochs") - F.floor(F.col("epochs"))) * 1_000_000, 0
    ).cast("long")
    draw = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(seed + "|frac|"), F.col(id_col).cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % F.lit(1_000_000)
    )
    n_rep = full + (draw < fracm).cast("int")
    expanded = docs.select(
        F.col(id_col),
        F.explode(
            F.when(n_rep >= 1, F.sequence(F.lit(1), n_rep)).otherwise(
                F.array().cast("array<int>")
            )
        ).alias("rep"),
    )
    key = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(seed + "|"),
                    F.col(id_col).cast("string"),
                    F.lit(":"),
                    F.col("rep").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    span = (1 << 60) // pos_buckets
    # keyed feeds both the per-bucket base-offset aggregate and the
    # ranked join; unpinned, the plan join + epoch expansion re-ran once
    # per consumer (r13).  Narrow (id, rep, key) instance rows.
    from . import _persist_scoped

    keyed = _persist_scoped(
        expanded.select(
            F.col(id_col),
            F.col("rep").cast("long").alias("rep"),
            key.alias("_k"),
            F.pmod(key, F.lit(n_shards)).cast("int").alias("shard"),
            F.floor(key / F.lit(span)).cast("int").alias("_b"),
        )
    )
    base = (
        keyed.groupBy("shard", "_b")
        .agg(F.count("*").alias("_n"))
        .withColumn(
            "_base",
            F.coalesce(
                F.sum("_n").over(
                    Window.partitionBy("shard")
                    .orderBy("_b")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("shard", "_b", "_base")
    )
    w = Window.partitionBy("shard", "_b").orderBy(
        F.col("_k").asc(), F.col(id_col).asc(), F.col("rep").asc()
    )
    return (
        keyed.join(F.broadcast(base), ["shard", "_b"])
        .withColumn("pos", (F.row_number().over(w) + F.col("_base")).cast("long"))
        .select(id_col, "rep", "shard", "pos")
    )


def temperature_weights(
    df: DataFrame,
    alpha: float = 0.7,
    strata_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled mixture weights (the XLM/CC-100 multilingual
    recipe, Conneau et al. 2020 §3.1: sample stratum i with probability
    q_i ∝ p_i^alpha where p_i is its token share).  alpha < 1 flattens
    the mixture — low-resource strata are up-sampled, head strata
    down-sampled — without the hard cutoff of a per-source cap.

    One row per stratum: token count, raw share p, tempered share q
    (both rounded 6), and boost = q/p — the factor a sampler multiplies
    each stratum's inclusion probability by.

    Scale: one map-side-combined aggregate to |strata| rows; the
    temperature arithmetic runs on that tiny frame (the normalizing
    constant rides in via a 1-row broadcast cross join).
    """
    from . import _persist_scoped

    # counts feeds both the normalizing total and the tempered-share
    # select; unpinned, the corpus tokenize-and-count ran twice (r13).
    counts = _persist_scoped(
        ensure_parallelism(df).groupBy(strata_col).agg(
            F.sum(F.size(tokens(F.col(text_col)))).cast("double").alias("nt")
        )
    )
    tot = counts.agg(F.sum("nt").alias("__tot"))
    shared = counts.crossJoin(F.broadcast(tot)).withColumn(
        "p", F.col("nt") / F.col("__tot")
    )
    # normalizer for p^alpha over strata: second tiny agg, broadcast back
    z = shared.agg(F.sum(F.pow(F.col("p"), F.lit(alpha))).alias("__z"))
    return (
        shared.crossJoin(F.broadcast(z))
        .select(
            strata_col,
            F.col("nt").cast("long").alias("n_tokens"),
            F.round(F.col("p"), 6).alias("p_share"),
            F.round(F.pow(F.col("p"), F.lit(alpha)) / F.col("__z"), 6).alias("q_share"),
            F.round(
                (F.pow(F.col("p"), F.lit(alpha)) / F.col("__z")) / F.col("p"), 6
            ).alias("boost"),
        )
    )


def vocab_drift(
    old: DataFrame,
    new: DataFrame,
    buckets: int = 512,
    text_col: str = "text",
    salt: str = "vdrift1",
) -> DataFrame:
    """Vocabulary-distribution drift between two corpus versions — the
    text twin of similarity.embedding_drift: token mass hashed into
    ``buckets`` md5 buckets (the dsir_weights idiom, so no unbounded
    vocab state), Laplace-smoothed shares per side, per-bucket PSI term
    (p_old - p_new) * ln(p_old / p_new).  Sum psi_term for the headline
    number; the industry bands apply (< 0.1 stable, > 0.25 shifted).

    One row per bucket: (bucket, n_old, n_new, p_old, p_new, psi_term),
    shares/terms rounded 6.

    Scale: each side is one token explode -> |buckets|-row aggregate
    (map-side combined); the PSI math runs on the joined tiny frames.
    """

    def bucket_counts(df: DataFrame, alias: str) -> DataFrame:
        toks = ensure_parallelism(df).select(
            F.explode(tokens(F.col(text_col))).alias("t")
        )
        b = F.pmod(
            F.conv(
                F.substring(F.md5(F.concat(F.lit(salt + "|"), F.col("t"))), 1, 15),
                16,
                10,
            ).cast("long"),
            F.lit(buckets),
        )
        return toks.groupBy(b.alias("bucket")).agg(F.count("*").alias(alias))

    co = bucket_counts(old, "n_old")
    cn = bucket_counts(new, "n_new")
    cells = co.join(cn, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("n_old", F.lit(0)).cast("long").alias("n_old"),
        F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
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


def ccnet_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    vocab_k: int = 50_000,
) -> DataFrame:
    """CCNet-style quality terciles (Wenzek et al. 2020): per language,
    docs split into head / middle / tail by their LM perplexity proxy
    (:func:`unigram_logprob` nll, ascending — lowest-perplexity third is
    the head CCNet keeps, the tail is usually dropped).

    Tercile boundaries are EXACT per-language ranks, decided entirely in
    integer arithmetic (3·rank vs n), so the assignment is
    engine-portable with no quantile-interpolation ambiguity.  The rank
    itself is the module's two-phase idiom (see shuffle_shards): rank
    within (lang, coarse nll bucket) + broadcast per-bucket base offsets
    — never one window partition per language (a language IS a whale at
    corpus scale).

    One row per scored doc: (id, lang, n_tokens, nll, lang_rank, lang_n,
    bucket) with bucket in {'head','middle','tail'}.
    """
    scored = unigram_logprob(df, text_col, id_col, vocab_k).join(
        df.select(F.col(id_col), F.col(lang_col).alias("lang")), id_col
    )
    # coarse ordering buckets: nll is rounded to 4dp and small (log2
    # space), so floor(nll*4) gives bounded per-(lang, bucket) windows
    # whose order equals nll order
    from . import _persist_scoped

    b = F.floor(F.col("nll") * 4).cast("long")
    # keyed feeds both the per-bucket base-offset aggregate and the
    # ranked join; unpinned, the whole unigram-NLL scoring (tokenize +
    # LM join + per-doc fold) ran once per consumer (r13).  One narrow
    # row per doc, no text column.
    keyed = _persist_scoped(scored.withColumn("_b", b))
    base = (
        keyed.groupBy("lang", "_b")
        .agg(F.count("*").alias("_n"))
        .withColumn(
            "_base",
            F.coalesce(
                F.sum("_n").over(
                    Window.partitionBy("lang")
                    .orderBy("_b")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn("_tot", F.sum("_n").over(Window.partitionBy("lang")))
        .select("lang", "_b", "_base", "_tot")
    )
    w = Window.partitionBy("lang", "_b").orderBy(
        F.col("nll").asc(), F.col(id_col).asc()
    )
    ranked = keyed.join(F.broadcast(base), ["lang", "_b"]).withColumn(
        "lang_rank", (F.row_number().over(w) + F.col("_base")).cast("long")
    )
    return ranked.select(
        id_col,
        "lang",
        "n_tokens",
        "nll",
        "lang_rank",
        F.col("_tot").cast("long").alias("lang_n"),
        F.when(3 * F.col("lang_rank") <= F.col("_tot"), F.lit("head"))
        .when(3 * F.col("lang_rank") <= 2 * F.col("_tot"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def vocab_growth(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_checkpoints: int = 10,
) -> DataFrame:
    """Heaps'-law vocabulary growth curve: (checkpoint, cutoff_id,
    cum_tokens, cum_vocab) at ``n_checkpoints`` evenly-spaced id cutoffs.

    The empirical input to Heaps' law V(N) ~ K * N^beta — the curve that
    answers "how much NEW vocabulary does the next TB of corpus buy?"
    (sub-linear growth flattening early is the classic staleness signal
    for a crawl). Emitted as exact integer checkpoint rows rather than a
    fitted (K, beta): the fit is two sums over 10 points any client can
    do, while the integers are engine-exact and oracle-checkable.

    Scale shape: one explode to per-doc DISTINCT terms, one groupBy term
    for its first-occurrence cutoff (min id), then ONE conditional
    aggregate producing all checkpoints at once — the term frame is never
    re-scanned per checkpoint and nothing is ordered globally. The
    cutoffs come from a 1-row max(id) broadcast, so checkpoint placement
    costs one tiny extra action-free subplan, not a pass over the data.
    """
    df = ensure_parallelism(df)
    cuts = df.agg(F.max(F.col(id_col)).alias("_max_id"))
    toks = df.select(
        F.col(id_col).alias("_id"), F.explode(tokens(F.col(text_col))).alias("_t")
    )
    # per-term first occurrence position (min doc id containing it)
    first = toks.distinct().groupBy("_t").agg(F.min("_id").alias("_first"))
    # per-doc token counts (duplicates kept — token mass, not vocab)
    per_doc = df.select(
        F.col(id_col).alias("_id"), F.size(tokens(F.col(text_col))).alias("_n")
    )
    # cutoff_i = (max_id * i) div n — EXACT integer division (a float
    # max_id * (i/n) floors wrong whenever the true product is an exact
    # integer, e.g. max_id=6000, i=3: 6000*fl(0.3) = 1799.99.. -> 1799)
    def cutoff(i: int):
        return F.expr(f"_max_id * {i} div {n_checkpoints}").cast("long")

    idx = list(range(1, n_checkpoints + 1))
    vocab = first.crossJoin(F.broadcast(cuts)).agg(
        *[
            F.count(F.when(F.col("_first") <= cutoff(i), 1))
            .cast("long").alias(f"v{i}")
            for i in idx
        ],
        F.max("_max_id").alias("_max_id"),
    )
    toks_cum = per_doc.crossJoin(F.broadcast(cuts)).agg(
        *[
            F.sum(
                F.when(F.col("_id") <= cutoff(i), F.col("_n")).otherwise(F.lit(0))
            ).cast("long").alias(f"t{i}")
            for i in idx
        ]
    )
    wide = vocab.crossJoin(toks_cum)
    rows = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("checkpoint"),
                cutoff(i).alias("cutoff_id"),
                F.col(f"t{i}").alias("cum_tokens"),
                F.col(f"v{i}").alias("cum_vocab"),
            )
            for i in idx
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select("r.*")


def source_ablation(
    df: DataFrame,
    strata_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Leave-one-source-out corpus impact: per source, its token share
    and the corpus quality-keep rate WITH vs WITHOUT it.

    The cheapest member of the data-valuation family: before paying for
    influence functions, a curation pass asks "which source is dragging
    corpus quality?" — answered exactly by recomputing the corpus keep
    rate excluding each source. Because the metric is a ratio of sums,
    every leave-one-out value derives from the per-source aggregate and
    the 1-row total by subtraction: one shuffle, |sources| output rows,
    NO per-source re-scan (the naive formulation runs the corpus k
    times).

    Columns: source, n_docs, n_tokens, token_share, keep_rate_full
    (corpus-wide, same on every row), keep_rate_excl (corpus without
    this source), keep_delta = full - excl (positive means the source
    IMPROVES corpus quality, negative means it drags).

    "Keep" = quality_score >= 0.75 (the 4dp-rounded score, so the cut is
    engine-exact). One scored pass, one groupBy — quality and token
    counts aggregate in the SAME shuffle via quality_score(keep_cols=).
    """
    df = ensure_parallelism(df)
    sig = quality_score(df, text_col=text_col, keep_cols=(strata_col,))
    per = (
        sig.select(
            F.col(strata_col).alias("source"),
            F.col("n_tokens").alias("_nt"),
            (F.col("quality") >= F.lit(0.75)).cast("long").alias("_k"),
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("_nt").cast("long").alias("n_tokens"),
            F.sum("_k").cast("long").alias("n_keep"),
        )
    )
    tot = per.agg(
        F.sum("n_docs").cast("long").alias("_td"),
        F.sum("n_tokens").cast("long").alias("_tt"),
        F.sum("n_keep").cast("long").alias("_tk"),
    )
    full_rate = F.col("_tk").cast("double") / F.col("_td").cast("double")
    excl_rate = (F.col("_tk") - F.col("n_keep")).cast("double") / (
        F.col("_td") - F.col("n_docs")
    ).cast("double")
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens").cast("double") / F.col("_tt").cast("double"), 6)
            .alias("token_share"),
            F.round(full_rate, 6).alias("keep_rate_full"),
            F.round(
                F.when(F.col("_td") > F.col("n_docs"), excl_rate), 6
            ).alias("keep_rate_excl"),
            F.round(
                F.when(F.col("_td") > F.col("n_docs"), full_rate - excl_rate), 6
            ).alias("keep_delta"),
        )
    )


def pack_padding_report(
    df: DataFrame,
    seq_len: int = 512,
    strata_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Pad-vs-pack cost report: per stratum, what padding to fixed
    ``seq_len`` sequences wastes versus concatenative packing
    (:func:`pack_sequences`' layout).

    The sizing decision every tokenize-and-shard job makes once: padding
    each doc to its own ceil(n/L) sequences burns pad_ratio of the
    compute budget on pad tokens; packing (concat + split) wastes at
    most one partial sequence per stratum. Columns: source, n_docs,
    n_tokens, pad_seqs (sum of per-doc ceil(n/L)), pad_tokens
    (pad_seqs*L - n_tokens), pad_ratio (share of padded-sequence tokens
    that are padding), packed_seqs (ceil(stratum_tokens/L)), saved_seqs.
    All exact integer arithmetic except the one pad_ratio division; one
    groupBy, map-side combined.
    """
    df = ensure_parallelism(df)
    n = F.size(tokens(F.col(text_col)))
    # ceil(n / L) in exact integers: (n + L - 1) div L
    per_doc_seqs = F.expr(f"(__n + {seq_len - 1}) div {seq_len}")
    per = (
        df.select(F.col(strata_col).alias("source"), n.alias("__n"))
        .select("source", "__n", per_doc_seqs.alias("__s"))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("__n").cast("long").alias("n_tokens"),
            F.sum("__s").cast("long").alias("pad_seqs"),
        )
    )
    pad_tokens = F.col("pad_seqs") * seq_len - F.col("n_tokens")
    packed = F.expr(f"(n_tokens + {seq_len - 1}) div {seq_len}")
    return per.select(
        "source",
        "n_docs",
        "n_tokens",
        "pad_seqs",
        pad_tokens.cast("long").alias("pad_tokens"),
        F.round(
            F.when(
                F.col("pad_seqs") > 0,
                pad_tokens.cast("double") / (F.col("pad_seqs") * seq_len).cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("pad_ratio"),
        packed.cast("long").alias("packed_seqs"),
        (F.col("pad_seqs") - packed).cast("long").alias("saved_seqs"),
    )


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
    top_n: int = 200,
    out_round: int = 6,
) -> DataFrame:
    """Zipf rank-frequency fit per group -> (grp, n_ranks, slope,
    intercept, r2).

    Fits ``ln(freq) = intercept + slope * ln(rank)`` by least squares
    over the top ``top_n`` token frequencies of each group (language,
    source).  Natural text tracks slope ~ -1 (Zipf's law); a corpus
    slice that deviates hard — slope near 0 (flat, template/boilerplate
    spam) or very steep with tiny vocab (generated/repetitive text) —
    is the distribution-level quality signal that per-doc scorers miss,
    so this is the corpus-health readout curation dashboards plot per
    source per snapshot.

    Shape: one (grp, token) count shuffle (map-side combined — the only
    pass over raw text), then top-n selection on the AGGREGATE via the
    module's two-phase rank idiom (shuffle_shards / ccnet_buckets):
    per-(grp, count) class sizes give each class a broadcast base
    offset, classes that cannot reach ``top_n`` are dropped BEFORE any
    window, and the within-class tie rank (token asc) runs over the
    surviving classes only — never one window partition per group (a
    language is a whale at corpus scale; top-rank tie classes are tiny
    by construction since high counts rarely tie).  The regression
    folds 9dp-rounded ln terms in DECIMAL(38,9) per group (the repo's
    engine-stable sum), closing each group to five scalars.
    """
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    tf = (
        ensure_parallelism(df)
        .select(F.col(group_col).alias("grp"), F.explode(tokens(norm)).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("grp", "tok")
        .agg(F.count("*").cast("long").alias("c"))
    )
    # two-phase rank: histogram of count classes per group (tiny: one
    # row per distinct frequency), descending prefix sum = how many
    # tokens rank strictly above the class
    hist = tf.groupBy("grp", "c").agg(F.count("*").cast("long").alias("n_c"))
    wbase = (
        Window.partitionBy("grp")
        .orderBy(F.desc("c"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = hist.withColumn("base", F.coalesce(F.sum("n_c").over(wbase), F.lit(0)))
    live = base.filter(F.col("base") < top_n).select("grp", "c", "base")
    wtie = Window.partitionBy("grp", "c").orderBy(F.asc("tok"))
    # the LITERAL row_number bound comes first: Catalyst's
    # InferWindowGroupLimit rewrites filter(row_number <= lit) into
    # partial (pre-shuffle, per map task) + final WindowGroupLimit
    # operators, so a surviving count=1 class — which holds the entire
    # hapax vocabulary of a group when the group has fewer than top_n
    # repeated tokens — is trimmed to top_n rows per task BEFORE the
    # shuffle instead of materializing as one whale window partition
    # (r12 ADVICE low).  The exact rank = row_number + base and its
    # column-bound filter then run on the trimmed frame.
    ranked = (
        tf.join(F.broadcast(live), ["grp", "c"])
        .withColumn("__rn", F.row_number().over(wtie))
        .filter(F.col("__rn") <= top_n)
        .withColumn("rank", F.col("__rn") + F.col("base"))
        .filter(F.col("rank") <= top_n)
        .drop("__rn")
    )
    d9 = lambda col: F.round(col, 9).cast("decimal(38,9)")
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("c").cast("double"))
    agg = ranked.groupBy("grp").agg(
        F.count("*").cast("long").alias("n_ranks"),
        F.sum(d9(x)).cast("double").alias("sx"),
        F.sum(d9(y)).cast("double").alias("sy"),
        F.sum(d9(x * y)).cast("double").alias("sxy"),
        F.sum(d9(x * x)).cast("double").alias("sxx"),
        F.sum(d9(y * y)).cast("double").alias("syy"),
    )
    n = F.col("n_ranks").cast("double")
    cov_n = n * F.col("sxy") - F.col("sx") * F.col("sy")
    varx_n = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary_n = n * F.col("syy") - F.col("sy") * F.col("sy")
    slope = F.when(varx_n > 0, cov_n / varx_n).otherwise(F.lit(0.0))
    return agg.select(
        "grp",
        "n_ranks",
        F.round(slope, out_round).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / n, out_round).alias(
            "intercept"
        ),
        F.round(
            F.when(
                (varx_n > 0) & (vary_n > 0), cov_n * cov_n / (varx_n * vary_n)
            ).otherwise(F.lit(0.0)),
            out_round,
        ).alias("r2"),
    )


def simpson_diversity(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
    out_round: int = 6,
) -> DataFrame:
    """Simpson's diversity index over token frequencies per group ->
    (grp, n_tokens, vocab, simpson_d, diversity).

    D = sum c_i (c_i - 1) / (N (N - 1)) — the probability two tokens
    drawn without replacement are the same TYPE; diversity = 1 - D.
    The lexical-concentration complement to :func:`zipf_fit`'s slope:
    a corpus slice whose diversity collapses between snapshots has been
    flooded with repetitive/boilerplate text even when its Zipf slope
    still looks plausible.  All sums are exact BIGINTs (c*(c-1) per
    type, N, vocab) folded map-side; the single division happens once
    per group — engine-exact by construction.  One (group, token) count
    shuffle, one |groups|-row reduce.
    """
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    tf = (
        ensure_parallelism(df)
        .select(F.col(group_col).alias("grp"), F.explode(tokens(norm)).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("grp", "tok")
        .agg(F.count("*").cast("long").alias("c"))
    )
    agg = tf.groupBy("grp").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("vocab"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("same"),
    )
    d = F.when(
        F.col("n_tokens") > 1,
        F.col("same").cast("double")
        / (F.col("n_tokens").cast("double") * (F.col("n_tokens") - 1).cast("double")),
    ).otherwise(F.lit(0.0))
    return agg.select(
        "grp",
        "n_tokens",
        "vocab",
        F.round(d, out_round).alias("simpson_d"),
        F.round(F.lit(1.0) - d, out_round).alias("diversity"),
    )


def gini_concentration(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
    out_round: int = 6,
) -> DataFrame:
    """Gini coefficient over token frequencies per group -> (grp,
    vocab, n_tokens, gini).

    The third leg of the corpus-concentration triad: :func:`zipf_fit`
    grades the SHAPE of the rank-frequency curve, :func:`simpson_diversity`
    the collision probability; Gini is the single inequality number
    curation dashboards track per source per snapshot — 0 = every type
    equally frequent, ->1 = a handful of tokens carry the corpus (the
    boilerplate/template signature).  Gini = 2*sum(i * x_(i)) /
    (n * sum(x)) - (n + 1)/n over the ASCENDING-sorted frequencies
    x_(1..n) (n = vocab size).

    The rank sum never ranks tokens individually: within a count class
    (all types sharing frequency c) the ranks are base+1 .. base+n_c
    for ANY tie order, so sum(i*c) over the class is the closed form
    c * (n_c*base + n_c*(n_c+1)/2) — exact BIGINTs off the per-class
    histogram.  Shape: one (grp, token) count shuffle (the only pass
    over raw text), a per-(grp, count) histogram (one row per DISTINCT
    frequency), one ascending prefix-sum window over that tiny
    histogram, one |groups|-row reduce.  No window ever touches
    per-token rows — the zipf_fit/ccnet two-phase discipline — and the
    single double division happens once per group.
    """
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    tf = (
        ensure_parallelism(df)
        .select(F.col(group_col).alias("grp"), F.explode(tokens(norm)).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("grp", "tok")
        .agg(F.count("*").cast("long").alias("c"))
    )
    hist = tf.groupBy("grp", "c").agg(F.count("*").cast("long").alias("n_c"))
    wbase = (
        Window.partitionBy("grp")
        .orderBy(F.asc("c"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = hist.withColumn(
        "base", F.coalesce(F.sum("n_c").over(wbase), F.lit(0).cast("long"))
    )
    # closed-form rank sum of the class: c * (n_c*base + n_c*(n_c+1)/2);
    # `div` keeps the halving exact-integer (a double division loses
    # exactness past 2^53), and the cross-class fold runs in
    # DECIMAL(38,0) because rank_mass ~ n_tokens x vocab can exceed
    # BIGINT on a trillion-token corpus slice
    # inner sum stays long (bounded by ~1.5 * vocab^2 < 2^63 for vocab
    # <= ~2.4e9 types); the c* product crosses into decimal BEFORE the
    # multiply, since c * ranksum ~ n_tokens x vocab overflows a long
    term = F.col("c").cast("decimal(19,0)") * (
        F.col("n_c") * F.col("base") + F.expr("n_c * (n_c + 1) div 2")
    ).cast("decimal(19,0)")
    agg = base.groupBy("grp").agg(
        F.sum("n_c").cast("long").alias("vocab"),
        F.sum(F.col("c") * F.col("n_c")).cast("long").alias("n_tokens"),
        F.sum(term).alias("rank_mass"),
    )
    n = F.col("vocab").cast("double")
    gini = (
        F.lit(2.0) * F.col("rank_mass").cast("double")
        / (n * F.col("n_tokens").cast("double"))
        - (n + F.lit(1.0)) / n
    )
    return agg.select(
        "grp",
        "vocab",
        "n_tokens",
        F.round(
            F.when(F.col("vocab") > 0, gini).otherwise(F.lit(0.0)), out_round
        ).alias("gini"),
    )
