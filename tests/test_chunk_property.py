"""Property tests for the C4 chunk-dedup family and shuffle-to-shards:
reassembly identity, single-process reference equality, and permutation
invariants on arbitrary corpora."""

from __future__ import annotations

import pytest

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from staticql_spark.operators import dedup, text as T

word = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
doc = st.lists(word, min_size=1, max_size=12).map(" ".join)


def _ref_chunk_dedup(texts: list[str], width: int, min_docs: int):
    """Single-process reference of dedup.chunk_dedup."""
    chunks_per_doc = []
    for t in texts:
        toks = t.split(" ")
        n = max(math.ceil(len(toks) / width), 1)
        chunks_per_doc.append(
            [" ".join(toks[i * width : (i + 1) * width]) for i in range(n)]
        )
    df_count: dict[str, set[int]] = {}
    for i, chunks in enumerate(chunks_per_doc):
        for c in chunks:
            df_count.setdefault(c, set()).add(i)
    out = {}
    for i, chunks in enumerate(chunks_per_doc):
        kept = [c for c in chunks if len(df_count[c]) < min_docs]
        out[i] = (len(chunks), len(chunks) - len(kept), " ".join(kept))
    return out


@given(
    texts=st.lists(doc, min_size=1, max_size=8),
    width=st.integers(1, 5),
    min_docs=st.integers(2, 3),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_chunk_dedup_equals_reference(spark, texts, width, min_docs):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_dropped"], r["clean_text"])
        for r in dedup.chunk_dedup(df, width=width, min_docs=min_docs).collect()
    }
    assert got == _ref_chunk_dedup(texts, width, min_docs)


@given(texts=st.lists(doc, min_size=1, max_size=8), width=st.integers(1, 5))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_chunk_dedup_reassembly_identity(spark, texts, width):
    # min_docs high enough that nothing drops: clean_text == input text
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r["doc_id"]: r["clean_text"]
        for r in dedup.chunk_dedup(df, width=width, min_docs=10**6).collect()
    }
    assert got == dict(enumerate(texts))


@given(
    n_rows=st.integers(1, 40),
    n_shards=st.integers(1, 6),
    pos_buckets=st.integers(1, 16),
    seed=st.sampled_from(["s1", "s2"]),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_shuffle_shards_matches_reference_rank(
    spark, n_rows, n_shards, pos_buckets, seed
):
    # the two-phase rank must equal a single-process sort on the md5 key
    df = spark.createDataFrame([(i,) for i in range(n_rows)], "doc_id long")
    got = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in T.shuffle_shards(
            df, n_shards=n_shards, seed=seed, pos_buckets=pos_buckets
        ).collect()
    }
    keys = {
        i: int(hashlib.md5(f"{seed}|{i}".encode()).hexdigest()[:15], 16)
        for i in range(n_rows)
    }
    ref = {}
    by_shard: dict[int, list[int]] = {}
    for i, k in keys.items():
        by_shard.setdefault(k % n_shards, []).append(i)
    for shard, ids in by_shard.items():
        for pos, i in enumerate(sorted(ids, key=lambda i: (keys[i], i)), start=1):
            ref[i] = (shard, pos)
    assert got == ref


@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
        min_size=1,
        max_size=60,
    ),
    qs=st.lists(st.sampled_from([0.01, 0.25, 0.5, 0.75, 0.9, 1.0]),
                min_size=1, max_size=3, unique=True),
    num_buckets=st.sampled_from([2, 7, 64]),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow  # soak-grade: excluded from the default gate (pytest.ini)
def test_exact_quantiles_property(spark, vals, qs, num_buckets):
    # two-phase bucketed quantiles == value at ceil(q*n) of the sorted
    # list, for arbitrary floats, quantiles, and bucket counts
    from staticql_spark.operators.profile import exact_quantiles

    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    out = {
        r["q"]: r["value"]
        for r in exact_quantiles(df, "x", qs, num_buckets=num_buckets).collect()
    }
    srt = sorted(float(v) for v in vals)
    for q in qs:
        want = srt[max(math.ceil(q * len(vals)), 1) - 1]
        assert out[q] == want, (q, out[q], want)
