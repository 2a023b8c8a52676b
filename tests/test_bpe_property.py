"""Property test: distributed BPE training == single-process greedy
Sennrich reference on arbitrary corpora (including pathological runs of
repeated characters, where a naive delimiter-string merge encoding
diverges from greedy)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from staticql_spark.operators import text as T
from tests.test_operators import _greedy_bpe_reference

word = st.text(alphabet="ab", min_size=1, max_size=6)
doc = st.lists(word, min_size=0, max_size=8).map(" ".join)


@given(texts=st.lists(doc, min_size=1, max_size=6), merges=st.integers(1, 4))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bpe_train_equals_greedy_reference(spark, texts, merges):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r["merge_round"], r["sym_a"], r["sym_b"], r["merged"], r["n_pairs"])
        for r in T.bpe_train(df, merges=merges).collect()
    ]
    assert got == _greedy_bpe_reference(texts, merges)
