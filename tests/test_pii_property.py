"""Property test: PII scrubbing is complete and idempotent.

For arbitrary text interleaved with generated PII tokens, the redacted
output must contain NO remaining match of any PII pattern (completeness),
and scrubbing the redacted text must be a no-op (idempotence). The regex
model runs in Python's `re` — a third engine alongside Spark's Java regex
and DuckDB's RE2, so a pattern that behaves differently across engines
fails here before it fails the oracle.
"""

from __future__ import annotations

import pytest

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from staticql_spark.operators.text import PII_EMAIL_RE, PII_IPV4_RE, PII_PHONE_RE

_words = st.lists(
    st.text(alphabet="abz XY.,@-", min_size=0, max_size=6), min_size=0, max_size=4
)
_email = st.builds(
    lambda u, d: f"{u}@{d}.com",
    st.text(alphabet="ab.z9", min_size=1, max_size=5).filter(
        lambda s: re.fullmatch(r"[A-Za-z0-9._%+-]+", s)
    ),
    st.text(alphabet="xy7", min_size=1, max_size=4),
)
_ip = st.builds(
    lambda a, b, c, d: f"{a}.{b}.{c}.{d}",
    *[st.integers(0, 255)] * 4,
)
_phone = st.builds(
    lambda ds: "+" + " ".join(str(d) for d in ds),
    st.lists(st.integers(0, 9999), min_size=3, max_size=5),
)
_pii = st.one_of(_email, _ip, _phone)


@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(parts=st.lists(st.one_of(_words.map(" ".join), _pii), min_size=0, max_size=6))
@pytest.mark.slow  # soak-grade: excluded from the default gate (pytest.ini)
def test_scrub_complete_and_idempotent(spark, parts):
    from staticql_spark.operators.text import pii_scrub

    doc = "  ".join(parts)
    df = spark.createDataFrame([(1, doc)], ["doc_id", "text"])
    row = pii_scrub(df).collect()[0]
    red = row["redacted"]
    # completeness: no pattern survives its own redaction pass
    assert not re.search(PII_EMAIL_RE, red), red
    assert not re.search(PII_IPV4_RE, red), red
    # phone completeness holds modulo placeholder adjacency: redaction can
    # butt digit runs against placeholders but never leaves 9+ digit runs
    assert not re.search(PII_PHONE_RE, red.replace("<PHONE>", " ").replace("<IP>", " ")), red
    # idempotence: scrubbing the redacted text changes nothing
    df2 = spark.createDataFrame([(1, red)], ["doc_id", "text"])
    row2 = pii_scrub(df2).collect()[0]
    assert row2["redacted"] == red
    assert (row2["n_emails"], row2["n_ips"], row2["n_phones"]) == (0, 0, 0)
