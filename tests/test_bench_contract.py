"""Bench coverage contract (r7 verdict #7): every registered query is
either benched (HEADLINE) or deliberately exempted (BENCH_EXEMPT, with a
documented rationale) — a new queries() key can never silently fall into
the un-benched gap.  Pure registry arithmetic: no Spark session needed."""

from __future__ import annotations

import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load():
    bench = importlib.import_module("bench")
    entry = importlib.import_module("__spark_entry__")
    return bench, entry


def test_every_query_is_benched_or_deliberately_exempt():
    bench, entry = _load()
    registry = set(entry.queries())
    headline = set(bench.HEADLINE)
    exempt = set(bench.BENCH_EXEMPT)
    gap = registry - headline - exempt
    assert not gap, (
        f"registered queries neither benched nor exempted: {sorted(gap)} — "
        "add them to bench.HEADLINE (default) or, with a rationale, to "
        "bench.BENCH_EXEMPT"
    )


def test_bench_lists_are_clean():
    bench, entry = _load()
    registry = set(entry.queries())
    headline = set(bench.HEADLINE)
    exempt = set(bench.BENCH_EXEMPT)
    assert not headline & exempt, sorted(headline & exempt)
    # no dangling names pointing at renamed/removed queries
    assert headline <= registry, sorted(headline - registry)
    assert exempt <= registry, sorted(exempt - registry)
    # no duplicates inside the lists themselves
    assert len(bench.HEADLINE) == len(headline)
    assert len(bench.BENCH_EXEMPT) == len(exempt)
    # CORE rides inside HEADLINE
    assert set(bench.CORE) <= headline, sorted(set(bench.CORE) - headline)
