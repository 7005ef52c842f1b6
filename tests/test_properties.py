"""Property-based tests (hypothesis) for the text-function library.

Each example batches its generated strings into ONE DataFrame so a
hypothesis run costs a handful of Spark jobs, not hundreds. Alphabet is
printable ASCII — the engines' unicode codepoint semantics are exercised
separately by the fixture corpus (which contains zh text).
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from finance_reporting_etl_spark.functions.text import (
    ROLLING_BASE,
    ROLLING_MOD,
    fingerprint,
    quality_score,
    rolling_hash,
    token_count,
)

TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=0, max_size=200
)


def _py_rolling_hash(text: str) -> int:
    norm = re.sub(r"\s+", " ", text.strip().lower())
    h = 0
    for ch in norm:
        h = (h * ROLLING_BASE + ord(ch)) % ROLLING_MOD
    return h


@settings(max_examples=15, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=20))
def test_rolling_hash_matches_python_reference(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got = {r.i: r.h for r in df.select("i", rolling_hash("text").alias("h")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _py_rolling_hash(t), f"mismatch for {t!r}"


@settings(max_examples=15, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=20))
def test_fingerprint_whitespace_and_case_invariance(spark, texts):
    rows = []
    for i, t in enumerate(texts):
        rows.append((i, 0, t))
        rows.append((i, 1, f"  {t}\t"))  # padding
        rows.append((i, 2, t.upper()))  # case
        rows.append((i, 3, t.replace(" ", "   ")))  # internal runs
    df = spark.createDataFrame(rows, "i long, variant long, text string")
    out = df.select("i", "variant", fingerprint("text").alias("fp")).collect()
    by_i: dict[int, set[str]] = {}
    for r in out:
        by_i.setdefault(r.i, set()).add(r.fp)
    for i, fps in by_i.items():
        assert len(fps) == 1, f"fingerprint not invariant for {texts[i]!r}"


@settings(max_examples=15, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=20))
def test_quality_score_bounded_and_token_count_consistent(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    out = df.select(
        "i",
        quality_score("text").alias("q"),
        token_count("text").alias("n"),
    ).collect()
    for r in out:
        assert 0.0 <= r.q <= 1.0
        py_tokens = len([t for t in re.split(r"\s+", texts[r.i].strip()) if True]) if True else 0
        # Spark split on \s+ of stripped text; empty string yields one empty token on both sides
        assert r.n == len(re.split(r"\s+", texts[r.i].strip()))


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)),
        min_size=0,
        max_size=25,
    )
)
def test_near_dup_clusters_matches_union_find(spark, raw_edges):
    """Distributed min-label propagation == driver-side union-find on
    random graphs over 15 nodes."""
    from finance_reporting_etl_spark.operators.dedup import near_dup_clusters

    n = 15
    edges = [(a, b) for a, b in raw_edges if a != b]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id in component
    comp = {}
    for i in range(n):
        comp.setdefault(find(i), []).append(i)
    want = {i: min(members) for members in comp.values() for i in members}

    edges_df = spark.createDataFrame(
        edges or [(0, 0)], "id_a long, id_b long"
    ).filter("id_a <> id_b")
    nodes_df = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = {r.id: r.cluster_id for r in near_dup_clusters(edges_df, nodes_df).collect()}
    assert got == want
