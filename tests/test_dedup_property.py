"""Property-based dedup tests: random tiny corpora from a small token
vocabulary; operator output must equal pure-Python set-arithmetic
oracles (exact hashes, exact Jaccard, component fixpoints)."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from feast_hive_spark.operators import dedup as D

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]


@st.composite
def corpus(draw):
    n_docs = draw(st.integers(2, 8))
    docs = []
    for i in range(n_docs):
        n_words = draw(st.integers(0, 10))
        words = [VOCAB[draw(st.integers(0, len(VOCAB) - 1))] for _ in range(n_words)]
        docs.append((i, " ".join(words)))
    return pd.DataFrame(docs, columns=["doc_id", "text"])


def py_shingles(text, n=3):
    w = text.lower().split()
    return set(" ".join(w[i : i + n]) for i in range(len(w) - n + 1))


def py_pairs(pdf, threshold, n=3):
    S = {r.doc_id: py_shingles(r.text, n) for r in pdf.itertuples()}
    out = set()
    ids = sorted(S)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = S[a], S[b]
            if not sa and not sb:
                continue
            if len(sa & sb) / max(len(sa | sb), 1) >= threshold:
                out.add((a, b))
    return out


@pytest.mark.slow
@settings(
    max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(corpus())
def test_ngram_jaccard_property(spark, pdf):
    got = D.ngram_jaccard_pairs(
        spark.createDataFrame(pdf), "doc_id", "text", threshold=0.5
    ).toPandas()
    assert set(zip(got.id_a, got.id_b)) == py_pairs(pdf, 0.5)


@pytest.mark.slow
@settings(
    max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(corpus())
def test_exact_dedup_property(spark, pdf):
    got = D.exact_dedup(
        spark.createDataFrame(pdf), "doc_id", "text"
    ).toPandas()
    groups = {}
    for r in pdf.itertuples():
        groups.setdefault(r.text, []).append(r.doc_id)
    expected = {min(ids): len(ids) for ids in groups.values()}
    assert got.set_index("doc_id")["n_copies"].to_dict() == expected


@pytest.mark.slow
@settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9)), max_size=12))
def test_connected_components_property(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    pairs = spark.createDataFrame(
        pd.DataFrame(edges, columns=["id_a", "id_b"])
    )
    got = D.connected_components(pairs).toPandas()
    # python union-find oracle
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in parent}
    assert got.set_index("doc_id")["component_id"].to_dict() == expected
