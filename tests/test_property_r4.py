"""Property-based tests for the round-4 operators.

Same conventions as test_property_r2.py: pure-Python reference
implementations are the oracles; Spark-backed properties keep
max_examples small (each example is a Spark job) and take the
session-scoped ``spark`` fixture.
"""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------------------
# chunk_documents window arithmetic (pure math — mirrors the operator)
# ---------------------------------------------------------------------------

@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=1, max_value=5000),   # n_tokens
    st.integers(min_value=1, max_value=200),    # chunk
    st.integers(min_value=0, max_value=199),    # overlap (< chunk enforced)
)
def test_chunk_window_count_covers_exactly(n, chunk, overlap):
    """The window-count formula max(1, ceil((n - overlap)/step)) must
    (a) cover every token, (b) start every window inside the doc, and
    (c) be minimal — one fewer window would leave a gap."""
    if overlap >= chunk:
        overlap = chunk - 1
    step = chunk - overlap
    nc = max(1, math.ceil((n - overlap) / step))
    starts = [i * step for i in range(nc)]
    # (a) coverage: last window reaches the end
    assert starts[-1] + chunk >= n
    # (b) every window holds at least one real token
    assert all(s < n for s in starts)
    # (c) minimality: dropping the last window loses coverage
    #     (except the degenerate single-window case)
    if nc > 1:
        assert starts[-2] + chunk < n


# ---------------------------------------------------------------------------
# hash_sample monotonicity (Spark)
# ---------------------------------------------------------------------------

@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(st.integers(min_value=0, max_value=10**9),
             min_size=1, max_size=40, unique=True),
    st.integers(min_value=0, max_value=10),
    st.integers(min_value=0, max_value=10),
)
def test_hash_sample_rate_monotone(spark, ids, r1_tenths, r2_tenths):
    """Raising the rate can only ADD documents to the sample — the
    keep-set is a nested family across rates (the property that makes
    hash sampling re-mixable without churn)."""
    from html_parser_spark.operators.sampling import hash_sample

    lo, hi = sorted((r1_tenths / 10, r2_tenths / 10))
    d = spark.createDataFrame([(i, "x") for i in ids],
                              "doc_id long, text string")
    a = {r["doc_id"] for r in hash_sample(d, rate=lo).collect()}
    b = {r["doc_id"] for r in hash_sample(d, rate=hi).collect()}
    assert a <= b


# ---------------------------------------------------------------------------
# BM25 vs a dense pure-Python reference (Spark)
# ---------------------------------------------------------------------------

def _bm25_ref(docs, terms, k1=1.2, b=0.75):
    toks = {i: t.split(" ") if t else [] for i, t in docs.items()}
    toks = {i: [w for w in ws if w] for i, ws in toks.items()}
    dls = {i: len(docs[i].split(" ")) for i in docs}
    n = len(docs)
    avgdl = sum(dls.values()) / n
    out = {}
    for q in set(terms):
        df = sum(1 for ws in toks.values() if q in ws)
        if df == 0:
            continue
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for i, ws in toks.items():
            tf = ws.count(q)
            if tf:
                w = idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * dls[i] / avgdl))
                out[i] = out.get(i, 0.0) + w
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.data())
def test_bm25_matches_dense_reference(spark, data):
    from html_parser_spark.operators.lexical import bm25_scores

    word = st.sampled_from(["alpha", "beta", "gamma", "delta", "x"])
    doc = st.lists(word, min_size=1, max_size=12).map(" ".join)
    docs = data.draw(st.dictionaries(
        st.integers(min_value=0, max_value=50), doc,
        min_size=2, max_size=8))
    terms = data.draw(st.lists(word, min_size=1, max_size=3, unique=True))
    ref = _bm25_ref(docs, terms)
    d = spark.createDataFrame(sorted(docs.items()),
                              "doc_id long, text string")
    got = {r["id"]: r["score"]
           for r in bm25_scores(d, terms).collect()}
    assert set(got) == set(ref)
    for i in ref:
        assert abs(got[i] - ref[i]) < 1e-9
