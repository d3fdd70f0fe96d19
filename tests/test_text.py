"""BM25 lexical scoring."""

from __future__ import annotations

import pytest



def test_bm25_scores_match_reference_formula(spark):
    """BM25 against a from-scratch Python reimplementation (math.log, same
    Robertson idf) on a corpus small enough to verify by hand."""
    import math

    from ndto_spark.functions.text import bm25_scores

    docs = {
        1: "apple banana apple cherry",
        2: "banana banana durian",
        3: "cherry cherry cherry cherry",
        4: "durian fig grape",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    terms = ["apple", "banana", "cherry"]
    k1, b = 1.2, 0.75

    lens = {d: len(t.split()) for d, t in docs.items()}
    n, avgdl = len(docs), sum(lens.values()) / len(docs)
    tf = {
        (d, w): t.split().count(w)
        for d, t in docs.items()
        for w in terms
        if w in t.split()
    }
    dfreq = {w: sum(1 for (d2, w2) in tf if w2 == w) for w in terms}

    def score(d):
        s = 0.0
        for w in sorted(terms):  # token-ordered fold, as the operator does
            if (d, w) not in tf:
                continue
            idf = math.log(1 + (n - dfreq[w] + 0.5) / (dfreq[w] + 0.5))
            f = tf[(d, w)]
            s += idf * f * (k1 + 1) / (f + k1 * (1 - b + b * lens[d] / avgdl))
        return s

    out = {
        r["doc_id"]: (r["n_terms"], r["score"])
        for r in bm25_scores(df, "doc_id", "text", terms, k1=k1, b=b).collect()
    }
    assert set(out) == {1, 2, 3}  # doc 4 matches no term
    for d in out:
        n_terms, got = out[d]
        assert n_terms == sum(1 for (d2, _) in tf if d2 == d)
        assert got == pytest.approx(score(d), abs=1e-12)


def test_bm25_requires_terms(spark):
    from ndto_spark.functions.text import bm25_scores

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="query_terms"):
        bm25_scores(df, "doc_id", "text", [])
