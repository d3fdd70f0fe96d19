"""BM25 lexical scoring + DSIR importance weights."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F



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


def test_pii_scrub_counts_and_redaction(spark):
    from ndto_spark.functions.text import pii_scrub

    rows = [
        (1, "mail a.b+tag@ex-ample.co.uk and x_9%y@host.io today"),
        (2, "call +49-170-1234567 or +1-555-99887766 now"),
        (3, "host 10.0.255.3 peered with 192.168.1.10"),
        (4, "mixed: u@h.org, +33-6-55443322, 8.8.8.8"),
        (5, "clean text with no identifiers at all"),
        (6, "not-pii: v1.2.3.4.5 chains and a@b (no tld)"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in pii_scrub(df, "doc_id", "text").collect()
    }
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ipv4"]) == (2, 0, 0)
    assert out[1]["clean_text"] == "mail <EMAIL> and <EMAIL> today"
    assert (out[2]["n_email"], out[2]["n_phone"], out[2]["n_ipv4"]) == (0, 2, 0)
    assert out[2]["clean_text"] == "call <PHONE> or <PHONE> now"
    assert (out[3]["n_email"], out[3]["n_phone"], out[3]["n_ipv4"]) == (0, 0, 2)
    assert out[3]["clean_text"] == "host <IPV4> peered with <IPV4>"
    assert (out[4]["n_email"], out[4]["n_phone"], out[4]["n_ipv4"]) == (1, 1, 1)
    assert out[4]["clean_text"] == "mixed: <EMAIL>, <PHONE>, <IPV4>"
    assert (out[5]["n_email"], out[5]["n_phone"], out[5]["n_ipv4"]) == (0, 0, 0)
    assert out[5]["clean_text"] == rows[4][1]
    # v1.2.3.4.5: no word boundary splits 'v1', so the IPv4 match starts
    # at the first post-dot digit and consumes 2.3.4.5; a@b has no TLD
    # and must NOT count as an email. Pin both behaviors.
    assert (out[6]["n_email"], out[6]["n_phone"], out[6]["n_ipv4"]) == (0, 0, 1)
    assert out[6]["clean_text"] == "not-pii: v1.<IPV4> chains and a@b (no tld)"


def test_dsir_weights_separates_target_from_raw(spark):
    from ndto_spark.functions.text import dsir_weights

    # target docs share a distinctive bigram vocabulary; raw-only docs
    # share a different one — target-like docs must score higher
    tgt = [(i, "alpha beta gamma delta alpha beta", "en") for i in range(8)]
    raw = [(100 + i, "omega psi chi phi omega psi", "zh") for i in range(8)]
    mix = [(200, "alpha beta omega psi", "zh")]
    df = spark.createDataFrame(
        tgt + raw + mix, "doc_id long, text string, lang string"
    )
    out = {
        r["doc_id"]: r
        for r in dsir_weights(
            df, "doc_id", "text", F.col("lang") == "en", n_buckets=64
        ).collect()
    }
    assert out[0]["n_grams"] == 5
    assert out[100]["n_grams"] == 5
    assert out[200]["n_grams"] == 3
    # target-vocabulary docs score strictly above raw-only docs, the
    # mixed doc sits between
    assert out[0]["logw"] > out[200]["logw"] > out[100]["logw"]
    assert out[0]["logw"] > 0 > out[100]["logw"]


def test_dsir_weights_short_and_null_docs_drop(spark):
    from ndto_spark.functions.text import dsir_weights

    df = spark.createDataFrame(
        [(1, "one-token", "en"), (2, None, "en"), (3, "two tokens", "en"),
         (None, "two tokens", "en")],
        "doc_id long, text string, lang string",
    )
    rows = dsir_weights(
        df, "doc_id", "text", F.col("lang") == "en", n_buckets=16
    ).collect()
    # only doc 3 has >= 2 tokens and a non-null id
    assert [(r["doc_id"], r["n_grams"]) for r in rows] == [(3, 1)]


def test_dsir_weights_validation(spark):
    from ndto_spark.functions.text import dsir_weights

    df = spark.createDataFrame([(1, "a b", "en")], "doc_id long, text string, lang string")
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_weights(df, "doc_id", "text", F.col("lang") == "en", n_buckets=8192)
    with pytest.raises(ValueError, match="k must be"):
        dsir_weights(df, "doc_id", "text", F.col("lang") == "en", k=0)


def test_normalize_text_nfc_lowercase_and_ws(spark):
    from ndto_spark.functions.text import normalize_text

    df = spark.createDataFrame(
        [
            (1, "Café   DU\tmonde\n"),   # decomposed acute + ws runs
            (2, "Å"),                      # NFC singleton → U+00C5
            (3, None),
        ],
        "id long, text string",
    )
    out = {
        r.id: r.norm_text
        for r in normalize_text(
            df, "id", "text", form="NFC", lowercase=True
        ).collect()
    }
    assert out[1] == "café du monde"
    assert out[2] == "å"
    assert out[3] is None


def test_normalize_text_rejects_bad_form(spark):
    import pytest

    from ndto_spark.functions.text import normalize_text

    df = spark.createDataFrame([(1, "x")], "id long, text string")
    with pytest.raises(ValueError):
        normalize_text(df, "id", "text", form="NFX")


def test_pair_stats_multiset_counts_and_rank(spark):
    from ndto_spark.functions.text import pair_stats

    df = spark.createDataFrame(
        [
            (1, "a a a b"),   # (a,a) x2, (a,b) x1
            (2, "a a"),       # (a,a) x1
            (3, "x"),         # no pair
            (4, ""),          # no pair
        ],
        "doc_id long, text string",
    )
    rows = pair_stats(df, "doc_id", "text").collect()
    got = {(r.left, r.right): r for r in rows}
    assert set(got) == {("a", "a"), ("a", "b")}
    aa, ab = got[("a", "a")], got[("a", "b")]
    assert (aa.tf, aa.doc_freq, aa.pair_rank) == (3, 2, 1)  # overlaps count
    assert (ab.tf, ab.doc_freq, ab.pair_rank) == (1, 1, 2)


def test_domain_filter_extraction_and_blocklist(spark):
    from pyspark.sql import functions as F

    from ndto_spark.functions.text import domain_filter, extract_domain

    df = spark.createDataFrame(
        [
            (1, "https://Sub.Bad.COM:8080/x?y#z"),
            (2, "http://user@good.org/path"),
            (3, "no-scheme.bad.com/path"),
            (4, "https://bad.com"),
            (5, "plaintext"),
        ],
        "id long, url string",
    )
    bl = spark.createDataFrame([("BAD.com",)], "d string")
    got = {r.id: r for r in domain_filter(df, "id", "url", bl).collect()}
    assert (got[1].host, got[1].domain, got[1].blocked) == (
        "sub.bad.com", "bad.com", True)
    assert (got[2].domain, got[2].blocked) == ("good.org", False)
    assert got[3].blocked and got[3].host == "no-scheme.bad.com"
    assert got[4].blocked and got[4].host == "bad.com"
    assert (got[5].domain, got[5].blocked) == ("", False)  # no dot: no domain
    # broadcast shape: the blocklist join must not shuffle the corpus
    plan = domain_filter(df, "id", "url", bl)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_strip_html_drops_containers_decodes_entities(spark):
    from pyspark.sql import functions as F

    from ndto_spark.functions.text import strip_html

    df = spark.createDataFrame(
        [
            (1, "<p>Hello <b>world</b></p>"),
            (2, "<SCRIPT>if(a<b){x}</SCRIPT>keep<style\nmedia=x>p{}</style>me"),
            (3, "&amp;lt; &nbsp;&gt; &quot;q&quot; &#39;z&#39;"),
            (4, "no markup"),
            (5, None),
        ],
        "id long, html string",
    )
    got = {
        r.id: r.t
        for r in df.select("id", strip_html(F.col("html")).alias("t")).collect()
    }
    assert got[1] == "Hello world"
    assert got[2] == "keep me"          # contents of script/style dropped
    assert got[3] == '&lt; > "q" \'z\''  # one decode level; &amp; last
    assert got[4] == "no markup"
    assert got[5] is None


def test_corpus_report_counts_and_shares(spark):
    from ndto_spark.functions.text import corpus_report

    df = spark.createDataFrame(
        [
            (1, "a b c", "s1"),   # 3 tokens
            (2, "d e", "s1"),     # 2 tokens
            (3, "f g h i j", "s2"),  # 5 tokens
        ],
        "doc_id long, text string, source string",
    )
    rows = corpus_report(df, "doc_id", "text", ["source"]).collect()
    got = {r.source: r for r in rows}
    assert (got["s1"].n_docs, got["s1"].n_tokens, got["s1"].max_tokens) == (
        2, 5, 3)
    assert got["s1"].mean_tokens_e4 == 25000  # 2.5 tokens/doc
    assert got["s1"].share_docs_e6 == 666666
    assert got["s2"].share_tokens_e6 == 500000


def test_collocations_lift_prefers_fixed_phrase(spark):
    from ndto_spark.functions.text import collocations

    # 'new york' always adjacent; 'the cat'/'the dog' dilute 'the'
    df = spark.createDataFrame(
        [
            (1, "new york new york the cat"),
            (2, "the dog new york the cat"),
        ],
        "doc_id long, text string",
    )
    rows = collocations(df, "doc_id", "text", min_pair_tf=2).collect()
    got = {(r.left, r.right): r for r in rows}
    ny = got[("new", "york")]
    yt = got[("york", "the")]
    assert ny.pair_tf == 3 and ny.tf_l == 3 and ny.tf_r == 3
    # lift(new york) = (3/7)(12/3)(12/3) = 6.857; (york the) = 4.571
    assert (ny.lift_e6, yt.lift_e6) == (6857142, 4571428)


def test_token_entropy_hand_values_and_uniform_case(spark):
    import math

    from ndto_spark.functions.text import token_entropy

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "x y z w"), (3, "q q q q")],
        "doc_id bigint, text string",
    )
    rows = token_entropy(df, "doc_id", "text").collect()
    got = {r.doc_id: (r.n_tokens, r.n_types, r.entropy_e4, r.ttr_e6) for r in rows}
    e1 = math.log(3) - (2 * math.log(2)) / 3
    assert got[1] == (3, 2, math.floor(e1 * 1e4), 666_666)
    # uniform distribution: entropy = ln(n_types) exactly
    assert got[2] == (4, 4, math.floor(math.log(4) * 1e4), 1_000_000)
    # degenerate repetition: entropy 0
    assert got[3] == (4, 1, 0, 250_000)


def test_canonical_url_variants_collapse(spark):
    from pyspark.sql import functions as F

    from ndto_spark.functions.text import canonical_url

    variants = [
        "https://Example3.com/p/7",
        "https://example3.com:443/p/7",
        "https://example3.com/p/7/",
        "https://example3.com/p/7?utm_source=x",
        "https://example3.com/p/7?utm_source=x&utm_medium=y#frag",
        "https://example3.com/p/7#frag",
    ]
    df = spark.createDataFrame([(v,) for v in variants], "url string")
    got = {r.c for r in df.select(canonical_url(F.col("url")).alias("c")).collect()}
    assert got == {"https://example3.com/p/7"}
    # non-utm params survive, utm seams are repaired
    df2 = spark.createDataFrame(
        [
            ("https://a.com/x?utm_source=s&keep=1",),
            ("http://a.com:80/x?keep=1&utm_c=2",),
            ("https://a.com/x?keep=1",),
        ],
        "url string",
    )
    got2 = sorted(
        r.c for r in df2.select(canonical_url(F.col("url")).alias("c")).collect()
    )
    assert got2 == [
        "http://a.com/x?keep=1",
        "https://a.com/x?keep=1",
        "https://a.com/x?keep=1",
    ]


def test_linear_scores_hand_fold_and_threshold(spark):
    import hashlib

    from ndto_spark.functions.text import linear_scores

    w = [1000, -2000, 3000, 500]
    df = spark.createDataFrame(
        [(1, "a b c a"), (2, ""), (3, None), (4, "zz")],
        "id long, text string",
    )
    out = {
        r["id"]: (r["n_tokens"], r["margin_e6"], r["keep"])
        for r in linear_scores(
            df, "id", "text", w, bias_e6=10, threshold_e6=200
        ).collect()
    }

    def bucket(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 4

    m1 = 10 + sum(w[bucket(t)] for t in ["a", "b", "c", "a"])
    assert out[1] == (4, m1, m1 > 200 * 4)
    assert out[2] == (0, 10, True)  # zero tokens: keep iff bias > 0
    m4 = 10 + w[bucket("zz")]
    assert out[4] == (1, m4, m4 > 200)
    # null text: tokens NULL -> bind yields NULL margin, size -1? check:
    assert out[3][0] is None or out[3][0] in (-1, 0)

    import pytest

    with pytest.raises(ValueError, match="4096"):
        linear_scores(df, "id", "text", [1])


def test_encoding_report_counts_and_ok_flag(spark):
    from ndto_spark.functions.text import encoding_report

    rows = [
        (1, "clean ascii text"),
        (2, "cafÃ© and â€™s"),   # Ã© + â€™
        (3, "deg Â° twice Â°"),        # Â° ×2
        (4, "lost � bytes ��"),             # U+FFFD ×3
        (5, "bell \x07 and null-ish \x01\x1f ok \t\n"),    # ctrl ×3, \t\n fine
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r for r in encoding_report(df, "doc_id", "text").collect()}
    assert (got[1].n_replacement, got[1].n_mojibake, got[1].n_ctrl) == (0, 0, 0)
    assert got[1].encoding_ok
    assert got[2].n_mojibake == 2 and not got[2].encoding_ok
    assert got[3].n_mojibake == 2
    assert got[4].n_replacement == 3
    assert got[5].n_ctrl == 3 and not got[5].encoding_ok
    assert got[6].n_replacement is None and got[6].encoding_ok is False
