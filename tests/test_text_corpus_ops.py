"""remove_common_lines (boilerplate line removal) and vocab_oov
(vocabulary / out-of-vocabulary rate) — corpus-level text operators."""
from __future__ import annotations

from ndto_spark.functions import text as textfn


def _docs(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id bigint, text string")


def test_remove_common_lines_drops_only_frequent_lines(spark):
    boiler = "ACCEPT ALL COOKIES"
    rows = [
        (1, f"{boiler}\nalpha one\nrare footer"),
        (2, f"{boiler}\nbeta two"),
        (3, f"{boiler}\ngamma three\nrare footer"),
        (4, "delta four"),
    ]
    out = {
        r.doc_id: r
        for r in textfn.remove_common_lines(
            _docs(spark, rows), "doc_id", "text", min_df=3
        ).collect()
    }
    assert out[1].clean_text == "alpha one\nrare footer"
    assert out[1].n_lines == 3 and out[1].n_removed == 1
    assert out[2].clean_text == "beta two"
    # 'rare footer' has df=2 < min_df: kept
    assert out[3].clean_text == "gamma three\nrare footer"
    assert out[4].clean_text == "delta four" and out[4].n_removed == 0


def test_remove_common_lines_df_is_per_document(spark):
    # doc 1 repeats the line 3 times, but document frequency is 2 < min_df
    rows = [(1, "dup\ndup\ndup\nbody"), (2, "dup\nother")]
    out = {
        r.doc_id: r
        for r in textfn.remove_common_lines(
            _docs(spark, rows), "doc_id", "text", min_df=3
        ).collect()
    }
    assert out[1].n_removed == 0 and out[2].n_removed == 0


def test_remove_common_lines_short_lines_never_removed(spark):
    # empty lines appear in every doc but are below min_line_chars
    rows = [(i, f"a\n\nbody {i}") for i in range(1, 6)]
    out = textfn.remove_common_lines(
        _docs(spark, rows), "doc_id", "text", min_df=3, min_line_chars=2
    ).collect()
    for r in out:
        assert r.n_removed == 0
        assert "\n\n" in r.clean_text  # empty line survives


def test_remove_common_lines_max_common_bounds_removal(spark):
    # two boilerplate lines, cap of 1: only the higher-df one is removed
    rows = [
        (i, ("hot line\n" if i <= 5 else "") + ("warm line\n" if i <= 4 else "") + f"body {i}")
        for i in range(1, 7)
    ]
    out = {
        r.doc_id: r
        for r in textfn.remove_common_lines(
            _docs(spark, rows), "doc_id", "text", min_df=3, max_common=1
        ).collect()
    }
    assert out[1].clean_text == "warm line\nbody 1"  # hot removed, warm kept
    assert out[6].n_removed == 0


def test_vocab_oov_rates_and_zero_token_docs(spark):
    rows = [
        (1, "the the the cat"),
        (2, "the dog"),
        (3, ""),
        (4, "zzz qqq"),
    ]
    out = {
        r.doc_id: r
        for r in textfn.vocab_oov(
            _docs(spark, rows), "doc_id", "text", vocab_size=2
        ).collect()
    }
    # counts: the=5, cat=1, dog=1, zzz=1, qqq=1 -> vocab = {the, cat} (tie
    # broken token-asc among count-1 tokens)
    assert out[1].n_tokens == 4 and out[1].n_oov == 0
    assert out[2].n_tokens == 2 and out[2].n_oov == 1
    assert out[2].oov_rate_e6 == 500000
    assert out[3].n_tokens == 0 and out[3].oov_rate_e6 is None
    assert out[4].n_oov == 2 and out[4].oov_rate_e6 == 1000000


def test_infer_json_schema_discovers_keys_types_and_invalid(spark):
    from ndto_spark.json_rules import infer_json_schema

    rows = [
        ('{"a": 1, "b": "x"}',),
        ('{"a": 1.5, "c": [1], "d": {"e": 2}, "z": null}',),
        ('{"a": true}',),
        ("not json",),
        (None,),
        ("[1, 2]",),  # valid JSON, not an object -> invalid for inference
    ]
    df = spark.createDataFrame(rows, schema="js string")
    out = {
        (r.path, r.json_type): r for r in infer_json_schema(df, "js").collect()
    }
    assert out[("$", "object")].n == 3
    assert out[("$", "invalid")].n == 2  # 'not json' + root array; NULL excluded
    assert out[("$.a", "integer")].n == 1
    assert out[("$.a", "number")].n == 1
    assert out[("$.a", "boolean")].n == 1
    assert out[("$.b", "string")].n == 1
    assert out[("$.c", "array")].n == 1
    assert out[("$.d", "object")].n == 1
    assert out[("$.z", "null")].n == 1
    assert out[("$", "object")].present_e6 == 500000  # 3 of 6 rows


def test_c4_filter_reasons_and_priority(spark):
    from ndto_spark.functions.text import c4_filter

    rows = [
        (1, "the " + " ".join(f"word{i}" for i in range(60))),  # keep
        (2, "the cat"),                                          # too few
        (3, "the " + "a " * 80),                                 # mean len low (prio over distinct)
        (4, "the " + " ".join("verylongtokenhere" for _ in range(60))),  # mean len high
        (5, " ".join(f"tok{i}" for i in range(60))),             # no stopwords
        (6, "the " + " ".join("!!!" for _ in range(60))),        # punct (mean ok? '!!!' len3) -> punct
        (7, "the " + "dup " * 70),                               # low distinct ratio
    ]
    out = {
        r.doc_id: r
        for r in c4_filter(
            spark.createDataFrame(rows, schema="doc_id bigint, text string"),
            "doc_id",
            "text",
            min_tokens=10,
            min_stopwords=1,
        ).collect()
    }
    assert out[1].keep and out[1].fail_reason is None
    assert out[2].fail_reason == "too_few_tokens"
    assert out[3].fail_reason == "mean_token_len_low"
    assert out[4].fail_reason == "mean_token_len_high"
    assert out[5].fail_reason == "low_stopword_count"
    assert out[6].fail_reason == "high_punct_ratio"
    assert out[7].fail_reason == "low_distinct_ratio"


def test_simhash_keepers_apply_keeps_min_per_group(spark):
    from ndto_spark import dedup

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),   # identical -> same simhash as 1
        (3, "totally different words here unrelated content"),
    ]
    df = spark.createDataFrame(rows, schema="doc_id bigint, text string")
    groups = dedup.simhash_keepers(df, "doc_id", "text", bits=16)
    g = {r.keeper_id: r.n_docs for r in groups.collect()}
    assert g[1] == 2  # docs 1+2 grouped, min id keeps
    kept = sorted(
        r.doc_id for r in dedup.apply_dedup(df, groups, "doc_id").collect()
    )
    assert kept == [1, 3]


def test_lm_score_exact_bigram_probabilities(spark):
    from ndto_spark.functions.text import lm_score

    df = spark.createDataFrame(
        [
            (1, "a b a b"),      # bigrams: (a,b) x2, (b,a) x1
            (2, "a c"),          # bigram: (a,c)
            (3, "solo"),         # < 2 tokens: emits nothing
        ],
        "doc_id long, text string",
    )
    # corpus: c(a,b)=2, c(b,a)=1, c(a,c)=1; prefixes: c(a.)=3, c(b.)=1
    out = {r["doc_id"]: r for r in lm_score(df, "doc_id", "text").collect()}
    assert set(out) == {1, 2}
    p_ab = (2 * 1_000_000) // 3
    p_ba = (1 * 1_000_000) // 1
    r1 = out[1]
    assert r1["n_bigrams"] == 3
    assert r1["sum_p_e6"] == 2 * p_ab + p_ba
    assert r1["avg_p_e6"] == (2 * p_ab + p_ba) // 3
    r2 = out[2]
    assert (r2["n_bigrams"], r2["sum_p_e6"]) == (1, (1 * 1_000_000) // 3)


def test_zipf_fit_closed_form_slope(spark):
    from ndto_spark.functions.text import zipf_fit

    # counts: a=8, b=4, c=2, d=2, e=1 (pruned by min_tf=2)
    # ranks (tf desc, token): a=1 b=2 c=3 d=4
    # x = flog2(rank) = 0,1,1,2 ; y = flog2(tf) = 3,2,1,1
    # n=4 sx=4 sy=7 sxy=5 sxx=6 -> cov=-8 var=8 -> slope_e6 = -1000000
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"] * 2 + ["e"])
    df = _docs(spark, [(1, text)])
    r = zipf_fit(df, "doc_id", "text").collect()
    assert len(r) == 1
    row = r[0]
    assert (row["n_terms"], row["sx"], row["sy"], row["sxy"], row["sxx"]) == (
        4, 4, 7, 5, 6,
    )
    assert row["slope_e6"] == -1_000_000
    assert row["grp"] == "all"


def test_zipf_fit_degenerate_var_gives_null_and_groups(spark):
    from ndto_spark.functions.text import zipf_fit

    df = spark.createDataFrame(
        [(1, "x x", "en"), (2, "y y z z w w v v", "de")],
        "doc_id bigint, text string, lang string",
    )
    out = {
        r["lang"]: r
        for r in zipf_fit(df, "doc_id", "text", group_col="lang").collect()
    }
    # en: one term -> rank 1 -> x=0 for every point -> var=0 -> NULL slope
    assert out["en"]["n_terms"] == 1 and out["en"]["slope_e6"] is None
    # de: four terms all tf=2 -> y=1 flat -> cov=0 -> slope 0 (var>0)
    assert out["de"]["n_terms"] == 4 and out["de"]["slope_e6"] == 0


def test_best_per_group_argmax_and_tie_break(spark):
    from ndto_spark import dedup

    members = spark.createDataFrame(
        [(1, "g1"), (2, "g1"), (3, "g1"), (4, "g2")],
        "doc_id bigint, grp string",
    )
    scores = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (4, 7)], "doc_id bigint, score int"
    )
    out = {
        r["grp"]: r
        for r in dedup.best_per_group(
            members, scores, "doc_id", "grp", "score"
        ).collect()
    }
    # tie at score 9 between ids 2 and 3 -> min id wins
    assert (out["g1"]["best_id"], out["g1"]["best_score"],
            out["g1"]["n_members"]) == (2, 9, 3)
    assert (out["g2"]["best_id"], out["g2"]["best_score"],
            out["g2"]["n_members"]) == (4, 7, 1)


def test_simhash_members_matches_keepers_grouping(spark):
    from ndto_spark import dedup

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),
        (3, "totally different words here unrelated content"),
    ]
    df = spark.createDataFrame(rows, schema="doc_id bigint, text string")
    m = {r["doc_id"]: r["simhash"] for r in
         dedup.simhash_members(df, "doc_id", "text", bits=16).collect()}
    assert m[1] == m[2] and m[1] != m[3]
