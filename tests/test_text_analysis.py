from __future__ import annotations

from pyspark.sql import functions as F

from data_pipelines_worker_spark.operators import text_analysis as ta


def one(spark, col, text):
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(col.alias("v")).first().v


def test_token_counts(spark):
    assert one(spark, F.size(ta.tokenize_ws(F.col("t"))), "a b c") == 3
    assert one(spark, ta.token_count_regex(F.col("t")), "ab1 cd, 23x") == 5  # ab,1,cd,23,x


def test_lang_id_deterministic_priority(spark):
    # 'de' words dominate → de; empty text scores 0 everywhere → 'en' priority
    assert one(spark, ta.lang_id(ta.tokenize_ws(F.col("t"))), "der die das und ist") == "de"
    assert one(spark, ta.lang_id(ta.tokenize_ws(F.col("t"))), "zzz qqq") == "en"


def test_quality_score_bounds(spark):
    v = one(spark, ta.quality_score(F.col("t")), "the small table and the fast row")
    assert 0.0 <= v <= 1.0


def test_fingerprints_deterministic(spark):
    t = "some stable text"
    a = one(spark, ta.fingerprint_rolling(ta.tokenize_ws(F.col("t"))), t)
    b = one(spark, ta.fingerprint_rolling(ta.tokenize_ws(F.col("t"))), t)
    assert a == b
    assert one(spark, ta.fingerprint_md5(F.col("t")), "ABC") == one(
        spark, ta.fingerprint_md5(F.col("t")), "abc"
    )


def test_fingerprint_udf_matches_reference_fold(spark):
    # Arrow Horner (hot path) ≡ interpreted F.aggregate fold (reference
    # form) on edge shapes: empty text, single word, repeated spaces
    # (empty tokens), unicode first chars, and a long document.
    texts = [
        "",
        "x",
        "a  b",  # double space → empty token, code 0
        "some stable text with several words repeated words words",
        "Ωmega über naïve",  # non-ASCII first codepoints
        " ".join(f"w{i}" for i in range(500)),
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    words = ta.tokenize_ws(F.col("t"))
    rows = df.select(
        ta.fingerprint_rolling(words).alias("ref"),
        ta.fingerprint_rolling_udf()(words).alias("fast"),
    ).collect()
    for r in rows:
        assert r.ref == r.fast


def test_normalize_text(spark):
    assert one(spark, ta.normalize_text(F.col("t")), "  Héllo,   WORLD!! 42 ") == "h llo world 42"


def test_bpe_greedy_longest_match():
    # 'the' is a 3-char vocab entry: 'the' → 1 token; 'theory' → the|or|y
    assert ta.bpe_tokenize_count("the") == 1
    assert ta.bpe_tokenize_count("theory") == 3
    # no vocab hit → one token per char
    assert ta.bpe_tokenize_count("zzz") == 3
    assert ta.bpe_tokenize_count("") == 0
    # greedy takes the longest prefix at each position ('ment' over 'men')
    assert ta.bpe_tokenize_count("ment") == 1


def test_bpe_udf_matches_python_kernel(spark):
    from data_pipelines_worker_spark.session import local_df

    words = ["the", "theory", "zzz", "ment", "information", "a"]
    df = local_df(spark, [(w,) for w in words], "word string")
    got = {
        r.word: r.n
        for r in df.withColumn("n", ta.bpe_count_udf()(F.col("word"))).collect()
    }
    assert got == {w: ta.bpe_tokenize_count(w) for w in words}


def test_bpe_train_merges_tiny_corpus(spark):
    # corpus: "abab abab ab" -> vocab {abab:2, ab:1}
    # chars pairs weighted: (a b): abab has 2 occurrences*2 + ab 1 = 5
    #                       (b a): abab 1 pair * 2 = 2
    # merge 1 = "a b" (5); re-seg: abab -> "ab ab", ab -> "ab"
    # merge 2 pairs: (ab ab): 2 -> merge "ab ab" (2)
    from data_pipelines_worker_spark.operators.text_analysis import bpe_train_merges
    from data_pipelines_worker_spark.session import local_df

    docs = local_df(spark, [(1, "abab abab ab")], "doc_id long, text string")
    rules = {r["rank"]: (r["pair"], r["cnt"]) for r in bpe_train_merges(docs, 2).collect()}
    assert rules[1] == ("a b", 5)
    assert rules[2] == ("ab ab", 2)


def test_bpe_train_merges_deterministic_across_partitioning(spark, sf_dir):
    from data_pipelines_worker_spark.operators.text_analysis import bpe_train_merges
    from data_pipelines_worker_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = [tuple(r) for r in bpe_train_merges(docs, 3).collect()]
    b = [tuple(r) for r in bpe_train_merges(docs.repartition(7), 3).collect()]
    assert a == b and len(a) == 3


def test_fingerprint_rolling_udf_null_text(spark):
    from pyspark.sql import functions as F
    from data_pipelines_worker_spark.operators.text_analysis import fingerprint_rolling_udf
    from data_pipelines_worker_spark.session import local_df

    df = local_df(spark, [(1, "hello world"), (2, None)], "doc_id long, text string")
    fp = fingerprint_rolling_udf()
    rows = {
        r["doc_id"]: r["fp"]
        for r in df.select(
            "doc_id", fp(F.split(F.col("text"), " ", -1)).alias("fp")
        ).collect()
    }
    assert rows[1] is not None
    assert rows[2] is None


def test_bpe_train_stops_early_when_pairs_exhausted(spark):
    # single-char words have no adjacent pairs: zero rules, no crash
    from data_pipelines_worker_spark.operators.text_analysis import bpe_train_merges
    from data_pipelines_worker_spark.session import local_df

    docs = local_df(spark, [(1, "a b c")], "doc_id long, text string")
    assert bpe_train_merges(docs, 3).count() == 0
    # two-char words exhaust after one merge
    docs2 = local_df(spark, [(1, "ab ab")], "doc_id long, text string")
    rules = bpe_train_merges(docs2, 3).collect()
    assert len(rules) == 1 and rules[0]["pair"] == "a b"


def test_token_occurrences_adjacent_repeats(spark):
    # space-doubling gives each token its own flanking delimiters: the
    # naive single-pad count would see "the the the" as 2 (non-overlapping
    # ' the ' matches share the middle spaces); the operator must say 3
    c = ta.token_occurrences(F.col("t"), "the")
    assert one(spark, c, "the the the") == 3
    assert one(spark, c, "the") == 1
    assert one(spark, c, "other theory the") == 1  # no substring hits
    assert one(spark, c, "") == 0
    assert one(spark, c, "a  the  b") == 1  # repeated delimiter spaces


def test_gopher_rules_known_documents(spark):
    rules = ta.gopher_rule_columns(F.col("t"))

    def row(text):
        df = spark.createDataFrame([(text,)], "t string")
        return df.select(*[c.alias(n) for n, c in rules.items()]).first()

    good = row("the quick brown fox and the lazy dog " * 6 + "end of tale")
    assert good.rule_word_count  # 50 <= 50 words
    assert good.rule_mean_word_length
    assert good.rule_alpha_words
    assert good.rule_stopwords  # 'the' x12 + 'and' x6
    assert good.rule_symbol_ratio

    short = row("too few words")
    assert not short.rule_word_count

    symbols = row("### ### ### to the of and...")
    # 9 hashes + 1 ellipsis over 7 words: ratio 10/7 > 0.1
    assert symbols.sw_occ == 3 and not symbols.rule_symbol_ratio

    numeric = row(" ".join(str(i) for i in range(60)))
    assert numeric.rule_word_count and not numeric.rule_alpha_words
    assert not numeric.rule_stopwords
