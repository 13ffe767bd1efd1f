"""Correctness queries for the text-analysis operator family."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import text_analysis as ta
from ..session import load_table
from . import register


def _sw_sql(langs: tuple[str, ...] = ta.LANG_PRIORITY) -> dict[str, str]:
    return {
        lang: "[" + ", ".join(f"'{w}'" for w in ta.LANG_STOPWORDS[lang]) + "]"
        for lang in langs
    }


@register(
    "token_count",
    """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS n_re_tokens
    FROM documents
    """,
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(ta.tokenize_ws(F.col("text"))).cast("long").alias("n_ws_tokens"),
        ta.token_count_regex(F.col("text")).alias("n_re_tokens"),
    )


def _lang_id_oracle() -> str:
    sw = _sw_sql()
    score = {
        lang: f"len(list_filter(string_split(text, ' '), w -> list_contains({arr}, w)))"
        for lang, arr in sw.items()
    }
    return f"""
    SELECT doc_id,
           CASE
             WHEN {score['en']} >= {score['es']} AND {score['en']} >= {score['de']}
                  AND {score['en']} >= {score['fr']} THEN 'en'
             WHEN {score['es']} >= {score['de']} AND {score['es']} >= {score['fr']} THEN 'es'
             WHEN {score['de']} >= {score['fr']} THEN 'de'
             ELSE 'fr'
           END AS lang_pred
    FROM documents
    """


@register("lang_id", _lang_id_oracle())
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", ta.lang_id(ta.tokenize_ws(F.col("text"))).alias("lang_pred"))


def _quality_oracle() -> str:
    all_sw = "[" + ", ".join(
        f"'{w}'" for ws in ta.LANG_STOPWORDS.values() for w in ws
    ) + "]"
    return f"""
    SELECT doc_id, CASE WHEN n_chars = 0 THEN 0.0 ELSE round(
        0.4 * (1.0 - least(abs((n_chars - (n_words - 1)) / n_words - 5.0) / 5.0, 1.0))
      + 0.3 * least(sw_hits / n_words * 4.0, 1.0)
      + 0.3 * (alpha_chars / n_chars), 6) END AS quality
    FROM (
      SELECT doc_id,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_words,
             CAST(len(list_filter(string_split(text, ' '),
                                  w -> list_contains({all_sw}, w))) AS DOUBLE) AS sw_hits,
             CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) AS alpha_chars
      FROM documents
    )
    """


@register("quality_score", _quality_oracle())
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.round(ta.quality_score(F.col("text")), 6).alias("quality")
    )


@register(
    "doc_fingerprint",
    f"""
    SELECT doc_id,
           md5(lower(text)) AS fp_md5,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ' '),
                              w -> CAST(ascii(w[1]) + length(w) AS BIGINT))),
             (acc, x) -> (acc * 31 + x) % {ta.MOD}) AS fp_rolling
    FROM documents
    """,
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = ta.tokenize_ws(F.col("text"))
    return docs.select(
        "doc_id",
        ta.fingerprint_md5(F.col("text")).alias("fp_md5"),
        ta.fingerprint_rolling_udf()(words).alias("fp_rolling"),
    )


@register(
    "normalize_text",
    """
    SELECT doc_id,
           trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS normalized
    FROM documents
    """,
)
def q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", ta.normalize_text(F.col("text")).alias("normalized"))


def _corpus_prep_oracle() -> str:
    sw = _sw_sql()
    score = {
        lang: f"len(list_filter(string_split(text, ' '), w -> list_contains({arr}, w)))"
        for lang, arr in sw.items()
    }
    all_sw = "[" + ", ".join(
        f"'{w}'" for ws in ta.LANG_STOPWORDS.values() for w in ws
    ) + "]"
    return f"""
    WITH keep AS (
      SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
    ),
    feats AS (
      SELECT doc_id,
             CASE
               WHEN {score['en']} >= {score['es']} AND {score['en']} >= {score['de']}
                    AND {score['en']} >= {score['fr']} THEN 'en'
               WHEN {score['es']} >= {score['de']} AND {score['es']} >= {score['fr']} THEN 'es'
               WHEN {score['de']} >= {score['fr']} THEN 'de'
               ELSE 'fr'
             END AS lang_pred,
             CASE WHEN length(text) = 0 THEN 0.0 ELSE round(
               0.4 * (1.0 - least(abs((length(text) - (len(string_split(text, ' ')) - 1))
                                      / CAST(len(string_split(text, ' ')) AS DOUBLE) - 5.0) / 5.0, 1.0))
             + 0.3 * least(len(list_filter(string_split(text, ' '),
                                           w -> list_contains({all_sw}, w)))
                           / CAST(len(string_split(text, ' ')) AS DOUBLE) * 4.0, 1.0)
             + 0.3 * (length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                      / CAST(length(text) AS DOUBLE)), 6) END AS quality,
             CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT f.doc_id, f.lang_pred, f.quality, f.n_tokens
    FROM feats f JOIN keep k ON k.doc_id = f.doc_id
    WHERE f.quality >= 0.45
    """


@register("corpus_prep", _corpus_prep_oracle())
def q_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data-prep pipeline in one plan: exact dedup
    (keep the canonical min-id copy) → language ID → quality scoring →
    token counting → quality gate. All text features are projections over
    one documents scan; dedup adds the single content-keyed window shuffle
    — the whole corpus-prep pass costs one shuffle + one scan, the shape
    you want when this runs over 100 TB of crawl."""
    docs = load_table(spark, sf_dir, "documents")
    from ..operators.dedup import exact_dedup

    kept = exact_dedup(docs, "doc_id", "text").where(~F.col("is_duplicate"))
    words = ta.tokenize_ws(F.col("text"))
    return (
        kept.select(
            "doc_id",
            ta.lang_id(words).alias("lang_pred"),
            F.round(ta.quality_score(F.col("text")), 6).alias("quality"),
            ta.token_count_regex(F.col("text")).alias("n_tokens"),
        )
        .where(F.col("quality") >= 0.45)
    )


@register(
    "stratified_sample",
    """
    SELECT source, count(*) AS n_kept,
           CAST(min(doc_id) AS BIGINT) AS min_doc, CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM (
      SELECT source, doc_id FROM documents
      WHERE ((doc_id % 2147483648) * 2654435761) % 4294967296 % 100 < 20
    )
    GROUP BY source
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~20% downsample by multiplicative hash of the id —
    the reproducible sampling a training-data pipeline needs (same subset
    on every run/engine, no rand()). Engine-portable arithmetic (Knuth
    hash, plain integer ops) so DuckDB draws the identical sample; scale
    cost is a scan + one tiny aggregation, the filter evaluates inside
    codegen and prunes before any shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    keep = (
        F.pmod(F.pmod(F.pmod(F.col("doc_id"), F.lit(1 << 31)) * F.lit(2654435761), F.lit(1 << 32)), F.lit(100))
        < 20
    )
    return (
        docs.where(keep)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.min("doc_id").cast("long").alias("min_doc"),
            F.max("doc_id").cast("long").alias("max_doc"),
        )
    )


@register(
    "word_frequencies",
    """
    SELECT w AS word, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
    WHERE w != ''
    GROUP BY w
    ORDER BY n DESC, w
    LIMIT 25
    """,
)
def q_word_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary profile: top-25 words by frequency. explode →
    map-side-combined count → global top-k; the ordering tie-breaks on the
    word so the cut is deterministic. At 100 TB this is the canonical
    two-phase heavy-hitters shape — partial counts per partition, one
    shuffle of (word, partial) pairs, a tiny global sort of the group
    counts (vocabulary-sized, not corpus-sized)."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(ta.tokenize_ws(F.col("text"))).alias("word"))
    return (
        words.where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(25)
    )


def _bpe_oracle() -> str:
    vocab_vals = ", ".join(f"('{t}', {len(t)})" for t in ta.BPE_VOCAB)
    return f"""
    WITH RECURSIVE vocab(tok, toklen) AS (VALUES {vocab_vals}),
    toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '{ta.BPE_PRESPLIT}')) AS word
      FROM documents
    ),
    words AS (SELECT DISTINCT word FROM toks),
    steps AS (
      SELECT word, word AS rest, 0 AS n FROM words
      UNION ALL
      SELECT word,
             substr(rest, 1 + coalesce((SELECT max(toklen) FROM vocab
                                        WHERE substr(rest, 1, toklen) = tok), 1)) AS rest,
             n + 1 AS n
      FROM steps WHERE rest <> ''
    ),
    wtok AS (SELECT word, n AS n_tok FROM steps WHERE rest = '')
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens
    FROM toks JOIN wtok USING (word)
    GROUP BY doc_id
    """


@register("token_count_bpe", _bpe_oracle())
def q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword token metering with a broadcast-vocab greedy longest-match
    (BPE-style) tokenizer — what a training-data pipeline actually meters,
    vs token_count's regex proxy.

    Scale shape: pre-split is a codegen'd regexp explode; the Python
    tokenizer touches *distinct* words only (per-word memoization, the
    GPT-2 lru_cache pattern distributed); counts rejoin on the word key
    and aggregate per document. At 100 TB the UDF input is the language's
    vocabulary, not the corpus — the two shuffles (distinct + final
    groupBy) carry short keys and AQE picks broadcast for the counts side
    when it fits."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(ta.BPE_PRESPLIT), 0)
        ).alias("word"),
    )
    counts = (
        words.select("word").distinct().withColumn("n_tok", ta.bpe_count_udf()(F.col("word")))
    )
    return (
        words.join(counts, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )


# --- TF-IDF top terms (round 4) --------------------------------------------

_TFIDF_ORACLE = """
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
s AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC, tf.term
         ) AS rank
  FROM tf JOIN df USING (term)
)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, term,
       CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df
FROM s WHERE rank <= 3
"""


@register("tfidf_top_terms", _TFIDF_ORACLE)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most characteristic terms per document, ranked by the
    rational tf/df score (monotone in idf for a fixed doc; chosen over
    tf·ln(N/df) because the single IEEE division of two exact integers is
    engine-portable, while ln() is libm-local — the window_functions
    lesson applied to scoring). Ties break on the term string.

    Scale shape: term frequencies are one hash aggregation on (doc, term);
    document frequencies reuse that aggregate (one more shuffle on term,
    vocabulary-sized output, broadcast back); the top-3 cut is a
    rank-window per doc. The emitted columns are exact integers + strings
    — the float score exists only inside the sort."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    words = docs.select("doc_id", F.explode(F.split("text", " ", -1)).alias("term"))
    tf = words.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = W.partitionBy("doc_id").orderBy(
        (F.col("tf").cast("double") / F.col("df")).desc(), F.asc("term")
    )
    return (
        tf.join(F.broadcast(df_), "term")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 3)
        .select("doc_id", "rank", "term", "tf", "df")
    )


# --- BPE merge training (round 4) ------------------------------------------

def _bpe_train_oracle(n_merges: int = 3) -> str:
    stages = [
        """
w AS (
  SELECT word, count(*) AS n
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY word
),
s0 AS (SELECT word, n, rtrim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seg FROM w)"""
    ]
    for i in range(1, n_merges + 1):
        stages.append(f"""
p{i} AS (
  SELECT sym[j] || ' ' || sym[j + 1] AS pair, sum(n) AS c
  FROM (SELECT n, string_split(seg, ' ') AS sym FROM s{i - 1}),
       LATERAL (SELECT unnest(generate_series(1, len(sym) - 1)) AS j) g
  GROUP BY pair
),
b{i} AS (SELECT pair, c FROM p{i} ORDER BY c DESC, pair LIMIT 1),
s{i} AS (
  SELECT word, n,
         trim(replace(
           replace(' ' || seg || ' ',
                   ' ' || (SELECT pair FROM b{i}) || ' ',
                   ' ' || replace((SELECT pair FROM b{i}), ' ', '') || ' '),
           ' ' || (SELECT pair FROM b{i}) || ' ',
           ' ' || replace((SELECT pair FROM b{i}), ' ', '') || ' '))
           AS seg
  FROM s{i - 1}
)""")
    unions = "\nUNION ALL\n".join(
        f"SELECT {i} AS rank, pair, CAST(c AS BIGINT) AS cnt FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    return "WITH " + ",".join(stages) + "\n" + unions


@register("bpe_train_merges", _bpe_train_oracle())
def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three rounds of BPE merge-rule training over the corpus vocabulary,
    value-hash-verified — like embedding_kmeans, an iterative algorithm
    under the exact gate (integer pair counts, lexicographic tie-breaks,
    engine-identical left-to-right replace). The DuckDB oracle unrolls the
    three train steps as CTE stages. See
    :func:`..operators.text_analysis.bpe_train_merges`."""
    docs = load_table(spark, sf_dir, "documents")
    return ta.bpe_train_merges(docs, n_merges=3)


@register(
    "vocab_richness",
    """
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    c AS (SELECT doc_id, word, count(*) AS n FROM w GROUP BY doc_id, word)
    SELECT doc_id,
           CAST(sum(n) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           CAST(count(*) AS DOUBLE) / sum(n) AS ttr,
           CAST(max(n) AS BIGINT) AS max_word_freq
    FROM c GROUP BY doc_id
    """,
)
def q_vocab_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-richness profile per document — type count, token count,
    hapax legomena, type-token ratio, top word frequency: the signals
    repetition/boilerplate filters cut on (a spam page has low TTR and a
    dominating max frequency; lorem-ipsum churn has high hapax share).

    Scale shape: explode → ONE (doc, word)-keyed count with map-side
    combine → per-doc rollup. Everything integer except the final TTR,
    a single IEEE division of two exact counts. Complements
    repetition_signals (char/n-gram level) at the word level."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.explode(F.split("text", " ", -1)).alias("word"))
    c = w.groupBy("doc_id", "word").agg(F.count("*").alias("n"))
    return c.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).cast("long").alias("n_hapax"),
        (F.count("*").cast("double") / F.sum("n")).alias("ttr"),
        F.max("n").cast("long").alias("max_word_freq"),
    )


def _crossval_oracle() -> str:
    from .sketch_queries import _hll_mix_sql

    return f"""
    WITH s AS (
      SELECT doc_id, source,
             CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT)
               AS n_tokens,
             {_hll_mix_sql("doc_id")} % 10 AS bucket
      FROM documents
    ),
    f AS (
      SELECT source,
             CASE WHEN bucket < 8 THEN 'train'
                  WHEN bucket = 8 THEN 'val' ELSE 'test' END AS fold,
             n_tokens
      FROM s
    )
    SELECT source, fold,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens
    FROM f GROUP BY source, fold
    """


@register("crossval_split", _crossval_oracle())
def q_crossval_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test manifest per source: fold
    assignment is a pure function of the document id, so any worker, any
    partitioning, any rerun — or a different engine entirely — assigns
    every document to the same fold with no shared state and no stored
    split table. The hash is the xor-fold mix from sketch_queries, NOT a
    bare affine map: ids are assigned round-robin across sources
    (doc_id ≡ source index mod n_sources), and an affine map sends an
    arithmetic id progression to an arithmetic bucket progression —
    observed: stride 20·a ≡ 0 (mod 10), every source landing wholesale
    in one fold. The per-(source, fold) token totals are the numbers a
    training config is provisioned from.

    Scale shape: map-only fold tag on the scan, one (source, fold)
    rollup with map-side combine; nothing else moves."""
    from .sketch_queries import _hll_mix_col

    docs = load_table(spark, sf_dir, "documents")
    bucket = _hll_mix_col(F.col("doc_id")) % 10
    fold = (
        F.when(bucket < 8, "train").when(bucket == 8, "val").otherwise("test")
    )
    return (
        docs.select(
            "source",
            fold.alias("fold"),
            ta.token_count_regex(F.col("text")).alias("n_tokens"),
        )
        .groupBy("source", "fold")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
    )


# --- character coverage (tokenizer alphabet selection) ----------------------

_CHAR_COVERAGE_ORACLE = """
WITH ch AS (
  SELECT substr(text, i, 1) AS ch
  FROM documents, unnest(generate_series(1, length(text))) AS t(i)
),
cnt AS (SELECT ch, CAST(count(*) AS BIGINT) AS c FROM ch GROUP BY ch),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cnt),
ranked AS (
  SELECT ch, c,
         CAST(row_number() OVER (ORDER BY c DESC, ch) AS BIGINT) AS rank,
         CAST(sum(c) OVER (ORDER BY c DESC, ch) AS BIGINT) AS cum
  FROM cnt
)
SELECT ch, c, rank,
       CAST(floor(1000000.0 * cum / n) AS BIGINT) AS cum_ppm
FROM ranked CROSS JOIN tot
"""


@register("char_coverage", _CHAR_COVERAGE_ORACLE)
def q_char_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-coverage table for tokenizer alphabet selection
    (SentencePiece's ``character_coverage`` input): every character's
    corpus frequency, frequency rank, and cumulative coverage in ppm —
    the table that decides which codepoints get their own tokens and
    which fall back to bytes.

    Scale shape: the per-character explode aggregates map-side to
    alphabet size (dozens of rows here, ≤ a few thousand for any real
    corpus) before the single exchange; rank and cumulative sum then
    window over the alphabet-sized aggregate — the global sort touches
    the alphabet, never the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    # guard empty documents: Spark sequence(1, 0) DESCENDS ([1, 0]) where
    # DuckDB generate_series(1, 0) is empty — without the filter every
    # empty doc adds two spurious '' rows on the Spark side only
    ch = (
        docs.filter(F.length("text") >= 1)
        .select(F.explode(F.sequence(F.lit(1), F.length("text"))).alias("i"), "text")
        .select(F.expr("substr(text, i, 1)").alias("ch"))
    )
    # No persist: the groupBy is exchange-bounded, so runtime exchange
    # reuse shares the per-character explode across the total and the
    # ranked window (same mechanism as the four r12 reverts); the r12
    # fence measured a wash isolated and never paid in full-session runs.
    cnt = ch.groupBy("ch").agg(F.count("*").cast("long").alias("c"))
    tot = cnt.agg(F.sum("c").cast("long").alias("n"))
    w = Window.orderBy(F.col("c").desc(), "ch")
    ranked = cnt.select(
        "ch",
        "c",
        F.row_number().over(w).cast("long").alias("rank"),
        F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("cum"),
    )
    return ranked.crossJoin(F.broadcast(tot)).select(
        "ch",
        "c",
        "rank",
        F.floor(F.lit(1000000.0) * F.col("cum") / F.col("n"))
        .cast("long")
        .alias("cum_ppm"),
    )


def _gopher_oracle() -> str:
    from ..operators.text_analysis import GOPHER_STOPWORDS

    sw_terms = " + ".join(
        f"(length(p) - length(replace(p, ' {w} ', ''))) / {len(w) + 2}"
        for w in GOPHER_STOPWORDS
    )
    return f"""
    WITH padded AS (
      SELECT doc_id, text,
             ' ' || replace(text, ' ', '  ') || ' ' AS p
      FROM documents
    ), b AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             CAST(length(replace(text, ' ', '')) AS BIGINT) AS wchars,
             CAST(len(regexp_extract_all(text, '[^ ]*[a-zA-Z][^ ]*')) AS BIGINT)
               AS alpha_words,
             CAST({sw_terms} AS BIGINT) AS sw_occ,
             CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
               AS hash_cnt,
             CAST((length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT)
               AS ellipsis_cnt
      FROM padded
    )
    SELECT doc_id, n_words, wchars, alpha_words, sw_occ,
           n_words >= 50 AND n_words <= 100000 AS rule_word_count,
           wchars >= 3 * n_words AND wchars <= 10 * n_words
             AS rule_mean_word_length,
           5 * alpha_words >= 4 * n_words AS rule_alpha_words,
           sw_occ >= 2 AS rule_stopwords,
           10 * (hash_cnt + ellipsis_cnt) <= n_words AS rule_symbol_ratio,
           (n_words >= 50 AND n_words <= 100000
            AND wchars >= 3 * n_words AND wchars <= 10 * n_words
            AND 5 * alpha_words >= 4 * n_words
            AND sw_occ >= 2
            AND 10 * (hash_cnt + ellipsis_cnt) <= n_words) AS passes
    FROM b
    """


@register("gopher_quality_rules", _gopher_oracle())
def q_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The five Gopher document-quality rules (Rae et al. 2021,
    arXiv:2112.11446 §A1.1) per doc — word-count bounds, mean-word-length
    bounds, alpha-word fraction, required-stopword presence, symbol
    ratio — plus the conjunction verdict, all as exact int64 arithmetic
    (cross-multiplied rational thresholds; no float division), so the
    oracle pins every rule boolean bit-exactly.

    Scale shape: a single whole-stage-codegen projection over the scan —
    zero shuffles, zero exploded rows, zero higher-order lambdas (the
    stopword counter is replace-length differencing on a space-doubled
    copy; see ``operators/text_analysis.py:token_occurrences``). At
    100 TB this is a scan-bound map stage that composes into
    ``corpus_prep``-style one-pass curation for free.
    """
    from ..operators.text_analysis import gopher_rule_columns

    docs = load_table(spark, sf_dir, "documents")
    cols = gopher_rule_columns(F.col("text"))
    passes = (
        cols["rule_word_count"]
        & cols["rule_mean_word_length"]
        & cols["rule_alpha_words"]
        & cols["rule_stopwords"]
        & cols["rule_symbol_ratio"]
    )
    return docs.select(
        "doc_id", *[c.alias(n) for n, c in cols.items()], passes.alias("passes")
    )


_C4_LINE_ORACLE = """
WITH l AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM documents
), k AS (
  SELECT doc_id, line,
         CASE WHEN len(string_split(line, ' ')) >= 5
               AND (line LIKE '%.' OR line LIKE '%!' OR line LIKE '%?'
                    OR line LIKE '%"')
               AND line NOT LIKE '%{%'
               AND NOT contains(lower(line), 'lorem ipsum')
               AND NOT contains(lower(line), 'javascript')
          THEN 1 ELSE 0 END AS kept
  FROM l
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(kept) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN kept = 1 THEN length(line) ELSE 0 END) AS BIGINT)
         AS kept_chars
FROM k GROUP BY doc_id
"""


@register("c4_line_filters", _C4_LINE_ORACLE)
def q_c4_line_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level filtering (Raffel et al. 2020 §2.2): a line
    survives iff it has >= 5 words, ends in terminal punctuation, and
    contains no '{', 'lorem ipsum', or 'javascript' marker. Emits per-doc
    line counts and surviving-character mass — the shape a cleaning
    pipeline feeds to a rebuild step (``dup_span_removal`` is the
    sibling that actually reassembles text).

    Scale shape: posexplode lines → per-line booleans in codegen → one
    doc-keyed hash aggregate (map-side combined). Line work is linear in
    corpus chars; the only exchange carries (doc_id, 3 longs).
    """
    docs = load_table(spark, sf_dir, "documents")
    line = F.col("line")
    kept = (
        (F.size(F.split(line, " ", -1)) >= 5)
        & (
            line.endswith(".")
            | line.endswith("!")
            | line.endswith("?")
            | line.endswith('"')
        )
        & ~line.contains("{")
        & ~F.lower(line).contains("lorem ipsum")
        & ~F.lower(line).contains("javascript")
    )
    return (
        docs.select("doc_id", F.explode(F.split("text", "\n", -1)).alias("line"))
        .select("doc_id", kept.alias("kept"), F.length("line").alias("lc"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(F.col("kept").cast("long")).cast("long").alias("n_kept"),
            F.sum(F.when(F.col("kept"), F.col("lc")).otherwise(F.lit(0)))
            .cast("long")
            .alias("kept_chars"),
        )
    )


# --- tokenizer OOV rate against a corpus-fit vocabulary (round 6) -------------

_OOV_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents
),
t AS (SELECT doc_id, word FROM tok WHERE word != ''),
vocab AS (
  SELECT word FROM (
    SELECT word, count(*) AS n FROM t GROUP BY word
    ORDER BY n DESC, word LIMIT 50
  )
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       round(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS oov_rate
FROM t LEFT JOIN vocab v USING (word)
GROUP BY doc_id
"""


@register("oov_rate", _OOV_ORACLE)
def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fit signal: per-document out-of-vocabulary rate against
    the corpus's own top-50 word vocabulary (frequency desc, word asc —
    a deterministic cut). High-OOV documents are the ones a fixed
    tokenizer will shred into bytes: the standard pre-train diagnostic
    for whether a corpus slice matches the tokenizer's training
    distribution.

    Scale shape: vocabulary fitting is the two-phase heavy-hitters
    aggregate (`word_frequencies`); the 50-row vocab broadcasts into a
    LEFT join against the exploded token stream — token instances never
    shuffle on the word, only on doc_id for the final per-doc aggregate,
    and that aggregate partial-combines map-side. A real tokenizer swaps
    the vocab table for its merges file; the plumbing is identical."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.explode(ta.tokenize_ws(F.col("text"))).alias("word")
    ).where(F.col("word") != "")
    vocab = (
        t.groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(50)
        .select("word", F.lit(True).alias("in_vocab"))
    )
    oov = F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
    return (
        t.join(F.broadcast(vocab), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            oov.cast("long").alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.round(F.col("n_oov") / F.col("n_tokens"), 6).alias("oov_rate"),
        )
    )


# --- language-ID confusion matrix (round 6) -----------------------------------


def _lang_confusion_oracle() -> str:
    sw = _sw_sql()
    score = {
        lang: f"len(list_filter(string_split(text, ' '), w -> list_contains({arr}, w)))"
        for lang, arr in sw.items()
    }
    return f"""
    WITH pred AS (
      SELECT lang,
             CASE
               WHEN {score['en']} >= {score['es']} AND {score['en']} >= {score['de']}
                    AND {score['en']} >= {score['fr']} THEN 'en'
               WHEN {score['es']} >= {score['de']} AND {score['es']} >= {score['fr']} THEN 'es'
               WHEN {score['de']} >= {score['fr']} THEN 'de'
               ELSE 'fr'
             END AS lang_pred
      FROM documents
    )
    SELECT lang, lang_pred,
           CAST(count(*) AS BIGINT) AS n,
           round(count(*) / CAST(sum(count(*)) OVER (PARTITION BY lang)
                                 AS DOUBLE), 6) AS share
    FROM pred GROUP BY lang, lang_pred
    """


@register("lang_confusion", _lang_confusion_oracle())
def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID quality audit: confusion matrix of the generator's
    ground-truth ``lang`` column against the stopword-vote classifier
    (`lang_id`), with per-true-language share — the calibration readout
    that decides whether the cheap classifier is good enough to route
    documents or a model-based one is needed.

    Scale shape: the classifier is pure column expressions inside the
    scan stage (no UDF, machine-asserted by the lang_id plan test); the
    matrix aggregate shuffles |langs|² tiny rows; the share divides
    counts inside one window over the |matrix|-row result — nothing
    touches the token stream twice."""
    docs = load_table(spark, sf_dir, "documents")
    pred = docs.select(
        "lang", ta.lang_id(ta.tokenize_ws(F.col("text"))).alias("lang_pred")
    )
    n_lang = Window.partitionBy("lang")
    return (
        pred.groupBy("lang", "lang_pred")
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            "lang",
            "lang_pred",
            "n",
            F.round(
                F.col("n") / F.sum("n").over(n_lang).cast("double"), 6
            ).alias("share"),
        )
    )


# --- leakage-safe train/val/test split (round 7) ------------------------------

def _leakage_split_oracle() -> str:
    from .dedup_queries import JACCARD_CTES
    from .sketch_queries import _hll_mix_sql

    return f"""
    WITH RECURSIVE {JACCARD_CTES},
    edges AS (
      SELECT d1 AS a, d2 AS b FROM jp
      UNION
      SELECT d2 AS a, d1 AS b FROM jp
    ),
    nodes AS (SELECT DISTINCT a AS id FROM edges),
    reach AS (
      SELECT id, id AS r FROM nodes
      UNION
      SELECT e.a AS id, reach.r AS r FROM edges e JOIN reach ON reach.id = e.b
    ),
    cl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
    asg AS (
      SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id
    ),
    named AS (
      SELECT doc_id, cluster_id,
             CASE WHEN {_hll_mix_sql("cluster_id")} % 10 < 8 THEN 'train'
                  WHEN {_hll_mix_sql("cluster_id")} % 10 = 8 THEN 'val'
                  ELSE 'test' END AS fold,
             CASE WHEN {_hll_mix_sql("doc_id")} % 10 < 8 THEN 'train'
                  WHEN {_hll_mix_sql("doc_id")} % 10 = 8 THEN 'val'
                  ELSE 'test' END AS naive_fold
      FROM asg
    ),
    leak AS (
      SELECT
        CAST(COALESCE(sum(CASE WHEN a.naive_fold <> b.naive_fold
                               THEN 1 ELSE 0 END), 0) AS BIGINT)
          AS naive_leak_pairs,
        CAST(COALESCE(sum(CASE WHEN a.fold <> b.fold THEN 1 ELSE 0 END), 0)
          AS BIGINT) AS safe_leak_pairs
      FROM jp
      JOIN named a ON a.doc_id = jp.d1
      JOIN named b ON b.doc_id = jp.d2
    )
    SELECT named.fold, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT named.cluster_id) AS BIGINT) AS n_clusters,
           leak.naive_leak_pairs, leak.safe_leak_pairs
    FROM named, leak
    GROUP BY named.fold, leak.naive_leak_pairs, leak.safe_leak_pairs
    """


@register("leakage_safe_split", _leakage_split_oracle())
def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-aware train/val/test split — the ML-hygiene composition
    `crossval_split` is not: hashing DOCUMENT ids sends the two halves of
    a near-duplicate pair to different folds (train/test contamination,
    the classic eval inflation bug); hashing the CLUSTER id (connected
    component of the exact-Jaccard >= 0.6 pair graph; singletons are
    their own cluster) puts every member of a dup cluster in ONE fold, so
    cross-fold near-dup leakage is ZERO **by construction** — and this
    query PROVES it on the data: the output carries both
    `naive_leak_pairs` (near-dup pairs split across folds by the
    doc-hash policy — the damage the cluster policy prevents) and
    `safe_leak_pairs` (the same count under the shipped policy, pinned 0
    by the oracle's independent recursive-CTE transitive closure).

    Composition: MinHash-LSH pairs (`operators/dedup.py`) → alternating-
    star connected components (`operators/graph.py`) → the house
    fold-hash spelling shared with `crossval_split` — three certified
    kernels, one new invariant.

    Scale shape: cluster assignment is the dedup_clusters plan (banded
    candidates, log-round CC with per-round localCheckpoint); fold
    tagging is map-only; the audit join touches pair rows (output-sized),
    and fold stats are one partial-combined rollup."""
    from ..operators import dedup, graph
    from .sketch_queries import _hll_mix_col

    docs = load_table(spark, sf_dir, "documents")
    # persist: the full LSH pipeline feeds both the cluster build and
    # the leak audit — without this it runs twice (review fix)
    pairs = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.6, k=3
    ).persist()
    cl = graph.dedup_clusters(pairs).select("doc_id", "cluster_id")
    asg = (
        docs.select("doc_id")
        .join(cl, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias(
                "cluster_id"
            ),
        )
    )

    def fold_of(col):
        b = _hll_mix_col(col) % 10
        return (
            F.when(b < 8, "train").when(b == 8, "val").otherwise("test")
        )

    named = asg.select(
        "doc_id",
        "cluster_id",
        fold_of(F.col("cluster_id")).alias("fold"),
        fold_of(F.col("doc_id")).alias("naive_fold"),
    )
    a = named.select(
        F.col("doc_id").alias("d1"),
        F.col("fold").alias("f1"),
        F.col("naive_fold").alias("nf1"),
    )
    b = named.select(
        F.col("doc_id").alias("d2"),
        F.col("fold").alias("f2"),
        F.col("naive_fold").alias("nf2"),
    )
    leak = (
        pairs.join(a, "d1")
        .join(b, "d2")
        .agg(
            F.coalesce(
                F.sum((F.col("nf1") != F.col("nf2")).cast("long")), F.lit(0)
            )
            .cast("long")
            .alias("naive_leak_pairs"),
            F.coalesce(
                F.sum((F.col("f1") != F.col("f2")).cast("long")), F.lit(0)
            )
            .cast("long")
            .alias("safe_leak_pairs"),
        )
    )
    return (
        named.groupBy("fold")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("cluster_id").cast("long").alias("n_clusters"),
        )
        .crossJoin(F.broadcast(leak))
    )
