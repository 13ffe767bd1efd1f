"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference surface (BASELINE.json north star): language ID,
quality scoring, token counting, fingerprinting, normalization. All pure
column expressions — JVM-side, whole-stage codegen, zero shuffle — so at
100 TB these are embarrassingly-parallel map stages bounded by scan
throughput.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword-hit heuristic.
# Deliberately small + deterministic: the point is the *operator shape*
# (vocab-hit scoring scales to real lexicons broadcast to executors).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "y", "que", "en", "los"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit"),
    "fr": ("le", "la", "de", "et", "les", "des", "en"),
}

#: priority order for deterministic argmax tie-breaking
LANG_PRIORITY = ("en", "es", "de", "fr")

MOD = 2147483647  # 2^31 - 1, fits bigint through h*31+x


def tokenize_ws(text: Column) -> Column:
    """Whitespace tokenization (split on single spaces, the synthetic-corpus
    convention; real corpora would split on ``\\s+``)."""
    return F.split(text, " ", -1)


def token_count_regex(text: Column, pattern: str = "[a-z]+|[0-9]+") -> Column:
    """BPE-ish token count: number of maximal alpha/digit runs."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0)).cast("long")


def stopword_hits(words: Column, stopwords: tuple[str, ...]) -> Column:
    """Occurrences (with multiplicity — not array_intersect, which dedups)
    of any stopword in the token array.

    Measured dead end (kept so it isn't retried): replacing the lambda
    with ``size − size(array_remove)`` differencing — the rewrite that
    won 3× in quality_logit_filter — is 2.6× SLOWER here (lang_id 0.68 →
    1.75 s at sf0.1): lang_id calls this 4×, so differencing costs 28
    array_remove allocations per row, while the interpreted lambda does
    4 passes with a 7-element contains. The HOF-vs-collection choice is
    per-shape, not a universal rule; this one stays a lambda."""
    vocab = F.array(*[F.lit(w) for w in stopwords])
    return F.size(F.filter(words, lambda w: F.array_contains(vocab, w))).cast("long")


def lang_id(words: Column) -> Column:
    """Deterministic stopword-vote language ID.

    Argmax over per-language hit counts with fixed priority tie-breaking
    (en > es > de > fr) — expressed as a CASE chain so the DuckDB oracle is
    the literally-identical expression.
    """
    scores = {lang: stopword_hits(words, sw) for lang, sw in LANG_STOPWORDS.items()}
    expr = F.lit(LANG_PRIORITY[-1])
    # Build the CASE chain back-to-front over the priority order.
    for i in range(len(LANG_PRIORITY) - 2, -1, -1):
        lang = LANG_PRIORITY[i]
        cond = None
        for other in LANG_PRIORITY[i + 1 :]:
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0,1]: word-length sanity + stopword
    density + alpha ratio. Mirrors the usual Gopher/C4-style length &
    symbol-ratio rules in spirit; weights are fixed and documented so the
    oracle can replicate them exactly."""
    words = tokenize_ws(text)
    n_chars = F.length(text).cast("double")
    n_words = F.size(words).cast("double")
    avg_wlen = (n_chars - (n_words - 1)) / n_words
    sw = F.array(*[F.lit(w) for ws in LANG_STOPWORDS.values() for w in ws])
    sw_ratio = F.size(F.filter(words, lambda w: F.array_contains(sw, w))).cast("double") / n_words
    alpha_ratio = (
        F.length(F.regexp_replace(text, "[^a-zA-Z]", "")).cast("double") / n_chars
    )
    wlen_term = 1.0 - F.least(F.abs(avg_wlen - F.lit(5.0)) / 5.0, F.lit(1.0))
    score = (
        0.4 * wlen_term + 0.3 * F.least(sw_ratio * 4.0, F.lit(1.0)) + 0.3 * alpha_ratio
    )
    # empty text scores 0.0 outright: the alpha term would divide by
    # n_chars = 0 (ANSI error on Spark, inf on DuckDB) — the CASE guards
    # the division per-row on both engines
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(score)


def all_stopwords_sql() -> str:
    """DuckDB array literal of every language's stopwords — the SQL twin
    of the ``sw`` array inside :func:`quality_score`."""
    return (
        "["
        + ", ".join(f"'{w}'" for ws in LANG_STOPWORDS.values() for w in ws)
        + "]"
    )


def quality_score_sql(text: str = "text") -> str:
    """DuckDB twin of :func:`quality_score`, character-identical at every
    call site (the expression is bit-exactness-critical: oracle gates
    compare raw comparisons like ``quality >= 0.62`` where any
    re-association flips labels). Keep THIS the only SQL spelling —
    older oracles (text_queries corpus_prep/quality, curation ppl
    bucketing) predate the helper and carry equivalent inline copies."""
    sw = all_stopwords_sql()
    return f"""CASE WHEN length({text}) = 0 THEN 0.0 ELSE
      0.4 * (1.0 - least(abs((length({text}) - (len(string_split({text}, ' ')) - 1))
                             / CAST(len(string_split({text}, ' ')) AS DOUBLE) - 5.0) / 5.0, 1.0))
    + 0.3 * least(len(list_filter(string_split({text}, ' '),
                                  w -> list_contains({sw}, w)))
                  / CAST(len(string_split({text}, ' ')) AS DOUBLE) * 4.0, 1.0)
    + 0.3 * (length(regexp_replace({text}, '[^a-zA-Z]', '', 'g'))
             / CAST(length({text}) AS DOUBLE)) END"""


def fingerprint_md5(text: Column) -> Column:
    """Content fingerprint: md5 of the lowercased document."""
    return F.md5(F.lower(text))


def word_codes(words: Column) -> Column:
    """Per-word integer code ascii(first char) + len — the rolling-hash
    alphabet (kept trivially SQL-replicable)."""
    return F.transform(words, lambda w: (F.ascii(F.substring(w, 1, 1)) + F.length(w)).cast("long"))


def fingerprint_rolling(words: Column) -> Column:
    """Polynomial rolling hash over word codes, mod 2^31-1:
    ``h := (h*31 + code) % MOD`` — a distributed-friendly document
    fingerprint (order-sensitive, unlike md5-of-sorted-tokens).

    Readable reference form only: array higher-order-function lambdas are
    evaluated interpreted (never enter codegen, ~µs/word). Table-scale
    paths use :func:`fingerprint_rolling_udf` — same integer sequence,
    Arrow-batched (VERDICT r3 #3)."""
    return F.aggregate(
        word_codes(words),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % MOD,
    )


def fingerprint_rolling_udf():
    """Arrow-batched polynomial rolling hash, value-identical to
    :func:`fingerprint_rolling` (and to the DuckDB ``list_reduce`` oracle).

    Horner's rule ``h := (h*31 + code) % MOD`` equals
    ``Σ code_i · 31^(n-1-i)  (mod MOD)`` exactly — modular arithmetic is
    associativity-free, unlike the float folds that forced strict-left
    ``np.cumsum`` in :func:`..similarity.dot_strict_udf`. So the per-word
    work vectorizes: one int64 multiply + mod per word
    (``(codes · pows) mod MOD`` then a sum), with no interpreted
    per-element lambda. Overflow-safe in int64: codes < 2^21 (codepoint +
    length), pows < 2^31, so each product < 2^52 and the post-mod sum
    stays < n·2^31.

    The per-word code is ``codepoint(first char) + len`` — Python ``ord``/
    ``len`` match Spark ``ascii``/``length`` and DuckDB ``ascii``/
    ``length`` on codepoint semantics (the synthetic corpus is ASCII;
    non-BMP text would need a UTF-16 caveat for Spark only).
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    pow31 = [1]  # grows to the longest document seen in any batch

    @pandas_udf(LongType())
    def fp_rolling(words: pd.Series) -> pd.Series:
        out = np.empty(len(words), dtype=object)
        for i, ws in enumerate(words):
            if ws is None:
                # NULL text -> NULL fingerprint, matching the codegen
                # F.aggregate form this UDF replaced (split(NULL) is NULL)
                out[i] = None
                continue
            n = len(ws)
            while len(pow31) < n:
                pow31.append(pow31[-1] * 31 % MOD)
            if n == 0:
                out[i] = 0
                continue
            codes = np.fromiter(
                ((ord(w[0]) if w else 0) + len(w) for w in ws),
                dtype=np.int64,
                count=n,
            )
            pows = np.array(pow31[n - 1 :: -1], dtype=np.int64)
            out[i] = int(np.mod(codes * pows, MOD).sum() % MOD)
        return pd.Series(out)

    return fp_rolling


def normalize_text(text: Column) -> Column:
    """C4-style normalization: lowercase, strip non-alphanumerics to space,
    collapse runs of spaces, trim."""
    t = F.lower(text)
    t = F.regexp_replace(t, "[^a-z0-9]+", " ")
    return F.trim(t)


# --- Gopher-style document filter rules ------------------------------------

#: the Gopher repetition/quality paper's required-stopword list (Rae et
#: al. 2021 §A1.1: a doc must contain >= 2 of these to pass)
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def token_occurrences(text: Column, token: str) -> Column:
    """Exact whitespace-token occurrence count as pure string arithmetic
    (no explode, no higher-order lambda — stays in whole-stage codegen).

    Doubling every delimiter space first gives each token its OWN
    flanking spaces, so counting non-overlapping ``' tok '`` matches via
    the replace-length difference is exact even for adjacent repeats
    ("the the the" counts 3, where single-space padding would count 2:
    leftmost non-overlapping matches consume the shared delimiter)."""
    padded = F.concat(F.lit(" "), F.replace(text, F.lit(" "), F.lit("  ")), F.lit(" "))
    needle = f" {token} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def gopher_rule_columns(text: Column) -> dict[str, Column]:
    """The five Gopher (Rae et al. 2021, arXiv:2112.11446 §A1.1) document
    quality rules as integer-pure column expressions — every comparison is
    on exact int64 arithmetic (counts cross-multiplied against rational
    thresholds), so both engines evaluate bit-identical booleans with no
    float division anywhere.

    Scale shape: one codegen projection, zero shuffles, zero higher-order
    lambdas — at 100 TB this is a scan-bound map stage. Word counts come
    from ``size(split)``; alpha-word and symbol counts from JVM regex /
    replace-length differences; stopword occurrences from
    :func:`token_occurrences`.
    """
    n_words = F.size(F.split(text, " ", -1)).cast("long")
    # total word chars: delimiters removed (exact under repeated spaces,
    # unlike the length-minus-(n_words-1) shortcut)
    wchars = F.length(F.replace(text, F.lit(" "), F.lit(""))).cast("long")
    # words containing >= 1 alphabetic char: greedy [^ ]* absorbs the
    # whole token, so each qualifying token matches exactly once
    alpha_words = F.size(
        F.regexp_extract_all(text, F.lit("[^ ]*[a-zA-Z][^ ]*"), F.lit(0))
    ).cast("long")
    sw_occ = sum(
        (token_occurrences(text, w) for w in GOPHER_STOPWORDS), F.lit(0).cast("long")
    ).cast("long")
    hash_cnt = (F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))).cast(
        "long"
    )
    ellipsis_cnt = (
        (F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))) / F.lit(3)
    ).cast("long")
    return {
        "n_words": n_words,
        "wchars": wchars,
        "alpha_words": alpha_words,
        "sw_occ": sw_occ,
        # 50 <= words <= 100k
        "rule_word_count": (n_words >= 50) & (n_words <= 100_000),
        # 3 <= mean word length <= 10, as cross-multiplied integers
        "rule_mean_word_length": (wchars >= 3 * n_words) & (wchars <= 10 * n_words),
        # > 80% of words contain an alphabetic character
        "rule_alpha_words": 5 * alpha_words >= 4 * n_words,
        # >= 2 of the 8 required stopwords (with multiplicity)
        "rule_stopwords": sw_occ >= 2,
        # '#' + '...' symbols per word <= 0.1
        "rule_symbol_ratio": 10 * (hash_cnt + ellipsis_cnt) <= n_words,
    }


# --- BPE-style subword tokenization ----------------------------------------

#: Greedy longest-match subword vocabulary (BPE-style merges over common
#: English digraphs/trigraphs/affixes). Deliberately fixed and literal: the
#: operator shape — broadcast vocab, longest-match per pre-split word —
#: is exactly a production BPE tokenizer's; swapping in a real merges.txt
#: only changes this table. Single characters are the implicit fallback
#: (every string tokenizes; no <unk>).
BPE_VOCAB: tuple[str, ...] = (
    "the", "and", "ing", "ion", "tion", "ent", "ati", "for", "her", "ter",
    "hat", "tha", "ere", "ate", "his", "con", "res", "ver", "all", "ons",
    "nce", "men", "ith", "ted", "ers", "pro", "thi", "wit", "are", "ess",
    "not", "ive", "was", "ect", "rea", "com", "eve", "per", "int", "est",
    "sta", "cti", "ica", "ist", "ear", "ain", "one", "our", "iti", "rat",
    "ell", "ant", "str", "tio", "able", "ment", "ught", "ness", "ship",
    "ous", "ity", "ed", "er", "in", "on", "at", "en", "an", "re", "es",
    "or", "te", "of", "ti", "to", "it", "is", "al", "ar", "st", "nt",
)

#: word pre-split pattern (GPT-2-style pre-tokenization, simplified to
#: lowercase alnum runs so the oracle regex is engine-portable)
BPE_PRESPLIT = "[a-z0-9]+"


def bpe_tokenize_count(word: str, vocab: frozenset = frozenset(BPE_VOCAB)) -> int:
    """Greedy longest-match token count for one pre-split word.

    At each position take the longest vocab entry that prefixes the
    remainder, else consume one character; deterministic (only one string
    of a given length can match). Mirrored 1:1 by the DuckDB recursive-CTE
    oracle in ``text_queries.q_token_count_bpe``.
    """
    lens = sorted({len(t) for t in vocab}, reverse=True)
    i, n, L = 0, 0, len(word)
    while i < L:
        step = 1
        for tl in lens:
            if tl <= L - i and word[i : i + tl] in vocab:
                step = tl
                break
        i += step
        n += 1
    return n


def bpe_count_udf():
    """Arrow-batched pandas UDF: word → greedy token count.

    Applied to *distinct* words only (the caller dedups first), the same
    per-word memoization a production BPE tokenizer uses (GPT-2's
    lru_cache) — at 100 TB the UDF touches the language's vocabulary
    (~1e7 rows), not the corpus (~1e11 words), and the counts join back
    on an 8-byte-hashable short key.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    vocab = frozenset(BPE_VOCAB)
    lens = tuple(sorted({len(t) for t in vocab}, reverse=True))

    # no type hints: postponed annotations ('pd.Series' strings) don't
    # resolve against the function-local pandas import
    @pandas_udf("long")
    def _count(words):
        out = []
        for w in words:
            i, n, L = 0, 0, len(w)
            while i < L:
                step = 1
                for tl in lens:
                    if tl <= L - i and w[i : i + tl] in vocab:
                        step = tl
                        break
                i += step
                n += 1
            out.append(n)
        return pd.Series(out, dtype="int64")

    return _count


def bpe_train_merges(docs, n_merges: int = 3, id_col: str = "doc_id", text_col: str = "text"):
    """BPE merge-rule *training* (Sennrich et al. 2016), the iterative
    counterpart of :func:`bpe_tokenize_count`'s vocabulary application:
    count adjacent symbol pairs over the frequency-weighted word vocabulary,
    merge the most frequent pair (ties → lexicographically first), re-segment,
    repeat. Returns one row per learned rule: (rank, pair, cnt).

    Determinism contract (the kmeans pattern): pair counts are exact
    integer sums; the argmax orders by (count desc, pair asc); merge
    application is SQL ``replace`` on the space-delimited segmentation —
    left-to-right non-overlapping, identical in the JVM and DuckDB, and
    the boundary-space trick (`' '||seg||' '`) pins whole-symbol matches.
    ``replace`` is applied twice per rule: a match consumes its trailing
    delimiter space, so a run "a b a b" merges only alternate occurrences
    in one pass; skipped occurrences are never adjacent to each other
    (each sits right after a match), so the second identical pass merges
    exactly the leftovers — equal to BPE's greedy left-to-right
    application, engine-for-engine.

    Scale shape: everything after the first aggregation is
    vocabulary-bounded, not corpus-bounded — word counts partial-combine
    map-side, segmentation updates are map stages over the vocab table,
    and each iteration ships exactly one (pair, count) row to the control
    plane. n_merges is a constant (real trainings run the same loop 30k
    times on the same vocab-sized table)."""
    from pyspark.sql import functions as F  # noqa: F811

    from ..session import local_df

    words = docs.select(
        F.explode(F.split(F.col(text_col), " ", -1)).alias("word")
    )
    vocab = words.groupBy("word").agg(F.count("*").alias("n"))
    seg = F.rtrim(F.regexp_replace(F.col("word"), "(.)", "$1 "))
    cur = vocab.select("word", "n", seg.alias("seg")).persist()

    rules = []
    for _ in range(n_merges):
        sym = F.split(F.col("seg"), " ", -1)
        m = F.greatest(F.size(sym) - 1, F.lit(0))
        a = F.slice(sym, 1, m)
        b = F.slice(sym, 2, m)
        ex = cur.select("n", F.explode(F.arrays_zip(a.alias("a"), b.alias("b"))).alias("p"))
        pair = F.concat_ws(" ", F.col("p.a"), F.col("p.b"))
        top = (
            ex.groupBy(pair.alias("pair"))
            .agg(F.sum("n").alias("c"))
            .orderBy(F.desc("c"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            # no adjacent pairs left (empty corpus, or every word already
            # merged to a single symbol): stop early with fewer rules
            break
        best = top[0]
        rules.append((len(rules) + 1, best["pair"], int(best["c"])))
        merged = best["pair"].replace(" ", "")
        pat, rep = F.lit(f" {best['pair']} "), F.lit(f" {merged} ")
        once = F.replace(F.concat(F.lit(" "), F.col("seg"), F.lit(" ")), pat, rep)
        nxt = cur.select(
            "word",
            "n",
            F.trim(F.replace(once, pat, rep)).alias("seg"),
        ).persist()
        cur.unpersist()
        cur = nxt
    cur.unpersist()
    return local_df(
        docs.sparkSession,
        rules,
        "rank long, pair string, cnt long",
    )
