"""Corpus-curation operators for large-scale training-data pipelines:
PII redaction, repetition profiling (Gopher-style), benchmark
decontamination, sequence packing, and context-window chunking.

All hot-path logic is pure column expressions (JVM-side, whole-stage
codegen) — at 100 TB these are map stages bounded by scan throughput,
except decontamination (one broadcast-shaped join against the benchmark
n-gram set) and packing (one window over (source, doc order)).

Every helper here is mirrored 1:1 by the DuckDB oracle SQL in
``queries/curation_queries.py`` — predicates and arithmetic are kept
engine-portable (integer counts, single IEEE divisions, RE2-compatible
regexes shared verbatim by Java's and DuckDB's regex engines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- PII redaction ----------------------------------------------------------

#: RE2- and java.util.regex-compatible detectors (no lookaround, no \d
#: shorthand, no inline flags) so Spark and DuckDB match the same spans.
PII_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
PII_PHONE = "[0-9]{3}-[0-9]{4}-[0-9]{4}"
PII_IPV4 = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

#: redaction order matters: emails first (their domains would otherwise be
#: clipped by the IP pattern), phones before IPs (disjoint alphabets, but
#: fixed order keeps the operator deterministic by construction).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", PII_EMAIL, "<EMAIL>"),
    ("phone", PII_PHONE, "<PHONE>"),
    ("ip", PII_IPV4, "<IP>"),
)


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind match counts (``n_email``/``n_phone``/``n_ip``)."""
    return {
        f"n_{kind}": F.size(F.regexp_extract_all(text, F.lit(pat), 0)).cast("long")
        for kind, pat, _ in PII_PATTERNS
    }


def pii_redact(text: Column) -> Column:
    """Replace every PII span with its typed placeholder, in fixed order."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


# --- repetition / diversity profiling (Gopher-style signals) ---------------


def ngrams(words: Column, n: int) -> Column:
    """Space-joined n-grams of a token array (empty when fewer than n
    tokens — guarded explicitly because Spark's ``sequence`` would count
    *down* for start > stop)."""
    idx = F.sequence(F.lit(1), F.size(words) - (n - 1))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(words, i + j) for j in range(n)]
    )
    return F.when(F.size(words) >= n, F.transform(idx, gram)).otherwise(
        F.array().cast("array<string>")
    )


def top_count(items: Column) -> Column:
    """Occurrences of the most frequent element (candidate loop over the
    distinct elements — quadratic in *distinct* items per row, which for
    natural-language documents is bounded by vocabulary, not length)."""
    per = F.transform(
        F.array_distinct(items),
        lambda w: F.size(F.filter(items, lambda x: x == w)),
    )
    return F.when(F.size(items) > 0, F.array_max(per)).otherwise(F.lit(0)).cast("long")


def repetition_profile(words: Column) -> dict[str, Column]:
    """Integer repetition/diversity signals per document: token counts,
    distinct-token counts, and the top-element multiplicity at the word and
    2-gram level. Downstream filters derive the Gopher-style ratios
    (type-token ratio, top-2-gram fraction) from these exact integers."""
    grams2 = ngrams(words, 2)
    return {
        "n_words": F.size(words).cast("long"),
        "n_distinct_words": F.size(F.array_distinct(words)).cast("long"),
        "top_word_n": top_count(words),
        "n_2grams": F.size(grams2).cast("long"),
        "n_distinct_2grams": F.size(F.array_distinct(grams2)).cast("long"),
        "top_2gram_n": top_count(grams2),
    }


# --- benchmark decontamination ---------------------------------------------


def doc_ngram_set(text: Column, n: int = 5) -> Column:
    """Distinct word n-grams of a document (the unit of contamination
    evidence: one shared n-gram = one hit)."""
    return F.array_distinct(ngrams(F.split(text, " ", -1), n))


# --- sequence packing -------------------------------------------------------

#: token budget per packed training sequence
PACK_BUDGET = 512


def pack_id(cum_tokens_before: Column, budget: int = PACK_BUDGET) -> Column:
    """Contiguous-stream packing: documents are concatenated in a fixed
    order per stream and the stream is split every ``budget`` tokens; a
    document belongs to the pack its first token lands in. Exact integer
    division — no greedy reset state, so it is a pure window expression
    that scales to any stream length."""
    return F.floor(cum_tokens_before / budget).cast("long")


# --- context-window chunking ------------------------------------------------

CHUNK_SIZE = 200
CHUNK_STRIDE = 150


def chunk_starts(text: Column, stride: int = CHUNK_STRIDE) -> Column:
    """0-based chunk start offsets covering the document with the given
    stride (last chunk may be short; every char is covered since
    stride < size)."""
    return F.sequence(F.lit(0), F.length(text) - 1, F.lit(stride))


def chunk_at(text: Column, start: Column, size: int = CHUNK_SIZE) -> Column:
    """The chunk starting at 0-based ``start`` (SQL substring is 1-based)."""
    return F.substring(text, start + 1, size)
