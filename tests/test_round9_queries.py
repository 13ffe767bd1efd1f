"""Semantic/property tests for the round-9 additions (the oracle hash
gate covers full-permutation parity; these pin the ALGORITHMIC claims
of the prefix-doubling construction)."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def _ranks(spark, pairs):
    from data_pipelines_worker_spark.operators.suffix_array import (
        suffix_ranks,
    )

    df = spark.createDataFrame(pairs, "doc_id long, text string")
    out = suffix_ranks(df).collect()
    by_doc: dict[int, dict[int, int]] = {}
    for r in out:
        by_doc.setdefault(r.doc, {})[r.pos] = r.rank
    return by_doc


class TestSuffixArrayUnit:
    def test_banana_worked_example(self, spark):
        # suffixes of 'banana' sorted: a, ana, anana, banana, na, nana
        # -> rank by position: 4 3 6 2 5 1
        got = _ranks(spark, [(1, "banana")])[1]
        assert [got[p] for p in range(6)] == [4, 3, 6, 2, 5, 1]

    def test_run_of_equal_chars_breaks_ties_by_length(self, spark):
        # 'aaaa': every suffix is a prefix of the longer ones — the
        # doubling's rank-0 missing-partner rule must sort shorter first
        got = _ranks(spark, [(1, "aaaa")])[1]
        assert [got[p] for p in range(4)] == [4, 3, 2, 1]

    def test_rank_is_a_permutation_and_matches_python_sort(self, spark):
        texts = [
            (1, "abab"),
            (2, "mississippi"),
            (3, "x"),
            (4, "the the the quick the"),
        ]
        got = _ranks(spark, texts)
        for doc_id, text in texts:
            n = len(text)
            ranks = [got[doc_id][p] for p in range(n)]
            assert sorted(ranks) == list(range(1, n + 1))
            # independent model: direct python sort of suffix strings
            order = sorted(range(n), key=lambda i: text[i:])
            expect = [0] * n
            for rank0, p in enumerate(order):
                expect[p] = rank0 + 1
            assert ranks == expect

    def test_empty_and_missing_docs_emit_no_rows(self, spark):
        got = _ranks(spark, [(1, ""), (2, "ab")])
        assert 1 not in got
        assert [got[2][p] for p in range(2)] == [1, 2]
