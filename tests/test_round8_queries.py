"""Semantic/property tests for the round-8 queries (the oracle hash gate
covers value parity; these pin the ALGORITHMIC claims)."""

from __future__ import annotations

import numpy as np
import pytest

from data_pipelines_worker_spark.queries import load_all

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry():
    return load_all()


def _synth_stream(text: str) -> np.ndarray:
    # the query's own synth — imported, not duplicated, so these unit
    # tests cannot drift from the stream shape the query produces
    # (ADVICE r8: the old local copy hardcoded gap=16)
    from data_pipelines_worker_spark.queries.media_queries import (
        _synth_samples,
    )

    return _synth_samples(text)


class TestAudioFingerprintUnit:
    def test_segments_are_nonempty_words(self):
        from data_pipelines_worker_spark.operators.audio_fingerprint import (
            fingerprint_segments,
        )

        fps = fingerprint_segments(_synth_stream("hello world  a tail"))
        # double space → empty word vanishes; 4 nonempty words = 4 segments
        assert len(fps) == 4
        assert [f.split(":")[0] for f in fps] == ["5", "5", "1", "4"]

    def test_shift_invariance(self):
        # THE constellation claim: the same word produces the same
        # fingerprint wherever it sits in the stream, because framing is
        # anchored at each segment's own onset — even when a preceding
        # edit moves it by a non-multiple of the frame size.
        from data_pipelines_worker_spark.operators.audio_fingerprint import (
            fingerprint_segments,
        )

        a = fingerprint_segments(_synth_stream("abc shared trailing words"))
        b = fingerprint_segments(_synth_stream("zzzzz shared trailing words"))
        assert a[1:] == b[1:]  # everything after the edited first word
        assert a[0] != b[0]

    def test_wht_codes_integer_exact(self):
        # one worked example, computed by hand from the closed form
        from data_pipelines_worker_spark.operators.audio_fingerprint import (
            fingerprint_segments,
        )

        (fp,) = fingerprint_segments(_synth_stream("a"))
        # 'a' = 97 → 97 % 96 = 1 → sample 512; coefs k=1..7 all 512 (>0)
        # → signbyte 127, peak = bin 1 → code 1*256 + 127 = 383
        assert fp == "1:383"

    def test_proportional_frames_share_codes(self):
        # loudness-invariance: structurally identical words at different
        # sample amplitudes give the SAME code (spectral shape, not level)
        from data_pipelines_worker_spark.operators.audio_fingerprint import (
            fingerprint_segments,
        )

        a = fingerprint_segments(_synth_stream("aa"))
        e = fingerprint_segments(_synth_stream("ee"))
        assert a == e


class TestAudioFingerprintDedup:
    def test_identical_audio_pairs_at_one(self, spark, registry):
        # edge rows 9011/9012 are byte-identical texts; 9010 is a
        # DIFFERENT text with the same audio fingerprint stream
        # ('aa bb cc dd' vs 'ee ff gg hh' — proportional frames).
        # All three must pair at J = 1.0 through the audio path.
        rows = [
            (9010, "aa bb cc dd"),
            (9011, "ee ff gg hh"),
            (9012, "ee ff gg hh"),
            (9013, "lonely single document here"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        import data_pipelines_worker_spark.queries.media_queries as MQ
        from unittest.mock import patch

        with patch.object(MQ, "load_table", lambda s, d, t: docs):
            got = {
                (r.d1, r.d2): r.jaccard
                for r in registry["audio_fingerprint_dedup"][0](
                    spark, SF
                ).collect()
            }
        assert got == {
            (9010, 9011): 1.0,
            (9010, 9012): 1.0,
            (9011, 9012): 1.0,
        }

    def test_planted_near_dup_threshold_boundary(self, spark, registry):
        # 8 distinct words → 6 landmark triples (triple i = words
        # i..i+2). Word j sits in triples [max(1, j-2), min(6, j)]:
        # - doc2 = doc1 with the LAST word edited → breaks triple 6 only
        #   → common 5, union 7, J = 5/7 ≈ 0.714 ≥ 0.6 → pair.
        # - doc3 = doc1 with word 4 edited → breaks triples 2,3,4
        #   → common 3, union 9, J = 1/3 < 0.6 → no pair (and vs doc2:
        #   common {1,5}, union 10, J = 0.2).
        # - doc4 = byte-identical copy of doc1 → J = 1.0 within-group,
        #   and inherits doc1's rep pair with doc2 via member expansion.
        base = "alpha beta gamma delta epsilon zeta eta theta"
        rows = [
            (1, base),
            (2, "alpha beta gamma delta epsilon zeta eta iota"),
            (3, "alpha beta gamma other epsilon zeta eta theta"),
            (4, base),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        import data_pipelines_worker_spark.queries.media_queries as MQ
        from unittest.mock import patch

        with patch.object(MQ, "load_table", lambda s, d, t: docs):
            got = {
                (r.d1, r.d2): r.jaccard
                for r in registry["audio_fingerprint_dedup"][0](
                    spark, SF
                ).collect()
            }
        assert got == {
            (1, 2): 0.714286,
            (2, 4): 0.714286,
            (1, 4): 1.0,
        }
