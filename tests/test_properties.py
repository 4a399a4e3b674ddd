"""Hypothesis property tests: merge invariants and naive==fast linking
equivalence on fuzzed inputs (SURVEY.md §5.2.2)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lmss_entity_extractor_ray.extraction.merge import merge_spans
from lmss_entity_extractor_ray.functions.embedding import embed_text

TYPES = ["NER_GAZ", "NER_CAP", "NOUN_PHRASE", "KEYWORD"]

WORDS = ["alpha", "beta", "the", "law", "court", "of", "x1", "securities"]


@st.composite
def candidate_spans(draw):
    text = " ".join(draw(st.lists(st.sampled_from(WORDS), min_size=0, max_size=25)))
    n = draw(st.integers(0, 12))
    spans = []
    for _ in range(n):
        if len(text) < 2:
            break
        start = draw(st.integers(0, len(text) - 1))
        end = draw(st.integers(start + 1, len(text)))
        spans.append((text[start:end], start, end, draw(st.sampled_from(TYPES))))
    return spans


class TestMergeProperties:
    @given(candidate_spans())
    @settings(max_examples=200, deadline=None)
    def test_invariants(self, spans):
        merged = merge_spans(spans)
        # 1. no accepted span strictly contained in an EARLIER-accepted span
        for i, cur in enumerate(merged):
            for prev in merged[:i]:
                assert not (prev[1] <= cur[1] and prev[2] >= cur[2]), (prev, cur)
        # 2. no case-insensitive duplicate texts
        texts = [s[0].lower() for s in merged]
        assert len(texts) == len(set(texts))
        # 3. deterministic (pure function)
        assert merge_spans(spans) == merged

    @given(candidate_spans())
    @settings(max_examples=100, deadline=None)
    def test_merge_subset_of_input_coverage(self, spans):
        # merged spans start/end within the input hull.  NOTE: start > end is
        # possible — a faithfully-ported reference quirk: NP-NP merge
        # concatenates the TEXTS of offset-overlapping spans
        # (app/entity_extraction.py:66-73), so the leading-stopword strip's
        # offset arithmetic (:92-94) can overshoot the span end.
        if not spans:
            assert merge_spans(spans) == []
            return
        lo = min(s[1] for s in spans)
        hi = max(s[2] for s in spans)
        for s in merge_spans(spans):
            assert lo <= s[1] and s[2] <= hi


class TestLinkingEquivalence:
    @given(tokens=st.lists(st.sampled_from(WORDS + ["contract", "dispute", "zzz"]), min_size=1, max_size=5))
    @settings(max_examples=100, deadline=None)
    def test_naive_equals_fast(self, artifacts_module, tokens):
        core = artifacts_module
        text = " ".join(tokens)
        vec = embed_text(text)
        assert core.match_naive(text, vec) == core._match_fast_uncached(text, vec)


import pytest  # noqa: E402


@pytest.fixture(scope="module")
def artifacts_module(artifacts):
    from lmss_entity_extractor_ray.config import LinkerConfig
    from lmss_entity_extractor_ray.linking.core import LinkerCore

    # loose threshold exercises both the fast path and the combined scan
    return LinkerCore(artifacts, LinkerConfig(similarity_threshold=0.3))


class TestBigOntologyEquivalence:
    """naive == fast on an LMSS-sized ontology (the pruned scan's bound
    arithmetic must hold when candidate sets are large)."""

    @pytest.fixture(scope="class")
    def big_core(self, tmp_path_factory):
        from lmss_entity_extractor_ray.config import LinkerConfig
        from lmss_entity_extractor_ray.linking.core import LinkerCore
        from lmss_entity_extractor_ray.ontology.artifacts import build_artifacts
        from lmss_entity_extractor_ray.ontology.fixture import write_fixture_owl

        owl = write_fixture_owl(
            str(tmp_path_factory.mktemp("big") / "big.owl"), n_classes=800
        )
        art = build_artifacts(owl)
        return art, LinkerCore(art, LinkerConfig(similarity_threshold=0.45))

    def test_naive_equals_fast_800_classes(self, big_core):
        import random

        from lmss_entity_extractor_ray.functions.embedding import embed_text
        from lmss_entity_extractor_ray.pipelines.corpus import make_phrase_bank

        art, core = big_core
        bank = make_phrase_bank(art)
        rng = random.Random(7)
        for i in range(30):
            t = (
                " ".join(rng.sample(bank, rng.randint(1, 3)))[:60]
                if rng.random() < 0.7
                else f"noise text {i}"
            )
            v = embed_text(t)
            assert core.match_naive(t, v) == core._match_fast_uncached(t, v), t
