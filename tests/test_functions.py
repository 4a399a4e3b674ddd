"""Unit tests for the deterministic scalar functions (SURVEY.md §2.8, §5.2.2)."""

import numpy as np
import pytest

from lmss_entity_extractor_ray.functions.automaton import AhoCorasick
from lmss_entity_extractor_ray.functions.embedding import cosine, embed_text, embed_texts
from lmss_entity_extractor_ray.functions.fuzzy import (
    partial_ratio,
    ratio,
    token_set_ratio,
    token_sort_ratio,
)
from lmss_entity_extractor_ray.functions.text import (
    html_to_text,
    remove_leading_stop_words,
    resolve_text,
    word_tokens,
)


class TestEmbedding:
    def test_deterministic(self):
        a = embed_text("Patent Litigation")
        b = embed_text("Patent Litigation")
        assert np.array_equal(a, b)

    def test_unit_norm(self):
        v = embed_text("intellectual property law")
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5

    def test_empty_is_zero(self):
        assert np.all(embed_text("") == 0)
        assert np.all(embed_text("   ") == 0)

    def test_case_insensitive(self):
        assert np.array_equal(embed_text("Tax Law"), embed_text("tax law"))

    def test_similar_texts_closer(self):
        a, b, c = (
            embed_text("patent litigation"),
            embed_text("patent litigation matter"),
            embed_text("quarterly weather report"),
        )
        assert cosine(a, b) > cosine(a, c)

    def test_batch_matches_single(self):
        texts = ["alpha", "beta gamma", ""]
        mat = embed_texts(texts)
        for i, t in enumerate(texts):
            assert np.array_equal(mat[i], embed_text(t))

    def test_cosine_empty_guard(self):
        # reference guard: app/lmss_search.py:106-110
        assert cosine(np.array([]), embed_text("x")) == 0.0
        assert cosine(embed_text(""), embed_text("x")) == 0.0


class TestFuzzy:
    # parity pins for the published fuzzywuzzy algorithms (FIXTURES.md §F4)
    def test_identical(self):
        assert ratio("abc", "abc") == 100
        assert token_set_ratio("Tax Law", "tax law") == 100
        assert partial_ratio("tax", "tax") == 100

    def test_token_set_classic(self):
        # the canonical token_set example: duplicated tokens collapse
        assert token_set_ratio("fuzzy was a bear", "fuzzy fuzzy was a bear") == 100

    def test_token_set_subset(self):
        # intersection vs superset always yields 100 for full containment
        assert token_set_ratio("patent law", "patent law practice") == 100

    def test_token_order_invariant(self):
        assert token_set_ratio("law patent", "patent law") == 100
        assert token_sort_ratio("law patent", "patent law") == 100

    def test_partial_substring(self):
        assert partial_ratio("law", "patent law practice") == 100

    def test_disjoint_low(self):
        assert token_set_ratio("zzz qqq", "patent law") < 40

    def test_range(self):
        for a, b in [("a", "b"), ("patent", "pattern"), ("", "x")]:
            assert 0 <= token_set_ratio(a, b) <= 100
            assert 0 <= partial_ratio(a, b) <= 100

    def test_empty_both(self):
        assert ratio("", "") == 100


class TestAutomaton:
    def test_basic_find(self):
        ac = AhoCorasick(["he", "she", "his", "hers"])
        hits = sorted(ac.find("ushers"))
        texts = sorted("ushers"[s:e] for s, e in hits)
        assert texts == ["he", "hers", "she"]

    def test_word_bounded(self):
        ac = AhoCorasick(["tax law"])
        assert list(ac.find_word_bounded("the tax law applies")) == [(4, 11)]
        # no hit inside a larger word
        assert list(ac.find_word_bounded("syntax lawyer")) == []

    def test_overlapping_patterns(self):
        ac = AhoCorasick(["patent", "patent law"])
        spans = set(ac.find_word_bounded("patent law"))
        assert (0, 6) in spans and (0, 10) in spans

    def test_empty_patterns(self):
        ac = AhoCorasick([])
        assert list(ac.find("anything")) == []


class TestText:
    def test_html_to_text(self):
        html = b"<html><head><title>T1</title></head><body><p>Hello <b>world</b></p></body></html>"
        assert html_to_text(html) == "T1 Hello world"

    def test_html_drops_script(self):
        html = b"<body><script>var x = 1;</script><p>keep me</p></body>"
        assert html_to_text(html) == "keep me"

    def test_resolve_text_authoritative(self):
        # text column verbatim, byte-identical — html ignored
        assert resolve_text("exact  bytes ", b"<p>other</p>") == "exact  bytes "
        assert resolve_text(None, b"<p>from html</p>") == "from html"

    def test_remove_leading_stop_words(self):
        # reference semantics: app/entity_extraction.py:28-35
        assert remove_leading_stop_words("the patent law") == ("patent law", 4)
        assert remove_leading_stop_words("patent law") == ("patent law", 0)
        # all-stopword spans return unchanged with offset 0
        assert remove_leading_stop_words("the of and") == ("the of and", 0)

    def test_word_tokens_offsets(self):
        toks = word_tokens("Tax Law, applied")
        assert toks == [("Tax", 0, 3), ("Law", 4, 7), ("applied", 9, 16)]


class TestPiiPresets:
    """The production redaction presets must be valid RE2 (Arrow kernels
    reject invalid patterns at call time) and hit the obvious cases."""

    def test_presets_fire(self):
        import pyarrow as pa
        import pyarrow.compute as pc

        from lmss_entity_extractor_ray.ops.text_ops import EMAIL_RE, IPV4_RE, PHONE_RE

        samples = pa.array(
            [
                "contact alice.smith+x@example.co.uk today",
                "call +1 (555) 123-4567 now",
                "server at 192.168.0.1 responded",
                "no pii here",
            ]
        )
        for pat, hits in ((EMAIL_RE, [1, 0, 0, 0]), (PHONE_RE, [0, 1, 0, 0]),
                          (IPV4_RE, [0, 0, 1, 0])):
            got = pc.count_substring_regex(samples, pat).to_pylist()
            assert got == hits, (pat, got)
