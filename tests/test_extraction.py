"""Candidate generation + merge semantics tests (SURVEY.md §2.2 M4-M9,
§5.2.2 golden cases, FIXTURES.md §F3)."""

import numpy as np

from lmss_entity_extractor_ray.extraction.candidates import (
    all_candidates,
    capitalized_spans,
    gazetteer_spans,
    keyword_spans,
    noun_phrase_spans,
)
from lmss_entity_extractor_ray.extraction.extractor import DocumentExtractor
from lmss_entity_extractor_ray.extraction.merge import merge_spans
from lmss_entity_extractor_ray.functions.automaton import AhoCorasick


class TestCandidates:
    def test_gazetteer_case_insensitive(self):
        ac = AhoCorasick(["tax law"])
        spans = gazetteer_spans("He practices TAX LAW daily.", ac)
        assert spans == [("TAX LAW", 13, 20, "NER_GAZ")]

    def test_gazetteer_longest_at_start(self):
        ac = AhoCorasick(["patent", "patent law"])
        spans = gazetteer_spans("patent law reform", ac)
        assert spans == [("patent law", 0, 10, "NER_GAZ")]

    def test_capitalized_runs(self):
        spans = capitalized_spans("He met Jane Smith at IBM yesterday.")
        texts = [s[0] for s in spans]
        assert "Jane Smith" in texts
        assert "IBM" in texts
        assert "He" not in texts  # single non-allcaps capitalized word

    def test_noun_phrase_stopword_delimited(self):
        spans = noun_phrase_spans("the quick brown fox and the lazy dog")
        assert [s[0] for s in spans] == ["quick brown fox", "lazy dog"]

    def test_noun_phrase_punctuation_breaks(self):
        spans = noun_phrase_spans("patent law, copyright law")
        assert [s[0] for s in spans] == ["patent law", "copyright law"]

    def test_keywords_top_k_and_occurrences(self):
        text = "widget widget widget gadget gadget gizmo"
        spans = keyword_spans(text, top_k=2)
        kws = {s[0] for s in spans}
        assert kws == {"widget", "gadget"}
        assert sum(1 for s in spans if s[0] == "widget") == 3

    def test_keywords_ignore_stopwords(self):
        spans = keyword_spans("the the the variance", top_k=5)
        assert {s[0] for s in spans} == {"variance"}

    def test_keyword_ties_alphabetical(self):
        spans = keyword_spans("zebra apple", top_k=1)
        assert {s[0] for s in spans} == {"apple"}

    def test_empty_text(self):
        assert all_candidates("", None) == []
        assert keyword_spans("   ") == []


class TestMergeSemantics:
    """Golden cases for the reference's merge loop
    (app/entity_extraction.py:38-109; SURVEY.md §2.10 notes)."""

    def test_ner_survives_and_does_not_consume(self):
        # NER current breaks WITHOUT consuming the overlapping span, which
        # then seeds its own chain but is dropped as a subset of the NER span
        spans = [
            ("Jane Smith", 0, 10, "NER_CAP"),
            ("Smith", 5, 10, "NOUN_PHRASE"),
        ]
        assert merge_spans(spans) == [("Jane Smith", 0, 10, "NER_CAP")]

    def test_ner_next_replaces_current(self):
        spans = [
            ("the patent", 0, 10, "NOUN_PHRASE"),
            ("patent law", 4, 14, "NER_GAZ"),
        ]
        assert merge_spans(spans) == [("patent law", 4, 14, "NER_GAZ")]

    def test_adjacent_noun_phrases_merge(self):
        # gap of exactly 1 between NPs merges (app/entity_extraction.py:56-58)
        spans = [
            ("quick fox", 0, 9, "NOUN_PHRASE"),
            ("lazy dog", 10, 18, "NOUN_PHRASE"),
        ]
        assert merge_spans(spans) == [("quick fox lazy dog", 0, 18, "NOUN_PHRASE")]

    def test_nonadjacent_noun_phrases_kept(self):
        spans = [
            ("quick fox", 0, 9, "NOUN_PHRASE"),
            ("lazy dog", 12, 20, "NOUN_PHRASE"),
        ]
        assert merge_spans(spans) == spans

    def test_keyword_prefers_noun_phrase(self):
        spans = [
            ("patent", 0, 6, "KEYWORD"),
            ("patent law", 0, 10, "NOUN_PHRASE"),
        ]
        # sorted by (start,-end): NP first, keyword second; NP current, KW next
        # → falls to else-break; KW then dropped as subset of accepted NP
        assert merge_spans(spans) == [("patent law", 0, 10, "NOUN_PHRASE")]

    def test_longer_keyword_wins(self):
        spans = [
            ("pat", 0, 3, "KEYWORD"),
            ("patent", 0, 6, "KEYWORD"),
        ]
        # sorted: ("patent",0,6) first (longer end), ("pat",0,3) second;
        # current KEYWORD vs next KEYWORD with shorter text → current kept
        assert merge_spans(spans) == [("patent", 0, 6, "KEYWORD")]

    def test_leading_stopwords_stripped(self):
        spans = [("the patent law", 0, 14, "NOUN_PHRASE")]
        assert merge_spans(spans) == [("patent law", 4, 14, "NOUN_PHRASE")]

    def test_subset_of_accepted_dropped(self):
        spans = [
            ("patent law practice", 0, 19, "NER_GAZ"),
            ("law practice", 7, 19, "NOUN_PHRASE"),
        ]
        assert merge_spans(spans) == [("patent law practice", 0, 19, "NER_GAZ")]

    def test_case_insensitive_dedup_first_wins(self):
        spans = [
            ("Patent Law", 0, 10, "NER_GAZ"),
            ("patent law", 20, 30, "NER_GAZ"),
        ]
        assert merge_spans(spans) == [("Patent Law", 0, 10, "NER_GAZ")]

    def test_empty(self):
        assert merge_spans([]) == []


class TestDocumentExtractor:
    def test_empty_input_guard(self):
        ex = DocumentExtractor(["tax law"])
        assert ex.extract("") == []
        assert ex.extract("   \n  ") == []

    def test_mention_fields(self):
        ex = DocumentExtractor(["tax law"])
        # stopword-only filler so no noun-phrase run swallows the gazetteer span
        text = ("of the to and " * 20) + "tax law" + (" and the of to" * 20)
        mentions = ex.extract(text)
        m = next(m for m in mentions if m["text"] == "tax law")
        assert m["type"] == "NER_GAZ"
        assert m["source"] == "NER"
        assert m["confidence"] == 1.0
        assert text[m["start"] : m["end"]] == "tax law"
        # ±100-char context window (app/entity_extraction.py:181-188)
        assert m["context"] == text[m["start"] - 100 : m["end"] + 100]
        assert m["vector"].shape == (256,)
        assert abs(np.linalg.norm(m["vector"]) - 1.0) < 1e-5

    def test_embed_cache_consistency(self):
        ex = DocumentExtractor(["tax law"])
        m1 = ex.extract("tax law first")
        m2 = ex.extract("tax law again")
        v1 = next(m["vector"] for m in m1 if m["text"] == "tax law")
        v2 = next(m["vector"] for m in m2 if m["text"] == "tax law")
        assert np.array_equal(v1, v2)
