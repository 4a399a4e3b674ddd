"""Two-sided extraction verification: the engine's extraction package vs the
from-scratch re-derivation in oracle/independent.py.  Either side drifting
from the reference spec (app/entity_extraction.py:38-147) breaks these."""

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


class TestMergeParity:
    CASES = [
        # NER survives and does NOT consume the overlapping next span
        [("Alpha Beta", 0, 10, "NER_GAZ"), ("Beta Gamma", 6, 16, "NOUN_PHRASE")],
        # NER next replaces a NOUN_PHRASE current
        [("alpha beta", 0, 10, "NOUN_PHRASE"), ("Beta", 6, 10, "NER_CAP")],
        # NP+NP adjacency (gap == 1) merges
        [("alpha", 0, 5, "NOUN_PHRASE"), ("beta", 6, 10, "NOUN_PHRASE")],
        # KEYWORD replaced by overlapping NP; by strictly longer KEYWORD only
        [("law", 0, 3, "KEYWORD"), ("law firm", 0, 8, "NOUN_PHRASE")],
        [("law", 0, 3, "KEYWORD"), ("laws", 2, 6, "KEYWORD")],
        [("laws", 0, 4, "KEYWORD"), ("law", 2, 5, "KEYWORD")],
        # leading stopword strip shifts start; containment drop after strip
        [("the court", 0, 9, "NOUN_PHRASE"), ("court order", 4, 15, "KEYWORD")],
        # case-insensitive text dedup keeps first
        [("Court", 0, 5, "NER_CAP"), ("court", 10, 15, "KEYWORD")],
        [],
    ]

    @pytest.mark.parametrize("cands", CASES)
    def test_golden_cases(self, cands):
        from lmss_entity_extractor_ray.extraction.merge import merge_spans
        from oracle.independent import merge

        assert merge_spans(list(cands)) == merge(list(cands))

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.sampled_from(
                    ["the court", "alpha", "Beta Gamma", "law", "laws", "of beta", "x"]
                ),
                st.integers(0, 30),
                st.integers(1, 12),
                st.sampled_from(["NER_GAZ", "NER_CAP", "NOUN_PHRASE", "KEYWORD"]),
            ),
            max_size=8,
        )
    )
    def test_fuzz_parity(self, raw):
        from lmss_entity_extractor_ray.extraction.merge import merge_spans
        from oracle.independent import merge

        cands = [(t, s, s + ln, ty) for (t, s, ln, ty) in raw]
        assert merge_spans(list(cands)) == merge(list(cands))


class TestExtractorParity:
    def test_mentions_equal_on_seeded_corpus(self, artifacts, small_corpus):
        """Every mention record (text/start/end/type/context) must agree
        between DocumentExtractor and IndependentExtractor across the 200-doc
        seeded corpus."""
        from lmss_entity_extractor_ray.config import DEFAULT_CONFIG
        from lmss_entity_extractor_ray.extraction.extractor import DocumentExtractor
        from lmss_entity_extractor_ray.functions.text import resolve_text
        from oracle.independent import IndependentExtractor

        forms = artifacts.gazetteer_surface_forms(
            DEFAULT_CONFIG.extractor.min_gazetteer_label_chars
        )
        engine = DocumentExtractor(forms, DEFAULT_CONFIG.extractor)
        indep = IndependentExtractor(forms)
        n_mentions = 0
        for text, html in zip(
            small_corpus.column("text").to_pylist(), small_corpus.column("html").to_pylist()
        ):
            doc = resolve_text(text, html)
            a = [
                (m["text"], m["start"], m["end"], m["type"], m["context"])
                for m in engine.extract(doc)
            ]
            b = [
                (m["text"], m["start"], m["end"], m["type"], m["context"])
                for m in indep.extract(doc)
            ]
            assert a == b, doc[:120]
            n_mentions += len(a)
        assert n_mentions > 500  # the corpus is mention-dense

    def test_adversarial_texts(self, artifacts):
        from lmss_entity_extractor_ray.config import DEFAULT_CONFIG
        from lmss_entity_extractor_ray.extraction.extractor import DocumentExtractor
        from oracle.independent import IndependentExtractor

        forms = artifacts.gazetteer_surface_forms(3)
        engine = DocumentExtractor(forms, DEFAULT_CONFIG.extractor)
        indep = IndependentExtractor(forms)
        texts = [
            "",
            "   ",
            "Tax Law TAX LAW tax law",
            "The the of of and and",
            "Intellectual Property Practice meets Intellectual Property.",
            "A1 B2 C3 123 456 ALL-CAPS X",
            "one two three four five six seven eight nine",  # np max-token split
            "Securities Regulation\nSecurities  Regulation\tSecurities Regulation",
            "word " * 50 + "Patent Law",
        ]
        for t in texts:
            a = [(m["text"], m["start"], m["end"], m["type"]) for m in engine.extract(t)]
            b = [(m["text"], m["start"], m["end"], m["type"]) for m in indep.extract(t)]
            assert a == b, t[:60]


class TestGoldenTriples:
    def test_mirror_matches_checked_in_golden(self, artifacts, small_corpus):
        """Checked-in golden triple keys for the 200-doc seeded corpus: catches
        a future drift of BOTH derivations at once (shared-spec bugs)."""
        import json
        import os

        from oracle.mirror import ReferenceMirror

        path = os.path.join(os.path.dirname(__file__), "golden", "triples_sf_tiny.json")
        with open(path) as f:
            golden = json.load(f)
        tbl = ReferenceMirror(artifacts).triples_for_corpus(small_corpus)
        keys = sorted(
            zip(
                tbl.column("subj").to_pylist(),
                tbl.column("pred").to_pylist(),
                tbl.column("obj").to_pylist(),
            )
        )
        assert len(keys) == golden["n"]
        assert [list(k) for k in keys] == golden["triples"]
