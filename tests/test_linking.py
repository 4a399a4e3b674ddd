"""Linking-core tests: fast == naive equivalence, fast-path index order,
threshold/strict-> semantics, branch lookup (SURVEY.md §2.4 J1-J2, §7.4.2)."""

import numpy as np
import pytest

from lmss_entity_extractor_ray.config import LinkerConfig
from lmss_entity_extractor_ray.functions.embedding import embed_text
from lmss_entity_extractor_ray.linking.core import LinkerCore, make_pred


@pytest.fixture(scope="module")
def core(artifacts):
    return LinkerCore(artifacts, LinkerConfig())


@pytest.fixture(scope="module")
def loose_core(artifacts):
    # CLI-style loose threshold (app/run_classifier.py:33-39)
    return LinkerCore(artifacts, LinkerConfig(similarity_threshold=0.3))


def _probe_texts(artifacts):
    texts = list(artifacts.labels[:20])
    texts += [t.lower() for t in artifacts.labels[20:30]]
    texts += [t.upper() for t in artifacts.labels[30:40]]
    texts += [t + " matter" for t in artifacts.labels[:10]]
    texts += ["completely unrelated zebra text", "quarterly weather report",
              "xyzzy", "the", "Paris Texas lawyer"]
    return texts


class TestFastNaiveEquivalence:
    def test_equivalence_default_threshold(self, artifacts, core):
        for t in _probe_texts(artifacts):
            v = embed_text(t)
            assert core.match_naive(t, v) == core._match_fast_uncached(t, v), t

    def test_equivalence_loose_threshold(self, artifacts, loose_core):
        for t in _probe_texts(artifacts):
            v = embed_text(t)
            naive = loose_core.match_naive(t, v)
            fast = loose_core._match_fast_uncached(t, v)
            assert naive == fast, t

    def test_cache_stable(self, artifacts, core):
        t = artifacts.labels[0]
        v = embed_text(t)
        assert core.match_fast(t, v) == core.match_fast(t, v)


class TestFastPath:
    def test_exact_label_high_confidence(self, artifacts, core):
        # an exact label match embeds identically → cosine ≈ 1 ≥ 0.9 fast path
        t = artifacts.labels[10]
        match = core.match_fast(t, embed_text(t))
        assert match is not None
        assert match[2] >= 0.9

    def test_fast_path_first_index_wins(self):
        """Two classes with identical embeddings: the FIRST in index order is
        returned by the >=0.9 fast path (app/lmss_classification.py:75-84)."""
        import pyarrow as pa

        from lmss_entity_extractor_ray.ontology.artifacts import OntologyArtifacts

        vec = embed_text("shared surface form")
        mat = np.stack([vec, vec])
        art = OntologyArtifacts(
            classes=pa.table(
                {
                    "iri": ["http://x/A", "http://x/B"],
                    "label": ["First Class", "Second Class"],
                    "pref_label": ["", ""],
                    "alt_labels": pa.array([[], []], pa.list_(pa.string())),
                    "definition": ["", ""],
                    "description": ["", ""],
                    "examples": pa.array([[], []], pa.list_(pa.string())),
                    "see_also": pa.array([[], []], pa.list_(pa.string())),
                    "parents": pa.array([[], []], pa.list_(pa.string())),
                }
            ),
            emb_matrix=mat,
            emb_norm=mat,
            emb_class_idx=np.array([0, 1], dtype=np.int32),
            branch_of={},
            top_classes=[],
        )
        core = LinkerCore(art, LinkerConfig())
        match = core.match_fast("shared surface form", vec)
        assert match[0] == "http://x/A"
        naive = core.match_naive("shared surface form", vec)
        assert naive[0] == "http://x/A"


class TestThresholds:
    def test_no_match_below_threshold(self, core):
        t = "zzzz qqqq completely alien"
        assert core.match_fast(t, embed_text(t)) is None

    def test_loose_threshold_matches_more(self, artifacts, core, loose_core):
        texts = _probe_texts(artifacts)
        strict = sum(core._match_fast_uncached(t, embed_text(t)) is not None for t in texts)
        loose = sum(loose_core._match_fast_uncached(t, embed_text(t)) is not None for t in texts)
        assert loose >= strict


class TestClassify:
    def test_classified_record_shape(self, artifacts, core):
        t = artifacts.labels[5]
        rec = core.classify(
            {"text": t, "vector": embed_text(t), "start": 3, "end": 3 + len(t),
             "type": "NER_GAZ"}
        )
        assert rec is not None
        assert set(rec) == {"start", "end", "text", "branch", "label", "score", "iri"}
        assert rec["branch"] in {t2["label"] for t2 in artifacts.top_classes} | {"Unknown"}

    def test_verb_dead_branch(self, artifacts, core):
        # parity with the reference's dead VERB branch (SURVEY.md §2.10)
        t = artifacts.labels[5]
        match = (artifacts.iris[5], t, 0.5)
        assert core.post_process("VERB", match) is None
        assert core.post_process("NOUN_PHRASE", match) == match

    def test_make_pred(self):
        assert make_pred("Area of Law") == "http://lmss.sali.org/hasClass/Area of Law"


class TestLmssScaleParity:
    def test_naive_equals_fast_at_5k_classes(self, tmp_path_factory):
        """The pruned/vectorized-bound fast path must stay bit-identical to
        the reference-faithful full scan at LMSS scale (~5k classes), where
        the bound pruning actually does the work."""
        from lmss_entity_extractor_ray.config import DEFAULT_CONFIG as cfg
        from lmss_entity_extractor_ray.extraction.extractor import DocumentExtractor
        from lmss_entity_extractor_ray.functions.text import resolve_text
        from lmss_entity_extractor_ray.linking.core import LinkerCore
        from lmss_entity_extractor_ray.ontology.artifacts import build_or_load
        from lmss_entity_extractor_ray.ontology.fixture import write_fixture_owl
        from lmss_entity_extractor_ray.pipelines.corpus import corpus_table, make_phrase_bank

        owl = write_fixture_owl(
            str(tmp_path_factory.mktemp("owl5k") / "fixture5k.owl"), n_classes=5000
        )
        art = build_or_load(owl, cache_root="/tmp/lmss_artifacts_test")
        ex = DocumentExtractor(art.gazetteer_surface_forms(3), cfg.extractor)
        lk = LinkerCore(art, cfg.linker)
        corpus = corpus_table(24, seed=11, bank=make_phrase_bank(art))
        seen = set()
        checked = 0
        for text, html in zip(
            corpus.column("text").to_pylist(), corpus.column("html").to_pylist()
        ):
            for m in ex.extract(resolve_text(text, html)):
                if m["text"] in seen:
                    continue
                seen.add(m["text"])
                naive = lk.match_naive(m["text"], m["vector"])
                fast = lk._match_fast_uncached(m["text"], m["vector"])
                assert naive == fast, (m["text"], naive, fast)
                checked += 1
        assert checked > 40
