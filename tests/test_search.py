"""OntologySearch parity tests (reference LMSSSearch, app/lmss_search.py)."""

import pytest

from lmss_entity_extractor_ray.search import OntologySearch


@pytest.fixture(scope="module")
def search(artifacts):
    return OntologySearch(artifacts)


class TestSearch:
    def test_exact_label_ranks_first(self, search, artifacts):
        label = artifacts.labels[3]
        results = search.search(label)
        assert results
        assert results[0]["label"] == label
        assert results[0]["score"] > 0.6  # token_set + partial both 1.0

    def test_top_k_and_sorted(self, search):
        results = search.search("law")
        assert len(results) <= 10
        scores = [r["score"] for r in results]
        assert scores == sorted(scores, reverse=True)

    def test_branch_filter_restricts(self, search, artifacts):
        top = artifacts.top_classes[0]
        allowed = {top["iri"]} | search.descendants(top["iri"])
        results = search.search("law", selected_branches=[top["iri"]])
        assert results
        assert all(r["iri"] in allowed for r in results)

    def test_vector_term_off_matches_reference_literal_behavior(self, search, artifacts):
        # with vector_term=False the 0.4 term is 0 (the reference's index
        # carries no embeddings, SURVEY.md §1.1.2) — scores strictly from
        # the two fuzzy terms, bounded by 0.6
        results = search.search(artifacts.labels[0], vector_term=False)
        assert results and all(r["score"] <= 0.6 + 1e-9 for r in results)

    def test_score_formula(self, search, artifacts):
        # 0.3*token_set + 0.3*partial + 0.4*cosine, app/lmss_search.py:95-104
        import numpy as np

        from lmss_entity_extractor_ray.functions.embedding import embed_text
        from lmss_entity_extractor_ray.functions.fuzzy import partial_ratio, token_set_ratio

        q = "contract dispute"
        results = search.search(q)
        i = artifacts.labels.index(results[0]["label"])
        label = artifacts.labels[i]
        expected = (
            0.3 * token_set_ratio(q.lower(), label.lower()) / 100
            + 0.3 * partial_ratio(q.lower(), label.lower()) / 100
            + 0.4 * float(search.class_emb[i] @ embed_text(q))
        )
        assert abs(results[0]["score"] - round(expected, 6)) < 1e-6

    def test_descendants_transitive(self, search, artifacts):
        # every non-top class with a branch must be a descendant of its top
        by_label = {t["label"]: t["iri"] for t in artifacts.top_classes}
        checked = 0
        for iri in artifacts.iris:
            b = artifacts.branch_of.get(iri)
            if b and b in by_label and by_label[b] != iri:
                assert iri in search.descendants(by_label[b]), iri
                checked += 1
        assert checked > 10


class TestReferenceFormulaParity:
    def test_vector_term_off_reproduces_reference_formula(self, artifacts):
        """With the vector term off (the reference's JSON index never carries
        embeddings, so its 0.4*vector term is ALWAYS 0 —
        app/lmss_search.py:106-110), the search must equal an independent
        evaluation of the literal reference formula
        0.3*token_set_ratio + 0.3*partial_ratio + 0.4*0 with score>0 filter,
        stable desc sort, top-10 (app/lmss_search.py:81-104)."""
        from lmss_entity_extractor_ray.functions.fuzzy import (
            partial_ratio,
            token_set_ratio,
        )
        from lmss_entity_extractor_ray.search import OntologySearch

        s = OntologySearch(artifacts)
        for q in ("securities law compliance", "intellectual property", "tax", "zzz"):
            got = s.search(q, vector_term=False)
            ql = q.lower()
            exp = []
            for iri, label in zip(artifacts.iris, artifacts.labels):
                score = (
                    0.3 * (token_set_ratio(ql, label.lower()) / 100)
                    + 0.3 * (partial_ratio(ql, label.lower()) / 100)
                    + 0.4 * 0.0
                )
                if score > 0:
                    exp.append({"iri": iri, "label": label, "score": round(score, 6)})
            exp.sort(key=lambda r: -r["score"])
            assert got == exp[:10], q
