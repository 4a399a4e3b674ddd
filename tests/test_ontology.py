"""Ontology parse/artifact tests (SURVEY.md §2.1 S2, §2.4 J2, §2.5 G1-G2)."""

import io

import numpy as np
import pytest

from lmss_entity_extractor_ray.ontology.artifacts import (
    build_artifacts,
    build_branch_closure,
    load_artifacts,
    save_artifacts,
)
from lmss_entity_extractor_ray.ontology.fixture import (
    BRANCH_NAMES,
    fixture_classes,
    to_owl_xml,
    write_fixture_owl,
)
from lmss_entity_extractor_ray.ontology.owl_parser import parse_owl, top_class_iris

MINI_OWL = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#"
         xmlns:skos="http://www.w3.org/2004/02/skos/core#"
         xmlns:dc="http://purl.org/dc/elements/1.1/">
  <owl:Class rdf:about="http://x/Parent">
    <rdfs:label>Parent Class</rdfs:label>
    <rdfs:subClassOf rdf:resource="http://www.w3.org/2002/07/owl#Thing"/>
    <skos:prefLabel>Parent</skos:prefLabel>
    <skos:altLabel>P1</skos:altLabel>
    <skos:altLabel>P2</skos:altLabel>
    <skos:definition>The parent.</skos:definition>
    <dc:description>desc</dc:description>
  </owl:Class>
  <owl:Class rdf:about="http://x/Child">
    <rdfs:label>Child Class</rdfs:label>
    <rdfs:subClassOf rdf:resource="http://x/Parent"/>
  </owl:Class>
  <owl:Class rdf:about="http://x/Sandbox">
    <rdfs:label>ZZZ - SANDBOX: UNDER CONSTRUCTION thing</rdfs:label>
    <rdfs:subClassOf rdf:resource="http://x/Parent"/>
  </owl:Class>
  <owl:Class rdf:about="http://x/GrandChild">
    <rdfs:label>Grand Child</rdfs:label>
    <rdfs:subClassOf rdf:resource="http://x/Sandbox"/>
  </owl:Class>
</rdf:RDF>
"""


class TestOwlParser:
    def test_parse_fields(self):
        recs = parse_owl(io.StringIO(MINI_OWL))
        assert [r["iri"] for r in recs] == [
            "http://x/Parent",
            "http://x/Child",
            "http://x/Sandbox",
            "http://x/GrandChild",
        ]
        p = recs[0]
        assert p["label"] == "Parent Class"
        assert p["pref_label"] == "Parent"
        assert p["alt_labels"] == ["P1", "P2"]
        assert p["definition"] == "The parent."
        assert p["description"] == "desc"
        assert p["parents"] == ["http://www.w3.org/2002/07/owl#Thing"]

    def test_sandbox_flag(self):
        recs = parse_owl(io.StringIO(MINI_OWL))
        assert [r["excluded"] for r in recs] == [False, False, True, False]

    def test_top_classes(self):
        recs = parse_owl(io.StringIO(MINI_OWL))
        assert top_class_iris(recs) == ["http://x/Parent"]


class TestBranchClosure:
    def test_branch_through_sandbox(self):
        # sandbox classes are valid intermediate hops in the branch walk
        recs = parse_owl(io.StringIO(MINI_OWL))
        closure = build_branch_closure(recs, {"http://x/Parent": "Parent Class"})
        assert closure["http://x/GrandChild"] == "Parent Class"
        assert closure["http://x/Parent"] == "Parent Class"  # self-first
        assert "http://x/NotThere" not in closure

    def test_multi_parent_deterministic(self, artifacts):
        # first parent in document order wins (SURVEY.md §7.4.3)
        assert artifacts.branch("http://lmss.sali.org/MultiParent") == "Area of Law"

    def test_cycle_safe(self):
        recs = [
            {"iri": "a", "label": "A", "parents": ["b"], "excluded": False},
            {"iri": "b", "label": "B", "parents": ["a"], "excluded": False},
        ]
        closure = build_branch_closure(recs, {})
        assert closure == {}


class TestArtifacts:
    def test_sandbox_excluded_from_index(self, artifacts):
        assert "http://lmss.sali.org/SandboxClass" not in artifacts.iris

    def test_top_classes_sorted_by_label(self, artifacts):
        labels = [t["label"] for t in artifacts.top_classes]
        assert labels == sorted(labels)
        assert set(labels) == set(BRANCH_NAMES)

    def test_entities_count_blocked_by_sandbox(self, tmp_path):
        # reference recursion descends only through index members
        # (app/lmss_parser.py:106-112): GrandChild hides behind Sandbox
        p = tmp_path / "mini.owl"
        p.write_text(MINI_OWL)
        art = build_artifacts(str(p))
        assert art.top_classes == [
            {"iri": "http://x/Parent", "label": "Parent Class", "entities_count": 1}
        ]

    def test_label_only_class_has_embedding(self, artifacts):
        i = artifacts.iris.index("http://lmss.sali.org/LabelOnly")
        assert i in set(artifacts.emb_class_idx.tolist())

    def test_emb_norm_rows_unit(self, artifacts):
        norms = np.linalg.norm(artifacts.emb_norm, axis=1)
        assert np.allclose(norms[norms > 0], 1.0, atol=1e-5)

    def test_roundtrip(self, artifacts, tmp_path):
        d = save_artifacts(artifacts, str(tmp_path / "art"))
        loaded = load_artifacts(d)
        assert loaded.iris == artifacts.iris
        assert np.allclose(loaded.emb_matrix, artifacts.emb_matrix)
        assert loaded.branch_of == artifacts.branch_of
        assert loaded.top_classes == artifacts.top_classes
        assert loaded.owl_sha256 == artifacts.owl_sha256

    def test_stats(self, artifacts):
        s = artifacts.stats()
        assert s["branches"] == 6
        assert s["classes"] == 60
        assert s["attributes_with_embeddings"] > 60

    def test_fixture_determinism(self, tmp_path):
        a = to_owl_xml(fixture_classes())
        b = to_owl_xml(fixture_classes())
        assert a == b
