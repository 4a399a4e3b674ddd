"""Single-process reference-mirror oracle — the executable spec
(SURVEY.md §5.2.1).

Mirrors the reference's per-document control flow exactly
(EntityExtractor.extract_entities → OntologyClassifier.match_entities,
app/entity_extraction.py:157-204 / app/lmss_classification.py:129-159) using
the engine's deterministic re-specifications of the ML surfaces (SURVEY.md
§7.0).  The Ray pipeline's triples are gated at P/R >= 0.95 against this
oracle's triples on the synthetic corpus.
"""

from .mirror import ReferenceMirror, triple_key_set  # noqa: F401
