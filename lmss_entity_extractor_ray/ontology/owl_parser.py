"""Driver-side OWL (RDF/XML subset) parser → ontology class records.

The reference parses OWL with rdflib (app/lmss_parser.py:44-63) and projects
nine literal fields per ``owl:Class``.  rdflib is not available in the target
environment, so this module parses the RDF/XML *subset the reference actually
uses* with stdlib ``xml.etree`` (SURVEY.md §2.1 S2): top-level ``owl:Class``
elements carrying ``rdf:about``, with child elements for
``rdfs:label/ subClassOf/ seeAlso``, ``skos:prefLabel/ altLabel/ definition/
example`` and ``dc:description`` (literal text or ``rdf:resource``).

Class records preserve **document order** — this is the engine's pinned
"index order", which the linker's high-confidence fast path depends on
(reference app/lmss_classification.py:75-84; SURVEY.md §7.4.2).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Dict, List

from ..config import EXCLUDED_LABEL_PREFIXES

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
OWL_NS = "http://www.w3.org/2002/07/owl#"
SKOS_NS = "http://www.w3.org/2004/02/skos/core#"
DC_NS = "http://purl.org/dc/elements/1.1/"

OWL_THING = OWL_NS + "Thing"

_ABOUT = f"{{{RDF_NS}}}about"
_RESOURCE = f"{{{RDF_NS}}}resource"
_CLASS_TAG = f"{{{OWL_NS}}}Class"

_SINGLE_FIELDS = {
    f"{{{RDFS_NS}}}label": "label",
    f"{{{DC_NS}}}description": "description",
    f"{{{SKOS_NS}}}definition": "definition",
    f"{{{SKOS_NS}}}prefLabel": "pref_label",
}
_MULTI_FIELDS = {
    f"{{{RDFS_NS}}}seeAlso": "see_also",
    f"{{{SKOS_NS}}}altLabel": "alt_labels",
    f"{{{SKOS_NS}}}example": "examples",
    f"{{{RDFS_NS}}}subClassOf": "parents",
}


def _child_value(el: ET.Element) -> str:
    res = el.get(_RESOURCE)
    if res is not None:
        return res
    return (el.text or "").strip()


def parse_owl(source) -> List[Dict]:
    """Parse an OWL RDF/XML file (path or file-like) into a list of class
    records in document order.

    Record shape (mirrors the reference's index entry,
    app/lmss_parser.py:52-62): ``iri, label, description, see_also,
    alt_labels, definition, examples, pref_label, parents`` plus an
    ``excluded`` flag for sandbox classes (label contains a prefix from
    EXCLUDED_LABEL_PREFIXES, app/lmss_parser.py:21,51) — excluded classes are
    kept in the record list because the branch walk still traverses them
    (the reference's RDF graph retains them; only the *index* drops them).
    """
    tree = ET.parse(source)
    root = tree.getroot()
    records: List[Dict] = []
    for el in root.iter(_CLASS_TAG):
        iri = el.get(_ABOUT)
        if iri is None:
            continue  # anonymous class (e.g. restriction) — outside the subset
        rec: Dict = {
            "iri": iri,
            "label": "",
            "description": "",
            "definition": "",
            "pref_label": "",
            "see_also": [],
            "alt_labels": [],
            "examples": [],
            "parents": [],
        }
        for child in el:
            tag = child.tag
            if tag in _SINGLE_FIELDS:
                key = _SINGLE_FIELDS[tag]
                if not rec[key]:  # first literal wins (reference get_literal)
                    rec[key] = _child_value(child)
            elif tag in _MULTI_FIELDS:
                rec[_MULTI_FIELDS[tag]].append(_child_value(child))
        rec["excluded"] = any(p in rec["label"] for p in EXCLUDED_LABEL_PREFIXES)
        records.append(rec)
    return records


def top_class_iris(records: List[Dict]) -> List[str]:
    """IRIs of non-excluded classes whose direct parent is ``owl:Thing``
    (reference identify_top_classes, app/lmss_parser.py:77-88), in document
    order."""
    return [
        r["iri"]
        for r in records
        if OWL_THING in r["parents"] and not r["excluded"]
    ]
