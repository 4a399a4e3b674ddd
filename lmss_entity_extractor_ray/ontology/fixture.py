"""Deterministic fixture ontology generator (FIXTURES.md §F2).

Modeled on the reference's test fixture ``sample_ontology.owl``
(/root/reference/sample_ontology.owl:1-47) but with valid XML (the reference
fixture leaves the ``skos:``/``dc:`` prefixes undeclared) and large enough to
exercise every parser path (app/lmss_parser.py:44-112):

- configurable class count (default ~60) under 6 top-class branches, 3-4
  levels deep;
- one sandbox-excluded class, one multi-parent class, one label-only class;
- labels that are substrings of other labels; a shared altLabel across two
  classes; prefLabel/altLabel/definition/example/seeAlso on subsets.

Everything is a pure function of the parameters — no randomness, no clock.
"""

from __future__ import annotations

import random
from typing import Dict, List

LMSS = "http://lmss.sali.org/"

BRANCH_NAMES = [
    "Area of Law",
    "Actor / Player",
    "Asset Type",
    "Document / Artifact",
    "Forums and Venues",
    "Legal Entity",
]

# word banks for generated class labels (legal-domain flavored, public terms)
_W1 = [
    "Patent", "Trademark", "Copyright", "Contract", "Employment", "Tax",
    "Antitrust", "Securities", "Bankruptcy", "Environmental", "Immigration",
    "Maritime", "Insurance", "Criminal", "Family", "Estate", "Privacy",
    "Banking", "Construction", "Energy", "Healthcare", "Telecommunications",
    "Aviation", "Agricultural", "Municipal",
]
_W2 = [
    "Law", "Litigation", "Licensing", "Compliance", "Arbitration",
    "Regulation", "Dispute", "Counsel", "Filing", "Registration",
    "Enforcement", "Prosecution", "Settlement", "Mediation", "Appeal",
    "Audit", "Advisory", "Negotiation", "Procedure", "Claim",
]
_W3 = [
    "Board", "Committee", "Tribunal", "Office", "Agency", "Practice",
    "Division", "Panel", "Authority", "Commission",
]


def label_for(k: int) -> str:
    """Deterministic unique class label for generated (non-special) classes."""
    n12 = len(_W1) * len(_W2)
    if k < n12:
        return f"{_W1[k % len(_W1)]} {_W2[(k // len(_W1)) % len(_W2)]}"
    k2 = k - n12
    return (
        f"{_W1[k2 % len(_W1)]} {_W2[(k2 // len(_W1)) % len(_W2)]} "
        f"{_W3[(k2 // n12) % len(_W3)]}"
    )


def _iri(name: str) -> str:
    return LMSS + name.replace(" ", "").replace("/", "")


def fixture_classes(n_classes: int = 60, seed: int = 7) -> List[Dict]:
    """Class records (pre-XML): iri, label, parents, optional skos/dc fields."""
    rng = random.Random(seed)
    out: List[Dict] = []

    # 6 top classes (direct children of owl:Thing)
    for name in BRANCH_NAMES:
        out.append(
            {
                "iri": _iri(f"Top{name}"),
                "label": name,
                "parents": ["http://www.w3.org/2002/07/owl#Thing"],
                "definition": f"Top-level branch for {name.lower()}.",
            }
        )
    top_iris = [c["iri"] for c in out]

    n_generated = max(0, n_classes - len(out) - 4)  # leave room for specials
    level_parents = {b: [b] for b in top_iris}  # branch → candidate parents
    for k in range(n_generated):
        label = label_for(k)
        branch = top_iris[k % len(top_iris)]
        parent = level_parents[branch][rng.randrange(len(level_parents[branch]))]
        iri = _iri(label) + f"C{k}"
        rec: Dict = {"iri": iri, "label": label, "parents": [parent]}
        r = rng.random()
        if r < 0.5:
            rec["pref_label"] = label
        if r < 0.4:
            rec["alt_labels"] = [f"{label} Matter", label.replace(" ", "-")]
        if r < 0.6:
            rec["definition"] = f"The area of {label.lower()} and related proceedings."
        if 0.3 < r < 0.5:
            rec["examples"] = [f"An example {label.lower()} case."]
        if r > 0.8:
            rec["see_also"] = [LMSS + "SeeAlsoTarget"]
        out.append(rec)
        # grow depth: a third of the nodes become available parents
        if k % 3 == 0 and len(level_parents[branch]) < 8:
            level_parents[branch].append(iri)

    aol, actor = top_iris[0], top_iris[1]
    # special 1: sandbox-excluded class (filter M2, app/lmss_parser.py:21,51)
    out.append(
        {
            "iri": LMSS + "SandboxClass",
            "label": "ZZZ - SANDBOX: UNDER CONSTRUCTION placeholder",
            "parents": [aol],
        }
    )
    # special 2: multi-parent class (branch-tie determinism, SURVEY §7.4.3)
    out.append(
        {
            "iri": LMSS + "MultiParent",
            "label": "Cross Border Insolvency",
            "parents": [aol, actor],
            "definition": "Insolvency proceedings spanning jurisdictions.",
        }
    )
    # special 3: label-only class (no SKOS fields at all)
    out.append({"iri": LMSS + "LabelOnly", "label": "Quiet Title Action", "parents": [aol]})
    # special 4+5: substring labels + shared altLabel across two classes
    out.append(
        {
            "iri": LMSS + "IPLaw",
            "label": "Intellectual Property",
            "parents": [aol],
            "alt_labels": ["IP"],
            "definition": "Rights over creations of the mind.",
        }
    )
    out.append(
        {
            "iri": LMSS + "IPLawPractice",
            "label": "Intellectual Property Practice",
            "parents": [LMSS + "IPLaw"],
            "alt_labels": ["IP", "IP practice"],
            "pref_label": "Intellectual Property Practice",
        }
    )
    return out


def to_owl_xml(classes: List[Dict]) -> str:
    """Serialize class records as RDF/XML with all namespaces declared."""
    from xml.sax.saxutils import escape, quoteattr

    lines = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        "<rdf:RDF",
        '    xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"',
        '    xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"',
        '    xmlns:owl="http://www.w3.org/2002/07/owl#"',
        '    xmlns:skos="http://www.w3.org/2004/02/skos/core#"',
        '    xmlns:dc="http://purl.org/dc/elements/1.1/">',
    ]
    for c in classes:
        lines.append(f"  <owl:Class rdf:about={quoteattr(c['iri'])}>")
        lines.append(f"    <rdfs:label>{escape(c['label'])}</rdfs:label>")
        for p in c.get("parents", []):
            lines.append(f"    <rdfs:subClassOf rdf:resource={quoteattr(p)}/>")
        if c.get("pref_label"):
            lines.append(f"    <skos:prefLabel>{escape(c['pref_label'])}</skos:prefLabel>")
        for a in c.get("alt_labels", []):
            lines.append(f"    <skos:altLabel>{escape(a)}</skos:altLabel>")
        if c.get("definition"):
            lines.append(f"    <skos:definition>{escape(c['definition'])}</skos:definition>")
        for e in c.get("examples", []):
            lines.append(f"    <skos:example>{escape(e)}</skos:example>")
        for s in c.get("see_also", []):
            lines.append(f"    <rdfs:seeAlso rdf:resource={quoteattr(s)}/>")
        if c.get("description"):
            lines.append(f"    <dc:description>{escape(c['description'])}</dc:description>")
        lines.append("  </owl:Class>")
    lines.append("</rdf:RDF>")
    return "\n".join(lines)


def write_fixture_owl(path: str, n_classes: int = 60, seed: int = 7) -> str:
    import os

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    xml = to_owl_xml(fixture_classes(n_classes=n_classes, seed=seed))
    with open(path, "w", encoding="utf-8") as f:
        f.write(xml)
    return path
