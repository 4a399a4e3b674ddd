"""Exact-label hits: the driver-checkable oracle for the KG stack.

The KG pipeline's extraction→linking semantics (fuzzy scores, embeddings)
are not SQL-expressible, so round 1 left the whole stack `no_oracle`.  This
operator carves out the part that IS: the corpus × ontology-surface-form
EXACT match join, end to end through the same machinery the pipeline uses —
Arrow-kernel text normalization, the Aho-Corasick automaton
(functions/automaton.py), the broadcast artifacts — producing distinct
``(url, iri)`` pairs that DuckDB can reproduce verbatim with a
``contains()`` join over the same two parquet inputs.  A drift anywhere in
normalize / gazetteer / broadcast plumbing breaks the hash match.

Match semantics (shared with the SQL oracle, exactly):
- text := ' ' + trim(regexp_replace(lower(coalesce(text,'')),
  '[^a-z0-9]+', ' ', 'g')) + ' '   (RE2 on both sides — Arrow and DuckDB);
- a class surface form (rdfs:label ∪ skos:prefLabel ∪ skos:altLabel,
  normalized the same way, ≥ 3 chars) hits a document iff
  ``' ' + form + ' '`` occurs in the normalized text — i.e. exact
  token-boundary phrase match in the alnum-token space.
- output: DISTINCT (url, iri); urls are unique per the corpus contract, so
  per-document dedup IS global dedup — the operator needs NO shuffle at all
  (the reason it scales: pure map, one actor pool, forms broadcast once).

This intentionally reads only the ``text`` column (both sides coalesce NULL
to ''): the html→text fallback path is pinned separately by the byte-identity
pytest; here the point is an INDEPENDENT, value-level check of the gazetteer
candidate source (reference: app/entity_extraction.py:136-140's
boundary-anchored matching).
"""

from __future__ import annotations

import os
import re
from typing import Dict, List

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..functions.automaton import AhoCorasick
from ..ontology.artifacts import OntologyArtifacts

_NON_ALNUM_RE = re.compile(r"[^a-z0-9]+")  # ASCII class — identical in RE2


def normalize_alnum(s: str) -> str:
    """lower + collapse non-[a-z0-9] runs to single spaces + strip — the
    Python mirror of the Arrow/DuckDB expression used on document text."""
    return _NON_ALNUM_RE.sub(" ", (s or "").lower()).strip(" ")


def forms_table(artifacts: OntologyArtifacts, min_chars: int = 3) -> pa.Table:
    """Distinct (form_norm, iri) rows over label ∪ prefLabel ∪ altLabels.
    One form can map to several classes (shared altLabels) — every mapping
    is a row."""
    seen = set()
    forms: List[str] = []
    iris: List[str] = []
    for i in range(len(artifacts.iris)):
        for form in [artifacts.labels[i], artifacts.pref_labels[i], *artifacts.alt_labels[i]]:
            f = normalize_alnum(form)
            if len(f) < min_chars:
                continue
            key = (f, artifacts.iris[i])
            if key in seen:
                continue
            seen.add(key)
            forms.append(f)
            iris.append(artifacts.iris[i])
    return pa.table({"form_norm": pa.array(forms, pa.string()), "iri": pa.array(iris, pa.string())})


def write_forms_parquet(artifacts: OntologyArtifacts, path: str) -> str:
    """Deterministic forms table on disk — the SQL oracle's join input."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    pq.write_table(forms_table(artifacts), path)
    return path


class ExactLabelHitter:
    """Actor stage: automaton over space-padded normalized forms, built once
    per actor; per batch, normalization runs in Arrow kernels and matching is
    one automaton scan per document."""

    def __init__(self, forms=None):
        tbl = forms
        if not isinstance(tbl, pa.Table):
            tbl = ray.get(tbl)
        self.iris_of: Dict[str, List[str]] = {}
        for f, iri in zip(tbl.column("form_norm").to_pylist(), tbl.column("iri").to_pylist()):
            self.iris_of.setdefault(f, []).append(iri)
        # padded patterns make every automaton hit token-boundary-exact
        self.automaton = AhoCorasick(" " + f + " " for f in self.iris_of)

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text"), "")
        norm = pc.utf8_trim(
            pc.replace_substring_regex(pc.utf8_lower(text), "[^a-z0-9]+", " "),
            characters=" ",
        )
        urls_out: List[str] = []
        iris_out: List[str] = []
        for url, t in zip(batch.column("url").to_pylist(), norm.to_pylist()):
            padded = " " + t + " "
            hit_iris = set()
            for start, end in self.automaton.find(padded):
                for iri in self.iris_of[padded[start + 1 : end - 1]]:
                    hit_iris.add(iri)
            for iri in sorted(hit_iris):
                urls_out.append(url)
                iris_out.append(iri)
        return pa.table(
            {"url": pa.array(urls_out, pa.string()), "iri": pa.array(iris_out, pa.string())}
        )


def exact_label_hits(corpus_ds: rd.Dataset, artifacts: OntologyArtifacts,
                     concurrency=None) -> rd.Dataset:
    forms_ref = ray.put(forms_table(artifacts))
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return corpus_ds.map_batches(
        ExactLabelHitter,
        fn_constructor_kwargs={"forms": forms_ref},
        batch_format="pyarrow",
        concurrency=concurrency or (1, max(2, int(cpus * 0.75))),
        num_cpus=1,
    )
