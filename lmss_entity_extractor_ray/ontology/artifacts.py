"""Ontology artifact build — the driver-side "M0" phase (SURVEY.md §7.1.1).

The reference's ontology phase (app/lmss_parser.py:171-195) produces a JSON
index, a top-classes JSON, and a Turtle graph whose blank nodes store
JSON-encoded embeddings (app/lmss_parser.py:114-155).  The engine replaces
those with compact columnar artifacts, built once on the driver in seconds
and broadcast to every actor via ``ray.put``:

- ``classes`` — pyarrow Table in index (document) order, non-sandbox only;
- ``emb_matrix`` / ``emb_norm`` — float32 [n_embedded, dim] mean-of-field
  class embeddings (precomputing the mean the reference recomputes per
  lookup, app/lmss_classification.py:50-60) and a row-unit-normalized copy;
- ``emb_class_idx`` — row → class index mapping (classes whose four text
  fields are all empty have no embedding and are skipped by the linker,
  mirroring app/lmss_classification.py:69-70);
- ``branch_of`` — iri → branch label closure (flattens the per-row
  ``transitive_objects`` graph walk, app/lmss_classification.py:161-171,
  into an O(1) lookup; deterministic parent-order DFS pins multi-parent
  ties, SURVEY.md §7.4.3);
- ``top_classes`` — [{iri, label, entities_count}] sorted by label
  (app/lmss_parser.py:90-104).

Artifacts round-trip to disk under a content-hash directory (the sha256 hash
gate of app/lmss_parser.py:36-42 / app/main.py:82-114 re-expressed as a
cache key).
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import EMBED_DIM
from ..functions.embedding import embed_text
from .owl_parser import parse_owl, top_class_iris

EMBED_FIELDS = ("label", "definition", "pref_label", "alt_labels")  # reference order, app/lmss_parser.py:119-124


@dataclass
class OntologyArtifacts:
    classes: pa.Table                 # index-order, non-sandbox classes
    emb_matrix: np.ndarray            # float32 [n_embedded, dim] raw means
    emb_norm: np.ndarray              # float32 [n_embedded, dim] unit rows
    emb_class_idx: np.ndarray         # int32 [n_embedded] → row in `classes`
    branch_of: Dict[str, str]         # iri → branch label ("Unknown" absent)
    top_classes: List[Dict]           # [{iri,label,entities_count}] by label
    owl_sha256: str = ""

    # ---- derived convenience views (computed lazily) ----
    def __post_init__(self):
        self.iris: List[str] = self.classes.column("iri").to_pylist()
        self.labels: List[str] = self.classes.column("label").to_pylist()
        self.labels_lower: List[str] = [s.lower() for s in self.labels]
        self.pref_labels: List[str] = self.classes.column("pref_label").to_pylist()
        self.alt_labels: List[List[str]] = self.classes.column("alt_labels").to_pylist()

    def gazetteer_surface_forms(self, min_chars: int = 3) -> List[str]:
        """Lowercased surface forms (rdfs_label ∪ skos_prefLabel ∪
        skos_altLabel) for the Aho-Corasick exact-label candidate source."""
        seen = {}
        for i in range(len(self.iris)):
            for form in [self.labels[i], self.pref_labels[i], *self.alt_labels[i]]:
                f = form.strip().lower()
                if len(f) >= min_chars:
                    seen.setdefault(f, None)
        return list(seen)

    def branch(self, iri: str) -> str:
        return self.branch_of.get(iri, "Unknown")

    def stats(self) -> Dict:
        """Mirrors reference get_statistics (app/lmss_parser.py:157-164)."""
        n_embedded_fields = int(
            sum(
                1
                for rec_i in range(len(self.iris))
                for f in EMBED_FIELDS
                if _field_text_at(self.classes, rec_i, f)
            )
        )
        return {
            "branches": len(self.top_classes),
            "classes": len(self.iris),
            "attributes_with_embeddings": n_embedded_fields,
        }


def _field_text_at(classes: pa.Table, i: int, field: str) -> str:
    v = classes.column(field)[i].as_py()
    if isinstance(v, list):
        return " ".join(v)
    return v or ""


def _field_text(rec: Dict, field: str) -> str:
    v = rec.get(field, "")
    if isinstance(v, list):
        return " ".join(v)
    return v or ""


def _classes_table(records: List[Dict]) -> pa.Table:
    cols = {
        "iri": pa.array([r["iri"] for r in records], pa.string()),
        "label": pa.array([r["label"] for r in records], pa.string()),
        "pref_label": pa.array([r["pref_label"] for r in records], pa.string()),
        "alt_labels": pa.array([r["alt_labels"] for r in records], pa.list_(pa.string())),
        "definition": pa.array([r["definition"] for r in records], pa.string()),
        "description": pa.array([r["description"] for r in records], pa.string()),
        "examples": pa.array([r["examples"] for r in records], pa.list_(pa.string())),
        "see_also": pa.array([r["see_also"] for r in records], pa.list_(pa.string())),
        "parents": pa.array([r["parents"] for r in records], pa.list_(pa.string())),
    }
    return pa.table(cols)


def build_branch_closure(
    all_records: List[Dict], top_labels: Dict[str, str]
) -> Dict[str, str]:
    """iri → branch label via memoized preorder DFS over ``parents`` in
    document order (the node itself is checked first, exactly like
    ``transitive_objects`` yielding its subject first,
    app/lmss_classification.py:163-169).  Traversal uses ALL classes
    (sandbox classes are valid intermediate hops — the reference's graph
    retains them) but ``top_labels`` only contains non-sandbox tops."""
    parents = {r["iri"]: r["parents"] for r in all_records}
    memo: Dict[str, Optional[str]] = {}

    def visit(iri: str, stack: frozenset) -> Optional[str]:
        if iri in top_labels:
            return top_labels[iri]
        if iri in memo:
            return memo[iri]
        result: Optional[str] = None
        for p in parents.get(iri, []):
            if p in stack:
                continue
            b = visit(p, stack | {p})
            if b is not None:
                result = b
                break
        memo[iri] = result
        return result

    out: Dict[str, str] = {}
    for r in all_records:
        b = visit(r["iri"], frozenset({r["iri"]}))
        if b is not None:
            out[r["iri"]] = b
    return out


def _entities_under(
    iri: str, children: Dict[str, List[str]], in_index: set, acc: set
) -> None:
    """Recursive strict-descendant collection mirroring
    get_entities_under_class (app/lmss_parser.py:106-112): a child is counted
    and descended into only if it is in the (non-sandbox) index."""
    for c in children.get(iri, []):
        if c in in_index and c not in acc:
            acc.add(c)
            _entities_under(c, children, in_index, acc)


def build_artifacts(owl_path: str, dim: int = EMBED_DIM) -> OntologyArtifacts:
    all_records = parse_owl(owl_path)
    index_records = [r for r in all_records if not r["excluded"]]

    tops = top_class_iris(all_records)
    label_by_iri = {r["iri"]: r["label"] for r in all_records}
    top_labels = {iri: label_by_iri.get(iri, "") for iri in tops}

    branch_of = build_branch_closure(all_records, top_labels)

    # entities_count per top class (strict descendants within the index)
    children: Dict[str, List[str]] = {}
    for r in all_records:
        for p in r["parents"]:
            children.setdefault(p, []).append(r["iri"])
    in_index = {r["iri"] for r in index_records}
    top_classes = []
    for iri in tops:
        acc: set = set()
        _entities_under(iri, children, in_index, acc)
        top_classes.append(
            {"iri": iri, "label": top_labels[iri], "entities_count": len(acc)}
        )
    top_classes.sort(key=lambda x: x["label"])  # app/lmss_parser.py:100-101

    # mean-of-field class embeddings (float64 accumulate, float32 store)
    rows = []
    row_class_idx = []
    for i, rec in enumerate(index_records):
        field_vecs = []
        for f in EMBED_FIELDS:
            text = _field_text(rec, f)
            if text:
                field_vecs.append(embed_text(text, dim).astype(np.float64))
        if field_vecs:
            rows.append(np.mean(field_vecs, axis=0))
            row_class_idx.append(i)
    if rows:
        emb_matrix = np.stack(rows).astype(np.float32)
    else:
        emb_matrix = np.zeros((0, dim), dtype=np.float32)
    norms = np.linalg.norm(emb_matrix, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    emb_norm = (emb_matrix / norms).astype(np.float32)

    sha = hashlib.sha256()
    with open(owl_path, "rb") as f:
        for block in iter(lambda: f.read(1 << 16), b""):
            sha.update(block)

    return OntologyArtifacts(
        classes=_classes_table(index_records),
        emb_matrix=emb_matrix,
        emb_norm=emb_norm,
        emb_class_idx=np.asarray(row_class_idx, dtype=np.int32),
        branch_of=branch_of,
        top_classes=top_classes,
        owl_sha256=sha.hexdigest(),
    )


# ---------------------------------------------------------------------------
# disk round-trip (content-hash cache, reference hash gate S10)
# ---------------------------------------------------------------------------

def save_artifacts(art: OntologyArtifacts, out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(art.classes, os.path.join(out_dir, "classes.parquet"))
    np.save(os.path.join(out_dir, "emb_matrix.npy"), art.emb_matrix)
    np.save(os.path.join(out_dir, "emb_class_idx.npy"), art.emb_class_idx)
    with open(os.path.join(out_dir, "branch_of.json"), "w") as f:
        json.dump(art.branch_of, f)
    with open(os.path.join(out_dir, "top_classes.json"), "w") as f:
        json.dump(art.top_classes, f, indent=2)
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump({"owl_sha256": art.owl_sha256, "dim": art.emb_matrix.shape[1] if art.emb_matrix.size else EMBED_DIM}, f)
    return out_dir


def load_artifacts(in_dir: str) -> OntologyArtifacts:
    classes = pq.read_table(os.path.join(in_dir, "classes.parquet"))
    emb_matrix = np.load(os.path.join(in_dir, "emb_matrix.npy"))
    emb_class_idx = np.load(os.path.join(in_dir, "emb_class_idx.npy"))
    with open(os.path.join(in_dir, "branch_of.json")) as f:
        branch_of = json.load(f)
    with open(os.path.join(in_dir, "top_classes.json")) as f:
        top_classes = json.load(f)
    with open(os.path.join(in_dir, "manifest.json")) as f:
        manifest = json.load(f)
    norms = np.linalg.norm(emb_matrix, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return OntologyArtifacts(
        classes=classes,
        emb_matrix=emb_matrix,
        emb_norm=(emb_matrix / norms).astype(np.float32),
        emb_class_idx=emb_class_idx,
        branch_of=branch_of,
        top_classes=top_classes,
        owl_sha256=manifest.get("owl_sha256", ""),
    )


def build_or_load(owl_path: str, cache_root: str = "/tmp/lmss_artifacts") -> OntologyArtifacts:
    """Content-hash-gated build: skip rebuild when the OWL bytes are unchanged
    (reference hash gate, app/run_parser.py:39-45)."""
    sha = hashlib.sha256()
    with open(owl_path, "rb") as f:
        for block in iter(lambda: f.read(1 << 16), b""):
            sha.update(block)
    out_dir = os.path.join(cache_root, sha.hexdigest()[:16])
    if os.path.exists(os.path.join(out_dir, "manifest.json")):
        return load_artifacts(out_dir)
    art = build_artifacts(owl_path)
    save_artifacts(art, out_dir)
    return art
