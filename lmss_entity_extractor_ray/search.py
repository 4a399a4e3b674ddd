"""Scored ontology search — mirror of the reference's ``LMSSSearch``
(app/lmss_search.py:61-104) over the columnar artifacts.

Score per class: ``0.3*token_set_ratio + 0.3*partial_ratio + 0.4*cosine``
(app/lmss_search.py:95-104).  The reference's JSON index never carries
embeddings so its vector term is always 0 (SURVEY.md §1.1.2); our artifacts
DO carry per-class embeddings, so the 0.4 term is live — ``vector_term=False``
reproduces the reference's literal behavior when parity matters.

Branch filtering (app/lmss_search.py:47-59): selected branch IRIs plus all
transitive subclasses form an allow-set.  Results with score > 0, stable-sort
desc, top-10 (:81-86).

Search is interactive (one query at a time) → a driver-side utility over the
broadcast artifacts, not a corpus-scale Dataset stage (SURVEY.md §2.3 A4).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set

import numpy as np

from .config import SearchConfig
from .functions.embedding import embed_text
from .functions.fuzzy import partial_ratio, token_set_ratio
from .ontology.artifacts import OntologyArtifacts


class OntologySearch:
    def __init__(self, artifacts: OntologyArtifacts, cfg: SearchConfig = SearchConfig()):
        self.art = artifacts
        self.cfg = cfg
        # class-row → embedding-row (classes without any embedded field have
        # a zero vector → cosine 0 via the empty-guard, like the reference)
        n = len(artifacts.iris)
        dim = artifacts.emb_norm.shape[1] if artifacts.emb_norm.size else 0
        self.class_emb = np.zeros((n, dim), dtype=np.float32)
        for row, cls_idx in enumerate(artifacts.emb_class_idx):
            self.class_emb[cls_idx] = artifacts.emb_norm[row]
        self._children: Dict[str, List[str]] = {}
        for i, iri in enumerate(artifacts.iris):
            for p in artifacts.classes.column("parents")[i].as_py():
                self._children.setdefault(p, []).append(iri)

    def descendants(self, iri: str) -> Set[str]:
        """Transitive subclasses (recursive walk, app/lmss_search.py:54-59)."""
        out: Set[str] = set()
        stack = list(self._children.get(iri, []))
        while stack:
            c = stack.pop()
            if c not in out:
                out.add(c)
                stack.extend(self._children.get(c, []))
        return out

    def _allow_set(self, selected_branches: Optional[List[str]]) -> Optional[Set[str]]:
        if not selected_branches:
            return None
        allowed: Set[str] = set()
        for b in selected_branches:
            allowed.add(b)
            allowed |= self.descendants(b)
        return allowed

    def search(
        self,
        query: str,
        selected_branches: Optional[List[str]] = None,
        vector_term: bool = True,
    ) -> List[Dict]:
        cfg = self.cfg
        q_lower = query.lower()
        qv = embed_text(query)
        cos = self.class_emb @ qv if vector_term and self.class_emb.size else None
        allowed = self._allow_set(selected_branches)

        results: List[Dict] = []
        for i, iri in enumerate(self.art.iris):
            if allowed is not None and iri not in allowed:
                continue
            label = self.art.labels[i]
            regex_score = token_set_ratio(q_lower, label.lower()) / 100
            fuzzy_score = partial_ratio(q_lower, label.lower()) / 100
            vector_score = float(cos[i]) if cos is not None else 0.0
            score = (
                cfg.regex_weight * regex_score
                + cfg.fuzzy_weight * fuzzy_score
                + cfg.vector_weight * vector_score
            )
            if score > 0:
                results.append({"iri": iri, "label": label, "score": round(score, 6)})
        # stable sort desc keeps index order on ties, like Python's sorted
        results.sort(key=lambda r: -r["score"])
        return results[: cfg.top_k]
