"""Reference-mirror oracle: single-process, loop-based, no Ray.

Control flow mirrors the reference exactly:
- text resolution: corpus ``text`` column verbatim, else html→text
  (app/main.py:211-228 seam re-specified for the web corpus);
- extraction: candidates → merge → per-span vector/context
  (app/entity_extraction.py:157-204) via oracle/independent.py — a
  from-scratch re-derivation that imports NOTHING from the engine's
  ``extraction`` package, so extraction parity is a genuine two-sided
  check, not shared code verifying itself;
- linking: per-mention full scan over all classes with the high-confidence
  fast path and strict-``>`` best tracking (app/lmss_classification.py:62-109
  — ``LinkerCore.match_naive``), post-process (:111-127), branch walk
  (:161-171 via the shared deterministic closure);
- triples: ``(subj=url, pred=lmss:hasClass/branch, obj=iri)`` with
  provenance, deduplicated on (subj, pred, obj) keeping max score then min
  start.
"""

from __future__ import annotations

from typing import Dict, List, Set, Tuple

import pyarrow as pa

from lmss_entity_extractor_ray.config import EngineConfig, DEFAULT_CONFIG
from lmss_entity_extractor_ray.functions.text import resolve_text
from lmss_entity_extractor_ray.linking.core import LinkerCore, make_pred
from lmss_entity_extractor_ray.ontology.artifacts import OntologyArtifacts

from .independent import IndependentExtractor

TRIPLE_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("branch", pa.string()),
        ("label", pa.string()),
        ("score", pa.float32()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("text", pa.string()),
    ]
)


class ReferenceMirror:
    def __init__(self, artifacts: OntologyArtifacts, cfg: EngineConfig = DEFAULT_CONFIG):
        self.cfg = cfg
        self.extractor = IndependentExtractor(
            artifacts.gazetteer_surface_forms(cfg.extractor.min_gazetteer_label_chars),
            top_k=cfg.extractor.top_keywords,
            max_np_tokens=cfg.extractor.max_noun_phrase_tokens,
            context_chars=cfg.extractor.context_chars,
        )
        self.linker = LinkerCore(artifacts, cfg.linker)

    def process_document(self, url: str, text: str) -> List[Dict]:
        """Deduplicated triple rows for one document."""
        best: Dict[Tuple[str, str, str], Dict] = {}
        for mention in self.extractor.extract(text):
            rec = self.linker.classify(mention, fast=False)
            if rec is None:
                continue
            row = {
                "subj": url,
                "pred": make_pred(rec["branch"]),
                "obj": rec["iri"],
                "branch": rec["branch"],
                "label": rec["label"],
                "score": rec["score"],
                "start": rec["start"],
                "end": rec["end"],
                "text": rec["text"],
            }
            key = (row["subj"], row["pred"], row["obj"])
            cur = best.get(key)
            if (
                cur is None
                or row["score"] > cur["score"]
                or (row["score"] == cur["score"] and row["start"] < cur["start"])
            ):
                best[key] = row
        return list(best.values())

    def triples_for_corpus(self, corpus: pa.Table) -> pa.Table:
        """Run every corpus row through the mirror; returns the deduplicated
        triple table sorted by (subj, pred, obj)."""
        urls = corpus.column("url").to_pylist()
        texts = corpus.column("text").to_pylist()
        htmls = corpus.column("html").to_pylist() if "html" in corpus.column_names else [None] * len(urls)
        rows: List[Dict] = []
        for url, text, html in zip(urls, texts, htmls):
            rows.extend(self.process_document(url, resolve_text(text, html)))
        rows.sort(key=lambda r: (r["subj"], r["pred"], r["obj"]))
        if not rows:
            return TRIPLE_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=TRIPLE_SCHEMA)


def triple_key_set(table: pa.Table) -> Set[Tuple[str, str, str]]:
    return set(
        zip(
            table.column("subj").to_pylist(),
            table.column("pred").to_pylist(),
            table.column("obj").to_pylist(),
        )
    )
