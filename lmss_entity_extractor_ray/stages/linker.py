"""Linker — the stateful actor-pool linking stage (SURVEY.md §2.3 A3, §7.1 M4).

The reference's ``OntologyClassifier`` re-reads and JSON-decodes class
embeddings from an rdflib graph for every (mention, class) pair
(app/lmss_classification.py:50-60) — the hot-loop pathology SURVEY.md §4.1
says to fix, not port.  Here each actor receives broadcast object refs for
the precomputed artifacts in ``__init__`` and links each mention with one
gemv + pruned fuzzy scan + memoization (linking/core.py), preserving the
reference's fast-path/index-order/strict-``>`` semantics exactly.

Input batch: mention rows.  Output: deduplicated-within-batch triple rows
``subj, pred, obj, branch, label, score, start, end, text`` (global dedup is
a downstream groupby backstop — SURVEY.md §2.7 D3, §4.3).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import pyarrow as pa

from ..config import EMBED_DIM, LinkerConfig
from ..linking.core import LinkerCore, make_pred

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


def _resolve(ref_or_value):
    try:
        import ray

        if isinstance(ref_or_value, ray.ObjectRef):
            return ray.get(ref_or_value)
    except ImportError:
        pass
    return ref_or_value


def triples_to_table(rows) -> pa.Table:
    if not rows:
        return TRIPLE_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=TRIPLE_SCHEMA)


class Linker:
    def __init__(self, artifacts=None, cfg: LinkerConfig = LinkerConfig()):
        self.core = LinkerCore(_resolve(artifacts), cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return TRIPLE_SCHEMA.empty_table()
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        starts = batch.column("start").to_pylist()
        ends = batch.column("end").to_pylist()
        types = batch.column("type").to_pylist()
        # fixed_size_list<float32> → (n, dim) view, zero-copy
        vecs = (
            batch.column("vector")
            .combine_chunks()
            .flatten()
            .to_numpy(zero_copy_only=False)
            .reshape(n, EMBED_DIM)
        )

        best: Dict[Tuple[str, str, str], dict] = {}
        core = self.core
        for i in range(n):
            match = core.match_fast(texts[i], vecs[i])
            if match is None:
                continue
            match = core.post_process(types[i], match)
            if match is None:
                continue
            iri, label, score = match
            branch = core.branch(iri)
            row = {
                "subj": urls[i],
                "pred": make_pred(branch),
                "obj": iri,
                "branch": branch,
                "label": label,
                "score": score,
                "start": starts[i],
                "end": ends[i],
                "text": texts[i],
            }
            key = (row["subj"], row["pred"], row["obj"])
            cur = best.get(key)
            if (
                cur is None
                or row["score"] > cur["score"]
                or (row["score"] == cur["score"] and row["start"] < cur["start"])
            ):
                best[key] = row
        return triples_to_table(list(best.values()))
