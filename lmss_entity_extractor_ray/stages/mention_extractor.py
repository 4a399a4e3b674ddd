"""MentionExtractor — the stateful actor-pool extraction stage
(SURVEY.md §2.3 A1/A2, §7.1 M3).

The reference loads a spaCy pipeline + sentence-transformer once per process
and reuses them per request (app/entity_extraction.py:150-154); here the
equivalent state (Aho-Corasick automaton over the broadcast ontology surface
forms, compiled chunkers, embedding cache) is built ONCE per actor in
``__init__`` and reused for every batch in ``__call__``:

    ds.map_batches(MentionExtractor, fn_constructor_kwargs={...},
                   batch_format="pyarrow", batch_size=B, concurrency=(m, n))

Input batch: (url, text).  Output: one row per merged mention —
``url, text, start, end, type, source, context, vector`` with ``vector`` a
``fixed_size_list<float32>[dim]`` (zero-copy to numpy in the linker).
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa

from ..config import EMBED_DIM, ExtractorConfig
from ..extraction.extractor import DocumentExtractor

MENTION_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("text", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("type", pa.string()),
        ("source", pa.string()),
        ("context", pa.string()),
        ("vector", pa.list_(pa.float32(), EMBED_DIM)),
    ]
)


def _resolve(ref_or_value):
    """Accept a plain value or a ``ray.put`` ObjectRef (broadcast pattern:
    put once on the driver, get once per actor)."""
    try:
        import ray

        if isinstance(ref_or_value, ray.ObjectRef):
            return ray.get(ref_or_value)
    except ImportError:
        pass
    return ref_or_value


class MentionExtractor:
    def __init__(self, surface_forms=None, cfg: ExtractorConfig = ExtractorConfig()):
        self.core = DocumentExtractor(_resolve(surface_forms), cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()

        out_url: List[str] = []
        out_text: List[str] = []
        out_start: List[int] = []
        out_end: List[int] = []
        out_type: List[str] = []
        out_source: List[str] = []
        out_context: List[str] = []
        vectors: List[np.ndarray] = []

        for url, text in zip(urls, texts):
            for m in self.core.extract(text if text is not None else ""):
                out_url.append(url)
                out_text.append(m["text"])
                out_start.append(m["start"])
                out_end.append(m["end"])
                out_type.append(m["type"])
                out_source.append(m["source"])
                out_context.append(m["context"])
                vectors.append(m["vector"])

        if vectors:
            flat = np.concatenate(vectors).astype(np.float32, copy=False)
        else:
            flat = np.zeros(0, dtype=np.float32)
        vec_arr = pa.FixedSizeListArray.from_arrays(pa.array(flat, pa.float32()), EMBED_DIM)

        return pa.table(
            {
                "url": pa.array(out_url, pa.string()),
                "text": pa.array(out_text, pa.string()),
                "start": pa.array(out_start, pa.int32()),
                "end": pa.array(out_end, pa.int32()),
                "type": pa.array(out_type, pa.string()),
                "source": pa.array(out_source, pa.string()),
                "context": pa.array(out_context, pa.string()),
                "vector": vec_arr,
            }
        )
