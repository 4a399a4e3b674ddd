"""Corpus-curation pipeline: near-dup removal → quality filter → stratified
sample — the canonical LLM-training-data flow, composed from this engine's
operators with every stage streaming:

1. exact n-gram Jaccard near-dup pairs → connected components → drop every
   non-canonical cluster member (ops/dedup.py + ops/graph.py; the drop set
   is output-scale and broadcast once);
2. vectorized quality gate (min chars / min whitespace tokens — Arrow
   kernels, map-only, same formulas as ops/text_ops.quality_scores);
3. deterministic k-per-language stratified sample (ops/topk.py — one hash
   exchange over the survivors).

End-to-end SQL-expressible, so the whole composition has a value-level
DuckDB oracle (__ray_entry__.curation_pipeline).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..ops.dedup import ngram_jaccard_pairs
from ..ops.graph import keep_canonical
from ..ops.text_ops import _tokens_column
from ..ops.topk import stratified_sample


def quality_gate(
    ds: rd.Dataset, min_chars: int = 100, min_tokens: int = 20
) -> rd.Dataset:
    """Keep docs with ≥ min_chars characters AND ≥ min_tokens whitespace
    tokens (SQL parity: length(text) and the shared _NTOK expression)."""

    def keep(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text"), "")
        split, trimmed = _tokens_column(text)
        n_tok = pc.list_value_length(split).cast(pa.int64())
        n_tok = pc.if_else(pc.equal(trimmed, ""), pa.scalar(0, pa.int64()), n_tok)
        n_chars = pc.utf8_length(text)
        mask = pc.and_(
            pc.greater_equal(n_chars, pa.scalar(min_chars)),
            pc.greater_equal(n_tok, pa.scalar(min_tokens, pa.int64())),
        )
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def curate(
    docs_ds: rd.Dataset,
    jaccard_threshold: float = 0.5,
    min_chars: int = 100,
    min_tokens: int = 20,
    sample_per_lang: int = 25,
    seed: int = 42,
    max_shingle_freq=None,
) -> rd.Dataset:
    """documents(doc_id, text, lang) → curated (doc_id, lang) sample.
    ``max_shingle_freq`` passes through to the pair join — set an int (or
    "auto" for the sample-estimated cap) on boilerplate-heavy corpora
    (ops/dedup._pair_counts / auto_shingle_cap)."""
    pairs = ngram_jaccard_pairs(
        docs_ds, threshold=jaccard_threshold, max_shingle_freq=max_shingle_freq
    )
    kept = keep_canonical(docs_ds, pairs)
    good = quality_gate(kept, min_chars=min_chars, min_tokens=min_tokens)
    return stratified_sample(good, stratum="lang", k=sample_per_lang, seed=seed)
