"""Document chunking — split each document into fixed-token-count chunks.

The 1:N flat-map of LLM training-data prep (context-window packing's first
half): every doc becomes ``ceil(n_tokens / chunk_tokens)`` rows
``(doc_id, chunk_id, chunk, n_tokens)``.  Map-only — no shuffle, order
within a doc is positional, chunk boundaries are deterministic — so it
streams at any scale.

Vectorized by CHUNK INDEX, not by row: chunk c of every doc in the batch
is one Arrow ``list_slice`` + ``binary_join`` over the docs long enough to
have a c-th chunk (docs in web corpora are a few chunks long, so the loop
runs a handful of times per batch regardless of batch size).

SQL parity (tokenize = trim + ``\\s+`` split, the engine-wide convention):
DuckDB ``generate_series`` over chunk indices + inclusive list slicing —
the oracle compares chunk text verbatim.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .text_ops import _tokens_column


def chunk_batch(batch: pa.Table, chunk_tokens: int) -> pa.Table:
    split, trimmed = _tokens_column(batch.column("text"))
    n_tok = pc.list_value_length(split).cast(pa.int64())
    n_tok = pc.if_else(pc.equal(trimmed, ""), pa.scalar(0, pa.int64()), n_tok)
    lens = n_tok.to_numpy(zero_copy_only=False)
    ids = batch.column("doc_id")
    max_chunks = int((lens.max() + chunk_tokens - 1) // chunk_tokens) if len(lens) else 0
    out = []
    for c in range(max_chunks):
        lo = c * chunk_tokens
        mask = lens > lo
        if not mask.any():
            break
        sel = pa.array(mask)
        sub_split = pc.filter(split, sel)
        chunk = pc.binary_join(
            pc.list_slice(sub_split, lo, lo + chunk_tokens).cast(pa.list_(pa.string())),
            " ",
        )
        sub_lens = lens[mask]
        out.append(
            pa.table(
                {
                    "doc_id": pc.filter(ids, sel),
                    "chunk_id": pa.array(np.full(int(mask.sum()), c, dtype=np.int64)),
                    "chunk": chunk,
                    "n_tokens": pa.array(
                        np.minimum(sub_lens - lo, chunk_tokens), pa.int64()
                    ),
                }
            )
        )
    if not out:
        return pa.schema(
            [("doc_id", pa.int64()), ("chunk_id", pa.int64()),
             ("chunk", pa.string()), ("n_tokens", pa.int64())]
        ).empty_table()
    return pa.concat_tables(out)


def chunk_documents(ds: rd.Dataset, chunk_tokens: int = 64) -> rd.Dataset:
    import functools

    return ds.map_batches(
        functools.partial(chunk_batch, chunk_tokens=chunk_tokens),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
