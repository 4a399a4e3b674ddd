"""Unigram language-model scoring — the CCNet-style perplexity quality
signal (Wenzek et al., arXiv:1911.00359 filter web text by LM perplexity):
score each document by its negative log-likelihood under a unigram LM fit
on the corpus itself.  High-NLL docs are out-of-distribution (gibberish,
boilerplate soup, wrong language); curation gates on it.

Two passes:
1. global token counts — per-block Arrow group_by partials folded through
   the bounded coordinator merge (vocabulary-bounded; for an open 10^12-doc
   vocabulary swap the fold for the hash-partitioned exchange used by
   distinct_tokens_exact);
2. broadcast the per-token quantized information content
   ``q(t) = floor(1e5 · ln(N / tf_t))`` once, then a map-only pass sums it
   per document.

Quantize-then-sum is what makes the driver's exact value oracle possible:
per-token q values are INTEGERS agreed bit-for-bit with DuckDB's
``ln`` (validated over every sf's vocabulary), and integer sums are
order-independent — summing raw floats would pick up engine- and
partitioning-dependent rounding.  (Residual risk: a token whose
1e5·ln(N/c) lands within one float ulp of an integer could floor
differently across libms; probability ~1e-7 per vocabulary and checked
empirically for the contract data.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from .combine import combine_partials
from .dedup import exact_tokens
from .heavy_hitters import _block_token_counts


def unigram_nll(ds: rd.Dataset) -> rd.Dataset:
    """(doc_id, n_tokens, nll_e5_sum) per document; see module docstring."""

    def partial(batch: pa.Table) -> pa.Table:
        return _block_token_counts(batch).rename_columns(["token", "p_n"])

    counts = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["token"],
        aggs=[("p_n", "sum", "c")],
        schema=pa.schema([("token", pa.string()), ("p_n", pa.int64())]),
    )
    c = counts.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
    n_total = float(c.sum())
    q = np.floor(100_000.0 * np.log(n_total / c)).astype(np.int64) if len(c) else c
    q_map = dict(zip(counts.column("token").to_pylist(), q.tolist()))
    q_ref = ray.put(q_map)

    def score(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        ids = batch.column("doc_id")
        n_toks, sums = [], []
        for t in batch.column("text").to_pylist():
            toks = exact_tokens(t)
            n_toks.append(len(toks))
            sums.append(sum(qm[tok] for tok in toks))
        return pa.table(
            {
                "doc_id": ids,
                "n_tokens": pa.array(n_toks, pa.int64()),
                "nll_e5_sum": pa.array(sums, pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
