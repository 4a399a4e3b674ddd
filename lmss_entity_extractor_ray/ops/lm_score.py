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


def nll_buckets(ds: rd.Dataset, n_buckets: int = 3) -> rd.Dataset:
    """CCNet's head/middle/tail split (Wenzek et al. 2020 §4.4: partition
    the corpus into equal thirds by LM perplexity; training recipes then
    sample the buckets at different rates): (doc_id, nll_mean_e5, tile
    [, bucket]) where ``tile`` is the exact SQL ``ntile(n_buckets)`` over
    ascending per-doc mean NLL (integer: ``nll_e5_sum // n_tokens``) with
    doc_id tie-break, and ``bucket`` names the thirds when n_buckets == 3
    (tile 1 = lowest perplexity = head).

    Distributed shape: the unigram-NLL two-pass scorer, then ONE global
    range sort + the O(blocks) ordered prefix scan (ops/prefix.py) for the
    exact rank — no driver-side doc table, layout-independent, and
    bit-equal to the window-function oracle."""
    from .arrow_np import col_np
    from .prefix import ordered_cumsum

    scored = unigram_nll(ds)

    def mean_of(batch: pa.Table) -> pa.Table:
        n = col_np(batch, "n_tokens")
        s = col_np(batch, "nll_e5_sum")
        mean = np.where(n > 0, s // np.maximum(n, 1), 0).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "nll_mean_e5": pa.array(mean, pa.int64()),
                "one": pa.array(np.ones(len(mean), dtype=np.int64)),
            }
        )

    ranked = ordered_cumsum(
        scored.map_batches(mean_of, batch_format="pyarrow"),
        ["nll_mean_e5", "doc_id"],
        "one",
        out_col="rank0",
    )
    n_total = ranked.count()  # blocks are materialized refs — metadata count
    B = int(n_buckets)
    size, rem = divmod(n_total, B)
    labels = np.array(["head", "middle", "tail"])

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            cols = {
                "doc_id": batch.column("doc_id"),
                "nll_mean_e5": pa.array([], pa.int64()),
                "tile": pa.array([], pa.int64()),
            }
            if B == 3:
                cols["bucket"] = pa.array([], pa.string())
            return pa.table(cols)
        r = col_np(batch, "rank0")
        if size == 0:  # fewer docs than buckets: row r is its own tile
            tile = (r + 1).astype(np.int64)
        else:
            big_span = rem * (size + 1)  # first `rem` tiles hold one extra
            tile = np.where(
                r < big_span, r // (size + 1), rem + (r - big_span) // size
            ).astype(np.int64) + 1
        cols = {
            "doc_id": batch.column("doc_id"),
            "nll_mean_e5": batch.column("nll_mean_e5"),
            "tile": pa.array(tile, pa.int64()),
        }
        if B == 3:
            cols["bucket"] = pa.array(labels[tile - 1], pa.string())
        return pa.table(cols)

    return ranked.map_batches(assign, batch_format="pyarrow")
