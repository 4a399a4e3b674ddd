"""Global ordered prefix-sum and sequence packing.

Ray Data has no cumulative-aggregate primitive; this is the standard
two-pass distributed scan:

1. global range sort on the order keys (Ray's sort — ordered partitions);
2. per-block partial sums (one metadata-sized task per block), a driver
   cumsum over the block totals (O(blocks)), and a per-block offset add.

The result is exact and layout-independent: it equals the sequential scan
in sort order regardless of parallelism, which also makes it
SQL-expressible (``SUM(v) OVER (ORDER BY ...)``) for the driver oracle.

``pack_sequences`` builds on it: chunk documents (ops/chunking.py), scan
token counts in (doc_id, chunk_id) order, and assign every chunk to
training sequence ``floor(tokens_before / seq_tokens)`` — the greedy
concatenation packing used for LLM pretraining, deterministic across runs
and cluster sizes.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from .arrow_np import col_np


@ray.remote
def _block_meta(t: pa.Table, value_col: str, sort_keys: List[str]):
    """(total, first_key_tuple, last_key_tuple) — the scan offsets plus the
    evidence that block order == sort order."""
    if t.num_rows == 0:
        return 0, None, None
    first = tuple(t.column(k)[0].as_py() for k in sort_keys)
    last = tuple(t.column(k)[t.num_rows - 1].as_py() for k in sort_keys)
    return int(col_np(t, value_col).sum()), first, last


@ray.remote
def _add_cum(t: pa.Table, value_col: str, out_col: str, offset: int) -> pa.Table:
    if t.num_rows == 0:
        return t.append_column(out_col, pa.array([], pa.int64()))
    v = col_np(t, value_col)
    cum_before = offset + np.concatenate(([0], np.cumsum(v)[:-1]))
    return t.append_column(out_col, pa.array(cum_before, pa.int64()))


def ordered_cumsum(
    ds: rd.Dataset,
    sort_keys: Sequence[str],
    value_col: str,
    out_col: str = "cum_before",
) -> rd.Dataset:
    """Add ``out_col`` = sum of ``value_col`` over all rows strictly BEFORE
    this row in ``sort_keys`` order (ties broken by the full key tuple —
    pass enough keys to make the order total, or the scan is only
    deterministic up to ties)."""
    sorted_ds = ds.sort(list(sort_keys)).materialize()
    refs = sorted_ds.to_arrow_refs()  # ordered partitions, in order
    metas = ray.get(
        [_block_meta.remote(r, value_col, list(sort_keys)) for r in refs]
    )
    totals = [m[0] for m in metas]
    # the scan is only correct if the materialized sort's blocks really are
    # range-ordered — verify the boundary invariant instead of assuming it
    # (one tuple per block; cost is O(blocks))
    prev_last = None
    for total, first, last in metas:
        if first is None:
            continue
        if prev_last is not None and first < prev_last:
            raise AssertionError(
                "ordered_cumsum: sorted Dataset blocks are not in key order "
                f"(block starts at {first} before previous block end {prev_last})"
            )
        prev_last = last
    offsets = np.concatenate(([0], np.cumsum(totals)[:-1]))
    out = [
        _add_cum.remote(r, value_col, out_col, int(offsets[i]))
        for i, r in enumerate(refs)
    ]
    return rd.from_arrow_refs(out)


def pack_sequences(
    docs_ds: rd.Dataset, seq_tokens: int = 256, chunk_tokens: int = 64
) -> rd.Dataset:
    """Greedy concatenation packing: chunk every doc, scan chunks in
    (doc_id, chunk_id) order, and assign chunk → sequence
    ``floor(tokens_before / seq_tokens)``.  Output one row per sequence:
    ``(seq_id, n_chunks, n_tokens)`` — deterministic and layout-independent
    (the scan equals the sequential order), so the DuckDB window-function
    oracle compares exactly."""
    from ray.data.aggregate import Count, Sum

    from .chunking import chunk_documents

    chunks = chunk_documents(docs_ds, chunk_tokens).select_columns(
        ["doc_id", "chunk_id", "n_tokens"]
    )
    scanned = ordered_cumsum(chunks, ["doc_id", "chunk_id"], "n_tokens")

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"seq_id": pa.array([], pa.int64()),
                 "n_tokens": pa.array([], pa.int64())}
            )
        seq = col_np(batch, "cum_before") // seq_tokens
        return pa.table(
            {"seq_id": pa.array(seq, pa.int64()), "n_tokens": batch.column("n_tokens")}
        )

    return (
        scanned.map_batches(assign, batch_format="pyarrow")
        .groupby("seq_id")
        .aggregate(Count(alias_name="n_chunks"), Sum("n_tokens", alias_name="sum_tokens"))
    )
