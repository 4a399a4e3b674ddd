"""Bloom-filter semi-join pre-filter — the classic big-join optimization at
corpus scale: build a compact bitmap of the SMALL side's join keys, broadcast
it once (``ray.put``), and drop non-matching big-side rows BEFORE the join's
hash exchange.  A Bloom filter has no false negatives, so composing it with
the exact ``hash_join`` afterwards yields exactly the plain join's rows —
false positives just ride along into the join and fall out there.  What it
buys at 100 TB: the all-to-all exchange ships only the (pre-filtered) rows
that can possibly match, instead of the whole big table.

Distributed build: one remote task per small-side block produces a partial
bitmap; a binary tree of OR tasks reduces them in the object store (the
driver only routes refs).  Membership testing is fully vectorized numpy
(two multiplicative 64-bit hashes, double hashing, gather + bit test).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from .arrow_np import col_np

_C1 = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio multiplier
_C2 = np.uint64(0xC2B2AE3D27D4EB4F)  # murmur3 finalizer constant


def _positions(keys: np.ndarray, m_bits: int, n_hashes: int) -> np.ndarray:
    """[n_keys, n_hashes] bit positions via double hashing (Kirsch-
    Mitzenmacher): pos_i = (h1 + i·h2) mod m."""
    k = keys.astype(np.uint64)
    with np.errstate(over="ignore"):
        h1 = (k * _C1) >> np.uint64(17)
        h2 = ((k * _C2) >> np.uint64(15)) | np.uint64(1)
        i = np.arange(n_hashes, dtype=np.uint64)[None, :]
        return ((h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


@ray.remote
def _bloom_block(tbl: pa.Table, key: str, m_bits: int, n_hashes: int) -> np.ndarray:
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    if tbl.num_rows:
        if not pa.types.is_integer(tbl.schema.field(key).type):
            raise TypeError(
                f"build_bloom: key column {key!r} must be integer-typed "
                f"(got {tbl.schema.field(key).type}); hash string keys to "
                f"int64 first"
            )
        pos = _positions(col_np(tbl, key), m_bits, n_hashes).ravel()
        np.bitwise_or.at(words, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64))
    return words


@ray.remote
def _bloom_or(*parts: np.ndarray) -> np.ndarray:
    out = parts[0].copy()
    for p in parts[1:]:
        out |= p
    return out


def build_bloom(
    ds: rd.Dataset, key: str, m_bits: int = 1 << 22, n_hashes: int = 4
):
    """Object-store ref to the OR-reduced bitmap of ``ds[key]``.  m_bits
    must be a multiple of 64; size it ~10 bits/key for ~1% false positives
    (false positives only cost exchange bytes, never correctness)."""
    assert m_bits % 64 == 0
    refs = ds.select_columns([key]).to_arrow_refs()
    if not refs:  # zero-block small side: all-zero bitmap (semi-filter
        # then correctly drops every big-side row for an inner join)
        return ray.put(np.zeros(m_bits // 64, dtype=np.uint64))
    parts: List = [_bloom_block.remote(r, key, m_bits, n_hashes) for r in refs]
    while len(parts) > 1:
        nxt = [_bloom_or.remote(*parts[i : i + 8]) for i in range(0, len(parts), 8)]
        parts = nxt
    return parts[0]


def bloom_semi_filter(
    ds: rd.Dataset, bloom_ref, key: str, m_bits: int = 1 << 22, n_hashes: int = 4
) -> rd.Dataset:
    """Keep rows whose key MIGHT be in the filter (no false negatives)."""

    def keep(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        words = ray.get(bloom_ref)
        pos = _positions(col_np(batch, key), m_bits, n_hashes)
        bits = (words[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)
        return batch.filter(pa.array(bits.all(axis=1)))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def bloom_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    right_on: Optional[str] = None,
    how: str = "inner",
    m_bits: int = 1 << 22,
    n_hashes: int = 4,
    num_partitions: Optional[int] = None,
) -> rd.Dataset:
    """``hash_join(left, right)`` with a Bloom pre-filter on the LEFT (big)
    side built from the RIGHT (small) side's keys: exactly the plain join's
    rows, but only possibly-matching left rows enter the exchange.  Use when
    the right side is much smaller and left join keys are sparse in it."""
    from .join import hash_join

    right_key = right_on or on
    bloom_ref = build_bloom(right, right_key, m_bits=m_bits, n_hashes=n_hashes)
    pruned = bloom_semi_filter(left, bloom_ref, on, m_bits=m_bits, n_hashes=n_hashes)
    return hash_join(pruned, right, on=on, right_on=right_on, how=how,
                     num_partitions=num_partitions)
