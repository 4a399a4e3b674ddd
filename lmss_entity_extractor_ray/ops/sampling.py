"""Sampling operators (absent from the reference — SURVEY.md §2.6 notes no
sampling exists there — but indispensable for training-data pipelines).

- ``hash_sample`` — deterministic multiplicative-hash sampling on a key
  column.  THE sampling primitive at 100 TB: reproducible across runs and
  partitionings, needs no global state or shuffle, and composes with resume
  (a re-run samples the same rows).  Knuth's 2654435761 multiplier mod 2^32
  is exactly computable in both numpy and ANSI SQL, so the driver's DuckDB
  oracle matches bit-for-bit.
- ``reservoir_sample`` — classic per-block reservoirs merged on the driver
  (weighted by block row counts via a seeded PRNG); exact uniform k-sample
  in one streaming pass, for when a FIXED-size sample is required.
"""

from __future__ import annotations

import random
from typing import List

import numpy as np
import pyarrow as pa

import ray.data as rd

_KNUTH = 2654435761
_MOD = 1 << 32


def hash_sample(ds: rd.Dataset, key: str, fraction: float, salt: int = 0) -> rd.Dataset:
    """Keep rows where ((key + salt) * 2654435761) mod 2^32 < fraction * 2^32.

    SQL parity: ``WHERE ((key + salt) * 2654435761) % 4294967296 <
    CAST(fraction * 4294967296 AS BIGINT)``."""
    threshold = int(fraction * _MOD)

    def keep(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch.column(key).to_pylist(), dtype=np.uint64)
        h = ((k + np.uint64(salt)) * np.uint64(_KNUTH)) % np.uint64(_MOD)
        return batch.filter(pa.array(h < threshold))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def reservoir_sample(ds: rd.Dataset, k: int, seed: int = 42) -> pa.Table:
    """Exact uniform k-sample in one streaming pass: per-block reservoirs
    (distributed) merged on the driver with block-size weighting.

    The merge holds k rows per block on the driver — fine for any practical
    k; the corpus itself is never collected."""

    def block_reservoir(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n <= k:
            chosen = list(range(n))
        else:
            rng = random.Random((seed << 20) ^ n ^ batch.num_columns)
            chosen = rng.sample(range(n), k)
        sub = batch.take(pa.array(sorted(chosen), pa.int64()))
        return sub.append_column("_block_rows", pa.array([n] * len(chosen), pa.int64()))

    parts: List[pa.Table] = list(
        ds.map_batches(block_reservoir, batch_format="pyarrow", batch_size=None).iter_batches(
            batch_format="pyarrow"
        )
    )
    if not parts:
        return pa.table({})
    merged = pa.concat_tables(parts)
    weights = merged.column("_block_rows").to_pylist()
    merged = merged.drop_columns(["_block_rows"])
    # weighted reservoir over the union: each candidate row stands for
    # block_rows / k rows; draw k without replacement proportional to weight
    rng = random.Random(seed)
    keyed = sorted(
        range(merged.num_rows),
        key=lambda i: rng.random() ** (1.0 / max(1e-9, weights[i])),
        reverse=True,
    )[: min(k, merged.num_rows)]
    return merged.take(pa.array(sorted(keyed), pa.int64()))
