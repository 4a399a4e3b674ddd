"""Distinct-count operators over the corpus token stream.

- ``distinct_tokens_exact`` — exact |vocabulary|: each block emits its
  DISTINCT tokens (in-block dedup collapses the heavy duplication before
  anything moves), ONE hash exchange co-locates equal tokens, each
  partition counts its distinct values, and the driver sums P counters.
  Exchange volume is bounded by Σ per-block distinct tokens — far below
  the token stream.  SQL parity: ``count(DISTINCT token)``.

- ``distinct_tokens_hll`` — HyperLogLog (Flajolet et al. 2007) estimate:
  the mergeable-sketch path for 10^12-row streams where even the distinct
  exchange is too much.  Each block folds its tokens into 2^p max-rank
  registers; register partials merge by elementwise MAX — expressed here
  as rows ``(register, rho)`` through the engine's own coordinator merge
  (``combine_partials`` with a max agg: bounded at 2^p groups), so the
  sketch rides the same machinery as every other bounded aggregate.
  Standard bias/small-range corrections; ~1.04/√2^p relative error
  (p=12 → ~1.6%).  No SQL value oracle (estimates are
  implementation-specific); pytest pins the error bound vs the exact op.
"""

from __future__ import annotations

import zlib
from typing import Optional

import numpy as np
import pyarrow as pa

import ray.data as rd

from .combine import combine_partials
from .dedup import exact_tokens
from .partitioning import shuffle_partitions


def _block_distinct_tokens(batch: pa.Table) -> pa.Table:
    toks: set = set()
    for t in batch.column("text").to_pylist():
        toks.update(exact_tokens(t))
    return pa.table({"token": pa.array(sorted(toks), pa.string())})


def distinct_tokens_exact(
    ds: rd.Dataset, num_partitions: Optional[int] = None
) -> rd.Dataset:
    """One row: (n_distinct_tokens) — exact corpus vocabulary size."""
    P = num_partitions or shuffle_partitions(ds)

    def add_part(batch: pa.Table) -> pa.Table:
        parts = [
            zlib.crc32(t.encode("utf-8")) % P
            for t in batch.column("token").to_pylist()
        ]
        return batch.append_column("part", pa.array(parts, pa.int32()))

    def count_distinct(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = len(pc.unique(group.column("token")))
        return pa.table({"p_n": pa.array([n], pa.int64())})

    partials = (
        ds.map_batches(_block_distinct_tokens, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(count_distinct, batch_format="pyarrow")
    )
    final = combine_partials(
        partials, keys=[], aggs=[("p_n", "sum", "n_distinct_tokens")],
        schema=pa.schema([("p_n", pa.int64())]),
    )
    return rd.from_arrow(final)


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

_HLL_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _hll_registers(tokens, p: int) -> np.ndarray:
    """Max-rank register vector (length 2^p) of a token iterable."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.int64)
    if not tokens:
        return regs
    h = np.fromiter(
        ((zlib.crc32(t.encode("utf-8")) << 32) | zlib.adler32(t.encode("utf-8"))
         for t in tokens),
        dtype=np.uint64,
        count=len(tokens),
    )
    with np.errstate(over="ignore"):
        h = h * _HLL_GOLD  # finalize: crc/adler alone are not well mixed
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # remaining 64-p bits, left-aligned
    # rho = 1 + number of leading zeros of `rest` within its 64-p bits
    # exact vectorized leading-zero count (float log2 on uint64 is unsafe —
    # values above 2^53 can round a power-of-two boundary the wrong way):
    # shift left until the top bit sets; a nonzero `rest` always has a set
    # bit at position >= p, so the loop ends well before 64-p iterations
    lz = np.full(len(h), 64 - p, dtype=np.int64)
    nz = rest != 0
    if nz.any():
        r = rest[nz]
        lz_nz = np.zeros(r.shape, dtype=np.int64)
        top = np.uint64(1) << np.uint64(63)
        cur = r.copy()
        remaining = np.ones(r.shape, dtype=bool)
        for _ in range(64 - p):
            remaining &= (cur & top) == 0
            if not remaining.any():
                break
            lz_nz[remaining] += 1
            cur = cur << np.uint64(1)
        lz[nz] = lz_nz
    rho = np.minimum(lz + 1, 64 - p + 1)
    np.maximum.at(regs, bucket, rho)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with small-range (linear counting) and large-
    range corrections."""
    m = regs.shape[0]
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int((regs == 0).sum())
        if zeros:
            est = m * np.log(m / zeros)
    elif est > (1 << 32) / 30.0:
        est = -(1 << 32) * np.log(1.0 - est / (1 << 32))
    return float(est)


def distinct_tokens_hll(ds: rd.Dataset, p: int = 12) -> rd.Dataset:
    """One row: (n_distinct_tokens_est) — HLL estimate of vocabulary size.
    Map-only over the corpus; partials merge through the engine's bounded
    coordinator fold (2^p register rows, max agg)."""
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        toks: set = set()
        for t in batch.column("text").to_pylist():
            toks.update(exact_tokens(t))
        regs = _hll_registers(sorted(toks), p)
        nz = np.nonzero(regs)[0]
        return pa.table(
            {
                "register": pa.array(nz, pa.int64()),
                "rho": pa.array(regs[nz], pa.int64()),
            }
        )

    folded = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["register"],
        aggs=[("rho", "max", "rho")],
        schema=pa.schema([("register", pa.int64()), ("rho", pa.int64())]),
    )
    regs = np.zeros(m, dtype=np.int64)
    if folded.num_rows:
        idx = folded.column("register").to_numpy(zero_copy_only=False)
        rho = folded.column("rho").to_numpy(zero_copy_only=False)
        regs[idx] = rho
    est = int(round(hll_estimate(regs)))
    return rd.from_arrow(
        pa.table({"n_distinct_tokens_est": pa.array([est], pa.int64())})
    )
