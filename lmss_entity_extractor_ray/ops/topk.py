"""Grouped top-k and stratified sampling.

``group_topk`` — top-k rows per group by a value column (the SQL
``row_number() OVER (PARTITION BY key ORDER BY value) <= k`` pattern Ray
Data has no primitive for).  Two-phase, one hash exchange:

1. map-side partial: every block sorts once and keeps ≤ k rows PER KEY
   (vectorized run detection — no per-group Python), so the shuffle ships
   at most k × |keys| rows per block, never the input;
2. per-partition final: identical sort+run pass over the partials, with
   the rank emitted.  A key's partials all land in one partition, so the
   result is exact.

``stratified_sample`` — deterministic fixed-k-per-stratum sampling: tag
rows with the same multiplicative hash as ops/sampling (reproducible
across runs, block layouts and parallelism) and keep each stratum's
bottom-k tags.  Same two-phase shape; SQL-expressible via row_number over
the identical tag expression.
"""

from __future__ import annotations

import zlib
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .arrow_np import col_np
from .partitioning import shuffle_partitions
from .sampling import _tag

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _key_part(tbl: pa.Table, key: str, P: int) -> np.ndarray:
    col = tbl.column(key)
    if pa.types.is_integer(col.type):
        with np.errstate(over="ignore"):
            return ((col_np(tbl, key, np.uint64) * _GOLD) % np.uint64(P)).astype(
                np.int32
            )
    return np.fromiter(
        (zlib.crc32(s.encode("utf-8")) % P for s in col.to_pylist()),
        dtype=np.int32,
        count=tbl.num_rows,
    )


def _run_positions(t: pa.Table, key: str) -> np.ndarray:
    """Position of each row within its key run (t already key-sorted)."""
    n = t.num_rows
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    col = t.column(key).combine_chunks()
    same = np.asarray(pc.equal(col.slice(1, n - 1), col.slice(0, n - 1)))
    starts = np.concatenate(([0], np.nonzero(~same)[0] + 1))
    run_id = np.zeros(n, dtype=np.int64)
    run_id[starts] = 1
    run_id = np.cumsum(run_id) - 1
    return np.arange(n) - starts[run_id]


def _block_topk(
    t: pa.Table, key: str, value: str, id_col: str, k: int, descending: bool
) -> pa.Table:
    if t.num_rows == 0:
        return t
    order = pc.sort_indices(
        t,
        sort_keys=[
            (key, "ascending"),
            (value, "descending" if descending else "ascending"),
            (id_col, "ascending"),
        ],
    )
    t = t.take(order)
    pos = _run_positions(t, key)
    out = t.filter(pa.array(pos < k))
    return out


def group_topk(
    ds: rd.Dataset,
    key: str,
    value: str,
    id_col: str,
    k: int,
    descending: bool = True,
    num_partitions: Optional[int] = None,
) -> rd.Dataset:
    """Top-k rows per ``key`` ordered by ``value`` (ties → lowest ``id_col``),
    with the 1-based rank as ``rn``."""
    P = num_partitions or shuffle_partitions(ds)
    cols = ds.select_columns([key, value, id_col])

    def partial(batch: pa.Table) -> pa.Table:
        out = _block_topk(batch, key, value, id_col, k, descending)
        return out.append_column("part", pa.array(_key_part(out, key, P), pa.int32()))

    def final(group: pa.Table) -> pa.Table:
        t = group.drop_columns(["part"])
        if t.num_rows == 0:
            return t.append_column("rn", pa.array([], pa.int64()))
        order = pc.sort_indices(
            t,
            sort_keys=[
                (key, "ascending"),
                (value, "descending" if descending else "ascending"),
                (id_col, "ascending"),
            ],
        )
        t = t.take(order)
        pos = _run_positions(t, key)
        t = t.append_column("rn", pa.array(pos + 1, pa.int64()))
        return t.filter(pa.array(pos < k))

    return (
        cols.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(final, batch_format="pyarrow")
    )


def stratified_sample(
    ds: rd.Dataset,
    stratum: str,
    k: int,
    seed: int = 42,
    key: str = "doc_id",
    num_partitions: Optional[int] = None,
) -> rd.Dataset:
    """Deterministic k-per-stratum sample: each stratum keeps the k rows
    with the smallest ``((key + seed) * 2654435761) % 2^32`` tag (ties →
    lowest key).  Reproducible across runs and partitionings; SQL parity via
    ``row_number() OVER (PARTITION BY stratum ORDER BY tag, key) <= k``."""

    def add_tag(batch: pa.Table) -> pa.Table:
        tags = _tag(col_np(batch, key, np.uint64), seed).astype(np.int64)
        return batch.append_column("_tag", pa.array(tags, pa.int64()))

    tagged = ds.select_columns([key, stratum]).map_batches(
        add_tag, batch_format="pyarrow"
    )
    out = group_topk(
        tagged, stratum, "_tag", key, k,
        descending=False, num_partitions=num_partitions,
    )
    return out.select_columns([key, stratum])
