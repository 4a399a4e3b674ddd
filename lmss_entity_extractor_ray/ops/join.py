"""General large-×-large hash equi-join.

Ray Data 2.49's built-in join operator spends most of its time in
per-partition aggregator actors (measured 10-25× slower than a manual
exchange at ≤ millions of rows — see NOTES_r2.md), and the broadcast
pattern used elsewhere in this repo only fits bounded small sides.  This
operator is the missing general case: BOTH sides are hash-partitioned on
the key with the SAME partition function, and each partition pair is
joined by Arrow's C++ hash join (``pa.Table.join``) in one Ray task.

Shape: one scatter pass per side (``num_returns=P`` keeps every shard an
object-store ref — the driver only routes refs), then P independent join
tasks.  No task ever holds more than its two partition shards.
Partitioning assumption: one partition pair fits a worker — size P with
the shared data-size-aware helper (ops/partitioning.py); skewed keys
should be pre-aggregated or salted by the caller (a single hot key lands
in one partition by construction).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from .arrow_np import col_np
from .partitioning import shuffle_partitions

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _key_hash(tbl: pa.Table, key: str) -> np.ndarray:
    col = tbl.column(key)
    if pa.types.is_integer(col.type):
        return col_np(tbl, key, np.uint64)
    # string keys: vectorized 64-bit hash (routing only — the acero join
    # below compares the true key values, so collisions cost nothing)
    from .partitioning import string_hash64

    return string_hash64(col)


def _scatter_shards(tbl: pa.Table, keys: Sequence[str], P: int) -> List[pa.Table]:
    if tbl.num_rows == 0:
        return [tbl] * P
    with np.errstate(over="ignore"):
        h = np.zeros(tbl.num_rows, dtype=np.uint64)
        for key in keys:
            # mix every key column; co-partitioning only needs the same
            # function on both sides
            h = (h ^ _key_hash(tbl, key)) * _GOLD
        part = (h % np.uint64(P)).astype(np.int64)
    order = np.argsort(part, kind="stable")
    t = tbl.take(pa.array(order, pa.int64()))
    bounds = np.searchsorted(part[order], np.arange(P + 1))
    return [t.slice(bounds[p], bounds[p + 1] - bounds[p]) for p in range(P)]


@ray.remote
def _scatter_task(tbl: pa.Table, keys: Sequence[str], P: int) -> List[pa.Table]:
    return _scatter_shards(tbl, keys, P)


@ray.remote
def _join_task(
    n_left: int,
    left_keys: Sequence[str],
    right_keys: Sequence[str],
    join_type: str,
    right_suffix: str,
    *shards: pa.Table,
) -> pa.Table:
    left = pa.concat_tables(shards[:n_left], promote_options="default")
    right = pa.concat_tables(shards[n_left:], promote_options="default")
    return left.combine_chunks().join(
        right.combine_chunks(),
        keys=list(left_keys),
        right_keys=list(right_keys),
        join_type=join_type,
        right_suffix=right_suffix,
    )


def hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: Union[str, Sequence[str]],
    right_on: Optional[Union[str, Sequence[str]]] = None,
    how: str = "inner",
    right_suffix: str = "_r",
    num_partitions: Optional[int] = None,
) -> rd.Dataset:
    """Join two Datasets on one or more integer key columns.

    ``how`` follows Arrow's ``join_type`` names ("inner", "left outer",
    "right outer", "full outer", "left semi", "left anti")."""
    lk = [on] if isinstance(on, str) else list(on)
    rk = lk if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on)
    )
    P = max(
        2,
        num_partitions
        or max(shuffle_partitions(left), shuffle_partitions(right)),
    )
    lrefs = left.to_arrow_refs()
    rrefs = right.to_arrow_refs()
    lshards = [_scatter_task.options(num_returns=P).remote(r, lk, P) for r in lrefs]
    rshards = [_scatter_task.options(num_returns=P).remote(r, rk, P) for r in rrefs]
    out = [
        _join_task.remote(
            len(lshards),
            lk,
            rk,
            how,
            right_suffix,
            *[s[p] for s in lshards],
            *[s[p] for s in rshards],
        )
        for p in range(P)
    ]
    return rd.from_arrow_refs(out)
