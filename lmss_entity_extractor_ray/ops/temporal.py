"""Event-time operators Ray Data has no primitive for: session windows and
as-of joins (SURVEY.md §2.9 family; the reference has no streaming semantics,
these are the bounded-batch equivalents a training-data pipeline needs).

Both ride ONE manual hash exchange on the entity key (`user_id`): rows are
partitioned by ``hash(key) % P`` so each entity's events co-locate, and every
partition task sorts once and runs vectorized numpy passes — no per-row
Python, no per-entity ``map_groups`` call (~0.6 ms/group would dominate at
10⁵+ entities).  Timestamps are handled as int64 MICROSECONDS end to end, so
the DuckDB oracles (``epoch_us``) compare exactly — no float time math.

Partitioning assumption: one partition's event rows fit a worker.  Scale P
with the corpus; entity keys are near-uniform (user ids), so no salting is
needed.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from .arrow_np import col_np
from .partitioning import shuffle_partitions as _sized_partitions


def _partitions(ds=None) -> int:
    """CPU floor + data-size ceiling (ops/partitioning.py)."""
    return _sized_partitions(ds)


def _with_part(ds: rd.Dataset, key: str, P: int) -> rd.Dataset:
    def add_part(batch: pa.Table) -> pa.Table:
        k = col_np(batch, key, np.uint64)
        with np.errstate(over="ignore"):
            part = ((k * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(P)).astype(
                np.int32
            )
        return batch.append_column("part", pa.array(part, pa.int32()))

    return ds.map_batches(add_part, batch_format="pyarrow")


def _us(group: pa.Table, col: str) -> np.ndarray:
    """timestamp column → int64 microseconds, straight from the buffer."""
    arr = group.column(col).cast(pa.int64())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.to_numpy(zero_copy_only=False)


# ---------------------------------------------------------------------------
# session windows
# ---------------------------------------------------------------------------

def session_window_stats(
    events: rd.Dataset,
    gap_minutes: int = 30,
    key: str = "user_id",
    num_partitions: Optional[int] = None,
) -> rd.Dataset:
    """Per-entity session windows: a session is a maximal run of an entity's
    events where consecutive gaps are ≤ ``gap_minutes`` (a STRICTLY larger
    gap starts a new session).  Output one row per session:
    ``(user_id, session_start_us, n_events, sum_value_c2)``.

    Per-partition pass is fully vectorized: one lexsort by (key, ts,
    event_id), session boundaries from an int64-µs diff compare, per-session
    aggregates via ``np.add.reduceat`` over the boundary index vector."""
    P = num_partitions or _partitions(events)
    gap_us = np.int64(gap_minutes) * 60 * 1_000_000

    def sessions(group: pa.Table) -> pa.Table:
        n = group.num_rows
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "session_start_us": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "sum_value_c2": pa.array([], pa.int64()),
            }
        )
        if n == 0:
            return empty
        uid = col_np(group, key)
        ts = _us(group, "ts")
        eid = col_np(group, "event_id")
        val = col_np(group, "value")
        order = np.lexsort((eid, ts, uid))
        uid, ts, val = uid[order], ts[order], val[order]
        new_s = np.ones(n, dtype=bool)
        new_s[1:] = (uid[1:] != uid[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)
        bounds = np.nonzero(new_s)[0]
        n_events = np.diff(np.append(bounds, n))
        sum_value = np.add.reduceat(val, bounds)
        return pa.table(
            {
                "user_id": pa.array(uid[bounds], pa.int64()),
                "session_start_us": pa.array(ts[bounds], pa.int64()),
                "n_events": pa.array(n_events.astype(np.int64), pa.int64()),
                "sum_value_c2": pa.array(
                    np.floor(sum_value * 100.0 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    cols = events.select_columns([key, "ts", "event_id", "value"])
    return (
        _with_part(cols, key, P)
        .groupby("part")
        .map_groups(sessions, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# per-entity running total (partitioned cumulative sum)
# ---------------------------------------------------------------------------

def running_sum(
    events: rd.Dataset,
    key: str = "user_id",
    value: str = "value",
    num_partitions: Optional[int] = None,
) -> rd.Dataset:
    """Per-entity running total INCLUDING the current row — the
    ``SUM(v) OVER (PARTITION BY key ORDER BY ts, event_id)`` window.
    Output: ``(event_id, running_c2)`` — the running total of the
    c2-SCALED INT values (each value quantized to int64 cents first, then
    summed in exact integer arithmetic).  Quantize-then-sum, not
    sum-then-quantize: windowed float sums associate differently across
    engines (numpy cumsum is sequential, DuckDB's window SUM is a segment
    tree), so only integer totals are reproducible at every scale.

    Same one-exchange shape as the session/as-of operators: an entity's
    rows co-locate, each partition lexsorts once by (key, ts, event_id)
    and runs ONE segmented cumsum (global cumsum minus the per-entity
    prefix carried at each segment start) — no per-entity loop.  For a
    GLOBAL (un-partitioned) scan use ops/prefix.ordered_cumsum."""
    P = num_partitions or _partitions(events)

    def scan(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "running_c2": pa.array([], pa.int64()),
            }
        )
        n = group.num_rows
        if n == 0:
            return empty
        uid = col_np(group, key)
        ts = _us(group, "ts")
        eid = col_np(group, "event_id")
        val = col_np(group, value)
        order = np.lexsort((eid, ts, uid))
        uid, val, eid = uid[order], val[order], eid[order]
        val_c2 = np.floor(val * 100.0 + 0.5).astype(np.int64)
        cum = np.cumsum(val_c2)
        starts = np.concatenate(([0], np.nonzero(uid[1:] != uid[:-1])[0] + 1))
        seg = np.zeros(n, dtype=np.int64)
        seg[starts] = 1
        seg_id = np.cumsum(seg) - 1
        base = np.concatenate(([0], cum[starts[1:] - 1]))  # cum before each segment
        running = cum - base[seg_id]
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "running_c2": pa.array(running, pa.int64()),
            }
        )

    cols = events.select_columns([key, "ts", "event_id", value])
    return (
        _with_part(cols, key, P)
        .groupby("part")
        .map_groups(scan, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------

def asof_lag(
    events: rd.Dataset,
    left_type: str = "click",
    right_type: str = "purchase",
    key: str = "user_id",
    num_partitions: Optional[int] = None,
) -> rd.Dataset:
    """Per-entity as-of join: for every ``left_type`` event, the time since
    the most recent ``right_type`` event of the same entity at or before it
    (inclusive — DuckDB ``ASOF JOIN ... ON a.ts >= b.ts`` semantics).
    Left events with no prior right event are dropped (inner as-of).
    Output: ``(event_id, asof_lag_us)`` — exact int64 microseconds.

    Vectorized last-seen scan: sort by (key, ts, right-before-left at equal
    ts), ``np.maximum.accumulate`` over right-row indices, validity = the
    carried index belongs to the same entity (rows are entity-sorted, so a
    carried index from the previous entity has a different key value)."""
    P = num_partitions or _partitions(events)

    def asof(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "asof_lag_us": pa.array([], pa.int64()),
            }
        )
        n = group.num_rows
        if n == 0:
            return empty
        uid = col_np(group, key)
        ts = _us(group, "ts")
        eid = col_np(group, "event_id")
        etype = group.column("event_type").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        is_r = etype == right_type
        is_l = etype == left_type
        # right rows sort BEFORE left rows at equal (key, ts) → inclusive >=
        order = np.lexsort((~is_r, ts, uid))
        uid, ts, eid = uid[order], ts[order], eid[order]
        is_r, is_l = is_r[order], is_l[order]
        idx = np.arange(n)
        last_r = np.maximum.accumulate(np.where(is_r, idx, -1))
        cand = is_l & (last_r >= 0)
        ok = np.zeros(n, dtype=bool)
        ok[cand] = uid[last_r[cand]] == uid[cand]
        if not ok.any():
            return empty
        return pa.table(
            {
                "event_id": pa.array(eid[ok], pa.int64()),
                "asof_lag_us": pa.array(ts[ok] - ts[last_r[ok]], pa.int64()),
            }
        )

    cols = events.select_columns([key, "ts", "event_id", "event_type"])
    return (
        _with_part(cols, key, P)
        .groupby("part")
        .map_groups(asof, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# range (interval) join
# ---------------------------------------------------------------------------

def range_join_within(
    ds: rd.Dataset,
    window_us: int,
    key: str = "o_custkey",
    ts_col: str = "o_orderdate",
    id_col: str = "o_orderkey",
    num_partitions: Optional[int] = None,
) -> rd.Dataset:
    """Per-entity range self-join: every ordered pair of an entity's rows
    whose timestamps lie within ``window_us`` of each other
    (``0 < ts_b - ts_a ≤ window_us``; equal timestamps pair by id order,
    ``id_a < id_b`` at ``diff 0``).  Output: ``(a, b, diff_us)``.

    One hash exchange on the entity key, then per partition: lexsort by
    (key, ts, id) and a vectorized two-pointer sweep — ``searchsorted`` of
    ``ts + window`` against the sorted ts array gives each row's pair-range
    end, entity boundaries clamp it, and the pair index vectors come from a
    ``repeat``/``arange`` offset pattern (no Python loop over rows).  Output
    volume is bounded by true pair density, never all-pairs."""
    P = num_partitions or _partitions(ds)

    def pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "diff_us": pa.array([], pa.int64()),
            }
        )
        n = group.num_rows
        if n < 2:
            return empty
        uid = col_np(group, key)
        ts = _us(group, ts_col)
        rid = col_np(group, id_col)
        order = np.lexsort((rid, ts, uid))
        uid, ts, rid = uid[order], ts[order], rid[order]
        # ts is sorted only WITHIN an entity's run, so the window end is a
        # per-segment searchsorted (O(entities) loop, vectorized inner)
        change = np.nonzero(uid[1:] != uid[:-1])[0] + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [n]))
        hi = np.empty(n, dtype=np.int64)
        for s, e in zip(starts, ends):
            hi[s:e] = s + np.searchsorted(
                ts[s:e], ts[s:e] + window_us, side="right"
            )
        lo = np.arange(n) + 1
        cnt = np.maximum(hi - lo, 0)
        if cnt.sum() == 0:
            return empty
        ii = np.repeat(np.arange(n), cnt)
        # offsets 0..cnt[i]-1 within each i's range → flat j indices
        csum = np.concatenate(([0], np.cumsum(cnt)))
        jj = (np.arange(csum[-1]) - csum[ii]) + lo[ii]
        a, b = rid[ii], rid[jj]
        swap = a > b  # diff==0 ties: emit with a < b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pa.table(
            {
                "a": pa.array(a2, pa.int64()),
                "b": pa.array(b2, pa.int64()),
                "diff_us": pa.array(ts[jj] - ts[ii], pa.int64()),
            }
        )

    cols = ds.select_columns([key, ts_col, id_col])
    return (
        _with_part(cols, key, P)
        .groupby("part")
        .map_groups(pairs, batch_format="pyarrow")
    )
