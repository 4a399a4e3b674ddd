"""Event-time tumbling-window aggregation over the events stream table.

The reference has no streaming semantics (SURVEY.md §2.9); this is the
bounded-batch equivalent a training-data pipeline needs: truncate event time
to a window, aggregate per (window, key).  Map-side partials (Arrow C++
``group_by`` per block) collapse each block to ≤ |windows × keys| rows before
the global shuffle, so the exchange volume is bounded by the window/key
cardinality, not the event count.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .combine import col_type, combine_partials, sort_table


def tumbling_window_agg(
    events: rd.Dataset, unit: str = "hour", key: str = "event_type"
) -> rd.Dataset:
    """(window_start, key) → n events + sum_value_c2 (portable scaled int)."""

    def partial(batch: pa.Table) -> pa.Table:
        # window_start ships as an ISO string: pandas/DuckDB timestamp dtypes
        # (ns vs us) don't hash-compare portably
        win = pc.strftime(
            pc.floor_temporal(batch.column("ts"), unit=unit).cast(pa.timestamp("s")),
            "%Y-%m-%d %H:%M:%S",
        )
        t = pa.table(
            {
                "window_start": win,
                key: batch.column(key),
                "value": batch.column("value"),
            }
        )
        g = t.group_by(["window_start", key]).aggregate(
            [("value", "count"), ("value", "sum")]
        )
        return g.rename_columns(["window_start", key, "p_n", "p_sum"])

    def finalize(batch: pa.Table) -> pa.Table:
        scaled = pc.floor(
            pc.add(pc.multiply(batch.column("sum_value"), 100.0), 0.5)
        ).cast(pa.int64())
        idx = batch.column_names.index("sum_value")
        return batch.set_column(idx, "sum_value_c2", scaled)

    # window × key cardinality is bounded (hours in range × event types) →
    # coordinator merge of the distributed partials (ops/combine.py); swap
    # for a distributed groupby if windows × keys ever outgrows the driver
    final = combine_partials(
        events.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["window_start", key],
        [("p_n", "sum", "n"), ("p_sum", "sum", "sum_value")],
        schema=pa.schema(
            [("window_start", pa.string()), (key, col_type(events, key)),
             ("p_n", pa.int64()), ("p_sum", pa.float64())]
        ),
    )
    final = sort_table(finalize(final), [("window_start", "ascending"), (key, "ascending")])
    return rd.from_arrow(final)


def sliding_window_agg(
    events: rd.Dataset, size_hops: int = 3, unit: str = "hour",
    key: str = "event_type",
) -> rd.Dataset:
    """Sliding event-time windows: length ``size_hops`` × ``unit``, hopping
    every ``unit`` — each event lands in ``size_hops`` windows (every window
    start w with w ≤ ts < w + size, w aligned to the hop grid).

    Same shuffle discipline as the tumbling case: each block first collapses
    to ≤ |hops × keys| rows via Arrow ``group_by``, the replication across
    the ``size_hops`` window offsets happens on those PARTIALS (never on raw
    events), and the bounded (window, key) partials coordinator-merge.
    Output: (window_start, key, n, sum_value_c2)."""

    def partial(batch: pa.Table) -> pa.Table:
        hop = pc.floor_temporal(batch.column("ts"), unit=unit).cast(
            pa.timestamp("s")
        )
        t = pa.table(
            {"hop": hop, key: batch.column(key), "value": batch.column("value")}
        )
        g = t.group_by(["hop", key]).aggregate([("value", "count"), ("value", "sum")])
        g = g.rename_columns(["hop", key, "p_n", "p_sum"])
        secs = {"hour": 3600, "minute": 60, "day": 86400, "second": 1}[unit]
        parts = []
        for k in range(size_hops):
            win = pc.strftime(
                pc.subtract(
                    g.column("hop"), pa.scalar(k * secs, pa.duration("s"))
                ),
                "%Y-%m-%d %H:%M:%S",
            )
            parts.append(
                pa.table(
                    {
                        "window_start": win,
                        key: g.column(key),
                        "p_n": g.column("p_n"),
                        "p_sum": g.column("p_sum"),
                    }
                )
            )
        return pa.concat_tables(parts)

    def finalize(batch: pa.Table) -> pa.Table:
        scaled = pc.floor(
            pc.add(pc.multiply(batch.column("sum_value"), 100.0), 0.5)
        ).cast(pa.int64())
        idx = batch.column_names.index("sum_value")
        return batch.set_column(idx, "sum_value_c2", scaled)

    final = combine_partials(
        events.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["window_start", key],
        [("p_n", "sum", "n"), ("p_sum", "sum", "sum_value")],
        schema=pa.schema(
            [("window_start", pa.string()), (key, col_type(events, key)),
             ("p_n", pa.int64()), ("p_sum", pa.float64())]
        ),
    )
    final = sort_table(
        finalize(final), [("window_start", "ascending"), (key, "ascending")]
    )
    return rd.from_arrow(final)


# ---------------------------------------------------------------------------
# sessionization (gap-based)
# ---------------------------------------------------------------------------

_SESS_GOLD = None  # set lazily to avoid importing numpy at module import


def sessionize(
    events: rd.Dataset,
    gap_us: int = 1_800_000_000,  # 30 min
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Gap-based sessionization: one row per (user, session) with event
    count, start/end time (epoch microseconds) and the cent-quantized value
    sum.  A new session starts when the gap to the user's previous event
    exceeds ``gap_us`` (events ordered by (ts, event_id) — ties can't split
    a session, so tie order never changes the result).

    Shape: ONE hash exchange on the user key (a user's whole event stream
    co-locates — the partitioning assumption is per-user event volume fits
    a partition, the same contract every per-user window op here relies
    on), then one vectorized lexsort + run-boundary scan per PARTITION —
    P Python calls total, never one per user.  The quantized value sum
    (floor(v*100 + 0.5) per row, int64 sum) keeps the aggregate
    order-independent and SQL-oracle-exact.
    """
    import numpy as np

    from .partitioning import shuffle_partitions

    P = max(2, num_partitions or shuffle_partitions(events))
    GOLD = np.uint64(0x9E3779B97F4A7C15)

    def partial(batch: pa.Table) -> pa.Table:
        u = batch.column(user_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            part = ((u.astype(np.uint64) * GOLD) % np.uint64(P)).astype(np.int32)
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "ts_us": batch.column(ts_col).cast(pa.int64()),
                "eid": batch.column(id_col).cast(pa.int64()),
                "v_c2": pc.floor(
                    pc.add(pc.multiply(batch.column(value_col), 100.0), 0.5)
                ).cast(pa.int64()),
                "part": pa.array(part),
            }
        )

    def finish(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "session_no": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "start_us": pa.array([], pa.int64()),
                    "end_us": pa.array([], pa.int64()),
                    "vsum_c2": pa.array([], pa.int64()),
                }
            )
        u = group.column("user_id").to_numpy(zero_copy_only=False)
        ts = group.column("ts_us").to_numpy(zero_copy_only=False)
        eid = group.column("eid").to_numpy(zero_copy_only=False)
        v = group.column("v_c2").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, ts, v = u[order], ts[order], v[order]
        n = len(u)
        new_user = np.concatenate(([True], u[1:] != u[:-1]))
        gap_brk = np.concatenate(([False], (ts[1:] - ts[:-1]) > gap_us))
        within_brk = gap_brk & ~new_user
        # per-user session number: cumulative within-user breaks, reset at
        # each user start (subtract the running count at the user's first row)
        cs = np.cumsum(within_brk.astype(np.int64))
        user_first = np.nonzero(new_user)[0]
        reset = np.repeat(cs[user_first], np.diff(np.concatenate((user_first, [n]))))
        session_no = cs - reset
        starts = np.nonzero(new_user | within_brk)[0]
        return pa.table(
            {
                "user_id": pa.array(u[starts], pa.int64()),
                "session_no": pa.array(session_no[starts], pa.int64()),
                "n_events": pa.array(
                    np.diff(np.concatenate((starts, [n]))), pa.int64()
                ),
                "start_us": pa.array(ts[starts], pa.int64()),
                "end_us": pa.array(
                    ts[np.concatenate((starts[1:] - 1, [n - 1]))], pa.int64()
                ),
                "vsum_c2": pa.array(np.add.reduceat(v, starts), pa.int64()),
            }
        )

    return (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(finish, batch_format="pyarrow")
    )


def tumbling_window_distinct(
    events: rd.Dataset, unit: str = "hour", user_col: str = "user_id",
    num_partitions=None,
) -> rd.Dataset:
    """(window_start, n_users) — DISTINCT entities per event-time window,
    the canonical stream cardinality metric (hourly active users).

    Distinct is NOT additive, so the map-side-partial + fold shape of
    ``tumbling_window_agg`` cannot express it; this is the exact two-phase
    distinct: each block emits its DISTINCT (window, user) pairs (in-block
    dedup collapses the heavy repetition before anything moves), ONE hash
    exchange on the PAIR key co-locates equal pairs, each partition
    re-dedups and counts per window, and the bounded per-window partial
    counts fold on the coordinator.  Exchange volume is Σ block-distinct
    pairs; the sketch alternative for 10^12-row streams is per-window HLL
    registers through the same fold (ops/cardinality.py)."""
    import numpy as np

    from .partitioning import shuffle_partitions, string_hash64

    P = num_partitions or shuffle_partitions(events)

    def block_pairs(batch: pa.Table) -> pa.Table:
        win = pc.strftime(
            pc.floor_temporal(batch.column("ts"), unit=unit).cast(pa.timestamp("s")),
            "%Y-%m-%d %H:%M:%S",
        )
        t = pa.table({"window_start": win, user_col: batch.column(user_col)})
        g = t.group_by(["window_start", user_col]).aggregate([])  # block-distinct
        u = np.asarray(g.column(user_col), dtype=np.int64).view(np.uint64)
        part = ((string_hash64(g.column("window_start")) ^ u) % np.uint64(P)).astype(
            np.int32
        )
        return g.append_column("part", pa.array(part, pa.int32()))

    def count_per_window(group: pa.Table) -> pa.Table:
        g = group.group_by(["window_start", user_col]).aggregate([])
        c = g.group_by(["window_start"]).aggregate([([], "count_all")])
        return c.rename_columns(["window_start", "p_n"])

    partials = (
        events.map_batches(block_pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(count_per_window, batch_format="pyarrow")
    )
    final = combine_partials(
        partials,
        ["window_start"],
        [("p_n", "sum", "n_users")],
        schema=pa.schema([("window_start", pa.string()), ("p_n", pa.int64())]),
    )
    return rd.from_arrow(sort_table(final, [("window_start", "ascending")]))
