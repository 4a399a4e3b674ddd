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
