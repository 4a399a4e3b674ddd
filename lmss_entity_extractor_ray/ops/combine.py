"""Streaming coordinator-merge for BOUNDED-cardinality aggregates.

Pattern: every block is pre-aggregated inside ``map_batches`` (Arrow C++
``Table.group_by`` — the map-side combine), so what leaves the cluster is
≤ |distinct groups| rows per block.  When the group cardinality is small
and known-bounded (per-type stats, per-nation rollups, per-branch
histograms, hourly windows), finishing with Ray's distributed
``groupby().aggregate()`` pays a full AllToAll exchange — plus ~1 s of
fixed per-execution cost — to merge a few kilobytes.  This helper instead
streams the partial blocks to the driver and folds them into ONE running
Arrow table, re-combining whenever the buffer grows, exactly like an MPP
coordinator's final-aggregate step (and like ``Dataset.aggregate()``'s own
whole-table reductions, which also return driver-side values).

Memory bound: the running table never exceeds ``distinct_groups +
combine_every`` rows — O(groups), NOT O(blocks × groups) — and a hard
``max_groups`` cap fails loudly if the caller misjudged the cardinality
(use the distributed ``groupby`` path for unbounded keys: exact dedup,
per-document joins, top-k over high-cardinality keys).

Side benefit: no AllToAll operator → none of Ray 2.49's harmless-but-noisy
"RefBundle with a different schema" warnings that empty shuffle partitions
emit on tiny inputs.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import pyarrow as pa

import ray.data as rd

# (partial_col, merge_fn, out_name); merge_fn must be associative and
# idempotent over re-combines: sum / min / max (count partials merge by sum)
AggSpec = Tuple[str, str, str]

_ALLOWED = {"sum", "min", "max"}


def combine_partials(
    partials: rd.Dataset,
    keys: Sequence[str],
    aggs: Sequence[AggSpec],
    combine_every: int = 200_000,
    max_groups: int = 2_000_000,
    schema: Optional[pa.Schema] = None,
) -> pa.Table:
    """Fold a Dataset of map-side partial-aggregate rows into the final
    grouped table on the driver.  Exact for associative merges regardless of
    block order; the heavy per-row work stayed distributed in the partial
    stage."""
    keys = list(keys)
    cols = [c for c, _, _ in aggs]
    plan = [(c, f) for c, f, _ in aggs]
    for _, f, _ in aggs:
        if f not in _ALLOWED:
            raise ValueError(f"merge fn must be one of {_ALLOWED}, got {f!r}")

    def fold(t: pa.Table) -> pa.Table:
        # group_by emits key columns first, then aggregates named col_fn —
        # rename back to the partial column names so fold is idempotent
        return t.group_by(keys).aggregate(plan).rename_columns(keys + cols)

    acc: Optional[pa.Table] = None
    seen_schema: Optional[pa.Schema] = None
    for b in partials.iter_batches(batch_format="pyarrow"):
        if seen_schema is None:
            seen_schema = b.schema  # zero-row batches still carry types
        if b.num_rows == 0:
            continue
        part = b.select(keys + cols)
        acc = part if acc is None else pa.concat_tables([acc, part])
        if acc.num_rows > combine_every:
            acc = fold(acc)
            if acc.num_rows > max_groups:
                raise ValueError(
                    f"combine_partials: >{max_groups} distinct groups — this "
                    "key is not bounded-cardinality; use the distributed "
                    "groupby path instead"
                )
    out_names = keys + [o for _, _, o in aggs]
    if acc is None:
        # Correctly TYPED empty result — null-typed columns would crash
        # downstream sort/cast and break oracle schema comparison on empty
        # inputs.  Preference order: a streamed batch's schema (an empty
        # Dataset yields NO batches, so this rarely fires) → the caller's
        # explicit schema → ds.schema() (may re-execute the emptied
        # pipeline once — fine, the empty case is the rare one) → null.
        if seen_schema is None and schema is not None:
            seen_schema = schema
        if seen_schema is None:
            try:
                sch = partials.schema()
                if sch is not None and sch.names:
                    seen_schema = pa.schema(
                        [pa.field(n, t) for n, t in zip(sch.names, sch.types)]
                    )
            except Exception:
                seen_schema = None
        if seen_schema is not None:
            typed = {}
            for n, src in zip(out_names, keys + cols):
                f = seen_schema.field(src) if seen_schema.get_field_index(src) >= 0 else None
                typed[n] = pa.array([], f.type if f is not None else pa.null())
            return pa.table(typed)
        return pa.table({n: pa.array([], pa.null()) for n in out_names})
    return fold(acc).rename_columns(out_names)


def col_type(ds: rd.Dataset, col: str, default: pa.DataType = None) -> pa.DataType:
    """Best-effort Arrow type of ``col`` from dataset METADATA only (no
    execution) — for building the typed empty-result schema passed to
    ``combine_partials``.  Falls back to ``default`` (string) when the
    schema isn't metadata-known (e.g. behind a map/filter)."""
    try:
        sch = ds.schema(fetch_if_missing=False)
        if sch is not None:
            m = dict(zip(sch.names, sch.types))
            if col in m:
                return m[col]
    except Exception:
        pass
    return default if default is not None else pa.string()


def sort_table(t: pa.Table, sort_keys: List[Tuple[str, str]]) -> pa.Table:
    import pyarrow.compute as pc

    return t.take(pc.sort_indices(t, sort_keys=sort_keys))
