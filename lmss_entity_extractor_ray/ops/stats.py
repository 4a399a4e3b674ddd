"""Exact distributed quantiles over an integer-valued column, per group.

The classic distributed-quantile trade-off is sketch accuracy (t-digest /
KLL) vs a full sort.  For DISCRETE values with bounded cardinality —
lengths, counts, sizes, scores on a grid — there is an exact middle road:
aggregate a ``(group, value) → count`` histogram (map-side partials, then
the coordinator fold used by every bounded aggregate in this repo), and
read quantiles off the cumulative counts.  One pass, no shuffle, no
approximation; memory is O(groups × distinct values), hard-capped by the
fold.  For continuous/unbounded columns use a sketch instead (documented
non-goal here).

Quantile definition matches DuckDB ``quantile_disc(v, q)`` exactly: the
element at 1-based index ``ceil(q·n)`` of the sorted values — so the SQL
oracle compares value-for-value.
"""

from __future__ import annotations


from typing import Optional, Sequence

import numpy as np
import pyarrow as pa

import ray.data as rd

from .arrow_np import col_np
from .combine import combine_partials, sort_table


def grouped_quantiles(
    ds: rd.Dataset,
    key: str,
    value: str,
    qs: Sequence[float] = (0.25, 0.5, 0.9),
) -> pa.Table:
    """(key, q<pct>…) — exact discrete quantiles of ``value`` per ``key``."""

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([key, value])
        g = t.group_by([key, value]).aggregate([([], "count_all")])
        return g.rename_columns([key, value, "p_cnt"])

    hist = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        [key, value],
        [("p_cnt", "sum", "cnt")],
    )
    hist = sort_table(hist, [(key, "ascending"), (value, "ascending")])
    k = hist.column(key)
    vals = col_np(hist, value)
    cnts = col_np(hist, "cnt")
    n = hist.num_rows
    if n == 0:
        return pa.table(
            {key: pa.array([], pa.string())}
            | {f"q{int(q * 100)}": pa.array([], pa.int64()) for q in qs}
        )
    kk = k.combine_chunks()
    import pyarrow.compute as pc

    same = np.asarray(pc.equal(kk.slice(1, n - 1), kk.slice(0, n - 1))) if n > 1 else np.zeros(0, bool)
    starts = np.concatenate(([0], np.nonzero(~same)[0] + 1))
    ends = np.concatenate((starts[1:], [n]))
    out_keys = kk.take(pa.array(starts, pa.int64()))
    cols: dict = {key: out_keys}
    csum = np.cumsum(cnts)
    base = np.concatenate(([0], csum))[starts]
    totals = csum[ends - 1] - base
    for q in qs:
        # 1-based rank ceil(q*n), clamped to [1, n] — quantile_disc semantics
        ranks = np.maximum(np.ceil(q * totals), 1.0).astype(np.int64)
        idx = np.empty(len(starts), dtype=np.int64)
        for g in range(len(starts)):
            lo, hi = starts[g], ends[g]
            local = np.searchsorted(csum[lo:hi] - base[g], ranks[g], side="left")
            idx[g] = lo + min(local, hi - lo - 1)
        cols[f"q{int(q * 100)}"] = pa.array(vals[idx], pa.int64())
    return pa.table(cols)


def grouped_quantiles_ds(
    ds: rd.Dataset, key: str, value: str, qs: Sequence[float] = (0.25, 0.5, 0.9)
) -> rd.Dataset:
    return rd.from_arrow(grouped_quantiles(ds, key, value, qs))


def grouped_quantile_gate(
    ds: rd.Dataset,
    key: str,
    value: str,
    q: float = 0.25,
    keep_cols: Optional[Sequence[str]] = None,
) -> rd.Dataset:
    """Keep rows whose ``value`` is >= their group's ``q``-quantile — the
    percentile-based quality gate (e.g. drop each language's shortest
    quartile).  Composition shape for 100 TB: one bounded stats pass
    (grouped_quantiles — O(|groups|) result), broadcast the threshold dict
    once via ``ray.put``, then a map-only filter over the corpus.  No
    corpus shuffle anywhere."""
    import ray

    qt = grouped_quantiles(ds.select_columns([key, value]), key, value, qs=(q,))
    qcol = f"q{int(q * 100)}"
    thresholds = dict(zip(qt.column(key).to_pylist(), qt.column(qcol).to_pylist()))
    ref = ray.put(thresholds)
    cols = list(keep_cols) if keep_cols else None

    def gate(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select(cols) if cols else batch
        th = ray.get(ref)
        vals = col_np(batch, value)
        ks = batch.column(key).to_pylist()
        lim = np.array([th.get(k, -np.inf) for k in ks], dtype=np.float64)
        out = batch.filter(pa.array(vals >= lim))
        return out.select(cols) if cols else out

    return ds.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)
