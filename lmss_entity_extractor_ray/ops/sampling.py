"""Sampling operators (absent from the reference — SURVEY.md §2.6 notes no
sampling exists there — but indispensable for training-data pipelines).

- ``hash_sample`` — deterministic multiplicative-hash FRACTION sampling on a
  key column.  THE sampling primitive at 100 TB: reproducible across runs
  and partitionings, needs no global state or shuffle, and composes with
  resume (a re-run samples the same rows).  Knuth's 2654435761 multiplier
  mod 2^32 is exactly computable in both numpy and ANSI SQL, so the
  driver's DuckDB oracle matches bit-for-bit.
- ``reservoir_sample`` — deterministic FIXED-SIZE k-sample via the bottom-k
  formulation of reservoir sampling: tag every row with a per-key hash and
  keep the k smallest tags.  Equivalent to "assign each row an i.i.d. random
  number, keep the k smallest" — the classic exactly-mergeable distributed
  reservoir — with the random number replaced by a keyed multiplicative
  hash, which makes the sample reproducible across runs, block layouts and
  partitionings (per-block RNGs are NOT: a block-content-independent seed
  gives equal-shaped blocks identical index picks, and block boundaries
  change with parallelism).  The sample is uniform to the extent the hash
  behaves as a random permutation of the key space (exactly uniform under
  that idealization; a multiplicative hash is in fact LOW-discrepancy on
  dense integer keys, i.e. closer to proportional allocation than true
  random sampling).  Distributed shape: per-block bottom-k (map-side
  partial) → global merge over ≤ k·num_blocks candidate rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from .arrow_np import col_np

_KNUTH = 2654435761
_MOD = 1 << 32


def _tag(keys: np.ndarray, seed: int) -> np.ndarray:
    """((key + seed) * 2654435761) mod 2^32 — identical to the SQL expression
    ``((key + seed) * 2654435761) % 4294967296`` for keys in [0, ~2^31)."""
    return ((keys + np.uint64(seed)) * np.uint64(_KNUTH)) % np.uint64(_MOD)


def hash_sample(ds: rd.Dataset, key: str, fraction: float, salt: int = 0) -> rd.Dataset:
    """Keep rows where ((key + salt) * 2654435761) mod 2^32 < fraction * 2^32.

    SQL parity: ``WHERE ((key + salt) * 2654435761) % 4294967296 <
    CAST(fraction * 4294967296 AS BIGINT)``."""
    threshold = int(fraction * _MOD)

    def keep(batch: pa.Table) -> pa.Table:
        k = col_np(batch, key, np.uint64)
        h = _tag(k, salt)
        return batch.filter(pa.array(h < threshold))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def reservoir_sample(ds: rd.Dataset, k: int, seed: int = 42, key: str = "doc_id") -> pa.Table:
    """Deterministic k-sample without replacement (bottom-k reservoir).

    Each row's tag is a multiplicative hash of its ``key`` column; the sample
    is the k rows with the smallest ``(tag, key)``.  One streaming pass:
    every block reduces to its local bottom-k (map-side partial), the driver
    merges ≤ k rows per block — the corpus itself is never collected, and
    the result is independent of block layout / parallelism / execution
    order (unlike per-block RNG reservoirs).  Requires ``key`` values to be
    unique for exact without-replacement semantics.

    SQL parity: ``ORDER BY ((key + seed) * 2654435761) % 4294967296, key
    LIMIT k``."""

    def block_bottomk(batch: pa.Table) -> pa.Table:
        keys = col_np(batch, key, np.uint64)
        tags = _tag(keys, seed)
        order = np.lexsort((keys, tags))[: min(k, batch.num_rows)]
        sub = batch.take(pa.array(np.sort(order), pa.int64()))
        return sub.append_column(
            "_tag", pa.array(_tag(col_np(sub, key, np.uint64), seed).astype(np.int64), pa.int64())
        )

    parts = list(
        ds.map_batches(block_bottomk, batch_format="pyarrow", batch_size=None).iter_batches(
            batch_format="pyarrow"
        )
    )
    if not parts:
        return pa.table({})
    merged = pa.concat_tables(parts)
    tags = col_np(merged, "_tag", np.uint64)
    keys = col_np(merged, key, np.uint64)
    order = np.lexsort((keys, tags))[: min(k, merged.num_rows)]
    return merged.drop_columns(["_tag"]).take(pa.array(order, pa.int64()))


def dataset_split(
    ds: rd.Dataset,
    key: str = "doc_id",
    fractions=(("train", 0.8), ("val", 0.1), ("test", 0.1)),
    seed: int = 7,
) -> rd.Dataset:
    """Deterministic train/val/test assignment: each row's split is a pure
    function of its key — reproducible across runs, block layouts and
    parallelism, and stable under corpus growth (a doc never changes split
    when new data arrives, unlike count-based splits).  One map, no
    shuffle.  SQL parity: CASE over the identical tag expression
    ``((key + seed) * 2654435761) % 2^32`` against the cumulative-fraction
    thresholds."""
    names = [n for n, _ in fractions]
    cum, acc = [], 0.0
    for _, f in fractions:
        acc += f
        cum.append(int(acc * _MOD))
    cum[-1] = _MOD  # float slop must not leave a row unassigned

    def assign(batch: pa.Table) -> pa.Table:
        tags = _tag(col_np(batch, key, np.uint64), seed)
        idx = np.searchsorted(np.asarray(cum, dtype=np.uint64), tags, side="right")
        return batch.append_column(
            "split", pa.array([names[i] for i in idx], pa.string())
        )

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def weighted_mix(
    ds: rd.Dataset,
    rates: dict,
    group_col: str = "lang",
    key: str = "doc_id",
    salt: int = 0,
    default_rate: float = 1.0,
) -> rd.Dataset:
    """Domain/source mixing: per-group deterministic fraction sampling —
    keep a row iff ``hash(key, salt) < rates[group] * 2^32``.  This is how
    training mixtures rebalance source proportions (e.g. The Pile's and
    Dolma's per-source weights) without a shuffle: map-only, reproducible
    across runs and layouts, and composable with resume.  Groups absent
    from ``rates`` sample at ``default_rate``.  SQL parity: same Knuth-hash
    expression as ``hash_sample``, thresholds precomputed per group."""
    items = sorted(rates.items())
    groups = pa.array([g for g, _ in items], pa.string())
    thresholds = np.array(
        [min(int(r * _MOD), _MOD) for _, r in items], dtype=np.uint64
    )
    default_thr = np.uint64(min(int(default_rate * _MOD), _MOD))

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        k = col_np(batch, key, np.uint64)
        h = _tag(k, salt)
        idx = pc.index_in(batch.column(group_col), value_set=groups)
        idx_np = idx.to_numpy(zero_copy_only=False)
        thr = np.where(
            np.isnan(idx_np.astype(np.float64)),
            default_thr,
            thresholds[np.nan_to_num(idx_np, nan=0).astype(np.int64)],
        ).astype(np.uint64)
        return batch.filter(pa.array(h < thr))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def token_budget_select(docs_ds, budget_tokens: int):
    """Greedy token-budget fill — the LAST step of every curation pipeline:
    given a training budget of N tokens, keep the best-ranked documents
    whose cumulative token count fits.  Rank here is (stopword_ratio desc,
    doc_id asc) — the quality heuristic's "most natural prose first"; any
    deterministic SQL-expressible order plugs in, the verified machinery
    is the ORDER-THEN-PREFIX-SUM shape.

    Distributed shape: per-doc token counts and the e5-quantized rank are
    one vectorized pass; the global greedy order + running total is the
    exact distributed prefix scan (``ops/prefix.ordered_cumsum``: one
    range sort + an O(blocks) boundary-verified cumulative pass — no
    driver-side doc table); the keep rule ``cum_before + n_tokens <=
    budget`` is a map-only filter.  Emits (doc_id, stopword_ratio_e5,
    n_tokens) for the selected docs."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from .arrow_np import col_np
    from .prefix import ordered_cumsum
    from .text_ops import quality_batch

    def rank_rows(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch)
        s = col_np(q, "stopword_ratio_e5")
        return pa.table(
            {
                "doc_id": q.column("doc_id"),
                "stopword_ratio_e5": q.column("stopword_ratio_e5"),
                "n_tokens": q.column("n_tokens"),
                # ordered_cumsum sorts ASCENDING; negate for desc-quality
                "neg_rank": pa.array(-s, pa.int64()),
            }
        )

    ranked = ordered_cumsum(
        docs_ds.map_batches(rank_rows, batch_format="pyarrow"),
        ["neg_rank", "doc_id"],
        "n_tokens",
        out_col="cum_before",
    )

    def keep(batch: pa.Table) -> pa.Table:
        fits = pc.less_equal(
            pc.add(batch.column("cum_before"), batch.column("n_tokens")),
            budget_tokens,
        )
        t = batch.filter(fits)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "stopword_ratio_e5": t.column("stopword_ratio_e5"),
                "n_tokens": t.column("n_tokens"),
            }
        )

    return ranked.map_batches(keep, batch_format="pyarrow")
