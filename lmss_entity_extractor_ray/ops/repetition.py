"""Gopher-style repetition / diversity statistics per document.

Rae et al. (Gopher, arXiv:2112.11446) filter web text on within-document
repetition signals: fraction of duplicated n-grams, most-frequent-token
share, distinct-token ratio.  This operator computes the per-document
signals a quality gate consumes:

- ``n_tokens`` — whitespace token count (``exact_tokens`` convention)
- ``distinct_token_frac_e5`` — |distinct tokens| / n_tokens
- ``top_token_frac_e5`` — max term frequency / n_tokens
- ``dup_bigram_frac_e5`` — 1 − |distinct bigrams| / (n_tokens − 1)

Fractions ship e5-scaled (floor(x·1e5 + 0.5) as int64), the engine-wide
portable quantization.  Zero-token docs score 0 everywhere;
``dup_bigram_frac_e5`` is 0 when a doc has fewer than 2 tokens.

Shape: stateless vectorized ``map_batches``, no shuffle — the per-(doc,
term) counting is Arrow C++ ``Table.group_by`` over the batch's exploded
token column (two grouped aggregations), never a Python counter per doc.
SQL-expressible verbatim (unnest + two GROUP BYs), so the operator is
driver-oracle-checkable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .arrow_np import col_np
from .dedup import exact_tokens


def _e5(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 100_000.0 + 0.5).astype(np.int64)


def repetition_batch(batch: pa.Table) -> pa.Table:
    ids = col_np(batch, "doc_id")
    n = len(ids)
    texts = batch.column("text").to_pylist()

    toks_flat: list = []
    lens = np.zeros(n, dtype=np.int64)
    for i, t in enumerate(texts):
        toks = exact_tokens(t)
        lens[i] = len(toks)
        toks_flat.extend(toks)

    n_tokens = lens
    distinct_frac = np.zeros(n, dtype=np.float64)
    top_frac = np.zeros(n, dtype=np.float64)
    dup_bg_frac = np.zeros(n, dtype=np.float64)

    total = int(lens.sum())
    if total:
        did = np.repeat(ids, lens)
        tok_col = pa.array(toks_flat, pa.string())
        t1 = pa.table({"d": pa.array(did, pa.int64()), "t": tok_col})
        # (doc, term) → tf, then doc → (Σtf, max tf, |distinct|): both grouped
        # aggregations run in Arrow C++ over the whole batch at once
        g1 = t1.group_by(["d", "t"]).aggregate([([], "count_all")])
        g2 = (
            g1.group_by("d")
            .aggregate([("count_all", "sum"), ("count_all", "max"), ([], "count_all")])
            .rename_columns(["d", "sum_tf", "max_tf", "n_distinct"])
        )
        order = np.argsort(ids, kind="stable")
        pos = order[np.searchsorted(ids[order], col_np(g2, "d"))]
        nt = col_np(g2, "sum_tf").astype(np.float64)
        distinct_frac[pos] = col_np(g2, "n_distinct") / nt
        top_frac[pos] = col_np(g2, "max_tf") / nt

        # bigrams: join each token with its successor (one Arrow kernel over
        # the flat column), masking pairs that straddle a doc boundary
        if total >= 2:
            flat = t1.column("t").combine_chunks()
            left = flat.slice(0, total - 1)
            right = flat.slice(1, total - 1)
            bg = pc.binary_join_element_wise(left, right, " ")
            valid = np.ones(total - 1, dtype=bool)
            ends = np.cumsum(lens)[:-1]  # first token index of each next doc
            valid[ends[(ends > 0) & (ends < total)] - 1] = False
            bt = pa.table(
                {
                    "d": pa.array(did[: total - 1][valid], pa.int64()),
                    "b": pc.filter(bg, pa.array(valid)),
                }
            )
            if bt.num_rows:
                b1 = bt.group_by(["d", "b"]).aggregate([([], "count_all")])
                b2 = (
                    b1.group_by("d")
                    .aggregate([("count_all", "sum"), ([], "count_all")])
                    .rename_columns(["d", "total_bg", "dist_bg"])
                )
                bpos = order[np.searchsorted(ids[order], col_np(b2, "d"))]
                dup_bg_frac[bpos] = 1.0 - col_np(b2, "dist_bg") / col_np(
                    b2, "total_bg"
                ).astype(np.float64)

    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "distinct_token_frac_e5": pa.array(_e5(distinct_frac), pa.int64()),
            "top_token_frac_e5": pa.array(_e5(top_frac), pa.int64()),
            "dup_bigram_frac_e5": pa.array(_e5(dup_bg_frac), pa.int64()),
        }
    )


def repetition_stats(ds: rd.Dataset) -> rd.Dataset:
    """Per-document repetition/diversity signals (see module docstring)."""
    return ds.map_batches(repetition_batch, batch_format="pyarrow", zero_copy_batch=True)
