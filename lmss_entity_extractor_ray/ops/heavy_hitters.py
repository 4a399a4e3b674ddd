"""Exact distributed heavy hitters (top-k tokens by corpus frequency).

Two passes, both bounded — the full ``groupby(token)`` it replaces is an
unbounded-vocabulary all-to-all exchange:

1. **Candidate generation** (pigeonhole): a token with GLOBAL count >
   N/m must have count > N_b/m in at least one block (if it were ≤ in
   every block the sum would be ≤ N/m), and at most m-1 tokens per block
   can exceed that bar.  Each block emits its local heavies; the union —
   Zipf-shaped corpora repeat the same heavies everywhere — folds through
   the bounded coordinator merge.
2. **Exact verification**: broadcast the candidate set once, count ONLY
   candidates per block (vectorized ``is_in`` + Arrow group_by), fold the
   bounded partials.

**Certificate**: every non-candidate has global count ≤ N/m, so if the
k-th candidate's exact count ≥ N/m the top-k is PROVABLY exact — checked
at runtime, loud ValueError otherwise (raise ``m``).  Ordering:
(count desc, token asc), ties included deterministically.

Scale note: the candidate union is bounded by (m-1) × blocks in theory
but by the corpus' distinct-heavy vocabulary in practice; the coordinator
fold's ``max_groups`` cap fails loudly if a pathological corpus blows it
up — raise ``m``'s bar or use the full groupby path then.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from .combine import combine_partials
from .dedup import exact_tokens


def _block_token_counts(batch: pa.Table) -> pa.Table:
    toks: list = []
    for t in batch.column("text").to_pylist():
        toks.extend(exact_tokens(t))
    if not toks:
        return pa.table({"token": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    t1 = pa.table({"token": pa.array(toks, pa.string())})
    g = t1.group_by(["token"]).aggregate([([], "count_all")])
    return g.rename_columns(["token", "n"])


def top_tokens(ds: rd.Dataset, k: int = 20, m: int = 512) -> rd.Dataset:
    """Exact top-k (token, n) by corpus frequency; see module docstring."""

    def candidates_partial(batch: pa.Table) -> pa.Table:
        g = _block_token_counts(batch)
        if g.num_rows == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "p_total": pa.array([], pa.int64())})
        total = int(pc.sum(g.column("n")).as_py())
        heavy = g.filter(pc.greater(g.column("n"), total / m))
        # the block's token total rides on a sentinel row ("" can never be a
        # token — exact_tokens drops empties) so N needs no extra pass and
        # heavy-less blocks still contribute their mass to the certificate
        return pa.table(
            {
                "token": pa.concat_arrays(
                    [pa.array([""], pa.string()),
                     heavy.column("token").combine_chunks()]
                ),
                "p_total": pa.array([total] + [0] * heavy.num_rows, pa.int64()),
            }
        )

    cand_tbl = combine_partials(
        ds.map_batches(candidates_partial, batch_format="pyarrow"),
        keys=["token"],
        aggs=[("p_total", "sum", "p_total")],
        schema=pa.schema([("token", pa.string()), ("p_total", pa.int64())]),
    )
    n_corpus = int(pc.sum(cand_tbl.column("p_total")).as_py() or 0)
    cand_tbl = cand_tbl.filter(pc.not_equal(cand_tbl.column("token"), ""))
    cand_set = cand_tbl.column("token").combine_chunks()
    if len(cand_set) == 0:
        if n_corpus == 0:  # empty corpus: the empty top-k is exact
            return rd.from_arrow(
                pa.table({"token": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
            )
        raise ValueError(
            f"top_tokens: no block-heavy candidates over {n_corpus} tokens "
            f"(near-uniform vocabulary) — raise m (was {m})"
        )
    cand_ref = ray.put(cand_set)

    def verify_partial(batch: pa.Table) -> pa.Table:
        cands = ray.get(cand_ref)
        g = _block_token_counts(batch)
        keep = g.filter(pc.is_in(g.column("token"), value_set=cands))
        return keep.rename_columns(["token", "p_n"])

    counts = combine_partials(
        ds.map_batches(verify_partial, batch_format="pyarrow"),
        keys=["token"],
        aggs=[("p_n", "sum", "n")],
        schema=pa.schema([("token", pa.string()), ("p_n", pa.int64())]),
    )
    order = pc.sort_indices(
        counts, sort_keys=[("n", "descending"), ("token", "ascending")]
    )
    top = counts.take(order[: min(k, counts.num_rows)])
    # certificate: every NON-candidate has global count <= N/m (equality is
    # reachable: count_b == N_b/m in every block is never a candidate), and
    # the (count desc, token asc) tie-break means a non-candidate tied at
    # exactly the ceiling could still belong to the true top-k — so the k-th
    # candidate must STRICTLY beat the ceiling (integer compare, no float)
    kth = int(top.column("n")[-1].as_py()) if top.num_rows else 0
    if top.num_rows < k or kth * m <= n_corpus:
        raise ValueError(
            f"top_tokens: cannot certify exactness — k-th candidate count "
            f"{kth} (of {top.num_rows} candidates) must strictly beat the "
            f"non-candidate ceiling {n_corpus / m:.1f}; raise m (was {m})"
        )
    return rd.from_arrow(top)
