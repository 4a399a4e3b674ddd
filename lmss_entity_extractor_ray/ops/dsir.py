"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick the raw-corpus subset whose n-gram distribution
looks most like a TARGET set (the canonical recipe for "select web text
that resembles Wikipedia/books before pretraining").

The paper's estimator, re-expressed over this engine's primitives:

1. fit two bag-of-ngrams distributions over unigrams+bigrams — target
   ``p`` (rows flagged by ``target_col``) and raw ``q`` (all rows) — with
   add-0.5 smoothing over the raw vocabulary;
2. per-document log importance weight  log w(d) = Σ_g f_d[g] · ln(p̂g/q̂g)
   (feature counts WITH multiplicity, exactly the paper's hashed-ngram
   inner product);
3. resample without replacement via Gumbel-top-k on log w + g_i — the
   standard Gumbel trick the paper uses; ``gumbel_salt=None`` degenerates
   to plain top-k by weight.

Exactness contract (what makes the driver's DuckDB oracle possible):
per-gram log-ratios are quantized ONCE globally to integers
``w5(g) = floor(1e5 · ln(((c_p+0.5)·(N_q+0.5·V)) / ((N_p+0.5·V)·(c_q+0.5))))``
— the expression is written with IDENTICAL operation order on both sides
so the float64 value (and hence the floor) agrees bit-for-bit, exactly
like ops/lm_score.py's quantize-then-sum NLL — and per-doc sums of those
integers are order-independent.  The Gumbel noise is derived from the
Knuth multiplicative hash of doc_id (same family as ops/sampling), so it
too is reproducible in SQL:  g5 = floor(1e5 · −ln(−ln(u))) with
u = (((doc_id+salt)·2654435761) mod 2³² + 0.5) / 2³².

Distributed shape (100 TB story): gram counting is map-side partials
(one bounded Counter per block) folded through the bounded coordinator
merge — the unigram+bigram vocabulary is the bound; for an open
trillion-doc vocabulary swap the fold for the hash-partitioned exchange
(distinct_tokens_exact's shape) and/or enable ``num_buckets``, which
hashes grams into a FIXED bucket space (the paper's actual memory bound;
10^4 buckets in the original).  The weight table broadcasts once via
``ray.put``; scoring is map-only; selection ships only k rows per block
to the driver.  ``num_buckets`` trades the SQL oracle (the bucket hash
is not SQL-reproducible) for O(buckets) state — pytest pins it against
exact mode instead.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from .arrow_np import col_np
from .combine import combine_partials
from .dedup import _stable_hash, exact_tokens

_KNUTH = 2654435761
_M32 = 4294967296


def _doc_grams(text: str) -> List[str]:
    """Unigrams + bigrams WITH multiplicity (single-space joined, matching
    the SQL  t[i] || ' ' || t[i+1]  construction)."""
    toks = exact_tokens(text)
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def dsir_weights(
    ds: rd.Dataset,
    target_col: str = "is_target",
    num_buckets: Optional[int] = None,
) -> rd.Dataset:
    """(doc_id, logw_e5) per document — the quantized DSIR log importance
    weight; docs with no tokens score 0.  ``ds`` needs doc_id, text and an
    integer/bool ``target_col`` flagging the target rows."""

    def bucketed(grams: List[str]) -> list:
        if num_buckets is None:
            return grams
        return [_stable_hash(g) % num_buckets for g in grams]

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        cq: Counter = Counter()
        cp: Counter = Counter()
        tgt = col_np(batch, target_col).astype(bool)
        for text, is_t in zip(batch.column("text").to_pylist(), tgt):
            gs = bucketed(_doc_grams(text))
            cq.update(gs)
            if is_t:
                cp.update(gs)
        keys = list(cq.keys())
        gram_t = (
            pa.array(keys, pa.string())
            if num_buckets is None
            else pa.array(keys, pa.int64())
        )
        return pa.table(
            {
                "gram": gram_t,
                "p_q": pa.array([cq[k] for k in keys], pa.int64()),
                "p_p": pa.array([cp.get(k, 0) for k in keys], pa.int64()),
            }
        )

    gram_dt = pa.string() if num_buckets is None else pa.int64()
    counts = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["gram"],
        aggs=[("p_q", "sum", "c_q"), ("p_p", "sum", "c_p")],
        schema=pa.schema(
            [("gram", gram_dt), ("p_q", pa.int64()), ("p_p", pa.int64())]
        ),
    )
    cq = counts.column("c_q").to_numpy(zero_copy_only=False).astype(np.float64)
    cp = counts.column("c_p").to_numpy(zero_copy_only=False).astype(np.float64)
    V = float(len(cq))
    Nq = float(cq.sum())
    Np = float(cp.sum())
    if len(cq):
        # IDENTICAL operation order to the SQL oracle's expression — one
        # add per operand, one multiply per side, one divide, ln, floor
        w5 = np.floor(
            100_000.0
            * np.log(((cp + 0.5) * (Nq + 0.5 * V)) / ((Np + 0.5 * V) * (cq + 0.5)))
        ).astype(np.int64)
    else:
        w5 = np.zeros(0, dtype=np.int64)
    w_map = dict(zip(counts.column("gram").to_pylist(), w5.tolist()))
    w_ref = ray.put(w_map)

    def score(batch: pa.Table) -> pa.Table:
        wm = ray.get(w_ref)
        sums = [
            sum(wm[g] for g in bucketed(_doc_grams(t)))
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "logw_e5": pa.array(sums, pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def _gumbel_e5(ids: np.ndarray, salt: int) -> np.ndarray:
    """floor(1e5·−ln(−ln u)) with the Knuth-hash uniform — reproducible in
    SQL with the identical expression."""
    u = (((ids.astype(np.int64) + salt) * _KNUTH) % _M32 + 0.5) / _M32
    return np.floor(100_000.0 * -np.log(-np.log(u))).astype(np.int64)


def dsir_select(
    ds: rd.Dataset,
    k: int,
    target_col: str = "is_target",
    gumbel_salt: Optional[int] = None,
    num_buckets: Optional[int] = None,
) -> pa.Table:
    """Top-k resample: (doc_id, logw_e5, score_e5) for the k docs with the
    highest score, ordered (score desc, doc_id asc).  score = logw_e5 plus
    quantized Gumbel noise when ``gumbel_salt`` is set (the paper's
    sampling-without-replacement trick), else the weight itself.

    Selection is distributed: every block keeps only its own top-k, the
    driver merges k × blocks rows — never the corpus."""
    weights = dsir_weights(ds, target_col=target_col, num_buckets=num_buckets)

    def block_topk(batch: pa.Table) -> pa.Table:
        ids = col_np(batch, "doc_id")
        logw = col_np(batch, "logw_e5")
        score = logw + _gumbel_e5(ids, gumbel_salt) if gumbel_salt is not None else logw
        order = np.lexsort((ids, -score))[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "logw_e5": pa.array(logw[order], pa.int64()),
                "score_e5": pa.array(score[order], pa.int64()),
            }
        )

    parts = [
        b
        for b in weights.map_batches(block_topk, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
        if b.num_rows
    ]
    if not parts:
        return pa.schema(
            [("doc_id", pa.int64()), ("logw_e5", pa.int64()), ("score_e5", pa.int64())]
        ).empty_table()
    merged = pa.concat_tables(parts)
    final = merged.sort_by([("score_e5", "descending"), ("doc_id", "ascending")])
    return final.slice(0, k)
