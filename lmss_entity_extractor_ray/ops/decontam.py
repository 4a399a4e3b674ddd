"""Benchmark decontamination: drop training documents that share any token
k-gram with an evaluation/benchmark set.

The standard contamination check for LLM training corpora (n-gram overlap
against held-out eval sets).  The benchmark side is SMALL by definition
(eval suites are thousands of documents, not billions), so its distinct
k-gram set broadcasts once via ``ray.put`` and the corpus pass is a single
embarrassingly-parallel ``map_batches`` — membership is one Arrow C++
``is_in`` over the batch's concatenated shingle column plus a
``np.add.reduceat`` per-doc any-hit reduction.  No shuffle touches the
corpus: at 100 TB this is the only shape that works (a join would shuffle
petabytes to probe megabytes).

Shingles are the literal lowercased k-token strings (``exact_tokens`` —
the engine-wide RE2-compatible tokenization), so the whole operator is
SQL-expressible (unnest + semi-join) and driver-oracle-checkable.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from .arrow_np import col_np
from .dedup import exact_tokens


def _shingle_rows(texts, shingle_k: int):
    """Concatenated distinct-per-doc shingle strings + per-doc run lengths."""
    all_sh, lens = [], np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = exact_tokens(t)
        if len(toks) < shingle_k:
            continue
        uniq = {
            " ".join(toks[j : j + shingle_k])
            for j in range(len(toks) - shingle_k + 1)
        }
        lens[i] = len(uniq)
        all_sh.extend(uniq)
    return pa.array(all_sh, pa.string()), lens


def benchmark_shingles(
    benchmark_ds: rd.Dataset, shingle_k: int = 3, text_col: str = "text"
) -> pa.Array:
    """Distinct k-gram strings of the benchmark set, collected to the driver
    (benchmark = eval-set sized by contract; NOT for corpus-scale inputs)."""
    seen: set = set()

    def sh(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        out: set = set()
        for t in texts:
            toks = exact_tokens(t)
            if len(toks) >= shingle_k:
                out.update(
                    " ".join(toks[j : j + shingle_k])
                    for j in range(len(toks) - shingle_k + 1)
                )
        return pa.table({"s": pa.array(sorted(out), pa.string())})

    for b in benchmark_ds.map_batches(sh, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        seen.update(b.column("s").to_pylist())
    return pa.array(sorted(seen), pa.string())


def decontaminate(
    docs_ds: rd.Dataset,
    benchmark_ds: rd.Dataset,
    shingle_k: int = 3,
    id_col: str = "doc_id",
    keep_cols: Optional[list] = None,
) -> rd.Dataset:
    """Documents from ``docs_ds`` that share NO k-gram with the benchmark
    set (docs too short to have a k-gram are trivially clean and kept).

    The caller is responsible for excluding the benchmark documents
    themselves from ``docs_ds`` if they overlap (a benchmark doc always
    self-contaminates)."""
    keep_cols = keep_cols or [id_col]
    bench = benchmark_shingles(benchmark_ds, shingle_k=shingle_k)
    bench_ref = ray.put(bench)

    def clean(batch: pa.Table) -> pa.Table:
        bench_arr = ray.get(bench_ref)
        ids = col_np(batch, id_col)
        if not len(ids):
            return batch.select(keep_cols)
        sh, lens = _shingle_rows(batch.column("text").to_pylist(), shingle_k)
        if len(sh) == 0 or len(bench_arr) == 0:
            return batch.select(keep_cols)
        hit = np.asarray(pc.is_in(sh, value_set=bench_arr)).astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        # docs with zero shingles reduce over an empty run → reduceat would
        # misbehave; mask them clean explicitly
        has = lens > 0
        per_doc = np.zeros(len(ids), dtype=np.int64)
        if has.any():
            # reduceat over only the non-empty runs
            nz_starts = starts[has]
            sums = np.add.reduceat(hit, nz_starts)
            # reduceat folds trailing runs together when starts repeat — but
            # nz_starts is strictly increasing (each run is non-empty)
            per_doc[has] = sums
        return batch.filter(pa.array(per_doc == 0)).select(keep_cols)

    return docs_ds.map_batches(clean, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# fuzzy (containment) decontamination
# ---------------------------------------------------------------------------

def eval_shingle_postings(
    benchmark_ds: rd.Dataset,
    shingle_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """CSR inverted index over the eval set's distinct k-grams, collected to
    the driver (eval-set sized by contract): ``(distinct_shingles sorted,
    offsets, eval_dense_row_ids, eval_ids)`` where shingle i's posting list
    is ``eval_dense_row_ids[offsets[i]:offsets[i+1]]`` (dense 0..E-1 rows
    into ``eval_ids``)."""
    pairs: set = set()

    def sh(batch: pa.Table) -> pa.Table:
        out_ids, out_s = [], []
        for eid, t in zip(
            batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
        ):
            toks = exact_tokens(t)
            if len(toks) < shingle_k:
                continue
            for s in {
                " ".join(toks[j : j + shingle_k])
                for j in range(len(toks) - shingle_k + 1)
            }:
                out_ids.append(eid)
                out_s.append(s)
        return pa.table(
            {"eval_id": pa.array(out_ids, pa.int64()), "s": pa.array(out_s, pa.string())}
        )

    for b in benchmark_ds.map_batches(sh, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        pairs.update(zip(b.column("eval_id").to_pylist(), b.column("s").to_pylist()))
    if not pairs:
        return (
            pa.array([], pa.string()),
            np.zeros(1, dtype=np.int64),
            np.array([], dtype=np.int64),
            np.array([], dtype=np.int64),
        )
    eval_ids = np.array(sorted({e for e, _ in pairs}), dtype=np.int64)
    dense = {int(e): i for i, e in enumerate(eval_ids)}
    rows = sorted((s, dense[e]) for e, s in pairs)
    strs = [s for s, _ in rows]
    posts = np.array([d for _, d in rows], dtype=np.int64)
    new = np.concatenate(
        [[True], [strs[i] != strs[i - 1] for i in range(1, len(strs))]]
    )
    distinct = pa.array([s for s, n in zip(strs, new) if n], pa.string())
    offsets = np.append(np.flatnonzero(new), len(strs)).astype(np.int64)
    return distinct, offsets, posts, eval_ids


def fuzzy_decontaminate(
    docs_ds: rd.Dataset,
    benchmark_ds: rd.Dataset,
    tau=(4, 5),
    shingle_k: int = 3,
    id_col: str = "doc_id",
    keep_cols: Optional[list] = None,
) -> rd.Dataset:
    """CONTAINMENT-style fuzzy decontamination: drop a training document
    when, for ANY single eval document, the fraction of the training doc's
    distinct k-grams that also appear in that eval doc reaches ``tau``
    (given as an exact integer ratio ``(num, den)`` so the threshold
    compare is integer arithmetic on both the Ray and SQL sides).

    This is the fuzzy sibling of ``decontaminate`` (any-overlap): the
    standard LLM eval-contamination rule used when eval docs legitimately
    share common phrases with the corpus — e.g. "≥ 80% of the doc's
    n-grams occur in one benchmark item".  Same 100-TB shape as the exact
    pass: the eval side broadcasts once as a CSR inverted index
    (``eval_shingle_postings``) and the corpus pass is map-only — per
    batch, one Arrow ``index_in`` against the eval shingle vocabulary, a
    vectorized CSR expansion to (doc, eval) hit pairs, and an
    integer-exact per-doc max-containment reduction.  No shuffle touches
    the corpus.  Docs with no k-gram are trivially clean."""
    keep_cols = keep_cols or [id_col]
    tau_num, tau_den = int(tau[0]), int(tau[1])
    distinct, offsets, posts, eval_ids = eval_shingle_postings(
        benchmark_ds, shingle_k=shingle_k
    )
    E = len(eval_ids)
    idx_ref = ray.put((distinct, offsets, posts))

    def clean(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or E == 0:
            return batch.select(keep_cols)
        distinct_sh, offs, postings = ray.get(idx_ref)
        sh, lens = _shingle_rows(batch.column("text").to_pylist(), shingle_k)
        if len(sh) == 0:
            return batch.select(keep_cols)
        idx = pc.fill_null(pc.index_in(sh, value_set=distinct_sh), -1)
        idx_np = idx.to_numpy(zero_copy_only=False).astype(np.int64)
        doc_of = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)
        m = idx_np >= 0
        drop = np.zeros(batch.num_rows, dtype=bool)
        if m.any():
            hit_idx, hit_doc = idx_np[m], doc_of[m]
            reps = offs[hit_idx + 1] - offs[hit_idx]
            pos_starts = offs[hit_idx]
            nz = reps > 0
            reps, pos_starts, hit_doc = reps[nz], pos_starts[nz], hit_doc[nz]
            if reps.size:
                cum = np.cumsum(reps)
                # CSR gather: flat positions of every (hit, posting) pair
                flat = (
                    np.arange(int(cum[-1]), dtype=np.int64)
                    - np.repeat(cum - reps, reps)
                    + np.repeat(pos_starts, reps)
                )
                key = np.repeat(hit_doc, reps) * E + postings[flat]
                u, c = np.unique(key, return_counts=True)
                docu = u // E
                run = np.concatenate([[True], docu[1:] != docu[:-1]])
                max_c = np.maximum.reduceat(c, np.flatnonzero(run))
                d = docu[run]
                drop[d] = max_c * tau_den >= tau_num * lens[d]
        return batch.filter(pa.array(~drop)).select(keep_cols)

    return docs_ds.map_batches(clean, batch_format="pyarrow")
