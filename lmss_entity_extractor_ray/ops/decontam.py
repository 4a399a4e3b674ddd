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
