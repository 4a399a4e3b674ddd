"""Similarity search over an embedding column (vec_id, embedding:list<float>).

- ``brute_force_topk`` — the exact baseline: broadcast the query matrix via
  ``ray.put``; each batch is one numpy matmul + local top-k heap; the global
  merge is a tiny sort/limit (k rows per block, not the corpus).
- ``lsh_topk`` — the scale path: random-hyperplane LSH bucketing; only the
  query's bucket (plus neighboring buckets by Hamming distance on the sketch)
  is scanned, so the per-query work is corpus_fraction ≈ 2^-planes.  Recall
  vs brute force is asserted in tests.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


def _unit(v: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(v)
    return v / n if n else v


def _e5(cos: np.ndarray) -> np.ndarray:
    """floor(x*1e5 + 0.5) as int64 — portable quantization shared with the
    DuckDB oracle (float rounding differs between engines)."""
    return np.floor(cos * 100_000.0 + 0.5).astype(np.int64)


def brute_force_topk(emb_ds: rd.Dataset, query: Sequence[float], k: int = 10) -> rd.Dataset:
    """Exact cosine top-k: per-batch matmul + per-batch top-k, then a global
    sort/limit over only (k x num_blocks) candidate rows."""
    q = _unit(np.asarray(query, dtype=np.float64))
    q_ref = ray.put(q)

    def local_topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        mat = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        cos = (mat @ qv) / norms
        take = min(k, len(ids))
        top = np.argpartition(-cos, take - 1)[:take] if take else np.array([], dtype=int)
        return pa.table(
            {
                "vec_id": pa.array(ids[top], pa.int64()),
                "cos_e5": pa.array(_e5(cos[top]), pa.int64()),
            }
        )

    return (
        emb_ds.map_batches(local_topk, batch_format="pyarrow")
        .sort(["cos_e5", "vec_id"], descending=[True, False])
        .limit(k)
    )


def knn_top1(emb_ds: rd.Dataset) -> rd.Dataset:
    """Each vector's nearest OTHER vector by cosine (a kNN self-join, k=1).

    Broadcast pattern: the full unit-normalized matrix (sorted by vec_id for
    deterministic argmax tie-breaks) is ``ray.put`` once; each batch does one
    [B, N] matmul.  Scale path: LSH-bucket both sides (lsh_bucketed) and
    join within buckets."""
    import pyarrow as _pa

    rows = _pa.concat_tables([ray.get(r) for r in emb_ds.to_arrow_refs()])
    ids = np.asarray(rows.column("vec_id").to_pylist(), dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    mat = np.asarray(rows.column("embedding").to_pylist(), dtype=np.float64)[order]
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = mat / norms
    ids_ref, unit_ref = ray.put(ids), ray.put(unit)

    def top1(batch: pa.Table) -> pa.Table:
        all_ids, all_unit = ray.get(ids_ref), ray.get(unit_ref)
        b_ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        b_mat = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        n = np.linalg.norm(b_mat, axis=1, keepdims=True)
        n[n == 0] = 1.0
        cos = (b_mat / n) @ all_unit.T
        # mask self-matches, then argmax (ties → lowest index = lowest vec_id)
        for i, vid in enumerate(b_ids):
            j = np.searchsorted(all_ids, vid)
            if j < len(all_ids) and all_ids[j] == vid:
                cos[i, j] = -np.inf
        best = np.argmax(cos, axis=1)
        best_cos = cos[np.arange(len(b_ids)), best]
        return pa.table(
            {
                "vec_id": pa.array(b_ids, pa.int64()),
                "nn_id": pa.array(all_ids[best], pa.int64()),
                "cos_e5": pa.array(_e5(best_cos), pa.int64()),
            }
        )

    return emb_ds.map_batches(top1, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# random-hyperplane LSH bucketing (IVF-style scale path)
# ---------------------------------------------------------------------------

def _planes(dim: int, n_planes: int, seed: int = 13) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim))


def _bucket_of(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (mat @ planes.T) > 0
    return bits.dot(1 << np.arange(planes.shape[0]))


def lsh_bucketed(emb_ds: rd.Dataset, dim: int, n_planes: int = 6, seed: int = 13) -> rd.Dataset:
    """Add a ``bucket`` column (int64 hyperplane sketch) — one map, no
    shuffle; downstream groupby(bucket) co-locates similar vectors."""
    planes_ref = ray.put(_planes(dim, n_planes, seed))

    def add_bucket(batch: pa.Table) -> pa.Table:
        planes = ray.get(planes_ref)
        mat = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        b = _bucket_of(mat, planes).astype(np.int64)
        return batch.append_column("bucket", pa.array(b, pa.int64()))

    return emb_ds.map_batches(add_bucket, batch_format="pyarrow")


def lsh_topk(
    emb_ds: rd.Dataset,
    query: Sequence[float],
    k: int = 10,
    n_planes: int = 6,
    hamming_radius: int = 1,
    seed: int = 13,
) -> rd.Dataset:
    """Approximate top-k: score only rows whose LSH bucket is within
    ``hamming_radius`` of the query's bucket."""
    q = _unit(np.asarray(query, dtype=np.float64))
    planes = _planes(len(q), n_planes, seed)
    q_bucket = int(_bucket_of(q[None, :], planes)[0])
    ok_buckets = {q_bucket}
    if hamming_radius >= 1:
        for i in range(n_planes):
            ok_buckets.add(q_bucket ^ (1 << i))
    if hamming_radius >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                ok_buckets.add(q_bucket ^ (1 << i) ^ (1 << j))
    q_ref = ray.put(q)
    planes_ref = ray.put(planes)
    ok_ref = ray.put(ok_buckets)

    def scan(batch: pa.Table) -> pa.Table:
        qv, pl, ok = ray.get(q_ref), ray.get(planes_ref), ray.get(ok_ref)
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        mat = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        buckets = _bucket_of(mat, pl)
        mask = np.isin(buckets, list(ok))
        if not mask.any():
            return pa.table({"vec_id": pa.array([], pa.int64()), "cos_e5": pa.array([], pa.int64())})
        sel = mat[mask]
        norms = np.linalg.norm(sel, axis=1)
        norms[norms == 0] = 1.0
        cos = (sel @ qv) / norms
        return pa.table(
            {
                "vec_id": pa.array(ids[mask], pa.int64()),
                "cos_e5": pa.array(_e5(cos), pa.int64()),
            }
        )

    return (
        emb_ds.map_batches(scan, batch_format="pyarrow")
        .sort(["cos_e5", "vec_id"], descending=[True, False])
        .limit(k)
    )
