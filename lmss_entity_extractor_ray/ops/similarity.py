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

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from .arrow_np import col_np, emb_np


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
        ids = col_np(batch, "vec_id")
        if not len(ids):
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cos_e5": pa.array([], pa.int64())})
        mat = emb_np(batch)
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


def multi_query_topk(
    emb_ds: rd.Dataset, queries: Sequence[tuple], k: int = 10
) -> rd.Dataset:
    """Exact cosine top-k for MANY queries at once: broadcast the query
    matrix via ``ray.put``, each batch is ONE [rows, n_queries] matmul, each
    (block, query) keeps its local top-k by the FINAL ordering key
    (cos_e5 desc, vec_id asc), and the global per-query merge is a grouped
    top-k over only k × blocks × n_queries candidate rows (ops/topk.py — one
    bounded exchange, never the corpus).

    ``queries``: sequence of (query_id, vector).  This is the realistic
    batched-retrieval shape — per-query work amortizes the corpus scan."""
    from .topk import group_topk

    qids = np.array([q[0] for q in queries], dtype=np.int64)
    qmat = np.stack([_unit(np.asarray(q[1], dtype=np.float64)) for q in queries])
    q_ref = ray.put((qids, qmat))

    def local_topk(batch: pa.Table) -> pa.Table:
        ids_q, qm = ray.get(q_ref)
        ids = col_np(batch, "vec_id")
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "cos_e5": pa.array([], pa.int64()),
            }
        )
        if not len(ids):
            return empty
        mat = emb_np(batch)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        # same float formula as brute_force_topk: (mat @ q) / norms
        cos = (mat @ qm.T) / norms[:, None]  # [rows, n_queries]
        e5 = _e5(cos)
        take = min(k, len(ids))
        out_q, out_v, out_c = [], [], []
        for j in range(len(ids_q)):
            # local selection uses the FINAL key (e5 desc, vec_id asc) so a
            # block never drops a row the global tie-break would have kept
            order = np.lexsort((ids, -e5[:, j]))[:take]
            out_q.append(np.full(take, ids_q[j], dtype=np.int64))
            out_v.append(ids[order])
            out_c.append(e5[order, j])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "cos_e5": pa.array(np.concatenate(out_c), pa.int64()),
            }
        )

    cands = emb_ds.map_batches(local_topk, batch_format="pyarrow")
    return group_topk(cands, key="query_id", value="cos_e5", id_col="vec_id", k=k)


def kmeans_assign(
    emb_ds: rd.Dataset, n_centroids: int = 8, seed: int = 17
) -> rd.Dataset:
    """(vec_id, cluster_id): nearest spherical-k-means centroid per vector —
    the clustering primitive behind semantic dedup / diversity balancing.
    Centroids train on a layout-independent bottom-k hash sample
    (``ivf_centroids``), broadcast once; assignment is one matmul+argmax per
    batch.  Deterministic for a fixed seed regardless of partitioning."""
    cents = ivf_centroids(emb_ds, n_centroids=n_centroids, seed=seed)
    cents_ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        cs = ray.get(cents_ref)
        ids = col_np(batch, "vec_id")
        if not len(ids):
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cluster_id": pa.array([], pa.int64())})
        mat = emb_np(batch)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        a = np.argmax((mat / norms) @ cs.T, axis=1).astype(np.int64)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster_id": pa.array(a, pa.int64()),
            }
        )

    return emb_ds.map_batches(assign, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# exact pairwise kernels via block-pair tiling
# ---------------------------------------------------------------------------
# An exact all-pairs cosine computation is inherently O(N²) FLOPs, but it
# does NOT require materializing the table anywhere: tile the cross product
# over block pairs — every tile is one Ray task that reads exactly TWO
# blocks from the object store (never the whole matrix, never the driver).
# Expressing this in the Dataset API would need a cross-join; raw Ray tasks
# over `to_arrow_refs()` block refs are the documented fallback for that.
# Partitioning assumption: blocks have disjoint vec_ids.  For approximate
# search at corpus scale use the LSH-bucketed path below instead.

_I64MAX = np.iinfo(np.int64).max


def _ids_unit(tbl: pa.Table):
    ids = col_np(tbl, "vec_id")
    mat = emb_np(tbl)
    if mat.ndim == 1:  # zero rows
        mat = mat.reshape(0, 0)
    norms = np.linalg.norm(mat, axis=1, keepdims=True) if len(ids) else np.ones((0, 1))
    norms[norms == 0] = 1.0
    return ids, mat / norms


def _tile_count(n_cpus: int) -> int:
    # B blocks → B(B+1)/2 tiles; aim for ~2 tiles per CPU
    return max(2, int((4 * n_cpus) ** 0.5))


def pairwise_block_refs(emb_ds: rd.Dataset):
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return emb_ds.repartition(_tile_count(cpus)).to_arrow_refs()


@ray.remote
def _pairs_tile(t1: pa.Table, t2: pa.Table, threshold: float, same: bool) -> pa.Table:
    """One tile of the all-pairs cosine cross product.

    Diagonal tiles (same=True) see each unordered within-block pair twice
    (plus self-pairs), so they filter to a < b.  Off-diagonal tiles see each
    cross-block pair exactly ONCE — tile (j, i) is never scheduled — so they
    must emit every qualifying pair, normalized to (min, max); filtering
    a < b there would silently drop pairs whenever block ids are not
    globally ascending (filtered / shuffled / unioned inputs)."""
    ids1, u1 = _ids_unit(t1)
    ids2, u2 = _ids_unit(t2)
    if not len(ids1) or not len(ids2):
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                         "cos_e5": pa.array([], pa.int64())})
    cos = u1 @ u2.T
    ii, jj = np.nonzero(cos >= threshold)
    a, b = ids1[ii], ids2[jj]
    if same:
        keep = a < b  # each unordered pair exactly once; drops self-pairs too
        a, b, scores = a[keep], b[keep], cos[ii, jj][keep]
    else:
        keep = a != b  # disjoint-id contract; drop pathological dup ids
        a, b, scores = a[keep], b[keep], cos[ii, jj][keep]
        a, b = np.minimum(a, b), np.maximum(a, b)
    return pa.table(
        {
            "a": pa.array(a, pa.int64()),
            "b": pa.array(b, pa.int64()),
            "cos_e5": pa.array(_e5(scores), pa.int64()),
        }
    )


@ray.remote(num_returns=2)
def _top1_tile(t1: pa.Table, t2: pa.Table, same: bool):
    """Partial nearest-neighbor of t1 rows against t2 (and vice versa when
    the tile is off-diagonal).  Ties break to the LOWEST nn_id within the
    tile; the reduce step breaks ties across tiles the same way."""
    empty = pa.table({"vec_id": pa.array([], pa.int64()), "nn_id": pa.array([], pa.int64()),
                      "cos": pa.array([], pa.float64())})
    ids1, u1 = _ids_unit(t1)
    ids2, u2 = _ids_unit(t2)
    if not len(ids1) or not len(ids2):
        return empty, empty
    cos = u1 @ u2.T
    if same:
        np.fill_diagonal(cos, -np.inf)

    def side(c, row_ids, col_ids):
        best = c.max(axis=1)
        nn = np.where(c == best[:, None], col_ids[None, :], _I64MAX).min(axis=1)
        return pa.table(
            {
                "vec_id": pa.array(row_ids, pa.int64()),
                "nn_id": pa.array(nn, pa.int64()),
                "cos": pa.array(best, pa.float64()),
            }
        )

    left = side(cos, ids1, ids2)
    right = empty if same else side(cos.T, ids2, ids1)
    return left, right


@ray.remote
def _top1_reduce(*parts: pa.Table) -> pa.Table:
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return pa.table({"vec_id": pa.array([], pa.int64()), "nn_id": pa.array([], pa.int64()),
                         "cos_e5": pa.array([], pa.int64())})
    # every partial for a block preserves the block's row order
    ids = col_np(parts[0], "vec_id")
    cos = np.stack([col_np(p, "cos") for p in parts])
    nn = np.stack([col_np(p, "nn_id") for p in parts])
    best = cos.max(axis=0)
    nn_best = np.where(cos == best[None, :], nn, _I64MAX).min(axis=0)
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "nn_id": pa.array(nn_best, pa.int64()),
            "cos_e5": pa.array(_e5(best), pa.int64()),
        }
    )


def knn_top1(emb_ds: rd.Dataset) -> rd.Dataset:
    """Each vector's nearest OTHER vector by exact cosine (kNN self-join,
    k=1), via block-pair tiling + per-block tree reduce.

    Tile (i, j) computes both directions of the i×j sub-matmul in one task;
    a second task round reduces each block's ≤ 2B-1 partials (argmax with
    min-nn_id tie-break, matching ``ORDER BY cos DESC, nn_id``).  No task or
    the driver ever holds more than two blocks — the whole-matrix broadcast
    this replaces died at corpus scale.  Exact-quadratic by contract; the
    approximate scale path is lsh_bucketed + within-bucket join."""
    refs = pairwise_block_refs(emb_ds)
    partials: dict = {i: [] for i in range(len(refs))}
    for i in range(len(refs)):
        for j in range(i, len(refs)):
            left, right = _top1_tile.remote(refs[i], refs[j], i == j)
            partials[i].append(left)
            if i != j:
                partials[j].append(right)
    reduced = [_top1_reduce.remote(*partials[i]) for i in range(len(refs))]
    return rd.from_arrow_refs(reduced)


# ---------------------------------------------------------------------------
# IVF (k-means coarse quantizer) approximate search
# ---------------------------------------------------------------------------

def ivf_centroids(
    emb_ds: rd.Dataset, n_centroids: int = 16, sample_k: int = 2048,
    iters: int = 8, seed: int = 17, key: str = "vec_id",
) -> np.ndarray:
    """Deterministic spherical k-means centroids trained on a bottom-k hash
    sample (ops/sampling.reservoir_sample — layout-independent, so the
    centroids are reproducible across runs and partitionings).  The sample
    and the k-means loop are driver-side by design: training data is
    O(sample_k), never the corpus."""
    from .sampling import reservoir_sample

    tbl = reservoir_sample(emb_ds, sample_k, seed=seed, key=key)
    mat = emb_np(tbl)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = mat / norms
    rng = np.random.RandomState(seed)
    cents = unit[rng.choice(len(unit), size=min(n_centroids, len(unit)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(unit @ cents.T, axis=1)
        for c in range(cents.shape[0]):
            members = unit[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cents[c] = m / n
    return cents


def ivf_topk(
    emb_ds: rd.Dataset, query: Sequence[float], k: int = 10,
    n_centroids: int = 16, n_probe: int = 4, seed: int = 17,
) -> rd.Dataset:
    """IVF approximate top-k: scan only rows whose nearest centroid is among
    the query's ``n_probe`` closest centroids — per-query work is roughly
    the probed fraction of the corpus.  One broadcast (centroids + query),
    one map, a k·blocks-row sort: the same scale shape as lsh_topk but with
    data-adaptive buckets (tighter than random hyperplanes on clustered
    embeddings).  Recall vs brute force is asserted in tests."""
    q = _unit(np.asarray(query, dtype=np.float64))
    cents = ivf_centroids(emb_ds, n_centroids=n_centroids, seed=seed)
    probe = np.argsort(-(cents @ q))[: min(n_probe, len(cents))]
    probe_set = np.sort(probe)
    q_ref, cents_ref = ray.put(q), ray.put(cents)

    def scan(batch: pa.Table) -> pa.Table:
        qv, cs = ray.get(q_ref), ray.get(cents_ref)
        ids = col_np(batch, "vec_id")
        if not len(ids):
            return pa.table({"vec_id": pa.array([], pa.int64()), "cos_e5": pa.array([], pa.int64())})
        mat = emb_np(batch)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        assign = np.argmax(unit @ cs.T, axis=1)
        mask = np.isin(assign, probe_set)
        if not mask.any():
            return pa.table({"vec_id": pa.array([], pa.int64()), "cos_e5": pa.array([], pa.int64())})
        # same float formula as brute_force_topk so a full-probe scan is
        # bitwise-identical to the exact baseline
        cos = (mat[mask] @ qv) / norms[mask].ravel()
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


# ---------------------------------------------------------------------------
# random-hyperplane LSH bucketing (alternative bucketed scale path)
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
        mat = emb_np(batch)
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
    ``hamming_radius`` of the query's bucket (any radius; at
    ``hamming_radius == n_planes`` the ball covers every bucket and the
    result is bitwise the exact top-k — pytest-pinned)."""
    import itertools

    q = _unit(np.asarray(query, dtype=np.float64))
    planes = _planes(len(q), n_planes, seed)
    q_bucket = int(_bucket_of(q[None, :], planes)[0])
    ok_buckets = {q_bucket}
    for r in range(1, min(hamming_radius, n_planes) + 1):
        for flips in itertools.combinations(range(n_planes), r):
            m = 0
            for i in flips:
                m |= 1 << i
            ok_buckets.add(q_bucket ^ m)
    return _bucket_scan_topk(emb_ds, q, planes, ok_buckets, k)


def _multiprobe_masks(margins: np.ndarray, n_probes: int) -> list:
    """Bucket XOR masks in increasing expected-miss order — Lv et al. 2007
    "Multi-Probe LSH" query-directed probing.  A neighbor lands in a
    perturbed bucket with probability governed by how close the query sits
    to each hyperplane, so masks are emitted by ascending sum of squared
    margins of the flipped planes (heap over {shift, expand} successors —
    generates the exact sequence without enumerating 2^n_planes subsets).
    The first mask is always 0 (the home bucket)."""
    import heapq

    n = len(margins)
    masks = [0]
    if n_probes <= 1 or n == 0:
        return masks[:max(1, n_probes)]
    order = np.argsort(np.abs(margins))
    z2 = np.abs(margins)[order] ** 2
    heap = [(float(z2[0]), (0,))]  # ranks into the margin-sorted planes
    while heap and len(masks) < n_probes:
        score, ranks = heapq.heappop(heap)
        masks.append(int(sum(1 << int(order[r]) for r in ranks)))
        last = ranks[-1]
        if last + 1 < n:
            heapq.heappush(  # shift: move the largest rank one plane out
                heap, (score - float(z2[last]) + float(z2[last + 1]), ranks[:-1] + (last + 1,))
            )
            heapq.heappush(  # expand: also flip the next plane out
                heap, (score + float(z2[last + 1]), ranks + (last + 1,))
            )
    return masks


def multiprobe_lsh_topk(
    emb_ds: rd.Dataset,
    query: Sequence[float],
    k: int = 10,
    n_planes: int = 8,
    n_probes: int = 9,
    seed: int = 13,
) -> rd.Dataset:
    """Approximate top-k with query-directed probing: probe the ``n_probes``
    buckets a near neighbor is MOST likely to fall in (flip the planes the
    query is closest to first), instead of a blind Hamming ball.  At equal
    probed-bucket count this dominates ``lsh_topk``'s radius expansion —
    the recall ordering is asserted in tests — and at
    ``n_probes == 2**n_planes`` the scan covers every bucket and is
    bitwise-identical to ``brute_force_topk``."""
    q = _unit(np.asarray(query, dtype=np.float64))
    planes = _planes(len(q), n_planes, seed)
    pn = planes / np.linalg.norm(planes, axis=1, keepdims=True)
    margins = pn @ q
    q_bucket = int(_bucket_of(q[None, :], planes)[0])
    ok_buckets = {q_bucket ^ m for m in _multiprobe_masks(margins, n_probes)}
    return _bucket_scan_topk(emb_ds, q, planes, ok_buckets, k)


def _bucket_scan_topk(
    emb_ds: rd.Dataset, q: np.ndarray, planes: np.ndarray, ok_buckets: set, k: int
) -> rd.Dataset:
    """Shared LSH scan: score rows whose bucket is in the probe set; one
    broadcast, one map, a k·blocks-row sort."""
    q_ref = ray.put(q)
    planes_ref = ray.put(planes)
    ok_ref = ray.put(ok_buckets)

    def scan(batch: pa.Table) -> pa.Table:
        qv, pl, ok = ray.get(q_ref), ray.get(planes_ref), ray.get(ok_ref)
        ids = col_np(batch, "vec_id")
        if not len(ids):
            return pa.table({"vec_id": pa.array([], pa.int64()), "cos_e5": pa.array([], pa.int64())})
        mat = emb_np(batch)
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


# ---------------------------------------------------------------------------
# IVF with a PARTITIONED index — the read-pruning scale path
# ---------------------------------------------------------------------------

def ivf_build(
    emb_ds: rd.Dataset, out_dir: str, n_centroids: int = 64, seed: int = 17,
) -> np.ndarray:
    """Build a persisted IVF index: assign every vector to its nearest
    centroid cell and write the table hive-partitioned by ``ivf_cell``
    (one directory per cell), with the centroids saved alongside.

    This is the similarity design that actually survives 100 TB: the
    scan-time variants (``ivf_topk``/``lsh_topk``) still READ the whole
    corpus and only skip scoring, so their wall is I/O-bound at scale —
    measured at the 1M-vector smoke tier, ``ivf_topk`` is no faster than
    brute force because per-vector cell assignment (n_centroids dots) costs
    more than the single query dot it saves.  Partitioning moves the
    assignment to build time, amortized over all future queries, and makes
    per-query cost proportional to the PROBED FRACTION OF STORAGE
    (``n_probe / n_centroids``) — read-side pruning, same idea as parquet
    column/row-group pruning at the read.
    """
    import os

    cents = ivf_centroids(emb_ds, n_centroids=n_centroids, seed=seed)
    cents_ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        cs = ray.get(cents_ref)
        mat = emb_np(batch)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        cell = np.argmax((mat / norms) @ cs.T, axis=1).astype(np.int64)
        return batch.append_column("ivf_cell", pa.array(cell, pa.int64()))

    emb_ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["ivf_cell"]
    )
    np.save(os.path.join(out_dir, "centroids.npy"), cents)
    return cents


def ivf_append(index_dir: str, emb_ds: rd.Dataset) -> int:
    """Incrementally add vectors to a persisted IVF index — the rolling
    ingest path: new vectors are assigned to the EXISTING centroid cells
    (standard IVF add; centroids stay fixed so previously-written cells
    remain valid) and appended as new uniquely-named parquet files inside
    the same hive partitions.  ``ivf_query`` picks them up transparently
    via its per-cell glob.  Returns the number of vectors appended.

    Centroids are not re-fit: under distribution drift the cell balance
    degrades gracefully (queries stay CORRECT for any n_probe because
    scoring is exact within probed cells; only pruning efficiency decays) —
    rebuild via ``ivf_build`` when cell-size skew passes a threshold, the
    same rebuild-vs-append tradeoff as any LSM/IVF system."""
    import os

    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    cents_ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        cs = ray.get(cents_ref)
        mat = emb_np(batch)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        cell = np.argmax((mat / norms) @ cs.T, axis=1).astype(np.int64)
        return batch.append_column("ivf_cell", pa.array(cell, pa.int64()))

    assigned = emb_ds.map_batches(assign, batch_format="pyarrow").materialize()
    assigned.write_parquet(index_dir, partition_cols=["ivf_cell"])
    return assigned.count()


def ivf_query(
    index_dir: str, query: Sequence[float], k: int = 10, n_probe: int = 8,
) -> rd.Dataset:
    """Query a persisted IVF index: read ONLY the ``n_probe`` cell
    partitions nearest the query and score them exactly (same float formula
    as ``brute_force_topk``, so ``n_probe == n_centroids`` reproduces the
    exact answer bit-for-bit).  I/O per query = probed fraction of the
    index, independent of corpus size."""
    import glob
    import os

    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    q = _unit(np.asarray(query, dtype=np.float64))
    probe = np.argsort(-(cents @ q))[: min(n_probe, len(cents))]
    dirs = []
    for cell in probe:
        d = os.path.join(index_dir, f"ivf_cell={cell}")
        if os.path.isdir(d):
            dirs.append(d)
    if not dirs:
        return rd.from_arrow(
            pa.table({"vec_id": pa.array([], pa.int64()),
                      "cos_e5": pa.array([], pa.int64())})
        )
    files = sorted(f for d in dirs for f in glob.glob(os.path.join(d, "*.parquet")))
    return brute_force_topk(
        rd.read_parquet(files, columns=["vec_id", "embedding"]), q, k=k
    )
