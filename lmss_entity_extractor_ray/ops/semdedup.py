"""SemDeDup — semantic (embedding-space) deduplication.

Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication": cluster the embedding space with k-means, then
inside each cluster remove all but one point from every group of
near-identical embeddings.  Clustering first is what makes the O(N²)
pairwise comparison tractable — pairs are only scored WITHIN a cluster, so
the global cost is Σ|cluster|² instead of N².

Keep rule (deterministic, order-free): a vector is DROPPED iff some
lower-id vector in its cluster has cosine ≥ tau with it.  This is the
"keep lowest id per ε-neighbourhood" variant — unlike greedy sequential
removal it needs no iteration order, is independent of partitioning, and is
exactly expressible as SQL ``NOT EXISTS``, which is what the driver oracle
checks (dual-read over the written assignment table).

Scale shape: centroids train on a bounded sample and broadcast
(``ivf_centroids``); assignment is one matmul per batch; ONE exchange on
cluster_id; each cluster's dominate-check is a tiled upper-triangle matmul
inside its group task.  Partitioning assumption (documented, same as
``map_groups`` everywhere): one cluster must fit in one worker's memory —
pick ``n_clusters`` so corpus/n_clusters stays worker-sized; skewed giant
clusters are the operator's known failure mode (SemDeDup itself caps
cluster sizes by raising k).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from .arrow_np import col_np, emb_np
from .similarity import ivf_centroids


def semdedup(
    emb_ds: rd.Dataset,
    n_clusters: int = 8,
    tau: float = 0.95,
    seed: int = 17,
    tile: int = 4096,
) -> rd.Dataset:
    """(vec_id, embedding) → (vec_id, cluster_id, kept): semantic-dedup
    verdict per vector.  ``kept`` is False iff a lower-id same-cluster
    vector is within cosine ``tau``  (compared on the e5-quantized cosine,
    matching the SQL oracle's quantization)."""
    tau_e5 = int(np.floor(tau * 100_000.0 + 0.5))
    cents = ivf_centroids(emb_ds, n_centroids=n_clusters, seed=seed)
    cents_ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        cs = ray.get(cents_ref)
        ids = col_np(batch, "vec_id")
        if not len(ids):
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "cluster_id": pa.array([], pa.int64()),
                    "embedding": batch.column("embedding"),
                }
            )
        mat = emb_np(batch)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        a = np.argmax((mat / norms) @ cs.T, axis=1).astype(np.int64)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster_id": pa.array(a, pa.int64()),
                "embedding": batch.column("embedding"),
            }
        )

    def dominate(group: pa.Table) -> pa.Table:
        ids = col_np(group, "vec_id")
        order = np.argsort(ids)
        ids = ids[order]
        mat = emb_np(group)[order]
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        n = len(ids)
        dropped = np.zeros(n, dtype=bool)
        # tiled upper-triangle: for row-tile i, compare against all j<i rows
        # plus the within-tile triangle — O(n²/2) flops, O(tile·n) memory
        for lo in range(0, n, tile):
            hi = min(lo + tile, n)
            if lo:
                cos = unit[lo:hi] @ unit[:lo].T
                e5 = np.floor(cos * 100_000.0 + 0.5).astype(np.int64)
                dropped[lo:hi] |= (e5 >= tau_e5).any(axis=1)
            cos_in = unit[lo:hi] @ unit[lo:hi].T
            e5_in = np.floor(cos_in * 100_000.0 + 0.5).astype(np.int64)
            tri = np.tril(e5_in >= tau_e5, k=-1)
            dropped[lo:hi] |= tri.any(axis=1)
        cluster = group.column("cluster_id")[0].as_py()
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster_id": pa.array(np.full(n, cluster), pa.int64()),
                "kept": pa.array(~dropped, pa.bool_()),
            }
        )

    return (
        emb_ds.map_batches(assign, batch_format="pyarrow")
        .groupby("cluster_id")
        .map_groups(dominate, batch_format="pyarrow")
    )
