"""Shuffle-partition sizing shared by the manual hash exchanges.

CPU count alone is the wrong unit at scale: a 100 TB input on a 256-node
cluster needs partitions sized so ONE partition's rows fit a worker's heap,
which is a data-size target, not a parallelism target.  ``shuffle_partitions``
takes the larger of the two bounds:

- parallelism floor: ≥ cluster CPUs (every core gets a partition task);
- data ceiling: input bytes (from the datasource's file metadata — free, no
  execution) / ``target_bytes`` per partition, with a ~3× allowance for
  parquet decompression.

Derived datasets whose size diverges from their input files (e.g. an
exploded shingle table) can pass ``scale`` to widen the estimate.
"""

from __future__ import annotations

import os


import ray

_DECOMPRESS = 3  # parquet on-disk → in-memory Arrow expansion allowance


def cluster_cpus(default: int = 4) -> int:
    try:
        return max(1, int(ray.cluster_resources().get("CPU", default)))
    except Exception:
        return default


def shuffle_partitions(
    ds=None,
    target_bytes: int = 256 << 20,
    scale: float = 1.0,
    min_parts: int = 2,
) -> int:
    """Partition count for a manual hash exchange over ``ds``.

    ``ds`` may be None (CPU-count floor only) or any Dataset whose lineage
    starts at files — ``input_files()`` reads datasource metadata without
    executing the plan.  ``scale`` multiplies the byte estimate for
    transforms that blow up the input (shingle explosion ~ tokens per doc).
    """
    base = max(min_parts, cluster_cpus())
    if ds is None:
        return base
    try:
        files = ds.input_files()
        nb = sum(os.path.getsize(f) for f in files if f and os.path.exists(f))
        est = int(nb * _DECOMPRESS * scale // target_bytes) + 1
        return max(base, est)
    except Exception:
        return base


# ---------------------------------------------------------------------------
# vectorized exchange-key hashing
# ---------------------------------------------------------------------------
#
# Partition assignment only needs to be DETERMINISTIC ACROSS THE WORKERS OF
# ONE RUN (all copies of a key must land in the same partition) — the part
# column never reaches query output, so the hash family is an internal
# choice.  Strings go through polars' vectorized 64-bit hash (fixed seed ⇒
# process-independent within a polars version; verified by test); the
# per-row Python crc32 loop it replaces survives only as the import-failure
# fallback.

def string_hash64(col, seed: int = 0):
    """pa.Array/ChunkedArray of strings → uint64 numpy hash, vectorized."""
    import numpy as np
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    try:
        import polars as pl

        return pl.from_arrow(col).hash(seed=seed).to_numpy().astype(np.uint64)
    except ImportError:  # pragma: no cover - polars is baked into the env
        import zlib

        return np.fromiter(
            (zlib.crc32((s or "").encode("utf-8")) for s in col.to_pylist()),
            dtype=np.uint64,
            count=len(col),
        )


def string_partition(col, num_partitions: int, seed: int = 0):
    """int32 partition ids for a string column — one vectorized hash, no
    per-row Python."""
    import numpy as np

    return (string_hash64(col, seed=seed) % np.uint64(num_partitions)).astype(
        np.int32
    )


def packed_csv_lists(
    ds,
    num_partitions: int,
    id_col: str = "doc_id",
    val_col: str = "pos",
    out_col: str = "vals",
):
    """(id, int val) rows → ONE row per id carrying its sorted-unique vals
    as a csv string (the Arrow-acero-join-safe list encoding used by
    line_dedup / dup_span_stats deletion lists).

    ``groupby(id).map_groups`` invokes the Python UDF once per id — 200k
    calls on the 200k-doc smoke, measured 21 s, the stage dominator.  This
    packs by ``id % P`` instead: P Python calls, numpy boundary detection
    over one lexsort, and one vectorized ``binary_join`` for the csv.  Ids
    must be non-negative ints (both callers' occ encodings guarantee it).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    P = int(num_partitions)

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return batch.append_column(
            "__part", pa.array((ids % P).astype(np.int32))
        )

    def pack(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        if ids.size == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    out_col: pa.array([], pa.string()),
                }
            )
        vals = group.column(val_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((vals, ids))
        ids, vals = ids[order], vals[order]
        keep = np.concatenate(
            [[True], (ids[1:] != ids[:-1]) | (vals[1:] != vals[:-1])]
        )
        ids, vals = ids[keep], vals[keep]
        new_id = np.concatenate([[True], ids[1:] != ids[:-1]])
        offsets = np.append(np.flatnonzero(new_id), ids.size)
        val_str = pc.cast(pa.array(vals, pa.int64()), pa.string())
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), val_str
        )
        return pa.table(
            {
                id_col: pa.array(ids[new_id], pa.int64()),
                out_col: pc.binary_join(lists, ","),
            }
        )

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(pack, batch_format="pyarrow")
    )
