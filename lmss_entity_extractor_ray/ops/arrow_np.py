"""Arrow→numpy converters for hot-path batch functions.

``np.asarray(col.to_pylist())`` materializes one Python object per cell
(and one per embedding ELEMENT for list columns) before numpy re-parses
them — at 100 TB that is the batch function's dominant cost.  These
helpers go straight from the Arrow buffers: ``to_numpy`` for flat numeric
columns and a flatten+reshape for equal-length list columns, so the only
copies are numpy-level (and often zero-copy for non-null int/float).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["col_np", "emb_np"]


def _chunked(col):
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def col_np(tbl: pa.Table, name: str, dtype=None) -> np.ndarray:
    """Numeric (or bool/temporal) column → 1-D numpy array, no Python objects.

    ``dtype`` casts only when needed (int64→uint64 views are free)."""
    arr = _chunked(tbl.column(name))
    out = arr.to_numpy(zero_copy_only=False)
    if dtype is not None and out.dtype != np.dtype(dtype):
        # int64 <-> uint64 is a reinterpret, not a value conversion
        if out.dtype.itemsize == np.dtype(dtype).itemsize and out.dtype.kind in "iu" and np.dtype(dtype).kind in "iu":
            out = out.view(dtype)
        else:
            out = out.astype(dtype)
    return out


def emb_np(tbl: pa.Table, name: str = "embedding", dtype=np.float64) -> np.ndarray:
    """``list<float>`` / ``fixed_size_list`` column → (n, d) matrix.

    Flattens the list values buffer and reshapes — one numpy cast instead of
    n×d Python floats.  Requires equal-length non-null lists (true for every
    embedding column in this engine); ragged input falls back to the slow
    path so callers keep identical semantics."""
    col = _chunked(tbl.column(name))
    n = len(col)
    if n == 0:
        return np.zeros((0, 0), dtype=dtype)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    d, rem = divmod(flat.size, n)
    if rem or col.null_count:
        return np.asarray(col.to_pylist(), dtype=dtype)  # pragma: no cover
    return flat.astype(dtype, copy=False).reshape(n, d)
