"""Line-level exact deduplication (C4 / RefinedWeb-style).

Large web corpora repeat individual LINES far more than whole documents —
navigation boilerplate, cookie banners, license footers.  C4 (Raffel et al.
2020, §2.2) removes repeated three-sentence spans; RefinedWeb and Dolma both
run exact line-dedup corpus-wide.  Semantics here: every exact line keeps
only its globally-FIRST occurrence (lexicographic min of
``(doc_id, line_no)``); all other occurrences are deleted from their
documents, and documents are reassembled from their surviving lines.  Lines
shorter than ``min_chars`` never participate (always kept) — deleting empty
separator lines would mangle structure.

Distributed shape (scale-safe at 100 TB):

1. one map over docs emits participating ``(line, occ)`` rows with a
   BLOCK-LOCAL combine: per block, only each line's local-min occurrence is
   forwarded to the exchange; local non-minima are provably global
   non-minima, so they short-circuit as removals immediately (tagged rows
   that pass through the exchange un-grouped).  Exchange volume is
   block-distinct lines, not corpus lines.
2. ONE hash exchange on the line string; each partition owns a line's full
   candidate set, takes the global min, and emits every other occurrence as
   a removal.  Removal volume is duplicate-scale (the dedup's output), not
   corpus-scale.
3. removals group to per-doc deletion lists (second, removal-scale
   exchange) and join back to the docs (partition-aligned hash join on
   doc_id); each doc re-splits its text and drops the deleted line numbers.

The occurrence encoding ``doc_id * 2^20 + line_no`` keeps the global-min
comparison a single int64 min (SQL parity: ``min(doc_id * 1048576 +
line_no) OVER (PARTITION BY line)``); docs must have < 2^20 lines and
doc_id < 2^43 — both asserted.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .join import hash_join
from .partitioning import packed_csv_lists, shuffle_partitions, string_partition

LINE_CAP = 1 << 20  # max lines per document in the occurrence encoding


def _split_lines(batch: pa.Table, id_col: str, text_col: str, sep: str = "\n"):
    """Per-row line lists via one vectorized Arrow split."""
    texts = pc.coalesce(batch.column(text_col), pa.scalar("", pa.string()))
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    split = pc.split_pattern(texts, sep)
    return ids, split


def line_dedup(
    docs_ds: rd.Dataset,
    min_chars: int = 1,
    num_partitions: Optional[int] = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> rd.Dataset:
    """(doc_id, text, ...) → (doc_id, text, n_removed): global first-
    occurrence line dedup.  Deterministic and layout-independent — the
    canonical occurrence is a pure function of the corpus, not of block
    order.  ``sep`` selects the unit: "\n" = lines (C4/RefinedWeb),
    "\n\n" = paragraphs (Dolma's paragraph-level pass) — every other
    semantics (first-occurrence, reassembly, min_chars) is identical."""
    P = max(2, num_partitions or shuffle_partitions(docs_ds, scale=2.0))

    def emit(batch: pa.Table) -> pa.Table:
        ids, split = _split_lines(batch, id_col, text_col, sep)
        flat = split.combine_chunks() if isinstance(split, pa.ChunkedArray) else split
        offsets = flat.offsets.to_numpy(zero_copy_only=False)
        offsets = offsets - offsets[0]  # flatten() below re-bases the values
        lines = flat.flatten()
        n_per_doc = np.diff(offsets)
        if n_per_doc.size and n_per_doc.max() >= LINE_CAP:
            raise ValueError(f"document with >= {LINE_CAP} lines")
        doc_of = np.repeat(ids.astype(np.int64), n_per_doc)
        if doc_of.size and doc_of.max() >= (1 << 43):
            raise ValueError("doc_id >= 2^43 breaks the occurrence encoding")
        line_no = np.arange(len(doc_of), dtype=np.int64) - np.repeat(
            offsets[:-1].astype(np.int64), n_per_doc
        )
        occ = doc_of * LINE_CAP + line_no
        part_lens = pc.utf8_length(lines).to_numpy(zero_copy_only=False)
        mask = part_lens >= min_chars
        tbl = pa.table(
            {
                "line": pc.filter(lines, pa.array(mask)),
                "occ": pa.array(occ[mask], pa.int64()),
            }
        )
        if tbl.num_rows == 0:
            return pa.table(
                {
                    "line": pa.array([], pa.string()),
                    "occ": pa.array([], pa.int64()),
                    "removed": pa.array([], pa.bool_()),
                    "part": pa.array([], pa.int32()),
                }
            )
        # block-local combine: forward each line's local min; everything
        # else is already a removal
        mins = tbl.group_by(["line"]).aggregate([("occ", "min")])
        keep_occ = pc.is_in(tbl.column("occ"), value_set=mins.column("occ_min"))
        removed = pc.invert(keep_occ)
        part = string_partition(tbl.column("line"), P)
        # removals don't need co-location; scatter them uniformly
        occ_np = tbl.column("occ").to_numpy(zero_copy_only=False)
        rem_np = removed.to_numpy(zero_copy_only=False)
        part = np.where(rem_np, (occ_np % P).astype(np.int32), part)
        return pa.table(
            {
                "line": tbl.column("line"),
                "occ": tbl.column("occ"),
                "removed": removed,
                "part": pa.array(part, pa.int32()),
            }
        )

    def finish_partition(group: pa.Table) -> pa.Table:
        """One partition: global min per line among survivors; emit every
        non-min occurrence plus the passed-through local removals."""
        passed = group.filter(group.column("removed"))
        cands = group.filter(pc.invert(group.column("removed")))
        outs = [passed.column("occ")]
        if cands.num_rows:
            mins = cands.group_by(["line"]).aggregate([("occ", "min")])
            non_min = pc.invert(
                pc.is_in(cands.column("occ"), value_set=mins.column("occ_min"))
            )
            outs.append(pc.filter(cands.column("occ"), non_min))
        occ = pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in outs])
        occ_np = occ.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(occ_np // LINE_CAP, pa.int64()),
                "line_no": pa.array(occ_np % LINE_CAP, pa.int64()),
            }
        )

    removals = (
        docs_ds.map_batches(emit, batch_format="pyarrow")
        .groupby("part")
        .map_groups(finish_partition, batch_format="pyarrow")
    )

    # Arrow's acero join rejects list-typed payload columns — ship the
    # deletion list as a csv string through the join (packed per hash
    # partition, not per doc: see packed_csv_lists)
    drop_lists = packed_csv_lists(
        removals, P, id_col="doc_id", val_col="line_no", out_col="drop_lines"
    )

    joined = hash_join(
        docs_ds, drop_lists, on=id_col, right_on="doc_id", how="left outer"
    )

    def rebuild(batch: pa.Table) -> pa.Table:
        ids, split = _split_lines(batch, id_col, text_col, sep)
        lines_per_doc = split.to_pylist()
        drops = batch.column("drop_lines").to_pylist()
        texts, n_removed = [], []
        for lines, drop in zip(lines_per_doc, drops):
            if not drop:
                texts.append(sep.join(lines))
                n_removed.append(0)
            else:
                dset = {int(x) for x in drop.split(",")}
                texts.append(
                    sep.join(l for i, l in enumerate(lines) if i not in dset)
                )
                n_removed.append(len(dset))
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                text_col: pa.array(texts, pa.string()),
                "n_removed": pa.array(n_removed, pa.int64()),
            }
        )

    return joined.map_batches(rebuild, batch_format="pyarrow")
