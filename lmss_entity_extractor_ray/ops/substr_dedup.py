"""Duplicated-substring coverage (ExactSubstr-style).

Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better", show that EXACT SUBSTRING duplication — long token spans repeated
anywhere in the corpus — matters independently of document- or line-level
duplication (their ExactSubstr dedup uses a corpus-wide suffix array with a
50-token threshold).  The distributed re-formulation here: a position is
DUPLICATED iff the ``k``-token gram starting there occurs more than once in
the corpus (any document, any position — a within-doc repeat counts).  The
operator reports, per document, how much of it is covered by duplicated
grams and in how many maximal spans; a downstream stage can cut those
spans, mirroring line_dedup's rebuild.

Semantics note vs the paper: every occurrence of a duplicated gram is
flagged (symmetric coverage — the natural "how contaminated is this doc"
signal), not the remove-all-but-one variant; k is a parameter (the paper's
50-token threshold ≈ flagging positions whose 50-gram repeats).

Distributed shape: one map emits ``(gram, occ)`` with a block-local
combine — a gram seen twice WITHIN a block is already known-duplicated, so
its occurrences short-circuit as flagged and only one multiplicity-carrying
row per (block, gram) is forwarded; singleton grams forward individually
(they may match another block).  ONE hash exchange on the gram string
resolves global counts and flags the forwarded singletons.  Flagged
positions (duplicate-scale) group to per-doc lists and join back
partition-aligned; per-doc coverage is a vectorized interval-union over
sorted positions.  The gram travels as its literal k-token string so the
operator stays SQL-oracle-checkable (same convention as
``ngram_jaccard_pairs``; at 100 TB swap the key for its 128-bit hash — the
grouping is identical for any injective key).

Occurrence encoding ``doc_id * 2^20 + pos`` (same bounds as line_dedup).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .dedup import exact_tokens
from .join import hash_join
from .partitioning import shuffle_partitions, string_partition

POS_CAP = 1 << 20


def _doc_grams(texts, ids, k: int):
    """(gram strings, occ encodings, n_tokens per doc) for one batch."""
    grams, occs = [], []
    n_toks = np.zeros(len(ids), dtype=np.int64)
    for row, (i, t) in enumerate(zip(ids, texts)):
        toks = exact_tokens(t)
        n_toks[row] = len(toks)
        if len(toks) < k:
            continue
        if len(toks) >= POS_CAP or int(i) >= (1 << 43):
            raise ValueError("doc too long / id too large for occ encoding")
        base = int(i) * POS_CAP
        for p in range(len(toks) - k + 1):
            grams.append(" ".join(toks[p : p + k]))
            occs.append(base + p)
    return grams, occs, n_toks


def dup_span_stats(
    docs_ds: rd.Dataset,
    k: int = 8,
    num_partitions: Optional[int] = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """(doc_id, text) → (doc_id, n_tokens, dup_tokens, n_dup_spans,
    dup_frac_e5): corpus-wide duplicated-substring coverage."""
    P = max(2, num_partitions or shuffle_partitions(docs_ds, scale=6.0))

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        grams, occs, _ = _doc_grams(texts, ids, k)
        if not grams:
            return pa.table(
                {
                    "gram": pa.array([], pa.string()),
                    "occ": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                    "flagged": pa.array([], pa.bool_()),
                    "part": pa.array([], pa.int32()),
                }
            )
        t = pa.table(
            {"gram": pa.array(grams, pa.string()), "occ": pa.array(occs, pa.int64())}
        )
        counts = t.group_by(["gram"]).aggregate([([], "count_all")])
        dups = counts.filter(pc.greater(counts.column("count_all"), pa.scalar(1)))
        dup_set = dups.column("gram").combine_chunks()
        isdup = pc.is_in(t.column("gram"), value_set=dup_set)
        isdup_np = isdup.to_numpy(zero_copy_only=False)
        # locally-duplicated occurrences are pre-flagged (cnt 0 — their
        # multiplicity travels on one carrier row per gram); singletons
        # forward with cnt 1
        occ_rows = pa.table(
            {
                "gram": t.column("gram"),
                "occ": t.column("occ"),
                "cnt": pa.array(
                    np.where(isdup_np, 0, 1).astype(np.int64), pa.int64()
                ),
                "flagged": isdup,
            }
        )
        carriers = pa.table(
            {
                "gram": dups.column("gram"),
                "occ": pa.array(
                    np.full(dups.num_rows, -1, dtype=np.int64), pa.int64()
                ),
                "cnt": dups.column("count_all").cast(pa.int64()),
                "flagged": pa.array(np.zeros(dups.num_rows, dtype=bool)),
            }
        )
        res = pa.concat_tables([occ_rows, carriers]).combine_chunks()
        part = string_partition(res.column("gram"), P)
        # pre-flagged rows need no co-location; spread them uniformly
        occ_np = res.column("occ").to_numpy(zero_copy_only=False)
        flag_np = res.column("flagged").to_numpy(zero_copy_only=False)
        part = np.where(flag_np, (np.abs(occ_np) % P).astype(np.int32), part)
        return res.append_column("part", pa.array(part, pa.int32()))

    def resolve(group: pa.Table) -> pa.Table:
        """Per partition: sum multiplicities per gram; flag forwarded
        singleton occs of globally-duplicated grams; pass pre-flagged."""
        pre = group.filter(group.column("flagged"))
        rest = group.filter(pc.invert(group.column("flagged")))
        outs = [pre.column("occ")]
        if rest.num_rows:
            totals = rest.group_by(["gram"]).aggregate([("cnt", "sum")])
            dup_grams = totals.filter(
                pc.greater(totals.column("cnt_sum"), pa.scalar(1))
            ).column("gram")
            singles = rest.filter(
                pc.and_(
                    pc.is_in(rest.column("gram"), value_set=dup_grams.combine_chunks()),
                    pc.greater_equal(rest.column("occ"), pa.scalar(0, pa.int64())),
                )
            )
            outs.append(singles.column("occ"))
        occ = pa.concat_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in outs]
        )
        occ_np = occ.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(occ_np // POS_CAP, pa.int64()),
                "pos": pa.array(occ_np % POS_CAP, pa.int64()),
            }
        )

    flagged = (
        docs_ds.map_batches(emit, batch_format="pyarrow")
        .groupby("part")
        .map_groups(resolve, batch_format="pyarrow")
    )

    def to_lists(group: pa.Table) -> pa.Table:
        g = group.group_by(["doc_id"]).aggregate([("pos", "list")])
        csv = pa.array(
            [",".join(map(str, sorted(set(v)))) for v in g.column("pos_list").to_pylist()],
            pa.string(),
        )
        return pa.table({"doc_id": g.column("doc_id"), "dup_pos": csv})

    pos_lists = flagged.groupby("doc_id").map_groups(to_lists, batch_format="pyarrow")

    joined = hash_join(
        docs_ds, pos_lists, on=id_col, right_on="doc_id", how="left outer"
    )

    def finish(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        poss = batch.column("dup_pos").to_pylist()
        n_tok = np.array([len(exact_tokens(t)) for t in texts], dtype=np.int64)
        dup_tokens = np.zeros(len(ids), dtype=np.int64)
        n_spans = np.zeros(len(ids), dtype=np.int64)
        for row, pl in enumerate(poss):
            if not pl:
                continue
            starts = np.fromiter((int(x) for x in pl.split(",")), dtype=np.int64)
            ends = starts + k  # exclusive
            # interval union over sorted starts (fixed length k); adjacent
            # intervals (start == prev end) merge — coverage is contiguous
            new_span = np.concatenate([[True], starts[1:] > ends[:-1]])
            span_id = np.cumsum(new_span) - 1
            span_start = starts[new_span]
            span_end = np.maximum.reduceat(ends, np.flatnonzero(new_span))
            dup_tokens[row] = int((span_end - span_start).sum())
            n_spans[row] = len(span_start)
        frac = np.where(n_tok == 0, 0.0, dup_tokens / np.maximum(n_tok, 1))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "dup_tokens": pa.array(dup_tokens, pa.int64()),
                "n_dup_spans": pa.array(n_spans, pa.int64()),
                "dup_frac_e5": pa.array(
                    np.floor(frac * 100_000.0 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")
