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

Distributed shape: one map emits ONE packed row per (block, gram) — the
gram string, its local occurrence LIST, and its multiplicity — so the
exchange sorts block-distinct grams, not occurrences (a phrase repeated
thousands of times inside a block travels once).  ONE hash exchange on the
gram string resolves global counts and flattens the occurrence lists of
globally-duplicated grams.  Flagged positions (duplicate-scale) group to
per-doc lists and join back partition-aligned; per-doc coverage is a
vectorized interval-union over sorted positions.  The gram travels as its
literal k-token string so the operator stays SQL-oracle-checkable (same
convention as ``ngram_jaccard_pairs``; at 100 TB swap the key for its
128-bit hash — the grouping is identical for any injective key).

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
from .partitioning import packed_csv_lists, shuffle_partitions, string_partition

POS_CAP = 1 << 20


def _doc_grams(texts, ids, k: int):
    """(gram string array, occ encoding array, n_tokens per doc) for one
    batch — the gram join is ONE vectorized Arrow kernel over k shifted
    views of the flat token column (the generalization of the bigram trick
    in ops/repetition.py), with positions straddling a doc boundary masked
    out; no per-position Python."""
    toks_flat: list = []
    lens = np.zeros(len(ids), dtype=np.int64)
    for row, t in enumerate(texts):
        toks = exact_tokens(t)
        lens[row] = len(toks)
        toks_flat.extend(toks)
    if lens.size and lens.max() >= POS_CAP:
        raise ValueError("doc too long for occ encoding")
    ids_np = np.asarray(ids, dtype=np.int64)
    if ids_np.size and ids_np.max() >= (1 << 43):
        raise ValueError("doc_id too large for occ encoding")
    total = int(lens.sum())
    if total < k:
        return pa.array([], pa.string()), np.array([], dtype=np.int64), lens
    flat = pa.array(toks_flat, pa.string())
    n_pos = total - k + 1
    joined = pc.binary_join_element_wise(
        *[flat.slice(j, n_pos) for j in range(k)], " "
    )
    doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    valid = doc_of[:n_pos] == doc_of[k - 1 :]
    pos_in_doc = np.arange(n_pos, dtype=np.int64) - starts[doc_of[:n_pos]]
    occ = ids_np[doc_of[:n_pos]] * POS_CAP + pos_in_doc
    return pc.filter(joined, pa.array(valid)), occ[valid], lens


def _dup_pos_lists(
    docs_ds: rd.Dataset,
    k: int,
    P: int,
    id_col: str,
    text_col: str,
) -> rd.Dataset:
    """Shared core of the ExactSubstr family: (doc_id, dup_pos) where
    ``dup_pos`` is the sorted csv of token positions that START a
    corpus-wide duplicated k-gram.  One hash exchange on the gram string
    (block-packed, see module docstring), flagged positions grouped per
    doc — both stages carry duplicate-scale rows only."""

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        grams, occs, _ = _doc_grams(texts, ids, k)
        if not len(grams):
            return pa.table(
                {
                    "gram": pa.array([], pa.string()),
                    "occs": pa.array([], pa.list_(pa.int64())),
                    "cnt": pa.array([], pa.int64()),
                    "part": pa.array([], pa.int32()),
                }
            )
        # block-local pack: ONE row per (block, gram) carrying its local
        # occurrence list — the exchange sorts block-distinct grams, not
        # occurrences (phrase-heavy corpora repeat the same grams
        # thousands of times per block; measured 18.6M occ rows → ~4M
        # packed rows on the 200k-doc smoke)
        t = pa.table({"gram": grams, "occ": pa.array(occs, pa.int64())})
        g = t.group_by(["gram"]).aggregate([("occ", "list"), ([], "count_all")])
        res = pa.table(
            {
                "gram": g.column("gram"),
                "occs": g.column("occ_list"),
                "cnt": g.column("count_all").cast(pa.int64()),
            }
        )
        part = string_partition(res.column("gram"), P)
        return res.append_column("part", pa.array(part, pa.int32()))

    def resolve(group: pa.Table) -> pa.Table:
        """Per partition: total multiplicity per gram; flatten the
        occurrence lists of globally-duplicated grams."""
        totals = group.group_by(["gram"]).aggregate([("cnt", "sum")])
        dup_grams = totals.filter(
            pc.greater(totals.column("cnt_sum"), pa.scalar(1))
        ).column("gram")
        dup_rows = group.filter(
            pc.is_in(group.column("gram"), value_set=dup_grams.combine_chunks())
        )
        occ = dup_rows.column("occs").combine_chunks().flatten()
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

    return packed_csv_lists(
        flagged, P, id_col="doc_id", val_col="pos", out_col="dup_pos"
    )


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
    pos_lists = _dup_pos_lists(docs_ds, k, P, id_col, text_col)

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


def cut_dup_spans(
    docs_ds: rd.Dataset,
    k: int = 8,
    num_partitions: Optional[int] = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Destructive ExactSubstr pass (Lee et al. 2022 §3's actual dedup, cf.
    reference `app/entity_extraction.py` span-merge discipline for the
    interval handling): (doc_id, text) → (doc_id, n_tokens, kept_tokens,
    text_cut) where ``text_cut`` is the document REBUILT with every token
    covered by a corpus-wide duplicated k-gram removed (the symmetric
    remove-ALL-occurrences variant — see module docstring; line_dedup is
    the keep-first sibling).

    Output text lives in normalized token space (lowercased,
    whitespace-joined) — the same space the duplication analysis runs in,
    and exactly what the SQL oracle's string_agg rebuild produces.  Same
    distributed shape as dup_span_stats: the exchanges carry block-distinct
    grams and duplicate-scale positions; the corpus itself is touched by
    exactly one map (emit) and one partition-aligned join + map (rebuild)."""
    P = max(2, num_partitions or shuffle_partitions(docs_ds, scale=6.0))
    pos_lists = _dup_pos_lists(docs_ds, k, P, id_col, text_col)

    joined = hash_join(
        docs_ds, pos_lists, on=id_col, right_on="doc_id", how="left outer"
    )

    def rebuild(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        poss = batch.column("dup_pos").to_pylist()
        n_tok = np.zeros(len(ids), dtype=np.int64)
        kept_n = np.zeros(len(ids), dtype=np.int64)
        out_text = []
        for row, (t, pl) in enumerate(zip(texts, poss)):
            toks = exact_tokens(t)
            n_tok[row] = len(toks)
            if not pl:
                kept_n[row] = len(toks)
                out_text.append(" ".join(toks))
                continue
            covered = np.zeros(len(toks), dtype=bool)
            for s in pl.split(","):
                start = int(s)
                covered[start : start + k] = True
            kept = [tok for tok, c in zip(toks, covered) if not c]
            kept_n[row] = len(kept)
            out_text.append(" ".join(kept))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "kept_tokens": pa.array(kept_n, pa.int64()),
                "text_cut": pa.array(out_text, pa.string()),
            }
        )

    return joined.map_batches(rebuild, batch_format="pyarrow")
