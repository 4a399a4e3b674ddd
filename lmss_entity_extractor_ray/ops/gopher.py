"""Gopher-rules composite quality gate.

Rae et al. 2021 (Gopher, arXiv:2112.11446, Appendix A.1.1) filter web
documents with a fixed rule set; this operator composes the engine's
existing per-doc signals into that gate and reports a per-rule failure
bitmask, so downstream stages can both filter (``keep``) and audit WHY a
document failed.  Thresholds are the published defaults, overridable.

Rules (bit set ⇔ rule FAILED):

====  ==========================================================
bit   rule (Gopher defaults)
====  ==========================================================
0     word count < min_tokens (50)
1     word count > max_tokens (100 000)
2     mean word length < 3 chars
3     mean word length > 10 chars
4     symbol-to-word ratio ('#' or '...') > 0.1
5     < 80 % of words contain an alphabetic character
6     < 2 of the 8 Gopher stopwords present
      (the, be, to, of, and, that, have, with)
7     most-frequent-token share > 0.2
8     duplicate-bigram fraction > 0.4 (adapted from the n-gram
      repetition family — this engine's dup_bigram signal)
====  ==========================================================

Gopher's line-based rules (bullet-start / ellipsis-end line fractions) are
not represented: the engine's corpus convention is single-line documents
(see ``line_dedup`` for the line-structured path).

Signals reuse the exact conventions of ``quality_scores`` (mean word
length over raw text) and ``repetition_stats`` (lowered-token tf stats),
with all ratios e5-quantized, so the whole gate is expressible in SQL and
driver-oracle-checked.  Stateless vectorized ``map_batches``; no shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .arrow_np import col_np
from .repetition import repetition_batch
from .text_ops import _tokens_column

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_batch(
    batch: pa.Table,
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_word_e5: int = 300_000,
    max_mean_word_e5: int = 1_000_000,
    max_symbol_ratio_e5: int = 10_000,
    min_alpha_frac_e5: int = 80_000,
    min_stopword_hits: int = 2,
    max_top_token_e5: int = 20_000,
    max_dup_bigram_e5: int = 40_000,
) -> pa.Table:
    text = pc.fill_null(batch.column("text"), "")
    rep = repetition_batch(batch)
    n_tok = col_np(rep, "n_tokens")
    top_e5 = col_np(rep, "top_token_frac_e5")
    dup_e5 = col_np(rep, "dup_bigram_frac_e5")
    denom = np.maximum(n_tok, 1).astype(np.float64)

    # mean word length — quality_scores convention (raw-text non-ws chars)
    no_ws = pc.replace_substring_regex(text, r"\s", "")
    tok_chars = pc.utf8_length(no_ws).cast(pa.float64()).to_numpy(zero_copy_only=False)
    mean_e5 = np.where(
        n_tok == 0, 0, np.floor(tok_chars / denom * 100_000.0 + 0.5)
    ).astype(np.int64)

    # symbol-to-word ratio: '#' and '...' occurrences (non-overlapping)
    hashes = pc.count_substring(text, "#").cast(pa.int64()).to_numpy(zero_copy_only=False)
    dots = pc.count_substring(text, "...").cast(pa.int64()).to_numpy(zero_copy_only=False)
    sym_e5 = np.floor((hashes + dots) / denom * 100_000.0 + 0.5).astype(np.int64)

    # alphabetic-word fraction over the raw token split
    split, _trimmed = _tokens_column(text)
    flat = (split.combine_chunks() if isinstance(split, pa.ChunkedArray) else split)
    lens_raw = pc.list_value_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    values = flat.flatten()
    has_alpha = (
        pc.match_substring_regex(values, "[A-Za-z]")
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    starts = np.concatenate([[0], np.cumsum(lens_raw)[:-1]])
    alpha_per_doc = (
        np.add.reduceat(has_alpha, starts) if len(values) else np.zeros(len(n_tok))
    )
    alpha_e5 = np.where(
        n_tok == 0, 0, np.floor(alpha_per_doc / denom * 100_000.0 + 0.5)
    ).astype(np.int64)

    # distinct Gopher-stopword hits over the lowered normalized text
    joined = pc.binary_join(flat.cast(pa.list_(pa.string())), " ")
    padded = pc.binary_join_element_wise(
        pa.array([" "] * len(batch)), pc.utf8_lower(joined), pa.array([" "] * len(batch)), ""
    )
    stop_hits = np.zeros(len(batch), dtype=np.int64)
    for w in GOPHER_STOPWORDS:
        stop_hits += (
            pc.match_substring(padded, f" {w} ")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )

    mask = np.zeros(len(batch), dtype=np.int64)
    mask |= (n_tok < min_tokens) << 0
    mask |= (n_tok > max_tokens) << 1
    mask |= (mean_e5 < min_mean_word_e5) << 2
    mask |= (mean_e5 > max_mean_word_e5) << 3
    mask |= (sym_e5 > max_symbol_ratio_e5) << 4
    mask |= (alpha_e5 < min_alpha_frac_e5) << 5
    mask |= (stop_hits < min_stopword_hits) << 6
    mask |= (top_e5 > max_top_token_e5) << 7
    mask |= (dup_e5 > max_dup_bigram_e5) << 8

    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "fail_mask": pa.array(mask, pa.int64()),
            "keep": pa.array(mask == 0, pa.bool_()),
        }
    )


def gopher_gate(ds: rd.Dataset, **thresholds) -> rd.Dataset:
    """(doc_id, text) → (doc_id, n_tokens, fail_mask, keep)."""
    import functools

    return ds.map_batches(
        functools.partial(gopher_batch, **thresholds),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
