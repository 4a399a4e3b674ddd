"""Unigram language-model scoring — the CCNet-style perplexity quality
signal (Wenzek et al., arXiv:1911.00359 filter web text by LM perplexity):
score each document by its negative log-likelihood under a unigram LM fit
on the corpus itself.  High-NLL docs are out-of-distribution (gibberish,
boilerplate soup, wrong language); curation gates on it.

Two passes:
1. global token counts — per-block Arrow group_by partials folded through
   the bounded coordinator merge (vocabulary-bounded; for an open 10^12-doc
   vocabulary swap the fold for the hash-partitioned exchange used by
   distinct_tokens_exact);
2. broadcast the per-token quantized information content
   ``q(t) = floor(1e5 · ln(N / tf_t))`` once, then a map-only pass sums it
   per document.

Quantize-then-sum is what makes the driver's exact value oracle possible:
per-token q values are INTEGERS agreed bit-for-bit with DuckDB's
``ln`` (validated over every sf's vocabulary), and integer sums are
order-independent — summing raw floats would pick up engine- and
partitioning-dependent rounding.  (Residual risk: a token whose
1e5·ln(N/c) lands within one float ulp of an integer could floor
differently across libms; probability ~1e-7 per vocabulary and checked
empirically for the contract data.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from .combine import combine_partials
from .dedup import exact_tokens
from .heavy_hitters import _block_token_counts


def unigram_nll(ds: rd.Dataset) -> rd.Dataset:
    """(doc_id, n_tokens, nll_e5_sum) per document; see module docstring."""

    def partial(batch: pa.Table) -> pa.Table:
        return _block_token_counts(batch).rename_columns(["token", "p_n"])

    counts = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["token"],
        aggs=[("p_n", "sum", "c")],
        schema=pa.schema([("token", pa.string()), ("p_n", pa.int64())]),
    )
    c = counts.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
    n_total = float(c.sum())
    q = np.floor(100_000.0 * np.log(n_total / c)).astype(np.int64) if len(c) else c
    q_map = dict(zip(counts.column("token").to_pylist(), q.tolist()))
    q_ref = ray.put(q_map)

    def score(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        ids = batch.column("doc_id")
        n_toks, sums = [], []
        for t in batch.column("text").to_pylist():
            toks = exact_tokens(t)
            n_toks.append(len(toks))
            sums.append(sum(qm[tok] for tok in toks))
        return pa.table(
            {
                "doc_id": ids,
                "n_tokens": pa.array(n_toks, pa.int64()),
                "nll_e5_sum": pa.array(sums, pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def nll_buckets(ds: rd.Dataset, n_buckets: int = 3) -> rd.Dataset:
    """CCNet's head/middle/tail split (Wenzek et al. 2020 §4.4: partition
    the corpus into equal thirds by LM perplexity; training recipes then
    sample the buckets at different rates): (doc_id, nll_mean_e5, tile
    [, bucket]) where ``tile`` is the exact SQL ``ntile(n_buckets)`` over
    ascending per-doc mean NLL (integer: ``nll_e5_sum // n_tokens``) with
    doc_id tie-break, and ``bucket`` names the thirds when n_buckets == 3
    (tile 1 = lowest perplexity = head).

    Distributed shape: the unigram-NLL two-pass scorer, then ONE global
    range sort + the O(blocks) ordered prefix scan (ops/prefix.py) for the
    exact rank — no driver-side doc table, layout-independent, and
    bit-equal to the window-function oracle."""
    from .arrow_np import col_np
    from .prefix import ordered_cumsum

    scored = unigram_nll(ds)

    def mean_of(batch: pa.Table) -> pa.Table:
        n = col_np(batch, "n_tokens")
        s = col_np(batch, "nll_e5_sum")
        mean = np.where(n > 0, s // np.maximum(n, 1), 0).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "nll_mean_e5": pa.array(mean, pa.int64()),
                "one": pa.array(np.ones(len(mean), dtype=np.int64)),
            }
        )

    ranked = ordered_cumsum(
        scored.map_batches(mean_of, batch_format="pyarrow"),
        ["nll_mean_e5", "doc_id"],
        "one",
        out_col="rank0",
    )
    n_total = ranked.count()  # blocks are materialized refs — metadata count
    B = int(n_buckets)
    size, rem = divmod(n_total, B)
    labels = np.array(["head", "middle", "tail"])

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            cols = {
                "doc_id": batch.column("doc_id"),
                "nll_mean_e5": pa.array([], pa.int64()),
                "tile": pa.array([], pa.int64()),
            }
            if B == 3:
                cols["bucket"] = pa.array([], pa.string())
            return pa.table(cols)
        r = col_np(batch, "rank0")
        if size == 0:  # fewer docs than buckets: row r is its own tile
            tile = (r + 1).astype(np.int64)
        else:
            big_span = rem * (size + 1)  # first `rem` tiles hold one extra
            tile = np.where(
                r < big_span, r // (size + 1), rem + (r - big_span) // size
            ).astype(np.int64) + 1
        cols = {
            "doc_id": batch.column("doc_id"),
            "nll_mean_e5": batch.column("nll_mean_e5"),
            "tile": pa.array(tile, pa.int64()),
        }
        if B == 3:
            cols["bucket"] = pa.array(labels[tile - 1], pa.string())
        return pa.table(cols)

    return ranked.map_batches(assign, batch_format="pyarrow")


def bigram_nll(ds: rd.Dataset, num_partitions=None) -> rd.Dataset:
    """(doc_id, n_bigrams, nll_e5_sum) under an add-one-smoothed BIGRAM LM
    fit on the corpus itself — the conditional-probability step up from
    ``unigram_nll`` (CCNet's KenLM is a 5-gram; the bigram is the smallest
    model with the join-shaped scoring that open n-gram vocabularies force
    at 10^12 docs, where no count table can broadcast):

        q(w1, w2) = floor(1e5 · ln((c1(w1) + V) / (c2(w1, w2) + 1)))
        nll(doc)  = Σ over adjacent token pairs of q   (integer sum)

    with c2 = corpus bigram count, c1(w1) = Σ_w2 c2 (bigram-start count)
    and V = the EXACT corpus vocabulary size (distinct_tokens_exact).

    Distributed shape — counting and scoring are both exchanges, nothing
    vocabulary-sized touches the driver:
      1. one pass explodes docs to bigram occurrence rows (materialized —
         read twice);
      2. block-local (w1, w2) pre-counts → ONE hash exchange partitioned
         by hash(w1), so each partition derives c2, c1 AND the quantized
         q locally (c1 is a within-partition fold because all of a w1's
         bigrams co-locate);
      3. occurrences ⋈ q-table (distributed hash join on (w1, w2)) →
         in-block per-doc partial sums → groupby(doc_id) Sum — the
         doc key is near-unique, skew-safe;
      4. left-outer join back to the full doc list so <2-token docs emit
         (0, 0) rows.

    Quantize-then-sum (see module docstring) makes the DuckDB oracle
    exact: q values are integers agreed with SQL ``ln``, integer sums are
    order-independent."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .join import hash_join
    from .partitioning import shuffle_partitions, string_partition

    P = num_partitions or shuffle_partitions(ds)

    from .cardinality import distinct_tokens_exact

    V = int(
        distinct_tokens_exact(ds)
        .to_pandas()["n_distinct_tokens"]
        .iloc[0]
    )

    occ_schema = pa.schema(
        [("doc_id", pa.int64()), ("w1", pa.string()), ("w2", pa.string())]
    )

    def occ_rows(batch: pa.Table) -> pa.Table:
        ids_out, w1s, w2s = [], [], []
        for did, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            toks = exact_tokens(t)
            if len(toks) < 2:
                continue
            ids_out.extend([did] * (len(toks) - 1))
            w1s.extend(toks[:-1])
            w2s.extend(toks[1:])
        return pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "w1": pa.array(w1s, pa.string()),
                "w2": pa.array(w2s, pa.string()),
            }
        )

    occ = ds.map_batches(occ_rows, batch_format="pyarrow").materialize()

    def partial_c2(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.schema(
                [("w1", pa.string()), ("w2", pa.string()),
                 ("p_c", pa.int64()), ("part", pa.int32())]
            ).empty_table()
        g = (
            b.select(["w1", "w2"])
            .group_by(["w1", "w2"])
            .aggregate([([], "count_all")])
            .rename_columns(["w1", "w2", "p_c"])
        )
        part = pa.array(string_partition(g.column("w1"), P), pa.int32())
        return g.append_column("part", part)

    def q_table(group: pa.Table, V=V) -> pa.Table:
        g = (
            group.select(["w1", "w2", "p_c"])
            .group_by(["w1", "w2"])
            .aggregate([("p_c", "sum")])
            .rename_columns(["w1", "w2", "c2"])
        )
        c1t = (
            g.select(["w1", "c2"]).group_by(["w1"]).aggregate([("c2", "sum")])
            .rename_columns(["w1", "c1"])
        )
        idx = pc.index_in(g.column("w1"), value_set=c1t.column("w1").combine_chunks())
        c1 = np.asarray(c1t.column("c1"), dtype=np.float64)[np.asarray(idx)]
        c2 = np.asarray(g.column("c2"), dtype=np.float64)
        q = np.floor(100_000.0 * np.log((c1 + V) / (c2 + 1.0))).astype(np.int64)
        return pa.table(
            {"w1": g.column("w1"), "w2": g.column("w2"),
             "q": pa.array(q, pa.int64())}
        )

    qtbl = (
        occ.map_batches(partial_c2, batch_format="pyarrow")
        .groupby("part")
        .map_groups(q_table, batch_format="pyarrow")
    )

    joined = hash_join(occ, qtbl, on=["w1", "w2"], num_partitions=P)

    def per_doc_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.schema(
                [("doc_id", pa.int64()), ("p_q", pa.int64()), ("p_n", pa.int64())]
            ).empty_table()
        g = (
            b.select(["doc_id", "q"])
            .group_by(["doc_id"])
            .aggregate([("q", "sum"), ([], "count_all")])
        )
        return g.rename_columns(["doc_id", "p_q", "p_n"])

    agg = (
        joined.map_batches(per_doc_partial, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Sum("p_q", alias_name="s_q"), Sum("p_n", alias_name="s_n")
        )
    )

    base = ds.select_columns(["doc_id"])
    out = hash_join(base, agg, on="doc_id", how="left outer", num_partitions=P)

    def finish(b: pa.Table) -> pa.Table:
        zero = pa.scalar(0, pa.int64())
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_bigrams": pc.coalesce(b.column("s_n").cast(pa.int64()), zero),
                "nll_e5_sum": pc.coalesce(b.column("s_q").cast(pa.int64()), zero),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")
