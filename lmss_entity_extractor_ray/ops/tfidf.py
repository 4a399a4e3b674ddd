"""Corpus-level TF-IDF keywords.

The reference computes tf-idf over a SINGLE document (1-doc idf — SURVEY.md
§2.2 M7, `app/entity_extraction.py:118-134`); a corpus-scale engine needs
the real thing: document frequency across the whole corpus, then per-doc
top-k terms.  Two passes:

1. ``(doc, term) → tf`` rows (Arrow-tokenized, per-block ``group_by``) —
   the inverted-index-sized intermediate; df = number of docs per term via
   ONE distributed groupby on the term key (near-uniform, no salt needed).
2. score every (doc, term) row and keep each doc's top-k via the shared
   grouped-top-k exchange (ops/topk.py).

The df table is broadcast as object-store block refs and looked up with
Arrow ``index_in`` — the same pattern as the KG vocab broadcast; at true
open-vocabulary scale swap the broadcast for a hash_join on term
(ops/join.py) — both sides of that seam exist in this repo.

Scoring is the LOG-FREE rational form ``tf / df`` (N is constant per
corpus, so the ranking is identical to tf·log-idf for any monotone idf):
IEEE double division is correctly rounded, so scores — and the DuckDB
oracle's ``row_number`` ordering — are bit-for-bit reproducible, which a
``ln()``-based score is not across libm implementations.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from .arrow_np import col_np
from .dedup import exact_tokens
from .topk import group_topk

_DF_CACHE: dict = {}  # per-process broadcast cache (one entry)


def doc_term_tf(docs_ds: rd.Dataset) -> rd.Dataset:
    """(doc_id, term, tf) — one row per distinct term per doc."""

    def tf_batch(batch: pa.Table) -> pa.Table:
        ids: List[int] = []
        terms: List[str] = []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            toks = exact_tokens(text)
            ids.extend([doc_id] * len(toks))
            terms.extend(toks)
        t = pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "term": pa.array(terms, pa.string())}
        )
        g = t.group_by(["doc_id", "term"]).aggregate([([], "count_all")])
        return g.rename_columns(["doc_id", "term", "tf"])

    return docs_ds.map_batches(tf_batch, batch_format="pyarrow")


def term_df(tf_ds: rd.Dataset) -> rd.Dataset:
    """(term, df) — docs containing each term.  tf rows are distinct per
    (doc, term), so df is a count; partials pre-shrink the term shuffle."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["term"]).aggregate([([], "count_all")])
        return g.rename_columns(["term", "p_df"])

    return (
        tf_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("p_df", alias_name="df"))
    )


def tfidf_topk(
    docs_ds: rd.Dataset, k: int = 10, num_partitions: Optional[int] = None,
    broadcast_vocab_limit: int = 5_000_000,
) -> rd.Dataset:
    """Top-k terms per doc by tf/df (ties → term asc), with rank ``rn`` and
    the e5-scaled score.

    Vocabularies up to ``broadcast_vocab_limit`` terms broadcast the df
    table by block refs (index_in lookup per batch); open-web vocabularies
    beyond it switch to a distributed hash_join on the term key — identical
    scores either way (one df per term)."""
    tf = doc_term_tf(docs_ds).materialize()
    df_ds = term_df(tf).materialize()
    if df_ds.count() > broadcast_vocab_limit:
        from .join import hash_join

        joined = hash_join(tf, df_ds, on="term", num_partitions=num_partitions)

        def score_joined(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table(
                    {"doc_id": pa.array([], pa.int64()),
                     "term": pa.array([], pa.string()),
                     "score": pa.array([], pa.float64())}
                )
            return pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "term": batch.column("term"),
                    "score": pa.array(
                        col_np(batch, "tf", np.float64) / col_np(batch, "df", np.float64),
                        pa.float64(),
                    ),
                }
            )

        scored = joined.map_batches(score_joined, batch_format="pyarrow")
        top = group_topk(
            scored, key="doc_id", value="score", id_col="term", k=k,
            num_partitions=num_partitions,
        )
        return top.map_batches(_finish_e5, batch_format="pyarrow")
    df_refs = list(df_ds.to_arrow_refs())

    def _df_table(refs) -> Optional[pa.Table]:
        # once per worker process: fetch the df blocks (plasma-cached,
        # zero-copy) and concat — the same broadcast-by-refs pattern as the
        # KG vocab lookup (stages/kg_stage._vocab_for)
        key = tuple(r.hex() for r in refs)
        cached = _DF_CACHE.get(key)
        if cached is None:
            parts = [t for t in ray.get(list(refs)) if t.num_rows]
            cached = pa.concat_tables(parts).combine_chunks() if parts else False
            _DF_CACHE.clear()
            _DF_CACHE[key] = cached
        return cached or None

    def score(batch: pa.Table) -> pa.Table:
        vocab = _df_table(df_refs)
        if batch.num_rows == 0 or vocab is None:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "score": pa.array([], pa.float64()),
                }
            )
        li = pc.index_in(batch.column("term"), value_set=vocab.column("term"))
        idx = li.to_numpy(zero_copy_only=False).astype(np.int64)
        dfv = col_np(vocab, "df", np.float64)[idx]
        tfv = col_np(batch, "tf", np.float64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "term": batch.column("term"),
                "score": pa.array(tfv / dfv, pa.float64()),
            }
        )

    scored = tf.map_batches(score, batch_format="pyarrow")
    top = group_topk(
        scored, key="doc_id", value="score", id_col="term", k=k,
        num_partitions=num_partitions,
    )
    return top.map_batches(_finish_e5, batch_format="pyarrow")


def _finish_e5(batch: pa.Table) -> pa.Table:
    e5 = np.floor(col_np(batch, "score") * 100_000.0 + 0.5).astype(np.int64)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "term": batch.column("term"),
            "tfidf_e5": pa.array(e5, pa.int64()),
            "rn": batch.column("rn"),
        }
    )
