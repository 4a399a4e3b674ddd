"""URL canonicalization + URL-level dedup.

Web crawls re-fetch the same page under many URL spellings — tracking
parameters, fragments, trailing slashes.  URL dedup (keep the LATEST crawl
per canonical URL) is the cheapest, highest-yield dedup pass in a crawl
pipeline and runs before any content-based dedup (CCNet, RefinedWeb both
key their dedup stages on a normalized URL).

``canonical_url`` is a fixed chain of RE2 replacements (Arrow's
``replace_substring_regex`` here, ``regexp_replace(..., 'g')`` in the
DuckDB oracle — both RE2 families, so the semantics match):

1. strip the fragment (``#...``),
2. strip tracking parameters (``utm_*``, ``gclid``, ``fbclid``),
3. tidy the query string the stripping left behind (``&&``→``&``,
   ``?&``→``?``, trailing ``?``/``&``),
4. strip trailing slashes.

Host/scheme case-folding is intentionally out of scope (path case is
significant; the corpus generator emits lowercase hosts).

``url_dedup`` keeps, per canonical URL, the row with the greatest
``warc_ts`` (tie: smallest raw url string).  Two-phase keep-best: a
block-local best-per-canon partial shrinks the exchange to one row per
(canon, block), then one hash exchange finishes the group — the same
combiner shape as ``exact_dedup_groups``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .partitioning import shuffle_partitions, string_partition

# applied in order; each is (pattern, replacement)
_CANON_STEPS = [
    (r"#.*", ""),
    (r"(utm_[A-Za-z0-9_]+|gclid|fbclid)=[^&#]*", ""),
    (r"&&+", "&"),
    (r"\?&", "?"),
    (r"[?&]+$", ""),
    (r"/+$", ""),
]


def canonical_url(col) -> pa.ChunkedArray:
    """Vectorized canonicalization of a string column."""
    out = col
    for pat, rep in _CANON_STEPS:
        out = pc.replace_substring_regex(out, pattern=pat, replacement=rep)
    return out


def _best_per_canon(tbl: pa.Table) -> pa.Table:
    """One row per canonical_url: max warc_ts, tie-break min url —
    vectorized first-row-per-run over a (canon asc, ts desc, url asc) sort."""
    order = pc.sort_indices(
        tbl,
        sort_keys=[
            ("canonical_url", "ascending"),
            ("warc_ts", "descending"),
            ("url", "ascending"),
        ],
    )
    s = tbl.take(order)
    c = s.column("canonical_url").combine_chunks()
    if len(c) == 0:
        return s
    neq = pc.not_equal(c.slice(1), c.slice(0, len(c) - 1))
    if isinstance(neq, pa.ChunkedArray):
        neq = neq.combine_chunks()
    first = pa.concat_arrays([pa.array([True]), neq])
    return s.filter(first)


def url_dedup(
    ds: rd.Dataset,
    num_partitions: int | None = None,
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> rd.Dataset:
    """(url, warc_ts) → (canonical_url, url, warc_ts, n_dups): the latest
    crawl per canonical URL plus how many raw rows collapsed into it."""

    P = max(2, num_partitions or shuffle_partitions(ds))

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "canonical_url": canonical_url(batch.column(url_col)),
                "url": batch.column(url_col),
                "warc_ts": batch.column(ts_col),
            }
        )
        best = _best_per_canon(t)
        counts = t.group_by(["canonical_url"]).aggregate([([], "count_all")])
        counts = counts.rename_columns(["canonical_url", "p_cnt"])
        out = best.join(counts, keys=["canonical_url"])
        return out.append_column(
            "part", pa.array(string_partition(out.column("canonical_url"), P))
        )

    # finish is vectorized over ALL the canons of one hash partition —
    # grouping by canonical_url itself would invoke the UDF once per URL
    # (corpus-cardinality Python calls; see packed_csv_lists for the measured
    # cost of that shape)
    def finish(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["part"])
        best = _best_per_canon(group)
        n = group.group_by(["canonical_url"]).aggregate([("p_cnt", "sum")])
        out = best.join(n, keys=["canonical_url"]).rename_columns(
            ["canonical_url", "url", "warc_ts", "p_cnt", "n_dups"]
        )
        return out.drop_columns(["p_cnt"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(finish, batch_format="pyarrow")
    )
