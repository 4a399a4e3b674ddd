"""JSONL corpus source — the Dolma / RedPajama / C4 distribution layout
(one JSON object per line, usually ``.jsonl.gz``), mapped onto the
engine's corpus shape.

Ray's ``read_json`` (Arrow JSON reader underneath) already handles
line-delimited JSON and gzip transparently per file; this module is the
SCHEMA seam: public web-text dumps disagree on key names (``url`` vs
``id``, ``text`` vs ``content``, ``timestamp`` vs ``created``), so the
reader takes a key mapping and emits exactly ``(url, text, html=null
[, warc_ts, lang])`` — which feeds ``pipelines.kg.triples_dataset``
unchanged (text present → ``resolve_text`` uses it verbatim, the
byte-identity invariant).  Missing keys become nulls, never errors: a
corpus with no language tag still runs every text-keyed pipeline.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa


def read_jsonl_corpus(
    paths,
    url_key: str = "url",
    text_key: str = "text",
    ts_key: Optional[str] = None,
    lang_key: Optional[str] = None,
) -> "ray.data.Dataset":  # noqa: F821
    """Read ``.jsonl`` / ``.jsonl.gz`` web-text files into the corpus shape
    ``(url string, html null binary, text string[, warc_ts, lang])``."""
    import ray.data as rd

    ds = rd.read_json(paths)

    def shape(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        names = set(batch.column_names)

        def col(key, typ):
            if key is not None and key in names:
                return batch.column(key).cast(typ)
            return pa.nulls(n, typ)

        cols = {
            "url": col(url_key, pa.string()),
            "html": pa.nulls(n, pa.binary()),
            "text": col(text_key, pa.string()),
        }
        if ts_key is not None:
            cols["warc_ts"] = col(ts_key, pa.timestamp("us"))
        if lang_key is not None:
            cols["lang"] = col(lang_key, pa.string())
        return pa.table(cols)

    return ds.map_batches(shape, batch_format="pyarrow")
