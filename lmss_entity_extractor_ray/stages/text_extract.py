"""Text-extraction stage — stateless ``map_batches`` over zero-copy Arrow.

First stage of the KG pipeline (SURVEY.md §3.2): resolve the authoritative
per-url text and immediately drop the fat ``html`` column so every downstream
block/shuffle payload is narrow (SURVEY.md §7.4.6).

The ``text`` column, when present, passes through untouched (zero-copy slice
of the input block) — the byte-identical-per-url invariant.  Only null-text
rows pay the html→text conversion.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import html_to_text


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """(url, warc_ts, html, text, lang, ...) → (url, text) with text resolved."""
    text = batch.column("text")
    null_mask = pc.is_null(text)
    if pc.any(null_mask).as_py():
        html = batch.column("html")
        resolved = []
        for i in range(batch.num_rows):
            v = text[i].as_py()
            if v is None:
                v = html_to_text(html[i].as_py())
            resolved.append(v)
        text = pa.array(resolved, pa.string())
    return pa.table({"url": batch.column("url"), "text": text})


def add_text_stage(ds, batch_size: int = 1024):
    return ds.map_batches(
        extract_text_batch,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
