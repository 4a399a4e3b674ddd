"""Document-format dispatch (reference upload seam, app/main.py:211-228 —
SURVEY.md §2.1 S5-S7, §2.2 M12).

The reference dispatches on file suffix to txt (raw decode), pdf (PyPDF2
page concat) and docx (paragraph join) and rejects everything else with an
HTTP error.  The engine's equivalent is a ``map_batches`` dispatcher over a
``(doc_key, payload:binary, kind:string)`` table: txt and html decode raw;
pdf and docx go through the pure-Python extractors in ``filetypes.py``
(PyPDF2/python-docx are absent from this container, so both formats are
re-implemented from the public specs); unknown kinds and malformed payloads
land in a ``quarantine`` column instead of raising — bad rows must never
kill a 100 TB job.  ``register_extractor`` remains the seam for plugging in
richer extractors.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import pyarrow as pa

import ray.data as rd

from ..functions.text import html_to_text

Extractor = Callable[[bytes], str]

_EXTRACTORS: Dict[str, Extractor] = {}


def register_extractor(kind: str, fn: Extractor) -> None:
    """Plug in a real pdf/docx/... extractor (the reference's suffix-dispatch
    seam, app/main.py:212-227, made explicit)."""
    _EXTRACTORS[kind] = fn


def _txt(payload: bytes) -> str:
    return (payload or b"").decode("utf-8", errors="replace")


def _html(payload: bytes) -> str:
    return html_to_text(payload)


register_extractor("txt", _txt)
register_extractor("html", _html)

# Real pure-Python PDF/DOCX extraction (filetypes.py re-implements the
# reference's PyPDF2 page-concat / python-docx paragraph-join from the public
# file-format specs — app/main.py:216-223); malformed payloads raise and land
# in quarantine via extract_text's catch-all.
from .filetypes import extract_docx, extract_pdf  # noqa: E402

register_extractor("pdf", extract_pdf)
register_extractor("docx", extract_docx)


def extract_text(payload: Optional[bytes], kind: str) -> tuple:
    """(text, quarantine_reason) — exactly one of the two is non-None."""
    fn = _EXTRACTORS.get(kind)
    if fn is None:
        return None, f"unsupported kind: {kind}"  # reference rejects .doc etc.
    try:
        return fn(payload), None
    except NotImplementedError as e:
        return None, str(e)
    except Exception as e:  # malformed payloads quarantine, never raise
        return None, f"{type(e).__name__}: {e}"


def dispatch_batch(batch: pa.Table) -> pa.Table:
    payloads = batch.column("payload").to_pylist()
    kinds = batch.column("kind").to_pylist()
    texts, quarantine = [], []
    for p, k in zip(payloads, kinds):
        t, q = extract_text(p, k)
        texts.append(t)
        quarantine.append(q)
    out = batch.drop_columns(["payload"])  # drop the fat column immediately
    out = out.append_column("text", pa.array(texts, pa.string()))
    return out.append_column("quarantine", pa.array(quarantine, pa.string()))


def extract_documents(ds: rd.Dataset, batch_size: int = 256) -> rd.Dataset:
    """(..., payload, kind) → (..., text, quarantine); payload dropped."""
    return ds.map_batches(dispatch_batch, batch_format="pyarrow", batch_size=batch_size)
