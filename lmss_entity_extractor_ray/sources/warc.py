"""WARC (ISO 28500 / WARC 1.0) source — Common Crawl's native container.

The north-rule input is a "Parquet table of Common-Crawl-style web pages";
upstream of that parquet sits the crawl itself: ``.warc`` / ``.warc.gz``
files of HTTP response records.  This module is the spec-level ingestion
seam (the same pattern as the pure-Python PDF/DOCX readers in
``filetypes.py``): a writer that emits standards-conformant WARC response
records (so round-trip tests pin the byte format), a record parser, and a
Ray Data reader that turns a directory of WARC files into the engine's
corpus shape ``(url, warc_ts, html, text=null)`` — the KG pipeline's
``resolve_text`` then extracts text from the html exactly as it does for
null-text parquet rows, so WARC-fed and parquet-fed runs emit identical
triples (pytest asserts the keyset equality end to end).

Format subset implemented (everything Common Crawl response records use):

- record head: ``WARC/1.0`` + CRLF header block terminated by a blank
  line; ``Content-Length`` is the payload byte count; two CRLFs close the
  record;
- ``WARC-Type: response`` payloads are full HTTP responses — status line,
  headers, blank line, body; the reader strips the HTTP envelope and
  returns the body bytes VERBATIM (byte-identity pytest);
- non-response records (``warcinfo``, ``request``, ``metadata``) are
  skipped, as a CC reader must;
- ``.gz`` files hold one gzip MEMBER PER RECORD (the CC convention);
  ``gzip.GzipFile`` reads concatenated members transparently, so the
  same scan handles both layouts.

Scale shape: one WARC file is one input block (CC shards are ~1 GiB —
the natural task granularity); parsing is a single forward scan with no
per-record Python beyond header splitting, and the reader is a plain
``read_binary_files → map_batches`` pipeline, so 10^5 files fan out as
ordinary Ray tasks.  A record-offset index (CC publishes ``.warc.paths``
+ CDX) would subdivide giant files; the seam is ``parse_warc_bytes``.
"""

from __future__ import annotations

import gzip
import hashlib
import io
from datetime import datetime, timezone
from typing import List, Optional, Tuple

import pyarrow as pa

_CRLF = b"\r\n"


def _record_id(url: str, ts: str) -> str:
    """Deterministic WARC-Record-ID (sha-based urn:uuid shape — the spec
    requires global uniqueness, not randomness)."""
    h = hashlib.sha256(f"{url}\n{ts}".encode("utf-8")).hexdigest()
    return f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"


def _warc_date(ts_us: int) -> str:
    dt = datetime.fromtimestamp(ts_us / 1_000_000, tz=timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


def _parse_warc_date(s: str) -> int:
    dt = datetime.strptime(s.strip(), "%Y-%m-%dT%H:%M:%SZ").replace(
        tzinfo=timezone.utc
    )
    return int(dt.timestamp() * 1_000_000)


def build_response_record(url: str, ts_us: int, html: bytes) -> bytes:
    """One standards-shaped WARC/1.0 response record (HTTP envelope
    included), CRLF-terminated."""
    http = (
        b"HTTP/1.1 200 OK" + _CRLF
        + b"Content-Type: text/html; charset=UTF-8" + _CRLF
        + b"Content-Length: " + str(len(html)).encode() + _CRLF
        + _CRLF
        + html
    )
    date = _warc_date(ts_us)
    head = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: response" + _CRLF
        + b"WARC-Record-ID: " + _record_id(url, date).encode() + _CRLF
        + b"WARC-Date: " + date.encode() + _CRLF
        + b"WARC-Target-URI: " + url.encode() + _CRLF
        + b"Content-Type: application/http; msgtype=response" + _CRLF
        + b"Content-Length: " + str(len(http)).encode() + _CRLF
        + _CRLF
    )
    return head + http + _CRLF + _CRLF


def _warcinfo_record(filename: str) -> bytes:
    body = b"software: lmss_entity_extractor_ray\r\nformat: WARC File Format 1.0\r\n"
    head = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: warcinfo" + _CRLF
        + b"WARC-Record-ID: " + _record_id(filename, "info").encode() + _CRLF
        + b"WARC-Date: 2024-10-22T00:00:00Z" + _CRLF
        + b"WARC-Filename: " + filename.encode() + _CRLF
        + b"Content-Type: application/warc-fields" + _CRLF
        + b"Content-Length: " + str(len(body)).encode() + _CRLF
        + _CRLF
    )
    return head + body + _CRLF + _CRLF


def write_warc(
    path: str, rows: List[Tuple[str, int, bytes]], gzip_records: Optional[bool] = None
) -> str:
    """Write (url, warc_ts_us, html_bytes) rows as one WARC file (leading
    warcinfo record, then one response record per row).  ``gzip_records``
    defaults from the ``.gz`` suffix; gzipped files use one gzip member
    per record — the Common Crawl layout."""
    import os

    if gzip_records is None:
        gzip_records = path.endswith(".gz")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    records = [_warcinfo_record(os.path.basename(path))] + [
        build_response_record(u, t, h) for u, t, h in rows
    ]
    with open(path, "wb") as f:
        if gzip_records:
            for rec in records:
                f.write(gzip.compress(rec, mtime=0))
        else:
            for rec in records:
                f.write(rec)
    return path


def parse_warc_bytes(data: bytes) -> List[dict]:
    """Forward-scan a (possibly multi-member-gzipped) WARC byte string into
    response rows: {url, warc_ts (us), html (bytes)}."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
    out: List[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            break
        head = data[pos:head_end].decode("utf-8", errors="replace")
        lines = head.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            raise ValueError(f"not a WARC record at offset {pos}")
        hdrs = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            hdrs[k.strip().lower()] = v.strip()
        if "content-length" not in hdrs:
            raise ValueError(f"WARC record without Content-Length at offset {pos}")
        length = int(hdrs["content-length"])
        body_start = head_end + 4
        if body_start + length > n:
            break  # truncated final record: never emit a partial payload
        payload = data[body_start : body_start + length]
        pos = body_start + length
        if hdrs.get("warc-type") == "response":
            http_end = payload.find(_CRLF + _CRLF)
            html = payload[http_end + 4 :] if http_end >= 0 else payload
            out.append(
                {
                    "url": hdrs["warc-target-uri"],
                    "warc_ts": _parse_warc_date(hdrs["warc-date"]),
                    "html": html,
                }
            )
    return out


def read_warc(paths) -> "ray.data.Dataset":  # noqa: F821
    """Ray Data reader: WARC files → the engine's corpus shape
    (url string, warc_ts timestamp[us], html binary, text null) — feed it
    straight to ``pipelines.kg.triples_dataset`` (resolve_text extracts
    text from html, the same path null-text parquet rows take)."""
    import ray.data as rd

    files = rd.read_binary_files(paths)

    def parse(batch: pa.Table) -> pa.Table:
        urls: List[str] = []
        tss: List[int] = []
        htmls: List[bytes] = []
        for blob in batch.column("bytes").to_pylist():
            for rec in parse_warc_bytes(blob):
                urls.append(rec["url"])
                tss.append(rec["warc_ts"])
                htmls.append(rec["html"])
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array([None] * len(urls), pa.string()),
            }
        )

    return files.map_batches(parse, batch_format="pyarrow")
