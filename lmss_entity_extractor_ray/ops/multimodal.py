"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio decode libraries are absent from the target container, so the
decode kernel is STUBBED (deterministic fake features behind a clearly
marked seam) while everything Ray-side is real and tested: schema, actor
signature, batch sizing for fat binary rows, and output layout.

At 100 TB the pattern is: small ``batch_size`` (binary payloads dominate
block memory), ``num_cpus`` sized to the decode kernel, and the payload
column dropped immediately after feature extraction so downstream shuffles
stay narrow — the same drop-the-fat-column discipline as the KG pipeline's
``html`` (SURVEY.md §7.4.6).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

import ray.data as rd

PAYLOAD_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),
    ]
)

FEATURE_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("media_type", pa.string()),
        ("payload_sha256", pa.string()),
        ("payload_bytes", pa.int64()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


def real_decode(payload: bytes, media_type: str):
    """The seam a real deployment fills with PIL / ffmpeg / torchaudio."""
    raise NotImplementedError(
        "media decode libraries are not available in this container; "
        "DecodeStub provides the deterministic stand-in"
    )


class DecodeStub:
    """Actor-pool decode stage. __init__ is where a real decoder would load
    its model/codec once per actor; __call__ handles one (small) batch of
    fat binary rows and DROPS the payload column from its output."""

    def __init__(self, use_real_decoder: bool = False):
        self.use_real = use_real_decoder

    def _features(self, payload: bytes, media_type: str):
        if self.use_real:
            return real_decode(payload, media_type)  # pragma: no cover
        digest = hashlib.sha256(payload or b"").hexdigest()
        # deterministic fake dimensions derived from the digest
        w = 64 + int(digest[:4], 16) % 1024
        h = 64 + int(digest[4:8], 16) % 1024
        return digest, w, h

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("item_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        media = batch.column("media_type").to_pylist()
        shas, ws, hs, sizes = [], [], [], []
        for p, m in zip(payloads, media):
            sha, w, h = self._features(p, m)
            shas.append(sha)
            ws.append(w)
            hs.append(h)
            sizes.append(len(p or b""))
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "media_type": pa.array(media, pa.string()),
                "payload_sha256": pa.array(shas, pa.string()),
                "payload_bytes": pa.array(sizes, pa.int64()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
            }
        )


def decode_features(ds: rd.Dataset, batch_size: int = 32, concurrency=2) -> rd.Dataset:
    """Feature-extract a payload Dataset; small batch_size because binary
    rows are fat (batch x concurrency must fit the worker heap)."""
    return ds.map_batches(
        DecodeStub,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class ResizeStub:
    """Image-resize actor stage: same plumbing contract as DecodeStub —
    small batches of fat binary rows in, transformed payloads out.  The
    kernel (PIL/opencv) is stubbed with a deterministic byte-slice."""

    def __init__(self, max_bytes: int = 1 << 16):
        self.max_bytes = max_bytes  # a real impl would hold target WxH

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = [(p or b"")[: self.max_bytes] for p in batch.column("payload").to_pylist()]
        idx = batch.column_names.index("payload")
        return batch.set_column(idx, "payload", pa.array(payloads, pa.binary()))


class FrameSampleStub:
    """Video frame-sampling actor stage: one input row → N frame rows
    (flat_map-shaped fan-out).  Deterministic fake frames = byte strides."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, payloads = [], [], []
        for item_id, p in zip(
            batch.column("item_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            p = p or b""
            for f in range(self.n_frames):
                ids.append(item_id)
                frames.append(f)
                payloads.append(p[f :: self.n_frames])
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "frame": pa.array(frames, pa.int32()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )


def resize_payloads(ds: rd.Dataset, batch_size: int = 32, concurrency=2) -> rd.Dataset:
    return ds.map_batches(
        ResizeStub, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )


def sample_frames(ds: rd.Dataset, n_frames: int = 4, batch_size: int = 16, concurrency=2) -> rd.Dataset:
    return ds.map_batches(
        FrameSampleStub,
        fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def payloads_from_documents(docs_ds: rd.Dataset) -> rd.Dataset:
    """Adapter used by tests/queries: wrap the documents table's text bytes
    as opaque payloads so the decode plumbing runs on real driver data."""

    def wrap(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table(
            {
                "item_id": batch.column("doc_id"),
                "payload": pa.array([(t or "").encode("utf-8") for t in texts], pa.binary()),
                "media_type": pa.array(["text/plain"] * batch.num_rows, pa.string()),
            }
        )

    return docs_ds.map_batches(wrap, batch_format="pyarrow", zero_copy_batch=True)
