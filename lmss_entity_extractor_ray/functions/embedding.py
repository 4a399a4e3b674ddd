"""Deterministic hashed-character-n-gram text embeddings.

Stand-in for the reference's ``SentenceTransformer("all-MiniLM-L6-v2")``
(reference: app/lmss_parser.py:20, app/entity_extraction.py:154,
app/lmss_classification.py:27, app/lmss_search.py:37 — four separate model
copies) in an environment without torch.  The role is identical: a pure
``text -> R^d`` map used for cosine similarity; applied to class fields (mean
over the four text fields, reference app/lmss_classification.py:50-60) and to
mention/query texts.  Correctness of the engine is defined as parity with the
reference-mirror oracle *using this same embedder* (SURVEY.md §7.0).

Determinism: buckets/signs come from ``zlib.crc32`` (stable across processes
and machines, unlike Python's salted ``hash``).
"""

from __future__ import annotations

import re
import zlib

import numpy as np

from ..config import EMBED_DIM

_WS_RE = re.compile(r"\s+")

_SIGN_BIT = 1 << 16  # mid bit of the crc — independent of the bucket (low bits)


def _grams(text: str):
    """Character trigrams of the padded, whitespace-collapsed, lowercased text,
    plus word unigrams — a classic hashing-trick feature set."""
    s = _WS_RE.sub(" ", text.strip().lower())
    if not s:
        return []
    out = list(s.split(" "))
    padded = f" {s} "
    out.extend(padded[i : i + 3] for i in range(len(padded) - 2))
    return out


def embed_text(text: str, dim: int = EMBED_DIM) -> np.ndarray:
    """Unit-norm float32 vector; all-zeros for empty/whitespace text."""
    vec = np.zeros(dim, dtype=np.float64)
    for g in _grams(text):
        h = zlib.crc32(g.encode("utf-8"))
        sign = 1.0 if (h & _SIGN_BIT) else -1.0
        vec[h % dim] += sign
    norm = np.linalg.norm(vec)
    if norm > 0:
        vec /= norm
    return vec.astype(np.float32)


def embed_texts(texts, dim: int = EMBED_DIM) -> np.ndarray:
    """Stack of `embed_text` rows, shape (len(texts), dim) float32."""
    if len(texts) == 0:
        return np.zeros((0, dim), dtype=np.float32)
    return np.stack([embed_text(t, dim) for t in texts])


def cosine(v1: np.ndarray, v2: np.ndarray) -> float:
    """Cosine similarity with the reference's empty/zero-vector guard
    (reference: app/lmss_search.py:106-110)."""
    if v1.size == 0 or v2.size == 0:
        return 0.0
    n1 = np.linalg.norm(v1)
    n2 = np.linalg.norm(v2)
    if n1 == 0.0 or n2 == 0.0:
        return 0.0
    return float(np.dot(v1, v2) / (n1 * n2))
