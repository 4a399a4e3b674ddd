"""Ontology acquisition utilities — reference ``download_ontology`` +
hash gate (app/lmss_parser.py:24-42, app/run_parser.py:39-45; SURVEY.md §2.1
S1/S10).  Driver-side one-shots, not Dataset ops: the artifact build is
seconds of work cached under a content-hash key (artifacts.build_or_load).
"""

from __future__ import annotations

import hashlib
import os


def github_raw_url(url: str) -> str:
    """GitHub blob URL → raw URL (reference app/lmss_parser.py:26-28)."""
    if "github.com" in url and "/blob/" in url:
        return url.replace("github.com", "raw.githubusercontent.com").replace("/blob/", "/")
    return url


def sha256_file(path: str) -> str:
    """Streaming sha256 (reference calculate_file_hash, app/lmss_parser.py:36-42)."""
    sha = hashlib.sha256()
    with open(path, "rb") as f:
        for block in iter(lambda: f.read(1 << 16), b""):
            sha.update(block)
    return sha.hexdigest()


def download_ontology(url: str, save_path: str, opener=None) -> bool:
    """Fetch the OWL file to ``save_path``; returns success.  ``opener`` is
    injectable for tests (this container has no network).  Mirrors the
    reference's rewrite-then-GET flow (app/lmss_parser.py:24-34)."""
    raw = github_raw_url(url)
    try:
        if opener is None:
            from urllib.request import urlopen as opener  # pragma: no cover
        data = opener(raw).read()
        os.makedirs(os.path.dirname(os.path.abspath(save_path)), exist_ok=True)
        with open(save_path, "wb") as f:
            f.write(data)
        return True
    except Exception:
        return False


def needs_rebuild(owl_path: str, hash_path: str) -> bool:
    """Hash-gate check: rebuild iff the stored hash is missing or differs
    (reference app/run_parser.py:39-45)."""
    if not os.path.exists(hash_path):
        return True
    with open(hash_path) as f:
        stored = f.read().strip()
    return stored != sha256_file(owl_path)


def store_hash(owl_path: str, hash_path: str) -> None:
    with open(hash_path, "w") as f:
        f.write(sha256_file(owl_path))
