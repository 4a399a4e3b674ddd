"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §F1).

Schema is exactly ``BASELINE.json.input_hint``:
``url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string``.

Every row is a pure function of ``(seed, row_index)`` — ``random.Random``
seeded per row — so driver-side tables, distributed generation via
``ray.data.range(n).map_batches`` and re-runs all agree byte-for-byte.

Content: seeded sentences over a legal phrase bank built from the fixture
ontology's surface forms (exact, case-varied, typo-perturbed — Zipf-weighted
toward hot classes to exercise salted aggregation) mixed with distractor
prose; ~5% empty/whitespace texts (empty-input guard,
app/entity_extraction.py:160-162); ~2% null texts forcing the html→text path.
"""

from __future__ import annotations

import random
from typing import Dict, List

import numpy as np
import pyarrow as pa

CORPUS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_EPOCH_US = 1_729_555_200_000_000  # 2024-10-22T00:00:00Z
_N_SITES = 97

_TEMPLATES = [
    "The court considered {} in its ruling on the appeal.",
    "Counsel advised the client regarding {} before the hearing.",
    "This memorandum addresses {} and its implications.",
    "The firm has a long history of work in {} across jurisdictions.",
    "Recent legislation has reshaped {} significantly.",
    "Our practice group focuses on {} for multinational clients.",
    "The tribunal heard arguments concerning {} last week.",
    "An expert witness testified about {} during the proceedings.",
]

_DISTRACTORS = [
    "The quarterly report shows steady growth in regional markets.",
    "Employees gathered for the annual meeting in the main hall.",
    "The weather forecast predicts rain for the rest of the week.",
    "A new cafeteria menu was announced on Monday morning.",
    "Visitors praised the museum's renovated sculpture garden.",
    "The committee will publish its findings early next year.",
    "Several volunteers helped organize the charity marathon.",
    "The library extended its opening hours for exam season.",
]


def make_phrase_bank(artifacts) -> List[str]:
    """Surface forms in index (Zipf) order: label, prefLabel, altLabels."""
    bank: List[str] = []
    seen = set()
    for i in range(len(artifacts.iris)):
        for form in [artifacts.labels[i], artifacts.pref_labels[i], *artifacts.alt_labels[i]]:
            f = form.strip()
            if len(f) >= 3 and f.lower() not in seen:
                bank.append(f)
                seen.add(f.lower())
    return bank


def _pick_zipf(rng: random.Random, n: int) -> int:
    """Zipf-ish index in [0, n): inverse-CDF of 1/(k+1) weights via rejection-free
    power transform (deterministic given rng state)."""
    u = rng.random()
    k = int(n ** u) - 1
    return max(0, min(n - 1, k))


def _perturb(rng: random.Random, phrase: str) -> str:
    r = rng.random()
    if r < 0.10:  # typo: duplicate an interior character
        if len(phrase) > 4:
            k = rng.randrange(1, len(phrase) - 1)
            return phrase[:k] + phrase[k] + phrase[k:]
        return phrase
    if r < 0.20:
        return phrase.upper()
    if r < 0.30:
        return phrase.lower()
    return phrase


def _doc_text(rng: random.Random, bank: List[str]) -> str:
    n_sent = 2 + rng.randrange(5)
    sentences = []
    for _ in range(n_sent):
        if bank and rng.random() < 0.7:
            phrase = _perturb(rng, bank[_pick_zipf(rng, len(bank))])
            sentences.append(_TEMPLATES[rng.randrange(len(_TEMPLATES))].format(phrase))
        else:
            sentences.append(_DISTRACTORS[rng.randrange(len(_DISTRACTORS))])
    return " ".join(sentences)


def gen_rows(indices, seed: int, bank: List[str]) -> Dict[str, list]:
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i in indices:
        i = int(i)
        rng = random.Random((seed << 32) ^ i)
        body = _doc_text(rng, bank)
        html = (
            b"<html><head><title>T%d</title></head><body><p>" % i
            + body.encode("utf-8")
            + b"</p></body></html>"
        )
        r = rng.random()
        if r < 0.02:
            text = None              # null → html→text path
        elif r < 0.07:
            text = "   " if r < 0.045 else ""   # empty-input guard rows
        else:
            text = body
        lr = rng.random()
        lang = "en" if lr < 0.9 else ("de" if lr < 0.95 else "fr")
        urls.append(f"https://site{i % _N_SITES}.example/page/{i}")
        tss.append(_EPOCH_US + i * 1_000_000)
        htmls.append(html)
        texts.append(text)
        langs.append(lang)
    return {"url": urls, "warc_ts": tss, "html": htmls, "text": texts, "lang": langs}


def corpus_table(n: int, seed: int = 42, bank: List[str] = ()) -> pa.Table:
    cols = gen_rows(range(n), seed, list(bank))
    return pa.table(
        {
            "url": pa.array(cols["url"], pa.string()),
            "warc_ts": pa.array(cols["warc_ts"], pa.timestamp("us")),
            "html": pa.array(cols["html"], pa.binary()),
            "text": pa.array(cols["text"], pa.string()),
            "lang": pa.array(cols["lang"], pa.string()),
        }
    )


def write_corpus(
    out_dir: str, n: int, seed: int = 42, bank: List[str] = (), rows_per_file: int = 25_000
) -> List[str]:
    """Write the corpus as multiple parquet files (the pipeline's shard /
    resume unit).  Uses plain pyarrow writes in a loop — generation is a
    pre-benchmark setup step, not the measured pipeline."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    bank = list(bank)
    for file_idx, lo in enumerate(range(0, n, rows_per_file)):
        hi = min(n, lo + rows_per_file)
        path = os.path.join(out_dir, f"corpus-{file_idx:05d}.parquet")
        if not os.path.exists(path):
            tbl = pa.table(
                {
                    k: pa.array(v, CORPUS_SCHEMA.field(k).type)
                    for k, v in gen_rows(range(lo, hi), seed, bank).items()
                }
            )
            pq.write_table(tbl, path)
        paths.append(path)
    return paths


def write_corpus_distributed(
    out_dir: str, n: int, seed: int = 42, bank: List[str] = (), rows_per_file: int = 25_000
) -> List[str]:
    """Distributed corpus generation: ``ray.data.range(n)`` → ``map_batches``
    over the pure per-row generator → one file per shard.  Used by the bench
    harness for large corpora (Ray must already be initialised)."""
    import os

    import ray
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    done_marker = os.path.join(out_dir, f".done-{n}-{seed}")
    if os.path.exists(done_marker):
        import glob

        return sorted(glob.glob(os.path.join(out_dir, "*.parquet")))

    bank_ref = ray.put(list(bank))

    def gen_batch(batch: Dict[str, np.ndarray]) -> pa.Table:
        bank_local = ray.get(bank_ref)
        cols = gen_rows(batch["id"].tolist(), seed, bank_local)
        return pa.table(
            {k: pa.array(v, CORPUS_SCHEMA.field(k).type) for k, v in cols.items()}
        )

    (
        rd.range(n, override_num_blocks=max(1, n // rows_per_file))
        .map_batches(gen_batch, batch_format="numpy", batch_size=rows_per_file)
        .write_parquet(out_dir)
    )
    with open(done_marker, "w") as f:
        f.write("ok")
    import glob

    return sorted(glob.glob(os.path.join(out_dir, "*.parquet")))


# ---------------------------------------------------------------------------
# documents-shaped corpus for large-scale dedup/curation smokes
# ---------------------------------------------------------------------------

def _doc_body(i: int, seed: int, bank: List[str]) -> str:
    """Pure function of (seed, index) — lets duplicate rows regenerate their
    SOURCE body without reading other rows (each generator task stays
    independent)."""
    rng = random.Random((seed << 33) ^ (i * 2 + 1))
    return _doc_text(rng, bank)


def gen_document_rows(indices, seed: int, bank: List[str]) -> Dict[str, list]:
    """(doc_id, text, lang) rows with injected duplication: ~3% exact
    duplicates and ~2% near-duplicates (source body + a small tail) of
    earlier documents — what a dedup smoke needs to find."""
    ids, texts, langs = [], [], []
    for i in indices:
        i = int(i)
        rng = random.Random((seed << 34) ^ i)
        r = rng.random()
        if i >= 100 and r < 0.03:
            src = rng.randrange(max(0, i - 5000), i)
            body = _doc_body(src, seed, bank)          # exact dup
        elif i >= 100 and r < 0.05:
            src = rng.randrange(max(0, i - 5000), i)
            body = _doc_body(src, seed, bank) + " trailing edit note"
        else:
            body = _doc_body(i, seed, bank)
        lr = rng.random()
        ids.append(i)
        texts.append(body)
        langs.append("en" if lr < 0.9 else ("de" if lr < 0.95 else "fr"))
    return {"doc_id": ids, "text": texts, "lang": langs}


DOCUMENTS_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string())]
)


def write_documents_corpus(
    out_dir: str, n: int, seed: int = 42, bank: List[str] = (),
    rows_per_file: int = 25_000,
) -> List[str]:
    """Distributed documents-table generation (same shape as the driver's
    documents.parquet) for the large dedup/curation smoke tier."""
    import glob
    import os

    import ray
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    done_marker = os.path.join(out_dir, f".done-{n}-{seed}")
    if os.path.exists(done_marker):
        return sorted(glob.glob(os.path.join(out_dir, "*.parquet")))

    bank_ref = ray.put(list(bank))

    def gen_batch(batch: Dict[str, np.ndarray]) -> pa.Table:
        bank_local = ray.get(bank_ref)
        cols = gen_document_rows(batch["id"].tolist(), seed, bank_local)
        return pa.table(
            {k: pa.array(v, DOCUMENTS_SCHEMA.field(k).type) for k, v in cols.items()}
        )

    (
        rd.range(n, override_num_blocks=max(1, n // rows_per_file))
        .map_batches(gen_batch, batch_format="numpy", batch_size=rows_per_file)
        .write_parquet(out_dir)
    )
    with open(done_marker, "w") as f:
        f.write("ok")
    return sorted(glob.glob(os.path.join(out_dir, "*.parquet")))


# ---------------------------------------------------------------------------
# embeddings corpus (similarity smoke tier)
# ---------------------------------------------------------------------------

EMBEDDINGS_SCHEMA = pa.schema(
    [
        ("vec_id", pa.int64()),
        ("embedding", pa.list_(pa.float32())),
        ("label", pa.int32()),
    ]
)


def _hash_u64(x: np.ndarray) -> np.ndarray:
    """splitmix64 — vectorized counter hash; uniform over uint64."""
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _counter_normals(ids: np.ndarray, dim: int, seed: int) -> np.ndarray:
    """(len(ids), dim) standard normals, a pure function of (seed, vec_id,
    coordinate) — Box-Muller over two splitmix64 streams, so generation is
    vectorized AND independent of batching/layout."""
    base = ids.astype(np.uint64)[:, None] * np.uint64(dim) + np.arange(dim, dtype=np.uint64)[None, :]
    u1 = (_hash_u64(base * np.uint64(2) + np.uint64(seed)) >> np.uint64(11)).astype(np.float64) * (2.0 ** -53)
    u2 = (_hash_u64(base * np.uint64(2) + np.uint64(1) + np.uint64(seed)) >> np.uint64(11)).astype(np.float64) * (2.0 ** -53)
    u1 = np.maximum(u1, 1e-300)
    return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)


def embedding_rows(ids: np.ndarray, dim: int, n_clusters: int, seed: int,
                   sigma: float = 0.1) -> pa.Table:
    """Clustered unit vectors: label = hash(vec_id) % n_clusters, vector =
    normalize(centroid(label) + sigma·noise).  Clustered (not uniform) so
    the IVF coarse quantizer has real structure to find, as a web-scale
    embedding table would.  ``sigma`` is per-coordinate noise; keep
    ``sigma*sqrt(dim) < 1`` or the noise norm swamps the unit centroids and
    the corpus degenerates to near-uniform (measured: sigma=0.35 at dim=64
    gives within-cluster cos ≈ 0.11 — no structure, ANN recall capped)."""
    ids = np.asarray(ids, dtype=np.int64)
    cents = np.random.RandomState(seed).standard_normal((n_clusters, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    labels = (_hash_u64(ids.astype(np.uint64) ^ np.uint64(seed * 2 + 1))
              % np.uint64(n_clusters)).astype(np.int64)
    vecs = cents[labels] + sigma * _counter_normals(ids, dim, seed)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    flat = vecs.astype(np.float32).ravel()
    arr = pa.ListArray.from_arrays(
        pa.array(np.arange(0, (len(ids) + 1) * dim, dim, dtype=np.int32)),
        pa.array(flat, pa.float32()),
    )
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": arr,
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )


def write_embeddings_corpus(
    out_dir: str, n: int, dim: int = 64, n_clusters: int = 64, seed: int = 42,
    rows_per_file: int = 50_000, sigma: float = 0.1,
) -> List[str]:
    """Distributed embeddings-table generation (same shape as the driver's
    embeddings.parquet) for the similarity smoke tier."""
    import glob
    import os

    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    done_marker = os.path.join(out_dir, f".done-{n}-{dim}-{seed}-s{sigma}")
    if os.path.exists(done_marker):
        return sorted(glob.glob(os.path.join(out_dir, "*.parquet")))

    def gen_batch(batch: Dict[str, np.ndarray]) -> pa.Table:
        return embedding_rows(batch["id"], dim, n_clusters, seed, sigma=sigma)

    (
        rd.range(n, override_num_blocks=max(1, n // rows_per_file))
        .map_batches(gen_batch, batch_format="numpy", batch_size=rows_per_file)
        .write_parquet(out_dir)
    )
    with open(done_marker, "w") as f:
        f.write("ok")
    return sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
