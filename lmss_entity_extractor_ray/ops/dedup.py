"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Shuffle discipline (the part that matters at 100 TB):
- exact dedup      — ONE hash shuffle on the dedup key, pre-aggregated
                     in-batch first (map-side combine) so only
                     (key, min_id, count) partials move;
- MinHash LSH      — per-doc signatures are embarrassingly parallel; the
                     banding shuffle's keys are near-uniform by construction
                     (hash buckets), so no salt is needed; candidate
                     verification is a distributed inverted-index shingle
                     self-join (_pair_counts) — only OUTPUT-scale artifacts
                     (candidate pairs, candidate doc-id set) are ever
                     broadcast, never anything corpus-sized;
- n-gram Jaccard   — the same shingle join run exactly over all docs
                     (ngram_jaccard_pairs), SQL-expressible → the driver
                     oracle for the near-dup family;
- SimHash          — signatures map-only; near-dup blocking groups by
                     16-bit bands (4 bands → Hamming ≤ 3 guaranteed caught);
- embedding cosine — exact block-pair tiling (each task reads TWO blocks
                     from the object store, no whole-matrix broadcast); the
                     approximate scale path is LSH bucketing (similarity.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Min

from .arrow_np import col_np
from .partitioning import shuffle_partitions as _sized_partitions

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def prefix_key(text: str, k: int = 5) -> str:
    """Normalized first-k-token key (the exact-dedup key used by the
    correctness queries; swap for full-text hash at scale)."""
    return " ".join((text or "").split()[:k])


def _prefix_key_arrow(col: pa.ChunkedArray, key_tokens: int) -> pa.ChunkedArray:
    """Vectorized ``prefix_key`` — trim, unicode-whitespace split, first-k
    join, all Arrow C++ kernels (parity with ``str.split()`` pinned by
    pytest, including NBSP and leading/trailing whitespace)."""
    trimmed = pc.utf8_trim_whitespace(pc.fill_null(col, ""))
    toks = pc.utf8_split_whitespace(trimmed)
    return pc.binary_join(
        pc.list_slice(toks, 0, key_tokens).cast(pa.list_(pa.string())), " "
    )


def exact_dedup_groups(ds: rd.Dataset, key_tokens: int = 5) -> rd.Dataset:
    """Group documents by a normalized text key; keep the smallest doc_id per
    group plus the group size.  Two-phase: in-batch partial (key → local min
    id / count) shrinks the shuffle to one row per (key, block)."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "dedup_key": _prefix_key_arrow(batch.column("text"), key_tokens),
                "doc_id": batch.column("doc_id"),
            }
        )
        g = t.group_by(["dedup_key"]).aggregate(
            [("doc_id", "min"), ("doc_id", "count")]
        )
        return g.rename_columns(["dedup_key", "min_id", "cnt"])

    from ray.data.aggregate import Sum

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return (
        partials.groupby("dedup_key")
        .aggregate(Min("min_id", alias_name="keep_id"), Sum("cnt", alias_name="n_dups"))
    )


def exact_dedup_fulltext(ds: rd.Dataset) -> rd.Dataset:
    """Exact full-text dedup groups: (text, keep_id=min doc_id, n_dups).
    Same two-phase shape as exact_dedup_groups with the raw text as key —
    at 100 TB swap the key for its 128-bit hash so the shuffle rows stay
    narrow (the grouping is identical for any injective key function)."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["text"]).aggregate([("doc_id", "min"), ("doc_id", "count")])
        return g.rename_columns(["text", "p_min", "p_cnt"])

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("text")
        .aggregate(Min("p_min", alias_name="keep_id"), Sum("p_cnt", alias_name="n_dups"))
    )


def exact_dedup_keep(ds: rd.Dataset, key_tokens: int = 5) -> rd.Dataset:
    """The surviving rows themselves (first doc_id per key): hash-partition
    by key, vectorized first-per-key inside each partition (grouping by the
    key itself would invoke the UDF once per distinct key — corpus-
    cardinality Python calls)."""
    from .partitioning import shuffle_partitions, string_partition

    P = max(2, shuffle_partitions(ds))

    def keyed(batch: pa.Table) -> pa.Table:
        key = _prefix_key_arrow(batch.column("text"), key_tokens)
        t = batch.append_column("dedup_key", key)
        return t.append_column("part", pa.array(string_partition(key, P)))

    def first_by_id(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["part"])
        s = group.take(
            pc.sort_indices(
                group,
                sort_keys=[("dedup_key", "ascending"), ("doc_id", "ascending")],
            )
        )
        c = s.column("dedup_key").combine_chunks()
        if len(c) == 0:
            return s
        neq = pc.not_equal(c.slice(1), c.slice(0, len(c) - 1))
        if isinstance(neq, pa.ChunkedArray):
            neq = neq.combine_chunks()
        return s.filter(pa.concat_arrays([pa.array([True]), neq]))

    return (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("part")
        .map_groups(first_by_id, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# shingles + MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1
_MASK29 = np.uint64((1 << 29) - 1)
_MASK32 = np.uint64((1 << 32) - 1)
_MASK61 = np.uint64((1 << 61) - 1)
_P61 = np.uint64(_MERSENNE)


def _fold61(x: np.ndarray) -> np.ndarray:
    """Reduce uint64 values mod 2^61-1 via Mersenne folding (2^61 ≡ 1)."""
    x = (x >> np.uint64(61)) + (x & _MASK61)
    x = (x >> np.uint64(61)) + (x & _MASK61)
    return np.where(x >= _P61, x - _P61, x)


def _mulmod_p61(h: np.ndarray, a: np.ndarray) -> np.ndarray:
    """(h * a) mod (2^61 - 1) without 128-bit overflow, vectorized.

    Split both operands into 32-bit halves; reduce the cross terms with the
    Mersenne identities 2^64 ≡ 8 and x·2^32 ≡ (x >> 29) + ((x & (2^29-1)) << 32)
    (mod 2^61-1).  Inputs must be < 2^61; output is < 2^61-1.  This is the
    REAL universal-hash arithmetic — a plain uint64 multiply wraps mod 2^64
    before the mod p, which silently changes the hash family and its banding
    collision probabilities."""
    h = np.asarray(h, dtype=np.uint64)
    a = np.asarray(a, dtype=np.uint64)
    h_hi, h_lo = h >> np.uint64(32), h & _MASK32
    a_hi, a_lo = a >> np.uint64(32), a & _MASK32
    # a*h = a_hi*h_hi*2^64 + (a_hi*h_lo + a_lo*h_hi)*2^32 + a_lo*h_lo
    term1 = _fold61(a_hi * h_hi) * np.uint64(8)            # < 2^64? t1<p → *8 < 2^64; fold below
    mid = _fold61(a_hi * h_lo + a_lo * h_hi)               # < p
    term2 = (mid >> np.uint64(29)) + ((mid & _MASK29) << np.uint64(32))
    term3 = _fold61(a_lo * h_lo)
    return _fold61(_fold61(term1) + _fold61(term2) + term3)


def word_shingles(text: str, k: int = 3) -> Set[int]:
    """Hashes of word k-shingles (64-bit stable hash, no PYTHONHASHSEED)."""
    toks = (text or "").lower().split()
    if len(toks) < k:
        return {_stable_hash(" ".join(toks))} if toks else set()
    return {_stable_hash(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)}


def _stable_hash(s: str) -> int:
    import zlib

    b = s.encode("utf-8")
    return (zlib.crc32(b) << 32) | zlib.adler32(b)


def _fingerprint64(data: bytes) -> int:
    """crc32<<32|adler32 of ``data`` in the SIGNED int64 domain (Arrow- and
    numpy-view-compatible)."""
    import zlib

    v = (zlib.crc32(data) << 32) | zlib.adler32(data)
    return v - (1 << 64) if v >= (1 << 63) else v


def _allhot_fp_i64(raw_sorted_i64: np.ndarray) -> int:
    """Canonical fingerprint of a doc whose shingles are ALL globally hot:
    identical docs share it (so they still pair at J=1.0 under the
    IDF-filtered Jaccard), different docs don't (2^-64 collisions, which
    could only ADD a candidate intersection of 1)."""
    return _fingerprint64(raw_sorted_i64.tobytes())


def _allhot_fp_str(raw_sorted_strs: List[str]) -> str:
    """String-space twin of ``_allhot_fp_i64`` for the SQL-oracle join.  The
    NUL prefix cannot be produced by a real shingle unless a document
    literally contains NUL-prefixed tokens — pathological, and a collision
    only adds one spurious shared shingle."""
    return "\x00allhot:%d" % _fingerprint64("\n".join(raw_sorted_strs).encode("utf-8"))


def _minhash_params(num_perm: int, seed: int = 7) -> Tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: Set[int], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm-wide MinHash signature via the universal hash
    (a·h + b) mod (2^61-1), computed with true Mersenne folding (one
    [n_shingles, num_perm] broadcast per doc)."""
    if not shingles:
        return np.full(a.shape[0], _MERSENNE, dtype=np.uint64)
    h = np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
    prod = _fold61(_mulmod_p61(h[:, None], a[None, :]) + b[None, :])
    return prod.min(axis=0)


class MinHasher:
    """Actor-pool stage: doc → LSH band rows (band_id, band_hash, doc_id).
    Permutation params are built once per actor in __init__; signatures and
    band hashes are computed for the WHOLE batch in a handful of numpy ops
    (one [total_shingles, num_perm] broadcast + minimum.reduceat), not per
    doc.

    ``hot_ref``: optional broadcast ref to a SORTED int64 numpy array of
    globally-hot shingle hashes (doc-frequency > cap).  When set, signatures
    are computed over the IDF-FILTERED shingle space — banding then reflects
    DISCRIMINATIVE similarity instead of boilerplate overlap, which on a
    template-heavy 200k-doc smoke collapsed the candidate population ~1000×
    (23.7M pairs to keep 18.8k, round-3 measurement).  A doc whose shingles
    are ALL hot signs over its canonical fingerprint (``_allhot_fp_i64``) so
    identical boilerplate-only docs still band together; truly empty docs
    keep the constant empty sentinel."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3,
                 hot_ref=None):
        assert num_perm % bands == 0
        self.a, self.b = _minhash_params(num_perm)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k
        self.hot: Optional[np.ndarray] = None
        if hot_ref is not None:
            hot = ray.get(hot_ref) if isinstance(hot_ref, ray.ObjectRef) else hot_ref
            if hot is not None and len(hot):
                self.hot = np.asarray(hot, dtype=np.int64)  # pre-sorted

    def _doc_shingle_arr(self, text: str) -> np.ndarray:
        """One doc's signing set as uint64: raw hashed shingles, hot-filtered
        when a hot set is loaded, with the empty/all-hot sentinel rules."""
        sh = word_shingles(text, self.shingle_k)
        if not sh:
            return np.array([0], dtype=np.uint64)  # empty doc sentinel
        arr = np.fromiter(sh, dtype=np.uint64, count=len(sh))
        if self.hot is None:
            return arr
        ai = arr.view(np.int64)
        pos = np.minimum(np.searchsorted(self.hot, ai), len(self.hot) - 1)
        kept = arr[self.hot[pos] != ai]
        if kept.size:
            return kept
        fp = np.array([_allhot_fp_i64(np.sort(ai))], dtype=np.int64)
        return fp.view(np.uint64)

    def _signatures(self, texts) -> np.ndarray:
        """[n_docs, num_perm] uint64 signature matrix, vectorized."""
        per_doc = [self._doc_shingle_arr(text) for text in texts]
        lens = np.array([len(x) for x in per_doc])
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        h = np.concatenate(per_doc)
        # the Mersenne arithmetic is ~2/3 of signature cost and shingles
        # repeat heavily across a batch's docs (boilerplate/templates), so
        # run it once per DISTINCT shingle and expand by gather — identical
        # values, U ≤ T work
        uniq, inv = np.unique(h, return_inverse=True)
        sig_u = _fold61(_mulmod_p61(uniq[:, None], self.a[None, :]) + self.b[None, :])
        return np.minimum.reduceat(sig_u[inv], starts, axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = col_np(batch, "doc_id")
        sigs = self._signatures(batch.column("text").to_pylist())
        n, r, bands = len(ids), self.rows_per_band, self.bands
        # polynomial band hash over each band's r contiguous rows in the
        # same exact mod-(2^61-1) arithmetic, vectorized over docs
        P = np.uint64(1_000_003)
        band_hash = np.zeros((n, bands), dtype=np.uint64)
        for band in range(bands):
            acc = np.zeros(n, dtype=np.uint64)
            for j in range(r):
                acc = _fold61(_mulmod_p61(acc, P) + sigs[:, band * r + j])
            band_hash[:, band] = acc
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, bands), pa.int64()),
                "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n), pa.int32()),
                "band_hash": pa.array(band_hash.reshape(-1).astype(np.int64), pa.int64()),
            }
        )


def _minhash_band_rows(
    batch: pa.Table, num_perm: int = 64, bands: int = 16, shingle_k: int = 3,
    hot_ref=None,
) -> pa.Table:
    """Task-friendly wrapper: params are deterministic from the seed, so
    rebuilding MinHasher per task costs microseconds (the hot array comes
    zero-copy from the object store)."""
    return MinHasher(num_perm=num_perm, bands=bands, shingle_k=shingle_k,
                     hot_ref=hot_ref)(batch)


def minhash_candidate_pairs(ds: rd.Dataset, num_perm: int = 64, bands: int = 16,
                            shingle_k: int = 3,
                            num_partitions: Optional[int] = None,
                            hot_ref=None) -> rd.Dataset:
    """Distinct candidate pairs (a < b) sharing at least one LSH bucket,
    with the number of shared buckets (``n_buckets``).

    ONE manual hash exchange on the bucket key: band rows carry a mixed
    64-bit bucket key (band ⊕ band_hash · φ64), are partitioned by
    ``bkey % P``, and each partition task sorts its rows once and emits
    per-bucket-run pairs vectorized (triu index templates) — singleton
    buckets, the overwhelming majority, cost a sorted-run skip instead of a
    per-group Python call (~0.6 ms each) or a separate counting aggregate.
    A second, output-scale exchange on the pair key dedups across bands and
    sums bucket counts.  Buckets are capped at 256 members
    (identical-boilerplate pathologies would emit O(m²) pairs).  A 64-bit
    key collision can only ADD a candidate pair (removed by the exact
    Jaccard verification downstream), never drop one."""
    import functools

    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    P = num_partitions or _shuffle_partitions(ds)
    # Stateless TASKS, not an actor pool: MinHasher state is ~1 KB of
    # permutation params (rebuilt per task for free), and task pools have no
    # ramp-up lag.  Single-file inputs arrive as ONE block — split first so
    # there is parallel work.
    fn = functools.partial(
        _minhash_band_rows, num_perm=num_perm, bands=bands, shingle_k=shingle_k,
        hot_ref=hot_ref,
    )
    band_rows = ds.repartition(cpus * 2).map_batches(fn, batch_format="pyarrow")

    _GOLD = np.uint64(0x9E3779B97F4A7C15)

    def add_part(batch: pa.Table) -> pa.Table:
        band = col_np(batch, "band", np.uint64)
        h = col_np(batch, "band_hash", np.uint64)
        with np.errstate(over="ignore"):
            bkey = (h * _GOLD) ^ band
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "bkey": pa.array(bkey.astype(np.int64), pa.int64()),
                "part": pa.array((bkey % np.uint64(P)).astype(np.int32), pa.int32()),
            }
        )

    _EMPTY_AB = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
         "p_cnt": pa.array([], pa.int64())}
    )

    def emit_bucket_pairs(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2:
            return _EMPTY_AB
        t = group.sort_by([("bkey", "ascending"), ("doc_id", "ascending")])
        col = t.column("bkey").combine_chunks()
        same = np.asarray(pc.equal(col.slice(1, n - 1), col.slice(0, n - 1)))
        bounds = np.concatenate(([0], np.nonzero(~same)[0] + 1, [n]))
        ids = col_np(t, "doc_id")
        tri_cache: dict = {}
        chunks_i, chunks_j = [], []
        for k in range(len(bounds) - 1):
            lo, hi = int(bounds[k]), int(bounds[k + 1])
            m = hi - lo
            if m < 2 or m > 256:
                continue
            tri = tri_cache.get(m)
            if tri is None:
                tri = np.triu_indices(m, 1)
                tri_cache[m] = tri
            chunks_i.append(tri[0] + lo)
            chunks_j.append(tri[1] + lo)
        if not chunks_i:
            return _EMPTY_AB
        ii = np.concatenate(chunks_i)
        jj = np.concatenate(chunks_j)
        # per-partition count partial shrinks the second exchange
        t2 = pa.table(
            {"a": pa.array(ids[ii], pa.int64()), "b": pa.array(ids[jj], pa.int64())}
        )
        g = t2.group_by(["a", "b"]).aggregate([([], "count_all")])
        return g.rename_columns(["a", "b", "p_cnt"])

    def add_pair_part(batch: pa.Table) -> pa.Table:
        a = col_np(batch, "a", np.uint64)
        b = col_np(batch, "b", np.uint64)
        with np.errstate(over="ignore"):
            part = ((a * _GOLD ^ b) % np.uint64(P)).astype(np.int32)
        return batch.append_column("part2", pa.array(part, pa.int32()))

    def merge_pairs(group: pa.Table) -> pa.Table:
        g = group.group_by(["a", "b"]).aggregate([("p_cnt", "sum")])
        return g.rename_columns(["a", "b", "n_buckets"])

    return (
        band_rows.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(emit_bucket_pairs, batch_format="pyarrow")
        .map_batches(add_pair_part, batch_format="pyarrow")
        .groupby("part2")
        .map_groups(merge_pairs, batch_format="pyarrow")
    )


def jaccard(s1: Set[int], s2: Set[int]) -> float:
    if not s1 and not s2:
        return 1.0
    u = len(s1 | s2)
    return len(s1 & s2) / u if u else 0.0


# ---------------------------------------------------------------------------
# distributed shingle-join Jaccard (the verification backbone)
# ---------------------------------------------------------------------------

_WS_ASCII_RE = None


def exact_tokens(text: str) -> List[str]:
    """RE2-compatible whitespace tokenization ([ \\t\\n\\f\\r]+, lowercased)
    — matches DuckDB's regexp_split_to_array(lower(text), '\\s+') with empty
    tokens filtered, so the SQL oracle tokenizes identically.  NOTE: RE2's
    \\s excludes vertical tab (\\x0b) while Python's ASCII \\s includes it,
    so the class is spelled out (a \\v-bearing doc would otherwise tokenize
    differently on the two sides)."""
    global _WS_ASCII_RE
    if _WS_ASCII_RE is None:
        import re

        _WS_ASCII_RE = re.compile(r"[ \t\n\f\r]+")
    return [t for t in _WS_ASCII_RE.split((text or "").lower()) if t]


def _empty_pairs_table() -> pa.Table:
    return pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
         "jaccard_e5": pa.array([], pa.int64())}
    )


def _shuffle_partitions(ds=None, scale: float = 1.0) -> int:
    """Exchange partition count: cluster-CPU floor, raised by a data-size
    estimate when the source dataset is known (ops/partitioning.py) —
    ``scale`` covers derived tables that out-grow their input (the shingle
    explosion is ~ tokens-per-doc x bytes-per-shingle)."""
    return _sized_partitions(ds, scale=scale)


def _pair_counts(
    sh: rd.Dataset,
    num_partitions: int,
    max_shingle_freq: Optional[int] = None,
    min_ratio: Optional[float] = None,
) -> rd.Dataset:
    """(a, b, inter, n_a, n_b) for every doc pair sharing ≥1 shingle.

    Distributed inverted-index self-join, hand-rolled as ONE hash shuffle:
    rows are partitioned by hash(shingle) so equal shingles co-locate, each
    partition co-groups its rows by shingle (Arrow sort + vectorized run
    detection) and emits per-shingle co-occurrence pairs (a < b), then one
    global groupby on the pair key sums the intersections.  This costs a
    single exchange + P partition tasks — measured ~5x cheaper than Ray's
    general hash-join operator, whose per-partition aggregator actors
    dominate at small scale.  Partitioning assumption: one partition's
    shingle rows fit a worker (scale P with the corpus).

    ``max_shingle_freq``: a shingle shared by m docs emits m(m-1)/2 join
    rows, so one boilerplate phrase shared by 10^4 documents costs 5·10^7
    pairs — on template-heavy corpora this is THE blow-up.  Setting a cap
    skips runs with m > cap: intersections lose only those
    non-discriminative shingles (the result is exact Jaccard over the
    sub-cap shingle space; n_a/n_b still count all shingles, so J is
    under-, never over-estimated).  None (default) = exact.

    ``min_ratio``: length-ratio prune (the classic all-pairs size filter:
    J(a,b) <= min(|a|,|b|) / max(|a|,|b|), so a pair whose size ratio is
    below the Jaccard threshold can NEVER qualify).  Pairs failing the
    ratio are dropped AT EMISSION — before the local (a,b) combine and the
    pair exchange — which is where the candidate stream is widest (13.8M of
    14.1M emitted pairs on the 200k smoke are below a 0.7 threshold).  A
    1e-4 slack keeps callers that compare ROUNDED Jaccard (round(j, 5))
    exact.  Zero-shingle sentinel pairs (n_a = n_b = 0, defined J = 1)
    survive the filter (0 >= ratio·0)."""
    from .partitioning import string_partition

    P = num_partitions

    def add_part(batch: pa.Table) -> pa.Table:
        col = batch.column("shingle")
        if pa.types.is_integer(col.type):
            v = col_np(batch, "shingle", np.uint64)
            part = (v % np.uint64(P)).astype(np.int32)
        else:
            part = string_partition(col, P)
        return batch.append_column("part", pa.array(part, pa.int32()))

    def emit_partition_pairs(group: pa.Table) -> pa.Table:
        n = group.num_rows
        empty = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "p_inter": pa.array([], pa.int64()),
             "n_a": pa.array([], pa.int64()), "n_b": pa.array([], pa.int64())}
        )
        if n < 2:
            return empty
        t = group.sort_by([("shingle", "ascending"), ("doc_id", "ascending")])
        col = t.column("shingle").combine_chunks()
        same = np.asarray(pc.equal(col.slice(1, n - 1), col.slice(0, n - 1)))
        bounds = np.concatenate(([0], np.nonzero(~same)[0] + 1, [n]))
        ids = col_np(t, "doc_id")
        ns = col_np(t, "n_sh")
        # vectorized pair emission: per shingle run of length m, the m(m-1)/2
        # index pairs come from a cached triu template (runs are sorted by
        # doc_id, so i<j in position ⇒ a<b in doc id)
        tri_cache: dict = {}
        chunks_i, chunks_j = [], []
        for k in range(len(bounds) - 1):
            lo, hi = int(bounds[k]), int(bounds[k + 1])
            m = hi - lo
            if m < 2 or (max_shingle_freq is not None and m > max_shingle_freq):
                continue
            tri = tri_cache.get(m)
            if tri is None:
                tri = np.triu_indices(m, 1)
                tri_cache[m] = tri
            chunks_i.append(tri[0] + lo)
            chunks_j.append(tri[1] + lo)
        if not chunks_i:
            return empty
        ii = np.concatenate(chunks_i)
        jj = np.concatenate(chunks_j)
        if min_ratio is not None:
            na, nb = ns[ii].astype(np.float64), ns[jj].astype(np.float64)
            ok = np.minimum(na, nb) >= (min_ratio - 1e-4) * np.maximum(na, nb)
            ii, jj = ii[ok], jj[ok]
            if not ii.size:
                return empty
        t2 = pa.table(
            {"a": pa.array(ids[ii], pa.int64()), "b": pa.array(ids[jj], pa.int64()),
             "n_a": pa.array(ns[ii], pa.int64()), "n_b": pa.array(ns[jj], pa.int64())}
        )
        g = t2.group_by(["a", "b"]).aggregate(
            [([], "count_all"), ("n_a", "min"), ("n_b", "min")]
        )
        return g.rename_columns(["a", "b", "p_inter", "n_a", "n_b"])

    # second manual hash exchange on the pair key: Ray's generic multi-key
    # aggregate costs ~10x more than partition-wise Arrow group_by on
    # millions of pair partials
    def add_pair_part(batch: pa.Table) -> pa.Table:
        a = col_np(batch, "a", np.uint64)
        b = col_np(batch, "b", np.uint64)
        with np.errstate(over="ignore"):
            part = ((a * np.uint64(0x9E3779B97F4A7C15) ^ b) % np.uint64(P)).astype(np.int32)
        return batch.append_column("part2", pa.array(part, pa.int32()))

    def merge_pairs(group: pa.Table) -> pa.Table:
        g = group.group_by(["a", "b"]).aggregate(
            [("p_inter", "sum"), ("n_a", "min"), ("n_b", "min")]
        )
        return g.rename_columns(["a", "b", "inter", "n_a", "n_b"])

    return (
        sh.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(emit_partition_pairs, batch_format="pyarrow")
        .map_batches(add_pair_part, batch_format="pyarrow")
        .groupby("part2")
        .map_groups(merge_pairs, batch_format="pyarrow")
    )


def hot_shingle_set(sh_ds: rd.Dataset, num_partitions: int, cap: int):
    """Shingles whose GLOBAL doc-frequency exceeds ``cap``: the same hash
    exchange as _pair_counts (all copies of a shingle land in one
    partition, so a partition-local run length IS the global frequency);
    each partition emits only its over-cap run keys.  Output size is
    bounded by total_occurrences / cap — the boilerplate vocabulary, small
    enough to broadcast."""
    from .partitioning import string_partition

    P = num_partitions

    def add_part(batch: pa.Table) -> pa.Table:
        col = batch.column("shingle")
        if pa.types.is_integer(col.type):
            v = col_np(batch, "shingle", np.uint64)
            part = (v % np.uint64(P)).astype(np.int32)
        else:
            part = string_partition(col, P)
        return batch.append_column("part", pa.array(part, pa.int32()))

    def hot(group: pa.Table) -> pa.Table:
        n = group.num_rows
        stype = group.column("shingle").type
        if n == 0:
            return pa.table({"s": pa.array([], stype)})
        t = group.sort_by([("shingle", "ascending")])
        col = t.column("shingle").combine_chunks()
        same = np.asarray(pc.equal(col.slice(1, n - 1), col.slice(0, n - 1)))
        bounds = np.concatenate(([0], np.nonzero(~same)[0] + 1, [n]))
        lens = np.diff(bounds)
        keep = bounds[:-1][lens > cap]
        return pa.table({"s": col.take(pa.array(keep, pa.int64()))})

    parts = [
        b.column("s")
        for b in (
            sh_ds.map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(hot, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        )
        if b.num_rows
    ]
    if not parts:
        return None
    return pa.concat_arrays([c.combine_chunks() for c in parts])


def _filter_hot(uniq_per_doc, hot_arr, shingle_type: pa.DataType) -> list:
    """Per-doc shingle lists with globally-hot shingles removed — ONE
    vectorized Arrow is_in over the batch's concatenated shingles."""
    lens = [len(u) for u in uniq_per_doc]
    if not sum(lens):
        return uniq_per_doc
    flat = pa.array([s for u in uniq_per_doc for s in u], shingle_type)
    hit = np.asarray(pc.is_in(flat, value_set=hot_arr))
    out, off = [], 0
    for u, ln in zip(uniq_per_doc, lens):
        out.append([s for s, h in zip(u, hit[off : off + ln]) if not h])
        off += ln
    return out


def auto_shingle_cap(
    docs_ds: rd.Dataset,
    shingle_k: int = 3,
    floor: int = 128,
    pairs_per_doc: float = 20.0,
    min_budget: int = 5_000_000,
    sample_docs: int = 4096,
    seed: int = 9,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Optional[int]:
    """Zero-config ``max_shingle_freq`` for the verification join, chosen to
    fit a PAIR-EMISSION BUDGET: the inverted-index self-join emits
    m(m-1)/2 rows per shingle of doc-frequency m, so the cap is the largest
    frequency such that the estimated total emission from all sub-cap
    shingles stays within ``max(pairs_per_doc × corpus_docs, min_budget)``.
    (A spectrum-quantile rule was tried first and failed on template-heavy
    corpora — bimodal spectra put the quantile ON the boilerplate mode.)

    Estimation: a deterministic hash sample of ~``sample_docs`` docs
    (bounded driver cost, layout-independent).  A shingle with corpus
    frequency m appears c ~ Binomial(m, f) times in an f-fraction sample:
    E[c(c-1)] = m(m-1)·f², so ``Σ c(c-1) / (2f²)`` over sampled shingles is
    an UNBIASED estimate of total pair emission (sampled singletons
    contribute zero — exactly right, rare shingles are cheap), and ``c/f``
    estimates each shingle's frequency for the cap threshold.

    Returns None (fully exact join) when even the hottest shingle fits the
    budget.  Capping only removes non-discriminative intersections: the
    resulting Jaccard is exact over the sub-cap shingle space and never
    over-estimated (_pair_counts)."""
    from collections import Counter

    total = docs_ds.count()
    if total == 0:
        return None
    frac = min(1.0, sample_docs / total)
    from .sampling import hash_sample

    sampled = hash_sample(
        docs_ds.select_columns([id_col, text_col]), id_col, frac, salt=seed
    )
    freq: Counter = Counter()
    for b in sampled.iter_batches(batch_format="pyarrow"):
        for t in b.column(text_col).to_pylist():
            toks = exact_tokens(t)
            if len(toks) < shingle_k:
                continue
            freq.update(
                {
                    " ".join(toks[i : i + shingle_k])
                    for i in range(len(toks) - shingle_k + 1)
                }
            )
    if not freq:
        return None
    c = np.sort(np.fromiter(freq.values(), dtype=np.float64))  # ascending
    est = c / frac                       # estimated corpus frequencies
    pair_cost = c * (c - 1.0) / (2.0 * frac * frac)
    budget = max(pairs_per_doc * total, float(min_budget))
    cum = np.cumsum(pair_cost)
    if cum[-1] <= budget:
        return None  # everything fits — exact join
    # largest prefix of the ascending spectrum that fits the budget
    idx = int(np.searchsorted(cum, budget, side="right")) - 1
    cap = int(np.ceil(est[idx])) if idx >= 0 else floor
    return max(floor, cap)


def _resolve_cap(max_shingle_freq, docs_ds: rd.Dataset, shingle_k: int):
    if max_shingle_freq == "auto":
        return auto_shingle_cap(docs_ds, shingle_k=shingle_k)
    return max_shingle_freq


def ngram_jaccard_pairs(
    docs_ds: rd.Dataset, threshold: float = 0.5, shingle_k: int = 3,
    num_partitions: Optional[int] = None,
    max_shingle_freq=None,
) -> rd.Dataset:
    """EXACT n-gram Jaccard near-dup pairs: every unordered doc pair with
    |shingles(a) ∩ shingles(b)| / |shingles(a) ∪ shingles(b)| >= threshold.

    Exact by construction (no LSH): a pair with J > 0 shares ≥ 1 shingle, so
    the inverted-index self-join enumerates every qualifying pair; docs with
    fewer than ``shingle_k`` tokens have no shingles and never pair.  The
    jaccard ships as an e5-scaled int64 (floor(J*1e5 + 0.5)) and shingles are
    the literal k-token strings, so the whole operator is expressible in SQL
    (unnest + self-join + group by) — this is the driver-checkable oracle for
    the near-dup family, and the same join is what verifies MinHash candidate
    pairs at scale.  Skew note: a shingle shared by m docs emits m² join
    rows; ``max_shingle_freq`` (an int, or "auto" for the pair-budget cap —
    auto_shingle_cap) switches to the IDF-FILTERED Jaccard: shingles with
    global doc-frequency > cap are dropped from BOTH the intersections and
    the per-doc counts (hot_shingle_set pass → filtered emission), so
    identical documents keep J = 1.0 no matter how much boilerplate they
    contain — including docs whose shingles are ALL hot, which emit a
    canonical fingerprint shingle (_allhot_fp_str) instead of vanishing
    from the stream.  Groups of identical all-hot docs larger than the cap
    are intentionally NOT pair-enumerated (quadratic listing of exact
    duplicates belongs to exact_dedup_fulltext).  (Capping only the
    intersections — the first design — silently collapsed J for
    boilerplate-heavy true duplicates.)"""
    P = num_partitions or _shuffle_partitions(docs_ds, scale=8.0)
    max_shingle_freq = _resolve_cap(max_shingle_freq, docs_ds, shingle_k)

    def doc_shingles(batch: pa.Table):
        ids, uniqs = [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            toks = exact_tokens(text)
            if len(toks) < shingle_k:
                continue
            ids.append(doc_id)
            uniqs.append(
                sorted(
                    {" ".join(toks[i : i + shingle_k])
                     for i in range(len(toks) - shingle_k + 1)}
                )
            )
        return ids, uniqs

    def rows_table(ids, uniqs) -> pa.Table:
        out_ids, shs, ns = [], [], []
        for doc_id, u in zip(ids, uniqs):
            if not u:
                continue
            out_ids.extend([doc_id] * len(u))
            shs.extend(u)
            ns.extend([len(u)] * len(u))
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "shingle": pa.array(shs, pa.string()),
                "n_sh": pa.array(ns, pa.int64()),
            }
        )

    def shingle_batch(batch: pa.Table) -> pa.Table:
        return rows_table(*doc_shingles(batch))

    if max_shingle_freq is None:
        sh = docs_ds.map_batches(shingle_batch, batch_format="pyarrow")
        counts = _pair_counts(sh, P, max_shingle_freq=None, min_ratio=threshold)
    else:
        hot = hot_shingle_set(
            docs_ds.map_batches(shingle_batch, batch_format="pyarrow")
            .select_columns(["doc_id", "shingle"]),
            P,
            max_shingle_freq,
        )
        if hot is None:
            sh = docs_ds.map_batches(shingle_batch, batch_format="pyarrow")
        else:
            hot_ref = ray.put(hot)

            def filtered_batch(batch: pa.Table) -> pa.Table:
                ids, uniqs = doc_shingles(batch)
                filt = _filter_hot(uniqs, ray.get(hot_ref), pa.string())
                # a doc whose shingles are ALL hot would otherwise vanish
                # from the stream (two identical all-boilerplate docs → no
                # pair); emit its canonical fingerprint instead, so
                # IDENTICAL all-hot docs keep J = 1.0 while different ones
                # never pair
                for i, (r, f) in enumerate(zip(uniqs, filt)):
                    if r and not f:
                        filt[i] = [_allhot_fp_str(r)]
                return rows_table(ids, filt)

            sh = docs_ds.map_batches(filtered_batch, batch_format="pyarrow")
        # hot shingles are gone from the stream — every REAL run is ≤ cap by
        # construction; the residual cap only bounds identical-fingerprint
        # runs (a >cap group of identical all-boilerplate docs is exact
        # duplication — exact_dedup_fulltext's job, not O(m²) pair listing)
        counts = _pair_counts(
            sh, P, max_shingle_freq=max_shingle_freq, min_ratio=threshold
        )

    def finish(batch: pa.Table) -> pa.Table:
        inter = col_np(batch, "inter", np.float64)
        union = (
            col_np(batch, "n_a", np.float64)
            + col_np(batch, "n_b", np.float64)
            - inter
        )
        j = inter / union
        keep = j >= threshold
        return pa.table(
            {
                "a": pc.filter(batch.column("a"), pa.array(keep)),
                "b": pc.filter(batch.column("b"), pa.array(keep)),
                "jaccard_e5": pa.array(
                    np.floor(j[keep] * 100_000.0 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    return counts.map_batches(finish, batch_format="pyarrow")


def _hashed_shingle_rows(batch: pa.Table, shingle_k: int = 3) -> pa.Table:
    """(doc_id, shingle int64) rows over the RAW hashed shingle space — the
    input to the global hot-set pass.  Shingles are per-doc DISTINCT
    (word_shingles returns a set), so a partition-local run length in
    hot_shingle_set IS the global doc-frequency.  Empty docs emit nothing
    (they can never make a shingle hot)."""
    ids_np = col_np(batch, "doc_id")
    texts = batch.column("text").to_pylist()
    out_ids, shs = [], []
    for did, text in zip(ids_np, texts):
        sh = word_shingles(text, shingle_k)
        if not sh:
            continue
        arr = np.fromiter(sh, dtype=np.uint64, count=len(sh)).view(np.int64)
        out_ids.append(np.full(arr.size, did, dtype=np.int64))
        shs.append(arr)
    if not shs:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "shingle": pa.array([], pa.int64())})
    return pa.table(
        {"doc_id": pa.array(np.concatenate(out_ids), pa.int64()),
         "shingle": pa.array(np.concatenate(shs), pa.int64())}
    )


def near_dup_pairs_minhash(
    docs_ds: rd.Dataset,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    num_partitions: Optional[int] = None,
    max_shingle_freq=None,
    broadcast_pairs_limit: int = 5_000_000,
    write_candidates_to: Optional[str] = None,
) -> rd.Dataset:
    """MinHash-LSH near-duplicate pairs verified by exact shingle Jaccard —
    fully distributed, end to end:

      0. (capped mode only) the global HOT-SHINGLE SET is computed FIRST —
         one hash exchange over the raw hashed shingle stream, output
         bounded by occurrences/cap — and broadcast into BOTH the signing
         stage and the verification join, so candidate generation and
         verification share one IDF-filtered shingle space.  Banding over
         raw shingles let boilerplate similarity band template-mates
         (round-3 smoke: 23.7M candidates to keep 18.8k); signing over the
         filtered space makes LSH reflect discriminative similarity;
      1. candidate pairs via the banding shuffle (minhash_candidate_pairs),
         kept in the object store (candidate populations are NOT always
         driver-sized);
      2. candidate DOC IDS: when bounded (≤ broadcast_pairs_limit ids,
         implied by the pair count) they broadcast once as one sorted int64
         array and the shingle pass keeps candidate docs via vectorized
         searchsorted; LARGER candidate sets never touch the driver — the
         docs are pruned by a distributed left-semi hash_join on doc_id
         (no driver-side array scales with the corpus);
      3. exact intersection counts via the distributed inverted-index
         self-join (_pair_counts) over the same filtered space;
      4. counts ∩ candidates — verification is defined over LSH
         candidates.  Small candidate sets (≤ ``broadcast_pairs_limit``)
         broadcast as ONE sorted structured array and filter inside the
         finish map; larger sets go through the multi-key hash_join
         (left semi on (a, b)).

    Sentinel conventions (capped mode): a doc whose shingles are ALL hot
    carries its canonical fingerprint (_allhot_fp_i64) — identical
    boilerplate-only docs still pair at J=1.0, different ones don't; truly
    EMPTY docs keep the constant sentinel and pair mutually at J(∅,∅)=1.0.
    Fingerprint/sentinel runs longer than the cap are NOT pair-enumerated
    (they are exact duplicates — quadratic pair listing is
    exact_dedup_fulltext's job, not the near-dup join's)."""
    import functools

    from .join import hash_join

    P = num_partitions or _shuffle_partitions(docs_ds)
    cap = _resolve_cap(max_shingle_freq, docs_ds, shingle_k)

    hot_ref = None
    if cap is not None:
        rows = docs_ds.map_batches(
            functools.partial(_hashed_shingle_rows, shingle_k=shingle_k),
            batch_format="pyarrow",
        )
        hot = hot_shingle_set(rows, P, cap)
        if hot is not None:
            hot_ref = ray.put(
                np.sort(hot.to_numpy(zero_copy_only=False).astype(np.int64))
            )

    cands = minhash_candidate_pairs(
        docs_ds, num_perm, bands, shingle_k, hot_ref=hot_ref
    ).select_columns(["a", "b"]).materialize()
    n_pairs = cands.count()  # materialized → metadata only
    if write_candidates_to:
        # value-oracle seam (driver SFs only): persist the LSH candidate
        # pair set so an external SQL engine can recompute the exact
        # shingle Jaccard over EXACTLY these pairs and re-apply the
        # threshold — verifying banding + verification end to end without
        # having to model LSH recall in SQL
        import os as _os
        import shutil

        shutil.rmtree(write_candidates_to, ignore_errors=True)
        if n_pairs:
            cands.write_parquet(write_candidates_to)
        else:  # keep the oracle's read_parquet glob valid
            _os.makedirs(write_candidates_to, exist_ok=True)
            import pyarrow.parquet as _pq

            _pq.write_table(
                pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64())}),
                _os.path.join(write_candidates_to, "empty.parquet"),
            )
    if n_pairs == 0:
        return rd.from_arrow(
            pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
        )

    # an empty doc emits ONE sentinel row (n_sh=0) so empty-empty candidate
    # pairs survive the join; a real 64-bit shingle hash colliding with the
    # sentinel is ~2^-64 and would only add a spurious intersection of 1
    _EMPTY_SENTINEL = -(1 << 62) + 41

    def _shingles_of(batch: pa.Table, need_ref=None) -> pa.Table:
        ids_np = col_np(batch, "doc_id")
        if need_ref is not None:
            wanted = ray.get(need_ref)
            pos = np.minimum(np.searchsorted(wanted, ids_np), len(wanted) - 1)
            idxs = np.nonzero(wanted[pos] == ids_np)[0]
        else:
            idxs = np.arange(len(ids_np))
        hot = ray.get(hot_ref) if hot_ref is not None else None
        texts = batch.column("text").to_pylist()
        ids: List[int] = []
        shs: List[int] = []
        ns: List[int] = []
        for i in idxs:
            did = int(ids_np[i])
            sh = word_shingles(texts[i], shingle_k)
            if not sh:
                ids.append(did)
                shs.append(_EMPTY_SENTINEL)
                ns.append(0)
                continue
            arr = np.sort(
                np.fromiter(sh, dtype=np.uint64, count=len(sh)).view(np.int64)
            )
            if hot is not None:
                pos2 = np.minimum(np.searchsorted(hot, arr), len(hot) - 1)
                kept = arr[hot[pos2] != arr]
            else:
                kept = arr
            if kept.size == 0:  # all-hot → canonical fingerprint (n_sh=1)
                ids.append(did)
                shs.append(_allhot_fp_i64(arr))
                ns.append(1)
            else:
                ids.extend([did] * kept.size)
                shs.extend(kept.tolist())
                ns.extend([kept.size] * kept.size)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "shingle": pa.array(shs, pa.int64()),
                "n_sh": pa.array(ns, pa.int64()),
            }
        )

    if 2 * n_pairs <= broadcast_pairs_limit:
        # candidate ids bounded by 2·pairs → driver distinct + broadcast
        id_parts: List[np.ndarray] = []
        for blk in cands.iter_batches(batch_format="pyarrow"):
            if blk.num_rows:
                id_parts.append(
                    np.unique(np.concatenate([col_np(blk, "a"), col_np(blk, "b")]))
                )
        need_ref = ray.put(np.unique(np.concatenate(id_parts)))
        sh = docs_ds.map_batches(
            functools.partial(_shingles_of, need_ref=need_ref),
            batch_format="pyarrow",
        )
    else:
        # corpus-scale candidate population: prune docs by a DISTRIBUTED
        # left-semi join on doc_id — nothing corpus-sized on the driver
        def _both_cols(b: pa.Table) -> pa.Table:
            return pa.table(
                {"doc_id": pa.concat_arrays(
                    [b.column("a").combine_chunks(), b.column("b").combine_chunks()]
                )}
            )

        ids_ds = cands.map_batches(_both_cols, batch_format="pyarrow")
        cand_docs = hash_join(
            docs_ds.select_columns(["doc_id", "text"]), ids_ds,
            on="doc_id", how="left semi", num_partitions=P,
        )
        sh = cand_docs.map_batches(_shingles_of, batch_format="pyarrow")

    # real shingles are all ≤ cap after filtering; the residual cap only
    # bounds pathological EMPTY-SENTINEL / identical-fingerprint runs
    counts = _pair_counts(sh, P, max_shingle_freq=cap, min_ratio=threshold)

    _PAIR_DT = np.dtype([("a", "<i8"), ("b", "<i8")])
    if n_pairs <= broadcast_pairs_limit:
        # small-side broadcast: sorted structured array, exact elementwise
        # membership via searchsorted (16 bytes/pair → ≤ 80 MB at the limit)
        rec = np.empty(n_pairs, dtype=_PAIR_DT)
        off = 0
        for blk in cands.iter_batches(batch_format="pyarrow"):
            m = blk.num_rows
            rec["a"][off : off + m] = col_np(blk, "a")
            rec["b"][off : off + m] = col_np(blk, "b")
            off += m
        rec.sort(order=("a", "b"))
        rec_ref = ray.put(rec)

        def semi_filter(batch: pa.Table) -> pa.Table:
            cand = ray.get(rec_ref)
            if batch.num_rows == 0 or len(cand) == 0:
                return batch.slice(0, 0)
            q = np.empty(batch.num_rows, dtype=_PAIR_DT)
            q["a"] = col_np(batch, "a")
            q["b"] = col_np(batch, "b")
            pos = np.minimum(np.searchsorted(cand, q), len(cand) - 1)
            return batch.filter(pa.array(cand[pos] == q))

        verified = counts.map_batches(semi_filter, batch_format="pyarrow")
    else:
        verified = hash_join(counts, cands, on=["a", "b"], how="left semi",
                             num_partitions=P)

    def finish(batch: pa.Table) -> pa.Table:
        inter = col_np(batch, "inter", np.float64)
        n_a = col_np(batch, "n_a", np.float64)
        n_b = col_np(batch, "n_b", np.float64)
        union = n_a + n_b - inter
        both_empty = (n_a == 0) & (n_b == 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            j = np.where(both_empty, 1.0, inter / np.where(union > 0, union, 1.0))
        j = np.round(j, 5)
        keep = j >= threshold
        return pa.table(
            {
                "a": pc.filter(batch.column("a"), pa.array(keep)),
                "b": pc.filter(batch.column("b"), pa.array(keep)),
                "jaccard": pa.array(j[keep], pa.float64()),
            }
        )

    return verified.map_batches(finish, batch_format="pyarrow")


def brute_force_jaccard_pairs(table: pa.Table, threshold: float, shingle_k: int = 3) -> List[Tuple[int, int, float]]:
    """O(n^2) oracle for tests/small inputs."""
    ids = table.column("doc_id").to_pylist()
    sh = [word_shingles(t, shingle_k) for t in table.column("text").to_pylist()]
    out = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            jac = jaccard(sh[i], sh[j])
            if jac >= threshold:
                a, b = sorted((ids[i], ids[j]))
                out.append((a, b, round(jac, 5)))
    return sorted(out)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: str) -> int:
    """64-bit SimHash over token hashes weighted by term frequency."""
    from collections import Counter

    toks = (text or "").lower().split()
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for tok, tf in Counter(toks).items():
        h = _stable_hash(tok)
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), tf, -tf)
    bits = (acc > 0).astype(np.uint64)
    return int(bits.dot(np.uint64(1) << np.arange(64, dtype=np.uint64)))


_SIMHASH_TOKEN_MEMO: Dict[str, int] = {}


def simhash_batch(batch: pa.Table) -> pa.Table:
    """Whole-batch SimHash: token hashes for ALL docs concatenate into one
    uint64 vector, the ±1 bit matrix is built with a single broadcast, and
    per-doc bit sums come from ``np.add.reduceat`` over doc boundaries —
    tf-weighting falls out for free because repeated tokens repeat their
    rows (sum of ±1 per occurrence == Counter-weighted ±tf).  Bit-for-bit
    identical to ``simhash64`` (pinned by pytest)."""
    texts = batch.column("text").to_pylist()
    per_doc = [(t or "").lower().split() for t in texts]
    lens = np.fromiter((len(p) for p in per_doc), dtype=np.int64, count=len(per_doc))
    out = np.zeros(len(per_doc), dtype=np.uint64)
    nonempty = np.nonzero(lens)[0]
    if len(nonempty):
        # Zipf vocabulary: hash each DISTINCT token once per batch (memoized
        # across batches per process) and expand its 0/1 bit row by gather
        toks = np.array(
            [tok for i in nonempty for tok in per_doc[i]], dtype=object
        )
        uniq, inv = np.unique(toks, return_inverse=True)
        memo = _SIMHASH_TOKEN_MEMO
        hs_u = np.fromiter(
            (memo.get(tok) or memo.setdefault(tok, _stable_hash(tok)) for tok in uniq),
            dtype=np.uint64,
            count=len(uniq),
        )
        shifts = np.arange(64, dtype=np.uint64)
        bits_u = ((hs_u[:, None] >> shifts) & np.uint64(1)).astype(np.int32)
        starts = np.concatenate(([0], np.cumsum(lens[nonempty])[:-1]))
        ones = np.add.reduceat(bits_u[inv], starts, axis=0)
        # sign(sum of ±tf) > 0  ⇔  2·ones > doc token count
        bits = (2 * ones > lens[nonempty, None]).astype(np.uint64)
        out[nonempty] = bits @ (np.uint64(1) << shifts)
    # store as int64 two's complement (Arrow has no uint64 in some sinks)
    return pa.table(
        {"doc_id": batch.column("doc_id"), "simhash": pa.array(out.view(np.int64), pa.int64())}
    )


def simhash_signatures(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(simhash_batch, batch_format="pyarrow", zero_copy_batch=True)


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy 1.x has no bitwise_count)."""
    return (
        _POP8[np.ascontiguousarray(x).view(np.uint8).reshape(-1, 8)]
        .sum(axis=1)
        .astype(np.int32)
    )


def simhash_near_dup_pairs(ds: rd.Dataset, max_hamming: int = 3) -> rd.Dataset:
    """Near-dup pairs with Hamming(simhash) <= max_hamming via 4x16-bit band
    blocking (pigeonhole: any pair within Hamming 3 shares a band) + exact
    verify inside each bucket.  Buckets are grouped by HASH PARTITION of the
    (band, key) bucket id — one vectorized UDF call per partition, not one
    Python call per bucket (up to 4·2^16 of them) — and the per-bucket pair
    check is a numpy triu XOR + popcount, not an itertools loop."""
    P = max(2, _sized_partitions(ds))

    def to_bands(batch: pa.Table) -> pa.Table:
        doc = col_np(batch, "doc_id")
        sh = col_np(batch, "simhash", np.uint64)
        n = len(doc)
        shifts = np.uint64(16) * np.arange(4, dtype=np.uint64)
        keys = ((sh[:, None] >> shifts) & np.uint64(0xFFFF)).astype(np.int64)
        bucket = np.arange(4, dtype=np.int64)[None, :] * (1 << 16) + keys
        bucket = bucket.reshape(-1)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(doc, 4), pa.int64()),
                "bucket": pa.array(bucket, pa.int64()),
                "simhash": pa.array(np.repeat(sh.view(np.int64), 4), pa.int64()),
                "part": pa.array((bucket % P).astype(np.int32), pa.int32()),
            }
        )

    def verify(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "hamming": pa.array([], pa.int32()),
            }
        )
        if group.num_rows < 2:
            return empty
        doc = col_np(group, "doc_id")
        sh = col_np(group, "simhash", np.uint64)
        bucket = col_np(group, "bucket")
        order = np.lexsort((doc, bucket))
        doc, sh, bucket = doc[order], sh[order], bucket[order]
        starts = np.flatnonzero(
            np.concatenate([[True], bucket[1:] != bucket[:-1]])
        )
        ends = np.append(starts[1:], len(bucket))
        outs_a, outs_b, outs_h = [], [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            i, j = np.triu_indices(m, 1)
            d = _popcount64(sh[s:e][i] ^ sh[s:e][j])
            keep = d <= max_hamming
            if keep.any():
                outs_a.append(doc[s:e][i[keep]])
                outs_b.append(doc[s:e][j[keep]])
                outs_h.append(d[keep])
        if not outs_a:
            return empty
        return pa.table(
            {
                "a": pa.array(np.concatenate(outs_a), pa.int64()),
                "b": pa.array(np.concatenate(outs_b), pa.int64()),
                "hamming": pa.array(np.concatenate(outs_h), pa.int32()),
            }
        )

    sigs = simhash_signatures(ds)
    pairs = (
        sigs.map_batches(to_bands, batch_format="pyarrow")
        .groupby("part")
        .map_groups(verify, batch_format="pyarrow")
    )
    return pairs.groupby(["a", "b"]).aggregate(Min("hamming", alias_name="hamming"))


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_dup_pairs(emb_ds: rd.Dataset, threshold: float = 0.95) -> rd.Dataset:
    """Pairs (a < b) of embedding rows with exact cosine >= threshold, via
    block-pair tiling (similarity.pairwise_block_refs): each tile task reads
    exactly TWO blocks from the object store and emits its qualifying pairs
    — no whole-matrix broadcast, no driver materialization, O(N²/B²) FLOPs
    per task.  Exact-quadratic by contract (the SQL oracle is the same
    all-pairs join); the approximate scale path is the LSH-bucketed
    within-bucket join (similarity.lsh_bucketed)."""
    from .similarity import _pairs_tile, pairwise_block_refs

    refs = pairwise_block_refs(emb_ds)
    tiles = [
        _pairs_tile.remote(refs[i], refs[j], threshold, i == j)
        for i in range(len(refs))
        for j in range(i, len(refs))
    ]
    return rd.from_arrow_refs(tiles)


def exact_dedup_incremental(
    new_ds: rd.Dataset, known_ds: rd.Dataset, num_partitions=None
) -> rd.Dataset:
    """Incremental exact dedup: rows of a NEW shard whose normalized-text
    fingerprint does not appear in the ALREADY-INGESTED corpus — what a
    rolling 100 TB ingest runs per arriving shard instead of
    re-deduplicating the world.  Anti semi-join on the sha256 fingerprint
    (partition-aligned hash exchange on both sides; the known side ships
    fingerprints only, never text).  Intra-shard duplicates are left to
    ``exact_dedup_keep`` — compose known→incremental→within-shard.
    Output: the surviving new rows plus their fingerprint column."""
    from .join import hash_join
    from .text_ops import fingerprint_batch

    def with_fp(batch: pa.Table) -> pa.Table:
        fp = fingerprint_batch(batch)
        return batch.append_column("fingerprint", fp.column("fingerprint"))

    new_fp = new_ds.map_batches(with_fp, batch_format="pyarrow")
    known_fp = known_ds.map_batches(
        fingerprint_batch, batch_format="pyarrow"
    ).select_columns(["fingerprint"])
    return hash_join(
        new_fp,
        known_fp,
        on="fingerprint",
        how="left anti",
        num_partitions=num_partitions,
    )


def cross_ngram_jaccard_pairs(
    a_ds: rd.Dataset,
    b_ds: rd.Dataset,
    threshold: float = 0.5,
    shingle_k: int = 3,
    id_offset: int = 1 << 40,
    num_partitions: Optional[int] = None,
    max_shingle_freq=None,
) -> rd.Dataset:
    """CROSS-corpus near-duplicate pairs — the crawl-merge question ("which
    docs in the NEW crawl near-duplicate something in the EXISTING corpus")
    as opposed to the self-join's "which pairs within one corpus".  Returns
    (a, b, jaccard_e5) with ``a`` from ``a_ds`` and ``b`` from ``b_ds``
    (b's ORIGINAL id — the offset is internal).

    Pure composition over the verified self-join machinery: b's doc ids
    shift by ``id_offset`` (must exceed every id in ``a_ds``), the union
    stream runs the exact inverted-index ``ngram_jaccard_pairs``, and a
    boundary filter keeps only pairs that straddle the offset — within-A
    and within-B pairs are computed by the join but dropped, so the
    operator inherits the self-join's exactness, skew caps and SQL
    expressibility verbatim.  (A candidate-pruned variant that skips
    within-side pair enumeration entirely would reuse the side-tagged
    shingle exchange; at near-dup densities the enumeration cost is
    pair-output-bounded either way.)"""

    def shift(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.add(batch.column("doc_id"), id_offset),
                "text": batch.column("text"),
            }
        )

    both = a_ds.select_columns(["doc_id", "text"]).union(
        b_ds.select_columns(["doc_id", "text"]).map_batches(
            shift, batch_format="pyarrow"
        )
    )
    pairs = ngram_jaccard_pairs(
        both, threshold=threshold, shingle_k=shingle_k,
        num_partitions=num_partitions, max_shingle_freq=max_shingle_freq,
    )

    def cross_only(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.less(batch.column("a"), id_offset),
            pc.greater_equal(batch.column("b"), id_offset),
        )
        t = batch.filter(keep)
        return pa.table(
            {
                "a": t.column("a"),
                "b": pc.subtract(t.column("b"), id_offset),
                "jaccard_e5": t.column("jaccard_e5"),
            }
        )

    return pairs.map_batches(cross_only, batch_format="pyarrow")
