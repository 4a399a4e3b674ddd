"""Streaming / rolling near-duplicate detection against a live LSH index.

The batch near-dup family (``ops/dedup.py``) answers "which pairs in THIS
corpus are near-duplicates" with shuffle joins.  A rolling ingest (a crawl
that lands every hour, a feed of uploads) asks a different question:

    "is this NEW document a near-duplicate of ANYTHING seen before?"

— which needs a SHARED MUTABLE INDEX that outlives any one Dataset.  That
is the one shape the Dataset API genuinely cannot express (every Dataset
transform is a pure function of its input blocks), so this operator drops
to raw Ray actors exactly as the engine's design rules prescribe: the
index lives in ``num_index_shards`` actors, each owning

  * a slice of the LSH BUCKET space (mixed 64-bit bucket key % shards) —
    bucket key → doc ids in arrival order, and
  * a slice of the DOC STORE (doc_id % shards) — doc_id → MinHash
    signature (``store="signature"``, 8·num_perm bytes/doc) or the hashed
    shingle set (``store="shingles"``, exact verification, unbounded).

Arrival order is ascending ``doc_id`` (the deterministic stand-in for
ingest time), processed in SHARDS of consecutive docs — the unit a real
rolling pipeline gets per ingest tick.  Per shard, signing fans out across
blocks as Ray tasks and index traffic fans out across the actors; shards
themselves are sequential (tick t+1's queries must see tick t's inserts),
with the NEXT shard's signing pipelined while the current shard resolves.
No driver-side structure scales with the corpus or the candidate stream:
routing, candidate gathering, verification and index ingestion all happen
in tasks holding actor handles; the driver only sequences shards and
collects per-shard output block refs.  Per-actor memory at 1 B docs,
256 shards, num_perm=64: ~2 GB of signatures + ~60 M bucket entries; the
bucket index is therefore a two-level LSM shape — a hot delta dict that
COMPACTS into sorted numpy arrays (searchsorted lookups, ~17 bytes/entry)
every ``compact_threshold`` inserted entries, so steady-state memory is
array-backed, not dict-of-list-backed (see ``_IndexShard``; a parity
pytest asserts compacted and uncompacted runs emit identical dup_of).
``RollingIndex`` makes the index a first-class long-lived handle:
successive ``streaming_near_dup(..., index=idx)`` calls continue one
ingest stream (tick t+1 dedups against everything tick t inserted), and
``save``/``load`` checkpoint the full compacted state to disk — the
restarted driver resumes the stream without re-signing history.

Semantics (deterministic, so the batch path is its oracle):

  doc i is a duplicate  ⇔  ∃ j < i already IN THE INDEX with
      (a) an LSH band collision (same num_perm/bands/seed family as
          ``MinHasher`` — signatures are bit-identical to the batch path),
      (b) verified similarity ≥ ``threshold``:
          - ``store="shingles"``: exact Jaccard over the hashed shingle
            sets (matches the batch join's string-shingle Jaccard up to
            2^-64 hash collisions),
          - ``store="signature"``: the estimated Jaccard
            mean(sig_i == sig_j) — the O(num_perm)-bytes-per-doc scale
            path.
  ``dup_of`` = the smallest such j.

  ``insert_dups=True`` (default) inserts every doc — then "∃ j < i in the
  index" ≡ "∃ j < i at all", and the output equals the batch
  ``near_dup_pairs_minhash`` pair set folded to per-doc first-duplicate
  form (pytest asserts exactly that parity).  ``insert_dups=False`` keeps
  a CANONICAL-ONLY index (RefinedWeb-style): duplicates are dropped at the
  door and never pollute the index, so chains dedup to their first member
  (a~b, b~c, a!~c still keeps c when b was dropped for matching a).

Skew guard: a bucket stops yielding candidates beyond its first
``bucket_cap`` members in arrival order (identical-boilerplate floods
would otherwise emit O(m) candidates per new doc); the batch candidate
path caps bucket runs at 256 the same way.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from .arrow_np import col_np
from .dedup import MinHasher, _fold61, _mulmod_p61

_GOLD = np.uint64(0x9E3779B97F4A7C15)

_OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("dup_of", pa.int64()),
        ("sim_e5", pa.int64()),
    ]
)


def _band_keys(sigs: np.ndarray, bands: int) -> np.ndarray:
    """[n_docs, bands] mixed bucket keys (SIGNED int64 throughout — dict
    keys must compare equal between query and insert) from a signature
    matrix — the same polynomial band hash + golden-ratio key mix as the
    batch path (``MinHasher.__call__`` / ``minhash_candidate_pairs``), so
    streaming and batch agree on which docs collide."""
    n, num_perm = sigs.shape
    r = num_perm // bands
    P = np.uint64(1_000_003)
    keys = np.empty((n, bands), dtype=np.uint64)
    for band in range(bands):
        acc = np.zeros(n, dtype=np.uint64)
        for j in range(r):
            acc = _fold61(_mulmod_p61(acc, P) + sigs[:, band * r + j])
        with np.errstate(over="ignore"):
            keys[:, band] = (acc * _GOLD) ^ np.uint64(band)
    return keys.view(np.int64)


def _slice_by_mod(keys: np.ndarray, ids: np.ndarray, m: int) -> List[Tuple]:
    """Partition (keys, ids) rows into m slices by key % m (uint64 view of
    the key so the sign bit doesn't skew the split)."""
    part = (keys.view(np.uint64) % np.uint64(m)).astype(np.int64)
    order = np.argsort(part, kind="stable")
    keys, ids, part = keys[order], ids[order], part[order]
    bounds = np.searchsorted(part, np.arange(m + 1))
    return [
        (keys[bounds[a] : bounds[a + 1]], ids[bounds[a] : bounds[a + 1]])
        for a in range(m)
    ]


@ray.remote
class _IndexShard:
    """One shard of the rolling index: a slice of the bucket space plus a
    slice of the doc store.  All state mutation happens here.

    Bucket storage is a TWO-LEVEL LSM-style index: a hot DELTA dict (fast
    O(1) appends for the current ingest window) over a COMPACTED layer of
    sorted numpy arrays (``ckeys`` sorted bucket keys, ``coffs`` offsets,
    ``cids`` flat member ids in arrival order — searchsorted lookups, ~17
    bytes/entry vs ~100+ for dict-of-list).  Once the delta accumulates
    ``compact_threshold`` entries it merges into the compacted layer in one
    vectorized pass; within a bucket, compacted members are strictly older
    than delta members, so concatenating compacted-then-delta preserves
    arrival order and the ``bucket_cap`` skew guard keeps its exact
    semantics.  ``compact_threshold=0`` disables compaction (plain dict)."""

    def __init__(self, store: str, compact_threshold: int = 0):
        self.store = store
        self.compact_threshold = compact_threshold
        self.buckets: dict = {}       # DELTA: bucket key -> [doc_id, ...] arrival order
        self.delta_entries = 0
        self.n_compactions = 0
        self.ckeys = np.empty(0, np.int64)   # compacted bucket keys, sorted
        self.coffs = np.zeros(1, np.int64)   # bucket i members = cids[coffs[i]:coffs[i+1]]
        self.cids = np.empty(0, np.int64)    # flat member ids, arrival order per bucket
        self.sigs: dict = {}          # DELTA doc store: doc_id -> uint64[num_perm]
        self.shingles: dict = {}      # DELTA doc store: doc_id -> sorted int64 array
        # compacted doc store (same trigger as the bucket compaction): a
        # sorted id array + one dense matrix / one flat+offsets pair --
        # ~zero per-doc Python-object overhead at 10^9-doc scale
        self.c_sig_ids = np.empty(0, np.int64)
        self.c_sig: Optional[np.ndarray] = None      # uint64[n, num_perm]
        self.c_sh_ids = np.empty(0, np.int64)
        self.c_sh_offs = np.zeros(1, np.int64)
        self.c_sh_flat = np.empty(0, np.int64)

    def query(self, packed: Tuple[np.ndarray, np.ndarray], bucket_cap: int):
        """Candidate (new, old) pairs for this slice of a shard's band rows."""
        keys, ids = packed
        out_new: List[np.ndarray] = []
        out_old: List[np.ndarray] = []
        get = self.buckets.get
        nck = len(self.ckeys)
        cpos = np.searchsorted(self.ckeys, keys) if nck else None
        for i, (k, did) in enumerate(zip(keys.tolist(), ids.tolist())):
            comp = None
            if nck:
                p = cpos[i]
                if p < nck and self.ckeys[p] == k:
                    comp = self.cids[self.coffs[p] : self.coffs[p + 1]]
            lst = get(k)
            if comp is None and not lst:
                continue
            # arrival order: compacted (older) first, then delta
            if comp is not None and len(comp) >= bucket_cap:
                olds = comp[:bucket_cap]
            elif comp is not None and len(comp):
                olds = (
                    np.concatenate(
                        [comp, np.asarray(lst[: bucket_cap - len(comp)], np.int64)]
                    )
                    if lst
                    else comp
                )
            else:
                olds = np.asarray(lst[:bucket_cap], dtype=np.int64)
            out_old.append(olds)
            out_new.append(np.full(len(olds), did, dtype=np.int64))
        if not out_new:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(out_new), np.concatenate(out_old)

    def insert(self, packed: Tuple[np.ndarray, np.ndarray]) -> None:
        keys, ids = packed
        buckets = self.buckets
        for k, did in zip(keys.tolist(), ids.tolist()):
            lst = buckets.get(k)
            if lst is None:
                buckets[k] = [did]
            else:
                lst.append(did)
        self.delta_entries += len(keys)
        if self.compact_threshold and self.delta_entries >= self.compact_threshold:
            self._compact()

    def _compact(self) -> None:
        """Merge the delta dict into the sorted compacted arrays — one
        vectorized scatter per layer, no per-bucket Python in the fill."""
        if not self.buckets:
            return
        items = sorted(self.buckets.items())
        dkeys = np.fromiter((k for k, _ in items), np.int64, len(items))
        dlens = np.fromiter((len(v) for _, v in items), np.int64, len(items))
        dids = np.fromiter(
            (d for _, v in items for d in v), np.int64, int(dlens.sum())
        )
        doffs = np.zeros(len(items) + 1, np.int64)
        np.cumsum(dlens, out=doffs[1:])

        allk = np.union1d(self.ckeys, dkeys)
        old_lens = np.zeros(len(allk), np.int64)
        pos_old = np.searchsorted(allk, self.ckeys)
        old_lens[pos_old] = self.coffs[1:] - self.coffs[:-1]
        new_lens = np.zeros(len(allk), np.int64)
        pos_new = np.searchsorted(allk, dkeys)
        new_lens[pos_new] = dlens
        noffs = np.zeros(len(allk) + 1, np.int64)
        np.cumsum(old_lens + new_lens, out=noffs[1:])
        nids = np.empty(int(noffs[-1]), np.int64)
        if len(self.ckeys):
            lens_o = self.coffs[1:] - self.coffs[:-1]
            tgt = np.repeat(noffs[pos_old], lens_o) + (
                np.arange(int(self.coffs[-1])) - np.repeat(self.coffs[:-1], lens_o)
            )
            nids[tgt] = self.cids
        tgt = np.repeat(noffs[pos_new] + old_lens[pos_new], dlens) + (
            np.arange(int(doffs[-1])) - np.repeat(doffs[:-1], dlens)
        )
        nids[tgt] = dids
        self.ckeys, self.coffs, self.cids = allk, noffs, nids
        self.buckets = {}
        self.delta_entries = 0
        self.n_compactions += 1
        self._compact_docs()

    def _compact_docs(self) -> None:
        """Fold the delta doc stores into the sorted compacted arrays.  A
        doc is stored exactly once, so the merge is a pure permutation of
        disjoint id sets (in practice delta ids are all newer/larger, making
        this an append; the stable argsort handles the general case)."""
        if self.sigs:
            dids = np.fromiter(self.sigs.keys(), np.int64, len(self.sigs))
            mat = np.asarray(list(self.sigs.values()))  # same iteration order
            if self.c_sig is None:
                order = np.argsort(dids, kind="stable")
                self.c_sig_ids, self.c_sig = dids[order], mat[order]
            else:
                allids = np.concatenate([self.c_sig_ids, dids])
                order = np.argsort(allids, kind="stable")
                self.c_sig_ids = allids[order]
                self.c_sig = np.concatenate([self.c_sig, mat], axis=0)[order]
            self.sigs = {}
        if self.shingles:
            items = sorted(self.shingles.items())
            ids2 = np.fromiter((k for k, _ in items), np.int64, len(items))
            lens2 = np.fromiter((len(v) for _, v in items), np.int64, len(items))
            offs2 = np.zeros(len(items) + 1, np.int64)
            np.cumsum(lens2, out=offs2[1:])
            flat2 = (
                np.concatenate([v for _, v in items])
                if int(offs2[-1])
                else np.empty(0, np.int64)
            )
            old_lens = self.c_sh_offs[1:] - self.c_sh_offs[:-1]
            allids = np.concatenate([self.c_sh_ids, ids2])
            alllens = np.concatenate([old_lens, lens2])
            src_offs = np.concatenate(
                [self.c_sh_offs[:-1], self.c_sh_offs[-1] + offs2[:-1]]
            )
            order = np.argsort(allids, kind="stable")
            allids, alllens, src_offs = allids[order], alllens[order], src_offs[order]
            noffs = np.zeros(len(allids) + 1, np.int64)
            np.cumsum(alllens, out=noffs[1:])
            flat_all = np.concatenate([self.c_sh_flat, flat2])
            idx = np.repeat(src_offs, alllens) + (
                np.arange(int(noffs[-1])) - np.repeat(noffs[:-1], alllens)
            )
            self.c_sh_ids = allids
            self.c_sh_offs = noffs
            self.c_sh_flat = flat_all[idx]
            self.shingles = {}

    def put_docs(self, ids: np.ndarray, sigs: Optional[np.ndarray],
                 flat: Optional[np.ndarray], offs: Optional[np.ndarray]) -> None:
        if sigs is not None:
            for i, did in enumerate(ids.tolist()):
                self.sigs[did] = sigs[i]
        if flat is not None:
            for i, did in enumerate(ids.tolist()):
                self.shingles[did] = flat[offs[i] : offs[i + 1]]

    def _sig_of(self, d: int) -> np.ndarray:
        v = self.sigs.get(d)
        if v is not None:
            return v
        p = int(np.searchsorted(self.c_sig_ids, d))
        return self.c_sig[p]

    def _sh_of(self, d: int) -> np.ndarray:
        v = self.shingles.get(d)
        if v is not None:
            return v
        p = int(np.searchsorted(self.c_sh_ids, d))
        return self.c_sh_flat[self.c_sh_offs[p] : self.c_sh_offs[p + 1]]

    def get_docs(self, ids: np.ndarray):
        """Stored doc data for verification (old side of candidates) --
        served from the delta dict or the compacted arrays."""
        if self.store == "signature":
            if not len(ids):
                return None
            return np.stack([self._sig_of(d) for d in ids.tolist()])
        flats = [self._sh_of(d) for d in ids.tolist()]
        offs = np.zeros(len(flats) + 1, dtype=np.int64)
        if flats:
            np.cumsum([len(f) for f in flats], out=offs[1:])
        return (
            np.concatenate(flats) if flats and offs[-1] else np.empty(0, np.int64),
            offs,
        )

    def snapshot(self) -> dict:
        """Checkpoint this shard's full index state as a dict of numpy
        arrays (compacts the delta layers first, so the snapshot IS the
        compacted representation — nothing dict-shaped leaves the actor)."""
        self._compact()        # no-op when the bucket delta is empty ...
        self._compact_docs()   # ... but doc deltas must compact regardless
        return {
            "ckeys": self.ckeys,
            "coffs": self.coffs,
            "cids": self.cids,
            "c_sig_ids": self.c_sig_ids,
            "c_sig": (
                self.c_sig
                if self.c_sig is not None
                else np.empty((0, 0), np.uint64)
            ),
            "c_sh_ids": self.c_sh_ids,
            "c_sh_offs": self.c_sh_offs,
            "c_sh_flat": self.c_sh_flat,
            "n_compactions": np.int64(self.n_compactions),
        }

    def restore(self, state: dict) -> None:
        self.buckets = {}
        self.sigs = {}
        self.shingles = {}
        self.delta_entries = 0
        self.ckeys = state["ckeys"]
        self.coffs = state["coffs"]
        self.cids = state["cids"]
        self.c_sig_ids = state["c_sig_ids"]
        sig = state["c_sig"]
        self.c_sig = sig if sig.size else None
        self.c_sh_ids = state["c_sh_ids"]
        self.c_sh_offs = state["c_sh_offs"]
        self.c_sh_flat = state["c_sh_flat"]
        self.n_compactions = int(state["n_compactions"])

    def stats(self) -> dict:
        return {
            "buckets": len(self.buckets) + len(self.ckeys),
            "delta_buckets": len(self.buckets),
            "compacted_buckets": len(self.ckeys),
            "compacted_entries": int(self.coffs[-1]),
            "n_compactions": self.n_compactions,
            "docs": max(
                len(self.sigs) + len(self.c_sig_ids),
                len(self.shingles) + len(self.c_sh_ids),
            ),
            "compacted_docs": max(len(self.c_sig_ids), len(self.c_sh_ids)),
        }


@ray.remote
def _prep(block: pa.Table, num_perm: int, bands: int, shingle_k: int, store: str,
          hot_ref=None):
    """Sign one block: (ids, signatures, band keys[, packed shingle sets]).
    MinHasher's permutation params are deterministic from the seed, so the
    streaming signatures are bit-identical to the batch path's (including
    the IDF-filtered signing space when ``hot_ref`` carries the boilerplate
    shingle vocabulary — without it, template-heavy corpora band every
    template-mate together and the candidate stream explodes; a 200k-doc
    signature-store smoke measured 231 s raw vs ~8 s filtered)."""
    mh = MinHasher(num_perm=num_perm, bands=bands, shingle_k=shingle_k,
                   hot_ref=hot_ref)
    ids = col_np(block, "doc_id").astype(np.int64)
    texts = block.column("text").to_pylist()
    sigs = mh._signatures(texts)
    keys = _band_keys(sigs, bands)
    flat = offs = None
    if store == "shingles":
        per_doc = [np.sort(mh._doc_shingle_arr(t).view(np.int64)) for t in texts]
        offs = np.zeros(len(per_doc) + 1, dtype=np.int64)
        np.cumsum([len(p) for p in per_doc], out=offs[1:])
        flat = np.concatenate(per_doc) if offs[-1] else np.empty(0, np.int64)
    return ids, sigs, keys, flat, offs


def _route_fn(num_shards: int, preps):
    """Partition a shard's band rows by index-shard; one (keys, ids) slice
    per actor."""
    keys = np.concatenate([p[2].reshape(-1) for p in preps])
    ids = np.concatenate([np.repeat(p[0], p[2].shape[1]) for p in preps])
    return _slice_by_mod(keys, ids, num_shards)


def _gather_fn(actors: list, query_results):
    """Union inter-shard candidates and fetch the old side's stored doc
    data straight from the store actors — candidate arrays never touch the
    driver.  Returns (news, olds, old_sig_map_parts | old_shingle_parts)."""
    A = len(actors)
    news = np.concatenate([q[0] for q in query_results])
    olds = np.concatenate([q[1] for q in query_results])
    if len(news):
        pairs = np.unique(np.stack([news, olds], axis=1), axis=0)
        news, olds = pairs[:, 0].copy(), pairs[:, 1].copy()
    fetch = [np.unique(olds[olds % A == a]) for a in range(A)]
    fetched = ray.get(
        [actors[a].get_docs.remote(fetch[a]) for a in range(A)]
    )
    return news, olds, fetch, fetched


def _verify_pairs(
    news: np.ndarray, olds: np.ndarray, threshold: float, store: str,
    new_sig, new_sh, old_sig, old_sh,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(new, old, sim_e5) for pairs meeting the threshold; ``new_*`` /
    ``old_*`` are id → signature / shingle-array lookups."""
    if not len(news):
        return news, olds, np.empty(0, np.int64)
    if store == "signature":
        a = np.stack([new_sig(d) for d in news.tolist()])
        b = np.stack([old_sig(d) for d in olds.tolist()])
        sim = (a == b).mean(axis=1)
    else:
        sim = np.empty(len(news), dtype=np.float64)
        for i, (nd, od) in enumerate(zip(news.tolist(), olds.tolist())):
            sa, sb = new_sh(nd), old_sh(od)
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            sim[i] = inter / union if union else 0.0
    # the batch path thresholds on round(j, 5) (near_dup_pairs_minhash's
    # finish) — mirror it so knife-edge pairs agree bit-for-bit
    sim = np.round(sim, 5)
    keep = sim >= threshold
    sim_e5 = np.floor(sim[keep] * 100_000.0 + 0.5).astype(np.int64)
    return news[keep], olds[keep], sim_e5


def _resolve_fn(
    actors: list, threshold: float, store: str, insert_dups: bool,
    bucket_cap: int, cands, preps,
):
    """Per-shard resolution: verify inter-shard candidates, find + verify
    intra-shard collisions, fold to per-doc first-duplicate, then feed the
    index actors (insert + put_docs) and wait for their acks — the task
    returns only after the shard is fully ingested, which is the driver's
    sequencing point before the next shard may query."""
    A = len(actors)
    ids = np.concatenate([p[0] for p in preps])
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    sigs = np.concatenate([p[1] for p in preps], axis=0)[order]
    keys = np.concatenate([p[2] for p in preps], axis=0)[order]
    sh_arrs: Optional[list] = None
    if store == "shingles":
        sh_arrs = []
        for p in preps:
            flat, offs = p[3], p[4]
            sh_arrs.extend(flat[offs[i] : offs[i + 1]] for i in range(len(offs) - 1))
        sh_arrs = [sh_arrs[i] for i in order]
    pos = {int(d): i for i, d in enumerate(ids)}

    def new_sig(d):
        return sigs[pos[d]]

    def new_sh(d):
        return sh_arrs[pos[d]]

    # --- inter-shard: verify against the pre-fetched old-doc data ----------
    news, olds, fetch, fetched = cands
    old_sig_map: dict = {}
    old_sh_map: dict = {}
    for a in range(A):
        want = fetch[a]
        if not len(want):
            continue
        if store == "signature":
            mat = fetched[a]
            for i, d in enumerate(want.tolist()):
                old_sig_map[d] = mat[i]
        else:
            flat, offs = fetched[a]
            for i, d in enumerate(want.tolist()):
                old_sh_map[d] = flat[offs[i] : offs[i + 1]]
    vn, vo, vs = _verify_pairs(
        news, olds, threshold, store,
        new_sig, new_sh, old_sig_map.__getitem__, old_sh_map.__getitem__,
    )

    # --- intra-shard: bucket runs within this shard's own band rows --------
    flat_keys = keys.reshape(-1)
    flat_ids = np.repeat(ids, keys.shape[1])
    korder = np.lexsort((flat_ids, flat_keys))
    fk, fi = flat_keys[korder], flat_ids[korder]
    run_starts = np.concatenate(
        ([0], np.nonzero(fk[1:] != fk[:-1])[0] + 1, [len(fk)])
    )
    ii, jj = [], []
    for r in range(len(run_starts) - 1):
        lo, hi = int(run_starts[r]), int(run_starts[r + 1])
        m = hi - lo
        if m < 2 or m > bucket_cap:
            continue
        tri = np.triu_indices(m, 1)
        ii.append(fi[lo:hi][tri[1]])  # run sorted by id → tri[1] is the newer doc
        jj.append(fi[lo:hi][tri[0]])
    if ii:
        intra = np.unique(
            np.stack([np.concatenate(ii), np.concatenate(jj)], axis=1), axis=0
        )
        intra = intra[intra[:, 0] != intra[:, 1]]
        xn, xo, xs = _verify_pairs(
            intra[:, 0], intra[:, 1], threshold, store,
            new_sig, new_sh, new_sig, new_sh,
        )
    else:
        xn = xo = np.empty(0, np.int64)
        xs = np.empty(0, np.int64)

    # --- fold to per-doc first-duplicate ------------------------------------
    dup_of = np.full(len(ids), -1, dtype=np.int64)
    sim_of = np.zeros(len(ids), dtype=np.int64)
    if insert_dups:
        for n_, o_, s_ in zip(
            np.concatenate([vn, xn]).tolist(),
            np.concatenate([vo, xo]).tolist(),
            np.concatenate([vs, xs]).tolist(),
        ):
            i = pos[n_]
            if dup_of[i] == -1 or o_ < dup_of[i]:
                dup_of[i], sim_of[i] = o_, s_
        ins_mask = np.ones(len(ids), dtype=bool)
    else:
        # canonical-only chain: walk the shard in arrival order; an intra
        # match only counts while its older side stayed canonical
        inter_by_new: dict = {}
        for n_, o_, s_ in zip(vn.tolist(), vo.tolist(), vs.tolist()):
            cur = inter_by_new.get(n_)
            if cur is None or o_ < cur[0]:
                inter_by_new[n_] = (o_, s_)
        intra_by_new: dict = {}
        for n_, o_, s_ in zip(xn.tolist(), xo.tolist(), xs.tolist()):
            intra_by_new.setdefault(n_, []).append((o_, s_))
        canon: set = set()
        for i, d in enumerate(ids.tolist()):
            best = inter_by_new.get(d)
            for o_, s_ in sorted(intra_by_new.get(d, ())):
                if o_ in canon and (best is None or o_ < best[0]):
                    best = (o_, s_)
                    break
            if best is not None:
                dup_of[i], sim_of[i] = best
            else:
                canon.add(d)
        ins_mask = np.array([d in canon for d in ids.tolist()], dtype=bool)

    is_dup = pa.array(dup_of != -1)
    null64 = pa.scalar(None, pa.int64())
    out = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "dup_of": pc.if_else(is_dup, pa.array(dup_of, pa.int64()), null64),
            "sim_e5": pc.if_else(is_dup, pa.array(sim_of, pa.int64()), null64),
        }
    )

    # --- ingest: route inserted docs to their actors and wait for acks -----
    ins_keys = keys[ins_mask].reshape(-1)
    ins_ids = np.repeat(ids[ins_mask], keys.shape[1])
    acks = [
        actors[a].insert.remote(sl)
        for a, sl in enumerate(_slice_by_mod(ins_keys, ins_ids, A))
    ]
    sel = np.nonzero(ins_mask)[0]
    for a in range(A):
        mine = sel[ids[sel] % A == a]
        if not len(mine):
            continue
        s_ids = ids[mine]
        if store == "signature":
            acks.append(actors[a].put_docs.remote(s_ids, sigs[mine], None, None))
        else:
            flats = [sh_arrs[i] for i in mine.tolist()]
            offs = np.zeros(len(flats) + 1, dtype=np.int64)
            np.cumsum([len(f) for f in flats], out=offs[1:])
            s_flat = np.concatenate(flats) if offs[-1] else np.empty(0, np.int64)
            acks.append(actors[a].put_docs.remote(s_ids, None, s_flat, offs))
    ray.get(acks)
    return out


@ray.remote
def _shard_round(
    actors: list, threshold: float, store: str, insert_dups: bool,
    bucket_cap: int, *preps,
):
    """ONE task per ingest tick: route → actor queries → candidate gather
    (doc fetches straight from the store actors) → verify/fold → ingest +
    acks.  Fusing the former route/gather/resolve task chain into a single
    coordinator removes two scheduling hops per tick — the sequential-tick
    chain is the streaming op's wall clock at small tick sizes (measured
    ~100 ms/tick of pure hop latency at sf0.1's 128-doc ticks).  Candidate
    arrays and doc payloads still never touch the driver."""
    A = len(actors)
    routed = _route_fn(A, preps)
    qres = ray.get([actors[a].query.remote(routed[a], bucket_cap) for a in range(A)])
    cands = _gather_fn(actors, qres)
    return _resolve_fn(
        actors, threshold, store, insert_dups, bucket_cap, cands, preps
    )


@ray.remote
def _nrows(t: pa.Table) -> int:
    return t.num_rows


class RollingIndex:
    """Handle to a LIVE sharded rolling-dedup index that outlives any one
    ``streaming_near_dup`` call — the production rolling-ingest shape: tick
    t's call inserts its docs, the handle persists, tick t+1's call dedups
    against everything ever inserted.  ``save``/``load`` checkpoint the full
    index state to disk (one .npz per shard actor + a params manifest), so a
    restarted driver resumes the ingest stream without re-signing history —
    the streaming counterpart of the KG runner's shard-manifest resume.

    Signature-space parameters (num_perm / bands / shingle_k / store) are
    fixed at creation and travel with the handle; per-call knobs
    (threshold, bucket_cap, shard_rows) may vary between calls.  Docs must
    keep arriving in globally ascending ``doc_id`` order across calls (the
    module's arrival-order contract)."""

    def __init__(self, actors, store, num_perm, bands, shingle_k,
                 compact_threshold, hot_ref=None):
        self.actors = actors
        self.store = store
        self.num_perm = num_perm
        self.bands = bands
        self.shingle_k = shingle_k
        self.compact_threshold = compact_threshold
        # sorted int64 boilerplate-shingle vocabulary (ray.put ref) — part
        # of the SIGNATURE SPACE, so it is fixed at creation and persists
        # with checkpoints: signatures stored under one hot set are only
        # comparable to queries signed under the same set
        self.hot_ref = hot_ref

    @classmethod
    def create(cls, num_shards: int = 8, store: str = "signature",
               num_perm: int = 64, bands: int = 16, shingle_k: int = 3,
               compact_threshold: int = 1_000_000,
               hot_shingles=None) -> "RollingIndex":
        assert store in ("signature", "shingles")
        actors = [
            _IndexShard.remote(store, compact_threshold) for _ in range(num_shards)
        ]
        hot_ref = None
        if hot_shingles is not None and len(hot_shingles):
            hot_ref = ray.put(np.asarray(hot_shingles, dtype=np.int64))
        return cls(actors, store, num_perm, bands, shingle_k, compact_threshold,
                   hot_ref)

    def save(self, path: str) -> None:
        import json
        import os
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path, exist_ok=True)
        states = ray.get([a.snapshot.remote() for a in self.actors])
        for i, st in enumerate(states):
            np.savez(os.path.join(path, f"shard{i}.npz"), **st)
        if self.hot_ref is not None:
            np.save(os.path.join(path, "hot.npy"), ray.get(self.hot_ref))
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(
                {
                    "num_shards": len(self.actors),
                    "store": self.store,
                    "num_perm": self.num_perm,
                    "bands": self.bands,
                    "shingle_k": self.shingle_k,
                    "compact_threshold": self.compact_threshold,
                },
                f,
            )

    @classmethod
    def load(cls, path: str) -> "RollingIndex":
        import json
        import os

        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        hot_path = os.path.join(path, "hot.npy")
        hot = np.load(hot_path) if os.path.exists(hot_path) else None
        idx = cls.create(
            meta["num_shards"], meta["store"], meta["num_perm"], meta["bands"],
            meta["shingle_k"], meta["compact_threshold"], hot_shingles=hot,
        )
        acks = []
        for i, a in enumerate(idx.actors):
            with np.load(os.path.join(path, f"shard{i}.npz")) as z:
                acks.append(a.restore.remote({k: z[k] for k in z.files}))
        ray.get(acks)
        return idx

    def stats(self) -> List[dict]:
        return ray.get([a.stats.remote() for a in self.actors])


def streaming_near_dup(
    docs_ds: rd.Dataset,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    num_index_shards: int = 8,
    shard_rows: int = 50_000,
    store: str = "signature",
    insert_dups: bool = True,
    bucket_cap: int = 256,
    compact_threshold: int = 1_000_000,
    index: Optional[RollingIndex] = None,
    hot_shingles=None,
) -> rd.Dataset:
    """Rolling near-dup detection: docs stream through a live sharded LSH
    index in ascending ``doc_id`` order; each doc reports its first earlier
    near-duplicate.  Returns one row per input doc:
    (doc_id, dup_of nullable int64, sim_e5 nullable int64) — see the
    module docstring for the exact semantics and the scale design.

    ``index``: pass a ``RollingIndex`` to dedup THIS batch against
    everything previously inserted through the same handle (and to leave
    this batch's docs in the index for future calls) — the rolling-ingest
    continuation shape; signature-space params then come from the handle.
    Without it, a fresh per-call index is built and discarded.

    The parity pytest runs ``store="shingles"`` against the batch
    ``near_dup_pairs_minhash`` fold; ``store="signature"`` is the
    bounded-memory production path (verification by signature-estimated
    Jaccard instead of exact shingle Jaccard)."""
    assert store in ("signature", "shingles")
    hot_ref = None
    if hot_shingles is not None and len(hot_shingles):
        hot_ref = ray.put(np.asarray(hot_shingles, dtype=np.int64))
    if index is not None:
        store = index.store
        num_perm = index.num_perm
        bands = index.bands
        shingle_k = index.shingle_k
        num_index_shards = len(index.actors)
        hot_ref = index.hot_ref  # the index's signature space wins
    sorted_ds = (
        docs_ds.select_columns(["doc_id", "text"]).sort("doc_id").materialize()
    )
    refs = sorted_ds.to_arrow_refs()
    counts = ray.get([_nrows.remote(r) for r in refs]) if refs else []

    # group consecutive sorted blocks into ingest shards of >= shard_rows
    shards: List[List] = []
    cur: List = []
    acc = 0
    for r, c in zip(refs, counts):
        if c == 0:
            continue
        cur.append(r)
        acc += c
        if acc >= shard_rows:
            shards.append(cur)
            cur, acc = [], 0
    if cur:
        shards.append(cur)
    if not shards:
        return rd.from_arrow(_OUT_SCHEMA.empty_table())

    actors = (
        index.actors
        if index is not None
        else [
            _IndexShard.remote(store, compact_threshold)
            for _ in range(num_index_shards)
        ]
    )
    A = num_index_shards

    def sign_shard(blocks) -> list:
        return [
            _prep.remote(b, num_perm, bands, shingle_k, store, hot_ref)
            for b in blocks
        ]

    out_refs = []
    preps = sign_shard(shards[0])
    for t in range(len(shards)):
        # pipeline: sign shard t+1 while shard t resolves
        next_preps = sign_shard(shards[t + 1]) if t + 1 < len(shards) else None
        out_t = _shard_round.remote(
            actors, threshold, store, insert_dups, bucket_cap, *preps
        )
        # _shard_round returns only after the actors ack the shard's
        # inserts; blocking here gives shard t+1's queries read-your-writes
        ray.wait([out_t], fetch_local=False)
        out_refs.append(out_t)
        preps = next_preps

    return rd.from_arrow_refs(out_refs)
