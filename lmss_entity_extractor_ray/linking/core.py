"""Mention → LMSS class linking core (reference: ``OntologyClassifier``,
app/lmss_classification.py:62-171).

Two implementations with identical outputs:

- ``match_naive`` — the oracle-faithful mirror of ``_find_best_match``:
  scan ALL classes in index order; fast-path return on the FIRST class with
  cosine >= high_confidence_threshold (:75-84); else
  ``combined = (cosine + token_set_ratio/100) / 2`` (:87-90) with
  ``best_score`` starting at 0 and strict ``>`` updates; accept iff
  ``>= similarity_threshold`` (:100-109).

- ``match_fast`` — the vectorized engine path: one gemv for all cosines,
  then fuzzy only on classes whose combined-score upper bound
  ``(cos+1)/2`` can still matter.  The pruning is exact:
  (a) a class with ``(cos+1)/2 < similarity_threshold`` can neither be
      returned (its combined < threshold) nor shadow a returned class (if it
      were the argmax, the max would be < threshold → None either way);
  (b) inside the loop, a class with ``(cos+1)/2 <= best_score`` cannot
      strictly exceed ``best_score`` so never updates it; skipping preserves
      the reference's first-index tie behavior.
  Both paths share the same gemv and float arithmetic, so results are
  bit-identical; a unit test asserts naive == fast on fuzzed inputs.

Classes whose four embedding fields are all empty have no embedding and are
skipped entirely (reference :69-70) — the artifact matrix simply omits them.

Linking is a pure function of the mention text (the vector is derived from
it), so ``match_fast`` memoizes per text — web-corpus mention texts are
Zipf-distributed and the cache hit rate is high.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..config import LMSS_NS, LinkerConfig
from ..functions.fuzzy import _tokens, token_set_ratio, token_set_ratio_sets
from ..ontology.artifacts import OntologyArtifacts

Match = Tuple[str, str, float]  # (iri, label, score)

_MISS = ("", "", -1.0)  # cache sentinel for "no match"

# Process-global memo: linking is a pure function of (ontology, thresholds,
# mention text), so the cache is keyed by those and shared across LinkerCore
# instances.  Ray reuses worker processes across Dataset executions within a
# session, so a new actor pool starts WARM — without this, every execution
# re-pays the whole cold phase per actor, which is duplicated work that
# grows with actor count (it cost 25 scaling-efficiency points at 16 CPUs
# and models a long-lived multi-node job wrongly).
_GLOBAL_CACHE: Dict[tuple, Dict[str, Match]] = {}


def make_pred(branch: str) -> str:
    """Triple predicate for a branch: the reference's implicit
    ``(doc, lmss:hasClass ⊕ branch, iri)`` payload (SURVEY.md §1.1.4)."""
    return LMSS_NS + "hasClass/" + branch


class LinkerCore:
    def __init__(self, artifacts: OntologyArtifacts, cfg: LinkerConfig = LinkerConfig()):
        self.cfg = cfg
        self.nmat = np.ascontiguousarray(artifacts.emb_norm)  # [R, D] unit rows
        # transposed copy: v @ nmat_t is ~20% faster than nmat @ v on this
        # BLAS (both paths — naive and fast — share cosines(), so parity
        # between them is independent of the kernel shape)
        self.nmat_t = np.ascontiguousarray(self.nmat.T)
        idx = artifacts.emb_class_idx
        self.row_iris: List[str] = [artifacts.iris[i] for i in idx]
        self.row_labels: List[str] = [artifacts.labels[i] for i in idx]
        self.row_labels_lower: List[str] = [s.lower() for s in self.row_labels]
        # pre-tokenized label sets: tokenizing the label on every fuzzy call
        # is pure waste (labels are fixed per actor lifetime)
        self.row_label_tokens: List[frozenset] = [
            frozenset(_tokens(s)) for s in self.row_labels_lower
        ]
        self.branch_of: Dict[str, str] = artifacts.branch_of
        # global caches engage only with a real content hash — an id()-based
        # key could alias a different in-memory ontology after GC reuse
        self._cache_sha = getattr(artifacts, "owl_sha256", "") or None
        if self._cache_sha:
            cache_key = (
                self._cache_sha,
                cfg.similarity_threshold,
                cfg.high_confidence_threshold,
            )
            self._cache: Dict[str, Match] = _GLOBAL_CACHE.setdefault(cache_key, {})
        else:
            self._cache = {}
        self._build_fuzzy_bound_index()

    _BOUND_INDEX_CACHE: Dict[str, dict] = {}  # process-global, keyed by ontology sha

    def _build_fuzzy_bound_index(self) -> None:
        """Per-class precomputation for the vectorized fuzzy upper bound.

        token_set_ratio(a, b) = max of three SequenceMatcher ratios over
        (s_inter, s_a), (s_inter, s_b), (s_a, s_b), where s_a/s_b are the
        space-joined sorted unique tokens of each side and s_inter the joined
        intersection.  Valid upper bounds, all computable per-mention for ALL
        classes with a handful of numpy ops:
          ratio(s_inter, s_x) <= 2·li/(li+lx)   (inter ⊆ both sides → li<=lx)
          ratio(s_a, s_b)     <= 2·M/(la+lb)    (difflib quick_ratio bound:
                                                 M = Σ_c min(count_a[c],
                                                 count_b[c]), spaces included)
        li comes from a token→rows inverted index (joined char length of the
        token intersection); M from a [rows, alphabet] char-count matrix.
        Built once per (process, ontology): the structures are pure functions
        of the label set, so re-instantiated actors reuse them."""
        sha = getattr(self, "_cache_sha", None)
        cached = self._BOUND_INDEX_CACHE.get(sha) if sha else None
        if cached is not None:
            self._lb = cached["lb"]
            self._char_idx = cached["char_idx"]
            self._C = cached["C"]
            self._inv = cached["inv"]
            return
        toks_list = self.row_label_tokens
        n_rows = len(toks_list)
        self._lb = np.array(
            [sum(len(t) for t in ts) + max(0, len(ts) - 1) for ts in toks_list],
            dtype=np.float32,
        )
        alphabet = sorted({c for ts in toks_list for t in ts for c in t})
        self._char_idx: Dict[str, int] = {c: i for i, c in enumerate(alphabet)}
        width = len(alphabet) + 1  # final column counts the joining spaces
        C = np.zeros((n_rows, width), dtype=np.float32)
        for r, ts in enumerate(toks_list):
            for t in ts:
                for c in t:
                    C[r, self._char_idx[c]] += 1.0
            C[r, width - 1] = max(0, len(ts) - 1)
        self._C = C
        inv: Dict[str, list] = {}
        for r, ts in enumerate(toks_list):
            for t in ts:
                inv.setdefault(t, []).append(r)
        self._inv = {t: np.asarray(rs, dtype=np.int64) for t, rs in inv.items()}
        if sha and len(self._BOUND_INDEX_CACHE) < 8:
            self._BOUND_INDEX_CACHE[sha] = {
                "lb": self._lb, "char_idx": self._char_idx,
                "C": self._C, "inv": self._inv,
            }

    def _fuzzy_upper_bounds(self, text_tokens: frozenset, rows: np.ndarray) -> np.ndarray:
        """Upper bounds on token_set_ratio/100 for the given row subset (as
        floats in [0, 1] including the int-rounding margin).  Cost is
        O(|rows|·alphabet), not O(all classes) — callers pre-screen rows with
        the generic fuzzy<=1 bound on cosine first."""
        if not text_tokens:
            return np.ones(rows.shape[0], dtype=np.float32)
        la = sum(len(t) for t in text_tokens) + max(0, len(text_tokens) - 1)
        width = self._C.shape[1]
        ca = np.zeros(width, dtype=np.float32)
        for t in text_tokens:
            for c in t:
                i = self._char_idx.get(c)
                if i is not None:
                    ca[i] += 1.0
        ca[width - 1] = max(0, len(text_tokens) - 1)
        # token-intersection char length via the inverted index: full-length
        # accumulators (cheap fancy adds over the few mention tokens), then
        # one subset gather
        charsum = np.zeros(self._lb.shape[0], dtype=np.float32)
        cnt = np.zeros(self._lb.shape[0], dtype=np.float32)
        for t in text_tokens:
            hit = self._inv.get(t)
            if hit is not None:
                charsum[hit] += len(t)
                cnt[hit] += 1.0
        li = charsum[rows] + np.maximum(cnt[rows] - 1.0, 0.0)
        lb = self._lb[rows]
        b1 = 2.0 * li / np.maximum(li + la, 1.0)
        den2 = li + lb
        b2 = np.where(den2 > 0, 2.0 * li / np.maximum(den2, 1.0), 1.0)
        m = np.minimum(self._C[rows], ca[None, :]).sum(axis=1)
        den3 = la + lb
        b3 = np.where(den3 > 0, 2.0 * m / np.maximum(den3, 1.0), 1.0)
        # +0.0051: the int ratio is round(100·true), up to 0.005 above the
        # true float, plus headroom for float rounding of the bound itself;
        # capped at 1.0 because a ratio of 100 is the ceiling either way
        return np.minimum(np.maximum(np.maximum(b1, b2), b3) + 0.0051, 1.0)

    # -- shared numeric kernel: one gemv per mention, same on both paths --
    def cosines(self, unit_vec: np.ndarray) -> np.ndarray:
        return unit_vec @ self.nmat_t

    def branch(self, iri: str) -> str:
        return self.branch_of.get(iri, "Unknown")

    # ------------------------------------------------------------------
    def match_naive(self, text: str, unit_vec: np.ndarray) -> Optional[Match]:
        """Oracle-faithful full scan (reference control flow, no pruning)."""
        cos = self.cosines(unit_vec)
        text_lower = text.lower()
        best: Optional[Match] = None
        best_score = 0.0
        for r in range(cos.shape[0]):
            semantic = float(cos[r])
            if semantic >= self.cfg.high_confidence_threshold:
                return (self.row_iris[r], self.row_labels[r], semantic)
            fuzzy = token_set_ratio(text_lower, self.row_labels_lower[r]) / 100
            combined = (semantic + fuzzy) / 2
            if combined > best_score:
                best_score = combined
                best = (self.row_iris[r], self.row_labels[r], best_score)
        if best is not None and best[2] >= self.cfg.similarity_threshold:
            return best
        return None

    # ------------------------------------------------------------------
    def match_fast(self, text: str, unit_vec: np.ndarray) -> Optional[Match]:
        """Vectorized + pruned + memoized; output identical to match_naive."""
        hit = self._cache.get(text)
        if hit is not None:
            return None if hit is _MISS else hit
        result = self._match_fast_uncached(text, unit_vec)
        if len(self._cache) < self.cfg.cache_size:
            self._cache[text] = _MISS if result is None else result
        return result

    def _match_fast_uncached(self, text: str, unit_vec: np.ndarray) -> Optional[Match]:
        cos = self.cosines(unit_vec)
        high = cos >= self.cfg.high_confidence_threshold
        if high.any():
            r = int(np.argmax(high))  # FIRST qualifying class in index order
            return (self.row_iris[r], self.row_labels[r], float(cos[r]))

        # The naive scan's winner is order-independent: the LOWEST index among
        # argmax(combined), accepted iff >= threshold (strict-> updates from a
        # 0.0 floor == first index achieving the max, and only for combined>0).
        # Two-level pruning, both levels exact upper bounds on combined:
        #   level 1: generic fuzzy<=1 → rows need cos >= 2·thr - 1;
        #   level 2: the vectorized per-class fuzzy bound on that subset.
        # Then process survivors by DESCENDING upper bound and stop as soon
        # as the bound falls below the best seen: almost no SequenceMatcher
        # calls remain.
        thr = self.cfg.similarity_threshold
        rows0 = np.nonzero(cos >= 2.0 * thr - 1.0)[0]
        if rows0.size == 0:
            return None
        text_tokens = frozenset(_tokens(text.lower()))
        upper_sub = (cos[rows0] + self._fuzzy_upper_bounds(text_tokens, rows0)) / 2.0
        keep = upper_sub >= thr
        candidates = rows0[keep]
        if candidates.size == 0:
            return None
        upper_vals = upper_sub[keep]
        # stable sort keeps index order among equal bounds
        sub_order = np.argsort(-upper_vals, kind="stable")
        order = candidates[sub_order]
        upper = np.empty(cos.shape[0])
        upper[candidates] = upper_vals
        best_r = -1
        best_score = 0.0
        thr = self.cfg.similarity_threshold
        for r in order:
            u = upper[r]
            if u < best_score:
                break  # no remaining candidate can beat best_score
            if u == best_score and best_r != -1 and r > best_r:
                continue  # could only TIE, and the lower index already won
            semantic = float(cos[r])
            # a candidate only matters if combined can reach max(best, thr):
            # strictly below → can neither be returned nor tie the winner
            needed = 2.0 * max(best_score, thr) - semantic
            fuzzy_int = token_set_ratio_sets(
                text_tokens, self.row_label_tokens[r], needed=needed
            )
            if fuzzy_int < 0:
                continue  # provably below every interesting floor
            combined = (semantic + fuzzy_int / 100) / 2
            if combined > best_score or (
                combined == best_score and best_r != -1 and combined > 0.0 and r < best_r
            ):
                best_score = combined
                best_r = int(r)
        if best_r != -1 and best_score >= self.cfg.similarity_threshold:
            return (self.row_iris[best_r], self.row_labels[best_r], best_score)
        return None

    # ------------------------------------------------------------------
    def post_process(self, mention_type: str, match: Match) -> Optional[Match]:
        """Mirror of ``_post_process_match`` (app/lmss_classification.py:111-127):
        Location noun phrases pass through; low-score VERB matches are dropped
        (dead branch in the reference — the extractor never emits VERB — kept
        for parity, SURVEY.md §2.10)."""
        if mention_type == "NOUN_PHRASE" and self.branch(match[0]) == "Location":
            return match
        if mention_type == "VERB" and match[2] < 0.7:
            return None
        return match

    def classify(self, mention: Dict, fast: bool = True) -> Optional[Dict]:
        """One mention dict → classified record
        ``{start,end,text,branch,label,score,iri}``
        (reference match_entities, app/lmss_classification.py:129-159)."""
        fn = self.match_fast if fast else self.match_naive
        match = fn(mention["text"], mention["vector"])
        if match is None:
            return None
        match = self.post_process(mention["type"], match)
        if match is None:
            return None
        branch = self.branch(match[0])
        return {
            "start": mention["start"],
            "end": mention["end"],
            "text": mention["text"],
            "branch": branch,
            "label": match[1],
            "score": match[2],
            "iri": match[0],
        }
