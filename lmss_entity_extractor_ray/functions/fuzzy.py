"""Pure-Python fuzzy string ratios (token_set_ratio, partial_ratio).

The reference uses ``fuzzywuzzy.fuzz.token_set_ratio`` in linking
(app/lmss_classification.py:88) and ``token_set_ratio`` + ``partial_ratio``
in search (app/lmss_search.py:95-96).  fuzzywuzzy's algorithms are public
(SeatGeek blog / MIT source); this module re-implements them on
``difflib.SequenceMatcher`` with no dependencies.  Both the Ray pipeline and
the single-process oracle import THIS module, so linking parity is internal
to the repo (SURVEY.md §2.8, §7.0).

All ratios are integers in [0, 100].
"""

from __future__ import annotations

import re
from difflib import SequenceMatcher
from functools import lru_cache

_NON_ALNUM_RE = re.compile(r"[^\w]+", re.UNICODE)


def _ratio_float(a: str, b: str) -> float:
    if not a and not b:
        return 1.0
    return SequenceMatcher(None, a, b).ratio()


def ratio(a: str, b: str) -> int:
    """Simple ratio: 100 * 2M / (len(a)+len(b)), rounded."""
    return int(round(100 * _ratio_float(a, b)))


def partial_ratio(a: str, b: str) -> int:
    """Best ratio of the shorter string against any same-length alignment of
    the longer, using SequenceMatcher matching blocks as alignment anchors."""
    if len(a) <= len(b):
        shorter, longer = a, b
    else:
        shorter, longer = b, a
    if not shorter:
        return 100 if not longer else 0

    m = SequenceMatcher(None, shorter, longer)
    best = 0.0
    for block in m.get_matching_blocks():
        # align the longer string's window so the matched block lines up
        start = max(0, block.b - block.a)
        window = longer[start : start + len(shorter)]
        r = _ratio_float(shorter, window)
        if r > 0.995:
            return 100
        best = max(best, r)
    return int(round(100 * best))


def _tokens(s: str) -> list:
    return [t for t in _NON_ALNUM_RE.split(s.lower()) if t]


def token_sort_ratio(a: str, b: str) -> int:
    """Ratio of the alphabetically re-joined token sequences."""
    return ratio(" ".join(sorted(_tokens(a))), " ".join(sorted(_tokens(b))))


def _ratio_upper_bound(a: str, b: str) -> float:
    """2*min(len)/(len+len) — an upper bound on SequenceMatcher.ratio()
    (matches can't exceed the shorter string's length)."""
    la, lb = len(a), len(b)
    if la + lb == 0:
        return 1.0
    return 2.0 * min(la, lb) / (la + lb)


def token_set_ratio_sets(ta, tb, needed: float = -1.0) -> int:
    """token_set_ratio on pre-tokenized sets.  Identical output to the
    string version (round is monotone, so rounding the float max equals the
    max of rounded ratios); cheap length bounds skip SequenceMatcher calls
    that cannot raise the max.

    ``needed`` (a ratio in [0,1]): when the overall upper bound is STRICTLY
    below it, returns -1 instead of the exact value — callers that only care
    whether the ratio can reach ``needed`` (the linker's pruned scan) treat
    -1 as "provably too small"."""
    inter = ta & tb
    diff_a = ta - tb
    diff_b = tb - ta

    def joined_len(tokens) -> int:
        return sum(len(t) for t in tokens) + max(0, len(tokens) - 1)

    li = joined_len(inter)
    la = li + (joined_len(diff_a) + 1 if diff_a else 0) if inter else joined_len(diff_a)
    lb = li + (joined_len(diff_b) + 1 if diff_b else 0) if inter else joined_len(diff_b)

    def lb_bound(l1: int, l2: int) -> float:
        if l1 + l2 == 0:
            return 1.0
        return 2.0 * min(l1, l2) / (l1 + l2)

    # +0.005 margin: the returned value is round(100*true)/100, which can
    # exceed the true float ratio (and hence the bound) by up to 0.005 —
    # the margin keeps the skip decision exact w.r.t. the ROUNDED value.
    if needed >= 0.0 and max(lb_bound(li, la), lb_bound(li, lb), lb_bound(la, lb)) + 0.005 < needed:
        return -1

    s_inter = " ".join(sorted(inter))
    s_a = (s_inter + " " + " ".join(sorted(diff_a))).strip()
    s_b = (s_inter + " " + " ".join(sorted(diff_b))).strip()

    pairs = ((s_inter, s_a), (s_inter, s_b), (s_a, s_b))
    best = -1.0
    for x, y in sorted(pairs, key=lambda p: -_ratio_upper_bound(*p)):
        if _ratio_upper_bound(x, y) <= best:
            break
        if not x and not y:
            r = 1.0
        else:
            m = SequenceMatcher(None, x, y)
            # difflib's own upper bounds (char-count based) are O(n+m);
            # ratio() is the expensive part — skip it when it can't win
            if m.real_quick_ratio() <= best or m.quick_ratio() <= best:
                continue
            r = m.ratio()
        if r > best:
            best = r
    return int(round(100 * best))


@lru_cache(maxsize=500_000)
def token_set_ratio(a: str, b: str) -> int:
    """Set-partition ratio: split tokens into intersection and the two
    differences; max over the three pairwise combined-string ratios."""
    return token_set_ratio_sets(set(_tokens(a)), set(_tokens(b)))
