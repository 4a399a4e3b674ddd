"""Independent re-derivation of candidate generation + span merge.

Round 1's oracle imported ``DocumentExtractor`` from the engine package, so
extraction semantics were self-verified: a bug in
``extraction/candidates.py`` / ``extraction/merge.py`` would appear on both
sides and "P=R=1.0 vs oracle" could not catch it.  This module re-implements
the SAME reference specification (``combined_extractor`` +
``merge_entities``, /root/reference/app/entity_extraction.py:38-147) from
scratch, with deliberately different code structure, importing NOTHING from
``lmss_entity_extractor_ray.extraction`` — only the leaf utilities in
``functions/`` (automaton, tokenizer, stopwords, embedding), which are
pinned by their own unit tests.

Any drift between the two derivations fails:
- the hypothesis test fuzzing ``merge_spans`` vs ``merge`` here;
- the corpus-level mention-set equality test;
- the end-to-end triple P/R gate (oracle/mirror.py now builds on THIS).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

from lmss_entity_extractor_ray.functions.automaton import AhoCorasick
from lmss_entity_extractor_ray.functions.embedding import embed_text
from lmss_entity_extractor_ray.functions.text import (
    KEYWORD_TOKEN_RE,
    STOP_WORDS,
    remove_leading_stop_words,
    word_tokens,
)

Span = Tuple[str, int, int, str]  # (text, start, end, type)

_CAP_START = re.compile(r"[A-Z]")
_ALLCAPS = re.compile(r"[A-Z0-9][A-Z0-9\-]+\Z")


# ---------------------------------------------------------------------------
# candidate streams (reference: app/entity_extraction.py:112-147)
# ---------------------------------------------------------------------------

def gaz_spans(text: str, automaton: Optional[AhoCorasick]) -> List[Span]:
    """Exact surface-form hits, word-boundary aligned, longest per start —
    derived here by sorting all bounded hits by (start, -end) and keeping
    the first hit seen per start offset."""
    if automaton is None:
        return []
    lower = text.lower()
    hits = sorted(automaton.find_word_bounded(lower), key=lambda se: (se[0], -se[1]))
    out: List[Span] = []
    last_start = None
    for s, e in hits:
        if s == last_start:
            continue
        last_start = s
        out.append((text[s:e], s, e, "NER_GAZ"))
    return out


def _adjacent(text: str, prev_end: int, start: int) -> bool:
    return start - prev_end == 1 and text[prev_end:start] == " "


def cap_spans(text: str) -> List[Span]:
    """Maximal single-space-adjacent runs of capitalized tokens; a run
    qualifies with >= 2 tokens, or 1 token that is ALL-CAPS of length >= 2.
    Index-based derivation: find each run's extent, then jump past it."""
    toks = word_tokens(text)
    out: List[Span] = []
    i = 0
    n = len(toks)
    while i < n:
        if not _CAP_START.match(toks[i][0]):
            i += 1
            continue
        j = i
        while (
            j + 1 < n
            and _CAP_START.match(toks[j + 1][0])
            and _adjacent(text, toks[j][2], toks[j + 1][1])
        ):
            j += 1
        if j > i or _ALLCAPS.match(toks[i][0]):
            s, e = toks[i][1], toks[j][2]
            out.append((text[s:e], s, e, "NER_CAP"))
        i = j + 1
    return out


def np_spans(text: str, max_tokens: int = 6) -> List[Span]:
    """Stopword/digit-delimited runs of single-space-adjacent tokens, split
    whenever the run would exceed ``max_tokens``."""
    toks = word_tokens(text)
    out: List[Span] = []
    i = 0
    n = len(toks)
    while i < n:
        tok = toks[i][0]
        if tok.lower() in STOP_WORDS or tok.isdigit():
            i += 1
            continue
        j = i
        while (
            j + 1 < n
            and j - i + 1 < max_tokens
            and toks[j + 1][0].lower() not in STOP_WORDS
            and not toks[j + 1][0].isdigit()
            and _adjacent(text, toks[j][2], toks[j + 1][1])
        ):
            j += 1
        s, e = toks[i][1], toks[j][2]
        out.append((text[s:e], s, e, "NOUN_PHRASE"))
        i = j + 1
    return out


def kw_spans(text: str, top_k: int = 10) -> List[Span]:
    """Top-k tokens by (term frequency desc, token asc) over the lowercased
    doc (\\b\\w\\w+\\b tokens, stopwords/digits excluded), located at every
    occurrence — occurrences ARE the tokenization's match offsets."""
    lower = text.lower()
    occs: Dict[str, List[Tuple[int, int]]] = {}
    for m in KEYWORD_TOKEN_RE.finditer(lower):
        tok = m.group(0)
        if tok in STOP_WORDS or tok.isdigit():
            continue
        occs.setdefault(tok, []).append((m.start(), m.end()))
    top = sorted(occs, key=lambda t: (-len(occs[t]), t))[:top_k]
    return [(t, s, e, "KEYWORD") for t in top for s, e in occs[t]]


def candidates(text: str, automaton: Optional[AhoCorasick], top_k: int = 10,
               max_np_tokens: int = 6) -> List[Span]:
    """Streams concatenated in the reference's order: NER, NP, KEYWORD."""
    return (
        gaz_spans(text, automaton)
        + cap_spans(text)
        + np_spans(text, max_np_tokens)
        + kw_spans(text, top_k)
    )


# ---------------------------------------------------------------------------
# span merge (reference: merge_entities, app/entity_extraction.py:38-109)
# ---------------------------------------------------------------------------

def _resolve_chain(ordered: List[Span], i: int) -> Tuple[Span, int]:
    """Winner of the overlap chain starting at ``ordered[i]`` and the index
    where the next chain begins."""
    winner = ordered[i]
    j = i + 1
    while j < len(ordered):
        nxt = ordered[j]
        touching = nxt[1] <= winner[2] or (
            winner[3] == "NOUN_PHRASE" == nxt[3] and nxt[1] - winner[2] <= 1
        )
        if not touching or winner[3].startswith("NER_"):
            # no overlap, or an NER winner ends the chain WITHOUT eating nxt
            break
        if nxt[3].startswith("NER_"):
            winner = nxt
        elif winner[3] == "NOUN_PHRASE" and nxt[3] == "NOUN_PHRASE":
            winner = (
                (winner[0] + " " + nxt[0]).strip(),
                min(winner[1], nxt[1]),
                max(winner[2], nxt[2]),
                "NOUN_PHRASE",
            )
        elif winner[3] == "KEYWORD" and nxt[3] == "NOUN_PHRASE":
            winner = nxt
        elif winner[3] == "KEYWORD" and nxt[3] == "KEYWORD":
            if len(nxt[0]) > len(winner[0]):
                winner = nxt
        else:
            break
        j += 1
    return winner, j


def merge(cands: List[Span]) -> List[Span]:
    ordered = sorted(cands, key=lambda sp: (sp[1], -sp[2]))
    kept: List[Span] = []
    i = 0
    while i < len(ordered):
        winner, i = _resolve_chain(ordered, i)
        cleaned, shift = remove_leading_stop_words(winner[0])
        winner = (cleaned, winner[1] + shift, winner[2], winner[3])
        contained = any(k[1] <= winner[1] and winner[2] <= k[2] for k in kept)
        if not contained:
            kept.append(winner)
    out: List[Span] = []
    lowered = set()
    for sp in kept:
        if sp[0].lower() in lowered:
            continue
        lowered.add(sp[0].lower())
        out.append(sp)
    return out


# ---------------------------------------------------------------------------
# per-document mention extraction (reference: :157-204)
# ---------------------------------------------------------------------------

class IndependentExtractor:
    def __init__(self, surface_forms: Optional[List[str]] = None,
                 top_k: int = 10, max_np_tokens: int = 6, context_chars: int = 100):
        self.automaton = AhoCorasick(surface_forms) if surface_forms else None
        self.top_k = top_k
        self.max_np_tokens = max_np_tokens
        self.context_chars = context_chars

    def extract(self, text: str) -> List[Dict]:
        if not text or not text.strip():
            return []
        merged = merge(candidates(text, self.automaton, self.top_k, self.max_np_tokens))
        n = len(text)
        c = self.context_chars
        return [
            {
                "text": t,
                "start": s,
                "end": e,
                "type": ty,
                "source": ty.split("_")[0],
                "confidence": 1.0,
                "context": text[max(0, s - c) : min(n, e + c)],
                "vector": embed_text(t),
            }
            for t, s, e, ty in merged
        ]
