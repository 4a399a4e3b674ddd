"""Span merge / conflict resolution — the most intricate algorithm in the
reference (``merge_entities``, app/entity_extraction.py:38-109), re-specified
exactly (SURVEY.md §2.2 M8 and the merge-semantics notes in §2.10):

- candidates sorted by ``(start, -end)``;
- a cursor chain walks overlapping candidates:
  * overlap test: ``next.start <= current.end``, plus gap<=1 adjacency when
    both spans are ``NOUN_PHRASE`` (app/entity_extraction.py:56-58);
  * a ``NER_*`` current always survives and breaks the chain WITHOUT
    consuming the overlapping next span (:60-62 — the next span starts its
    own chain);
  * a ``NER_*`` next replaces the current (:63-65);
  * NP+NP merge into one concatenated span (:66-73);
  * a KEYWORD current is replaced by an overlapping NP, or by a strictly
    longer KEYWORD (:74-82); the overlapping span is consumed either way;
  * any other combination breaks the chain (:83-84);
- leading stopwords are stripped from the winner, shifting ``start`` (:92-94);
- the winner is dropped if its span is contained in any ALREADY-ACCEPTED span
  (:96-98 — acceptance order matters);
- finally, case-insensitive text dedup keeps the first occurrence (:101-109).

Pure function shared by the Ray extractor stage and the oracle.
"""

from __future__ import annotations

from typing import List, Tuple

from ..functions.text import remove_leading_stop_words

Span = Tuple[str, int, int, str]


def merge_spans(candidates: List[Span]) -> List[Span]:
    ordered = sorted(candidates, key=lambda sp: (sp[1], -sp[2]))
    accepted: List[Span] = []
    i = 0
    n = len(ordered)
    while i < n:
        current = ordered[i]
        j = i + 1
        while j < n:
            nxt = ordered[j]
            overlaps = nxt[1] <= current[2] or (
                nxt[1] - current[2] <= 1
                and current[3] == nxt[3] == "NOUN_PHRASE"
            )
            if not overlaps:
                break
            if current[3].startswith("NER_"):
                # NER wins and the chain ends here; nxt is NOT consumed — it
                # will seed the next chain (i = j below).
                break
            if nxt[3].startswith("NER_"):
                current = nxt
            elif current[3] == "NOUN_PHRASE" and nxt[3] == "NOUN_PHRASE":
                current = (
                    f"{current[0]} {nxt[0]}".strip(),
                    min(current[1], nxt[1]),
                    max(current[2], nxt[2]),
                    "NOUN_PHRASE",
                )
            elif current[3] == "KEYWORD" and nxt[3] in ("NOUN_PHRASE", "KEYWORD"):
                if nxt[3] == "NOUN_PHRASE" or len(nxt[0]) > len(current[0]):
                    current = nxt
            else:
                break
            j += 1

        cleaned, offset = remove_leading_stop_words(current[0])
        current = (cleaned, current[1] + offset, current[2], current[3])

        if not any(a[1] <= current[1] and a[2] >= current[2] for a in accepted):
            accepted.append(current)
        i = j

    seen = set()
    deduped: List[Span] = []
    for span in accepted:
        key = span[0].lower()
        if key not in seen:
            deduped.append(span)
            seen.add(key)
    return deduped
