"""Mention-candidate generation — the engine's re-specification of the
reference's ``combined_extractor`` spaCy component
(app/entity_extraction.py:112-147), per SURVEY.md §2.2 M5-M7 and §7.0.

The reference produces three candidate streams and concatenates them:
  1. NER spans            → here: gazetteer (Aho-Corasick over ontology
                             surface forms) + capitalized-sequence spans,
                             tagged ``NER_GAZ`` / ``NER_CAP`` (any ``NER_*``
                             tag carries the same merge precedence and
                             ``source = type.split('_')[0] = 'NER'``);
  2. noun-phrase spans    → here: stopword-delimited word-token runs,
                             tagged ``NOUN_PHRASE``;
  3. TF-IDF keyword spans → here: term-frequency top-10 over the single
                             document (idf ≡ 1 for a one-doc corpus — the
                             reference fits TfidfVectorizer on one document,
                             app/entity_extraction.py:128-134), located via
                             word-boundary regex on the lowercased text,
                             tagged ``KEYWORD``.

All functions are pure and deterministic; the Ray actor stage and the
single-process oracle share them, so extraction parity is structural.
Candidate tuples are ``(text, start, end, type)`` like the reference's.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from ..functions.automaton import AhoCorasick
from ..functions.text import KEYWORD_TOKEN_RE, STOP_WORDS, word_tokens

Span = Tuple[str, int, int, str]

_CAP_RE = re.compile(r"^[A-Z]")
_ALLCAPS_RE = re.compile(r"^[A-Z0-9][A-Z0-9\-]+$")


def gazetteer_spans(text: str, automaton: Optional[AhoCorasick]) -> List[Span]:
    """Exact ontology-surface-form occurrences (case-insensitive,
    word-boundary-aligned), longest-at-each-start only."""
    if automaton is None:
        return []
    lower = text.lower()
    best_at: dict = {}
    for start, end in automaton.find_word_bounded(lower):
        cur = best_at.get(start)
        if cur is None or end > cur:
            best_at[start] = end
    return [
        (text[s:e], s, e, "NER_GAZ") for s, e in sorted(best_at.items())
    ]


def capitalized_spans(text: str, toks=None) -> List[Span]:
    """Maximal runs of space-adjacent capitalized word tokens: runs of >= 2
    capitalized words, or a single all-caps token of length >= 2."""
    if toks is None:
        toks = word_tokens(text)
    out: List[Span] = []
    run: List[Tuple[str, int, int]] = []

    def flush():
        if not run:
            return
        if len(run) >= 2 or _ALLCAPS_RE.match(run[0][0]):
            s, e = run[0][1], run[-1][2]
            out.append((text[s:e], s, e, "NER_CAP"))

    for tok, s, e in toks:
        is_cap = bool(_CAP_RE.match(tok))
        adjacent = bool(run) and s - run[-1][2] == 1 and text[run[-1][2]:s] == " "
        if is_cap and (not run or adjacent):
            run.append((tok, s, e))
        else:
            flush()
            run = [(tok, s, e)] if is_cap else []
    flush()
    return out


def noun_phrase_spans(text: str, max_tokens: int = 6, toks=None) -> List[Span]:
    """Stopword-delimited token runs: consecutive word tokens separated only
    by single spaces, split at stopwords; runs capped at ``max_tokens``.
    (Re-spec of spaCy noun_chunks with the root-is-stop skip,
    app/entity_extraction.py:120-125.)"""
    if toks is None:
        toks = word_tokens(text)
    out: List[Span] = []
    run: List[Tuple[str, int, int]] = []

    def flush():
        if run:
            s, e = run[0][1], run[-1][2]
            out.append((text[s:e], s, e, "NOUN_PHRASE"))

    for tok, s, e in toks:
        if tok.lower() in STOP_WORDS or tok.isdigit():
            flush()
            run = []
            continue
        adjacent = bool(run) and s - run[-1][2] == 1 and text[run[-1][2]:s] == " "
        if run and (not adjacent or len(run) >= max_tokens):
            flush()
            run = []
        run.append((tok, s, e))
    flush()
    return out


def keyword_spans(text: str, top_k: int = 10) -> List[Span]:
    """Term-frequency top-k keywords over the lowercased document (ties break
    alphabetically), each located at every word-boundary occurrence in the
    lowercased text (mirrors app/entity_extraction.py:127-143).

    Single pass: one tokenizing scan collects both frequencies and offsets —
    keywords come from the same ``\\b\\w\\w+\\b`` tokenization, so a token's
    occurrence positions ARE its word-boundary match positions (no
    per-keyword re-scan of the document)."""
    lower = text.lower()
    positions: dict = {}
    for m in KEYWORD_TOKEN_RE.finditer(lower):
        t = m.group(0)
        if t in STOP_WORDS or t.isdigit():
            continue
        positions.setdefault(t, []).append((m.start(), m.end()))
    if not positions:
        return []
    ranked = sorted(positions.items(), key=lambda kv: (-len(kv[1]), kv[0]))[:top_k]
    out: List[Span] = []
    for kw, occs in ranked:
        for s, e in occs:
            out.append((kw, s, e, "KEYWORD"))
    return out


def all_candidates(
    text: str,
    automaton: Optional[AhoCorasick],
    top_keywords: int = 10,
    max_noun_phrase_tokens: int = 6,
) -> List[Span]:
    """Concatenated candidate streams in the reference's order
    (NER + noun phrases + keywords, app/entity_extraction.py:146).
    Word tokens are computed once and shared by both chunkers."""
    toks = word_tokens(text)
    ner = gazetteer_spans(text, automaton) + capitalized_spans(text, toks)
    nps = noun_phrase_spans(text, max_noun_phrase_tokens, toks)
    kws = keyword_spans(text, top_keywords)
    return ner + nps + kws
