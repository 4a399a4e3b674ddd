"""Text primitives shared by the Ray stages and the single-process oracle.

Frozen English stopword list (stand-in for spaCy's
``nlp.Defaults.stop_words``, reference app/entity_extraction.py:12-13 — the
engine snapshots its own list as data, SURVEY.md §2.2 M4), tokenizers with
byte offsets, the deterministic html→text extractor, and the
leading-stopword strip (reference app/entity_extraction.py:28-35).
"""

from __future__ import annotations

import re
from typing import List, Tuple

# Compact frozen English stopword list (public-domain words; own snapshot).
STOP_WORDS = frozenset(
    """
a about above after again against all am an and any are as at be because been
before being below between both but by can could did do does doing down during
each few for from further had has have having he her here hers herself him
himself his how i if in into is it its itself just me more most my myself no
nor not now of off on once only or other our ours ourselves out over own s
same she should so some such t than that the their theirs them themselves then
there these they this those through to too under until up very was we were
what when where which while who whom why will with you your yours yourself
yourselves
""".split()
)

# Word tokens: letter/digit runs with internal apostrophes/hyphens.
WORD_RE = re.compile(r"[A-Za-z0-9](?:[A-Za-z0-9'\-]*[A-Za-z0-9])?")

# Keyword tokens: >=2 word chars (mirrors sklearn's default token_pattern
# r"(?u)\b\w\w+\b" used by TfidfVectorizer, reference
# app/entity_extraction.py:128).
KEYWORD_TOKEN_RE = re.compile(r"\b\w\w+\b", re.UNICODE)

_TAG_RE = re.compile(rb"<[^>]*>")
_SCRIPT_RE = re.compile(rb"<(script|style)\b.*?</\1>", re.IGNORECASE | re.DOTALL)
_WS_RE = re.compile(r"\s+")


def word_tokens(text: str) -> List[Tuple[str, int, int]]:
    """(token, start, end) word tokens with character offsets."""
    return [(m.group(0), m.start(), m.end()) for m in WORD_RE.finditer(text)]


def html_to_text(html: bytes) -> str:
    """Deterministic html→text: drop script/style, strip tags, collapse
    whitespace.  Used only when the corpus row's ``text`` column is null; the
    byte-identical-per-url invariant (BASELINE.json input_hint) holds because
    this is a pure function of the html bytes."""
    if html is None:
        return ""
    stripped = _SCRIPT_RE.sub(b" ", html)
    stripped = _TAG_RE.sub(b" ", stripped)
    try:
        s = stripped.decode("utf-8")
    except UnicodeDecodeError:
        s = stripped.decode("utf-8", errors="replace")
    return _WS_RE.sub(" ", s).strip()


def resolve_text(text, html) -> str:
    """Authoritative per-url text: the ``text`` column verbatim when present
    (byte-identical invariant — never normalized), else the deterministic
    html→text extraction (SURVEY.md §2.1 S5, §7.4.4)."""
    if text is not None:
        return text
    return html_to_text(html)


def remove_leading_stop_words(text: str) -> Tuple[str, int]:
    """Strip leading stopwords from a whitespace-split span text, returning
    the cleaned text and the character offset consumed (+1 per space), exactly
    as the reference does (app/entity_extraction.py:28-35): if every word is
    a stopword, return the original text with offset 0."""
    words = text.split()
    offset = 0
    for i, word in enumerate(words):
        if word.lower() not in STOP_WORDS:
            return " ".join(words[i:]), offset
        offset += len(word) + 1
    return text, 0
