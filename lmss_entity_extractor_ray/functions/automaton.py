"""Aho-Corasick multi-pattern string automaton.

The exact-label candidate source required by the north star: every ontology
surface form (``rdfs_label`` ∪ ``skos_prefLabel`` ∪ ``skos_altLabel``) is
inserted lowercased; ``find`` scans a document once and yields every
word-boundary-aligned occurrence.  Built once per extractor actor
(``__init__``), reused for every batch (SURVEY.md §2.3 A1).

Classic textbook construction (Aho & Corasick, CACM 1975): goto trie +
BFS failure links + merged output sets.
"""

from __future__ import annotations

from collections import deque
from typing import Iterable, Iterator, List, Tuple


class AhoCorasick:
    __slots__ = ("_goto", "_fail", "_out")

    def __init__(self, patterns: Iterable[str]):
        # node 0 is the root; _goto is a list of dicts char -> node
        self._goto: List[dict] = [{}]
        self._out: List[List[int]] = [[]]  # pattern lengths ending at node
        for pat in patterns:
            if not pat:
                continue
            node = 0
            for ch in pat:
                nxt = self._goto[node].get(ch)
                if nxt is None:
                    self._goto.append({})
                    self._out.append([])
                    nxt = len(self._goto) - 1
                    self._goto[node][ch] = nxt
                node = nxt
            self._out[node].append(len(pat))

        self._fail = [0] * len(self._goto)
        queue = deque()
        for child in self._goto[0].values():
            queue.append(child)
        while queue:
            node = queue.popleft()
            for ch, child in self._goto[node].items():
                queue.append(child)
                f = self._fail[node]
                while f and ch not in self._goto[f]:
                    f = self._fail[f]
                self._fail[child] = self._goto[f].get(ch, 0)
                if self._fail[child] == child:
                    self._fail[child] = 0
                self._out[child] = self._out[child] + self._out[self._fail[child]]

    def find(self, text: str) -> Iterator[Tuple[int, int]]:
        """Yield (start, end) character spans of every pattern occurrence."""
        node = 0
        goto = self._goto
        fail = self._fail
        out = self._out
        for i, ch in enumerate(text):
            while node and ch not in goto[node]:
                node = fail[node]
            node = goto[node].get(ch, 0)
            if out[node]:
                end = i + 1
                for length in out[node]:
                    yield end - length, end

    def find_word_bounded(self, text: str) -> Iterator[Tuple[int, int]]:
        """Occurrences whose span edges fall on ``\\b``-style word boundaries
        (mirrors the reference's boundary-anchored keyword regex,
        app/entity_extraction.py:136-140)."""
        n = len(text)
        for start, end in self.find(text):
            if start > 0 and _is_word(text[start - 1]) and _is_word(text[start]):
                continue
            if end < n and _is_word(text[end - 1]) and _is_word(text[end]):
                continue
            yield start, end


def _is_word(ch: str) -> bool:
    return ch.isalnum() or ch == "_"
