"""Per-document mention extraction core (mirrors
``EntityExtractor.extract_entities``, app/entity_extraction.py:157-204).

``DocumentExtractor`` holds the per-process state the reference loads as
module-level singletons (spaCy pipeline + sentence-transformer,
app/entity_extraction.py:12-13,152-154): here the Aho-Corasick automaton over
ontology surface forms, compiled regexes, and an embedding cache.  The Ray
actor stage (stages/mention_extractor.py) instantiates ONE of these per actor
(``__init__``), the oracle instantiates one per process — both run the exact
same per-document code path.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..config import ExtractorConfig
from ..functions.automaton import AhoCorasick
from ..functions.embedding import embed_text
from .candidates import all_candidates
from .merge import merge_spans

# process-global: embed_text is a pure text→vector function, so the memo is
# shared across extractor instances and survives Ray's per-execution actor
# re-creation (worker processes are reused within a session)
_EMBED_CACHE: Dict[str, np.ndarray] = {}

# process-global automaton cache: the trie build over ~10^4 surface forms is
# identical for every actor of a pipeline — key by the forms' content hash
_AUTOMATON_CACHE: Dict[int, AhoCorasick] = {}


def _automaton_for(surface_forms) -> AhoCorasick:
    key = hash(tuple(surface_forms))
    auto = _AUTOMATON_CACHE.get(key)
    if auto is None:
        auto = AhoCorasick(surface_forms)
        if len(_AUTOMATON_CACHE) < 8:
            _AUTOMATON_CACHE[key] = auto
    return auto


class DocumentExtractor:
    def __init__(
        self,
        surface_forms: Optional[List[str]] = None,
        cfg: ExtractorConfig = ExtractorConfig(),
        plugins: Optional[List] = None,
    ):
        self.cfg = cfg
        self.automaton = _automaton_for(surface_forms) if surface_forms else None
        self._embed_cache: Dict[str, np.ndarray] = _EMBED_CACHE
        # mention-source plugins: callables text -> [(text, start, end, type)]
        # — the engine's equivalent of the reference's spaCy component hook
        # (@Language.component("combined_extractor"),
        # app/entity_extraction.py:112-147; SURVEY.md §2.10).  Plugin spans
        # join the candidate streams BEFORE the merge, so they obey the same
        # precedence/merge semantics as the built-in sources.
        self.plugins: List = list(plugins or [])

    def register_plugin(self, fn) -> None:
        self.plugins.append(fn)

    def _embed(self, text: str) -> np.ndarray:
        vec = self._embed_cache.get(text)
        if vec is None:
            vec = embed_text(text)
            if len(self._embed_cache) < self.cfg.cache_size:
                self._embed_cache[text] = vec
        return vec

    def extract_spans(self, text: str) -> List:
        """Merged mention spans ``(text, start, end, type)`` WITHOUT context
        windows or embedding vectors — the cheap first pass of the
        distinct-link pipeline (pipelines/kg.py), where vectors are computed
        once per DISTINCT mention text instead of once per occurrence.
        Same candidates + merge as :meth:`extract`, so span parity with the
        fused path is structural."""
        if not text or not text.strip():
            return []
        # plugin spans go FIRST: merge_spans sorts by (start, -end) with a
        # stable tie-break on list position, and the reference gives its NER
        # stream front position (app/entity_extraction.py:146) — plugins are
        # additional first-class sources, so they take that slot too.
        candidates: List = []
        for plugin in self.plugins:
            candidates.extend(plugin(text))
        candidates.extend(
            all_candidates(
                text,
                self.automaton,
                top_keywords=self.cfg.top_keywords,
                max_noun_phrase_tokens=self.cfg.max_noun_phrase_tokens,
            )
        )
        return merge_spans(candidates)

    def extract(self, text: str) -> List[Dict]:
        """Mention records for one document: ``text/start/end/type/source/
        context/confidence/vector``.  Empty or whitespace-only input returns
        ``[]`` (guard, app/entity_extraction.py:160-162)."""
        if not text or not text.strip():
            return []
        merged = self.extract_spans(text)

        mentions: List[Dict] = []
        ctx = self.cfg.context_chars
        n = len(text)
        for m_text, start, end, m_type in merged:
            mentions.append(
                {
                    "text": m_text,
                    "start": start,
                    "end": end,
                    "type": m_type,
                    "source": m_type.split("_")[0],   # app/entity_extraction.py:179
                    "confidence": 1.0,                # :178
                    "context": text[max(0, start - ctx) : min(n, end + ctx)],  # :181-188
                    "vector": self._embed(m_text),
                }
            )
        return mentions
