"""Engine configuration.

All tunables the reference exposes as constructor params / constants
(reference: app/lmss_classification.py:15-29, app/lmss_search.py:99,
app/main.py:103-109, app/run_classifier.py:33-39) plus the Ray-side knobs
(batch sizes, actor-pool sizes, shard counts) that the reference — a
single-process app — never needed.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# Dimensionality of the deterministic hashed n-gram embedding (stand-in for
# the 384-d all-MiniLM-L6-v2 vectors of the reference, app/lmss_parser.py:20;
# see SURVEY.md §7.0 on why a deterministic embedder defines correctness here).
EMBED_DIM = 256

# Predicate namespace for emitted triples (reference uses
# http://lmss.sali.org/ as its LMSS namespace, app/lmss_classification.py:30).
LMSS_NS = "http://lmss.sali.org/"

# Label-substring exclusion filter (reference: app/lmss_parser.py:21).
EXCLUDED_LABEL_PREFIXES = ("ZZZ - SANDBOX: UNDER CONSTRUCTION",)


@dataclass(frozen=True)
class LinkerConfig:
    """Mention→class linking thresholds (reference: app/lmss_classification.py:15-29).

    The API uses (0.7, 0.9) (app/main.py:103-109); the CLI uses (0.3, 0.9)
    (app/run_classifier.py:33-39); the class default is (0.65, 0.9).
    """

    similarity_threshold: float = 0.65
    high_confidence_threshold: float = 0.9
    # Linker-side result cache (mention text -> match); linking is a pure
    # function of the mention text, and web-corpus mention texts are Zipfian.
    # Entries are ~150 B, the dict is process-global (shared across actors
    # of one worker process), so 1M entries ≈ 150 MB/process.
    cache_size: int = 1_000_000


@dataclass(frozen=True)
class SearchConfig:
    """Scored ontology search weights (reference: app/lmss_search.py:99)."""

    regex_weight: float = 0.3
    fuzzy_weight: float = 0.3
    vector_weight: float = 0.4
    top_k: int = 10


@dataclass(frozen=True)
class ExtractorConfig:
    """Mention candidate generation knobs (reference: app/entity_extraction.py)."""

    top_keywords: int = 10          # TF-IDF top-10 (app/entity_extraction.py:134)
    context_chars: int = 100        # ±100-char context window (:181-188)
    max_noun_phrase_tokens: int = 6
    min_gazetteer_label_chars: int = 3
    cache_size: int = 200_000


@dataclass(frozen=True)
class RunConfig:
    """Ray-side execution knobs for the KG pipeline."""

    batch_size_docs: int = 128        # docs per extractor batch
    batch_size_mentions: int = 4096   # mention rows per linker batch
    # Actor-pool (min, max); None = derive from the cluster at pipeline build
    # (min stays 1 so the pools can never starve read/shuffle tasks of CPUs —
    # a min-actors total >= cluster CPUs deadlocks the streaming executor).
    extractor_concurrency: tuple | None = None
    linker_concurrency: tuple | None = None
    num_shards: int = 8               # checkpoint granularity (resume unit)
    # KG execution plan: "distinct" (link each distinct mention text once
    # globally — the scale default; see pipelines/kg.py), "fused" (single
    # task stage with per-process memos — lowest fixed cost for small
    # corpora), or "modular" (two actor pools — the debuggable path).
    link_mode: str = "distinct"
    salt_buckets: int = 16            # salting for skewed per-class aggregates
    # The Linker's in-batch dedup is globally exact because linker batches
    # are whole doc-aligned blocks and urls are unique (pipelines/kg.py);
    # the groupby(subj,pred,obj) backstop is a validation pass — keep it off
    # the hot path and run it in tests / the dedup-audit query.
    global_dedup: bool = False


@dataclass(frozen=True)
class EngineConfig:
    linker: LinkerConfig = field(default_factory=LinkerConfig)
    search: SearchConfig = field(default_factory=SearchConfig)
    extractor: ExtractorConfig = field(default_factory=ExtractorConfig)
    run: RunConfig = field(default_factory=RunConfig)


DEFAULT_CONFIG = EngineConfig()
