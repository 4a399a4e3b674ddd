"""Fused corpus→triples actor stage: text-resolve + mention extraction +
linking + per-url dedup in ONE ``map_batches`` actor pool.

Why fused (measured on the 200k-doc bench corpus): the split pipeline ships
~2.7 GB of per-mention embedding vectors (fixed_size_list<float32,256>)
through the object store from the extractor pool to the linker pool and pays
two actor-pool ramp-ups; the vectors are consumed exactly once, immediately.
Fusing keeps them in-process (numpy, never serialized), halves the actor
count, and removes the inter-pool backpressure seam.  The unfused stages
(mention_extractor.py, linker.py) remain the modular/debuggable path and
feed the mention-level queries.

Dedup exactness: batches are whole doc-aligned blocks, so all mentions of a
url are linked together and the per-batch (subj, pred, obj) keep-best dedup
is globally exact under the corpus contract that urls are unique
(SURVEY.md §4.3).
"""

from __future__ import annotations

from typing import Dict, Tuple

import pyarrow as pa
import pyarrow.compute as pc

from ..config import EngineConfig, DEFAULT_CONFIG
from ..extraction.extractor import DocumentExtractor
from ..functions.text import resolve_text
from ..linking.core import LinkerCore, make_pred
from .linker import TRIPLE_SCHEMA, triples_to_table


def _resolve(ref_or_value):
    try:
        import ray

        if isinstance(ref_or_value, ray.ObjectRef):
            return ray.get(ref_or_value)
    except ImportError:
        pass
    return ref_or_value


# Process-global stage cache for the TASK-based execution path.  Ray actor
# processes die when their pool is torn down, so per-actor state (and any
# module globals inside an actor process) is lost between Dataset
# executions; plain-task worker processes are REUSED for the whole session.
# Running the fused stage as tasks with a per-process KGStage keyed by
# (ontology sha, config) keeps the automaton, the linker's bound index and
# the mention-link memo warm across blocks AND executions — on repeated /
# long-lived jobs this removes the duplicated per-actor cold phase that
# cost ~25 scaling-efficiency points at 16 CPUs.
_STAGE_CACHE: Dict[tuple, "KGStage"] = {}


MENTION_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("mtext", pa.string()),
        ("mtype", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
    ]
)

# extract-only per-process cache (distinct-link pipeline first pass): just
# the automaton + merge machinery, no linker matrices
_EXTRACTOR_CACHE: Dict[tuple, object] = {}


def _extractor_for(art, cfg: EngineConfig):
    key = (getattr(art, "owl_sha256", "") or str(id(art)), cfg.extractor)
    ex = _EXTRACTOR_CACHE.get(key)
    if ex is None:
        ex = DocumentExtractor(
            art.gazetteer_surface_forms(cfg.extractor.min_gazetteer_label_chars),
            cfg.extractor,
        )
        if len(_EXTRACTOR_CACHE) < 4:
            _EXTRACTOR_CACHE[key] = ex
    return ex


def mention_extract_task(
    batch: pa.Table, artifacts_ref=None, cfg: EngineConfig = DEFAULT_CONFIG
) -> pa.Table:
    """First pass of the distinct-link pipeline: doc block → mention-span
    rows (url, mtext, mtype, start, end), NO vectors — embeddings are
    computed once per DISTINCT text downstream, not once per occurrence.
    Rows stay in doc order, so a block's mentions remain doc-aligned for the
    exact per-url keep-best in the second pass."""
    art = _resolve(artifacts_ref)
    ex = _extractor_for(art, cfg)
    urls = batch.column("url").to_pylist()
    texts = batch.column("text").to_pylist()
    htmls = (
        batch.column("html").to_pylist()
        if "html" in batch.column_names
        else [None] * len(urls)
    )
    out_url, out_text, out_type, out_s, out_e = [], [], [], [], []
    for url, text, html in zip(urls, texts, htmls):
        for m_text, s, e, m_type in ex.extract_spans(resolve_text(text, html)):
            out_url.append(url)
            out_text.append(m_text)
            out_type.append(m_type)
            out_s.append(s)
            out_e.append(e)
    return pa.table(
        {
            "url": pa.array(out_url, pa.string()),
            "mtext": pa.array(out_text, pa.string()),
            "mtype": pa.array(out_type, pa.string()),
            "start": pa.array(out_s, pa.int32()),
            "end": pa.array(out_e, pa.int32()),
        }
    )


MATCH_SCHEMA = pa.schema(
    [
        ("mtext", pa.string()),
        ("obj", pa.string()),
        ("label", pa.string()),
        ("score", pa.float32()),
        ("branch", pa.string()),
        ("pred", pa.string()),
    ]
)

# per-process linker cache for the distinct-link stage (no extractor needed)
_LINKER_CACHE: Dict[tuple, LinkerCore] = {}


def _linker_for(art, cfg: EngineConfig) -> LinkerCore:
    key = (getattr(art, "owl_sha256", "") or str(id(art)), cfg.linker)
    lk = _LINKER_CACHE.get(key)
    if lk is None:
        lk = LinkerCore(art, cfg.linker)
        if len(_LINKER_CACHE) < 4:
            _LINKER_CACHE[key] = lk
    return lk


def link_distinct_task(
    group: pa.Table, artifacts_ref=None, cfg: EngineConfig = DEFAULT_CONFIG
) -> pa.Table:
    """Link every DISTINCT mention text in one hash partition exactly once.
    Emits matched texts only — misses produce no triples, so they never
    need to travel.  match_fast + embed_text are the same kernels the fused
    path uses, so scores are bit-identical."""
    from ..functions.embedding import embed_text

    art = _resolve(artifacts_ref)
    linker = _linker_for(art, cfg)
    texts = pc.unique(group.column("mtext")).to_pylist()
    m_out, o_out, l_out, s_out, b_out, p_out = [], [], [], [], [], []
    for t in texts:
        match = linker.match_fast(t, embed_text(t))
        if match is None:
            continue
        iri, label, score = match
        branch = linker.branch(iri)
        m_out.append(t)
        o_out.append(iri)
        l_out.append(label)
        s_out.append(score)
        b_out.append(branch)
        p_out.append(make_pred(branch))
    return pa.table(
        {
            "mtext": pa.array(m_out, pa.string()),
            "obj": pa.array(o_out, pa.string()),
            "label": pa.array(l_out, pa.string()),
            "score": pa.array(s_out, pa.float32()),
            "branch": pa.array(b_out, pa.string()),
            "pred": pa.array(p_out, pa.string()),
        }
    )


# per-process decoded broadcast vocab: ONE combined Arrow table (zero Python
# objects), keyed by the ObjectRefs so a new vocab (new corpus) re-decodes
_VOCAB_CACHE: Dict[tuple, pa.Table] = {}


def _vocab_for(matched_ref) -> pa.Table:
    """Assemble the broadcast matched-vocab blocks into one combined Arrow
    table, once per worker process.

    ``matched_ref`` is either a list of block ObjectRefs (the distinct-link
    pipeline hands the object-store blocks straight through — the driver
    never concatenates them) or a single ref / table.  Empty shuffle
    partitions arrive as schema-less zero-column blocks (Ray internals) —
    skipped.  Kept as Arrow (not a Python dict): decoding ~10⁵ entries into
    Python objects cost 4-7 s per process under 16-way memory contention —
    per-process duplicated cold work that measurably capped scaling."""

    def _hex(r):
        return r.hex() if hasattr(r, "hex") else str(id(r))

    refs = matched_ref if isinstance(matched_ref, list) else [matched_ref]
    key = tuple(_hex(r) for r in refs)
    vocab = _VOCAB_CACHE.get(key)
    if vocab is None:
        import ray

        tables = ray.get([r for r in refs if hasattr(r, "hex")]) + [
            r for r in refs if not hasattr(r, "hex")
        ]
        tables = [
            t for t in tables if t.num_rows > 0 and "mtext" in t.column_names
        ]
        if not tables:
            vocab = MATCH_SCHEMA.empty_table()
        elif len(tables) == 1:
            # pre-combined broadcast object (pipelines/kg._combine_vocab):
            # use the plasma-backed table as-is — zero-copy, no heap clone
            vocab = tables[0]
        else:
            vocab = pa.concat_tables(tables).combine_chunks()
        _VOCAB_CACHE.clear()  # one vocab per session is the common case
        _VOCAB_CACHE[key] = vocab
    return vocab


def link_lookup_task(
    batch: pa.Table, matched_ref=None, cfg: EngineConfig = DEFAULT_CONFIG
) -> pa.Table:
    """Second pass of the distinct-link pipeline: mention rows → triples via
    a broadcast {distinct text → match} lookup.  Replicates the fused
    stage's post_process + per-(url, pred, obj) keep-best exactly.

    Fully vectorized — Arrow C++ hash lookup (``index_in``) + ``take`` + the
    sort/first-of-run keep-best; the earlier per-row Python loop cost
    ~15-19 µs/row and tripled under 16-way memory contention, flattening the
    scaling curve."""
    vocab = _vocab_for(matched_ref)
    if batch.num_rows == 0 or vocab.num_rows == 0:
        return TRIPLE_SCHEMA.empty_table()

    idx = pc.index_in(batch.column("mtext"), value_set=vocab.column("mtext"))
    hit = pc.is_valid(idx)
    b = batch.filter(hit)
    ridx = pc.filter(idx, hit)
    if isinstance(ridx, pa.ChunkedArray):
        ridx = ridx.combine_chunks()
    score = vocab.column("score").take(ridx)
    # post_process (linking/core.py:286-295) inlined: the Location
    # early-return changes nothing (the fallthrough also passes), so only
    # the VERB rule filters
    keep = pc.invert(
        pc.and_(pc.equal(b.column("mtype"), "VERB"), pc.less(score, 0.7))
    )
    b = b.filter(keep)
    ridx = pc.filter(ridx, keep)
    if isinstance(ridx, pa.ChunkedArray):
        ridx = ridx.combine_chunks()

    t = pa.table(
        {
            "subj": b.column("url"),
            "pred": vocab.column("pred").take(ridx),
            "obj": vocab.column("obj").take(ridx),
            "branch": vocab.column("branch").take(ridx),
            "label": vocab.column("label").take(ridx),
            "score": vocab.column("score").take(ridx),
            "start": b.column("start"),
            "end": b.column("end"),
            "text": b.column("mtext"),
        }
    ).cast(TRIPLE_SCHEMA)
    # exact per-(subj, pred, obj) keep-best (score desc, start asc) — the
    # same vectorized first-of-run pass the dedup backstop uses
    from ..pipelines.kg import _block_keep_best

    return _block_keep_best(t)


def kg_stage_task(batch: pa.Table, artifacts_ref=None, cfg: EngineConfig = DEFAULT_CONFIG) -> pa.Table:
    art = _resolve(artifacts_ref)
    key = (getattr(art, "owl_sha256", "") or str(id(art)), cfg)
    stage = _STAGE_CACHE.get(key)
    if stage is None:
        stage = KGStage(art, cfg)
        if len(_STAGE_CACHE) < 4:
            _STAGE_CACHE[key] = stage
    return stage(batch)


class KGStage:
    """__init__ once per actor: automaton + embedder cache + class matrix +
    branch closure (reference singletons A1-A3, SURVEY.md §2.3)."""

    def __init__(self, artifacts=None, cfg: EngineConfig = DEFAULT_CONFIG):
        art = _resolve(artifacts)
        self.extractor = DocumentExtractor(
            art.gazetteer_surface_forms(cfg.extractor.min_gazetteer_label_chars),
            cfg.extractor,
        )
        self.linker = LinkerCore(art, cfg.linker)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        htmls = (
            batch.column("html").to_pylist()
            if "html" in batch.column_names
            else [None] * len(urls)
        )

        best: Dict[Tuple[str, str, str], dict] = {}
        extract = self.extractor.extract
        linker = self.linker
        for url, text, html in zip(urls, texts, htmls):
            for m in extract(resolve_text(text, html)):
                match = linker.match_fast(m["text"], m["vector"])
                if match is None:
                    continue
                match = linker.post_process(m["type"], match)
                if match is None:
                    continue
                iri, label, score = match
                branch = linker.branch(iri)
                key = (url, make_pred(branch), iri)
                cur = best.get(key)
                if (
                    cur is None
                    or score > cur["score"]
                    or (score == cur["score"] and m["start"] < cur["start"])
                ):
                    best[key] = {
                        "subj": key[0],
                        "pred": key[1],
                        "obj": key[2],
                        "branch": branch,
                        "label": label,
                        "score": score,
                        "start": m["start"],
                        "end": m["end"],
                        "text": m["text"],
                    }
        return triples_to_table(list(best.values()))
