"""KG-construction pipeline composition (SURVEY.md §3.2 "new engine"):

    read_parquet(corpus)                       # url, warc_ts, html, text, lang
      → map_batches(extract_text)              # drop html immediately
      → map_batches(MentionExtractor, actors)  # automaton + embedder state
      → map_batches(Linker, actors)            # class matrix + closure state
      → in-batch dedup (inside Linker)
      → groupby(subj, pred, obj) global-dedup backstop
      → write_parquet / aggregates

Ray is NEVER initialised here — callers (driver, bench, tests) own the
session.  All functions return lazy Datasets; nothing materializes the full
input.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..config import EngineConfig, DEFAULT_CONFIG
from ..ontology.artifacts import OntologyArtifacts
from ..stages.linker import Linker
from ..stages.mention_extractor import MentionExtractor
from ..stages.text_extract import extract_text_batch


def read_corpus(paths, parallelism: Optional[int] = None) -> rd.Dataset:
    """Column-pruned corpus read: only url/html/text leave storage (warc_ts
    and lang are provenance the KG pipeline never touches — SURVEY.md §1.2)."""
    kwargs = {}
    if parallelism:
        kwargs["override_num_blocks"] = parallelism
    return rd.read_parquet(paths, columns=["url", "html", "text"], **kwargs)


def _cluster_cpus() -> int:
    try:
        return int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        return 4


def _pool(cfg_value, frac: float, min_frac: float = 0.0) -> tuple:
    """Actor-pool (min, max) sizing.

    Deadlock rule: the SUM of pool mins in one pipeline must stay below the
    cluster CPUs or the streaming executor starves read/shuffle tasks and
    hangs silently.  The modular two-pool path therefore uses min=1
    (min_frac=0); the fused single-pool path uses a high min (measured: the
    default autoscaler ramps far too slowly — a (1,28) pool ran ~6.5-way
    parallel on 32 CPUs; (28,28) ran 2.5x faster)."""
    if cfg_value is not None:
        return cfg_value
    cpus = _cluster_cpus()
    hi = max(2, int(cpus * frac))
    lo = max(1, min(int(cpus * min_frac), hi, cpus - 1))
    return (lo, hi)


def broadcast_artifacts(artifacts: OntologyArtifacts, cfg: EngineConfig = DEFAULT_CONFIG):
    """``ray.put`` the two broadcast payloads ONCE: the gazetteer surface
    forms (extractor) and the full artifacts (linker).  Every actor gets the
    object-store ref, not a per-task copy."""
    forms = artifacts.gazetteer_surface_forms(cfg.extractor.min_gazetteer_label_chars)
    return ray.put(forms), ray.put(artifacts)


def mentions_dataset(
    corpus_ds: rd.Dataset,
    forms_ref,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> rd.Dataset:
    ds = corpus_ds.map_batches(
        extract_text_batch,
        batch_format="pyarrow",
        batch_size=cfg.run.batch_size_docs,
        zero_copy_batch=True,
    )
    return ds.map_batches(
        MentionExtractor,
        fn_constructor_kwargs={"surface_forms": forms_ref, "cfg": cfg.extractor},
        batch_format="pyarrow",
        batch_size=cfg.run.batch_size_docs,
        concurrency=_pool(cfg.run.extractor_concurrency, 0.75),
        num_cpus=1,
    )


@ray.remote(num_cpus=1)
def _combine_vocab(*tables: pa.Table) -> pa.Table:
    """Concat the matched-vocab shuffle blocks into ONE combined table on a
    worker (never the driver).  Ray resolves the block refs in-place, the
    result is a single contiguous object every lookup process maps zero-copy
    from the object store.  Empty shuffle partitions arrive as schema-less
    zero-column blocks (Ray internals) — skipped."""
    from ..stages.kg_stage import MATCH_SCHEMA

    ts = [t for t in tables if t.num_rows > 0 and "mtext" in t.column_names]
    return (
        pa.concat_tables(ts).combine_chunks() if ts else MATCH_SCHEMA.empty_table()
    )


def triples_dataset_distinct(
    corpus_ds: rd.Dataset,
    artifacts: OntologyArtifacts,
    cfg: EngineConfig = DEFAULT_CONFIG,
    global_dedup: Optional[bool] = None,
    oracle_dump_dir: Optional[str] = None,
) -> rd.Dataset:
    """Distinct-link KG pipeline — the flagship scale path.

    Linking is a pure function of the mention TEXT, so link each distinct
    text exactly ONCE globally instead of once per (worker process × text):
    with per-process memo caches (the fused path), total cold-link work
    grows with worker count — measured on the 2M-doc scaling corpus at 5k
    classes: 4 workers paid 629k cold links, 16 workers 1.12M for the same
    input, capping scaling efficiency at ~0.70.  Here cold work is
    O(global distinct texts) (~350k on that corpus) at ANY parallelism.

    Stages:
      1. doc blocks → mention-span rows (no vectors), materialized —
         the mention table is ~1-2% of corpus bytes and is the pivot both
         later stages read; callers that shard (pipelines/runner.py) bound
         it per shard, which is the resume unit at petabyte scale;
      2. per-block distinct texts → ONE hash exchange on text →
         link each distinct text once per partition (match_fast, same
         kernels as the fused path → bit-identical scores);
      3. matched vocabulary (texts that link — bounded by the
         ontology-derived surface vocabulary, NOT corpus size) broadcast
         via ray.put → doc-aligned second pass over the mention table:
         dict lookup + post_process + exact per-(url, pred, obj) keep-best.
    """
    import functools
    import os
    import time

    from ..stages.kg_stage import (
        link_distinct_task,
        link_lookup_task,
        mention_extract_task,
    )

    _phases = bool(os.environ.get("KG_PHASES"))
    _t0 = time.perf_counter()

    artifacts_ref = ray.put(artifacts)
    mentions = corpus_ds.map_batches(
        functools.partial(mention_extract_task, artifacts_ref=artifacts_ref, cfg=cfg),
        batch_format="pyarrow",
        batch_size=None,  # whole doc-aligned blocks
        num_cpus=1,
    ).materialize()
    if _phases:
        print(f"[kg-phase] extract+materialize {time.perf_counter() - _t0:.2f}s")
        _t0 = time.perf_counter()

    # Many small partitions, not one per CPU: a partition's links run as a
    # serial Python loop inside one map_groups task, and Ray packs multiple
    # groups per output block — with nparts == CPUs a task that lands 2-4
    # groups becomes a multi-minute straggler while other cores idle
    # (measured: 16 partitions at 16 CPUs ran the link stage ~4-way
    # parallel).  ~8 per CPU keeps each group a few seconds and lets the
    # scheduler even out the waves.
    nparts = 8 * _shuffle_partitions(corpus_ds)

    def block_distinct(b: pa.Table) -> pa.Table:
        from ..ops.partitioning import string_partition

        u = pc.unique(b.column("mtext"))
        return pa.table(
            {"mtext": u, "part": pa.array(string_partition(u, nparts), pa.int32())}
        )

    linked = (
        mentions.select_columns(["mtext"])
        .map_batches(block_distinct, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            functools.partial(link_distinct_task, artifacts_ref=artifacts_ref, cfg=cfg),
            batch_format="pyarrow",
        )
    )
    # small-side broadcast: matched DISTINCT texts only (ontology-bounded).
    # The driver never touches vocab BYTES — it collects the block refs
    # (cost O(blocks)) and hands them to ONE remote combine task that emits a
    # single pre-combined Arrow table.  Broadcasting that one object means
    # every lookup process maps it zero-copy from the object store; the
    # previous per-process assembly (ray.get of ~200 small blocks + concat,
    # duplicated in every worker) measured ~4.7 s of the 16-CPU wall on the
    # 2M-doc scaling corpus and did not shrink with parallelism.
    matched_refs = list(linked.to_arrow_refs())
    vocab_ref = _combine_vocab.remote(*matched_refs)
    if _phases:
        print(
            f"[kg-phase] distinct-link {time.perf_counter() - _t0:.2f}s "
            f"({len(matched_refs)} vocab blocks)"
        )

    if oracle_dump_dir:
        # Value-oracle seam (driver SFs only — never the production path):
        # persist the pipeline's two intermediates so an external SQL engine
        # can re-derive the triples independently (mentions ⋈ vocab + VERB
        # gate + per-(url, pred, obj) keep-best).  The mention table is the
        # already-materialized pivot; the vocab is ontology-bounded.
        import shutil

        import pyarrow.parquet as _pq

        shutil.rmtree(oracle_dump_dir, ignore_errors=True)
        os.makedirs(oracle_dump_dir, exist_ok=True)
        mentions.write_parquet(os.path.join(oracle_dump_dir, "mentions"))
        _pq.write_table(
            ray.get(vocab_ref), os.path.join(oracle_dump_dir, "vocab.parquet")
        )

    ds = mentions.map_batches(
        functools.partial(link_lookup_task, matched_ref=vocab_ref, cfg=cfg),
        batch_format="pyarrow",
        batch_size=None,  # whole doc-aligned blocks → exact per-url dedup
        num_cpus=1,
    )
    if global_dedup is None:
        global_dedup = cfg.run.global_dedup
    if global_dedup:
        ds = dedup_triples(ds)
    return ds


def _shuffle_partitions(ds=None) -> int:
    """CPU floor + data-size ceiling (ops/partitioning.py): at 100 TB the
    mention exchange must scale with corpus bytes, not cores."""
    from ..ops.partitioning import shuffle_partitions as _sized

    # the distinct-mention table is ~1-2% of corpus bytes (measured r2)
    return _sized(ds, scale=0.02)


def triples_dataset(
    corpus_ds: rd.Dataset,
    artifacts: OntologyArtifacts,
    cfg: EngineConfig = DEFAULT_CONFIG,
    global_dedup: Optional[bool] = None,
    fused: bool = True,
    mode: Optional[str] = None,
    oracle_dump_dir: Optional[str] = None,
) -> rd.Dataset:
    """Lazy triples Dataset for a corpus Dataset.

    ``mode`` selects the execution plan (same output rows from all three):

    - ``"distinct"`` (default) — triples_dataset_distinct: link each
      distinct mention text once globally; the scale path (cold-link work
      independent of worker count).
    - ``"fused"`` — text-resolve + extraction + linking + per-url dedup in
      ONE task stage with per-process memo caches; lowest fixed cost, best
      for small/one-shot corpora; cold work grows with worker count.
    - ``"modular"`` (or ``fused=False``) — the two-pool pipeline (mentions
      Dataset → Linker actors) — the debuggable path feeding the
      mention-level queries."""
    if mode is None:
        mode = cfg.run.link_mode if fused else "modular"
    if mode == "distinct":
        return triples_dataset_distinct(
            corpus_ds, artifacts, cfg, global_dedup, oracle_dump_dir=oracle_dump_dir
        )
    if mode == "fused":
        import functools

        from ..stages.kg_stage import kg_stage_task

        # TASK pool, not an actor pool: worker processes are reused across
        # blocks and executions, so the per-process KGStage (automaton +
        # linker index + mention-link memo, see stages/kg_stage.py) stays
        # warm — actors would rebuild all of it per execution — and tasks
        # have no autoscaler ramp (the (1,28)-pool ramp measured 2.5x slower
        # than a fixed pool in round 1; tasks saturate immediately).
        artifacts_ref = ray.put(artifacts)
        ds = corpus_ds.map_batches(
            functools.partial(kg_stage_task, artifacts_ref=artifacts_ref, cfg=cfg),
            batch_format="pyarrow",
            batch_size=None,  # whole doc-aligned blocks → exact per-url dedup
            num_cpus=1,
        )
        if global_dedup is None:
            global_dedup = cfg.run.global_dedup
        if global_dedup:
            ds = dedup_triples(ds)
        return ds

    forms_ref, artifacts_ref = broadcast_artifacts(artifacts, cfg)
    ds = mentions_dataset(corpus_ds, forms_ref, cfg)
    # batch_size=None → the Linker consumes whole mention BLOCKS.  Extractor
    # batches are doc-aligned, so a url's mentions never straddle a linker
    # batch — which makes the Linker's in-batch (subj,pred,obj) dedup
    # globally exact under the corpus contract that urls are unique
    # (SURVEY.md §4.3).  The groupby backstop below is therefore a
    # validation pass, not a required hot-path shuffle.
    ds = ds.map_batches(
        Linker,
        fn_constructor_kwargs={"artifacts": artifacts_ref, "cfg": cfg.linker},
        batch_format="pyarrow",
        batch_size=None,
        concurrency=_pool(cfg.run.linker_concurrency, 0.5),
        num_cpus=1,
    )
    if global_dedup is None:
        global_dedup = cfg.run.global_dedup
    if global_dedup:
        ds = dedup_triples(ds)
    return ds


def _block_keep_best(batch: pa.Table) -> pa.Table:
    """Vectorized keep-best-per-(subj,pred,obj) within ONE block: sort by
    (key, -score, start), keep the first row of each key run.  ``end`` and
    ``text`` are trailing tie-keys so the winner is FULLY determined by row
    values (two distinct spans at the same start with a bit-equal score
    would otherwise be broken by block layout), which is what lets the
    kg_triples SQL oracle reproduce the keep-best with a window function."""
    if batch.num_rows <= 1:
        return batch
    order = pc.sort_indices(
        batch,
        sort_keys=[
            ("subj", "ascending"),
            ("pred", "ascending"),
            ("obj", "ascending"),
            ("score", "descending"),
            ("start", "ascending"),
            ("end", "ascending"),
            ("text", "ascending"),
        ],
    )
    t = batch.take(order)
    import numpy as np

    n = t.num_rows
    same = np.ones(n - 1, dtype=bool)  # row i+1 has the same key as row i
    for name in ("subj", "pred", "obj"):
        col = t.column(name).combine_chunks()
        # Arrow C++ elementwise compare of adjacent rows (no Python objects)
        same &= np.asarray(pc.equal(col.slice(1, n - 1), col.slice(0, n - 1)))
    mask = np.ones(n, dtype=bool)
    mask[1:] = ~same
    return t.filter(pa.array(mask))


def dedup_triples(triples_ds: rd.Dataset) -> rd.Dataset:
    """Global exact-dedup backstop on (subj, pred, obj) — SURVEY.md §2.7 D3.

    The key is url-dominated (near-unique, high cardinality) so the shuffle
    is skew-safe (SURVEY.md §4.3).  The hot path does not need this pass —
    the Linker's in-batch dedup is exact because its batches are whole
    doc-aligned blocks (see triples_dataset) — so this is a validation /
    belt-and-braces stage: a vectorized in-block pre-dedup shrinks every
    group to ≤ num_blocks rows before the exchange.  The exchange groups by
    HASH PARTITION of the key, not the key itself (one Python UDF call per
    partition instead of per distinct triple), and the partition-wide
    keep-best is the same vectorized run-filter as the in-block pass."""
    from ..ops.partitioning import shuffle_partitions, string_partition

    P = max(2, shuffle_partitions(triples_ds))

    def pre_and_part(batch: pa.Table) -> pa.Table:
        t = _block_keep_best(batch)
        key = pc.binary_join_element_wise(
            t.column("subj"), t.column("pred"), t.column("obj"), "\x1f"
        )
        return t.append_column("part", pa.array(string_partition(key, P)))

    def finish(group: pa.Table) -> pa.Table:
        return _block_keep_best(group.drop_columns(["part"]))

    pre = triples_ds.map_batches(
        pre_and_part, batch_format="pyarrow", batch_size=None
    )
    return pre.groupby("part").map_groups(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# skew-aware aggregates over triples (SURVEY.md §2.5 G3/G5, §4.3)
# ---------------------------------------------------------------------------

def salted_value_counts(
    ds: rd.Dataset, key: str, salt_from: str = "subj", buckets: int = 16,
    shuffle: bool = False,
) -> rd.Dataset:
    """Count rows per ``key`` when ``key`` is Zipf-hot (e.g. obj/pred class
    IRIs — a handful of classes tag most pages, SURVEY.md §7.4.5).

    Default path: the in-batch partial count (stage 1) already collapses
    every block to ≤ |keys| rows, and the key is bounded-cardinality
    (branches/classes), so the global merge is a coordinator fold
    (ops/combine.py) — no shuffle, no salt, and a deterministic (n desc,
    key asc) output order.

    ``shuffle=True`` keeps the three-stage FP-Hadoop-style salted exchange
    (PAPERS.md, VLDB 2015) for when the partial cardinality itself is too
    large to fold on the driver:
      1. in-batch partial count per (key, salt) — map-side combine; the
         salt is ``row_position % buckets`` (vectorized — after the final
         re-aggregation ANY per-row assignment yields identical counts, and
         round-robin spreads a hot key perfectly);
      2. groupby (key, salt) Sum — the shuffle fans each hot key out over
         ``buckets`` reducers instead of one (``salt_from`` is kept for API
         compatibility; the exchange key is what matters);
      3. groupby key Sum over ≤ buckets rows/key — trivially small.
    """
    import numpy as np

    partial_schema = pa.schema(
        [(key, pa.string()), ("salt", pa.int32()), ("partial_count", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return partial_schema.empty_table()
        salts = (np.arange(batch.num_rows, dtype=np.int64) % buckets).astype(np.int32)
        t = pa.table({key: batch.column(key), "salt": pa.array(salts, pa.int32())})
        # Arrow C++ hash-group-by does the counting; no per-row Python dict
        g = t.group_by([key, "salt"]).aggregate([([], "count_all")])
        return g.rename_columns([key, "salt", "partial_count"]).cast(partial_schema)

    def partial_unsalted(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.schema([(key, pa.string()), ("partial_count", pa.int64())]).empty_table()
        g = batch.select([key]).group_by([key]).aggregate([([], "count_all")])
        return g.rename_columns([key, "partial_count"])

    if shuffle:
        partials = ds.map_batches(partial, batch_format="pyarrow")
        salted = partials.groupby([key, "salt"]).aggregate(
            Sum("partial_count", alias_name="salted_count")
        )
        return (
            salted.groupby(key)
            .aggregate(Sum("salted_count", alias_name="n"))
            .sort("n", descending=True)
        )
    from ..ops.combine import combine_partials, sort_table

    final = combine_partials(
        ds.map_batches(partial_unsalted, batch_format="pyarrow"),
        [key],
        [("partial_count", "sum", "n")],
    )
    return rd.from_arrow(
        sort_table(final, [("n", "descending"), (key, "ascending")])
    )


def branch_histogram(triples_ds: rd.Dataset, buckets: int = 16) -> rd.Dataset:
    """Triples per branch (the reference's entity-type-histogram pattern,
    app/main.py:238-244, applied to the skewed branch key)."""
    return salted_value_counts(triples_ds, "branch", salt_from="subj", buckets=buckets)


def mention_type_histogram(mentions_ds: rd.Dataset) -> rd.Dataset:
    """Mention count per type (reference ExtractionStats, app/main.py:238-244).
    Four mention types → map-side partial counts + coordinator merge."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["type"]).aggregate([([], "count_all")])
        return g.rename_columns(["type", "p_n"])

    from ..ops.combine import combine_partials, sort_table

    final = combine_partials(
        mentions_ds.map_batches(partial, batch_format="pyarrow"),
        ["type"],
        [("p_n", "sum", "n")],
    )
    return rd.from_arrow(sort_table(final, [("type", "ascending")]))


# ---------------------------------------------------------------------------
# KG materialization analytics: entity co-occurrence edges
# ---------------------------------------------------------------------------

def cooccurrence_edges(
    triples_ds: rd.Dataset, num_partitions: Optional[int] = None
) -> rd.Dataset:
    """(iri_a, iri_b, n_docs) — pairs of LMSS classes co-mentioned by the
    same document, with document counts: the edge-weighting step that turns
    the per-document triples into an entity GRAPH (the north rule's 'graph
    materialize').

    Shape: per-block pair emission (triples arrive in doc-aligned blocks —
    the same contract the in-batch triple dedup relies on — so a document's
    IRI set is complete within one block; pairs per doc are quadratic in
    IRIs-per-doc, which is small and bounded by the ontology) followed by
    ONE hash exchange on the pair key with per-partition Arrow group_by
    sums — the pair cardinality is ontology-bounded but too large for a
    driver fold at 10^4+ classes."""
    import numpy as np

    P = num_partitions or _shuffle_partitions(triples_ds)
    empty = pa.table(
        {"iri_a": pa.array([], pa.string()), "iri_b": pa.array([], pa.string()),
         "p_n": pa.array([], pa.int64()), "part": pa.array([], pa.int32())}
    )

    def pairs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        t = pa.table({"subj": batch.column("subj"), "obj": batch.column("obj")})
        t = t.group_by(["subj", "obj"]).aggregate([]).sort_by(
            [("subj", "ascending"), ("obj", "ascending")]
        )
        subj = t.column("subj").combine_chunks()
        objs = t.column("obj").combine_chunks()
        n = t.num_rows
        if n < 2:
            return empty
        same = np.asarray(pc.equal(subj.slice(1, n - 1), subj.slice(0, n - 1)))
        starts = np.concatenate(([0], np.nonzero(~same)[0] + 1, [n]))
        # Vectorized within-run pair expansion (objs sorted asc -> a < b):
        # row i (local index r in a run of length L) is the 'a' side of
        # (L - 1 - r) pairs whose 'b' sides are the next rows of the run —
        # run-length repeats + a global arange build both index vectors
        # with zero per-pair Python.
        lens = starts[1:] - starts[:-1]
        rep_lens = np.repeat(lens, lens)
        local = np.arange(n, dtype=np.int64) - np.repeat(starts[:-1], lens)
        cnt = rep_lens - 1 - local  # pairs anchored at each row
        total = int(cnt.sum())
        if total == 0:
            return empty
        a_idx = np.repeat(np.arange(n, dtype=np.int64), cnt)
        offs = np.concatenate(([0], np.cumsum(cnt)))
        b_idx = a_idx + 1 + (np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], cnt))
        t2 = pa.table({"iri_a": objs.take(pa.array(a_idx)),
                       "iri_b": objs.take(pa.array(b_idx))})
        g = t2.group_by(["iri_a", "iri_b"]).aggregate([([], "count_all")])
        from ..ops.partitioning import string_hash64

        hp = (
            (string_hash64(g.column("iri_a")) ^ string_hash64(g.column("iri_b")))
            % np.uint64(P)
        ).astype(np.int32)
        part = pa.array(hp, pa.int32())
        return g.rename_columns(["iri_a", "iri_b", "p_n"]).append_column("part", part)

    def merge(group: pa.Table) -> pa.Table:
        g = group.group_by(["iri_a", "iri_b"]).aggregate([("p_n", "sum")])
        return g.rename_columns(["iri_a", "iri_b", "n_docs"])

    return (
        triples_ds.map_batches(pairs, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(merge, batch_format="pyarrow")
    )


def triple_report(triples_ds: rd.Dataset, num_partitions: Optional[int] = None) -> rd.Dataset:
    """(pred, n_triples, n_docs, sum_score_e5) — the KG quality dashboard a
    graph consumer reads first: volume, document reach and confidence mass
    per predicate.  Two exchange shapes composed, both exact:

    - n_triples / sum_score_e5 are ADDITIVE → per-block partials keyed by
      the bounded pred vocabulary fold on the coordinator;
    - n_docs = DISTINCT subjects per pred is NOT additive → block-distinct
      (pred, subj) pairs go through ONE hash exchange on the subj-dominated
      pair key (subjects are near-unique urls — skew-safe), each partition
      re-dedups and pre-counts per pred, and the bounded per-pred partial
      counts fold on the coordinator.

    Scores quantize to e5 ints (the kg_triples quantizer) so the sum is an
    order-independent integer — the SQL oracle mirrors it exactly."""
    import numpy as np

    from ..ops.combine import combine_partials, sort_table
    from ..ops.partitioning import string_hash64

    P = num_partitions or _shuffle_partitions(triples_ds)

    def add_partial(batch: pa.Table) -> pa.Table:
        s = batch.column("score").cast(pa.float64()).to_numpy(zero_copy_only=False)
        e5 = np.floor(s * 100_000.0 + 0.5).astype(np.int64)
        t = pa.table({"pred": batch.column("pred"), "e5": pa.array(e5, pa.int64())})
        g = t.group_by(["pred"]).aggregate([("e5", "count"), ("e5", "sum")])
        return g.rename_columns(["pred", "p_n", "p_s"])

    adds = combine_partials(
        triples_ds.map_batches(add_partial, batch_format="pyarrow"),
        ["pred"],
        [("p_n", "sum", "n_triples"), ("p_s", "sum", "sum_score_e5")],
        schema=pa.schema(
            [("pred", pa.string()), ("p_n", pa.int64()), ("p_s", pa.int64())]
        ),
    )

    def pair_partial(batch: pa.Table) -> pa.Table:
        g = (
            batch.select(["pred", "subj"])
            .group_by(["pred", "subj"])
            .aggregate([])
        )
        part = (
            (string_hash64(g.column("subj")) ^ string_hash64(g.column("pred")))
            % np.uint64(P)
        ).astype(np.int32)
        return g.append_column("part", pa.array(part, pa.int32()))

    def count_distinct(group: pa.Table) -> pa.Table:
        g = group.select(["pred", "subj"]).group_by(["pred", "subj"]).aggregate([])
        c = g.group_by(["pred"]).aggregate([([], "count_all")])
        return c.rename_columns(["pred", "p_d"])

    docs = combine_partials(
        triples_ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(count_distinct, batch_format="pyarrow"),
        ["pred"],
        [("p_d", "sum", "n_docs")],
        schema=pa.schema([("pred", pa.string()), ("p_d", pa.int64())]),
    )

    # both sides are pred-bounded → a driver-side Arrow join is exact
    idx = pc.index_in(adds.column("pred"), value_set=docs.column("pred").combine_chunks())
    import numpy as _np

    nd = _np.asarray(docs.column("n_docs"), dtype=_np.int64)[
        _np.asarray(idx, dtype=_np.int64)
    ]
    out = pa.table(
        {
            "pred": adds.column("pred"),
            "n_triples": adds.column("n_triples"),
            "n_docs": pa.array(nd, pa.int64()),
            "sum_score_e5": adds.column("sum_score_e5"),
        }
    )
    return rd.from_arrow(sort_table(out, [("pred", "ascending")]))
