"""Connected components over a near-duplicate pair list → dedup clusters.

The missing last step of the dedup family: pair emitters (exact / MinHash /
SimHash / n-gram Jaccard / embedding cosine) produce EDGES; deduplicating a
corpus needs the transitive closure — every document labeled with its
cluster (the minimum doc id reachable through pair edges) so one canonical
document per cluster survives.

Execution model — iterative label propagation (hash-to-min) as a raw-Ray
BSP loop, the documented fallback for semantics the Dataset API can't
express (iteration with a driver-side convergence test):

1. ONE Dataset pass symmetrizes the pairs and hash-partitions the edges by
   ``hash(u) % P``; each partition's edge table and label table live in the
   object store for the whole loop — nothing is re-shuffled per iteration.
2. Per iteration, P message tasks send ``min(label)`` per destination node
   (pre-combined per partition, so message volume is bounded by the number
   of distinct destination nodes, not edges) and P update tasks fold the
   messages into their labels; the driver sees only per-partition changed
   COUNTS.  Label tables are sorted by node → label lookups are
   ``searchsorted``, no Python dicts.
3. Convergence in O(graph diameter) iterations — near-dup clusters are
   shallow (a dup cluster's diameter is small by construction), so the loop
   runs 2-4 rounds in practice; ``max_iters`` is a backstop.

Scale notes: everything here is OUTPUT-scale (the near-duplicate pair
population), never corpus-scale.  The partition count follows the shared
data-size-aware sizing (ops/partitioning.py).  Cross-partition traffic per
iteration is ≤ |distinct (dst partition, dst node)| rows.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from .arrow_np import col_np
from .partitioning import shuffle_partitions

_GOLD = np.uint64(0x9E3779B97F4A7C15)
_EDGE_ROWS_PER_PART = 1_000_000  # symmetrized edges per partition target


@ray.remote
def _nrows(t: pa.Table) -> int:
    return t.num_rows


def _part_of(x: np.ndarray, P: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return ((x.astype(np.uint64) * _GOLD) % np.uint64(P)).astype(np.int64)


def _split_by_part(tbl: pa.Table, part: np.ndarray, P: int) -> List[pa.Table]:
    order = np.argsort(part, kind="stable")
    sorted_part = part[order]
    t = tbl.take(pa.array(order, pa.int64()))
    bounds = np.searchsorted(sorted_part, np.arange(P + 1))
    return [t.slice(bounds[p], bounds[p + 1] - bounds[p]) for p in range(P)]


_EDGE_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64())])
_MSG_SCHEMA = pa.schema([("v", pa.int64()), ("m", pa.int64())])
_LABEL_SCHEMA = pa.schema([("node", pa.int64()), ("lab", pa.int64())])


@ray.remote
def _cc_scatter(tbl: pa.Table, a: str, b: str, P: int) -> List[pa.Table]:
    """Symmetrize one pairs block and split by hash(u) % P."""
    if tbl.num_rows == 0:
        return [_EDGE_SCHEMA.empty_table()] * P
    x = col_np(tbl, a)
    y = col_np(tbl, b)
    u = np.concatenate([x, y])
    v = np.concatenate([y, x])
    edges = pa.table({"u": pa.array(u, pa.int64()), "v": pa.array(v, pa.int64())})
    return _split_by_part(edges, _part_of(u, P), P)


@ray.remote(num_returns=2)
def _cc_build(*shards: pa.Table) -> Tuple[pa.Table, pa.Table]:
    """One partition's sorted edge table + initial labels
    (lab(u) = min(u, min neighbor) — a free first hash-to-min round)."""
    t = pa.concat_tables([s for s in shards if s.num_rows] or [_EDGE_SCHEMA.empty_table()])
    if t.num_rows == 0:
        return _EDGE_SCHEMA.empty_table(), _LABEL_SCHEMA.empty_table()
    u = col_np(t, "u")
    v = col_np(t, "v")
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    starts = np.concatenate(([0], np.nonzero(u[1:] != u[:-1])[0] + 1))
    nodes = u[starts]
    lab = np.minimum(nodes, np.minimum.reduceat(v, starts))
    edges = pa.table({"u": pa.array(u, pa.int64()), "v": pa.array(v, pa.int64())})
    labels = pa.table({"node": pa.array(nodes, pa.int64()), "lab": pa.array(lab, pa.int64())})
    return edges, labels


@ray.remote
def _cc_messages(edges: pa.Table, labels: pa.Table, P: int) -> List[pa.Table]:
    """(v, min incident label) per destination node, split by hash(v) % P."""
    if edges.num_rows == 0:
        return [_MSG_SCHEMA.empty_table()] * P
    u = col_np(edges, "u")
    v = col_np(edges, "v")
    nodes = col_np(labels, "node")
    lab = col_np(labels, "lab")
    ml = lab[np.searchsorted(nodes, u)]  # u is partition-local by construction
    order = np.argsort(v, kind="stable")
    vs, ml = v[order], ml[order]
    starts = np.concatenate(([0], np.nonzero(vs[1:] != vs[:-1])[0] + 1))
    dst = vs[starts]
    m = np.minimum.reduceat(ml, starts)
    msgs = pa.table({"v": pa.array(dst, pa.int64()), "m": pa.array(m, pa.int64())})
    return _split_by_part(msgs, _part_of(dst, P), P)


@ray.remote(num_returns=2)
def _cc_update(labels: pa.Table, *msgs: pa.Table) -> Tuple[pa.Table, int]:
    live = [t for t in msgs if t.num_rows]
    if labels.num_rows == 0 or not live:
        return labels, 0
    t = pa.concat_tables(live)
    v = col_np(t, "v")
    m = col_np(t, "m")
    order = np.lexsort((m, v))
    v, m = v[order], m[order]
    starts = np.concatenate(([0], np.nonzero(v[1:] != v[:-1])[0] + 1))
    nodes = col_np(labels, "node")
    lab = col_np(labels, "lab").copy()
    idx = np.searchsorted(nodes, v[starts])  # unique per construction
    upd = m[starts]
    changed = int((upd < lab[idx]).sum())
    lab[idx] = np.minimum(lab[idx], upd)
    return (
        pa.table({"node": labels.column("node"), "lab": pa.array(lab, pa.int64())}),
        changed,
    )


@ray.remote
def _cc_finish(labels: pa.Table, node_name: str, cluster_name: str) -> pa.Table:
    return pa.table(
        {node_name: labels.column("node"), cluster_name: labels.column("lab")}
    )


@ray.remote
def _cc_local(
    a_col: str, b_col: str, node_name: str, cluster_name: str, *tables: pa.Table
) -> pa.Table:
    """Single-task connected components for SMALL edge lists: numpy
    hook-and-jump label propagation (labels monotonically decrease to the
    component minimum, pointer-jumping converges in O(log diameter) sweeps).
    One worker holds the whole edge list — the size-adaptive small side of
    the BSP loop, same result by construction."""
    live = [t for t in tables if t.num_rows]
    if not live:
        return pa.schema(
            [(node_name, pa.int64()), (cluster_name, pa.int64())]
        ).empty_table()
    t = pa.concat_tables(live)
    a = col_np(t, a_col)
    b = col_np(t, b_col)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ai, bi = inv[: len(a)], inv[len(a) :]
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
        m = np.minimum(lab[ai], lab[bi])
        new = lab.copy()
        np.minimum.at(new, ai, m)
        np.minimum.at(new, bi, m)
        while True:  # pointer jumping
            nn = new[new]
            if np.array_equal(nn, new):
                break
            new = nn
        if np.array_equal(new, lab):
            break
        lab = new
    # nodes are sorted ascending, so min index == min node id
    return pa.table(
        {
            node_name: pa.array(nodes, pa.int64()),
            cluster_name: pa.array(nodes[lab], pa.int64()),
        }
    )


def connected_components(
    pairs_ds: rd.Dataset,
    a: str = "a",
    b: str = "b",
    node_name: str = "doc_id",
    cluster_name: str = "cluster_id",
    num_partitions: Optional[int] = None,
    max_iters: int = 64,
    small_graph_limit: int = 5_000_000,
) -> rd.Dataset:
    """(node, cluster_id) for every node appearing in the pair list, where
    ``cluster_id`` is the minimum node id in its connected component.

    Size-adaptive: edge lists ≤ ``small_graph_limit`` rows (~80 MB — the
    near-dup population of most corpora) run as ONE remote union-find task
    (_cc_local), skipping the BSP machinery's per-wave task latency; larger
    graphs take the partitioned hash-to-min loop."""
    blocks = pairs_ds.select_columns([a, b]).to_arrow_refs()
    if not blocks:
        return rd.from_arrow(
            pa.schema([(node_name, pa.int64()), (cluster_name, pa.int64())]).empty_table()
        )
    # edge count via one metadata task per block (the pair table is already
    # materialized behind `blocks`)
    total = sum(ray.get([_nrows.remote(t) for t in blocks]))
    if total <= small_graph_limit:
        return rd.from_arrow_refs(
            [_cc_local.remote(a, b, node_name, cluster_name, *blocks)]
        )
    if num_partitions is None:
        # size P by the ACTUAL edge count: every extra partition costs 2
        # tasks per BSP wave, so a small dup population should run on a
        # handful of partitions even on a big cluster — and a 10^9-edge
        # graph gets its width from the data, not the CPU count.  P >= 2
        # keeps options(num_returns=P) returning a ref per partition.
        num_partitions = min(
            shuffle_partitions(pairs_ds), total * 2 // _EDGE_ROWS_PER_PART + 1
        )
    P = max(2, num_partitions)
    # num_returns=P → every partition shard stays an object-store REF; the
    # driver only ever routes refs, never edge/message bytes
    shard_lists = [
        _cc_scatter.options(num_returns=P).remote(blk, a, b, P) for blk in blocks
    ]
    edges, labels = [], []
    for p in range(P):
        e, l = _cc_build.remote(*[shards[p] for shards in shard_lists])
        edges.append(e)
        labels.append(l)
    converged = False
    for _ in range(max_iters):
        msg_lists = [
            _cc_messages.options(num_returns=P).remote(edges[p], labels[p], P)
            for p in range(P)
        ]
        changed_refs = []
        new_labels = []
        for p in range(P):
            lab, ch = _cc_update.remote(labels[p], *[ml[p] for ml in msg_lists])
            new_labels.append(lab)
            changed_refs.append(ch)
        labels = new_labels
        if sum(ray.get(changed_refs)) == 0:
            converged = True
            break
    if not converged:
        # hash-to-min needs O(diameter) waves; a dup chain longer than
        # max_iters would otherwise silently yield WRONG cluster labels
        # (and keep_canonical would then keep/drop the wrong documents)
        raise RuntimeError(
            f"connected_components: not converged after {max_iters} BSP "
            f"iterations — component diameter exceeds max_iters; rerun with "
            f"a larger max_iters"
        )
    return rd.from_arrow_refs(
        [_cc_finish.remote(labels[p], node_name, cluster_name) for p in range(P)]
    )


def dup_clusters(
    pairs_ds: rd.Dataset, a: str = "a", b: str = "b",
    num_partitions: Optional[int] = None, max_iters: int = 64,
) -> rd.Dataset:
    """Near-dup clusters from a pair list: (doc_id, cluster_id = min
    reachable doc_id).  Docs with no near-duplicate don't appear (they are
    their own cluster implicitly)."""
    return connected_components(
        pairs_ds, a=a, b=b, num_partitions=num_partitions, max_iters=max_iters
    )


def keep_canonical(
    docs_ds: rd.Dataset,
    pairs_ds: rd.Dataset,
    id_col: str = "doc_id",
    a: str = "a",
    b: str = "b",
    broadcast_limit: int = 20_000_000,
) -> rd.Dataset:
    """Drop every document that is a NON-canonical member of a dup cluster
    (keeps the min-id doc per cluster and all unpaired docs).

    The drop set (duplicate population) broadcasts as ONE sorted int64
    array when it fits ``broadcast_limit`` (8 B/id — filtering is a
    vectorized searchsorted per batch, no corpus shuffle); beyond that the
    filter becomes a left-anti hash_join on the id, a partition-aligned
    exchange (ops/join.py)."""
    clusters = connected_components(pairs_ds, a=a, b=b, node_name="node")

    def non_canonical(batch: pa.Table) -> pa.Table:
        node = col_np(batch, "node")
        cl = col_np(batch, "cluster_id")
        return pa.table({"drop_id": pa.array(node[node != cl], pa.int64())})

    drops = clusters.map_batches(non_canonical, batch_format="pyarrow").materialize()
    return _filter_drop_ids(docs_ds, drops, id_col, broadcast_limit)


def _filter_drop_ids(
    docs_ds: rd.Dataset, drops: rd.Dataset, id_col: str, broadcast_limit: int
) -> rd.Dataset:
    """Shared dedup tail: remove docs whose id appears in the (drop_id)
    Dataset — sorted-array broadcast + vectorized searchsorted when the
    drop population fits ``broadcast_limit``, left-anti hash_join beyond."""
    n_drop = drops.count()
    if n_drop > broadcast_limit:
        from .join import hash_join

        return hash_join(docs_ds, drops, on=id_col, right_on="drop_id",
                         how="left anti")
    parts = [
        col_np(t, "drop_id")
        for t in drops.iter_batches(batch_format="pyarrow")
        if t.num_rows
    ]
    drop_arr = np.sort(np.concatenate(parts)) if parts else np.zeros(0, np.int64)
    drop_ref = ray.put(drop_arr)

    def keep(batch: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        if len(d) == 0 or batch.num_rows == 0:
            return batch
        ids = col_np(batch, id_col)
        pos = np.minimum(np.searchsorted(d, ids), len(d) - 1)
        return batch.filter(pa.array(d[pos] != ids))

    return docs_ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def keep_best_in_cluster(
    docs_ds: rd.Dataset,
    pairs_ds: rd.Dataset,
    score_col: str,
    id_col: str = "doc_id",
    a: str = "a",
    b: str = "b",
    broadcast_limit: int = 20_000_000,
) -> rd.Dataset:
    """Score-aware corpus dedup: per dup cluster keep the member with the
    HIGHEST ``score_col`` (tie → smallest id) — the production policy
    (RefinedWeb keeps the longest member, quality-filtered pipelines keep
    the best-scoring one); ``keep_canonical`` keeps min-id, which is the
    right choice only when members are byte-identical.

    Shape: connected components over the pair list (output-scale), ONE
    hash_join carries each clustered member's score to its cluster rows,
    per-cluster winners resolve in a groupby(cluster_id) exchange (cluster
    ids are min-member ids — near-unique; a pathological giant cluster is
    one group, the same bound CC itself has), and the loser ids feed the
    shared broadcast/anti-join drop filter.  Unpaired docs always
    survive."""
    from .join import hash_join

    clusters = connected_components(pairs_ds, a=a, b=b, node_name="node")
    members = hash_join(
        clusters, docs_ds.select_columns([id_col, score_col]),
        on="node", right_on=id_col,
    )

    def losers(group: pa.Table) -> pa.Table:
        n = col_np(group, "node")
        sc = col_np(group, score_col, np.float64)
        order = np.lexsort((n, -sc))  # score desc, id asc
        return pa.table({"drop_id": pa.array(n[n != n[order[0]]], pa.int64())})

    drops = (
        members.groupby("cluster_id")
        .map_groups(losers, batch_format="pyarrow")
        .materialize()
    )
    return _filter_drop_ids(docs_ds, drops, id_col, broadcast_limit)


# ---------------------------------------------------------------------------
# triangle counting
# ---------------------------------------------------------------------------

def triangle_counts(
    edges_ds: rd.Dataset,
    a: str = "a",
    b: str = "b",
    node_name: str = "node",
    num_partitions: Optional[int] = None,
) -> rd.Dataset:
    """Per-node triangle counts over a DISTINCT edge list (each undirected
    edge exactly once, with ``a < b`` — the co-occurrence graph's native
    shape), DEGREE-ORIENTED before the wedge exchange.

    Wedge-join formulation on the existing exchange machinery, with the
    classic hub-scale guard (Chiba–Nishizeki / Suri–Vassilvitskii
    orientation): every edge points low-rank → high-rank in the total
    order (degree asc, node asc), wedges are generated ONLY from the
    low-rank endpoint, and a wedge (y1, y2) with rank(y1) < rank(y2) is
    closed by a semi-join against the oriented edge set.  Wedge volume is
    sum over nodes of d_out², and degree orientation bounds d_out by
    O(sqrt(m)) — a Zipf-hot hub with degree h generates O(h) wedges from
    its leaves instead of O(h²) from itself, so total wedge traffic is
    O(m^1.5) regardless of skew.  Each triangle is enumerated exactly once
    (from its lowest-rank corner), so per-corner counts are exact and the
    result is identical to the un-oriented formulation (orientation only
    changes which corner generates the wedge) — the 3-way SQL self-join
    oracle keeps passing unchanged.

    Partitioning assumption: the degree table folds on the coordinator and
    the rank vocabulary broadcasts via ``ray.put`` — node cardinality must
    be driver-sized (ontology-bounded for the co-occurrence KG, the same
    assumption as the final per-node fold below).  At web-scale node
    counts, swap the broadcast for a hash-join of ranks onto edges; the
    wedge machinery is unchanged.
    """
    import ray as _ray

    from .combine import combine_partials
    from .join import hash_join

    node_dtype = _col_dtype(edges_ds, a)

    # --- degree rank: total order (degree asc, node asc) --------------------
    def deg_partial(t: pa.Table) -> pa.Table:
        allc = pa.chunked_array(
            [t.column(a).combine_chunks(), t.column(b).combine_chunks()]
        )
        g = pa.table({"node": allc}).group_by(["node"]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["node", "p_d"])

    deg = combine_partials(
        edges_ds.map_batches(deg_partial, batch_format="pyarrow"),
        ["node"],
        [("p_d", "sum", "degree")],
        schema=pa.schema([("node", node_dtype), ("p_d", pa.int64())]),
    )
    if deg.num_rows == 0:
        return rd.from_arrow(
            pa.table({node_name: pa.array([], node_dtype),
                      "n_triangles": pa.array([], pa.int64())})
        )
    order = pc.sort_indices(
        deg, sort_keys=[("degree", "ascending"), ("node", "ascending")]
    )
    # rank(v) == index_in(v, vocab): position in the degree-sorted vocabulary
    vocab_ref = _ray.put(deg.column("node").take(order).combine_chunks())

    def orient(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"x": pa.array([], node_dtype),
                             "y": pa.array([], node_dtype),
                             "ry": pa.array([], pa.int64())})
        vocab = _ray.get(vocab_ref)
        ra = np.asarray(pc.index_in(t.column(a), value_set=vocab), dtype=np.int64)
        rb = np.asarray(pc.index_in(t.column(b), value_set=vocab), dtype=np.int64)
        swap = pa.array(ra > rb)
        return pa.table(
            {
                "x": pc.if_else(swap, t.column(b), t.column(a)),
                "y": pc.if_else(swap, t.column(a), t.column(b)),
                "ry": pa.array(np.maximum(ra, rb), pa.int64()),
            }
        )

    # materialized once: three consumers (wedge-join left + right, closing
    # semi-join right) would otherwise re-execute the whole upstream edge
    # pipeline per consumption; the oriented edge list is graph-sized (not
    # corpus-sized) and lives in the object store with spill
    oriented = edges_ds.map_batches(orient, batch_format="pyarrow").materialize()

    wedges = hash_join(
        oriented, oriented, on="x", how="inner", right_suffix="_r",
        num_partitions=num_partitions,
    )

    def ordered(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        # keep each unordered far-end pair once, ordered by RANK — the same
        # orientation the edge set stores, so the closing semi-join matches
        return t.filter(pc.less(t.column("ry"), t.column("ry_r")))

    wedges = wedges.map_batches(ordered, batch_format="pyarrow")
    tris = hash_join(
        wedges, oriented.select_columns(["x", "y"]), on=["y", "y_r"],
        right_on=["x", "y"], how="left semi", num_partitions=num_partitions,
    )

    def corner_partial(t: pa.Table) -> pa.Table:
        # one row per triangle corner, then a block-local pre-count: the
        # downstream combine ships <= distinct-node rows per block
        allc = pa.chunked_array(
            [t.column("x").combine_chunks(), t.column("y").combine_chunks(),
             t.column("y_r").combine_chunks()]
        )
        g = pa.table({node_name: allc}).group_by([node_name]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns([node_name, "p_n"])

    partials = tris.map_batches(corner_partial, batch_format="pyarrow")
    final = combine_partials(
        partials,
        [node_name],
        [("p_n", "sum", "n_triangles")],
        schema=pa.schema([(node_name, node_dtype), ("p_n", pa.int64())]),
    )
    return rd.from_arrow(final)


def kcore_peel(
    edges_ds: rd.Dataset,
    k: int = 3,
    rounds: int = 4,
    a: str = "a",
    b: str = "b",
    node_name: str = "node",
) -> rd.Dataset:
    """Fixed-round simultaneous k-core peeling over a DISTINCT undirected
    edge list (each edge once, ``a < b``): in every round, ALL remaining
    nodes whose degree within the remaining-induced subgraph is < ``k``
    are removed together (Jacobi-style), for exactly ``rounds`` rounds —
    fixed rounds make the recurrence SQL-unrollable, the same oracle
    pattern as ``bfs_hops`` / the integer PageRank.  Emits one row per
    node of the input graph: (node, removed_round) with ``removed_round``
    = the 1-based round that peeled the node, or -1 for survivors (the
    round-bounded k-core).  Early exit when a round removes nothing is
    output-equivalent to running the remaining rounds (the graph no
    longer changes), so the unrolled oracle still matches.

    Shape: the edge list is materialized once; each round is one
    vectorized membership-filter + degree-partial pass over the edge
    blocks (Arrow ``is_in`` against the broadcast remaining set) folded
    through the bounded coordinator combine.  Node cardinality must be
    driver-sized (ontology-bounded for the co-occurrence KG) — the same
    assumption as ``triangle_counts``'s rank broadcast; at web-scale node
    counts the remaining set becomes a semi-join and the removal decision
    a per-partition reduce, with the round structure unchanged."""
    import ray as _ray

    from .combine import combine_partials

    node_dtype = _col_dtype(edges_ds, a)
    empty_partial = pa.schema([("node", node_dtype), ("p_d", pa.int64())])
    edges = edges_ds.select_columns([a, b]).materialize()

    def deg_partial(t: pa.Table, rem_ref=None) -> pa.Table:
        if rem_ref is not None:
            remv = _ray.get(rem_ref)
            keep = pc.and_(
                pc.is_in(t.column(a), value_set=remv),
                pc.is_in(t.column(b), value_set=remv),
            )
            t = t.filter(keep)
        if t.num_rows == 0:
            return empty_partial.empty_table()
        allc = pa.chunked_array(
            [t.column(a).combine_chunks(), t.column(b).combine_chunks()]
        )
        g = pa.table({"node": allc}).group_by(["node"]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["node", "p_d"])

    def degrees(rem_ref=None) -> pa.Table:
        import functools

        return combine_partials(
            edges.map_batches(
                functools.partial(deg_partial, rem_ref=rem_ref),
                batch_format="pyarrow",
            ),
            ["node"],
            [("p_d", "sum", "degree")],
            schema=empty_partial,
        )

    deg0 = degrees()
    if deg0.num_rows == 0:
        return rd.from_arrow(
            pa.table({node_name: pa.array([], node_dtype),
                      "removed_round": pa.array([], pa.int64())})
        )
    universe = deg0.column("node").combine_chunks()
    n = len(universe)
    removed_round = np.full(n, -1, dtype=np.int64)
    remaining = np.ones(n, dtype=bool)
    cur_deg = np.asarray(deg0.column("degree"), dtype=np.int64)

    for r in range(1, rounds + 1):
        peel = remaining & (cur_deg < k)
        if not peel.any():
            break  # fixpoint — identical to running the remaining rounds
        removed_round[peel] = r
        remaining &= ~peel
        if not remaining.any() or r == rounds:
            break
        rem_ref = _ray.put(universe.filter(pa.array(remaining)))
        degs = degrees(rem_ref)
        cur_deg = np.zeros(n, dtype=np.int64)
        if degs.num_rows:
            idx = np.asarray(
                pc.index_in(degs.column("node"), value_set=universe),
                dtype=np.int64,
            )
            cur_deg[idx] = np.asarray(degs.column("degree"), dtype=np.int64)

    return rd.from_arrow(
        pa.table(
            {node_name: universe,
             "removed_round": pa.array(removed_round, pa.int64())}
        )
    )


def _col_dtype(ds: rd.Dataset, col: str):
    try:
        return ds.schema().base_schema.field(col).type
    except Exception:
        return pa.string()


# ---------------------------------------------------------------------------
# k-hop BFS distances
# ---------------------------------------------------------------------------

_DIST_SCHEMA = pa.schema([("node", pa.int64()), ("dist", pa.int64())])


def _bfs_local_arrays(
    src: np.ndarray, dst: np.ndarray, nodes: np.ndarray,
    seeds: np.ndarray, iters: int,
) -> np.ndarray:
    """Reference relaxation: dist_{t+1}(v) = min(dist_t(v), min_{u->v}
    dist_t(u) + 1), exactly ``iters`` rounds from dist_0 = 0 at seeds.
    Unreached nodes keep sentinel -1 (mapped from +inf at the end)."""
    n = len(nodes)
    INF = np.int64(1 << 60)
    dist = np.full(n, INF, dtype=np.int64)
    dist[np.searchsorted(nodes, seeds)] = 0
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    order = np.argsort(di, kind="stable")
    si, di = si[order], di[order]
    starts = np.concatenate(([0], np.nonzero(di[1:] != di[:-1])[0] + 1))
    dst_nodes = di[starts]
    for _ in range(iters):
        cand = dist[si] + 1
        if len(si):
            m = np.minimum.reduceat(cand, starts)
            np.minimum.at(dist, dst_nodes, m)
    dist[dist >= INF] = -1
    return dist


@ray.remote
def _bfs_local(
    src_col: str, dst_col: str, seeds: np.ndarray, iters: int, *tables: pa.Table
) -> pa.Table:
    live = [t for t in tables if t.num_rows]
    if not live:
        return _DIST_SCHEMA.empty_table()
    t = pa.concat_tables(live)
    src = col_np(t, src_col)
    dst = col_np(t, dst_col)
    nodes = np.unique(np.concatenate([src, dst, seeds]))
    dist = _bfs_local_arrays(src, dst, nodes, seeds, iters)
    return pa.table(
        {"node": pa.array(nodes, pa.int64()), "dist": pa.array(dist, pa.int64())}
    )


def bfs_hops(
    edges_ds: rd.Dataset,
    seeds,
    src: str = "src",
    dst: str = "dst",
    iters: int = 4,
    num_partitions: Optional[int] = None,
    small_graph_limit: int = 5_000_000,
) -> rd.Dataset:
    """(node, dist) after exactly ``iters`` rounds of min-plus relaxation
    from ``seeds`` (directed edges; symmetrize for undirected reach).
    dist = -1 marks nodes not reached within ``iters`` hops — a FIXED
    iteration count, so the result is closed-form reproducible (the SQL
    oracle unrolls the same rounds) even when the frontier hasn't
    converged.

    Small edge lists run as one numpy task; larger graphs reuse the
    PageRank BSP partitioning with a min-fold instead of a sum — messages
    per round are bounded by distinct destinations per partition, and the
    driver routes only refs.
    """
    seeds = np.asarray(list(seeds), dtype=np.int64)
    blocks = edges_ds.select_columns([src, dst]).to_arrow_refs()
    if not blocks:
        return rd.from_arrow(
            pa.table(
                {"node": pa.array(seeds, pa.int64()),
                 "dist": pa.array(np.zeros(len(seeds), np.int64), pa.int64())}
            )
        )
    total = sum(ray.get([_nrows.remote(t) for t in blocks]))
    if total <= small_graph_limit:
        return rd.from_arrow_refs(
            [_bfs_local.remote(src, dst, seeds, iters, *blocks)]
        )
    # BSP path: reuse the CC scatter (src-hash partitioning); per round the
    # message is min(dist)+1 per destination, folded like _cc_update but
    # carrying dist instead of labels.
    from .pagerank import _pr_node_scatter, _pr_scatter

    P = max(2, num_partitions or shuffle_partitions(edges_ds))
    edge_shards = [
        _pr_scatter.options(num_returns=P).remote(blk, src, dst, None, P)
        for blk in blocks
    ]
    node_shards = [
        _pr_node_scatter.options(num_returns=P).remote(blk, src, dst, P)
        for blk in blocks
    ]
    seed_ref = ray.put(seeds)
    edges = []
    dists = []
    for p in range(P):
        e = _bfs_build_edges.remote(*[s[p] for s in edge_shards])
        d = _bfs_build_dists.remote(seed_ref, P, p, *[s[p] for s in node_shards])
        edges.append(e)
        dists.append(d)
    for _ in range(iters):
        msg_lists = [
            _bfs_messages.options(num_returns=P).remote(edges[p], dists[p], P)
            for p in range(P)
        ]
        dists = [
            _bfs_update.remote(dists[p], *[ml[p] for ml in msg_lists])
            for p in range(P)
        ]
    return rd.from_arrow_refs([_bfs_finish.remote(d) for d in dists])


_BFS_INF = 1 << 60


_BFS_EDGE_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64())])


@ray.remote
def _bfs_build_edges(*shards: pa.Table) -> pa.Table:
    t = pa.concat_tables(
        [s for s in shards if s.num_rows] or [_BFS_EDGE_SCHEMA.empty_table()]
    )
    if t.num_rows == 0:
        return _BFS_EDGE_SCHEMA.empty_table()
    src = col_np(t, "src")
    dst = col_np(t, "dst")
    order = np.argsort(dst, kind="stable")
    return pa.table(
        {"src": pa.array(src[order], pa.int64()), "dst": pa.array(dst[order], pa.int64())}
    )


@ray.remote
def _bfs_build_dists(seeds: np.ndarray, P: int, p: int, *shards: pa.Table) -> pa.Table:
    one = pa.schema([("node", pa.int64())])
    t = pa.concat_tables([s for s in shards if s.num_rows] or [one.empty_table()])
    nodes = np.unique(col_np(t, "node")) if t.num_rows else np.zeros(0, np.int64)
    # seeds belonging to this partition by the shared hash
    mine = seeds[np.asarray(_part_of(seeds, P)) == p]
    nodes = np.unique(np.concatenate([nodes, mine]))
    dist = np.full(len(nodes), _BFS_INF, dtype=np.int64)
    dist[np.searchsorted(nodes, mine)] = 0
    return pa.table(
        {"node": pa.array(nodes, pa.int64()), "dist": pa.array(dist, pa.int64())}
    )


@ray.remote
def _bfs_messages(edges: pa.Table, dists: pa.Table, P: int) -> List[pa.Table]:
    if edges.num_rows == 0:
        return [_MSG_SCHEMA.empty_table()] * P
    src = col_np(edges, "src")
    dst = col_np(edges, "dst")
    nodes = col_np(dists, "node")
    d = col_np(dists, "dist")
    cand = d[np.searchsorted(nodes, src)] + 1
    starts = np.concatenate(([0], np.nonzero(dst[1:] != dst[:-1])[0] + 1))
    dn = dst[starts]
    m = np.minimum.reduceat(cand, starts)
    live = m < _BFS_INF
    dn, m = dn[live], m[live]
    msgs = pa.table({"v": pa.array(dn, pa.int64()), "m": pa.array(m, pa.int64())})
    return _split_by_part(msgs, _part_of(dn, P), P)


@ray.remote
def _bfs_update(dists: pa.Table, *msgs: pa.Table) -> pa.Table:
    live = [t for t in msgs if t.num_rows]
    if dists.num_rows == 0 or not live:
        return dists
    t = pa.concat_tables(live)
    v = col_np(t, "v")
    m = col_np(t, "m")
    order = np.lexsort((m, v))
    v, m = v[order], m[order]
    starts = np.concatenate(([0], np.nonzero(v[1:] != v[:-1])[0] + 1))
    nodes = col_np(dists, "node")
    d = col_np(dists, "dist").copy()
    idx = np.searchsorted(nodes, v[starts])
    d[idx] = np.minimum(d[idx], m[starts])
    return pa.table({"node": dists.column("node"), "dist": pa.array(d, pa.int64())})


@ray.remote
def _bfs_finish(dists: pa.Table) -> pa.Table:
    d = col_np(dists, "dist").copy()
    d[d >= _BFS_INF] = -1
    return pa.table({"node": dists.column("node"), "dist": pa.array(d, pa.int64())})


# ---------------------------------------------------------------------------
# common-neighbor link prediction
# ---------------------------------------------------------------------------

def _pair_partition(col1, col2, P: int) -> np.ndarray:
    """Deterministic partition id for a two-column key (string or int)."""
    if pa.types.is_integer(col1.type if hasattr(col1, "type") else col1.chunk(0).type):
        import numpy as _np

        a = np.asarray(col1, dtype=np.uint64)
        b = np.asarray(col2, dtype=np.uint64)
        with _np.errstate(over="ignore"):
            return (((a * _GOLD) ^ (b * _GOLD)) % np.uint64(P)).astype(np.int32)
    from .partitioning import string_hash64

    return (
        (string_hash64(col1) ^ string_hash64(col2)) % np.uint64(P)
    ).astype(np.int32)


def common_neighbor_scores(
    edges_ds: rd.Dataset,
    a: str = "a",
    b: str = "b",
    min_common: int = 2,
    num_partitions: Optional[int] = None,
) -> rd.Dataset:
    """Link-prediction candidates over a DISTINCT oriented edge list:
    (u, v, common, jaccard_e5) for every non-adjacent-or-adjacent pair
    sharing >= ``min_common`` neighbors, with the neighborhood Jaccard
    |N(u)∩N(v)| / |N(u)∪N(v)| quantized to 1e-5 by integer floor division
    (both sides of the oracle compute the identical int64 expression).

    Shape: symmetrize → wedge self-join on the shared neighbor (the same
    exchange as triangle_counts) → per-block pair pre-count → ONE pair-key
    exchange → per-partition sum + threshold; degrees fold through the
    bounded coordinator combine and broadcast into the scoring stage.
    Wedge volume is sum(deg²) over shared neighbors — degree-cap hubs
    upstream on hub-heavy graphs (same knob as triangle_counts); the
    coordinator degree fold assumes node cardinality is bounded (true for
    an ontology KG) — swap it for a hash_join on degrees beyond that.
    """
    from .combine import combine_partials
    from .join import hash_join
    from .partitioning import shuffle_partitions as _sp

    P = max(2, num_partitions or _sp(edges_ds))

    def symmetrize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"src": t.column(a), "dst": t.column(b)})
        return pa.table(
            {
                "src": pa.concat_arrays(
                    [t.column(a).combine_chunks(), t.column(b).combine_chunks()]
                ),
                "dst": pa.concat_arrays(
                    [t.column(b).combine_chunks(), t.column(a).combine_chunks()]
                ),
            }
        )

    sym = edges_ds.map_batches(symmetrize, batch_format="pyarrow").materialize()

    # degrees over the symmetrized list = true degree per node
    def deg_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["src"]).aggregate([([], "count_all")])
        return g.rename_columns(["node", "p_n"])

    key_type = sym.schema().base_schema.field("src").type
    deg_tbl = combine_partials(
        sym.map_batches(deg_partial, batch_format="pyarrow"),
        ["node"],
        [("p_n", "sum", "d")],
        schema=pa.schema([("node", key_type), ("p_n", pa.int64())]),
    )
    deg_sorted = deg_tbl.sort_by([("node", "ascending")])
    deg_nodes = np.asarray(deg_sorted.column("node"))
    deg_vals = np.asarray(deg_sorted.column("d"), dtype=np.int64)
    deg_ref = ray.put((deg_nodes, deg_vals))

    wedges = hash_join(sym, sym, on="src", how="inner", right_suffix="_r")

    def pair_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table(
            {"u": pa.array([], key_type), "v": pa.array([], key_type),
             "p_n": pa.array([], pa.int64()),
             "part": pa.array([], pa.int32())}
        )
        if t.num_rows == 0:
            return empty
        t = t.filter(pc.less(t.column("dst"), t.column("dst_r")))
        if t.num_rows == 0:
            return empty
        g = t.group_by(["dst", "dst_r"]).aggregate([([], "count_all")])
        part = _pair_partition(
            g.column("dst").combine_chunks(), g.column("dst_r").combine_chunks(), P
        )
        return g.rename_columns(["u", "v", "p_n"]).append_column(
            "part", pa.array(part, pa.int32())
        )

    def merge(group: pa.Table) -> pa.Table:
        g = group.group_by(["u", "v"]).aggregate([("p_n", "sum")])
        g = g.rename_columns(["u", "v", "common"])
        common = np.asarray(g.column("common"), dtype=np.int64)
        keep = common >= min_common
        g = g.filter(pa.array(keep))
        common = common[keep]
        nodes, degs = ray.get(deg_ref)
        du = degs[np.searchsorted(nodes, np.asarray(g.column("u")))]
        dv = degs[np.searchsorted(nodes, np.asarray(g.column("v")))]
        jac = common * 100000 // (du + dv - common)
        return pa.table(
            {
                "u": g.column("u"),
                "v": g.column("v"),
                "common": pa.array(common, pa.int64()),
                "jaccard_e5": pa.array(jac, pa.int64()),
            }
        )

    return (
        wedges.map_batches(pair_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge, batch_format="pyarrow")
    )
