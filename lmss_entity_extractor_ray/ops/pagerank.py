"""PageRank over an edge list — graph centrality for the constructed KG.

The KG pipeline materializes a co-occurrence graph (pipelines/kg.py:
cooccurrence_edges); ranking its nodes is the canonical "which entities
matter" query a KG consumer runs next (reference exposes only per-class
counts — app/lmss_search.py top-classes; rank propagation is the web-scale
generalization).

Determinism contract — INTEGER fixed point, so a DuckDB oracle can unroll
the same iterations bit-exactly:

- ranks are int64 in units of 1/scale (default scale = 10^12);
- r_0(v)   = scale // N  for every node;
- r_{t+1}(v) = (15 * scale) // (100 * N)
             + (85 * sum_{u -> v} (r_t(u) // outdeg(u))) // 100
  with floor division at every step (all quantities positive, so numpy
  int64 ``//`` == DuckDB ``//`` == SQL floor semantics);
- a FIXED iteration count (no float convergence test), so both sides
  compute the identical closed expression;
- dangling mass is dropped, not redistributed (a node with outdeg 0
  contributes nothing); on a symmetrized graph every node has outdeg >= 1
  so the case never arises for co-occurrence input.

Integer sums cannot overflow: total mass is <= scale + N (rounding), so any
per-node message sum is < 2^50 and 85 * sum fits int64 with > 4 decimal
orders of headroom.

Execution model mirrors ops/graph.py connected_components:

- small path (edge count <= ``small_graph_limit``): ONE remote task holds
  the edge list; messages are a sort-once / reduceat-per-iteration numpy
  loop.  This is the sf-scale route.
- BSP path: edges hash-partitioned by src ONCE (so a node's out-edges and
  its rank row are co-located — same hash as the rank table); per
  iteration each partition pre-combines contributions per destination and
  ships one (dst, partial_sum) row per distinct dst per partition, folded
  on the destination side.  The driver routes only object refs; per-wave
  cross-partition traffic is bounded by distinct-dst cardinality, never
  edge count.  Fixed iterations ⇒ no driver-side convergence reads at all.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from .arrow_np import col_np
from .graph import _nrows, _part_of, _split_by_part
from .partitioning import shuffle_partitions

_EDGE_ROWS_PER_PART = 2_000_000

_RANK_SCHEMA = pa.schema([("node", pa.int64()), ("rank_q", pa.int64())])
_MSG_SCHEMA = pa.schema([("v", pa.int64()), ("m", pa.int64())])


def _iterate_local(
    src: np.ndarray,
    dst: np.ndarray,
    nodes: np.ndarray,
    iters: int,
    scale: int,
    d_num: int,
    d_den: int,
    w: Optional[np.ndarray] = None,
    r0: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Reference single-array iteration (nodes sorted ascending).

    Shared by the small path and by tests as the oracle for the BSP path.
    Weighted contribution is floored PER EDGE: (r(u) * w_e) // wsum(u) —
    with w_e = 1 everywhere this equals the unweighted r(u) // outdeg(u).
    """
    n = len(nodes)
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    if w is None:
        per_node = np.bincount(si, minlength=n).astype(np.int64)  # outdeg
    else:
        per_node = np.zeros(n, dtype=np.int64)
        np.add.at(per_node, si, w.astype(np.int64))  # wsum, int64-exact
    # sort edges by destination once; per-iteration message fold is a
    # reduceat over precomputed run boundaries (int64-exact, no float path)
    order = np.argsort(di, kind="stable")
    si, di = si[order], di[order]
    we = None if w is None else w[order].astype(np.int64)
    starts = np.concatenate(([0], np.nonzero(di[1:] != di[:-1])[0] + 1))
    dst_nodes = di[starts]
    base = (d_den - d_num) * scale // (d_den * n)
    r = (
        r0.astype(np.int64, copy=True)
        if r0 is not None
        else np.full(n, scale // n, dtype=np.int64)
    )
    safe = np.maximum(per_node, 1)
    for _ in range(iters):
        if we is None:
            contrib = (r // safe)[si]
        else:
            contrib = r[si] * we // safe[si]
        msum = np.zeros(n, dtype=np.int64)
        if len(si):
            msum[dst_nodes] = np.add.reduceat(contrib, starts)
        r = base + d_num * msum // d_den
    return r


def _init_ranks_for(
    nodes: np.ndarray, init_tbl: Optional[pa.Table], n_total: int, scale: int
) -> Optional[np.ndarray]:
    """Warm-start lookup: rank from the checkpointed (node, rank_q) table
    where present, the cold-start uniform scale // n_total for nodes the
    checkpoint has never seen (new nodes from an incremental graph merge)."""
    if init_tbl is None:
        return None
    r = np.full(len(nodes), scale // max(n_total, 1), dtype=np.int64)
    if init_tbl.num_rows:
        inodes = col_np(init_tbl, "node")
        iranks = col_np(init_tbl, "rank_q")
        order = np.argsort(inodes, kind="stable")
        inodes, iranks = inodes[order], iranks[order]
        pos = np.minimum(np.searchsorted(inodes, nodes), len(inodes) - 1)
        hit = inodes[pos] == nodes
        r[hit] = iranks[pos[hit]]
    return r


@ray.remote
def _pr_local(
    src_col: str, dst_col: str, weight_col: Optional[str],
    iters: int, scale: int, d_num: int, d_den: int, init_tbl: Optional[pa.Table],
    *tables: pa.Table,
) -> pa.Table:
    live = [t for t in tables if t.num_rows]
    if not live:
        return _RANK_SCHEMA.empty_table()
    t = pa.concat_tables(live)
    src = col_np(t, src_col)
    dst = col_np(t, dst_col)
    w = None if weight_col is None else col_np(t, weight_col)
    nodes = np.unique(np.concatenate([src, dst]))
    r0 = _init_ranks_for(nodes, init_tbl, len(nodes), scale)
    r = _iterate_local(src, dst, nodes, iters, scale, d_num, d_den, w=w, r0=r0)
    return pa.table(
        {"node": pa.array(nodes, pa.int64()), "rank_q": pa.array(r, pa.int64())}
    )


# ---------------------------------------------------------------------------
# BSP path
# ---------------------------------------------------------------------------

_EDGE_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64())])


_WEDGE_SCHEMA = pa.schema(
    [("src", pa.int64()), ("dst", pa.int64()), ("w", pa.int64())]
)


@ray.remote
def _pr_scatter(
    tbl: pa.Table, src_col: str, dst_col: str, weight_col: Optional[str], P: int
) -> List[pa.Table]:
    """Split one edge block by hash(src) % P (edges stay directed)."""
    schema = _EDGE_SCHEMA if weight_col is None else _WEDGE_SCHEMA
    if tbl.num_rows == 0:
        return [schema.empty_table()] * P
    src = col_np(tbl, src_col)
    cols = {
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(col_np(tbl, dst_col), pa.int64()),
    }
    if weight_col is not None:
        cols["w"] = pa.array(col_np(tbl, weight_col), pa.int64())
    return _split_by_part(pa.table(cols), _part_of(src, P), P)


@ray.remote
def _pr_node_scatter(tbl: pa.Table, src_col: str, dst_col: str, P: int) -> List[pa.Table]:
    """Block-distinct node ids (both endpoints), split by hash(node) % P."""
    one = pa.schema([("node", pa.int64())])
    if tbl.num_rows == 0:
        return [one.empty_table()] * P
    nodes = np.unique(np.concatenate([col_np(tbl, src_col), col_np(tbl, dst_col)]))
    t = pa.table({"node": pa.array(nodes, pa.int64())})
    return _split_by_part(t, _part_of(nodes, P), P)


@ray.remote(num_returns=2)
def _pr_build_edges(weighted: bool, *shards: pa.Table) -> Tuple[pa.Table, pa.Table]:
    """One partition's edges sorted by dst (for per-dst pre-combine) plus
    its per-src divisor table (outdegree, or weight sum when weighted) —
    srcs are partition-local by the scatter key."""
    deg_schema = pa.schema([("src", pa.int64()), ("od", pa.int64())])
    empty = _WEDGE_SCHEMA if weighted else _EDGE_SCHEMA
    t = pa.concat_tables([s for s in shards if s.num_rows] or [empty.empty_table()])
    if t.num_rows == 0:
        return empty.empty_table(), deg_schema.empty_table()
    src = col_np(t, "src")
    dst = col_np(t, "dst")
    sorder = np.argsort(src, kind="stable")
    su = src[sorder]
    starts = np.concatenate(([0], np.nonzero(su[1:] != su[:-1])[0] + 1))
    deg_nodes = su[starts]
    if weighted:
        wsorted = col_np(t, "w")[sorder]
        deg = np.add.reduceat(wsorted, starts)
    else:
        deg = np.diff(np.concatenate((starts, [len(su)])))
    order = np.argsort(dst, kind="stable")
    cols = {
        "src": pa.array(src[order], pa.int64()),
        "dst": pa.array(dst[order], pa.int64()),
    }
    if weighted:
        cols["w"] = pa.array(col_np(t, "w")[order], pa.int64())
    degs = pa.table(
        {"src": pa.array(deg_nodes, pa.int64()),
         "od": pa.array(deg.astype(np.int64), pa.int64())}
    )
    return pa.table(cols), degs


@ray.remote
def _pr_build_ranks(
    n_total: int, scale: int, init_tbl: Optional[pa.Table], *shards: pa.Table
) -> pa.Table:
    one = pa.schema([("node", pa.int64())])
    t = pa.concat_tables([s for s in shards if s.num_rows] or [one.empty_table()])
    nodes = np.unique(col_np(t, "node")) if t.num_rows else np.zeros(0, np.int64)
    r = _init_ranks_for(nodes, init_tbl, n_total, scale)
    if r is None:
        r = np.full(len(nodes), scale // max(n_total, 1), dtype=np.int64)
    return pa.table(
        {"node": pa.array(nodes, pa.int64()), "rank_q": pa.array(r, pa.int64())}
    )


@ray.remote
def _pr_messages(
    edges: pa.Table, degs: pa.Table, ranks: pa.Table, P: int
) -> List[pa.Table]:
    """Per-partition contribution fold: sum(r(u) // od(u)) per distinct dst,
    split by hash(dst) % P.  Ranks of this partition's srcs are LOCAL
    (edge partition key == rank partition key == hash(node))."""
    if edges.num_rows == 0:
        return [_MSG_SCHEMA.empty_table()] * P
    src = col_np(edges, "src")
    dst = col_np(edges, "dst")
    rnodes = col_np(ranks, "node")
    r = col_np(ranks, "rank_q")
    dnodes = col_np(degs, "src")
    od = col_np(degs, "od")
    if "w" in edges.column_names:
        pos = np.searchsorted(dnodes, src)
        rank_per_edge = r[np.searchsorted(rnodes, dnodes)][pos]
        contrib = rank_per_edge * col_np(edges, "w") // od[pos]
    else:
        contrib_per_node = r[np.searchsorted(rnodes, dnodes)] // od
        contrib = contrib_per_node[np.searchsorted(dnodes, src)]
    # edges arrive sorted by dst from _pr_build_edges
    starts = np.concatenate(([0], np.nonzero(dst[1:] != dst[:-1])[0] + 1))
    dn = dst[starts]
    m = np.add.reduceat(contrib, starts)
    msgs = pa.table({"v": pa.array(dn, pa.int64()), "m": pa.array(m, pa.int64())})
    return _split_by_part(msgs, _part_of(dn, P), P)


@ray.remote
def _pr_update(
    ranks: pa.Table, n_total: int, scale: int, d_num: int, d_den: int,
    *msgs: pa.Table,
) -> pa.Table:
    if ranks.num_rows == 0:
        return ranks
    nodes = col_np(ranks, "node")
    msum = np.zeros(len(nodes), dtype=np.int64)
    live = [t for t in msgs if t.num_rows]
    if live:
        t = pa.concat_tables(live)
        v = col_np(t, "v")
        m = col_np(t, "m")
        order = np.argsort(v, kind="stable")
        v, m = v[order], m[order]
        starts = np.concatenate(([0], np.nonzero(v[1:] != v[:-1])[0] + 1))
        sums = np.add.reduceat(m, starts)
        idx = np.searchsorted(nodes, v[starts])
        msum[idx] = sums
    base = (d_den - d_num) * scale // (d_den * n_total)
    r = base + d_num * msum // d_den
    return pa.table(
        {"node": ranks.column("node"), "rank_q": pa.array(r, pa.int64())}
    )


def pagerank(
    edges_ds: rd.Dataset,
    src: str = "src",
    dst: str = "dst",
    weight: Optional[str] = None,
    iters: int = 5,
    scale: int = 10**12,
    damping_num: int = 85,
    damping_den: int = 100,
    num_partitions: Optional[int] = None,
    small_graph_limit: int = 5_000_000,
    init_ranks: Optional[pa.Table] = None,
) -> rd.Dataset:
    """(node, rank_q) for every node in the edge list after ``iters`` fixed
    iterations of integer-quantized PageRank (see module docstring for the
    exact recurrence — it is reproducible verbatim in SQL).

    ``weight`` names an int64 edge-weight column: the contribution along
    edge (u, v, w) becomes (r(u) * w) // wsum(u), floored PER EDGE (w = 1
    everywhere reduces to the unweighted recurrence exactly).  Weights must
    satisfy max(w) * scale < 2^63 so the int64 product cannot overflow —
    the same bound under which DuckDB's BIGINT arithmetic reproduces it.

    Size-adaptive like connected_components: small edge lists run as one
    remote numpy task; larger graphs take the partitioned BSP loop whose
    per-iteration traffic is distinct-destination rows, not edges.

    ``init_ranks``: WARM START — a (node, rank_q) Arrow table (e.g. the
    ranks a previous run wrote before a graph delta was merged) replaces
    the uniform r_0; nodes the checkpoint has never seen fall back to the
    cold-start scale // N.  Running ``iters=k`` warm-started from a
    ``j``-iteration checkpoint over the SAME graph is bit-identical to a
    cold ``j+k``-iteration run (pytest-pinned), which is what makes the
    incremental-analytics path oracle-checkable from the written ranks.
    """
    cols = [src, dst] if weight is None else [src, dst, weight]
    blocks = edges_ds.select_columns(cols).to_arrow_refs()
    if not blocks:
        return rd.from_arrow(_RANK_SCHEMA.empty_table())
    total = sum(ray.get([_nrows.remote(t) for t in blocks]))
    if total == 0:
        return rd.from_arrow(_RANK_SCHEMA.empty_table())
    if total <= small_graph_limit:
        return rd.from_arrow_refs(
            [_pr_local.remote(
                src, dst, weight, iters, scale, damping_num, damping_den,
                init_ranks, *blocks
            )]
        )
    if num_partitions is None:
        num_partitions = min(
            shuffle_partitions(edges_ds), total * 2 // _EDGE_ROWS_PER_PART + 1
        )
    P = max(2, num_partitions)
    edge_shards = [
        _pr_scatter.options(num_returns=P).remote(blk, src, dst, weight, P)
        for blk in blocks
    ]
    node_shards = [
        _pr_node_scatter.options(num_returns=P).remote(blk, src, dst, P)
        for blk in blocks
    ]
    edges, degs = [], []
    for p in range(P):
        e, dg = _pr_build_edges.remote(weight is not None, *[s[p] for s in edge_shards])
        edges.append(e)
        degs.append(dg)
    # N = global node count — one tiny metadata round over the per-partition
    # node tables (each node lives in exactly one partition by hash)
    rank_parts = [
        _pr_build_ranks.remote(0, scale, None, *[s[p] for s in node_shards])
        for p in range(P)
    ]
    counts = ray.get([_nrows.remote(t) for t in rank_parts])
    n_total = int(sum(counts))
    if n_total == 0:
        return rd.from_arrow(_RANK_SCHEMA.empty_table())
    # rebuild rank tables with the true N baked into r_0
    rank_parts = [
        _pr_build_ranks.remote(
            n_total, scale, init_ranks, *[s[p] for s in node_shards]
        )
        for p in range(P)
    ]
    for _ in range(iters):
        msg_lists = [
            _pr_messages.options(num_returns=P).remote(edges[p], degs[p], rank_parts[p], P)
            for p in range(P)
        ]
        rank_parts = [
            _pr_update.remote(
                rank_parts[p], n_total, scale, damping_num, damping_den,
                *[ml[p] for ml in msg_lists],
            )
            for p in range(P)
        ]
    return rd.from_arrow_refs(rank_parts)
