"""Generic relational coverage on the driver's TPC-H-ish tables.

The reference has no relational operators (SURVEY.md §2.4: lookups only),
but the engine's Dataset surface must still prove groupby/aggregate,
broadcast join, filter/projection and sort/limit work Ray-Data-first —
these queries are the DuckDB-checkable evidence.  Patterns:

- aggregates go through Ray Data's hash groupby (map-side partial
  aggregation is built into ray.data.aggregate.AggregateFn);
- the small side of every join is broadcast (ray.put + in-batch lookup),
  never shuffled — customer/nation/region are the classic small sides;
- float aggregates are emitted as scaled int64 (``floor(x*scale + 0.5)``,
  the exact same formula in the DuckDB oracle) because float rounding is NOT
  portable: pyarrow rounds half-even, DuckDB half-away, and distributed
  summation order perturbs the last ulp — integers hash identically or not
  at all.  Columns carry a ``_c2`` (cents) / ``_e4`` / ``_e5`` suffix naming
  the scale.  Raw pass-through floats (no arithmetic) stay floats: both
  sides read the identical parquet doubles.
"""

from __future__ import annotations

from typing import Dict

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


from .combine import col_type, combine_partials, sort_table


def scaled_int(col: pa.ChunkedArray, scale: int) -> pa.ChunkedArray:
    """floor(x*scale + 0.5) as int64 — the portable quantization shared with
    the DuckDB oracles (CAST(floor(x*scale + 0.5) AS BIGINT))."""
    return pc.floor(pc.add(pc.multiply(col.cast(pa.float64()), float(scale)), 0.5)).cast(
        pa.int64()
    )


def _scale_cols(ds: rd.Dataset, cols: Dict[str, int], rename: Dict[str, str]) -> rd.Dataset:
    def scaler(batch: pa.Table) -> pa.Table:
        for c, scale in cols.items():
            idx = batch.column_names.index(c)
            batch = batch.set_column(idx, rename.get(c, c), scaled_int(batch.column(c), scale))
        return batch

    return ds.map_batches(scaler, batch_format="pyarrow", zero_copy_batch=True)


def pricing_summary(lineitem: rd.Dataset) -> rd.Dataset:
    """TPC-H Q1-flavored groupby: per (returnflag, linestatus) sums/avgs.

    Map-side partial aggregation: each block collapses to ≤ |groups| rows
    via Arrow's C++ ``Table.group_by`` BEFORE the shuffle, so the global
    groupby moves a handful of rows per block instead of the whole table —
    the pre-aggregate-inside-map_batches pattern every Zipf/low-cardinality
    key aggregate should use at scale."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "l_quantity": batch.column("l_quantity"),
                "l_extendedprice": batch.column("l_extendedprice"),
                "disc_price": pc.multiply(
                    batch.column("l_extendedprice"),
                    pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
                ),
            }
        )
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"), ("disc_price", "sum"), ("l_quantity", "count")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "p_qty", "p_base", "p_disc", "p_cnt"]
        )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "sum_qty": batch.column("sum_qty"),
                "sum_base_price": batch.column("sum_base_price"),
                "sum_disc_price": batch.column("sum_disc_price"),
                "avg_qty": pc.divide(
                    batch.column("sum_qty"), batch.column("count_order").cast(pa.float64())
                ),
                "count_order": batch.column("count_order"),
            }
        )

    partials = lineitem.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # (returnflag, linestatus) has single-digit cardinality → coordinator
    # merge of the distributed partials (ops/combine.py), no AllToAll
    final = combine_partials(
        partials,
        ["l_returnflag", "l_linestatus"],
        [("p_qty", "sum", "sum_qty"), ("p_base", "sum", "sum_base_price"),
         ("p_disc", "sum", "sum_disc_price"), ("p_cnt", "sum", "count_order")],
        schema=pa.schema(
            [("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
             ("p_qty", pa.float64()), ("p_base", pa.float64()),
             ("p_disc", pa.float64()), ("p_cnt", pa.int64())]
        ),
    )
    final = sort_table(
        finalize(final), [("l_returnflag", "ascending"), ("l_linestatus", "ascending")]
    )
    for c, scale, name in (
        ("sum_qty", 100, "sum_qty_c2"),
        ("sum_base_price", 100, "sum_base_price_c2"),
        ("sum_disc_price", 100, "sum_disc_price_c2"),
        ("avg_qty", 10_000, "avg_qty_e4"),
    ):
        idx = final.column_names.index(c)
        final = final.set_column(idx, name, scaled_int(final.column(c), scale))
    return rd.from_arrow(final)


def top_customers(orders: rd.Dataset, customer: rd.Dataset, k: int = 10) -> rd.Dataset:
    """Revenue top-k customers: aggregate → per-partition top-k → join k rows.

    The customer table grows with the scale factor, so it is NOT a broadcast
    side.  Instead: (1) in-batch Arrow partials (custkey, partial revenue),
    (2) ONE manual hash exchange on custkey — each partition finishes its
    keys' sums and emits only its exact top-k, so the driver merges ≤ P×k
    candidate rows instead of sorting the revenue table, (3) a semi-join
    filter over customer pulls exactly the ≤ k matching name rows.  No
    corpus-sized ``ray.get`` anywhere; both distributed passes stream."""
    import numpy as np

    try:
        P = max(2, int(ray.cluster_resources().get("CPU", 4)))
    except Exception:
        P = 4

    def partial(batch: pa.Table) -> pa.Table:
        # map-side combine: one (custkey, partial revenue) row per key per
        # block leaves the task, not the order rows
        g = batch.group_by(["o_custkey"]).aggregate([("o_totalprice", "sum")])
        ck = g.column("o_custkey").cast(pa.int64())
        part = (
            ck.combine_chunks().to_numpy(zero_copy_only=False).view(np.uint64)
            % np.uint64(P)
        ).astype(np.int32)
        return pa.table(
            {
                "c_custkey": ck,
                "p_rev": g.column("o_totalprice_sum"),
                "part": pa.array(part, pa.int32()),
            }
        )

    def local_topk(group: pa.Table) -> pa.Table:
        # a custkey's partials all land in this partition, so the sum is
        # final here and the partition's top-k bounds the global top-k
        g = group.group_by(["c_custkey"]).aggregate([("p_rev", "sum")])
        t = pa.table(
            {
                "c_custkey": g.column("c_custkey"),
                "revenue_c2": scaled_int(g.column("p_rev_sum"), 100),
            }
        )
        order = pc.sort_indices(
            t, sort_keys=[("revenue_c2", "descending"), ("c_custkey", "ascending")]
        )
        return t.take(order[:k])

    # ONE hash exchange (partials → per-partition exact top-k); the driver
    # merges ≤ P×k candidate rows — never a full sort, never the rev table
    cand_tables = [
        t
        for t in ray.get(
            orders.map_batches(partial, batch_format="pyarrow")
            .groupby("part")
            .map_groups(local_topk, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows > 0 and "c_custkey" in t.column_names
    ]
    merged = pa.concat_tables(cand_tables).combine_chunks()
    order = pc.sort_indices(
        merged, sort_keys=[("revenue_c2", "descending"), ("c_custkey", "ascending")]
    )
    top_tbl = merged.take(order[:k])  # exactly k rows
    top_keys = pa.array(top_tbl.column("c_custkey").to_pylist(), pa.int64())

    def semi(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("c_custkey").cast(pa.int64()), value_set=top_keys)
        out = batch.filter(mask)
        return pa.table(
            {
                "c_custkey": out.column("c_custkey").cast(pa.int64()),
                "c_name": out.column("c_name"),
            }
        )

    name_tbl = pa.concat_tables(
        ray.get(customer.map_batches(semi, batch_format="pyarrow").to_arrow_refs())
    )  # ≤ k rows
    names = dict(
        zip(name_tbl.column("c_custkey").to_pylist(), name_tbl.column("c_name").to_pylist())
    )
    keys = top_tbl.column("c_custkey").to_pylist()
    return rd.from_arrow(
        pa.table(
            {
                "c_custkey": top_tbl.column("c_custkey"),
                "c_name": pa.array([names.get(c) for c in keys], pa.string()),
                "revenue_c2": top_tbl.column("revenue_c2"),
            }
        )
    )


def events_by_type(events: rd.Dataset) -> rd.Dataset:
    """Per event_type count + value stats (the events stream table).
    Map-side partials (distributed) + coordinator merge: event_type is a
    bounded-cardinality key, so the global combine is a few rows per block —
    no AllToAll needed (ops/combine.py)."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["event_type"]).aggregate(
            [("value", "count"), ("value", "sum"), ("value", "min"), ("value", "max")]
        )
        return g.rename_columns(["event_type", "p_n", "p_sum", "p_min", "p_max"])

    partials = events.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    final = combine_partials(
        partials,
        ["event_type"],
        [("p_n", "sum", "n"), ("p_sum", "sum", "sum_value"),
         ("p_min", "min", "min_value"), ("p_max", "max", "max_value")],
        schema=pa.schema(
            [("event_type", col_type(events, "event_type")),
             ("p_n", pa.int64()), ("p_sum", pa.float64()),
             ("p_min", pa.float64()), ("p_max", pa.float64())]
        ),
    )
    final = sort_table(final, [("event_type", "ascending")])
    # min/max are raw pass-through doubles (identical parquet bits on both
    # sides); only the order-sensitive sum needs quantizing
    idx = final.column_names.index("sum_value")
    final = final.set_column(idx, "sum_value_c2", scaled_int(final.column("sum_value"), 100))
    return rd.from_arrow(final)


def filter_parts(part: rd.Dataset, min_size: int = 30) -> rd.Dataset:
    """Predicate + projection + sort/limit coverage (prunes columns early)."""

    def fp(batch: pa.Table) -> pa.Table:
        mask = pc.greater_equal(batch.column("p_size"), min_size)
        out = batch.filter(mask)
        return pa.table(
            {
                "p_partkey": out.column("p_partkey"),
                "p_name": out.column("p_name"),
                "p_size": out.column("p_size"),
                "p_retailprice": out.column("p_retailprice"),  # raw pass-through
            }
        )

    return ds_sort(part.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True))


def ds_sort(ds: rd.Dataset) -> rd.Dataset:
    return ds.sort("p_partkey")


def supplier_balance_by_nation(supplier: rd.Dataset, nation: rd.Dataset) -> rd.Dataset:
    """Broadcast-join nation (25 rows) into supplier, then groupby nation
    name — the canonical small-side-lookup-instead-of-shuffle-join."""
    nat_tbl = pa.concat_tables([ray.get(r) for r in nation.to_arrow_refs()])
    names = dict(
        zip(nat_tbl.column("n_nationkey").to_pylist(), nat_tbl.column("n_name").to_pylist())
    )
    names_ref = ray.put(names)

    def partial(batch: pa.Table) -> pa.Table:
        m = ray.get(names_ref)
        t = pa.table(
            {
                "n_name": pa.array(
                    [m.get(k) for k in batch.column("s_nationkey").to_pylist()], pa.string()
                ),
                "s_acctbal": batch.column("s_acctbal"),
            }
        )
        g = t.group_by(["n_name"]).aggregate([("s_acctbal", "count"), ("s_acctbal", "sum")])
        return g.rename_columns(["n_name", "p_n", "p_bal"])

    # 25 nations → map-side partials + coordinator merge (ops/combine.py)
    final = combine_partials(
        supplier.map_batches(partial, batch_format="pyarrow"),
        ["n_name"],
        [("p_n", "sum", "n_suppliers"), ("p_bal", "sum", "total_bal")],
        schema=pa.schema(
            [("n_name", pa.string()), ("p_n", pa.int64()), ("p_bal", pa.float64())]
        ),
    )
    final = sort_table(final, [("n_name", "ascending")])
    idx = final.column_names.index("total_bal")
    final = final.set_column(idx, "total_bal_c2", scaled_int(final.column("total_bal"), 100))
    return rd.from_arrow(final)
