"""Relational reference pipelines over the TPC-H-ish driver tables.

The engine's join-strategy family on a classic fact ⨝ dimension ⨝ tiny-dim
chain (orders ⨝ customer ⨝ nation), written the way it must run at 100 TB:

* **pre-aggregate the fact side to key granularity map-side** — a per-batch
  combiner collapses orders to one (custkey, Σcents, n) row per key per
  batch before anything is exchanged;
* **co-partition fact + dimension with ONE tagged-union groupby** — after
  the fact side is ≤ 1 row per key, an equi-join is expressible as a single
  hash aggregate over the union of both (schema-aligned) sides: the
  dimension contributes the attribute via ``Max`` (unique-key tables make
  it exact), the fact side contributes the measures via ``Sum``.  One
  all-to-all instead of a join actor-pool pair — Ray Data's builtin
  ``Dataset.join`` exists (doc_dup_stats ``strategy='join'`` uses it) but a
  full hash-join pool is pure overhead once one side is key-reduced;
* **broadcast the tiny dimension** — nation (25 rows) ships once via
  ``ray.put`` and resolves map-side.

Uniqueness assumption (documented, TPC-H PK): customer has one row per
c_custkey; a duplicated dimension key would need the join fallback.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from lucene_plugin_ray.sources.reader import read_parquet_clean

__all__ = ["revenue_by_nation"]


def revenue_by_nation(sf_dir: str) -> pa.Table:
    """Order revenue rolled up to the customer's nation: for every nation,
    the number of orders placed by its customers and their total price in
    exact integer cents.

    Output: (n_name, n_orders, revenue_cents), sorted by n_name."""
    from ray.data.aggregate import Max, Sum

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    customer = read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )

    def _fact_partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(batch["o_totalprice"], 100.0)), pa.int64()
        )
        t = pa.table(
            {"custkey": batch["o_custkey"].combine_chunks(), "cents": cents}
        )
        agg = t.group_by("custkey").aggregate([("cents", "sum"), ([], "count_all")])
        n = agg.num_rows
        return pa.table(
            {
                "custkey": pc.cast(agg["custkey"], pa.int64()),
                "nationkey": pa.nulls(n, pa.int32()),
                "cents": pc.cast(agg["cents_sum"], pa.int64()),
                "n_orders": pc.cast(agg["count_all"], pa.int64()),
            }
        )

    def _dim_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "custkey": pc.cast(batch["c_custkey"], pa.int64()),
                "nationkey": pc.cast(batch["c_nationkey"], pa.int32()),
                "cents": pa.nulls(n, pa.int64()),
                "n_orders": pa.nulls(n, pa.int64()),
            }
        )

    tagged = orders.map_batches(
        _fact_partial, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        customer.map_batches(_dim_rows, batch_format="pyarrow", zero_copy_batch=True)
    )
    per_cust = tagged.groupby("custkey").aggregate(
        Max("nationkey", alias_name="nationkey"),
        Sum("cents", alias_name="cents"),
        Sum("n_orders", alias_name="n_orders"),
    )

    # tiny-dim broadcast: nationkey → n_name, resolved map-side
    nation = pa.concat_tables(
        b
        for b in read_parquet_clean(
            f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
        ).iter_batches(batch_format="pyarrow")
    ).sort_by("n_nationkey")
    nk = nation["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    nation_ref = ray.put((nk, nation["n_name"].combine_chunks()))

    def _resolve(batch: pa.Table) -> pa.Table:
        keys, names = ray.get(nation_ref)
        # inner-join semantics: drop custkeys missing a dimension row
        # (nationkey null) and customers with no orders (measures null)
        ok = pc.and_(batch["nationkey"].is_valid(), batch["cents"].is_valid())
        batch = batch.filter(ok)
        nkv = (
            pc.cast(batch["nationkey"], pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        pos = np.searchsorted(keys, nkv)
        if nkv.size and not (
            (pos < keys.size).all() and (keys[np.minimum(pos, keys.size - 1)] == nkv).all()
        ):
            raise ValueError("customer references a nationkey absent from nation")
        t = pa.table(
            {
                "n_name": names.take(pa.array(pos, type=pa.int64())),
                "n_orders": pc.cast(batch["n_orders"], pa.int64()),
                "revenue_cents": pc.cast(batch["cents"], pa.int64()),
            }
        )
        agg = t.group_by("n_name").aggregate(
            [("n_orders", "sum"), ("revenue_cents", "sum")]
        )
        return pa.table(
            {
                "n_name": agg["n_name"].combine_chunks(),
                "n_orders": pc.cast(agg["n_orders_sum"], pa.int64()),
                "revenue_cents": pc.cast(agg["revenue_cents_sum"], pa.int64()),
            }
        )

    folded = (
        per_cust.map_batches(_resolve, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(
            Sum("n_orders", alias_name="n_orders_f"),
            Sum("revenue_cents", alias_name="revenue_f"),
        )
    )
    tables = [b for b in folded.iter_batches(batch_format="pyarrow")]
    empty = pa.table(
        {
            "n_name": pa.array([], pa.string()),
            "n_orders": pa.array([], pa.int64()),
            "revenue_cents": pa.array([], pa.int64()),
        }
    )
    if not tables:
        return empty
    t = pa.concat_tables(tables)
    return pa.table(
        {
            "n_name": t["n_name"].combine_chunks(),
            "n_orders": pc.cast(t["n_orders_f"], pa.int64()),
            "revenue_cents": pc.cast(t["revenue_f"], pa.int64()),
        }
    ).sort_by("n_name")
