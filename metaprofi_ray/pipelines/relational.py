"""Generic relational operators over the driver's TPC-H-ish tables.

These exercise the engine's general Dataset surface (groupby/aggregate,
broadcast join, sort/limit, windowed and sessionized event aggregation) —
every entry has an exact DuckDB oracle in ``__ray_entry__.oracle_sql``.

Conventions shared with the oracles:
* float aggregates are rounded (2 or 4 dp) so double-summation order
  cannot flip the driver's value hash;
* top-k sorts carry a deterministic tie-break key;
* all columns are named identically to the SQL aliases.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..functions.numeric import round_half_away
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def _pq(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def q1_pricing_summary(sf_dir: str) -> rd.Dataset:
    """TPC-H Q1-style pricing summary.

    Combiner pattern (partial aggregation before the shuffle): each batch
    pre-aggregates to ~6 partial rows inside ``map_batches``, so the
    groupby shuffle moves O(blocks × groups) rows instead of every
    lineitem row.  Means are finalized as sum/count after the merge."""
    ds = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount",
        ],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df["disc_price"] = df["l_extendedprice"] * (1.0 - df["l_discount"])
        return df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"),
            sum_disc=("l_discount", "sum"),
            count_order=("l_quantity", "size"),
        )

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=None)
    agg = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_price", alias_name="sum_base_price"),
        Sum("sum_disc_price", alias_name="sum_disc_price"),
        Sum("sum_disc", alias_name="sum_disc"),
        Sum("count_order", alias_name="count_order"),
    )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["avg_qty"] = round_half_away(df["sum_qty"] / df["count_order"], 4)
        df["avg_disc"] = round_half_away(df["sum_disc"] / df["count_order"], 4)
        for c in ["sum_qty", "sum_base_price", "sum_disc_price"]:
            df[c] = round_half_away(df[c], 2)
        return df[
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
             "sum_disc_price", "avg_qty", "avg_disc", "count_order"]
        ]

    return agg.map_batches(fin, batch_format="pandas")


def top_customers(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Revenue top-k: groupby-sum over orders, broadcast join of the customer
    dimension (ray.put once, looked up per batch — no shuffle join), sort
    with deterministic tie-break, limit k."""
    orders = rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    per_cust = orders.groupby("o_custkey").aggregate(
        Sum("o_totalprice", alias_name="total_spent")
    )
    cust = pd.read_parquet(_pq(sf_dir, "customer"), columns=["c_custkey", "c_name"])
    name_ref = ray.put(dict(zip(cust.c_custkey, cust.c_name)))

    class AttachName:
        def __init__(self):
            self.names = ray.get(name_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df["c_name"] = df["o_custkey"].map(self.names)
            return df

    joined = per_cust.map_batches(
        AttachName, batch_format="pandas", concurrency=(1, 8)
    )
    top = joined.sort(["total_spent", "o_custkey"], descending=[True, False]).limit(k)
    df = top.to_pandas()
    df["total_spent"] = round_half_away(df["total_spent"], 2)
    return df[["o_custkey", "c_name", "total_spent"]]


def events_hourly(sf_dir: str) -> rd.Dataset:
    """Tumbling 1-hour window per event_type: count + rounded value sum.
    Window = truncate-to-hour key inside map_batches, then grouped aggregate
    (window key derived per batch, so the shuffle input is pre-bucketed)."""
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["ts", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # combiner: pre-aggregate per batch so the shuffle moves
        # O(blocks x windows) rows, not every event
        df["hour"] = df["ts"].dt.floor("h")
        return df.groupby(["event_type", "hour"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )

    agg = (
        ds.map_batches(partial, batch_format="pandas", batch_size=None)
        .groupby(["event_type", "hour"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value", alias_name="sum_value"),
        )
    )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["sum_value"] = round_half_away(df["sum_value"], 2)
        return df

    return agg.map_batches(fin, batch_format="pandas")


def events_sessionize(sf_dir: str, gap_minutes: int = 30) -> rd.Dataset:
    """Session windows per user (gap > 30 min starts a new session):
    ``groupby(user).map_groups`` over ts-sorted groups — the engine's
    session-window operator (no native watermarks in Ray Data; ordering
    contract: map_groups receives each full group, sorted here)."""
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].sort_values()
        starts = (ts.diff() > gap).sum() + 1
        return pd.DataFrame(
            {"user_id": [g["user_id"].iloc[0]], "n_sessions": [int(starts)],
             "n_events": [len(g)]}
        )

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


def supplier_nation_rollup(sf_dir: str) -> pd.DataFrame:
    """Three-way dimension join (supplier ⨝ nation ⨝ region) then rollup —
    all dimension tables are small, so both joins are broadcast lookups."""
    sup = rd.read_parquet(_pq(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey", "s_acctbal"])
    nation = pd.read_parquet(_pq(sf_dir, "nation"))
    region = pd.read_parquet(_pq(sf_dir, "region"))
    nref = ray.put(
        nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")[
            ["n_nationkey", "n_name", "r_name"]
        ]
    )

    class Attach:
        def __init__(self):
            self.dim = ray.get(nref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            return df.merge(self.dim, left_on="s_nationkey", right_on="n_nationkey")

    joined = sup.map_batches(Attach, batch_format="pandas", concurrency=(1, 8))
    agg = joined.groupby(["r_name", "n_name"]).aggregate(
        Count(alias_name="n_suppliers"),
        Sum("s_acctbal", alias_name="total_acctbal"),
    )
    df = agg.to_pandas()
    df["total_acctbal"] = round_half_away(df["total_acctbal"], 2)
    return df


def part_brand_stats(sf_dir: str) -> rd.Dataset:
    """Per-brand min/max/avg retail price (multi-aggregate groupby)."""
    ds = rd.read_parquet(_pq(sf_dir, "part"), columns=["p_brand", "p_retailprice", "p_size"])
    agg = ds.groupby("p_brand").aggregate(
        Count(alias_name="n_parts"),
        Min("p_retailprice", alias_name="min_price"),
        Max("p_retailprice", alias_name="max_price"),
        Mean("p_retailprice", alias_name="avg_price"),
        Sum("p_size", alias_name="sum_size"),
    )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["avg_price"] = round_half_away(df["avg_price"], 4)
        return df

    return agg.map_batches(fin, batch_format="pandas")


def order_priority_counts(sf_dir: str) -> rd.Dataset:
    """Filter + grouped count (predicate pushdown exercised at the read)."""
    import pyarrow.compute as pc

    ds = rd.read_parquet(
        _pq(sf_dir, "orders"),
        columns=["o_orderpriority", "o_orderstatus"],
        filter=(pc.field("o_orderstatus") == "F"),
    )
    return ds.groupby("o_orderpriority").aggregate(Count(alias_name="n_orders"))


def events_prior_orders(sf_dir: str) -> rd.Dataset:
    """Point-in-time (as-of/range) join: for each event, the latest order
    date and count of orders placed by its customer bucket
    (``o_custkey % 150 == user_id``) at or before the event timestamp.

    Orders (small side) are broadcast as per-bucket SORTED date arrays;
    each event batch answers with one ``np.searchsorted`` per bucket — the
    broadcast as-of join pattern (small side via ray.put); no shuffle.
    At ~100x this scale the small side stops being small: cut over to a
    date-bucketed partitioned merge-asof (co-partition both sides on
    custkey bucket, per-bucket sorted merge) instead of one broadcast."""
    orders = pd.read_parquet(_pq(sf_dir, "orders"), columns=["o_custkey", "o_orderdate"])
    orders["bucket"] = orders["o_custkey"] % 150
    by_bucket = {
        int(b): np.sort(g["o_orderdate"].to_numpy())
        for b, g in orders.groupby("bucket")
    }
    oref = ray.put(by_bucket)

    class AsOf:
        def __init__(self):
            self.orders = ray.get(oref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            out_last = np.empty(len(df), dtype="datetime64[us]")
            out_n = np.zeros(len(df), dtype=np.int64)
            ts = df["ts"].to_numpy()
            users = df["user_id"].to_numpy()
            for b in np.unique(users):
                dates = self.orders.get(int(b))
                sel = users == b
                if dates is None:
                    out_last[sel] = np.datetime64("NaT")
                    continue
                idx = np.searchsorted(dates, ts[sel], side="right")
                out_n[sel] = idx
                has = idx > 0
                last = np.full(sel.sum(), np.datetime64("NaT"), dtype="datetime64[us]")
                last[has] = dates[idx[has] - 1]
                out_last[sel] = last
            return pd.DataFrame(
                {
                    "event_id": df["event_id"].to_numpy(),
                    "last_order_date": out_last,
                    "n_prior_orders": out_n,
                }
            )

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "ts", "user_id"])
    return ds.map_batches(AsOf, batch_format="pandas", concurrency=(1, 4))


def events_prior_orders_partitioned(sf_dir: str, n_buckets: int = 16) -> pd.DataFrame:
    """The 100×-scale form of ``events_prior_orders``: a CO-PARTITIONED
    merge-asof with no broadcast.  Both sides stream through one
    ``groupby(kb)`` on a coarse hash of the join key (``user_id`` /
    ``o_custkey % 150``); inside each bucket a vectorized per-key sorted
    merge (np.searchsorted) answers every event.  Shuffle volume is one
    pass of each side — the shape that survives when the orders side no
    longer fits a broadcast.  Same DuckDB oracle as the broadcast variant
    (identical output, property-checked by the driver)."""
    orders = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_custkey", "o_orderdate"]
    )
    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "ts", "user_id"]
    )

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        ub = (df["o_custkey"].to_numpy() % 150).astype(np.int64)
        return pd.DataFrame(
            {
                "kb": ub % n_buckets,
                "tag": np.zeros(len(df), dtype=np.int8),
                "ub": ub,
                "ts": df["o_orderdate"].to_numpy().astype("datetime64[us]"),
                "event_id": np.full(len(df), -1, dtype=np.int64),
            }
        )

    def tag_events(df: pd.DataFrame) -> pd.DataFrame:
        ub = df["user_id"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "kb": ub % n_buckets,
                "tag": np.ones(len(df), dtype=np.int8),
                "ub": ub,
                "ts": df["ts"].to_numpy().astype("datetime64[us]"),
                "event_id": df["event_id"].to_numpy().astype(np.int64),
            }
        )

    def merge_asof_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = {"event_id": [], "last_order_date": [], "n_prior_orders": []}
        o = g[g["tag"] == 0]
        e = g[g["tag"] == 1]
        if len(e) == 0:
            return pd.DataFrame(
                {"event_id": pd.Series([], dtype="int64"),
                 "last_order_date": pd.Series([], dtype="datetime64[us]"),
                 "n_prior_orders": pd.Series([], dtype="int64")}
            )
        dates_by_ub = {
            int(ub): np.sort(sub["ts"].to_numpy())
            for ub, sub in o.groupby("ub", sort=False)
        }
        eub = e["ub"].to_numpy()
        ets = e["ts"].to_numpy()
        eids = e["event_id"].to_numpy()
        last = np.full(len(e), np.datetime64("NaT"), dtype="datetime64[us]")
        n = np.zeros(len(e), dtype=np.int64)
        for ub in np.unique(eub):
            sel = eub == ub
            dates = dates_by_ub.get(int(ub))
            if dates is None or dates.size == 0:
                continue
            idx = np.searchsorted(dates, ets[sel], side="right")
            n[sel] = idx
            has = idx > 0
            vals = np.full(int(sel.sum()), np.datetime64("NaT"), dtype="datetime64[us]")
            vals[has] = dates[idx[has] - 1]
            last[sel] = vals
        return pd.DataFrame(
            {"event_id": eids, "last_order_date": last, "n_prior_orders": n}
        )

    both = orders.map_batches(tag_orders, batch_format="pandas").union(
        events.map_batches(tag_events, batch_format="pandas")
    )
    out = (
        both.groupby("kb")
        .map_groups(merge_asof_bucket, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("event_id").reset_index(drop=True)


def customers_without_orders(sf_dir: str) -> pd.DataFrame:
    """Broadcast ANTI join: customers with no URGENT-priority order (the
    filtered key set of the big side is broadcast — the standard
    semi/anti-join-by-broadcast shape; filter pushed down at the read)."""
    import pyarrow.compute as pc

    okeys = (
        rd.read_parquet(
            _pq(sf_dir, "orders"),
            columns=["o_custkey", "o_orderpriority"],
            filter=(pc.field("o_orderpriority") == "1-URGENT"),
        )
        .select_columns(["o_custkey"])
        .to_pandas()
    )
    key_ref = ray.put(set(okeys["o_custkey"].tolist()))

    class Anti:
        def __init__(self):
            self.keys = ray.get(key_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            return df[~df["c_custkey"].isin(self.keys)][["c_custkey", "c_name"]]

    ds = rd.read_parquet(_pq(sf_dir, "customer"), columns=["c_custkey", "c_name"])
    out = ds.map_batches(Anti, batch_format="pandas", concurrency=(1, 4)).to_pandas()
    if out.empty:  # keep a stable schema even when the anti join is empty
        return pd.DataFrame(
            {"c_custkey": pd.Series([], dtype="int64"),
             "c_name": pd.Series([], dtype="object")}
        )
    return out


def events_running_value(sf_dir: str) -> rd.Dataset:
    """Per-user running sum over event time (cumulative window function):
    ``groupby(user).map_groups`` over (ts, event_id)-sorted groups — the
    deterministic tie-break makes the cumulative doubles bit-identical to
    the SQL window oracle."""
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"])

    def running(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        g["running_value"] = round_half_away(g["value"].cumsum(), 2)
        return g[["event_id", "user_id", "running_value"]]

    return ds.groupby("user_id").map_groups(running, batch_format="pandas")


def top_parts_per_brand(sf_dir: str, n: int = 3) -> rd.Dataset:
    """Top-N-per-group window operator: the 3 priciest parts of every
    brand (``groupby(brand).map_groups`` head with deterministic
    tie-break — the per-partition ``row_number() <= n`` pattern)."""
    ds = rd.read_parquet(
        _pq(sf_dir, "part"), columns=["p_brand", "p_partkey", "p_retailprice"]
    )

    def topn(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(
            ["p_retailprice", "p_partkey"], ascending=[False, True]
        ).head(n)

    return ds.groupby("p_brand").map_groups(topn, batch_format="pandas")


def distinct_segments(sf_dir: str) -> pd.DataFrame:
    """Dataset-level distinct (``ds.unique``-class operator, a shuffle)."""
    ds = rd.read_parquet(_pq(sf_dir, "customer"), columns=["c_mktsegment"])
    vals = sorted(ds.unique("c_mktsegment"))
    return pd.DataFrame({"c_mktsegment": vals})


def lineitem_filter_project(sf_dir: str) -> rd.Dataset:
    """Vectorized filter + projection + computed column — the minimal
    map/filter/project chain, column-pruned at the read."""
    import pyarrow.compute as pc

    ds = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_quantity"], 45.0))
        # raw double expression — identical IEEE ops to the SQL oracle, so
        # the values hash-match without any rounding
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("revenue", rev).select(
            ["l_orderkey", "l_linenumber", "l_quantity", "revenue"]
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
