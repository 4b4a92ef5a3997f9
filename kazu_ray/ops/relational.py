"""Relational / streaming-shaped operators over the testdata tables.

These demonstrate the engine's wide-operation discipline on tables that
actually scale with sf (lineitem/orders/events):

* pruned-read aggregates — ``columns=[...]`` at the read, per-batch
  partial aggregation (combiner), then a small ``groupby`` over partials.
* broadcast hash join — small side (customer/nation) ``ray.put`` once,
  probed per batch; no shuffle.
* sessionization / tumbling windows over the ``events`` log —
  ``groupby(user).map_groups`` over ts-sorted groups (Ray Data has no
  event-time windows; the ordering assumption is per-group sort, see
  ray_guide.md "Streaming-shaped workloads").

Every function returns a Dataset/DataFrame whose column names match the
DuckDB oracle in ``__ray_entry__.oracle_sql``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: pruned read → partial agg per batch → small groupby."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        revenue = pc.multiply(batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        batch = batch.append_column("revenue", revenue)
        df = batch.to_pandas()
        out = (
            df.groupby(["l_returnflag", "l_linestatus"], as_index=False)
            .agg(
                sum_qty=("l_quantity", "sum"),
                sum_base_price=("l_extendedprice", "sum"),
                sum_revenue=("revenue", "sum"),
                count_order=("l_quantity", "size"),
            )
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price", alias_name="sum_base_price"),
            Sum("sum_revenue", alias_name="sum_revenue"),
            Sum("count_order", alias_name="count_order"),
        )
    )

    def _round(batch: pa.Table) -> pa.Table:
        for col in ("sum_qty", "sum_base_price", "sum_revenue"):
            batch = batch.set_column(
                batch.column_names.index(col), col, pc.round(batch[col], 2)
            )
        return batch

    return agg.map_batches(_round, batch_format="pyarrow")


def revenue_by_segment(sf_dir: str):
    """orders ⋈ customer as a broadcast map-side hash join."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    lookup = dict(zip(cust["c_custkey"].to_pylist(), cust["c_mktsegment"].to_pylist()))
    lookup_ref = ray.put(lookup) if ray.is_initialized() else lookup

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    class JoinProbe:
        def __init__(self, ref):
            import ray as _ray

            lookup = _ray.get(ref) if not isinstance(ref, dict) else ref
            # vectorized probe: pandas map over a prebuilt Series (C loop)
            self.lookup = pd.Series(lookup)

        def __call__(self, batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df["c_mktsegment"] = df["o_custkey"].map(self.lookup)
            partial = df.groupby("c_mktsegment", as_index=False).agg(
                revenue=("o_totalprice", "sum"), n_orders=("o_totalprice", "size")
            )
            return pa.Table.from_pandas(partial, preserve_index=False)

    agg = (
        orders.map_batches(
            JoinProbe,
            fn_constructor_args=(lookup_ref,),
            batch_format="pyarrow",
            batch_size=65536,
            concurrency=(1, 4),
        )
        .groupby("c_mktsegment")
        .aggregate(Sum("revenue", alias_name="revenue"), Sum("n_orders", alias_name="n_orders"))
    )
    return agg.map_batches(
        lambda t: t.set_column(
            t.column_names.index("revenue"), "revenue", pc.round(t["revenue"], 2)
        ),
        batch_format="pyarrow",
    )


def events_by_type(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = df.groupby("event_type", as_index=False).agg(
            total_value=("value", "sum"), n=("value", "size")
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("event_type")
        .aggregate(Sum("total_value", alias_name="total_value"), Sum("n", alias_name="n"))
    )
    return agg.map_batches(
        lambda t: t.set_column(
            t.column_names.index("total_value"), "total_value", pc.round(t["total_value"], 2)
        ),
        batch_format="pyarrow",
    )


def hourly_event_counts(sf_dir: str):
    """Tumbling 1h window = truncate + partial agg + groupby (no
    watermark semantics needed for a batch log)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        hours = pc.floor_temporal(batch["ts"], unit="hour")
        t = pa.table({"hour": hours, "event_type": batch["event_type"]})
        df = t.to_pandas()
        out = df.groupby(["hour", "event_type"], as_index=False).agg(n=("event_type", "size"))
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["hour", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
    )


def sessionize(sf_dir: str, gap_minutes: int = 30):
    """Per-user session count; a new session starts when the gap
    exceeds ``gap_minutes``. Vectorized across ALL of a hash bucket's
    users at once (``exchange_groups``; a per-user ``map_groups`` paid
    Python dispatch per user): one sort by (user, ts), one diff, one
    boolean reduction — a session boundary is a user change or an
    over-gap step, counted per user with a single groupby-sum."""
    import ray.data as rd

    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    gap_us = gap_minutes * 60 * 1_000_000

    def per_bucket(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["user_id", "ts"], kind="mergesort")
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        uid = df["user_id"].to_numpy()
        new_user = np.empty(len(df), dtype=bool)
        new_user[0:1] = True
        new_user[1:] = uid[1:] != uid[:-1]
        gap_break = np.empty(len(df), dtype=bool)
        gap_break[0:1] = False
        gap_break[1:] = (ts[1:] - ts[:-1]) > gap_us
        df["new_session"] = (new_user | gap_break).astype(np.int64)
        g = df.groupby("user_id", as_index=False).agg(
            n_sessions=("new_session", "sum"), n_events=("new_session", "size")
        )
        return pa.table(
            {
                "user_id": pa.array(g["user_id"], type=pa.int64()),
                "n_sessions": pa.array(g["n_sessions"], type=pa.int64()),
                "n_events": pa.array(g["n_events"], type=pa.int64()),
            }
        )

    empty = pa.table(
        {
            "user_id": pa.array([], type=pa.int64()),
            "n_sessions": pa.array([], type=pa.int64()),
            "n_events": pa.array([], type=pa.int64()),
        }
    )
    return exchange_groups(ds, ["user_id"], shuffle_parts(), per_bucket, empty)


def top_parts_by_retail(sf_dir: str, k: int = 20):
    """Global top-k via sort + limit (small k ⇒ cheap)."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name", "p_retailprice"]
    )
    return ds.sort(["p_retailprice", "p_partkey"], descending=[True, False]).limit(k)


def segment_ship_priority(sf_dir: str, segment: str = "BUILDING"):
    """TPC-H Q3 shape: three-table join as two chained broadcast probes
    (customer and orders side both fit in memory at any realistic scale
    ratio; lineitem — the big side — streams and is never shuffled)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    seg_keys = pc.filter(
        cust["c_custkey"], pc.equal(cust["c_mktsegment"], segment)
    ).combine_chunks()
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    seg_orderkeys = pc.filter(
        orders["o_orderkey"], pc.is_in(orders["o_custkey"], value_set=seg_keys)
    ).combine_chunks()
    lookup_ref = ray.put(seg_orderkeys) if ray.is_initialized() else seg_orderkeys

    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    class Probe:
        def __init__(self, ref):
            import ray as _ray

            self.keys = _ray.get(ref) if not isinstance(ref, (pa.Array, pa.ChunkedArray)) else ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            # semi-join as a vectorized Arrow membership test (no per-row
            # Python dict probe)
            batch = batch.filter(pc.is_in(batch["l_orderkey"], value_set=self.keys))
            if batch.num_rows == 0:
                return pa.table(
                    {
                        "l_orderkey": pa.array([], type=pa.int64()),
                        "revenue": pa.array([], type=pa.float64()),
                    }
                )
            rev = pc.multiply(
                batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
            )
            df = pa.table({"l_orderkey": batch["l_orderkey"], "revenue": rev}).to_pandas()
            out = df.groupby("l_orderkey", as_index=False).agg(revenue=("revenue", "sum"))
            return pa.Table.from_pandas(out, preserve_index=False)

    agg = (
        line.map_batches(
            Probe,
            fn_constructor_args=(lookup_ref,),
            batch_format="pyarrow",
            batch_size=65536,
            concurrency=(1, 4),
        )
        .groupby("l_orderkey")
        .aggregate(Sum("revenue", alias_name="revenue"))
    )
    # fixed-point output (NOTES.md rule): revenue is a 4-decimal quantity
    # (2-dec price x 2-dec discount), so round(x*10000)::BIGINT is the
    # resolution at which true values are integers and float summation-order
    # error (~1e-5 in these units) can never flip the rounding
    return agg.map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "revenue_x10k": pc.cast(
                    pc.round(pc.multiply(t["revenue"], pa.scalar(10000.0))), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )


def sliding_event_counts(sf_dir: str, window_minutes: int = 60, slide_minutes: int = 30):
    """Sliding window = each event assigned to window_minutes/slide_minutes
    buckets via a flat map, then tumbling aggregation — the batch-engine
    restatement of a sliding window (no watermarks needed on a bounded
    log)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
    n_windows = window_minutes // slide_minutes
    slide_us = slide_minutes * 60 * 1_000_000

    def assign(batch: pa.Table) -> pa.Table:
        import pandas as pd

        ts = batch["ts"].to_pandas().astype("int64")  # µs since epoch
        types = batch["event_type"].to_pylist()
        starts, etypes = [], []
        for t, ev in zip(ts, types):
            base = (t // slide_us) * slide_us
            for w in range(n_windows):
                starts.append(base - w * slide_us)
                etypes.append(ev)
        df = pd.DataFrame({"window_start_us": starts, "event_type": etypes})
        out = df.groupby(["window_start_us", "event_type"], as_index=False).agg(
            n=("event_type", "size")
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = (
        ds.map_batches(assign, batch_format="pyarrow", batch_size=65536)
        .groupby(["window_start_us", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        ws = pc.cast(batch["window_start_us"], pa.timestamp("us"))
        return pa.table(
            {"window_start": ws, "event_type": batch["event_type"], "n": batch["n"]}
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def user_funnel(sf_dir: str, steps: tuple = ("view", "click", "purchase")):
    """Sequential funnel over the events log: for every user, the depth
    of the ordered step chain they completed — step i+1 counts only if
    it happens STRICTLY AFTER the earliest qualifying step i (earliest-
    chain semantics, the standard funnel definition). Output: one row
    per user, ``funnel_depth`` in 0..len(steps) — all-integer, so the
    driver hash compare is exact.

    Scale shape: a user's events are co-located by the adaptive hash
    exchange; inside a bucket each step is ONE vectorized pandas pass
    (filter step type → mask ts > user's previous-step time via an
    index-aligned map → groupby-min) — no per-user Python loop, no
    global sort.
    """
    import ray.data as rd

    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"]
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        users = df["user_id"].drop_duplicates()
        depth = pd.Series(0, index=users, dtype="int64")
        prev: pd.Series | None = None  # user -> earliest chain time so far
        for step in steps:
            sub = df[df["event_type"] == step]
            if prev is not None:
                bound = sub["user_id"].map(prev)
                sub = sub[bound.notna() & (sub["ts"] > bound)]
            cur = sub.groupby("user_id")["ts"].min()
            depth.loc[cur.index] += 1
            prev = cur
        out = pd.DataFrame(
            {"user_id": depth.index.to_numpy(), "funnel_depth": depth.to_numpy()}
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    empty = pa.table(
        {
            "user_id": pa.array([], type=pa.int64()),
            "funnel_depth": pa.array([], type=pa.int64()),
        }
    )
    return exchange_groups(ds, ["user_id"], shuffle_parts(), per_bucket, empty)


def retention_cohorts(sf_dir: str):
    """Monthly retention cohorts: cohort(user) = month of the user's
    first event; for every (cohort_month, month_offset) count the
    distinct cohort users active that many months later — the standard
    product-analytics retention triangle, expressed combiner-first:

    1. per-batch distinct (user_id, month) combiner bounds the exchange
       by users × active-months instead of events;
    2. ONE user-keyed hash exchange derives each user's cohort (min
       month) and emits (cohort, offset) rows — per-user output is its
       distinct-month count, so hot users cost their month set, never
       their event count;
    3. per-batch count partials meet in a months²-bounded groupby.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def month_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_pandas(),
                "month": t["ts"].to_pandas().dt.to_period("M"),
            }
        ).drop_duplicates()
        return pa.table(
            {
                "user_id": pa.array(df["user_id"].to_numpy(np.int64)),
                # months as int64 ordinal (year*12+month) — cheap to
                # exchange, decoded once at the end
                "m": pa.array(
                    (df["month"].dt.year * 12 + df["month"].dt.month).to_numpy(
                        np.int64
                    )
                ),
            }
        )

    def cohort_bucket(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates()
        cohort = df.groupby("user_id")["m"].transform("min")
        out = (
            pd.DataFrame(
                {"cohort_m": cohort, "offset": df["m"] - cohort}
            )
            .groupby(["cohort_m", "offset"], as_index=False)
            .size()
        )
        return pa.table(
            {
                "cohort_m": pa.array(out["cohort_m"].to_numpy(np.int64)),
                "month_offset": pa.array(out["offset"].to_numpy(np.int64)),
                "n_users": pa.array(out["size"].to_numpy(np.int64)),
            }
        )

    partials = exchange_groups(
        ds.map_batches(month_partial, batch_format="pyarrow", batch_size=65536),
        ["user_id"],
        shuffle_parts(),
        cohort_bucket,
        pa.table(
            {
                "cohort_m": pa.array([], type=pa.int64()),
                "month_offset": pa.array([], type=pa.int64()),
                "n_users": pa.array([], type=pa.int64()),
            }
        ),
    )
    agg = partials.groupby(["cohort_m", "month_offset"]).aggregate(
        Sum("n_users", alias_name="n_users")
    )

    def decode(t: pa.Table) -> pa.Table:
        m = t["cohort_m"].to_numpy()
        y, mo = (m - 1) // 12, (m - 1) % 12 + 1
        ts = pd.to_datetime(
            {"year": y, "month": mo, "day": np.ones(len(m), dtype=np.int64)}
        )
        return pa.table(
            {
                "cohort_month": pa.array(ts, type=pa.timestamp("us")),
                "month_offset": t["month_offset"].cast(pa.int64()),
                "n_users": t["n_users"].cast(pa.int64()),
            }
        )

    return agg.map_batches(decode, batch_format="pyarrow")
