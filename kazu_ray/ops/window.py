"""Per-key window features, exact grouped quantiles, and rollup
aggregates — the window/OLAP shapes the relational suite was missing.

Reference scope note: the reference engine has no window operators;
these are engine additions for the training-data-pipeline surface
(feature extraction over event logs), expressed Ray-Data-first:

* :func:`event_lag_features` — lag / row_number / running sum per key.
  The exchange co-locates a key's rows by hash (adaptive form, see
  ``ops/exchange.py``); inside a bucket ONE vectorized pandas
  sort + groupby computes every key's features at once — no per-group
  Python dispatch, no global sort.
* :func:`grouped_quantiles` — exact per-group percentiles via
  ``groupby.map_groups``. Capacity: one group's values fit one worker
  (true for low-cardinality group keys like event_type). For
  high-cardinality or giant groups use the mergeable DDSketch in
  ``ops/sketches.py`` — this op is the exact companion.
* :func:`rollup_revenue` — GROUP BY ROLLUP from ONE distributed pass:
  the finest-level aggregate shuffles (combiner-first, tiny result);
  super-aggregate levels are derived from it locally, which is exact
  for algebraic aggregates (SUM / COUNT) and never rescans the fact
  table.

Column names match the DuckDB oracles in ``__ray_entry__.oracle_sql``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def event_lag_features(sf_dir: str):
    """Per-event window features over the events log, partitioned by
    user: seq_no (1-based row number by ts, ties broken by event_id),
    prev_gap_us (whole microseconds since the user's previous event,
    NULL for the first — an integer-valued double, so the driver's
    bit-exact hash compare holds), cum_value_x100 (running sum of value
    in window order, scaled to int64 cents: value is 2-decimal, and
    DuckDB's segment-tree windowed SUM is not bit-identical to a
    sequential cumsum, so both sides integerize)."""
    import ray.data as rd

    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
        g = df.groupby("user_id", sort=False)
        out = pd.DataFrame(
            {
                "event_id": df["event_id"],
                "user_id": df["user_id"],
                "seq_no": g.cumcount() + 1,
                "prev_gap_us": g["ts"].diff() / pd.Timedelta(microseconds=1),
                "cum_value_x100": np.round(g["value"].cumsum() * 100).astype("int64"),
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    empty = pa.table(
        {
            "event_id": pa.array([], type=pa.int64()),
            "user_id": pa.array([], type=pa.int64()),
            "seq_no": pa.array([], type=pa.int64()),
            "prev_gap_us": pa.array([], type=pa.float64()),
            "cum_value_x100": pa.array([], type=pa.int64()),
        }
    )
    return exchange_groups(ds, ["user_id"], shuffle_parts(), per_bucket, empty)


def _quantile_cont(v: np.ndarray, q: float) -> float:
    """DuckDB quantile_cont, bit-identical: lerp between the floor and
    ceil ranks as ``(crn-rn)*v[frn] + (rn-frn)*v[crn]`` (numpy's
    np.quantile evaluates the lerp differently and drifts in the last
    bits, which the driver's exact hash compare rejects)."""
    v = np.sort(v)
    rn = q * (len(v) - 1)
    frn, crn = int(np.floor(rn)), int(np.ceil(rn))
    if frn == crn:
        return float(v[frn])
    return float((crn - rn) * v[frn] + (rn - frn) * v[crn])


def grouped_quantiles(sf_dir: str, probs: tuple[float, float] = (0.5, 0.95)):
    """Exact p50/p95 of value per event_type (bit-identical to DuckDB
    ``quantile_cont``)."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].to_numpy()
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "p50": [_quantile_cont(v, probs[0])],
                "p95": [_quantile_cont(v, probs[1])],
                "n": [len(v)],
            }
        )

    return ds.groupby("event_type").map_groups(per_type, batch_format="pandas")


def _fine_revenue(sf_dir: str) -> pd.DataFrame:
    """The shared fine-level (l_returnflag, l_linestatus) revenue/count
    aggregate that ROLLUP and CUBE derive their super-levels from —
    ONE distributed pass over lineitem. Revenue is integerized PER ROW
    (×10k int64: price/discount are 2-decimal so the product has
    exactly 4) so every derived level's sum is exact and
    order-independent — a grand-total float sum's error can exceed the
    ×10k rounding margin, so rounding after summation would not
    hash-match the SQL oracle."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        rev = pc.cast(
            pc.round(
                pc.multiply(
                    pc.multiply(
                        batch["l_extendedprice"],
                        pc.subtract(1.0, batch["l_discount"]),
                    ),
                    pa.scalar(10000.0),
                )
            ),
            pa.int64(),
        )
        df = pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_pandas(),
                "l_linestatus": batch["l_linestatus"].to_pandas(),
                "rev": rev.to_pandas(),
            }
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            rev=("rev", "sum"), cnt=("rev", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("rev", alias_name="revenue_x10k"), Sum("cnt", alias_name="n"))
        .to_pandas()  # ≤ |flags| × |statuses| rows — tiny by construction
    )


def _super_level(fine: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
    """One grouping-set level derived locally from the fine aggregate:
    group by ``keys`` (both, one, or neither of the two dims), NULL the
    rolled-up dims. Exact for SUM/COUNT; never rescans the fact table."""
    if keys:
        out = fine.groupby(keys, as_index=False).agg(
            revenue_x10k=("revenue_x10k", "sum"), n=("n", "sum")
        )
    else:
        out = pd.DataFrame(
            {"revenue_x10k": [fine["revenue_x10k"].sum()], "n": [fine["n"].sum()]}
        )
    for dim in ("l_returnflag", "l_linestatus"):
        if dim not in keys:
            out[dim] = None
    return out


def _levels_frame(fine: pd.DataFrame, levels: list[list[str]]) -> pd.DataFrame:
    parts = [fine] + [_super_level(fine, ks) for ks in levels]
    out = pd.concat(parts, ignore_index=True)
    out["n"] = out["n"].astype("int64")
    out["revenue_x10k"] = out["revenue_x10k"].astype("int64")
    return out[["l_returnflag", "l_linestatus", "revenue_x10k", "n"]]


def rollup_revenue(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP(l_returnflag, l_linestatus): the fine level plus
    per-flag subtotals and the grand total (rolled-up dims NULL), all
    from one distributed pass (see :func:`_fine_revenue`)."""
    return _levels_frame(_fine_revenue(sf_dir), [["l_returnflag"], []])


def cube_revenue(sf_dir: str) -> pd.DataFrame:
    """GROUP BY CUBE(l_returnflag, l_linestatus): every grouping set —
    ROLLUP's levels plus the per-status subtotal — derived from the
    same single fine-level pass."""
    return _levels_frame(
        _fine_revenue(sf_dir), [["l_returnflag"], ["l_linestatus"], []]
    )


def user_event_pivot(sf_dir: str) -> pd.DataFrame:
    """Long→wide pivot: one row per user, one count column per event
    type. Scale shape: a per-batch (user, type) count partial (combiner)
    feeds ONE narrow groupby-sum over the long partials; the wide frame
    is assembled per hash bucket of users through the adaptive exchange
    (``pandas.pivot_table`` vectorized across all of a bucket's users —
    no per-user Python dispatch). The column set comes from a tiny
    distinct-types pre-aggregate so every bucket emits an identical
    schema."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    types = sorted(
        r["event_type"] for r in ds.groupby("event_type").count().take_all()
    )
    cols = [f"n_{t}" for t in types]

    def partial(batch: pa.Table) -> pa.Table:
        df = (
            batch.to_pandas()
            .groupby(["user_id", "event_type"], as_index=False)
            .size()
            .rename(columns={"size": "c"})
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    long = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .aggregate(Sum("c", alias_name="c"))
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        wide = (
            t.to_pandas()
            .pivot_table(
                index="user_id",
                columns="event_type",
                values="c",
                aggfunc="sum",
                fill_value=0,
            )
            .reindex(columns=types, fill_value=0)
            .astype("int64")
        )
        wide.columns = cols
        return pa.Table.from_pandas(wide.reset_index(), preserve_index=False)

    empty = pa.table(
        {
            "user_id": pa.array([], type=pa.int64()),
            **{c: pa.array([], type=pa.int64()) for c in cols},
        }
    )
    return exchange_groups(long, ["user_id"], shuffle_parts(), per_bucket, empty)


def event_value_ntile(sf_dir: str, tiles: int = 4) -> pd.DataFrame:
    """rank() and ntile() per event_type ordered by (value, event_id) —
    all-integer outputs, so the driver hash compare is exact by
    construction. event_id breaks value ties, making both window
    functions deterministic. Each event_type's rows are co-located by
    the adaptive exchange and ranked in one vectorized pass per
    bucket."""
    import ray.data as rd

    from kazu_ray.ops.exchange import exchange_groups

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["event_type", "value", "event_id"])
        g = df.groupby("event_type", sort=False)
        idx = g.cumcount().to_numpy()  # 0-based position within type
        n = g["event_id"].transform("size").to_numpy()
        # (value, event_id) is a total order -> rank == row_number
        rnk = idx + 1
        # DuckDB ntile(k): the first n%k tiles get ceil(n/k) rows
        base, rem = n // tiles, n % tiles
        big = rem * (base + 1)
        tile = np.where(
            idx < big, idx // np.maximum(base + 1, 1), rem + (idx - big) // np.maximum(base, 1)
        ).astype("int64")
        out = pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(),
                "event_type": df["event_type"].to_numpy(),
                "rnk": rnk.astype("int64"),
                "tile": tile + 1,
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    empty = pa.table(
        {
            "event_id": pa.array([], type=pa.int64()),
            "event_type": pa.array([], type=pa.string()),
            "rnk": pa.array([], type=pa.int64()),
            "tile": pa.array([], type=pa.int64()),
        }
    )
    # 5 event types at bench scale: more buckets than types is wasted
    # actor spawn, fewer loses parallelism — key cardinality IS the cap
    return exchange_groups(ds, ["event_type"], 8, per_bucket, empty)
