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
    prev_gap_s (seconds since the user's previous event, NULL for the
    first), cum_value (running sum of value in window order)."""
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
                "prev_gap_s": g["ts"].diff().dt.total_seconds(),
                "cum_value": g["value"].cumsum(),
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    empty = pa.table(
        {
            "event_id": pa.array([], type=pa.int64()),
            "user_id": pa.array([], type=pa.int64()),
            "seq_no": pa.array([], type=pa.int64()),
            "prev_gap_s": pa.array([], type=pa.float64()),
            "cum_value": pa.array([], type=pa.float64()),
        }
    )
    return exchange_groups(ds, ["user_id"], shuffle_parts(), per_bucket, empty)


def grouped_quantiles(sf_dir: str, probs: tuple[float, float] = (0.5, 0.95)):
    """Exact p50/p95 of value per event_type (numpy linear
    interpolation == DuckDB ``quantile_cont``)."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].to_numpy()
        lo, hi = np.quantile(v, probs, method="linear")
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "p50": [float(lo)],
                "p95": [float(hi)],
                "n": [len(v)],
            }
        )

    return ds.groupby("event_type").map_groups(per_type, batch_format="pandas")


def rollup_revenue(sf_dir: str) -> pd.DataFrame:
    """Revenue + row count by (l_returnflag, l_linestatus) with ROLLUP
    super-aggregates (flag subtotals and the grand total, rolled-up
    levels as NULL) — finest level computed distributed, super levels
    derived from it (exact for SUM/COUNT)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        rev = pc.multiply(
            batch["l_extendedprice"], pc.subtract(1.0, batch["l_discount"])
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

    fine = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("rev", alias_name="revenue"), Sum("cnt", alias_name="n"))
        .to_pandas()  # ≤ |flags| × |statuses| rows — tiny by construction
    )
    by_flag = fine.groupby("l_returnflag", as_index=False).agg(
        revenue=("revenue", "sum"), n=("n", "sum")
    )
    by_flag["l_linestatus"] = None
    total = pd.DataFrame(
        {
            "l_returnflag": [None],
            "l_linestatus": [None],
            "revenue": [fine["revenue"].sum()],
            "n": [fine["n"].sum()],
        }
    )
    out = pd.concat([fine, by_flag, total], ignore_index=True)
    out["n"] = out["n"].astype("int64")
    return out[["l_returnflag", "l_linestatus", "revenue", "n"]]
