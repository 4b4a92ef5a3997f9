"""Large-×-large joins.

Broadcast joins (``ops/relational.py``) cover the dimension-table case;
when BOTH sides are large the exchange is unavoidable and must be
explicit about partitioning:

* :func:`hash_join` — native ``Dataset.join`` (hash-partitioned on the
  key; available in this Ray version) with an explicit
  ``num_partitions``.
* :func:`bucketed_hash_join` — the portable explicit form
  (ray_guide.md "Joins and lookups"): tag each side, add
  ``bucket = hash(key) %% B`` to both, union, ``groupby(bucket)`` and
  merge matching buckets pairwise inside ``map_groups``. B is the skew
  knob: a hot key lands in one bucket, so size B so the hottest key's
  rows fit a worker's heap, or pre-salt hot keys.

Both produce identical rows; oracle parity checks against DuckDB.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa


def hash_join(left, right, on: str, num_partitions: int = 16, join_type: str = "inner"):
    return left.join(
        right, join_type=join_type, num_partitions=num_partitions, on=(on,)
    )


def bucketed_hash_join(left, right, on: str, num_buckets: int = 16):
    """Explicit partitioned inner hash join: one shuffle keyed by
    ``hash(on) %% num_buckets``, then a pandas merge per bucket.

    The two sides are unioned into one stream, so their schemas are
    harmonized first (each side padded with typed nulls for the other
    side's columns); non-key column names must be disjoint.
    """
    lschema = left.schema()
    rschema = right.schema()
    lcols = dict(zip(lschema.names, lschema.types))
    rcols = dict(zip(rschema.names, rschema.types))
    overlap = (set(lcols) & set(rcols)) - {on}
    if overlap:
        raise ValueError(f"non-key columns must be disjoint, overlap: {overlap}")
    combined = {**lcols, **rcols}

    def tag(side: str, own: dict):
        def _tag(batch: pa.Table) -> pa.Table:
            from kazu_ray.functions.hashing import bucket_ids

            buckets = bucket_ids(batch[on], num_buckets)
            cols = {}
            for name, typ in combined.items():
                if name in own:
                    cols[name] = batch[name]
                else:
                    cols[name] = pa.nulls(batch.num_rows, type=typ)
            cols["__bucket"] = pa.array(buckets, type=pa.int32())
            cols["__side"] = pa.array([side] * batch.num_rows, type=pa.string())
            return pa.table(cols)

        return _tag

    tagged = left.map_batches(tag("l", lcols), batch_format="pyarrow").union(
        right.map_batches(tag("r", rcols), batch_format="pyarrow")
    )

    lkeep = [on] + [c for c in lcols if c != on]
    rkeep = [on] + [c for c in rcols if c != on]

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lrows = g[g["__side"] == "l"][lkeep]
        rrows = g[g["__side"] == "r"][rkeep]
        return lrows.merge(rrows, on=on)

    return tagged.groupby("__bucket").map_groups(merge_bucket, batch_format="pandas")


def asof_join_events(sf_dir: str, probe_type: str = "click", ref_type: str = "view"):
    """As-of join (ray_guide.md "Joins and lookups"): for each probe
    event, the same user's most recent STRICTLY-PRIOR reference event.
    Implementation = the guide's recipe verbatim: both sides shuffle once
    on the key (user), and ``pd.merge_asof`` runs over the ts-sorted
    group. Returns (event_id, user_id, ts, prior_view_ts)."""
    import pandas as pd
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        probes = g[g.event_type == probe_type].sort_values("ts")
        refs = g[g.event_type == ref_type].sort_values("ts")
        if probes.empty:
            return pd.DataFrame(
                {c: pd.Series(dtype=t) for c, t in
                 [("event_id", "int64"), ("user_id", "int64"),
                  ("ts", "datetime64[us]"), ("prior_view_ts", "datetime64[us]")]}
            )
        merged = pd.merge_asof(
            probes[["event_id", "user_id", "ts"]],
            refs[["ts"]].rename(columns={"ts": "prior_view_ts"}),
            left_on="ts",
            right_on="prior_view_ts",
            direction="backward",
            allow_exact_matches=False,  # strictly prior
        )
        return merged

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


def interval_join_events(
    sf_dir: str,
    window_minutes: int = 5,
    probe_type: str = "click",
    ref_type: str = "view",
):
    """Range (interval) join: every (probe, reference) event pair for
    the same user with the reference inside the probe's trailing window
    ``(probe.ts - window, probe.ts]``.

    Partitioning: one shuffle keyed by user (``groupby(user_id)``);
    inside each group a vectorized two-pointer sweep over the ts-sorted
    sides emits the pairs — per-group cost O(n log n + output), never
    the O(n·m) cross product. The key shuffle is the documented
    assumption: a single user's events must fit a worker (true by
    construction for bounded per-user activity; salt by time-bucket
    if a user can exceed that). Returns
    (event_id, user_id, ts, ref_event_id, ref_ts).
    """
    import numpy as np
    import pandas as pd
    import ray.data as rd

    window = pd.Timedelta(minutes=window_minutes)
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )

    empty = pd.DataFrame(
        {
            "event_id": pd.Series(dtype="int64"),
            "user_id": pd.Series(dtype="int64"),
            "ts": pd.Series(dtype="datetime64[us]"),
            "ref_event_id": pd.Series(dtype="int64"),
            "ref_ts": pd.Series(dtype="datetime64[us]"),
        }
    )

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        probes = g[g.event_type == probe_type].sort_values(["ts", "event_id"])
        refs = g[g.event_type == ref_type].sort_values(["ts", "event_id"])
        if probes.empty or refs.empty:
            return empty.copy()
        ref_ts = refs["ts"].to_numpy()
        # for each probe: refs in (probe.ts - window, probe.ts]
        lo = np.searchsorted(ref_ts, (probes["ts"] - window).to_numpy(), side="right")
        hi = np.searchsorted(ref_ts, probes["ts"].to_numpy(), side="right")
        counts = hi - lo
        if counts.sum() == 0:
            return empty.copy()
        probe_idx = np.repeat(np.arange(len(probes)), counts)
        ref_idx = np.concatenate(
            [np.arange(a, b) for a, b in zip(lo, hi) if b > a]
        )
        p = probes.iloc[probe_idx]
        r = refs.iloc[ref_idx]
        return pd.DataFrame(
            {
                "event_id": p["event_id"].to_numpy(),
                "user_id": p["user_id"].to_numpy(),
                "ts": p["ts"].to_numpy(),
                "ref_event_id": r["event_id"].to_numpy(),
                "ref_ts": r["ts"].to_numpy(),
            }
        )

    import ray.data as _rd

    joined = ds.groupby("user_id").map_groups(per_user, batch_format="pandas")
    # anchor the schema so a zero-pair result still compares against SQL
    return _rd.from_pandas(empty).union(joined)
