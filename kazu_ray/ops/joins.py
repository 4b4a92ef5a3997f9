"""Large-×-large joins.

Broadcast joins (``ops/relational.py``) cover the dimension-table case;
when BOTH sides are large the exchange is unavoidable and must be
explicit about partitioning:

* :func:`hash_join` — native ``Dataset.join`` (hash-partitioned on the
  key; available in this Ray version) with an explicit
  ``num_partitions``.
* :func:`bucketed_hash_join` — the explicit form: both sides
  hash-scatter to one merger actor per bucket (concurrent feeds,
  ``ops/exchange.py`` mechanics), each bucket pandas-merges in
  parallel, results stream back as a Dataset. B is the skew knob: a hot
  key lands in one bucket, so size B so the hottest key's rows fit a
  worker's heap, or pre-salt hot keys.
* :func:`asof_join_events` / :func:`interval_join_events` — time-aware
  joins as key-shuffled per-group merges (merge_asof / two-pointer
  sweep).

All produce identical rows to DuckDB oracle parity checks.
"""

from __future__ import annotations


import pandas as pd
import pyarrow as pa


def hash_join(left, right, on: str, num_partitions: int = 16, join_type: str = "inner"):
    return left.join(
        right, join_type=join_type, num_partitions=num_partitions, on=(on,)
    )


class _BucketMerger:
    """One join bucket's accumulator: receives hash-co-located sub-tables
    of both sides, merges on demand. Runs as a Ray actor. Both side
    buffers are heap-bounded via ``SpillableTableBuffer``
    (``ops/exchange.py``): past the byte cap a side spills to Arrow IPC
    runs and merges off a memory map, so a hot join key past worker
    heap costs disk instead of an OOM (the pandas merge itself still
    materializes its OUTPUT; output-sized hot keys still need
    ``num_buckets``/salting)."""

    def __init__(
        self,
        on: str,
        empty_joined: pa.Table,
        how: str = "inner",
        spill_bytes: int | None = None,
    ):
        from kazu_ray.ops.exchange import SpillableTableBuffer, exchange_spill_bytes

        if spill_bytes is None:
            spill_bytes = exchange_spill_bytes()
        self.on = on
        self.empty_joined = empty_joined
        self.how = how
        self.left = SpillableTableBuffer(spill_bytes)
        self.right = SpillableTableBuffer(spill_bytes)
        self.received = {"l": 0, "r": 0}

    def add(self, side: str, table: pa.Table) -> int:
        (self.left if side == "l" else self.right).add(table)
        self.received[side] += table.num_rows
        return table.num_rows

    def received_rows(self, side: str) -> int:
        # per side: the two feeds run concurrently and each verifies its
        # own delivery
        return self.received[side]

    def merge(self) -> pa.Table:
        l = self.left.read()
        r = self.right.read()
        if self.how == "anti":
            # left rows with NO right match; an empty right side keeps
            # every left row (output schema = left schema, so no
            # NULL-fill dtype problems arise)
            if l is None:
                return self.empty_joined
            if r is None:
                return l.cast(self.empty_joined.schema)
            import pyarrow.compute as pc

            keep = pc.invert(pc.is_in(l[self.on], value_set=r[self.on].combine_chunks()))
            return l.filter(keep).cast(self.empty_joined.schema)
        if l is None or r is None:
            return self.empty_joined  # no inner rows from this bucket
        joined = pa.Table.from_pandas(
            l.to_pandas().merge(r.to_pandas(), on=self.on), preserve_index=False
        )
        return joined.cast(self.empty_joined.schema)


def bucketed_hash_join(left, right, on: str, num_buckets: int = 16, how: str = "inner"):
    """Explicit partitioned hash join (``how``: "inner" or "anti"):
    both sides hash-SCATTER to one merger actor per bucket, each bucket
    merges in parallel, and the merged buckets stream back as a Dataset
    (``from_arrow_refs`` — zero extra copy). The anti form returns left
    rows with no right match (left schema; feed the right side pruned
    to its key column — the exchange then moves one int column).

    Not ``Dataset.groupby``: Ray Data shuffles a groupby through a
    global range-partition SORT (measured 35 s for a 600k × 150k join at
    sf0.1 where the scatter form takes a few seconds); a hash join needs
    co-location only. ``num_buckets`` is the skew knob — size it so the
    hottest key's rows on both sides fit one actor, or pre-salt hot
    keys. Non-key column names must be disjoint (pandas merge suffix
    ambiguity is refused, like the reference)."""
    import ray as _ray
    import ray.data as rd

    lschema = left.schema()
    rschema = right.schema()
    overlap = (set(lschema.names) & set(rschema.names)) - {on}
    if overlap:
        raise ValueError(f"non-key columns must be disjoint, overlap: {overlap}")

    lcols = dict(zip(lschema.names, lschema.types))
    rcols = (
        {}
        if how == "anti"
        else {n: t for n, t in zip(rschema.names, rschema.types) if n != on}
    )
    empty_joined = pa.table(
        {n: pa.array([], type=t) for n, t in {**lcols, **rcols}.items()}
    )

    from kazu_ray.ops.exchange import (
        exchange_spill_bytes,
        feed_to_actors,
        reaped_actors,
    )

    spill_bytes = exchange_spill_bytes()  # driver-side resolve
    merger_cls = _ray.remote(num_cpus=0)(_BucketMerger)
    mergers = [
        merger_cls.remote(on, empty_joined, how, spill_bytes)
        for _ in range(num_buckets)
    ]

    def assign(batch: pa.Table) -> pa.Array:
        from kazu_ray.functions.hashing import bucket_ids

        return pa.array(bucket_ids(batch[on], num_buckets), type=pa.int32())

    with reaped_actors(mergers):
        # both sides feed CONCURRENTLY (two Dataset executions on two
        # driver threads): the mergers accept interleaved side-tagged
        # adds, so exchange wall-clock is max(left, right), not the sum
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            futs = [
                pool.submit(
                    feed_to_actors,
                    ds_side,
                    num_buckets,
                    assign,
                    lambda b, sub, _s=side: mergers[b].add.remote(_s, sub),
                    lambda b, _s=side: mergers[b].received_rows.remote(_s),
                )
                for side, ds_side in (("l", left), ("r", right))
            ]
            for f in futs:
                f.result()
        # merged buckets stay in the object store (one ref per bucket)
        # and stream into the result Dataset — no driver
        # materialization; wait for the merge tasks so the actors can be
        # reaped (task results outlive their actor)
        merged_refs = [m.merge.remote() for m in mergers]
        _ray.wait(merged_refs, num_returns=len(merged_refs), fetch_local=False)
    return rd.from_arrow_refs(merged_refs)


def asof_join_events(sf_dir: str, probe_type: str = "click", ref_type: str = "view"):
    """As-of join (ray_guide.md "Joins and lookups"): for each probe
    event, the same user's most recent STRICTLY-PRIOR reference event.
    One hash exchange on the key co-locates each user's events, then
    ``pd.merge_asof(by="user_id")`` runs ONCE per bucket — vectorized
    across every user in it (a per-user ``map_groups`` paid Python
    dispatch per user). Returns (event_id, user_id, ts, prior_view_ts)."""
    import pandas as pd
    import ray.data as rd

    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )

    empty = pa.table(
        {
            "event_id": pa.array([], type=pa.int64()),
            "user_id": pa.array([], type=pa.int64()),
            "ts": pa.array([], type=pa.timestamp("us")),
            "prior_view_ts": pa.array([], type=pa.timestamp("us")),
        }
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        g = t.to_pandas()
        # merge_asof(by=) requires both frames globally sorted on the ON key
        probes = g[g.event_type == probe_type].sort_values("ts", kind="mergesort")
        refs = g[g.event_type == ref_type].sort_values("ts", kind="mergesort")
        if probes.empty:
            return empty
        if refs.empty:
            merged = probes[["event_id", "user_id", "ts"]].copy()
            merged["prior_view_ts"] = pd.NaT
        else:
            merged = pd.merge_asof(
                probes[["event_id", "user_id", "ts"]],
                refs[["user_id", "ts"]].rename(columns={"ts": "prior_view_ts"}),
                by="user_id",
                left_on="ts",
                right_on="prior_view_ts",
                direction="backward",
                allow_exact_matches=False,  # strictly prior
            )
        return pa.Table.from_pandas(merged, preserve_index=False).cast(empty.schema)

    return exchange_groups(ds, ["user_id"], shuffle_parts(), per_bucket, empty)


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
