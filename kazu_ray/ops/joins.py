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

    Partitioning: one hash exchange keyed by user co-locates each
    user's events; inside a bucket the pairs are emitted VECTORIZED
    ACROSS EVERY USER at once (a per-user ``map_groups`` paid Python
    dispatch per user): with refs sorted by (user, ts) and a per-user
    cumulative rank attached, two ``merge_asof(by=user)`` lookups give
    each probe its user-segment [lo, hi) rank interval — hi = rank of
    the last ref ≤ probe.ts, lo = rank of the last ref ≤ probe.ts −
    window — and a ragged-range repeat/cumsum expansion materializes
    exactly the output pairs. Per-bucket cost O(n log n + output),
    never the O(n·m) cross product. The key shuffle is the documented
    assumption: a single user's events must fit a worker (spill-backed
    past the byte cap; salt by time-bucket if a user can exceed even
    that). Returns (event_id, user_id, ts, ref_event_id, ref_ts).
    """
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    window = pd.Timedelta(minutes=window_minutes)
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )

    empty = pa.table(
        {
            "event_id": pa.array([], type=pa.int64()),
            "user_id": pa.array([], type=pa.int64()),
            "ts": pa.array([], type=pa.timestamp("us")),
            "ref_event_id": pa.array([], type=pa.int64()),
            "ref_ts": pa.array([], type=pa.timestamp("us")),
        }
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        g = t.to_pandas()
        probes = g[g.event_type == probe_type].sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        refs = g[g.event_type == ref_type].sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        )
        if probes.empty or refs.empty:
            return empty
        refs = refs.reset_index(drop=True)
        # per-user segment bounds + within-user rank over the ts-sorted refs
        first_pos = refs.groupby("user_id", sort=False).cumcount().to_numpy()
        seg_start = np.arange(len(refs)) - first_pos  # global index of user's first ref
        ref_rank = refs[["user_id", "ts"]].copy()
        ref_rank["rank"] = first_pos + 1  # rank = 1-based count of refs ≤ this ts

        def last_rank_leq(keys: pd.DataFrame, on: str) -> np.ndarray:
            m = pd.merge_asof(
                keys.sort_values(on, kind="mergesort"),
                # merge_asof requires BOTH frames globally sorted on the
                # ON key (the by= grouping does not relax that)
                ref_rank.rename(columns={"ts": on}).sort_values(
                    on, kind="mergesort"
                ),
                by="user_id",
                on=on,
                direction="backward",
                allow_exact_matches=True,
            ).sort_index()
            # merge_asof output preserves left length; restore probe order
            return m["rank"].fillna(0).to_numpy().astype(np.int64)

        probes = probes.reset_index(drop=True)
        hi = last_rank_leq(
            probes[["user_id", "ts"]].assign(_k=np.arange(len(probes))).set_index("_k"),
            "ts",
        )
        lo_keys = probes[["user_id"]].copy()
        # Timedelta arithmetic upcasts to ns; keep the ref frame's unit
        lo_keys["ts"] = (probes["ts"] - window).astype(refs["ts"].dtype)
        lo = last_rank_leq(
            lo_keys.assign(_k=np.arange(len(probes))).set_index("_k"), "ts"
        )
        counts = hi - lo
        counts[counts < 0] = 0
        total = int(counts.sum())
        if total == 0:
            return empty
        # user's segment start per probe: ranks are within-user, so the
        # global ref index interval is [user_start + lo, user_start + hi)
        user_first = pd.Series(seg_start, index=refs.index).groupby(
            refs["user_id"]
        ).first()
        probe_user_start = probes["user_id"].map(user_first).to_numpy()
        keep = counts > 0
        probe_idx = np.repeat(np.arange(len(probes))[keep], counts[keep])
        starts = (probe_user_start[keep] + lo[keep]).astype(np.int64)
        # ragged ranges: start_i + (0 .. count_i-1), fully vectorized
        offs = np.arange(total) - np.repeat(
            np.concatenate([[0], np.cumsum(counts[keep])[:-1]]), counts[keep]
        )
        ref_idx = np.repeat(starts, counts[keep]) + offs
        p = probes.iloc[probe_idx]
        r = refs.iloc[ref_idx]
        out = pd.DataFrame(
            {
                "event_id": p["event_id"].to_numpy(),
                "user_id": p["user_id"].to_numpy(),
                "ts": p["ts"].to_numpy(),
                "ref_event_id": r["event_id"].to_numpy(),
                "ref_ts": r["ts"].to_numpy(),
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False).cast(empty.schema)

    return exchange_groups(ds, ["user_id"], shuffle_parts(), per_bucket, empty)
