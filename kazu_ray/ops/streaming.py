"""Incremental (stateful-actor) stream processing.

Ray Data has no event-time windows or watermarks; bounded-log window
semantics live in ``ops/relational.py`` as groupby shapes. This module
covers the one case the Dataset API genuinely cannot express (SURVEY
§2.8 / ray_guide.md "Streaming-shaped workloads"): *incremental* state
that must persist across feed batches — e.g. sessionization of an
unbounded log consumed in arrival order, where a session may stay open
across many batches.

Design: one ``@ray.remote`` actor per key-hash bucket holds the open
sessions for its keys. Two feed modes:

* :meth:`SessionBucketActor.feed` — true incremental mode for an
  upstream system that already delivers per-key ts-ordered batches
  (the documented partitioning assumption: feed order non-decreasing
  in ts per key; per-bucket suffices). State per bucket is bounded by
  its active-key count.
* :func:`incremental_sessionize` — batch-log entry point: map tasks
  scatter ``(key, ts)`` rows to the bucket actors directly
  (``ops/exchange.py::feed_to_actors`` — the corpus never passes
  through the driver, unlike the round-1/2 ``iter_batches`` funnel),
  each actor buffers its bucket's narrow rows, and ``flush`` sorts the
  bucket by ts once and runs the same incremental automaton. The
  per-bucket sort replaces the old GLOBAL ``sort("ts")`` shuffle; the
  buffered rows are two int64 columns, so a bucket of 10^8 events is
  ~1.6 GB — size ``n_buckets`` to the log like every exchange
  accumulator (capacity note in ops/exchange.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


@ray.remote(num_cpus=0)
class SessionBucketActor:
    """Open-session state for one key bucket."""

    def __init__(self, gap_us: int):
        self.gap_us = gap_us
        # key -> (session_start_us, last_ts_us, n_events)
        self.open: dict = {}
        self.closed: list[tuple] = []
        # unsorted (keys, ts) chunks accumulated by add_table feeds
        self.pending: list[tuple[np.ndarray, np.ndarray]] = []
        self.received = 0

    def received_rows(self) -> int:
        return self.received

    def feed(self, keys: list[int], ts_us: list[int]) -> int:
        """Incremental mode: caller guarantees per-key ts order."""
        for key, t in zip(keys, ts_us):
            cur = self.open.get(key)
            if cur is None:
                self.open[key] = (t, t, 1)
            elif t - cur[1] > self.gap_us:
                self.closed.append((key, cur[0], cur[1], cur[2]))
                self.open[key] = (t, t, 1)
            else:
                self.open[key] = (cur[0], t, cur[2] + 1)
        return len(self.closed)

    def add_table(self, table: pa.Table) -> int:
        """Scatter mode: buffer this bucket's narrow rows (any order)."""
        self.received += table.num_rows
        self.pending.append(
            (
                table["key"].to_numpy(zero_copy_only=False).astype("int64"),
                table["ts_us"].to_numpy(zero_copy_only=False).astype("int64"),
            )
        )
        return table.num_rows

    def flush(self) -> list[tuple]:
        if self.pending:
            keys = np.concatenate([p[0] for p in self.pending])
            ts = np.concatenate([p[1] for p in self.pending])
            self.pending = []
            order = np.argsort(ts, kind="stable")
            self.feed(keys[order].tolist(), ts[order].tolist())
        for key, cur in sorted(self.open.items()):
            self.closed.append((key, cur[0], cur[1], cur[2]))
        self.open.clear()
        out = self.closed
        self.closed = []
        return out


def incremental_sessionize(
    events_ds, key_col: str = "user_id", gap_minutes: int = 30,
    n_buckets: int | None = None,
):
    """Sessionize an event log through stateful bucket actors; returns a
    pandas frame of (user_id, session_start, session_end, n_events).

    No driver-side row iteration and no global sort: map tasks hash
    ``key_col`` and ship per-bucket sub-tables straight to the actors
    (object store to actor, backpressured); each actor sorts its own
    bucket by ts at flush. The incremental automaton (``feed``) is the
    same one an arrival-ordered upstream would drive batch-by-batch —
    the driver hard-check in ``__ray_entry__`` keeps this equal to the
    batch groupby sessionization.
    """
    import pandas as pd

    from kazu_ray.functions.hashing import bucket_ids
    from kazu_ray.ops.exchange import feed_to_actors, reaped_actors

    if n_buckets is None:
        # scale bucket count (= actor-held state shards) to the cluster;
        # buffered state is two int64 columns per event, so per-bucket
        # memory shrinks linearly as buckets grow
        from kazu_ray.ops.dedup import shuffle_parts

        n_buckets = shuffle_parts(per_cpu=0.25, lo=8, hi=128)
    gap_us = gap_minutes * 60 * 1_000_000
    actors = [SessionBucketActor.remote(gap_us) for _ in range(n_buckets)]

    def _narrow(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "key": pc.cast(batch[key_col], pa.int64()),
                "ts_us": pc.cast(batch["ts"], pa.timestamp("us")).cast(pa.int64()),
            }
        )

    rows = []
    with reaped_actors(actors):
        feed_to_actors(
            events_ds.map_batches(_narrow, batch_format="pyarrow"),
            n_buckets,
            lambda batch: pa.array(bucket_ids(batch["key"], n_buckets)),
            lambda b, sub: actors[b].add_table.remote(sub),
            received_fn=lambda b: actors[b].received_rows.remote(),
        )
        for out in ray.get([a.flush.remote() for a in actors]):
            rows.extend(out)
    df = pd.DataFrame(rows, columns=[key_col, "start_us", "end_us", "n_events"])
    df["session_start"] = pd.to_datetime(df.pop("start_us"), unit="us")
    df["session_end"] = pd.to_datetime(df.pop("end_us"), unit="us")
    return df.sort_values([key_col, "session_start"]).reset_index(drop=True)
