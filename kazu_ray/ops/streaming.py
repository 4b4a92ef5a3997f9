"""Incremental (stateful-actor) stream processing.

Ray Data has no event-time windows or watermarks; bounded-log window
semantics live in ``ops/relational.py`` as groupby shapes. This module
covers the one case the Dataset API genuinely cannot express (SURVEY
§2.8 / ray_guide.md "Streaming-shaped workloads"): *incremental* state
that must persist across feed batches — e.g. sessionization of an
unbounded log consumed in arrival order, where a session may stay open
across many batches.

Design: one ``@ray.remote`` actor per key-hash bucket holds the open
sessions for its keys; the driver (or an upstream system) feeds
ts-ordered batches, routing rows by ``hash(key) % n_buckets``. State per
bucket is bounded by its active-key count, hot keys spread across
buckets by hashing, and `flush()` closes remaining sessions at
end-of-log. This is the documented partitioning assumption: feed order
must be non-decreasing in ts *per key* (per-bucket suffices).
"""

from __future__ import annotations

import ray


@ray.remote
class SessionBucketActor:
    """Open-session state for one key bucket."""

    def __init__(self, gap_us: int):
        self.gap_us = gap_us
        # key -> (session_start_us, last_ts_us, n_events)
        self.open: dict = {}
        self.closed: list[tuple] = []

    def feed(self, keys: list[int], ts_us: list[int]) -> int:
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

    def flush(self) -> list[tuple]:
        for key, cur in sorted(self.open.items()):
            self.closed.append((key, cur[0], cur[1], cur[2]))
        self.open.clear()
        out = self.closed
        self.closed = []
        return out


def incremental_sessionize(
    events_ds, key_col: str = "user_id", gap_minutes: int = 30, n_buckets: int = 8
):
    """Consume a ts-sorted events Dataset through stateful bucket actors;
    returns a pandas frame of (user_id, session_start, session_end,
    n_events).

    The sort is the only Dataset-level shuffle; the incremental state
    lives in actors because a ``map_batches`` UDF must be stateless
    across batches of *different* keys arriving over time.
    """
    import pandas as pd

    gap_us = gap_minutes * 60 * 1_000_000
    actors = [SessionBucketActor.remote(gap_us) for _ in range(n_buckets)]
    sorted_ds = events_ds.sort("ts")
    for batch in sorted_ds.iter_batches(batch_size=8192, batch_format="pandas"):
        ts_us = batch["ts"].astype("int64")
        keys = batch[key_col].astype("int64")
        buckets = keys % n_buckets
        pending = []
        for b in range(n_buckets):
            mask = buckets == b
            if mask.any():
                pending.append(
                    actors[b].feed.remote(
                        keys[mask].tolist(), ts_us[mask].tolist()
                    )
                )
        ray.get(pending)  # preserve per-bucket feed order across batches
    rows = []
    for out in ray.get([a.flush.remote() for a in actors]):
        rows.extend(out)
    for a in actors:
        ray.kill(a)
    df = pd.DataFrame(rows, columns=[key_col, "start_us", "end_us", "n_events"])
    df["session_start"] = pd.to_datetime(df.pop("start_us"), unit="us")
    df["session_end"] = pd.to_datetime(df.pop("end_us"), unit="us")
    return df.sort_values([key_col, "session_start"]).reset_index(drop=True)
