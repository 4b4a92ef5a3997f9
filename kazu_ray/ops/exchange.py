"""Hash-scatter exchange — the engine's alternative to
``Dataset.groupby(...).map_groups(...)`` when groups only need hash
CO-LOCATION, not a total order.

Ray Data implements a groupby shuffle as a global range-partition SORT
of every row (measured on this box: 38 s to co-locate 3.25M triple rows
into 32 groups, vs ~2 s of useful work; a 600k × 150k bucketed join
paid 35 s the same way). :func:`scatter_groups` instead ships
vectorized per-bucket sub-batches to one accumulator actor per bucket
and applies a per-bucket function (typically a pandas/Arrow groupby —
vectorized across ALL of the bucket's groups at once, where map_groups
pays per-group Python dispatch); results stream back as a Dataset
through object-store refs, never the driver.

Shared mechanics (:func:`feed_to_actors` / :func:`reaped_actors`) are
also used by the triple-store materializer and the bucketed hash join:

* **Retry safety**: actor adds are side effects, so feed tasks run with
  ``max_retries=0`` — a dying feed worker FAILS the exchange loudly
  instead of Ray re-running the task and silently double-delivering its
  batch. Callers retry at the job level (the materializer resumes from
  manifests; queries re-run).
* **Pipelined adds + positive delivery verification**: feeds submit
  adds asynchronously behind a bounded per-worker in-flight window
  (backpressure without a sync RPC round per batch); before finalize,
  each bucket's actor-side received-row counter is polled until it
  matches the rows the feed reported sending — so a lost or duplicated
  add can never silently corrupt a bucket.
* **Leak safety**: accumulator actors (and their buffered tables) are
  killed in a ``finally`` even when a feed or finalize raises.

Capacity assumption (the same one ``map_groups`` carries, now explicit):
one bucket's rows fit one worker — size ``num_buckets`` so the hottest
bucket fits, or salt hot keys upstream. Actors take ``num_cpus=0`` so
``num_buckets`` may exceed the CPU count without deadlocking the feed.

Crossover, measured on this box: the scatter carries a ~2 s fixed floor
(actor spawn + feed-task dispatch; with pipelined adds the wall time is
FLAT ~2.2 s from 80k to 3.25M exchanged rows), so BELOW roughly 10^6
narrow exchanged rows the sort groupby wins (0.7 s vs ~2 s on the
80k-row minhash banding exchange) and the near-dup ops keep it; at
3.25M wide triple rows the scatter is 38 s → ~2 s. Pick per operator by
expected exchange size, not dogma — or let :func:`exchange_groups`
pick from the (estimated or measured) exchange size at run time.
"""

from __future__ import annotations

from contextlib import contextmanager

import pyarrow as pa


@contextmanager
def reaped_actors(actors):
    """Kill the given actors on exit, success or failure — an exchange
    abandoned by an exception must not leak accumulators holding every
    buffered table until the driver exits."""
    import ray as _ray

    try:
        yield actors
    finally:
        for a in actors:
            _ray.kill(a, no_restart=True)


# per-worker in-flight add window: feed tasks submit adds WITHOUT a
# synchronous ray.get round per batch (measured: the sync round was the
# scatter's fixed floor), waiting only when more than _FEED_WINDOW adds
# are outstanding on this worker — bounded backpressure, pipelined RPCs.
# Shared across concurrent exchanges on one worker by design: waiting on
# a foreign exchange's ref only tightens backpressure, never corrupts.
_FEED_PENDING: list = []
_FEED_WINDOW = 16


def feed_to_actors(ds, n_buckets: int, assign_fn, add_fn, received_fn=None) -> None:
    """Drive ``ds`` through a scatter feed: ``assign_fn(batch)`` returns
    an int32 Arrow array of bucket ids, ``add_fn(bucket_id, sub_table)``
    ships one sub-table (returning an ObjectRef). Feed tasks run with
    ``max_retries=0``: actor adds are not idempotent, so a retried task
    would double-deliver.

    Adds are pipelined (bounded per-worker in-flight window) rather than
    synchronously awaited per batch. Delivery is then verified
    POSITIVELY: each feed call reports (bucket, rows_sent); when
    ``received_fn(bucket) -> ObjectRef[int]`` is supplied (an actor-side
    received-row counter), this function polls until every bucket's
    received count matches the sent total — catching any add lost to a
    worker death after its feed task completed — and raises loudly on
    timeout (``KAZU_FEED_VERIFY_TIMEOUT_S``, default 1800). Without
    ``received_fn`` there is no way to verify the pipelined tail, so the
    feed falls back to a synchronous ray.get per batch (the pre-window
    behaviour — correct, one RPC round per feed batch).
    """
    import pyarrow.compute as pc
    import ray as _ray

    pipelined = received_fn is not None

    def _feed(batch: pa.Table) -> pa.Table:
        global _FEED_PENDING
        buckets = assign_fn(batch)
        out_b, out_n, refs = [], [], []
        for b in pc.unique(buckets).to_pylist():
            sub = batch.filter(pc.equal(buckets, b))
            refs.append(add_fn(b, sub))
            out_b.append(int(b))
            out_n.append(sub.num_rows)
        if pipelined:
            _FEED_PENDING.extend(refs)
            if len(_FEED_PENDING) > _FEED_WINDOW:
                n_over = len(_FEED_PENDING) - _FEED_WINDOW
                done, rest = _ray.wait(_FEED_PENDING, num_returns=n_over)
                _ray.get(done)  # surface add-side exceptions loudly
                _FEED_PENDING = rest
        else:
            _ray.get(refs)
        return pa.table(
            {
                "bucket": pa.array(out_b, type=pa.int64()),
                "rows": pa.array(out_n, type=pa.int64()),
            }
        )

    # extra kwargs to map_batches are forwarded as ray.remote options;
    # the feed output is tiny (≤ n_buckets rows per batch)
    fed = ds.map_batches(_feed, batch_format="pyarrow", max_retries=0).to_pandas()
    if received_fn is None or fed.empty:
        # empty fed: zero batches produced, so the frame has no columns
        # and there is nothing to verify
        return
    sent = fed.groupby("bucket")["rows"].sum()
    import os
    import time

    deadline = time.monotonic() + float(
        os.environ.get("KAZU_FEED_VERIFY_TIMEOUT_S", 1800)
    )
    waiting = {int(b): int(n) for b, n in sent.items() if n > 0}
    while waiting:
        got = _ray.get([received_fn(b) for b in waiting])
        for b, r in zip(list(waiting), got):
            if r == waiting[b]:
                del waiting[b]
            elif r > waiting[b]:
                raise RuntimeError(
                    f"exchange bucket {b} received {r} rows but only "
                    f"{waiting[b]} were sent — double delivery"
                )
        if waiting:
            if time.monotonic() > deadline:
                raise RuntimeError(
                    f"exchange delivery verification timed out; buckets "
                    f"still short: {waiting}"
                )
            time.sleep(0.05)


def multi_key_buckets(batch: pa.Table, key_cols: list[str], num_buckets: int) -> pa.Array:
    """Combined-key bucket assignment (polynomial mix of per-column
    SipHash), dtype-stable per column type."""
    import numpy as np

    from kazu_ray.functions.hashing import bucket_ids

    h = np.zeros(batch.num_rows, dtype="uint64")
    for c in key_cols:
        h = h * np.uint64(1000003) + bucket_ids(batch[c], 1 << 30).astype("uint64")
    return pa.array((h % np.uint64(num_buckets)).astype("int32"))


class SpillableTableBuffer:
    """Byte-capped accumulating buffer of Arrow tables — the shared
    heap-bounding mechanism for exchange-side actors (the generic
    bucket accumulator below, the join mergers in ``ops/joins.py``; the
    triple-store ``_PartitionWriter`` keeps its own SORTED-run variant
    because its merge must stream in key order).

    Once buffered bytes exceed ``spill_bytes``, the buffer flushes to
    an Arrow IPC run file on local disk. ``read()`` MEMORY-MAPS the
    runs back, so the concatenated table handed to the consumer is
    mmap-backed — the kernel pages it, and the actor's anonymous heap
    holds only the residual buffer plus the consumer's own working
    set/output, not the whole bucket. A hot key past worker heap now
    costs disk + page cache instead of an OOM kill. (Consumers that
    copy to pandas still pay their copy; Arrow-kernel consumers stream
    off the mapping. Unlinked run files stay readable on Linux until
    the mapping drops, so cleanup-after-read is safe.) An actor killed
    mid-flight leaves at most ``spill_bytes``-sized runs in tmp."""

    __slots__ = ("spill_bytes", "tables", "buffered_bytes", "spill_dir", "run_paths")

    def __init__(self, spill_bytes: int):
        self.spill_bytes = spill_bytes
        self.tables: list[pa.Table] = []
        self.buffered_bytes = 0
        self.spill_dir: str | None = None
        self.run_paths: list[str] = []

    def _spill(self) -> None:
        import os
        import tempfile

        if not self.tables:
            return
        if self.spill_dir is None:
            self.spill_dir = tempfile.mkdtemp(prefix="kazu_exchange_spill_")
        table = pa.concat_tables(self.tables)
        self.tables = []
        self.buffered_bytes = 0
        path = os.path.join(self.spill_dir, f"run{len(self.run_paths)}.arrow")
        with pa.OSFile(path, "wb") as f, pa.ipc.new_file(f, table.schema) as w:
            w.write_table(table)
        self.run_paths.append(path)

    def add(self, table: pa.Table) -> None:
        self.tables.append(table)
        self.buffered_bytes += table.nbytes
        if self.buffered_bytes >= self.spill_bytes:
            self._spill()

    def read(self) -> pa.Table | None:
        """The buffered rows as ONE table (mmap-backed past the cap),
        or None if nothing was added. Consumes the buffer and removes
        the spill dir — call once."""
        parts: list[pa.Table] = []
        for path in self.run_paths:
            parts.append(pa.ipc.open_file(pa.memory_map(path, "r")).read_all())
        if self.tables:
            parts.append(pa.concat_tables(self.tables))
            self.tables = []
        self.cleanup()
        if not parts:
            return None
        return pa.concat_tables(parts) if len(parts) > 1 else parts[0]

    def cleanup(self) -> None:
        import shutil

        if self.spill_dir is not None:
            shutil.rmtree(self.spill_dir, ignore_errors=True)
            self.spill_dir = None
            self.run_paths = []


def exchange_spill_bytes() -> int:
    """Per-actor byte cap before exchange buffers spill to IPC runs.
    Resolve on the DRIVER (workers inherit the env captured at
    ray.init, so later overrides would silently not reach actor-side
    getenv) and pass into actor constructors."""
    import os

    return int(os.environ.get("KAZU_EXCHANGE_SPILL_BYTES", 512 * 1024 * 1024))


class _BucketAccumulator:
    """One bucket's accumulator, heap-bounded via
    :class:`SpillableTableBuffer` — the exchange contract (``fn`` sees
    ALL of the bucket at once) is preserved exactly; past the byte cap
    the bucket table is mmap-backed rather than actor heap."""

    def __init__(self, fn, empty: pa.Table, spill_bytes: int | None = None):
        self.fn = fn
        self.empty = empty
        self.buf = SpillableTableBuffer(
            exchange_spill_bytes() if spill_bytes is None else spill_bytes
        )
        self.received = 0

    # test/introspection conveniences
    @property
    def run_paths(self):
        return self.buf.run_paths

    @property
    def spill_dir(self):
        return self.buf.spill_dir

    def add(self, table: pa.Table) -> int:
        self.buf.add(table)
        self.received += table.num_rows
        return table.num_rows

    def received_rows(self) -> int:
        return self.received

    def finalize(self) -> pa.Table:
        table = self.buf.read()
        if table is None:
            return self.empty
        out = self.fn(table)
        del table
        return out.cast(self.empty.schema) if out.schema != self.empty.schema else out


def scatter_groups(ds, key_cols: list[str], num_buckets: int, per_bucket_fn, empty: pa.Table):
    """Co-locate rows by ``hash(key_cols)`` into ``num_buckets`` actors,
    apply ``per_bucket_fn(pa.Table) -> pa.Table`` once per bucket (over
    every group in that bucket at once), return the results as a
    Dataset. ``empty`` fixes the output schema for zero-row buckets.
    """
    import ray as _ray
    import ray.data as rd

    spill_bytes = exchange_spill_bytes()  # driver-side resolve
    acc_cls = _ray.remote(num_cpus=0)(_BucketAccumulator)
    actors = [
        acc_cls.remote(per_bucket_fn, empty, spill_bytes) for _ in range(num_buckets)
    ]
    with reaped_actors(actors):
        feed_to_actors(
            ds,
            num_buckets,
            lambda batch: multi_key_buckets(batch, key_cols, num_buckets),
            lambda b, sub: actors[b].add.remote(sub),
            received_fn=lambda b: actors[b].received_rows.remote(),
        )
        out_refs = [a.finalize.remote() for a in actors]
        _ray.wait(out_refs, num_returns=len(out_refs), fetch_local=False)
    return rd.from_arrow_refs(out_refs)


# measured on this box (module docstring): below ~10^6 exchanged rows
# the sort groupby's lower fixed cost wins; above it the scatter's flat
# ~2 s beats the sort's row-proportional cost. Env-overridable so a
# cluster with different exchange economics can re-tune without a code
# change.
#
# Round-5 re-calibration caveat: row count is a PROXY — the real driver
# is the input's BLOCK count. A controlled A/B on a pre-materialized
# low-block input showed the sort form winning even at 3M rows
# (0.99-1.18 s vs 1.7-2.3 s scatter), while the crawl_delta union
# (2 × ~258 read blocks feeding the exchange) showed the opposite at
# 1M rows (scatter 9.6 s vs sort 22-24 s) — the sort shuffle's cost
# grows with participating blocks, the scatter's does not. Call sites
# whose input is high-block by construction (page-scale unions) pin
# the scatter form via ``est_rows`` (see ops/web.py::_page_scale_rows)
# rather than re-tuning this global default.
def exchange_crossover_rows() -> int:
    import os

    return int(os.environ.get("KAZU_EXCHANGE_CROSSOVER_ROWS", 1_000_000))


def target_partition_bytes() -> int:
    """Bytes one partition/bucket should hold — the auto-sizing target
    for :func:`auto_partition_count`. 256 MiB default: big enough that
    per-partition fixed costs (actor spawn, file open, manifest) stay
    amortized, comfortably inside a worker heap even ×2-3 expansion
    when a per-bucket fn converts to pandas. ``KAZU_TARGET_PART_BYTES``
    env-overridable for clusters with different worker heaps."""
    import os

    return int(os.environ.get("KAZU_TARGET_PART_BYTES", 256 * 1024 * 1024))


def auto_partition_count(est_bytes: int, lo: int = 4, hi: int = 4096) -> int:
    """Partition/bucket count from an input-size estimate: a 100× input
    gets ~100× partitions automatically instead of needing every call
    site re-tuned (each partition stays ~``target_partition_bytes()``).
    ``lo`` keeps small inputs parallel enough to use the cluster;
    ``hi`` caps actor/file fan-out (at the cap, partitions grow past
    the target and the spill paths — writer sorted runs, accumulator
    IPC runs — absorb the excess, so the cap degrades to disk, not to
    OOM)."""
    import math

    return max(lo, min(hi, math.ceil(max(est_bytes, 1) / target_partition_bytes())))


def exchange_groups(
    ds,
    key_cols: list[str],
    num_buckets: int | None,
    per_bucket_fn,
    empty: pa.Table,
    est_rows: int | None = None,
):
    """Adaptive exchange: same contract as :func:`scatter_groups`
    (``per_bucket_fn`` sees ALL rows of one hash bucket at once), but
    the exchange form is chosen from the exchange SIZE — the sort-based
    ``groupby(bucket).map_groups`` below :func:`exchange_crossover_rows`
    (lower fixed cost), the actor scatter above it (row cost that does
    not grow with a global sort).

    ``est_rows``: the caller's estimate of exchanged rows (e.g. from
    parquet metadata or an upstream count). When ``None`` the input is
    materialized once and the exact count read from block metadata — an
    exchange is a pipeline breaker either way and the materialized
    blocks feed whichever form is chosen, but at extreme scale passing
    an estimate keeps the feed fully streaming (the scatter path never
    holds input blocks AND actor buffers at once).

    ``num_buckets``: when the input is materialized here anyway
    (``est_rows=None``), the measured ``size_bytes()`` can only RAISE
    the caller's count (one bucket per ~``target_partition_bytes()``,
    :func:`auto_partition_count`) — so a 100× input gets ~100× buckets
    without any call site re-tuning, while small inputs keep the
    caller's cluster-scaled count. ``num_buckets=None`` is fully
    auto-sized (forces the materialize pass). Callers that pass
    ``est_rows`` (the fully-streaming contract) keep their explicit
    count — no bytes are measured on that path.
    """
    import ray.data as rd

    if est_rows is None or num_buckets is None:
        ds = ds.materialize()
        est_rows = ds.count()
        auto = auto_partition_count(ds.size_bytes())
        num_buckets = auto if num_buckets is None else max(num_buckets, auto)
    if est_rows == 0:
        return rd.from_arrow(empty)
    if est_rows > exchange_crossover_rows():
        return scatter_groups(ds, key_cols, num_buckets, per_bucket_fn, empty)

    def _assign(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__bucket", multi_key_buckets(batch, key_cols, num_buckets)
        )

    def _per_bucket(group: pa.Table) -> pa.Table:
        out = per_bucket_fn(group.drop(["__bucket"]))
        return out if out.num_rows else empty

    return (
        ds.map_batches(_assign, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_per_bucket, batch_format="pyarrow")
    )
