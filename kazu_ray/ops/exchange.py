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

Capacity assumption (the same one ``map_groups`` carries, now explicit):
one bucket's rows fit one worker — size ``num_buckets`` so the hottest
bucket fits, or salt hot keys upstream. Actors take ``num_cpus=0`` so
``num_buckets`` may exceed the CPU count without deadlocking the feed.

Used by the triple-store materializer and the bucketed hash join in
their specialized forms; this module is the generic group-aggregate
shape.

Crossover, measured on this box: the scatter carries a ~2 s fixed floor
(actor spawn + one sync RPC round per feed batch), so BELOW roughly
10^6 narrow exchanged rows the sort groupby wins (0.7 s vs 2.4 s on the
80k-row minhash banding exchange) and the near-dup ops keep it; at
3.25M wide triple rows the scatter is 38 s → ~3 s. Pick per operator by
expected exchange size, not dogma.
"""

from __future__ import annotations

import pyarrow as pa


class _BucketAccumulator:
    def __init__(self, fn, empty: pa.Table):
        self.fn = fn
        self.empty = empty
        self.tables: list[pa.Table] = []

    def add(self, table: pa.Table) -> int:
        self.tables.append(table)
        return table.num_rows

    def finalize(self) -> pa.Table:
        if not self.tables:
            return self.empty
        table = pa.concat_tables(self.tables)
        self.tables = []
        out = self.fn(table)
        return out.cast(self.empty.schema) if out.schema != self.empty.schema else out


def scatter_groups(ds, key_cols: list[str], num_buckets: int, per_bucket_fn, empty: pa.Table):
    """Co-locate rows by ``hash(key_cols)`` into ``num_buckets`` actors,
    apply ``per_bucket_fn(pa.Table) -> pa.Table`` once per bucket (over
    every group in that bucket at once), return the results as a
    Dataset. ``empty`` fixes the output schema for zero-row buckets.
    """
    import numpy as np
    import pyarrow.compute as pc
    import ray as _ray
    import ray.data as rd

    from kazu_ray.functions.hashing import bucket_ids

    acc_cls = _ray.remote(num_cpus=0)(_BucketAccumulator)
    actors = [acc_cls.remote(per_bucket_fn, empty) for _ in range(num_buckets)]

    def _feed(batch: pa.Table) -> pa.Table:
        h = np.zeros(batch.num_rows, dtype="uint64")
        for c in key_cols:
            h = h * np.uint64(1000003) + bucket_ids(batch[c], 1 << 30).astype("uint64")
        buckets = pa.array((h % np.uint64(num_buckets)).astype("int32"))
        refs = []
        for b in pc.unique(buckets).to_pylist():
            refs.append(actors[b].add.remote(batch.filter(pc.equal(buckets, b))))
        _ray.get(refs)  # backpressure
        return pa.table({"rows": pa.array([batch.num_rows], type=pa.int64())})

    ds.map_batches(_feed, batch_format="pyarrow").count()
    out_refs = [a.finalize.remote() for a in actors]
    _ray.wait(out_refs, num_returns=len(out_refs), fetch_local=False)
    for a in actors:
        _ray.kill(a)
    return rd.from_arrow_refs(out_refs)
