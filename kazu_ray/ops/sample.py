"""Deterministic sampling operators.

Training-data pipelines sample constantly (eval splits, ablations,
decontamination spot-checks). ``Dataset.random_sample`` is
seed-dependent per execution plan; these operators instead key the
decision on a content hash, which makes samples (a) reproducible across
runs/engines — the DuckDB oracle computes the identical md5 rule — and
(b) resumable: re-running after a failure selects the same rows.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa


def _bucket(value: str, buckets: int = 100) -> int:
    return int(hashlib.md5(value.encode()).hexdigest()[:8], 16) % buckets


def sample_by_hash(ds, key_col: str, rate_percent: int):
    """Keep rows whose md5(key) bucket (mod 100) < rate_percent."""

    def _filter(batch: pa.Table) -> pa.Table:
        mask = [
            _bucket(str(v)) < rate_percent for v in batch[key_col].to_pylist()
        ]
        return batch.filter(pa.array(mask))

    return ds.map_batches(_filter, batch_format="pyarrow")


def stratified_sample_by_hash(ds, key_col: str, strata_col: str, rates: dict[str, int]):
    """Per-stratum deterministic sampling: ``rates`` maps stratum value →
    keep percentage (missing strata keep 0%)."""

    def _filter(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        strata = batch[strata_col].to_pylist()
        mask = [
            _bucket(str(k)) < rates.get(s, 0) for k, s in zip(keys, strata)
        ]
        return batch.filter(pa.array(mask))

    return ds.map_batches(_filter, batch_format="pyarrow")


def bottom_k_by_hash(ds, key_col: str, k: int):
    """Deterministic uniform k-row sample: keep the k rows with the
    smallest SipHash(key) — a "bottom-k sketch". Unlike ``limit(k)``
    (which takes the FIRST blocks and is arbitrarily biased when the
    data is sorted or clustered by ingest order), the hash order is
    independent of row order, so the sample is uniform over distinct
    keys, reproducible across runs, and needs no prior ``count()``.

    One streaming pass of per-batch partials (each batch contributes at
    most k candidate rows) followed by a tiny sort+limit over ≤
    k×n_blocks partial rows. Output keeps the input schema (the
    internal hash column is dropped)."""
    import pandas as pd

    def _partial(batch: pa.Table) -> pa.Table:
        from kazu_ray.functions.hashing import hash_ids64

        import numpy as np

        # full 64-bit hash, top bit dropped so the sort key fits a
        # non-negative int64 (bucket_ids would narrow to int32 and
        # collide at ~10^5 keys, breaking the uniform/reproducible
        # contract the IVF centroid sample depends on)
        h = (hash_ids64(batch[key_col]) >> np.uint64(1)).astype("int64")

        take = np.argsort(h, kind="stable")[:k]
        out = batch.take(pa.array(take))
        return out.append_column("__h", pa.array(h[take], type=pa.int64()))

    sampled = ds.map_batches(_partial, batch_format="pyarrow").sort("__h").limit(k)
    return sampled.map_batches(
        lambda t: t.drop_columns(["__h"]), batch_format="pyarrow"
    )


def training_order_shuffle(ds, seed: int = 42):
    """Seeded global shuffle — the training-order randomization step of a
    data pipeline. This is a true all-to-all (``random_shuffle``), kept
    OUT of the analysis pipelines on purpose: order-insensitive consumers
    never pay it; only the final training-export does. Deterministic for
    a fixed seed and input."""
    return ds.random_shuffle(seed=seed)


def train_val_test_split(ds, key_col: str, val_percent: int = 10, test_percent: int = 10):
    """Deterministic three-way split: md5(key) bucket < ``test_percent``
    → test; < ``test_percent + val_percent`` → val; else train. One
    pass, no shuffle, reproducible across runs and engines (the DuckDB
    oracle computes the same rule), and resumable — a re-run assigns
    every row to the same split. Returns the input with a ``split``
    column; filter per split downstream (each split filter is a
    narrow map, so writing the three outputs costs three streaming
    passes over pruned columns, never a shuffle)."""

    def _assign(batch: pa.Table) -> pa.Table:
        buckets = [_bucket(str(v)) for v in batch[key_col].to_pylist()]
        split = [
            "test" if b < test_percent else "val" if b < test_percent + val_percent else "train"
            for b in buckets
        ]
        return batch.append_column("split", pa.array(split, type=pa.string()))

    return ds.map_batches(_assign, batch_format="pyarrow")
