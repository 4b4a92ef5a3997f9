"""Mergeable sketches.

ray_guide.md ("Aggregation at scale"): "For sketches (HLL, KLL, theta,
MinHash) emit one serialized sketch per batch and merge them in a
second, tiny stage — sketches are designed to be mergeable." MinHash
lives in ``ops/dedup.py``; this module adds a from-scratch
HyperLogLog (Flajolet et al. 2007) for approximate distinct counts —
the shape that replaces an exact ``unique()`` all-to-all when 2%%
error is acceptable at 10^12 rows.

Deterministic (md5-based hashing, no seeds).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


class HyperLogLog:
    """Standard HLL with 2^p registers; registers serialize to bytes so
    one sketch per batch flows through the shuffle instead of the values."""

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def add(self, value: str) -> None:
        h = int(hashlib.md5(value.encode()).hexdigest()[:16], 16)
        idx = h & (self.m - 1)
        w = h >> self.p
        # rank = position of leftmost 1-bit in the remaining 64-p bits
        rank = (64 - self.p) - w.bit_length() + 1
        if rank > self.registers[idx]:
            self.registers[idx] = rank

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        return HyperLogLog(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        inv_sum = np.sum(2.0 ** -self.registers.astype(np.float64))
        e = alpha * m * m / inv_sum
        if e <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                e = m * np.log(m / zeros)  # linear counting for small cardinalities
        # known bias region between ~2.5m and ~5m (the HLL++ empirical
        # bias tables would correct it); typical error 2%, up to ~7% there
        return float(e)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, p: int = 12) -> "HyperLogLog":
        return cls(p, np.frombuffer(data, dtype=np.uint8).copy())


def approx_distinct(ds, value_fn, p: int = 12) -> float:
    """Approximate distinct count over a Dataset: one HLL per batch
    (``map_batches`` emits a single serialized-sketch row), merged on the
    driver (sketches are tiny — 4 KiB each at p=12)."""

    def sketch_batch(batch: pa.Table) -> pa.Table:
        hll = HyperLogLog(p)
        for v in value_fn(batch):
            hll.add(v)
        return pa.table({"sketch": pa.array([hll.to_bytes()], type=pa.binary())})

    merged = HyperLogLog(p)
    for row in ds.map_batches(sketch_batch, batch_format="pyarrow").iter_rows():
        merged = merged.merge(HyperLogLog.from_bytes(row["sketch"], p))
    return merged.estimate()


def approx_distinct_words(docs_ds, p: int = 12) -> float:
    """Approximate vocabulary size without the vocabulary groupby."""

    def words_of(batch: pa.Table):
        for t in batch["text"].to_pylist():
            yield from t.split(" ")

    return approx_distinct(docs_ds, words_of, p)
