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
import json

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


class CountMinSketch:
    """Count-min sketch (Cormode & Muthukrishnan 2005) with ``d`` rows of
    ``w`` counters — the mergeable scale path for heavy hitters when an
    exact word-count ``groupby`` (ops/text.vocabulary) would shuffle a
    10^9-term vocabulary. Estimates overcount only (min over rows), so
    a candidate top-k from per-batch exact partials re-scored through
    the merged sketch never *misses* a true heavy hitter's weight.

    Deterministic: row hashes are md5 over ``(row_index, value)``;
    counters serialize to bytes so one sketch per batch flows through
    the shuffle, not the values.
    """

    def __init__(self, d: int = 4, w: int = 16384, counts: np.ndarray | None = None):
        self.d = d
        self.w = w
        self.counts = counts if counts is not None else np.zeros((d, w), dtype=np.int64)

    def _indices(self, value: str) -> list[int]:
        return [
            int(hashlib.md5(f"{row}:{value}".encode()).hexdigest()[:8], 16) % self.w
            for row in range(self.d)
        ]

    def add(self, value: str, count: int = 1) -> None:
        for row, idx in enumerate(self._indices(value)):
            self.counts[row, idx] += count

    def estimate(self, value: str) -> int:
        return int(
            min(self.counts[row, idx] for row, idx in enumerate(self._indices(value)))
        )

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        return CountMinSketch(self.d, self.w, self.counts + other.counts)

    def to_bytes(self) -> bytes:
        return self.counts.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, d: int = 4, w: int = 16384) -> "CountMinSketch":
        return cls(d, w, np.frombuffer(data, dtype=np.int64).reshape(d, w).copy())


def approx_heavy_hitters(docs_ds, k: int = 20, d: int = 4, w: int = 16384):
    """Approximate top-k words: each batch emits ONE serialized CMS plus
    its exact per-batch top-``k`` candidates (a word in the global top-k
    must be in some batch's local top-k when batches are large relative
    to k — the standard candidates+sketch argument); the driver merges
    the tiny sketch set and re-scores the candidate union. Returns a
    pandas frame (word, est_count) sorted desc. The all-to-all moves
    d×w counters per block instead of the vocabulary."""
    import pandas as pd

    def sketch_batch(batch: pa.Table) -> pa.Table:
        cms = CountMinSketch(d, w)
        local: dict[str, int] = {}
        for text in batch["text"].to_pylist():
            for word in text.split(" "):
                if word:
                    local[word] = local.get(word, 0) + 1
        for word, n in local.items():
            cms.add(word, n)
        top = sorted(local.items(), key=lambda kv: (-kv[1], kv[0]))[: k * 4]
        return pa.table(
            {
                "sketch": pa.array([cms.to_bytes()], type=pa.binary()),
                "candidates": pa.array([json.dumps([wd for wd, _ in top])], type=pa.string()),
            }
        )

    rows = docs_ds.map_batches(
        sketch_batch, batch_format="pyarrow", batch_size=4096
    ).take_all()
    merged = CountMinSketch(d, w)
    candidates: set[str] = set()
    for row in rows:
        merged = merged.merge(CountMinSketch.from_bytes(row["sketch"], d, w))
        candidates.update(json.loads(row["candidates"]))
    scored = sorted(
        ((wd, merged.estimate(wd)) for wd in candidates), key=lambda kv: (-kv[1], kv[0])
    )[:k]
    return pd.DataFrame(scored, columns=["word", "est_count"])


class DDSketch:
    """Mergeable quantile sketch (Masson et al., VLDB 2019): values map
    to log-scale buckets ``ceil(log_gamma(x))``, so any quantile comes
    back within relative error ``alpha`` and two sketches merge by
    adding bucket counts — the shape that replaces an exact
    ``Dataset.sort`` when a percentile (p50/p95/p99 latency, doc-length
    tails) is needed over 10^12 rows. Positive values only; zeros and
    negatives are counted separately / rejected like the paper's basic
    variant. Deterministic, no seeds."""

    def __init__(self, alpha: float = 0.01, counts: dict[int, int] | None = None, n_zero: int = 0):
        self.alpha = alpha
        self.gamma = (1 + alpha) / (1 - alpha)
        self._log_gamma = np.log(self.gamma)
        self.counts: dict[int, int] = counts if counts is not None else {}
        self.n_zero = n_zero

    def add_many(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        if np.any(values < 0):
            raise ValueError("DDSketch accepts non-negative values only")
        self.n_zero += int(np.count_nonzero(values == 0))
        pos = values[values > 0]
        if len(pos) == 0:
            return
        keys = np.ceil(np.log(pos) / self._log_gamma).astype(np.int64)
        uniq, cnt = np.unique(keys, return_counts=True)
        for k, c in zip(uniq.tolist(), cnt.tolist()):
            self.counts[k] = self.counts.get(k, 0) + int(c)

    @property
    def n(self) -> int:
        return self.n_zero + sum(self.counts.values())

    def merge(self, other: "DDSketch") -> "DDSketch":
        counts = dict(self.counts)
        for k, c in other.counts.items():
            counts[k] = counts.get(k, 0) + c
        return DDSketch(self.alpha, counts, self.n_zero + other.n_zero)

    def quantile(self, q: float) -> float:
        if not 0 <= q <= 1 or self.n == 0:
            raise ValueError("empty sketch or q outside [0, 1]")
        rank = q * (self.n - 1)
        if rank < self.n_zero:
            return 0.0
        seen = self.n_zero
        for k in sorted(self.counts):
            seen += self.counts[k]
            if seen > rank:
                # bucket k covers (gamma^(k-1), gamma^k]; midpoint
                # estimate gives the 2*alpha/(1+alpha) relative bound
                return float(2 * self.gamma**k / (self.gamma + 1))
        return float(2 * self.gamma ** max(self.counts) / (self.gamma + 1))

    def to_bytes(self) -> bytes:
        items = sorted(self.counts.items())
        arr = np.array(
            [self.n_zero] + [x for kv in items for x in kv], dtype=np.int64
        )
        return arr.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, alpha: float = 0.01) -> "DDSketch":
        arr = np.frombuffer(data, dtype=np.int64)
        n_zero = int(arr[0])
        kv = arr[1:].reshape(-1, 2)
        return cls(alpha, {int(k): int(c) for k, c in kv}, n_zero)


def approx_quantiles(ds, col: str, qs: tuple = (0.5, 0.95, 0.99), alpha: float = 0.01):
    """Approximate quantiles of a numeric column: one serialized DDSketch
    per batch, merged on the driver — no sort, no all-to-all; the
    shuffle carries one bucket map per block. Returns {q: value}."""

    def sketch_batch(batch: pa.Table) -> pa.Table:
        sk = DDSketch(alpha)
        sk.add_many(batch[col].to_numpy(zero_copy_only=False))
        return pa.table({"sketch": pa.array([sk.to_bytes()], type=pa.binary())})

    merged = DDSketch(alpha)
    for row in ds.map_batches(sketch_batch, batch_format="pyarrow", batch_size=8192).take_all():
        merged = merged.merge(DDSketch.from_bytes(row["sketch"], alpha))
    return {q: merged.quantile(q) for q in qs}
