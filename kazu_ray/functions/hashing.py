"""Vectorized deterministic bucket hashing.

Shared by the partitioned materializer, the triple-store point lookup
and the bucketed hash join so writer and reader always agree on the
partition function. Uses :func:`pandas.util.hash_array` (SipHash with a
fixed default key): stable across processes, runs and machines — unlike
builtin ``hash`` — and a C kernel per column instead of a per-row
Python ``hashlib.md5`` loop, which was the dominant cost of bucket
assignment on wide inputs.

NOT interchangeable with the DuckDB-reproducible ``md5`` rule used by
``ops/sample.py`` — sampling must stay SQL-recomputable; bucket
assignment only needs internal consistency.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def bucket_ids(col, num_buckets: int) -> np.ndarray:
    """Per-row bucket assignment for an Arrow array/chunked array
    (or anything numpy-coercible). Returns int32 ndarray.

    The hash path is chosen by the column's Arrow TYPE, never by batch
    contents: a nullable int64 batch must not silently promote to
    float64 (pandas NaN promotion) and hash the same key differently
    from a null-free batch of the same column. Nulls co-locate under a
    per-type sentinel — a placement choice, not a correctness one
    (hash bucketing only needs equal values to land together).
    """
    h = hash_ids64(col)
    return (h % np.uint64(num_buckets)).astype(np.int32)


def hash_ids64(col) -> np.ndarray:
    """Full-width uint64 SipHash of a column — same type-dispatched value
    coercion as :func:`bucket_ids`, no modulo / narrowing. Use this when
    the hash is an ORDER key (bottom-k sampling) rather than a bucket id:
    a 32-bit hash has expected birthday collisions at ~10^5 keys, and
    collided keys would then tie-break on nondeterministic block order.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.Array):
        if pa.types.is_integer(col.type):
            vals = col.cast(pa.int64()).fill_null(np.iinfo(np.int64).min).to_numpy()
        elif pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            vals = col.fill_null("").to_pandas().to_numpy()
        else:
            vals = col.to_pandas().to_numpy()
    else:
        vals = np.asarray(col)
    return pd.util.hash_array(vals)


def bucket_of(value, num_buckets: int) -> int:
    """Single-value counterpart of :func:`bucket_ids` for point lookups.

    Matches the column path for object/string columns (the only keys we
    point-look-up)."""
    # int() before %: np.uint64 % python-int silently promotes to
    # float64 and loses low bits, giving a different bucket
    return int(pd.util.hash_array(np.array([value], dtype=object))[0]) % num_buckets
