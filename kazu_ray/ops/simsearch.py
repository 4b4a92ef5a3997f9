"""Similarity search over the ``embeddings`` table.

* :func:`topk_cosine` — brute-force baseline: per-batch numpy matmul
  against a broadcast query vector (one ``ray.put`` → read in every
  task), per-batch top-k partials, final merge via sort+limit on the
  tiny partial set. Linear scan, embarrassingly parallel — the correct
  baseline at any scale.
* :func:`ivf_topk_cosine` — the scale path: a one-pass IVF-style index.
  Deterministic k-means-- (fixed seed, few iterations) builds C
  centroids on a sample; vectors are bucketed by nearest centroid
  (``groupby`` shuffle keyed by centroid); queries probe only the
  nprobe nearest buckets. At 10^9 vectors only ~nprobe/C of the data is
  scanned per query.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from kazu_ray.ops.dedup import TopKCosineStage


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def topk_cosine(embeddings_ds, query_vec, k: int = 10):
    """Returns a Dataset of (vec_id, cosine), the global top-k."""
    partials = embeddings_ds.map_batches(
        TopKCosineStage,
        fn_constructor_args=(query_vec, k),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )
    return partials.sort("cosine", descending=True).limit(k)


def _centroid_sample(embeddings_ds, sample_size: int) -> np.ndarray:
    """Driver-side centroid-training sample, drawn with a deterministic
    bottom-k-by-hash sketch (``ops/sample.py``) rather than ``limit()``:
    ``limit`` takes the FIRST blocks, so on a corpus sorted or clustered
    by ingest order the centroids would be biased toward the head and
    recall would silently degrade at scale."""
    from kazu_ray.ops.sample import bottom_k_by_hash

    tbl = bottom_k_by_hash(embeddings_ds, "vec_id", sample_size).to_pandas()
    return np.array(tbl["embedding"].tolist(), dtype=np.float64)


def kmeans_centroids(sample: np.ndarray, n_clusters: int, iters: int = 10, seed: int = 42):
    rng = np.random.RandomState(seed)
    sample = _normalize(sample.astype(np.float64))
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)), replace=False)
    centroids = sample[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    centroids[c] = v / n
    return centroids


class _BucketAssign:
    """Assign each vector to its ``n_assign`` nearest centroids.

    ``n_assign=1`` is classic IVF; ``n_assign=2`` is the multi-probe
    variant: a pair straddling a centroid boundary still shares at least
    one of the two assigned buckets (for near-1.0 thresholds), closing
    the single-probe recall caveat. Rows are exploded ×n_assign, so
    downstream pair generation must dedupe."""

    def __init__(self, centroids: np.ndarray, n_assign: int = 1):
        self.centroids = centroids
        self.n_assign = n_assign

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _normalize(np.array(batch["embedding"].to_pylist(), dtype=np.float64))
        sims = mat @ self.centroids.T
        if self.n_assign == 1:
            assign = np.argmax(sims, axis=1)
            return batch.append_column("bucket", pa.array(assign.astype(np.int32)))
        k = min(self.n_assign, sims.shape[1])
        top = np.argsort(-sims, axis=1)[:, :k]  # (n, k)
        idx = np.repeat(np.arange(batch.num_rows), k)
        out = batch.take(pa.array(idx))
        return out.append_column(
            "bucket", pa.array(top.reshape(-1).astype(np.int32))
        )


def ivf_topk_cosine(
    embeddings_ds,
    query_vec,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    sample_size: int = 2048,
    n_assign: int = 2,
):
    """IVF search: centroids from a driver-side sample (small, one-off),
    bucket-filtered brute force over the nprobe nearest buckets.

    ``n_assign=2`` (multi-probe on the INDEX side, like
    :func:`ivf_near_dup_pairs`): each vector lands in its top-2 centroid
    buckets, so a neighbor straddling a centroid boundary is still
    visible to a probe of either side — recall rises for 2× index rows
    in the probed region. The duplicate rows this creates are collapsed
    after the (tiny) final top-k merge."""
    import pandas as pd
    import pyarrow.compute as pc

    centroids = kmeans_centroids(_centroid_sample(embeddings_ds, sample_size), n_clusters)

    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    probe = np.argsort(-(centroids @ q))[:nprobe].astype(np.int32)

    bucketed = embeddings_ds.map_batches(
        _BucketAssign, fn_constructor_args=(centroids, n_assign), batch_format="pyarrow",
        concurrency=(1, 4),
    )
    probed = bucketed.map_batches(
        lambda t, _p=set(probe.tolist()): t.filter(
            pc.is_in(t["bucket"], pa.array(sorted(_p), type=pa.int32()))
        ),
        batch_format="pyarrow",
    )
    # over-fetch 2k then dedupe: a vector assigned to two probed buckets
    # appears twice with an identical cosine; the post-limit set is tiny
    top = topk_cosine(probed, query_vec, k=2 * k)

    def dedupe_head(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["cosine", "vec_id"], ascending=[False, True])
            .drop_duplicates("vec_id")
            .head(k)
        )

    return top.map_batches(dedupe_head, batch_format="pandas", batch_size=4 * k)


def ivf_near_dup_pairs(
    embeddings_ds,
    threshold: float = 0.999,
    n_clusters: int = 16,
    sample_size: int = 2048,
    n_assign: int = 2,
):
    """Embedding-cosine near-dup pairs — the scale path.

    Near-identical vectors share a nearest centroid (for thresholds
    near 1.0), so candidates are generated per centroid bucket via a
    ``groupby("bucket")`` shuffle and verified with an exact in-bucket
    matmul. Pairwise work drops from O(N²) to Σ O(|bucket|²); at 10^9
    vectors, raise n_clusters so buckets stay bounded. Returns a Dataset
    of (id_a, id_b).

    With ``n_assign=2`` (default) each vector lands in its top-2 centroid
    buckets, so a pair straddling a centroid boundary is still generated
    in whichever bucket both sides share; the duplicate pairs this
    creates are removed by the final tiny groupby.
    """
    import pandas as pd
    import pyarrow as pa

    centroids = kmeans_centroids(_centroid_sample(embeddings_ds, sample_size), n_clusters)

    bucketed = embeddings_ds.map_batches(
        _BucketAssign,
        fn_constructor_args=(centroids, n_assign),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("vec_id")
        ids = np.array(g["vec_id"], dtype=np.int64)
        mat = _normalize(np.array(g["embedding"].tolist(), dtype=np.float64))
        sims = mat @ mat.T
        ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
        if len(ii) == 0:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")}
            )
        a = np.minimum(ids[ii], ids[jj])
        b = np.maximum(ids[ii], ids[jj])
        return pd.DataFrame({"id_a": a, "id_b": b})

    pairs = bucketed.groupby("bucket").map_groups(_pairs, batch_format="pandas")
    # a pair can be found in up to n_assign shared buckets — consumers
    # dedupe locally (pairs_to_table); a shuffle here isn't worth it
    from kazu_ray.ops.dedup import _anchor_pairs_schema

    return _anchor_pairs_schema(pairs)


class _KnnJoinStage:
    """Per-batch brute-force scores of the corpus batch against a
    BROADCAST query matrix (``ray.put`` once, zero-copy per worker),
    emitting per-(query, batch) top-k partials — the map side of the
    k-NN join. The reduce side is a tiny per-query merge."""

    def __init__(self, queries_ref, k: int):
        import ray

        q = queries_ref
        if not isinstance(q, (list, tuple, np.ndarray, dict)):
            q = ray.get(q)
        self.q_ids = np.asarray(q["query_id"], dtype=np.int64)
        qm = _normalize(np.asarray(q["matrix"], dtype=np.float64))
        self.qm = qm
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        mat = _normalize(np.array(batch["embedding"].to_pylist(), dtype=np.float64))
        sims = self.qm @ mat.T  # (n_queries, n_batch)
        k = min(self.k, sims.shape[1])
        rows_q, rows_v, rows_s = [], [], []
        for qi in range(sims.shape[0]):
            s = sims[qi]
            # argpartition alone keeps an ARBITRARY subset of
            # cosine-tied candidates at the k boundary; the documented
            # tie-break is (-cosine, vec_id), so widen to every row
            # tied with the boundary value, then order deterministically
            part = np.argpartition(-s, kth=k - 1)[:k]
            thresh = s[part].min()
            cand = np.flatnonzero(s >= thresh)
            order = cand[np.lexsort((ids[cand], -s[cand]))][:k]
            for j in order:
                rows_q.append(self.q_ids[qi])
                rows_v.append(ids[j])
                rows_s.append(s[j])
        return pa.table(
            {
                "query_id": pa.array(rows_q, type=pa.int64()),
                "vec_id": pa.array(rows_v, type=pa.int64()),
                "cosine": pa.array(rows_s, type=pa.float64()),
            }
        )


def knn_join(embeddings_ds, query_ids, query_matrix, k: int = 5):
    """k-NN JOIN: for EVERY query vector, the top-k corpus neighbors by
    cosine — the hard-negative-mining / retrieval-eval shape (a
    single-query :func:`topk_cosine` per row would rescan the corpus M
    times). One corpus pass: the query matrix is broadcast, each batch
    emits per-query top-k partials (M×k rows per batch), and a small
    ``groupby(query_id)`` merge keeps the global top-k per query.
    Deterministic tie-break: (-cosine, vec_id). Returns a Dataset of
    (query_id, vec_id, cosine, rank).

    At 10^9 corpus rows × 10^4 queries the partial set is
    n_blocks × M × k narrow rows — the only shuffle is over partials,
    never embeddings. For M beyond ~10^5 split the query set and run
    passes per slice (matmul height bounds worker memory)."""
    import pandas as pd
    import ray

    payload = {
        "query_id": np.asarray(query_ids, dtype=np.int64),
        "matrix": np.asarray(query_matrix, dtype=np.float64),
    }
    ref = ray.put(payload) if ray.is_initialized() else payload

    partials = embeddings_ds.map_batches(
        _KnnJoinStage,
        fn_constructor_args=(ref, k),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def quantize_embeddings_batch(batch: pa.Table) -> pa.Table:
    """Symmetric int8 quantization, flattened to (vec_id, dim, q) rows
    plus the per-vector scale — the storage-compression step of an
    embedding pipeline (4× smaller index, matmul in int8 downstream).

    Deterministic cross-engine rule: all math in float64,
    ``q = floor(x * 127 / max_abs + 0.5)`` (explicit half-up — numpy's
    round() is half-even, DuckDB's is half-away, so neither is used).
    Zero vectors quantize to all-zero with scale 0.
    """
    import pyarrow.compute as pc

    ids = batch["vec_id"].to_numpy(zero_copy_only=False)
    mat = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
    n, d = mat.shape
    max_abs = np.abs(mat).max(axis=1)
    safe = np.where(max_abs == 0, 1.0, max_abs)
    q = np.floor(mat * 127.0 / safe[:, None] + 0.5).astype(np.int64)
    q[max_abs == 0] = 0
    return pa.table(
        {
            "vec_id": pa.array(np.repeat(ids, d), type=pa.int64()),
            "dim": pa.array(np.tile(np.arange(d), n), type=pa.int64()),
            "q": pa.array(q.reshape(-1), type=pa.int64()),
            "max_abs": pa.array(np.repeat(max_abs, d), type=pa.float64()),
        }
    )


def kmeans_cluster_sizes(
    embeddings_ds,
    n_clusters: int = 16,
    sample_size: int = 2048,
    centroids_dir: str | None = None,
):
    """Deterministic k-means clustering over the embedding column —
    the semantic-bucketing step of a training-data pipeline (domain
    mixing, per-cluster sampling quotas). Returns (cluster_id, n_vecs)
    with every cluster id present (zero-member clusters included, so
    the output schema is independent of the data).

    Scale shape: centroids train on the order-independent
    bottom-k-by-hash sample (bounded driver memory, same sketch as the
    IVF index); assignment is ONE streaming map_batches pass (argmax of
    the cosine matmul per batch, ties to the lowest cluster id —
    np.argmax's first-hit rule) emitting per-batch cluster-count
    partials; the final groupby moves ≤ n_clusters rows per block.

    When ``centroids_dir`` is set the trained centroids are written as
    parquet (cluster_id, centroid) so an external checker (the DuckDB
    oracle) can recompute the assignment argmax independently — the
    clustering itself is iterative and not SQL-expressible, but the
    assignment + counting IS, given the centroids artifact.
    """
    from ray.data.aggregate import Sum

    sample = _centroid_sample(embeddings_ds, sample_size)
    centroids = kmeans_centroids(sample, n_clusters)

    if centroids_dir is not None:
        import os

        import pyarrow.parquet as pq

        os.makedirs(centroids_dir, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "cluster_id": pa.array(range(len(centroids)), type=pa.int64()),
                    "centroid": pa.array(
                        [c.tolist() for c in centroids],
                        type=pa.list_(pa.float64()),
                    ),
                }
            ),
            f"{centroids_dir}/centroids.parquet",
        )

    import ray

    cent_ref = ray.put(centroids) if ray.is_initialized() else centroids

    def count_partial(batch: pa.Table) -> pa.Table:
        cents = ray.get(cent_ref) if not isinstance(cent_ref, np.ndarray) else cent_ref
        mat = _normalize(np.array(batch["embedding"].to_pylist(), dtype=np.float64))
        assign = np.argmax(mat @ cents.T, axis=1)
        uc, cnt = np.unique(assign, return_counts=True)
        return pa.table(
            {
                "cluster_id": pa.array(uc.astype("int64")),
                "c": pa.array(cnt.astype("int64")),
            }
        )

    counts = (
        embeddings_ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("cluster_id")
        .aggregate(Sum("c", alias_name="n_vecs"))
        .to_pandas()
    )
    import pandas as pd

    full = (
        counts.set_index("cluster_id")
        .reindex(range(len(centroids)), fill_value=0)
        .reset_index()
    )
    full["n_vecs"] = full["n_vecs"].astype("int64")
    return full
