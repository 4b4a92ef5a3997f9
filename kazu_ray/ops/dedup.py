"""Deduplication operators.

The scale-out shapes (ray_guide.md "Aggregation at scale"):

* exact      — content-hash + per-batch partial aggregate (combiner)
               then a small groupby; never ships full texts through the
               shuffle, only (hash, min_id, count) partials.
* minhash-LSH— shingle → minhash → band rows → groupby(band, bucket)
               → candidate pairs → Jaccard verify. The shuffle moves
               fixed-width band rows, not documents.
* simhash    — 64-bit simhash + bucket by 16-bit chunks (hamming ≤ k
               candidates must share a chunk by pigeonhole).
* ngram-jaccard / embedding-cosine — verification kernels used by the
  above / over the ``embeddings`` table.

All deterministic (seeded hash mixing, no wall clock).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def _exact_partial_batch(batch: pa.Table) -> pa.Table:
    agg: dict[str, tuple[int, int]] = {}
    for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        h = hashlib.md5(text.encode()).hexdigest()
        cur = agg.get(h)
        if cur is None:
            agg[h] = (doc_id, 1)
        else:
            agg[h] = (min(cur[0], doc_id), cur[1] + 1)
    hs = sorted(agg)
    return pa.table(
        {
            "h": pa.array(hs, type=pa.string()),
            "keep_id": pa.array([agg[h][0] for h in hs], type=pa.int64()),
            "n": pa.array([agg[h][1] for h in hs], type=pa.int64()),
        }
    )


def shuffle_parts(per_cpu: float = 0.5, lo: int = 8, hi: int = 256) -> int:
    """Partition count for small-partial shuffles, scaled to the cluster
    (fixed constants under-parallelize a big cluster and over-task a
    small one)."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    return max(lo, min(hi, int(cpus * per_cpu)))


def exact_dedup_groups(docs_ds):
    """One row per distinct text: (h, keep_id=min doc_id, n=count).
    Partial-aggregate inside map_batches, tiny groupby after."""
    from ray.data.aggregate import Min, Sum

    partials = docs_ds.map_batches(_exact_partial_batch, batch_format="pyarrow")
    # partial rows are tiny (one per distinct hash per batch): bound the
    # shuffle's task count instead of inheriting the 200-partition default
    return partials.repartition(shuffle_parts()).groupby("h").aggregate(
        Min("keep_id", alias_name="keep_id"), Sum("n", alias_name="n")
    )


# ---------------------------------------------------------------------------
# shingles / jaccard
# ---------------------------------------------------------------------------


def word_shingles(text: str, k: int = 3) -> set[str]:
    words = text.split(" ")
    if len(words) < k:
        return {" ".join(words)}
    return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _hash_params(num_perm: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return a, b


def minhash_signature(shingles: set[str], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if not shingles:
        return np.zeros(len(a), dtype=np.uint64)
    # one SipHash C kernel over the shingle set (stable across processes,
    # like the bucket hashing in functions/hashing.py) — the previous
    # md5-per-shingle Python loop was the dominant minhash cost
    # no sort needed (the per-permutation min is order-independent);
    # categorize=False skips a factorization pass that costs more than
    # it saves on mostly-unique shingles (measured 46 ms vs 102 ms, and
    # vs 63 ms for the md5 loop this replaces)
    base = pd.util.hash_array(
        np.fromiter(shingles, dtype=object, count=len(shingles)), categorize=False
    ).view(np.int64)
    # (a*x + b) mod p per permutation, min over shingles — vectorized
    vals = (base[None, :] * a[:, None] + b[:, None]) % _MERSENNE
    return vals.min(axis=1).astype(np.uint64)


class MinHashStage:
    """docs → (doc_id, band, bucket) rows; hash params built per actor."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3):
        assert num_perm % bands == 0
        self.a, self.b = _hash_params(num_perm)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, bands, buckets = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            sig = minhash_signature(word_shingles(text, self.shingle_k), self.a, self.b)
            for band in range(self.bands):
                chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                bucket = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
                doc_ids.append(doc_id)
                bands.append(band)
                buckets.append(bucket)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "band": pa.array(bands, type=pa.int32()),
                "bucket": pa.array(buckets, type=pa.string()),
            }
        )


# per-worker stage cache for task-based dedup stages (Ray reuses worker
# processes, so tasks get actor-style state amortization without the
# actor-pool spin-up latency — same pattern as stages/fused.py)
_WORKER_CACHE: dict = {}


def minhash_candidate_pairs(docs_ds, num_perm: int = 64, bands: int = 16, coarse: int = 32):
    """Candidate near-dup pairs via LSH banding.

    Shuffle design: ``(band, bucket)`` keys are near-unique (most buckets
    hold one doc), so a per-bucket ``map_groups`` would pay a Python call
    per bucket. Instead the shuffle key is ``coarse = hash(bucket) %% 32``
    — each group then holds thousands of buckets and the per-group body
    processes them with one vectorized pandas groupby. Same result, two
    orders of magnitude fewer group invocations.
    """
    key = ("minhash", num_perm, bands)

    def _minhash_task(batch: pa.Table) -> pa.Table:
        stage = _WORKER_CACHE.get(key)
        if stage is None:
            stage = MinHashStage(num_perm, bands)
            _WORKER_CACHE[key] = stage
        return stage(batch)

    band_rows = docs_ds.map_batches(_minhash_task, batch_format="pyarrow")

    def add_coarse(batch: pa.Table) -> pa.Table:
        vals = [
            int(b[:4], 16) % coarse for b in batch["bucket"].to_pylist()
        ]
        return batch.append_column("coarse", pa.array(vals, type=pa.int32()))

    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        out: set[tuple[int, int]] = set()
        for _, sub in group.groupby(["band", "bucket"]):
            if len(sub) < 2:
                continue
            ids = sorted(set(sub["doc_id"]))
            out.update((a, b) for i, a in enumerate(ids) for b in ids[i + 1 :])
        if not out:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")}
            )
        rows = sorted(out)
        return pd.DataFrame(rows, columns=["id_a", "id_b"])

    # exchange choice, measured (see ops/exchange.py): the groupby form
    # is faster below ~10^6 exchanged rows (0.7 s vs the scatter's ~2 s
    # actor-spawn + RPC floor on this corpus's 80k band rows); above
    # that, or on wide rows, switch to scatter_groups like the triple
    # store and the bucketed join do
    pairs = (
        band_rows.map_batches(add_coarse, batch_format="pyarrow")
        .groupby("coarse")
        .map_groups(_pairs, batch_format="pandas")
    )
    # NOTE: a pair found in multiple coarse buckets appears multiple
    # times; consumers dedupe (pairs_to_table / set-compare in tests) —
    # a distributed dedupe shuffle over this tiny set cost more wall
    # time than every consumer's local dedupe combined
    return _anchor_pairs_schema(pairs)


def verify_pairs_jaccard(pairs_df: pd.DataFrame, texts: dict[int, str], threshold: float, k: int = 3):
    """Driver-side verify over the (provably small) candidate set."""
    rows = []
    for a, b in zip(pairs_df["id_a"], pairs_df["id_b"]):
        j = jaccard(word_shingles(texts[a], k), word_shingles(texts[b], k))
        if j >= threshold:
            rows.append((a, b, j))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])


# shingle-set serialization separator: shingles are space-joined words,
# so any non-space control char is collision-free for whitespace-token text
_SHINGLE_SEP = "\x1f"


class _ShingleSemiJoin:
    """Broadcast semi-join: keep only docs whose id appears in the
    candidate pairs (the small side, shipped once via ray.put), and emit
    their shingle set serialized as one separator-joined string (a plain
    string column survives the pandas merge inside the bucketed join;
    list columns do not). The corpus streams; no shuffle, no driver
    text dict."""

    def __init__(self, ids_ref, k: int):
        import ray

        ids = ray.get(ids_ref) if not isinstance(ids_ref, (list, tuple, set, frozenset)) else ids_ref
        self.value_set = pa.array(sorted(ids), type=pa.int64())
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sub = batch.filter(pc.is_in(batch["doc_id"], value_set=self.value_set))
        sh = [
            _SHINGLE_SEP.join(sorted(word_shingles(t, self.k)))
            for t in sub["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": sub["doc_id"],
                "shingles": pa.array(sh, type=pa.large_string()),
            }
        )


def _anchor_pairs_schema(pairs_ds):
    """Union with an explicit empty (id_a, id_b) block so a zero-pair
    result still reports the correct schema (map_groups on an empty
    stream otherwise yields a schema-less dataset)."""
    import ray.data as rd

    empty = pa.table(
        {
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
        }
    )
    # anchor first: union adopts the leading dataset's schema when the
    # other side is schema-less (fully-empty map_groups output)
    return rd.from_arrow(empty).union(pairs_ds)


def pairs_to_table(pairs_ds) -> pa.Table:
    """Collect a pair Dataset into one Arrow table with a guaranteed
    (id_a, id_b) int64 schema — ``Dataset.to_pandas()`` drops column
    names entirely on 0-row results, which breaks schema comparison
    against SQL oracles. Dedupes (a pair can be generated in several
    LSH buckets — cheaper here as one Arrow group-by than as a
    distributed shuffle over an already-tiny set) and sorts. Only ever
    used on LSH/IVF pair OUTPUTS, which are small by contract; the
    generation upstream stays distributed."""
    import pyarrow.compute as pc

    tables = [
        pa.table(
            {
                "id_a": pc.cast(b["id_a"], pa.int64()),
                "id_b": pc.cast(b["id_b"], pa.int64()),
            }
        )
        for b in pairs_ds.iter_batches(batch_format="pyarrow")
    ]
    if not tables:
        return pa.table(
            {
                "id_a": pa.array([], type=pa.int64()),
                "id_b": pa.array([], type=pa.int64()),
            }
        )
    out = pa.concat_tables(tables).group_by(["id_a", "id_b"]).aggregate([])
    return out.sort_by([("id_a", "ascending"), ("id_b", "ascending")])


def verify_pairs_jaccard_ds(
    pairs_ds, docs_ds, threshold: float = 0.6, k: int = 3, max_gather_pairs: int = 200_000
):
    """Distributed exact-Jaccard verify of LSH candidate pairs.

    Scale shape: (1) collect only the DISTINCT DOC IDS of the candidate
    pairs (small by the LSH output contract — never the texts); (2)
    broadcast them and stream the corpus ONCE through a filtering
    shingle stage (no shuffle); then (3a) for pair sets up to
    ``max_gather_pairs``, gather the filtered shingle rows — bounded by
    2×|pairs| rows, the same size class as the pair set itself — and
    broadcast them back for a per-batch verify over the pairs Dataset
    (zero shuffles end to end); (3b) beyond that bound, fall back to
    two bucketed hash joins (pairs × filtered-docs, both small) so
    driver memory stays O(|ids|) ints. Returns a Dataset of
    (id_a, id_b); duplicates of duplicate candidates are preserved
    (consumers dedupe — see pairs_to_table).
    """
    import ray

    pairs = pairs_ds.materialize()
    ids: set[int] = set()
    n_pairs = 0
    for b in pairs.iter_batches(batch_format="pyarrow"):
        n_pairs += b.num_rows
        ids.update(b["id_a"].to_pylist())
        ids.update(b["id_b"].to_pylist())
    ids_ref = ray.put(frozenset(ids)) if ray.is_initialized() else frozenset(ids)

    shingle_key = ("shingle_semijoin", id(ids_ref), k)

    def _shingle_task(batch: pa.Table) -> pa.Table:
        stage = _WORKER_CACHE.get(shingle_key)
        if stage is None:
            stage = _ShingleSemiJoin(ids_ref, k)
            _WORKER_CACHE[shingle_key] = stage
        return stage(batch)

    docs_sh = docs_ds.map_batches(_shingle_task, batch_format="pyarrow")

    if n_pairs <= max_gather_pairs:
        # the filtered shingle rows are bounded by 2×|pairs| — the same
        # size class as the already-driver-resident pair list — so the
        # final verify runs locally: zero extra dataset executions
        sh: dict[int, str] = {}
        for b in docs_sh.iter_batches(batch_format="pyarrow"):
            sh.update(zip(b["doc_id"].to_pylist(), b["shingles"].to_pylist()))
        ia, ib = [], []
        for b in pairs.iter_batches(batch_format="pyarrow"):
            for a, bb in zip(b["id_a"].to_pylist(), b["id_b"].to_pylist()):
                sa, sb = sh.get(a), sh.get(bb)
                if sa is None or sb is None:
                    continue
                if (
                    jaccard(set(sa.split(_SHINGLE_SEP)), set(sb.split(_SHINGLE_SEP)))
                    >= threshold
                ):
                    ia.append(a)
                    ib.append(bb)
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array(ia, type=pa.int64()),
                    "id_b": pa.array(ib, type=pa.int64()),
                }
            )
        )

    # large-pair-set fallback: bucketed joins, nothing big on the driver
    from kazu_ray.ops.joins import bucketed_hash_join

    side_a = docs_sh.map_batches(
        lambda t: pa.table({"id_a": t["doc_id"], "sh_a": t["shingles"]}),
        batch_format="pyarrow",
    )
    side_b = docs_sh.map_batches(
        lambda t: pa.table({"id_b": t["doc_id"], "sh_b": t["shingles"]}),
        batch_format="pyarrow",
    )
    j1 = bucketed_hash_join(pairs, side_a, on="id_a", num_buckets=8)

    def _rearrow(t: pa.Table) -> pa.Table:
        # normalize the pandas-block output of the first join back to
        # explicit Arrow types so the second join's schema introspection
        # sees DataTypes, not numpy/python classes
        import pyarrow.compute as pc

        return pa.table(
            {
                "id_a": pc.cast(t["id_a"], pa.int64()),
                "id_b": pc.cast(t["id_b"], pa.int64()),
                "sh_a": pc.cast(t["sh_a"], pa.large_string()),
            }
        )

    j2 = bucketed_hash_join(
        j1.map_batches(_rearrow, batch_format="pyarrow"), side_b, on="id_b", num_buckets=8
    )

    def _verify(batch: pa.Table) -> pa.Table:
        ia, ib = [], []
        for a, b, sa, sb in zip(
            batch["id_a"].to_pylist(),
            batch["id_b"].to_pylist(),
            batch["sh_a"].to_pylist(),
            batch["sh_b"].to_pylist(),
        ):
            if jaccard(set(sa.split(_SHINGLE_SEP)), set(sb.split(_SHINGLE_SEP))) >= threshold:
                ia.append(a)
                ib.append(b)
        return pa.table(
            {
                "id_a": pa.array(ia, type=pa.int64()),
                "id_b": pa.array(ib, type=pa.int64()),
            }
        )

    return _anchor_pairs_schema(j2.map_batches(_verify, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# exact n-gram Jaccard all-pairs (prefix filtering)
# ---------------------------------------------------------------------------


def _doc_shingle_hashes(text: str, k: int) -> np.ndarray:
    """Sorted distinct 64-bit hashes of a doc's word k-shingles (same
    SipHash kernel as the minhash signature path)."""
    sh = word_shingles(text, k)
    h = pd.util.hash_array(
        np.fromiter(sh, dtype=object, count=len(sh)), categorize=False
    )
    return np.unique(h)  # sorted + distinct


def ngram_jaccard_pairs(
    docs_ds,
    threshold: float = 0.7,
    k: int = 3,
    coarse: int = 32,
    hot_df: int = 64,
):
    """EXACT all-pairs n-gram Jaccard join (J >= threshold) via prefix
    filtering (Bayardo et al., "Scaling Up All Pairs Similarity Search",
    WWW'07; the PPJoin family) — the exact companion to the approximate
    MinHash-LSH path.

    Scale shape: a doc with n distinct shingles indexes only its first
    ``n - ceil(t*n) + 1`` shingles under a global total order — any pair
    with J >= t MUST collide on at least one indexed shingle (prefix
    lemma), for ANY total order, so the candidate set is a provable
    superset and the exact verify (``verify_pairs_jaccard_ds``,
    distributed) makes the result exact. The order used is
    (is-hot, hash64): a one-pass combiner-first df count finds shingles
    with df >= ``hot_df`` and sorts them LAST, so stopword-like shingles
    almost never enter a prefix and posting lists stay short — pure
    pruning, zero recall effect. Candidate generation reuses the
    minhash coarse-key shuffle shape (fixed-width rows, vectorized
    per-group pandas body) with the size filter ``min(na,nb) >=
    t*max(na,nb)`` applied inside each posting.

    Shingle-hash collisions only merge set elements, which can only
    RAISE hash-space Jaccard — candidates stay a superset; the verify
    recomputes true-shingle Jaccard. Capacity: the broadcast hot set is
    bounded by total-shingle-occurrences / hot_df (Zipf head); postings
    for non-hot shingles are < hot_df rows by construction.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    key = ("njp_shingle", k)

    def _hashes_of(text: str) -> np.ndarray:
        return _doc_shingle_hashes(text or "", k)

    # pass 1: document frequency per shingle hash (combiner partials)
    def _df_partial(batch: pa.Table) -> pa.Table:
        per_doc = [_hashes_of(t) for t in batch["text"].to_pylist()]
        if not per_doc:
            return pa.table(
                {"h": pa.array([], type=pa.uint64()), "c": pa.array([], type=pa.int64())}
            )
        allh = np.concatenate(per_doc)
        uh, cnt = np.unique(allh, return_counts=True)
        return pa.table({"h": pa.array(uh), "c": pa.array(cnt.astype("int64"))})

    df_tbl = (
        docs_ds.map_batches(_df_partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("c", alias_name="df"))
    )
    import pyarrow.compute as pc

    hot_rows = df_tbl.map_batches(
        lambda t: t.filter(pc.greater_equal(t["df"], hot_df)).select(["h"]),
        batch_format="pyarrow",
    ).take_all()
    hot = np.array(sorted(r["h"] for r in hot_rows), dtype=np.uint64)
    hot_ref = ray.put(hot) if ray.is_initialized() else hot

    # pass 2: per-doc ordered prefix -> (h, doc_id, n) index rows
    def _prefix_rows(batch: pa.Table) -> pa.Table:
        hot_arr = ray.get(hot_ref) if not isinstance(hot_ref, np.ndarray) else hot_ref
        hs, ids, ns = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            h = _hashes_of(text)
            n = len(h)
            p = n - int(np.ceil(threshold * n)) + 1
            if len(hot_arr):
                is_hot = np.isin(h, hot_arr)
                h = np.concatenate([h[~is_hot], h[is_hot]])  # hot LAST
            pref = h[:p]
            hs.append(pref)
            ids.append(np.full(len(pref), doc_id, dtype=np.int64))
            ns.append(np.full(len(pref), n, dtype=np.int64))
        if not hs:
            return pa.table(
                {
                    "h": pa.array([], type=pa.uint64()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                    "coarse": pa.array([], type=pa.int32()),
                }
            )
        h_all = np.concatenate(hs)
        return pa.table(
            {
                "h": pa.array(h_all),
                "doc_id": pa.array(np.concatenate(ids)),
                "n": pa.array(np.concatenate(ns)),
                "coarse": pa.array((h_all % np.uint64(coarse)).astype("int32")),
            }
        )

    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        out: set[tuple[int, int]] = set()
        for _, sub in group.groupby("h", sort=False):
            if len(sub) < 2:
                continue
            rows = sorted(zip(sub["doc_id"], sub["n"]))
            for i, (a, na) in enumerate(rows):
                for b, nb in rows[i + 1 :]:
                    lo, hi = (na, nb) if na <= nb else (nb, na)
                    if lo >= threshold * hi:  # J <= min/max: size filter
                        out.add((a, b))
        if not out:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")}
            )
        return pd.DataFrame(sorted(out), columns=["id_a", "id_b"])

    cand = (
        docs_ds.map_batches(_prefix_rows, batch_format="pyarrow")
        .groupby("coarse")
        .map_groups(_pairs, batch_format="pandas")
    )
    return _anchor_pairs_schema(cand)


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

# named counter actor collecting simhash hot-bucket drops across the
# map_groups workers — the drop is a RECALL CAP, so it must surface to
# the driver as data, not only as per-worker log lines
_SIMHASH_DROP_ACTOR = "kazu_ray_simhash_drop_stats"


class _DropStats:
    def __init__(self):
        self.dropped_buckets = 0
        self.dropped_member_rows = 0

    def add(self, buckets: int, member_rows: int) -> None:
        self.dropped_buckets += buckets
        self.dropped_member_rows += member_rows

    def get(self) -> dict:
        return {
            "dropped_buckets": self.dropped_buckets,
            "dropped_member_rows": self.dropped_member_rows,
        }

    def reset(self) -> None:
        self.dropped_buckets = 0
        self.dropped_member_rows = 0


def _drop_stats_actor():
    import ray

    # resolved per call (get_if_exists → atomic create-or-get through
    # the GCS): a module-global cached handle would go stale across
    # ray.shutdown()/ray.init() cycles in the same process. Calls are
    # rare (one per coarse group with drops + driver reads), so the
    # lookup cost is negligible.
    # detached: the counter must outlive the (worker-side) scopes
    # that create it mid-query — a ref-counted named actor dies as
    # soon as its creating task's handle drops
    return (
        ray.remote(num_cpus=0)(_DropStats)
        .options(
            name=_SIMHASH_DROP_ACTOR,
            get_if_exists=True,
            lifetime="detached",
            namespace="kazu_ray",
        )
        .remote()
    )


def _report_simhash_drops(buckets: int, member_rows: int) -> None:
    """Called from inside the per-group pair kernel (worker side)."""
    import ray

    if not ray.is_initialized():
        return
    # synchronous so the count is visible as soon as the dataset that
    # produced it has been consumed (~32 coarse groups → negligible RPC)
    ray.get(_drop_stats_actor().add.remote(buckets, member_rows))


def simhash_drop_stats(reset: bool = False) -> dict:
    """Driver-side read of the hot-bucket drop side-channel. Counts
    accumulate from every :func:`simhash_near_dup_pairs` execution since
    the last ``reset=True`` call (call with ``reset=True`` before
    building a pipeline whose drops you want isolated)."""
    import ray

    if not ray.is_initialized():
        return {"dropped_buckets": 0, "dropped_member_rows": 0}
    actor = _drop_stats_actor()
    out = ray.get(actor.get.remote())
    if reset:
        ray.get(actor.reset.remote())
    return out


# per-worker word→hash memo: the corpus vocabulary is Zipf-distributed,
# so md5 is computed once per distinct word per worker, not per occurrence
_WORD_HASH_CACHE: dict[str, int] = {}
_WORD_HASH_CACHE_MAX = 2_000_000


def _word_hash(w: str) -> int:
    h = _WORD_HASH_CACHE.get(w)
    if h is None:
        if len(_WORD_HASH_CACHE) >= _WORD_HASH_CACHE_MAX:
            _WORD_HASH_CACHE.clear()
        h = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
        _WORD_HASH_CACHE[w] = h
    return h


def simhash64(text: str) -> int:
    """64-bit simhash over the distinct-word set, vectorized: per-word
    md5 hashes (memoized) → np.unpackbits bit matrix → column majority
    vote. Bit semantics identical to the per-bit reference loop
    (bit i of the output = majority of bit i across word hashes)."""
    words = set(text.split(" "))
    if not words:
        return 0
    hashes = np.fromiter(
        (_word_hash(w) for w in words), dtype=np.uint64, count=len(words)
    )
    # little-endian uint8 view + bitorder='little' ⇒ column j = (h >> j) & 1
    bits = np.unpackbits(hashes.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    ones = bits.sum(axis=0, dtype=np.int64)
    out_bits = (2 * ones > len(words)).astype(np.uint8)
    return int(np.packbits(out_bits, bitorder="little").view(np.uint64)[0])


def simhash_batch(batch: pa.Table) -> pa.Table:
    hashes = [simhash64(t) for t in batch["text"].to_pylist()]
    chunks = {f"chunk{j}": [(h >> (16 * j)) & 0xFFFF for h in hashes] for j in range(4)}
    cols = {"doc_id": batch["doc_id"], "simhash": pa.array(hashes, type=pa.uint64())}
    for name, vals in chunks.items():
        cols[name] = pa.array(vals, type=pa.int32())
    return pa.table(cols)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_near_dup_pairs(docs_ds, max_hamming: int = 2, coarse: int = 32, sh_ds=None):
    """SimHash near-dup pairs: by pigeonhole, two hashes within hamming
    ≤ 3 share at least one of the four 16-bit chunks (the bucketing is
    thus recall-complete for any ``max_hamming`` ≤ 3; the verify
    default is 2), so candidates are generated per (chunk_idx,
    chunk_value) bucket and verified exactly.
    Same coarse-shuffle trick as minhash: shuffle on chunk_value %% 32,
    vectorized per-bucket pairing inside each coarse group.

    ``sh_ds``: optional precomputed ``simhash_batch`` output (so a caller
    that also persists the signatures — e.g. for an external brute-force
    check — hashes each document once, not twice)."""
    import pandas as pd
    import pyarrow as pa
    import ray

    if ray.is_initialized():
        # pre-create the drop-stats actor from the driver so the 32
        # concurrent group tasks just look it up instead of racing a
        # named get-or-create through the GCS
        _drop_stats_actor()

    sh = sh_ds if sh_ds is not None else docs_ds.map_batches(simhash_batch, batch_format="pyarrow")

    def explode_chunks(batch: pa.Table) -> pa.Table:
        doc_ids, sims, cidx, cval, co = [], [], [], [], []
        ids = batch["doc_id"].to_pylist()
        hashes = batch["simhash"].to_pylist()
        for j in range(4):
            col = batch[f"chunk{j}"].to_pylist()
            for i, v in enumerate(col):
                doc_ids.append(ids[i])
                sims.append(hashes[i])
                cidx.append(j)
                cval.append(v)
                co.append(v % coarse)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "simhash": pa.array(sims, type=pa.uint64()),
                "chunk_idx": pa.array(cidx, type=pa.int32()),
                "chunk_val": pa.array(cval, type=pa.int32()),
                "coarse": pa.array(co, type=pa.int32()),
            }
        )

    # buckets larger than this are skipped: a chunk value shared by
    # hundreds of docs carries no near-dup signal (standard LSH hot-bucket
    # drop) and would cost O(n²) verification
    MAX_BUCKET = 128

    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        import logging

        out: set[tuple[int, int]] = set()
        n_dropped = 0
        n_dropped_members = 0
        for _, sub in group.groupby(["chunk_idx", "chunk_val"]):
            if len(sub) > MAX_BUCKET:
                # hot-bucket drop = recall cap; surface it per group
                n_dropped += 1
                n_dropped_members += len(sub)
                continue
            if len(sub) < 2:
                continue
            recs = sorted(set(zip(sub["doc_id"], sub["simhash"])))
            ids = np.array([r[0] for r in recs], dtype=np.int64)
            hashes = np.array([r[1] for r in recs], dtype=np.uint64)
            # vectorized pairwise hamming: XOR matrix → per-byte popcount
            xor = hashes[:, None] ^ hashes[None, :]
            bits = np.unpackbits(xor.view(np.uint8)).reshape(len(recs), len(recs), 64)
            ham = bits.sum(axis=2)
            ii, jj = np.nonzero(np.triu(ham <= max_hamming, k=1))
            for i, j in zip(ii, jj):
                if ids[i] != ids[j]:
                    out.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
        if n_dropped:
            logging.getLogger("kazu_ray.dedup").warning(
                "simhash: dropped %d hot buckets (>%d docs) — recall cap",
                n_dropped,
                MAX_BUCKET,
            )
            # side-channel the recall cap to the driver ("no silent
            # caps", COVERAGE.md): a template-heavy corpus dropping most
            # of its buckets must be VISIBLE in the result, not only in
            # scattered worker logs
            _report_simhash_drops(n_dropped, n_dropped_members)
        if not out:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")}
            )
        return pd.DataFrame(sorted(out), columns=["id_a", "id_b"])

    # groupby, not scatter_groups: below ~10^6 exchanged rows the sort
    # groupby beats the scatter's actor-spawn + RPC floor (measured —
    # see the note in minhash_candidate_pairs and ops/exchange.py)
    pairs = (
        sh.map_batches(explode_chunks, batch_format="pyarrow")
        .groupby("coarse")
        .map_groups(_pairs, batch_format="pandas")
    )
    # duplicates across coarse buckets possible; consumers dedupe
    # (see minhash_candidate_pairs note)
    return _anchor_pairs_schema(pairs)


# ---------------------------------------------------------------------------
# embedding cosine near-dup / similarity search
# ---------------------------------------------------------------------------


class TopKCosineStage:
    """Brute-force cosine top-k against a broadcast query matrix: per-batch
    numpy matmul emits per-batch top-k partials; the driver (or a final
    sort+limit) merges. The scale path for true ANN is the LSH-bucketed
    variant in ``ops/simsearch.py``."""

    def __init__(self, query_vec: np.ndarray, k: int = 10):
        q = np.asarray(query_vec, dtype=np.float64)
        self.q = q / (np.linalg.norm(q) or 1.0)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        mat = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat @ self.q) / norms
        top = np.argsort(-sims)[: self.k]
        return pa.table(
            {
                "vec_id": pa.array(ids[top]),
                "cosine": pa.array(sims[top], type=pa.float64()),
            }
        )


def connected_components(pairs_ds):
    """Near-dup clusters from candidate pairs.

    The pair set is the OUTPUT of LSH banding — provably small relative
    to the corpus (bounded by bucket collisions) — so per ray_guide.md
    ("union-find on the driver only if the candidate set is provably
    small") the clustering itself is driver-side union-find over the
    collected pairs; everything upstream (shingle, minhash, banding,
    bucket-pair generation, dedupe) is distributed. For adversarial
    graphs where pairs themselves are huge, use
    :func:`connected_components_distributed` (iterative min-label
    propagation on Datasets — tested equal to this function).
    Returns a DataFrame of (doc_id, component=min doc_id in cluster).
    """
    import pandas as pd

    edges = pairs_ds.to_pandas() if hasattr(pairs_ds, "to_pandas") else pairs_ds
    if len(edges) == 0 or "id_a" not in edges.columns:
        # Dataset.to_pandas() on zero rows drops column names — same
        # hazard pairs_to_table guards against; an edge-free graph has
        # no clustered docs either way
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "component": pd.Series([], dtype="int64"),
            }
        )
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(edges["id_a"], edges["id_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            # union by min id so the component label is deterministic
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    rows = sorted((n, find(n)) for n in parent)
    return pd.DataFrame(rows, columns=["doc_id", "component"])


def connected_components_auto(pairs_ds, max_driver_pairs: int | None = None):
    """Size-dispatched clustering — the wiring that makes the scale path
    the DEFAULT rather than an escape hatch: count the candidate pairs
    (tiny metadata pass; the pair set is already materialized by every
    caller), and run driver union-find only while the count is within
    the same driver-memory bound the Jaccard verifier uses
    (``max_gather_pairs``); above it, dispatch to
    :func:`connected_components_distributed` (min-label propagation on
    Datasets, no driver gather). The two paths are tested equal.

    ``max_driver_pairs`` defaults to 200_000, overridable via the
    ``KAZU_CC_MAX_DRIVER_PAIRS`` env var (tests use it to force the
    distributed branch through the driver query's own code path).
    Returns a pandas DataFrame either way (the cluster table is one row
    per clustered doc — small by the LSH pair contract; a truly huge
    result should keep the Dataset form of the distributed path).
    """
    import os

    import pandas as pd

    if max_driver_pairs is None:
        max_driver_pairs = int(os.environ.get("KAZU_CC_MAX_DRIVER_PAIRS", 200_000))
    if isinstance(pairs_ds, (pd.DataFrame, pa.Table)):
        # DataFrame.count() exists but returns a per-column Series —
        # dispatch on type, not hasattr
        n_pairs = len(pairs_ds)
    else:
        # materialize once (blocks stay in the object store, NOT on the
        # driver) so count + the chosen path don't re-execute the
        # upstream verify pipeline
        pairs_ds = pairs_ds.materialize()
        n_pairs = pairs_ds.count()
    if n_pairs <= max_driver_pairs:
        return connected_components(pairs_ds)
    out = connected_components_distributed(pairs_ds).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def connected_components_distributed(pairs_ds, max_rounds: int = 50):
    """The scale path :func:`connected_components`'s docstring promises:
    iterative min-label propagation for adversarial graphs whose PAIR
    set itself is too large to collect — BSP-style over bucket ACTORS.

    This is one of the few places the Dataset API genuinely can't
    express the semantics (iterative computation over persistent
    per-partition state): a Dataset formulation must re-shuffle the
    full edge set EVERY round (measured 236 s for 500k edges / ~15
    rounds), while the graph never changes. Here the directed edge set
    ships ONCE into hash-bucket actors (same feed/verify mechanics as
    every exchange, ``ops/exchange.py``); each round every actor
    computes per-destination min labels with numpy, pushes
    pre-combined messages DIRECTLY to the owning peer actors (no
    driver transit — the driver only awaits the accept refs, which
    also avoids the push-waits-on-push actor deadlock), and folds its
    inbox with ``np.minimum.at``. Converged when no label changes
    anywhere — per-round exchange volume is node-sized messages, not
    the edge set. Rounds needed = max distance to a component's min
    node. Returns a Dataset of (doc_id, component); raises if
    ``max_rounds`` is hit without convergence (silent wrong labels are
    worse than a loud failure).
    """
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray as _ray
    import ray.data as rd

    if isinstance(pairs_ds, pd.DataFrame):
        pairs_ds = rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array(pairs_ds["id_a"], type=pa.int64()),
                    "id_b": pa.array(pairs_ds["id_b"], type=pa.int64()),
                }
            )
        )

    from kazu_ray.ops.exchange import (
        auto_partition_count,
        feed_to_actors,
        reaped_actors,
    )

    # bucket count scales with the cluster AND, when the pair set is
    # already materialized (the connected_components_auto path), with
    # its measured bytes — each actor holds ~2·|E|/n_buckets directed
    # edges for the whole computation, so a 100× edge set needs more
    # buckets, not a retune
    n_buckets = shuffle_parts()
    try:
        from ray.data.dataset import MaterializedDataset

        if isinstance(pairs_ds, MaterializedDataset):
            n_buckets = max(
                n_buckets, auto_partition_count(2 * pairs_ds.size_bytes())
            )
    except ImportError:
        pass
    actors = [
        _CC_BUCKET_CLS.remote(i, n_buckets) for i in range(n_buckets)
    ]

    def _edges_batch(t: pa.Table) -> pa.Table:
        a = pc.cast(t["id_a"], pa.int64())
        b = pc.cast(t["id_b"], pa.int64())
        return pa.concat_tables(
            [pa.table({"node": a, "dst": b}), pa.table({"node": b, "dst": a})]
        )

    directed = pairs_ds.map_batches(_edges_batch, batch_format="pyarrow")

    def _assign(batch: pa.Table):
        from kazu_ray.functions.hashing import bucket_ids

        return pa.array(bucket_ids(batch["node"], n_buckets), type=pa.int32())

    with reaped_actors(actors):
        feed_to_actors(
            directed,
            n_buckets,
            _assign,
            lambda b, sub: actors[b].add.remote(sub),
            received_fn=lambda b: actors[b].received_rows.remote(),
        )
        _ray.get([a.seal.remote() for a in actors])
        converged = False
        for _ in range(max_rounds):
            accept_refs = _ray.get(
                [a.push_messages.remote(actors) for a in actors]
            )
            _ray.get([r for refs in accept_refs for r in refs])
            changed = _ray.get([a.fold.remote() for a in actors])
            if sum(changed) == 0:
                converged = True
                break
        if not converged:
            raise RuntimeError(
                f"connected_components_distributed did not converge in "
                f"{max_rounds} rounds"
            )
        result_refs = [a.result.remote() for a in actors]
        _ray.wait(result_refs, num_returns=len(result_refs), fetch_local=False)
    return rd.from_arrow_refs(result_refs)


class _CCBucket:
    """One hash bucket of the BSP min-label propagation: holds the
    bucket's directed out-edges (node→dst for every node hashing here)
    and its nodes' current labels as numpy arrays. Plain-Python class,
    wrapped by ``ray.remote`` at module import so the algorithm is
    unit-testable without a cluster."""

    def __init__(self, idx: int, n_buckets: int):
        self.idx = idx
        self.n = n_buckets
        self._chunks: list = []
        self.received = 0
        self.inbox: list = []
        self.nodes = None

    def add(self, table) -> int:
        self._chunks.append(table)
        self.received += table.num_rows
        return table.num_rows

    def received_rows(self) -> int:
        return self.received

    def seal(self) -> int:
        import numpy as np
        import pyarrow as pa

        if not self._chunks:
            self.nodes = np.empty(0, dtype=np.int64)
            self.labels = self.nodes.copy()
            self.src_idx = np.empty(0, dtype=np.int64)
            self.dst = np.empty(0, dtype=np.int64)
            return 0
        t = pa.concat_tables(self._chunks)
        self._chunks = []
        src = t["node"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        order = np.argsort(src, kind="stable")
        src, self.dst = src[order], dst[order]
        self.nodes = np.unique(src)
        self.src_idx = np.searchsorted(self.nodes, src)  # per-edge node index
        self.labels = self.nodes.copy()  # init: every node labels itself
        return len(self.nodes)

    def push_messages(self, peers) -> list:
        """Per-destination min of my nodes' current labels, pre-combined
        and pushed straight to each destination's owning actor. Returns
        the accept ObjectRefs — the DRIVER awaits them (an actor waiting
        on a peer's method while that peer waits on ours would
        deadlock)."""
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        from kazu_ray.functions.hashing import bucket_ids

        if len(self.dst) == 0:
            return []
        m = (
            pd.DataFrame(
                {"node": self.dst, "label": self.labels[self.src_idx]}
            )
            .groupby("node", as_index=False)["label"]
            .min()
        )
        buckets = bucket_ids(pa.array(m["node"], type=pa.int64()), self.n)
        refs = []
        for j in np.unique(buckets):
            sub = m[buckets == j]
            refs.append(
                peers[int(j)].accept.remote(
                    pa.table(
                        {
                            "node": pa.array(sub["node"], type=pa.int64()),
                            "label": pa.array(sub["label"], type=pa.int64()),
                        }
                    )
                )
            )
        return refs

    def accept(self, table) -> int:
        self.inbox.append(table)
        return table.num_rows

    def fold(self) -> int:
        import numpy as np
        import pyarrow as pa

        if not self.inbox:
            return 0
        m = pa.concat_tables(self.inbox)
        self.inbox = []
        idx = np.searchsorted(self.nodes, m["node"].to_numpy(zero_copy_only=False))
        before = self.labels.copy()
        np.minimum.at(self.labels, idx, m["label"].to_numpy(zero_copy_only=False))
        return int((self.labels != before).sum())

    def result(self):
        import pyarrow as pa

        return pa.table(
            {
                "doc_id": pa.array(self.nodes, type=pa.int64()),
                "component": pa.array(self.labels, type=pa.int64()),
            }
        )


import ray as _ray_mod

_CC_BUCKET_CLS = _ray_mod.remote(num_cpus=0)(_CCBucket)


def cluster_representatives(docs_ds, comp_df):
    """Representative selection over near-dup clusters — the removal
    step of a dedup pipeline: within each cluster keep the LONGEST doc
    (by character count), ties broken by the smallest doc_id. Returns a
    Dataset of one row per CLUSTERED doc: (doc_id, component, n_chars,
    kept 0/1); unclustered docs are implicitly kept and not emitted
    (same convention as the cluster table itself).

    Shapes: the cluster map and the per-component winner table are both
    bounded by the clustered-doc count (the LSH pair contract that
    already bounds ``connected_components_auto``'s output) — each is
    broadcast ONCE via ``ray.put``; the corpus streams through two
    ``map_batches`` passes and the argmax is a component-keyed
    ``groupby`` max + a tie-break min, never a per-cluster gather.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Max, Min

    if len(comp_df) == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "component": pa.array([], type=pa.int64()),
                    "n_chars": pa.array([], type=pa.int64()),
                    "kept": pa.array([], type=pa.int64()),
                }
            )
        )

    comp_ref = ray.put(
        dict(zip(comp_df["doc_id"].tolist(), comp_df["component"].tolist()))
    )

    import pyarrow.compute as pc

    def members_batch(t: pa.Table) -> pa.Table:
        cmap = ray.get(comp_ref)
        ids = t["doc_id"].to_pandas()
        comp = ids.map(cmap)
        mask = comp.notna().to_numpy()
        n_chars = pc.utf8_length(t["text"].cast(pa.string())).to_pandas()
        return pa.table(
            {
                "doc_id": pa.array(ids[mask], type=pa.int64()),
                "component": pa.array(comp[mask], type=pa.int64()),
                "n_chars": pa.array(n_chars[mask], type=pa.int64()),
            }
        )

    members = docs_ds.map_batches(members_batch, batch_format="pyarrow").materialize()

    max_chars = (
        members.groupby("component")
        .aggregate(Max("n_chars", alias_name="max_chars"))
        .to_pandas()
    )
    mx_ref = ray.put(dict(zip(max_chars["component"], max_chars["max_chars"])))

    def at_max(t: pa.Table) -> pa.Table:
        mx = ray.get(mx_ref)
        comp = t["component"].to_pandas()
        keep = (t["n_chars"].to_pandas() == comp.map(mx)).to_numpy()
        return t.filter(pa.array(keep)).select(["component", "doc_id"])

    winners = (
        members.map_batches(at_max, batch_format="pyarrow")
        .groupby("component")
        .aggregate(Min("doc_id", alias_name="winner"))
        .to_pandas()
    )
    win_ref = ray.put(dict(zip(winners["component"], winners["winner"])))

    def mark(t: pa.Table) -> pa.Table:
        w = ray.get(win_ref)
        comp = t["component"].to_pandas()
        kept = (t["doc_id"].to_pandas() == comp.map(w)).astype("int64")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "component": t["component"],
                "n_chars": t["n_chars"],
                "kept": pa.array(kept, type=pa.int64()),
            }
        )

    return members.map_batches(mark, batch_format="pyarrow")

