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


def rebalance_sources(
    docs_ds,
    key_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
    materialize_input: bool = False,
):
    """Source-mixture rebalancing — the data-mixing step an LLM training
    pipeline runs before packing: downsample every source to the
    SMALLEST source's token mass so no source dominates the mixture.
    Returns one summary row per source: (source, orig_docs, orig_tokens,
    rate_ppm, kept_docs, kept_tokens) — all INTEGERS (the acceptance
    rate is parts-per-million via integer division) so the DuckDB
    oracle matches hash-exactly.

    Per-doc acceptance is content-keyed (md5(doc_id) ppm bucket <
    rate_ppm[source]), so the sample is reproducible across runs and
    engines and resumable, like every operator in this module.

    Scale shape: two streaming passes over a pruned (doc_id, source,
    text) read. Pass 1 = per-batch per-source partials → groupby(source)
    (source vocabulary is bounded, so the rate table is driver/broadcast
    material). Pass 2 = broadcast rate dict, per-batch accept + partial
    kept counts → groupby(source). No shuffle ever sees doc-sized data.
    The two passes re-execute the input plan by default — for the usual
    raw pruned ``read_parquet`` that is two cheap scans, strictly better
    than parking the corpus in the object store; pass
    ``materialize_input=True`` when the input carries expensive upstream
    transforms worth paying memory/spill to not recompute.
    """
    import pandas as pd
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    if materialize_input:
        docs_ds = docs_ds.materialize()

    def _tok_partials(batch: pa.Table) -> pa.Table:
        n_tok = pc.add(pc.count_substring(batch[text_col], " "), 1)
        df = pd.DataFrame(
            {
                "source": batch[source_col].to_pandas(),
                "n_tokens": pc.cast(n_tok, pa.int64()).to_pandas(),
            }
        )
        g = df.groupby("source", as_index=False).agg(
            orig_docs=("n_tokens", "size"), orig_tokens=("n_tokens", "sum")
        )
        return pa.table(
            {
                "source": pa.array(g["source"], type=pa.string()),
                "orig_docs": pa.array(g["orig_docs"], type=pa.int64()),
                "orig_tokens": pa.array(g["orig_tokens"], type=pa.int64()),
            }
        )

    tot = (
        docs_ds.map_batches(_tok_partials, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("orig_docs", alias_name="orig_docs"),
            Sum("orig_tokens", alias_name="orig_tokens"),
        )
        .to_pandas()
    )
    min_tokens = int(tot["orig_tokens"].min())
    rates = {
        s: min(1_000_000, (min_tokens * 1_000_000) // int(t))
        for s, t in zip(tot["source"], tot["orig_tokens"])
    }
    rates_ref = ray.put(rates)

    def _kept_partials(batch: pa.Table) -> pa.Table:
        r = ray.get(rates_ref)
        src = batch[source_col].to_pandas()
        ppm = pd.Series(
            [_bucket(str(v), 1_000_000) for v in batch[key_col].to_pylist()]
        )
        n_tok = pc.cast(
            pc.add(pc.count_substring(batch[text_col], " "), 1), pa.int64()
        ).to_pandas()
        keep = ppm.values < src.map(r).values
        df = pd.DataFrame({"source": src[keep], "n_tokens": n_tok[keep]})
        g = df.groupby("source", as_index=False).agg(
            kept_docs=("n_tokens", "size"), kept_tokens=("n_tokens", "sum")
        )
        return pa.table(
            {
                "source": pa.array(g["source"], type=pa.string()),
                "kept_docs": pa.array(g["kept_docs"], type=pa.int64()),
                "kept_tokens": pa.array(g["kept_tokens"], type=pa.int64()),
            }
        )

    kept = (
        docs_ds.map_batches(_kept_partials, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("kept_docs", alias_name="kept_docs"),
            Sum("kept_tokens", alias_name="kept_tokens"),
        )
        .to_pandas()
    )
    out = tot.merge(kept, on="source", how="left").fillna(0)
    out["rate_ppm"] = out["source"].map(rates)
    for c in ("orig_docs", "orig_tokens", "rate_ppm", "kept_docs", "kept_tokens"):
        out[c] = out[c].astype("int64")
    return (
        out[["source", "orig_docs", "orig_tokens", "rate_ppm", "kept_docs", "kept_tokens"]]
        .sort_values("source")
        .reset_index(drop=True)
    )
