"""Loader for the reference's own batch-corpus Parquet shape.

The reference annotates corpora stored as Parquet datasets of
``{id: str, sections: list<struct<section: str, text: str,
subSection: str>>}`` (``scripts/examples/convert_parquet_to_kazu_docs.py:44-135``),
with duplicate ids resolved by keeping the document with the most
sections (``:138-141,158-170``). This module reads that exact shape into
the engine's sectioned-document stream, so a user of the reference can
point their existing corpus at this engine unchanged.
"""

from __future__ import annotations

import pyarrow as pa


def _normalize_batch(batch: pa.Table) -> pa.Table:
    doc_ids = [str(x) for x in batch["id"].to_pylist()]
    sections_out = []
    for secs in batch["sections"].to_pylist():
        norm = []
        for s in secs or []:
            name = s.get("section") or ""
            sub = s.get("subSection")
            norm.append(
                {
                    "name": f"{name}:{sub}" if sub else name,
                    "text": s.get("text") or "",
                }
            )
        sections_out.append(norm)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.string()),
            "sections": pa.array(
                sections_out,
                type=pa.list_(
                    pa.struct([("name", pa.string()), ("text", pa.string())])
                ),
            ),
        }
    )


def read_kazu_corpus(path: str, dedup: bool = True):
    """Parquet corpus in the reference shape → Dataset of
    (doc_id, sections). ``dedup=True`` reproduces the keep-most-sections
    duplicate-id rule with one hash exchange keyed by doc id (the
    corpus's natural partition key), resolved VECTORIZED across all of a
    bucket's docs at once: a stable Arrow sort by (doc_id, n_sections
    desc) + a first-occurrence mask — a per-doc ``map_groups`` paid
    Python dispatch per document at load time. Ties on section count
    keep arrival order (same contract as before; the rule only
    distinguishes counts)."""
    import ray.data as rd

    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    ds = rd.read_parquet(path).map_batches(_normalize_batch, batch_format="pyarrow")
    if not dedup:
        return ds

    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.string()),
            "sections": pa.array(
                [],
                type=pa.list_(
                    pa.struct([("name", pa.string()), ("text", pa.string())])
                ),
            ),
        }
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        import pandas as pd
        import pyarrow.compute as pc

        n = pc.fill_null(pc.list_value_length(t["sections"]), 0)
        idx = pc.sort_indices(
            pa.table({"d": t["doc_id"], "n": n}),
            sort_keys=[("d", "ascending"), ("n", "descending")],
        )
        t2 = t.take(idx)
        d = pd.Series(t2["doc_id"].to_pylist())
        keep = d.ne(d.shift()).values
        return t2.filter(pa.array(keep))

    return exchange_groups(ds, ["doc_id"], shuffle_parts(), per_bucket, empty)
