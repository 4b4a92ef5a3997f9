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
    duplicate-id rule as a ``groupby(doc_id).map_groups`` (the shuffle is
    keyed by doc id — the corpus's natural partition key)."""
    import ray.data as rd

    ds = rd.read_parquet(path).map_batches(_normalize_batch, batch_format="pyarrow")
    if not dedup:
        return ds

    def keep_max_sections(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lengths = pc.list_value_length(g["sections"]).to_pylist()
        best = max(range(g.num_rows), key=lambda i: (lengths[i] or 0, -i))
        return g.slice(best, 1)

    return ds.groupby("doc_id").map_groups(keep_max_sections, batch_format="pyarrow")
