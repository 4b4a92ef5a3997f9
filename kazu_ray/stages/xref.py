"""Cross-reference manager.

Port of the reference's ``CrossReferenceManager`` contract
(``kazu/steps/linking/post_processing/xref_manager.py:41-106``): for a
created mapping, look up ``(source, idx)`` in a broadcast xref table and
emit additional mappings pointing at the target knowledgebase, tagged
with ``xref_source_parser_name``. The reference's OXO implementation
(``:108-216``) fetches mappings over HTTP; here the table is a Parquet
cache (no network), which is also the shape a production deployment
would pre-bake.

This is a broadcast map-side join: the xref table is tiny relative to
the stream and rides along with the ontology store.

Not part of the default pipeline (the reference default config sets
``cross_ref_managers: ~``); enable by passing an ``XRefManager`` to
``MappingRunner``.
"""

from __future__ import annotations

import pandas as pd


def synth_xref_table() -> pd.DataFrame:
    """Deterministic synthetic xrefs: every 3rd mondo_like id maps to a
    MEDDRA-like id."""
    from kazu_ray.ontology.generate import generate_ontology_tables

    mondo = generate_ontology_tables()["mondo_like"]
    ids = sorted(mondo.drop_duplicates("idx")[["idx", "default_label"]].values.tolist())
    rows = []
    for i, (idx, label) in enumerate(ids):
        if i % 3 == 0:
            rows.append(
                ("mondo_like", idx, "MEDDRA", f"MDR{10_000_000 + i}", label)
            )
    return pd.DataFrame(
        rows,
        columns=["parser_name", "idx", "target_source", "target_idx", "target_label"],
    )


class XRefManager:
    def __init__(self, xref_table: pd.DataFrame | None = None):
        table = xref_table if xref_table is not None else synth_xref_table()
        self.lookup: dict[tuple[str, str], list[tuple[str, str, str]]] = {}
        for row in table.itertuples(index=False):
            self.lookup.setdefault((row.parser_name, row.idx), []).append(
                (row.target_source, row.target_idx, row.target_label)
            )

    def create_xref_mappings(self, mapping: dict) -> list[dict]:
        """``xref_manager.py:41-106`` semantics: derived mappings inherit
        the source mapping's confidences and record provenance."""
        out = []
        for target_source, target_idx, target_label in self.lookup.get(
            (mapping["parser_name"], mapping["idx"]), ()
        ):
            out.append(
                {
                    **mapping,
                    "source": target_source,
                    "idx": target_idx,
                    "default_label": target_label,
                    "xref_source_parser_name": mapping["parser_name"],
                }
            )
        return out
