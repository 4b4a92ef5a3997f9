"""Broadcastable ontology state.

Columnar replacement for the reference's process-global singleton
databases (``kazu/database/in_memory_db.py:23-149``). The store is built
once on the driver from the Parquet cache tables, put into the Ray
object store exactly once (``ray.put``), and read zero-copy-ish by every
matcher / linker / mapping actor in its ``__init__`` — i.e. every
dictionary lookup in the reference becomes a broadcast map-side hash
join. At 10^12-document scale the build side (10^5–10^6 synonyms) stays
tiny relative to the stream, so broadcast always beats a shuffle join.
"""

from __future__ import annotations

import os
from functools import lru_cache

import pandas as pd

from kazu_ray.model import LinkingCandidate


class OntologyStore:
    """In-memory lookup tables; picklable so it can travel via ``ray.put``."""

    def __init__(self, metadata: pd.DataFrame, synonyms: pd.DataFrame, ner_terms: pd.DataFrame):
        # (parser, idx) -> (default_label, annotation_score)
        self.metadata: dict[tuple[str, str], tuple[str, int]] = {}
        # parser -> source / entity_class
        self.parser_source: dict[str, str] = {}
        self.parser_entity_class: dict[str, str] = {}
        for row in metadata.itertuples(index=False):
            self.metadata[(row.parser_name, row.idx)] = (
                row.default_label,
                int(row.annotation_score),
            )
            self.parser_source[row.parser_name] = row.source
            self.parser_entity_class[row.parser_name] = row.entity_class

        # (parser, syn_norm) -> LinkingCandidate
        self.synonyms: dict[tuple[str, str], LinkingCandidate] = {}
        # (parser, idx) -> set[syn_norm] reverse index filtered at query time
        # by aggregation strategy (in_memory_db.py:124-141)
        self.id_to_syns: dict[tuple[str, str], set[str]] = {}
        for row in synonyms.itertuples(index=False):
            cand = LinkingCandidate.from_json(row.candidate_json)
            self.synonyms[(row.parser_name, row.synonym_norm)] = cand
            for id_set in cand.associated_id_sets:
                for idx, _source in id_set:
                    self.id_to_syns.setdefault((row.parser_name, idx), set()).add(
                        row.synonym_norm
                    )

        self.ner_terms: pd.DataFrame = ner_terms

    # --- MetadataDatabase equivalents (in_memory_db.py:59-66) ---

    def default_label(self, parser_name: str, idx: str) -> str:
        return self.metadata[(parser_name, idx)][0]

    def annotation_score(self, parser_name: str, idx: str) -> int:
        return self.metadata[(parser_name, idx)][1]

    # --- SynonymDatabase equivalents (in_memory_db.py:115-141) ---

    def candidate(self, parser_name: str, syn_norm: str) -> LinkingCandidate:
        return self.synonyms[(parser_name, syn_norm)]

    def candidates_for_parser(self, parser_name: str) -> dict[str, LinkingCandidate]:
        return {
            syn_norm: cand
            for (p, syn_norm), cand in self.synonyms.items()
            if p == parser_name
        }

    def syns_for_id(
        self, parser_name: str, idx: str, relevant_agg_strategies: set[str]
    ) -> set[str]:
        out = set()
        for syn_norm in self.id_to_syns.get((parser_name, idx), ()):
            cand = self.synonyms[(parser_name, syn_norm)]
            if cand.aggregated_by in relevant_agg_strategies:
                out.add(syn_norm)
        return out

    @property
    def parser_names(self) -> list[str]:
        return sorted(self.parser_source)


def load_store(cache_dir: str) -> OntologyStore:
    return OntologyStore(
        metadata=pd.read_parquet(os.path.join(cache_dir, "metadata.parquet")),
        synonyms=pd.read_parquet(os.path.join(cache_dir, "synonyms.parquet")),
        ner_terms=pd.read_parquet(os.path.join(cache_dir, "ner_terms.parquet")),
    )


@lru_cache(maxsize=4)
def cached_store(cache_dir: str) -> OntologyStore:
    """Per-process store cache — used by actors when handed a cache dir
    instead of an object ref (e.g. in tests without a live Ray session)."""
    return load_store(cache_dir)


def ensure_default_caches(cache_dir: str | None = None) -> str:
    """Build the default synthetic ontology caches if absent; returns dir.

    The build is deterministic, so concurrent/repeated invocations
    converge on identical bytes.
    """
    from kazu_ray.ontology.build import build_all_caches

    from kazu_ray.ontology.generate import ONTOLOGY_VERSION

    cache_dir = cache_dir or os.environ.get(
        "KAZU_RAY_CACHE_DIR", f"/tmp/kazu_ray_cache/{ONTOLOGY_VERSION}"
    )
    marker = os.path.join(cache_dir, "ner_terms.parquet")
    if not os.path.exists(marker):
        build_all_caches(cache_dir)
    return cache_dir
