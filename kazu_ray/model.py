"""Core value types.

Columnar-friendly ports of the reference's datamodel
(``kazu/data/__init__.py``): confidence enums (``:82-99``),
:class:`LinkingCandidate` (``:206-237``), :class:`LinkingMetrics`
(``:240-255``) and :class:`Mapping` (``:174-199``). Rows in the engine's
Arrow tables are flat; these objects exist only transiently inside
per-document ``map_groups`` bodies and inside matcher/linker actors.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from enum import IntEnum


class MentionConfidence(IntEnum):
    IGNORE = 0
    POSSIBLE = 10
    PROBABLE = 50
    HIGHLY_LIKELY = 100


class StringMatchConfidence(IntEnum):
    POSSIBLE = 10
    PROBABLE = 50
    HIGHLY_LIKELY = 100


class DisambiguationConfidence(IntEnum):
    AMBIGUOUS = 0
    POSSIBLE = 10
    PROBABLE = 50
    HIGHLY_LIKELY = 100


# EquivalentIdSet ≡ frozenset of (idx, source) pairs; AssociatedIdSets ≡
# frozenset of those (kazu/data/__init__.py:157-171, :202)
IdAndSource = tuple[str, str]
EquivalentIdSet = frozenset  # frozenset[IdAndSource]
AssociatedIdSets = frozenset  # frozenset[EquivalentIdSet]


@dataclass(frozen=True)
class LinkingCandidate:
    """One normalised synonym of one parser (``kazu/data/__init__.py:206-237``)."""

    synonym_norm: str
    parser_name: str
    raw_synonyms: frozenset  # frozenset[str]
    is_symbolic: bool
    mapping_types: frozenset  # frozenset[str]
    associated_id_sets: AssociatedIdSets
    aggregated_by: str = "UNAMBIGUOUS"

    @property
    def is_ambiguous(self) -> bool:
        return len(self.associated_id_sets) > 1

    def to_json(self) -> str:
        return json.dumps(
            {
                "synonym_norm": self.synonym_norm,
                "parser_name": self.parser_name,
                "raw_synonyms": sorted(self.raw_synonyms),
                "is_symbolic": self.is_symbolic,
                "mapping_types": sorted(self.mapping_types),
                "associated_id_sets": sorted(
                    sorted([idx, src] for idx, src in id_set) for id_set in self.associated_id_sets
                ),
                "aggregated_by": self.aggregated_by,
            },
            sort_keys=True,
        )

    @staticmethod
    def from_json(s: str) -> "LinkingCandidate":
        d = json.loads(s)
        return LinkingCandidate(
            synonym_norm=d["synonym_norm"],
            parser_name=d["parser_name"],
            raw_synonyms=frozenset(d["raw_synonyms"]),
            is_symbolic=d["is_symbolic"],
            mapping_types=frozenset(d["mapping_types"]),
            associated_id_sets=frozenset(
                frozenset((idx, src) for idx, src in id_set) for id_set in d["associated_id_sets"]
            ),
            aggregated_by=d["aggregated_by"],
        )


@dataclass
class LinkingMetrics:
    """Scores attached to a candidate for one entity (``kazu/data/__init__.py:240-255``)."""

    search_score: float | None = None
    bool_score: bool | None = None
    exact_match: bool | None = None


@dataclass(frozen=True)
class Mapping:
    """Final grounded link (``kazu/data/__init__.py:174-199``)."""

    default_label: str
    source: str
    parser_name: str
    idx: str
    string_match_strategy: str
    string_match_confidence: int  # StringMatchConfidence value
    disambiguation_strategy: str | None = None
    disambiguation_confidence: int | None = None  # DisambiguationConfidence value


@dataclass
class EntityLite:
    """Transient per-document entity used inside ``map_groups`` bodies.

    Mirrors ``kazu.data.Entity`` (``kazu/data/__init__.py:267-435``) minus
    serialization machinery; identity is the row id so mappings can be
    joined back onto the entities table.
    """

    ent_id: str
    doc_id: str
    start: int
    end: int
    match: str
    match_norm: str
    entity_class: str
    namespace: str
    mention_confidence: int
    sent_idx: int = 0
    candidates: dict = field(default_factory=dict)  # LinkingCandidate -> LinkingMetrics
    mappings: set = field(default_factory=set)  # set[Mapping]
