"""String similarity scorers.

Boolean scorers reproduce the reference's
``kazu/language/string_similarity_scorers.py:27-76`` exactly. The
continuous scorer substitutes the reference's SapBERT / RapidFuzz
scorers (``:79-132``) — which need model weights / the rapidfuzz wheel,
neither available here — with a deterministic char-ngram cosine. It is
used in the same two places with the same thresholds: synonym id-set
grouping (merge threshold 0.70, ``ontology_preprocessing/base.py:269-309``)
and embedding-confirmation string matching (threshold 0.60,
``mapping_strategies/strategies.py:480-553``).
"""

from __future__ import annotations

import math
import re
from collections import Counter
from functools import lru_cache

_NUMBER_FINDER = re.compile("[0-9]+")
_NUMERIC_CLASS_PHRASES = re.compile("|".join(["TYPE (?:I|[0-9]+)"]))


def number_match_scorer(reference_term: str, query_term: str) -> bool:
    """All numbers in the reference term are represented in the query term
    (and vice versa) — ``string_similarity_scorers.py:27-36``."""
    return Counter(_NUMBER_FINDER.findall(reference_term)) == Counter(
        _NUMBER_FINDER.findall(query_term)
    )


def entity_subtype_scorer(reference_term: str, query_term: str) -> bool:
    """All ``TYPE x`` phrases in the reference are present in the query at
    least as many times — ``string_similarity_scorers.py:39-62``."""
    ref_counts = Counter(_NUMERIC_CLASS_PHRASES.findall(reference_term))
    query_counts = Counter(_NUMERIC_CLASS_PHRASES.findall(query_term))
    return all(
        phrase in query_counts and query_counts[phrase] >= count
        for phrase, count in ref_counts.items()
    )


class NounModifierScorer:
    """Each configured modifier phrase is either in both strings or neither
    — ``string_similarity_scorers.py:65-76``."""

    def __init__(self, noun_modifier_phrases: list[str]):
        self.phrases = noun_modifier_phrases

    def __call__(self, reference_term: str, query_term: str) -> bool:
        return all((p in reference_term) == (p in query_term) for p in self.phrases)


GENE_NOUN_MODIFIERS = ["LIKE", "SUBUNIT", "PSEUDOGENE", "RECEPTOR"]


@lru_cache(maxsize=20000)
def _char_ngram_counts(s: str, n: int) -> tuple[tuple[str, ...], tuple[int, ...]]:
    c = Counter(s[i : i + n] for i in range(max(0, len(s) - n + 1)))
    keys = tuple(c.keys())
    return keys, tuple(c[k] for k in keys)


def char_ngram_cosine(s1: str, s2: str, n: int = 3) -> float:
    """Deterministic cosine over char n-gram counts in [0, 1]."""
    if s1 == s2:
        return 1.0
    k1, v1 = _char_ngram_counts(s1.lower(), n)
    k2, v2 = _char_ngram_counts(s2.lower(), n)
    if not k1 or not k2:
        return 0.0
    d1 = dict(zip(k1, v1))
    d2 = dict(zip(k2, v2))
    dot = sum(c * d2.get(g, 0) for g, c in d1.items())
    if dot == 0:
        return 0.0
    n1 = math.sqrt(sum(c * c for c in v1))
    n2 = math.sqrt(sum(c * c for c in v2))
    return dot / (n1 * n2)


def label_similarity_scorer(s1: str, s2: str) -> float:
    """Continuous scorer standing in for SapBERT cosine similarity."""
    return char_ngram_cosine(s1, s2, n=3)
