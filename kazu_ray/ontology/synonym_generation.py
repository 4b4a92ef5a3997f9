"""Combinatorial synonym generation.

A from-scratch subset of the reference's
``CombinatorialSynonymGenerator`` family
(``kazu/ontology_preprocessing/synonym_generation.py:22-461``): pure
string→strings expanders applied to each ontology resource's original
synonyms; the products become *alternative* synonyms used for NER only
(``OntologyStringResource.alternative_synonyms``,
``kazu/data/__init__.py:856``). All deterministic.

Implemented generators:
* ``SeparatorExpansion``  — strip bracketed qualifiers, split "a/b"
  (``synonym_generation.py`` SeparatorExpansion semantics)
* ``StringReplacement``   — fixed substring swaps (hyphen↔space,
  greek spelled-out forms)
* ``NgramHyphenation``    — hyphenated variants of two-word phrases
"""

from __future__ import annotations

import re


def separator_expansion(text: str) -> set[str]:
    out: set[str] = set()
    # remove bracketed content: "disease (severe)" → "disease"
    no_brackets = re.sub(r"\s*\([^)]*\)", "", text).strip()
    if no_brackets and no_brackets != text:
        out.add(no_brackets)
    # "a/b" → both parts when both are multi-char words
    if "/" in text:
        parts = [p.strip() for p in text.split("/")]
        if all(len(p) > 2 for p in parts):
            out.update(parts)
    return out


_REPLACEMENTS = [
    ("-", " "),
    (" ", "-"),
    ("alpha", "α"),
    ("beta", "β"),
]


def string_replacement(text: str) -> set[str]:
    out = set()
    for old, new in _REPLACEMENTS:
        if old in text:
            candidate = text.replace(old, new)
            if candidate != text:
                out.add(candidate)
    return out


def ngram_hyphenation(text: str) -> set[str]:
    words = text.split(" ")
    if len(words) != 2:
        return set()
    return {f"{words[0]}-{words[1]}"}


GENERATORS = [separator_expansion, string_replacement, ngram_hyphenation]


def generate_alternatives(texts: set[str]) -> set[str]:
    """One combinatorial round over all generators (the reference runs
    generators over originals then once more over products; one round
    keeps the surface set bounded and deterministic)."""
    out: set[str] = set()
    for text in texts:
        for gen in GENERATORS:
            out.update(gen(text))
    return out - texts
