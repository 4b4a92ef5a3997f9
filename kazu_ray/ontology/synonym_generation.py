"""Combinatorial synonym generation.

From-scratch ports of the reference's ``CombinatorialSynonymGenerator``
family (``kazu/ontology_preprocessing/synonym_generation.py:22-461``):
pure string→strings expanders applied to each ontology resource's
original synonyms; the products become *alternative* synonyms used for
NER only (``OntologyStringResource.alternative_synonyms``,
``kazu/data/__init__.py:856``). All deterministic.

Eight generators (reference class → function here):

* ``SeparatorExpansion``            → :func:`separator_expansion`
* ``StringReplacement``             → :func:`string_replacement`
* ``NgramHyphenation``              → :func:`ngram_hyphenation`
* ``StopWordRemover``               → :func:`stopword_remover`
* ``SuffixReplacement``             → :func:`suffix_replacement`
* ``SpellingVariationReplacement``  → :func:`spelling_variation_replacement`
* ``TokenListReplacementGenerator`` → :func:`token_list_replacement`
* ``VerbPhraseVariantGenerator``    → :func:`verb_phrase_variants`

The last two are spaCy-Matcher/lemmatizer-driven in the reference; here
token matching is plain whitespace-token equality and lemma matching
uses the configured surface-form dict in both directions — the same
outputs on dictionary-shaped synonym strings, without a parser.

``GENERATORS`` (the default build set) contains the low-noise,
config-free subset; the noisy/config-driven generators (suffix, token
list, verb phrase) are opt-in per parser, exactly as the reference
wires them per-ontology in its conf.
"""

from __future__ import annotations

import json
import re

from kazu_ray.lang.phenomena import DASHES


def separator_expansion(text: str) -> set[str]:
    """``SeparatorExpansion.call`` (``synonym_generation.py:111-154``):
    strip bracketed qualifiers, split "a/b" and "a,b" forms."""
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
    """``StringReplacement.call`` (``synonym_generation.py:201-269``)."""
    out = set()
    for old, new in _REPLACEMENTS:
        if old in text:
            candidate = text.replace(old, new)
            if candidate != text:
                out.add(candidate)
    return out


def ngram_hyphenation(text: str, ngram: int = 2) -> set[str]:
    """``NgramHyphenation.call`` (``synonym_generation.py:322-336``):
    every dash variant of an exactly-``ngram``-word phrase."""
    words = text.split()
    if len(words) != ngram:
        return set()
    return {hyphen.join(words) for hyphen in DASHES}


# ``StopWordRemover.all_stopwords`` (``synonym_generation.py:160``)
_STOPWORDS = {"of", "and", "in", "to", "with", "caused", "involved", "by", "the"}


def stopword_remover(text: str) -> set[str]:
    """``StopWordRemover.call`` (``synonym_generation.py:157-175``):
    the string with stopword tokens removed, if any were present."""
    lst = []
    detected = False
    for token in text.split():
        if token.lower() in _STOPWORDS:
            detected = True
        else:
            lst.append(token)
    return {" ".join(lst)} if detected else set()


def suffix_replacement(text: str, suffixes: frozenset = frozenset({"ia", "ic", "a"})) -> set[str]:
    """``SuffixReplacement.call`` (``synonym_generation.py:272-300``):
    interchange every matching suffix with every other suffix in the
    set. Deliberately noisy (high recall; curation filters later) and,
    like the reference, NOT longest-match-only: 'anaemia' with
    {'ia','a','ic'} yields both 'anaemic' and 'anaemiic'."""
    new_synonyms: set[str] = set()
    for suffix in suffixes:
        if text.endswith(suffix):
            base = text.removesuffix(suffix)
            new_synonyms.update(
                base + new_suffix for new_suffix in suffixes if new_suffix != suffix
            )
    return new_synonyms


# built-in British↔American variations (the reference loads a JSON
# mapping from the model pack; this is the same shape inline)
_DEFAULT_VARIATIONS = {
    "tumour": ["tumor"],
    "tumor": ["tumour"],
    "anaemia": ["anemia"],
    "anemia": ["anaemia"],
    "leukaemia": ["leukemia"],
    "leukemia": ["leukaemia"],
    "oesophageal": ["esophageal"],
    "esophageal": ["oesophageal"],
    "haemorrhage": ["hemorrhage"],
    "hemorrhage": ["haemorrhage"],
    "oestrogen": ["estrogen"],
    "estrogen": ["oestrogen"],
}


def spelling_variation_replacement(text: str, variations: dict | None = None) -> set[str]:
    """``SpellingVariationReplacement.call``
    (``synonym_generation.py:303-319``): whole-string lookup in a
    case-insensitive variation map; per-token application extends it to
    phrases (same outputs on single-word keys)."""
    varmap = _DEFAULT_VARIATIONS if variations is None else {
        k.lower(): v for k, v in variations.items()
    }
    out: set[str] = set()
    direct = varmap.get(text.lower())
    if direct:
        out.update(direct)
    # per-token: "breast tumour" → "breast tumor"
    tokens = text.split()
    for i, tok in enumerate(tokens):
        for variant in varmap.get(tok.lower(), ()):
            out.add(" ".join(tokens[:i] + [variant] + tokens[i + 1 :]))
    return out - {text}


def load_spelling_variations(path: str) -> dict:
    """Load a SpellingVariationReplacement JSON mapping (the reference's
    input format: {known synonym: [variations...]})."""
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def token_list_replacement(text: str, token_lists: list[list[str]]) -> set[str]:
    """``TokenListReplacementGenerator.call``
    (``synonym_generation.py:339-383``): if any whitespace token of the
    query matches a token list (case-insensitive), emit the string with
    that token replaced by every member of the list. One token at a
    time, like the reference."""
    out: set[str] = set()
    tokens = text.split()
    for token_list in token_lists:
        lowered = {t.lower() for t in token_list}
        for tok in tokens:
            if tok.lower() in lowered:
                for variant in token_list:
                    candidate = text.replace(tok, variant)
                    if candidate != text:
                        out.add(candidate)
    return out


def verb_phrase_variants(
    text: str,
    tense_templates: list[str],
    lemmas_to_consider: dict[str, list[str]],
) -> set[str]:
    """``VerbPhraseVariantGenerator.call``
    (``synonym_generation.py:386-461``): find a verb whose lemma is in
    ``lemmas_to_consider`` (matched directly or via any of its surface
    forms — the stand-in for the reference's lemmatizer), treat the
    remaining tokens as the noun phrase, and instantiate every tense
    template with every surface form. Templates use ``{NOUN}`` and
    ``{TARGET}`` placeholders, e.g. ``"{TARGET} in {NOUN}"``."""
    surface_to_lemma = {}
    for lemma, forms in lemmas_to_consider.items():
        surface_to_lemma[lemma.lower()] = lemma
        for form in forms:
            surface_to_lemma[form.lower()] = lemma
    out: set[str] = set()
    tokens = text.split()
    for i, tok in enumerate(tokens):
        lemma = surface_to_lemma.get(tok.lower())
        if lemma is None:
            continue
        noun = [t for j, t in enumerate(tokens) if j != i]
        if not noun:
            continue
        noun_str = " ".join(noun)
        for template in tense_templates:
            for form in [lemma] + lemmas_to_consider[lemma]:
                out.add(template.format(NOUN=noun_str, TARGET=form))
    return out - {text}


# default build set: low-noise, config-free generators (the noisy /
# config-driven ones are opt-in per parser, mirroring the reference conf)
GENERATORS = [
    separator_expansion,
    string_replacement,
    ngram_hyphenation,
    stopword_remover,
    spelling_variation_replacement,
]


def generate_alternatives(texts: set[str]) -> set[str]:
    """One combinatorial round over all generators (the reference runs
    generators over originals then once more over products; one round
    keeps the surface set bounded and deterministic)."""
    out: set[str] = set()
    for text in texts:
        for gen in GENERATORS:
            out.update(gen(text))
    return out - texts
