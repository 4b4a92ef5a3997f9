"""String canonicalization kernel.

Reproduces the behaviour of the reference's ``StringNormalizer`` family
(``kazu/utils/string_normalizer.py:43-585``): entity-class-dispatched
normalization and symbol/noun-phrase classification. This is the single
most load-bearing correctness kernel — ``match_norm``, symbolic
classification, and synonym grouping in the ontology cache build all
flow from it — so the branch structure mirrors the reference exactly.

Pure functions; safe to call from any ``map_batches`` body. Hot paths
should use :func:`normalize_batch`, which memoizes per batch (the
moral equivalent of the reference's process-global lru_cache,
``string_normalizer.py:427-443``, but without cross-batch shared state
so actors stay independent).
"""

from __future__ import annotations

import re
from functools import lru_cache

import regex  # pip 'regex' module: needed for \p{Lu}

from kazu_ray.lang.phenomena import DASHES, GREEK_SUBS

_GREEK_SUBS_UPPER = {k: f" {v.upper()} " for k, v in GREEK_SUBS.items()}

# ordered literal substitutions (roman numerals longest-first, bracket
# spacing, comma/slash to space) — semantics of string_normalizer.py:52-66
_OTHER_SUBS = {
    "(": " (",
    ")": ") ",
    ",": " ",
    "/": " ",
    "VIII": " 8 ",
    "VII": " 7 ",
    "XII": " 12 ",
    "III": " 3 ",
    "VI": " 6 ",
    "IV": " 4 ",
    "IX": " 9 ",
    "XI": " 11 ",
    "II": " 2 ",
}
# regex substitutions: minus/hyphen not inside brackets → space, lone I/V
# roman numerals → digits (string_normalizer.py:67-72)
_RE_SUBS = [
    (re.compile(r"(?<!\()-(?!\))"), " "),
    (re.compile(r"(?<!\()‐(?!\))"), " "),
    (re.compile(r"\sI\s|\sI$"), " 1 "),
    (re.compile(r"\sV\s|\sV$"), " 5 "),
]
# single-letter greek abbreviations (string_normalizer.py:73-76)
_RE_SUBS_2 = [
    (re.compile(r"\sA\s|\sA$|^A\s"), " ALPHA "),
    (re.compile(r"\sB\s|\sB$|^B\s"), " BETA "),
]

_NUMBER_SPLIT = re.compile(r"(\d+)")
_ALLOWED_EXTRA_CHARS = {" ", "(", ")", "+", "-", "‐"}

_PLURAL_CAPS_S = regex.compile(r"^\p{Lu}+$")
_DASHES_OR_SPACE = re.compile("[ " + "".join("\\-" if d == "-" else d for d in DASHES) + "]+")


def depluralize_word(word: str) -> str:
    """Gilda-derived depluralization rules (``string_normalizer.py:527-568``,
    originally from the BSD-licensed gilda project)."""
    if not word.endswith("s"):
        return word
    if word.endswith("sis"):
        return word
    if word.endswith("oes"):
        return word[:-2]
    if word.endswith("ies"):
        return word[:-3] + "y"
    if word.endswith(("xes", "ses", "ches", "shes")):
        return word[:-2]
    if _PLURAL_CAPS_S.match(word[:-1]):
        return word[:-1]
    return word[:-1]


def split_on_dashes_or_space(s: str) -> list[str]:
    return _DASHES_OR_SPACE.split(s)


# ---------------------------------------------------------------------------
# default normalizer (string_normalizer.py:43-236)
# ---------------------------------------------------------------------------


def default_is_symbol_like(original: str) -> bool:
    upper_count = 0
    lower_count = 0
    numeric_count = 0
    tokens = original.split(" ")
    token_count = len(tokens)
    if token_count == 1 and len(original) <= 3:
        return True
    for i, char in enumerate(original):
        if char.isalpha():
            if char.isupper():
                upper_count += 1
                if i > 0 and token_count == 1:
                    # single token with internal uppercase ⇒ symbol
                    return True
            else:
                lower_count += 1
        elif char.isnumeric():
            if token_count == 1:
                # single token containing a digit ⇒ symbol
                return True
            numeric_count += 1
    if upper_count >= lower_count:
        return True
    if numeric_count >= (upper_count + lower_count):
        return True
    return False


def _replace_substrings(s: str) -> str:
    for sub, repl in _OTHER_SUBS.items():
        if sub in s:
            s = s.replace(sub, repl)
    for pat, repl in _RE_SUBS:
        s = pat.sub(repl, s)
    return s


def _split_on_numbers(s: str) -> str:
    return " ".join(x.strip() for x in _NUMBER_SPLIT.split(s))


def _replace_greek(s: str) -> str:
    for sub, repl in _GREEK_SUBS_UPPER.items():
        if sub in s:
            s = s.replace(sub, repl)
    return s


def _remove_non_alphanum(s: str) -> str:
    return "".join(x for x in s if x.isalnum() or x in _ALLOWED_EXTRA_CHARS)


def _depluralize(s: str) -> str:
    if len(s) > 3:
        s = depluralize_word(s)
    return s


def _sub_greek_char_abbreviations(s: str) -> str:
    for pat, repl in _RE_SUBS_2:
        s = pat.sub(repl, s)
    return s


def default_normalize_symbol(original: str) -> str:
    return " ".join(original.upper().split())


def default_normalize_noun_phrase(original: str) -> str:
    s = _replace_substrings(original)
    s = _split_on_numbers(s)
    s = _replace_greek(s)
    s = _remove_non_alphanum(s)
    s = _depluralize(s)
    s = _sub_greek_char_abbreviations(s)
    return " ".join(s.upper().split())


# ---------------------------------------------------------------------------
# per-class overrides (string_normalizer.py:239-413)
# ---------------------------------------------------------------------------

_KNOWN_DISEASE_SHORT_NOUNS = {"flu", "Flu", "HIV", "STI", "NSCLC"}
_GENE_NAME_SUFFIXES = ("in", "ase", "an", "gen", "gon")


def disease_is_symbol_like(original: str) -> bool:
    if original in _KNOWN_DISEASE_SHORT_NOUNS:
        return False
    return default_is_symbol_like(original)


def _gene_token_classifier(tok: str) -> bool:
    upper_count = 0
    lower_count = 0
    numeric_count = 0
    first_char_is_lower = len(tok) > 0 and tok[0].islower()
    for char in tok:
        if char.isalpha():
            if char.isupper():
                upper_count += 1
                if first_char_is_lower:
                    # casing flips lower→upper (e.g. erbB2) ⇒ symbol
                    return True
            else:
                lower_count += 1
        elif char.isnumeric():
            numeric_count += 1
    if upper_count >= lower_count:
        return True
    if numeric_count >= (upper_count + lower_count):
        return True
    return False


def gene_is_symbol_like(original: str) -> bool:
    tokens = split_on_dashes_or_space(original)
    if len(tokens) == 1 and not any(tokens[0].endswith(sfx) for sfx in _GENE_NAME_SUFFIXES):
        return True
    return all(len(t) < 4 or _gene_token_classifier(t) for t in tokens)


def _gene_strip_trailing_s(s: str) -> str:
    # strip plural 's' only when the preceding char is upper (ERBBs → ERBB,
    # but MDH-s stays) — string_normalizer.py:351-362
    if len(s) >= 3 and s[-2].isupper():
        return s.removesuffix("s")
    return s


def gene_normalize_symbol(original: str) -> str:
    s = _gene_strip_trailing_s(original)
    s = _replace_substrings(s)
    s = _split_on_numbers(s)
    s = _replace_greek(s)
    s = _remove_non_alphanum(s)
    s = _sub_greek_char_abbreviations(s)
    return " ".join(s.upper().split())


def company_is_symbol_like(original: str) -> bool:
    return all(x.isupper() for x in original if x.isalpha())


# ---------------------------------------------------------------------------
# dispatch (string_normalizer.py:416-443)
# ---------------------------------------------------------------------------

# entity_class → (is_symbol_like, normalize_symbol, normalize_noun_phrase)
_DISPATCH: dict[str | None, tuple] = {
    "gene": (gene_is_symbol_like, gene_normalize_symbol, default_normalize_noun_phrase),
    "anatomy": (lambda s: False, default_normalize_noun_phrase, default_normalize_noun_phrase),
    "disease": (disease_is_symbol_like, default_normalize_symbol, default_normalize_noun_phrase),
    "company": (company_is_symbol_like, str.upper, default_normalize_noun_phrase),
}
_DEFAULT = (default_is_symbol_like, default_normalize_symbol, default_normalize_noun_phrase)


@lru_cache(maxsize=5000)
def classify_symbolic(original: str, entity_class: str | None = None) -> bool:
    return _DISPATCH.get(entity_class, _DEFAULT)[0](original)


@lru_cache(maxsize=5000)
def normalize(original: str, entity_class: str | None = None) -> str:
    is_sym, norm_sym, norm_np = _DISPATCH.get(entity_class, _DEFAULT)
    return norm_sym(original) if is_sym(original) else norm_np(original)


def normalize_batch(strings, entity_class: str | None = None) -> list[str]:
    """Vectorized-ish normalization with a per-call memo — for use inside
    ``map_batches`` bodies over a match column."""
    memo: dict[str, str] = {}
    out = []
    for s in strings:
        v = memo.get(s)
        if v is None:
            v = normalize(s, entity_class)
            memo[s] = v
        out.append(v)
    return out
