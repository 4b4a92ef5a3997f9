"""Token-sequence pattern matcher — the engine's stand-in for
``spacy.matcher.Matcher`` over the engine's own tokenizer.

The reference's RulesBasedEntityClassDisambiguationFilterStep
(``kazu/steps/linking/rules_based_disambiguation.py:37-288``) evaluates
spaCy ``Matcher`` TP/FP patterns on the sentence containing each
mention. spaCy is unavailable here, so this module implements the
pattern-language SUBSET its shipped rules actually use
(``kazu/conf/RulesBasedEntityClassDisambiguationFilterStep/default.yaml``
and ``kazu/tests/test_rules_based_disambiguation.py``):

* token attrs: ``TEXT``/``ORTH`` (exact), ``LOWER``, ``NORM``
  (case-insensitive equality — the shipped rules mix cases like
  ``NORM: ICSI`` / ``NORM: cycle``, so case-insensitive is the evident
  intent), ``IS_DIGIT``, ``IS_UPPER``, ``IS_LOWER``, ``IS_ALPHA``,
  ``LENGTH``
* set predicates: ``{"IN": [...]}`` / ``{"NOT_IN": [...]}``
* custom extension ``_``: ``{"<entity_class>": True}`` — true when the
  token lies inside a mention of that class (the reference's
  ``KazuToSpacyObjectMapper`` populates the same extension from
  ``Section.entities``, ``kazu/utils/spacy_object_mapper.py``)
* operators: ``OP`` in ``{"!", "?", "+", "*"}``

A pattern is a list of token specs; ``TokenMatcher`` holds a list of
patterns and reports whether ANY pattern matches a contiguous token
subsequence (spaCy Matcher semantics: match can start at any token).
Patterns are compiled to predicate lists once; matching is a small
backtracking walk (patterns are ≤ ~6 tokens, contexts are sentences).
"""

from __future__ import annotations

from typing import Any, Callable


class MatchToken:
    """One token as seen by the matcher: surface text + the set of
    entity classes covering it."""

    __slots__ = ("text", "lower", "classes")

    def __init__(self, text: str, classes: set[str] | frozenset[str] = frozenset()):
        self.text = text
        self.lower = text.lower()
        self.classes = classes


def _value_pred(value: Any, getter: Callable[[MatchToken], Any], ci: bool):
    """Compile one attr value (scalar or IN/NOT_IN set) to a predicate."""
    if isinstance(value, dict):
        if "IN" in value:
            opts = {str(v).lower() for v in value["IN"]} if ci else set(value["IN"])
            return lambda t: getter(t) in opts
        if "NOT_IN" in value:
            opts = {str(v).lower() for v in value["NOT_IN"]} if ci else set(value["NOT_IN"])
            return lambda t: getter(t) not in opts
        raise ValueError(f"unsupported set predicate {value!r}")
    if ci:
        want = str(value).lower()
        return lambda t: getter(t) == want
    return lambda t: getter(t) == value


def _compile_spec(spec: dict) -> tuple[Callable[[MatchToken], bool], str]:
    """token spec dict → (predicate, op)."""
    preds = []
    op = "1"
    for attr, value in spec.items():
        if attr == "OP":
            op = value
            continue
        if attr in ("TEXT", "ORTH"):
            preds.append(_value_pred(value, lambda t: t.text, ci=False))
        elif attr == "LOWER":
            preds.append(_value_pred(value, lambda t: t.lower, ci=True))
        elif attr == "NORM":
            # case-insensitive by design decision (see module docstring)
            preds.append(_value_pred(value, lambda t: t.lower, ci=True))
        elif attr == "IS_DIGIT":
            preds.append(lambda t, _v=bool(value): t.text.isdigit() == _v)
        elif attr == "IS_UPPER":
            preds.append(lambda t, _v=bool(value): t.text.isupper() == _v)
        elif attr == "IS_LOWER":
            preds.append(lambda t, _v=bool(value): t.text.islower() == _v)
        elif attr == "IS_ALPHA":
            preds.append(lambda t, _v=bool(value): t.text.isalpha() == _v)
        elif attr == "LENGTH":
            preds.append(lambda t, _v=int(value): len(t.text) == _v)
        elif attr == "_":
            for ext, ext_val in value.items():
                preds.append(
                    lambda t, _e=ext, _v=bool(ext_val): (_e in t.classes) == _v
                )
        else:
            raise ValueError(f"unsupported Matcher attr {attr!r}")
    if not preds:
        pred = lambda t: True  # noqa: E731 — bare {} / {"OP": ...} spec
    elif len(preds) == 1:
        pred = preds[0]
    else:
        def pred(t, _ps=tuple(preds)):
            return all(p(t) for p in _ps)
    if op not in ("1", "!", "?", "+", "*"):
        raise ValueError(f"unsupported OP {op!r}")
    return pred, op


class TokenMatcher:
    def __init__(self, patterns: list[list[dict]]):
        self._compiled = [[_compile_spec(s) for s in pat] for pat in patterns]

    def _match_at(self, tokens: list[MatchToken], pat, pi: int, ti: int) -> int | None:
        """End token index of a match of ``pat[pi:]`` starting at ``ti``,
        or None. Consuming branches are tried first, so a zero-length
        result is only returned when no consuming match exists here."""
        if pi == len(pat):
            return ti
        pred, op = pat[pi]
        if op == "1":
            if ti < len(tokens) and pred(tokens[ti]):
                return self._match_at(tokens, pat, pi + 1, ti + 1)
            return None
        if op == "!":
            if ti < len(tokens) and not pred(tokens[ti]):
                return self._match_at(tokens, pat, pi + 1, ti + 1)
            return None
        if op == "?":
            if ti < len(tokens) and pred(tokens[ti]):
                end = self._match_at(tokens, pat, pi + 1, ti + 1)
                if end is not None:
                    return end
            return self._match_at(tokens, pat, pi + 1, ti)
        # "+" / "*": greedy-with-backtracking over 1..n / 0..n repeats
        min_reps = 1 if op == "+" else 0
        reps = 0
        while ti + reps < len(tokens) and pred(tokens[ti + reps]):
            reps += 1
        while reps >= min_reps:
            end = self._match_at(tokens, pat, pi + 1, ti + reps)
            if end is not None:
                return end
            reps -= 1
        return None

    def __call__(self, tokens: list[MatchToken]) -> bool:
        """True iff any pattern matches a NON-EMPTY contiguous
        subsequence — spaCy's Matcher never yields zero-length matches,
        so an all-optional pattern must not 'match' an empty window."""
        for pat in self._compiled:
            for start in range(len(tokens)):
                end = self._match_at(tokens, pat, 0, start)
                if end is not None and end > start:
                    return True
        return False


def sentence_match_tokens(
    text: str,
    sent_span: tuple[int, int],
    ents: list[dict],
    toks: list[tuple[str, int, int]],
) -> list[MatchToken]:
    """Build the matcher's token view of one sentence: engine tokens
    restricted to ``sent_span``, each annotated with the entity classes
    of the mentions covering it (the reference's
    ``KazuToSpacyObjectMapper`` extension-population equivalent)."""
    lo, hi = sent_span
    out: list[MatchToken] = []
    spans = [
        (e["start"], e["end"], e["entity_class"])
        for e in ents
        if e["start"] < hi and e["end"] > lo
    ]
    for tok, ts, te in toks:
        if ts >= hi:
            break
        if te <= lo:
            continue
        classes = {c for (s, e, c) in spans if s < te and e > ts}
        out.append(MatchToken(tok, classes))
    return out
