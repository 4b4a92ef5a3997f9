"""Deterministic tokenization and sentence segmentation.

The reference backfills token boundaries for its character-level string
matcher with a custom spaCy tokenizer (``kazu/utils/spacy_pipeline.py:28-84``
— hyphen-infix splitting removed, single-letter exceptions dropped) and
segments sentences with spaCy's rule ``sentencizer``. spaCy is not
available here, so both are re-implemented as small pure-regex routines
with fixed, versionless behaviour — the per-row sha/text invariants and
the P/R oracle both rely on this module, so its output must be a pure
function of its input string.
"""

from __future__ import annotations

import re

# a token is a run of word chars (unicode) — possibly JOINED ACROSS
# HYPHENS — or a single non-space symbol. The hyphen rule ports the
# reference's custom tokenizer (``kazu/utils/spacy_pipeline.py:28-70``):
# the default hyphen-infix split is removed ("ALK-Abello" must stay one
# token so 'ALK' alone can't match a gene; spacy_pipeline.py:43-49),
# EXCEPT between digits where the numeric-operator infix
# ``(?<=[0-9])[+\-\*^](?=[0-9-])`` still applies ("2-3" → [2, -, 3]).
# "/" and "(" remain explicit infixes (spacy_pipeline.py:64) so
# "BRCA1/2" stays three tokens (BRCA1, /, 2), and the removed
# single-letter exceptions + added uppercase-dot suffix
# (spacy_pipeline.py:52-70) mean "…Haemophilia A." splits the final
# "." — which a symbol-per-char tokenizer does by construction.
# hyphen continuation: letter-"-"-wordchar joins, digit-"-"-letter
# joins, digit-"-"-digit splits.
_TOKEN = re.compile(
    r"\w+(?:(?:(?<=[^\W\d_])-(?=\w)|(?<=\d)-(?=[^\W\d_]))\w+)*|[^\w\s]",
    re.UNICODE,
)

# sentence boundary: ./!/? (possibly repeated) followed by whitespace.
_SENT_BOUNDARY = re.compile(r"[.!?]+(?=\s)|[.!?]+$")


def tokenize(text: str) -> list[tuple[str, int, int]]:
    """(token, start, end) triples — computed once per document and
    shared by the matcher's boundary sets and the abbreviation detector
    (tokenizing three times per doc was ~15% of kernel time)."""
    return [(m.group(), m.start(), m.end()) for m in _TOKEN.finditer(text)]


def token_boundaries_from(toks: list[tuple[str, int, int]]) -> tuple[set[int], set[int]]:
    starts = {t[1] for t in toks}
    ends = {t[2] - 1 for t in toks}
    return starts, ends


def token_boundaries(text: str) -> tuple[set[int], set[int]]:
    """Start-index and (inclusive) end-index sets for word-boundary
    validation — the shape consumed by :func:`word_is_valid`
    (``kazu/steps/joint_ner_and_linking/memory_efficient_string_matching.py:174-178``).
    """
    starts: set[int] = set()
    ends: set[int] = set()
    for m in _TOKEN.finditer(text):
        starts.add(m.start())
        ends.add(m.end() - 1)
    return starts, ends


def word_is_valid(start_char: int, end_char: int, starts: set[int], ends: set[int]) -> bool:
    """Match must begin on a token start and finish on a token end
    (``kazu/utils/utils.py:204-207``)."""
    return start_char in starts and end_char in ends


def sentence_spans(text: str) -> list[tuple[int, int]]:
    """Split text into [start, end) sentence char spans.

    Deterministic stand-in for the reference's spaCy sentencizer; spans
    cover the full text (no gaps are lost — trailing text without a
    terminator forms a final sentence).
    """
    spans: list[tuple[int, int]] = []
    start = 0
    for m in _SENT_BOUNDARY.finditer(text):
        end = m.end()
        # extend over trailing whitespace so spans tile the string
        while end < len(text) and text[end].isspace():
            end += 1
        if end > start:
            spans.append((start, end))
        start = end
    if start < len(text):
        spans.append((start, len(text)))
    return spans


def sentence_index_for_span(spans: list[tuple[int, int]], start: int) -> int:
    """Index of the sentence containing char offset ``start`` (two-pointer
    interval lookup; spans are sorted and tiling)."""
    for i, (s, e) in enumerate(spans):
        if s <= start < e:
            return i
    return max(0, len(spans) - 1)
