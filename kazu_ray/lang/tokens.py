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
from bisect import bisect_right

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

# spaCy's rule-based ``sentencizer`` default punct set
# (``spacy/pipeline/sentencizer.pyx``, ``Sentencizer.default_punct_chars``)
# — reproduced as data parity, same justification as the normalizer's
# substitution tables: it IS the spec. The reference adds the component
# with no overrides (``kazu/utils/spacy_pipeline.py:82-85``), so the
# default set is the behavior to match.
_SENT_PUNCT_CHARS = frozenset(
    "!.?։؟۔܀܁܂߹।॥၊။።፧፨᙮᜵᜶᠃᠉᥄᥅᪨᪩᪪᪫᭚᭛᭞᭟᰻᰼᱾᱿‼‽⁇⁈⁉⸮⸼꓿꘎꘏꛳꛷꡶꡷꣎꣏꤯꧈꧉꩝꩞꩟꫰꫱꯫﹒﹖﹗"
    "！．？𐩖𐩗𑁇𑁈𑂾𑂿𑃀𑃁𑅁𑅂𑅃𑇅𑇆𑇍𑇞𑇟𑈸𑈹𑈻𑈼𑊩𑑋𑑌𑗂𑗃𑗉𑗊𑗋𑗌𑗍𑗎𑗏𑗐𑗑𑗒𑗓𑗔𑗕𑗖𑗗𑙁𑙂𑜼𑜽𑜾𑩂𑩃𑪛𑪜𑱁𑱂"
    "𖩮𖩯𖫵𖬷𖬸𖭄𛲟𝪈｡。"
)


def tokenize(text: str) -> list[tuple[str, int, int]]:
    """(token, start, end) triples — computed once per document and
    shared by the matcher's boundary sets and the abbreviation detector
    (tokenizing three times per doc was ~15% of kernel time)."""
    # span() + slice is one C call per token fewer than
    # group()/start()/end() — this runs for every token of every doc
    out = []
    append = out.append
    for m in _TOKEN.finditer(text):
        s, e = m.span()
        append((text[s:e], s, e))
    return out


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


def sentence_spans(
    text: str, toks: list[tuple[str, int, int]] | None = None
) -> list[tuple[int, int]]:
    """Split text into [start, end) sentence char spans — a faithful
    port of spaCy's rule-based ``Sentencizer.predict``
    (``spacy/pipeline/sentencizer.pyx``; added with defaults by the
    reference, ``kazu/utils/spacy_pipeline.py:82-85``): the first token
    starts a sentence, and after one or more sentence-punct TOKENS the
    next non-punct token starts a new one. Token-driven, so it shares
    :func:`tokenize` with the matcher (pass ``toks`` to reuse a
    per-doc tokenization).

    The punct test is spaCy's ``token.text in punct_chars`` — a
    whole-token single-char match — which two spaCy-tokenizer behaviors
    make subtle under our symbol-per-char tokenizer, both reproduced
    here:

    * ellipses: spaCy keeps ``..``+ / ``…`` as ONE multi-char token
      (``LIST_ELLIPSES`` stays in the custom suffix/infix sets), and a
      multi-char token never matches ``punct_chars`` — so an ellipsis
      ends no sentence; we treat any ``.`` adjacent to another ``.`` as
      part of one.
    * word-internal ``.``: ``3.5`` / ``e.g`` / ``U.S`` keep their dots
      inside one spaCy token (no infix frees them) — only a
      lowercase-before + uppercase-after dot is infix-split
      (``SPACY_DEFAULT_INFIXES``, spacy_pipeline.py:33) and can
      therefore end a sentence.

    Spans cover the full text (inter-sentence whitespace attaches to
    the preceding span; leading text before the first token joins the
    first span) — the tiling invariant ``sentence_index_for_span``
    relies on.
    """
    if toks is None:
        toks = tokenize(text)
    if not toks:
        return [(0, len(text))] if text else []
    n_chars = len(text)
    starts: list[int] = [toks[0][1]]
    seen_punct = False
    for tok, s, e in toks:
        if seen_punct and not (len(tok) == 1 and tok in _SENT_PUNCT_CHARS):
            starts.append(s)
            seen_punct = False
            continue
        if len(tok) != 1 or tok not in _SENT_PUNCT_CHARS:
            continue
        if tok == ".":
            if (s > 0 and text[s - 1] == ".") or (e < n_chars and text[e] == "."):
                continue  # ellipsis member
            if (
                s > 0
                and e < n_chars
                and text[s - 1].isalnum()
                and text[e].isalnum()
                and not (text[s - 1].islower() and text[e].isupper())
            ):
                continue  # word-internal dot
        seen_punct = True
    bounds = [0] + starts[1:] + [n_chars]
    return [(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)]


def sentence_index_for_span(spans: list[tuple[int, int]], start: int) -> int:
    """Index of the sentence containing char offset ``start`` (binary
    search; spans are sorted and tiling, so the containing span is the
    rightmost one starting at or before ``start``)."""
    if not spans:
        return 0
    i = bisect_right(spans, start, key=lambda sp: sp[0]) - 1
    if i < 0:
        return 0
    return i if start < spans[i][1] else len(spans) - 1
