"""Post-NER entity splitting.

Port of the reference's ``NonContiguousEntitySplitter``
(``kazu/steps/ner/entity_post_processing.py:170-189``) and its two
rules:

* ``SplitOnNumericalListPatternWithPrefix`` (``:96-167``): an entity
  whose surface is a numerically incrementing list ("BRCA1/2/3") is
  split into a contiguous first entity ("BRCA1") plus non-contiguous
  siblings ("BRCA2" = spans [BRCA][2], "BRCA3" = spans [BRCA][3]).
* ``SplitOnConjunctionPattern`` (``:29-94``): a conjunction phrase
  ("skin, lung and breast cancer") is split into the anchor noun chunk
  ("breast cancer") plus one non-contiguous entity per earlier conjunct
  ([skin]+[cancer] → "skin cancer"). The reference drives this with a
  spaCy dependency parse (noun chunks + conj arcs); no parser exists in
  this environment, so chunk boundaries come from the conjunction
  markers themselves (split on ``", "`` / ``" and " / " or " / " nor "``)
  and the anchor token is the head (last) word of the final chunk — the
  same outputs on the reference's own test phrases
  (``kazu/tests/test_entity_post_processing.py``), approximate on
  parses where a noun chunk itself contains a comma.

Entity dicts gain an optional ``spans`` key (list of [start, end]);
entities without it are contiguous. Split entities copy the source
entity's class/namespace/candidates. Downstream semantics follow the
reference: the overlap-merge step ignores non-contiguous entities
(``merge_overlapping_ents.py:92-99``).
"""

from __future__ import annotations

import re

from kazu_ray.lang import normalizer

CONJUNCTION_MARKERS = (" and ", " or ", " nor ")
_CHUNK_SPLIT_RE = re.compile(r",\s*|\s+(?:and|or|nor)\s+")


def _copy_with_spans(ent: dict, text: str, spans: list[tuple[int, int]], join_str: str) -> dict:
    """``_copy_ent_with_new_spans`` (``entity_post_processing.py:10-26``):
    new entity dict from the source's metadata with recomputed
    match/match_norm over the given spans."""
    match = join_str.join(text[s:e] for s, e in spans)
    return {
        **{
            k: v
            for k, v in ent.items()
            if k not in ("start", "end", "match", "match_norm", "spans")
        },
        "start": spans[0][0],
        "end": spans[-1][1],
        "match": match,
        "match_norm": normalizer.normalize(match, ent["entity_class"]),
        "spans": [list(s) for s in spans],
        "cands": [list(c) for c in ent.get("cands", [])],
        "mappings": [dict(m) for m in ent.get("mappings", [])],
    }


def split_numeric_list(ent: dict, text: str, pattern: str = "/") -> list[dict]:
    """``SplitOnNumericalListPatternWithPrefix.__call__``
    (``entity_post_processing.py:118-167``)."""
    parts = ent["match"].split(pattern)
    if len(parts) <= 1:
        return []
    start = ent["start"]
    new_ents: list[dict] = []

    # trailing-digit run of the first part determines the shared prefix
    i = None
    for i, char in enumerate(reversed(parts[0])):
        if not char.isdigit():
            break
    new_ents.append(_copy_with_spans(ent, text, [(start, start + len(parts[0]))], ""))
    if i:
        prefix = parts[0][: len(parts[0]) - i]
        span_offset = len(parts[0]) + len(pattern)
        for part in parts[1:]:
            if not part.isdigit():
                continue
            new_ents.append(
                _copy_with_spans(
                    ent,
                    text,
                    [
                        (start, start + len(prefix)),
                        (start + span_offset, start + span_offset + len(part)),
                    ],
                    "",
                )
            )
            span_offset += len(pattern) + len(part)
    return new_ents


def split_conjunction(ent: dict, text: str) -> list[dict]:
    """``SplitOnConjunctionPattern.__call__``
    (``entity_post_processing.py:38-94``), pattern-approximated (see
    module docstring): conjuncts from marker-splitting the match, anchor
    = last chunk, anchor token = its last word; emits the anchor chunk
    contiguously plus [conjunct]+[anchor token] per earlier chunk."""
    match = ent["match"]
    if not any(m in match for m in CONJUNCTION_MARKERS):
        return []
    parts = [p.strip() for p in _CHUNK_SPLIT_RE.split(match) if p.strip()]
    if len(parts) < 2:
        return []
    # locate each chunk's offsets inside the match, left to right
    offsets: list[tuple[int, int]] = []
    pos = 0
    for p in parts:
        i = match.find(p, pos)
        if i < 0:
            return []
        offsets.append((i, i + len(p)))
        pos = i + len(p)
    start = ent["start"]
    anchor_s, anchor_e = offsets[-1]
    anchor_last_word = parts[-1].rsplit(" ", 1)[-1]
    anchor_word_span = (start + anchor_e - len(anchor_last_word), start + anchor_e)
    out = [
        # the anchor noun chunk itself, contiguous
        _copy_with_spans(ent, text, [(start + anchor_s, start + anchor_e)], " ")
    ]
    for s, e in offsets[:-1]:
        out.append(
            _copy_with_spans(ent, text, [(start + s, start + e), anchor_word_span], " ")
        )
    return out


# entity_class → split rules, mirroring the reference's default
# entity_conditions config (numeric lists on genes, conjunctions on
# diseases — kazu/tests/test_entity_post_processing.py:26-31)
DEFAULT_SPLIT_RULES: dict[str, tuple] = {
    "gene": (split_numeric_list,),
    "disease": (split_conjunction,),
}


def split_non_contiguous(
    ents: list[dict], text: str, rules: dict[str, tuple] | None = None
) -> list[dict]:
    """``NonContiguousEntitySplitter.__call__`` (``:170-189``): apply the
    split rules per entity class; only emit entities whose spans are new."""
    rules = DEFAULT_SPLIT_RULES if rules is None else rules
    existing: set[tuple] = set()
    for ent in ents:
        spans = ent.get("spans") or [[ent["start"], ent["end"]]]
        existing.update(tuple(s) for s in spans)
    out = list(ents)
    for ent in ents:
        for rule in rules.get(ent["entity_class"], ()):
            for new_ent in rule(ent, text):
                spans = [tuple(s) for s in new_ent["spans"]]
                if any(s not in existing for s in spans):
                    out.append(new_ent)
                    existing.update(spans)
    return out


def split_batch(batch):
    """Stateless ``map_batches`` wrapper for the unfused pipeline layout:
    applies :func:`split_non_contiguous` to the ``ents_json`` column."""
    import json

    import pyarrow as pa

    texts = batch["text"].to_pylist()
    ents_lists = [json.loads(x) for x in batch["ents_json"].to_pylist()]
    out = [
        json.dumps(split_non_contiguous(ents, text))
        for ents, text in zip(ents_lists, texts)
    ]
    return batch.drop_columns(["ents_json"]).append_column(
        "ents_json", pa.array(out, type=pa.large_string())
    )
