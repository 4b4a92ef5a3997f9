"""Post-NER entity splitting.

Port of the reference's ``NonContiguousEntitySplitter`` /
``SplitOnNumericalListPatternWithPrefix``
(``kazu/steps/ner/entity_post_processing.py:96-189``): an entity whose
surface is a numerically incrementing list ("BRCA1/2/3") is split into a
contiguous first entity ("BRCA1") plus non-contiguous siblings ("BRCA2"
= spans [BRCA][2], "BRCA3" = spans [BRCA][3]) that copy the source
entity's class/namespace/candidates. The spaCy-dependent conjunction
rule ("lung and liver cancer", ``:29-94``) is not ported — it requires a
dependency parse and no parser is available here.

Entity dicts gain an optional ``spans`` key (list of [start, end]);
entities without it are contiguous. Downstream semantics follow the
reference: the overlap-merge step ignores non-contiguous entities
(``merge_overlapping_ents.py:92-99``).
"""

from __future__ import annotations

from kazu_ray.lang import normalizer


def split_numeric_list(ent: dict, text: str, pattern: str = "/") -> list[dict]:
    """``SplitOnNumericalListPatternWithPrefix.__call__``
    (``entity_post_processing.py:118-167``)."""
    parts = ent["match"].split(pattern)
    if len(parts) <= 1:
        return []
    start = ent["start"]
    new_ents: list[dict] = []

    def _mk(spans: list[tuple[int, int]]) -> dict:
        match = "".join(text[s:e] for s, e in spans)
        out = {
            **{k: v for k, v in ent.items() if k not in ("start", "end", "match", "match_norm", "spans")},
            "start": spans[0][0],
            "end": spans[-1][1],
            "match": match,
            "match_norm": normalizer.normalize(match, ent["entity_class"]),
            "spans": [list(s) for s in spans],
            "cands": [list(c) for c in ent.get("cands", [])],
            "mappings": [dict(m) for m in ent.get("mappings", [])],
        }
        return out

    # trailing-digit run of the first part determines the shared prefix
    i = None
    for i, char in enumerate(reversed(parts[0])):
        if not char.isdigit():
            break
    new_ents.append(_mk([(start, start + len(parts[0]))]))
    if i:
        prefix = parts[0][: len(parts[0]) - i]
        span_offset = len(parts[0]) + len(pattern)
        for part in parts[1:]:
            if not part.isdigit():
                continue
            new_ents.append(
                _mk(
                    [
                        (start, start + len(prefix)),
                        (start + span_offset, start + span_offset + len(part)),
                    ]
                )
            )
            span_offset += len(pattern) + len(part)
    return new_ents


def split_non_contiguous(ents: list[dict], text: str, classes: set[str] = frozenset({"gene"})) -> list[dict]:
    """``NonContiguousEntitySplitter.__call__`` (``:170-189``): apply the
    split rules per entity class; only emit entities whose spans are new."""
    existing: set[tuple] = set()
    for ent in ents:
        spans = ent.get("spans") or [[ent["start"], ent["end"]]]
        existing.update(tuple(s) for s in spans)
    out = list(ents)
    for ent in ents:
        if ent["entity_class"] not in classes:
            continue
        if "/" not in ent["match"]:
            continue
        for new_ent in split_numeric_list(ent, text):
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
