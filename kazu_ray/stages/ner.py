"""NER stages.

``DictionaryNerStage`` reproduces the reference's joint dictionary NER +
linking step (``MemoryEfficientStringMatchingStep``,
``kazu/steps/joint_ner_and_linking/memory_efficient_string_matching.py:24-184``):
an Aho-Corasick automaton over the lowercased active NER synonyms of all
parsers scans each document's lowercased text; hits are validated
against token boundaries, case-sensitivity-filtered, grouped by entity
class, and emitted with exact-match linking candidates at the max
mention confidence.

``transformer_ner_batch`` is the transformer token-classification NER
(``kazu/steps/ner/hf_token_classification.py:64-352``): the ported
sliding-window frame assembly + BIO span-finder state machine lives in
``kazu_ray/stages/token_ner.py``; only the forward pass is a
deterministic stub (no model weights in this environment). Everything
downstream of the logits — stride trimming, word reassembly, span
walking, suffix strip — is the real reference semantics and is
differentially tested against the reference's own test cases.

Both are actor-pool ``map_batches`` stages: state (automaton / compiled
patterns) builds once per actor in ``__init__`` from the broadcast
ontology store; per-batch work is a per-document loop (documents are the
parallel unit — within-doc processing is order-dependent, per
``SURVEY.md §4`` ordering note).

Entities travel *inside* their document row (``ents_json`` column) —
no shuffle is needed for any document-scoped stage; entities are only
exploded to a flat table after doc-scoped processing completes.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

from kazu_ray.functions.ahocorasick import Automaton, SpanMatcher
from kazu_ray.lang import normalizer
from kazu_ray.lang.tokens import sentence_index_for_span, sentence_spans, token_boundaries, word_is_valid
from kazu_ray.state.store import OntologyStore, cached_store

DICT_NAMESPACE = "DictionaryNerStage"


def _resolve_store(store) -> OntologyStore:
    """Accept an OntologyStore, a ray ObjectRef (broadcast), or a cache
    dir path (tests / oracle)."""
    if isinstance(store, OntologyStore):
        return store
    if isinstance(store, str):
        return cached_store(store)
    import ray

    return ray.get(store)


def build_automaton(store: OntologyStore, matcher_cls=SpanMatcher):
    """Matcher keyed by lowercased surface (default: the token-span
    dictionary matcher — same hits as the char automaton, ~6x faster
    scan; pass ``matcher_cls=Automaton`` for the classic automaton).

    Per ``memory_efficient_string_matching.py:47-94`` the logical value
    is {(entity_class, confidence, case_sensitive, syn_norm,
    original_text) → parser names}; here it is pre-grouped ONCE at build
    time into ``(match_len, [(entity_class, entries)])`` with entries
    sorted, so the scan loop does no per-hit sorting or dict regrouping
    (the automaton value is static — doing this per hit was ~40% of NER
    time)."""
    key_to_info: dict[str, dict[tuple, set]] = {}
    for row in store.ner_terms.itertuples(index=False):
        entity_key = (
            row.entity_class,
            int(row.confidence),
            bool(row.case_sensitive),
            row.synonym_norm,
            row.term,
        )
        key_to_info.setdefault(row.term_lower, {}).setdefault(entity_key, set()).add(
            row.parser_name
        )
    automaton = matcher_cls()
    for key in sorted(key_to_info):
        by_class: dict[str, list[tuple]] = {}
        for entity_key in sorted(key_to_info[key]):
            entity_class, confidence, case_sensitive, syn_norm, original = entity_key
            parsers = tuple(sorted(key_to_info[key][entity_key]))
            by_class.setdefault(entity_class, []).append(
                (confidence, case_sensitive, syn_norm, original, parsers)
            )
        value = (len(key), sorted(by_class.items()))
        automaton.add_word(key, value)
    automaton.make_automaton()
    return automaton


# (match, entity_class) → match_norm, shared per worker: the mention
# vocabulary is Zipfian, so repeat lookups dominate and the memo stays
# mention-vocabulary-sized (bounded; cleared past 1M entries)
_NORM_MEMO: dict[tuple[str, str], str] = {}


def _emit_match(entities, text, start_index, end_index, class_entries, memo):
    """``memo``: matched_text → [(entity_class, match_norm, confidence,
    sorted cands)] — the full emit outcome is a pure function of the
    matched text and the matcher's payload, so repeat mentions (Zipfian)
    skip the case filter / set build / normalize / sort entirely. The
    memo lives ON THE MATCHER (never module-level: two matchers built
    from different stores in one process must not share entries). Lists
    are COPIED on emit: downstream linking appends to ent["cands"]."""
    matched_text = text[start_index : end_index + 1]
    templates = memo.get(matched_text)
    if templates is None:
        templates = []
        for entity_class, entries in class_entries:
            cands: set[tuple[str, str]] = set()
            chosen_conf = -1
            for confidence, case_sensitive, syn_norm, original_case, parsers in entries:
                if case_sensitive and matched_text != original_case:
                    continue
                for parser_name in parsers:
                    cands.add((parser_name, syn_norm))
                if confidence > chosen_conf:
                    chosen_conf = confidence
            if cands:
                memo_key = (matched_text, entity_class)
                match_norm = _NORM_MEMO.get(memo_key)
                if match_norm is None:
                    if len(_NORM_MEMO) > 1_000_000:
                        _NORM_MEMO.clear()
                    match_norm = normalizer.normalize(matched_text, entity_class)
                    _NORM_MEMO[memo_key] = match_norm
                templates.append(
                    (
                        entity_class,
                        match_norm,
                        chosen_conf,
                        # candidates: [parser, syn_norm, exact, score]
                        sorted([p, s, True, None] for p, s in cands),
                    )
                )
        if len(memo) > 1_000_000:
            memo.clear()
        memo[matched_text] = templates
    end = end_index + 1
    for entity_class, match_norm, chosen_conf, cands in templates:
        entities.append(
            {
                "start": start_index,
                "end": end,
                "match": matched_text,
                "match_norm": match_norm,
                "entity_class": entity_class,
                "namespace": DICT_NAMESPACE,
                "confidence": chosen_conf,
                "cands": [c.copy() for c in cands],
                "mappings": [],
            }
        )


def match_entities(text: str, matcher, boundaries=None, toks=None) -> list[dict]:
    """Scan one document; returns entity dicts (no sent_idx yet).

    Port of ``_process_automaton`` (``memory_efficient_string_matching.py:102-168``).
    With a :class:`SpanMatcher` (default build), candidates are
    token-aligned by construction so no ``word_is_valid`` filter is
    needed; with the classic :class:`Automaton`, every hit is
    boundary-validated. ``boundaries``/``toks`` may be precomputed.
    """
    from kazu_ray.lang.tokens import tokenize

    lower = text.lower()
    entities: list[dict] = []
    try:
        memo = matcher._emit_memo
    except AttributeError:
        memo = matcher._emit_memo = {}
    if isinstance(matcher, SpanMatcher):
        if toks is None:
            toks = tokenize(text)
        for start_index, end_index, (match_len, class_entries) in matcher.scan(lower, toks):
            _emit_match(entities, text, start_index, end_index, class_entries, memo)
        return entities
    starts, ends = boundaries if boundaries is not None else token_boundaries(text)
    for end_index, (match_len, class_entries) in matcher.iter(lower):
        start_index = end_index - match_len + 1
        if not word_is_valid(start_index, end_index, starts, ends):
            continue
        _emit_match(entities, text, start_index, end_index, class_entries, memo)
    return entities


class DictionaryNerStage:
    """Actor-pool ``map_batches`` stage: docs → docs + ents_json + sents_json."""

    def __init__(self, store):
        store = _resolve_store(store)
        self.automaton = build_automaton(store)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ents_col = []
        sents_col = []
        from kazu_ray.lang.tokens import tokenize

        for text in texts:
            toks = tokenize(text)
            spans = sentence_spans(text, toks=toks)
            ents = match_entities(text, self.automaton, toks=toks)
            for ent in ents:
                ent["sent_idx"] = sentence_index_for_span(spans, ent["start"])
            ents_col.append(json.dumps(ents))
            sents_col.append(json.dumps(spans))
        out = batch
        if "ents_json" in batch.column_names:
            # merge with pre-existing entities from an earlier NER stage
            prev = [json.loads(x) for x in batch["ents_json"].to_pylist()]
            merged = []
            for p, e in zip(prev, ents_col):
                p.extend(json.loads(e))
                merged.append(json.dumps(p))
            out = out.drop_columns(["ents_json"]).append_column(
                "ents_json", pa.array(merged, type=pa.large_string())
            )
        else:
            out = out.append_column("ents_json", pa.array(ents_col, type=pa.large_string()))
        if "sents_json" not in out.column_names:
            out = out.append_column("sents_json", pa.array(sents_col, type=pa.large_string()))
        return out


def transformer_ner_batch(batch: pa.Table) -> pa.Table:
    """Transformer token-classification NER stage for the unfused (GPU)
    layout — the ported frame→span-finder→entity path of
    ``kazu/steps/ner/hf_token_classification.py:64-352`` +
    ``tokenized_word_processor.py:69-433`` (see
    ``kazu_ray/stages/token_ner.py``; the forward pass is a
    deterministic stub, everything downstream of the logits is real).
    Mentions carry PROBABLE confidence and no candidates — downstream
    linking must ground them or cleanup drops them, the same contract a
    real model NER output has. Runs as a stateless task op here (the
    stub is cheap); a real checkpoint would make this an actor pool
    with ``num_gpus`` set."""
    from kazu_ray.stages.token_ner import model_ner_mentions

    texts = batch["text"].to_pylist()
    prev = (
        [json.loads(x) for x in batch["ents_json"].to_pylist()]
        if "ents_json" in batch.column_names
        else [[] for _ in texts]
    )
    sents_prev = (
        batch["sents_json"].to_pylist() if "sents_json" in batch.column_names else None
    )
    ents_out, sents_out = [], []
    for i, text in enumerate(texts):
        spans = json.loads(sents_prev[i]) if sents_prev else sentence_spans(text)
        ents = prev[i]
        ents.extend(model_ner_mentions(text, [tuple(s) for s in spans]))
        ents_out.append(json.dumps(ents))
        sents_out.append(json.dumps(spans))
    out = batch
    if "ents_json" in out.column_names:
        out = out.drop_columns(["ents_json"])
    if "sents_json" in out.column_names:
        out = out.drop_columns(["sents_json"])
    out = out.append_column("ents_json", pa.array(ents_out, type=pa.large_string()))
    out = out.append_column("sents_json", pa.array(sents_out, type=pa.large_string()))
    return out
