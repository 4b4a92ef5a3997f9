"""Fused per-document annotation stage.

One actor pool running the entire per-doc chain —
dictionary NER → transformer token NER → TF-IDF linking → doc post-processing
(rules filter, mapping, abbreviations, cleanup, merge, triples) —
in a single ``__call__``. Composes the exact same kernels as the
individual stages in ``ner.py`` / ``linking.py`` / ``docproc.py``; the
only difference is physical: entities stay as Python dicts between
steps instead of round-tripping through JSON columns and the object
store at every stage boundary.

Profiling (see BASELINE.md) showed per-doc semantic compute is ~1 ms
while the 4-stage pipeline paid ~4× that in serialization + scheduling;
fusing is the standard Ray Data answer when adjacent stages share the
same resource shape (all CPU-1 actor pools). The unfused stages remain
available for pipelines that need to scale the NER pool independently
of the linking pool (e.g. when a GPU transformer NER replaces the
stub).
"""

from __future__ import annotations

import json

import pyarrow as pa

from kazu_ray.lang.tokens import (
    sentence_index_for_span,
    sentence_spans,
    token_boundaries_from,
    tokenize,
)
from kazu_ray.stages.docproc import DEFAULT_CLASS_RULES, process_doc
from kazu_ray.stages.postner import split_non_contiguous
from kazu_ray.stages.linking import LinkingStage
from kazu_ray.stages.mapping import MappingRunner
from kazu_ray.stages.ner import (
    _resolve_store,
    build_automaton,
    match_entities,
)
from kazu_ray.stages.token_ner import MODEL_NER_NAMESPACE, model_ner_mentions


# worker-process cache for the task-based variant: one AnnotateStage per
# (store key) per worker process. Ray reuses worker processes across
# tasks, so this gives actor-pool-style state amortization with task-pool
# elasticity (no pool sizing; scheduler uses every free CPU). Measured
# (BASELINE.md): same semantics, better scaling than a static actor pool
# for this CPU-only stage; GPU/model stages should still use actor pools.
_WORKER_STAGE_CACHE: dict = {}

# per-worker running count of docs that raised on the triples_flat fast
# path (observability side-channel: the fast path emits no per-doc error
# column, so failures surface here + in the per-batch warning log)
FAST_PATH_FAILURES: dict = {"docs": 0}


def make_annotate_task(
    store,
    with_model_ner: bool = True,
    class_rules: dict | None = None,
    emit: tuple = ("entities", "triples"),
):
    """Returns a plain map_batches function with per-worker cached state.

    ``store`` may be a ray ObjectRef (broadcast once) or a cache-dir
    path; either is a stable cache key. ``emit`` controls which output
    columns are produced — a triples-only flow skips serializing entity
    lists entirely (less allocation + object-store traffic).
    """
    key = (store if isinstance(store, str) else store.hex(), with_model_ner, emit)

    def annotate_task(batch: pa.Table) -> pa.Table:
        stage = _WORKER_STAGE_CACHE.get(key)
        if stage is None:
            stage = AnnotateStage(store, with_model_ner, class_rules, emit)
            _WORKER_STAGE_CACHE[key] = stage
        return stage(batch)

    return annotate_task


def make_annotate_sections_task(store, with_model_ner: bool = True, class_rules: dict | None = None):
    """``map_batches`` function for multi-section documents: expects a
    ``sections`` column (list of strings, or list of structs with a
    ``text`` field). Emits ents_json / triples_json with per-entity
    ``section_idx`` and document-global sentence numbering."""
    key = (
        (store if isinstance(store, str) else store.hex()),
        with_model_ner,
        "sections",
    )

    def annotate_sections_task(batch: pa.Table) -> pa.Table:
        import traceback

        stage = _WORKER_STAGE_CACHE.get(key)
        if stage is None:
            stage = AnnotateStage(store, with_model_ner, class_rules)
            _WORKER_STAGE_CACHE[key] = stage
        ents_out, triples_out, errors = [], [], []
        for doc_id, sections in zip(
            batch["doc_id"].to_pylist(), batch["sections"].to_pylist()
        ):
            texts = [
                s["text"] if isinstance(s, dict) else s for s in (sections or [])
            ]
            try:
                ents, triples = stage.annotate_sections(texts, doc_id)
                error = ""
            except Exception:
                ents, triples = [], []
                error = traceback.format_exc(limit=5)
            ents_out.append(json.dumps(ents))
            triples_out.append(json.dumps(triples))
            errors.append(error)
        out = batch.append_column(
            "ents_json", pa.array(ents_out, type=pa.large_string())
        )
        out = out.append_column(
            "triples_json", pa.array(triples_out, type=pa.large_string())
        )
        out = out.append_column(
            "processing_exception", pa.array(errors, type=pa.large_string())
        )
        return out

    return annotate_sections_task


class AnnotateStage:
    """docs(text) → docs + ents_json + sents_json + triples_json."""

    def __init__(
        self,
        store,
        with_model_ner: bool = True,
        class_rules: dict | None = None,
        emit: tuple = ("entities", "triples"),
    ):
        self.emit = emit
        resolved = _resolve_store(store)
        self.automaton = build_automaton(resolved)
        self.with_model_ner = with_model_ner
        self.linker = LinkingStage(resolved) if with_model_ner else None
        self.runner = MappingRunner(resolved)
        self.class_rules = class_rules or DEFAULT_CLASS_RULES

    def annotate_doc(self, text: str, doc_id: str):
        from kazu_ray.lang import normalizer

        toks = tokenize(text)
        spans = sentence_spans(text, toks=toks)
        ents = match_entities(text, self.automaton, toks=toks)
        for e in ents:
            e["sent_idx"] = sentence_index_for_span(spans, e["start"])
        if self.with_model_ner:
            ents.extend(model_ner_mentions(text, spans))
            ents = split_non_contiguous(ents, text)
            for ent in ents:
                if ent["namespace"] == MODEL_NER_NAMESPACE:
                    cands = self.linker._search(ent["match"], ent["entity_class"])
                    existing = {(c[0], c[1]) for c in ent["cands"]}
                    for c in cands:
                        if (c[0], c[1]) not in existing:
                            ent["cands"].append(list(c))
        return (
            process_doc(self.runner, text, doc_id, ents, spans, self.class_rules, toks=toks),
            spans,
        )

    def _section_ner(self, text: str):
        """NER + regex + split + linking for one section (section-local spans)."""
        from kazu_ray.lang import normalizer

        toks = tokenize(text)
        spans = sentence_spans(text, toks=toks)
        ents = match_entities(text, self.automaton, toks=toks)
        for e in ents:
            e["sent_idx"] = sentence_index_for_span(spans, e["start"])
        if self.with_model_ner:
            ents.extend(model_ner_mentions(text, spans))
            ents = split_non_contiguous(ents, text)
            for ent in ents:
                if ent["namespace"] == MODEL_NER_NAMESPACE:
                    cands = self.linker._search(ent["match"], ent["entity_class"])
                    existing = {(c[0], c[1]) for c in ent["cands"]}
                    for c in cands:
                        if (c[0], c[1]) not in existing:
                            ent["cands"].append(list(c))
        return ents, spans

    def annotate_sections(self, section_texts: list[str], doc_id: str):
        """Multi-section document annotation (reference Document/Section
        shape): per-section NER/linking, document-wide mapping, cross-
        section abbreviation application — see
        ``docproc.process_sections``."""
        from kazu_ray.stages.docproc import process_sections

        ents_per_section, sents_per_section = [], []
        for text in section_texts:
            ents, spans = self._section_ner(text)
            ents_per_section.append(ents)
            sents_per_section.append(spans)
        return process_sections(
            self.runner,
            section_texts,
            doc_id,
            ents_per_section,
            sents_per_section,
            self.class_rules,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        # per-document exception capture (poison-pill semantics): one bad
        # document must never kill a block/task. Mirrors the reference's
        # ``document_iterating_step`` contract (``kazu/steps/step.py:60-103``
        # + ``kazu/pipeline/__init__.py:278-288``): the failed doc stays in
        # the stream with a PROCESSING_EXCEPTION marker and empty outputs.
        if self.emit == ("triples_flat",):
            # emit the flat triples table directly — no JSON round-trip,
            # no separate explode operator (the headline-throughput path)
            from kazu_ray.stages.materialize import TRIPLE_SCHEMA

            rows = {name: [] for name in TRIPLE_SCHEMA.names}
            n_failed, failed_ids = 0, []
            for text, doc_id in zip(
                batch["text"].to_pylist(), batch["doc_id"].to_pylist()
            ):
                try:
                    (_final_ents, triples), _spans = self.annotate_doc(text, doc_id)
                except Exception:
                    # failed docs emit no triples on the fast path, but
                    # they are never dropped SILENTLY: count per batch,
                    # log ids, and keep a per-worker running total
                    # (reference contract: kazu/pipeline/__init__.py:278-288)
                    n_failed += 1
                    if len(failed_ids) < 8:
                        failed_ids.append(doc_id)
                    continue
                for t in triples:
                    for name in TRIPLE_SCHEMA.names:
                        rows[name].append(t[name])
            if n_failed:
                FAST_PATH_FAILURES["docs"] += n_failed
                import logging

                logging.getLogger("kazu_ray.fused").warning(
                    "triples_flat fast path: %d failed doc(s) in batch "
                    "(worker total %d), e.g. %s",
                    n_failed,
                    FAST_PATH_FAILURES["docs"],
                    failed_ids,
                )
            return pa.table(rows, schema=TRIPLE_SCHEMA)

        import traceback

        emit_entities = "entities" in self.emit
        ents_out, sents_out, triples_out, errors = [], [], [], []
        for text, doc_id in zip(batch["text"].to_pylist(), batch["doc_id"].to_pylist()):
            try:
                (final_ents, triples), spans = self.annotate_doc(text, doc_id)
                error = ""
            except Exception:
                final_ents, triples, spans = [], [], []
                error = traceback.format_exc(limit=5)
            if emit_entities:
                ents_out.append(json.dumps(final_ents))
                sents_out.append(json.dumps(spans))
            triples_out.append(json.dumps(triples))
            errors.append(error)
        out = batch
        if emit_entities:
            out = out.append_column("ents_json", pa.array(ents_out, type=pa.large_string()))
            out = out.append_column("sents_json", pa.array(sents_out, type=pa.large_string()))
        out = out.append_column("triples_json", pa.array(triples_out, type=pa.large_string()))
        out = out.append_column(
            "processing_exception", pa.array(errors, type=pa.large_string())
        )
        return out
