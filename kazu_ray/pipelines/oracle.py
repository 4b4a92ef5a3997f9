"""Single-process oracle pipeline.

Driver-side, Ray-free implementation of the full KG pipeline over a
pandas pages frame, mirroring the reference's sequential
``list[Document]`` fold (``kazu/pipeline/__init__.py:211-288``). Used by
the acceptance tests as the gold standard for the P/R ≥ 0.95 gate
(BASELINE.md): the Ray pipeline must reproduce this output over the
same corpus. The per-doc kernels are the same modules the Ray stages
use — what this comparison validates is the distributed plumbing
(streaming, batching, actor state, explode) rather than re-deriving the
NLP semantics twice.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from kazu_ray.lang.tokens import sentence_index_for_span, sentence_spans
from kazu_ray.sources.corpus import pages_pandas
from kazu_ray.stages.docproc import DEFAULT_CLASS_RULES, process_doc
from kazu_ray.stages.extract import SKIP_DOC_LEN, html_to_text
from kazu_ray.stages.linking import LinkingStage
from kazu_ray.stages.mapping import MappingRunner
from kazu_ray.stages.ner import REGEX_NER_PATTERN, build_automaton, match_entities
from kazu_ray.state.store import ensure_default_caches, load_store


def oracle_run(sf_dir: str, limit: int | None = None, with_regex_ner: bool = True):
    """Returns (entities_df, triples_df, text_hashes_df)."""
    cache_dir = ensure_default_caches()
    store = load_store(cache_dir)
    automaton = build_automaton(store)
    runner = MappingRunner(store)
    linker = LinkingStage(cache_dir) if with_regex_ner else None

    pages = pages_pandas(sf_dir, limit=limit)
    ent_rows, triple_rows, hash_rows = [], [], []
    for row in pages.itertuples(index=False):
        text = row.text if row.text is not None else html_to_text(row.html)
        hash_rows.append((row.url, hashlib.sha256(text.encode()).hexdigest()))
        if row.lang != "en" or len(text) >= SKIP_DOC_LEN:
            continue
        spans = sentence_spans(text)
        ents = match_entities(text, automaton)
        for e in ents:
            e["sent_idx"] = sentence_index_for_span(spans, e["start"])
        if with_regex_ner:
            for m in REGEX_NER_PATTERN.finditer(text):
                from kazu_ray.lang import normalizer as _n

                ents.append(
                    {
                        "start": m.start(),
                        "end": m.end(),
                        "match": m.group(),
                        "match_norm": _n.normalize(m.group(), "gene"),
                        "entity_class": "gene",
                        "namespace": "RegexNerStub",
                        "confidence": 50,
                        "cands": [],
                        "mappings": [],
                        "sent_idx": sentence_index_for_span(spans, m.start()),
                    }
                )
            # linking (same search kernel as the Ray actor)
            for ent in ents:
                if ent["namespace"] == "RegexNerStub":
                    cands = linker._search(ent["match"], ent["entity_class"])
                    existing = {(c[0], c[1]) for c in ent["cands"]}
                    for c in cands:
                        if (c[0], c[1]) not in existing:
                            ent["cands"].append(list(c))
        final_ents, triples = process_doc(
            runner, text, row.url, ents, spans, DEFAULT_CLASS_RULES
        )
        from kazu_ray.stages.docproc import canonical_id

        for e in final_ents:
            cid = canonical_id(e)
            ent_rows.append(
                (
                    row.url,
                    e["start"],
                    e["end"],
                    e["match"],
                    e["entity_class"],
                    cid,
                    len(e["mappings"]),
                )
            )
        triple_rows.extend(
            (t["subj"], t["pred"], t["obj"], t["doc_id"], t["sent_idx"]) for t in triples
        )
    entities = pd.DataFrame(
        ent_rows,
        columns=["url", "start", "end", "match", "entity_class", "canonical_id", "n_mappings"],
    )
    triples = pd.DataFrame(triple_rows, columns=["subj", "pred", "obj", "doc_id", "sent_idx"])
    hashes = pd.DataFrame(hash_rows, columns=["url", "text_sha256"])
    return entities, triples, hashes


def precision_recall(pred: set, gold: set) -> tuple[float, float]:
    if not pred or not gold:
        return (0.0, 0.0)
    tp = len(pred & gold)
    return tp / len(pred), tp / len(gold)
