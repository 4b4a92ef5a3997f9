"""Dictionary entity linking (TF-IDF candidate search).

Port of ``DictionaryIndex`` (``kazu/utils/link_index.py:26-139``) and
``DictionaryEntityLinkingStep`` (``kazu/steps/linking/dictionary.py:14-84``):

* per-parser index: normalised query → exact hit in the synonym table,
  else char-bigram TF-IDF cosine top-n (scores ×100, >0 kept) with
  per-class boolean scorer post-filters
  (``conf/StringScorers/default.yaml``: gene = number + noun-modifier +
  subtype, disease = number + subtype, default = number).
* batch step: entities grouped by ``(match, entity_class)`` so each
  distinct surface string is searched once per batch and the results are
  broadcast back to all matching rows (``dictionary.py:56-84``) — plus a
  per-actor LFU-ish memo standing in for the reference's 50k lookup
  cache.

Actor-pool stage: indexes are built once per actor in ``__init__`` from
the broadcast ontology store. Linking is skipped for entities produced
by the dictionary matcher (``skip_ner_namespaces``,
``conf/DictionaryEntityLinkingStep/default.yaml``) since those already
carry exact-match candidates.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from kazu_ray.functions.tfidf import TfidfVectorizer, char_ngrams
from kazu_ray.lang import normalizer
from kazu_ray.lang.similarity import (
    GENE_NOUN_MODIFIERS,
    NounModifierScorer,
    entity_subtype_scorer,
    number_match_scorer,
)
from kazu_ray.stages.ner import DICT_NAMESPACE, _resolve_store

TOP_N = 20  # conf/DictionaryEntityLinkingStep/default.yaml:4


def boolean_scorers_for_class(entity_class: str):
    if entity_class == "gene":
        noun_mod = NounModifierScorer(GENE_NOUN_MODIFIERS)
        return [number_match_scorer, noun_mod, entity_subtype_scorer]
    if entity_class == "disease":
        return [number_match_scorer, entity_subtype_scorer]
    return [number_match_scorer]


class DictionaryIndex:
    """One parser's search index (built in-actor, never shipped)."""

    def __init__(self, store, parser_name: str):
        self.parser_name = parser_name
        self.entity_class = store.parser_entity_class[parser_name]
        self.synonyms = store.candidates_for_parser(parser_name)
        self.sorted_norms = sorted(self.synonyms)
        self.vectorizer = TfidfVectorizer(analyzer=char_ngrams)
        self.matrix = self.vectorizer.fit_transform(self.sorted_norms)
        self.boolean_scorers = boolean_scorers_for_class(self.entity_class)

    def search(self, query: str, top_n: int = TOP_N):
        """Yield (syn_norm, metrics-tuple). metrics = (exact, score, bool)."""
        match_norm = normalizer.normalize(query, self.entity_class)
        exact = self.synonyms.get(match_norm)
        if exact is not None:
            yield match_norm, (True, None, None)
            return
        qvec = self.vectorizer.transform([match_norm])[0]
        scores = self.matrix @ qvec
        order = np.argsort(-scores)[:top_n]
        for i in order:
            score = 100.0 * float(scores[i])
            if score <= 0.0:
                break
            syn_norm = self.sorted_norms[i]
            if all(s(match_norm, syn_norm) for s in self.boolean_scorers):
                yield syn_norm, (False, score, True)


class LinkingStage:
    """``map_batches`` actor: attach candidates to non-dictionary entities."""

    def __init__(self, store, skip_namespaces: tuple[str, ...] = (DICT_NAMESPACE,)):
        store = _resolve_store(store)
        self.skip_namespaces = set(skip_namespaces)
        self.class_to_indices: dict[str, list[DictionaryIndex]] = {}
        for parser_name in store.parser_names:
            idx = DictionaryIndex(store, parser_name)
            self.class_to_indices.setdefault(idx.entity_class, []).append(idx)
        self.memo: dict[tuple[str, str], list] = {}

    def _search(self, match: str, entity_class: str) -> list:
        key = (match, entity_class)
        hit = self.memo.get(key)
        if hit is not None:
            return hit
        cands = []
        for index in self.class_to_indices.get(entity_class, ()):
            for syn_norm, (exact, score, _bool) in index.search(match):
                cands.append([index.parser_name, syn_norm, exact, score])
        if len(self.memo) > 50_000:  # reference lookup_cache_size
            self.memo.clear()
        self.memo[key] = cands
        return cands

    def __call__(self, batch: pa.Table) -> pa.Table:
        ents_lists = [json.loads(x) for x in batch["ents_json"].to_pylist()]
        for ents in ents_lists:
            for ent in ents:
                if ent["namespace"] in self.skip_namespaces:
                    continue
                cands = self._search(ent["match"], ent["entity_class"])
                if cands:
                    # merge: existing (parser, syn_norm) keys win on exact flag
                    existing = {(c[0], c[1]) for c in ent["cands"]}
                    for c in cands:
                        if (c[0], c[1]) not in existing:
                            ent["cands"].append(list(c))
        out = batch.drop_columns(["ents_json"]).append_column(
            "ents_json",
            pa.array([json.dumps(e) for e in ents_lists], type=pa.large_string()),
        )
        return out
