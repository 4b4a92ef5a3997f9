"""Mapping (canonicalization) core: StrategyRunner + strategies.

Port of the reference's grounding machinery, executed per document
inside a ``map_batches`` actor (documents never leave their row, so no
shuffle is needed):

* ``StrategyRunner`` / ``ConfidenceLevelStrategyExecution``
  (``kazu/steps/linking/post_processing/strategy_runner.py:40-342``):
  sort all doc entities by (−mention_confidence, EntityKey), group by
  confidence → symbolic split → group by EntityKey; run the strategy
  ladder per group until each parser is resolved; copy resulting
  mappings to every group member. Deterministic total order preserved.
* mapping strategies
  (``.../mapping_strategies/strategies.py:282-553``): ExactMatch,
  SymbolMatch, SynNormIsSubString, StrongMatch, StrongMatch+embedding
  confirmation (continuous scorer substituted per
  ``kazu_ray/lang/similarity.py``).
* disambiguation strategies
  (``.../disambiguation/strategies.py:100-446``): DefinedElsewhereInDocument,
  TfIdf context, AnnotationLevel, PreferDefaultLabelMatch. The gene
  class's GildaTfIdf strategy needs a pretrained model pack and is
  substituted by the plain TfIdf context strategy (documented deviation).
* the strategy ladder configuration mirrors
  ``conf/MappingStep/default.yaml`` / ``conf/DisambiguationStrategies/default.yaml``.

Entity dicts carry ``cands`` ([parser, syn_norm, exact, score]) and
accumulate ``mappings`` dicts.
"""

from __future__ import annotations

from kazu_ray.functions.tfidf import TfidfVectorizer, word_and_char_ngrams
from kazu_ray.lang import normalizer
from kazu_ray.lang.similarity import label_similarity_scorer
from kazu_ray.model import LinkingCandidate
from kazu_ray.state.store import OntologyStore

HL, PROB, POSS, AMBIG = 100, 50, 10, 0
DISAMBIGUATION_NOT_REQUIRED = "disambiguation_not_required"


def entity_key(ent: dict) -> tuple:
    """Hashable doc-level identity for mapping purposes
    (``strategy_runner.py:26-37``)."""
    return (
        ent["match"],
        ent["match_norm"],
        ent["entity_class"],
        tuple(sorted((c[0], c[1]) for c in ent["cands"])),
    )


def make_mapping(
    store: OntologyStore,
    parser_name: str,
    idx: str,
    source: str,
    strategy: str,
    confidence: int,
    disambiguation_strategy: str | None,
    disambiguation_confidence: int | None,
) -> dict:
    return {
        "parser_name": parser_name,
        "source": source,
        "idx": idx,
        "default_label": store.default_label(parser_name, idx),
        "string_match_strategy": strategy,
        "string_match_confidence": confidence,
        "disambiguation_strategy": disambiguation_strategy,
        "disambiguation_confidence": disambiguation_confidence,
    }


# ---------------------------------------------------------------------------
# document context shared by strategies
# ---------------------------------------------------------------------------


class DocContext:
    """Per-document state consulted by disambiguation strategies."""

    def __init__(self, ents: list[dict], runner: "MappingRunner", text: str | None = None):
        self.ents = ents
        self.runner = runner
        self.text = text
        self._doc_repr: dict[str, object] = {}
        self._gilda_repr: dict[str, object] = {}

    def gilda_doc_vector(self, parser_name: str):
        """Whole-doc text vector (``disambiguation/strategies.py:303-316``),
        computed once per (doc, parser)."""
        vec = self._gilda_repr.get(parser_name)
        if vec is None:
            vectorizer, _, _ = self.runner.gilda_contexts[parser_name]
            vec = vectorizer.transform([self.text or ""])[0]
            self._gilda_repr[parser_name] = vec
        return vec

    def mapped_ids(self) -> set[tuple[str, str, str]]:
        """(parser, source, idx) already grounded anywhere in the doc
        (``disambiguation/strategies.py:110-127``) — recomputed on each
        call because mapping mutates doc state."""
        out = set()
        for ent in self.ents:
            for m in ent["mappings"]:
                out.add((m["parser_name"], m["source"], m["idx"]))
        return out

    def doc_representation(self, parser_name: str):
        """TF-IDF vector of all entity match_norms in the doc, per parser
        vectorizer (``disambiguation/strategies.py:206-225``)."""
        vec = self._doc_repr.get(parser_name)
        if vec is None:
            strings = " ".join(e["match_norm"] for e in self.ents)
            vec = self.runner.context_vectorizers[parser_name].transform([strings])[0]
            self._doc_repr[parser_name] = vec
        return vec


# ---------------------------------------------------------------------------
# disambiguation strategies
# ---------------------------------------------------------------------------


class DefinedElsewhereStrategy:
    name = "DefinedElsewhereInDocumentDisambiguationStrategy"
    confidence = HL

    def __call__(self, id_sets, doc: DocContext, parser_name, ent_match, ent_match_norm):
        mapped = doc.mapped_ids()
        found = set()
        for id_set in id_sets:
            kept = frozenset(
                (idx, source)
                for idx, source in id_set
                if (parser_name, source, idx) in mapped
            )
            if kept:
                found.add(kept)
        return found


class TfIdfContextStrategy:
    """Doc-context vs unambiguous-synonym TF-IDF, threshold 0.7
    (``disambiguation/strategies.py:152-269``)."""

    name = "TfIdfDisambiguationStrategy"
    confidence = PROB
    context_threshold = 0.7
    relevant_agg = {"UNAMBIGUOUS", "RESOLVED_BY_SIMILARITY", "MERGED_AS_NON_SYMBOLIC"}

    def __call__(self, id_sets, doc: DocContext, parser_name, ent_match, ent_match_norm):
        store = doc.runner.store
        if parser_name not in doc.runner.context_vectorizers:
            return set()
        doc_vec = doc.doc_representation(parser_name)
        syn_to_sets: dict[str, set] = {}
        for id_set in id_sets:
            for idx, _source in id_set:
                for syn in store.syns_for_id(parser_name, idx, self.relevant_agg):
                    syn_to_sets.setdefault(syn, set()).add(id_set)
        if not syn_to_sets:
            return set()
        strings = list(syn_to_sets.keys())
        if len(strings) == 1:
            scored = [(strings[0], 100.0)]
        else:
            mat = doc.runner.context_vectorizers[parser_name].transform(strings)
            scores = mat @ doc_vec
            order = sorted(range(len(strings)), key=lambda i: -scores[i])
            scored = [(strings[i], float(scores[i])) for i in order]
        for best_syn, score in scored:
            if score >= self.context_threshold and len(syn_to_sets[best_syn]) == 1:
                return set(syn_to_sets[best_syn])
        return set()


class GildaStyleTfIdfStrategy:
    """Doc-text-context disambiguation in the shape of the reference's
    ``GildaTfIdfDisambiguationStrategy`` (``disambiguation/strategies.py:272-358``
    + ``context_scoring.py:92-232``): score each candidate id's context
    vector against the whole document's text vector; succeed only if the
    best id's score beats the first id from a *different* EquivalentIdSet
    by ≥ ``context_threshold_delta``. The reference's pretrained
    vectorizer + wikipedia context strings live in a model pack that is
    unavailable here; the context string for an id is therefore its
    default label + all synonyms that reference it (deterministic, built
    from the ontology caches)."""

    name = "GildaTfIdfDisambiguationStrategy"
    confidence = PROB
    context_threshold_delta = 0.01

    def __call__(self, id_sets, doc: DocContext, parser_name, ent_match, ent_match_norm):
        runner = doc.runner
        ctx = runner.gilda_contexts.get(parser_name)
        if ctx is None or doc.text is None:
            return set()
        vectorizer, idx_list, matrix = ctx
        doc_vec = doc.gilda_doc_vector(parser_name)
        idx_to_set: dict[str, set] = {}
        relevant: set[str] = set()
        for id_set in id_sets:
            for idx, _source in id_set:
                idx_to_set.setdefault(idx, set()).add(id_set)
                relevant.add(idx)
        pos = {idx: i for i, idx in enumerate(idx_list)}
        scored = sorted(
            (
                (float(matrix[pos[idx]] @ doc_vec), idx)
                for idx in relevant
                if idx in pos
            ),
            key=lambda x: (-x[0], x[1]),
        )
        best_set = None
        best_score = 0.0
        for score, idx in scored:
            this_set = idx_to_set[idx]
            if best_set is None:
                best_set, best_score = this_set, score
            elif best_set == this_set:
                continue
            else:
                if (best_score - score) < self.context_threshold_delta:
                    return set()
                return set(best_set)
        return set(best_set) if best_set is not None and len(scored) > 0 else set()


class AnnotationLevelStrategy:
    """Max annotation_score proxy (``disambiguation/strategies.py:361-397``)."""

    name = "AnnotationLevelDisambiguationStrategy"
    confidence = POSS

    def __call__(self, id_sets, doc: DocContext, parser_name, ent_match, ent_match_norm):
        store = doc.runner.store
        best_score = 0
        best: set = set()
        for id_set in sorted(id_sets, key=sorted):
            for idx, _source in id_set:
                score = store.annotation_score(parser_name, idx)
                if score > best_score:
                    best_score = score
                    best = {id_set}
                elif score == best_score:
                    best.add(id_set)
        return best


class PreferDefaultLabelStrategy:
    """Keep ids whose normalised default label equals the match norm
    (``disambiguation/strategies.py:400-446``)."""

    name = "PreferDefaultLabelMatchDisambiguationStrategy"
    confidence = HL

    def __call__(self, id_sets, doc: DocContext, parser_name, ent_match, ent_match_norm):
        store = doc.runner.store
        entity_class = store.parser_entity_class[parser_name]
        kept = set()
        for id_set in id_sets:
            for idx, source in id_set:
                label_norm = normalizer.normalize(
                    store.default_label(parser_name, idx), entity_class
                )
                if label_norm == ent_match_norm:
                    kept.add((idx, source))
        if not kept:
            return set()
        return {frozenset(kept)}


# ---------------------------------------------------------------------------
# mapping strategies
# ---------------------------------------------------------------------------


class MappingStrategy:
    """Filter candidates then disambiguate-if-required then emit mappings
    (``mapping_strategies/strategies.py:108-279``)."""

    def __init__(self, confidence, disamb_strategies=None, disamb_essential=False):
        self.confidence = confidence
        self.disamb_strategies = disamb_strategies or []
        self.disamb_essential = disamb_essential

    def filter_candidates(self, ent_match, ent_match_norm, doc, candidates, parser_name):
        raise NotImplementedError

    def disambiguate_if_required(self, filtered, doc, parser_name, ent_match, ent_match_norm):
        all_id_sets = set(
            id_set for cand in filtered for id_set in cand.associated_id_sets
        )
        if not self.disamb_essential and len(all_id_sets) == 1:
            return all_id_sets, DISAMBIGUATION_NOT_REQUIRED, None
        if not self.disamb_essential and not self.disamb_strategies:
            return all_id_sets, None, AMBIG
        for strategy in self.disamb_strategies:
            filtered_sets = strategy(all_id_sets, doc, parser_name, ent_match, ent_match_norm)
            if len(filtered_sets) == 1:
                return filtered_sets, strategy.name, strategy.confidence
        if self.disamb_essential:
            return set(), None, AMBIG
        return all_id_sets, None, AMBIG

    def __call__(self, ent_match, ent_match_norm, doc, candidates):
        parser_name = next(iter(candidates)).parser_name
        filtered = self.filter_candidates(
            ent_match, ent_match_norm, doc, candidates, parser_name
        )
        if not filtered:
            return
        id_sets, disamb_strategy, disamb_conf = self.disambiguate_if_required(
            filtered, doc, parser_name, ent_match, ent_match_norm
        )
        store = doc.runner.store
        for id_set in sorted(id_sets, key=sorted):
            for idx, source in sorted(id_set):
                yield make_mapping(
                    store,
                    parser_name,
                    idx,
                    source,
                    self.__class__.__name__,
                    self.confidence,
                    disamb_strategy,
                    disamb_conf,
                )


class ExactMatchMappingStrategy(MappingStrategy):
    def filter_candidates(self, ent_match, ent_match_norm, doc, candidates, parser_name):
        return {c: m for c, m in candidates.items() if m[0]}  # metrics[0] = exact


class SymbolMatchMappingStrategy(MappingStrategy):
    """Token-multiset containment ("MAP K8" vs "MAPK8",
    ``strategies.py:296-335``)."""

    @staticmethod
    def match_symbols(s1: str, s2: str) -> bool:
        ref_tokens = s1.split(" ")
        query_tokens = s2.split(" ")
        if len(ref_tokens) > len(query_tokens):
            longest, shortest = ref_tokens, s2
        else:
            longest, shortest = query_tokens, s1
        for tok in longest:
            if tok not in shortest:
                return False
            shortest = shortest.replace(tok, "", 1)
        return shortest.strip() == ""

    def filter_candidates(self, ent_match, ent_match_norm, doc, candidates, parser_name):
        return {
            c: m
            for c, m in candidates.items()
            if self.match_symbols(ent_match_norm, c.synonym_norm)
        }


class SynNormIsSubStringMappingStrategy(MappingStrategy):
    """Longest unique whitespace-token hit ("TESTIN gene" → "TESTIN",
    ``strategies.py:338-399``)."""

    min_syn_norm_len_to_consider = 3

    def filter_candidates(self, ent_match, ent_match_norm, doc, candidates, parser_name):
        norm_tokens = set(ent_match_norm.split(" "))
        hits = [
            ((c, m), len(c.synonym_norm))
            for c, m in candidates.items()
            if c.synonym_norm in norm_tokens
            and len(c.synonym_norm) >= self.min_syn_norm_len_to_consider
        ]
        hits.sort(key=lambda x: x[1], reverse=True)
        from itertools import groupby

        for _, group in groupby(hits, key=lambda x: x[1]):
            group_list = list(group)
            if len(group_list) == 1:
                c, m = group_list[0][0]
                return {c: m}
        return {}


class StrongMatchMappingStrategy(MappingStrategy):
    """Search-score threshold + differential (``strategies.py:402-477``)."""

    def __init__(
        self,
        confidence,
        disamb_strategies=None,
        disamb_essential=False,
        search_threshold=80.0,
        symbolic_only=False,
        differential=2.0,
    ):
        super().__init__(confidence, disamb_strategies, disamb_essential)
        self.search_threshold = search_threshold
        self.symbolic_only = symbolic_only
        self.differential = differential

    def filter_candidates(self, ent_match, ent_match_norm, doc, candidates, parser_name):
        scored = [
            ((c, m), m[1])
            for c, m in candidates.items()
            if m[1] is not None and (not self.symbolic_only or c.is_symbolic)
        ]
        if not scored:
            return {}
        best = max(s for _, s in scored)
        return {
            cm[0]: cm[1]
            for cm, s in scored
            if s >= self.search_threshold and best - s <= self.differential
        }


class StrongMatchWithEmbeddingConfirmationStrategy(StrongMatchMappingStrategy):
    """Parent filter + continuous-scorer confirmation ≥ 0.60 against raw
    synonyms (``strategies.py:480-553``; SapBERT substituted by the
    deterministic char-ngram scorer)."""

    embedding_threshold = 0.60

    def filter_candidates(self, ent_match, ent_match_norm, doc, candidates, parser_name):
        filtered = super().filter_candidates(
            ent_match, ent_match_norm, doc, candidates, parser_name
        )
        by_score = sorted(filtered.items(), key=lambda x: x[1][1], reverse=True)
        selected_id_sets = set()
        out = {}
        for cand, metrics in by_score:
            if cand.associated_id_sets not in selected_id_sets:
                selected_id_sets.add(cand.associated_id_sets)
                if any(
                    label_similarity_scorer(ent_match, syn) >= self.embedding_threshold
                    for syn in sorted(cand.raw_synonyms)
                ):
                    out[cand] = metrics
        return out


# ---------------------------------------------------------------------------
# strategy ladder configuration (conf/MappingStep/default.yaml)
# ---------------------------------------------------------------------------


def _disamb_default():
    return [DefinedElsewhereStrategy(), TfIdfContextStrategy()]


def _disamb_gene():
    # [DefinedElsewhere, GildaTfIdf, AnnotationLevel] per
    # conf/DisambiguationStrategies/default.yaml `gene`
    return [DefinedElsewhereStrategy(), GildaStyleTfIdfStrategy(), AnnotationLevelStrategy()]


def _disamb_prefer_default_label():
    return [PreferDefaultLabelStrategy()]


def build_strategy_table() -> dict:
    """{(symbolic: bool, mention_confidence) →
    (default_strategies, {entity_class: strategies})}."""
    sym_hl_default = [
        ExactMatchMappingStrategy(HL, _disamb_default()),
        SymbolMatchMappingStrategy(PROB, _disamb_default()),
        SynNormIsSubStringMappingStrategy(PROB, _disamb_default()),
        StrongMatchMappingStrategy(POSS, _disamb_default(), symbolic_only=True),
    ]
    sym_hl_classes = {
        "gene": [
            ExactMatchMappingStrategy(HL, _disamb_prefer_default_label(), disamb_essential=True),
            ExactMatchMappingStrategy(HL, _disamb_gene()),
            SymbolMatchMappingStrategy(PROB, _disamb_gene()),
            SynNormIsSubStringMappingStrategy(PROB, _disamb_gene()),
            StrongMatchMappingStrategy(
                POSS, _disamb_gene(), symbolic_only=True, search_threshold=90.0
            ),
        ],
        "disease": [
            ExactMatchMappingStrategy(HL, _disamb_default()),
            SymbolMatchMappingStrategy(PROB, _disamb_default()),
            SynNormIsSubStringMappingStrategy(PROB, _disamb_default()),
            StrongMatchMappingStrategy(POSS, _disamb_default(), symbolic_only=True),
        ],
        "drug": [ExactMatchMappingStrategy(HL, _disamb_default())],
    }
    sym_prob_default = [ExactMatchMappingStrategy(HL, _disamb_default())]
    sym_prob_classes = {
        "gene": [
            ExactMatchMappingStrategy(HL, _disamb_prefer_default_label(), disamb_essential=True),
            ExactMatchMappingStrategy(HL, _disamb_gene()),
        ],
    }
    poss_default = [
        ExactMatchMappingStrategy(HL, [DefinedElsewhereStrategy()], disamb_essential=True)
    ]

    nonsym_hl_default = [
        ExactMatchMappingStrategy(HL, _disamb_prefer_default_label(), disamb_essential=True),
        ExactMatchMappingStrategy(HL, _disamb_default()),
        StrongMatchMappingStrategy(POSS, _disamb_default(), symbolic_only=False),
    ]
    nonsym_hl_classes = {
        "drug": [
            ExactMatchMappingStrategy(HL, _disamb_prefer_default_label(), disamb_essential=True),
            ExactMatchMappingStrategy(HL, _disamb_default()),
        ],
        "gene": [
            ExactMatchMappingStrategy(HL, _disamb_prefer_default_label(), disamb_essential=True),
            ExactMatchMappingStrategy(HL, _disamb_gene()),
            SynNormIsSubStringMappingStrategy(PROB, _disamb_gene()),
            StrongMatchMappingStrategy(PROB, _disamb_gene(), symbolic_only=False),
        ],
        "disease": [
            ExactMatchMappingStrategy(HL, _disamb_prefer_default_label(), disamb_essential=True),
            ExactMatchMappingStrategy(HL, _disamb_default()),
            StrongMatchWithEmbeddingConfirmationStrategy(
                POSS, _disamb_default(), symbolic_only=False
            ),
        ],
    }
    nonsym_prob_default = [
        ExactMatchMappingStrategy(HL, _disamb_prefer_default_label(), disamb_essential=True),
        ExactMatchMappingStrategy(HL, _disamb_default()),
    ]
    nonsym_prob_classes = {
        "gene": [
            ExactMatchMappingStrategy(HL, _disamb_prefer_default_label(), disamb_essential=True),
            ExactMatchMappingStrategy(HL, _disamb_gene()),
        ],
    }

    return {
        (True, HL): (sym_hl_default, sym_hl_classes),
        (True, PROB): (sym_prob_default, sym_prob_classes),
        (True, POSS): (poss_default, {}),
        (False, HL): (nonsym_hl_default, nonsym_hl_classes),
        (False, PROB): (nonsym_prob_default, nonsym_prob_classes),
        (False, POSS): (poss_default, {}),
    }


# ---------------------------------------------------------------------------
# runner
# ---------------------------------------------------------------------------


class MappingRunner:
    """Built once per actor; ``run_doc`` mutates an entity list in place.

    ``xref_manager`` (optional, default off as in the reference's default
    config ``cross_ref_managers: ~``) augments each created mapping with
    cross-knowledgebase mappings (``strategy_runner.py:324-333``)."""

    _FAST_MEMO_MAX = 100_000

    def __init__(self, store: OntologyStore, xref_manager=None):
        self.store = store
        self.xref_manager = xref_manager
        # cross-document fast-path memo (see _execute); same hit-rate
        # rationale as the reference's LFU linking cache
        # (kazu/utils/caching.py:96-127, cache size 50k)
        self._fast_memo: dict[tuple, list | None] = {}
        # Gilda-style id-context vectors, gene parsers only (the gene
        # disambiguation ladder is the consumer): context string per id =
        # default label + synonyms referencing the id
        self.gilda_contexts: dict[str, tuple] = {}
        for parser_name, entity_class in store.parser_entity_class.items():
            if entity_class != "gene":
                continue
            idx_list = sorted(
                idx for (p, idx) in store.metadata if p == parser_name
            )
            contexts = []
            for idx in idx_list:
                syns = store.id_to_syns.get((parser_name, idx), set())
                contexts.append(
                    " ".join([store.default_label(parser_name, idx)] + sorted(syns))
                )
            v = TfidfVectorizer(analyzer=word_and_char_ngrams)
            matrix = v.fit_transform(contexts)
            self.gilda_contexts[parser_name] = (v, idx_list, matrix)
        self.strategy_table = build_strategy_table()
        # per-parser context vectorizers fit over that parser's synonym
        # norms (context_scoring.py:61-69)
        self.context_vectorizers: dict[str, TfidfVectorizer] = {}
        for parser_name in store.parser_names:
            syns = sorted(store.candidates_for_parser(parser_name))
            v = TfidfVectorizer(analyzer=word_and_char_ngrams)
            v.fit(syns)
            self.context_vectorizers[parser_name] = v

    def _candidates_of(self, ent: dict) -> dict[LinkingCandidate, tuple]:
        out = {}
        for parser, syn_norm, exact, score in ent["cands"]:
            cand = self.store.synonyms.get((parser, syn_norm))
            if cand is not None:
                out[cand] = (bool(exact), score)
        return out

    def run_doc(self, ents: list[dict], text: str | None = None) -> None:
        """StrategyRunner.__call__ (``strategy_runner.py:239-342``)."""
        from itertools import groupby

        doc = DocContext(ents, self, text)
        # entity_key is consulted by every sort/group below — compute
        # once and CARRY it as (key, ent) pairs (a decorate-sort: no
        # per-comparison lambdas chasing an id()-keyed side dict)
        keyed = [(entity_key(e), e) for e in ents if e["cands"]]
        keyed.sort(key=lambda p: (-p[1]["confidence"], p[0]))
        for conf, conf_group_iter in groupby(keyed, key=lambda p: p[1]["confidence"]):
            conf_group = list(conf_group_iter)
            symbolic: list[tuple] = []
            non_symbolic: list[tuple] = []
            # key[0]/key[2] ARE (match, entity_class) — sort/group on
            # the precomputed key components directly
            for (match, eclass), pair_iter in groupby(
                sorted(conf_group, key=lambda p: (p[0][0], p[0][2])),
                key=lambda p: (p[0][0], p[0][2]),
            ):
                bucket = (
                    symbolic
                    if normalizer.classify_symbolic(match, eclass)
                    else non_symbolic
                )
                bucket.extend(pair_iter)
            for is_symbolic, bucket in ((False, non_symbolic), (True, symbolic)):
                table = self.strategy_table.get((is_symbolic, conf))
                if table is None or not bucket:
                    continue
                self._execute(bucket, doc, table)

    def _fast_path_mappings(self, ref, class_strategies, default_strategies):
        """Mappings for an entity group whose full-ladder outcome is
        provably determined by its candidates alone (no document
        context), or ``None`` when the slow path is required.

        Because the result depends only on (cands, match_norm,
        entity_class, ladder) — all captured by the entity key + the
        ladder table — it is memoized ACROSS documents per worker in
        ``_execute`` (the corpus vocabulary is Zipfian, so the same
        entity groups recur in most documents)."""
        cands = ref["cands"]
        # all exact-match candidates from exactly one parser
        if not cands or any(not c[2] for c in cands):
            return None
        parser = cands[0][0]
        if any(c[0] != parser for c in cands):
            return None
        strategies = class_strategies.get(ref["entity_class"], default_strategies)
        if not strategies or type(strategies[0]) is not ExactMatchMappingStrategy:
            return None
        first = strategies[0]
        candidates = self._candidates_of(ref)
        if len(candidates) != len(cands):
            return None
        id_sets = set()
        for cand in candidates:
            id_sets.update(cand.associated_id_sets)
        if len(id_sets) != 1:
            return None
        (id_set,) = id_sets

        store = self.store
        if first.disamb_essential:
            # only the prefer-default-label-essential shape is predictable
            if len(first.disamb_strategies) != 1 or not isinstance(
                first.disamb_strategies[0], PreferDefaultLabelStrategy
            ):
                return None
            entity_class = store.parser_entity_class[parser]
            kept = sorted(
                (idx, source)
                for idx, source in id_set
                if normalizer.normalize(
                    store.default_label(parser, idx), entity_class
                )
                == ref["match_norm"]
            )
            if kept:
                return [
                    make_mapping(
                        store, parser, idx, source,
                        "ExactMatchMappingStrategy", first.confidence,
                        PreferDefaultLabelStrategy.name, HL,
                    )
                    for idx, source in kept
                ]
            # essential strategy fails → next ladder entry must be a
            # plain non-essential Exact for the outcome to be known
            if (
                len(strategies) < 2
                or type(strategies[1]) is not ExactMatchMappingStrategy
                or strategies[1].disamb_essential
            ):
                return None
            return [
                make_mapping(
                    store, parser, idx, source,
                    "ExactMatchMappingStrategy", strategies[1].confidence,
                    DISAMBIGUATION_NOT_REQUIRED, None,
                )
                for idx, source in sorted(id_set)
            ]
        return [
            make_mapping(
                store, parser, idx, source,
                "ExactMatchMappingStrategy", first.confidence,
                DISAMBIGUATION_NOT_REQUIRED, None,
            )
            for idx, source in sorted(id_set)
        ]

    def _execute(self, pairs: list[tuple], doc: DocContext, table) -> None:
        """execute_hit_post_processing_strategies + per-group bookkeeping
        (``strategy_runner.py:294-342``, ``:40-159``). stop_on_success is
        True for every ladder in the default config. ``pairs`` carries
        precomputed ``(entity_key(e), e)`` tuples from :meth:`run_doc`
        so grouping never re-derives (or side-tables) the key."""
        from itertools import groupby
        from operator import itemgetter

        default_strategies, class_strategies = table
        max_index = max(
            (len(default_strategies), *(len(s) for s in class_strategies.values()))
        )
        groups = [
            (key, [p[1] for p in group])
            for key, group in groupby(pairs, key=itemgetter(0))
        ]
        unresolved: dict[tuple, set[str]] = {}
        mapped_flag: dict[tuple, bool] = {}
        cand_memo: dict[tuple, dict] = {}

        # fast path for the dominant case — all candidates exact, single
        # parser, single unambiguous EquivalentIdSet: the ladder outcome
        # is fully determined by its first one or two Exact strategies, so
        # resolve directly without running the strategy machinery.
        # Memoized ACROSS documents per worker (keyed by entity key +
        # ladder identity): the fast-path outcome never consults doc
        # context, and the Zipfian mention vocabulary makes repeat keys
        # the common case. The memo is bypassed when an xref_manager is
        # configured (xrefs are created per mapping instance).
        # Equivalence with the slow path is enforced by
        # tests/test_mapping_and_docproc.py::test_fast_path_matches_slow_path.
        memo = self._fast_memo if self.xref_manager is None else None
        slow_groups = []
        for key, group in groups:
            ref = group[0]
            if memo is not None:
                # key covers EVERYTHING the fast path reads: entity_key
                # alone omits the cands' exact flags / scores
                memo_key = (
                    ref["entity_class"],
                    ref["match_norm"],
                    tuple(map(tuple, ref["cands"])),
                    id(table),
                )
                try:
                    mappings = memo[memo_key]
                except KeyError:
                    mappings = self._fast_path_mappings(
                        ref, class_strategies, default_strategies
                    )
                    if len(memo) >= self._FAST_MEMO_MAX:
                        memo.clear()
                    memo[memo_key] = mappings
            else:
                mappings = self._fast_path_mappings(
                    ref, class_strategies, default_strategies
                )
            if mappings is None:
                slow_groups.append((key, group))
                continue
            for mapping in mappings:
                xrefs = (
                    self.xref_manager.create_xref_mappings(mapping)
                    if self.xref_manager is not None
                    else []
                )
                for ent in group:
                    if mapping not in ent["mappings"]:
                        ent["mappings"].append(dict(mapping))
                    for xref in xrefs:
                        if xref not in ent["mappings"]:
                            ent["mappings"].append(dict(xref))
        groups = slow_groups

        for i in range(max_index):
            for key, group in groups:
                ref = group[0]
                strategies = class_strategies.get(ref["entity_class"], default_strategies)
                if i >= len(strategies):
                    continue
                if key not in unresolved:
                    unresolved[key] = {c[0] for c in ref["cands"]}
                if not unresolved[key]:
                    continue
                if mapped_flag.get(key, False):
                    continue  # stop_on_success
                strategy = strategies[i]
                candidates = cand_memo.get(key)
                if candidates is None:
                    candidates = self._candidates_of(ref)
                    cand_memo[key] = candidates
                by_parser: dict[str, dict] = {}
                for cand, metrics in candidates.items():
                    if cand.parser_name in unresolved[key]:
                        by_parser.setdefault(cand.parser_name, {})[cand] = metrics
                for parser_name in sorted(by_parser):
                    for mapping in strategy(
                        ref["match"], ref["match_norm"], doc, by_parser[parser_name]
                    ):
                        unresolved[key].discard(mapping["parser_name"])
                        mapped_flag[key] = True
                        xrefs = (
                            self.xref_manager.create_xref_mappings(mapping)
                            if self.xref_manager is not None
                            else []
                        )
                        for ent in group:
                            if mapping not in ent["mappings"]:
                                ent["mappings"].append(dict(mapping))
                            for xref in xrefs:
                                if xref not in ent["mappings"]:
                                    ent["mappings"].append(dict(xref))
