"""Mapping strategies, disambiguation, abbreviation, cleanup, merge, triples."""

from kazu_ray.lang.tokens import sentence_index_for_span, sentence_spans
from kazu_ray.stages.docproc import (
    apply_abbreviations,
    canonical_id,
    cleanup,
    emit_triples,
    merge_overlapping,
    process_doc,
)
from kazu_ray.stages.mapping import MappingRunner, SymbolMatchMappingStrategy
from kazu_ray.stages.ner import build_automaton, match_entities


def _annotate(store, text):
    automaton = build_automaton(store)
    spans = sentence_spans(text)
    ents = match_entities(text, automaton)
    for e in ents:
        e["sent_idx"] = sentence_index_for_span(spans, e["start"])
    return ents, spans


def test_exact_match_prefers_default_label(store):
    runner = MappingRunner(store)
    ents, spans = _annotate(store, "Treatment with paracetamol helped.")
    runner.run_doc(ents)
    (ent,) = [e for e in ents if e["match"] == "paracetamol"]
    # "paracetamol" is the default label of CHEMBL9000002 → the essential
    # prefer-default-label exact strategy grounds it to that id alone
    assert {m["idx"] for m in ent["mappings"]} == {"CHEMBL9000002"}
    assert all(
        m["string_match_strategy"] == "ExactMatchMappingStrategy" for m in ent["mappings"]
    )


def test_exact_match_merged_ids_prefer_default_label(store):
    # "acetaminophen" is a synonym of two merged CHEMBL ids, but it is also
    # the default label of CHEMBL9000003 — the essential prefer-default-label
    # strategy (first in the drug ladder) narrows to that id
    runner = MappingRunner(store)
    ents, spans = _annotate(store, "Treatment with acetaminophen helped.")
    runner.run_doc(ents)
    (ent,) = [e for e in ents if e["match"] == "acetaminophen"]
    assert {m["idx"] for m in ent["mappings"]} == {"CHEMBL9000003"}
    (m,) = ent["mappings"]
    assert m["disambiguation_strategy"] == "PreferDefaultLabelMatchDisambiguationStrategy"


def test_p27_disambiguates_to_annotation_winner(store):
    runner = MappingRunner(store)
    ents, spans = _annotate(store, "p27 was elevated in these samples.")
    runner.run_doc(ents)
    (ent,) = [e for e in ents if e["match"] == "p27"]
    assert {m["idx"] for m in ent["mappings"]} == {"ENSG90000000001"}  # CDKN1B, score 100


def test_defined_elsewhere_beats_annotation(store):
    # ZNRD2 mentioned explicitly → the POSSIBLE-confidence p27 should
    # resolve to the already-grounded id via DefinedElsewhereInDocument
    runner = MappingRunner(store)
    ents, spans = _annotate(store, "ZNRD2 binds p27 in vitro.")
    runner.run_doc(ents)
    (p27,) = [e for e in ents if e["match"] == "p27"]
    idxs = {m["idx"] for m in p27["mappings"]}
    assert "ENSG90000000003" in idxs


def test_symbol_match_strategy():
    assert SymbolMatchMappingStrategy.match_symbols("MAP K 8", "MAPK8")
    assert SymbolMatchMappingStrategy.match_symbols("MAPK8", "MAP K 8")
    assert not SymbolMatchMappingStrategy.match_symbols("MAPK9", "MAP K 8")


def test_abbreviation_expansion(store):
    runner = MappingRunner(store)
    text = (
        "Patients had acute lymphoblastic leukemia (ALL) at baseline. "
        "ALL relapse occurred in twelve cases."
    )
    ents, spans = _annotate(store, text)
    runner.run_doc(ents)
    out = apply_abbreviations(text, ents, spans)
    alls = [e for e in out if e["match"] == "ALL"]
    assert len(alls) == 2
    assert all(e["namespace"] == "AbbreviationFinder" for e in alls)
    assert all(
        {m["idx"] for m in e["mappings"]} == {"MONDO_2000001"} for e in alls
    )
    # second occurrence is in the second sentence
    assert sorted(e["sent_idx"] for e in alls) == [0, 1]


def test_cleanup_drops_unmapped_possible():
    ents = [
        {"match": "X", "confidence": 10, "mappings": []},
        {"match": "Y", "confidence": 50, "mappings": []},
        {
            "match": "Z",
            "confidence": 10,
            "mappings": [
                {"disambiguation_confidence": 0},
                {"disambiguation_confidence": 50},
            ],
        },
    ]
    out = cleanup(ents)
    assert [e["match"] for e in out] == ["Y", "Z"]
    assert len(out[1]["mappings"]) == 1  # AMBIGUOUS mapping dropped


def test_merge_overlapping_prefers_mapped_then_longer():
    base = {"confidence": 50, "mappings": [], "entity_class": "gene"}
    short_mapped = dict(base, start=0, end=4, match="ABCD", mappings=[{"m": 1}])
    long_unmapped = dict(base, start=0, end=8, match="ABCDEFGH")
    out = merge_overlapping([short_mapped, long_unmapped])
    assert out == [short_mapped]
    # both unmapped → longer wins
    out2 = merge_overlapping([dict(base, start=0, end=4), dict(base, start=0, end=8)])
    assert out2[0]["end"] == 8
    # non-overlapping stay
    out3 = merge_overlapping([dict(base, start=0, end=4), dict(base, start=10, end=14)])
    assert len(out3) == 2


def test_triples_deterministic_ordering(store):
    runner = MappingRunner(store)
    text = "EGFR12 mutations are often implicated in breast cancer."
    ents, spans = _annotate(store, text)
    final, triples = process_doc(runner, text, "docX", ents, spans)
    gd = [t for t in triples if t["pred"] == "associated_with"]
    if gd:  # EGFR12 may not exist in the generated gene table
        assert all(t["subj"] < t["obj"] for t in gd)
    assert all(t["subj"] < t["obj"] for t in triples)


def test_triple_emission_pairs():
    ents = [
        {
            "entity_class": "gene",
            "sent_idx": 0,
            "confidence": 100,
            "mappings": [
                {
                    "source": "ENSEMBL",
                    "idx": "G1",
                    "string_match_confidence": 100,
                    "disambiguation_confidence": None,
                }
            ],
        },
        {
            "entity_class": "disease",
            "sent_idx": 0,
            "confidence": 50,
            "mappings": [
                {
                    "source": "MONDO",
                    "idx": "D1",
                    "string_match_confidence": 100,
                    "disambiguation_confidence": None,
                }
            ],
        },
        {"entity_class": "drug", "sent_idx": 1, "confidence": 50, "mappings": []},
    ]
    triples = emit_triples("d", ents)
    assert len(triples) == 1
    t = triples[0]
    assert t["pred"] == "associated_with"
    assert t["subj"] == "ENSEMBL:G1" and t["obj"] == "MONDO:D1"
    assert t["confidence"] == 50
    assert canonical_id(ents[2]) is None


def test_fast_path_matches_slow_path(store):
    """Differential test: the unambiguous-exact fast path must produce
    byte-identical mappings to the full strategy ladder over the whole
    sf0.001 corpus."""
    from kazu_ray.sources.corpus import pages_pandas
    from kazu_ray.stages.extract import html_to_text
    from kazu_ray.stages.fused import AnnotateStage
    from kazu_ray.stages.mapping import MappingRunner
    from kazu_ray.state.store import ensure_default_caches

    cache_dir = ensure_default_caches()
    stage = AnnotateStage(cache_dir)
    pages = pages_pandas("/root/testdata/sf0.001", limit=200)
    slow_runner = MappingRunner(store)
    slow_runner._fast_path_mappings = lambda *a, **k: None  # disable fast path
    fast_runner = stage.runner

    for row in pages.itertuples(index=False):
        text = row.text if row.text is not None else html_to_text(row.html)
        ents_fast, _ = stage._section_ner(text)
        import copy

        ents_slow = copy.deepcopy(ents_fast)
        fast_runner.run_doc(ents_fast, text)
        slow_runner.run_doc(ents_slow, text)
        for ef, es in zip(ents_fast, ents_slow):
            assert sorted(map(str, ef["mappings"])) == sorted(
                map(str, es["mappings"])
            ), (row.url, ef["match"])


# ---------------------------------------------------------------------------
# token-pattern RulesBased disambiguation filter
# (mirrors kazu/tests/test_rules_based_disambiguation.py scenarios)
# ---------------------------------------------------------------------------

_DRUG_TP_CLASS = [[{"_": {"drug": True}}, {"LOWER": "is"}, {"LOWER": "a"}, {"LOWER": "molecule"}]]
_DRUG_FP_CLASS = [[{"_": {"gene": True}}, {"LOWER": "is"}, {"LOWER": "a"}, {"LOWER": "gene"}]]
_GENE_TP_CLASS = [[{"_": {"gene": True}}, {"LOWER": "is"}, {"LOWER": "a"}, {"LOWER": "gene"}]]
_GENE_FP_CLASS = [[{"_": {"drug": True}}, {"LOWER": "is"}, {"LOWER": "a"}, {"LOWER": "molecule"}]]
_DRUG_TP_MENTION = [[{"LOWER": "drug"}]]
_DRUG_FP_MENTION = [[{"LOWER": "protein"}]]
_GENE_TP_MENTION = [[{"LOWER": "protein"}]]
_GENE_FP_MENTION = [[{"LOWER": "drug"}]]
_LOW_INFO = "Insulin is commonly studied"


def _rules_docs():
    """Two-section docs with an ambiguous gene+drug 'Insulin' mention in
    each section (the reference's _create_test_docs shape)."""
    def ents():
        return [
            {"start": 0, "end": 7, "match": "Insulin", "entity_class": "gene"},
            {"start": 0, "end": 7, "match": "Insulin", "entity_class": "drug"},
        ]

    return ents


def _run_rules(rules, main_text):
    from kazu_ray.lang.tokens import sentence_spans
    from kazu_ray.stages.docproc import RulesBasedFilter

    mk = _rules_docs()
    texts = [main_text, _LOW_INFO]
    sents = [sentence_spans(t) for t in texts]
    ents = [mk(), mk()]
    out = RulesBasedFilter(rules).filter_sections(texts, sents, ents)
    return [e["entity_class"] for sec in out for e in sec]


import pytest as _pt


@_pt.mark.parametrize(
    "rules",
    [
        {"class_rules": {"drug": {"tp": _DRUG_TP_CLASS, "fp": _DRUG_FP_CLASS},
                         "gene": {"tp": _GENE_TP_CLASS, "fp": _GENE_FP_CLASS}}},
        {"class_rules": {"drug": {"tp": _DRUG_TP_CLASS}, "gene": {"tp": _GENE_TP_CLASS}}},
        {"class_rules": {"drug": {"fp": _DRUG_FP_CLASS}, "gene": {"fp": _GENE_FP_CLASS}}},
        {"class_rules": {"drug": {"tp": _DRUG_TP_CLASS}, "gene": {"fp": _GENE_FP_CLASS}}},
        {"mention_rules": {
            "drug": {"Insulin": {"tp": _DRUG_TP_MENTION, "fp": _DRUG_FP_MENTION}},
            "gene": {"Insulin": {"tp": _GENE_TP_MENTION, "fp": _GENE_FP_MENTION}}}},
        {"class_rules": {"drug": {"tp": _DRUG_TP_CLASS, "fp": _DRUG_FP_CLASS},
                         "gene": {"tp": _GENE_TP_CLASS, "fp": _GENE_FP_CLASS}},
         "mention_rules": {
            "drug": {"Insulin": {"tp": _DRUG_TP_MENTION, "fp": _DRUG_FP_MENTION}},
            "gene": {"Insulin": {"tp": _GENE_TP_MENTION, "fp": _GENE_FP_MENTION}}}},
    ],
)
def test_rules_filter_reference_scenarios(rules):
    """Every reference rule combination must keep exactly the 2 drug
    entities for the drug doc and the 2 gene entities for the gene doc
    (kazu/tests/test_rules_based_disambiguation.py:128-146)."""
    assert _run_rules(rules, "Insulin is a molecule or drug.") == ["drug", "drug"]
    assert _run_rules(rules, "Insulin is a gene or protein.") == ["gene", "gene"]


def test_rules_filter_pathological_drops_everything():
    """Reference :198-223: conflicting class+mention evidence drops all."""
    rules = {
        "class_rules": {"drug": {"tp": _DRUG_TP_CLASS, "fp": _DRUG_FP_CLASS},
                        "gene": {"tp": _GENE_TP_CLASS, "fp": _GENE_FP_CLASS}},
        "mention_rules": {
            "drug": {"Insulin": {"tp": _DRUG_TP_MENTION, "fp": _DRUG_FP_MENTION}},
            "gene": {"Insulin": {"tp": _GENE_TP_MENTION, "fp": _GENE_FP_MENTION}}},
    }
    assert _run_rules(rules, "Insulin is a molecule or protein.") == []
    assert _run_rules(rules, "Insulin is a molecule or gene.") == []


def test_rules_filter_sentence_scoped_not_doc_scoped():
    """Patterns evaluate on the SENTENCE containing the mention: tp
    evidence in a different sentence of the same doc still validates the
    key (doc-level aggregation), but evidence must be sentence-local to
    the evaluated occurrence."""
    from kazu_ray.lang.tokens import sentence_spans
    from kazu_ray.stages.docproc import RulesBasedFilter

    text = "Insulin is discussed. Insulin is a molecule today."
    ents = [
        {"start": 0, "end": 7, "match": "Insulin", "entity_class": "drug"},
        {"start": 22, "end": 29, "match": "Insulin", "entity_class": "drug"},
    ]
    rules = {"class_rules": {"drug": {"tp": _DRUG_TP_CLASS}}}
    out = RulesBasedFilter(rules).filter_sections(
        [text], [sentence_spans(text)], [ents]
    )
    # second occurrence's sentence hits tp → the key survives doc-wide
    assert len(out[0]) == 2
    # without the validating sentence, the key dies
    t2 = "Insulin is discussed."
    out2 = RulesBasedFilter(rules).filter_sections(
        [t2], [sentence_spans(t2)], [[ents[0]]]
    )
    assert out2[0] == []


def test_token_matcher_ops_and_sets():
    """Operator / set-predicate subset used by the shipped config
    (conf/RulesBasedEntityClassDisambiguationFilterStep/default.yaml)."""
    from kazu_ray.lang.token_matcher import MatchToken, TokenMatcher

    def toks(s, classes=()):
        return [MatchToken(w, set(classes)) for w in s.split()]

    # IN set + extension (cell_line-style rule)
    m = TokenMatcher([[{"_": {"cell_line": True}}, {"LOWER": {"IN": ["cell", "cells"]}}]])
    assert m([MatchToken("HeLa", {"cell_line"}), MatchToken("cells")])
    assert not m([MatchToken("HeLa", {"cell_line"}), MatchToken("tissue")])
    # OP "?" (quality-of-life-style rule)
    m = TokenMatcher([[{"LOWER": "quality"}, {"LOWER": "-", "OP": "?"},
                       {"LOWER": "of"}, {"LOWER": "-", "OP": "?"}, {"LOWER": "life"}]])
    assert m(toks("quality of life"))
    assert m([MatchToken(w) for w in ["quality", "-", "of", "-", "life"]])
    assert not m(toks("quality of death"))
    # OP "+" and "!"
    m = TokenMatcher([[{"IS_DIGIT": True, "OP": "+"}, {"LOWER": "mg"}]])
    assert m(toks("take 5 10 mg now"))
    assert not m(toks("take mg now"))
    m = TokenMatcher([[{"LOWER": "anti", "OP": "!"}, {"LOWER": "body"}]])
    assert m(toks("the body works"))
    assert not m(toks("anti body works"))
    # NORM is case-insensitive both ways
    m = TokenMatcher([[{"NORM": "ICSI"}]])
    assert m(toks("icsi treatment"))
    assert m(toks("ICSI treatment"))
