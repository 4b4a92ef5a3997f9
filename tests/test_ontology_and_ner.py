"""Ontology cache build + dictionary NER semantics."""

import json

from kazu_ray.lang.tokens import sentence_spans
from kazu_ray.stages.ner import build_automaton, match_entities


def test_p27_is_ambiguous_three_ways(store):
    cand = store.candidate("hgnc_like", "P 27")
    assert len(cand.associated_id_sets) == 3  # CDKN1B / PAK2 / ZNRD2
    assert cand.is_symbolic
    assert cand.aggregated_by == "RESOLVED_BY_SIMILARITY"


def test_case_variants_merge_to_one_candidate(store):
    cand = store.candidate("mondo_like", "BREAST CANCER")
    assert "breast cancer" in cand.raw_synonyms
    assert "Breast Cancer" in cand.raw_synonyms
    assert len(cand.associated_id_sets) == 1


def test_paracetamol_two_ids_merge_non_symbolic(store):
    cand = store.candidate("chembl_like", "ACETAMINOPHEN")
    (ids,) = cand.associated_id_sets
    assert {i for i, _ in ids} == {"CHEMBL9000002", "CHEMBL9000003"}
    assert cand.aggregated_by == "MERGED_AS_NON_SYMBOLIC"


def test_autocuration_all_is_possible_confidence(store):
    rows = store.ner_terms
    all_rows = rows[(rows.term == "ALL") & (rows.parser_name == "mondo_like")]
    assert len(all_rows) == 1
    assert int(all_rows.iloc[0].confidence) == 10  # LikelyAcronym → POSSIBLE
    # symbolic → case sensitive
    assert bool(all_rows.iloc[0].case_sensitive)


def test_autocuration_multiword_probable(store):
    rows = store.ner_terms
    bc = rows[(rows.term == "breast cancer")]
    assert len(bc) == 1
    assert int(bc.iloc[0].confidence) == 50


def test_ner_word_boundaries_and_case(store):
    automaton = build_automaton(store)
    # 'ALL' is case-sensitive: lowercase 'all' must not match
    ents = match_entities("We measured all of the ALL samples.", automaton)
    matches = [(e["match"], e["entity_class"]) for e in ents]
    assert ("ALL", "disease") in matches
    assert ("all", "disease") not in matches
    # substring must not fire inside a word
    ents2 = match_entities("The OVERALLOCATION was high.", automaton)
    assert not any(e["match"] == "ALL" for e in ents2)


def test_ner_emits_exact_candidates(store):
    automaton = build_automaton(store)
    ents = match_entities("breast cancer is common.", automaton)
    (ent,) = [e for e in ents if e["match"] == "breast cancer"]
    assert ent["cands"] == [["mondo_like", "BREAST CANCER", True, None]]
    assert ent["confidence"] == 50


def test_cross_parser_overlap_emits_two_entities(store):
    automaton = build_automaton(store)
    ents = match_entities("ABC1 was upregulated.", automaton)
    classes = sorted(e["entity_class"] for e in ents if e["match"] == "ABC1")
    assert classes == ["drug", "gene"]


def test_dictionary_ner_stage_roundtrip(store):
    import pyarrow as pa

    from kazu_ray.stages.ner import DictionaryNerStage

    stage = DictionaryNerStage(store)
    batch = pa.table(
        {
            "doc_id": ["d1"],
            "text": pa.array(["EGFR12 mutations in breast cancer."], type=pa.large_string()),
        }
    )
    out = stage(batch)
    ents = json.loads(out["ents_json"][0].as_py())
    assert any(e["match"] == "breast cancer" for e in ents)
    spans = json.loads(out["sents_json"][0].as_py())
    assert spans == [list(s) for s in sentence_spans(batch["text"][0].as_py())] or spans == [
        tuple(s) for s in sentence_spans(batch["text"][0].as_py())
    ]


def test_span_matcher_equals_automaton():
    """The token-span dictionary matcher must produce exactly the
    word_is_valid-filtered hit set of the classic Aho-Corasick automaton
    on real corpus docs (the scan-equivalence contract)."""
    from kazu_ray.functions.ahocorasick import Automaton
    from kazu_ray.sources.corpus import page_text_for_doc
    from kazu_ray.stages.ner import build_automaton, match_entities
    from kazu_ray.state.store import ensure_default_caches, load_store

    store = load_store(ensure_default_caches(None))
    span_matcher = build_automaton(store)
    automaton = build_automaton(store, matcher_cls=Automaton)

    def key(e):
        return (e["start"], e["end"], e["entity_class"], tuple(map(tuple, e["cands"])))

    for doc_id in range(400):
        text = page_text_for_doc(doc_id)
        got = sorted(match_entities(text, span_matcher), key=key)
        want = sorted(match_entities(text, automaton), key=key)
        assert [key(e) for e in got] == [key(e) for e in want], doc_id
