"""Non-contiguous entity splitting (BRCA1/2 case)."""

from kazu_ray.stages.fused import AnnotateStage
from kazu_ray.stages.postner import split_non_contiguous, split_numeric_list


def _ent(match, start, entity_class="gene"):
    return {
        "start": start,
        "end": start + len(match),
        "match": match,
        "match_norm": match,
        "entity_class": entity_class,
        "namespace": "RegexNerStub",
        "confidence": 50,
        "cands": [],
        "mappings": [],
        "sent_idx": 0,
    }


def test_split_numeric_list_three_parts():
    text = "BRCA1/2/3 are oncogenes"
    out = split_numeric_list(_ent("BRCA1/2/3", 0), text)
    assert [e["match"] for e in out] == ["BRCA1", "BRCA2", "BRCA3"]
    assert out[0]["spans"] == [[0, 5]]
    assert out[1]["spans"] == [[0, 4], [6, 7]]
    assert out[2]["spans"] == [[0, 4], [8, 9]]


def test_split_ignores_non_numeric_tail():
    text = "BRCA1/x something"
    out = split_numeric_list(_ent("BRCA1/x", 0), text)
    assert [e["match"] for e in out] == ["BRCA1"]


def test_split_non_contiguous_dedupes_spans():
    text = "BRCA1/2 are oncogenes."
    composite = _ent("BRCA1/2", 0)
    brca1 = _ent("BRCA1", 0)  # already present from dictionary NER
    out = split_non_contiguous([composite, brca1], text)
    matches = sorted(e["match"] for e in out)
    # composite + existing BRCA1 + new non-contiguous BRCA2 (no dup BRCA1)
    assert matches == ["BRCA1", "BRCA1/2", "BRCA2"]


def test_brca_end_to_end(cache_dir):
    stage = AnnotateStage(cache_dir)
    (ents, triples), _ = stage.annotate_doc("BRCA1/2 are oncogenes.", "d1")
    by_match = {e["match"]: e for e in ents}
    assert {m["idx"] for m in by_match["BRCA1"]["mappings"]} == {"ENSG90000000011"}
    assert {m["idx"] for m in by_match["BRCA2"]["mappings"]} == {"ENSG90000000012"}
    assert by_match["BRCA2"]["spans"] == [[0, 4], [6, 7]]
    assert len(triples) == 1
    assert triples[0]["pred"] == "co_occurs_with"


def test_split_conjunction_simple():
    """Reference phrase (test_entity_post_processing.py:9,59-63):
    'skin, lung and breast cancer' -> three cancers."""
    from kazu_ray.stages.postner import split_conjunction

    text = "skin, lung and breast cancer are common forms."
    ent = _ent("skin, lung and breast cancer", 0, entity_class="disease")
    out = split_conjunction(ent, text)
    assert {e["match"] for e in out} == {"skin cancer", "lung cancer", "breast cancer"}
    by_match = {e["match"]: e for e in out}
    # anchor chunk is contiguous; conjuncts are two-span entities
    assert by_match["breast cancer"]["spans"] == [[15, 28]]
    assert by_match["skin cancer"]["spans"] == [[0, 4], [22, 28]]
    assert by_match["lung cancer"]["spans"] == [[6, 10], [22, 28]]


def test_split_conjunction_complex_anchor():
    """'skin, lung and triple negative breast cancer'
    (test_entity_post_processing.py:10,65-77)."""
    from kazu_ray.stages.postner import split_conjunction

    text = "skin, lung and triple negative breast cancer are common forms."
    ent = _ent("skin, lung and triple negative breast cancer", 0, entity_class="disease")
    out = split_conjunction(ent, text)
    assert {e["match"] for e in out} == {
        "skin cancer",
        "lung cancer",
        "triple negative breast cancer",
    }


def test_split_conjunction_requires_marker():
    from kazu_ray.stages.postner import split_conjunction

    ent = _ent("breast cancer", 0, entity_class="disease")
    assert split_conjunction(ent, "breast cancer here") == []


def test_split_non_contiguous_applies_conjunction_to_disease():
    from kazu_ray.stages.postner import split_non_contiguous

    text = "lung and liver cancer were studied."
    ent = _ent("lung and liver cancer", 0, entity_class="disease")
    out = split_non_contiguous([ent], text)
    matches = {e["match"] for e in out}
    assert "liver cancer" in matches
    assert "lung cancer" in matches
    # gene rule untouched by the new config path
    gtext = "BRCA1/2 are oncogenes"
    gent = _ent("BRCA1/2", 0, entity_class="gene")
    gout = split_non_contiguous([gent], gtext)
    assert {e["match"] for e in gout} >= {"BRCA1", "BRCA2"}
