"""Hypothesis fuzz: the full per-doc pipeline never raises on arbitrary
text (the reference proves the same property over arbitrary Documents,
``kazu/tests/test_pipeline.py:60-93``)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pytest


@pytest.fixture(scope="module")
def stage(cache_dir):
    from kazu_ray.stages.fused import AnnotateStage

    return AnnotateStage(cache_dir)


@settings(max_examples=120, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.text(max_size=400))
def test_annotate_never_raises(stage, text):
    (ents, triples), spans = stage.annotate_doc(text, "fuzz")
    for e in ents:
        assert 0 <= e["start"] <= e["end"] <= len(text)
        if not e.get("spans"):
            assert text[e["start"] : e["end"]] == e["match"]
    for t in triples:
        assert t["subj"] < t["obj"]


@settings(max_examples=120, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.text(
        alphabet=st.sampled_from(list("ABCDEGR12/ ().breastcancer-κ")), max_size=120
    )
)
def test_annotate_never_raises_adversarial_alphabet(stage, text):
    """Alphabet biased toward tokenizer/splitter/abbreviation edge cases
    (parens, slashes, dashes, greek, planted surfaces)."""
    (ents, triples), _ = stage.annotate_doc(text, "fuzz2")
    assert isinstance(ents, list) and isinstance(triples, list)


@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(st.text(max_size=120), min_size=0, max_size=4)
)
def test_annotate_sections_never_raises(stage, sections):
    ents, triples = stage.annotate_sections(sections, "fuzz-sections")
    for e in ents:
        assert 0 <= e["section_idx"] < max(1, len(sections))
        text = sections[e["section_idx"]]
        if not e.get("spans"):
            assert text[e["start"] : e["end"]] == e["match"]
    for t in triples:
        assert t["subj"] < t["obj"]
