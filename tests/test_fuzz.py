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


@settings(max_examples=80, deadline=None)
@given(st.text(max_size=300))
def test_sentence_spans_tile_any_text(text):
    """Sentencizer-port invariants on arbitrary text: spans tile [0, len)
    exactly, and every span index lookup lands in range."""
    from kazu_ray.lang.tokens import sentence_index_for_span, sentence_spans

    spans = sentence_spans(text)
    if not text:
        assert spans == []
        return
    assert spans[0][0] == 0 and spans[-1][1] == len(text)
    for (s1, e1), (s2, _) in zip(spans, spans[1:]):
        assert e1 == s2
        assert s1 < e1
    for pos in range(0, len(text), max(1, len(text) // 7)):
        assert 0 <= sentence_index_for_span(spans, pos) < len(spans)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(-10**6, 10**6), min_size=0, max_size=50), max_size=12
    ),
    st.integers(64, 4096),
)
def test_spill_buffer_roundtrip_property(chunks, cap):
    """SpillableTableBuffer.read() must equal the plain concat of every
    added chunk, for any chunk shapes and any byte cap (spill or not)."""
    import pyarrow as pa

    from kazu_ray.ops.exchange import SpillableTableBuffer

    buf = SpillableTableBuffer(cap)
    expected = []
    for c in chunks:
        t = pa.table({"v": pa.array(c, type=pa.int64())})
        buf.add(t)
        expected.extend(c)
    out = buf.read()
    got = out["v"].to_pylist() if out is not None else []
    assert got == expected
    assert buf.spill_dir is None  # cleaned up
