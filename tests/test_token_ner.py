"""Span-finder port tests, mirroring
``/root/reference/kazu/tests/test_tokenized_word_processor.py`` plus
frame/stride and kernel-level cases. Pure-Python — no Ray needed."""

from __future__ import annotations

import numpy as np

from kazu_ray.stages.token_ner import (
    DeterministicTransformerNer,
    MODEL_NER_NAMESPACE,
    TokenizedWord,
    TokenizedWordProcessor,
    _frames,
    model_ner_entities,
)


def _word(word_id, tokens, conf_rows, offsets, start, end):
    return TokenizedWord(
        word_id=word_id,
        token_ids=list(range(len(tokens))),
        tokens=tokens,
        token_confidences=np.array(conf_rows, dtype=np.float32),
        token_offsets=offsets,
        word_char_start=start,
        word_char_end=end,
    )


def test_simple_span_finder_single_label():
    # mirror of test_tokenized_word_processor_single_label
    text = "hello to you"
    word1 = _word(0, ["hello"], [[0.70, 0.20, 0.10]], [(0, 5)], 0, 5)
    word2 = _word(1, ["to"], [[0.01, 0.98, 0.01]], [(6, 8)], 6, 8)
    word3 = _word(2, ["you"], [[0.01, 0.01, 0.98]], [(9, 11)], 9, 11)
    processor = TokenizedWordProcessor(labels=["B-class1", "O", "B-class2"], use_multilabel=False)
    ents = processor([word1, word2, word3], text=text, namespace="test")
    assert len(ents) == 2
    classes = [e["entity_class"] for e in ents]
    assert "class1" in classes and "class2" in classes


def test_multilabel_span_finder():
    # mirror of test_tokenized_word_processor_multi_label
    text = "hello to you"
    word1 = _word(0, ["hello"], [[1, 0, 0]], [(0, 5)], 0, 5)
    word2 = _word(1, ["to"], [[1, 0, 1]], [(6, 8)], 6, 8)
    word3 = _word(2, ["you"], [[0, 0, 0]], [(9, 11)], 9, 11)
    processor = TokenizedWordProcessor(labels=["class1", "O", "class2"], use_multilabel=True)
    ents = processor([word1, word2, word3], text=text, namespace="test")
    assert len(ents) == 2
    classes = {e["entity_class"] for e in ents}
    matches = {e["match"] for e in ents}
    assert classes == {"class1", "class2"}
    assert "to" in matches
    assert "hello to" in matches


def test_strip_suffixes():
    # mirror of test_tokenized_word_processor_strip_re
    processor = TokenizedWordProcessor(
        labels=["B-hello", "O"], use_multilabel=False, strip_re={"gene": "( (gene|protein)s?)+$"}
    )
    for query in ["COX2 protein", "COX2 gene", "COX2 gene protein protein gene"]:
        s, e = processor.attempt_strip_suffixes(0, len(query), query, "gene")
        assert s == "COX2" and e == 4
        s, e = processor.attempt_strip_suffixes(0, len(query), query, "none")
        assert s == query and e == len(query)


def test_nested_entity_copy_on_repeated_b():
    """A second B of the same class inside an active span closes a COPY
    and keeps extending (tokenized_word_processor.py:117-125)."""
    text = "EGFR BRCA1 x"
    w1 = _word(0, ["EGFR"], [[0, 1, 0]], [(0, 4)], 0, 4)
    w2 = _word(1, ["BRCA1"], [[0, 1, 0]], [(5, 10)], 5, 10)
    w3 = _word(2, ["x"], [[1, 0, 0]], [(11, 12)], 11, 12)
    processor = TokenizedWordProcessor(labels=["O", "B-gene", "I-gene"])
    ents = processor([w1, w2, w3], text=text, namespace="t")
    matches = sorted(e["match"] for e in ents)
    assert matches == ["EGFR", "EGFR BRCA1"]


def test_span_breaking_char_closes_span():
    """A '(' before the word closes the active span even when labels
    continue (tokenized_word_processor.py:150-166)."""
    text = "EGFR (HER2 x"
    w1 = _word(0, ["EGFR"], [[0, 1, 0]], [(0, 4)], 0, 4)
    w2 = _word(1, ["HER2"], [[0, 0, 1]], [(6, 10)], 6, 10)  # I-gene continue
    w3 = _word(2, ["x"], [[1, 0, 0]], [(11, 12)], 11, 12)
    processor = TokenizedWordProcessor(labels=["O", "B-gene", "I-gene"])
    ents = processor([w1, w2, w3], text=text, namespace="t")
    # the span closes at '(' — HER2 is I- so no new span starts
    assert [e["match"] for e in ents] == ["EGFR"]


def test_trailing_space_trim():
    """An entity whose offsets overrun into a trailing space is trimmed
    (tokenized_word_processor.py:385-393)."""
    text = "EGFR x"
    # word_char_end over-reported by one (the frame-final-word quirk)
    w1 = _word(0, ["EGFR"], [[0, 1, 0]], [(0, 4)], 0, 4)
    processor = TokenizedWordProcessor(labels=["O", "B-gene", "I-gene"])
    ents = processor([w1], text=text, namespace="t")
    assert ents[0]["match"] == "EGFR"
    assert ents[0]["end"] == 4


def test_frames_single_and_overlap():
    assert _frames(100, 128, 16) == [(0, 100)]
    frames = _frames(300, 128, 16)
    # capacity 126, step 110
    assert frames[0] == (0, 126)
    assert frames[1] == (110, 236)
    assert frames[-1][1] == 300
    # consecutive frames overlap by stride
    for (s0, e0), (s1, e1) in zip(frames, frames[1:]):
        assert e0 - s1 == 16


def test_kernel_on_short_text():
    ents = model_ner_entities("EGFR mutations are implicated in lung cancer.")
    assert [e["match"] for e in ents] == ["EGFR"]
    assert ents[0]["entity_class"] == "gene"
    assert ents[0]["namespace"] == MODEL_NER_NAMESPACE
    assert ents[0]["start"] == 0 and ents[0]["end"] == 4


def test_kernel_strips_gene_suffix():
    ents = model_ner_entities("the COX2 gene is upregulated")
    # "COX2" tagged B-gene, "gene" is lowercase → O, suffix rule is a
    # no-op here but the match must be exactly COX2
    assert [e["match"] for e in ents] == ["COX2"]


def test_kernel_brca_slash():
    ents = model_ner_entities("BRCA1/2 are oncogenes.")
    assert [e["match"] for e in ents] == ["BRCA1/2"]
    s, e = ents[0]["start"], ents[0]["end"]
    assert "BRCA1/2 are oncogenes."[s:e] == "BRCA1/2"


def test_kernel_long_text_stride_consistency():
    """Entities found in a long multi-frame text match those found when
    the same sentence appears in a short text — the half-stride trim
    must not lose or duplicate mentions."""
    sent = "Expression of EGFR was elevated in tumor samples. "
    filler = "the quick brown fox jumps over the lazy dog again and again. "
    long_text = (filler * 20) + sent + (filler * 20)
    ents = model_ner_entities(long_text)
    matches = [e["match"] for e in ents]
    assert matches == ["EGFR"]
    e0 = ents[0]
    assert long_text[e0["start"] : e0["end"]] == "EGFR"


def test_kernel_many_mentions_long_text():
    """Every planted mention in a multi-frame doc is found exactly once
    with exact offsets."""
    import random

    rng = random.Random(7)
    genes = ["EGFR", "BRCA1", "TP53", "ERBB2", "KRAS"]
    words = []
    planted = []
    for i in range(600):
        if i % 37 == 5:
            g = rng.choice(genes)
            words.append(g)
            planted.append(g)
        else:
            words.append(rng.choice(["alpha", "beta", "delta", "tumor", "cells"]))
    text = " ".join(words)
    ents = model_ner_entities(text)
    assert [e["match"] for e in ents] == planted
    for e in ents:
        assert text[e["start"] : e["end"]] == e["match"]


def test_multi_frame_matches_single_frame():
    """Same text, tiny frames vs one big frame → identical entities."""
    sent = "Treatment with ABCD123 improved outcomes in many patients. "
    text = sent * 12
    small = DeterministicTransformerNer(max_sequence_length=32, stride=8)
    big = DeterministicTransformerNer(max_sequence_length=4096, stride=16)
    es, eb = small(text), big(text)
    assert [(e["start"], e["end"], e["match"]) for e in es] == [
        (e["start"], e["end"], e["match"]) for e in eb
    ]


def test_sparse_driver_matches_full_walk():
    """The kernel's sparse driver (labeled runs only) must equal the
    ported full per-word walk on real corpus docs."""
    from kazu_ray.sources.corpus import page_text_for_doc
    from kazu_ray.stages.token_ner import DeterministicTransformerNer

    ner = DeterministicTransformerNer()
    for doc_id in range(300):
        text = page_text_for_doc(doc_id)
        sparse = ner(text)
        words = ner.words_for_text(text)
        full = ner.processor(words, text, MODEL_NER_NAMESPACE) if words else []
        assert sparse == full, (doc_id, text)


def test_model_ner_env_seam_stub_default(monkeypatch):
    """With KAZU_TOKEN_NER_MODEL unset the singleton is the
    deterministic stub; the swap is config, not code."""
    import kazu_ray.stages.token_ner as tn

    monkeypatch.delenv("KAZU_TOKEN_NER_MODEL", raising=False)
    monkeypatch.setattr(tn, "_KERNEL", None)
    ents = tn.model_ner_entities("Treatment with ABCD123 improved outcomes")
    assert [e["match"] for e in ents] == ["ABCD123"]
    assert isinstance(tn._KERNEL, tn.DeterministicTransformerNer)
    assert not isinstance(tn._KERNEL, tn.TorchTransformerNer)
    monkeypatch.setattr(tn, "_KERNEL", None)


def test_torch_classifier_import_error_is_loud(monkeypatch, tmp_path):
    """Without torch the real-model path must fail with a clear
    ImportError naming the config knob (never a silent stub fallback —
    the user asked for a model and must know they didn't get one)."""
    import pytest

    try:
        import torch

        if hasattr(torch, "jit"):
            pytest.skip("real torch present: the import-error path cannot fire")
    except ImportError:
        pass

    import kazu_ray.stages.token_ner as tn

    with pytest.raises(ImportError, match="KAZU_TOKEN_NER_MODEL"):
        tn.TorchTokenClassifier(str(tmp_path / "model.pt"))

    monkeypatch.setenv("KAZU_TOKEN_NER_MODEL", str(tmp_path / "model.pt"))
    monkeypatch.setattr(tn, "_KERNEL", None)
    with pytest.raises(ImportError, match="KAZU_TOKEN_NER_MODEL"):
        tn.model_ner_entities("some text")
    monkeypatch.setattr(tn, "_KERNEL", None)


def test_torch_transformer_ner_with_real_checkpoint(tmp_path):
    """End-to-end real-model path: a tiny TorchScript token classifier
    (embedding → per-token logits) whose weights one-hot 'BRCA'-style
    pieces as B-gene must produce the same spans the machinery gives
    the stub. Skips cleanly when torch is absent (this container)."""
    import json

    import pytest

    torch = pytest.importorskip("torch")
    if not hasattr(torch, "jit"):
        pytest.skip("torch is the ref-shim stand-in, not real torch")

    import kazu_ray.stages.token_ner as tn

    vocab = {"[PAD]": 0, "[UNK]": 1, "BRCA": 2, "1": 3, "is": 4, "a": 5, "gene": 6}
    labels = ["O", "B-gene", "I-gene"]

    class Tiny(torch.nn.Module):
        def __init__(self):
            super().__init__()
            w = torch.zeros(len(vocab), len(labels))
            w[:, 0] = 5.0          # default: O
            w[2, :] = torch.tensor([0.0, 5.0, 0.0])  # BRCA -> B-gene
            w[3, :] = torch.tensor([0.0, 5.0, 0.0])  # piece '1' of BRCA1
            self.emb = torch.nn.Embedding.from_pretrained(w)

        def forward(self, ids, mask):
            return self.emb(ids)

    path = tmp_path / "tiny.pt"
    torch.jit.script(Tiny()).save(str(path))
    (tmp_path / "tiny.pt.json").write_text(
        json.dumps({"labels": labels, "vocab": vocab, "unk_id": 1, "pad_id": 0})
    )

    ner = tn.TorchTransformerNer(tn.TorchTokenClassifier(str(path)))
    ents = ner("BRCA1 is a gene")
    assert [(e["match"], e["entity_class"]) for e in ents] == [("BRCA1", "gene")]
