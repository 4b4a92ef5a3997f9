"""Model-dependent optional steps — explicit stubs.

The reference ships several steps that require external model weights,
third-party model packages, or a JVM, none of which exist in this
environment. Each gets an explicit actor-pool-shaped stub here so the
operator inventory is honest about what is and isn't runnable: the
class documents the reference semantics, the batch/actor signature is
real, and calling it raises ``NotImplementedError`` naming the missing
dependency. ``transformer_ner_batch`` (``kazu_ray/stages/token_ner.py``) is the
runnable deterministic stand-in used by the default pipeline for the
model-NER slot.
"""

from __future__ import annotations

import pyarrow as pa


class _ModelStub:
    MISSING: str = ""
    REFERENCE: str = ""

    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            f"{type(self).__name__} requires {self.MISSING}, which is not "
            f"available in this environment. Reference semantics: {self.REFERENCE}. "
            "Use transformer_ner_batch (kazu_ray/stages/token_ner.py): the "
            "ported span-finder path with a deterministic "
            "model-NER stand-in."
        )

    def __call__(self, batch: pa.Table) -> pa.Table:  # pragma: no cover
        raise NotImplementedError


class TransformerNerStage(_ModelStub):
    """Token-classification NER with sliding-window tokenization and a
    BIO span-finder (``kazu/steps/ner/hf_token_classification.py:64-352``,
    ``kazu/steps/ner/tokenized_word_processor.py``). Would run as
    ``map_batches(TransformerNerStage, concurrency=(1,G), num_gpus=1,
    batch_size=B)``."""

    MISSING = "torch + transformers + TinyBERN2-class weights"
    REFERENCE = "hf_token_classification.py sliding window stride 16, max_seq 128"


class GlinerStage(_ModelStub):
    """Zero-shot NER over sentence batches with doc-level majority-vote
    conflict resolution (``kazu/steps/ner/gliner.py:126-318``)."""

    MISSING = "the gliner package and weights"
    REFERENCE = "gliner.py sentence batches + whole-doc conflict resolution"


class LlmNerStage(_ModelStub):
    """LLM-prompt NER with JSON parsing and automaton re-match
    (``kazu/steps/ner/llm_ner.py:194-291``)."""

    MISSING = "an LLM API endpoint (no network in this sandbox)"
    REFERENCE = "llm_ner.py free-text prompt → JSON → string re-match"


class SapbertEmbeddingStage(_ModelStub):
    """CLS-token embedding of (mention, candidate-label) pairs
    (``kazu/utils/sapbert.py:84-254``). The engine substitutes the
    deterministic char-ngram scorer in ``kazu_ray/lang/similarity.py``
    everywhere the reference consumes SapBERT cosine similarity."""

    MISSING = "torch + SapBERT weights"
    REFERENCE = "sapbert.py batched CLS embeddings"


class SethStage(_ModelStub):
    """Mutation NER via the SETH JVM gateway (``kazu/steps/ner/seth.py``)."""

    MISSING = "a JVM + py4j + SETH jar"
    REFERENCE = "seth.py py4j gateway per actor"


class OpsinStage(_ModelStub):
    """IUPAC→SMILES linking via the OPSIN JVM gateway
    (``kazu/steps/ner/opsin.py``)."""

    MISSING = "a JVM + py4j + OPSIN jar"
    REFERENCE = "opsin.py doc-level condition gate + JVM call"
