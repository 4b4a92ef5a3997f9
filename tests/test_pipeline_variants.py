"""All physical pipeline layouts must produce identical triples.

The engine exposes three execution shapes for the same semantics —
fused task pool (default), fused actor pool, and the four separate
stages — plus the flat-triples fast path. Any divergence between them
is a plumbing bug, so they are compared exactly (not at 0.95)."""

import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _triples(docs_or_triples, flat: bool):
    from kazu_ray.stages.materialize import explode_triples

    ds = docs_or_triples if flat else explode_triples(docs_or_triples)
    df = ds.to_pandas()
    return df.sort_values(["doc_id", "sent_idx", "subj", "pred", "obj"]).reset_index(
        drop=True
    )


@pytest.fixture(scope="module")
def store_ref(ray_session):
    from kazu_ray.pipelines.kg import broadcast_store

    return broadcast_store()


def test_variants_agree(store_ref):
    from kazu_ray.pipelines.kg import annotated_docs

    base = _triples(
        annotated_docs(SF_DIR, store_ref=store_ref, compute="tasks"), flat=False
    )
    flat = _triples(
        annotated_docs(SF_DIR, store_ref=store_ref, emit=("triples_flat",)), flat=True
    )
    actors = _triples(
        annotated_docs(SF_DIR, store_ref=store_ref, compute="actors", ner_concurrency=2),
        flat=False,
    )
    unfused = _triples(
        annotated_docs(SF_DIR, store_ref=store_ref, fused=False, ner_concurrency=2),
        flat=False,
    )
    for name, other in (("flat", flat), ("actors", actors), ("unfused", unfused)):
        pd.testing.assert_frame_equal(base, other, check_dtype=False), name


def test_sectioned_layout_agrees_on_single_section_docs(store_ref):
    """Fifth layout: the multi-section path (reference Document/Section
    shape) run over single-section docs must emit byte-identical triples
    to the flat-text path — the cross-section machinery (doc-wide
    mapping, global sentence numbering, per-section merge) must be a
    no-op at one section."""
    import pyarrow as pa

    from kazu_ray.pipelines.kg import annotated_docs
    from kazu_ray.sources.corpus import pages_dataset
    from kazu_ray.stages.extract import extract_docs
    from kazu_ray.stages.fused import make_annotate_sections_task
    from kazu_ray.stages.materialize import explode_triples

    base = _triples(
        annotated_docs(SF_DIR, store_ref=store_ref, compute="tasks"), flat=False
    )

    def to_sections(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sections": pa.array(
                    [[{"text": t}] for t in batch["text"].to_pylist()]
                ),
            }
        )

    docs = extract_docs(pages_dataset(SF_DIR)).map_batches(
        to_sections, batch_format="pyarrow"
    )
    sectioned = docs.map_batches(
        make_annotate_sections_task(store_ref), batch_format="pyarrow", batch_size=256
    )
    got = explode_triples(sectioned).to_pandas()
    got = got.sort_values(["doc_id", "sent_idx", "subj", "pred", "obj"]).reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(base, got, check_dtype=False)
