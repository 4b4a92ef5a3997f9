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
