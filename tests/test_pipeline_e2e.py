"""End-to-end acceptance: Ray pipeline vs single-process oracle.

Mirrors the reference's acceptance-test pattern
(``kazu/annotation/acceptance_test.py:40-134``): run the full pipeline
and score its outputs against gold. Gold here is the driver-side oracle
(same kernels, sequential fold) — the comparison validates the
distributed plumbing. Gates per BASELINE.md: triple P/R ≥ 0.95,
byte-identical text hashes.
"""

import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracle_out():
    from kazu_ray.pipelines.oracle import oracle_run

    return oracle_run(SF_DIR)


@pytest.fixture(scope="module")
def ray_out(ray_session):
    from kazu_ray.pipelines.kg import annotated_docs, broadcast_store
    from kazu_ray.stages.materialize import explode_entities, explode_triples

    store_ref = broadcast_store()
    docs = annotated_docs(SF_DIR, store_ref=store_ref).materialize()
    ents = explode_entities(docs).to_pandas()
    triples = explode_triples(docs).to_pandas()
    return ents, triples


def test_triple_pr_gate(oracle_out, ray_out):
    _, gold_triples, _ = oracle_out
    _, triples = ray_out
    gold = set(map(tuple, gold_triples[["subj", "pred", "obj", "doc_id", "sent_idx"]].values))
    pred = set(map(tuple, triples[["subj", "pred", "obj", "doc_id", "sent_idx"]].values))
    tp = len(gold & pred)
    precision = tp / max(1, len(pred))
    recall = tp / max(1, len(gold))
    assert precision >= 0.95, f"precision {precision}"
    assert recall >= 0.95, f"recall {recall}"


def test_entity_set_equality(oracle_out, ray_out):
    gold_ents, _, _ = oracle_out
    ents, _ = ray_out
    gold = set(
        map(tuple, gold_ents[["url", "start", "end", "entity_class", "canonical_id"]].values)
    )
    pred = set(
        map(
            tuple,
            ents.assign(canonical_id=ents.mapping_source.str.cat(ents.mapping_idx, sep=":"))[
                ["doc_id", "start", "end", "entity_class", "canonical_id"]
            ].fillna({"canonical_id": ""}).replace({"canonical_id": {"": None}}).values,
        )
    )
    # allow tiny divergence (entity-level gate is stricter than triple gate)
    inter = len(gold & pred)
    assert inter / max(1, len(gold)) >= 0.95
    assert inter / max(1, len(pred)) >= 0.95


def test_text_hash_invariant(oracle_out, ray_session):
    """Every extracted text must hash identically in the Ray path."""
    from kazu_ray.pipelines.kg import broadcast_store
    from kazu_ray.sources.corpus import pages_dataset
    from kazu_ray.stages.extract import extract_docs

    _, _, gold_hashes = oracle_out
    docs = extract_docs(pages_dataset(SF_DIR), lang=None)
    got = docs.to_pandas()[["url", "text_sha256"]]
    got["text_sha256"] = got["text_sha256"].map(lambda b: b.hex())
    merged = gold_hashes.merge(got, on="url", suffixes=("_gold", "_ray"))
    assert len(merged) == len(gold_hashes)
    assert (merged.text_sha256_gold == merged.text_sha256_ray).all()


def test_entry_contract(ray_session):
    import __ray_entry__ as entrymod

    result = entrymod.entry()
    import ray.data

    if isinstance(result, ray.data.Dataset):
        assert result.count() >= 0
    else:
        assert len(result) >= 0
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) > 0


def test_acceptance_scorer_gate(oracle_out, ray_out):
    """Per-class soft-span acceptance (reference acceptance_test.py
    mechanism): Ray output vs oracle gold must clear 0.95 on every
    NER/linking metric for every class."""
    from kazu_ray.pipelines.acceptance import check_acceptance, score_entities

    gold_ents, _, _ = oracle_out
    ents, _ = ray_out
    gold = gold_ents.rename(columns={"url": "doc_id"}).assign(
        mapping_source=gold_ents.canonical_id.str.split(":").str[0],
        mapping_idx=gold_ents.canonical_id.str.split(":").str[1],
        mapping_label="",
    )
    test = ents.assign(mapping_label="")
    scores = score_entities(gold, test)
    assert scores, "no classes scored"
    failures = check_acceptance(scores, default_threshold=0.95)
    assert not failures, failures
