"""Human-curation merge path (``curation_utils.py:638-701`` semantics):
human-override jsonl merged over the autocurated resource set during
the cache build, end to end into the annotation stage."""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa
import pytest

from kazu_ray.ontology.build import build_parser_caches


def _source_df():
    return pd.DataFrame(
        {
            "idx": ["D1", "D1", "D2"],
            "default_label": ["alpha syndrome", "alpha syndrome", "beta fever"],
            "syn": ["alpha syndrome", "AS", "beta fever"],
            "mapping_type": ["name", "abbrev", "name"],
            "data_origin": "test",
        }
    )


def _write_curations(tmp_path, records):
    p = tmp_path / "curations.jsonl"
    with open(p, "w") as f:
        for rec in records:
            f.write(json.dumps(rec) + "\n")
    return str(p)


def test_human_override_drops_synonym(tmp_path):
    """A DROP_FOR_LINKING curation removes the term from both the
    synonym (linking) table and the NER surface table."""
    cur = _write_curations(
        tmp_path,
        [
            {
                "original_synonyms": [{"text": "beta fever"}],
                "behaviour": "DROP_FOR_LINKING",
            }
        ],
    )
    meta, syns, ner = build_parser_caches(
        _source_df(), "p1", "disease", "TESTKB", curations_path=cur
    )
    assert "BETA FEVER" not in set(syns["synonym_norm"])
    assert "beta fever" not in set(ner["term"])
    # untouched terms survive
    assert "alpha syndrome" in set(ner["term"])


def test_human_override_confidence_and_case(tmp_path):
    """A human curation replaces the autocurated flags for its
    syn_norm (human wins)."""
    cur = _write_curations(
        tmp_path,
        [
            {
                "original_synonyms": [
                    {"text": "AS", "case_sensitive": True, "mention_confidence": 100}
                ],
                "behaviour": "ADD_FOR_NER_AND_LINKING",
            }
        ],
    )
    _, _, ner = build_parser_caches(
        _source_df(), "p1", "disease", "TESTKB", curations_path=cur
    )
    row = ner[ner["term"] == "AS"].iloc[0]
    assert bool(row["case_sensitive"]) is True
    assert int(row["confidence"]) == 100


def test_additional_to_source_adds_new_surface(tmp_path):
    """An additional_to_source curation introduces a brand-new surface
    mapped to existing ids via associated_idx."""
    cur = _write_curations(
        tmp_path,
        [
            {
                "original_synonyms": [{"text": "alpha sickness"}],
                "behaviour": "ADD_FOR_NER_AND_LINKING",
                "additional_to_source": True,
                "associated_idx": ["D1"],
            }
        ],
    )
    meta, syns, ner = build_parser_caches(
        _source_df(), "p1", "disease", "TESTKB", curations_path=cur
    )
    assert "alpha sickness" in set(ner["term"])
    cand_row = syns[syns["synonym_norm"] == ner[ner["term"] == "alpha sickness"]["synonym_norm"].iloc[0]]
    assert len(cand_row) == 1
    assert "D1" in cand_row["candidate_json"].iloc[0]


def test_obsolete_curation_ignored(tmp_path):
    """A curation whose synonym no longer exists in the source (and is
    not additional) is dropped, not applied."""
    cur = _write_curations(
        tmp_path,
        [
            {
                "original_synonyms": [{"text": "gamma plague"}],
                "behaviour": "ADD_FOR_NER_AND_LINKING",
            }
        ],
    )
    _, syns, ner = build_parser_caches(
        _source_df(), "p1", "disease", "TESTKB", curations_path=cur
    )
    assert "gamma plague" not in set(ner["term"])


def test_curated_cache_feeds_annotation(tmp_path):
    """End to end: curated build → store → annotation stage honours the
    human-added surface and the dropped one."""
    from kazu_ray.sources.ontology_tables import build_caches_from_source
    from kazu_ray.stages.fused import AnnotateStage

    cur = _write_curations(
        tmp_path,
        [
            {
                "original_synonyms": [{"text": "alpha sickness"}],
                "behaviour": "ADD_FOR_NER_AND_LINKING",
                "additional_to_source": True,
                "associated_idx": ["D1"],
            },
            {
                "original_synonyms": [{"text": "beta fever"}],
                "behaviour": "DROP_FOR_LINKING",
            },
        ],
    )
    cache_dir = str(tmp_path / "cache")
    build_caches_from_source(
        _source_df(), "p1", "disease", "TESTKB", cache_dir, curations_path=cur
    )
    stage = AnnotateStage(cache_dir, with_model_ner=False)
    batch = pa.table(
        {
            "doc_id": ["d"],
            "text": pa.array(
                ["Patients with alpha sickness and beta fever recovered."],
                type=pa.large_string(),
            ),
        }
    )
    out = stage(batch)
    ents = json.loads(out["ents_json"][0].as_py())
    matches = {e["match"] for e in ents}
    assert "alpha sickness" in matches
    assert "beta fever" not in matches


def test_add_for_linking_only_behaviour(tmp_path):
    """ADD_FOR_LINKING_ONLY (the reference's third OntologyStringBehaviour,
    kazu/data/__init__.py:675-684): the term stays a linking target but
    contributes NO NER surface."""
    cur = _write_curations(
        tmp_path,
        [
            {
                "original_synonyms": [{"text": "beta fever"}],
                "behaviour": "ADD_FOR_LINKING_ONLY",
            }
        ],
    )
    meta, syns, ner = build_parser_caches(
        _source_df(), "test_parser", "disease", "TEST", curations_path=cur
    )
    from kazu_ray.lang import normalizer

    norm = normalizer.normalize("beta fever", "disease")
    # still a linking candidate ...
    assert norm in set(syns["synonym_norm"])
    # ... but no NER surface for it
    assert "beta fever" not in set(ner["term"] if "term" in ner.columns else ner.iloc[:, 2])
    # the untouched resource keeps its NER surfaces
    assert any("alpha" in t for t in (ner["term"] if "term" in ner.columns else ner.iloc[:, 2]))
