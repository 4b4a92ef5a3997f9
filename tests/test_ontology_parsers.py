"""Concrete ontology parser formats (OBO / Meddra asc / TSV) against
checked-in fixture files, ending in a cache build that feeds the real
annotation stage — the path a user bringing their own KB takes.

Reference parity: CellosaurusOntologyParser
(``kazu/ontology_preprocessing/parsers.py:1186-1263``),
MeddraOntologyParser (``parsers.py:1275-1428``), TabularOntologyParser
(``parsers.py:1519``)."""

from __future__ import annotations

import os

import pyarrow as pa

from kazu_ray.sources.ontology_tables import (
    build_caches_from_source,
    from_meddra_dir,
    from_obo,
    from_tsv,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_obo_cellosaurus_mode():
    """name-only, 'cell line' text stripped — the reference's
    Cellosaurus behaviour."""
    df = from_obo(
        os.path.join(FIXTURES, "cellosaurus_like.obo"),
        data_origin="cellosaurus",
        use_synonyms=False,
        remove_cell_line_text=True,
    )
    assert list(df.columns[:4]) == ["idx", "default_label", "syn", "mapping_type"]
    by_id = df.set_index("idx")
    assert by_id.loc["CVCL_0001", "syn"] == "HEL"
    assert by_id.loc["CVCL_0003", "syn"] == "HeLa"
    assert (df["mapping_type"] == "name").all()
    assert len(df) == 3


def test_obo_with_synonyms():
    df = from_obo(
        os.path.join(FIXTURES, "cellosaurus_like.obo"), data_origin="obo"
    )
    hl60 = df[df["idx"] == "CVCL_0002"]
    assert set(hl60["syn"]) == {"HL-60", "HL 60", "Human promyelocytic leukemia cells"}
    assert set(hl60["mapping_type"]) == {"name", "RELATED", "EXACT"}
    # synonym rows inherit the term's default label
    assert (hl60["default_label"] == "HL-60").all()


def test_meddra_dir():
    df = from_meddra_dir(FIXTURES, data_origin="meddra")
    # excluded SOC (Surgical and medical procedures) drops the biopsy PT
    assert "10000002" not in set(df["idx"])
    assert "Biopsy" not in set(df["syn"])
    # PT rows + LLT synonyms
    headache = df[df["idx"] == "10000001"]
    assert set(headache["syn"]) == {"Headache disorder", "Head pain", "Cephalalgia"}
    assert (headache["default_label"] == "Headache disorder").all()
    # HLT / HLGT rows present, deduplicated
    assert (df["idx"] == "20000001").sum() == 1
    assert (df["idx"] == "30000001").sum() == 1
    assert (df["mapping_type"] == "meddra_link").all()


def test_tsv():
    df = from_tsv(os.path.join(FIXTURES, "drugs.tsv"), data_origin="tabular")
    assert len(df) == 3
    aspirin = df[df["idx"] == "D001"]
    assert set(aspirin["syn"]) == {"aspirin", "acetylsalicylic acid"}


def test_obo_cache_build_feeds_pipeline(tmp_path):
    """Full path: OBO fixture → canonical DF → cache build → store →
    annotation stage finds the OBO terms in text."""
    from kazu_ray.stages.fused import AnnotateStage
    from kazu_ray.state.store import load_store

    df = from_obo(
        os.path.join(FIXTURES, "cellosaurus_like.obo"),
        data_origin="cellosaurus",
        use_synonyms=False,
        remove_cell_line_text=True,
    )
    cache_dir = str(tmp_path / "cache")
    build_caches_from_source(df, "cellosaurus_like", "cell_line", "cellosaurus", cache_dir)
    store = load_store(cache_dir)
    assert (store.ner_terms["parser_name"] == "cellosaurus_like").any()

    stage = AnnotateStage(cache_dir, with_model_ner=False)
    batch = pa.table(
        {
            "doc_id": ["d1"],
            "text": pa.array(
                ["The HeLa cells were cultured overnight."], type=pa.large_string()
            ),
        }
    )
    out = stage(batch)
    import json

    ents = json.loads(out["ents_json"][0].as_py())
    matches = {e["match"] for e in ents}
    assert "HeLa" in matches
    cell_line_ents = [e for e in ents if e["entity_class"] == "cell_line"]
    assert cell_line_ents


def test_ntriples_rdf_parser():
    """RDFGraphParser semantics without rdflib: uri_regex gate, label
    predicate, synonym predicates with IRI mapping types
    (parsers.py:467-620)."""
    from kazu_ray.sources.ontology_tables import OBO_EXACT_SYNONYM, RDFS_LABEL, from_ntriples

    df = from_ntriples(
        os.path.join(FIXTURES, "clo_like.nt"),
        data_origin="clo",
        uri_regex=r"^http://purl\.obolibrary\.org/obo/CLO_[0-9]+$",
    )
    # excluded-by-regex and label-less subjects are absent
    assert not any("not_clo" in i for i in df["idx"])
    assert "http://purl.obolibrary.org/obo/CLO_0000003" not in set(df["idx"])
    hela = df[df["idx"] == "http://purl.obolibrary.org/obo/CLO_0000002"]
    assert set(hela["syn"]) == {
        "HeLa cell",
        "HeLa",
        'Henrietta Lacks cells with "quotes"',
    }
    # definition predicate is NOT a synonym predicate
    assert "A definition, not a synonym" not in set(df["syn"])
    # mapping types carry the predicate IRIs, like the reference
    assert set(hela["mapping_type"]) == {RDFS_LABEL, OBO_EXACT_SYNONYM}
    assert (hela["default_label"] == "HeLa cell").all()
