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


def test_chembl_sqlite_parser(tmp_path):
    """ChemblOntologyParser SQL semantics (parsers.py:1098-1129): synonym
    join unioned with pref_name rows, null pref_names dropped, exact
    duplicates collapsed — against an in-test sqlite fixture."""
    import sqlite3

    from kazu_ray.sources.ontology_tables import from_chembl_sqlite

    db = str(tmp_path / "chembl.db")
    conn = sqlite3.connect(db)
    conn.executescript(
        """
        CREATE TABLE molecule_dictionary (molregno INTEGER, chembl_id TEXT, pref_name TEXT);
        CREATE TABLE molecule_synonyms (molregno INTEGER, synonyms TEXT, syn_type TEXT);
        INSERT INTO molecule_dictionary VALUES
            (1, 'CHEMBL25', 'ASPIRIN'),
            (2, 'CHEMBL112', 'PARACETAMOL'),
            (3, 'CHEMBL999', NULL);
        INSERT INTO molecule_synonyms VALUES
            (1, 'acetylsalicylic acid', 'TRADE_NAME'),
            (1, 'ASA', 'OTHER'),
            (1, 'ASA', 'OTHER'),
            (2, 'acetaminophen', 'OTHER'),
            (3, 'orphan syn', 'OTHER');
        """
    )
    conn.commit()
    conn.close()

    df = from_chembl_sqlite(db, data_origin="chembl")
    # null-pref_name molecule fully dropped (its synonym too)
    assert "CHEMBL999" not in set(df["idx"])
    asp = df[df["idx"] == "CHEMBL25"]
    assert set(asp["syn"]) == {"acetylsalicylic acid", "ASA", "ASPIRIN"}
    # duplicate synonym row collapsed
    assert len(asp[asp["syn"] == "ASA"]) == 1
    # pref_name row carries its own mapping type
    assert set(asp[asp["syn"] == "ASPIRIN"]["mapping_type"]) == {"pref_name"}
    assert (asp["default_label"] == "ASPIRIN").all()


def test_opentargets_disease_jsonl_parser():
    """OpenTargetsDiseaseOntologyParser record semantics
    (parsers.py:226-260): therapeutic-area gate, name + hasExactSynonym
    rows only, dbXRefs carried (plus the id's ':' form)."""
    import json as _json

    from kazu_ray.sources.ontology_tables import from_opentargets_disease_jsonl

    df = from_opentargets_disease_jsonl(
        os.path.join(FIXTURES, "opentargets_disease_like.jsonl"),
        data_origin="opentargets",
        allowed_therapeutic_areas=("MONDO_0024458",),
    )
    # diabetes record is outside the allowed therapeutic areas
    assert "MONDO_0005148" not in set(df["idx"])
    asthma = df[df["idx"] == "MONDO_0004979"]
    # related synonyms ignored, like the reference
    assert "wheeze" not in set(asthma["syn"])
    assert set(asthma["syn"]) == {"asthma", "bronchial asthma", "asthma bronchiale"}
    assert set(asthma["mapping_type"]) == {"name", "hasExactSynonym"}
    xrefs = set(_json.loads(asthma["xrefs"].iloc[0]))
    # reference fixup: the record's own id in ':' form joins its dbXRefs
    assert xrefs == {"DOID:2841", "MeSH:D001249", "MONDO:0004979"}
    # record with no synonyms/xrefs still yields its name row
    covid = df[df["idx"] == "MONDO_0100096"]
    assert set(covid["syn"]) == {"COVID-19"}


def test_xref_id_grouping():
    """OpenTargets xref grouping strategy (parsers.py:158-222): shared
    xref ⇒ one equivalent-id set; inconsistent xref overlap ⇒ fall back
    to similarity; xref-less ids stay singletons."""
    from kazu_ray.ontology.build import score_and_group_ids_by_xref

    labels = {"MONDO_1": "asthma", "EFO_1": "asthma disorder", "ORPHA_1": "rare thing"}
    xrefs = {
        "MONDO_1": frozenset({"DOID:2841", "MONDO:1"}),
        "EFO_1": frozenset({"DOID:2841"}),
        "ORPHA_1": frozenset({"ORPHA:1"}),
    }
    ids = {("MONDO_1", "OT"), ("EFO_1", "OT"), ("ORPHA_1", "OT")}
    sets, agg = score_and_group_ids_by_xref(ids, True, labels, xrefs)
    assert agg == "RESOLVED_BY_XREF"
    as_sets = {frozenset(i for i, _ in s) for s in sets}
    assert frozenset({"MONDO_1", "EFO_1"}) in as_sets
    assert frozenset({"ORPHA_1"}) in as_sets

    # inconsistent: A∩B and B∩C through different xrefs, overlapping
    # groups → reference falls back to the default strategy
    xrefs_bad = {
        "MONDO_1": frozenset({"X:1"}),
        "EFO_1": frozenset({"X:1", "Y:2"}),
        "ORPHA_1": frozenset({"Y:2"}),
    }
    sets2, agg2 = score_and_group_ids_by_xref(ids, True, labels, xrefs_bad)
    assert agg2 in ("RESOLVED_BY_SIMILARITY", "MERGED_AS_NON_SYMBOLIC", "UNAMBIGUOUS")

    # single id short-circuits to the default path
    sets3, agg3 = score_and_group_ids_by_xref({("MONDO_1", "OT")}, True, labels, xrefs)
    assert agg3 == "UNAMBIGUOUS"


def test_rdf_xml_owl_parser():
    """RDFGraphParser semantics over the RDF/XML serialization OBO
    ontologies ship (.owl): uri_regex gate, label requirement, synonym
    predicates as mapping types, XML entity unescaping, striped-syntax
    nesting, reification blocks ignored."""
    from kazu_ray.sources.ontology_tables import OBO_EXACT_SYNONYM, RDFS_LABEL, from_rdf_xml

    df = from_rdf_xml(
        os.path.join(FIXTURES, "clo_like.owl"),
        data_origin="clo",
        uri_regex=r"^http://purl\.obolibrary\.org/obo/CLO_[0-9]+$",
    )
    assert not any("not_clo" in i for i in df["idx"])
    # label-less subject contributes nothing
    assert "http://purl.obolibrary.org/obo/CLO_0000003" not in set(df["idx"])
    hela = df[df["idx"] == "http://purl.obolibrary.org/obo/CLO_0000002"]
    assert set(hela["syn"]) == {
        "HeLa cell",
        "HeLa",
        'Henrietta Lacks cells with "quotes"',
    }
    assert "A definition, not a synonym" not in set(df["syn"])
    assert set(hela["mapping_type"]) == {RDFS_LABEL, OBO_EXACT_SYNONYM}
    # reification comment creates no rows
    assert "reification block: must not create rows" not in set(df["syn"])
    # node element nested inside a restriction is still parsed
    nested = df[df["idx"] == "http://purl.obolibrary.org/obo/CLO_0000005"]
    assert set(nested["syn"]) == {"nested node element"}
    # parity with the N-Triples reader over the same logical graph
    from kazu_ray.sources.ontology_tables import from_ntriples

    nt = from_ntriples(
        os.path.join(FIXTURES, "clo_like.nt"),
        data_origin="clo",
        uri_regex=r"^http://purl\.obolibrary\.org/obo/CLO_[0-9]+$",
    )
    merged = df[df["idx"] == "http://purl.obolibrary.org/obo/CLO_0000002"]
    assert set(merged["syn"]) == set(nt[nt["idx"] == "http://purl.obolibrary.org/obo/CLO_0000002"]["syn"])


def test_opentargets_target_jsonl_parser():
    """OpenTargetsTargetOntologyParser semantics (parsers.py:373-421):
    biotype exclusion, no-approved-symbol skip, annotation_score from
    non-empty annotation fields, label-or-id synonym records with their
    source as mapping type, approvedSymbol/Name/id rows."""
    from kazu_ray.sources.ontology_tables import from_opentargets_target_jsonl

    df = from_opentargets_target_jsonl(
        os.path.join(FIXTURES, "opentargets_target_like.jsonl"),
        excluded_biotypes=("rRNA",),
    )
    # excluded biotype and symbol-less record both dropped
    assert "ENSG00000999999" not in set(df["idx"])
    assert "ENSG00000284917" not in set(df["idx"])
    braf = df[df["idx"] == "ENSG00000157764"]
    assert set(braf["syn"]) == {
        "BRAF1", "BRAF-old", "P15056", "BRAF",
        "B-Raf proto-oncogene, serine/threonine kinase", "ENSG00000157764",
    }
    by_syn = braf.set_index("syn")
    assert by_syn.loc["BRAF1", "mapping_type"] == "HGNC"
    assert by_syn.loc["P15056", "mapping_type"] == "uniprot_swissprot"
    assert by_syn.loc["ENSG00000157764", "mapping_type"] == "opentargets_id"
    # two non-empty annotation fields (go, pathways) → score 2
    assert (braf["annotation_score"] == 2).all()
    assert (braf["default_label"] == "BRAF").all()


def test_opentargets_molecule_jsonl_parser():
    """OpenTargetsMoleculeOntologyParser semantics (parsers.py:424-456):
    name joins the synonyms list; trade names get their own type."""
    from kazu_ray.sources.ontology_tables import from_opentargets_molecule_jsonl

    df = from_opentargets_molecule_jsonl(
        os.path.join(FIXTURES, "opentargets_molecule_like.jsonl")
    )
    asp = df[df["idx"] == "CHEMBL25"]
    assert set(asp[asp["mapping_type"] == "synonyms"]["syn"]) == {
        "Acetylsalicylic acid", "ASA", "ASPIRIN",
    }
    assert set(asp[asp["mapping_type"] == "tradeNames"]["syn"]) == {"Aspro", "Disprin"}
    par = df[df["idx"] == "CHEMBL112"]
    assert set(par["syn"]) == {"PARACETAMOL"}


def test_gene_ontology_parser_namespaces_and_obsolete(tmp_path):
    """GeneOntologyParser quirks (parsers.py:678-898): per-namespace
    include patterns + 'obsolete' default-label exclusion + GO
    uri_regex; fixture → cache → annotate end-to-end."""
    import json

    from kazu_ray.sources.ontology_tables import from_gene_ontology
    from kazu_ray.stages.fused import AnnotateStage
    from kazu_ray.state.store import load_store

    path = os.path.join(FIXTURES, "go_like.nt")
    # unfiltered: obsolete dropped, non-GO subject dropped
    df_all = from_gene_ontology(path)
    idxs = set(df_all["idx"])
    assert "http://purl.obolibrary.org/obo/GO_0000005" not in idxs  # obsolete
    assert not any("not_go" in i for i in idxs)
    assert len(idxs) == 3
    # namespace filtering = the BiologicalProcess/MolecularFunction/
    # CellularComponent subclasses (parsers.py:806-813)
    df_bp = from_gene_ontology(path, namespace="biological_process")
    assert set(df_bp["idx"]) == {"http://purl.obolibrary.org/obo/GO_0000001"}
    assert "mitochondrial inheritance" in set(df_bp["syn"])
    df_mf = from_gene_ontology(path, namespace="molecular_function")
    # obsolete exclusion applies inside the namespace too
    assert set(df_mf["idx"]) == {"http://purl.obolibrary.org/obo/GO_0003674"}

    # cache build → annotation finds the BP synonym
    cache_dir = str(tmp_path / "cache")
    build_caches_from_source(df_bp, "go_bp", "biological_process", "GO", cache_dir)
    store = load_store(cache_dir)
    assert (store.ner_terms["parser_name"] == "go_bp").any()
    stage = AnnotateStage(cache_dir, with_model_ner=False)
    out = stage(
        pa.table(
            {
                "doc_id": ["d1"],
                "text": pa.array(
                    ["Evidence of mitochondrial inheritance was found."],
                    type=pa.large_string(),
                ),
            }
        )
    )
    ents = json.loads(out["ents_json"][0].as_py())
    assert any(
        e["match"] == "mitochondrial inheritance"
        and e["entity_class"] == "biological_process"
        for e in ents
    )


def test_hgnc_gene_family_parser(tmp_path):
    """HGNCGeneFamilyParser quirks (parsers.py:1477-1517): group by
    Family ID, unique Family name asserted, alias + common-root-symbol
    columns as synonym rows with the column name as mapping_type;
    fixture → cache → annotate end-to-end."""
    import json

    from kazu_ray.sources.ontology_tables import from_hgnc_gene_family_tsv
    from kazu_ray.stages.fused import AnnotateStage
    from kazu_ray.state.store import load_store

    df = from_hgnc_gene_family_tsv(os.path.join(FIXTURES, "hgnc_gene_families.tsv"))
    fam1 = df[df["idx"] == "1"]
    assert (fam1["default_label"] == "Annexins").all()
    assert set(fam1["syn"]) == {"Annexins", "Lipocortins", "Annexin family", "ANXA"}
    assert set(fam1[fam1["syn"] == "ANXA"]["mapping_type"]) == {"Common root gene symbol"}
    assert set(fam1[fam1["syn"] == "Lipocortins"]["mapping_type"]) == {"Family alias"}
    # family 2 has no common root symbol, one alias; NaN cells dropped
    fam2 = df[df["idx"] == "2"]
    assert set(fam2["syn"]) == {"Zinc fingers", "ZNF proteins"}
    # the per-family Approved symbol column is NOT a synonym source
    assert "ANXA1" not in set(df["syn"])

    cache_dir = str(tmp_path / "cache")
    build_caches_from_source(df, "hgnc_family", "gene_family", "HGNC_GENE_FAMILY", cache_dir)
    store = load_store(cache_dir)
    assert (store.ner_terms["parser_name"] == "hgnc_family").any()
    stage = AnnotateStage(cache_dir, with_model_ner=False)
    out = stage(
        pa.table(
            {
                "doc_id": ["d1"],
                "text": pa.array(
                    ["The Lipocortins are calcium-dependent proteins."],
                    type=pa.large_string(),
                ),
            }
        )
    )
    ents = json.loads(out["ents_json"][0].as_py())
    assert any(
        e["match"] == "Lipocortins" and e["entity_class"] == "gene_family"
        for e in ents
    )


def test_mondo_obograph_json_parser():
    """MondoOntologyParser parity (``parsers.py:940-995``): OBO-graphs
    JSON; only MONDO/HP purls; unlabeled nodes skipped; only
    hasExactSynonym scope kept."""
    from kazu_ray.sources.ontology_tables import from_obograph_json

    df = from_obograph_json(os.path.join(FIXTURES, "mondo_like.json"))
    ids = set(df["idx"])
    # CHEBI purl and suffixed/unlabeled MONDO nodes are excluded
    assert not any("CHEBI" in i for i in ids)
    assert "http://purl.obolibrary.org/obo/MONDO_0000001" not in ids
    assert "http://purl.obolibrary.org/obo/MONDO_0004979/extra" not in ids
    asthma = df[df["idx"] == "http://purl.obolibrary.org/obo/MONDO_0004979"]
    # label row + exact synonym; related synonym dropped
    assert set(asthma["syn"]) == {"asthma", "bronchial asthma"}
    assert set(asthma["mapping_type"]) == {"lbl", "hasExactSynonym"}
    assert (asthma["default_label"] == "asthma").all()
    # HP node with no synonyms still contributes its label
    hp = df[df["idx"] == "http://purl.obolibrary.org/obo/HP_0002099"]
    assert list(hp["syn"]) == ["Asthma attack"]


def test_cellosaurus_obo_parser_and_one_id_set_per_id(tmp_path):
    """CellosaurusOntologyParser parity (``parsers.py:1186-1275``):
    id/name lines only, 'cell line' stripped, synonym lines ignored;
    cache build with one_id_set_per_id keeps ambiguous ids separate."""
    import json as _json

    from kazu_ray.sources.ontology_tables import from_cellosaurus_obo

    df = from_cellosaurus_obo(os.path.join(FIXTURES, "cellosaurus_like.obo"))
    by_id = df.set_index("idx")
    assert by_id.loc["CVCL_0001", "syn"] == "HEL"
    assert by_id.loc["CVCL_0003", "syn"] == "HeLa"
    # synonym: lines are NOT read in this parser
    assert "HL 60" not in set(df["syn"])
    assert (df["mapping_type"] == "name").all()

    # two distinct cell lines sharing a name must stay separate id sets
    import pandas as pd

    amb = pd.concat(
        [df, pd.DataFrame([{
            "idx": "CVCL_9999", "default_label": "HeLa", "syn": "HeLa",
            "mapping_type": "name", "data_origin": "cellosaurus",
            "annotation_score": 0,
        }])],
        ignore_index=True,
    )
    cache_dir = str(tmp_path / "cache")
    build_caches_from_source(
        amb, "cellosaurus", "cell_line", "CELLOSAURUS", cache_dir,
        one_id_set_per_id=True,
    )
    syns = pd.read_parquet(os.path.join(cache_dir, "synonyms.parquet"))
    row = syns[syns["synonym_norm"].str.contains("HELA", case=False)]
    assert len(row) == 1
    cand = _json.loads(row["candidate_json"].iloc[0])
    id_sets = cand["associated_id_sets"]
    # one singleton set per id, not one merged/ambiguous set
    assert len(id_sets) == 2
    assert all(len(s) == 1 for s in id_sets)
    assert {s[0][0] for s in id_sets} == {"CVCL_0003", "CVCL_9999"}
    assert cand["aggregated_by"] == "CUSTOM"


def test_atc_classification_parser():
    """ATCDrugClassificationParser parity (``parsers.py:1594-1661``):
    5-space sep, first char of merged field = level (mapping_type),
    levels 1-3 dropped."""
    from kazu_ray.sources.ontology_tables import from_atc_classification

    df = from_atc_classification(os.path.join(FIXTURES, "atc_like.txt"))
    ids = set(df["idx"])
    # levels 1-3 (anatomical/therapeutic groups) are dropped
    assert {"A", "A02", "A02B"}.isdisjoint(ids)
    assert {"A02BC", "A02BC01", "N02BA01"} <= ids
    omep = df[df["idx"] == "A02BC01"]
    assert list(omep["syn"]) == ["omeprazole"]
    assert list(omep["mapping_type"]) == ["5"]
    ppi = df[df["idx"] == "A02BC"]
    assert list(ppi["default_label"]) == ["Proton pump inhibitors"]
    assert list(ppi["mapping_type"]) == ["4"]


def test_skosxl_ntriples_parser():
    """SKOSXLGraphParser parity (``parsers.py:630-676``): labels live on
    intermediate skosxl:Label nodes reached by 2-hop paths."""
    from kazu_ray.sources.ontology_tables import from_skosxl

    df = from_skosxl(
        os.path.join(FIXTURES, "skosxl_like.nt"),
        data_origin="skosxl",
        uri_regex=r"^http://example.org/kb/C[0-9]+$",
    )
    c1 = df[df["idx"] == "http://example.org/kb/C001"]
    assert (c1["default_label"] == "hypertension").all()
    assert set(c1["syn"]) == {"hypertension", "high blood pressure", "HTN"}
    # mapping_type is the path notation p1/p2
    alt = c1[c1["syn"] == "HTN"]["mapping_type"].iloc[0]
    assert alt.endswith("altLabel/http://www.w3.org/2008/05/skos-xl#literalForm")
    # uri_regex excludes the non-kb subject; an entity without a pref
    # label contributes nothing (reference: subjects need a label triple)
    assert "http://example.org/other/X9" not in set(df["idx"])
    assert "http://example.org/kb/C003" not in set(df["idx"])
    assert set(df["idx"]) == {
        "http://example.org/kb/C001", "http://example.org/kb/C002"
    }


def test_skosxl_rdf_xml_parser():
    """The RDF/XML serialization of the same shape: anonymous nested
    Label nodes, rdf:nodeID blanks, and rdf:resource references all
    resolve through the 2-hop path."""
    from kazu_ray.sources.ontology_tables import from_skosxl

    df = from_skosxl(
        os.path.join(FIXTURES, "skosxl_like.rdf"),
        data_origin="skosxl",
        uri_regex=r"^http://example.org/kb/C[0-9]+$",
    )
    c1 = df[df["idx"] == "http://example.org/kb/C001"]
    assert set(c1["syn"]) == {"hypertension", "high blood pressure", "HTN"}
    c2 = df[df["idx"] == "http://example.org/kb/C002"]
    assert set(c2["syn"]) == {"migraine"}


def test_hgnc_complete_set_parser():
    """HGNCGeneOntologyParser parity (``parsers.py:996-1095``)."""
    from kazu_ray.sources.ontology_tables import from_hgnc_complete_set_json

    df = from_hgnc_complete_set_json(
        os.path.join(FIXTURES, "hgnc_complete_set_like.json")
    )
    # docs without ensembl_gene_id or name are skipped entirely
    assert set(df["idx"]) == {"ENSG00000121410", "ENSG00000268895"}
    a1bg = df[df["idx"] == "ENSG00000121410"]
    assert (a1bg["default_label"] == "alpha-1-B glycoprotein").all()
    assert {"A1B", "ABG", "A1BG", "P04217", "HGNC:5", "NM_130786",
            "alpha-1-B glycoprotein"} <= set(a1bg["syn"])
    # scalar (non-list) synonym values are wrapped, not iterated charwise
    as1 = df[df["idx"] == "ENSG00000268895"]
    assert "FLJ23569" in set(as1["syn"])
    assert set(as1[as1["syn"] == "FLJ23569"]["mapping_type"]) == {"alias_symbol"}


def test_rdf_presets_and_find_kb(tmp_path):
    """Uberon/CLO/CL/Stato/HP preset configs (``parsers.py:899-938,
    1147-1184, 1432-1475, 1663-1760``) and per-id kb resolution
    (``find_kb``) through the cache build."""
    import json as _json

    import pandas as pd

    from kazu_ray.ontology.build import build_parser_caches
    from kazu_ray.sources.ontology_tables import RDF_PARSER_PRESETS, from_rdf_preset

    # stato's find_kb splits OBI vs STATO ids
    _, _, _, stato_kb = RDF_PARSER_PRESETS["stato"]
    assert stato_kb("http://purl.obolibrary.org/obo/OBI_0000001") == "OBI"
    assert stato_kb("http://purl.obolibrary.org/obo/STATO_0000001") == "STATO"

    nt = tmp_path / "stato.nt"
    nt.write_text(
        '<http://purl.obolibrary.org/obo/OBI_0000070> <http://www.w3.org/2000/01/rdf-schema#label> "assay" .\n'
        '<http://purl.obolibrary.org/obo/OBI_0000070> <http://purl.obolibrary.org/obo/IAO_0000111> "measurement assay" .\n'
        '<http://purl.obolibrary.org/obo/STATO_0000039> <http://www.w3.org/2000/01/rdf-schema#label> "t-test" .\n'
        '<http://purl.obolibrary.org/obo/GO_0000001> <http://www.w3.org/2000/01/rdf-schema#label> "not stato" .\n'
    )
    df = from_rdf_preset(str(nt), "stato")
    assert set(df["idx"]) == {
        "http://purl.obolibrary.org/obo/OBI_0000070",
        "http://purl.obolibrary.org/obo/STATO_0000039",
    }
    assert "measurement assay" in set(df["syn"])

    # find_kb flows into the candidates' ids_and_source
    _meta, syns, _ner = build_parser_caches(
        df, "stato", "measurement_technique", "STATO", find_kb=stato_kb
    )
    sources = set()
    for cj in syns["candidate_json"]:
        for id_set in _json.loads(cj)["associated_id_sets"]:
            sources.update(src for _idx, src in id_set)
    assert sources == {"OBI", "STATO"}

    # uberon preset: plain exact-synonym OBO shape
    nt2 = tmp_path / "uberon.nt"
    nt2.write_text(
        '<http://purl.obolibrary.org/obo/UBERON_0000955> <http://www.w3.org/2000/01/rdf-schema#label> "brain" .\n'
        '<http://purl.obolibrary.org/obo/UBERON_0000955> <http://www.geneontology.org/formats/oboInOwl#hasExactSynonym> "encephalon" .\n'
    )
    df2 = from_rdf_preset(str(nt2), "uberon")
    assert set(df2["syn"]) == {"brain", "encephalon"}


def test_build_caches_ray_equals_driver_build(ray_session):
    """The Ray map_groups cache build (large-ontology path) must emit
    the same candidates as the driver-side build, including through the
    new id-grouping strategy flags."""
    import json as _json

    import pandas as pd

    from kazu_ray.ontology.build import build_caches_ray, build_parser_caches

    df = pd.DataFrame(
        {
            "idx": ["G1", "G2", "G3", "G4"],
            "default_label": ["AKT1", "AKT1", "BRCA2", "AKT1"],
            "syn": ["akt", "akt", "akt", "brc"],
            "mapping_type": ["syn"] * 4,
            "data_origin": ["t"] * 4,
            "annotation_score": [0] * 4,
        }
    )
    _meta, syns, _ner = build_parser_caches(
        df, "p", "gene", "SRC", group_by_exact_label=True
    )
    driver = {
        r["synonym_norm"]: r["candidate_json"] for _, r in syns.iterrows()
    }
    ray_rows = build_caches_ray(
        df, "p", "gene", "SRC", group_by_exact_label=True
    ).to_pandas()
    ray_cands = dict(zip(ray_rows["synonym_norm"], ray_rows["candidate_json"]))
    # driver build may add generated alternative surfaces to ner terms,
    # but the candidate JSON per syn_norm must agree exactly
    for syn_norm, cand in ray_cands.items():
        assert _json.loads(driver[syn_norm]) == _json.loads(cand)
    akt = _json.loads(ray_cands["AKT"])
    # "akt" is claimed by G1/G2 (shared label AKT1 -> one set) and G3
    # (BRCA2 -> its own set)
    assert sorted(len(s) for s in akt["associated_id_sets"]) == [1, 2]
    assert akt["aggregated_by"] == "CUSTOM"
