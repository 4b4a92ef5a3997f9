"""Deterministic synthetic ontologies.

The reference ships 28 ontology parsers that all reduce to one canonical
long-thin dataframe ``[IDX, DEFAULT_LABEL, SYN, MAPPING_TYPE]``
(``kazu/ontology_preprocessing/base.py:726-743``). Downloads are not
possible here, so this module generates three such tables (seed-fixed,
no wall clock, no network) mirroring the reference's own test fixtures
(``kazu/tests/utils.py:86`` DummyParser, ``conftest.py:78-109`` "p27"):

* ``mondo_like``   — entity_class=disease, source MONDO
* ``chembl_like``  — entity_class=drug,    source CHEMBL
* ``hgnc_like``    — entity_class=gene,    source ENSEMBL

Planted phenomena (exercised by tests):
  - ambiguous symbol "p27" shared by 3 gene ids (the conftest.py:78-109 case)
  - case-variant synonyms normalising to one string ("breast cancer")
  - greek / roman / plural variants ("NF-κB1", "type II diabetes", "receptors")
  - short ambiguous all-caps "ALL" (LikelyAcronym → POSSIBLE confidence)
  - near-miss noun phrases ("Neck disease" / "Heck disease")
  - a cross-parser surface overlap (gene symbol that is also a drug synonym)
"""

from __future__ import annotations

import random

import pandas as pd

# bump when generated content changes — keys the derived cache directories
ONTOLOGY_VERSION = "v5"  # v5: synonym generators expanded to 8 (stopword, spelling-variation in defaults)

DISEASE_ADJ = [
    "chronic", "acute", "congenital", "idiopathic", "familial", "juvenile",
    "systemic", "focal", "diffuse", "recurrent", "primary", "secondary",
]
DISEASE_SITE = [
    "lung", "breast", "liver", "kidney", "cardiac", "gastric", "skin",
    "pancreatic", "ovarian", "colon", "prostate", "bladder", "thyroid",
    "bone", "brain",
]
DISEASE_KIND = [
    "cancer", "carcinoma", "fibrosis", "dystrophy", "syndrome", "disease",
    "disorder", "neoplasm", "sclerosis", "anemia",
]

DRUG_STEM = [
    "vora", "tras", "pembro", "nivo", "dara", "osi", "ge", "erlo", "lapa",
    "pacli", "doce", "carbo", "oxali", "iri", "beva", "ritu", "ator", "meto",
    "oma", "ser",
]
DRUG_SUFFIX = ["tinib", "zumab", "limus", "statin", "prazole", "cycline", "mycin", "taxel"]

GENE_PREFIX = [
    "BRCA", "EGFR", "KRAS", "TP", "MYC", "ALKX", "RET", "MET", "ERBB", "PIK",
    "AKT", "PTEN", "RB", "VEGFA", "FGFR", "JAK", "STAT", "MAPK", "CDK", "NOTCH",
]


def _disease_table(n: int, rng: random.Random) -> pd.DataFrame:
    rows = []
    seen = set()
    i = 0
    while len(seen) < n:
        label = f"{rng.choice(DISEASE_ADJ)} {rng.choice(DISEASE_SITE)} {rng.choice(DISEASE_KIND)}"
        i += 1
        if label in seen:
            continue
        seen.add(label)
        idx = f"MONDO_{len(seen):07d}"
        rows.append((idx, label, label, "lbl"))
        # title-case variant → same syn_norm (exercises base.py:160-209 grouping)
        rows.append((idx, label, label.title(), "hasExactSynonym"))
        if rng.random() < 0.3:
            # symbolic abbreviation of the label's initials
            abbrev = "".join(w[0].upper() for w in label.split())
            rows.append((idx, label, abbrev, "hasRelatedSynonym"))
    # hand-planted phenomena
    rows += [
        ("MONDO_2000001", "acute lymphoblastic leukemia", "acute lymphoblastic leukemia", "lbl"),
        ("MONDO_2000001", "acute lymphoblastic leukemia", "ALL", "hasExactSynonym"),
        ("MONDO_2000002", "type 2 diabetes mellitus", "type 2 diabetes mellitus", "lbl"),
        ("MONDO_2000002", "type 2 diabetes mellitus", "type II diabetes", "hasExactSynonym"),
        ("MONDO_2000003", "type 1 diabetes mellitus", "type 1 diabetes mellitus", "lbl"),
        ("MONDO_2000003", "type 1 diabetes mellitus", "type I diabetes", "hasExactSynonym"),
        ("MONDO_2000004", "Heck disease", "Heck disease", "lbl"),
        ("MONDO_2000005", "neck disorder", "Neck disease", "hasRelatedSynonym"),
        ("MONDO_2000005", "neck disorder", "neck disorder", "lbl"),
        ("MONDO_2000006", "influenza", "influenza", "lbl"),
        ("MONDO_2000006", "influenza", "flu", "hasExactSynonym"),
        ("MONDO_2000007", "breast cancer", "breast cancer", "lbl"),
        ("MONDO_2000007", "breast cancer", "Breast Cancer", "hasExactSynonym"),
        ("MONDO_2000008", "lung cancer", "lung cancer", "lbl"),
        ("MONDO_2000008", "lung cancer", "lung cancers", "hasExactSynonym"),
    ]
    return pd.DataFrame(rows, columns=["idx", "default_label", "syn", "mapping_type"])


def _drug_table(n: int, rng: random.Random) -> pd.DataFrame:
    rows = []
    seen = set()
    n = min(n, len(DRUG_STEM) * len(DRUG_SUFFIX) - 10)
    while len(seen) < n:
        label = rng.choice(DRUG_STEM) + rng.choice(DRUG_SUFFIX)
        if label in seen:
            continue
        seen.add(label)
        idx = f"CHEMBL{1000 + len(seen)}"
        rows.append((idx, label, label, "lbl"))
        # chembl-style shouty synonym (is_upper_case_word_to_case_insensitive)
        rows.append((idx, label, label.upper(), "TRADE_NAME"))
        if rng.random() < 0.25:
            rows.append((idx, label, f"{label.capitalize()} hydrochloride", "SALT"))
    rows += [
        # cross-parser overlap: ABC1 is a gene symbol AND a drug research code
        ("CHEMBL9000001", "abc one compound", "ABC1", "RESEARCH_CODE"),
        ("CHEMBL9000001", "abc one compound", "abc one compound", "lbl"),
        # paracetamol-style duplicate-id case: two chembl ids, same non-symbolic syn
        ("CHEMBL9000002", "paracetamol", "paracetamol", "lbl"),
        ("CHEMBL9000002", "paracetamol", "acetaminophen", "hasExactSynonym"),
        ("CHEMBL9000003", "acetaminophen", "acetaminophen", "lbl"),
    ]
    return pd.DataFrame(rows, columns=["idx", "default_label", "syn", "mapping_type"])


def _gene_table(n: int, rng: random.Random) -> pd.DataFrame:
    rows = []
    seen = set()
    while len(seen) < n:
        sym = f"{rng.choice(GENE_PREFIX)}{rng.randint(1, 99)}"
        if sym in seen:
            continue
        seen.add(sym)
        idx = f"ENSG{10000000000 + len(seen):011d}"
        label = sym
        rows.append((idx, label, sym, "lbl"))
        if rng.random() < 0.3:
            # lowercase murine-style homolog symbol (case-sensitivity path)
            rows.append((idx, label, sym.capitalize(), "alias_symbol"))
        if rng.random() < 0.2:
            rows.append((idx, label, f"{sym} gene", "name"))
    rows += [
        # explicit BRCA1/BRCA2 for the non-contiguous "BRCA1/2" split case
        ("ENSG90000000011", "BRCA1", "BRCA1", "lbl"),
        ("ENSG90000000012", "BRCA2", "BRCA2", "lbl"),
        # the deliberately ambiguous p27 (reference conftest.py:78-109)
        ("ENSG90000000001", "CDKN1B", "CDKN1B", "lbl"),
        ("ENSG90000000001", "CDKN1B", "p27", "alias_symbol"),
        ("ENSG90000000002", "PAK2", "PAK2", "lbl"),
        ("ENSG90000000002", "PAK2", "p27", "alias_symbol"),
        ("ENSG90000000003", "ZNRD2", "ZNRD2", "lbl"),
        ("ENSG90000000003", "ZNRD2", "p27", "alias_symbol"),
        # greek variant
        ("ENSG90000000004", "NFKB1", "NFKB1", "lbl"),
        ("ENSG90000000004", "NFKB1", "NF-κB1", "alias_symbol"),
        # plural caps (ERBBs-style strip) and noun-phrase gene name
        ("ENSG90000000005", "ESR1", "ESR1", "lbl"),
        ("ENSG90000000005", "ESR1", "estrogen receptor", "name"),
        # camel-case homolog (erbB2)
        ("ENSG90000000006", "ERBB2", "ERBB2", "lbl"),
        ("ENSG90000000006", "ERBB2", "erbB2", "alias_symbol"),
        # cross-parser overlap partner of the drug research code
        ("ENSG90000000007", "ABC1", "ABC1", "lbl"),
    ]
    df = pd.DataFrame(rows, columns=["idx", "default_label", "syn", "mapping_type"])
    # annotation scores (AnnotationLevelDisambiguationStrategy input): CDKN1B
    # is the canonically intended p27
    scores = {"ENSG90000000001": 100, "ENSG90000000002": 10, "ENSG90000000003": 5}
    df["annotation_score"] = df["idx"].map(scores).fillna(0).astype(int)
    return df


PARSERS = {
    # name -> (entity_class, source, generator)
    "mondo_like": ("disease", "MONDO", _disease_table),
    "chembl_like": ("drug", "CHEMBL", _drug_table),
    "hgnc_like": ("gene", "ENSEMBL", _gene_table),
}


def generate_ontology_tables(n_per_parser: int = 200, seed: int = 42) -> dict[str, pd.DataFrame]:
    """Return {parser_name: long-thin DF} with deterministic contents."""
    out = {}
    for name, (entity_class, source, gen) in PARSERS.items():
        rng = random.Random(f"{seed}:{name}")
        df = gen(n_per_parser, rng).copy()
        df["data_origin"] = name
        if "annotation_score" not in df.columns:
            df["annotation_score"] = 0
        out[name] = df
    return out
