"""Normalization kernel tests — branch coverage per FIXTURES.md F4,
mirroring the reference's test_string_normalizer.py intent."""

from hypothesis import given, settings
from hypothesis import strategies as st

from kazu_ray.lang import normalizer as n


def test_symbol_classification_default():
    assert n.default_is_symbol_like("AD")  # short single token
    assert n.default_is_symbol_like("EGFR")
    assert n.default_is_symbol_like("p27")  # single token with digit
    assert n.default_is_symbol_like("erbB2")  # internal uppercase
    assert not n.default_is_symbol_like("Alzheimers Disease")
    assert not n.default_is_symbol_like("breast cancer")
    assert n.default_is_symbol_like("ALL CAPS PHRASE")  # upper >= lower


def test_disease_short_nouns_not_symbolic():
    assert not n.disease_is_symbol_like("flu")
    assert not n.disease_is_symbol_like("HIV")
    assert not n.disease_is_symbol_like("NSCLC")
    assert n.disease_is_symbol_like("ALL")


def test_gene_symbol_like():
    assert n.gene_is_symbol_like("EGFR")
    assert n.gene_is_symbol_like("mTOR")
    assert n.gene_is_symbol_like("egfr")  # single token, no noun suffix
    assert not n.gene_is_symbol_like("Insulin")  # 'in' suffix
    assert not n.gene_is_symbol_like("estrogen receptor")


def test_symbol_normalization():
    assert n.normalize("EGFR", "gene") == "EGFR"
    # plural caps strip (ERBBs → ERBB) for genes
    assert n.normalize("ERBBs", "gene") == "ERBB"
    # number splitting
    assert n.normalize("MAPK8", "gene") == "MAPK 8"
    assert n.normalize("p27", "gene") == "P 27"


def test_noun_phrase_normalization():
    assert n.normalize("breast cancer", "disease") == "BREAST CANCER"
    assert n.normalize("Breast Cancer", "disease") == "BREAST CANCER"
    # depluralization
    assert n.normalize("lung cancers", "disease") == "LUNG CANCER"
    # roman numerals
    assert n.normalize("type II diabetes", "disease") == "TYPE 2 DIABETE"
    # greek substitution
    assert "KAPPA" in n.normalize("NF-κB1", "gene")


def test_depluralize_rules():
    assert n.depluralize_word("mosquitoes") == "mosquito"
    assert n.depluralize_word("antibodies") == "antibody"
    assert n.depluralize_word("switches") == "switch"
    assert n.depluralize_word("MAPKs") == "MAPK"
    assert n.depluralize_word("receptors") == "receptor"
    assert n.depluralize_word("apoptosis") == "apoptosis"
    assert n.depluralize_word("BRAF") == "BRAF"


def test_case_variants_converge():
    for a, b in [("breast cancer", "Breast Cancer"), ("Lung Cancer", "lung cancer")]:
        assert n.normalize(a, "disease") == n.normalize(b, "disease")


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=80), st.sampled_from(["gene", "disease", "drug", None, "anatomy"]))
def test_normalizer_never_raises(s, cls):
    out = n.normalize(s, cls)
    assert isinstance(out, str)
    assert n.classify_symbolic(s, cls) in (True, False)
