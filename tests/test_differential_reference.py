"""Differential tests against the ACTUAL reference implementation.

``kazu.utils.string_normalizer`` imports and runs in this sandbox with
no model pack, so the repo's normalizer kernel
(``kazu_ray/lang/normalizer.py``) is asserted equal to the reference
``StringNormalizer.normalize`` / ``classify_symbolic`` — not to a
re-implementation — over:

* every synonym in the synthetic ontology bank (per entity class),
* every word/phrase window of a sample of corpus pages,
* a deterministic adversarial bank (roman numerals, greek letters,
  plurals, dashes, mixed case, sub-token symbols),
* hypothesis-generated strings over the kernel's input alphabet.

Any divergence is a hard failure (the kernel is byte-parity by design:
match_norm, synonym grouping and the ontology cache all flow from it).
Reference: kazu/utils/string_normalizer.py:43-585.
"""

from __future__ import annotations

import random
import sys

import pytest

REFERENCE_PATH = "/root/reference"

try:
    sys.path.insert(0, REFERENCE_PATH)
    from kazu.utils.string_normalizer import StringNormalizer as RefNormalizer
finally:
    sys.path.remove(REFERENCE_PATH)

from kazu_ray.lang import normalizer as ours

ENTITY_CLASSES = ["gene", "disease", "anatomy", "company", None, "drug", "cell_line"]


def _assert_parity(strings, classes=ENTITY_CLASSES):
    n = 0
    for s in strings:
        for cls in classes:
            ref_sym = RefNormalizer.classify_symbolic(s, cls)
            our_sym = ours.classify_symbolic(s, cls)
            assert our_sym == ref_sym, (
                f"classify_symbolic({s!r}, {cls!r}): ours={our_sym} ref={ref_sym}"
            )
            ref_norm = RefNormalizer.normalize(s, cls)
            our_norm = ours.normalize(s, cls)
            assert our_norm == ref_norm, (
                f"normalize({s!r}, {cls!r}): ours={our_norm!r} ref={ref_norm!r}"
            )
            n += 1
    return n


def test_reference_normalizer_smoke():
    assert RefNormalizer.normalize("EGFRs", "gene") == "EGFR"
    assert ours.normalize("EGFRs", "gene") == "EGFR"


def test_parity_adversarial_bank():
    bank = [
        "EGFR", "EGFRs", "egfr", "BRCA1", "BRCA1/2", "COX-2", "COX 2",
        "estrogen receptor alpha", "estrogen receptor α", "ERα", "ER-α",
        "type II diabetes", "type 2 diabetes mellitus", "factor VIII",
        "factor viii", "coagulation factor IX", "MHC class I", "class I",
        "HIV-1", "IL-6", "IL6", "interleukin 6", "p53", "TP53", "tp53",
        "breast cancer", "breast cancers", "lung carcinomas",
        "carcinoma, hepatocellular", "diabetes mellitus type 2 (T2DM)",
        "alpha-fetoprotein", "α-fetoprotein", "β2-microglobulin",
        "beta 2 microglobulin", "NF-κB", "NFKB", "TNF-α", "tnf alpha",
        "vitamin D", "vitamin Ds", "ABC transporter", "ATPase",
        "Na+/K+-ATPase", "G-protein", "5-HT", "5HT2A",
        "acute lymphoblastic leukemia", "ALL", "T-ALL",
        "A", "B", "I", "V", "X", "II", "IV", "IX",
        "a", "an", "the", "",  " ", "  ", "-", "(x)", "(X)",
        "protein kinase C", "PKC", "PKCs", "MAPKs", "GTPases",
        "tumour necrosis factor", "tumor-associated antigen",
        "CD4+ T cells", "CD8+", "HER2/neu", "c-Myc", "N-myc",
        "XIIth factor", "DNA", "mRNA", "miRNA-21", "hsa-mir-21",
        "buses", "viruses", "analyses", "matrices", "indices",
        "CAPITALIZED PHRASE", "Mixed Case Phrase", "ends with s",
        "Ends With S", "ATP synthase subunit beta",
        "glucose-6-phosphate dehydrogenase", "17β-estradiol",
        "1,25-dihydroxyvitamin D3", "trans-retinoic acid",
        "(R)-warfarin", "S-adenosylmethionine",
    ]
    n = _assert_parity(bank)
    assert n >= 500


def test_parity_ontology_synonyms():
    """Every synonym string in the synthetic ontology bank, with its
    natural entity class and the full cross product of classes."""
    from kazu_ray.ontology.generate import generate_ontology_tables

    tables = generate_ontology_tables()
    strings = set()
    for name, df in tables.items():
        strings.update(df["syn"].tolist())
    n = _assert_parity(sorted(strings))
    assert n >= 1000


def test_parity_corpus_phrases():
    """Word windows of real corpus pages (the strings NER actually
    produces as match candidates)."""
    from kazu_ray.sources.corpus import page_text_for_doc

    strings = set()
    for doc_id in range(300):
        words = page_text_for_doc(doc_id).split(" ")
        for i in range(len(words)):
            strings.add(words[i])
            if i + 2 <= len(words):
                strings.add(" ".join(words[i : i + 2]))
            if i + 3 <= len(words):
                strings.add(" ".join(words[i : i + 3]))
    strings = sorted(strings)[:3000]
    n = _assert_parity(strings, classes=["gene", "disease", None])
    assert n >= 9000


def test_parity_random_strings():
    """Seeded random strings over the kernel's input alphabet — ≥10k
    (string, class) checks including the other banks."""
    alphabet = (
        "abcdefghijklmnopqrstuvwxyz"
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
        "0123456789"
        " -–‐/(),+αβγδκ"
    )
    rng = random.Random(42)
    strings = []
    for _ in range(1200):
        n = rng.randint(1, 30)
        strings.append("".join(rng.choice(alphabet) for _ in range(n)))
    n = _assert_parity(strings, classes=["gene", "disease", "anatomy", "company", None])
    assert n >= 6000
