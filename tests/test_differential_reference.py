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


# ---------------------------------------------------------------------------
# autocuration differential (reference module unlocked via test-time
# shims for its serialization-only bson/cattrs imports — see ref_shims)
# ---------------------------------------------------------------------------


def _load_reference_autocuration():
    from tests.ref_shims import install_shims

    install_shims()
    import kazu.ontology_preprocessing.autocuration as ref_ac
    from kazu.data import (
        MentionConfidence,
        OntologyStringBehaviour,
        OntologyStringResource,
        Synonym,
    )

    return ref_ac, MentionConfidence, OntologyStringBehaviour, OntologyStringResource, Synonym


AUTOCURATION_BANK = [
    {"EGFR", "EGFR gene"},
    {"eGFR"},
    {"ASPIRIN"},
    {"TP53"},
    {"breast cancer", "breast carcinoma"},
    {"flu"},
    {"a"},
    {"x" * 61},
    {"BRCA1", "BRCA-1"},
    {"the disease"},
    {"NSCLC"},
    {"p27"},
    {"acute lymphoblastic leukemia"},
    {"IL6", "interleukin 6"},
    {"CANCER"},
]


@pytest.mark.parametrize("entity_class", ["disease", "drug", "gene"])
def test_autocuration_differential_vs_reference(entity_class, tmp_path):
    """Drive the reference AutoCurator (kazu/ontology_preprocessing/
    autocuration.py) with the same per-class action chain the engine
    uses (conf/autocurator semantics) over a shared synonym bank and
    assert identical per-surface (case_sensitive, confidence) flags and
    resource behaviour."""
    ref_ac, RefConf, RefBehaviour, RefResource, RefSynonym = _load_reference_autocuration()

    from kazu_ray.ontology.build import COMMON_WORDS, _Resource, autocurate

    words_file = tmp_path / "common_words.txt"
    words_file.write_text("\n".join(sorted(COMMON_WORDS)) + "\n")

    chain = [ref_ac.SymbolicToCaseSensitiveAction(entity_class)]
    if entity_class in ("disease", "drug"):
        chain.append(ref_ac.LikelyAcronym())
    chain.append(ref_ac.IsCommmonWord(str(words_file)))
    if entity_class == "disease":
        chain.append(ref_ac.multiword)
    chain += [
        ref_ac.MinLength(),
        ref_ac.MaxLength(),
        ref_ac.initial_lowercase_then_upper_to_case_sensitive,
    ]
    if entity_class == "drug":
        chain.append(ref_ac.is_upper_case_word_to_case_insensitive)
    curator = ref_ac.AutoCurator(chain)

    for texts in AUTOCURATION_BANK:
        ref_resource = RefResource(
            original_synonyms=frozenset(
                RefSynonym(
                    text=t, case_sensitive=False, mention_confidence=RefConf.PROBABLE
                )
                for t in texts
            ),
            behaviour=RefBehaviour.ADD_FOR_NER_AND_LINKING,
        )
        (ref_out,) = list(curator({ref_resource}))

        ours = autocurate(_Resource("norm", set(texts)), entity_class)

        assert ours.behaviour == ref_out.behaviour.name, (entity_class, texts)
        ref_flags = {
            s.text: (s.case_sensitive, int(s.mention_confidence))
            for s in ref_out.original_synonyms
        }
        our_flags = {t: (v[0], v[1]) for t, v in ours.syns.items()}
        assert our_flags == ref_flags, (entity_class, texts)


def _load_reference_curation():
    from tests.ref_shims import install_shims

    install_shims()
    from kazu.data import (
        MentionConfidence,
        OntologyStringBehaviour,
        OntologyStringResource,
        Synonym,
    )
    from kazu.ontology_preprocessing.curation_utils import (
        AutofixStrategy,
        OntologyStringConflictAnalyser,
    )

    return (
        OntologyStringConflictAnalyser,
        AutofixStrategy,
        MentionConfidence,
        OntologyStringBehaviour,
        OntologyStringResource,
        Synonym,
    )


def test_case_conflict_predicate_differential_vs_reference():
    """Exhaustive differential of the case/confidence conflict predicate
    (curation_utils.py:580-636) over every (case_sensitivity,
    confidence) combination of two single-synonym resources sharing a
    lowered surface, plus DROP-behaviour exclusion."""
    (
        Analyser,
        _Strategy,
        RefConf,
        RefBehaviour,
        RefResource,
        RefSynonym,
    ) = _load_reference_curation()

    from itertools import product

    from kazu_ray.ontology.build import _Resource, _resources_have_case_conflicts

    confs = [RefConf.HIGHLY_LIKELY, RefConf.PROBABLE, RefConf.POSSIBLE, RefConf.IGNORE]

    def ref_resource(text, cs, conf, behaviour=None):
        return RefResource(
            original_synonyms=frozenset(
                [RefSynonym(text=text, case_sensitive=cs, mention_confidence=conf)]
            ),
            behaviour=behaviour or RefBehaviour.ADD_FOR_NER_AND_LINKING,
        )

    def our_resource(text, cs, conf, behaviour="ADD_FOR_NER_AND_LINKING"):
        r = _Resource("norm", {text})
        r.syns[text] = [cs, int(conf)]
        r.behaviour = behaviour
        return r

    n_checked = n_conflicted = 0
    for (cs1, conf1), (cs2, conf2) in product(product([True, False], confs), repeat=2):
        ref_set = {ref_resource("EGFR", cs1, conf1), ref_resource("egfr", cs2, conf2)}
        ref_verdict = Analyser._resource_set_has_case_conflicts(ref_set)
        ours = [
            our_resource("EGFR", cs1, conf1),
            our_resource("egfr", cs2, conf2),
        ]
        our_verdict = _resources_have_case_conflicts(ours)
        assert our_verdict == ref_verdict, (cs1, conf1, cs2, conf2)
        n_checked += 1
        n_conflicted += ref_verdict
    assert n_checked == 64 and 0 < n_conflicted < 64

    # non-NER behaviours are excluded from the predicate on both sides
    ref_set = {
        ref_resource("EGFR", False, RefConf.PROBABLE, RefBehaviour.DROP_FOR_LINKING),
        ref_resource("egfr", False, RefConf.POSSIBLE),
    }
    ours = [
        our_resource("EGFR", False, RefConf.PROBABLE, "DROP_FOR_LINKING"),
        our_resource("egfr", False, RefConf.POSSIBLE),
    ]
    assert _resources_have_case_conflicts(ours) == Analyser._resource_set_has_case_conflicts(ref_set)


def test_case_conflict_autofix_differential_vs_reference():
    """OPTIMISTIC autofix differential (curation_utils.py:345-423):
    conflicted resource groups get min case-sensitivity and per-surface
    max confidence on both sides."""
    (
        Analyser,
        Strategy,
        RefConf,
        RefBehaviour,
        RefResource,
        RefSynonym,
    ) = _load_reference_curation()

    from kazu_ray.ontology.build import _Resource, autofix_case_conflicts

    def ref_resource(text, cs, conf):
        return RefResource(
            original_synonyms=frozenset(
                [RefSynonym(text=text, case_sensitive=cs, mention_confidence=conf)]
            ),
            behaviour=RefBehaviour.ADD_FOR_NER_AND_LINKING,
        )

    def our_resource(text, cs, conf):
        r = _Resource(text.lower(), {text})
        r.syns[text] = [cs, int(conf)]
        return r

    bank = [
        ("EGFR", True, RefConf.PROBABLE),
        ("egfr", False, RefConf.PROBABLE),
        ("Egfr", True, RefConf.POSSIBLE),
        ("p53", False, RefConf.PROBABLE),  # clean singleton, untouched
    ]

    ref_resources = {ref_resource(*row) for row in bank}
    conflict_sets, _clean = Analyser.check_for_case_conflicts_across_resources(ref_resources)
    assert conflict_sets, "bank must actually conflict"
    analyser = Analyser("disease", autofix=Strategy.OPTIMISTIC)
    fixed = analyser.autofix_resources(conflict_sets)
    ref_flags = {
        s.text: (s.case_sensitive, int(s.mention_confidence))
        for r in fixed
        for s in r.original_synonyms
    }

    ours = [our_resource(*row) for row in bank]
    ours, n_fixed = autofix_case_conflicts(ours)
    assert n_fixed == 1
    our_flags = {
        t: (v[0], v[1]) for r in ours for t, v in r.syns.items() if t.lower() == "egfr"
    }
    assert our_flags == ref_flags
    # the clean resource keeps its original flags on our side
    (p53,) = [r for r in ours if "p53" in r.syns]
    assert p53.syns["p53"] == [False, int(RefConf.PROBABLE)]


def test_curation_merge_differential_vs_reference():
    """Human/auto curation merge differential (curation_utils.py:638-701):
    override, superfluous, discrepancy, additional_to_source and
    obsolete outcomes must agree with the reference merge."""
    (
        Analyser,
        _Strategy,
        RefConf,
        RefBehaviour,
        RefResource,
        RefSynonym,
    ) = _load_reference_curation()
    from kazu.data import EquivalentIdSet

    from kazu_ray.lang import normalizer
    from kazu_ray.ontology.build import _Resource, merge_human_and_auto_resources

    cls = "disease"

    def ref_resource(text, conf=None, alt=(), ids=None):
        return RefResource(
            original_synonyms=frozenset(
                [
                    RefSynonym(
                        text=text,
                        case_sensitive=False,
                        mention_confidence=conf or RefConf.PROBABLE,
                    )
                ]
            ),
            behaviour=RefBehaviour.ADD_FOR_NER_AND_LINKING,
            alternative_synonyms=frozenset(
                RefSynonym(text=a, case_sensitive=False, mention_confidence=RefConf.PROBABLE)
                for a in alt
            ),
            associated_id_sets=(
                frozenset([EquivalentIdSet(ids_and_source=frozenset([(ids, "SRC")]))])
                if ids
                else None
            ),
        )

    def our_resource(text, conf=None, alt=()):
        r = _Resource(normalizer.normalize(text, cls), {text}, set(alt))
        r.syns[text] = [False, int(conf or RefConf.PROBABLE)]
        return r

    # auto set: four terms, one with alternative synonyms
    auto_specs = [
        ("asthma", None, ()),
        ("lung cancer", None, ("lung cancers",)),
        ("influenza", None, ()),
        ("measles", None, ()),
    ]
    # human set: superfluous exact copy (asthma), discrepancy via alt
    # mismatch (lung cancer, no alts recorded), override with a new
    # confidence (influenza), additional new term (carrying ids), and an
    # obsolete curation for a term the source no longer produces
    human_specs = [
        ("asthma", None, (), None),
        ("lung cancer", None, (), None),
        ("influenza", RefConf.POSSIBLE, (), None),
        ("kawasaki disease", None, (), "MONDO:1"),
        ("dropsy", None, (), None),
    ]

    ref_auto = {ref_resource(t, c, a) for t, c, a in auto_specs}
    ref_human = {ref_resource(t, c, a, ids) for t, c, a, ids in human_specs}
    report = Analyser(cls).merge_human_and_auto_resources(ref_human, ref_auto)

    our_auto = {r.syn_norm: r for r in (our_resource(t, c, a) for t, c, a in auto_specs)}
    our_human = [
        (our_resource(t, c, a), ids is not None) for t, c, a, ids in human_specs
    ]
    working, our_report = merge_human_and_auto_resources(our_human, our_auto)

    # effective surfaces agree
    ref_effective = {
        s.text for r in report.effective_resources for s in r.original_synonyms
    }
    our_effective = {t for r in working.values() for t in r.syns}
    assert our_effective == ref_effective
    # outcome sets agree
    assert {
        s.text for r in report.obsolete_resources for s in r.original_synonyms
    } == {"dropsy"}
    assert our_report["obsolete"] == [normalizer.normalize("dropsy", cls)]
    assert {
        s.text for r in report.superfluous_resources for s in r.original_synonyms
    } == {"asthma"}
    assert our_report["superfluous"] == [normalizer.normalize("asthma", cls)]
    ref_discrepant = {
        s.text
        for human_r, _default in report.resources_with_discrepancies
        for s in human_r.original_synonyms
    }
    assert ref_discrepant == {"lung cancer"}
    assert our_report["discrepancies"] == [normalizer.normalize("lung cancer", cls)]
    # the human override (not the auto default) is the effective resource
    eff = working[normalizer.normalize("influenza", cls)]
    assert eff.syns["influenza"][1] == int(RefConf.POSSIBLE)
    ref_eff = {
        s.text: int(s.mention_confidence)
        for r in report.effective_resources
        for s in r.original_synonyms
    }
    assert ref_eff["influenza"] == int(RefConf.POSSIBLE)


# ---------------------------------------------------------------------------
# span-finder differential: the ported BIO/multilabel state machines vs
# the reference's (torch shimmed with numpy — semantically identical for
# the two tensor ops the reference uses)
# ---------------------------------------------------------------------------


def _gen_word_sequence(rng, n_labels, multilabel=False):
    """Random (text, words-as-dicts) with adversarial structure: variable
    tokens per word, occasional span-breaking separators, and skewed
    label draws so B/I runs, repeated-B nesting and O breaks all occur."""
    n_words = rng.randint(3, 14)
    words = []
    text = ""
    for wid in range(n_words):
        sep = rng.choice([" ", " ", " ", "(", ")", ";", ""]) if wid else ""
        text += sep
        start = len(text)
        n_tok = rng.randint(1, 3)
        toks, offs = [], []
        for t in range(n_tok):
            tok = rng.choice(["ab", "x", "kin", "ase", "12"])
            offs.append((len(text), len(text) + len(tok)))
            text += tok
            toks.append(tok)
        if multilabel:
            conf = rng.choice([-1.0, 1.0], size=(n_tok, n_labels), p=[0.55, 0.45])
        else:
            conf = rng.dirichlet(np.ones(n_labels) * 0.35, size=n_tok)
        words.append(
            dict(
                token_ids=list(range(n_tok)),
                tokens=toks,
                token_confidences=conf,
                token_offsets=offs,
                word_char_start=start,
                word_char_end=len(text) - 1,
                word_id=wid,
            )
        )
    return text, words


import numpy as np


def _spans_sig(spans):
    return sorted(
        (s.clazz, tuple(w.word_id for w in s.tok_words)) for s in spans
    )


def test_simple_span_finder_differential_vs_reference():
    """SimpleSpanFinder (BIO state machine incl. nested repeated-B copy
    and span-breaking chars) must produce identical spans to the
    reference over 300 random adversarial sequences."""
    from tests.ref_shims import load_reference_module

    ref_twp = load_reference_module(
        "ref_twp", "kazu/steps/ner/tokenized_word_processor.py"
    )

    from kazu_ray.stages import token_ner as ours

    id2label = {0: "O", 1: "B-gene", 2: "I-gene", 3: "B-drug", 4: "I-drug"}
    rng = np.random.RandomState(1234)
    for case in range(300):
        text, words = _gen_word_sequence(rng, n_labels=5)
        ref_words = [ref_twp.TokenizedWord(**w) for w in words]
        our_words = [ours.TokenizedWord(**w) for w in words]
        ref_spans = ref_twp.SimpleSpanFinder(text, id2label)(ref_words)
        our_spans = ours.SimpleSpanFinder(text, id2label)(our_words)
        assert _spans_sig(our_spans) == _spans_sig(ref_spans), (case, text)


def test_multilabel_span_finder_differential_vs_reference():
    """MultilabelSpanFinder: per-class span tracking over heavisided
    multi-label confidences, identical to the reference."""
    from tests.ref_shims import load_reference_module

    ref_twp = load_reference_module(
        "ref_twp", "kazu/steps/ner/tokenized_word_processor.py"
    )

    from kazu_ray.stages import token_ner as ours

    id2label = {0: "O", 1: "gene", 2: "drug"}
    rng = np.random.RandomState(99)
    for case in range(300):
        text, words = _gen_word_sequence(rng, n_labels=3, multilabel=True)
        ref_words = [ref_twp.TokenizedWord(**w) for w in words]
        our_words = [ours.TokenizedWord(**w) for w in words]
        ref_spans = ref_twp.MultilabelSpanFinder(text, id2label)(ref_words)
        our_spans = ours.MultilabelSpanFinder(text, id2label)(our_words)
        assert _spans_sig(our_spans) == _spans_sig(ref_spans), (case, text)


def test_numeric_list_splitter_differential_vs_reference():
    """SplitOnNumericalListPatternWithPrefix is pure Python — run the
    actual reference class (spacy_pipeline stubbed out of the module's
    import path) against our port over an adversarial bank and compare
    resulting (match, spans) sets."""
    import sys
    import types

    from tests.ref_shims import install_shims, load_reference_module

    install_shims()
    # the module imports SpacyPipelines (conjunction rule only) and
    # spacy.tokens.Doc at module level; neither touches the numeric rule
    if "kazu.utils.spacy_pipeline" not in sys.modules:
        sp = types.ModuleType("kazu.utils.spacy_pipeline")

        class _SpacyPipelines:
            def __init__(self, *a, **k):
                raise NotImplementedError("spacy unavailable")

        sp.SpacyPipelines = _SpacyPipelines
        sys.modules["kazu.utils.spacy_pipeline"] = sp
    if "spacy" not in sys.modules:
        spacy = types.ModuleType("spacy")
        tokens = types.ModuleType("spacy.tokens")

        class Doc:  # type stub only
            pass

        tokens.Doc = Doc
        spacy.tokens = tokens
        sys.modules["spacy"] = spacy
        sys.modules["spacy.tokens"] = tokens

    ref_epp = load_reference_module("ref_epp", "kazu/steps/ner/entity_post_processing.py")
    from kazu.data import Entity

    from kazu_ray.stages.postner import split_numeric_list

    bank = [
        ("BRCA1/2/3", "BRCA1/2/3 are oncogenes", 0),
        ("BRCA1/2", "we studied BRCA1/2 here", 11),
        ("HER2/neu", "HER2/neu amplification", 0),       # non-digit tail part skipped
        ("TGF1/5/xx/7", "TGF1/5/xx/7 pathway", 0),       # mixed parts
        ("ABC/2", "ABC/2 test", 0),                       # no trailing digit → prefix rule off
        ("p53", "p53 alone", 0),                          # no pattern → no splits
        ("IL1/2", "IL1/2 receptors", 0),
        ("CYP2D6/7/8", "CYP2D6/7/8 variants", 0),
    ]
    for match, text, start in bank:
        ref_ent = Entity.load_contiguous_entity(
            start=start,
            end=start + len(match),
            namespace="t",
            entity_class="gene",
            match=match,
        )
        ref_out = ref_epp.SplitOnNumericalListPatternWithPrefix()(ref_ent, text)
        ref_sig = sorted(
            (e.match, tuple((s.start, s.end) for s in sorted(e.spans, key=lambda s: s.start)))
            for e in ref_out
        )
        our_ent = {
            "start": start,
            "end": start + len(match),
            "namespace": "t",
            "entity_class": "gene",
            "match": match,
        }
        our_out = split_numeric_list(our_ent, text)
        our_sig = sorted(
            (e["match"], tuple(tuple(sp) for sp in sorted(e["spans"])))
            for e in our_out
        )
        assert our_sig == ref_sig, (match, our_sig, ref_sig)
        if match == "BRCA1/2/3":
            # non-vacuity: the canonical case splits into exactly
            # BRCA1, BRCA2, BRCA3 on both sides
            assert [m for m, _ in ref_sig] == ["BRCA1", "BRCA2", "BRCA3"]


def test_merge_overlapping_differential_vs_reference():
    """MergeOverlappingEntsStep differential: random overlapping entity
    layouts (mappings presence, span lengths, class preference ranks,
    mention confidences, non-contiguous exclusions) must yield the same
    surviving entities from our sweep-line merge and the reference step."""
    import sys
    import types

    from tests.ref_shims import install_shims, load_reference_module

    install_shims()
    if "kazu.steps" not in sys.modules:
        # stand-in for the package __init__ (it imports spacy-dependent
        # steps); the merge step needs only the base class + decorator
        steps_pkg = types.ModuleType("kazu.steps")

        class Step:
            pass

        steps_pkg.Step = Step
        steps_pkg.document_iterating_step = lambda f: f  # direct per-doc call
        sys.modules["kazu.steps"] = steps_pkg

    ref_mo = load_reference_module("ref_mo", "kazu/steps/other/merge_overlapping_ents.py")
    from kazu.data import (
        CharSpan,
        Document,
        Entity,
        Mapping,
        MentionConfidence,
        StringMatchConfidence,
    )

    from kazu_ray.stages.docproc import ENT_CLASS_PREFERRED_ORDER, merge_overlapping

    step = ref_mo.MergeOverlappingEntsStep(
        ent_class_preferred_order=list(ENT_CLASS_PREFERRED_ORDER)
    )
    classes = ["disease", "drug", "gene", "unranked_class"]
    confs = [
        MentionConfidence.HIGHLY_LIKELY,
        MentionConfidence.PROBABLE,
        MentionConfidence.POSSIBLE,
    ]
    rng = np.random.RandomState(7)
    text = "x" * 80

    def make_mapping():
        return Mapping(
            default_label="L",
            source="S",
            parser_name="P",
            idx="ID:1",
            string_match_strategy="t",
            string_match_confidence=StringMatchConfidence.HIGHLY_LIKELY,
        )

    for case in range(200):
        n = rng.randint(2, 9)
        ref_ents, our_ents = [], []
        # unique span lengths per case: on EXACT sort-key ties the
        # reference's winner depends on set-iteration order (its own
        # docstring calls the last criterion arbitrary), which is not a
        # semantics we can or should pin down
        lengths = rng.choice(np.arange(1, 15), size=n, replace=False)
        for k in range(n):
            start = int(rng.randint(0, 60))
            end = start + int(lengths[k])
            cls_ = classes[rng.randint(len(classes))]
            conf = confs[rng.randint(len(confs))]
            has_mapping = bool(rng.randint(2))
            non_contig = rng.random() < 0.15
            if non_contig:
                spans = frozenset(
                    [CharSpan(start=start, end=start + 2), CharSpan(start=end + 2, end=end + 4)]
                )
                ent = Entity(
                    spans=spans,
                    namespace="t",
                    entity_class=cls_,
                    match=text[start:end],
                    mention_confidence=conf,
                )
                our_spans = [(start, start + 2), (end + 2, end + 4)]
            else:
                ent = Entity.load_contiguous_entity(
                    start=start,
                    end=end,
                    namespace="t",
                    entity_class=cls_,
                    match=text[start:end],
                    mention_confidence=conf,
                )
                our_spans = [(start, end)]
            if has_mapping:
                ent.mappings.add(make_mapping())
            ref_ents.append(ent)
            our_ents.append(
                {
                    "start": ent.start,
                    "end": ent.end,
                    "spans": our_spans,
                    "entity_class": cls_,
                    "confidence": int(conf),
                    "mappings": [{"idx": "ID:1"}] if has_mapping else [],
                    "match": text[start:end],
                }
            )
        doc = Document.create_simple_document(text)
        doc.sections[0].entities = ref_ents
        step(doc)
        ref_sig = sorted(
            (e.start, e.end, e.entity_class, int(e.mention_confidence))
            for e in doc.sections[0].entities
        )
        our_sig = sorted(
            (e["start"], e["end"], e["entity_class"], e["confidence"])
            for e in merge_overlapping(our_ents)
        )
        assert our_sig == ref_sig, (case, our_sig, ref_sig)


def test_cleanup_actions_differential_vs_reference():
    """Cleanup ladder differential: AMBIGUOUS-mapping drop → unmapped
    low-confidence entity drop → min-len / match-set / class filters →
    URI strip → parser-rank mapping selection, applied in the same order
    on both sides over randomized docs."""
    import sys
    import types

    from tests.ref_shims import install_shims, load_reference_module

    install_shims()
    if "kazu.steps" not in sys.modules:
        steps_pkg = types.ModuleType("kazu.steps")

        class Step:
            pass

        steps_pkg.Step = Step
        steps_pkg.document_iterating_step = lambda f: f
        sys.modules["kazu.steps"] = steps_pkg

    ref_cl = load_reference_module("ref_cleanup", "kazu/steps/other/cleanup.py")
    from kazu.data import (
        DisambiguationConfidence,
        Document,
        Entity,
        Mapping,
        MentionConfidence,
        StringMatchConfidence,
    )

    from kazu_ray.stages.docproc import (
        cleanup,
        drop_by_min_len,
        drop_entity_class_not_in,
        drop_if_match_in_set,
        drop_mappings_by_parser_rank,
        strip_mapping_uris,
    )

    rng = np.random.RandomState(21)
    classes = ["disease", "drug", "gene"]
    parsers = ["meddra", "mondo"]
    idxs = [
        "http://purl.obolibrary.org/obo/MONDO_0004979",
        "MONDO_0005148",
        "https://example.org/a/b/CHEMBL25",
        "CHEMBL112",
    ]
    matches = ["asthma", "x", "flu", "aspirin", "p53", "badterm"]
    disamb = [DisambiguationConfidence.AMBIGUOUS, DisambiguationConfidence.PROBABLE, None]
    confs = [MentionConfidence.HIGHLY_LIKELY, MentionConfidence.PROBABLE, MentionConfidence.POSSIBLE]

    rank_cfg = {"disease": ["meddra", "mondo"], "drug": ["mondo", "meddra"]}
    drop_set = {"gene": {"badterm"}}
    required = {"disease", "drug", "gene"}

    ref_actions = [
        ref_cl.MappingFilterCleanupAction(
            [
                ref_cl.DropMappingsByConfidenceMappingFilter(
                    string_match_ranks_to_drop=(),
                    disambiguation_ranks_to_drop=(DisambiguationConfidence.AMBIGUOUS,),
                )
            ]
        ),
        ref_cl.EntityFilterCleanupAction([ref_cl.DropUnmappedEntityFilter()]),
        ref_cl.EntityFilterCleanupAction(
            [
                ref_cl.DropByMinLenFilter(min_len=2),
                ref_cl.DropEntityIfMatchInSetFilter(drop_set),
                ref_cl.DropEntityIfClassNotMatchedFilter(required),
            ]
        ),
        ref_cl.StripMappingURIsAction(),
        ref_cl.DropMappingsByParserNameRankAction(rank_cfg),
    ]
    our_extra = [
        drop_by_min_len(2),
        drop_if_match_in_set(drop_set),
        drop_entity_class_not_in(required),
        strip_mapping_uris(),
        drop_mappings_by_parser_rank(rank_cfg),
    ]

    for case in range(150):
        n = rng.randint(1, 7)
        ref_ents, our_ents = [], []
        text = "y" * 40
        for k in range(n):
            start = int(rng.randint(0, 30))
            match = matches[rng.randint(len(matches))]
            cls_ = classes[rng.randint(len(classes))]
            conf = confs[rng.randint(len(confs))]
            n_map = rng.randint(0, 3)
            ref_maps, our_maps = set(), []
            for _ in range(n_map):
                d = disamb[rng.randint(len(disamb))]
                parser = parsers[rng.randint(len(parsers))]
                idx = idxs[rng.randint(len(idxs))]
                ref_maps.add(
                    Mapping(
                        default_label="L",
                        source="S",
                        parser_name=parser,
                        idx=idx,
                        string_match_strategy="t",
                        string_match_confidence=StringMatchConfidence.HIGHLY_LIKELY,
                        disambiguation_confidence=d,
                    )
                )
                m = {
                    "idx": idx,
                    "parser_name": parser,
                    # ours encodes AMBIGUOUS as 0 (model.py); None
                    # (never disambiguated) stays distinct from PROBABLE
                    "disambiguation_confidence": (
                        0
                        if d is DisambiguationConfidence.AMBIGUOUS
                        else (50 if d is DisambiguationConfidence.PROBABLE else -1)
                    ),
                }
                # reference mappings live in a set — exact duplicates
                # never exist pre-cleanup; mirror that on our side
                if m not in our_maps:
                    our_maps.append(m)
            ent = Entity.load_contiguous_entity(
                start=start,
                end=start + len(match),
                namespace="t",
                entity_class=cls_,
                match=match,
                mention_confidence=conf,
            )
            ent.mappings = ref_maps
            ref_ents.append(ent)
            our_ents.append(
                {
                    "start": start,
                    "end": start + len(match),
                    "entity_class": cls_,
                    "match": match,
                    "confidence": int(conf),
                    "mappings": our_maps,
                }
            )
        doc = Document.create_simple_document(text)
        doc.sections[0].entities = ref_ents
        for action in ref_actions:
            action.cleanup(doc)
        ref_sig = sorted(
            (
                e.start,
                e.entity_class,
                e.match,
                tuple(sorted((m.parser_name, m.idx) for m in e.mappings)),
            )
            for e in doc.sections[0].entities
        )
        ours = cleanup(our_ents, extra_actions=our_extra)
        our_sig = sorted(
            (
                e["start"],
                e["entity_class"],
                e["match"],
                tuple(sorted((m["parser_name"], m["idx"]) for m in e["mappings"])),
            )
            for e in ours
        )
        assert our_sig == ref_sig, (case, our_sig, ref_sig)


def test_disambiguation_strategies_differential_vs_reference():
    """DefinedElsewhereInDocument + PreferDefaultLabelMatch strategy
    differential: same id-set filtering as the reference classes, driven
    end-to-end (reference: populated MetadataDatabase + Document with
    mapped entities; ours: the engine's store/doc-context shapes)."""
    import sys
    import types

    from tests.ref_shims import install_shims, load_reference_module

    install_shims()
    # strategies.py imports DEFAULT_LABEL from ontology_preprocessing.base
    # (whose import chain needs spacy) and two TF-IDF scorers from
    # context_scoring (not exercised here) — provide stand-ins
    if "kazu.ontology_preprocessing.base" not in sys.modules:
        base = types.ModuleType("kazu.ontology_preprocessing.base")
        base.DEFAULT_LABEL = "default_label"  # constants.py:3
        sys.modules["kazu.ontology_preprocessing.base"] = base
    if "kazu.steps.linking.post_processing.disambiguation.context_scoring" not in sys.modules:
        cs = types.ModuleType("kazu.steps.linking.post_processing.disambiguation.context_scoring")

        class _Scorer:
            def __init__(self, *a, **k):
                raise NotImplementedError

        cs.TfIdfScorer = _Scorer
        cs.GildaTfIdfScorer = _Scorer
        sys.modules[
            "kazu.steps.linking.post_processing.disambiguation.context_scoring"
        ] = cs

    ref_ds = load_reference_module(
        "ref_disamb", "kazu/steps/linking/post_processing/disambiguation/strategies.py"
    )
    from kazu.data import (
        DisambiguationConfidence,
        Document,
        Entity,
        EquivalentIdSet,
        Mapping,
        MentionConfidence,
        StringMatchConfidence,
    )
    from kazu.database.in_memory_db import MetadataDatabase

    from kazu_ray.lang import normalizer
    from kazu_ray.stages.mapping import DefinedElsewhereStrategy, PreferDefaultLabelStrategy

    parser = "test_parser"
    id_sets = {
        EquivalentIdSet(frozenset([("MONDO:1", "MONDO"), ("MONDO:2", "MONDO")])),
        EquivalentIdSet(frozenset([("MEDDRA:9", "MEDDRA")])),
    }
    our_id_sets = {
        frozenset([("MONDO:1", "MONDO"), ("MONDO:2", "MONDO")]),
        frozenset([("MEDDRA:9", "MEDDRA")]),
    }

    # --- DefinedElsewhere: MONDO:2 is mapped elsewhere in the doc
    doc = Document.create_simple_document("some text")
    ent = Entity.load_contiguous_entity(
        start=0, end=4, namespace="t", entity_class="disease", match="some"
    )
    ent.mappings.add(
        Mapping(
            default_label="L",
            source="MONDO",
            parser_name=parser,
            idx="MONDO:2",
            string_match_strategy="t",
            string_match_confidence=StringMatchConfidence.HIGHLY_LIKELY,
        )
    )
    doc.sections[0].entities = [ent]
    ref_strat = ref_ds.DefinedElsewhereInDocumentDisambiguationStrategy(
        DisambiguationConfidence.HIGHLY_LIKELY
    )
    ref_strat.prepare(doc)
    ref_out = ref_strat.disambiguate(id_sets, doc, parser)
    ref_sig = sorted(sorted(s.ids_and_source) for s in ref_out)

    class _Doc:
        def mapped_ids(self):
            return {(parser, "MONDO", "MONDO:2")}

    our_out = DefinedElsewhereStrategy()(our_id_sets, _Doc(), parser, "some", "SOME")
    our_sig = sorted(sorted(s) for s in our_out)
    assert our_sig == ref_sig == [[("MONDO:2", "MONDO")]]

    # --- PreferDefaultLabel: only MONDO:1's default label normalises to
    # the match norm
    MetadataDatabase().add_parser(
        parser,
        "disease",
        {
            "MONDO:1": {"default_label": "asthma"},
            "MONDO:2": {"default_label": "hay fever"},
            "MEDDRA:9": {"default_label": "asthma NOS"},
        },
    )
    ref_pd = ref_ds.PreferDefaultLabelMatchDisambiguationStrategy(
        DisambiguationConfidence.HIGHLY_LIKELY
    )
    norm = normalizer.normalize("asthma", "disease")
    ref_out2 = ref_pd.disambiguate(id_sets, doc, parser, ent_match="asthma", ent_match_norm=norm)
    ref_sig2 = sorted(sorted(s.ids_and_source) for s in ref_out2)

    store = types.SimpleNamespace(
        parser_entity_class={parser: "disease"},
        default_label=lambda p, idx: {
            "MONDO:1": "asthma",
            "MONDO:2": "hay fever",
            "MEDDRA:9": "asthma NOS",
        }[idx],
    )
    our_doc = types.SimpleNamespace(runner=types.SimpleNamespace(store=store))
    our_out2 = PreferDefaultLabelStrategy()(our_id_sets, our_doc, parser, "asthma", norm)
    our_sig2 = sorted(sorted(s) for s in our_out2)
    assert our_sig2 == ref_sig2 == [[("MONDO:1", "MONDO")]]


def test_mapping_strategies_differential_vs_reference():
    """filter_candidates differential for the four string-matching
    mapping strategies (ExactMatch, SymbolMatch, SynNormIsSubString,
    StrongMatch ± symbolic_only) over randomized candidate pools —
    surviving synonym_norm sets must be identical."""
    from tests.ref_shims import install_shims, load_reference_module

    install_shims()
    import sys
    import types

    if "kazu.ontology_preprocessing.base" not in sys.modules:
        base = types.ModuleType("kazu.ontology_preprocessing.base")
        base.DEFAULT_LABEL = "default_label"
        sys.modules["kazu.ontology_preprocessing.base"] = base
    if "kazu.steps.linking.post_processing.disambiguation.context_scoring" not in sys.modules:
        cs = types.ModuleType("kazu.steps.linking.post_processing.disambiguation.context_scoring")

        class _Scorer:
            def __init__(self, *a, **k):
                raise NotImplementedError

        cs.TfIdfScorer = _Scorer
        cs.GildaTfIdfScorer = _Scorer
        sys.modules[
            "kazu.steps.linking.post_processing.disambiguation.context_scoring"
        ] = cs
    # mapping_strategies imports DisambiguationStrategy from the real
    # disambiguation module (loadable), so load the target directly
    load_reference_module(
        "ref_disamb", "kazu/steps/linking/post_processing/disambiguation/strategies.py"
    )
    sys.modules.setdefault(
        "kazu.steps.linking.post_processing.disambiguation.strategies",
        sys.modules["ref_disamb"],
    )
    ref_ms = load_reference_module(
        "ref_ms", "kazu/steps/linking/post_processing/mapping_strategies/strategies.py"
    )
    from kazu.data import (
        EquivalentIdAggregationStrategy,
        EquivalentIdSet,
        LinkingCandidate,
        LinkingMetrics,
        StringMatchConfidence,
    )

    from kazu_ray.model import AssociatedIdSets as _A  # noqa: F401 (shape check)
    from kazu_ray import model as our_model
    from kazu_ray.stages import mapping as our_mapping

    rng = np.random.RandomState(5)
    norms = ["TESTIN", "MAPK8", "MAP K8", "EGFR", "AB", "KINASE ALPHA", "T"]
    match_norms = ["TESTIN GENE", "MAPK8", "MAP K8", "EGFR PROTEIN", "KINASE ALPHA", "AB"]

    def ref_candidate(norm, symbolic):
        return LinkingCandidate(
            raw_synonyms=frozenset([norm]),
            synonym_norm=norm,
            parser_name="p",
            is_symbolic=symbolic,
            associated_id_sets=frozenset(
                [EquivalentIdSet(frozenset([(f"ID:{norm}", "S")]))]
            ),
            aggregated_by=EquivalentIdAggregationStrategy.UNAMBIGUOUS,
        )

    def our_candidate(norm, symbolic):
        return our_model.LinkingCandidate(
            synonym_norm=norm,
            parser_name="p",
            raw_synonyms=frozenset([norm]),
            is_symbolic=symbolic,
            mapping_types=frozenset(),
            associated_id_sets=frozenset(
                [frozenset([(f"ID:{norm}", "S")])]
            ),
        )

    PROB = StringMatchConfidence.PROBABLE
    pairs = [
        (
            lambda: ref_ms.ExactMatchMappingStrategy(PROB),
            lambda: our_mapping.ExactMatchMappingStrategy("PROBABLE"),
        ),
        (
            lambda: ref_ms.SymbolMatchMappingStrategy(PROB),
            lambda: our_mapping.SymbolMatchMappingStrategy("PROBABLE"),
        ),
        (
            lambda: ref_ms.SynNormIsSubStringMappingStrategy(PROB),
            lambda: our_mapping.SynNormIsSubStringMappingStrategy("PROBABLE"),
        ),
        (
            lambda: ref_ms.StrongMatchMappingStrategy(PROB),
            lambda: our_mapping.StrongMatchMappingStrategy("PROBABLE"),
        ),
        (
            lambda: ref_ms.StrongMatchMappingStrategy(PROB, symbolic_only=True),
            lambda: our_mapping.StrongMatchMappingStrategy("PROBABLE", symbolic_only=True),
        ),
    ]

    n_nonempty = 0
    for case in range(250):
        k = rng.randint(1, 6)
        chosen = rng.choice(len(norms), size=k, replace=False)
        ref_cands, our_cands = {}, {}
        for ci in chosen:
            norm = norms[ci]
            symbolic = bool(rng.randint(2))
            exact = bool(rng.randint(2))
            score = None if rng.random() < 0.3 else float(rng.randint(70, 101))
            ref_cands[ref_candidate(norm, symbolic)] = LinkingMetrics(
                search_score=score, exact_match=exact
            )
            our_cands[our_candidate(norm, symbolic)] = (exact, score)
        match_norm = match_norms[rng.randint(len(match_norms))]
        for ref_mk, our_mk in pairs:
            ref_strat, our_strat = ref_mk(), our_mk()
            ref_out = ref_strat.filter_candidates("m", match_norm, None, ref_cands, "p")
            our_out = our_strat.filter_candidates("m", match_norm, None, our_cands, "p")
            ref_keys = sorted(c.synonym_norm for c in ref_out)
            our_keys = sorted(c.synonym_norm for c in our_out)
            assert our_keys == ref_keys, (
                case, type(ref_strat).__name__, match_norm, our_keys, ref_keys,
            )
            n_nonempty += bool(ref_keys)
    assert n_nonempty > 100  # the comparison is not vacuous


def test_disambiguation_ladder_differential_vs_reference():
    """MappingStrategy.disambiguate_if_required ladder (mapping
    strategies base, strategies.py:187-235): not-required short-circuit,
    no-strategies AMBIGUOUS, strategy resolution with its confidence,
    essential-unresolved empty set, and essential-resolved — identical
    outcomes on both sides."""
    import sys
    import types

    from tests.ref_shims import install_shims, load_reference_module

    install_shims()
    if "kazu.ontology_preprocessing.base" not in sys.modules:
        base = types.ModuleType("kazu.ontology_preprocessing.base")
        base.DEFAULT_LABEL = "default_label"
        sys.modules["kazu.ontology_preprocessing.base"] = base
    if "kazu.steps.linking.post_processing.disambiguation.context_scoring" not in sys.modules:
        cs = types.ModuleType("kazu.steps.linking.post_processing.disambiguation.context_scoring")

        class _Scorer:
            def __init__(self, *a, **k):
                raise NotImplementedError

        cs.TfIdfScorer = _Scorer
        cs.GildaTfIdfScorer = _Scorer
        sys.modules[
            "kazu.steps.linking.post_processing.disambiguation.context_scoring"
        ] = cs
    ref_disamb = load_reference_module(
        "ref_disamb", "kazu/steps/linking/post_processing/disambiguation/strategies.py"
    )
    sys.modules.setdefault(
        "kazu.steps.linking.post_processing.disambiguation.strategies", ref_disamb
    )
    ref_ms = load_reference_module(
        "ref_ms", "kazu/steps/linking/post_processing/mapping_strategies/strategies.py"
    )
    from kazu.data import (
        DisambiguationConfidence,
        EquivalentIdAggregationStrategy,
        EquivalentIdSet,
        LinkingCandidate,
        LinkingMetrics,
        StringMatchConfidence,
    )
    from kazu.database.in_memory_db import MetadataDatabase

    from kazu_ray import model as our_model
    from kazu_ray.lang import normalizer
    from kazu_ray.stages import mapping as our_mapping

    parser = "ladder_parser"
    MetadataDatabase().add_parser(
        parser,
        "disease",
        {
            "MONDO:10": {"default_label": "asthma"},
            "MONDO:11": {"default_label": "hay fever"},
            "MONDO:12": {"default_label": "eczema"},
        },
    )

    def ref_cand(norm, idsets):
        return LinkingCandidate(
            raw_synonyms=frozenset([norm]),
            synonym_norm=norm,
            parser_name=parser,
            is_symbolic=False,
            associated_id_sets=frozenset(
                EquivalentIdSet(frozenset(s)) for s in idsets
            ),
            aggregated_by=EquivalentIdAggregationStrategy.UNAMBIGUOUS,
        )

    def our_cand(norm, idsets):
        return our_model.LinkingCandidate(
            synonym_norm=norm,
            parser_name=parser,
            raw_synonyms=frozenset([norm]),
            is_symbolic=False,
            mapping_types=frozenset(),
            associated_id_sets=frozenset(frozenset(s) for s in idsets),
        )

    store = types.SimpleNamespace(
        parser_entity_class={parser: "disease"},
        default_label=lambda p, idx: {
            "MONDO:10": "asthma",
            "MONDO:11": "hay fever",
            "MONDO:12": "eczema",
        }[idx],
    )
    from kazu.data import Document

    ref_doc = Document.create_simple_document("irrelevant")
    our_doc = types.SimpleNamespace(runner=types.SimpleNamespace(store=store))

    norm = normalizer.normalize("asthma", "disease")

    single = [[("MONDO:10", "MONDO")]]
    multi = [[("MONDO:10", "MONDO")], [("MONDO:11", "MONDO")]]
    unresolvable = [[("MONDO:11", "MONDO")], [("MONDO:12", "MONDO")]]

    def ref_prefer():
        return [
            ref_disamb.PreferDefaultLabelMatchDisambiguationStrategy(
                DisambiguationConfidence.HIGHLY_LIKELY
            )
        ]

    def our_prefer():
        return [our_mapping.PreferDefaultLabelStrategy()]

    scenarios = [
        # (idsets, essential, with_strategies)
        (single, False, False),      # not required
        (multi, False, False),       # no strategies → AMBIGUOUS, all sets
        (multi, False, True),        # strategy resolves to MONDO:10
        (unresolvable, True, True),  # essential, unresolved → empty
        (multi, True, True),         # essential, resolved
    ]
    for idsets, essential, with_strats in scenarios:
        ref_strat = ref_ms.ExactMatchMappingStrategy(
            StringMatchConfidence.PROBABLE,
            disambiguation_strategies=ref_prefer() if with_strats else None,
            disambiguation_essential=essential,
        )
        our_strat = our_mapping.ExactMatchMappingStrategy(
            "PROBABLE",
            disamb_strategies=our_prefer() if with_strats else None,
            disamb_essential=essential,
        )
        ref_c = {ref_cand(norm, idsets): LinkingMetrics(exact_match=True)}
        our_c = {our_cand(norm, idsets): (True, None)}
        r_sets, r_name, r_conf = ref_strat.disambiguate_if_required(
            ref_c, ref_doc, parser, ent_match="asthma", ent_match_norm=norm
        )
        o_sets, o_name, o_conf = our_strat.disambiguate_if_required(
            our_c, our_doc, parser, "asthma", norm
        )
        r_sig = sorted(sorted(s.ids_and_source) for s in r_sets)
        o_sig = sorted(sorted(s) for s in o_sets)
        assert o_sig == r_sig, (idsets, essential, with_strats, o_sig, r_sig)
        # outcome labels align: not-required sentinel, strategy class
        # name, or None
        assert (o_name is None) == (r_name is None)
        if r_name == ref_ms.MappingStrategy.DISAMBIGUATION_NOT_REQUIRED:
            assert o_name == our_mapping.DISAMBIGUATION_NOT_REQUIRED
        elif r_name is not None:
            assert o_name == r_name  # both use the strategy class name
        # AMBIGUOUS vs resolved-confidence vs None agree in kind
        assert (o_conf is None) == (r_conf is None)
        if r_conf is DisambiguationConfidence.AMBIGUOUS:
            assert o_conf == our_mapping.AMBIG


def test_embedding_confirmation_strategy_differential_vs_reference():
    """StrongMatchWithEmbeddingConfirmation (the 6th mapping strategy,
    strategies.py:480-553): since the reference takes its
    complex_string_scorer as a parameter, both sides run the ENGINE's
    deterministic char-ngram scorer — making the differential exact,
    including the one-candidate-per-id-set selection order."""
    import sys
    import types

    from tests.ref_shims import install_shims, load_reference_module

    install_shims()
    if "kazu.ontology_preprocessing.base" not in sys.modules:
        base = types.ModuleType("kazu.ontology_preprocessing.base")
        base.DEFAULT_LABEL = "default_label"
        sys.modules["kazu.ontology_preprocessing.base"] = base
    if "kazu.steps.linking.post_processing.disambiguation.context_scoring" not in sys.modules:
        cs = types.ModuleType("kazu.steps.linking.post_processing.disambiguation.context_scoring")

        class _Scorer:
            def __init__(self, *a, **k):
                raise NotImplementedError

        cs.TfIdfScorer = _Scorer
        cs.GildaTfIdfScorer = _Scorer
        sys.modules[
            "kazu.steps.linking.post_processing.disambiguation.context_scoring"
        ] = cs
    ref_disamb = load_reference_module(
        "ref_disamb", "kazu/steps/linking/post_processing/disambiguation/strategies.py"
    )
    sys.modules.setdefault(
        "kazu.steps.linking.post_processing.disambiguation.strategies", ref_disamb
    )
    ref_ms = load_reference_module(
        "ref_ms", "kazu/steps/linking/post_processing/mapping_strategies/strategies.py"
    )
    from kazu.data import (
        EquivalentIdAggregationStrategy,
        EquivalentIdSet,
        LinkingCandidate,
        LinkingMetrics,
        StringMatchConfidence,
    )

    from kazu_ray import model as our_model
    from kazu_ray.lang.similarity import label_similarity_scorer
    from kazu_ray.stages import mapping as our_mapping

    rng = np.random.RandomState(17)
    surfaces = [
        "neck disease", "heck disease", "beck syndrome", "neck disorder",
        "cervical disease", "neck diseases",
    ]

    def ref_cand(norm, raws, idx):
        return LinkingCandidate(
            raw_synonyms=frozenset(raws),
            synonym_norm=norm,
            parser_name="p",
            is_symbolic=False,
            associated_id_sets=frozenset(
                [EquivalentIdSet(frozenset([(idx, "S")]))]
            ),
            aggregated_by=EquivalentIdAggregationStrategy.UNAMBIGUOUS,
        )

    def our_cand(norm, raws, idx):
        return our_model.LinkingCandidate(
            synonym_norm=norm,
            parser_name="p",
            raw_synonyms=frozenset(raws),
            is_symbolic=False,
            mapping_types=frozenset(),
            associated_id_sets=frozenset([frozenset([(idx, "S")])]),
        )

    ref_strat = ref_ms.StrongMatchWithEmbeddingConfirmationStringMatchingStrategy(
        StringMatchConfidence.PROBABLE,
        complex_string_scorer=label_similarity_scorer,
    )
    our_strat = our_mapping.StrongMatchWithEmbeddingConfirmationStrategy("PROBABLE")

    n_nonempty = 0
    for case in range(120):
        k = rng.randint(1, 5)
        picks = rng.choice(len(surfaces), size=k, replace=False)
        ref_c, our_c = {}, {}
        for j, ci in enumerate(picks):
            surf = surfaces[ci]
            raws = {surf} | ({surfaces[(ci + 1) % len(surfaces)]} if rng.randint(2) else set())
            score = float(rng.randint(75, 101))
            ref_c[ref_cand(surf.upper(), raws, f"ID:{ci}")] = LinkingMetrics(
                search_score=score
            )
            our_c[our_cand(surf.upper(), raws, f"ID:{ci}")] = (False, score)
        match = surfaces[rng.randint(len(surfaces))]
        ref_out = ref_strat.filter_candidates(match, match.upper(), None, ref_c, "p")
        our_out = our_strat.filter_candidates(match, match.upper(), None, our_c, "p")
        ref_keys = sorted(c.synonym_norm for c in ref_out)
        our_keys = sorted(c.synonym_norm for c in our_out)
        assert our_keys == ref_keys, (case, match, our_keys, ref_keys)
        n_nonempty += bool(ref_keys)
    assert n_nonempty > 40


# ---------------------------------------------------------------------------
# abbreviation detector char-matching core vs the actual reference
# ---------------------------------------------------------------------------


class _FakeToken:
    __slots__ = ("text", "text_with_ws")

    def __init__(self, text, ws=" "):
        self.text = text
        self.text_with_ws = text + ws

    def __len__(self):  # spacy Token: number of characters
        return len(self.text)


class _FakeSpan:
    """Duck-typed spacy Span: iteration/len/slicing over tokens, .text."""

    def __init__(self, toks):
        self._t = list(toks)

    def __iter__(self):
        return iter(self._t)

    def __len__(self):
        return len(self._t)

    def __getitem__(self, item):
        if isinstance(item, slice):
            return _FakeSpan(self._t[item])
        return self._t[item]

    @property
    def text(self):
        return " ".join(t.text for t in self._t)


def _mk_span(words):
    toks = [_FakeToken(w) for w in words[:-1]] + [_FakeToken(words[-1], ws="")]
    return _FakeSpan(toks)


def test_find_abbreviation_matches_reference():
    """Differential: the engine's _find_abbreviation (the Schwartz &
    Hearst char-matching core, docproc.py) vs the reference's
    find_abbreviation (kazu/utils/abbreviation_detector.py:88-151) on
    generated long/short pairs covering first-letter matches, internal
    letters, digits, non-alnum short-form chars, and misses."""
    import random

    from kazu_ray.stages.docproc import _find_abbreviation
    from tests.ref_shims import install_spacy_shims, load_reference_module

    install_spacy_shims()
    ref = load_reference_module("ref_abbrev", "kazu/utils/abbreviation_detector.py")

    rng = random.Random(42)
    vocab = [
        "acute", "lymphoblastic", "leukemia", "non", "small", "cell",
        "lung", "cancer", "type", "2", "diabetes", "mellitus", "tumor",
        "necrosis", "factor", "alpha", "receptor", "binding", "protein",
        "growth", "epidermal", "x-linked", "beta2",
    ]
    cases = []
    for _ in range(300):
        n = rng.randint(1, 6)
        words = [rng.choice(vocab) for _ in range(n)]
        # candidate short forms: initials, initials+noise, random letters
        initials = "".join(w[0] for w in words).upper()
        variants = [
            initials,
            initials + rng.choice(["s", "1", "-R"]),
            "".join(rng.choice("ABCDEFGXYZ2") for _ in range(rng.randint(1, 6))),
            (words[0][:2] + words[-1][:1]).upper(),
        ]
        for short in variants:
            cases.append((words, [short]))
    # reference regression pairs
    cases += [
        (["acute", "lymphoblastic", "leukemia"], ["ALL"]),
        (["non", "small", "cell", "lung", "cancer"], ["NSCLC"]),
        (["type", "2", "diabetes", "mellitus"], ["T2DM"]),
        (["tumor", "necrosis", "factor"], ["TNF-a"]),
        (["epidermal", "growth", "factor", "receptor"], ["EGFR"]),
        (["protein"], ["ZZZ"]),
    ]

    n_hits = 0
    for long_words, short_words in cases:
        got = _find_abbreviation(long_words, short_words)
        _short, ref_long = ref.find_abbreviation(
            _mk_span(long_words), _mk_span(short_words)
        )
        if ref_long is None:
            assert got is None, (long_words, short_words, got)
        else:
            assert got is not None, (long_words, short_words)
            assert long_words[got:] == [t.text for t in ref_long], (
                long_words,
                short_words,
                got,
            )
            n_hits += 1
    assert n_hits >= 50  # the case generator must actually exercise hits


def test_short_form_filter_matches_reference():
    from kazu_ray.stages.docproc import _short_form_ok
    from tests.ref_shims import install_spacy_shims, load_reference_module

    install_spacy_shims()
    ref = load_reference_module("ref_abbrev", "kazu/utils/abbreviation_detector.py")

    cases = [
        ["ALL"], ["T2DM"], ["a"], ["toolongword99"], ["123"], ["1a"],
        ["A1"], ["ab", "cd"], ["-x"], ["x-"], ["NSCLC"], ["??"], ["A?"],
        ["ab", "verylongtokenx"],
    ]
    for words in cases:
        ours = _short_form_ok(words, " ".join(words))
        theirs = ref.short_form_filter(_mk_span(words))
        assert ours == theirs, words


# ---------------------------------------------------------------------------
# concrete parser differentials: same fixture file through the ACTUAL
# reference parser class and the engine's port, frames must agree
# ---------------------------------------------------------------------------


import os

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _ref_parsers_module():
    from ref_shims import install_spacy_shims, load_reference_module

    install_spacy_shims()
    # earlier differentials stub kazu.ontology_preprocessing.base with a
    # constants-only module (their import chains predate the spacy
    # shims); the real base is importable here and strictly richer, so
    # evict the stub before loading parsers.py, which needs the real
    # OntologyParser
    stub = sys.modules.get("kazu.ontology_preprocessing.base")
    if stub is not None and not hasattr(stub, "OntologyParser"):
        del sys.modules["kazu.ontology_preprocessing.base"]
    return load_reference_module(
        "ref_parsers", "kazu/ontology_preprocessing/parsers.py"
    )


def _canon_frame(df):
    """Reduce either side to the canonical comparable set: the engine's
    _finalize strips/dedupes, so apply the identical reduction to the
    reference's raw parse_to_dataframe output."""
    out = df[["idx", "default_label", "syn", "mapping_type"]].copy()
    for c in out.columns:
        out[c] = out[c].astype("object").astype(str)
    out["syn"] = out["syn"].str.strip()
    return (
        out.drop_duplicates()
        .sort_values(["idx", "syn", "mapping_type"])
        .reset_index(drop=True)
    )


def test_mondo_parser_differential_vs_reference():
    import pandas as pd

    from kazu_ray.sources.ontology_tables import from_obograph_json

    ref = _ref_parsers_module()
    parser = ref.MondoOntologyParser(
        in_path=os.path.join(FIXTURES, "mondo_like.json"),
        entity_class="disease",
        name="MONDO",
    )
    ref_df = _canon_frame(parser.parse_to_dataframe())
    eng_df = _canon_frame(from_obograph_json(os.path.join(FIXTURES, "mondo_like.json")))
    pd.testing.assert_frame_equal(eng_df, ref_df)


def test_cellosaurus_parser_differential_vs_reference():
    import pandas as pd

    from kazu_ray.sources.ontology_tables import from_cellosaurus_obo

    ref = _ref_parsers_module()
    parser = ref.CellosaurusOntologyParser(
        in_path=os.path.join(FIXTURES, "cellosaurus_like.obo"),
        entity_class="cell_line",
        name="CELLOSAURUS",
    )
    ref_df = _canon_frame(parser.parse_to_dataframe())
    eng_df = _canon_frame(
        from_cellosaurus_obo(os.path.join(FIXTURES, "cellosaurus_like.obo"))
    )
    pd.testing.assert_frame_equal(eng_df, ref_df)

    # the custom id-grouping strategy: every id its own set
    from kazu_ray.ontology.build import score_and_group_ids_one_per_id

    ids = {("CVCL_0003", "CELLOSAURUS"), ("CVCL_9999", "CELLOSAURUS")}
    ref_sets, ref_agg = parser.score_and_group_ids(ids, is_symbolic=False)
    eng_sets, eng_agg = score_and_group_ids_one_per_id(ids, False, {})
    ref_plain = {frozenset(s.ids_and_source) for s in ref_sets}
    assert ref_plain == set(eng_sets)
    assert ref_agg.name == eng_agg == "CUSTOM"


def test_atc_parser_differential_vs_reference():
    import pandas as pd

    from kazu_ray.sources.ontology_tables import from_atc_classification

    ref = _ref_parsers_module()
    parser = ref.ATCDrugClassificationParser(
        in_path=os.path.join(FIXTURES, "atc_like.txt"),
        entity_class="drug",
        name="ATC",
    )
    ref_df = _canon_frame(parser.parse_to_dataframe())
    eng_df = _canon_frame(
        from_atc_classification(os.path.join(FIXTURES, "atc_like.txt"))
    )
    pd.testing.assert_frame_equal(eng_df, ref_df)


def test_hgnc_gene_parser_differential_vs_reference():
    import pandas as pd

    from kazu_ray.sources.ontology_tables import from_hgnc_complete_set_json

    ref = _ref_parsers_module()
    parser = ref.HGNCGeneOntologyParser(
        in_path=os.path.join(FIXTURES, "hgnc_complete_set_like.json"),
        entity_class="gene",
        name="HGNC",
    )
    ref_df = _canon_frame(parser.parse_to_dataframe())
    eng_df = _canon_frame(
        from_hgnc_complete_set_json(os.path.join(FIXTURES, "hgnc_complete_set_like.json"))
    )
    pd.testing.assert_frame_equal(eng_df, ref_df)


def test_meddra_parser_differential_vs_reference():
    import pandas as pd

    from kazu_ray.sources.ontology_tables import from_meddra_dir

    ref = _ref_parsers_module()
    parser = ref.MeddraOntologyParser(
        in_path=FIXTURES, entity_class="disease", name="MEDDRA"
    )
    ref_df = _canon_frame(parser.parse_to_dataframe())
    eng_df = _canon_frame(from_meddra_dir(FIXTURES, data_origin="meddra"))
    pd.testing.assert_frame_equal(eng_df, ref_df)


def test_tabular_and_gene_family_parser_differential_vs_reference():
    import pandas as pd

    from kazu_ray.sources.ontology_tables import from_hgnc_gene_family_tsv, from_tsv

    ref = _ref_parsers_module()
    tab = ref.TabularOntologyParser(
        in_path=os.path.join(FIXTURES, "drugs.tsv"),
        entity_class="drug",
        name="TAB",
        sep="\t",
    )
    pd.testing.assert_frame_equal(
        _canon_frame(from_tsv(os.path.join(FIXTURES, "drugs.tsv"), data_origin="t")),
        _canon_frame(tab.parse_to_dataframe()),
    )

    fam = ref.HGNCGeneFamilyParser(
        in_path=os.path.join(FIXTURES, "hgnc_gene_families.tsv"),
        entity_class="gene_family",
        name="HGNC_GENE_FAMILY",
    )
    pd.testing.assert_frame_equal(
        _canon_frame(from_hgnc_gene_family_tsv(os.path.join(FIXTURES, "hgnc_gene_families.tsv"))),
        _canon_frame(fam.parse_to_dataframe()),
    )


def _jsonl_dicts(path):
    import json

    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def test_opentargets_disease_differential_vs_reference():
    import pandas as pd

    from kazu_ray.sources.ontology_tables import from_opentargets_disease_jsonl

    ref = _ref_parsers_module()
    parser = ref.OpenTargetsDiseaseOntologyParser(
        in_path=FIXTURES,
        entity_class="disease",
        name="OPENTARGETS_DISEASE",
        allowed_therapeutic_areas=["MONDO_0024458"],
    )
    fixture = os.path.join(FIXTURES, "opentargets_disease_like.jsonl")
    ref_df = pd.DataFrame.from_records(
        parser.json_dict_to_parser_records(_jsonl_dicts(fixture))
    )
    eng_df = from_opentargets_disease_jsonl(
        fixture, allowed_therapeutic_areas=("MONDO_0024458",)
    )
    pd.testing.assert_frame_equal(_canon_frame(eng_df), _canon_frame(ref_df))
    # the per-record xref payload matches too (engine stores the sorted
    # set incl. the reference's ':' id fixup, applied there at
    # score_and_group time — parsers.py:186-188)
    import json as _json

    ref_xrefs = {
        r["idx"]: set(r["dbXRefs"]) | {r["idx"].replace("_", ":")}
        for r in parser.json_dict_to_parser_records(_jsonl_dicts(fixture))
    }
    eng_xrefs = {
        row["idx"]: set(_json.loads(row["xrefs"])) for _, row in eng_df.iterrows()
    }
    assert eng_xrefs == ref_xrefs


def test_opentargets_target_differential_vs_reference():
    import pandas as pd

    from kazu_ray.sources.ontology_tables import from_opentargets_target_jsonl

    ref = _ref_parsers_module()
    parser = ref.OpenTargetsTargetOntologyParser(
        in_path=FIXTURES,
        entity_class="gene",
        name="OPENTARGETS_TARGET",
        excluded_biotypes=["processed_pseudogene"],
    )
    fixture = os.path.join(FIXTURES, "opentargets_target_like.jsonl")
    ref_df = pd.DataFrame.from_records(
        parser.json_dict_to_parser_records(_jsonl_dicts(fixture))
    )
    eng_df = from_opentargets_target_jsonl(
        fixture, excluded_biotypes=("processed_pseudogene",)
    )
    pd.testing.assert_frame_equal(_canon_frame(eng_df), _canon_frame(ref_df))
    # annotation_score (the gene-ranking signal) matches per id
    ref_scores = dict(zip(ref_df["idx"], ref_df["annotation_score"]))
    eng_scores = dict(zip(eng_df["idx"], eng_df["annotation_score"]))
    assert eng_scores == ref_scores


def test_opentargets_molecule_differential_vs_reference():
    import pandas as pd

    from kazu_ray.sources.ontology_tables import from_opentargets_molecule_jsonl

    ref = _ref_parsers_module()
    parser = ref.OpenTargetsMoleculeOntologyParser(
        in_path=FIXTURES, entity_class="drug", name="OPENTARGETS_MOLECULE"
    )
    fixture = os.path.join(FIXTURES, "opentargets_molecule_like.jsonl")
    ref_df = pd.DataFrame.from_records(
        parser.json_dict_to_parser_records(_jsonl_dicts(fixture))
    )
    eng_df = from_opentargets_molecule_jsonl(fixture)
    pd.testing.assert_frame_equal(_canon_frame(eng_df), _canon_frame(ref_df))


def test_target_label_grouping_differential_vs_reference():
    """The OpenTargets target id-grouping strategy (group ambiguous
    Ensembl ids by IDENTICAL default label, ``parsers.py:332-368``)
    against the engine's score_and_group_ids_by_exact_label."""
    from kazu_ray.ontology.build import score_and_group_ids_by_exact_label

    ref = _ref_parsers_module()
    parser = ref.OpenTargetsTargetOntologyParser(
        in_path=FIXTURES,
        entity_class="gene",
        name="OT_TARGET_GROUPING",
    )
    # populate the reference's MetadataDatabase with default labels
    import importlib

    in_memory_db = importlib.import_module("kazu.database.in_memory_db")
    labels = {
        "ENSG1": "AKT1",
        "ENSG2": "AKT1",   # second locus of the same gene symbol
        "ENSG3": "BRCA2",
        "ENSG4": "AKT1",
        "ENSG5": "TP53",
    }
    in_memory_db.MetadataDatabase().add_parser(
        "OT_TARGET_GROUPING",
        "gene",
        {idx: {"default_label": lbl} for idx, lbl in labels.items()},
    )

    ids = {(i, "ENSEMBL") for i in labels}
    ref_sets, ref_agg = parser.score_and_group_ids(ids, is_symbolic=True)
    eng_sets, eng_agg = score_and_group_ids_by_exact_label(ids, True, labels)
    assert {frozenset(s.ids_and_source) for s in ref_sets} == set(eng_sets)
    assert ref_agg.name == eng_agg == "CUSTOM"
    # the three AKT1 loci share one set; BRCA2/TP53 are singletons
    sizes = sorted(len(s) for s in eng_sets)
    assert sizes == [1, 1, 3]


def test_chembl_sqlite_parser_differential_vs_reference(tmp_path):
    """ChemblOntologyParser (parsers.py:1098-1129) frame-equal vs the
    actual reference class over an in-test sqlite dump — with the edge
    cases the SQL semantics hinge on: null pref_name molecules dropped
    (synonyms and all), exact duplicate rows collapsed, pref_name rows
    self-unioned with their own mapping type, a molecule with no
    synonym rows still present via its pref_name row."""
    import sqlite3

    import pandas as pd

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
            (3, 'CHEMBL999', NULL),
            (4, 'CHEMBL1771', 'LONELY');
        INSERT INTO molecule_synonyms VALUES
            (1, 'acetylsalicylic acid', 'TRADE_NAME'),
            (1, 'ASA', 'OTHER'),
            (1, 'ASA', 'OTHER'),
            (1, 'ASA', 'TRADE_NAME'),
            (2, 'acetaminophen', 'OTHER'),
            (2, 'PARACETAMOL', 'OTHER'),
            (3, 'orphan syn', 'OTHER');
        """
    )
    conn.commit()
    conn.close()

    ref = _ref_parsers_module()
    parser = ref.ChemblOntologyParser(
        in_path=db, entity_class="drug", name="CHEMBL"
    )
    ref_df = _canon_frame(parser.parse_to_dataframe())
    eng_df = _canon_frame(from_chembl_sqlite(db))
    pd.testing.assert_frame_equal(eng_df, ref_df)
    assert parser.find_kb("anything") == "CHEMBL"


def test_chembl_parquet_parser_differential_vs_reference(tmp_path):
    """ChemblParquetOntologyParser (parsers.py:1132-1145) — the modern
    ChEMBL input — frame-equal vs the reference class on a parquet dump
    in the canonical column layout. (The reference reads the file raw
    and collapses duplicates later, during base-class syn_norm
    resolution; the engine's loader collapses at load via _finalize —
    net-equal downstream, so frame equality is asserted on a
    duplicate-free dump.)"""
    import pandas as pd

    from kazu_ray.sources.ontology_tables import from_canonical_parquet

    src = pd.DataFrame(
        {
            "idx": ["CHEMBL25", "CHEMBL25", "CHEMBL112"],
            "default_label": ["ASPIRIN", "ASPIRIN", "PARACETAMOL"],
            "syn": ["ASA", "ASPIRIN", "acetaminophen"],
            "mapping_type": ["OTHER", "pref_name", "OTHER"],
        }
    )
    pq_path = str(tmp_path / "chembl.parquet")
    src.to_parquet(pq_path)

    ref = _ref_parsers_module()
    parser = ref.ChemblParquetOntologyParser(
        in_path=pq_path, entity_class="drug", name="CHEMBL"
    )
    ref_df = _canon_frame(parser.parse_to_dataframe())
    eng_df = _canon_frame(from_canonical_parquet(pq_path))
    pd.testing.assert_frame_equal(eng_df, ref_df)
    assert parser.find_kb("anything") == "CHEMBL"
