"""Aho-corasick, tokenizer, TF-IDF, similarity kernel tests."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from kazu_ray.functions.ahocorasick import Automaton
from kazu_ray.functions.tfidf import TfidfVectorizer, char_ngrams
from kazu_ray.lang.similarity import entity_subtype_scorer, number_match_scorer
from kazu_ray.lang.tokens import sentence_spans, token_boundaries, word_is_valid


def test_automaton_overlapping_and_nested():
    a = Automaton()
    a.add_word("breast cancer", "BC")
    a.add_word("cancer", "C")
    a.add_word("east", "E")
    a.make_automaton()
    hits = sorted((end, val) for end, val in a.iter("breast cancer"))
    # nested: 'east' inside 'breast', 'cancer' inside 'breast cancer'
    assert (5, "E") in hits
    assert (12, "BC") in hits
    assert (12, "C") in hits


def test_automaton_multiple_occurrences():
    a = Automaton()
    a.add_word("ab", 1)
    a.make_automaton()
    assert len(list(a.iter("ababab"))) == 3


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet="abc", min_size=1, max_size=4), min_size=1, max_size=6),
       st.text(alphabet="abc", max_size=30))
def test_automaton_matches_bruteforce(keys, haystack):
    a = Automaton()
    keyset = set(keys)
    for k in keyset:
        a.add_word(k, k)
    a.make_automaton()
    got = sorted((end, val) for end, val in a.iter(haystack))
    expected = sorted(
        (i + len(k) - 1, k)
        for k in keyset
        for i in range(len(haystack))
        if haystack.startswith(k, i)
    )
    assert got == expected


def test_token_boundaries():
    text = "BRCA1/2 are oncogenes."
    starts, ends = token_boundaries(text)
    assert 0 in starts  # BRCA1
    assert word_is_valid(0, 4, starts, ends)  # 'BRCA1'
    assert not word_is_valid(1, 4, starts, ends)  # 'RCA1' mid-word
    assert word_is_valid(8, 10, starts, ends)  # 'are'


def test_sentence_spans_tile_text():
    text = "First sentence. Second one! Third? trailing bit"
    spans = sentence_spans(text)
    assert spans[0][0] == 0
    assert spans[-1][1] == len(text)
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 == s2
    assert len(spans) == 4


def test_tfidf_exact_match_scores_highest():
    docs = ["BREAST CANCER", "LUNG CANCER", "HEART DISEASE"]
    v = TfidfVectorizer(analyzer=char_ngrams)
    m = v.fit_transform(docs)
    q = v.transform(["BREAST CANCER"])[0]
    scores = m @ q
    assert np.argmax(scores) == 0
    assert abs(scores[0] - 1.0) < 1e-9  # self-cosine = 1


def test_boolean_scorers():
    assert number_match_scorer("TYPE 2 DIABETE", "DIABETE TYPE 2")
    assert not number_match_scorer("TYPE 2 DIABETE", "TYPE 1 DIABETE")
    assert entity_subtype_scorer("DIABETE", "DIABETE TYPE I")  # query may add types
    assert not entity_subtype_scorer("DIABETE TYPE I", "DIABETE")


def test_synonym_generators_reference_semantics():
    """The five newly-ported generators (synonym_generation.py:157-461)."""
    from kazu_ray.ontology.synonym_generation import (
        ngram_hyphenation,
        spelling_variation_replacement,
        stopword_remover,
        suffix_replacement,
        token_list_replacement,
        verb_phrase_variants,
    )

    # StopWordRemover: only fires when a stopword was present
    assert stopword_remover("cancer of the lung") == {"cancer lung"}
    assert stopword_remover("lung cancer") == set()

    # SuffixReplacement: every matching suffix swaps with every other,
    # NOT longest-match-only (reference docstring example)
    got = suffix_replacement("anaemia", frozenset({"ia", "a", "ic"}))
    assert "anaemic" in got  # ia -> ic
    assert "anaemiic" in got  # a -> ic (the documented noisy case)

    # SpellingVariationReplacement: whole string + per-token
    assert spelling_variation_replacement("tumour") == {"tumor"}
    assert "breast tumor" in spelling_variation_replacement("breast tumour")

    # NgramHyphenation: all dash variants of a 2-gram
    got = ngram_hyphenation("breast cancer")
    assert "breast-cancer" in got and len(got) > 1

    # TokenListReplacementGenerator: one token at a time
    got = token_list_replacement(
        "AST increased", [["increased", "increase", "elevated"]]
    )
    assert "AST elevated" in got and "AST increase" in got

    # VerbPhraseVariantGenerator: template x surface-form expansion
    got = verb_phrase_variants(
        "AST increased",
        tense_templates=["{NOUN} {TARGET}", "{TARGET} in {NOUN}"],
        lemmas_to_consider={"increase": ["increasing", "increased"]},
    )
    assert "increase in AST" in got
    assert "AST increasing" in got
    assert "increased in AST" in got


def test_url_canonicalization_idempotent_hypothesis():
    """canon(canon(x)) == canon(x) over generated URL-ish strings."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kazu_ray.ops.web import _canonical_series

    seg = st.text(
        alphabet="abcXYZ019-._~", min_size=0, max_size=8
    )

    @st.composite
    def urls(draw):
        scheme = draw(st.sampled_from(["http", "https", "HTTP"]))
        host = draw(st.sampled_from(["Example.ORG", "a.b.c", "x"]))
        path = "/".join(draw(st.lists(seg, max_size=3)))
        q = "&".join(
            draw(
                st.lists(
                    st.sampled_from(
                        ["utm_source=x", "gclid=1", "id=7", "a=b", "fbclid=z"]
                    ),
                    max_size=4,
                )
            )
        )
        frag = draw(st.sampled_from(["", "#f", "#x?y=1"]))
        url = f"{scheme}://{host}/{path}"
        if q:
            url += "?" + q
        return url + frag

    @given(st.lists(urls(), min_size=1, max_size=20))
    @settings(max_examples=200, deadline=None)
    def check(batch):
        s = pd.Series(batch)
        once = _canonical_series(s)
        twice = _canonical_series(once)
        assert list(once) == list(twice)
        # no tracking params or fragments survive
        assert not once.str.contains("utm_|gclid=|fbclid=|#", regex=True).any()

    check()


def test_bucket_ids_chunking_invariance():
    """bucket assignment must not depend on Arrow chunk layout — a
    repartition or block split cannot move a key to another bucket."""
    import pyarrow as pa

    from kazu_ray.functions.hashing import bucket_ids, bucket_of

    vals = [f"key{i}" for i in range(100)]
    flat = pa.chunked_array([pa.array(vals)])
    chunked = pa.chunked_array([pa.array(vals[:33]), pa.array(vals[33:71]), pa.array(vals[71:])])
    a = bucket_ids(flat, 16).tolist()
    b = bucket_ids(chunked, 16).tolist()
    assert a == b
    # the point-lookup path agrees with the column path
    assert a == [bucket_of(v, 16) for v in vals]


def test_bucket_ids_dtype_stable_with_nulls():
    """A nullable int batch must hash its non-null keys identically to a
    null-free batch (pandas float64 NaN-promotion must not leak into the
    hash), or a join/materialize splits a key across buckets."""
    import pyarrow as pa

    from kazu_ray.functions.hashing import bucket_ids

    clean = pa.chunked_array([pa.array([1, 2, 3, 400000], type=pa.int64())])
    with_null = pa.chunked_array([pa.array([1, None, 3, 400000], type=pa.int64())])
    a = bucket_ids(clean, 64).tolist()
    b = bucket_ids(with_null, 64).tolist()
    assert a[0] == b[0] and a[2] == b[2] and a[3] == b[3]
    # string nulls likewise co-locate deterministically
    s1 = bucket_ids(pa.chunked_array([pa.array(["x", "y"])]), 64).tolist()
    s2 = bucket_ids(pa.chunked_array([pa.array(["x", None])]), 64).tolist()
    assert s1[0] == s2[0]


def test_tokenizer_ports_reference_hyphen_rules():
    """Rule-level port of the reference's custom tokenizer
    (kazu/utils/spacy_pipeline.py:28-70), checked on the cases the
    reference's own comments document (spaCy itself is unavailable
    here, so this pins the rules rather than differentialing spacy):

    - hyphen infix removed: 'ALK-Abello' must stay ONE token so 'ALK'
      alone can't surface as a gene mention (spacy_pipeline.py:43-49)
    - numeric-operator infix kept: '2-3' splits (spacy_pipeline.py:32)
    - '/' and '(' are infixes: 'BRCA1/2' → three tokens
      (spacy_pipeline.py:64)
    - single-letter exceptions removed + uppercase-dot suffix added:
      sentence-final 'Haemophilia A.' yields a bare 'A' token
      (spacy_pipeline.py:52-70)
    """
    from kazu_ray.lang.tokens import token_boundaries, tokenize, word_is_valid

    def toks(s):
        return [t[0] for t in tokenize(s)]

    assert toks("ALK-Abello") == ["ALK-Abello"]
    assert toks("2-3") == ["2", "-", "3"]
    assert toks("PI3-kinase inhibitor") == ["PI3-kinase", "inhibitor"]
    assert toks("BRCA1/2") == ["BRCA1", "/", "2"]
    assert toks("see (EGFR) here") == ["see", "(", "EGFR", ")", "here"]
    assert toks("Haemophilia A.") == ["Haemophilia", "A", "."]

    # the downstream consequence the hyphen rule exists for: 'ALK' is
    # NOT a valid token-aligned match inside 'ALK-Abello'
    starts, ends = token_boundaries("ALK-Abello announced")
    assert not word_is_valid(0, 2, starts, ends)
    # ...but is valid as a standalone token
    starts, ends = token_boundaries("ALK fusion")
    assert word_is_valid(0, 2, starts, ends)


def test_sentencizer_vectors_vs_independent_predict():
    """Fixture-driven differential check of the sentencizer port
    (VERDICT r04 ask #7): ``tests/fixtures/sentencizer_vectors.json``
    vendors the token sequences the reference's custom spaCy tokenizer
    produces (derived from the published rules in
    kazu/utils/spacy_pipeline.py:28-84 — real spaCy cannot run in this
    container); this test runs an INDEPENDENT re-implementation of the
    published ``Sentencizer.predict`` loop
    (spacy/pipeline/sentencizer.pyx) over those tokens and asserts
    ``sentence_spans`` reproduces the resulting boundaries on the raw
    text — two separate implementations of the algorithm must agree."""
    import json
    import pathlib

    from kazu_ray.lang.tokens import _SENT_PUNCT_CHARS, sentence_spans

    vectors = json.loads(
        (pathlib.Path(__file__).parent / "fixtures" / "sentencizer_vectors.json")
        .read_text()
    )["vectors"]
    assert len(vectors) >= 10

    def predict(tokens):
        # spaCy Sentencizer.predict, verbatim semantics: token 0 starts
        # a sentence; after >=1 punct-chars token, the next non-punct
        # token starts one. punct test = whole-token membership.
        guesses = [False] * len(tokens)
        if tokens:
            guesses[0] = True
        seen_period = False
        for i, tok in enumerate(tokens):
            is_punct = tok in _SENT_PUNCT_CHARS
            if seen_period and not is_punct:
                guesses[i] = True
                seen_period = False
            elif is_punct:
                seen_period = True
        return guesses

    for v in vectors:
        text, tokens = v["text"], v["tokens"]
        # locate each vendored token in the text, in order
        offsets, pos = [], 0
        for tok in tokens:
            at = text.find(tok, pos)
            assert at >= 0, (text, tok)
            offsets.append(at)
            pos = at + len(tok)
        guesses = predict(tokens)
        starts = [offsets[i] for i, g in enumerate(guesses) if g]
        bounds = [0] + starts[1:] + [len(text)]
        want = list(zip(bounds, bounds[1:]))
        got = sentence_spans(text)
        assert got == want, (text, got, want)


def test_sentencizer_port_scenarios():
    """spaCy ``Sentencizer.predict`` port: hand-derived expectations for
    the tokenizer+sentencizer interplay the reference relies on
    (kazu/utils/spacy_pipeline.py:82-85). Each case lists the char
    offsets where sentences start."""
    from kazu_ray.lang.tokens import sentence_spans

    def starts(text):
        spans = sentence_spans(text)
        # tiling invariant first
        assert spans[0][0] == 0 and spans[-1][1] == len(text)
        for (_, e1), (s2, _) in zip(spans, spans[1:]):
            assert e1 == s2
        return [s for s, _ in spans]

    # ellipsis is ONE multi-char spaCy token -> never matches punct_chars
    assert starts("Wait... and see. Done") == [0, len("Wait... and see. ")]
    # word-internal dots (digit.digit, upper.upper) stay in-token
    assert starts("Dose was 3.5 mg daily. Next.") == [0, 23]
    assert starts("Made in the U.S.A. Next phase") == [0, 19]
    # the lower-before/upper-after infix DOES free the dot (spaCy
    # SPACY_DEFAULT_INFIXES) -> naive sentencizer splits p.V600E
    t = "mutation p.V600E found"
    assert starts(t) == [0, t.index("V600E")]
    # trailing dot after 'e.g' is a real suffix token -> splits (the
    # sentencizer is naive about abbreviations; faithfulness over taste)
    t = "drugs e.g. aspirin"
    assert starts(t) == [0, t.index("aspirin")]
    # the reference's added single-uppercase-dot suffix rationale
    t = "Haemophilia A. Another case"
    assert starts(t) == [0, t.index("Another")]
    # punct runs collapse to one boundary
    assert starts("Really?! Yes") == [0, len("Really?! ")]
    # CJK ideographic full stop is in punct_chars
    t = "你好。世界"
    assert starts(t) == [0, 3]
    # no terminator / degenerate inputs
    assert starts("no end here") == [0]
    assert sentence_spans("") == []
    assert sentence_spans("   ") == [(0, 3)]
