"""Hand-rolled TF-IDF vectorizer (numpy).

sklearn is not available in this environment; this reimplements the
subset of ``TfidfVectorizer`` semantics the reference relies on
(``kazu/utils/link_index.py:123-139``,
``kazu/steps/linking/post_processing/disambiguation/context_scoring.py:49-89``):
custom analyzer, ``lowercase=False``, smooth idf
(``idf = ln((1+n)/(1+df)) + 1``), raw term counts, l2-normalised rows.
Matrices here are small (synonym-count × ngram-vocab) and dense.
"""

from __future__ import annotations

import numpy as np


def char_ngrams(s: str, n: int = 2) -> list[str]:
    """Char bigram analyzer (``kazu/utils/utils.py:143-181``)."""
    return [s[i : i + n] for i in range(len(s) - n + 1)]


def word_ngrams(s: str, n: int = 2) -> list[str]:
    words = s.split(" ")
    return [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]


def word_and_char_ngrams(s: str) -> list[str]:
    """Analyzer used for disambiguation context vectors
    (``context_scoring.py:23-47``): word 1-2-grams + char 2-3-grams."""
    out: list[str] = []
    for n in (1, 2):
        out.extend(word_ngrams(s, n))
    for n in (2, 3):
        out.extend(char_ngrams(s, n))
    return out


class TfidfVectorizer:
    def __init__(self, analyzer=char_ngrams):
        self.analyzer = analyzer
        self.vocab: dict[str, int] = {}
        self.idf: np.ndarray | None = None

    def fit(self, docs: list[str]) -> "TfidfVectorizer":
        df_counts: dict[str, int] = {}
        analyzed = []
        for doc in docs:
            grams = self.analyzer(doc)
            analyzed.append(grams)
            for g in set(grams):
                df_counts[g] = df_counts.get(g, 0) + 1
        self.vocab = {g: i for i, g in enumerate(sorted(df_counts))}
        n = len(docs)
        df = np.zeros(len(self.vocab))
        for g, c in df_counts.items():
            df[self.vocab[g]] = c
        self.idf = np.log((1.0 + n) / (1.0 + df)) + 1.0
        self._analyzed_fit_docs = analyzed
        return self

    def transform(self, docs: list[str]) -> np.ndarray:
        assert self.idf is not None, "fit first"
        mat = np.zeros((len(docs), len(self.vocab)), dtype=np.float64)
        for r, doc in enumerate(docs):
            grams = doc if isinstance(doc, list) else self.analyzer(doc)
            for g in grams:
                col = self.vocab.get(g)
                if col is not None:
                    mat[r, col] += 1.0
        mat *= self.idf
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        return mat / norms

    def fit_transform(self, docs: list[str]) -> np.ndarray:
        self.fit(docs)
        out = self.transform(self._analyzed_fit_docs)
        del self._analyzed_fit_docs
        return out
