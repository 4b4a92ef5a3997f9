"""Minimal Aho–Corasick automaton (pure Python).

The reference delegates to the ``pyahocorasick`` C extension
(``memory_efficient_string_matching.py:5,42-94``), which is not
available in this environment. This is a from-scratch implementation of
the classic algorithm (Aho & Corasick 1975, "Efficient string matching:
an aid to bibliographic search") with the same observable contract as
the subset of the ``ahocorasick.Automaton`` API the reference uses:
``add_word``, ``make_automaton``, and ``iter(haystack)`` yielding
``(end_index, value)`` for EVERY occurrence of every key, including
nested and overlapping matches.

Built once per matcher actor (``__init__``), then shared across all
batches that actor processes. For ontology-scale key sets (10^5-10^6)
build time is seconds and scan time is O(len(text)).
"""

from __future__ import annotations

from collections import deque
from typing import Any, Iterator


class Automaton:
    __slots__ = ("_goto", "_fail", "_out", "_built", "_emit_memo")

    def __init__(self) -> None:
        # node 0 is the root; _goto is a list of dicts char -> node
        self._goto: list[dict[str, int]] = [{}]
        self._out: list[list[tuple[int, Any]]] = [[]]  # node -> [(key_len, value)]
        self._fail: list[int] = [0]
        self._built = False
        # per-matcher emit-template cache (populated by the NER stage)
        self._emit_memo: dict[str, list] = {}

    def add_word(self, key: str, value: Any) -> None:
        if self._built:
            raise RuntimeError("automaton already built")
        node = 0
        for ch in key:
            nxt = self._goto[node].get(ch)
            if nxt is None:
                nxt = len(self._goto)
                self._goto.append({})
                self._out.append([])
                self._fail.append(0)
                self._goto[node][ch] = nxt
            node = nxt
        self._out[node].append((len(key), value))

    def make_automaton(self) -> None:
        # BFS to set failure links and merge output lists so that each
        # node's output includes all dict-suffix outputs — this is what
        # makes nested matches (e.g. "cancer" inside "breast cancer")
        # surface without walking fail chains at scan time.
        queue: deque[int] = deque()
        for node in self._goto[0].values():
            self._fail[node] = 0
            queue.append(node)
        while queue:
            cur = queue.popleft()
            for ch, nxt in self._goto[cur].items():
                queue.append(nxt)
                f = self._fail[cur]
                while f and ch not in self._goto[f]:
                    f = self._fail[f]
                self._fail[nxt] = self._goto[f].get(ch, 0)
                if self._fail[nxt] == nxt:
                    self._fail[nxt] = 0
                if self._out[self._fail[nxt]]:
                    self._out[nxt] = self._out[nxt] + self._out[self._fail[nxt]]
        self._built = True

    def iter(self, haystack: str) -> Iterator[tuple[int, Any]]:
        """Yield ``(end_index, value)`` for every key occurrence; end_index
        is the index of the match's LAST character (pyahocorasick
        convention, consumed at ``memory_efficient_string_matching.py:111-115``)."""
        if not self._built:
            raise RuntimeError("call make_automaton() first")
        goto = self._goto
        fail = self._fail
        out = self._out
        node = 0
        for i, ch in enumerate(haystack):
            while node and ch not in goto[node]:
                node = fail[node]
            node = goto[node].get(ch, 0)
            if out[node]:
                for _key_len, value in out[node]:
                    yield i, value

    def __len__(self) -> int:
        return sum(len(o) for o in self._out)


class SpanMatcher:
    """Token-span dictionary matcher — the scan-side replacement for the
    char automaton in this engine's NER hot path.

    Exploits the boundary contract: a hit only survives
    ``word_is_valid`` when it starts on a token start and ends on a
    token end (``kazu/utils/utils.py:204-207``), so the only candidate
    matches are token-aligned slices. The scan enumerates, for each
    token j, the slices spanning tokens j..k for k-j < max_token_span
    (the max token count of any key) and hash-probes them — O(n_tokens ×
    max_token_span) C-level dict lookups instead of an O(n_chars)
    pure-Python automaton walk (~6× faster on web-page text, identical
    output; equivalence is property-tested against :class:`Automaton` in
    ``tests/test_ontology_and_ner.py``).
    """

    __slots__ = ("_table", "_max_token_span", "_max_len", "_first", "_built", "_emit_memo")

    def __init__(self) -> None:
        # per-matcher emit-template cache (populated by the NER stage)
        self._emit_memo: dict[str, list] = {}
        self._table: dict[str, Any] = {}
        self._max_token_span = 1
        self._max_len = 0
        # first-token prefilter: maps each key's FIRST token to the max
        # character length of any key starting with it — most scan
        # positions fail this single probe, skipping the whole inner
        # k-loop (a match's first token must equal the doc token at the
        # scan position: slice bounds are doc token boundaries, so the
        # regex tokenization of the slice equals tokenizing the key)
        self._first: dict[str, int] = {}
        self._built = False

    def add_word(self, key: str, value: Any) -> None:
        self._table[key] = value

    def make_automaton(self) -> None:
        from kazu_ray.lang.tokens import tokenize

        for key in self._table:
            toks = tokenize(key)
            self._max_token_span = max(self._max_token_span, len(toks))
            self._max_len = max(self._max_len, len(key))
            if toks:
                first = toks[0][0]
                if len(key) > self._first.get(first, 0):
                    self._first[first] = len(key)
        self._built = True

    def scan(self, lower_text: str, toks: list[tuple[str, int, int]]) -> list[tuple[int, int, Any]]:
        """``(start, end_inclusive, value)`` for every key equal to a
        token-aligned slice of ``lower_text``. ``toks`` are the
        document's (token, start, end) triples (original case; offsets
        are what matter). Returns a list — a plain loop with cached
        bound methods measures ~20% faster than the generator form on
        corpus text, and this is the NER hot path."""
        tget = self._table.get
        fget = self._first.get
        max_span = self._max_token_span
        n = len(toks)
        out: list[tuple[int, int, Any]] = []
        append = out.append
        for j in range(n):
            tj = toks[j]
            s = tj[1]
            # per-first-token length bound doubles as the prefilter
            max_len = fget(lower_text[s : tj[2]])
            if max_len is None:
                continue
            kend = j + max_span
            if kend > n:
                kend = n
            for k in range(j, kend):
                e = toks[k][2]
                if e - s > max_len:
                    break
                value = tget(lower_text[s:e])
                if value is not None:
                    append((s, e - 1, value))
        return out

    def __len__(self) -> int:
        return len(self._table)
