"""Transformer token-classification NER: the span-finder port.

The semantically hard part of the reference's default-pipeline ML step
is NOT the model forward pass — it is the pure-Python state machine
that turns per-token BIO confidences back into character-offset
entities:

* ``TokenizedWord`` / ``TokWordSpan`` containers
  (``kazu/steps/ner/tokenized_word_processor.py:16-42``),
* ``SimpleSpanFinder`` — BIO walk with span-breaking chars and
  nested-entity copy on a repeated B of the same class
  (``tokenized_word_processor.py:69-212``),
* ``MultilabelSpanFinder`` — per-label open/close sets
  (``tokenized_word_processor.py:215-317``),
* ``TokenizedWordProcessor`` — spans → entities with the
  trailing-space trim and the per-class suffix ``strip_re``
  ("COX2 gene" → "COX2", ``tokenized_word_processor.py:320-433``),
* the sliding-window frame assembly with half-stride trimming
  (``hf_token_classification.py:184-278``: interior frames drop
  ``stride/2`` tokens at each edge, so every token is scored by the
  frame where it has the most context).

All of that is ported here 1:1 on numpy arrays (no torch in this
environment). What IS substituted is the model: ``StubTokenClassifier``
produces deterministic one-hot "logits" shaped exactly like the HF
output — a word-level tagger marking gene-symbol-shaped words B-gene —
so the whole frame→word→span→entity path runs for real and is testable
(the reference does the same with its tiny checked-in ``tinybern``
model). A real checkpoint would replace only ``StubTokenClassifier``
with a forward pass; every downstream line stays.

Documented deviations from the reference (both are corrections of
offset artifacts, cited inline): the frame-final word's
``word_char_end`` uses the true last-token end instead of the
penultimate token's (``hf_token_classification.py:251-263`` — the bug
the trailing-space strip partially patches), and word fragments split
across a frame-trim boundary are merged back into whole words so no
mention is duplicated. The trailing-space strip itself is kept.
"""

from __future__ import annotations

import re
from copy import deepcopy
from dataclasses import dataclass, field

import numpy as np

ENTITY_OUTSIDE_SYMBOL = "O"  # kazu/data.py
ENTITY_START_SYMBOL = "B"

MODEL_NER_NAMESPACE = "TransformerTokenNer"

# default suffix strip rules, mirroring the reference test config
# (kazu/tests/test_tokenized_word_processor.py::test_strip_re)
DEFAULT_STRIP_RE = {"gene": r"( (gene|protein)s?)+$"}


@dataclass(slots=True)
class TokenizedWord:
    """A word, possibly split into multiple wordpiece tokens.
    Port of tokenized_word_processor.py:16-32 (Tensor → np.ndarray)."""

    token_ids: list[int]
    tokens: list[str]
    #: (n_tokens, n_labels) array of per-token label confidences
    token_confidences: np.ndarray
    token_offsets: list[tuple[int, int]]
    word_char_start: int
    word_char_end: int
    word_id: int
    #: optional precomputed per-token argmax label ids — when present,
    #: the span finders use these instead of re-running np.argmax per
    #: word (identical result; one vectorized pass per text instead of
    #: one numpy call per word)
    token_label_ids: tuple[int, ...] | None = None


@dataclass(slots=True)
class TokWordSpan:
    """A span of TokenizedWords representing one entity mention."""

    clazz: str
    tok_words: list[TokenizedWord] = field(default_factory=list)


class SimpleSpanFinder:
    """BIO span finder — port of tokenized_word_processor.py:69-212.

    Walks words sequentially; a span closes when any of the word's BIO
    classes is O or the preceding character is a span-breaking char; a
    repeated B of the same class inside an active span closes a COPY of
    the current span (nested-entity handling) while the original keeps
    extending.
    """

    def __init__(self, text: str, id2label: dict[int, str]):
        self.text = text
        self.active_spans: list[TokWordSpan] = []
        self.words: list[TokenizedWord] = []
        self.span_breaking_chars = {"(", ")", ";"}
        self.closed_spans: list[TokWordSpan] = []
        self.id2label = id2label

    def __call__(self, words: list[TokenizedWord]) -> list[TokWordSpan]:
        for word in words:
            self.process_next_word(word)
        self.close_spans()
        return self.closed_spans

    def get_bio_and_class_labels(self, word: TokenizedWord) -> set[tuple[str, str | None]]:
        bio_and_class_labels: set[tuple[str, str | None]] = set()
        if word.token_label_ids is not None:
            most_conf_index_per_token = word.token_label_ids
        else:
            most_conf_index_per_token = np.argmax(word.token_confidences, axis=1)
        for confidence_index in most_conf_index_per_token:
            bio_label = self.id2label[int(confidence_index)]
            if bio_label == ENTITY_OUTSIDE_SYMBOL:
                bio_and_class_labels.add((bio_label, None))
            else:
                bio, class_label = bio_label.split("-")
                bio_and_class_labels.add((bio, class_label))
        return bio_and_class_labels

    def _update_active_spans(self, bio_and_class_labels, word: TokenizedWord) -> None:
        for span in self.active_spans:
            for bio, c in bio_and_class_labels:
                if bio == ENTITY_START_SYMBOL and c == span.clazz:
                    # start of another entity of the same class: close a
                    # copy, keep the original span open (nested entities)
                    self.closed_spans.append(deepcopy(span))
                if c == span.clazz:
                    span.tok_words.append(word)

    def start_span(self, bio_and_class_labels, word: TokenizedWord) -> None:
        for bio, clazz in bio_and_class_labels:
            if bio == ENTITY_START_SYMBOL and clazz is not None:
                self.active_spans.append(TokWordSpan(clazz=clazz, tok_words=[word]))

    def close_spans(self) -> None:
        for active_span in self.active_spans:
            if len(active_span.tok_words) > 0:
                self.closed_spans.append(active_span)
        self.active_spans = []

    def span_continue_condition(self, word: TokenizedWord, bio_and_class_labels) -> bool:
        classes_set = set(x[1] for x in bio_and_class_labels)
        if (
            None in classes_set
            or self.text[word.word_char_start - 1] in self.span_breaking_chars
        ):
            return False
        return True

    def process_next_word(self, word: TokenizedWord) -> None:
        bio_and_class_labels = self.get_bio_and_class_labels(word)
        if not self.words or len(self.active_spans) == 0:
            self.start_span(bio_and_class_labels, word)
        elif self.span_continue_condition(word, bio_and_class_labels):
            self._update_active_spans(bio_and_class_labels, word)
        else:
            self.close_spans()
            self.start_span(bio_and_class_labels, word)
        self.words.append(word)


class MultilabelSpanFinder:
    """Multi-label span finder — port of tokenized_word_processor.py:215-317.
    Labels are plain class names; a token carries every label whose
    confidence is > 0 (the reference heavisides logits to 0/1)."""

    def __init__(self, text: str, id2label: dict[int, str]):
        self.text = text
        self.active_spans: list[TokWordSpan] = []
        self.words: list[TokenizedWord] = []
        self.span_breaking_chars = {"(", ")", ";"}
        self.closed_spans: list[TokWordSpan] = []
        self.id2label = id2label
        self.active_labels: set[str] = set()

    def __call__(self, words: list[TokenizedWord]) -> list[TokWordSpan]:
        for word in words:
            self.process_next_word(word)
        for clazz in set(self.active_labels):
            self.close_spans(clazz)
        return self.closed_spans

    def get_class_labels(self, word: TokenizedWord) -> set[str]:
        class_labels: set[str] = set()
        label_indices_above_threshold = np.argwhere(word.token_confidences > 0)[:, 1]
        for label_index in label_indices_above_threshold:
            class_label = self.id2label[int(label_index)]
            if class_label != ENTITY_OUTSIDE_SYMBOL:
                class_labels.add(class_label)
        return class_labels

    def _update_active_spans(self, class_label: str, word: TokenizedWord) -> None:
        for span in self.active_spans:
            if class_label == span.clazz:
                span.tok_words.append(word)

    def start_span(self, class_label: str, word: TokenizedWord) -> None:
        self.active_spans.append(TokWordSpan(clazz=class_label, tok_words=[word]))
        self.active_labels.add(class_label)

    def close_spans(self, class_label: str) -> None:
        for active_span in list(self.active_spans):
            if class_label == active_span.clazz:
                self.closed_spans.append(active_span)
                self.active_spans.remove(active_span)
                self.active_labels.remove(class_label)

    def span_continue_condition(self, word: TokenizedWord, class_labels: set[str]) -> bool:
        if (
            not class_labels
            or self.text[word.word_char_start - 1] in self.span_breaking_chars
        ):
            return False
        return True

    def process_next_word(self, word: TokenizedWord) -> None:
        class_labels = self.get_class_labels(word)
        new_labels = class_labels.difference(self.active_labels)
        for new_label in new_labels:
            self.start_span(new_label, word)
        for finished_label in self.active_labels.difference(class_labels):
            self.close_spans(finished_label)
        current_labels = class_labels.intersection(self.active_labels).difference(new_labels)
        if self.span_continue_condition(word, current_labels):
            for current_label in current_labels:
                self._update_active_spans(current_label, word)
        self.words.append(word)


class TokenizedWordProcessor:
    """Spans → entity dicts — port of tokenized_word_processor.py:320-433.
    Emits the engine's dict-based entity representation instead of the
    reference's Entity dataclass; field semantics are identical."""

    def __init__(self, labels, use_multilabel: bool = False, strip_re: dict | None = None):
        self.use_multilabel = use_multilabel
        self.id2label = {idx: label for idx, label in enumerate(labels)}
        self.strip_re = (
            {k: re.compile(v) for k, v in strip_re.items()} if strip_re is not None else None
        )

    def make_span_finder(self, text: str):
        if self.use_multilabel:
            return MultilabelSpanFinder(text, self.id2label)
        return SimpleSpanFinder(text, self.id2label)

    def __call__(self, words: list[TokenizedWord], text: str, namespace: str) -> list[dict]:
        span_finder = self.make_span_finder(text)
        spans = span_finder(words)
        return self.spans_to_entities(spans, text, namespace)

    def spans_to_entities(self, spans: list[TokWordSpan], text: str, namespace: str) -> list[dict]:
        entities = []
        for span in spans:
            start, end = self.calculate_span_offsets(span.tok_words)
            match_str = text[start:end]
            # the tokenizer sometimes messes up offsets: strip a trailing
            # space (see module docstring on the frame-final-word quirk)
            if (
                len(match_str) > 1
                and match_str[-1] == " "
                and any(char.isalpha() for char in match_str)
            ):
                end = end - 1
            match_str = text[start:end]
            match_str, end = self.attempt_strip_suffixes(start, end, match_str, span.clazz)
            entities.append(
                {
                    "start": start,
                    "end": end,
                    "match": match_str,
                    "entity_class": span.clazz,
                    "namespace": namespace,
                }
            )
        return entities

    def calculate_span_offsets(self, words: list[TokenizedWord]) -> tuple[int, int]:
        starts, ends = [], []
        for word in words:
            starts.append(word.word_char_start)
            ends.append(word.word_char_end)
        return min(starts), max(ends) + 1

    def attempt_strip_suffixes(self, start, end, match_str, clazz):
        if self.strip_re is not None:
            suffixes_re = self.strip_re.get(clazz)
            if suffixes_re is not None:
                match_str = suffixes_re.sub("", match_str)
                end = len(match_str) + start
        return match_str, end


# ---------------------------------------------------------------------------
# deterministic "model": wordpiece-ish tokenizer + sliding-window framing
# + one-hot tagger, shaped exactly like the HF path
# ---------------------------------------------------------------------------

# word tokenizer: alphanumeric runs with optional /digit continuations
# (so "BRCA1/2" is one word, like a sentencepiece-style tokenizer keeps it)
_WORD_RE = re.compile(r"\w+(?:/\d+)*")
# the stub model's concept of a gene symbol (same shape the regex stub
# used, so the corpus P/R characteristics carry over)
_GENE_WORD_RE = re.compile(r"[A-Z]{2,6}[0-9]{0,3}(?:/[0-9]{1,3})*")

_PIECE_LEN = 4  # wordpiece length: words longer than this split


class StubTokenClassifier:
    """Deterministic stand-in for the HF forward pass: per-token one-hot
    confidences over BIO labels. A word's every token gets the word's
    label (argmax-per-token then agrees, like a well-trained model)."""

    labels = (ENTITY_OUTSIDE_SYMBOL, "B-gene", "I-gene")

    def word_label_id(self, word_text: str) -> int:
        return 1 if _GENE_WORD_RE.fullmatch(word_text) else 0

    def confidences(self, token_word_texts: list[str]) -> np.ndarray:
        """(n_tokens, n_labels) one-hot array, given each token's parent
        word text."""
        out = np.zeros((len(token_word_texts), len(self.labels)), dtype=np.float32)
        for i, w in enumerate(token_word_texts):
            out[i, self.word_label_id(w)] = 1.0
        return out


def _tokenize(text: str):
    """text → token stream [(word_id, token_str, (start, end))], words
    split into wordpieces of ≤ _PIECE_LEN chars (exclusive-end offsets,
    like HF fast tokenizers)."""
    tokens = []
    for word_id, m in enumerate(_WORD_RE.finditer(text)):
        w, ws = m.group(), m.start()
        for p in range(0, len(w), _PIECE_LEN):
            piece = w[p : p + _PIECE_LEN]
            tokens.append((word_id, piece, (ws + p, ws + p + len(piece)), w))
    return tokens


def _frames(n_tokens: int, max_sequence_length: int, stride: int):
    """Sliding-window frame spans over the token stream — HF
    return_overflowing_tokens semantics: content capacity = max_len - 2
    (cls/sep), consecutive frames overlap by ``stride`` tokens."""
    capacity = max_sequence_length - 2
    if n_tokens <= capacity:
        return [(0, n_tokens)]
    step = capacity - stride
    frames = []
    start = 0
    while True:
        end = min(start + capacity, n_tokens)
        frames.append((start, end))
        if end >= n_tokens:
            break
        start += step
    return frames


class DeterministicTransformerNer:
    """The full frame→word→span-finder→entity path with the stub model.

    Mirrors ``TransformersModelForTokenClassificationNerStep``
    (hf_token_classification.py:64-352): tokenize with overflow frames
    (max_seq 128 / stride 16 defaults per the reference config), score
    each frame, trim half-stride context from interior frame edges,
    reassemble TokenizedWords, run the span finder, strip suffixes.
    """

    def __init__(
        self,
        max_sequence_length: int = 128,
        stride: int = 16,
        use_multilabel: bool = False,
        strip_re: dict | None = None,
    ):
        self.max_sequence_length = max_sequence_length
        self.stride = stride
        self.model = StubTokenClassifier()
        self.processor = TokenizedWordProcessor(
            labels=self.model.labels,
            use_multilabel=use_multilabel,
            strip_re=DEFAULT_STRIP_RE if strip_re is None else strip_re,
        )
        # hot-path memos: word text → label id (Zipf vocabulary reuse),
        # and shared one-hot confidence arrays keyed by (label, n_tokens)
        # — every word with the same label/piece-count shares ONE array
        self._word_label_memo: dict[str, int] = {}
        self._conf_memo: dict[tuple[int, int], np.ndarray] = {}

    def _label_id(self, word_text: str) -> int:
        lid = self._word_label_memo.get(word_text)
        if lid is None:
            if len(self._word_label_memo) > 1_000_000:
                self._word_label_memo.clear()
            lid = self.model.word_label_id(word_text)
            self._word_label_memo[word_text] = lid
        return lid

    def _conf_array(self, label_id: int, n_tokens: int) -> np.ndarray:
        key = (label_id, n_tokens)
        arr = self._conf_memo.get(key)
        if arr is None:
            arr = np.zeros((n_tokens, len(self.model.labels)), dtype=np.float32)
            arr[:, label_id] = 1.0
            arr.setflags(write=False)
            self._conf_memo[key] = arr
        return arr

    def _frame_to_tok_words(
        self,
        tokens,
        label_ids: list[int] | None,
        frame_span: tuple[int, int],
        frame_index: int,
        number_of_frames: int,
        conf_rows: np.ndarray | None = None,
    ) -> list[TokenizedWord]:
        """Port of frame_to_tok_word (hf_token_classification.py:184-278)
        including the stride trimming and the frame-final-word offset
        quirk. Indices here address the content tokens directly (the
        cls/sep slots the reference slices away never exist).

        ``conf_rows``: optional REAL per-token confidence rows aligned
        with the global token stream (the torch path,
        :class:`TorchTransformerNer`) — words then carry model
        confidences and ``token_label_ids=None`` so the span finders
        argmax the real distribution, exactly like the reference."""
        half_stride = int(self.stride / 2)
        fstart, fend = frame_span
        n = fend - fstart
        if number_of_frames == 1:
            lo, hi = 0, n
        elif frame_index == 0:
            lo, hi = 0, n - half_stride
        elif frame_index == number_of_frames - 1:
            lo, hi = half_stride, n
        else:
            lo, hi = half_stride, n - half_stride

        frame_tokens = tokens[fstart + lo : fstart + hi]
        frame_labels = (
            label_ids[fstart + lo : fstart + hi] if label_ids is not None else None
        )

        def _mk_word(a: int, b: int, wid: int, w_start: int, w_end: int) -> TokenizedWord:
            if conf_rows is not None:
                return TokenizedWord(
                    token_ids=list(range(a, b)),
                    tokens=[t[1] for t in frame_tokens[a:b]],
                    token_confidences=conf_rows[fstart + lo + a : fstart + lo + b],
                    token_offsets=[t[2] for t in frame_tokens[a:b]],
                    word_char_start=w_start,
                    word_char_end=w_end,
                    word_id=wid,
                    token_label_ids=None,
                )
            labels = tuple(frame_labels[a:b])
            if len(set(labels)) == 1:
                conf = self._conf_array(labels[0], b - a)
            else:
                conf = np.zeros((b - a, len(self.model.labels)), dtype=np.float32)
                for r, lid in enumerate(labels):
                    conf[r, lid] = 1.0
            return TokenizedWord(
                token_ids=list(range(a, b)),
                tokens=[t[1] for t in frame_tokens[a:b]],
                token_confidences=conf,
                token_offsets=[t[2] for t in frame_tokens[a:b]],
                word_char_start=w_start,
                word_char_end=w_end,
                word_id=wid,
                token_label_ids=labels,
            )

        all_words: list[TokenizedWord] = []
        prev_word_id = None
        word_id_index_start, offset_start, offset_end = 0, 0, 0
        last = len(frame_tokens) - 1
        for i, (word_id, tok_str, (t_start, t_end), _w) in enumerate(frame_tokens):
            if word_id != prev_word_id:
                if prev_word_id is not None:
                    all_words.append(
                        _mk_word(
                            word_id_index_start, i, prev_word_id, offset_start, offset_end - 1
                        )
                    )
                word_id_index_start = i
                offset_start, offset_end = t_start, t_end
            if i == last and word_id is not None:
                # deviation from hf_token_classification.py:260, which
                # uses the penultimate token's offset end here
                # (truncating/overrunning frame-final words by one piece —
                # the bug the trailing-space strip partially patches);
                # this engine's contract is exact offsets, so use the
                # true last-token end
                all_words.append(
                    _mk_word(word_id_index_start, i + 1, word_id, offset_start, t_end - 1)
                )
            offset_end = t_end
            prev_word_id = word_id
        return all_words

    def words_for_text(self, text: str) -> list[TokenizedWord]:
        tokens = _tokenize(text)
        if not tokens:
            return []
        label_ids = [self._label_id(t[3]) for t in tokens]
        return self._assemble_words(tokens, label_ids)

    def _assemble_words(
        self, tokens, label_ids, conf_rows: np.ndarray | None = None
    ) -> list[TokenizedWord]:
        frames = _frames(len(tokens), self.max_sequence_length, self.stride)
        words: list[TokenizedWord] = []
        for frame_index, frame_span in enumerate(frames):
            words.extend(
                self._frame_to_tok_words(
                    tokens, label_ids, frame_span, frame_index, len(frames),
                    conf_rows=conf_rows,
                )
            )
        if len(frames) == 1:
            return words  # no trim boundaries → no split fragments
        # a word whose pieces straddle a frame-trim boundary appears as
        # two fragments (one per frame); merge consecutive same-word_id
        # fragments back into whole words so no mention is duplicated
        merged: list[TokenizedWord] = []
        for w in words:
            if merged and merged[-1].word_id == w.word_id:
                prev = merged[-1]
                prev.token_ids = prev.token_ids + w.token_ids
                prev.tokens = prev.tokens + w.tokens
                prev.token_confidences = np.vstack(
                    [prev.token_confidences, w.token_confidences]
                )
                prev.token_offsets = prev.token_offsets + w.token_offsets
                prev.word_char_start = min(prev.word_char_start, w.word_char_start)
                prev.word_char_end = max(prev.word_char_end, w.word_char_end)
                if prev.token_label_ids is not None and w.token_label_ids is not None:
                    prev.token_label_ids = prev.token_label_ids + w.token_label_ids
                else:
                    prev.token_label_ids = None
            else:
                merged.append(w)
        return merged

    def _labeled_runs_from_words(self, word_matches, word_labels):
        """Maximal runs of consecutively-labeled words (label != O),
        each built as a full TokenizedWord with exact offsets.
        Wordpieces are materialized here, ONLY for labeled words — the
        unlabeled majority never pays piece-splitting.

        Sparse-driver optimization, valid for single-label one-hot
        output: an O word can neither start a span (``start_span``
        requires B) nor extend one (``span_continue_condition`` fails on
        O), so the full per-word walk visits unlabeled words only to
        close spans — which closing at each run end reproduces exactly.
        ``test_token_ner.py::test_sparse_driver_matches_full_walk`` holds
        the equivalence against the ported full walk.
        """
        runs: list[list[TokenizedWord]] = []
        current: list[TokenizedWord] = []
        for word_id, (w, ws, lid) in enumerate(zip(*word_matches, word_labels)):
            if lid != 0:
                n_pieces = (len(w) + _PIECE_LEN - 1) // _PIECE_LEN
                offsets = [
                    (ws + p, ws + min(p + _PIECE_LEN, len(w)))
                    for p in range(0, len(w), _PIECE_LEN)
                ]
                word = TokenizedWord(
                    token_ids=list(range(n_pieces)),
                    tokens=[w[p : p + _PIECE_LEN] for p in range(0, len(w), _PIECE_LEN)],
                    token_confidences=self._conf_array(lid, n_pieces),
                    token_offsets=offsets,
                    word_char_start=ws,
                    word_char_end=ws + len(w) - 1,
                    word_id=word_id,
                    token_label_ids=(lid,) * n_pieces,
                )
                current.append(word)
            elif current:
                runs.append(current)
                current = []
        if current:
            runs.append(current)
        return runs

    def __call__(self, text: str) -> list[dict]:
        """text → model-NER entity dicts (start/end/match/class/namespace)."""
        if self.processor.use_multilabel:
            tokens = _tokenize(text)
            if not tokens:
                return []
            label_ids = [self._label_id(t[3]) for t in tokens]
            words = self._assemble_words(tokens, label_ids)
            return self.processor(words, text, MODEL_NER_NAMESPACE)
        # sparse driver: word-level first (pieces only for labeled words)
        if _GENE_WORD_RE.search(text) is None:
            # conservative C-level prefilter: a word can only be labeled
            # if the gene pattern occurs SOMEWHERE in the text (a
            # fullmatch implies a search hit), so a miss skips the whole
            # per-word walk; a non-word-aligned hit just falls through
            return []
        # label check over findall output first: findall returns plain
        # strings from one C-level pass (no match objects), and the
        # memo-hit comprehension needs only the word text — so docs
        # with no labeled word (and the early labels themselves) never
        # pay per-match method calls
        words = _WORD_RE.findall(text)
        if not words:
            return []
        memo = self._word_label_memo
        try:
            word_labels = [memo[w] for w in words]
        except KeyError:  # cold words: take the memo-filling slow path
            word_labels = [self._label_id(w) for w in words]
        if not any(word_labels):
            return []  # fast path: no tagged word anywhere in the text
        # one finditer pass fused with run construction: match-object
        # calls (.start()) happen only for the rare LABELED words; the
        # runs produced are exactly _labeled_runs_from_words' (the
        # equivalence test drives this path against the full walk)
        finder = self.processor.make_span_finder(text)
        process_next_word = finder.process_next_word
        close_spans = finder.close_spans
        in_run = False
        for word_id, m in enumerate(_WORD_RE.finditer(text)):
            lid = word_labels[word_id]
            if lid:
                w = words[word_id]
                ws = m.start()
                n_pieces = (len(w) + _PIECE_LEN - 1) // _PIECE_LEN
                offsets = [
                    (ws + p, ws + min(p + _PIECE_LEN, len(w)))
                    for p in range(0, len(w), _PIECE_LEN)
                ]
                process_next_word(
                    TokenizedWord(
                        token_ids=list(range(n_pieces)),
                        tokens=[
                            w[p : p + _PIECE_LEN]
                            for p in range(0, len(w), _PIECE_LEN)
                        ],
                        token_confidences=self._conf_array(lid, n_pieces),
                        token_offsets=offsets,
                        word_char_start=ws,
                        word_char_end=ws + len(w) - 1,
                        word_id=word_id,
                        token_label_ids=(lid,) * n_pieces,
                    )
                )
                in_run = True
            elif in_run:
                close_spans()
                in_run = False
        if in_run:
            close_spans()
        return self.processor.spans_to_entities(
            finder.closed_spans, text, MODEL_NER_NAMESPACE
        )


class TorchTokenClassifier:
    """REAL token-classification forward pass behind a lazy torch
    import — the stub/real swap seam (reference:
    ``kazu/steps/ner/hf_token_classification.py:64-352``). Loads a
    TorchScript module (``torch.jit.load``) plus a JSON sidecar at
    ``<checkpoint>.json`` carrying ``labels`` (BIO strings in logit
    order), ``vocab`` (wordpiece → input id), and optional ``unk_id`` /
    ``pad_id``. Raises a clear ImportError when torch is absent (this
    container ships none — the deterministic stub then stays the
    default, selected by config, not code)."""

    def __init__(self, checkpoint_path: str):
        try:
            import torch

            torch.jit.load  # a jit-less module is a shim, not torch
        except (ImportError, AttributeError) as e:
            raise ImportError(
                "TorchTokenClassifier needs torch, which is not installed; "
                "unset KAZU_TOKEN_NER_MODEL to use the deterministic stub"
            ) from e
        import json
        import pathlib

        self._torch = torch
        self.module = torch.jit.load(str(checkpoint_path), map_location="cpu")
        self.module.eval()
        sidecar = json.loads(
            pathlib.Path(str(checkpoint_path) + ".json").read_text()
        )
        self.labels = tuple(sidecar["labels"])
        self.vocab: dict[str, int] = dict(sidecar["vocab"])
        self.unk_id = int(sidecar.get("unk_id", 0))
        self.pad_id = int(sidecar.get("pad_id", 0))

    def encode(self, pieces: list[str]) -> list[int]:
        v, u = self.vocab, self.unk_id
        return [v.get(p, u) for p in pieces]

    def frame_confidences(self, frames_ids: list[list[int]]) -> list[np.ndarray]:
        """One BATCHED forward over a document's frames → per-frame
        (frame_len, n_labels) softmax confidence arrays (the per-doc
        batching the reference gets from its DataLoader)."""
        torch = self._torch
        width = max(len(f) for f in frames_ids)
        ids = torch.full((len(frames_ids), width), self.pad_id, dtype=torch.long)
        mask = torch.zeros((len(frames_ids), width), dtype=torch.long)
        for i, f in enumerate(frames_ids):
            ids[i, : len(f)] = torch.tensor(f, dtype=torch.long)
            mask[i, : len(f)] = 1
        with torch.no_grad():
            logits = self.module(ids, mask)
            if isinstance(logits, (tuple, list)):
                logits = logits[0]
            conf = torch.softmax(logits.float(), dim=-1).cpu().numpy()
        return [
            conf[i, : len(f)].astype(np.float32) for i, f in enumerate(frames_ids)
        ]


class TorchTransformerNer(DeterministicTransformerNer):
    """:class:`DeterministicTransformerNer` with the stub forward pass
    swapped for a real checkpoint: same tokenizer, same overflow
    frames, same stride trimming, same word assembly and span finders —
    only ``token_confidences`` now come from the model, and
    ``token_label_ids`` stays ``None`` so the finders argmax the real
    distribution (reference hf_token_classification.py:280-352)."""

    def __init__(
        self,
        classifier: TorchTokenClassifier,
        max_sequence_length: int = 128,
        stride: int = 16,
        use_multilabel: bool = False,
        strip_re: dict | None = None,
    ):
        super().__init__(max_sequence_length, stride, use_multilabel, strip_re)
        self.model = classifier
        self.processor = TokenizedWordProcessor(
            labels=classifier.labels,
            use_multilabel=use_multilabel,
            strip_re=DEFAULT_STRIP_RE if strip_re is None else strip_re,
        )

    def words_for_text(self, text: str) -> list[TokenizedWord]:
        tokens = _tokenize(text)
        if not tokens:
            return []
        frames = _frames(len(tokens), self.max_sequence_length, self.stride)
        piece_ids = self.model.encode([t[1] for t in tokens])
        frame_conf = self.model.frame_confidences(
            [piece_ids[s:e] for s, e in frames]
        )
        # global per-token confidence rows: each token's row comes from
        # the frame that OWNS it after half-stride trimming (the same
        # lo/hi windows _frame_to_tok_words applies)
        half_stride = int(self.stride / 2)
        conf_rows = np.zeros(
            (len(tokens), len(self.model.labels)), dtype=np.float32
        )
        for fi, ((fs, fe), conf) in enumerate(zip(frames, frame_conf)):
            n = fe - fs
            if len(frames) == 1:
                lo, hi = 0, n
            elif fi == 0:
                lo, hi = 0, n - half_stride
            elif fi == len(frames) - 1:
                lo, hi = half_stride, n
            else:
                lo, hi = half_stride, n - half_stride
            conf_rows[fs + lo : fs + hi] = conf[lo:hi]
        return self._assemble_words(tokens, None, conf_rows=conf_rows)

    def __call__(self, text: str) -> list[dict]:
        return self.processor(self.words_for_text(text), text, MODEL_NER_NAMESPACE)


_KERNEL: DeterministicTransformerNer | None = None


def model_ner_entities(text: str) -> list[dict]:
    """Module-level kernel with a lazily-built singleton (one instance
    per worker process — where the model checkpoint lives). The
    stub/real swap is CONFIG, not code: set ``KAZU_TOKEN_NER_MODEL`` to
    a TorchScript checkpoint path (with its ``.json`` sidecar) and,
    when torch is importable, the singleton becomes a
    :class:`TorchTransformerNer`; unset, the deterministic stub runs —
    same machinery either way."""
    import os

    global _KERNEL
    if _KERNEL is None:
        ckpt = os.environ.get("KAZU_TOKEN_NER_MODEL")
        if ckpt:
            _KERNEL = TorchTransformerNer(TorchTokenClassifier(ckpt))
        else:
            _KERNEL = DeterministicTransformerNer()
    return _KERNEL(text)


def model_ner_mentions(text: str, spans) -> list[dict]:
    """Kernel output → full engine entity dicts (match_norm, PROBABLE
    confidence, empty candidate list for downstream linking, sentence
    index). This is the per-doc call every pipeline layout shares."""
    from kazu_ray.lang import normalizer
    from kazu_ray.lang.tokens import sentence_index_for_span

    ents = model_ner_entities(text)
    for m in ents:
        m["match_norm"] = normalizer.normalize(m["match"], m["entity_class"])
        m["confidence"] = 50
        m["cands"] = []
        m["mappings"] = []
        m["sent_idx"] = sentence_index_for_span(spans, m["start"])
    return ents
