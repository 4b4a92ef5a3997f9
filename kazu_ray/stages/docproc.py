"""Document-scoped post-processing + triple emission.

One actor-pool ``map_batches`` stage running the tail of the reference's
default pipeline per document (``conf/Pipeline/default.yaml:3-12``):

  RulesBasedEntityClassDisambiguationFilter → Mapping(StrategyRunner) →
  AbbreviationFinder → Cleanup → MergeOverlappingEnts → triples

Documents never leave their row, so none of these document-scoped
reductions shuffles — this is the Ray-Data-first restatement of the
reference's in-place ``list[Document]`` fold
(``kazu/pipeline/__init__.py:278-288``). Entities live in the
``ents_json`` column; the stage finally emits a ``triples_json`` column
consumed by the explode + materialize stages.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

from kazu_ray.lang import normalizer
from kazu_ray.lang.tokens import sentence_index_for_span
from kazu_ray.stages.mapping import MappingRunner
from kazu_ray.stages.ner import _resolve_store

_TOKEN = re.compile(r"\w+|[^\w\s]", re.UNICODE)

# ---------------------------------------------------------------------------
# RulesBasedEntityClassDisambiguationFilterStep
# (kazu/steps/linking/rules_based_disambiguation.py:37-288) — token-pattern
# TP/FP rules evaluated on the SENTENCE containing each mention, via the
# engine's TokenMatcher (spaCy-Matcher subset, lang/token_matcher.py).
# Rule format mirrors the reference constructor:
#   {"class_rules":   {entity_class: {"tp": patterns|None, "fp": ...}},
#    "mention_rules": {entity_class: {match: {"tp": ..., "fp": ...}}}}
# A (match, entity_class) key survives only if every CONFIGURED tp aspect
# hit somewhere in the document and no configured fp aspect hit
# (decision at :248-260, ported verbatim — including the reference's
# quirk at :245-247 where the mention-fp aggregate ORs in the CLASS fp
# result).
# ---------------------------------------------------------------------------

DEFAULT_CLASS_RULES: dict = {
    # The reference's shipped default rules target cell_line / cell_type /
    # anatomy (conf/RulesBasedEntityClassDisambiguationFilterStep/
    # default.yaml) — classes this engine's synthetic ontologies don't
    # produce, so the faithful default here is "no rules configured".
    # Pipelines pass their own rules through ``class_rules``.
}


class RulesBasedFilter:
    """Compiled form of one rules config; built once per actor."""

    def __init__(self, rules: dict):
        from kazu_ray.lang.token_matcher import TokenMatcher

        self.class_matchers: dict[str, dict[str, TokenMatcher]] = {}
        for clazz, tp_fp in (rules.get("class_rules") or {}).items():
            for kind, patterns in (tp_fp or {}).items():
                if patterns is not None:
                    self.class_matchers.setdefault(clazz, {})[kind] = TokenMatcher(
                        patterns
                    )
        self.mention_matchers: dict[str, dict[str, dict[str, TokenMatcher]]] = {}
        for clazz, by_mention in (rules.get("mention_rules") or {}).items():
            for mention, tp_fp in (by_mention or {}).items():
                for kind, patterns in (tp_fp or {}).items():
                    if patterns is not None:
                        self.mention_matchers.setdefault(clazz, {}).setdefault(
                            mention, {}
                        )[kind] = TokenMatcher(patterns)
        self.empty = not self.class_matchers and not self.mention_matchers

    @staticmethod
    def _check(matchers, sent_tokens):
        """→ (tp_result, fp_result), each True/False/None=not-configured."""
        if matchers is None:
            return None, None
        tp = matchers.get("tp")
        fp = matchers.get("fp")
        return (
            None if tp is None else bool(tp(sent_tokens)),
            None if fp is None else bool(fp(sent_tokens)),
        )

    def filter_sections(
        self,
        section_texts: list[str],
        sents_per_section: list[list[tuple[int, int]]],
        ents_per_section: list[list[dict]],
    ) -> list[list[dict]]:
        """Document-wide evaluation then per-section drop — port of
        rules_based_disambiguation.py:171-260."""
        if self.empty:
            return ents_per_section
        from kazu_ray.lang.token_matcher import sentence_match_tokens
        from kazu_ray.lang.tokens import tokenize

        # per-key doc-level aggregates (key = (match, entity_class))
        tp_class: dict = {}
        fp_class: dict = {}
        tp_mention: dict = {}
        fp_mention: dict = {}
        cfg = {}  # key -> [class_tp?, class_fp?, mention_tp?, mention_fp?]
        considered: set = set()

        sent_token_cache: dict[tuple[int, int], list] = {}
        for sec_idx, (text, sents, ents) in enumerate(
            zip(section_texts, sents_per_section, ents_per_section)
        ):
            toks = None
            for ent in ents:
                clazz = ent["entity_class"]
                maybe_class = self.class_matchers.get(clazz)
                maybe_mention = self.mention_matchers.get(clazz, {}).get(ent["match"])
                if maybe_class is None and maybe_mention is None:
                    continue
                key = (ent["match"], clazz)
                considered.add(key)
                if toks is None:
                    toks = tokenize(text)
                si = sentence_index_for_span(sents, ent["start"])
                ck = (sec_idx, si)
                sent_tokens = sent_token_cache.get(ck)
                if sent_tokens is None:
                    sent_tokens = sentence_match_tokens(text, sents[si], ents, toks)
                    sent_token_cache[ck] = sent_tokens
                tp_c, fp_c = self._check(maybe_class, sent_tokens)
                tp_m, fp_m = self._check(maybe_mention, sent_tokens)
                flags = cfg.setdefault(key, [False, False, False, False])
                flags[0] = tp_c is not None
                flags[1] = fp_c is not None
                flags[2] = tp_m is not None
                flags[3] = fp_m is not None
                tp_class[key] = tp_class.get(key, False) or tp_c is True
                fp_class[key] = fp_class.get(key, False) or fp_c is True
                tp_mention[key] = tp_mention.get(key, False) or tp_m is True
                # reference quirk (:245-247): the mention-fp aggregate ORs
                # the CLASS fp result, not the mention fp result
                fp_mention[key] = fp_mention.get(key, False) or fp_c is True

        def drop(ent) -> bool:
            key = (ent["match"], ent["entity_class"])
            if key not in considered:
                return False
            c_tp, c_fp, m_tp, m_fp = cfg[key]
            return (
                (c_fp and fp_class[key])
                or (c_tp and not tp_class[key])
                or (m_fp and fp_mention[key])
                or (m_tp and not tp_mention[key])
            )

        return [[e for e in ents if not drop(e)] for ents in ents_per_section]


# compiled-rules memo: the same rules dict object (e.g. the module-level
# default, or one actor's config) compiles once; the dict is retained in
# the value so its id cannot be recycled
_COMPILED_RULES: dict[int, tuple[dict, RulesBasedFilter]] = {}


def _compiled(rules: dict) -> RulesBasedFilter:
    entry = _COMPILED_RULES.get(id(rules))
    if entry is None or entry[0] is not rules:
        entry = (rules, RulesBasedFilter(rules))
        _COMPILED_RULES[id(rules)] = entry
    return entry[1]


def rules_based_filter(
    text: str, sents: list[tuple[int, int]], ents: list[dict], rules: dict
) -> list[dict]:
    """Single-section wrapper over :meth:`RulesBasedFilter.filter_sections`."""
    if not rules:
        return ents
    return _compiled(rules).filter_sections([text], [sents], [ents])[0]


# ---------------------------------------------------------------------------
# AbbreviationFinder (Schwartz & Hearst 2003)
# port of kazu/utils/abbreviation_detector.py:102-460 (itself a modified
# scispacy implementation) onto the engine's regex tokenizer.
# ---------------------------------------------------------------------------


def _tokens(text: str) -> list[tuple[str, int, int]]:
    return [(m.group(), m.start(), m.end()) for m in _TOKEN.finditer(text)]


def _find_abbreviation(long_tokens: list[str], short_tokens: list[str]):
    """Char-matching core (``abbreviation_detector.py:102-151``). Returns
    the index into long_tokens where the long form starts, or None."""
    long_form = " ".join(long_tokens)
    short_form = " ".join(short_tokens)
    long_index = len(long_form) - 1
    short_index = len(short_form) - 1
    while short_index >= 0:
        current_char = short_form[short_index].lower()
        if not current_char.isalnum():
            short_index -= 1
            continue
        while (long_index >= 0 and long_form[long_index].lower() != current_char) or (
            short_index == 0 and long_index > 0 and long_form[long_index - 1].isalnum()
        ):
            long_index -= 1
        if long_index < 0:
            return None
        long_index -= 1
        short_index -= 1
    long_index += 1
    word_lengths = 0
    for i, word in enumerate(long_tokens):
        word_lengths += len(word) + 1  # text_with_ws approximation
        if word_lengths > long_index:
            return i
    return None


def _short_form_ok(tokens: list[str], joined: str) -> bool:
    """``short_form_filter`` (``abbreviation_detector.py:197-216``)."""
    if not all(2 <= len(t) < 10 for t in tokens):
        return False
    if not joined or (sum(c.isalpha() for c in joined) / len(joined)) < 0.5:
        return False
    return joined[0].isalpha()


def detect_abbreviations(
    text: str,
    ents: list[dict],
    seen_long: set[str] | None = None,
    seen_short: set[str] | None = None,
    toks: list | None = None,
) -> dict[tuple[str, ...], list[dict]]:
    """Find "long (short)" definitions in one section and the source
    entities anchored at the long-form span. ``seen_long``/``seen_short``
    are shared across sections so a definition is learnt once per doc
    (``abbreviation_detector.py:400-424``)."""
    if "(" not in text:  # C-level prefilter: no parens, no definitions
        return {}
    seen_long = seen_long if seen_long is not None else set()
    seen_short = seen_short if seen_short is not None else set()
    toks = toks if toks is not None else _tokens(text)
    # minimal paren pairs
    pairs = []
    open_idx = None
    for i, (t, _s, _e) in enumerate(toks):
        if t == "(":
            open_idx = i
        elif t == ")" and open_idx is not None:
            pairs.append((open_idx, i))
            open_idx = None
    if not pairs:
        return {}
    # ents indexed by exact char span (contiguous only)
    ents_by_span: dict[tuple[int, int], list[dict]] = {}
    for ent in ents:
        ents_by_span.setdefault((ent["start"], ent["end"]), []).append(ent)

    short_to_sources: dict[tuple[str, ...], list[dict]] = {}
    for open_i, close_i in pairs:
        start, end = open_i + 1, close_i  # brackets stripped (detector :441)
        if end - start > 8 or end - start < 1 or start == 1:
            continue
        if end - start > 3:
            if start < 2:
                continue
            short_tok_range = (start - 2, start - 1)
            long_tok_range = (start, end)
        else:
            short_tok_range = (start, end)
            abbrev_len = sum(len(toks[k][0]) for k in range(start, end))
            max_words = min(abbrev_len + 5, abbrev_len * 2)
            long_tok_range = (max(start - max_words - 1, 0), start - 1)
        short_tokens = [toks[k][0] for k in range(*short_tok_range)]
        if not short_tokens or long_tok_range[1] <= long_tok_range[0]:
            continue
        joined_short = text[toks[short_tok_range[0]][1] : toks[short_tok_range[1] - 1][2]]
        if not _short_form_ok(short_tokens, joined_short):
            continue
        long_tokens = [toks[k][0] for k in range(*long_tok_range)]
        rel_start = _find_abbreviation(long_tokens, short_tokens)
        if rel_start is None:
            continue
        long_first_tok = long_tok_range[0] + rel_start
        long_span = (toks[long_first_tok][1], toks[long_tok_range[1] - 1][2])
        long_text = text[long_span[0] : long_span[1]]
        short_key = tuple(short_tokens)
        if long_text in seen_long or " ".join(short_tokens) in seen_short:
            continue
        seen_long.add(long_text)
        seen_short.add(" ".join(short_tokens))
        short_to_sources[short_key] = ents_by_span.get(long_span, [])
    return short_to_sources


def apply_short_forms(
    text: str,
    ents: list[dict],
    short_to_sources: dict[tuple[str, ...], list[dict]],
    sents: list[tuple[int, int]] | None = None,
    namespace: str = "AbbreviationFinder",
    section_idx: int = 0,
    toks: list | None = None,
) -> list[dict]:
    """At each short-form occurrence in this section, drop existing
    entities at exactly that span and copy the long-form source entities
    onto it (HIGHLY_LIKELY confidence) — ``abbreviation_detector.py:262-460``.
    Definitions may come from ANY section of the document."""
    if not short_to_sources:
        return ents
    toks = toks if toks is not None else _tokens(text)
    # global matcher: find every occurrence of each short-form token seq
    tok_texts = [t[0] for t in toks]
    remove_spans: set[tuple[int, int]] = set()
    new_ents: list[dict] = []
    for short_key, sources in short_to_sources.items():
        L = len(short_key)
        for i in range(len(tok_texts) - L + 1):
            if tuple(tok_texts[i : i + L]) != short_key:
                continue
            span = (toks[i][1], toks[i + L - 1][2])
            remove_spans.add(span)
            match_text = text[span[0] : span[1]]
            sent_idx = sentence_index_for_span(sents, span[0]) if sents else 0
            for src in sources:
                new_ents.append(
                    {
                        "start": span[0],
                        "end": span[1],
                        "match": match_text,
                        "match_norm": normalizer.normalize(match_text, src["entity_class"]),
                        "entity_class": src["entity_class"],
                        "namespace": namespace,
                        "confidence": 100,
                        "cands": [list(c) for c in src["cands"]],
                        "mappings": [dict(m) for m in src["mappings"]],
                        "sent_idx": sent_idx,
                        "section_idx": section_idx,
                    }
                )
    kept = [e for e in ents if (e["start"], e["end"]) not in remove_spans]
    kept.extend(new_ents)
    return kept


def apply_abbreviations(
    text: str,
    ents: list[dict],
    sents: list[tuple[int, int]] | None = None,
    namespace: str = "AbbreviationFinder",
    toks: list | None = None,
):
    """Single-section convenience: detect + apply in one text."""
    toks = toks if toks is not None else _tokens(text)
    short_to_sources = detect_abbreviations(text, ents, toks=toks)
    return apply_short_forms(text, ents, short_to_sources, sents, namespace, toks=toks)


# ---------------------------------------------------------------------------
# CleanupStep (kazu/steps/other/cleanup.py, conf/CleanupActions/default.yaml)
# ---------------------------------------------------------------------------


def cleanup(ents: list[dict], extra_actions: list | None = None) -> list[dict]:
    """Default cleanup: drop AMBIGUOUS-disambiguation mappings
    (``cleanup.py:55-69``), then drop unmapped entities below PROBABLE
    mention confidence (``cleanup.py:72-93``). ``extra_actions`` appends
    further actions (list[dict] → list[dict] callables) — the engine's
    equivalent of the reference's configurable CleanupStep action list
    (``cleanup.py:216-223``)."""
    out = []
    for ent in ents:
        ent["mappings"] = [
            m for m in ent["mappings"] if m["disambiguation_confidence"] != 0
        ]
        if not ent["mappings"] and ent["confidence"] < 50:
            continue
        out.append(ent)
    for action in extra_actions or ():
        out = action(out)
    return out


# --- additional cleanup actions (kazu/steps/other/cleanup.py:96-213) ---


def drop_by_min_len(min_len: int):
    """``DropByMinLenFilter`` (``cleanup.py:112-117``)."""

    def action(ents: list[dict]) -> list[dict]:
        return [e for e in ents if len(e["match"]) >= min_len]

    return action


def drop_if_match_in_set(drop_dict: dict[str, set[str]]):
    """``DropEntityIfMatchInSetFilter`` (``cleanup.py:104-109``):
    class → lowercased surface strings to drop."""

    def action(ents: list[dict]) -> list[dict]:
        return [
            e
            for e in ents
            if e["match"].lower() not in drop_dict.get(e["entity_class"], set())
        ]

    return action


def drop_entity_class_not_in(required: set[str]):
    """``DropEntityIfClassNotMatchedFilter`` (``cleanup.py:96-101``)."""

    def action(ents: list[dict]) -> list[dict]:
        return [e for e in ents if e["entity_class"] in required]

    return action


def strip_mapping_uris():
    """``StripMappingURIsAction`` (``cleanup.py:130-170``): URI idx →
    final path segment."""
    import urllib.parse

    def _strip(idx: str) -> str:
        url = urllib.parse.urlparse(idx)
        return idx if url.scheme == "" else url.path.split("/")[-1]

    def action(ents: list[dict]) -> list[dict]:
        for e in ents:
            for m in e["mappings"]:
                m["idx"] = _strip(m["idx"])
            # the reference's Entity.mappings is a SET of frozen
            # dataclasses: mappings made identical by the strip collapse
            seen: set = set()
            deduped = []
            for m in e["mappings"]:
                key = tuple(sorted(m.items()))
                if key not in seen:
                    seen.add(key)
                    deduped.append(m)
            e["mappings"] = deduped
        return ents

    return action


def drop_mappings_by_parser_rank(class_to_rank: dict[str, list[str]]):
    """``DropMappingsByParserNameRankAction`` (``cleanup.py:173-213``):
    keep only the mappings from the highest-ranked parser present."""

    def action(ents: list[dict]) -> list[dict]:
        for e in ents:
            ranks = class_to_rank.get(e["entity_class"])
            if ranks is None or not e["mappings"]:
                continue
            present = [
                m for m in e["mappings"] if m["parser_name"] in ranks
            ]
            if not present:
                continue
            best_rank = min(ranks.index(m["parser_name"]) for m in present)
            e["mappings"] = [
                m
                for m in e["mappings"]
                if m["parser_name"] in ranks
                and ranks.index(m["parser_name"]) == best_rank
            ]
        return ents

    return action


# ---------------------------------------------------------------------------
# MergeOverlappingEntsStep (kazu/steps/other/merge_overlapping_ents.py)
# ---------------------------------------------------------------------------

ENT_CLASS_PREFERRED_ORDER = [
    "disease", "drug", "gene", "anatomy", "cell_line", "cell_type",
    "biological_process", "molecular_function", "cellular_component",
]
_CLASS_RANK = {c: i for i, c in enumerate(reversed(ENT_CLASS_PREFERRED_ORDER))}


def merge_overlapping(ents: list[dict]) -> list[dict]:
    """Sweep-line overlap grouping (``merge_overlapping_ents.py:106-140``)
    + preference-ladder winner selection (``:54-70``)."""
    if not ents:
        return ents
    # non-contiguous entities are excluded from the merge
    # (merge_overlapping_ents.py:92-99, ignore_non_contiguous=True default)
    non_contig = [e for e in ents if len(e.get("spans") or []) > 1]
    ents = [e for e in ents if len(e.get("spans") or []) <= 1]
    if not ents:
        return non_contig
    by_start = sorted(ents, key=lambda e: (e["start"], e["end"]))
    groups: list[list[dict]] = []
    cur: list[dict] = [by_start[0]]
    start, end = by_start[0]["start"], by_start[0]["end"]
    for ent in by_start[1:]:
        if start <= ent["start"] < end:
            end = max(end, ent["end"])
            cur.append(ent)
        else:
            groups.append(cur)
            cur = [ent]
            start, end = ent["start"], ent["end"]
    groups.append(cur)
    out = []
    for group in groups:
        if len(group) == 1:
            out.append(group[0])
            continue
        # max() == sorted(..., reverse=True)[0] here, including ties
        # (both keep the first-encountered maximum), without building
        # and sorting a list per overlap group
        best = max(
            group,
            key=lambda e: (
                len(e["mappings"]) > 0,
                e["end"] - e["start"],
                _CLASS_RANK.get(e["entity_class"], 0),
                e["confidence"],
                e["entity_class"],
            ),
        )
        out.append(best)
    out.extend(non_contig)
    return out


# ---------------------------------------------------------------------------
# triple emission (new operator, SURVEY §2.7 / north_rule)
# ---------------------------------------------------------------------------


_PRED_MEMO: dict[tuple[str, str], str] = {}


def _pred_for(c1: str, c2: str) -> str:
    pred = _PRED_MEMO.get((c1, c2))
    if pred is None:
        pair = frozenset((c1, c2))
        if pair == frozenset(("gene", "disease")):
            pred = "associated_with"
        elif pair == frozenset(("drug", "disease")):
            pred = "treats_candidate"
        else:
            pred = "co_occurs_with"
        _PRED_MEMO[(c1, c2)] = pred
    return pred


def canonical_id(ent: dict) -> str | None:
    """One canonical node id per mapped entity: best mapping by
    (string-match confidence, disambiguation confidence, lexicographic
    source:idx) — deterministic so the P/R comparison is well-defined."""
    mappings = ent["mappings"]
    if not mappings:
        return None
    best = min(
        mappings,
        key=lambda m: (
            -m["string_match_confidence"],
            -(m["disambiguation_confidence"] or -1),
            m["source"],
            m["idx"],
        ),
    )
    return f"{best['source']}:{best['idx']}"


def emit_triples(doc_id: str, ents: list[dict]) -> list[dict]:
    """Sentence-level co-occurrence triples over canonicalized entities;
    subj < obj lexicographic; deduped per (sent, subj, pred, obj)."""
    by_sent: dict[int, list[dict]] = {}
    for ent in ents:
        cid = canonical_id(ent)
        if cid is None:
            continue
        by_sent.setdefault(ent.get("sent_idx", 0), []).append((ent, cid))
    triples = {}
    for sent_idx, items in by_sent.items():
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                (e1, c1), (e2, c2) = items[i], items[j]
                if c1 == c2:
                    continue
                if c2 < c1:
                    e1, c1, e2, c2 = e2, c2, e1, c1
                pred = _pred_for(e1["entity_class"], e2["entity_class"])
                key = (sent_idx, c1, pred, c2)
                if key not in triples:
                    triples[key] = {
                        "subj": c1,
                        "pred": pred,
                        "obj": c2,
                        "doc_id": doc_id,
                        "sent_idx": sent_idx,
                        "subj_class": e1["entity_class"],
                        "obj_class": e2["entity_class"],
                        "confidence": min(e1["confidence"], e2["confidence"]),
                    }
    return [triples[k] for k in sorted(triples)]


# ---------------------------------------------------------------------------
# the composite stage
# ---------------------------------------------------------------------------


def process_doc(
    runner: MappingRunner,
    text: str,
    doc_id: str,
    ents: list[dict],
    sents: list[tuple[int, int]],
    class_rules: dict | None = None,
    toks: list | None = None,
) -> tuple[list[dict], list[dict]]:
    """Run the full doc-scoped tail for one document. Shared verbatim by
    the Ray stage and the single-process oracle (tests)."""
    ents = rules_based_filter(text, sents, ents, class_rules or {})
    runner.run_doc(ents, text)
    ents = apply_abbreviations(text, ents, sents, toks=toks)
    ents = cleanup(ents)
    ents = merge_overlapping(ents)
    triples = emit_triples(doc_id, ents)
    return ents, triples


def process_sections(
    runner: MappingRunner,
    section_texts: list[str],
    doc_id: str,
    ents_per_section: list[list[dict]],
    sents_per_section: list[list[tuple[int, int]]],
    class_rules: dict | None = None,
) -> tuple[list[dict], list[dict]]:
    """Multi-section document tail — the reference's ``Document`` →
    ``Section`` shape (``kazu/data/__init__.py:438-565``): NER/linking ran
    per section; this runs the doc-scoped steps with the reference's
    cross-section semantics:

    * rules filter + mapping + cleanup are document-wide;
    * abbreviation DEFINITIONS learnt in any section are APPLIED in every
      section (``abbreviation_finder.py:14-16``);
    * overlap merging is per section (``merge_overlapping_ents.py:90``);
    * triples use document-global sentence numbering (sections offset by
      their predecessors' sentence counts).

    Entity spans stay section-local; each entity carries ``section_idx``.
    """
    rules = class_rules or {}
    doc_text = "\n".join(section_texts)
    for i, ents in enumerate(ents_per_section):
        for e in ents:
            e["section_idx"] = i
    if rules:
        # document-wide aggregation across sections, per the reference
        # (a tp hit in one section validates the key in all sections)
        ents_per_section = _compiled(rules).filter_sections(
            section_texts, sents_per_section, ents_per_section
        )
    all_ents = [e for ents in ents_per_section for e in ents]
    runner.run_doc(all_ents, doc_text)

    # abbreviations: detect across all sections, apply across all sections
    seen_long: set[str] = set()
    seen_short: set[str] = set()
    short_to_sources: dict = {}
    for text, ents in zip(section_texts, ents_per_section):
        found = detect_abbreviations(text, ents, seen_long, seen_short)
        for key, sources in found.items():
            short_to_sources.setdefault(key, sources)
    final_sections: list[list[dict]] = []
    for i, (text, ents, sents) in enumerate(
        zip(section_texts, ents_per_section, sents_per_section)
    ):
        ents = apply_short_forms(text, ents, short_to_sources, sents, section_idx=i)
        ents = cleanup(ents)
        ents = merge_overlapping(ents)
        final_sections.append(ents)

    # triples with document-global sentence numbering
    offset = 0
    final_ents: list[dict] = []
    triples: list[dict] = []
    for i, (ents, sents) in enumerate(zip(final_sections, sents_per_section)):
        for e in ents:
            e["sent_idx"] = e.get("sent_idx", 0) + offset
            e["section_idx"] = i
        triples.extend(emit_triples(doc_id, ents))
        final_ents.extend(ents)
        offset += max(1, len(sents))
    return final_ents, triples


class DocPostProcessStage:
    """Actor-pool ``map_batches``: docs+ents → docs+ents+triples columns."""

    def __init__(self, store, class_rules: dict | None = None):
        self.store = _resolve_store(store)
        self.runner = MappingRunner(self.store)
        self.class_rules = class_rules or DEFAULT_CLASS_RULES

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        doc_ids = batch["doc_id"].to_pylist()
        ents_lists = [json.loads(x) for x in batch["ents_json"].to_pylist()]
        sents_lists = [json.loads(x) for x in batch["sents_json"].to_pylist()]
        ents_out, triples_out = [], []
        for text, doc_id, ents, sents in zip(texts, doc_ids, ents_lists, sents_lists):
            final_ents, triples = process_doc(
                self.runner, text, doc_id, ents, [tuple(s) for s in sents], self.class_rules
            )
            ents_out.append(json.dumps(final_ents))
            triples_out.append(json.dumps(triples))
        out = batch.drop_columns(["ents_json"])
        out = out.append_column("ents_json", pa.array(ents_out, type=pa.large_string()))
        out = out.append_column("triples_json", pa.array(triples_out, type=pa.large_string()))
        return out
