"""Ontology cache build job.

Re-expression of the reference's offline "parser" dataflow
(``kazu/ontology_preprocessing/base.py:160-343,508-632``) as a
deterministic table→table job producing three Parquet cache tables:

* ``metadata``  — one row per (parser, idx): default_label, annotation_score
  (columnar port of ``MetadataDatabase``, ``kazu/database/in_memory_db.py:23-74``)
* ``synonyms``  — one row per (parser, syn_norm): the full
  :class:`~kazu_ray.model.LinkingCandidate` as canonical JSON
  (columnar port of ``SynonymDatabase``, ``in_memory_db.py:77-149``)
* ``ner_terms`` — one row per active NER synonym surface form:
  (term, term_lower, case_sensitive, confidence, syn_norm, entity_class,
  parser) — the build table for the string-matching automaton
  (``memory_efficient_string_matching.py:42-94``)

The per-group logic (`resolve_candidates_for_group`) is shared between
the driver-side builder used for the small synthetic ontologies and the
Ray Data ``groupby("syn_norm").map_groups`` path
(:func:`build_caches_ray`) used when an ontology is large. At 100 TB
corpus scale the ontology side stays small (10^5–10^6 synonyms), so the
cache build is a one-off job and the caches are broadcast, never
shuffled.
"""

from __future__ import annotations

import os

import pandas as pd

from kazu_ray.lang import normalizer
from kazu_ray.lang.similarity import label_similarity_scorer
from kazu_ray.model import LinkingCandidate, MentionConfidence
from kazu_ray.ontology.generate import PARSERS, generate_ontology_tables

SYNONYM_MERGE_THRESHOLD = 0.70  # base.py:134 synonym_merge_threshold

# stand-in for the model pack's 20k common-word list consumed by the
# IsCommmonWord autocuration action (autocuration.py:37-60). Deliberately
# small and fixed: enough to exercise the downgrade path.
COMMON_WORDS = {
    "the", "and", "all", "was", "in", "a", "of", "to", "for", "with", "is",
    "on", "at", "by", "an", "be", "this", "that", "it", "as", "are", "or",
    "from", "type", "disease", "cancer", "gene", "cell", "blood", "skin",
    "bone", "brain", "treatment", "heck", "neck", "acute", "chronic", "flu",
}


def score_and_group_ids(
    ids_and_source: set[tuple[str, str]],
    is_symbolic: bool,
    default_labels: dict[str, str],
) -> tuple[frozenset, str]:
    """Cluster the ids sharing one normalised synonym into equivalent-id
    sets (``base.py:211-309``): single id or non-symbolic ⇒ one set;
    symbolic ⇒ greedy agglomerative merge on default-label similarity
    vs ``SYNONYM_MERGE_THRESHOLD``.
    """
    if len(ids_and_source) == 1:
        return frozenset({frozenset(ids_and_source)}), "UNAMBIGUOUS"
    if not is_symbolic:
        return frozenset({frozenset(ids_and_source)}), "MERGED_AS_NON_SYMBOLIC"

    id_list: list[tuple[set, set]] = []  # (ids_and_source, default_labels)
    # deterministic iteration order regardless of set hashing
    for id_and_source in sorted(ids_and_source):
        label = default_labels[id_and_source[0]]
        most_similar = None
        best_score = 0.0
        for group in id_list:
            sim = max(label_similarity_scorer(label, other) for other in group[1])
            if sim > SYNONYM_MERGE_THRESHOLD and sim > best_score:
                most_similar = group
                best_score = sim
        if most_similar is None:
            id_list.append(({id_and_source}, {label}))
        else:
            most_similar[0].add(id_and_source)
            most_similar[1].add(label)
    return (
        frozenset(frozenset(ids) for ids, _ in id_list),
        "RESOLVED_BY_SIMILARITY",
    )


def score_and_group_ids_one_per_id(
    ids_and_source: set[tuple[str, str]],
    is_symbolic: bool,
    default_labels: dict[str, str],
) -> tuple[frozenset, str]:
    """Cellosaurus strategy (``parsers.py:1194-1215``): treat every id
    sharing a normalised synonym as a SEPARATE entity (cell lines with
    the same name are still distinct lines) — one singleton equivalent-
    id set per id, aggregation strategy CUSTOM."""
    return (
        frozenset(frozenset({ias}) for ias in sorted(ids_and_source)),
        "CUSTOM",
    )


def score_and_group_ids_by_exact_label(
    ids_and_source: set[tuple[str, str]],
    is_symbolic: bool,
    default_labels: dict[str, str],
) -> tuple[frozenset, str]:
    """OpenTargets target strategy (``parsers.py:332-368``): Ensembl
    gene ids are genome locations, and several ids for one gene share
    its approved symbol — so ids sharing a synonym group by IDENTICAL
    default label (no similarity threshold), aggregation CUSTOM."""
    groups: dict[str, set] = {}
    for ias in sorted(ids_and_source):
        groups.setdefault(default_labels.get(ias[0], ias[0]), set()).add(ias)
    return (
        frozenset(frozenset(g) for g in groups.values()),
        "CUSTOM",
    )


def score_and_group_ids_by_xref(
    ids_and_source: set[tuple[str, str]],
    is_symbolic: bool,
    default_labels: dict[str, str],
    xrefs: dict[str, frozenset],
) -> tuple[frozenset, str]:
    """Group ambiguous ids by shared cross-references, the OpenTargets
    disease strategy (``parsers.py:158-222``): ids whose xref sets
    intersect share an equivalent-id set; if two intersection groups
    overlap inconsistently, fall back to the similarity strategy; ids
    with no shared xref stay as singleton sets."""
    import itertools

    if len(ids_and_source) == 1:
        return score_and_group_ids(ids_and_source, is_symbolic, default_labels)

    lookup = {ias: xrefs.get(ias[0], frozenset()) for ias in sorted(ids_and_source)}
    unmapped = set(lookup)
    groups: dict[frozenset, set] = {}
    for (ias1, x1), (ias2, x2) in itertools.combinations(lookup.items(), r=2):
        shared = frozenset(x1 & x2)
        if shared:
            groups.setdefault(shared, set()).update((ias1, ias2))
            unmapped.discard(ias1)
            unmapped.discard(ias2)

    if len(groups) > 1:
        for s1, s2 in itertools.combinations(groups.values(), r=2):
            if not s1.isdisjoint(s2):
                # xref mappings confused between subsets → reference
                # falls back to the default strategy
                return score_and_group_ids(ids_and_source, is_symbolic, default_labels)

    group_list = list(groups.values()) + [{ias} for ias in sorted(unmapped)]
    return (
        frozenset(frozenset(g) for g in group_list),
        "RESOLVED_BY_XREF",
    )


def resolve_candidates_for_group(
    syn_norm: str,
    group: pd.DataFrame,
    parser_name: str,
    entity_class: str,
    source: str,
    default_labels: dict[str, str],
    xrefs: dict[str, frozenset] | None = None,
    one_id_set_per_id: bool = False,
    group_by_exact_label: bool = False,
    find_kb=None,
) -> LinkingCandidate:
    """One normalised synonym group → one LinkingCandidate
    (``base.py:160-209``). When ``xrefs`` is provided (OpenTargets-style
    sources), ambiguous ids group by shared cross-reference first. When
    ``one_id_set_per_id`` is set (Cellosaurus, ``parsers.py:1194-1215``),
    every id keeps its own singleton equivalent-id set. ``find_kb``
    resolves an id to its kb source (``OntologyParser.find_kb``,
    ``base.py:152-158`` / its call site ``base.py:188-194``) — parsers
    like Stato (OBI|STATO) and Mondo (MONDO|HP) mix kbs in one source;
    default is the parser-level ``source`` string."""
    syn_set = set(group["syn"])
    is_symbolic = all(normalizer.classify_symbolic(x, entity_class) for x in syn_set)
    ids_and_source = {
        (idx, find_kb(idx) if find_kb is not None else source)
        for idx in set(group["idx"])
    }
    if one_id_set_per_id:
        associated_id_sets, agg = score_and_group_ids_one_per_id(
            ids_and_source, is_symbolic, default_labels
        )
    elif group_by_exact_label:
        associated_id_sets, agg = score_and_group_ids_by_exact_label(
            ids_and_source, is_symbolic, default_labels
        )
    elif xrefs is not None:
        associated_id_sets, agg = score_and_group_ids_by_xref(
            ids_and_source, is_symbolic, default_labels, xrefs
        )
    else:
        associated_id_sets, agg = score_and_group_ids(ids_and_source, is_symbolic, default_labels)
    return LinkingCandidate(
        synonym_norm=syn_norm,
        parser_name=parser_name,
        raw_synonyms=frozenset(syn_set),
        is_symbolic=is_symbolic,
        mapping_types=frozenset(group["mapping_type"]),
        associated_id_sets=associated_id_sets,
        aggregated_by=agg,
    )


# ---------------------------------------------------------------------------
# autocuration (kazu/ontology_preprocessing/autocuration.py, conf/autocurator)
# ---------------------------------------------------------------------------


class _Resource:
    """(syns, case_sensitive, confidence, behaviour) bundle for one
    normalised synonym — the working shape of ``OntologyStringResource``
    (``kazu/data/__init__.py:754-926``) during autocuration.

    ``alt_syns`` are generator-produced alternative surfaces
    (NER-only, ``kazu/data/__init__.py:856``); autocuration actions
    apply the same flags to both sets, mirroring
    ``dataclasses.replace`` over original+alternative synonyms in the
    reference's autocuration actions."""

    __slots__ = ("syn_norm", "syns", "alt_syns", "behaviour")

    def __init__(self, syn_norm: str, texts: set[str], alt_texts: set[str] = frozenset()):
        self.syn_norm = syn_norm
        # text -> [case_sensitive, confidence]; defaults per
        # linking_candidates_to_ontology_string_resources (utils/utils.py:24-50)
        self.syns = {t: [False, int(MentionConfidence.PROBABLE)] for t in texts}
        self.alt_syns = {t: [False, int(MentionConfidence.PROBABLE)] for t in alt_texts}
        self.behaviour = "ADD_FOR_NER_AND_LINKING"


def _all_syn_values(r: _Resource):
    yield from r.syns.values()
    yield from r.alt_syns.values()


def _ac_symbolic_to_case_sensitive(r: _Resource, entity_class: str) -> None:
    if all(normalizer.classify_symbolic(t, entity_class) for t in r.syns):
        for v in _all_syn_values(r):
            v[0] = True


def _ac_likely_acronym(r: _Resource, max_len: int = 5) -> None:
    if all(len(t) <= max_len and t.isupper() for t in r.syns):
        for v in _all_syn_values(r):
            v[1] = int(MentionConfidence.POSSIBLE)


def _ac_common_word(r: _Resource) -> None:
    if any(all(w in COMMON_WORDS for w in t.lower().split()) for t in r.syns):
        for v in _all_syn_values(r):
            v[1] = int(MentionConfidence.POSSIBLE)


def _ac_multiword(r: _Resource) -> None:
    if any(" " in t.strip() for t in r.syns):
        for v in _all_syn_values(r):
            v[1] = int(MentionConfidence.PROBABLE)


def _ac_min_length(r: _Resource, min_len: int = 2) -> None:
    if any(len(t) < min_len for t in r.syns):
        r.behaviour = "DROP_FOR_LINKING"


def _ac_max_length(r: _Resource, max_len: int = 60) -> None:
    if any(len(t) > max_len for t in r.syns):
        r.behaviour = "DROP_FOR_LINKING"


def _ac_initial_lower_then_upper_cs(r: _Resource) -> None:
    if any(len(t) >= 2 and t[0].islower() and t[1].isupper() for t in r.syns):
        for v in _all_syn_values(r):
            v[0] = True


def _ac_upper_word_to_ci(r: _Resource) -> None:
    if all(t.isupper() and t.isalpha() for t in r.syns):
        for v in _all_syn_values(r):
            v[0] = False


def _resources_have_case_conflicts(resources: list[_Resource]) -> bool:
    """Case/confidence conflict predicate
    (``curation_utils.py:580-636``): a case-sensitive rank must always
    outrank a case-insensitive rank for the same lowered surface, and a
    surface may carry only one confidence per sensitivity class."""
    cs_lookup: dict[str, set[int]] = {}
    ci_lookup: dict[str, set[int]] = {}
    for r in resources:
        if r.behaviour != "ADD_FOR_NER_AND_LINKING":
            continue
        for source in (r.syns, r.alt_syns):
            for text, (case_sensitive, confidence) in source.items():
                if confidence == int(MentionConfidence.IGNORE):
                    # IGNORE synonyms are inactive for NER and excluded
                    # from conflict analysis (active_ner_synonyms,
                    # kazu/data/__init__.py:922-926)
                    continue
                if case_sensitive:
                    cs_lookup.setdefault(text, set()).add(confidence)
                else:
                    ci_lookup.setdefault(text.lower(), set()).add(confidence)
    for cased, cs_confs in cs_lookup.items():
        ci_confs = ci_lookup.get(cased.lower(), set())
        if len(ci_confs) > 1 or (
            len(ci_confs) == 1 and cs_confs and min(cs_confs) <= min(ci_confs)
        ):
            return True
    return any(len(confs) > 1 for confs in ci_lookup.values())


def autofix_case_conflicts(resources: list[_Resource]) -> tuple[list[_Resource], int]:
    """OPTIMISTIC autofix (``curation_utils.py:345-423``): group resources
    sharing any lowered surface; for a conflicted group choose the least
    restrictive case sensitivity (min → case-insensitive wins) and the
    max confidence per surface; DROP_FOR_LINKING behaviour dominates.
    Returns (resources, number of conflicted groups fixed)."""
    surface_to_group: dict[str, int] = {}
    parent = list(range(len(resources)))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    for i, r in enumerate(resources):
        for source in (r.syns, r.alt_syns):
            for text in source:
                key = text.lower()
                if key in surface_to_group:
                    union(surface_to_group[key], i)
                else:
                    surface_to_group[key] = i

    groups: dict[int, list[int]] = {}
    for i in range(len(resources)):
        groups.setdefault(find(i), []).append(i)

    n_fixed = 0
    for members in groups.values():
        if len(members) < 2:
            continue
        group = [resources[i] for i in members]
        if not _resources_have_case_conflicts(group):
            continue
        n_fixed += 1
        case_sensitivities = set()
        conf_by_lower: dict[str, int] = {}
        behaviours = set()
        for r in group:
            behaviours.add(r.behaviour)
            for source in (r.syns, r.alt_syns):
                for text, (cs, conf) in source.items():
                    case_sensitivities.add(cs)
                    key = text.lower()
                    conf_by_lower[key] = max(conf_by_lower.get(key, 0), conf)
        chosen_cs = min(case_sensitivities)  # OPTIMISTIC: ci wins
        chosen_behaviour = (
            "DROP_FOR_LINKING" if "DROP_FOR_LINKING" in behaviours
            else "ADD_FOR_NER_AND_LINKING"
        )
        for r in group:
            r.behaviour = chosen_behaviour
            for source in (r.syns, r.alt_syns):
                for text, v in source.items():
                    v[0] = chosen_cs
                    v[1] = conf_by_lower[text.lower()]
    return resources, n_fixed


def load_human_curations(path: str) -> list[dict]:
    """Load human-curated resources from a jsonl file or directory of
    jsonl files (``curation_utils.py:40-58``,
    ``load_ontology_string_resources``). Record shape mirrors
    ``OntologyStringResource.to_json``::

        {"original_synonyms": [{"text": ..., "case_sensitive": bool,
                                "mention_confidence": int}, ...],
         "alternative_synonyms": [...],          # optional
         "behaviour": "ADD_FOR_NER_AND_LINKING"  # or DROP_FOR_LINKING /
                                                 #    ADD_FOR_LINKING_ONLY
         "additional_to_source": false}          # optional
    """
    import json as _json

    files = (
        sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".jsonl")
        )
        if os.path.isdir(path)
        else [path]
    )
    out: list[dict] = []
    for f in files:
        with open(f) as fh:
            for line in fh:
                if line.strip():
                    out.append(_json.loads(line))
    return out


def _resource_from_curation(rec: dict, entity_class: str) -> _Resource:
    """Human curation record → working _Resource (syn_norm derived from
    the first original synonym, as all originals of one resource share a
    normalisation by the reference's integrity contract)."""
    originals = rec.get("original_synonyms", [])
    if not originals:
        raise ValueError(f"curation record has no original_synonyms: {rec}")
    syn_norm = normalizer.normalize(originals[0]["text"], entity_class)
    r = _Resource(syn_norm, set())
    for syn in originals:
        r.syns[syn["text"]] = [
            bool(syn.get("case_sensitive", False)),
            int(syn.get("mention_confidence", int(MentionConfidence.PROBABLE))),
        ]
    for syn in rec.get("alternative_synonyms", []):
        r.alt_syns[syn["text"]] = [
            bool(syn.get("case_sensitive", False)),
            int(syn.get("mention_confidence", int(MentionConfidence.PROBABLE))),
        ]
    r.behaviour = rec.get("behaviour", "ADD_FOR_NER_AND_LINKING")
    return r


def merge_human_and_auto_resources(
    human: list[tuple[_Resource, bool]], auto_by_syn_norm: dict[str, _Resource]
) -> tuple[dict[str, _Resource], dict]:
    """``OntologyStringConflictAnalyser.merge_human_and_auto_resources``
    (``curation_utils.py:638-701``): prefer the human resource wherever
    its syn_norm matches an autocurated one; human resources with no
    auto counterpart survive only when flagged ``additional_to_source``
    (else they are obsolete — the source dropped the term); resources
    whose synonym text sets differ from the auto version are reported as
    discrepancies (synonym generation changed under the curation).

    ``human`` is [(resource, additional_to_source)]. Returns
    (effective resources by syn_norm, merge report dict).
    """
    working = dict(auto_by_syn_norm)
    human_by_norm = {r.syn_norm: (r, additional) for r, additional in human}
    superfluous: list[str] = []
    discrepancies: list[str] = []
    obsolete: list[str] = []
    for syn_norm, (resource, additional) in human_by_norm.items():
        default = auto_by_syn_norm.get(syn_norm)
        if default is not None:
            working[syn_norm] = resource
            if set(resource.syns) != set(default.syns) or set(resource.alt_syns) != set(
                default.alt_syns
            ):
                discrepancies.append(syn_norm)
            if (
                resource.behaviour == default.behaviour
                and resource.syns == default.syns
                and resource.alt_syns == default.alt_syns
            ):
                superfluous.append(syn_norm)
        elif additional:
            working[syn_norm] = resource
        else:
            obsolete.append(syn_norm)
            # obsolete curation: the source no longer produces this
            # synonym — the curation is reported, not applied
    report = {
        "n_human": len(human),
        "applied": len(human) - len(obsolete),
        "superfluous": sorted(superfluous),
        "discrepancies": sorted(discrepancies),
        "obsolete": sorted(obsolete),
    }
    return working, report


def autocurate(resource: _Resource, entity_class: str) -> _Resource:
    """Apply the per-class autocuration chain in config order
    (``conf/autocurator/default.yaml``): the ``basic`` chain for disease,
    ``chembl`` for drug (adds upper-word→case-insensitive, drops the
    multiword action), ``gene`` (drops LikelyAcronym and multiword)."""
    _ac_symbolic_to_case_sensitive(resource, entity_class)
    if entity_class in ("disease", "drug"):
        _ac_likely_acronym(resource)
    _ac_common_word(resource)
    if entity_class == "disease":
        _ac_multiword(resource)
    _ac_min_length(resource)
    _ac_max_length(resource)
    _ac_initial_lower_then_upper_cs(resource)
    if entity_class == "drug":
        _ac_upper_word_to_ci(resource)
    return resource


# ---------------------------------------------------------------------------
# build
# ---------------------------------------------------------------------------


def build_parser_caches(
    df: pd.DataFrame,
    parser_name: str,
    entity_class: str,
    source: str,
    global_drop_ids: set[str] | None = None,
    curations_path: str | None = None,
    one_id_set_per_id: bool = False,
    group_by_exact_label: bool = False,
    find_kb=None,
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Build (metadata, synonyms, ner_terms) frames for one parser.

    ``global_drop_ids`` implements the reference's global parser action
    ``DROP_IDS_FROM_PARSER`` (``kazu/data/__init__.py:692-751``): the
    ids are removed before any candidate resolution, so they can never
    appear in NER surfaces, linking candidates, or metadata.

    ``curations_path`` is the human-override jsonl (file or directory):
    curated resources are merged over the autocurated set per
    ``curation_utils.py:638-701`` (human wins at matching syn_norm;
    ``additional_to_source`` records may add NEW surfaces, carrying
    their target ids in ``associated_idx``; obsolete curations are
    reported and dropped) BEFORE cross-resource conflict analysis, the
    reference's ordering (``base.py:369-674``).
    """
    df = df.copy()
    if global_drop_ids:
        df = df[~df["idx"].isin(global_drop_ids)]
    df["syn"] = df["syn"].astype(str).str.strip()
    df = df.dropna(subset=["syn"]).drop_duplicates(subset=["idx", "syn", "mapping_type"])

    # metadata: dedupe by idx (base.py:349-367)
    meta = (
        df.drop_duplicates(subset=["idx"])[["idx", "default_label", "data_origin"]]
        .assign(
            parser_name=parser_name,
            source=source,
            entity_class=entity_class,
            annotation_score=df.drop_duplicates(subset=["idx"])
            .get("annotation_score", pd.Series(0, index=df.drop_duplicates(subset=["idx"]).index))
            .values,
        )
        .reset_index(drop=True)
    )
    default_labels = dict(zip(meta["idx"], meta["default_label"]))

    df["syn_norm"] = normalizer.normalize_batch(df["syn"].tolist(), entity_class)

    candidates: dict[str, LinkingCandidate] = {}
    for syn_norm, group in df.groupby("syn_norm", sort=True):
        candidates[syn_norm] = resolve_candidates_for_group(
            syn_norm, group, parser_name, entity_class, source, default_labels,
            one_id_set_per_id=one_id_set_per_id,
            group_by_exact_label=group_by_exact_label, find_kb=find_kb,
        )

    # resources + autocuration → ner terms; DROP_FOR_LINKING also removes
    # the candidate from the synonym table (curation semantics)
    from kazu_ray.ontology.synonym_generation import generate_alternatives

    resources: dict[str, _Resource] = {}
    for syn_norm in sorted(candidates):
        cand = candidates[syn_norm]
        originals = set(cand.raw_synonyms)
        alternatives = generate_alternatives(originals)
        resources[syn_norm] = autocurate(
            _Resource(syn_norm, originals, alternatives), entity_class
        )

    if curations_path is not None:
        recs = load_human_curations(curations_path)
        human = [
            (
                _resource_from_curation(rec, entity_class),
                bool(rec.get("additional_to_source", False)),
            )
            for rec in recs
        ]
        resources, merge_report = merge_human_and_auto_resources(human, resources)
        if merge_report["obsolete"] or merge_report["discrepancies"]:
            import logging

            logging.getLogger("kazu_ray.ontology").warning(
                "curation merge for %s: %d obsolete, %d discrepancies",
                parser_name,
                len(merge_report["obsolete"]),
                len(merge_report["discrepancies"]),
            )
        # additional_to_source resources may introduce surfaces with no
        # auto candidate: build one from the record's associated_idx
        rec_by_norm = {
            normalizer.normalize(r["original_synonyms"][0]["text"], entity_class): r
            for r in recs
            if r.get("original_synonyms")
        }
        for syn_norm, resource in resources.items():
            if syn_norm in candidates:
                continue
            rec = rec_by_norm.get(syn_norm)
            idxs = (rec or {}).get("associated_idx") or []
            if not idxs:
                continue
            candidates[syn_norm] = LinkingCandidate(
                synonym_norm=syn_norm,
                parser_name=parser_name,
                raw_synonyms=frozenset(resource.syns),
                is_symbolic=all(
                    normalizer.classify_symbolic(t, entity_class) for t in resource.syns
                ),
                mapping_types=frozenset({"human_curation"}),
                associated_id_sets=frozenset({frozenset((i, source) for i in idxs)}),
                aggregated_by="CUSTOM",
            )

    # cross-resource case-conflict analysis + OPTIMISTIC autofix
    # (curation_utils.py verify_resource_set_integrity semantics)
    _, _n_conflicts_fixed = autofix_case_conflicts(list(resources.values()))

    syn_rows = []
    ner_rows = []
    for syn_norm in sorted(candidates):
        cand = candidates[syn_norm]
        resource = resources[syn_norm]
        if resource.behaviour == "DROP_FOR_LINKING":
            continue
        syn_rows.append((parser_name, syn_norm, cand.to_json()))
        if resource.behaviour == "ADD_FOR_NER_AND_LINKING":
            for source in (resource.syns, resource.alt_syns):
                for text in sorted(source):
                    case_sensitive, confidence = source[text]
                    if confidence == int(MentionConfidence.IGNORE):
                        continue
                    ner_rows.append(
                        (
                            parser_name,
                            entity_class,
                            text,
                            text.lower(),
                            case_sensitive,
                            confidence,
                            syn_norm,
                        )
                    )

    synonyms = pd.DataFrame(syn_rows, columns=["parser_name", "synonym_norm", "candidate_json"])
    ner_terms = pd.DataFrame(
        ner_rows,
        columns=[
            "parser_name",
            "entity_class",
            "term",
            "term_lower",
            "case_sensitive",
            "confidence",
            "synonym_norm",
        ],
    )
    return meta, synonyms, ner_terms


def build_all_caches(cache_dir: str, n_per_parser: int = 200, seed: int = 42) -> str:
    """Generate the synthetic ontologies and materialize all cache tables
    as Parquet under ``cache_dir``. Idempotent (content is a pure function
    of the arguments)."""
    os.makedirs(cache_dir, exist_ok=True)
    tables = generate_ontology_tables(n_per_parser=n_per_parser, seed=seed)
    metas, syns, ners = [], [], []
    for parser_name, df in tables.items():
        entity_class, source, _ = PARSERS[parser_name]
        m, s, n = build_parser_caches(df, parser_name, entity_class, source)
        metas.append(m)
        syns.append(s)
        ners.append(n)
    pd.concat(metas, ignore_index=True).to_parquet(os.path.join(cache_dir, "metadata.parquet"))
    pd.concat(syns, ignore_index=True).to_parquet(os.path.join(cache_dir, "synonyms.parquet"))
    pd.concat(ners, ignore_index=True).to_parquet(os.path.join(cache_dir, "ner_terms.parquet"))
    return cache_dir


def build_caches_ray(
    df: pd.DataFrame,
    parser_name: str,
    entity_class: str,
    source: str,
    one_id_set_per_id: bool = False,
    group_by_exact_label: bool = False,
    find_kb=None,
):
    """Ray Data variant of the candidate-resolution groupby for large
    ontologies: ``groupby("syn_norm").map_groups`` — the prototypical
    group+reduce (``base.py:167-173``). Takes the same per-parser
    id-grouping strategy flags as :func:`build_parser_caches`. Returns
    a Dataset of (parser_name, synonym_norm, candidate_json) rows."""
    import ray.data as rd

    meta = df.drop_duplicates(subset=["idx"])[["idx", "default_label"]]
    default_labels = dict(zip(meta["idx"], meta["default_label"]))

    work = df.copy()
    work["syn"] = work["syn"].astype(str).str.strip()
    work["syn_norm"] = normalizer.normalize_batch(work["syn"].tolist(), entity_class)

    def _resolve(group: pd.DataFrame) -> pd.DataFrame:
        syn_norm = group["syn_norm"].iloc[0]
        cand = resolve_candidates_for_group(
            syn_norm, group, parser_name, entity_class, source, default_labels,
            one_id_set_per_id=one_id_set_per_id,
            group_by_exact_label=group_by_exact_label, find_kb=find_kb,
        )
        return pd.DataFrame(
            {
                "parser_name": [parser_name],
                "synonym_norm": [syn_norm],
                "candidate_json": [cand.to_json()],
            }
        )

    return (
        rd.from_pandas(work)
        .groupby("syn_norm")
        .map_groups(_resolve, batch_format="pandas")
    )
