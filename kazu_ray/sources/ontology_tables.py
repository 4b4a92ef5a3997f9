"""Generic ontology source adapters.

The reference ships 28 per-ontology parser classes that all reduce to
one canonical long-thin dataframe ``[idx, default_label, syn,
mapping_type]`` (``kazu/ontology_preprocessing/base.py:726-743``; the
generic shape is ``TabularOntologyParser``,
``kazu/ontology_preprocessing/parsers.py:1519``). This module is the
engine's equivalent seam: load any tabular/JSONL source into the
canonical shape, after which the standard cache-build job
(``kazu_ray/ontology/build.py``) takes over. ChEMBL-style parquet
sources (``parsers.py:1132-1145``) are the no-op case.
"""

from __future__ import annotations

import json
import re

import pandas as pd

CANONICAL_COLUMNS = ["idx", "default_label", "syn", "mapping_type"]


def _finalize(df: pd.DataFrame, data_origin: str) -> pd.DataFrame:
    missing = [c for c in CANONICAL_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"ontology source missing columns: {missing}")
    out = df[CANONICAL_COLUMNS].copy()
    out["idx"] = out["idx"].astype(str)
    # default_label falls back to idx (base.py:317-324)
    out["default_label"] = out["default_label"].fillna(out["idx"])
    out = out.dropna(subset=["syn"])
    out["syn"] = out["syn"].astype(str).str.strip()
    out["data_origin"] = data_origin
    if "annotation_score" in df.columns:
        out["annotation_score"] = df["annotation_score"].fillna(0).astype(int)
    else:
        out["annotation_score"] = 0
    return out.drop_duplicates(subset=CANONICAL_COLUMNS).reset_index(drop=True)


def from_parquet(path: str, data_origin: str, column_map: dict | None = None) -> pd.DataFrame:
    df = pd.read_parquet(path)
    if column_map:
        df = df.rename(columns=column_map)
    return _finalize(df, data_origin)


def from_canonical_parquet(path: str, data_origin: str = "chembl") -> pd.DataFrame:
    """Parquet already in the canonical [idx, default_label, syn,
    mapping_type] layout — the modern ChEMBL input. Mirrors
    ``ChemblParquetOntologyParser.parse_to_dataframe``
    (``kazu/ontology_preprocessing/parsers.py:1132-1145``): a plain
    read, no reshaping."""
    return _finalize(pd.read_parquet(path), data_origin)


def from_csv(path: str, data_origin: str, column_map: dict | None = None, sep: str = ",") -> pd.DataFrame:
    df = pd.read_csv(path, sep=sep)
    if column_map:
        df = df.rename(columns=column_map)
    return _finalize(df, data_origin)


def from_jsonl(
    path: str,
    data_origin: str,
    idx_field: str = "id",
    label_field: str = "name",
    synonym_fields: tuple = ("name", "synonyms"),
) -> pd.DataFrame:
    """OpenTargets-style JSONL: one record per concept, synonyms nested
    in list fields (``parsers.py:97-261`` shape)."""
    rows = []
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            rec = json.loads(line)
            idx = str(rec[idx_field])
            label = rec.get(label_field) or idx
            for field in synonym_fields:
                val = rec.get(field)
                if val is None:
                    continue
                syns = val if isinstance(val, list) else [val]
                for syn in syns:
                    rows.append((idx, label, syn, field))
    return _finalize(
        pd.DataFrame(rows, columns=CANONICAL_COLUMNS), data_origin
    )


def from_chembl_sqlite(path: str, data_origin: str = "chembl") -> pd.DataFrame:
    """ChEMBL sqlite dump → canonical long-thin frame.

    Mirrors ``ChemblOntologyParser.parse_to_dataframe``
    (``kazu/ontology_preprocessing/parsers.py:1098-1129``): synonym rows
    from ``molecule_dictionary ⋈ molecule_synonyms`` unioned with one
    ``pref_name`` row per molecule; entries without a ``pref_name`` are
    dropped; exact duplicates collapsed. stdlib ``sqlite3`` — no new
    dependency.
    """
    import sqlite3

    conn = sqlite3.connect(path)
    try:
        df = pd.read_sql(
            """
            SELECT chembl_id AS idx, pref_name AS default_label,
                   synonyms AS syn, syn_type AS mapping_type
            FROM molecule_dictionary AS md
                 JOIN molecule_synonyms ms ON md.molregno = ms.molregno
            UNION ALL
            SELECT chembl_id AS idx, pref_name AS default_label,
                   pref_name AS syn, 'pref_name' AS mapping_type
            FROM molecule_dictionary
            """,
            conn,
        )
    finally:
        conn.close()
    df = df.dropna(subset=["default_label"])
    return _finalize(df, data_origin)


def from_opentargets_disease_jsonl(
    path: str,
    data_origin: str = "opentargets",
    allowed_therapeutic_areas: tuple = (),
) -> pd.DataFrame:
    """OpenTargets disease release JSONL → canonical frame + xrefs.

    Mirrors ``OpenTargetsDiseaseOntologyParser.json_dict_to_parser_records``
    (``kazu/ontology_preprocessing/parsers.py:226-260``): records whose
    ``therapeuticAreas`` are disjoint from the allowed set are skipped;
    each kept record yields one ``name`` row plus one row per
    ``synonyms.hasExactSynonym`` (related synonyms ignored, as in the
    reference). The record's ``dbXRefs`` — plus its own id in ``:``
    form, the reference's format fixup — are carried in an extra
    ``xrefs`` column (JSON-encoded list) for the xref-based id grouping
    strategy in the cache build.
    """
    allowed = set(allowed_therapeutic_areas)
    rows = []
    xref_col = []
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            rec = json.loads(line)
            if allowed and allowed.isdisjoint(rec.get("therapeuticAreas", ())):
                continue
            idx = str(rec["id"])
            label = rec["name"]
            xrefs = list(rec.get("dbXRefs", [])) + [idx.replace("_", ":")]
            rows.append((idx, label, label, "name"))
            xref_col.append(json.dumps(sorted(set(xrefs))))
            for syn in rec.get("synonyms", {}).get("hasExactSynonym", []):
                rows.append((idx, label, syn, "hasExactSynonym"))
                xref_col.append(json.dumps(sorted(set(xrefs))))
    df = pd.DataFrame(rows, columns=CANONICAL_COLUMNS)
    df["xrefs"] = xref_col
    out = _finalize(df, data_origin)
    # _finalize deduplicates on the canonical columns; re-attach xrefs
    # (constant per idx) by merge
    xref_by_idx = df.drop_duplicates("idx").set_index("idx")["xrefs"]
    out["xrefs"] = out["idx"].map(xref_by_idx)
    return out


OT_TARGET_ANNOTATION_FIELDS = (
    "subcellularLocations",
    "tractability",
    "constraint",
    "functionDescriptions",
    "go",
    "hallmarks",
    "chemicalProbes",
    "safetyLiabilities",
    "pathways",
    "targetClass",
)


def from_opentargets_target_jsonl(
    path: str,
    data_origin: str = "opentargets",
    excluded_biotypes: tuple = (),
) -> pd.DataFrame:
    """OpenTargets target (gene) release JSONL → canonical frame.

    Mirrors ``OpenTargetsTargetOntologyParser.json_dict_to_parser_records``
    (``kazu/ontology_preprocessing/parsers.py:373-421``): excluded
    biotypes skipped; records with no approved symbol (``id ==
    approvedSymbol``) skipped; ``annotation_score`` = number of
    non-empty annotation fields (used downstream to rank gene ids that
    share a symbol); synonym rows from the ``synonyms`` /
    ``obsoleteSymbols`` / ``obsoleteNames`` / ``proteinIds``
    label-or-id + source records, plus one row each for approvedSymbol,
    approvedName and the raw id (mapping type ``opentargets_id``).
    """
    excluded = set(excluded_biotypes)
    rows = []
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            rec = json.loads(line)
            if rec.get("biotype") in excluded:
                continue
            if rec["id"] == rec["approvedSymbol"]:
                continue
            score = sum(
                1 for fld in OT_TARGET_ANNOTATION_FIELDS if len(rec.get(fld, [])) > 0
            )
            idx = str(rec["id"])
            label = rec["approvedSymbol"]
            for key in ("synonyms", "obsoleteSymbols", "obsoleteNames", "proteinIds"):
                for sub in rec.get(key, []):
                    if "label" in sub and "id" in sub:
                        raise ValueError(f"record has both id and label: {sub}")
                    syn = sub.get("label", sub.get("id"))
                    rows.append((idx, label, syn, sub["source"], score))
            for key, mtype in (
                ("approvedSymbol", "approvedSymbol"),
                ("approvedName", "approvedName"),
                ("id", "opentargets_id"),
            ):
                rows.append((idx, label, rec[key], mtype, score))
    df = pd.DataFrame(rows, columns=CANONICAL_COLUMNS + ["annotation_score"])
    return _finalize(df, data_origin)


def from_opentargets_molecule_jsonl(
    path: str, data_origin: str = "opentargets"
) -> pd.DataFrame:
    """OpenTargets molecule release JSONL → canonical frame.

    Mirrors ``OpenTargetsMoleculeOntologyParser`` (``parsers.py:424-456``):
    the ``name`` joins the ``synonyms`` list (mapping type ``synonyms``)
    and ``tradeNames`` become rows of their own mapping type.
    """
    rows = []
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            rec = json.loads(line)
            idx = str(rec["id"])
            label = rec["name"]
            for syn in list(rec.get("synonyms", [])) + [label]:
                rows.append((idx, label, syn, "synonyms"))
            for trade in rec.get("tradeNames", []):
                rows.append((idx, label, trade, "tradeNames"))
    return _finalize(pd.DataFrame(rows, columns=CANONICAL_COLUMNS), data_origin)


_OBO_SYNONYM_RE = re.compile(
    r"""^synonym:      # line that begins synonyms
    \s*                # any amount of whitespace (standardly a single space)
    "(?P<syn>[^"]*)"   # a quoted string - the synonym text
    \s*
    (?P<mapping>\w*)   # mapping type (EXACT / RELATED / ...)
    .*$""",
    re.VERBOSE,
)
_CELL_LINE_RE = re.compile("cell line", re.IGNORECASE)


def from_obo(
    path: str,
    data_origin: str,
    use_synonyms: bool = True,
    remove_cell_line_text: bool = False,
) -> pd.DataFrame:
    """OBO flat-file parser (``[Term]`` stanzas with ``id:`` / ``name:``
    / ``synonym:`` lines).

    Mirrors ``CellosaurusOntologyParser.parse_to_dataframe``
    (``kazu/ontology_preprocessing/parsers.py:1186-1263``):
    ``remove_cell_line_text=True`` reproduces its "cell line"-stripping
    behaviour and ``use_synonyms=False`` its name-only term extraction
    (the reference skips Cellosaurus synonym lines as unreliable);
    with synonyms on, each ``synonym: "<text>" <MAPPING> [...]`` line
    becomes a row with its OBO mapping type (the commented-out general
    path at parsers.py:1240-1252, here implemented).
    """
    rows = []
    current_id = ""
    current_label = ""
    with open(path) as f:
        for line in f:
            text = line.rstrip()
            if text.startswith("id:"):
                current_id = text.split(" ", 1)[1].strip()
            elif text.startswith("name:"):
                current_label = text[5:].strip()
                if remove_cell_line_text:
                    current_label = _CELL_LINE_RE.sub("", current_label).strip()
                rows.append((current_id, current_label, current_label, "name"))
            elif use_synonyms and text.startswith("synonym:"):
                m = _OBO_SYNONYM_RE.match(text)
                if m is None:
                    raise ValueError(f"unparseable OBO synonym line: {text!r}")
                syn = m.group("syn")
                if remove_cell_line_text:
                    syn = _CELL_LINE_RE.sub("", syn).strip()
                rows.append((current_id, current_label, syn, m.group("mapping") or "synonym"))
    return _finalize(pd.DataFrame(rows, columns=CANONICAL_COLUMNS), data_origin)


def from_meddra_dir(
    path: str,
    data_origin: str = "meddra",
    exclude_socs: tuple = (
        "Surgical and medical procedures",
        "Social circumstances",
        "Investigations",
    ),
) -> pd.DataFrame:
    """Meddra release directory parser: '$'-separated ``mdhier.asc`` +
    ``llt.asc``.

    Semantics of ``MeddraOntologyParser.parse_to_dataframe``
    (``kazu/ontology_preprocessing/parsers.py:1275-1428``): PT terms
    with their LLT synonyms, plus distinct HLT and HLGT rows, excluding
    the given SOCs; mapping_type is always ``meddra_link``. Implemented
    as vectorized pandas merges instead of the reference's per-row
    loops (identical rows, different order — downstream build sorts).
    """
    import os

    mdhier_cols = (
        "pt_code hlt_code hlgt_code soc_code pt_name hlt_name hlgt_name "
        "soc_name soc_abbrev null_field pt_soc_code primary_soc_fg NULL"
    ).split()
    llt_cols = (
        "llt_code llt_name pt_code llt_whoart_code llt_harts_code "
        "llt_costart_sym llt_icd9_code llt_icd9cm_code llt_icd10_code "
        "llt_currency llt_jart_code NULL"
    ).split()
    hier = pd.read_csv(
        os.path.join(path, "mdhier.asc"), sep="$", header=None,
        names=mdhier_cols, dtype="string", engine="python",
    )
    hier = hier[~hier["soc_name"].isin(exclude_socs)]
    llt = pd.read_csv(
        os.path.join(path, "llt.asc"), sep="$", header=None,
        names=llt_cols, usecols=("llt_name", "pt_code"), dtype="string",
        engine="python",
    )

    pt = hier[["pt_code", "pt_name"]].rename(columns={"pt_code": "idx", "pt_name": "default_label"})
    pt_rows = pt.assign(syn=pt["default_label"])
    llt_rows = hier[["pt_code", "pt_name"]].merge(llt, on="pt_code")[
        ["pt_code", "pt_name", "llt_name"]
    ].rename(columns={"pt_code": "idx", "pt_name": "default_label", "llt_name": "syn"})
    hlt_rows = (
        hier[["hlt_code", "hlt_name"]].drop_duplicates()
        .rename(columns={"hlt_code": "idx", "hlt_name": "default_label"})
    )
    hlt_rows = hlt_rows.assign(syn=hlt_rows["default_label"])
    hlgt_rows = (
        hier[["hlgt_code", "hlgt_name"]].drop_duplicates()
        .rename(columns={"hlgt_code": "idx", "hlgt_name": "default_label"})
    )
    hlgt_rows = hlgt_rows.assign(syn=hlgt_rows["default_label"])
    out = pd.concat([pt_rows, llt_rows, hlt_rows, hlgt_rows], ignore_index=True)
    out["mapping_type"] = "meddra_link"
    return _finalize(out, data_origin)


_NT_LINE_RE = re.compile(
    r'^\s*<(?P<subj>[^>]+)>\s+<(?P<pred>[^>]+)>\s+'
    r'(?:<(?P<obj_iri>[^>]+)>|"(?P<obj_lit>(?:[^"\\]|\\.)*)"(?:@[\w\-]+|\^\^<[^>]+>)?)'
    r"\s*\.\s*$"
)
_NT_ESCAPES = {"\\n": "\n", "\\t": "\t", '\\"': '"', "\\\\": "\\", "\\r": "\r"}

RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
OBO_EXACT_SYNONYM = "http://www.geneontology.org/formats/oboInOwl#hasExactSynonym"


def _nt_unescape(s: str) -> str:
    for esc, ch in _NT_ESCAPES.items():
        s = s.replace(esc, ch)
    return s


def from_ntriples(
    path: str,
    data_origin: str,
    uri_regex: str,
    synonym_predicates: tuple = (OBO_EXACT_SYNONYM,),
    label_predicate: str = RDFS_LABEL,
    include_entity_patterns: tuple = (),
    exclude_entity_patterns: tuple = (),
) -> pd.DataFrame:
    """RDF N-Triples parser — ``RDFGraphParser.parse_to_dataframe``
    semantics (``kazu/ontology_preprocessing/parsers.py:467-620``)
    without rdflib (absent in this environment): entities are subjects
    matching ``uri_regex`` that carry a ``label_predicate`` triple; the
    label becomes a row with mapping_type = the label predicate IRI, and
    every ``synonym_predicates`` object becomes a synonym row with its
    predicate IRI as mapping_type — the reference's exact row shape.
    Only the line-based N-Triples serialization is supported (the
    reference defers format sniffing to rdflib; OWL/XML needs a real
    RDF stack).

    A predicate may also be a 2-tuple of IRIs ``(p1, p2)`` — an rdflib
    ``SequencePath`` equivalent (the reference's SKOS-XL label paths,
    ``parsers.py:622-628``): subject --p1--> label node --p2--> literal;
    the synthesized row's mapping_type is ``"p1/p2"``.
    """
    def spo():
        with open(path, encoding="utf-8") as f:
            for line in f:
                if not line.strip() or line.lstrip().startswith("#"):
                    continue
                m = _NT_LINE_RE.match(line)
                if m is None:
                    continue
                lit = m.group("obj_lit")
                if lit is not None:
                    yield m.group("subj"), m.group("pred"), _nt_unescape(lit), True
                else:
                    yield m.group("subj"), m.group("pred"), m.group("obj_iri"), False

    rows = _rows_from_spo(
        _flatten_paths(spo(), (label_predicate, *synonym_predicates)),
        uri_regex,
        tuple(_pred_key(p) for p in synonym_predicates),
        _pred_key(label_predicate),
        include_entity_patterns, exclude_entity_patterns,
    )
    return _finalize(pd.DataFrame(rows, columns=CANONICAL_COLUMNS), data_origin)


def _pred_key(pred) -> str:
    """Flat predicate → its IRI; 2-hop path → ``"p1/p2"``."""
    return pred if isinstance(pred, str) else "/".join(pred)


def _flatten_paths(spo_iter, predicates):
    """Resolve 2-hop predicate paths over a (subj, pred, obj, is_literal)
    stream into direct literal triples, passing flat literal triples
    through unchanged. Equivalent to rdflib's ``SequencePath`` traversal
    in ``RDFGraphParser.parse_to_dataframe`` (``parsers.py:575-607``)
    for the path shape the reference uses (SKOS-XL ``prefLabel /
    literalForm``). Buffers only triples whose predicate participates in
    a path — ontology files are small next to the corpus, and only the
    label-node edges are held."""
    paths = [p for p in predicates if not isinstance(p, str)]
    if not paths:
        for subj, pred, obj, is_lit in spo_iter:
            if is_lit:
                yield subj, pred, obj
        return
    first_hops = {p[0] for p in paths}
    second_hops = {p[1] for p in paths}
    edge1: list[tuple[str, str, str]] = []  # (subj, p1, node)
    edge2: dict[tuple[str, str], list[str]] = {}  # (node, p2) -> literals
    for subj, pred, obj, is_lit in spo_iter:
        if is_lit:
            if pred in second_hops:
                edge2.setdefault((subj, pred), []).append(obj)
            else:
                yield subj, pred, obj
        elif pred in first_hops:
            edge1.append((subj, pred, obj))
    for subj, p1, node in edge1:
        for p2 in second_hops:
            for lit in edge2.get((node, p2), ()):
                yield subj, f"{p1}/{p2}", lit


SKOS_XL_PREF_LABEL_PATH = (
    "http://www.w3.org/2008/05/skos-xl#prefLabel",
    "http://www.w3.org/2008/05/skos-xl#literalForm",
)
SKOS_XL_ALT_LABEL_PATH = (
    "http://www.w3.org/2008/05/skos-xl#altLabel",
    "http://www.w3.org/2008/05/skos-xl#literalForm",
)


def from_skosxl(
    path: str,
    data_origin: str,
    uri_regex: str,
    synonym_predicates: tuple = (SKOS_XL_ALT_LABEL_PATH,),
    label_predicate=SKOS_XL_PREF_LABEL_PATH,
    include_entity_patterns: tuple = (),
    exclude_entity_patterns: tuple = (),
) -> pd.DataFrame:
    """SKOSXLGraphParser port (``parsers.py:630-676``): the generic RDF
    reader with SKOS-XL 2-hop label/synonym paths as defaults (labels
    live on intermediate skosxl:Label nodes reached via prefLabel /
    altLabel, their text under literalForm)."""
    reader = from_ntriples if path.endswith(".nt") else from_rdf_xml
    return reader(
        path,
        data_origin,
        uri_regex=uri_regex,
        synonym_predicates=synonym_predicates,
        label_predicate=label_predicate,
        include_entity_patterns=include_entity_patterns,
        exclude_entity_patterns=exclude_entity_patterns,
    )


def _rows_from_spo(
    spo_iter,
    uri_regex: str,
    synonym_predicates: tuple,
    label_predicate: str,
    include_entity_patterns: tuple = (),
    exclude_entity_patterns: tuple = (),
) -> list[tuple]:
    """(subject, predicate, literal) triples → canonical rows: subjects
    matching ``uri_regex`` with a label triple yield one label row plus
    one row per synonym-predicate literal, mapping_type = predicate IRI
    (the ``RDFGraphParser`` row shape, ``parsers.py:467-620``).

    ``include_entity_patterns`` / ``exclude_entity_patterns`` are
    (predicate, literal) pairs with the reference's semantics
    (``parsers.py:589-595``): a subject is kept only if EVERY include
    pattern is among its triples and NO exclude pattern is — the
    mechanism behind the per-namespace GeneOntology parsers."""
    uri_re = re.compile(uri_regex)
    syn_preds = set(synonym_predicates)
    labels: dict[str, str] = {}
    syns_by_subj: dict[str, list[tuple[str, str]]] = {}
    pattern_preds = {p for p, _v in include_entity_patterns} | {
        p for p, _v in exclude_entity_patterns
    }
    subj_patterns: dict[str, set[tuple[str, str]]] = {}
    for subj, pred, lit in spo_iter:
        if pred == label_predicate:
            labels[subj] = lit
        elif pred in syn_preds:
            syns_by_subj.setdefault(subj, []).append((lit, pred))
        if pred in pattern_preds:
            subj_patterns.setdefault(subj, set()).add((pred, lit))
    rows = []
    for subj, label in labels.items():
        if not uri_re.match(subj):
            continue
        have = subj_patterns.get(subj, set())
        if any(pat not in have for pat in include_entity_patterns):
            continue
        if any(pat in have for pat in exclude_entity_patterns):
            continue
        rows.append((subj, label, label, label_predicate))
        for syn, pred in syns_by_subj.get(subj, []):
            rows.append((subj, label, syn, pred))
    return rows


_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def from_rdf_xml(
    path: str,
    data_origin: str,
    uri_regex: str,
    synonym_predicates: tuple = (OBO_EXACT_SYNONYM,),
    label_predicate: str = RDFS_LABEL,
    include_entity_patterns: tuple = (),
    exclude_entity_patterns: tuple = (),
) -> pd.DataFrame:
    """RDF/XML (OWL) parser — the serialization OBO Foundry ontologies
    (CLO, Mondo, CL, UBERON …) actually ship, so a user pointing at a
    downloaded ``.owl`` file lands here. Same ``RDFGraphParser``
    semantics as :func:`from_ntriples`; rdflib being absent, this is a
    from-scratch streaming reader (``xml.etree.iterparse``, elements
    cleared as they complete — memory stays flat on multi-GB files) for
    the striped subset those files use: node elements carrying
    ``rdf:about`` (or ``rdf:nodeID`` / anonymous nesting for blank
    label nodes), child predicate elements whose namespace+localname is
    the predicate IRI, objects as literal text, ``rdf:resource`` /
    ``rdf:nodeID`` references, or a nested node element. 2-tuple
    predicates are SKOS-XL-style paths (see :func:`from_ntriples`).
    """
    import xml.etree.ElementTree as ET

    def spo():
        about_key = f"{{{_RDF_NS}}}about"
        nodeid_key = f"{{{_RDF_NS}}}nodeID"
        resource_key = f"{{{_RDF_NS}}}resource"

        def subj_of(node):
            return (
                node.get(about_key)
                or node.get(nodeid_key)
                and f"_:{node.get(nodeid_key)}"
                or f"_:anon{id(node)}"
            )

        def emit(top):
            # every descendant with rdf:about/rdf:nodeID is a node
            # element (striped syntax nests them inside predicate
            # elements at any depth); its direct children are predicate
            # elements. Anonymous nested node elements get a synthetic
            # blank id so paths can traverse them.
            for node in top.iter():
                if node.get(about_key) is None and node.get(nodeid_key) is None and node is not top:
                    continue
                subj = subj_of(node)
                for child in node:
                    if not child.tag.startswith("{"):
                        continue
                    ns, local = child.tag[1:].split("}", 1)
                    pred = ns + local
                    text = (child.text or "").strip()
                    ref = child.get(resource_key) or (
                        child.get(nodeid_key) and f"_:{child.get(nodeid_key)}"
                    )
                    nested = [g for g in child if g.tag.startswith("{")]
                    if text:
                        yield subj, pred, text, True
                    elif ref:
                        yield subj, pred, ref, False
                    elif nested:
                        # striped anonymous object node: link, then
                        # emit its own predicate triples
                        obj_node = nested[0]
                        yield subj, pred, subj_of(obj_node), False
                        yield from emit(obj_node)

        context = ET.iterparse(path, events=("start", "end"))
        event, root = next(context)
        depth = 1
        for event, elem in context:
            if event == "start":
                depth += 1
            else:
                depth -= 1
                if depth == 1:  # a complete top-level node element
                    yield from emit(elem)
                    root.clear()

    rows = _rows_from_spo(
        _flatten_paths(spo(), (label_predicate, *synonym_predicates)),
        uri_regex,
        tuple(_pred_key(p) for p in synonym_predicates),
        _pred_key(label_predicate),
        include_entity_patterns, exclude_entity_patterns,
    )
    return _finalize(pd.DataFrame(rows, columns=CANONICAL_COLUMNS), data_origin)


GO_URI_REGEX = r"^http://purl.obolibrary.org/obo/GO_[0-9]+$"
OBO_NAMESPACE_PRED = "http://www.geneontology.org/formats/oboInOwl#hasOBONamespace"


def from_gene_ontology(
    path: str,
    data_origin: str = "go",
    namespace: str | None = None,
) -> pd.DataFrame:
    """GeneOntologyParser port (``parsers.py:678-898``): the GO
    ``uri_regex`` and ``hasExactSynonym`` predicate, optional filtering
    to one ``hasOBONamespace`` (the Biological Process / Molecular
    Function / Cellular Component subclasses are exactly this include
    pattern, ``parsers.py:806-813``), and the GO-specific exclusion:
    rows whose default label contains ``obsolete`` are dropped
    (``parsers.py:766-775``). ``path`` may be ``.nt`` or RDF/XML."""
    include = (
        ((OBO_NAMESPACE_PRED, namespace),) if namespace is not None else ()
    )
    reader = from_ntriples if path.endswith(".nt") else from_rdf_xml
    df = reader(
        path,
        data_origin,
        uri_regex=GO_URI_REGEX,
        synonym_predicates=(OBO_EXACT_SYNONYM,),
        include_entity_patterns=include,
    )
    return df[~df["default_label"].str.contains("obsolete")].reset_index(drop=True)


def from_hgnc_gene_family_tsv(path: str, data_origin: str = "hgnc_gene_family") -> pd.DataFrame:
    """HGNCGeneFamilyParser port (``parsers.py:1477-1517``): group the
    TSV by ``Family ID``; the (unique) ``Family name`` becomes the
    default label and a synonym row with mapping_type ``Family name``;
    every distinct value in the ``Family alias`` and ``Common root gene
    symbol`` columns becomes a synonym row with the column name as its
    mapping_type."""
    syn_column_keys = ("Family alias", "Common root gene symbol")
    df = pd.read_csv(path, sep="\t")
    rows = []
    for family_id, grp in df.groupby(by="Family ID"):
        names = set(grp["Family name"].dropna())
        # "in theory, there should only be one family name per ID"
        assert len(names) == 1, f"multiple family names for {family_id}: {names}"
        default_label = next(iter(names))
        rows.append((str(family_id), default_label, default_label, "Family name"))
        for key in syn_column_keys:
            for syn in sorted(set(grp[key].dropna())):
                rows.append((str(family_id), default_label, syn, key))
    return _finalize(pd.DataFrame(rows, columns=CANONICAL_COLUMNS), data_origin)


def from_tsv(path: str, data_origin: str, column_map: dict | None = None) -> pd.DataFrame:
    """TSV shorthand for :func:`from_csv` — the reference's
    ``TabularOntologyParser`` (``parsers.py:1519``) with ``sep='\\t'``."""
    return from_csv(path, data_origin, column_map=column_map, sep="\t")


def build_caches_from_source(
    df: pd.DataFrame,
    parser_name: str,
    entity_class: str,
    source: str,
    cache_dir: str,
    curations_path: str | None = None,
    one_id_set_per_id: bool = False,
    group_by_exact_label: bool = False,
    find_kb=None,
) -> str:
    """Run the standard cache build over a loaded source and append the
    results to (or create) the cache tables at ``cache_dir``.
    ``curations_path`` merges a human-override jsonl (see
    ``kazu_ray.ontology.build.build_parser_caches``);
    ``one_id_set_per_id`` selects the Cellosaurus id-grouping strategy
    (every id its own equivalent-id set, ``parsers.py:1194-1215``)."""
    import os

    from kazu_ray.ontology.build import build_parser_caches

    meta, syns, ner = build_parser_caches(
        df, parser_name, entity_class, source, curations_path=curations_path,
        one_id_set_per_id=one_id_set_per_id,
        group_by_exact_label=group_by_exact_label, find_kb=find_kb,
    )
    os.makedirs(cache_dir, exist_ok=True)
    for name, frame in (("metadata", meta), ("synonyms", syns), ("ner_terms", ner)):
        path = os.path.join(cache_dir, f"{name}.parquet")
        if os.path.exists(path):
            existing = pd.read_parquet(path)
            existing = existing[existing.get("parser_name") != parser_name]
            frame = pd.concat([existing, frame], ignore_index=True)
        frame.to_parquet(path)
    return cache_dir


MONDO_URI_REGEX = r"^http://purl.obolibrary.org/obo/(MONDO|HP)_[0-9]+$"


def from_obograph_json(
    path: str,
    data_origin: str = "mondo",
    uri_regex: str = MONDO_URI_REGEX,
) -> pd.DataFrame:
    """MondoOntologyParser port (``parsers.py:940-995``): the OBO-graphs
    JSON serialization (``graphs[0].nodes``). A node contributes rows
    only if its ``id`` IRI matches ``uri_regex`` (Mondo keeps MONDO and
    HP purls) AND it carries a ``lbl`` (unlabeled nodes are skipped
    entirely, synonyms included). The label becomes a synonym row with
    mapping_type ``lbl``; each ``meta.synonyms`` entry with pred
    ``hasExactSynonym`` becomes one more row (other synonym scopes are
    deliberately ignored, matching the reference)."""
    pat = re.compile(uri_regex)
    with open(path) as f:
        graph = json.load(f)["graphs"][0]
    rows = []
    for node in graph["nodes"]:
        idx = node["id"]
        if not pat.match(idx):
            continue
        label = node.get("lbl")
        if label is None:
            continue
        rows.append((idx, label, label, "lbl"))
        for syn_dict in node.get("meta", {}).get("synonyms", []):
            if syn_dict["pred"] in {"hasExactSynonym"}:
                rows.append((idx, label, syn_dict["val"], syn_dict["pred"]))
    return _finalize(
        pd.DataFrame(rows, columns=CANONICAL_COLUMNS), data_origin
    )


_CELL_LINE_RE = re.compile("cell line", re.IGNORECASE)


def from_cellosaurus_obo(path: str, data_origin: str = "cellosaurus") -> pd.DataFrame:
    """CellosaurusOntologyParser port (``parsers.py:1186-1275``): an OBO
    flat file read for ``id:`` / ``name:`` lines ONLY — the reference
    deliberately ignores the synonym field ("synonyms in cellosaurus
    are a bit of a mess") — with the literal text ``cell line`` removed
    case-insensitively from every label (they are all cell lines and it
    confuses mapping); mapping_type ``name``. Pair with
    ``one_id_set_per_id=True`` in the cache build for the reference's
    custom score_and_group_ids (every synonym its own id set)."""
    rows = []
    cur_id = ""
    with open(path) as f:
        for line in f:
            text = line.rstrip()
            if text.startswith("id:"):
                cur_id = text.split(" ")[1]
            elif text.startswith("name:"):
                label = _CELL_LINE_RE.sub("", text[5:].strip()).strip()
                rows.append((cur_id, label, label, "name"))
    return _finalize(
        pd.DataFrame(rows, columns=CANONICAL_COLUMNS), data_origin
    )


def from_atc_classification(path: str, data_origin: str = "atc") -> pd.DataFrame:
    """ATCDrugClassificationParser port (``parsers.py:1594-1661``):
    5-space-separated ``code`` / merged ``level_and_description`` rows;
    the merged field's FIRST character is the ATC level (kept as the
    mapping_type), the remainder the label. Levels 1-3 are dropped
    (anatomical/therapeutic groups too generic to link against)."""
    df = pd.read_csv(
        path,
        sep="     ",
        header=None,
        names=["code", "level_and_description"],
        engine="python",  # the C engine can't handle a multi-char sep
    ).map(str.strip)
    out = pd.DataFrame(
        {
            "idx": df["code"],
            "mapping_type": df["level_and_description"].str[0],
            "default_label": df["level_and_description"].str[1:],
        }
    )
    out = out[~out["mapping_type"].isin({"1", "2", "3"})]
    out["syn"] = out["default_label"]
    return _finalize(out[CANONICAL_COLUMNS], data_origin)


def from_hgnc_complete_set_json(path: str, data_origin: str = "hgnc") -> pd.DataFrame:
    """HGNCGeneOntologyParser port (``parsers.py:996-1095``): the HGNC
    ``hgnc_complete_set.json`` gene dump. Docs without an
    ``ensembl_gene_id`` or a ``name`` are skipped entirely; each of the
    15 synonym-bearing keys contributes its (string, key) pairs, deduped
    per doc as a set (kb = ENSEMBL)."""
    keys_to_check = [
        "name", "symbol", "uniprot_ids", "alias_name", "alias_symbol",
        "prev_name", "lncipedia", "prev_symbol", "vega_id",
        "refseq_accession", "hgnc_id", "mgd_id", "rgd_id", "ccds_id",
        "pseudogene.org",
    ]
    with open(path) as f:
        docs = json.load(f)["response"]["docs"]
    rows = []
    for doc in docs:
        ensembl_gene_id = doc.get("ensembl_gene_id")
        name = doc.get("name")
        if ensembl_gene_id is None or name is None:
            continue
        synonyms = set()
        for key in keys_to_check:
            found = doc.get(key, [])
            if not isinstance(found, list):
                found = [found]
            for syn in found:
                synonyms.add((syn, key))
        for syn, mapping_type in sorted(synonyms):
            rows.append((ensembl_gene_id, name, syn, mapping_type))
    return _finalize(pd.DataFrame(rows, columns=CANONICAL_COLUMNS), data_origin)


def _kb_from_obo_iri(iri: str) -> str:
    """MondoOntologyParser.find_kb (``parsers.py:945-951``): the
    ontology prefix of an OBO purl's final path segment."""
    from urllib.parse import urlparse

    return urlparse(iri).path.split("/")[-1].split("_")[0]


# RDFGraphParser subclasses that are pure configuration over the generic
# reader: (uri_regex, synonym_predicates, label_predicate, find_kb).
# find_kb mirrors each subclass's override (default: the parser name,
# ``parsers.py:537-543``); it feeds per-id sources in the cache build.
RDF_PARSER_PRESETS: dict = {
    # UberonOntologyParser (parsers.py:899-938)
    "uberon": (
        r"^http://purl.obolibrary.org/obo/UBERON_[0-9]+$",
        (OBO_EXACT_SYNONYM,), RDFS_LABEL, lambda iri: "UBERON",
    ),
    # CLOOntologyParser (parsers.py:1147-1184)
    "clo": (
        r"^http://purl.obolibrary.org/obo/CLO_[0-9]+$",
        (OBO_EXACT_SYNONYM,), RDFS_LABEL, lambda iri: "CLO",
    ),
    # CLOntologyParser (parsers.py:1432-1475)
    "cl": (
        r"^http://purl.obolibrary.org/obo/CL_[0-9]+$",
        (OBO_EXACT_SYNONYM,), RDFS_LABEL, lambda iri: "CL",
    ),
    # StatoParser (parsers.py:1663-1707): OBI or STATO by id
    "stato": (
        r"^http://purl.obolibrary.org/obo/(OBI|STATO)_[0-9]+$",
        ("http://purl.obolibrary.org/obo/IAO_0000111",), RDFS_LABEL,
        lambda iri: "OBI" if "OBI" in iri else "STATO",
    ),
    # HPOntologyParser (parsers.py:1709-1760)
    "hp": (
        r"^http://purl.obolibrary.org/obo/HP_[0-9]+$",
        (OBO_EXACT_SYNONYM,), RDFS_LABEL, lambda iri: "HP",
    ),
}


def from_rdf_preset(path: str, preset: str, data_origin: str | None = None) -> pd.DataFrame:
    """Load an ``.nt`` / ``.owl`` file with one of the reference's
    concrete RDF parser configurations (``RDF_PARSER_PRESETS``)."""
    uri_regex, syn_preds, label_pred, _kb = RDF_PARSER_PRESETS[preset]
    reader = from_ntriples if path.endswith(".nt") else from_rdf_xml
    return reader(
        path,
        data_origin or preset,
        uri_regex=uri_regex,
        synonym_predicates=syn_preds,
        label_predicate=label_pred,
    )
