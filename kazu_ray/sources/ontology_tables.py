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


def build_caches_from_source(
    df: pd.DataFrame, parser_name: str, entity_class: str, source: str, cache_dir: str
) -> str:
    """Run the standard cache build over a loaded source and append the
    results to (or create) the cache tables at ``cache_dir``."""
    import os

    from kazu_ray.ontology.build import build_parser_caches

    meta, syns, ner = build_parser_caches(df, parser_name, entity_class, source)
    os.makedirs(cache_dir, exist_ok=True)
    for name, frame in (("metadata", meta), ("synonyms", syns), ("ner_terms", ner)):
        path = os.path.join(cache_dir, f"{name}.parquet")
        if os.path.exists(path):
            existing = pd.read_parquet(path)
            existing = existing[existing.get("parser_name") != parser_name]
            frame = pd.concat([existing, frame], ignore_index=True)
        frame.to_parquet(path)
    return cache_dir
