"""Acceptance scoring.

Port of the reference's gold-corpus acceptance mechanism
(``kazu/annotation/acceptance_test.py:40-134, 266``): per entity class,
NER matches are *soft* (exact span OR partial overlap, same class);
linking is compared as sets of ``(source, "default_label|idx")`` per
source; aggregate precision/recall per class is then checked against
per-class thresholds (the reference reads them from the model pack's
``acceptance_criteria.json``; here they are arguments).

Operates on flat entity frames (``doc_id, start, end, entity_class,
mapping_source, mapping_label, mapping_idx``) — the engine's exploded
entities table and the oracle's gold frame share this shape.
"""

from __future__ import annotations

from collections import defaultdict

import pandas as pd


def _overlaps(a_start, a_end, b_start, b_end) -> bool:
    return a_start < b_end and b_start < a_end


def score_entities(
    gold: pd.DataFrame, test: pd.DataFrame
) -> dict[str, dict[str, float]]:
    """Per-entity-class soft NER P/R + linking P/R.

    Expects columns: doc_id, start, end, entity_class, and (optional)
    mapping_source, mapping_label, mapping_idx.
    """
    results: dict[str, dict[str, float]] = {}
    classes = sorted(set(gold["entity_class"]) | set(test["entity_class"]))
    for cls in classes:
        g = gold[gold.entity_class == cls]
        t = test[test.entity_class == cls]
        tp = 0
        matched_test: set[tuple] = set()
        link_tp = link_fp = link_fn = 0
        t_by_doc: dict[str, list] = defaultdict(list)
        for row in t.itertuples(index=False):
            t_by_doc[row.doc_id].append(row)
        for grow in g.itertuples(index=False):
            hits = [
                trow
                for trow in t_by_doc.get(grow.doc_id, ())
                if (trow.start, trow.end) == (grow.start, grow.end)
                or _overlaps(grow.start, grow.end, trow.start, trow.end)
            ]
            if hits:
                tp += 1
                matched_test.update((h.doc_id, h.start, h.end) for h in hits)
                # linking comparison over soft-matched entities; when an
                # exact-span match exists, compare against it alone — in
                # machine-vs-machine comparison a sibling entity at an
                # overlapping span (e.g. non-contiguous BRCA2 overlapping
                # BRCA1) is a distinct correct prediction, not an FP
                exact_hits = [
                    h for h in hits if (h.start, h.end) == (grow.start, grow.end)
                ]
                gold_maps = _mappings_of([grow])
                test_maps = _mappings_of(exact_hits or hits)
                for source in set(gold_maps) | set(test_maps):
                    gm = gold_maps.get(source, set())
                    tm = test_maps.get(source, set())
                    link_tp += len(gm & tm)
                    link_fn += len(gm - tm)
                    link_fp += len(tm - gm)
        fn = len(g) - tp
        fp = len({(r.doc_id, r.start, r.end) for r in t.itertuples(index=False)} - matched_test)
        results[cls] = {
            "ner_precision": tp / max(1, tp + fp),
            "ner_recall": tp / max(1, tp + fn),
            "link_precision": link_tp / max(1, link_tp + link_fp),
            "link_recall": link_tp / max(1, link_tp + link_fn),
            "n_gold": len(g),
            "n_test": len(t),
        }
    return results


def _mappings_of(rows) -> dict[str, set]:
    out: dict[str, set] = defaultdict(set)
    for r in rows:
        source = getattr(r, "mapping_source", None)
        if source:
            out[source].add((source, f"{getattr(r, 'mapping_label', '')}|{r.mapping_idx}"))
    return dict(out)


def check_acceptance(
    scores: dict[str, dict[str, float]],
    thresholds: dict[str, dict[str, float]] | None = None,
    default_threshold: float = 0.95,
) -> list[str]:
    """``analyse_full_pipeline`` shape (``acceptance_test.py:27-37,266``):
    returns the list of failures (empty = accepted)."""
    failures = []
    for cls, s in scores.items():
        th = (thresholds or {}).get(cls, {})
        for metric in ("ner_precision", "ner_recall", "link_precision", "link_recall"):
            bar = th.get(metric, default_threshold)
            if s["n_gold"] and s[metric] < bar:
                failures.append(f"{cls}.{metric}={s[metric]:.3f} < {bar}")
    return failures


def acceptance_scores(
    cache_dir: str | None = None,
    sf_dir: str = "/root/testdata/sf0.001",
    default_threshold: float = 0.95,
) -> dict:
    """Run the full Ray pipeline with the given caches and score it
    against the single-process oracle — the model-pack acceptance gate
    (the reference's ``run_acceptance_tests`` model-pack option,
    ``build_and_test_model_packs.py``). Returns ``{"passed", "failures",
    "scores"}``."""
    from kazu_ray.pipelines.kg import annotated_docs, broadcast_store
    from kazu_ray.pipelines.oracle import oracle_run
    from kazu_ray.stages.materialize import explode_entities

    gold_ents, _, _ = oracle_run(sf_dir, cache_dir=cache_dir)
    store_ref = broadcast_store(cache_dir)
    ents = explode_entities(annotated_docs(sf_dir, store_ref=store_ref)).to_pandas()

    gold = gold_ents.rename(columns={"url": "doc_id"}).assign(
        mapping_source=gold_ents.canonical_id.str.split(":").str[0],
        mapping_idx=gold_ents.canonical_id.str.split(":").str[1],
        mapping_label="",
    )
    scores = score_entities(gold, ents.assign(mapping_label=""))
    failures = check_acceptance(scores, default_threshold=default_threshold)
    return {
        "passed": bool(scores) and not failures,
        "failures": failures,
        "scores": {
            cls: {k: round(float(v), 4) for k, v in s.items()} for cls, s in scores.items()
        },
    }
