"""Single-process oracle pipeline.

Driver-side, Ray-free execution of the full KG pipeline over a pandas
pages frame, mirroring the reference's sequential ``list[Document]``
fold (``kazu/pipeline/__init__.py:211-288``). Used by the acceptance
tests as the gold standard for the P/R ≥ 0.95 gate (BASELINE.md): the
Ray pipeline must reproduce this output over the same corpus. It drives
the same per-doc kernel (``AnnotateStage.annotate_doc``) the Ray stages
use, so the comparison validates the distributed plumbing (streaming,
batching, worker state, explode) rather than re-deriving the NLP
semantics twice.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from kazu_ray.sources.corpus import pages_pandas
from kazu_ray.stages.docproc import canonical_id
from kazu_ray.stages.extract import SKIP_DOC_LEN, html_to_text
from kazu_ray.stages.fused import AnnotateStage
from kazu_ray.state.store import ensure_default_caches


def oracle_run(
    sf_dir: str,
    limit: int | None = None,
    with_model_ner: bool = True,
    cache_dir: str | None = None,
):
    """Returns (entities_df, triples_df, text_hashes_df)."""
    cache_dir = ensure_default_caches(cache_dir)
    stage = AnnotateStage(cache_dir, with_model_ner=with_model_ner)

    pages = pages_pandas(sf_dir, limit=limit)
    ent_rows, triple_rows, hash_rows = [], [], []
    for row in pages.itertuples(index=False):
        text = row.text if row.text is not None else html_to_text(row.html)
        hash_rows.append((row.url, hashlib.sha256(text.encode()).hexdigest()))
        if row.lang != "en" or len(text) >= SKIP_DOC_LEN:
            continue
        (final_ents, triples), _spans = stage.annotate_doc(text, row.url)
        for e in final_ents:
            ent_rows.append(
                (
                    row.url,
                    e["start"],
                    e["end"],
                    e["match"],
                    e["entity_class"],
                    canonical_id(e),
                    len(e["mappings"]),
                )
            )
        triple_rows.extend(
            (t["subj"], t["pred"], t["obj"], t["doc_id"], t["sent_idx"]) for t in triples
        )
    entities = pd.DataFrame(
        ent_rows,
        columns=["url", "start", "end", "match", "entity_class", "canonical_id", "n_mappings"],
    )
    triples = pd.DataFrame(triple_rows, columns=["subj", "pred", "obj", "doc_id", "sent_idx"])
    hashes = pd.DataFrame(hash_rows, columns=["url", "text_sha256"])
    return entities, triples, hashes


def precision_recall(pred: set, gold: set) -> tuple[float, float]:
    if not pred or not gold:
        return (0.0, 0.0)
    tp = len(pred & gold)
    return tp / len(pred), tp / len(gold)
