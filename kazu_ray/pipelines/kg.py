"""The flagship KG-construction pipeline.

End-to-end composition (the engine's restatement of the reference's
default pipeline, ``conf/Pipeline/default.yaml:3-12``, plus the
triple-emission / graph-materialize stages required by the north rule):

  pages (Parquet / synthesized, input_hint shape)
    → extract_docs       stateless map_batches (html→text, sha256 gate, lang)
    → annotate (fused)   per-doc chain in ONE stage — dictionary NER
                         (aho-corasick over broadcast synonyms) →
                         transformer token NER (span-finder port, stub
                         logits) → non-contiguous split → TF-IDF linking
                         → rules filter → StrategyRunner mapping →
                         abbreviations → cleanup → overlap merge →
                         triples; per-doc poison-pill exception capture
    → explode entities / flat triples
    → node_degrees / salted distinct counts / materialize (sorted,
      manifested, resumable)

Default execution: elastic task pool with per-worker cached state
(``compute="tasks"``); ``compute="actors"`` gives a classic actor pool;
``fused=False`` splits into four independent stages (the layout for a
GPU NER pool). All four layouts are compared exactly in
``tests/test_pipeline_variants.py``.

Every stage streams; nothing materializes the corpus. The only
all-to-all exchanges are the final aggregates and the partitioned
triple-store write.
"""

from __future__ import annotations

import ray

from kazu_ray.sources.corpus import pages_dataset
from kazu_ray.stages.docproc import DocPostProcessStage
from kazu_ray.stages.extract import extract_docs
from kazu_ray.stages.linking import LinkingStage
from kazu_ray.stages.materialize import explode_entities, explode_triples
from kazu_ray.stages.ner import DictionaryNerStage, transformer_ner_batch
from kazu_ray.state.store import ensure_default_caches, load_store


def broadcast_store(cache_dir: str | None = None):
    """Build/load the ontology caches and put the store in the object
    store ONCE; actors receive the ObjectRef, not a per-task copy."""
    cache_dir = ensure_default_caches(cache_dir)
    store = load_store(cache_dir)
    if ray.is_initialized():
        return ray.put(store)
    return store


def annotated_docs(
    sf_dir: str,
    store_ref=None,
    ner_concurrency: int = 4,
    batch_size: int = 512,
    with_model_ner: bool = True,
    multiplier: int = 1,
    fused: bool = True,
    pages_dir: str | None = None,
    compute: str = "tasks",
    emit: tuple = ("entities", "triples"),
    pages_ds=None,
    lang: str | None = "en",
):
    """pages → fully processed docs (ents_json + triples_json columns).

    ``fused=True`` (default) runs the whole per-doc chain in one actor
    pool (``stages/fused.py``) — same kernels, one serialization
    boundary. ``fused=False`` keeps the four separate pools, which is
    the layout to use when one stage needs independent scaling (e.g. a
    GPU NER pool).
    """
    if store_ref is None:
        store_ref = broadcast_store()
    if pages_ds is not None:
        # caller-supplied pages Dataset (the incremental-delta path
        # annotates a FILTERED slice of a crawl, not a directory)
        pages = pages_ds
    elif pages_dir is not None:
        from kazu_ray.sources.corpus import pages_from_parquet

        pages = pages_from_parquet(pages_dir)
    else:
        pages = pages_dataset(sf_dir, multiplier=multiplier)
    docs = extract_docs(pages, lang=lang)
    if fused:
        from kazu_ray.stages.fused import AnnotateStage, make_annotate_task

        if "entities" not in emit:
            # triples-only flow: drop every column the annotate stage
            # doesn't read — halves the bytes through the object store
            docs = docs.select_columns(["doc_id", "text"])
        if compute == "tasks":
            # elastic task pool with per-worker cached state (see
            # stages/fused.py): scales to every free CPU with no pool
            # sizing; the right default for a CPU-only stage
            return docs.map_batches(
                make_annotate_task(store_ref, with_model_ner, emit=emit),
                batch_format="pyarrow",
                batch_size=batch_size,
            )
        return docs.map_batches(
            AnnotateStage,
            fn_constructor_args=(store_ref, with_model_ner, None, emit),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=(1, ner_concurrency),
            num_cpus=1,
        )
    docs = docs.map_batches(
        DictionaryNerStage,
        fn_constructor_args=(store_ref,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, ner_concurrency),
        num_cpus=1,
    )
    if with_model_ner:
        from kazu_ray.stages.postner import split_batch

        docs = docs.map_batches(
            transformer_ner_batch, batch_format="pyarrow", batch_size=batch_size
        )
        docs = docs.map_batches(split_batch, batch_format="pyarrow", batch_size=batch_size)
        docs = docs.map_batches(
            LinkingStage,
            fn_constructor_args=(store_ref,),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=(1, ner_concurrency),
            num_cpus=1,
        )
    docs = docs.map_batches(
        DocPostProcessStage,
        fn_constructor_args=(store_ref,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, ner_concurrency),
        num_cpus=1,
    )
    return docs


def entities_dataset(sf_dir: str, **kw):
    return explode_entities(annotated_docs(sf_dir, **kw))


def triples_dataset(sf_dir: str, **kw):
    """Flat triples Dataset. Defaults to the zero-JSON fast path where
    the annotate stage emits triple rows directly."""
    kw.setdefault("emit", ("triples_flat",))
    ds = annotated_docs(sf_dir, **kw)
    if kw["emit"] == ("triples_flat",):
        return ds
    return explode_triples(ds)
