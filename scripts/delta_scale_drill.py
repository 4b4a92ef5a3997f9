"""Incremental-maintenance scale drill: reconcile a 500k-page triple
store with a ~0.3% churn delta via ``apply_crawl_delta`` and prove the
result EQUAL (per-partition manifest row counts + content hashes) to a
from-scratch rebuild over the new snapshot — then compare wall times.

The point being evidenced: the delta CLASSIFICATION pass is corpus-
scale (two digest scans — unavoidable, you must look at every page to
know what changed), but the expensive work (NER/linking/mapping
annotation + store write) runs only over the CHURN, so reconcile time
decouples from corpus size as churn → 0.

Churn rule (deterministic from the page id): ids % 331 == 0 exist only
in the NEW snapshot ('new'), ids % 337 == 0 only in the OLD ('gone'),
ids % 149 == 0 carry different content in the new snapshot ('changed',
content swapped for the synth page of id+10,000,000 under the same
url).

Usage: python scripts/delta_scale_drill.py [multiplier]   (default 100
→ 500k pages at sf0.1)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 100

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa
    import ray.data as rd

    from kazu_ray.pipelines.incremental import apply_crawl_delta
    from kazu_ray.pipelines.kg import annotated_docs, broadcast_store
    from kazu_ray.sources.corpus import ensure_pages_parquet, synthesize_pages_batch
    from kazu_ray.stages.materialize import (
        explode_triples,
        load_manifests,
        materialize_triples,
    )

    pages_dir = ensure_pages_parquet("/root/testdata/sf0.1", mult)

    def ids_of(t: pa.Table):
        return (
            t["url"]
            .to_pandas()
            .str.extract(r"/doc/(\d+)$", expand=False)
            .astype("int64")
        )

    def old_side(t: pa.Table) -> pa.Table:
        ids = ids_of(t)
        return t.filter(pa.array((ids % 331 != 0).to_numpy()))

    def new_side(t: pa.Table) -> pa.Table:
        ids = ids_of(t)
        t = t.filter(pa.array((ids % 337 != 0).to_numpy()))
        ids = ids_of(t)
        changed = (ids % 149 == 0).to_numpy()
        if not changed.any():
            return t
        repl = synthesize_pages_batch(
            pa.table(
                {"doc_id": pa.array((ids[changed] + 10_000_000).tolist())}
            )
        )
        cols = {}
        import numpy as np

        for name in t.schema.names:
            if name == "url":
                cols[name] = t[name]
                continue
            vals = t[name].to_pandas().copy()
            vals.iloc[np.flatnonzero(changed)] = repl[name].to_pandas().values
            cols[name] = pa.array(vals, type=t.schema.field(name).type)
        return pa.table(cols)

    def snap(side_fn):
        return rd.read_parquet(pages_dir).map_batches(
            side_fn, batch_format="pyarrow"
        )

    ref = broadcast_store()

    def build(ds, out):
        triples = explode_triples(annotated_docs(None, store_ref=ref, pages_ds=ds))
        materialize_triples(triples, out, num_parts=32)

    inc_dir, ref_dir = "/tmp/kazu_delta_drill/inc", "/tmp/kazu_delta_drill/ref"
    import shutil

    shutil.rmtree("/tmp/kazu_delta_drill", ignore_errors=True)

    t0 = time.time()
    build(snap(old_side), inc_dir)
    t_build = time.time() - t0

    t0 = time.time()
    summary = apply_crawl_delta(
        snap(old_side), snap(new_side), inc_dir, "day2", store_ref=ref
    )
    t_delta = time.time() - t0

    t0 = time.time()
    build(snap(new_side), ref_dir)
    t_rebuild = time.time() - t0

    def key(ms):
        return sorted((m["partition_id"], m["row_count"], m["sha256"]) for m in ms)

    assert key(load_manifests(inc_dir)) == key(load_manifests(ref_dir)), (
        "incremental store != rebuild"
    )
    print(
        f"delta drill ({summary['row_count']} triples end-state): "
        f"old build {t_build:.1f}s, RECONCILE {t_delta:.1f}s "
        f"(classify {summary['sec_classify']}s + retract "
        f"{summary['sec_retract']}s + annotate/merge "
        f"{summary['sec_annotate_merge']}s; new {summary['n_new']} / "
        f"gone {summary['n_gone']} / changed {summary['n_changed']}, "
        f"retracted {summary['retracted_rows']}, added {summary['added_rows']}), "
        f"full rebuild {t_rebuild:.1f}s — manifests EQUAL "
        f"(rows + content sha, 32 partitions)"
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
