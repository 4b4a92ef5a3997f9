"""Whole-pipeline checkpoint/resume by input shard.

``materialize_triples`` checkpoints the SINK (hash partitions of the
output); this module checkpoints the PIPELINE: the input file listing is
split into shards, each shard runs read→annotate→triples→write as an
independent unit with an atomic done-marker, and a rerun anti-joins the
done list against the input listing and processes only the missing
shards — the table-valued version of the reference's output-file-
existence resume (``scripts/examples/annotate_with_llm.py:112-124``,
per SURVEY §2.7 "resume = anti-join of done-manifest vs input file
list").

Output layout: ``out_dir/shard=K/triples.parquet`` + manifest. Shard
membership is the sorted input-file order (deterministic given the same
input dataset), so completed work is never recomputed even after a
driver crash mid-run.
"""

from __future__ import annotations

import hashlib
import json
import os


def _shards(files: list[str], num_shards: int) -> list[list[str]]:
    files = sorted(files)
    return [files[i::num_shards] for i in range(num_shards)]


def run_resumable(
    pages_dir: str,
    out_dir: str,
    store_ref=None,
    num_shards: int = 8,
    with_model_ner: bool = True,
) -> dict:
    """Run the full KG pipeline shard-by-shard with per-shard resume.

    Returns {"shards_total", "shards_run", "shards_skipped", "rows"}.
    """
    import pyarrow.parquet as pq
    import ray.data as rd

    from kazu_ray.pipelines.kg import broadcast_store
    from kazu_ray.stages.extract import extract_docs
    from kazu_ray.stages.fused import make_annotate_task

    if store_ref is None:
        store_ref = broadcast_store()

    files = [
        os.path.join(pages_dir, f)
        for f in os.listdir(pages_dir)
        if f.endswith(".parquet")
    ]
    shards = [s for s in _shards(files, num_shards) if s]
    manifest_dir = os.path.join(out_dir, "_manifests")
    os.makedirs(manifest_dir, exist_ok=True)

    done = {
        f.split(".")[0] for f in os.listdir(manifest_dir) if f.endswith(".json")
    }
    ran = skipped = total_rows = 0
    for k, shard_files in enumerate(shards):
        shard_id = f"shard{k}"
        if shard_id in done:
            skipped += 1
            continue
        triples = (
            extract_docs(rd.read_parquet(shard_files))
            .select_columns(["doc_id", "text"])
            .map_batches(
                make_annotate_task(store_ref, with_model_ner, emit=("triples_flat",)),
                batch_format="pyarrow",
            )
        )
        shard_dir = os.path.join(out_dir, f"shard={k}")
        os.makedirs(shard_dir, exist_ok=True)
        table = triples.to_arrow_refs()
        import pyarrow as pa
        import ray

        parts = [ray.get(r) for r in table]
        merged = pa.concat_tables(parts) if parts else None
        tmp = os.path.join(shard_dir, ".tmp.parquet")
        if merged is not None and merged.num_rows:
            pq.write_table(merged, tmp)
            os.replace(tmp, os.path.join(shard_dir, "triples.parquet"))
            rows = merged.num_rows
        else:
            rows = 0
        manifest = {
            "shard_id": k,
            "input_files": [os.path.basename(f) for f in sorted(shard_files)],
            "row_count": rows,
            "input_sha": hashlib.sha256(
                "\n".join(sorted(shard_files)).encode()
            ).hexdigest(),
        }
        tmp_m = os.path.join(manifest_dir, f".{shard_id}.json.tmp")
        with open(tmp_m, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp_m, os.path.join(manifest_dir, f"{shard_id}.json"))
        ran += 1
        total_rows += rows
    return {
        "shards_total": len(shards),
        "shards_run": ran,
        "shards_skipped": skipped,
        "rows": total_rows,
    }
