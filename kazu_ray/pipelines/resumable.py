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
        # distributed write into a temp dir, atomic dir-rename on
        # success — the shard's rows never pass through the driver (a
        # crawl-scale shard would OOM it); row count comes from the
        # written files' parquet footers, not a second execution
        import shutil

        shard_dir = os.path.join(out_dir, f"shard={k}")
        tmp_dir = shard_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(shard_dir, ignore_errors=True)
        triples.write_parquet(tmp_dir)
        rows = sum(
            pq.read_metadata(os.path.join(tmp_dir, f)).num_rows
            for f in os.listdir(tmp_dir)
            if f.endswith(".parquet")
        )
        os.rename(tmp_dir, shard_dir)
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
    result = {
        "shards_total": len(shards),
        "shards_run": ran,
        "shards_skipped": skipped,
        "rows": total_rows,
    }
    from kazu_ray.stages.materialize import _write_build_metrics

    _write_build_metrics(out_dir, dict(result), file_name="last_run.json")
    return result


def annotate_resumable(
    pages_dir: str,
    out_dir: str,
    store_ref=None,
    num_shards: int = 8,
    with_model_ner: bool = True,
) -> dict:
    """Annotated-docs variant of :func:`run_resumable`: the full
    annotation pipeline shard-by-shard with per-shard manifests, so a
    killed annotate job reruns only unfinished shards. Output layout is
    ``out_dir/shard=K/*.parquet`` of annotated doc rows (ents_json +
    triples_json columns), loadable with ``ray.data.read_parquet``.
    """
    import shutil

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
    done = {f.split(".")[0] for f in os.listdir(manifest_dir) if f.endswith(".json")}
    ran = skipped = total_rows = 0
    for k, shard_files in enumerate(shards):
        shard_id = f"shard{k}"
        if shard_id in done:
            skipped += 1
            continue
        docs = (
            extract_docs(rd.read_parquet(shard_files))
            .select_columns(["doc_id", "text"])
            .map_batches(
                make_annotate_task(store_ref, with_model_ner),
                batch_format="pyarrow",
            )
        )
        shard_dir = os.path.join(out_dir, f"shard={k}")
        tmp_dir = shard_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(shard_dir, ignore_errors=True)
        docs.write_parquet(tmp_dir)
        rows = sum(
            pq.read_metadata(os.path.join(tmp_dir, f)).num_rows
            for f in os.listdir(tmp_dir)
            if f.endswith(".parquet")
        )
        os.rename(tmp_dir, shard_dir)
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
    result = {
        "shards_total": len(shards),
        "shards_run": ran,
        "shards_skipped": skipped,
        "rows": total_rows,
    }
    from kazu_ray.stages.materialize import _write_build_metrics

    _write_build_metrics(out_dir, dict(result), file_name="last_run.json")
    return result
