"""Model-pack build / load.

The reference ships its ontology caches, configs and acceptance gates
as a versioned "model pack" archive
(``kazu/utils/build_and_test_model_packs.py``) so a pipeline node
deploys one artifact instead of rebuilding caches. This is the engine's
equivalent over the Parquet cache tables:

* :func:`build_pack` — (re)build the caches, optionally run the
  acceptance P/R gate (the reference's ``run_acceptance_tests``
  option), then archive them with a manifest of per-file sha256 hashes
  and the ontology version.
* :func:`load_pack` — extract, verify every hash, and return a cache
  dir ready for :func:`kazu_ray.pipelines.kg.broadcast_store`. A
  corrupted or version-skewed pack fails loudly before any pipeline
  starts — at cluster scale a silently wrong cache poisons every
  worker.
"""

from __future__ import annotations

import hashlib
import json
import os
import tarfile

MANIFEST_NAME = "pack_manifest.json"
PACK_FORMAT = 1


def _sha256_file(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def build_pack(
    out_path: str, cache_dir: str | None = None, run_acceptance: bool = False
) -> dict:
    """Build (or reuse) the ontology caches and archive them as a pack.

    Returns the manifest. ``run_acceptance=True`` gates the pack on the
    e2e acceptance scorer (pipelines/acceptance.py) the way the
    reference's model-pack build runs its acceptance tests — a pack
    that fails the P/R thresholds is not written.
    """
    from kazu_ray.ontology.generate import ONTOLOGY_VERSION
    from kazu_ray.state.store import ensure_default_caches

    cache_dir = ensure_default_caches(cache_dir)

    manifest: dict = {
        "format": PACK_FORMAT,
        "ontology_version": ONTOLOGY_VERSION,
        "acceptance": None,
        "files": {},
    }
    if run_acceptance:
        from kazu_ray.pipelines.acceptance import acceptance_scores

        scores = acceptance_scores(cache_dir=cache_dir)
        if not scores.get("passed", False):
            raise RuntimeError(f"acceptance gate failed, pack not written: {scores}")
        manifest["acceptance"] = scores

    names = sorted(
        f for f in os.listdir(cache_dir) if f.endswith(".parquet") or f.endswith(".json")
    )
    if not names:
        raise FileNotFoundError(f"no cache tables under {cache_dir}")
    for name in names:
        manifest["files"][name] = _sha256_file(os.path.join(cache_dir, name))

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    tmp = out_path + ".tmp"
    with tarfile.open(tmp, "w:gz") as tar:
        for name in names:
            tar.add(os.path.join(cache_dir, name), arcname=name)
        manifest_bytes = json.dumps(manifest, sort_keys=True).encode()
        info = tarfile.TarInfo(MANIFEST_NAME)
        info.size = len(manifest_bytes)
        import io

        tar.addfile(info, io.BytesIO(manifest_bytes))
    os.replace(tmp, out_path)
    return manifest


def load_pack(pack_path: str, dest_dir: str | None = None) -> str:
    """Extract and verify a pack; returns the cache dir to run with.

    Raises on format/version skew or any per-file hash mismatch.
    """
    from kazu_ray.ontology.generate import ONTOLOGY_VERSION

    dest_dir = dest_dir or pack_path + ".extracted"
    os.makedirs(dest_dir, exist_ok=True)
    with tarfile.open(pack_path, "r:gz") as tar:
        tar.extractall(dest_dir, filter="data")
    manifest_path = os.path.join(dest_dir, MANIFEST_NAME)
    with open(manifest_path) as f:
        manifest = json.load(f)
    if manifest.get("format") != PACK_FORMAT:
        raise ValueError(f"unsupported pack format: {manifest.get('format')}")
    if manifest.get("ontology_version") != ONTOLOGY_VERSION:
        raise ValueError(
            f"pack ontology version {manifest.get('ontology_version')!r} != "
            f"engine version {ONTOLOGY_VERSION!r}"
        )
    for name, expected in manifest["files"].items():
        actual = _sha256_file(os.path.join(dest_dir, name))
        if actual != expected:
            raise ValueError(f"pack file corrupted: {name}")
    return dest_dir
