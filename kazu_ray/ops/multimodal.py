"""Multimodal column plumbing (decode stages stubbed).

Images / audio / video are opaque ``binary`` columns with typed
metadata. The Ray-side plumbing — schema, small batch sizes for wide
binary rows, actor-pool signature, output layout — is real and tested;
the codec calls are stubbed because no image/audio libraries exist in
this container:

* :class:`ImageDecodeStage` — raises ``NotImplementedError`` on real
  decode; ``fake=True`` substitutes a deterministic pseudo-decode
  (bytes → seeded feature vector) so the pipeline shape can be tested.
* :func:`synth_media_dataset` — deterministic binary payloads derived
  from the documents table for tests/bench.

At 100 TB these stages need: ``batch_size`` small enough that
batch × concurrency of decoded frames fits worker heap, and
``DataContext.target_max_block_size`` raised so Arrow doesn't split
wide binary rows into absurdly small blocks (see ray_guide.md
"Memory-aware").
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
    ]
)


def synth_media_batch(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_pylist()
    types = ["image", "audio", "video"]
    rows = {name: [] for name in MEDIA_SCHEMA.names}
    for i in ids:
        mt = types[i % 3]
        payload = hashlib.sha256(f"media:{i}".encode()).digest() * 8  # 256 bytes
        rows["media_id"].append(i)
        rows["media_type"].append(mt)
        rows["payload"].append(payload)
        rows["width"].append(64 if mt != "audio" else 0)
        rows["height"].append(64 if mt != "audio" else 0)
        rows["sample_rate"].append(16000 if mt == "audio" else 0)
    return pa.table(rows, schema=MEDIA_SCHEMA)


def synth_media_dataset(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"]).map_batches(
        synth_media_batch, batch_format="pyarrow"
    )


class ImageDecodeStage:
    """Actor-pool decode/feature-extract. Real decode STUBBED —
    clearly-marked ``NotImplementedError`` unless ``fake=True``."""

    FEATURE_DIM = 16

    def __init__(self, fake: bool = False):
        self.fake = fake

    def _fake_features(self, payload: bytes) -> np.ndarray:
        # deterministic pseudo-decode: leading payload bytes → feature
        # vector, zero-padded so a short/empty payload still yields a
        # fixed-width vector (a ragged features column would break every
        # downstream reshape). Defined on the raw bytes (not a re-hash)
        # so an independent oracle can recompute it from a hex dump of
        # the payload column.
        head = payload[: self.FEATURE_DIM].ljust(self.FEATURE_DIM, b"\0")
        return np.frombuffer(head, dtype=np.uint8).astype(np.float32) / 255.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "image/audio decode requires codec libraries not present in "
                "this environment; construct with fake=True for the "
                "deterministic pseudo-decode"
            )
        feats = [
            self._fake_features(p) for p in batch["payload"].to_pylist()
        ]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "features": pa.array([f.tolist() for f in feats], type=pa.list_(pa.float32())),
            }
        )
