"""Explode, aggregate, and materialize stages (the wide / shuffle end).

Everything upstream keeps entities and triples nested inside their
document row (no shuffle). This module is where rows finally leave their
document:

* :func:`explode_entities` / :func:`explode_triples` — nested JSON
  columns → flat Arrow tables (stateless ``map_batches``).
* :func:`node_degrees` — cross-partition canonicalization stats as a
  two-phase aggregate: per-batch partial counts (combiner) then a
  ``groupby().sum`` over the much smaller partials. The partial pass is
  the explicit skew treatment for Zipfian hub entities (north_rule:
  "groupby-aggregate shuffles keyed by canonical entity id ... and
  skew-aware salting of hub entities"): each batch contributes at most
  one row per key, so a hub key's shuffle fan-in is bounded by the
  number of blocks, not the number of mentions.
* :func:`materialize_triples` — final sorted triple store with
  per-partition lineage manifests and checkpoint-resume (north_rule).
  Output layout: ``out_dir/part=K/*.parquet`` + ``out_dir/_manifests/K.json``;
  a rerun skips partitions whose manifest exists.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa

ENTITY_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("match", pa.string()),
        ("match_norm", pa.string()),
        ("entity_class", pa.string()),
        ("namespace", pa.string()),
        ("confidence", pa.int32()),
        ("sent_idx", pa.int32()),
        ("mapping_source", pa.string()),
        ("mapping_idx", pa.string()),
        ("mapping_label", pa.string()),
        ("n_mappings", pa.int32()),
    ]
)

TRIPLE_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("doc_id", pa.string()),
        ("sent_idx", pa.int32()),
        ("subj_class", pa.string()),
        ("obj_class", pa.string()),
        ("confidence", pa.int32()),
    ]
)


def _explode_entities_batch(batch: pa.Table) -> pa.Table:
    from kazu_ray.stages.docproc import canonical_id

    rows = {name: [] for name in ENTITY_SCHEMA.names}
    for doc_id, ents_json in zip(
        batch["doc_id"].to_pylist(), batch["ents_json"].to_pylist()
    ):
        for ent in json.loads(ents_json):
            cid = canonical_id(ent)
            src, idx, label = None, None, None
            if cid is not None:
                best = sorted(
                    ent["mappings"],
                    key=lambda m: (
                        -m["string_match_confidence"],
                        -(m["disambiguation_confidence"] or -1),
                        m["source"],
                        m["idx"],
                    ),
                )[0]
                src, idx, label = best["source"], best["idx"], best["default_label"]
            rows["doc_id"].append(doc_id)
            rows["start"].append(ent["start"])
            rows["end"].append(ent["end"])
            rows["match"].append(ent["match"])
            rows["match_norm"].append(ent["match_norm"])
            rows["entity_class"].append(ent["entity_class"])
            rows["namespace"].append(ent["namespace"])
            rows["confidence"].append(ent["confidence"])
            rows["sent_idx"].append(ent.get("sent_idx", 0))
            rows["mapping_source"].append(src)
            rows["mapping_idx"].append(idx)
            rows["mapping_label"].append(label)
            rows["n_mappings"].append(len(ent["mappings"]))
    return pa.table(rows, schema=ENTITY_SCHEMA)


def mention_contexts(docs_ds, window: int = 40):
    """Per-mention context windows — the export an embedding-based
    disambiguator (SapBERT-style) trains/infers on: (doc_id, span,
    match, ``window`` chars either side). A flat-map over annotated
    docs, which still carry their text — NO join back to the corpus, so
    at 100 TB this is one streaming pass with zero shuffles. Offsets
    are character offsets into the extracted text (ASCII corpus here;
    byte-vs-char divergence would need tracking for full Unicode)."""

    def ctx_batch(batch: pa.Table) -> pa.Table:
        rows = {k: [] for k in ("doc_id", "start", "end", "match", "context")}
        for doc_id, text, ents_json in zip(
            batch["doc_id"].to_pylist(),
            batch["text"].to_pylist(),
            batch["ents_json"].to_pylist(),
        ):
            for ent in json.loads(ents_json):
                s = max(0, ent["start"] - window)
                e = min(len(text), ent["end"] + window)
                rows["doc_id"].append(doc_id)
                rows["start"].append(ent["start"])
                rows["end"].append(ent["end"])
                rows["match"].append(ent["match"])
                rows["context"].append(text[s:e])
        return pa.table(
            {
                "doc_id": pa.array(rows["doc_id"], type=pa.string()),
                "start": pa.array(rows["start"], type=pa.int64()),
                "end": pa.array(rows["end"], type=pa.int64()),
                "match": pa.array(rows["match"], type=pa.string()),
                "context": pa.array(rows["context"], type=pa.string()),
            }
        )

    return docs_ds.map_batches(ctx_batch, batch_format="pyarrow")


def explode_entities(docs_ds):
    return docs_ds.map_batches(_explode_entities_batch, batch_format="pyarrow")


def _explode_triples_batch(batch: pa.Table) -> pa.Table:
    rows = {name: [] for name in TRIPLE_SCHEMA.names}
    for triples_json in batch["triples_json"].to_pylist():
        for t in json.loads(triples_json):
            for name in TRIPLE_SCHEMA.names:
                rows[name].append(t[name])
    return pa.table(rows, schema=TRIPLE_SCHEMA)


def explode_triples(docs_ds):
    return docs_ds.map_batches(_explode_triples_batch, batch_format="pyarrow")


def _partial_degree_batch(batch: pa.Table) -> pa.Table:
    counts: dict[tuple[str, str], int] = {}
    for col, role in (("subj", "subj"), ("obj", "obj")):
        for node in batch[col].to_pylist():
            counts[(node, role)] = counts.get((node, role), 0) + 1
    nodes, roles, ns = [], [], []
    for (node, role), n in counts.items():
        nodes.append(node)
        roles.append(role)
        ns.append(n)
    return pa.table(
        {
            "node": pa.array(nodes, type=pa.string()),
            "role": pa.array(roles, type=pa.string()),
            "partial_count": pa.array(ns, type=pa.int64()),
        }
    )


def node_degrees(triples_ds):
    """Per-canonical-node degree via partial-aggregate → small groupby."""
    from ray.data.aggregate import Sum

    from kazu_ray.ops.dedup import shuffle_parts

    partials = triples_ds.map_batches(_partial_degree_batch, batch_format="pyarrow")
    # partials are one row per (node, role) per block — small; bound the
    # shuffle fan-out explicitly, scaled to the cluster
    return partials.repartition(shuffle_parts()).groupby("node").aggregate(
        Sum("partial_count", alias_name="degree")
    )


# Version marker for the store's partition-hash rule: a lookup or a
# resume against a store written under a DIFFERENT rule would silently
# route keys to the wrong partitions. The marker makes that a loud
# error instead.
PARTITION_HASH_RULE = "siphash-v2"


def _check_or_write_format(
    out_dir: str, has_existing_manifests: bool, num_parts: int | None = None
) -> int | None:
    """Validate (or create) the store's ``_format.json``. The file pins
    everything a resume must not silently change: the partition-hash
    rule AND the partition count (an auto-sized ``num_parts`` would
    otherwise be recomputed from the RESUMED input's size and route
    keys to different partitions). Returns the store's pinned
    ``num_parts`` (None for stores written before it was recorded)."""
    fmt_path = os.path.join(out_dir, "_format.json")
    if os.path.exists(fmt_path):
        with open(fmt_path) as f:
            fmt = json.load(f)
        rule = fmt.get("partition_hash_rule")
        if rule != PARTITION_HASH_RULE:
            raise ValueError(
                f"store at {out_dir} was written with partition-hash rule "
                f"{rule!r}; this engine uses {PARTITION_HASH_RULE!r} — "
                "rebuild the store (resuming would mix partition rules)"
            )
        stored = fmt.get("num_parts")
        if (
            stored is not None
            and num_parts is not None
            and int(stored) != int(num_parts)
        ):
            raise ValueError(
                f"store at {out_dir} was written with num_parts={stored}; "
                f"this run requested {num_parts} — resuming would mix "
                "partition layouts (pass the stored count, or None to reuse it)"
            )
        return int(stored) if stored is not None else None
    if has_existing_manifests:
        raise ValueError(
            f"store at {out_dir} predates partition-hash versioning; "
            "rebuild it (its partitions were assigned under a different "
            "hash rule than this engine computes)"
        )
    tmp = fmt_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"partition_hash_rule": PARTITION_HASH_RULE, "num_parts": num_parts}, f
        )
    os.replace(tmp, fmt_path)
    return num_parts


# ---------------------------------------------------------------------------
# Per-partition doc-id bloom sidecar
# ---------------------------------------------------------------------------
# Lineage metadata that makes point retraction O(affected partitions)
# instead of O(all partitions): every partition write (build, update,
# retract-rewrite) also writes `docs.bloom.npy` — a fixed-size bloom
# filter over the partition's provenance column — and retract_docs
# pre-checks it so partitions that definitely hold none of the retract
# set are never even OPENED. Fixed m keeps the build streaming (bits
# set per batch, no per-row state accumulates); a saturated bloom on a
# huge partition degrades to "always scan" — safe, never wrong.

_BLOOM_K = 4
_BLOOM_FILE = "docs.bloom.npy"


def _bloom_bits() -> int:
    return int(os.environ.get("KAZU_DOC_BLOOM_BITS", 1 << 20))


def _bloom_positions(values, m: int):
    """k bit positions per value — pandas hash_array under k fixed salts
    (vectorized, deterministic across runs/processes)."""
    import numpy as np
    import pandas as pd

    vals = np.asarray(values, dtype=object)
    return [
        pd.util.hash_array(vals, hash_key=f"{salt:016d}") % m
        for salt in range(_BLOOM_K)
    ]


def _bloom_set(bits, values, m: int) -> None:
    import numpy as np

    for pos in _bloom_positions(values, m):
        idx = (pos // 8).astype(np.int64)
        masks = np.uint8(1) << (pos % 8).astype(np.uint8)
        # duplicate indices must accumulate — plain fancy-index |= is
        # buffered and drops all but one write per index
        np.bitwise_or.at(bits, idx, masks)


def _bloom_any_hit(bits, values, m: int):
    """True iff AT LEAST ONE value has all k bits set (i.e. the
    partition MIGHT contain it)."""
    import numpy as np

    hit = np.ones(len(values), dtype=bool)
    for pos in _bloom_positions(values, m):
        idx = (pos // 8).astype(np.int64)
        shift = (pos % 8).astype(np.uint8)
        hit &= ((bits[idx] >> shift) & 1) == 1
    return bool(hit.any())


def _write_bloom_sidecar(part_dir: str, bits) -> None:
    import numpy as np

    tmp = os.path.join(part_dir, f".tmp.{_BLOOM_FILE}")
    with open(tmp, "wb") as f:
        np.save(f, bits)
    os.replace(tmp, os.path.join(part_dir, _BLOOM_FILE))


def _load_bloom_sidecar(part_dir: str):
    import numpy as np

    path = os.path.join(part_dir, _BLOOM_FILE)
    if not os.path.exists(path):
        return None
    return np.load(path)


class _ManifestStream:
    """Shared manifest accumulator — THE single definition of how a
    partition's manifest (content sha, min/max key, row count) and its
    bloom sidecar are derived from a stream of tables. Both the writer
    path (:meth:`_PartitionWriter.finalize`) and the retraction rewrite
    (:func:`retract_docs`) feed it, so the store-equality contract
    (retract-then-update manifests == rebuild manifests) can never
    drift between two hand-kept copies of the hash rule."""

    def __init__(self, part, key_col, content_cols, bloom_col=None):
        self.part = part
        self.key_col = key_col
        self.keep = list(dict.fromkeys(content_cols))
        self.bloom_col = bloom_col
        self.content_hash = hashlib.sha256()
        self.n_rows = 0
        self.min_key = self.max_key = None
        self.bloom = None
        if bloom_col is not None:
            import numpy as np

            self.bloom = np.zeros(_bloom_bits() // 8, dtype=np.uint8)

    def add(self, table: pa.Table) -> None:
        import pyarrow.compute as pc

        if not table.num_rows:
            return
        self.n_rows += table.num_rows
        if self.bloom is not None and self.bloom_col in table.schema.names:
            _bloom_set(
                self.bloom,
                table[self.bloom_col].to_pandas().to_numpy(object),
                _bloom_bits(),
            )
        if self.keep:
            # vectorized content hash: cast → tab-join → newline
            str_cols = [pc.cast(table[c], pa.string()) for c in self.keep]
            lines = pc.binary_join_element_wise(
                *str_cols, "\t", null_handling="replace", null_replacement="None"
            )
            lines = pc.binary_join_element_wise(lines, "", "\n")
            self.content_hash.update(lines.to_pandas().str.cat().encode())
        mm = pc.min_max(table[self.key_col])
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        self.min_key = lo if self.min_key is None else min(self.min_key, lo)
        self.max_key = hi if self.max_key is None else max(self.max_key, hi)

    def manifest(self) -> dict:
        return {
            "partition_id": self.part,
            "row_count": self.n_rows,
            "min_key": self.min_key,
            "max_key": self.max_key,
            "sha256": self.content_hash.hexdigest(),
        }

    def write_manifest(self, manifest_dir: str) -> dict:
        manifest = self.manifest()
        tmp = os.path.join(manifest_dir, f".{self.part}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(manifest_dir, f"{self.part}.json"))
        return manifest


class _PartitionWriter:
    """One output partition's accumulator: receives hash-bucketed
    sub-tables from the scatter, then sorts, writes atomically and
    manifests its partition. Runs as a Ray actor (one per pending
    partition); plain-Python here so the write logic is unit-testable.

    Memory-bounded: once the buffered bytes exceed ``spill_bytes``, the
    buffer is sorted and written to disk as a sorted RUN file; finalize
    then k-way-merges the runs streaming (heap over per-run batch
    cursors) into the final partition file, so peak actor heap is
    O(spill_bytes + merge batch), not O(partition). The content hash,
    min/max keys and row count are computed over the merged stream in
    sorted order, so manifests are identical to the in-memory path
    (ties in ``sort_cols`` hash identically because the hashed columns
    are a subset of key+sort columns for every store in this engine)."""

    MERGE_BATCH_ROWS = 65_536

    def __init__(
        self,
        part,
        out_dir,
        manifest_dir,
        key_col,
        sort_cols,
        content_cols,
        file_name,
        spill_bytes: int | None = None,
        bloom_col: str | None = None,
    ):
        self.part = part
        self.out_dir = out_dir
        self.manifest_dir = manifest_dir
        self.key_col = key_col
        self.sort_cols = sort_cols
        self.content_cols = content_cols
        self.file_name = file_name
        self.bloom_col = bloom_col
        self.tables: list[pa.Table] = []
        if spill_bytes is None:
            spill_bytes = int(
                os.environ.get("KAZU_WRITER_SPILL_BYTES", 512 * 1024 * 1024)
            )
        self.spill_bytes = spill_bytes
        self.buffered_bytes = 0
        self.run_paths: list[str] = []
        self.received = 0

    # -- buffering / spilling ------------------------------------------------

    def _part_dir(self) -> str:
        return os.path.join(self.out_dir, f"part={self.part}")

    def _sorted_buffer(self) -> pa.Table | None:
        if not self.tables:
            return None
        table = pa.concat_tables(self.tables)
        self.tables = []
        self.buffered_bytes = 0
        if self.sort_cols:
            table = table.sort_by([(c, "ascending") for c in self.sort_cols])
        return table

    def _spill(self) -> None:
        import pyarrow.parquet as pq

        run = self._sorted_buffer()
        if run is None or not run.num_rows:
            return
        os.makedirs(self._part_dir(), exist_ok=True)
        path = os.path.join(self._part_dir(), f".run.{len(self.run_paths)}.parquet")
        pq.write_table(run, path)
        self.run_paths.append(path)

    def add(self, table: pa.Table) -> int:
        self.tables.append(table)
        self.received += table.num_rows
        self.buffered_bytes += table.nbytes
        if self.buffered_bytes >= self.spill_bytes:
            self._spill()
        return table.num_rows

    def preload_existing(self) -> int:
        """Ingest the partition's current data file (incremental-update
        path): read inside the actor — the existing rows never transit
        the driver or the object store — in row-group chunks so a
        partition bigger than ``spill_bytes`` spills as usual. Safe to
        combine with finalize's ``os.replace``: the old file is fully
        consumed here, before the tmp file is renamed over it."""
        import pyarrow.parquet as pq

        path = os.path.join(self._part_dir(), self.file_name)
        if not os.path.exists(path):
            return 0
        pf = pq.ParquetFile(path)
        n = 0
        for rg in range(pf.num_row_groups):
            table = pf.read_row_group(rg)
            self.add(table)
            n += table.num_rows
        pf.close()
        # the received counter backs the exchange's delivery check,
        # which compares against rows SENT through the scatter —
        # preloaded rows are local and must not count
        self.received -= n
        return n

    def received_rows(self) -> int:
        return self.received

    # -- merge ---------------------------------------------------------------

    def _merged_stream(self):
        """Yield the partition's rows as Arrow tables in globally sorted
        order, merging the spilled sorted runs + the residual buffer
        without holding more than one batch per run in memory."""
        import heapq

        import pyarrow.parquet as pq

        sources = []
        for path in self.run_paths:
            sources.append(
                pq.ParquetFile(path).iter_batches(batch_size=self.MERGE_BATCH_ROWS)
            )
        residual = self._sorted_buffer()
        if residual is not None and residual.num_rows:
            sources.append(iter(residual.to_batches(self.MERGE_BATCH_ROWS)))
        if not sources:
            return
        if len(sources) == 1:
            for rb in sources[0]:
                yield pa.Table.from_batches([rb])
            return

        sort_cols = self.sort_cols or []

        class _Cursor:
            __slots__ = ("it", "keys", "batch", "idx", "n")

            def __init__(self, it):
                self.it = it
                self.batch = None
                self.idx = 0
                self.n = 0

            def load_next(self) -> bool:
                for rb in self.it:
                    if rb.num_rows == 0:
                        continue
                    self.batch = rb
                    self.idx = 0
                    self.n = rb.num_rows
                    self.keys = [
                        tuple(col)
                        for col in zip(
                            *(rb.column(c).to_pylist() for c in sort_cols)
                        )
                    ] if sort_cols else [()] * rb.num_rows
                    return True
                return False

        heap = []
        cursors = []
        for i, src in enumerate(sources):
            cur = _Cursor(src)
            if cur.load_next():
                cursors.append(cur)
                heapq.heappush(heap, (cur.keys[0], i))
            else:
                cursors.append(cur)

        # heap merge emitting per-source contiguous slices (each pop
        # consumes the full run of rows ≤ the next heap head, so the
        # per-row Python cost amortizes away on mostly-disjoint runs)
        emitted: list[pa.Table] = []
        pending_start = None
        pending_src = None
        pending_len = 0
        emitted_rows = 0

        def _emit_pending():
            nonlocal pending_start, pending_len, emitted_rows
            if pending_len:
                cur = cursors[pending_src]
                emitted.append(
                    pa.Table.from_batches(
                        [cur.batch.slice(pending_start, pending_len)]
                    )
                )
                emitted_rows += pending_len
                pending_start, pending_len = None, 0

        while heap:
            _key, src = heapq.heappop(heap)
            cur = cursors[src]
            if pending_src != src:
                _emit_pending()
                pending_src = src
                pending_start = cur.idx
                pending_len = 0
            # take as many consecutive rows from this source as stay
            # <= the next heap head (run of locally-minimal rows)
            limit = heap[0][0] if heap else None
            idx = cur.idx
            keys = cur.keys
            n = cur.n
            while idx < n and (limit is None or keys[idx] <= limit):
                idx += 1
            pending_len += idx - cur.idx
            cur.idx = idx
            if idx < n:
                heapq.heappush(heap, (keys[idx], src))
            else:
                _emit_pending()
                pending_src = None
                if cur.load_next():
                    heapq.heappush(heap, (cur.keys[0], src))
            if emitted_rows + pending_len >= self.MERGE_BATCH_ROWS:
                _emit_pending()
                pending_src = None
                yield pa.concat_tables(emitted)
                emitted = []
                emitted_rows = 0
        _emit_pending()
        if emitted:
            yield pa.concat_tables(emitted)

    # -- finalize ------------------------------------------------------------

    def finalize(self) -> dict:
        import pyarrow.parquet as pq

        part_dir = self._part_dir()
        ms = _ManifestStream(
            self.part, self.key_col, self.content_cols, self.bloom_col
        )
        writer = None
        tmp = os.path.join(part_dir, f".tmp.{self.file_name}")
        try:
            for table in self._merged_stream():
                if not table.num_rows:
                    continue
                if writer is None:
                    os.makedirs(part_dir, exist_ok=True)
                    writer = pq.ParquetWriter(tmp, table.schema)
                writer.write_table(table)
                ms.add(table)
        finally:
            if writer is not None:
                writer.close()
        if writer is not None:
            os.replace(tmp, os.path.join(part_dir, self.file_name))
        if ms.bloom is not None and writer is not None:
            _write_bloom_sidecar(part_dir, ms.bloom)
        for path in self.run_paths:
            try:
                os.remove(path)
            except OSError:
                pass
        self.run_paths = []
        return ms.write_manifest(self.manifest_dir)


def _write_build_metrics(
    out_dir: str, metrics: dict, file_name: str = "last_build.json"
) -> None:
    """Per-build metrics artifact (north_rule: "per-partition lineage +
    METRICS"): wall time, rows, which partitions this attempt wrote vs
    resumed. Written atomically to ``_metrics/last_build.json`` —
    deliberately OUTSIDE ``_manifests/`` so resume identity and the
    incremental-update manifest-sha-equality contract are untouched
    (metrics describe an attempt; manifests describe the data)."""
    mdir = os.path.join(out_dir, "_metrics")
    os.makedirs(mdir, exist_ok=True)
    metrics = dict(metrics)
    if metrics.get("wall_sec"):
        metrics["rows_per_sec"] = round(
            metrics.get("row_count", 0) / metrics["wall_sec"], 1
        )
    tmp = os.path.join(mdir, f".{file_name}.tmp")
    with open(tmp, "w") as f:
        json.dump(metrics, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(mdir, file_name))


def materialize_partitioned(
    ds,
    out_dir: str,
    key_col: str,
    num_parts: int | None = 16,
    sort_cols: list[str] | None = None,
    hash_cols: list[str] | None = None,
    file_name: str = "data.parquet",
    spill_bytes: int | None = None,
    bloom_col: str | None = None,
) -> list[dict]:
    """Generic resumable partitioned materialize.

    Partition = hash(key_col) % num_parts (stable across runs); each
    partition is optionally sorted, written atomically (tmp + rename),
    and described by a content-hashed manifest under ``_manifests/``.
    Partitions with an existing manifest are skipped on re-run; empty
    partitions get zero-row manifests so resume converges. Shared by the
    triple store and the annotated-docs sink.

    ``num_parts=None`` auto-sizes from the input's measured
    ``size_bytes()`` (one partition per ~``target_partition_bytes()``,
    ``kazu_ray/ops/exchange.py``) so a 100× corpus gets ~100×
    partitions without re-tuning; the chosen count is pinned in
    ``_format.json`` and reused on resume — the resumed input's size
    differs by exactly the already-written rows, so recomputing would
    silently re-route keys.
    """
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    manifest_dir = os.path.join(out_dir, "_manifests")
    os.makedirs(manifest_dir, exist_ok=True)

    done_parts = {
        int(f.split(".")[0]) for f in os.listdir(manifest_dir) if f.endswith(".json")
    }
    fmt_exists = os.path.exists(os.path.join(out_dir, "_format.json"))
    if fmt_exists:
        stored_np = _check_or_write_format(out_dir, bool(done_parts), num_parts)
        if num_parts is None:
            if stored_np is None:
                raise ValueError(
                    f"store at {out_dir} predates num_parts pinning and "
                    "num_parts=None was requested — pass the count it was "
                    "written with"
                )
            num_parts = stored_np
    if num_parts is None:
        from kazu_ray.ops.exchange import auto_partition_count

        ds = ds.materialize()
        num_parts = auto_partition_count(ds.size_bytes())
    if not fmt_exists:
        _check_or_write_format(out_dir, bool(done_parts), num_parts)
    pending = [p for p in range(num_parts) if p not in done_parts]
    if not pending:
        return load_manifests(out_dir)
    import time as _time

    _t_build = _time.monotonic()

    from kazu_ray.functions.hashing import bucket_ids

    def _assign_part(batch: pa.Table) -> pa.Table:
        parts = bucket_ids(batch[key_col], num_parts)
        return batch.append_column("__part", pa.array(parts, type=pa.int32()))

    with_part = ds.map_batches(_assign_part, batch_format="pyarrow")
    if done_parts:
        import pyarrow.compute as pc

        pending_arr = pa.array(sorted(pending), type=pa.int32())
        with_part = with_part.map_batches(
            lambda t: t.filter(pc.is_in(t["__part"], pending_arr)),
            batch_format="pyarrow",
        )

    content_cols = hash_cols or ([key_col] + (sort_cols or []))

    # The exchange: a hash SCATTER to one writer actor per pending
    # partition, not Dataset.groupby — Ray Data's groupby shuffles via a
    # global range-partition SORT of every row (measured 38 s for 3.25M
    # triple rows on 32 CPUs, vs ~2 s of actual useful work); rows here
    # only need co-location by hash bucket, never a total order.
    # Mechanics (retry-disabled feed, backpressure, leak-safe reaping)
    # are shared with the other exchanges — see ops/exchange.py. Unlike
    # the generic exchange accumulators, the writers are SPILL-CAPABLE:
    # past ``spill_bytes`` of buffered rows a writer sorts and spills a
    # run file, and finalize streams a k-way merge — so a partition
    # larger than a worker's heap still materializes; num_parts tunes
    # parallelism and file size, not a hard memory bound.
    import ray as _ray

    from kazu_ray.ops.exchange import feed_to_actors, reaped_actors

    writer_cls = _ray.remote(num_cpus=0)(_PartitionWriter)
    writers = {
        p: writer_cls.remote(
            p, out_dir, manifest_dir, key_col, sort_cols, content_cols, file_name,
            spill_bytes, bloom_col,
        )
        for p in pending
    }
    with reaped_actors(list(writers.values())):
        feed_to_actors(
            with_part,
            num_parts,
            lambda batch: batch["__part"].combine_chunks(),
            lambda p, sub: writers[p].add.remote(sub.drop(["__part"])),
            received_fn=lambda p: writers[p].received_rows.remote(),
        )
        _ray.get([w.finalize.remote() for w in writers.values()])

    written = {
        int(f.split(".")[0]) for f in os.listdir(manifest_dir) if f.endswith(".json")
    }
    for part in pending:
        if part not in written:
            tmp_manifest = os.path.join(manifest_dir, f".{part}.json.tmp")
            with open(tmp_manifest, "w") as f:
                json.dump(
                    {
                        "partition_id": part,
                        "row_count": 0,
                        "min_key": None,
                        "max_key": None,
                        "sha256": hashlib.sha256(b"").hexdigest(),
                    },
                    f,
                )
            os.replace(tmp_manifest, os.path.join(manifest_dir, f"{part}.json"))
    manifests = load_manifests(out_dir)
    _write_build_metrics(
        out_dir,
        {
            "wall_sec": round(_time.monotonic() - _t_build, 3),
            "num_parts": num_parts,
            "written_parts": sorted(pending),
            "resumed_parts": sorted(done_parts),
            "row_count": sum(m["row_count"] for m in manifests),
        },
    )
    return manifests


def materialize_triples(
    triples_ds, out_dir: str, num_parts: int | None = 16
) -> list[dict]:
    """Sorted, partitioned, manifest-tracked triple store: hash(subj)
    partitions, (subj, pred, obj)-sorted files, content-hashed manifests,
    checkpoint-resume — see :func:`materialize_partitioned`."""
    return materialize_partitioned(
        triples_ds,
        out_dir,
        key_col="subj",
        num_parts=num_parts,
        sort_cols=["subj", "pred", "obj"],
        hash_cols=["subj", "pred", "obj"],
        file_name="triples.parquet",
        bloom_col="doc_id",
    )


def update_partitioned(
    ds,
    out_dir: str,
    update_id: str,
    key_col: str,
    sort_cols: list[str] | None = None,
    hash_cols: list[str] | None = None,
    file_name: str = "data.parquet",
    spill_bytes: int | None = None,
    bloom_col: str | None = None,
) -> list[dict]:
    """Incrementally merge new rows into an existing partitioned store —
    the KG-lifecycle operation (a new crawl day lands, the store
    absorbs it) the manifest/resume design exists for.

    The stable hash partitioning means a new row lands in exactly the
    partition its key already lives in, so only partitions that RECEIVE
    rows are rewritten: each affected partition's writer actor preloads
    its current file locally (no driver/object-store transit), the new
    rows scatter in through the same exchange as the initial build, and
    finalize re-sorts, rewrites atomically and re-manifests. The result
    is identical — content sha included — to building the store from
    the unioned input in one shot (tested).

    Resume: an update journal under ``_updates/<update_id>/`` records
    each affected partition's expected post-update row count BEFORE its
    rewrite starts; on re-run a partition is skipped iff its journal
    entry exists AND the manifest row count already equals the expected
    count — so a crash between the atomic (file, manifest) rename pair
    and nothing else can double-apply rows. Updates with different
    ``update_id``\\s journal independently (apply them sequentially).
    """
    import pyarrow.compute as pc

    manifests = {m["partition_id"]: m for m in load_manifests(out_dir)}
    if not manifests:
        raise ValueError(f"no existing store at {out_dir}; use materialize_partitioned")
    num_parts = len(manifests)
    manifest_dir = os.path.join(out_dir, "_manifests")
    journal_dir = os.path.join(out_dir, "_updates", update_id)
    os.makedirs(journal_dir, exist_ok=True)

    from kazu_ray.functions.hashing import bucket_ids

    def _assign_part(batch: pa.Table) -> pa.Table:
        parts = bucket_ids(batch[key_col], num_parts)
        return batch.append_column("__part", pa.array(parts, type=pa.int32()))

    with_part = ds.map_batches(_assign_part, batch_format="pyarrow").materialize()

    # tiny aggregate: incoming rows per partition (drives both the
    # affected-partition set and the resume row-count rule)
    from ray.data.aggregate import Count

    new_counts = {
        int(r["__part"]): int(r["n"])
        for r in with_part.groupby("__part").aggregate(Count(alias_name="n")).take_all()
    }

    pending: list[int] = []
    for part, n_new in sorted(new_counts.items()):
        jpath = os.path.join(journal_dir, f"{part}.json")
        if os.path.exists(jpath):
            with open(jpath) as f:
                expected = json.load(f)["expected_rows"]
        else:
            expected = manifests[part]["row_count"] + n_new
            tmp = jpath + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"partition_id": part, "expected_rows": expected}, f)
            os.replace(tmp, jpath)
        if manifests[part]["row_count"] == expected:
            continue  # this partition already absorbed this update
        pending.append(part)

    if not pending:
        return load_manifests(out_dir)
    import time as _time

    _t_update = _time.monotonic()

    pending_arr = pa.array(sorted(pending), type=pa.int32())
    filtered = with_part.map_batches(
        lambda t: t.filter(pc.is_in(t["__part"], pending_arr)),
        batch_format="pyarrow",
    )

    content_cols = hash_cols or ([key_col] + (sort_cols or []))
    import ray as _ray

    from kazu_ray.ops.exchange import feed_to_actors, reaped_actors

    writer_cls = _ray.remote(num_cpus=0)(_PartitionWriter)
    writers = {
        p: writer_cls.remote(
            p, out_dir, manifest_dir, key_col, sort_cols, content_cols, file_name,
            spill_bytes, bloom_col,
        )
        for p in pending
    }
    with reaped_actors(list(writers.values())):
        # preloaded rows are excluded from the received counter, so the
        # exchange's positive delivery check still balances exactly
        _ray.get([writers[p].preload_existing.remote() for p in pending])
        feed_to_actors(
            filtered,
            num_parts,
            lambda batch: batch["__part"].combine_chunks(),
            lambda p, sub: writers[p].add.remote(sub.drop(["__part"])),
            received_fn=lambda p: writers[p].received_rows.remote(),
        )
        _ray.get([w.finalize.remote() for w in writers.values()])
    out = load_manifests(out_dir)
    _write_build_metrics(
        out_dir,
        {
            "update_id": update_id,
            "wall_sec": round(_time.monotonic() - _t_update, 3),
            "num_parts": num_parts,
            "written_parts": sorted(pending),
            "resumed_parts": sorted(set(manifests) - set(pending)),
            "row_count": sum(m["row_count"] for m in out),
        },
        file_name="last_update.json",
    )
    return out


def update_triple_store(triples_ds, out_dir: str, update_id: str) -> list[dict]:
    """Incremental triple-store update — :func:`update_partitioned` with
    the triple store's layout (hash(subj) partitions, (subj, pred, obj)
    sort + content hash)."""
    return update_partitioned(
        triples_ds,
        out_dir,
        update_id,
        key_col="subj",
        sort_cols=["subj", "pred", "obj"],
        hash_cols=["subj", "pred", "obj"],
        file_name="triples.parquet",
        bloom_col="doc_id",
    )


def retract_docs(
    out_dir: str,
    doc_ids,
    update_id: str,
    doc_col: str = "doc_id",
    file_name: str = "triples.parquet",
    key_col: str = "subj",
    sort_cols: list[str] | None = None,
    hash_cols: list[str] | None = None,
) -> dict:
    """Remove every row whose ``doc_col`` is in ``doc_ids`` from a
    partitioned store — the missing half of incremental KG maintenance
    (:func:`update_partitioned` ADDS a new crawl day; a changed or
    vanished page's OLD triples must also GO, or the store accretes
    stale assertions forever). This is tombstone-free compaction: each
    affected partition is filtered and atomically rewritten in place,
    its manifest re-derived over the surviving rows with the exact
    content-hash rule the writers use — so a retraction followed by an
    :func:`update_partitioned` of the re-annotated pages yields
    manifests IDENTICAL to a from-scratch rebuild on the new corpus
    (the equality the incremental pipeline's test gates on).

    Shapes: the retract set is CHURN-sized (one delta's changed+gone
    urls, not the corpus) and broadcasts once via ``ray.put``; each
    partition rewrites in its own Ray task, streaming row-group chunks
    (never holding a whole partition unless it fits), and partitions
    with no matching rows are left untouched — byte-identical file,
    untouched manifest. Idempotent by construction (re-running finds
    no matches), which is the whole resume story: a crash mid-retract
    re-runs safely under the same ``update_id``.

    Layout: defaults are the triple store's (``key_col="subj"``,
    (subj, pred, obj) sort + content hash); pass the annotated-docs
    layout (``key_col="doc_id"``, ``file_name="docs.parquet"``) to
    reconcile that sink too. When ``doc_col == key_col`` (the docs
    store), retraction is PARTITION-PRUNED exactly: the retract ids
    hash straight to their partitions and no other partition is even
    submitted — strictly better than the bloom check.

    Point-retraction fast path: partitions written by this engine carry
    a ``docs.bloom.npy`` sidecar (bloom filter over the provenance
    column, built by every writer path); a partition whose bloom
    excludes EVERY retract url is skipped without even opening its
    parquet file — a one-doc retraction on an N-partition store opens
    ~1 partition instead of N (the difference between an O(store)
    scan and an O(affected) touch at 100 TB). False positives just
    fall through to the scan; stores predating the sidecar scan every
    partition (and gain the sidecar on their next rewrite)."""
    import ray

    manifests = {m["partition_id"]: m for m in load_manifests(out_dir)}
    if not manifests:
        raise ValueError(f"no existing store at {out_dir}")
    if sort_cols is None and key_col == "subj":
        sort_cols = ["subj", "pred", "obj"]
    content_cols = hash_cols or ([key_col] + (sort_cols or []))
    ids = pa.array(sorted(set(doc_ids)), type=pa.string())
    ids_ref = ray.put(ids)
    manifest_dir = os.path.join(out_dir, "_manifests")

    # the pinned partition count + hash-rule check (errors loudly on a
    # pre-versioning store); an INCOMPLETE store (missing manifests)
    # refuses rather than silently mis-routing keyed pruning or
    # mis-reporting untouched partitions
    pinned = _check_or_write_format(out_dir, True)
    if pinned is not None and len(manifests) != pinned:
        raise ValueError(
            f"store at {out_dir} has {len(manifests)} manifests but is "
            f"pinned to {pinned} partitions — incomplete build; finish "
            "or rebuild it before retracting"
        )

    candidate_parts = sorted(manifests)
    if doc_col == key_col:
        # keyed store: the retract ids hash straight to their partitions
        from kazu_ray.functions.hashing import bucket_ids

        hit = set(bucket_ids(ids, len(manifests)).tolist())
        candidate_parts = sorted(p for p in manifests if p in hit)

    @ray.remote(num_cpus=1)
    def _retract_part(
        part: int, key_col: str, sort_cols, content_cols, manifest_rows: int
    ) -> dict | None:
        import numpy as np
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        bad = ray.get(ids_ref)
        part_dir = os.path.join(out_dir, f"part={part}")
        path = os.path.join(part_dir, file_name)
        if not os.path.exists(path):
            return None
        pf = pq.ParquetFile(path)
        # crash-window repair: a prior attempt may have died BETWEEN the
        # data-file rename and the manifest rename, leaving a manifest
        # that describes the pre-retract rows. The parquet FOOTER row
        # count (one small read, no column scan) detects that cheaply;
        # on mismatch the rewrite below re-derives manifest + sidecar
        # from the current (already filtered) file, so the filter is a
        # no-op and the rewrite byte-equivalent. Checked BEFORE the
        # bloom shortcut — the sidecar may already exclude the retract
        # set while the manifest is still stale.
        footer_rows = pf.metadata.num_rows
        if footer_rows == manifest_rows:
            # pass 0: bloom pre-check — skip without scanning a column
            bloom = _load_bloom_sidecar(part_dir)
            if bloom is not None and not _bloom_any_hit(
                bloom, np.asarray(bad.to_pylist(), dtype=object), len(bloom) * 8
            ):
                return {"partition_id": part, "removed": 0, "bloom_skipped": True}
            # pass 1: any matches? (row-group stream, no rewrite if clean)
            n_hits = 0
            for batch in pf.iter_batches(columns=[doc_col]):
                mask = pc.is_in(batch.column(0), value_set=bad)
                n_hits += pc.sum(pc.cast(mask, pa.int64())).as_py() or 0
            if not n_hits:
                return {"partition_id": part, "removed": 0, "bloom_skipped": False}
        else:
            n_hits = 0
            for batch in pf.iter_batches(columns=[doc_col]):
                mask = pc.is_in(batch.column(0), value_set=bad)
                n_hits += pc.sum(pc.cast(mask, pa.int64())).as_py() or 0
        # pass 2: filtered rewrite + re-manifest — through the SAME
        # _ManifestStream the writers use, so the hash rule and bloom
        # rebuild cannot drift from the build path
        ms = _ManifestStream(part, key_col, content_cols, bloom_col=doc_col)
        writer = None
        tmp = os.path.join(part_dir, f".tmp.{file_name}")
        try:
            for batch in pf.iter_batches():
                table = pa.Table.from_batches([batch])
                table = table.filter(
                    pc.invert(pc.is_in(table[doc_col], value_set=bad))
                )
                if not table.num_rows:
                    continue
                if writer is None:
                    writer = pq.ParquetWriter(tmp, table.schema)
                writer.write_table(table)
                ms.add(table)
        finally:
            if writer is not None:
                writer.close()
        if writer is None:
            # every row retracted: an empty partition keeps an empty
            # file slot (schema-stable stores; lookups see 0 rows)
            pq.write_table(pf.schema_arrow.empty_table(), tmp)
        os.replace(tmp, path)
        _write_bloom_sidecar(part_dir, ms.bloom)
        ms.write_manifest(manifest_dir)
        return {"partition_id": part, "removed": int(n_hits)}

    results = ray.get(
        [
            _retract_part.remote(
                p, key_col, sort_cols, content_cols, manifests[p]["row_count"]
            )
            for p in candidate_parts
        ]
    )
    results = [r for r in results if r]
    rewritten = [r for r in results if r["removed"] > 0]
    out = {
        "update_id": update_id,
        "retracted_rows": sum(r["removed"] for r in rewritten),
        "rewritten_parts": sorted(r["partition_id"] for r in rewritten),
        "parts_bloom_skipped": sum(
            1 for r in results if r.get("bloom_skipped")
        ),
        "parts_scanned": sum(1 for r in results if not r.get("bloom_skipped")),
        "parts_key_pruned": len(manifests) - len(candidate_parts),
        "untouched_parts": sorted(
            set(manifests) - {r["partition_id"] for r in rewritten}
        ),
    }
    _write_build_metrics(out_dir, out, file_name="last_retract.json")
    return out


def load_manifests(out_dir: str) -> list[dict]:
    manifest_dir = os.path.join(out_dir, "_manifests")
    out = []
    if not os.path.isdir(manifest_dir):
        return out
    for f in sorted(os.listdir(manifest_dir)):
        if f.endswith(".json"):
            with open(os.path.join(manifest_dir, f)) as fh:
                out.append(json.load(fh))
    return out


def write_annotated(docs_ds, out_dir: str, num_parts: int | None = 16) -> dict:
    """Annotated-corpus sink with a failure side-channel.

    Mirrors the reference's JSON doc sink + ``FailedDocsFileHandler``
    (``kazu/pipeline/__init__.py:92-117``): successfully processed docs
    land under ``out_dir/docs`` (partitioned + manifest-tracked via
    :func:`materialize_partitioned`, so a rerun resumes); docs whose
    per-row processing raised
    land under ``out_dir/failed`` with their traceback string, so a
    human can triage without re-running. Both are partitioned Parquet
    directories (resumable layout)."""
    import pyarrow.compute as pc

    ok = docs_ds.map_batches(
        lambda t: t.filter(pc.equal(t["processing_exception"], "")),
        batch_format="pyarrow",
    )
    failed = docs_ds.map_batches(
        lambda t: t.filter(pc.not_equal(t["processing_exception"], "")),
        batch_format="pyarrow",
    )
    # num_parts is the resume/parallelism unit: size it so one
    # partition's docs fit a worker (CLI exposes --num-parts; at crawl
    # scale use thousands)
    materialize_partitioned(
        ok,
        os.path.join(out_dir, "docs"),
        key_col="doc_id",
        num_parts=num_parts,
        file_name="docs.parquet",
        bloom_col="doc_id",
    )
    # failed docs route through the same partitioned, manifest-tracked
    # sink as the ok branch — never collected to the driver (a poisoned
    # corpus where 100% of docs fail must not OOM anything)
    failed_manifests = materialize_partitioned(
        failed,
        os.path.join(out_dir, "failed"),
        key_col="doc_id",
        num_parts=max(num_parts // 4, 1) if num_parts is not None else None,
        file_name="failed.parquet",
    )
    failed_count = sum(m["row_count"] for m in failed_manifests)
    return {"out_dir": out_dir, "failed": failed_count}


def read_annotated(out_dir: str):
    """Load a :func:`write_annotated` store back as a Dataset — the
    reference's ``Document.from_json`` round-trip
    (``kazu/data/__init__.py:559-565``) re-expressed over the
    partitioned Parquet layout. A downstream-only re-run (recompute
    triples, re-aggregate, export) starts here and never pays the
    NER/linking stages again; partition dirs stream as ordinary blocks.
    """
    import glob

    import ray.data as rd

    paths = sorted(glob.glob(os.path.join(out_dir, "docs", "part=*", "docs.parquet")))
    if not paths:
        raise FileNotFoundError(f"no annotated partitions under {out_dir}/docs")
    return rd.read_parquet(paths)


def lookup_triples(out_dir: str, subj: str, num_parts: int | None = None):
    """Point lookup in the materialized triple store.

    Reads ONLY the hash partition that can contain ``subj`` (same
    partition function as the writer) and binary-searches the
    partition's (subj, pred, obj)-sorted rows — the partitioned + sorted
    layout exists precisely so graph queries touch 1/num_parts of the
    store. Returns a pyarrow Table of matching triples.
    """
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    if num_parts is None:
        num_parts = len(load_manifests(out_dir))
    if num_parts:
        # refuse to probe a store whose partitions were assigned under a
        # different hash rule — a wrong-rule lookup returns silent misses
        _check_or_write_format(out_dir, has_existing_manifests=True)
    from kazu_ray.functions.hashing import bucket_of

    part = bucket_of(subj, num_parts)
    path = os.path.join(out_dir, f"part={part}", "triples.parquet")
    if not os.path.exists(path):
        return pa.table({name: [] for name in TRIPLE_SCHEMA.names}, schema=TRIPLE_SCHEMA)
    table = pq.read_table(path)
    return table.filter(pc.equal(table["subj"], subj))


def node_doc_counts_salted(triples_ds, salt: int = 8, est_rows: int | None = None):
    """Distinct-document count per canonical node — the aggregate where a
    plain combiner can't bound per-key state (distinct sets grow with the
    key's volume), so Zipfian hub entities are SALTED explicitly
    (north_rule: "skew-aware salting of hub entities"):

      stage 1: shuffle on (node, salt=hash(doc_id) %% k) — a hub node's
               rows split across k sub-keys, so no single reducer holds
               the hub's whole doc set; per-sub-key distinct counts are
               exact because the salt partitions doc-id space disjointly.
      stage 2: tiny groupby(node) sums the k partials.
    """
    from ray.data.aggregate import Sum

    def add_salt(batch: pa.Table) -> pa.Table:
        import pandas as pd

        from kazu_ray.functions.hashing import bucket_ids

        docs = batch["doc_id"].to_pandas()
        salts = bucket_ids(batch["doc_id"], salt)
        frames = [
            pd.DataFrame(
                {"node": batch[c].to_pandas(), "salt": salts, "doc_id": docs}
            )
            for c in ("subj", "obj")
        ]
        df = pd.concat(frames, ignore_index=True).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def distinct_per_bucket(table: pa.Table) -> pa.Table:
        # one vectorized pandas groupby over EVERY (node, salt) group in
        # the bucket — replaces per-group map_groups dispatch
        import pandas as pd

        df = table.to_pandas()
        out = (
            df.groupby(["node", "salt"], as_index=False)
            .agg(n_docs_partial=("doc_id", "nunique"))[["node", "n_docs_partial"]]
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    salted = triples_ds.map_batches(add_salt, batch_format="pyarrow")
    # stage-1 exchange on (node, salt) — co-location only, no range-sort.
    # Form chosen adaptively from the exchange size (ops/exchange.py):
    # sort groupby below the crossover, hash scatter above it; a hub
    # node's rows still split across its k salt sub-keys either way.
    # est_rows, when the caller knows the triple count, is 2x it (subj +
    # obj rows per triple).
    empty = pa.table(
        {"node": pa.array([], type=pa.string()), "n_docs_partial": pa.array([], type=pa.int64())}
    )
    partials = exchange_groups(
        salted, ["node", "salt"], shuffle_parts(), distinct_per_bucket, empty,
        est_rows=est_rows,
    )
    # second phase: one row per (node, salt) — far smaller fan-in
    return partials.groupby("node").aggregate(
        Sum("n_docs_partial", alias_name="n_docs")
    )
