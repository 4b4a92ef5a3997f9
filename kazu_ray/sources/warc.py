"""WARC ingestion — the format Common Crawl actually ships.

The engine's canonical input is the parquet pages table
(url, warc_ts, html — BASELINE.json input_hint), but a real
Common-Crawl pipeline starts from ``.warc`` / ``.warc.gz`` segment
files (ISO 28500; reference corpus loaders are parquet/JSON-side —
``kazu/data.py`` document ingestion — so this reader is engine
surface, not a port). This module parses WARC **response** records
with a dependency-free splitter and exposes them as a Ray Dataset of
exactly the canonical shape, so every downstream operator (extract →
annotate → materialize, the web suite, the dedup layer) runs
unchanged on raw crawl segments.

Shapes: segment files are the natural partition unit —
``ray.data.read_binary_files`` streams one block per file and the
record splitter is a stateless ``map_batches`` (no actor state, no
shuffle); a crawl is ingested at the parallelism of its segment list.
Per-record gzip members (the Common-Crawl layout) and whole-file gzip
both decompress transparently.

Determinism contract: ``write_warc_bytes`` ∘ ``parse_warc_bytes`` is
the identity on (url, warc_ts µs, html) — gated by the
``warc_ingest`` driver query, which round-trips the synthetic pages
corpus through a WARC file and hash-compares against DuckDB reading
the parquet side.
"""

from __future__ import annotations

import gzip
from datetime import datetime, timezone

import pyarrow as pa

_CRLF2 = b"\r\n\r\n"


def _parse_headers(block: bytes) -> dict:
    headers: dict = {}
    for line in block.split(b"\r\n")[1:]:  # [0] is the WARC/1.0 version line
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower()] = v.strip()
    return headers


def _ts_us(warc_date: bytes):
    """WARC-Date (ISO 8601, UTC 'Z') → naive-UTC µs datetime, matching
    the parquet table's timestamp[us] values."""
    dt = datetime.fromisoformat(warc_date.decode().replace("Z", "+00:00"))
    return dt.astimezone(timezone.utc).replace(tzinfo=None)


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Split one WARC file's bytes into response records:
    [{url, warc_ts, html}]. Tolerates gzip (whole-file or concatenated
    per-record members), skips non-response records (warcinfo,
    request, metadata), and strips the HTTP envelope from response
    payloads."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)  # handles concatenated members
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            break
        head_end = data.find(_CRLF2, start)
        if head_end < 0:
            break
        headers = _parse_headers(data[start:head_end])
        try:
            length = int(headers[b"content-length"])
        except (KeyError, ValueError):
            break  # malformed record: stop rather than misalign
        body_start = head_end + len(_CRLF2)
        body = data[body_start : body_start + length]
        pos = body_start + length
        if headers.get(b"warc-type") == b"response":
            uri = headers.get(b"warc-target-uri", b"").decode()
            date = headers.get(b"warc-date")
            # strip the HTTP response envelope if present
            if body[:5] == b"HTTP/":
                sep = body.find(_CRLF2)
                html = body[sep + len(_CRLF2) :] if sep >= 0 else body
            else:
                html = body
            out.append(
                {
                    "url": uri,
                    "warc_ts": _ts_us(date) if date else None,
                    "html": html,
                }
            )
    return out


def write_warc_bytes(rows, per_record_gzip: bool = False) -> bytes:
    """Serialize (url, warc_ts, html) rows as WARC/1.0 response records
    (with a minimal HTTP envelope, like real crawl output). With
    ``per_record_gzip`` each record is its own gzip member — the
    Common-Crawl segment layout."""
    chunks = []
    for r in rows:
        html = r["html"] if isinstance(r["html"], bytes) else bytes(r["html"])
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
        ts = r["warc_ts"]
        # WARC 1.1 allows fractional seconds; always emit µs so the
        # parquet timestamp[us] round-trips exactly
        date = ts.strftime("%Y-%m-%dT%H:%M:%S.%fZ").encode()
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: " + r["url"].encode() + b"\r\n"
            b"WARC-Date: " + date + b"\r\n"
            b"Content-Length: " + str(len(http)).encode()
            + _CRLF2
            + http
            + _CRLF2
        )
        chunks.append(gzip.compress(rec, mtime=0) if per_record_gzip else rec)
    return b"".join(chunks)


def _records_to_table(records: list[dict]) -> pa.Table:
    return pa.table(
        {
            "url": pa.array([r["url"] for r in records], type=pa.string()),
            "warc_ts": pa.array(
                [r["warc_ts"] for r in records], type=pa.timestamp("us")
            ),
            "html": pa.array([r["html"] for r in records], type=pa.binary()),
        }
    )


_PAGES_EMPTY = pa.table(
    {
        "url": pa.array([], type=pa.string()),
        "warc_ts": pa.array([], type=pa.timestamp("us")),
        "html": pa.array([], type=pa.binary()),
    }
)


def read_warc(paths):
    """WARC segment file(s) → Dataset of the canonical pages shape
    (url, warc_ts, html). One read task per segment file; the record
    split is a stateless batch map."""
    import ray.data as rd

    files = rd.read_binary_files(paths)

    def split(batch: pa.Table) -> pa.Table:
        records = []
        for data in batch["bytes"].to_pylist():
            records.extend(parse_warc_bytes(data))
        if not records:
            return _PAGES_EMPTY
        return _records_to_table(records)

    return files.map_batches(split, batch_format="pyarrow")


def pages_from_warc(paths):
    """WARC segment file(s) → the FULL canonical pages schema
    (url, warc_ts, html, text, lang) with text/lang null — raw crawl
    data carries neither, so extraction decodes every html payload and
    language gating happens downstream (``ops/text.py`` langid) instead
    of on a stored column. ``annotated_docs(pages_ds=...)`` accepts the
    result directly; `tests/test_ops.py::test_flagship_from_warc...`
    gates that the annotate output over WARC input is IDENTICAL to the
    parquet path on the same corpus."""

    def widen(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return t.append_column(
            "text", pa.array([None] * n, type=pa.large_string())
        ).append_column("lang", pa.array([None] * n, type=pa.string()))

    return read_warc(paths).map_batches(widen, batch_format="pyarrow")


def write_warc_segments(pages_ds, out_dir: str, per_record_gzip: bool = True):
    """Distributed WARC sink: write a (url, warc_ts, html) Dataset back
    out as ``.warc.gz`` segment files — the re-emit half of a crawl
    curation pipeline (ingest → filter/dedup/strip → write segments for
    downstream consumers). One segment per block, streamed (no driver
    collect); file names are the sha256 of the segment bytes, so the
    write is idempotent (a re-run produces the same file set and
    overwrites in place, never duplicates) and the name doubles as a
    content checksum. Returns the list of file names written."""
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"file": pa.array([], type=pa.string())})
        data = write_warc_bytes(t.to_pylist(), per_record_gzip=per_record_gzip)
        name = f"{hashlib.sha256(data).hexdigest()[:24]}.warc.gz"
        tmp = os.path.join(out_dir, f".{name}.tmp")
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, os.path.join(out_dir, name))  # atomic publish
        return pa.table({"file": pa.array([name], type=pa.string())})

    out = pages_ds.map_batches(
        write_block, batch_format="pyarrow", batch_size=None
    )
    return sorted(r["file"] for r in out.take_all())
