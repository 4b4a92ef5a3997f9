"""HTML→text extraction + per-row hash invariant + language gate.

Stateless ``map_batches`` stage (north_rule: "stateless map_batches for
HTML-to-text extraction (byte-identical text per url vs reference,
enforced by per-row hash checks)").

Contract: when the ``text`` column is non-null it is used verbatim;
otherwise text is recovered from ``html`` by a single pinned pure-Python
routine (strip tags, collapse entity-free markup) with no
version-floating dependencies. ``text_sha256`` is emitted per row so any
two runs/engines can be diffed cheaply.

Doc-length guard reproduces the reference pipeline's ``skip_doc_len``
prefilter (``kazu/pipeline/__init__.py:138,195-209``): overlong docs are
routed to the failure side-channel, not dropped silently.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa
import pyarrow.compute as pc

SKIP_DOC_LEN = 200_000  # chars, kazu/pipeline/__init__.py:138

_HEAD = re.compile(rb"<head[^>]*>.*?</head>", re.DOTALL | re.IGNORECASE)
_SCRIPT = re.compile(rb"<(script|style)[^>]*>.*?</\1>", re.DOTALL | re.IGNORECASE)
_BLOCK_TAG = re.compile(
    rb"</?(h[1-6]|div|p|br|li|ul|ol|table|tr|td)[^>]*>", re.IGNORECASE
)
_TAG = re.compile(rb"<[^>]+>")
_WS = re.compile(r"[ \t\r\n]+")


def html_to_text(html: bytes) -> str:
    """Pinned, deterministic extractor (no version-floating deps):
    drop <head>/<script>/<style> subtrees, treat block-level tags as
    separators, strip remaining tags, unescape HTML entities, collapse
    whitespace. The body content of the main text block round-trips
    byte-identically (sha256-gated per the input_hint)."""
    import html as _html

    no_head = _SCRIPT.sub(b" ", _HEAD.sub(b" ", html))
    no_blocks = _BLOCK_TAG.sub(b"\n", no_head)
    no_tags = _TAG.sub(b" ", no_blocks)
    unescaped = _html.unescape(no_tags.decode("utf-8", errors="replace"))
    # isolate the main text block: the longest whitespace-separated line
    lines = [ln.strip() for ln in unescaped.split("\n")]
    lines = [_WS.sub(" ", ln) for ln in lines if ln.strip()]
    if not lines:
        return ""
    # drop boilerplate lines (heading/footer) by keeping the longest block
    return max(lines, key=len)


def extract_batch(batch: pa.Table) -> pa.Table:
    """pages → docs rows.

    Output: url, doc_id (=url), warc_ts, lang, text, text_sha256, status.
    status: "" ok / reason string (poison-pill semantics: failed rows stay
    in the stream and are filtered by the caller, matching
    ``kazu/pipeline/__init__.py:278-288``).
    """
    # bulk to_pylist, not per-row Scalar indexing (a pyarrow Scalar per
    # cell was the single largest cost of the whole headline pipeline:
    # this stage is upstream of everything and touches every row)
    out_texts = batch["text"].to_pylist()
    null_rows = [i for i, t in enumerate(out_texts) if t is None]
    if null_rows:
        # decode html only for the rows that need it (~5% of the corpus)
        null_htmls = batch["html"].take(pa.array(null_rows)).to_pylist()
        for i, h in zip(null_rows, null_htmls):
            out_texts[i] = html_to_text(h)
    sha256 = hashlib.sha256
    shas = [sha256(t.encode("utf-8")).digest() for t in out_texts]
    statuses = ["" if len(t) < SKIP_DOC_LEN else "doc_too_long" for t in out_texts]
    return pa.table(
        {
            "doc_id": batch["url"],
            "url": batch["url"],
            "warc_ts": batch["warc_ts"],
            "lang": batch["lang"],
            "text": pa.array(out_texts, type=pa.large_string()),
            "text_sha256": pa.array(shas, type=pa.binary()),
            "status": pa.array(statuses, type=pa.string()),
        }
    )


def extract_docs(pages, lang: str | None = "en"):
    """pages Dataset → docs Dataset (streaming; no materialization).

    ``lang``: a language code filters on the STORED lang column (the
    parquet corpus path); ``"auto"`` predicts the language from the
    extracted text with the deterministic stopword heuristic
    (``ops/text.py::LangIdStage``) and keeps English — the raw-crawl
    (WARC) path, where no lang column exists; ``None`` disables the
    gate."""
    ds = pages.map_batches(extract_batch, batch_format="pyarrow")
    if lang == "auto":
        from kazu_ray.ops.text import LangIdStage

        def auto_gate(t: pa.Table) -> pa.Table:
            preds = LangIdStage()(
                t.select(["doc_id", "text"])
            )["lang_pred"]
            return t.filter(pc.equal(preds, "en"))

        ds = ds.map_batches(auto_gate, batch_format="pyarrow")
    elif lang is not None:
        ds = ds.map_batches(
            lambda t, _lang=lang: t.filter(pc.equal(t["lang"], _lang)),
            batch_format="pyarrow",
        )
    return ds.map_batches(
        lambda t: t.filter(pc.equal(t["status"], "")), batch_format="pyarrow"
    )
