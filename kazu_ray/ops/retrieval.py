"""Ranked retrieval over the document corpus.

``scaled_tfidf_topk`` is the classic two-pass distributed ranked
retrieval shape (tf-idf / BM25 family): a small document-frequency
statistics pass, then a streaming scoring pass with per-batch partial
top-k. Scores use an INTEGER-scaled idf — ``(N * SCALE) // df`` — so
the score of a document is a sum of integers: exact, associative and
order-independent, which keeps the result bit-identical to the DuckDB
oracle (float idf sums differ in last bits depending on reduction
order; see NOTES.md #26 — fix the representation, not the compare).

Scale shape: the df pass is a combiner (per-batch partial df over ≤
|terms| rows) followed by a tiny groupby; the term→idf map is broadcast
once via ``ray.put``; scoring streams the corpus once; top-k is
per-batch partial k then a final k·batches-row reduction on the driver
— no shuffle of corpus-sized data anywhere.
"""

from __future__ import annotations

import pyarrow as pa

SCALE = 1_000_000


def _term_counts(text: str, terms: tuple) -> dict[str, int]:
    counts = dict.fromkeys(terms, 0)
    for w in text.split(" "):
        if w in counts:
            counts[w] += 1
    return counts


def document_frequencies(docs_ds, terms: tuple) -> dict[str, int]:
    """Pass 1: number of documents containing each term (exact)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df_part = dict.fromkeys(terms, 0)
        for t in batch["text"].to_pylist():
            words = set(t.split(" "))
            for term in terms:
                if term in words:
                    df_part[term] += 1
        keys = sorted(df_part)
        return pa.table(
            {
                "term": pa.array(keys, type=pa.string()),
                "partial": pa.array([df_part[k] for k in keys], type=pa.int64()),
            }
        )

    agg = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("partial", alias_name="df"))
        .to_pandas()
    )
    return dict(zip(agg["term"], agg["df"]))


def scaled_tfidf_topk(
    docs_ds,
    queries: dict[str, tuple],
    n_docs: int,
    dfs: dict[str, int],
    k: int = 10,
):
    """Pass 2: for each named query (a tuple of terms), score every doc
    ``Σ_t tf(t, doc) * ((n_docs * SCALE) // df(t))`` and keep the top-k
    by (score DESC, doc_id ASC). Docs with score 0 never rank."""
    import pandas as pd

    idf = {
        t: (n_docs * SCALE) // dfs[t]
        for ts in queries.values()
        for t in ts
        if dfs.get(t, 0) > 0
    }

    def score_partial(batch: pa.Table) -> pa.Table:
        out_q, out_d, out_s = [], [], []
        doc_ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        all_terms = tuple(idf)
        for doc_id, text in zip(doc_ids, texts):
            tf = _term_counts(text, all_terms)
            for qname, terms in queries.items():
                s = sum(tf[t] * idf[t] for t in terms if t in idf)
                if s > 0:
                    out_q.append(qname)
                    out_d.append(doc_id)
                    out_s.append(s)
        part = pa.table(
            {
                "query": pa.array(out_q, type=pa.string()),
                "doc_id": pa.array(out_d, type=pa.int64()),
                "score": pa.array(out_s, type=pa.int64()),
            }
        )
        # per-batch partial top-k bounds what leaves the task
        pdf = part.to_pandas()
        pdf = (
            pdf.sort_values(["query", "score", "doc_id"], ascending=[True, False, True])
            .groupby("query", sort=False)
            .head(k)
        )
        return pa.Table.from_pandas(pdf, preserve_index=False)

    parts = docs_ds.map_batches(score_partial, batch_format="pyarrow").to_pandas()
    final = (
        parts.sort_values(["query", "score", "doc_id"], ascending=[True, False, True])
        .groupby("query", sort=False)
        .head(k)
        .reset_index(drop=True)
    )
    return pd.DataFrame(final)
