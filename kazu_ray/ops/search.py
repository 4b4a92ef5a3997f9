"""Substring / phrase search over the document corpus — grep at scale.

Two layers:

* :func:`phrase_search` — find documents containing an exact phrase.
  Scale shape: a character-trigram PREFILTER (k vectorized
  ``match_substring`` scans per batch, one per distinct phrase trigram,
  AND-ed) prunes to candidates, then ONE exact ``match_substring`` of
  the full phrase verifies survivors. Entirely streaming ``map_batches``
  — no shuffle, no driver gather; the trigram AND is a superset bound,
  so verification can only shrink it (zero false negatives).
* :func:`build_trigram_postings` — the reusable inverted index: one
  posting row per (trigram, doc_id), distinct per doc, compacted by a
  ``groupby(gram)``. Build once, probe many; the query path above is
  what a probe executes when the index is NOT materialized (a single
  ad-hoc search does not amortize an index build at 100 TB — the
  posting build reads every byte once, same as the scan).

``phrase_search`` column names match the DuckDB oracle
(``WHERE contains(text, phrase)``) in ``__ray_entry__.oracle_sql``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _distinct_trigrams(s: str) -> list[str]:
    return sorted({s[i : i + 3] for i in range(len(s) - 2)}) if len(s) >= 3 else [s]


def phrase_search(sf_dir: str, phrase: str = "fast merge"):
    """doc_ids of documents whose text contains ``phrase`` verbatim."""
    import ray.data as rd

    grams = _distinct_trigrams(phrase)

    def scan(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        mask = None
        for g in grams:
            hit = pc.match_substring(text, g)
            mask = hit if mask is None else pc.and_(mask, hit)
        cand = batch.filter(mask)
        if cand.num_rows:
            cand = cand.filter(pc.match_substring(cand["text"], phrase))
        return cand.select(["doc_id"])

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(scan, batch_format="pyarrow")


def build_trigram_postings(docs_ds):
    """(gram, doc_ids sorted list, df) posting table from a documents
    Dataset — doc-distinct trigrams flat-mapped per batch, compacted by
    a groupby(gram). Posting width is bounded by corpus doc count; hot
    grams (stopword-like trigrams) dominate — cap or stop-list them
    upstream if probes never use them."""
    import pandas as pd

    def explode(batch: pa.Table) -> pa.Table:
        doc_ids, grams = [], []
        for did, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for g in _distinct_trigrams(text or ""):
                doc_ids.append(did)
                grams.append(g)
        return pa.table(
            {
                "gram": pa.array(grams, type=pa.string()),
                "doc_id": pa.array(doc_ids, type=pa.int64()),
            }
        )

    def compact(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].tolist())
        return pd.DataFrame(
            {"gram": [g["gram"].iloc[0]], "doc_ids": [ids], "df": [len(ids)]}
        )

    return (
        docs_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("gram")
        .map_groups(compact, batch_format="pandas")
    )


def postings_probe(postings_df, phrase: str) -> list[int]:
    """Probe a (small, gathered) postings frame for candidate doc_ids of
    ``phrase`` — intersect the posting lists of its distinct trigrams,
    rarest first so the running set only shrinks. Candidates still need
    the exact verify (trigram AND is a superset)."""
    grams = _distinct_trigrams(phrase)
    lists = postings_df[postings_df["gram"].isin(grams)]
    if len(lists) < len(grams):
        return []  # some trigram matches no document at all
    by_df = lists.sort_values("df")
    out = None
    for ids in by_df["doc_ids"]:
        s = set(ids)
        out = s if out is None else (out & s)
        if not out:
            return []
    return sorted(out)
