"""Web-crawl log operators over the pages table (input_hint shape).

A Common-Crawl-style corpus carries the same page under many URL
spellings (tracking parameters, fragments, host-case variants) and
multiple captures over time. Standard pre-NLP hygiene:

* :func:`canonicalize_urls` — deterministic URL canonicalization as a
  stateless ``map_batches`` transform (vectorized pandas str kernels,
  per-row Python only for the rare query-string rows): strip the
  fragment, lowercase scheme+host, drop tracking parameters
  (``utm_*`` / ``fbclid`` / ``gclid``). The rule set is deliberately
  SQL-expressible so the driver can recompute it independently in
  DuckDB.
* :func:`url_dedup` — one row per canonical URL with capture count and
  latest capture timestamp. Combiner-first: per-batch partial
  (count, max_ts) aggregates ship to the ``groupby`` instead of raw
  rows, so the all-to-all moves one row per (canonical, block).
* :func:`domain_counts` — pages per registered host, same combiner
  shape. Hosts follow a Zipf law at crawl scale; the partial aggregate
  bounds any hot domain's fan-in by the block count.
* :func:`synth_url_log` — deterministic messy URL log derived from the
  documents table (clean row per doc + tracking/fragment/host-case
  variants for a deterministic subset) for tests and benchmarks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_TRACKING_PREFIXES = ("utm_", "fbclid=", "gclid=")
_HEAD_RE = r"^([^:/?#]+://[^/?#]+)"


def _canonical_series(urls: pd.Series) -> pd.Series:
    s = urls.str.replace(r"#.*$", "", regex=True)
    m = s.str.extract(r"^(?P<head>[^:/?#]+://[^/?#]+)(?P<rest>.*)$")
    has_head = m["head"].notna()
    out = s.copy()
    # lowercase applies to the scheme://host head only (when present)
    out.loc[has_head] = (
        m.loc[has_head, "head"].str.lower() + m.loc[has_head, "rest"].fillna("")
    )
    # fragment and tracking-param stripping apply to EVERY row, headed
    # or not — the SQL oracle applies its '?' branch unconditionally and
    # the two rule chains must agree on every input, not just the synth
    # corpus (query-string rows are rare → per-row ok)
    has_q = out.str.contains("?", regex=False)

    def strip_params(u: str) -> str:
        base, q = u.split("?", 1)
        keep = [p for p in q.split("&") if not p.startswith(_TRACKING_PREFIXES)]
        return base if not keep else base + "?" + "&".join(keep)

    out.loc[has_q] = out.loc[has_q].map(strip_params)
    return out


def canonicalize_urls(batch: pa.Table) -> pa.Table:
    urls = batch["url"].to_pandas()
    return batch.append_column(
        "canonical_url", pa.array(_canonical_series(urls), type=pa.string())
    )


def url_dedup(pages_ds):
    """One row per canonical URL: (canonical_url, n_urls, latest_ts)."""
    from ray.data.aggregate import Max, Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = pa.table(
            {"url": batch["url"], "warc_ts": batch["warc_ts"]}
        ).to_pandas()
        df["canonical_url"] = _canonical_series(df["url"])
        agg = df.groupby("canonical_url", as_index=False).agg(
            n=("url", "size"), mx=("warc_ts", "max")
        )
        return pa.Table.from_pandas(agg, preserve_index=False)

    partials = pages_ds.map_batches(partial, batch_format="pyarrow")
    return (
        partials.groupby("canonical_url")
        .aggregate(Sum("n", alias_name="n_urls"), Max("mx", alias_name="latest_ts"))
    )


def domain_counts(pages_ds):
    """Pages per lowercased host: (domain, n_pages)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pandas()
        hosts = urls.str.extract(r"^[^:/?#]+://([^/?#]+)", expand=False).str.lower()
        agg = (
            pd.DataFrame({"domain": hosts.dropna()})
            .groupby("domain", as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return pa.Table.from_pandas(agg, preserve_index=False)

    partials = pages_ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("domain").aggregate(Sum("n", alias_name="n_pages"))


def synth_url_log_batch(batch: pa.Table) -> pa.Table:
    """Deterministic messy URL log: one clean capture per doc, plus a
    tracking-param + fragment + host-case variant (same canonical, later
    capture) for every 5th doc and a distinct-canonical variant (a real
    query param survives) for every 11th."""
    import datetime

    epoch = datetime.datetime(2024, 1, 1)
    urls, ts = [], []
    for i in batch["doc_id"].to_pylist():
        host = f"site{i % 7}.example.org"
        base = f"https://{host}/page/{i:08d}"
        urls.append(base)
        ts.append(epoch + datetime.timedelta(seconds=int(i)))
        if i % 5 == 0:
            urls.append(
                f"https://{host.upper()}/page/{i:08d}?utm_source=feed&utm_campaign=x#frag"
            )
            ts.append(epoch + datetime.timedelta(seconds=int(i) + 3600))
        if i % 11 == 0:
            urls.append(f"{base}?rev=2&gclid=abc123")
            ts.append(epoch + datetime.timedelta(seconds=int(i) + 7200))
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
        }
    )


def synth_url_log(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"]).map_batches(
        synth_url_log_batch, batch_format="pyarrow"
    )
