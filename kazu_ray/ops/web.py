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

Beyond URL hygiene, this module carries the whole webgraph / corpus-
hygiene suite over the pages table: the host link graph and its
analytics (degrees, weighted PageRank, HITS, components, reachability,
triangles/clustering, assortativity, co-citation, reciprocity, mirror
detection via outlink Jaccard, KMV distinct sketch), crawl operations
(frontier, recency, two-snapshot delta), per-host boilerplate
detection + stripping, and the cross-layer KG rollups
(host_entity_profile, triple_recency). Shared shape vocabulary:
per-batch combiners in front of every exchange, host-keyed hash
exchanges (``exchange_groups``) instead of sort-based groupbys, size
dispatch between driver math (sub-cap graphs) and streaming
exchange/int-coded forms, and loud—not silent—caps on hub skew.
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


# ---------------------------------------------------------------------------
# Host-level web link graph
# ---------------------------------------------------------------------------

_HREF_RE = __import__("re").compile(rb'<a\s+href="https?://([^/"]+)')
_HOST_RE = r"^[^:/?#]+://([^/?#]+)"


def host_link_graph(pages_ds):
    """Host-level outlink graph over the pages table: one row per
    (src_host, dst_host) with the total anchor count ``n_links`` — THE
    canonical webgraph reduction of a Common-Crawl-style corpus (host
    graphs are what PageRank-over-the-web, spam-domain, and
    crawl-frontier analyses consume).

    Shapes: anchor extraction is a stateless ``map_batches`` over the
    raw ``html`` binary (module-level compiled regex; per-row findall is
    the decode step, same contract as ``html_to_text``) that COMBINES
    per batch to (src_host, dst_host, partial n) before anything moves —
    the shuffle then carries at most blocks × local-distinct-pairs rows
    into a groupby whose result is bounded by hosts², not pages. A hot
    hub host adds partial rows, never per-link rows, so host skew (Zipf
    by construction in the synthetic corpus, Zipf in reality) cannot
    concentrate state."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        src = (
            batch["url"]
            .to_pandas()
            .str.extract(_HOST_RE, expand=False)
            .str.lower()
        )
        htmls = batch["html"].to_pylist()
        srcs, dsts = [], []
        for s, h in zip(src, htmls):
            if s is None or h is None:
                continue
            for m in _HREF_RE.findall(h):
                srcs.append(s)
                dsts.append(m.decode("utf-8", "replace").lower())
        if not srcs:
            return _LINK_EMPTY
        agg = (
            pd.DataFrame({"src_host": srcs, "dst_host": dsts})
            .groupby(["src_host", "dst_host"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return pa.table(
            {
                "src_host": pa.array(agg["src_host"], type=pa.string()),
                "dst_host": pa.array(agg["dst_host"], type=pa.string()),
                "n": pa.array(agg["n"].to_numpy(np.int64)),
            }
        )

    partials = pages_ds.map_batches(partial, batch_format="pyarrow")
    return (
        partials.groupby(["src_host", "dst_host"])
        .aggregate(Sum("n", alias_name="n_links"))
        .map_batches(
            lambda t: pa.table(
                {
                    "src_host": t["src_host"].cast(pa.string()),
                    "dst_host": t["dst_host"].cast(pa.string()),
                    "n_links": t["n_links"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


_LINK_EMPTY = pa.table(
    {
        "src_host": pa.array([], type=pa.string()),
        "dst_host": pa.array([], type=pa.string()),
        "n": pa.array([], type=pa.int64()),
    }
)


def _web_driver_pair_cap() -> int:
    """Size-dispatch threshold for the iterative host-graph ops, in
    distinct (src, dst) pairs: at or below the cap the exact integer
    recurrences run driver-side (a sub-second pandas/dict pass — the
    distributed forms pay ~2 s of exchange fixed floor PER PASS, which
    dominates utterly on a small graph), above it the streaming
    exchange forms run. Same contract as ``KAZU_CC_MAX_DRIVER_PAIRS``
    in the graph layer; set to 0 to force the distributed path (the
    scale drill and the forced-path tests do)."""
    import os

    return int(os.environ.get("KAZU_WEB_MAX_DRIVER_PAIRS", "200000"))


def _driver_degrees(links_df: pd.DataFrame) -> pd.DataFrame:
    """Exact driver-side marginals over a collected link graph —
    identical math to the distributed combiner (the 1M-host drill
    asserts them equal on the overlap)."""
    out = links_df.groupby("src_host").agg(
        out_links=("n_links", "sum"), out_hosts=("dst_host", "nunique")
    )
    inn = links_df.groupby("dst_host").agg(in_hosts=("src_host", "nunique"))
    return (
        out.join(inn, how="outer")
        .fillna(0)
        .astype("int64")
        .reset_index(names="host")
        .sort_values("host", ignore_index=True)
    )


def host_degrees_from_links(links_ds):
    """Per-host marginals over an existing link-graph Dataset (rows
    DISTINCT per (src_host, dst_host) — the :func:`host_link_graph`
    output contract, which is what makes the row counts below
    distinct-host counts). Size-dispatched: a pre-materialized input at
    or below :func:`_web_driver_pair_cap` pairs collapses driver-side
    (sub-second; the exchange pays a ~2 s fixed floor that dominates a
    small graph), everything else runs the streaming exchange below.

    Distributed shapes: the ``_edge_degrees`` combiner pattern
    (``kazu_ray/ops/graph.py``): each batch emits host-sized partial
    rows — a (src, n_links, 1 pair, 0) row and a (dst, 0, 0, 1 pair)
    row collapsed per host — and the partials meet in a host-keyed
    HASH exchange (``exchange_groups``; a ``Dataset.groupby`` pays a
    global range-partition SORT of every partial row — measured ~2× on
    the 10⁶-host drill) whose buckets finish the sums vectorized.
    NOTHING edge-sized is ever collected to the driver on that path
    (the round-4 form ``to_pandas()``-ed the whole link graph, which
    grows with the crawl: ~10⁸ hosts / ~10⁹ edges at real Common-Crawl
    scale)."""
    import ray.data as rd
    from ray.data.dataset import MaterializedDataset

    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    if (
        isinstance(links_ds, MaterializedDataset)
        and links_ds.count() <= _web_driver_pair_cap()
    ):
        return rd.from_pandas(_driver_degrees(links_ds.to_pandas()))

    def partial(t: pa.Table) -> pa.Table:
        src = t["src_host"].to_pandas()
        dst = t["dst_host"].to_pandas()
        n = t["n_links"].to_pandas()
        df = pd.concat(
            [
                pd.DataFrame(
                    {"host": src, "o_l": n, "o_h": 1, "i_h": 0}
                ),
                pd.DataFrame(
                    {"host": dst, "o_l": 0, "o_h": 0, "i_h": 1}
                ),
            ],
            ignore_index=True,
        )
        g = df.groupby("host", as_index=False).sum()
        return pa.table(
            {
                "host": pa.array(g["host"], type=pa.string()),
                "o_l": pa.array(g["o_l"].to_numpy(np.int64)),
                "o_h": pa.array(g["o_h"].to_numpy(np.int64)),
                "i_h": pa.array(g["i_h"].to_numpy(np.int64)),
            }
        )

    def bucket_sum(t: pa.Table) -> pa.Table:
        g = t.group_by("host").aggregate(
            [("o_l", "sum"), ("o_h", "sum"), ("i_h", "sum")]
        )
        return pa.table(
            {
                "host": g["host"].cast(pa.string()),
                "out_links": g["o_l_sum"].cast(pa.int64()),
                "out_hosts": g["o_h_sum"].cast(pa.int64()),
                "in_hosts": g["i_h_sum"].cast(pa.int64()),
            }
        )

    return exchange_groups(
        links_ds.map_batches(partial, batch_format="pyarrow"),
        ["host"],
        shuffle_parts(),
        bucket_sum,
        pa.table(
            {
                "host": pa.array([], type=pa.string()),
                "out_links": pa.array([], type=pa.int64()),
                "out_hosts": pa.array([], type=pa.int64()),
                "in_hosts": pa.array([], type=pa.int64()),
            }
        ),
    )


def host_degrees(pages_ds):
    """Per-host link-graph degrees: (host, out_links, out_hosts,
    in_hosts) — total outgoing anchors, distinct target hosts, distinct
    referring hosts. Hosts appearing only as targets report
    out_links=0/out_hosts=0; hosts that link out but receive nothing
    report in_hosts=0.

    Fully distributed end to end (:func:`host_degrees_from_links` over
    the streaming :func:`host_link_graph` pass) — the host table grows
    with the crawl, so unlike the KG node vocabulary it is NOT
    legitimate driver material. Streams as a Dataset."""
    return host_degrees_from_links(host_link_graph(pages_ds))


def _driver_pagerank(
    links_df: pd.DataFrame, iterations: int, scale: int
) -> pd.DataFrame:
    """Exact driver-side integer PageRank over a collected link graph —
    the same recurrence as the distributed form in unbounded Python
    ints (the 1M-host drill asserts them equal on the overlap)."""
    w = dict(
        zip(
            zip(links_df["src_host"], links_df["dst_host"]),
            (int(v) for v in links_df["n_links"]),
        )
    )
    hosts = sorted({a for a, _ in w} | {b for _, b in w})
    ow: dict = {}
    for (a, _), n in w.items():
        ow[a] = ow.get(a, 0) + n
    rank = {h: scale for h in hosts}
    for _ in range(iterations):
        inflow = {h: 0 for h in hosts}
        for (a, b), n in w.items():
            inflow[b] += rank[a] * n // ow[a]
        rank = {h: 3 * scale // 20 + 17 * inflow[h] // 20 for h in hosts}
    int64_max = 2**63 - 1
    if any(abs(r) > int64_max for r in rank.values()):
        raise OverflowError(
            "host_pagerank rank exceeds int64 — lower `scale`"
        )
    return pd.DataFrame(
        {"host": hosts, "rank_scaled": [rank[h] for h in hosts]}
    ).astype({"rank_scaled": "int64"})


def _driver_hits(
    links_df: pd.DataFrame, iterations: int, scale: int
) -> pd.DataFrame:
    """Exact driver-side integer HITS over a collected link graph —
    the same sum-normalized recurrence as the distributed form in
    unbounded Python ints."""
    w = dict(
        zip(
            zip(links_df["src_host"], links_df["dst_host"]),
            (int(v) for v in links_df["n_links"]),
        )
    )
    hosts = sorted({a for a, _ in w} | {b for _, b in w})
    hub = {h: scale for h in hosts}
    auth = {h: 0 for h in hosts}
    for _ in range(iterations):
        raw = {h: 0 for h in hosts}
        for (a, b), n in w.items():
            raw[b] += hub[a] * n
        tot = sum(raw.values())
        auth = {h: (raw[h] * scale // tot if tot else 0) for h in hosts}
        raw = {h: 0 for h in hosts}
        for (a, b), n in w.items():
            raw[a] += auth[b] * n
        tot = sum(raw.values())
        hub = {h: (raw[h] * scale // tot if tot else 0) for h in hosts}
    return pd.DataFrame(
        {
            "host": hosts,
            "hub_scaled": [hub[h] for h in hosts],
            "auth_scaled": [auth[h] for h in hosts],
        }
    ).astype({"hub_scaled": "int64", "auth_scaled": "int64"})


def host_pagerank_from_links(links_ds, iterations: int = 3, scale: int = 10**12):
    """Weighted directed PageRank over a link-graph Dataset
    (src_host, dst_host, n_links), in INTEGER arithmetic so the SQL
    oracle is hash-exact: damping 0.85 is the rational 17/20, so

        rank_{k+1}(v) = 3*scale//20
                        + 17 * Σ_{u→v} (rank_k(u) * w(u,v) // W(u)) // 20

    with w = anchor count per (u, v) and W(u) = u's total outgoing
    anchors. Every per-edge term is a deterministic integer and sums
    commute, so partial per-batch aggregation is exact. Size-dispatched
    (:func:`_web_driver_pair_cap`): at or below the cap the identical
    recurrence runs driver-side in unbounded Python ints. Dangling hosts
    (no outlinks) keep receiving but distribute nothing — their mass is
    dropped BY CONTRACT, identically in the oracle (the standard
    no-redistribution simplification; at fixed iterations the drop is
    deterministic).

    Shapes: the broadcast-rank streaming-edge-pass pattern of the KG
    ``pagerank`` (``kazu_ray/ops/graph.py``), parameterized for
    WEIGHTED DIRECTED edges: the edge Dataset materializes once and is
    scanned once per iteration; the rank vector and the out-weight
    table are HOST-sized and broadcast via one ``ray.put`` per
    iteration (a broadcast concern at 10⁸ hosts, but strictly better
    than the round-4 form, which collected the EDGE set to the driver);
    per-batch combiners pre-sum contributions per destination before
    the host-keyed groupby. Overflow is guarded, not silent: the
    per-edge multiply falls back to exact Python ints when
    ``max_rank × max_w`` could exceed int64 (the DuckDB oracle promotes
    SUM to HUGEINT, so a silent int64 wrap would diverge without
    error), and an update whose rank leaves int64 raises loudly.
    Returns (host, rank_scaled) sorted by host."""
    import ray

    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    links = links_ds.materialize()
    if links.count() <= _web_driver_pair_cap():
        return _driver_pagerank(links.to_pandas(), iterations, scale)

    # the full host set (src ∪ dst) — host-sized, from the distributed
    # degrees marginals rather than a driver pass over the edges
    hosts_df = host_degrees_from_links(links).to_pandas().sort_values(
        "host", ignore_index=True
    )
    hosts = hosts_df["host"].tolist()
    n_hosts = len(hosts)

    # salted-hash host keys (same trick as components_labeled): edges
    # int-code themselves per batch from the string — NOTHING
    # string-keyed is ever broadcast (a 10⁶-entry dict deserializes in
    # every task and dominated the drill's wall time). The iteration
    # state is three flat numpy vectors aligned to the SORTED hash
    # order — int64/uint64 arrays are ZERO-COPY out of the object
    # store — and per-batch lookup is a searchsorted. Collisions are
    # checked on the driver against the known host table and re-salted
    # (a collision would silently merge two hosts' ranks).
    salt = 0
    for salt in range(16):
        host_hashes = pd.util.hash_array(
            np.asarray(hosts, dtype=object), hash_key=f"{salt:016d}"
        )
        if len(np.unique(host_hashes)) == n_hosts:
            break
    else:
        raise RuntimeError("host_pagerank: host hashing collided at all 16 salts")
    order = np.argsort(host_hashes)
    sorted_hashes = host_hashes[order]
    # out-weight per host, aligned to sorted-hash order (hosts_df is
    # host-sorted and its out_links column is the total anchor count)
    ow = hosts_df["out_links"].to_numpy(np.int64)[order]
    hash_ref = ray.put(sorted_hashes)

    def encode(t: pa.Table, _salt=salt) -> pa.Table:
        sh = ray.get(hash_ref)

        def idx_of(col) -> np.ndarray:
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            vals = col.fill_null("").to_pandas().to_numpy()
            h = pd.util.hash_array(vals, hash_key=f"{_salt:016d}")
            return np.searchsorted(sh, h).astype(np.int64)

        return pa.table(
            {
                "s": pa.array(idx_of(t["src_host"])),
                "d": pa.array(idx_of(t["dst_host"])),
                "n": t["n_links"].cast(pa.int64()),
            }
        )

    int_edges = links.map_batches(encode, batch_format="pyarrow").materialize()

    base = 3 * scale // 20
    rank = np.full(n_hosts, scale, dtype=np.int64)
    int64_max = 2**63 - 1
    ow_ref = ray.put(ow)

    for _ in range(iterations):
        rank_ref = ray.put(rank)

        def partial(t: pa.Table) -> pa.Table:
            r = ray.get(rank_ref)  # zero-copy int64 vector
            w = ray.get(ow_ref)
            s = t["s"].to_numpy()
            d = t["d"].to_numpy()
            n = t["n"].to_numpy()
            if len(s) == 0:
                return pa.table(
                    {
                        "d": pa.array([], type=pa.int64()),
                        "c": pa.array([], type=pa.int64()),
                    }
                )
            r_u = r[s]
            if int(r_u.max()) * int(n.max()) > int64_max:
                # exact Python-int path: object dtype multiplies never
                # wrap (ADVICE r04 — the oracle's HUGEINT would diverge
                # from a silent int64 wrap)
                contrib_obj = [
                    int(rv) * int(nv) // int(wv)
                    for rv, nv, wv in zip(r_u, n, w[s])
                ]
                if any(abs(v) > int64_max for v in contrib_obj):
                    # contrib ≤ rank by construction (w ≤ W), so this
                    # only fires if rank itself left int64 — loud, not
                    # a silent wrap
                    raise OverflowError(
                        "host_pagerank per-edge contribution exceeds "
                        "int64 — lower `scale`"
                    )
                contrib = np.array(contrib_obj, dtype=np.int64)
            else:
                contrib = (r_u * n) // w[s]
            # per-batch combiner on int codes: sort + reduceat keeps
            # the sums in int64
            order = np.argsort(d, kind="stable")
            ds_, cs = d[order], contrib[order]
            starts = np.flatnonzero(
                np.concatenate(([True], ds_[1:] != ds_[:-1]))
            )
            return pa.table(
                {
                    "d": pa.array(ds_[starts]),
                    "c": pa.array(np.add.reduceat(cs, starts)),
                }
            )

        def bucket_sum_d(t: pa.Table) -> pa.Table:
            g = t.group_by("d").aggregate([("c", "sum")])
            return pa.table(
                {
                    "d": g["d"].cast(pa.int64()),
                    "s": g["c_sum"].cast(pa.int64()),
                }
            )

        inflow = exchange_groups(
            int_edges.map_batches(partial, batch_format="pyarrow"),
            ["d"],
            shuffle_parts(),
            bucket_sum_d,
            pa.table(
                {
                    "d": pa.array([], type=pa.int64()),
                    "s": pa.array([], type=pa.int64()),
                }
            ),
        ).to_pandas()
        new_rank = np.full(n_hosts, base, dtype=np.int64)
        d_idx = inflow["d"].to_numpy(np.int64)
        s_val = inflow["s"].to_numpy(np.int64)
        upd = base + (17 * s_val.astype(object)) // 20  # exact big-int
        if any(int(v) > int64_max for v in upd):
            raise OverflowError(
                "host_pagerank rank exceeds int64 — lower `scale` or "
                "iterate in a wider integer type"
            )
        new_rank[d_idx] = upd.astype(np.int64)
        rank = new_rank

    # rank is aligned to sorted-hash order; un-permute to host order
    inv = np.empty(n_hosts, dtype=np.int64)
    inv[order] = np.arange(n_hosts)
    return pd.DataFrame({"host": hosts, "rank_scaled": rank[inv]}).astype(
        {"rank_scaled": "int64"}
    )


def host_pagerank(pages_ds, iterations: int = 3, scale: int = 10**12):
    """Weighted directed PageRank over the host link graph parsed from
    the raw page html — :func:`host_link_graph` (distributed anchor
    extraction + combiner-first pair aggregate) feeding
    :func:`host_pagerank_from_links` (broadcast-rank streaming edge
    passes; the edge set never touches the driver)."""
    return host_pagerank_from_links(
        host_link_graph(pages_ds), iterations=iterations, scale=scale
    )


_HREF_FULL_RE = __import__("re").compile(rb'<a\s+href="(https?://[^"]+)"')


def crawl_frontier(pages_ds):
    """Crawl frontier: every outlink URL that is NOT itself a crawled
    page, with its reference count — the next-fetch worklist a crawler
    derives from a finished crawl batch. Unlike the host graph this is
    PAGE-scale on both sides (outlink urls and crawled urls both grow
    with the corpus), so the anti-join must really distribute.

    Shapes: one e-marker union exchange keyed on the url — outlink rows
    (url, n partial, crawled=0) pre-combined per batch, crawled-page
    rows (url, 0, crawled=1) — hash co-location brings each url's
    partials and its (at most one) crawled marker to one bucket, where
    a vectorized groupby sums refs, maxes the marker, and filters
    crawled==0. No global sort, no broadcast of a page-scale set, hot
    urls bounded by blocks × 1 partial row. Exchange pinned to the
    scatter form (:func:`_page_scale_rows`): the crawled-marker side is
    one row per page by construction, never combiner-bounded."""
    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    def outlink_partials(batch: pa.Table) -> pa.Table:
        refs: dict[bytes, int] = {}
        for h in batch["html"].to_pylist():
            if h is None:
                continue
            for u in _HREF_FULL_RE.findall(h):
                refs[u] = refs.get(u, 0) + 1
        urls = pa.array(
            [u.decode("utf-8", "replace") for u in refs], type=pa.string()
        )
        n = pa.array(list(refs.values()), type=pa.int64())
        return pa.table(
            {
                "url": urls,
                "n": n,
                "crawled": pa.array([0] * len(refs), type=pa.int64()),
            }
        )

    def crawled_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": batch["url"].cast(pa.string()),
                "n": pa.array([0] * batch.num_rows, type=pa.int64()),
                "crawled": pa.array([1] * batch.num_rows, type=pa.int64()),
            }
        )

    union = pages_ds.map_batches(
        outlink_partials, batch_format="pyarrow"
    ).union(pages_ds.map_batches(crawled_rows, batch_format="pyarrow"))

    def per_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = t.group_by("url").aggregate([("n", "sum"), ("crawled", "max")])
        # select aggregate outputs BY NAME (positional rename is fragile
        # across pyarrow versions)
        keep = pc.and_(
            pc.equal(g["crawled_max"], 0), pc.greater(g["n_sum"], 0)
        )
        g = g.filter(keep)
        return pa.table({"url": g["url"], "n_refs": g["n_sum"]})

    return exchange_groups(
        union,
        ["url"],
        shuffle_parts(),
        per_bucket,
        pa.table(
            {
                "url": pa.array([], type=pa.string()),
                "n_refs": pa.array([], type=pa.int64()),
            }
        ),
        est_rows=_page_scale_rows(),
    )


def page_outlink_stats(pages_ds):
    """Per-page outlink profile: (url, n_outlinks, n_hosts, n_external)
    — outdegree and external-link share are standard page-quality /
    spam signals. Pure per-row streaming transform (one regex pass per
    page, no shuffle at any scale); "external" = target host differs
    from the page's own host."""

    def stats(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        n_out, n_hosts, n_ext = [], [], []
        for u, h in zip(urls, htmls):
            own = (u or "").split("://", 1)[-1].split("/", 1)[0].lower()
            targets = [] if h is None else [
                m.decode("utf-8", "replace").lower()
                for m in _HREF_RE.findall(h)
            ]
            n_out.append(len(targets))
            n_hosts.append(len(set(targets)))
            n_ext.append(sum(1 for t in targets if t != own))
        return pa.table(
            {
                "url": batch["url"].cast(pa.string()),
                "n_outlinks": pa.array(n_out, type=pa.int64()),
                "n_hosts": pa.array(n_hosts, type=pa.int64()),
                "n_external": pa.array(n_ext, type=pa.int64()),
            }
        )

    return pages_ds.map_batches(stats, batch_format="pyarrow")


def host_crawl_recency(pages_ds):
    """Per-host crawl freshness: (host, n_pages, first_ts_us,
    last_ts_us, n_recent) where n_recent counts pages captured AFTER
    the midpoint of the corpus's global capture window — the signal a
    re-crawl scheduler ranks hosts by.

    Shapes: pass 1 streams only the timestamp column into a global
    min/max aggregate; the integer midpoint broadcasts in the closure
    (two-pass broadcast-threshold pattern, same as the tf-idf idf
    pass); pass 2 is a per-batch combiner groupby per host feeding a
    host-bounded groupby. All-integer µs outputs — hash-exact vs the
    oracle."""
    from ray.data.aggregate import Max, Min, Sum

    def ts_only(batch: pa.Table) -> pa.Table:
        return pa.table({"ts": batch["warc_ts"].cast(pa.int64())})

    mm = pages_ds.map_batches(ts_only, batch_format="pyarrow").aggregate(
        Min("ts"), Max("ts")
    )
    lo, hi = int(mm["min(ts)"]), int(mm["max(ts)"])
    mid = lo + (hi - lo) // 2

    def partial(batch: pa.Table) -> pa.Table:
        hosts = (
            batch["url"]
            .to_pandas()
            .str.extract(_HOST_RE, expand=False)
            .str.lower()
        )
        ts = batch["warc_ts"].cast(pa.int64()).to_pandas()
        df = pd.DataFrame({"host": hosts, "ts": ts}).dropna(subset=["host"])
        df["rec"] = (df["ts"] > mid).astype("int64")
        g = df.groupby("host").agg(
            n=("ts", "size"), lo=("ts", "min"), hi=("ts", "max"), rec=("rec", "sum")
        )
        g = g.reset_index()
        return pa.table(
            {
                "host": pa.array(g["host"], type=pa.string()),
                "n": pa.array(g["n"].to_numpy(np.int64)),
                "lo": pa.array(g["lo"].to_numpy(np.int64)),
                "hi": pa.array(g["hi"].to_numpy(np.int64)),
                "rec": pa.array(g["rec"].to_numpy(np.int64)),
            }
        )

    return (
        pages_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            Sum("n", alias_name="n_pages"),
            Min("lo", alias_name="first_ts_us"),
            Max("hi", alias_name="last_ts_us"),
            Sum("rec", alias_name="n_recent"),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "host": t["host"].cast(pa.string()),
                    "n_pages": t["n_pages"].cast(pa.int64()),
                    "first_ts_us": t["first_ts_us"].cast(pa.int64()),
                    "last_ts_us": t["last_ts_us"].cast(pa.int64()),
                    "n_recent": t["n_recent"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def host_components(pages_ds):
    """Connected components of the (undirected view of the) host link
    graph — site-family / crawl-cluster discovery: (host, component)
    with the component labeled by its lexicographically smallest host.

    Fully distributed via ``components_labeled``
    (``kazu_ray/ops/graph.py``): salted-hash node ids computed per
    batch (no driver sort of the host vocabulary — unlike the KG node
    table, the HOST table grows with the crawl), size-dispatched
    clustering (BSP min-label bucket actors past
    ``KAZU_CC_MAX_DRIVER_PAIRS``), lexmin label restored by distributed
    joins. Streams as a Dataset of (host, component)."""
    from kazu_ray.ops.graph import components_labeled

    comp = components_labeled(
        host_link_graph(pages_ds), a_col="src_host", b_col="dst_host"
    )
    return comp.map_batches(
        lambda t: pa.table(
            {
                "host": t["node"].cast(pa.string()),
                "component": t["component"].cast(pa.string()),
            }
        ),
        batch_format="pyarrow",
    )


def host_reachability(pages_ds, n_seeds: int = 5, max_hops: int = 3):
    """Multi-source BFS distance (≤ ``max_hops``) from the ``n_seeds``
    lexicographically-smallest hosts over the UNDIRECTED host link
    graph — "hops from the core of the crawl", the standard
    crawl-depth / seed-proximity signal (and the k-hop reachability
    primitive the frontier-prioritization heuristics consume).

    Reuses the KG BFS machinery (``kazu_ray/ops/graph.py``), which is
    size-dispatched: dict-broadcast relaxation under
    ``KAZU_GRAPH_MAX_DICT_EDGES``, int-coded numpy distance vector
    (salted-hash node codes, fixed int edge set, min-combined
    relaxation partials over a code-keyed exchange) above it — the
    right form for the open host vocabulary. Output is host-sized
    (bounded like the PageRank vector, not edge-sized): (host, dist),
    unreached hosts absent. Deterministic seed rule so the unrolled
    Bellman-Ford SQL oracle reproduces it exactly."""
    from kazu_ray.ops.graph import _distinct_edges, bfs_distances

    out = bfs_distances(
        None,
        n_seeds=n_seeds,
        max_hops=max_hops,
        edges=_distinct_edges(_links_as_subj_obj(host_link_graph(pages_ds))),
    )
    return out.rename(columns={"node": "host"})


def _links_as_subj_obj(links_ds):
    """View a (src_host, dst_host, ...) link graph as the (subj, obj)
    shape the kg-side graph ops consume (their edge derivation reads
    only those two columns)."""
    return links_ds.map_batches(
        lambda t: pa.table(
            {
                "subj": t["src_host"].cast(pa.string()),
                "obj": t["dst_host"].cast(pa.string()),
            }
        ),
        batch_format="pyarrow",
    )


def host_triangles(pages_ds):
    """Global triangle count of the undirected host link graph — the
    density-of-local-community signal webgraph spam/cohesion analyses
    start from. Pure reuse of the KG triangle machinery
    (``kazu_ray/ops/graph.py::triangle_count``): size-dispatched between
    the driver adjacency form and the degree-oriented
    Suri-Vassilvitskii distributed wedge counting on int32 codes."""
    from kazu_ray.ops.graph import triangle_count

    return triangle_count(_links_as_subj_obj(host_link_graph(pages_ds)))


def host_clustering(pages_ds):
    """Global clustering coefficient of the undirected host link graph
    (3·triangles / wedges, integer ppm — hash-exact vs the SQL oracle).
    Reuses ``kazu_ray/ops/graph.py::clustering_coefficient`` with the
    distinct-edge Dataset derived once."""
    from kazu_ray.ops.graph import clustering_coefficient

    return clustering_coefficient(_links_as_subj_obj(host_link_graph(pages_ds)))


def host_assortativity(pages_ds):
    """Degree assortativity of the undirected host link graph — the
    hub-mixing summary of the crawl (real web host graphs are
    disassortative: hub hosts link to long tails). Pure reuse of
    ``kazu_ray/ops/graph.py::degree_assortativity`` over the subj/obj
    link view: distinct-edge exchange, node-sized degree dict broadcast
    once, one streaming partial-sums edge pass, exact integer ppm.

    Scale note: the degree dict is HOST-sized — the same
    hosts-sized-broadcast acceptance as the PageRank rank vector (and
    strictly bounded by it: one int per host). The edge set itself
    never leaves the cluster."""
    from kazu_ray.ops.graph import degree_assortativity

    return degree_assortativity(_links_as_subj_obj(host_link_graph(pages_ds)))


def host_entity_profile(triples_ds):
    """Per-host KG density profile — the cross-layer (webtext × KG)
    rollup a construction pipeline reports on: for every host whose
    pages produced at least one triple, the number of contributing
    docs (``n_docs``), emitted triples (``n_triples``), and DISTINCT
    entities — subjects ∪ objects — (``n_entities``).

    The triple stream's ``doc_id`` IS the source page url (the store
    contract, ``kazu_ray/stages/materialize.py``), so host attribution
    is a per-batch regex extract — no join against the pages table is
    ever needed. ONE streaming pass emits per-batch-combined rows of
    two kinds — a ``kind='t'`` (host, triple-count) partial plus
    per-batch-DISTINCT ``kind='e'``/``'d'`` (host, entity/doc-url)
    markers — and ONE host-keyed hash exchange finishes both: each
    bucket sums the 't' partials and distinct-counts the marker kinds
    for its hosts (spilling past the byte cap — a hub host's doc
    markers grow with the crawl). Streams back as a
    (host, n_docs, n_triples, n_entities) Dataset; nothing
    edge- or doc-sized touches the driver."""
    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    def partial(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_pandas()
        host = doc.str.extract(_HOST_RE, expand=False).str.lower()
        keep = host.notna()
        host, doc = host[keep], doc[keep]
        subj = t["subj"].to_pandas()[keep]
        obj = t["obj"].to_pandas()[keep]
        marks = pd.concat(
            [
                pd.DataFrame({"host": host, "kind": "e", "key": subj}),
                pd.DataFrame({"host": host, "kind": "e", "key": obj}),
                pd.DataFrame({"host": host, "kind": "d", "key": doc}),
            ],
            ignore_index=True,
        ).drop_duplicates()
        counts = host.groupby(host).size()
        df = pd.concat(
            [
                marks.assign(n=np.int64(1)),
                pd.DataFrame(
                    {
                        "host": counts.index,
                        "kind": "t",
                        "key": "",
                        "n": counts.to_numpy(np.int64),
                    }
                ),
            ],
            ignore_index=True,
        )
        return pa.table(
            {
                "host": pa.array(df["host"], type=pa.string()),
                "kind": pa.array(df["kind"], type=pa.string()),
                "key": pa.array(df["key"], type=pa.string()),
                "n": pa.array(df["n"].to_numpy(np.int64)),
            }
        )

    def bucket_profile(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        tri = df[df["kind"] == "t"].groupby("host")["n"].sum()
        dist = (
            df[df["kind"] != "t"]
            .drop_duplicates(["host", "kind", "key"])
            .groupby(["host", "kind"])
            .size()
            .unstack(fill_value=0)
        )
        out = pd.DataFrame(
            {
                "host": tri.index,
                "n_docs": dist["d"].reindex(tri.index, fill_value=0),
                "n_triples": tri.to_numpy(np.int64),
                "n_entities": dist["e"].reindex(tri.index, fill_value=0),
            }
        )
        return pa.table(
            {
                "host": pa.array(out["host"], type=pa.string()),
                "n_docs": pa.array(out["n_docs"].to_numpy(np.int64)),
                "n_triples": pa.array(out["n_triples"].to_numpy(np.int64)),
                "n_entities": pa.array(out["n_entities"].to_numpy(np.int64)),
            }
        )

    empty = pa.table(
        {
            "host": pa.array([], type=pa.string()),
            "n_docs": pa.array([], type=pa.int64()),
            "n_triples": pa.array([], type=pa.int64()),
            "n_entities": pa.array([], type=pa.int64()),
        }
    )
    return exchange_groups(
        triples_ds.map_batches(partial, batch_format="pyarrow"),
        ["host"],
        shuffle_parts(),
        bucket_profile,
        empty,
    )


def host_cocitation(pages_ds):
    """Host co-citation pairs: for every page, the DISTINCT pairs of
    target hosts its outlinks point at — ``(host_a, host_b, n_pages)``
    with ``host_a < host_b`` — the classic related-domain signal (two
    hosts repeatedly cited together by the same pages are topically
    related; co-citation is the bibliometric dual of bibliographic
    coupling and the basis of "similar sites" features).

    Shapes: pair emission is per PAGE inside a stateless
    ``map_batches`` — a page with k distinct target hosts emits
    k·(k−1)/2 pair rows, and crawl out-degree is bounded (tens), so the
    emitted stream is O(pages·k²) worst case but COMBINES per batch to
    (host_a, host_b, partial n) before anything moves; the groupby's
    result is bounded by hosts². A hub host co-cited everywhere adds
    partial rows per block, never per-page rows, so Zipf host skew
    cannot concentrate state (same contract as
    :func:`host_link_graph`)."""
    from itertools import combinations

    from ray.data.aggregate import Sum

    empty = pa.table(
        {
            "host_a": pa.array([], type=pa.string()),
            "host_b": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        htmls = batch["html"].to_pylist()
        pairs: dict[tuple[str, str], int] = {}
        for h in htmls:
            if h is None:
                continue
            hosts = sorted(
                {m.decode("utf-8", "replace").lower() for m in _HREF_RE.findall(h)}
            )
            for pair in combinations(hosts, 2):
                pairs[pair] = pairs.get(pair, 0) + 1
        if not pairs:
            return empty
        keys = list(pairs)
        return pa.table(
            {
                "host_a": pa.array([k[0] for k in keys], type=pa.string()),
                "host_b": pa.array([k[1] for k in keys], type=pa.string()),
                "n": pa.array(np.fromiter(pairs.values(), dtype=np.int64)),
            }
        )

    return (
        pages_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["host_a", "host_b"])
        .aggregate(Sum("n", alias_name="n_pages"))
        .map_batches(
            lambda t: pa.table(
                {
                    "host_a": t["host_a"].cast(pa.string()),
                    "host_b": t["host_b"].cast(pa.string()),
                    "n_pages": t["n_pages"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def host_reciprocity_from_links(links_ds):
    """Link-reciprocity profile of the directed host graph: of all
    undirected host pairs with at least one link (self-loops excluded),
    how many are linked in BOTH directions — a 1-row summary
    ``(n_edges_directed, n_edges_undirected, n_reciprocal,
    reciprocity_ppm)`` (ppm = parts-per-million, integer, so the SQL
    oracle is hash-exact). High reciprocity separates organic link
    neighborhoods from link farms / pure directory sites.

    Shapes: input rows are DISTINCT (src, dst) pairs (the
    :func:`host_link_graph` contract), so direction-counting is exact
    with no distinct pass: each pair canonicalizes to (min, max) per
    batch and a hash exchange co-locates the two possible directed rows
    of each undirected pair; every bucket then collapses to ONE partial
    row (directed / undirected / reciprocal counts) — the driver sums a
    buckets-sized table, never sees an edge."""
    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    def canon(batch: pa.Table) -> pa.Table:
        src = batch["src_host"].to_pandas()
        dst = batch["dst_host"].to_pandas()
        keep = src != dst
        src, dst = src[keep], dst[keep]
        lo = src.where(src < dst, dst)
        hi = dst.where(src < dst, src)
        return pa.table(
            {
                "a": pa.array(lo, type=pa.string()),
                "b": pa.array(hi, type=pa.string()),
            }
        )

    def per_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "n_dir": pa.array([], type=pa.int64()),
                    "n_und": pa.array([], type=pa.int64()),
                    "n_rec": pa.array([], type=pa.int64()),
                }
            )
        g = (
            t.to_pandas()
            .groupby(["a", "b"], as_index=False)
            .size()
        )
        c = g["size"].to_numpy(np.int64)
        return pa.table(
            {
                "n_dir": pa.array([int(c.sum())], type=pa.int64()),
                "n_und": pa.array([len(c)], type=pa.int64()),
                "n_rec": pa.array([int((c == 2).sum())], type=pa.int64()),
            }
        )

    partials = exchange_groups(
        links_ds.map_batches(canon, batch_format="pyarrow"),
        ["a", "b"],
        shuffle_parts(),
        per_bucket,
        pa.table(
            {
                "n_dir": pa.array([], type=pa.int64()),
                "n_und": pa.array([], type=pa.int64()),
                "n_rec": pa.array([], type=pa.int64()),
            }
        ),
    ).to_pandas()  # ≤ num_buckets rows by construction
    n_dir = int(partials["n_dir"].sum())
    n_und = int(partials["n_und"].sum())
    n_rec = int(partials["n_rec"].sum())
    ppm = (n_rec * 1_000_000) // n_und if n_und else 0
    return pd.DataFrame(
        {
            "n_edges_directed": [n_dir],
            "n_edges_undirected": [n_und],
            "n_reciprocal": [n_rec],
            "reciprocity_ppm": [ppm],
        }
    ).astype("int64")


def host_reciprocity(pages_ds):
    """Reciprocity profile parsed straight from the raw page html:
    :func:`host_link_graph` (distributed anchor extraction) feeding
    :func:`host_reciprocity_from_links`."""
    return host_reciprocity_from_links(host_link_graph(pages_ds))


def host_hits_from_links(links_ds, iterations: int = 2, scale: int = 10**12):
    """Weighted HITS (hubs & authorities, Kleinberg) over a link-graph
    Dataset (src_host, dst_host, n_links), in INTEGER arithmetic so the
    SQL oracle is hash-exact. Per iteration, with w = the anchor count
    of a directed host pair:

        auth_raw(v) = Σ_{u→v} hub(u)  · w(u,v);  auth = auth_raw·scale // Σ auth_raw
        hub_raw(u)  = Σ_{u→v} auth(v) · w(u,v);  hub  = hub_raw ·scale // Σ hub_raw

    starting from hub ≡ scale. Sum-normalization (instead of the
    textbook L2 norm) keeps every step a deterministic integer — sums
    commute, so per-batch partial aggregation is exact, and floor
    division matches DuckDB's ``//`` on HUGEINT. Hosts receiving (resp.
    casting) no links score 0 by contract on both sides.

    Shapes: identical to :func:`host_pagerank_from_links` — the edge
    Dataset int-codes itself once per run against salted 64-bit host
    hashes (collision-checked on the driver, nothing string-keyed ever
    broadcast), then each iteration is two streaming edge passes (an
    authority pull keyed on dst and a hub pull keyed on src), each a
    per-batch sort+reduceat combiner into a host-keyed hash exchange;
    the hub/authority state is two flat int64 numpy vectors (zero-copy
    out of the object store). Overflow is loud, not silent: the
    per-edge multiply falls back to exact Python ints when
    ``max_score × max_w × batch_rows`` could exceed int64, and
    normalization runs in unbounded Python ints; scores after
    normalization are ≤ scale by construction, so the returned vectors
    always fit int64. Returns (host, hub_scaled, auth_scaled)."""
    import ray

    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    links = links_ds.materialize()
    if links.count() <= _web_driver_pair_cap():
        return _driver_hits(links.to_pandas(), iterations, scale)

    hosts_df = host_degrees_from_links(links).to_pandas().sort_values(
        "host", ignore_index=True
    )
    hosts = hosts_df["host"].tolist()
    n_hosts = len(hosts)
    if n_hosts == 0:
        return pd.DataFrame(
            {"host": [], "hub_scaled": [], "auth_scaled": []}
        ).astype({"hub_scaled": "int64", "auth_scaled": "int64"})

    salt = 0
    for salt in range(16):
        host_hashes = pd.util.hash_array(
            np.asarray(hosts, dtype=object), hash_key=f"{salt:016d}"
        )
        if len(np.unique(host_hashes)) == n_hosts:
            break
    else:
        raise RuntimeError("host_hits: host hashing collided at all 16 salts")
    order = np.argsort(host_hashes)
    sorted_hashes = host_hashes[order]
    hash_ref = ray.put(sorted_hashes)

    def encode(t: pa.Table, _salt=salt) -> pa.Table:
        sh = ray.get(hash_ref)

        def idx_of(col) -> np.ndarray:
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            vals = col.fill_null("").to_pandas().to_numpy()
            h = pd.util.hash_array(vals, hash_key=f"{_salt:016d}")
            return np.searchsorted(sh, h).astype(np.int64)

        return pa.table(
            {
                "s": pa.array(idx_of(t["src_host"])),
                "d": pa.array(idx_of(t["dst_host"])),
                "n": t["n_links"].cast(pa.int64()),
            }
        )

    int_edges = links.map_batches(encode, batch_format="pyarrow").materialize()
    int64_max = 2**63 - 1

    def pull(vec: np.ndarray, from_col: str, to_col: str) -> np.ndarray:
        """One streaming edge pass: raw(to) = Σ vec[from]·w, returned as
        a host-aligned int64 vector (zeros where nothing arrived)."""
        vec_ref = ray.put(vec)

        def partial(t: pa.Table) -> pa.Table:
            v = ray.get(vec_ref)  # zero-copy int64 vector
            f = t[from_col].to_numpy()
            to = t[to_col].to_numpy()
            n = t["n"].to_numpy()
            if len(f) == 0:
                return pa.table(
                    {
                        "k": pa.array([], type=pa.int64()),
                        "c": pa.array([], type=pa.int64()),
                    }
                )
            v_f = v[f]
            if int(v_f.max() or 0) * int(n.max() or 0) * len(f) > int64_max:
                # exact big-int path — a silent int64 wrap would diverge
                # from the oracle's HUGEINT sums without error
                contrib = (v_f.astype(object) * n.astype(object))
                order_ = np.argsort(to, kind="stable")
                ts, cs = to[order_], contrib[order_]
                starts = np.flatnonzero(
                    np.concatenate(([True], ts[1:] != ts[:-1]))
                )
                sums = [
                    int(sum(cs[a:b]))
                    for a, b in zip(starts, list(starts[1:]) + [len(cs)])
                ]
                if any(abs(x) > int64_max for x in sums):
                    raise OverflowError(
                        "host_hits per-batch partial exceeds int64 — "
                        "lower `scale`"
                    )
                return pa.table(
                    {
                        "k": pa.array(ts[starts]),
                        "c": pa.array(np.array(sums, dtype=np.int64)),
                    }
                )
            contrib = v_f * n
            order_ = np.argsort(to, kind="stable")
            ts, cs = to[order_], contrib[order_]
            starts = np.flatnonzero(np.concatenate(([True], ts[1:] != ts[:-1])))
            return pa.table(
                {
                    "k": pa.array(ts[starts]),
                    "c": pa.array(np.add.reduceat(cs, starts)),
                }
            )

        def bucket_sum(t: pa.Table) -> pa.Table:
            g = t.group_by("k").aggregate([("c", "sum")])
            return pa.table(
                {
                    "k": g["k"].cast(pa.int64()),
                    "c": g["c_sum"].cast(pa.int64()),
                }
            )

        inflow = exchange_groups(
            int_edges.map_batches(partial, batch_format="pyarrow"),
            ["k"],
            shuffle_parts(),
            bucket_sum,
            pa.table(
                {
                    "k": pa.array([], type=pa.int64()),
                    "c": pa.array([], type=pa.int64()),
                }
            ),
        ).to_pandas()
        raw = np.zeros(n_hosts, dtype=np.int64)
        raw[inflow["k"].to_numpy(np.int64)] = inflow["c"].to_numpy(np.int64)
        return raw

    def normalize(raw: np.ndarray) -> np.ndarray:
        total = int(sum(int(v) for v in raw))
        if total == 0:
            return np.zeros(n_hosts, dtype=np.int64)
        # exact big-int multiply/divide; results ≤ scale fit int64
        return ((raw.astype(object) * scale) // total).astype(np.int64)

    hub = np.full(n_hosts, scale, dtype=np.int64)
    auth = np.zeros(n_hosts, dtype=np.int64)
    for _ in range(iterations):
        auth = normalize(pull(hub, "s", "d"))
        hub = normalize(pull(auth, "d", "s"))

    inv = np.empty(n_hosts, dtype=np.int64)
    inv[order] = np.arange(n_hosts)
    return pd.DataFrame(
        {
            "host": hosts,
            "hub_scaled": hub[inv],
            "auth_scaled": auth[inv],
        }
    ).astype({"hub_scaled": "int64", "auth_scaled": "int64"})


def host_hits(pages_ds, iterations: int = 2, scale: int = 10**12):
    """HITS hubs & authorities parsed straight from the raw page html:
    :func:`host_link_graph` feeding :func:`host_hits_from_links`."""
    return host_hits_from_links(
        host_link_graph(pages_ds), iterations=iterations, scale=scale
    )


def crawl_delta(old_pages_ds, new_pages_ds):
    """Two-snapshot crawl delta: compare an OLD and a NEW crawl of the
    same url space by content digest and classify every url that
    differs — ``(url, status)`` with status ∈ {'new', 'gone',
    'changed'} (urls whose bytes are identical in both snapshots are
    dropped; they are the overwhelming majority of a real re-crawl and
    carrying them would make the result page-scale × 2). This is the
    incremental-crawl primitive: 'new' urls enter the pipeline, 'gone'
    urls tombstone their triples, 'changed' urls re-annotate.

    Shapes: both snapshots stream through a stateless digest pass
    (md5 of the raw html bytes — chosen because DuckDB's ``md5`` over
    ``decode(html)`` reproduces it, so the SQL oracle is hash-exact)
    that emits (url, side, digest) rows; ONE url-keyed hash exchange
    co-locates each url's at-most-two rows, and every bucket resolves
    statuses vectorized (pandas pivot on the side marker). No
    broadcast, no global sort; both sides are page-scale and only
    bucket-sized state ever materializes (spilling past the byte cap).
    The exchange is PINNED to the actor-scatter form
    (:func:`_page_scale_rows`): unlike the combiner-bounded exchanges
    the adaptive crossover was tuned on, this one always moves one row
    per page per side — never small — so the scatter's
    no-global-sort row cost wins at any real scale (measured 9.6 s vs
    22-24 s for the sort form at 1M exchanged rows) and the feed
    stays fully streaming (no materialize-to-count pass).
    A url captured twice WITHIN one snapshot keeps the lexicographically
    smallest digest on both sides — deterministic, and identical in the
    oracle's ``min(digest)``."""
    import hashlib

    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    def digests(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            urls = batch["url"].to_pylist()
            htmls = batch["html"].to_pylist()
            digs = [
                hashlib.md5(h if h is not None else b"").hexdigest()
                for h in htmls
            ]
            return pa.table(
                {
                    "url": pa.array(urls, type=pa.string()),
                    "side": pa.array([side] * len(urls), type=pa.int64()),
                    "digest": pa.array(digs, type=pa.string()),
                }
            )

        return fn

    union = old_pages_ds.map_batches(
        digests(0), batch_format="pyarrow"
    ).union(new_pages_ds.map_batches(digests(1), batch_format="pyarrow"))

    empty = pa.table(
        {
            "url": pa.array([], type=pa.string()),
            "status": pa.array([], type=pa.string()),
        }
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        df = t.to_pandas()
        # within-snapshot repeat captures: keep the min digest (matches
        # the oracle's min(digest))
        g = df.groupby(["url", "side"], as_index=False)["digest"].min()
        w = g.pivot(index="url", columns="side", values="digest")
        old_d = w[0] if 0 in w.columns else pd.Series(index=w.index, dtype=object)
        new_d = w[1] if 1 in w.columns else pd.Series(index=w.index, dtype=object)
        status = pd.Series("unchanged", index=w.index, dtype=object)
        status[old_d.isna()] = "new"
        status[new_d.isna()] = "gone"
        both = old_d.notna() & new_d.notna()
        status[both & (old_d != new_d)] = "changed"
        out = status[status != "unchanged"]
        return pa.table(
            {
                "url": pa.array(out.index, type=pa.string()),
                "status": pa.array(out.to_numpy(object), type=pa.string()),
            }
        )

    return exchange_groups(
        union,
        ["url"],
        shuffle_parts(),
        per_bucket,
        empty,
        est_rows=_page_scale_rows(),
    )


def _page_scale_rows() -> int:
    """Row-count hint that pins an exchange to the actor-scatter form:
    one past the sort/scatter crossover. Used by the ops whose
    exchanged volume is page-scale BY CONSTRUCTION (crawl delta,
    frontier, triple recency — one row per page / per triple, no
    combiner bounds it), where the scatter's no-global-sort row cost
    always wins at real scale and passing the hint keeps the feed
    fully streaming instead of materializing to count."""
    from kazu_ray.ops.exchange import exchange_crossover_rows

    return exchange_crossover_rows() + 1


def host_boilerplate(text_ds, min_pages: int = 3):
    """Per-host boilerplate detection over extracted page text — the
    classic web-corpus cleaning signal: a sentence that appears on at
    least HALF of a host's pages (hosts with ≥ ``min_pages`` pages) is
    template chrome (nav text, footers, cookie banners), not content,
    and should be stripped before training-data use. Input is the
    (url, text) shape of the extracted-text artifact; output is
    ``(host, sentence, n_pages)`` — one row per boilerplate sentence
    with the number of the host's pages carrying it.

    The sentence unit is the deterministic split on '. ' (both sides
    of the oracle apply the identical rule — DuckDB
    ``string_split(text, '. ')``), counted ONCE per page however often
    it repeats within the page. Input contract: ONE row per url (the
    extracted-text artifact's shape — each page row is whole within
    one batch, so the per-batch distinct-per-page is globally exact);
    a multi-capture url log must be deduplicated first
    (:func:`url_dedup`), or a capture split across batches would count
    its sentences once per batch.

    Shapes: one streaming pass emits per-batch-combined marker rows of
    two kinds — ``kind='s'`` (host, sentence, pages-carrying partial;
    distinct per page first, then per-batch summed) and ``kind='p'``
    (host, page-count partial) — and ONE host-keyed hash exchange
    finishes both: each bucket sums page counts and sentence carriers
    for its hosts and applies the ≥50% + ``min_pages`` filter
    vectorized. A hub host's rows are bounded by its distinct sentence
    vocabulary per block (never per-page rows), and the exchange
    spills past the byte cap, so Zipf host skew cannot concentrate
    state."""
    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    def partial(t: pa.Table) -> pa.Table:
        df = pa.table({"url": t["url"], "text": t["text"]}).to_pandas()
        df["host"] = df["url"].str.extract(_HOST_RE, expand=False).str.lower()
        df = df.dropna(subset=["host", "text"])
        pages = df.groupby("host", as_index=False).size()
        sent = df.assign(sentence=df["text"].str.split(". ", regex=False))
        sent = sent.explode("sentence").dropna(subset=["sentence"])
        sent = sent[sent["sentence"] != ""]
        # distinct per PAGE, then count carriers per batch
        carriers = (
            sent.drop_duplicates(["host", "url", "sentence"])
            .groupby(["host", "sentence"], as_index=False)
            .size()
        )
        out = pd.concat(
            [
                pd.DataFrame(
                    {
                        "host": carriers["host"],
                        "kind": "s",
                        "key": carriers["sentence"],
                        "n": carriers["size"].to_numpy(np.int64),
                    }
                ),
                pd.DataFrame(
                    {
                        "host": pages["host"],
                        "kind": "p",
                        "key": "",
                        "n": pages["size"].to_numpy(np.int64),
                    }
                ),
            ],
            ignore_index=True,
        )
        return pa.table(
            {
                "host": pa.array(out["host"], type=pa.string()),
                "kind": pa.array(out["kind"], type=pa.string()),
                "key": pa.array(out["key"], type=pa.string()),
                "n": pa.array(out["n"].to_numpy(np.int64)),
            }
        )

    def per_bucket(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        pages = df[df["kind"] == "p"].groupby("host")["n"].sum()
        sents = (
            df[df["kind"] == "s"]
            .groupby(["host", "key"], as_index=False)["n"]
            .sum()
        )
        sents["host_pages"] = sents["host"].map(pages).fillna(0).astype("int64")
        keep = (sents["host_pages"] >= min_pages) & (
            2 * sents["n"] >= sents["host_pages"]
        )
        out = sents[keep]
        return pa.table(
            {
                "host": pa.array(out["host"], type=pa.string()),
                "sentence": pa.array(out["key"], type=pa.string()),
                "n_pages": pa.array(out["n"].to_numpy(np.int64)),
            }
        )

    return exchange_groups(
        text_ds.map_batches(partial, batch_format="pyarrow"),
        ["host"],
        shuffle_parts(),
        per_bucket,
        pa.table(
            {
                "host": pa.array([], type=pa.string()),
                "sentence": pa.array([], type=pa.string()),
                "n_pages": pa.array([], type=pa.int64()),
            }
        ),
    )


def strip_boilerplate(text_ds, min_pages: int = 3):
    """Boilerplate REMOVAL — the consumer of :func:`host_boilerplate`'s
    detection, completing the detect→strip chain the way
    ``dedup_survivors`` completes LSH→verify→cluster: every page comes
    back as ``(url, clean_text)`` with its host's boilerplate sentences
    deleted (split on '. ', filter, rejoin with '. ' — the identical
    deterministic rule on both sides, so the oracle's
    ``array_to_string(list_filter(...))`` reproduces the string
    byte-for-byte). Pages whose host has no boilerplate pass through
    unchanged; null-text rows are dropped by contract on both sides.

    Shapes: two passes. Pass 1 is the :func:`host_boilerplate`
    exchange; its result is BOUNDED by hosts × the few above-50%
    sentences per host, so it broadcasts as one ``ray.put`` dict
    (host → frozenset) — the same broadcast-threshold pattern as the
    tf-idf idf pass, and the same hosts-sized broadcast concern as the
    PageRank rank vector (acceptable, and strictly better than keying
    the page TEXT stream by host, where one hub host's pages would
    pile into a single exchange bucket). Pass 2 is a stateless
    ``map_batches`` strip — page-scale, no shuffle."""
    import ray

    bp = host_boilerplate(text_ds, min_pages=min_pages).to_pandas()
    bp_map: dict[str, frozenset] = {
        h: frozenset(g["sentence"]) for h, g in bp.groupby("host")
    }
    bp_ref = ray.put(bp_map)

    def strip(t: pa.Table) -> pa.Table:
        m = ray.get(bp_ref)
        df = pa.table({"url": t["url"], "text": t["text"]}).to_pandas()
        df = df.dropna(subset=["text"])
        hosts = df["url"].str.extract(_HOST_RE, expand=False).str.lower()
        out = []
        for text, host in zip(df["text"], hosts):
            bad = m.get(host)
            if not bad:
                out.append(text)
                continue
            parts = text.split(". ")
            out.append(". ".join(p for p in parts if p == "" or p not in bad))
        return pa.table(
            {
                "url": pa.array(df["url"], type=pa.string()),
                "clean_text": pa.array(out, type=pa.string()),
            }
        )

    return text_ds.map_batches(strip, batch_format="pyarrow")


def _jaccard_max_srcs_per_dst() -> int:
    """Hub cap for the mirror-detection inverted index, in source hosts
    per target host: a target linked by s sources emits s·(s−1)/2
    intersection pairs — all DISTINCT, so no combiner can shrink them —
    and an everybody-links-to-it hub (s ~ 10⁶ at crawl scale) would
    emit ~10¹² pair rows from one bucket. Targets past the cap are
    SKIPPED by contract — a near-universal target carries ~zero Jaccard
    information (it inflates every pair's intersection and union
    equally). The default of 2000 bounds one at-cap target to ~2M pair
    rows (~160 MB of string-keyed partials inside a bucket actor —
    sized to a worker heap; 10⁴ would be ~5×10⁷ rows / several GB).
    Far above anything the test corpora produce, so the SQL oracle
    (which computes the uncapped exact answer) only diverges at scales
    where the cap is the documented approximation. Same loud-drop
    policy as the SimHash hot-bucket cap."""
    import os

    return int(os.environ.get("KAZU_JACCARD_MAX_SRCS_PER_DST", "2000"))


def host_outlink_jaccard(links_ds, threshold_ppm: int = 500_000):
    """Mirror-host detection: pairs of source hosts whose DISTINCT
    outlink-target sets overlap with Jaccard ≥ ``threshold_ppm`` —
    ``(host_a, host_b, n_common, jaccard_ppm)`` with host_a < host_b,
    jaccard in integer parts-per-million (hash-exact vs the SQL
    oracle's ``(i*1e6)//(sa+sb−i)``). Two hosts serving the same site
    under different names (mirrors, parked duplicates, CDN aliases)
    have near-identical outlink profiles; this is the host-level
    analogue of document near-dup.

    Shapes — THREE hash exchanges, nothing host- or edge-sized ever
    broadcast or driver-collected:

    1. src-keyed: co-locate each source host's distinct target rows,
       count its set size k, and re-emit (dst, src, k) rows — sizes
       RIDE ALONG the edges instead of broadcasting a host-sized
       vector (the pagerank rank-vector broadcast is a documented
       concern at 10⁸ hosts; this op avoids it entirely).
    2. dst-keyed inverted index: each target's source list emits
       intersection-pair partials (a, b, ka, kb, 1), combined per
       bucket before anything moves; targets past
       :func:`_jaccard_max_srcs_per_dst` are skipped by contract.
    3. pair-keyed: sum intersections, compute the integer Jaccard,
       filter to the threshold. Streams back as a Dataset.
    """
    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    def dedup_pairs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": t["src_host"].cast(pa.string()),
                "dst": t["dst_host"].cast(pa.string()),
            }
        )

    def src_bucket(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates()
        k = df.groupby("src")["dst"].transform("size").to_numpy(np.int64)
        return pa.table(
            {
                "dst": pa.array(df["dst"], type=pa.string()),
                "src": pa.array(df["src"], type=pa.string()),
                "k": pa.array(k),
            }
        )

    sized = exchange_groups(
        links_ds.map_batches(dedup_pairs, batch_format="pyarrow"),
        ["src"],
        shuffle_parts(),
        src_bucket,
        pa.table(
            {
                "dst": pa.array([], type=pa.string()),
                "src": pa.array([], type=pa.string()),
                "k": pa.array([], type=pa.int64()),
            }
        ),
    )

    pair_empty = pa.table(
        {
            "a": pa.array([], type=pa.string()),
            "b": pa.array([], type=pa.string()),
            "ka": pa.array([], type=pa.int64()),
            "kb": pa.array([], type=pa.int64()),
            "n": pa.array([], type=pa.int64()),
        }
    )

    cap = _jaccard_max_srcs_per_dst()  # driver-read, closed over

    def dst_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_empty
        df = t.to_pandas().sort_values(["dst", "src"])
        out_a, out_b, out_ka, out_kb = [], [], [], []
        for _, g in df.groupby("dst", sort=False):
            if len(g) < 2 or len(g) > cap:
                continue
            srcs = g["src"].to_numpy(object)
            ks = g["k"].to_numpy(np.int64)
            iu, ju = np.triu_indices(len(srcs), k=1)
            out_a.append(srcs[iu])
            out_b.append(srcs[ju])
            out_ka.append(ks[iu])
            out_kb.append(ks[ju])
        if not out_a:
            return pair_empty
        pairs = pd.DataFrame(
            {
                "a": np.concatenate(out_a),
                "b": np.concatenate(out_b),
                "ka": np.concatenate(out_ka),
                "kb": np.concatenate(out_kb),
            }
        )
        g = pairs.groupby(["a", "b", "ka", "kb"], as_index=False).size()
        return pa.table(
            {
                "a": pa.array(g["a"], type=pa.string()),
                "b": pa.array(g["b"], type=pa.string()),
                "ka": pa.array(g["ka"].to_numpy(np.int64)),
                "kb": pa.array(g["kb"].to_numpy(np.int64)),
                "n": pa.array(g["size"].to_numpy(np.int64)),
            }
        )

    pair_partials = exchange_groups(
        sized, ["dst"], shuffle_parts(), dst_bucket, pair_empty
    )

    def pair_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _JACCARD_EMPTY
        g = (
            t.to_pandas()
            .groupby(["a", "b", "ka", "kb"], as_index=False)["n"]
            .sum()
        )
        inter = g["n"].to_numpy(np.int64)
        union = g["ka"].to_numpy(np.int64) + g["kb"].to_numpy(np.int64) - inter
        ppm = (inter * 1_000_000) // union
        keep = ppm >= threshold_ppm
        return pa.table(
            {
                "host_a": pa.array(g["a"][keep], type=pa.string()),
                "host_b": pa.array(g["b"][keep], type=pa.string()),
                "n_common": pa.array(inter[keep]),
                "jaccard_ppm": pa.array(ppm[keep]),
            }
        )

    return exchange_groups(
        pair_partials, ["a", "b"], shuffle_parts(), pair_bucket, _JACCARD_EMPTY
    )


_JACCARD_EMPTY = pa.table(
    {
        "host_a": pa.array([], type=pa.string()),
        "host_b": pa.array([], type=pa.string()),
        "n_common": pa.array([], type=pa.int64()),
        "jaccard_ppm": pa.array([], type=pa.int64()),
    }
)


def triple_recency(triples_ds, pages_ds):
    """Triple freshness over the store contract ``doc_id == page url``:
    per distinct (subj, pred, obj), the first and last capture
    timestamp (µs, from the pages table's ``warc_ts``) and the number
    of contributing page rows — the signal an INCREMENTAL KG build
    ranks re-verification by (a triple last seen two years ago on one
    page is staler than one re-asserted by yesterday's crawl).

    Shapes: a page-scale × triple-scale equi-join expressed as ONE
    url-keyed marker exchange (page rows carry the timestamp, triple
    rows carry the key; each bucket joins locally and COMBINES to
    per-bucket (s, p, o, min, max, n) partials before anything else
    moves) feeding ONE triple-keyed exchange that finishes the
    min/max/sum. Neither side is ever broadcast or driver-collected;
    hot urls are bounded per bucket and the exchange spills past the
    byte cap."""
    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    def page_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "url": t["url"].cast(pa.string()),
                "s": pa.array([""] * n, type=pa.string()),
                "p": pa.array([""] * n, type=pa.string()),
                "o": pa.array([""] * n, type=pa.string()),
                "ts": t["warc_ts"].cast(pa.int64()),
                "kind": pa.array([0] * n, type=pa.int64()),
            }
        )

    def triple_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "url": t["doc_id"].cast(pa.string()),
                "s": t["subj"].cast(pa.string()),
                "p": t["pred"].cast(pa.string()),
                "o": t["obj"].cast(pa.string()),
                "ts": pa.array([0] * n, type=pa.int64()),
                "kind": pa.array([1] * n, type=pa.int64()),
            }
        )

    union = pages_ds.map_batches(page_rows, batch_format="pyarrow").union(
        triples_ds.map_batches(triple_rows, batch_format="pyarrow")
    )

    partial_empty = pa.table(
        {
            "s": pa.array([], type=pa.string()),
            "p": pa.array([], type=pa.string()),
            "o": pa.array([], type=pa.string()),
            "lo": pa.array([], type=pa.int64()),
            "hi": pa.array([], type=pa.int64()),
            "n": pa.array([], type=pa.int64()),
        }
    )

    def join_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return partial_empty
        df = t.to_pandas()
        pages = df[df["kind"] == 0]
        # a url captured more than once joins each capture (count(*)
        # semantics, identical in the oracle's plain JOIN)
        trip = df[df["kind"] == 1].merge(
            pages[["url", "ts"]], on="url", how="inner", suffixes=("", "_pg")
        )
        if trip.empty:
            return partial_empty
        g = trip.groupby(["s", "p", "o"], as_index=False).agg(
            lo=("ts_pg", "min"), hi=("ts_pg", "max"), n=("ts_pg", "size")
        )
        return pa.table(
            {
                "s": pa.array(g["s"], type=pa.string()),
                "p": pa.array(g["p"], type=pa.string()),
                "o": pa.array(g["o"], type=pa.string()),
                "lo": pa.array(g["lo"].to_numpy(np.int64)),
                "hi": pa.array(g["hi"].to_numpy(np.int64)),
                "n": pa.array(g["n"].to_numpy(np.int64)),
            }
        )

    # url-keyed join exchange pinned to the scatter form: one row per
    # page + one per triple by construction (_page_scale_rows)
    partials = exchange_groups(
        union,
        ["url"],
        shuffle_parts(),
        join_bucket,
        partial_empty,
        est_rows=_page_scale_rows(),
    )

    out_empty = pa.table(
        {
            "subj": pa.array([], type=pa.string()),
            "pred": pa.array([], type=pa.string()),
            "obj": pa.array([], type=pa.string()),
            "first_ts_us": pa.array([], type=pa.int64()),
            "last_ts_us": pa.array([], type=pa.int64()),
            "n_pages": pa.array([], type=pa.int64()),
        }
    )

    def final_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_empty
        g = t.to_pandas().groupby(["s", "p", "o"], as_index=False).agg(
            lo=("lo", "min"), hi=("hi", "max"), n=("n", "sum")
        )
        return pa.table(
            {
                "subj": pa.array(g["s"], type=pa.string()),
                "pred": pa.array(g["p"], type=pa.string()),
                "obj": pa.array(g["o"], type=pa.string()),
                "first_ts_us": pa.array(g["lo"].to_numpy(np.int64)),
                "last_ts_us": pa.array(g["hi"].to_numpy(np.int64)),
                "n_pages": pa.array(g["n"].to_numpy(np.int64)),
            }
        )

    return exchange_groups(
        partials, ["s", "p", "o"], shuffle_parts(), final_bucket, out_empty
    )


def host_distinct_outlinks_kmv(pages_ds, k: int = 12):
    """Approximate distinct OUTLINK-URL count per host via a KMV
    (k-minimum-values) sketch — the bounded-memory answer to "how many
    distinct URLs does each host link to" when the exact distinct set
    (~10⁹ URLs per hub host at Common-Crawl scale) cannot be shuffled:
    the per-host state is k 64-bit values, merged losslessly by
    union+truncate, and the estimator is the textbook
    (k-1)·2⁶⁴ / h_(k) (Bar-Yossef et al., RANDOM'02), exact below k.

    DETERMINISTIC end to end: the hash is the SECOND 8 bytes
    (little-endian) of md5(url) — chosen because DuckDB's
    ``md5_number_lower`` computes the identical value, so the SQL
    oracle reproduces the estimate BIT-FOR-BIT, not merely within an
    error bound. (At production scale the md5 would be swapped for a
    vectorized 64-bit hash; the sketch algebra is hash-agnostic.)

    Shapes: stateless anchor extraction combines per batch to at most
    hosts×k sketch rows before anything moves; the host-keyed hash
    exchange then unions the partial sketches per bucket. Nothing
    URL-sized is ever shuffled and the driver only sees the hosts-sized
    result. Merge correctness: if a host's true distinct count < k every
    batch ships ALL its values so the union is the full set (exact
    path); otherwise the union contains the true k smallest, and
    truncation to k keeps exactly them."""
    import hashlib

    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    empty = pa.table(
        {
            "host": pa.array([], type=pa.string()),
            "hv": pa.array([], type=pa.uint64()),
        }
    )

    def partial(t: pa.Table) -> pa.Table:
        src = t["url"].to_pandas().str.extract(_HOST_RE, expand=False).str.lower()
        htmls = t["html"].to_pylist()
        hosts, hvs = [], []
        for s, h in zip(src, htmls):
            if s is None or h is None:
                continue
            for m in _HREF_FULL_RE.findall(h):
                hosts.append(s)
                hvs.append(
                    int.from_bytes(hashlib.md5(m).digest()[8:], "little")
                )
        if not hosts:
            return empty
        df = pd.DataFrame(
            {"host": hosts, "hv": np.asarray(hvs, dtype=np.uint64)}
        ).drop_duplicates()
        df = df.sort_values(["host", "hv"]).groupby("host").head(k)
        return pa.table(
            {
                "host": pa.array(df["host"], type=pa.string()),
                "hv": pa.array(df["hv"].to_numpy(np.uint64), type=pa.uint64()),
            }
        )

    def per_bucket(t: pa.Table) -> pa.Table:
        df = (
            t.to_pandas()
            .drop_duplicates()
            .sort_values(["host", "hv"])
            .groupby("host")
            .head(k)
        )
        out_h, out_e = [], []
        for host, g in df.groupby("host", sort=True):
            vals = g["hv"].to_numpy(np.uint64)
            if len(vals) < k:
                est = len(vals)
            else:
                est = (k - 1) * 2**64 // int(vals[k - 1])
            out_h.append(host)
            out_e.append(est)
        return pa.table(
            {
                "host": pa.array(out_h, type=pa.string()),
                "est_distinct_urls": pa.array(out_e, type=pa.int64()),
            }
        )

    return exchange_groups(
        pages_ds.map_batches(partial, batch_format="pyarrow"),
        ["host"],
        shuffle_parts(),
        per_bucket,
        pa.table(
            {
                "host": pa.array([], type=pa.string()),
                "est_distinct_urls": pa.array([], type=pa.int64()),
            }
        ),
    )


# --- bow-tie decomposition (Broder et al., "Graph structure in the
# web", WWW 2000) ----------------------------------------------------------


def _driver_bowtie(links_df: pd.DataFrame, max_hops: int) -> pd.DataFrame:
    """Exact bounded-hop bow-tie classification on a driver-sized link
    table — the reference math the distributed form must equal (and the
    sub-cap fast path). Pivot = host with the largest distinct-neighbor
    degree (out_hosts + in_hosts), tie → lexmin — a deterministic
    stand-in for "a node of the giant SCC" that the SQL oracle can
    reproduce."""
    fwd: dict = {}
    bwd: dict = {}
    for s, d in zip(links_df["src_host"], links_df["dst_host"]):
        fwd.setdefault(s, set()).add(d)
        bwd.setdefault(d, set()).add(s)
    hosts = sorted(set(fwd) | set(bwd))
    pivot = min(hosts, key=lambda h: (-(len(fwd.get(h, ())) + len(bwd.get(h, ()))), h))

    def reach(adj: dict, start: str, hops: int) -> set:
        seen = {start}
        frontier = {start}
        for _ in range(hops):
            nxt = set()
            for u in frontier:
                nxt |= adj.get(u, set()) - seen
            if not nxt:
                break
            seen |= nxt
            frontier = nxt
        return seen

    f = reach(fwd, pivot, max_hops)
    b = reach(bwd, pivot, max_hops)
    cat = [
        "core" if (h in f and h in b) else "in" if h in b else "out" if h in f else "other"
        for h in hosts
    ]
    return pd.DataFrame({"host": hosts, "category": cat})


def host_bowtie_from_links(links_ds, max_hops: int = 4):
    """Bounded-hop bow-tie decomposition of the directed host link
    graph — the classic Common-Crawl / webgraph structure analysis
    (Broder et al. 2000): pick a deterministic pivot host (max
    out_hosts + in_hosts, tie → lexmin), run a DIRECTED forward BFS
    (src→dst) and a directed backward BFS (dst→src), both ≤
    ``max_hops``, and classify every host::

        core  — reachable from the pivot AND reaches the pivot
        in    — reaches the pivot only   (upstream / IN component)
        out   — reachable from it only   (downstream / OUT component)
        other — neither within the hop bound (tendrils / disconnected)

    The hop bound is BY CONTRACT part of the definition (it is what
    makes the SQL oracle's unrolled expansion finite); at ``max_hops``
    ≥ the graph diameter it equals the unbounded decomposition.

    Shapes: size-dispatched like the other iterative host-graph ops
    (:func:`_web_driver_pair_cap`). The distributed leg mirrors
    :func:`host_pagerank_from_links`: the host vocabulary comes from
    the distributed degree marginals, hosts are salted-hash int-coded
    (collision-checked), the edge Dataset int-codes itself once and is
    scanned once per hop per direction, and the per-hop state is ONE
    host-sized int8 reach vector broadcast zero-copy. Per-batch
    partials emit newly-reached codes pre-uniqued, a code-keyed hash
    exchange dedups them (host-bounded), and hops stop early when a
    frontier is empty. The edge set never reaches the driver."""
    import ray

    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    links = links_ds.materialize()
    if links.count() <= _web_driver_pair_cap():
        return _driver_bowtie(links.to_pandas(), max_hops)

    hosts_df = host_degrees_from_links(links).to_pandas().sort_values(
        "host", ignore_index=True
    )
    hosts = hosts_df["host"].tolist()
    n_hosts = len(hosts)
    dg = (
        hosts_df["out_hosts"].to_numpy(np.int64)
        + hosts_df["in_hosts"].to_numpy(np.int64)
    )
    # pivot: max degree, tie lexmin (hosts_df is host-sorted, so the
    # first argmax IS the lexmin of the maxima)
    pivot = hosts[int(np.argmax(dg))]

    # salted-hash int coding, collision-checked (the host_pagerank form)
    salt = 0
    for salt in range(16):
        host_hashes = pd.util.hash_array(
            np.asarray(hosts, dtype=object), hash_key=f"{salt:016d}"
        )
        if len(np.unique(host_hashes)) == n_hosts:
            break
    else:
        raise RuntimeError("host_bowtie: host hashing collided at all 16 salts")
    sorted_hashes = np.sort(host_hashes)
    hash_ref = ray.put(sorted_hashes)

    def encode(t: pa.Table, _salt=salt) -> pa.Table:
        sh = ray.get(hash_ref)

        def idx_of(col) -> np.ndarray:
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            vals = col.fill_null("").to_pandas().to_numpy()
            h = pd.util.hash_array(vals, hash_key=f"{_salt:016d}")
            return np.searchsorted(sh, h).astype(np.int64)

        return pa.table(
            {
                "s": pa.array(idx_of(t["src_host"])),
                "d": pa.array(idx_of(t["dst_host"])),
            }
        )

    int_edges = links.map_batches(encode, batch_format="pyarrow").materialize()
    pivot_idx = int(
        np.searchsorted(
            sorted_hashes,
            pd.util.hash_array(
                np.asarray([pivot], dtype=object), hash_key=f"{salt:016d}"
            )[0],
        )
    )
    empty = pa.table({"c": pa.array([], type=pa.int64())})

    def bucket_distinct(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"c": pc.unique(t["c"].combine_chunks()).cast(pa.int64())})

    def directed_reach(reverse: bool) -> np.ndarray:
        reach = np.zeros(n_hosts, dtype=np.int8)
        reach[pivot_idx] = 1
        for _ in range(max_hops):
            reach_ref = ray.put(reach)

            def partial(t: pa.Table, _ref=reach_ref, _rev=reverse) -> pa.Table:
                r = ray.get(_ref)  # zero-copy int8 vector
                s = t["s"].to_numpy()
                d = t["d"].to_numpy()
                frm, to = (d, s) if _rev else (s, d)
                hit = (r[frm] == 1) & (r[to] == 0)
                if not hit.any():
                    return empty
                return pa.table(
                    {"c": pa.array(np.unique(to[hit]).astype(np.int64))}
                )

            newly = exchange_groups(
                int_edges.map_batches(partial, batch_format="pyarrow"),
                ["c"],
                shuffle_parts(),
                bucket_distinct,
                empty,
            ).to_pandas()
            if newly.empty:
                break
            nxt = reach.copy()
            nxt[newly["c"].to_numpy(np.int64)] = 1
            reach = nxt
        return reach

    f = directed_reach(False)
    b = directed_reach(True)
    idx = np.searchsorted(sorted_hashes, host_hashes)  # host i → code
    fi, bi = f[idx] == 1, b[idx] == 1
    cat = np.where(fi & bi, "core", np.where(bi, "in", np.where(fi, "out", "other")))
    return pd.DataFrame({"host": hosts, "category": cat.astype(object)})


def host_bowtie(pages_ds, max_hops: int = 4):
    """Bow-tie decomposition of the host link graph parsed from the raw
    page html — :func:`host_link_graph` feeding
    :func:`host_bowtie_from_links`."""
    return host_bowtie_from_links(host_link_graph(pages_ds), max_hops=max_hops)


def host_communities(pages_ds, rounds: int = 3):
    """Host communities by deterministic synchronous label propagation
    over the UNDIRECTED host link graph — the site-neighborhood
    discovery pass between :func:`host_components` (too coarse: the web
    is one giant component) and anything modularity-based (not
    shuffle-friendly). Pure reuse of
    ``kazu_ray/ops/graph.py::label_propagation`` over the subj/obj link
    view: size-dispatched driver/int-coded forms, node-sized label
    vector broadcast per round, one edge pass + one node-keyed hash
    exchange per round. Returns (host, community) with community = a
    member host name (lexmin-tie-break LPA convention)."""
    from kazu_ray.ops.graph import _distinct_edges, label_propagation

    out = label_propagation(
        None,
        rounds=rounds,
        edges=_distinct_edges(_links_as_subj_obj(host_link_graph(pages_ds))),
    )
    return out.rename(columns={"node": "host"})


def host_quota_sample(pages_ds, k: int = 3):
    """Per-host crawl/training quota: keep at most ``k`` pages per host,
    chosen DETERMINISTICALLY as the k smallest ``md5_number_lower``
    hashes of the url (ties impossible — distinct urls) — the standard
    hub-host downsampling step in front of a training corpus (a Zipf
    crawl is dominated by a few giant hosts; an md5 rank is a stable
    uniform sample that two runs, or an incremental re-run, pick
    identically). Returns (host, url, hv) rows of the kept pages.

    Shapes: the same k-min-per-key discipline as
    :func:`host_distinct_outlinks_kmv` — per-batch combiner truncates
    each host to its k local minima before anything moves, then one
    host-keyed hash exchange finishes the global k-min. Per-host state
    is k rows regardless of host size; nothing page-scale is sorted
    globally."""
    import hashlib

    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    empty = pa.table(
        {
            "host": pa.array([], type=pa.string()),
            "url": pa.array([], type=pa.string()),
            "hv": pa.array([], type=pa.uint64()),
        }
    )

    def partial(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pandas()
        hosts = urls.str.extract(_HOST_RE, expand=False).str.lower()
        df = pd.DataFrame({"host": hosts, "url": urls}).dropna()
        if not len(df):
            return empty
        df["hv"] = np.array(
            [
                int.from_bytes(hashlib.md5(u.encode()).digest()[8:], "little")
                for u in df["url"]
            ],
            dtype=np.uint64,
        )
        df = df.sort_values(["host", "hv"]).groupby("host").head(k)
        return pa.table(
            {
                "host": pa.array(df["host"], type=pa.string()),
                "url": pa.array(df["url"], type=pa.string()),
                "hv": pa.array(df["hv"].to_numpy(np.uint64)),
            }
        )

    def per_bucket(t: pa.Table) -> pa.Table:
        df = (
            t.to_pandas()
            .drop_duplicates()
            .sort_values(["host", "hv"])
            .groupby("host")
            .head(k)
        )
        return pa.table(
            {
                "host": pa.array(df["host"], type=pa.string()),
                "url": pa.array(df["url"], type=pa.string()),
                "hv": pa.array(df["hv"].to_numpy(np.uint64)),
            }
        )

    return exchange_groups(
        pages_ds.map_batches(partial, batch_format="pyarrow"),
        ["host"],
        shuffle_parts(),
        per_bucket,
        empty,
    )


def frontier_priority(pages_ds, iterations: int = 3, scale: int = 10**12):
    """Priority-ordered crawl frontier: every uncrawled outlink url
    scored ``n_refs × rank_scaled(host(url))`` — reference demand times
    the authority of the host it lives on, the classic next-fetch
    ordering a crawler derives from a finished batch (an OPIC-flavored
    composition of :func:`crawl_frontier` and :func:`host_pagerank`).

    Shapes: the frontier stays a page-scale Dataset end-to-end; the
    rank table is HOST-sized and rides the same
    acceptable-as-a-first-step broadcast note as
    :func:`host_pagerank_from_links` itself (one ``ray.put`` dict, read
    per batch — at 10⁸-host crawls swap it for a bucketed hash join on
    the host column). Frontier hosts are dst-hosts of the link graph by
    construction, so every row finds a rank. The product is guarded:
    ``n_refs × scale`` past int64 raises loudly rather than wrapping."""
    import ray

    ranks = host_pagerank(pages_ds, iterations=iterations, scale=scale)
    rank_ref = ray.put(dict(zip(ranks["host"], ranks["rank_scaled"])))
    int64_max = np.iinfo(np.int64).max

    def score(t: pa.Table) -> pa.Table:
        rm = ray.get(rank_ref)
        urls = t["url"].to_pandas()
        hosts = urls.str.extract(_HOST_RE, expand=False).str.lower()
        r = hosts.map(rm).fillna(0).astype("int64")
        n = t["n_refs"].to_pandas().astype("int64")
        if len(n) and int(n.max()) * int(r.max()) > int64_max:
            raise OverflowError(
                "frontier_priority product exceeds int64 — lower `scale`"
            )
        return pa.table(
            {
                "url": t["url"],
                "host": pa.array(hosts, type=pa.string()),
                "n_refs": pa.array(n.to_numpy(np.int64)),
                "rank_scaled": pa.array(r.to_numpy(np.int64)),
                "priority_scaled": pa.array((n * r).to_numpy(np.int64)),
            }
        )

    return crawl_frontier(pages_ds).map_batches(score, batch_format="pyarrow")


def host_mirror_merge(pages_ds, threshold_ppm: int = 500_000):
    """Mirror-host consolidation — the link-graph analogue of entity
    canonicalization (``ops/graph.py::entity_merge``): mirror pairs
    from :func:`host_outlink_jaccard` close transitively into clusters
    labeled by their lexmin host, and one streaming pass rewrites both
    endpoints of the weighted link graph to canonical hosts and re-sums
    the link weights. Running analytics on the merged graph stops
    mirrors/CDN aliases from double-counting authority. Returns the
    canonicalized (src_host, dst_host, n_links).

    Shapes: the merge map is bounded by the MIRROR-PAIR contract (the
    similarity join is threshold-filtered and hub-capped — mirrors are
    a vanishing fraction of hosts), so it collects driver-side and
    broadcasts once; the link graph streams through one vectorized
    rewrite + a pair-keyed combiner-first exchange."""
    import ray

    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups
    from kazu_ray.ops.graph import components_labeled

    links = host_link_graph(pages_ds).materialize()
    pairs = host_outlink_jaccard(links, threshold_ppm=threshold_ppm)
    lbl = components_labeled(
        pairs, a_col="host_a", b_col="host_b"
    ).to_pandas()  # mirror-pair-bounded (docstring contract)
    merge_map = {
        n: c for n, c in zip(lbl["node"], lbl["component"]) if n != c
    }
    map_ref = ray.put(merge_map)

    def rewrite(t: pa.Table) -> pa.Table:
        m = ray.get(map_ref)
        src = t["src_host"].to_pandas()
        dst = t["dst_host"].to_pandas()
        if m:
            src = src.map(m).fillna(src)
            dst = dst.map(m).fillna(dst)
        g = (
            pd.DataFrame(
                {
                    "src_host": src,
                    "dst_host": dst,
                    "n": t["n_links"].to_pandas(),
                }
            )
            .groupby(["src_host", "dst_host"], as_index=False)["n"]
            .sum()
        )
        return pa.table(
            {
                "src_host": pa.array(g["src_host"], type=pa.string()),
                "dst_host": pa.array(g["dst_host"], type=pa.string()),
                "n": pa.array(g["n"].to_numpy(np.int64)),
            }
        )

    def sum_bucket(t: pa.Table) -> pa.Table:
        g = t.group_by(["src_host", "dst_host"]).aggregate([("n", "sum")])
        return pa.table(
            {
                "src_host": g["src_host"],
                "dst_host": g["dst_host"],
                "n_links": g["n_sum"].cast(pa.int64()),
            }
        )

    return exchange_groups(
        links.map_batches(rewrite, batch_format="pyarrow"),
        ["src_host", "dst_host"],
        shuffle_parts(),
        sum_bucket,
        pa.table(
            {
                "src_host": pa.array([], type=pa.string()),
                "dst_host": pa.array([], type=pa.string()),
                "n_links": pa.array([], type=pa.int64()),
            }
        ),
    )
