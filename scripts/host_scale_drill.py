"""Host-graph scale drill: synthesize a deterministic link graph with
N hosts (default 1,000,000 → ~3.01M weighted directed edges), run the
DISTRIBUTED host-graph ops over it — host_degrees_from_links,
host_pagerank_from_links, components_labeled — and time them. At a
smaller overlap scale, assert each result EQUAL to the round-4
driver-side pandas formulation (the code that collected the link graph
with ``to_pandas()``), so the de-drivered shapes are provably the same
math.

The synthetic graph: every host h_i links to 3 multiplicative-hash
targets (weights 1-5), and every 100th host additionally links to h_0
(a deterministic hub — the skew case degrees/pagerank must survive).

Usage: python scripts/host_scale_drill.py [n_hosts] [overlap_hosts]
       (defaults 1_000_000 and 50_000)
"""

import os
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_links(n_hosts: int):
    """Deterministic (src_host, dst_host, n_links) Dataset — distinct
    per pair by construction."""
    import ray.data as rd

    width = len(str(n_hosts))

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        srcs, dsts, ws = [], [], []
        for k, mult in enumerate((2654435761, 40503, 2246822519)):
            t = (ids * mult + 97 * k + 1) % n_hosts
            keep = t != ids  # no self-links
            srcs.append(ids[keep])
            dsts.append(t[keep])
            ws.append((ids[keep] + k) % 5 + 1)
        hub = ids[(ids % 100 == 0) & (ids != 0)]
        srcs.append(hub)
        dsts.append(np.zeros(len(hub), dtype=ids.dtype))
        ws.append(np.full(len(hub), 2, dtype=ids.dtype))
        src = np.concatenate(srcs)
        dst = np.concatenate(dsts)
        w = np.concatenate(ws).astype(np.int64)
        # hash targets can coincide across the three multipliers (and
        # with the hub edge) — collapse per (src, dst) so the output
        # honors the link-graph distinct-pair contract. Each src id
        # lives in exactly one range batch, so batch-local collapse is
        # globally distinct.
        g = (
            pd.DataFrame({"s": src, "d": dst, "w": w})
            .groupby(["s", "d"], as_index=False)["w"]
            .sum()
        )
        fmt = lambda a: pd.Series(a).map(lambda i: f"h{i:0{width}d}.org")
        return pa.table(
            {
                "src_host": pa.array(fmt(g["s"]), type=pa.string()),
                "dst_host": pa.array(fmt(g["d"]), type=pa.string()),
                "n_links": pa.array(g["w"].to_numpy(np.int64)),
            }
        )

    return rd.range(n_hosts).map_batches(gen, batch_format="pyarrow")


def driver_reference(links_df: pd.DataFrame):
    """The round-4 driver-side formulation (pandas over the collected
    link graph) — degrees, 3-iteration integer pagerank, and union-find
    components with lexmin labels."""
    out = links_df.groupby("src_host").agg(
        out_links=("n_links", "sum"), out_hosts=("dst_host", "nunique")
    )
    inn = links_df.groupby("dst_host").agg(in_hosts=("src_host", "nunique"))
    deg = (
        out.join(inn, how="outer")
        .fillna(0)
        .astype("int64")
        .reset_index(names="host")
        .sort_values("host", ignore_index=True)
    )

    scale = 10**12
    hosts = sorted(set(links_df["src_host"]) | set(links_df["dst_host"]))
    ow = links_df.groupby("src_host")["n_links"].sum().to_dict()
    w = dict(
        zip(
            zip(links_df["src_host"], links_df["dst_host"]),
            (int(v) for v in links_df["n_links"]),
        )
    )
    rank = {h: scale for h in hosts}
    for _ in range(3):
        inflow = {h: 0 for h in hosts}
        for (a, b), n in w.items():
            inflow[b] += rank[a] * n // ow[a]
        rank = {h: 3 * scale // 20 + 17 * inflow[h] // 20 for h in hosts}
    pr = pd.DataFrame(
        {"host": hosts, "rank_scaled": [rank[h] for h in hosts]}
    ).astype({"rank_scaled": "int64"})

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(links_df["src_host"], links_df["dst_host"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    comp = pd.DataFrame(
        sorted((n, find(n)) for n in parent), columns=["host", "component"]
    )
    return deg, pr, comp


def _as_triples(links_ds):
    """View a (src_host, dst_host, n_links) link graph as the
    (subj, pred, obj) shape the kg-side graph ops consume."""

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subj": t["src_host"].cast(pa.string()),
                "pred": pa.array(["links"] * len(t), type=pa.string()),
                "obj": t["dst_host"].cast(pa.string()),
            }
        )

    return links_ds.map_batches(fn, batch_format="pyarrow")


def _driver_kcore(und_edges: set, k: int) -> dict:
    """Plain-Python peel over the undirected distinct edge set."""
    adj: dict = {}
    for a, b in und_edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in [n for n, nb in adj.items() if len(nb) < k]:
            for m in adj.pop(n):
                if m in adj:
                    adj[m].discard(n)
            changed = True
    return {n: len(nb) for n, nb in adj.items()}


def _driver_ppr(und_edges: set, n_iters: int, scale: int = 10**12) -> dict:
    """Plain-Python integer seed-teleport recurrence."""
    adj: dict = {}
    for a, b in und_edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seeds = sorted(adj)[:5]
    r = {n: (scale if n in seeds else 0) for n in adj}
    for _ in range(n_iters):
        r = {
            u: ((15 * scale) // 100 if u in seeds else 0)
            + (85 * sum(r[v] // len(adj[v]) for v in adj[u])) // 100
            for u in adj
        }
    return r


def _driver_bfs(und_edges: set, max_hops: int) -> dict:
    """Plain-Python multi-source BFS (5 lexmin seeds, ≤ max_hops)."""
    adj: dict = {}
    for a, b in und_edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {n: 0 for n in sorted(adj)[:5]}
    frontier = set(dist)
    for h in range(1, max_hops + 1):
        frontier = {
            m for n in frontier for m in adj[n] if m not in dist
        }
        for m in frontier:
            dist[m] = h
        if not frontier:
            break
    return dist


def main() -> None:
    n_hosts = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    overlap = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000

    # the drill exists to exercise and time the DISTRIBUTED forms — the
    # size dispatch would otherwise route the overlap graph driver-side
    os.environ["KAZU_WEB_MAX_DRIVER_PAIRS"] = "0"
    # likewise force the kg-side INT-CODED forms (what runs at scale)
    # so the overlap equality checks gate exactly the code the 1M leg
    # times
    os.environ["KAZU_GRAPH_MAX_DICT_EDGES"] = "0"

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from kazu_ray.ops.graph import (
        bfs_distances,
        components_labeled,
        kcore,
        personalized_pagerank,
    )
    from kazu_ray.ops.web import (
        host_degrees_from_links,
        host_hits_from_links,
        host_outlink_jaccard,
        host_pagerank_from_links,
        host_reciprocity_from_links,
    )

    # ---- overlap equality: distributed ops vs the r04 driver math ----
    small = synth_links(overlap).materialize()
    small_df = small.to_pandas()
    deg_ref, pr_ref, comp_ref = driver_reference(small_df)

    deg_got = (
        host_degrees_from_links(small)
        .to_pandas()
        .sort_values("host", ignore_index=True)
    )
    assert deg_got.values.tolist() == deg_ref.values.tolist(), "degrees differ"
    pr_got = host_pagerank_from_links(small)
    assert pr_got.values.tolist() == pr_ref.values.tolist(), "pagerank differs"
    comp_got = (
        components_labeled(small, a_col="src_host", b_col="dst_host")
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )
    assert (
        comp_got.rename(columns={"node": "host"}).values.tolist()
        == comp_ref.values.tolist()
    ), "components differ"
    # HITS and reciprocity vs driver-side big-int / set math
    hits_got = host_hits_from_links(small).sort_values("host", ignore_index=True)
    scale = 10**12
    w = dict(
        zip(
            zip(small_df["src_host"], small_df["dst_host"]),
            (int(v) for v in small_df["n_links"]),
        )
    )
    nodes = sorted({a for a, _ in w} | {b for _, b in w})
    hub = {n: scale for n in nodes}
    auth = {n: 0 for n in nodes}
    for _ in range(2):
        raw = {n: 0 for n in nodes}
        for (a, b), wt in w.items():
            raw[b] += hub[a] * wt
        tot = sum(raw.values())
        auth = {n: (raw[n] * scale // tot if tot else 0) for n in nodes}
        raw = {n: 0 for n in nodes}
        for (a, b), wt in w.items():
            raw[a] += auth[b] * wt
        tot = sum(raw.values())
        hub = {n: (raw[n] * scale // tot if tot else 0) for n in nodes}
    assert hits_got.values.tolist() == [
        [n, hub[n], auth[n]] for n in nodes
    ], "hits differ"

    rec_got = host_reciprocity_from_links(small)
    dirs = {
        (a, b)
        for a, b in zip(small_df["src_host"], small_df["dst_host"])
        if a != b
    }
    und = {(min(a, b), max(a, b)) for a, b in dirs}
    n_rec = sum(1 for a, b in und if (a, b) in dirs and (b, a) in dirs)
    assert rec_got.values.tolist() == [
        [len(dirs), len(und), n_rec, n_rec * 1_000_000 // len(und)]
    ], "reciprocity differs"

    # k-core + personalized pagerank (the round-5 kg-side iterative
    # ops) over the same graph viewed as undirected triples
    small_triples = _as_triples(small)
    for kk in (4, 6):  # k=4: full core, 0 peel rounds; k=6: the synth
        # graph is ~6-regular, so the peel CASCADES (8 rounds at 20k
        # hosts) all the way to an empty core — the multi-round path
        kc_got = kcore(small_triples, k=kk)
        kc_ref = _driver_kcore(und, k=kk)
        assert dict(zip(kc_got["node"], kc_got["deg_in_core"])) == kc_ref, (
            f"kcore(k={kk}) differs"
        )
    ppr_got = personalized_pagerank(small_triples, n_iters=2)
    ppr_ref = _driver_ppr(und, n_iters=2)
    assert dict(zip(ppr_got["node"], ppr_got["rank"])) == ppr_ref, "ppr differs"

    bfs_got = bfs_distances(small_triples, max_hops=3)
    bfs_ref = _driver_bfs(und, max_hops=3)
    assert dict(zip(bfs_got["node"], bfs_got["dist"])) == bfs_ref, "bfs differs"

    # mirror detection vs a set-based driver recompute (cap does not
    # bind at overlap scale: the hub target has overlap/100 sources)
    jac_got = (
        host_outlink_jaccard(small, threshold_ppm=200_000)
        .to_pandas()
        .sort_values(["host_a", "host_b"], ignore_index=True)
    )
    sets: dict = {}
    for a, b in dirs:
        sets.setdefault(a, set()).add(b)
    inv: dict = {}
    for s, ds in sets.items():
        for d in ds:
            inv.setdefault(d, []).append(s)
    inter: dict = {}
    for d, ss in inv.items():
        ss = sorted(ss)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                inter[(ss[i], ss[j])] = inter.get((ss[i], ss[j]), 0) + 1
    jac_ref = sorted(
        (a, b, i, i * 1_000_000 // (len(sets[a]) + len(sets[b]) - i))
        for (a, b), i in inter.items()
        if i * 1_000_000 // (len(sets[a]) + len(sets[b]) - i) >= 200_000
    )
    assert jac_got.values.tolist() == [list(r) for r in jac_ref], "jaccard differs"

    # bow-tie decomposition vs the driver-side set math (directed BFS
    # both ways from the deterministic max-degree pivot)
    from kazu_ray.ops.web import _driver_bowtie, host_bowtie_from_links

    bt_got = host_bowtie_from_links(small).sort_values("host", ignore_index=True)
    bt_ref = _driver_bowtie(small_df, max_hops=4)
    assert bt_got.values.tolist() == bt_ref.values.tolist(), "bowtie differs"

    print(
        f"overlap ({overlap} hosts, {len(small_df)} edges): degrees/pagerank/"
        "components/hits/reciprocity/kcore/personalized-pagerank/bfs/"
        "outlink-jaccard/bowtie EQUAL to the driver-side formulation"
    )

    # ---- scale timing: the de-drivered ops at n_hosts ----
    links = synth_links(n_hosts).materialize()
    n_edges = links.count()

    t0 = time.time()
    n_deg = host_degrees_from_links(links).count()
    t_deg = time.time() - t0

    t0 = time.time()
    pr = host_pagerank_from_links(links)
    t_pr = time.time() - t0

    t0 = time.time()
    n_comp = components_labeled(links, a_col="src_host", b_col="dst_host").count()
    t_comp = time.time() - t0

    t0 = time.time()
    hits = host_hits_from_links(links)
    t_hits = time.time() - t0

    t0 = time.time()
    rec = host_reciprocity_from_links(links)
    t_rec = time.time() - t0

    triples = _as_triples(links)
    t0 = time.time()
    kc = kcore(triples, k=6)  # ~6-regular graph: k=6 cascades the peel
    t_kc = time.time() - t0

    t0 = time.time()
    ppr = personalized_pagerank(triples, n_iters=2)
    t_ppr = time.time() - t0

    t0 = time.time()
    bfs = bfs_distances(triples, max_hops=3)
    t_bfs = time.time() - t0

    # mirror detection at scale: the hub target (n_hosts/100 sources)
    # would emit ~(n/100)²/2 intersection pairs from one bucket — set
    # the cap BELOW it so the drill exercises the documented hub-skip
    # (the contract a real crawl's everybody-links-to-it targets need)
    os.environ["KAZU_JACCARD_MAX_SRCS_PER_DST"] = str(max(2, n_hosts // 200))
    t0 = time.time()
    n_jac = host_outlink_jaccard(links, threshold_ppm=200_000).count()
    t_jac = time.time() - t0

    t0 = time.time()
    bt = host_bowtie_from_links(links)
    t_bt = time.time() - t0
    bt_counts = bt["category"].value_counts().to_dict()

    print(
        f"scale ({n_hosts} hosts, {n_edges} edges): "
        f"host_degrees {t_deg:.1f}s ({n_deg} hosts), "
        f"host_pagerank(3 iters) {t_pr:.1f}s (rank rows {len(pr)}), "
        f"host_components {t_comp:.1f}s ({n_comp} labeled), "
        f"host_hits(2 iters) {t_hits:.1f}s ({len(hits)} hosts), "
        f"host_reciprocity {t_rec:.1f}s "
        f"(recip_ppm {int(rec['reciprocity_ppm'].iloc[0])}), "
        f"kcore(k=6, cascading peel) {t_kc:.1f}s ({len(kc)} core nodes), "
        f"personalized_pagerank(2 iters) {t_ppr:.1f}s ({len(ppr)} rows), "
        f"bfs_distances(3 hops) {t_bfs:.1f}s ({len(bfs)} reached), "
        f"host_outlink_jaccard {t_jac:.1f}s ({n_jac} mirror pairs, hub capped), "
        f"host_bowtie(4 hops ×2 dirs) {t_bt:.1f}s ({bt_counts})"
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
