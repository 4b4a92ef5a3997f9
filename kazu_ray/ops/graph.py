"""Graph analytics over the emitted knowledge-graph triples.

Downstream consumers of a co-occurrence KG want association strength
(PMI over doc counts) and graph structure (components, hubs). These
operators run over the triple Dataset the flagship pipeline emits
(``kazu_ray/stages/materialize.py``), so they compose with the store
artifacts and are SQL-checkable against the written triples parquet.

Scale notes: the node vocabulary of a KG built against ontology-linked
entities is BOUNDED by the ontology id space (tens of millions at the
very top end, typically ~1e5-1e6), independent of corpus size — it is
the corpus-sized tables (triples, doc ids) that must stream. Node-level
result tables (doc counts, degrees, component labels) are therefore
legitimate broadcast/driver material. The distinct EDGE set is NOT:
co-occurrence edges grow toward O(V^2) with corpus size, so every
operator here keeps the edge set in Dataset form — components assign
node ids from the node table only and dispatch the clustering through
``connected_components_auto`` (distributed min-label propagation past a
pair cap), and triangle counting past its edge cap switches to
degree-oriented distributed wedge counting (Suri & Vassilvitskii,
WWW'11) whose only broadcast is the node-sized degree table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def pair_doc_counts(triples_ds):
    """Association-strength ingredients per (subj, obj) pair: distinct
    supporting docs for the pair plus each endpoint's distinct-doc
    marginal — exactly the counts PMI / log-likelihood-ratio scoring
    needs, kept as INTEGERS so downstream can apply any scorer and the
    SQL oracle matches bit-for-bit (float log scores would drift with
    reduction order; NOTES.md #26).

    Shapes: pair support = per-batch distinct combiner on
    (subj, obj, doc_id) (:func:`_batch_distinct` — triples repeat a
    pair once per mention, so this collapses before anything moves),
    then ONE hash exchange keyed on the pair whose bucket kernel
    finishes the distinct and counts docs per pair vectorized — no
    per-key distinct sets, so hub pairs never concentrate state, and no
    global range-partition sort (the old form paid TWO ``Dataset.
    groupby`` sorts over the full triple set); marginals reuse the
    salted node doc-count aggregate and come back node-sized (bounded,
    see module docstring), then broadcast-join onto the pair table via
    ``ray.put``.
    """
    import ray

    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups
    from kazu_ray.stages.materialize import node_doc_counts_salted

    marginals = node_doc_counts_salted(triples_ds).to_pandas()
    node_docs = dict(zip(marginals["node"], marginals["n_docs"]))
    node_ref = ray.put(node_docs)

    local = triples_ds.map_batches(
        _batch_distinct(["subj", "obj", "doc_id"]), batch_format="pyarrow"
    )

    def count_bucket(t: pa.Table) -> pa.Table:
        g = (
            t.group_by(["subj", "obj", "doc_id"])
            .aggregate([])
            .group_by(["subj", "obj"])
            .aggregate([("doc_id", "count")])
        )
        # rename BY NAME: pyarrow's key-column/aggregate-column output
        # order has changed across major versions, so a positional
        # rename could silently mislabel the count
        return pa.table(
            {
                "subj": g["subj"],
                "obj": g["obj"],
                "n_docs_pair": g["doc_id_count"],
            }
        )

    pair_support = exchange_groups(
        local,
        ["subj", "obj"],
        shuffle_parts(),
        count_bucket,
        pa.table(
            {
                "subj": pa.array([], type=pa.string()),
                "obj": pa.array([], type=pa.string()),
                "n_docs_pair": pa.array([], type=pa.int64()),
            }
        ),
    )

    def attach(batch: pa.Table) -> pa.Table:
        nd = ray.get(node_ref)
        # broadcast-dict lookup vectorized through Series.map (C-level
        # hash probe per element, no Python comprehension)
        subj = batch["subj"].to_pandas()
        obj = batch["obj"].to_pandas()
        return pa.table(
            {
                "subj": batch["subj"],
                "obj": batch["obj"],
                "n_docs_pair": batch["n_docs_pair"].cast(pa.int64()),
                "n_docs_subj": pa.array(subj.map(nd), type=pa.int64()),
                "n_docs_obj": pa.array(obj.map(nd), type=pa.int64()),
            }
        )

    return pair_support.map_batches(attach, batch_format="pyarrow")


def _hash_node_ids(col, salt: int):
    """Salted full-width SipHash of a string column as int64 (uint64
    bits reinterpreted) — the distributed node-id assignment for
    :func:`components_labeled`: computed per batch from the string
    itself, so NO node-sized broadcast dict and NO driver sort are
    needed to turn string edges into int edges."""
    import numpy as np

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals = col.fill_null("").to_pandas().to_numpy()
    return pd.util.hash_array(vals, hash_key=f"{salt:016d}").view(np.int64)


def components_labeled(edges, a_col: str = "subj", b_col: str = "obj",
                       max_driver_pairs: int | None = None):
    """Connected components of an undirected string-keyed edge Dataset,
    labeled by each component's lexicographically smallest node —
    fully distributed (nothing node- or edge-sized is ever collected to
    the driver), so it holds for vocabularies that GROW with the corpus
    (web hosts) as well as the bounded KG case:

    1. node ids are salted 64-bit hashes computed per batch
       (:func:`_hash_node_ids`) — no broadcast dict, no driver sort —
       and collision-CHECKED (distinct-id count vs distinct-node count;
       a collision would silently merge two components, so mismatches
       re-salt, loudly failing after 16 attempts),
    2. clustering is size-dispatched exactly like
       ``connected_components_auto`` (driver union-find under
       ``KAZU_CC_MAX_DRIVER_PAIRS``, BSP min-label bucket actors above
       it — the pair set ships once, rounds exchange node-sized
       messages),
    3. the int min-label is arbitrary under hashing, so the lexmin
       STRING contract is restored distributed: hash-join component ids
       back onto the node table, per-component ``min(node)`` via a
       combiner-first exchange, and one more hash join to stamp every
       node with its component's label.

    Self-loop-only nodes label themselves. Returns a Dataset of
    (node, component)."""
    import os

    import numpy as np
    import ray.data as rd

    from kazu_ray.ops.dedup import (
        connected_components,
        connected_components_distributed,
        shuffle_parts,
    )
    from kazu_ray.ops.exchange import exchange_groups
    from kazu_ray.ops.joins import bucketed_hash_join

    _out_empty = pa.table(
        {
            "node": pa.array([], type=pa.string()),
            "component": pa.array([], type=pa.string()),
        }
    )

    # distinct node table (combiner-first endpoint partials → hash
    # exchange distinct) — a Dataset, never collected
    def endpoint_partials(t: pa.Table) -> pa.Table:
        nodes_local = (
            pd.concat(
                [t[a_col].to_pandas(), t[b_col].to_pandas()], ignore_index=True
            )
            .dropna()
            .drop_duplicates()
        )
        return pa.table({"node": pa.array(nodes_local, type=pa.string())})

    nodes = exchange_groups(
        edges.map_batches(endpoint_partials, batch_format="pyarrow"),
        ["node"],
        shuffle_parts(),
        _batch_distinct(["node"]),
        pa.table({"node": pa.array([], type=pa.string())}),
    ).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return rd.from_arrow(_out_empty)

    ids_ds = None
    salt = 0
    for salt in range(16):
        def with_ids(t: pa.Table, _salt=salt) -> pa.Table:
            return pa.table(
                {
                    "node": t["node"].cast(pa.string()),
                    "id": pa.array(
                        _hash_node_ids(t["node"], _salt), type=pa.int64()
                    ),
                }
            )

        ids_ds = nodes.map_batches(with_ids, batch_format="pyarrow").materialize()
        n_ids = (
            ids_ds.map_batches(
                lambda t: t.select(["id"]), batch_format="pyarrow"
            )
            .groupby("id")
            .count()
            .count()
        )
        if n_ids == n_nodes:
            break
    else:
        raise RuntimeError(
            "components_labeled: node-id hashing collided at all 16 salts"
        )

    def to_int_pairs(t: pa.Table, _salt=salt) -> pa.Table:
        return pa.table(
            {
                "id_a": pa.array(_hash_node_ids(t[a_col], _salt), type=pa.int64()),
                "id_b": pa.array(_hash_node_ids(t[b_col], _salt), type=pa.int64()),
            }
        )

    int_pairs = edges.map_batches(to_int_pairs, batch_format="pyarrow").materialize()

    if max_driver_pairs is None:
        max_driver_pairs = int(os.environ.get("KAZU_CC_MAX_DRIVER_PAIRS", 200_000))
    if int_pairs.count() <= max_driver_pairs:
        comp_df = connected_components(int_pairs)
        comp_ds = rd.from_arrow(
            pa.table(
                {
                    "id": pa.array(comp_df["doc_id"].to_numpy(np.int64)),
                    "cid": pa.array(comp_df["component"].to_numpy(np.int64)),
                }
            )
        )
    else:
        comp_ds = connected_components_distributed(int_pairs).map_batches(
            lambda t: pa.table(
                {
                    "id": t["doc_id"].cast(pa.int64()),
                    "cid": t["component"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )

    # stamp each node with its (arbitrary) int component id
    node_cid = bucketed_hash_join(
        ids_ds, comp_ds, on="id", num_buckets=shuffle_parts()
    ).map_batches(
        lambda t: t.select(["node", "cid"]), batch_format="pyarrow"
    ).materialize()

    # lexmin string label per component: per-batch combiner min →
    # cid-keyed exchange min
    def local_min(t: pa.Table) -> pa.Table:
        g = t.group_by("cid").aggregate([("node", "min")])
        return pa.table({"cid": g["cid"], "node_min": g["node_min"]})

    def bucket_min(t: pa.Table) -> pa.Table:
        g = t.group_by("cid").aggregate([("node_min", "min")])
        return pa.table(
            {
                "cid": g["cid"].cast(pa.int64()),
                "component": g["node_min_min"].cast(pa.string()),
            }
        )

    labels = exchange_groups(
        node_cid.map_batches(local_min, batch_format="pyarrow"),
        ["cid"],
        shuffle_parts(),
        bucket_min,
        pa.table(
            {
                "cid": pa.array([], type=pa.int64()),
                "component": pa.array([], type=pa.string()),
            }
        ),
    )

    return bucketed_hash_join(
        node_cid, labels, on="cid", num_buckets=shuffle_parts()
    ).map_batches(
        lambda t: pa.table(
            {
                "node": t["node"].cast(pa.string()),
                "component": t["component"].cast(pa.string()),
            }
        ),
        batch_format="pyarrow",
    )


def kg_components(triples_ds):
    """Connected components of the undirected co-occurrence graph:
    (node, component) where the component label is the lexicographically
    smallest node it contains.

    All the heavy lifting is the fully distributed
    :func:`components_labeled` (salted-hash node ids computed per
    batch, size-dispatched clustering, distributed lexmin-label
    restore) over the distinct (subj, obj) pair Dataset — the edge set
    is never collected. Only the FINAL (node, component) table is
    collected to pandas here, which is legitimate for the KG case
    alone: the node vocabulary is bounded by the ontology id space
    (module docstring). Host-scale callers use
    :func:`components_labeled` directly and keep the Dataset
    (``kazu_ray/ops/web.py::host_components``). Isolated nodes
    (self-co-occurrence only) label themselves."""
    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    edges = exchange_groups(
        triples_ds.map_batches(
            _batch_distinct(["subj", "obj"]), batch_format="pyarrow"
        ),
        ["subj", "obj"],
        shuffle_parts(),
        _batch_distinct(["subj", "obj"]),
        pa.table(
            {
                "subj": pa.array([], type=pa.string()),
                "obj": pa.array([], type=pa.string()),
            }
        ),
    ).materialize()

    comp = components_labeled(edges, a_col="subj", b_col="obj")
    return comp.to_pandas().sort_values("node", ignore_index=True)


def pair_provenance(triples_ds, sample_k: int = 5):
    """Per-pair lineage: distinct supporting-doc count plus a bounded,
    deterministic sample of supporting doc ids (the first ``sample_k``
    in ascending order, comma-joined — a STRING so the result is
    hash-exact against the SQL oracle; list-typed columns compare
    unreliably across engines).

    Shapes: a per-batch distinct combiner (:func:`_batch_distinct`)
    bounds the shuffle to block-local-unique (pair, doc) rows — the
    pair-keyed hash exchange then co-locates each pair, so finishing
    the distinct is a bucket-local ``drop_duplicates`` (the old form
    paid a global range-partition SORT for it); the per-pair count +
    first-``sample_k`` sample is computed vectorized across ALL of a
    hash bucket's pairs at once (``exchange_groups``; per-pair
    ``map_groups`` paid Python dispatch per pair): one sort by
    (pair, doc), a cumcount mask caps the sample rows, and a single
    groupby aggregates count + comma-join — the emitted sample stays
    ≤ ``sample_k`` regardless of how hot the pair is."""
    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    distinct = triples_ds.map_batches(
        _batch_distinct(["subj", "obj", "doc_id"]), batch_format="pyarrow"
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        df = (
            t.to_pandas()
            .drop_duplicates(["subj", "obj", "doc_id"])
            .sort_values(["subj", "obj", "doc_id"], kind="mergesort")
        )
        grp = df.groupby(["subj", "obj"], sort=False)
        counts = grp.size().reset_index(name="n_docs")
        head = df[grp.cumcount() < sample_k]
        samples = (
            head.groupby(["subj", "obj"], sort=False)["doc_id"]
            .agg(",".join)
            .reset_index(name="sample_docs")
        )
        out = counts.merge(samples, on=["subj", "obj"])
        return pa.table(
            {
                "subj": pa.array(out["subj"], type=pa.string()),
                "obj": pa.array(out["obj"], type=pa.string()),
                "n_docs": pa.array(out["n_docs"], type=pa.int64()),
                "sample_docs": pa.array(out["sample_docs"], type=pa.string()),
            }
        )

    empty = pa.table(
        {
            "subj": pa.array([], type=pa.string()),
            "obj": pa.array([], type=pa.string()),
            "n_docs": pa.array([], type=pa.int64()),
            "sample_docs": pa.array([], type=pa.string()),
        }
    )
    return exchange_groups(distinct, ["subj", "obj"], shuffle_parts(), per_bucket, empty)


def _batch_distinct(cols: list[str]):
    """Per-batch distinct combiner: an Arrow ``group_by`` with no
    aggregates collapses a batch to its unique key rows in C++ — the
    cheap local pass that bounds a global-distinct shuffle by
    blocks × block-local-distinct instead of total rows (triples repeat
    the same pair once per mention, so this is a ~10-100× cut before
    any data moves)."""

    def fn(t: pa.Table) -> pa.Table:
        return t.select(cols).group_by(cols).aggregate([])

    return fn


def _distinct_edges(triples_ds):
    """Distinct undirected co-occurrence edges (a < b), self-loops
    dropped, as a materialized Dataset (never collected).

    Shapes: every graph op starts here, so this is the layer's hottest
    exchange — per-batch Arrow distinct combiner first (see
    :func:`_batch_distinct`), then the adaptive hash exchange with a
    per-bucket distinct (hash co-location is all a distinct needs; the
    old ``Dataset.groupby`` paid a global range-partition SORT of every
    pre-combined row)."""
    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    def local_pairs(t: pa.Table) -> pa.Table:
        pairs = pa.table(
            {
                "a": pa.compute.min_element_wise(t["subj"], t["obj"]),
                "b": pa.compute.max_element_wise(t["subj"], t["obj"]),
            }
        )
        # drop self-loops (they close no triangle / extend no path)
        pairs = pairs.filter(pa.compute.not_equal(pairs["a"], pairs["b"]))
        return pairs.group_by(["a", "b"]).aggregate([])

    local = triples_ds.map_batches(local_pairs, batch_format="pyarrow")
    return exchange_groups(
        local, ["a", "b"], shuffle_parts(), _batch_distinct(["a", "b"]),
        _EDGE_EMPTY,
    ).materialize()


_EDGE_EMPTY = pa.table(
    {"a": pa.array([], type=pa.string()), "b": pa.array([], type=pa.string())}
)


def _node_codes(deg: dict):
    """Sorted dense int codes for the node vocabulary (node-sized,
    module docstring): (node→code dict, code→node numpy array). Code
    order == string sort order, so min/max comparisons on codes agree
    with the string contracts."""
    import numpy as np

    nodes = np.array(sorted(deg), dtype=object)
    return {n: i for i, n in enumerate(nodes)}, nodes


def _edge_degrees(edges):
    """Distinct-neighbor degree per node over a :func:`_distinct_edges`
    Dataset — node-sized (legitimate driver/broadcast material, module
    docstring). Returns a plain dict.

    Size-dispatched on the same threshold as the iterative ops: at or
    below :func:`_graph_max_dict_edges` the (materialized, bounded)
    edge set collapses driver-side in one ``value_counts`` — faster
    than any shuffle for ontology-vocabulary graphs. Above it,
    combiner-first partials (each batch emits node-sized (node, n)
    counts, so the exchange moves blocks × nodes rows instead of
    2 × |E| endpoints) meet in a node-keyed HASH exchange — the
    ``Dataset.groupby`` this replaces paid a global range-partition
    SORT of every partial row: 50.2 s → ~4 s on the 1M-host drill
    graph, previously the hidden dominant cost of every open-vocabulary
    kcore/ppr/bfs call."""
    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    if edges.count() <= _graph_max_dict_edges():
        df = edges.to_pandas()
        if not len(df):
            return {}
        vc = pd.concat([df["a"], df["b"]], ignore_index=True).value_counts()
        return dict(zip(vc.index, vc.to_numpy()))

    def partial_counts(t: pa.Table) -> pa.Table:
        vc = pd.concat(
            [t["a"].to_pandas(), t["b"].to_pandas()], ignore_index=True
        ).value_counts()
        return pa.table(
            {
                "node": pa.array(vc.index, type=pa.string()),
                "partial": pa.array(vc.to_numpy(), type=pa.int64()),
            }
        )

    def bucket_sum(t: pa.Table) -> pa.Table:
        g = t.group_by("node").aggregate([("partial", "sum")])
        return pa.table(
            {
                "node": g["node"].cast(pa.string()),
                "partial": g["partial_sum"].cast(pa.int64()),
            }
        )

    deg_df = exchange_groups(
        edges.map_batches(partial_counts, batch_format="pyarrow"),
        ["node"],
        shuffle_parts(),
        bucket_sum,
        _DEG_PARTIAL_EMPTY,
    ).to_pandas()
    return dict(zip(deg_df["node"], deg_df["partial"]))


_DEG_PARTIAL_EMPTY = pa.table(
    {
        "node": pa.array([], type=pa.string()),
        "partial": pa.array([], type=pa.int64()),
    }
)


def two_hop_path_counts(triples_ds, edges=None):
    """Per-node count of length-2 paths u–v–w (w ≠ u, over the distinct
    undirected edge set) — the neighborhood-size signal hub analyses
    want, computed WITHOUT materializing any 2-hop pair set: the count
    for u is Σ_{v ∈ N(u)} (deg(v) − 1), so one broadcast of the
    node-sized degree table + one streaming pass over the edges (each
    edge (a,b) contributes deg(b)−1 to a and deg(a)−1 to b, partials
    combined per batch) gives an exact answer in O(E) work. Nodes whose
    only co-occurrence is a self-loop have no edges and are absent;
    pendant-only nodes report 0."""
    import ray
    from ray.data.aggregate import Sum

    if edges is None:
        edges = _distinct_edges(triples_ds)
    deg_ref = ray.put(_edge_degrees(edges))

    def partial(t: pa.Table) -> pa.Table:
        d = ray.get(deg_ref)
        a = t["a"].to_pandas()
        b = t["b"].to_pandas()
        df = pd.DataFrame(
            {
                "node": pd.concat([a, b], ignore_index=True),
                "partial": pd.concat(
                    [b.map(d) - 1, a.map(d) - 1], ignore_index=True
                ).astype("int64"),
            }
        )
        g = df.groupby("node", as_index=False)["partial"].sum()
        return pa.table(
            {
                "node": pa.array(g["node"], type=pa.string()),
                "partial": pa.array(g["partial"], type=pa.int64()),
            }
        )

    return (
        edges.map_batches(partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("partial", alias_name="n_two_hop_paths"))
        .map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"].cast(pa.string()),
                    "n_two_hop_paths": t["n_two_hop_paths"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def triangle_count(triples_ds, max_driver_edges: int | None = None, edges=None):
    """Global triangle count of the undirected co-occurrence graph,
    size-dispatched like ``connected_components_auto``:

    - **edge count ≤ cap** (default 200k, ``KAZU_TRI_MAX_DRIVER_EDGES``
      env override): broadcast-adjacency — orient every distinct edge
      low→high, collect the (provably small) edge set into an adjacency
      dict, ``ray.put`` it once, one streaming pass over the edges
      intersects successor lists. Each triangle {a<b<c} is found
      exactly once, at its (a,b) edge.
    - **above the cap**: degree-oriented distributed wedge counting
      (Suri & Vassilvitskii, "Counting triangles and the curse of the
      last reducer", WWW'11). The ONLY broadcast is the node-sized
      degree table (bounded, module docstring); the edge set stays a
      Dataset. Each edge is oriented from its lower-(degree, name)
      endpoint, so every out-neighborhood has O(sqrt(m)) entries and
      wedge generation is O(m^1.5) total; wedges and edges then meet in
      one combiner-friendly ``groupby(a, b).aggregate(Sum)`` — no
      per-group row materialization, so hot closing pairs cost a
      counter, not memory.

    The two paths are tested equal (``tests/test_ops.py``). Returns a
    1-row (n_triangles,) DataFrame."""
    import os

    import ray
    from ray.data.aggregate import Sum

    if max_driver_edges is None:
        max_driver_edges = int(os.environ.get("KAZU_TRI_MAX_DRIVER_EDGES", 200_000))

    if edges is None:
        edges = _distinct_edges(triples_ds)

    n_edges = edges.count()
    if n_edges <= max_driver_edges:
        adj: dict[str, set] = {}
        for row in edges.take_all():
            adj.setdefault(row["a"], set()).add(row["b"])
        adj_ref = ray.put(adj)

        def partial(batch: pa.Table) -> pa.Table:
            graph = ray.get(adj_ref)
            n = 0
            for a, b in zip(batch["a"].to_pylist(), batch["b"].to_pylist()):
                sa, sb = graph.get(a), graph.get(b)
                if sa and sb:
                    n += len(sa & sb)
            return pa.table({"partial": pa.array([n], type=pa.int64())})

        total = edges.map_batches(partial, batch_format="pyarrow").aggregate(
            Sum("partial", alias_name="n_triangles")
        )
        return pd.DataFrame({"n_triangles": [int(total["n_triangles"] or 0)]})

    # ---- distributed path: degree-oriented wedge counting ----
    import numpy as np

    deg = _edge_degrees(edges)
    code, inv = _node_codes(deg)
    dcode = {code[n]: d for n, d in deg.items()}
    code_ref = ray.put(code)
    dcode_ref = ray.put(dcode)
    n_codes = len(inv)

    def orient(t: pa.Table) -> pa.Table:
        c = ray.get(code_ref)
        dc = ray.get(dcode_ref)
        a = t["a"].to_pandas().map(c).astype("int32")
        b = t["b"].to_pandas().map(c).astype("int32")
        da = a.map(dc)
        db = b.map(dc)
        # orient from the lower-(degree, name) endpoint; a<b already
        # (code order == string order)
        fwd = (da < db) | ((da == db) & (a < b))
        return pa.table(
            {
                "src": pa.array(a.where(fwd, b), type=pa.int32()),
                "dst": pa.array(b.where(fwd, a), type=pa.int32()),
            }
        )

    oriented = edges.map_batches(orient, batch_format="pyarrow")

    # wedge generation per hash bucket (exchange_groups; a per-source
    # map_groups paid Python dispatch per NODE): one sort groups each
    # node's out-neighborhood into a contiguous segment, then a numpy
    # triu per segment emits its pairs — the inner loop runs once per
    # node but does no frame construction or Ray dispatch, and each
    # segment is O(sqrt(m)) by the degree orientation. Everything runs
    # on global int32 node codes (the wedge exchange ships ints).
    def wedges_bucket(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy().astype(np.int64)
        dst = t["dst"].to_numpy().astype(np.int64)
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        starts = np.flatnonzero(
            np.concatenate(([True], src[1:] != src[:-1]))
        )
        bounds = np.append(starts, len(src))
        a_parts, b_parts = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            k = e - s
            if k < 2:
                continue
            i, j = np.triu_indices(k, k=1)
            ns = dst[s:e]
            a_parts.append(ns[i])
            b_parts.append(ns[j])
        if not a_parts:
            return _wedge_empty
        # combiner: collapse this bucket's wedges per (a, b) before the
        # closing exchange (one row per distinct pair, w = wedge count)
        key = np.concatenate(a_parts) * n_codes + np.concatenate(b_parts)
        key.sort()
        kstarts = np.flatnonzero(np.concatenate(([True], key[1:] != key[:-1])))
        w = np.diff(np.append(kstarts, len(key))).astype(np.int64)
        uk = key[kstarts]
        return pa.table(
            {
                "a": pa.array((uk // n_codes).astype(np.int32)),
                "b": pa.array((uk % n_codes).astype(np.int32)),
                "w": pa.array(w),
                "e": pa.array(np.zeros(len(uk), dtype=np.int64)),
            }
        )

    _wedge_empty = pa.table(
        {
            "a": pa.array([], type=pa.int32()),
            "b": pa.array([], type=pa.int32()),
            "w": pa.array([], type=pa.int64()),
            "e": pa.array([], type=pa.int64()),
        }
    )

    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    wedge_rows = exchange_groups(
        oriented, ["src"], shuffle_parts(), wedges_bucket, _wedge_empty
    )
    def edge_marker(t: pa.Table) -> pa.Table:
        c = ray.get(code_ref)
        return pa.table(
            {
                "a": pa.array(t["a"].to_pandas().map(c), type=pa.int32()),
                "b": pa.array(t["b"].to_pandas().map(c), type=pa.int32()),
                "w": pa.array([0] * t.num_rows, type=pa.int64()),
                "e": pa.array([1] * t.num_rows, type=pa.int64()),
            }
        )

    edge_rows = edges.map_batches(edge_marker, batch_format="pyarrow")

    def close_pairs_bucket(t: pa.Table) -> pa.Table:
        # e is 0/1 (edges are distinct): triangles at this closing
        # pair = wedge count iff the closing edge exists; hash
        # co-location on the pair makes this bucket-local
        g = t.group_by(["a", "b"]).aggregate([("w", "sum"), ("e", "sum")])
        partial = pa.compute.sum(
            pa.compute.multiply(g["w_sum"], g["e_sum"])
        ).as_py() or 0
        return pa.table({"partial": pa.array([partial], type=pa.int64())})

    closed = exchange_groups(
        wedge_rows.union(edge_rows),
        ["a", "b"],
        shuffle_parts(),
        close_pairs_bucket,
        pa.table({"partial": pa.array([], type=pa.int64())}),
    )
    total = closed.aggregate(Sum("partial", alias_name="n_triangles"))
    return pd.DataFrame({"n_triangles": [int(total["n_triangles"] or 0)]})


def degree_histogram(triples_ds):
    """Degree distribution (degree → node count) — one more combiner on
    top of the existing partial-degree aggregate; the histogram is at
    most max-degree rows."""
    from ray.data.aggregate import Count

    from kazu_ray.stages.materialize import node_degrees

    return (
        node_degrees(triples_ds)
        .groupby("degree")
        .aggregate(Count(alias_name="n_nodes"))
        .map_batches(
            lambda t: pa.table(
                {
                    "degree": t["degree"].cast(pa.int64()),
                    "n_nodes": t["n_nodes"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def degree_assortativity(triples_ds, edges=None):
    """Degree assortativity of the co-occurrence graph — the Pearson
    correlation of endpoint degrees over edges (Newman 2002), the
    hub-mixing summary (negative = hubs attach to leaves, the typical
    web/biology shape; positive = hubs attach to hubs). Reported as a
    1-row integer table ``(n_edge_ends, sum_deg, sum_prod, sum_sq,
    assortativity_ppm)`` — because each undirected edge contributes
    BOTH orientations, Σx = Σy and Σx² = Σy², so the usual sqrt in the
    Pearson denominator collapses to the plain integer
    ``m·Σx² − (Σx)²`` and the whole statistic is exact integer
    arithmetic (ppm, truncated toward zero to match DuckDB's ``//``):

        r_ppm = 10⁶ · (m·Σxy − (Σx)²)  //  (m·Σx² − (Σx)²),  m = 2·|E|

    with x, y the endpoint degrees of each oriented edge; 0 when the
    denominator is 0 (degree-regular graph).

    Shapes: degrees come from the size-dispatched :func:`_edge_degrees`
    (node-sized, the module's documented driver/broadcast contract) and
    broadcast ONCE via ``ray.put``; one streaming pass over the
    distinct-edge Dataset emits a single partial-sums row per batch
    (Σ(da+db), Σ2·da·db, Σ(da²+db²) — sums commute, so per-batch
    aggregation is exact), and the driver folds a blocks-sized table in
    unbounded Python ints (no int64 overflow for any graph whose
    degree² × edges exceeds int64 — the per-batch partials accumulate
    in float-free object arithmetic when the guard trips, loudly
    matching the oracle's HUGEINT sums)."""
    import ray

    if edges is None:
        edges = _distinct_edges(triples_ds)
    deg = _edge_degrees(edges)
    if not deg:
        return pd.DataFrame(
            {
                "n_edge_ends": [0],
                "sum_deg": [0],
                "sum_prod": [0],
                "sum_sq": [0],
                "assortativity_ppm": [0],
            }
        ).astype("int64")
    deg_ref = ray.put(deg)
    int64_max = 2**63 - 1
    # Python int — a numpy int64 here would make the guard product
    # itself wrap before it could trip
    max_deg = int(max(deg.values()))

    def partial(t: pa.Table) -> pa.Table:
        d = ray.get(deg_ref)
        a = t["a"].to_pandas().map(d).to_numpy(np.int64)
        b = t["b"].to_pandas().map(d).to_numpy(np.int64)
        n = len(a)
        # 2× covers the worst partial (sp = 2·Σa·b, sq = Σa²+b² ≤ 2·n·max²);
        # all-Python-int arithmetic so the guard cannot wrap
        if n and 2 * max_deg * max_deg * n > int64_max:
            # exact big-int path (the oracle sums in HUGEINT)
            sp = 2 * sum(int(x) * int(y) for x, y in zip(a, b))
            sq = sum(int(x) * int(x) + int(y) * int(y) for x, y in zip(a, b))
            sd = int(a.sum()) + int(b.sum())
            if max(sp, sq) > int64_max:
                raise OverflowError(
                    "degree_assortativity partial exceeds int64 — shrink "
                    "batches or aggregate in a wider type"
                )
        else:
            sd = int(a.sum() + b.sum())
            sp = int(2 * (a * b).sum())
            sq = int((a * a).sum() + (b * b).sum())
        return pa.table(
            {
                "ends": pa.array([2 * n], type=pa.int64()),
                "sd": pa.array([sd], type=pa.int64()),
                "sp": pa.array([sp], type=pa.int64()),
                "sq": pa.array([sq], type=pa.int64()),
            }
        )

    parts = edges.map_batches(partial, batch_format="pyarrow").to_pandas()
    # fold the blocks-sized partials in unbounded Python ints (a pandas
    # .sum() would re-wrap in int64 exactly where the partials are big)
    m = sum(int(v) for v in parts["ends"])
    sd = sum(int(v) for v in parts["sd"])
    sp = sum(int(v) for v in parts["sp"])
    sq = sum(int(v) for v in parts["sq"])
    num = m * sp - sd * sd
    den = m * sq - sd * sd
    if den == 0:
        r_ppm = 0
    else:
        scaled = 1_000_000 * num
        # truncate toward zero (DuckDB // semantics), not Python floor
        r_ppm = (abs(scaled) // den) * (1 if scaled >= 0 else -1)
    return pd.DataFrame(
        {
            "n_edge_ends": [m],
            "sum_deg": [sd],
            "sum_prod": [sp],
            "sum_sq": [sq],
            "assortativity_ppm": [r_ppm],
        }
    ).astype("int64")


def clustering_coefficient(triples_ds, max_driver_edges: int | None = None, edges=None):
    """Global clustering coefficient of the co-occurrence graph —
    3·triangles / wedges, reported as integer parts-per-million
    (``coeff_ppm = (3·n_triangles·1e6) // n_wedges``) so the SQL oracle
    is hash-exact. Triangles reuse the size-dispatched
    :func:`triangle_count`; the wedge count needs NO wedge enumeration —
    it is Σ_v deg(v)·(deg(v)−1)/2 over the node-sized degree table.
    Returns a 1-row (n_triangles, n_wedges, coeff_ppm) DataFrame."""
    if edges is None:
        edges = _distinct_edges(triples_ds)
    deg = _edge_degrees(edges)
    n_wedges = sum(d * (d - 1) // 2 for d in deg.values())
    n_tri = int(
        triangle_count(triples_ds, max_driver_edges=max_driver_edges, edges=edges)[
            "n_triangles"
        ].iloc[0]
    )
    coeff_ppm = (3 * n_tri * 1_000_000) // n_wedges if n_wedges else 0
    return pd.DataFrame(
        {
            "n_triangles": [n_tri],
            "n_wedges": [n_wedges],
            "coeff_ppm": [coeff_ppm],
        }
    )


def node_triangle_counts(triples_ds, edges=None):
    """Per-node triangle participation counts — the local-clustering /
    anomaly signal (a node in many triangles sits in a dense
    neighborhood). Fully distributed at every size: degree-oriented
    wedge generation exactly as :func:`triangle_count`'s scale path,
    except wedge rows CARRY THEIR CENTER, and the closing-pair check
    runs per hash bucket (wedges and edges co-located by the closing
    pair; bucket state is spill-backed) — each closed wedge
    {center, a, b} is one triangle, found once, crediting all three
    corners. Output is (node, n_triangles) for nodes in ≥1 triangle.

    Like :func:`edge_embeddedness`, the wedge/close path runs on dense
    INT32 node codes (:func:`_node_codes`) — the wedge exchange ships
    3 × int32 instead of 3 strings; the final node-sized aggregate
    decodes back to strings."""
    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    if edges is None:
        edges = _distinct_edges(triples_ds)
    deg = _edge_degrees(edges)
    code, inv = _node_codes(deg)
    dcode = {code[n]: d for n, d in deg.items()}
    code_ref = ray.put(code)
    dcode_ref = ray.put(dcode)
    inv_ref = ray.put(inv)

    def orient(t: pa.Table) -> pa.Table:
        c = ray.get(code_ref)
        dc = ray.get(dcode_ref)
        a = t["a"].to_pandas().map(c).astype("int32")
        b = t["b"].to_pandas().map(c).astype("int32")
        da = a.map(dc)
        db = b.map(dc)
        fwd = (da < db) | ((da == db) & (a < b))
        return pa.table(
            {
                "src": pa.array(a.where(fwd, b), type=pa.int32()),
                "dst": pa.array(b.where(fwd, a), type=pa.int32()),
            }
        )

    oriented = edges.map_batches(orient, batch_format="pyarrow")

    def wedges_bucket(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy()
        dst = t["dst"].to_numpy()
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        starts = np.flatnonzero(np.concatenate(([True], src[1:] != src[:-1])))
        bounds = np.append(starts, len(src))
        a_parts, b_parts, c_parts = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            k = e - s
            if k < 2:
                continue
            i, j = np.triu_indices(k, k=1)
            ns = dst[s:e]
            a_parts.append(ns[i])
            b_parts.append(ns[j])
            c_parts.append(np.full(len(i), src[s], dtype=np.int32))
        if not a_parts:
            return _EE_WEDGE_EMPTY
        return pa.table(
            {
                "a": pa.array(np.concatenate(a_parts), type=pa.int32()),
                "b": pa.array(np.concatenate(b_parts), type=pa.int32()),
                "center": pa.array(np.concatenate(c_parts), type=pa.int32()),
            }
        )

    wedge_rows = exchange_groups(
        oriented, ["src"], shuffle_parts(), wedges_bucket, _EE_WEDGE_EMPTY
    )

    def edge_marker(t: pa.Table) -> pa.Table:
        c = ray.get(code_ref)
        return pa.table(
            {
                "a": pa.array(t["a"].to_pandas().map(c), type=pa.int32()),
                "b": pa.array(t["b"].to_pandas().map(c), type=pa.int32()),
                "center": pa.nulls(t.num_rows, type=pa.int32()),
            }
        )

    edge_rows = edges.map_batches(edge_marker, batch_format="pyarrow")

    def close_bucket(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        is_edge = df["center"].isna()
        e = df[is_edge][["a", "b"]].drop_duplicates()
        w = df[~is_edge].astype({"center": "int32"})
        closed = w.merge(e, on=["a", "b"])
        if closed.empty:
            return _NTC_PARTIAL_EMPTY
        corners = pd.concat(
            [closed["a"], closed["b"], closed["center"]], ignore_index=True
        )
        g = corners.value_counts()
        return pa.table(
            {
                "node": pa.array(g.index.to_numpy(np.int32), type=pa.int32()),
                "partial": pa.array(g.to_numpy(), type=pa.int64()),
            }
        )

    partials = exchange_groups(
        wedge_rows.union(edge_rows), ["a", "b"], shuffle_parts(), close_bucket,
        _NTC_PARTIAL_EMPTY,
    )

    def decode(t: pa.Table) -> pa.Table:
        iv = ray.get(inv_ref)
        return pa.table(
            {
                "node": pa.array(iv[t["node"].to_numpy()], type=pa.string()),
                "n_triangles": t["n_triangles"].cast(pa.int64()),
            }
        )

    return (
        partials.groupby("node")
        .aggregate(Sum("partial", alias_name="n_triangles"))
        .map_batches(decode, batch_format="pyarrow")
    )


_NTC_PARTIAL_EMPTY = pa.table(
    {"node": pa.array([], type=pa.int32()), "partial": pa.array([], type=pa.int64())}
)


def pagerank(triples_ds, n_iters: int = 3, scale: int = 10**12, edges=None):
    """Fixed-iteration PageRank over the undirected co-occurrence graph
    (damping 0.85), kept in INTEGER arithmetic so the result is
    reduction-order independent and the SQL oracle (the same ``n_iters``
    power steps unrolled) matches bit-for-bit:

        rank_0(u)   = scale
        rank_k+1(u) = (15*scale)//100
                      + (85 * SUM_{v in N(u)} (rank_k(v) // deg(v))) // 100

    Each term ``rank_k(v) // deg(v)`` is a deterministic per-edge value
    and integer sums commute, so partial per-batch aggregation is exact.

    Shapes: the rank vector is NODE-sized (bounded, module docstring) —
    it is broadcast via one ``ray.put`` per iteration and updated from a
    node-sized driver collect; the EDGE set stays a Dataset and is
    scanned once per iteration (materialized once up front so iterations
    reuse the shuffled distinct-edge blocks instead of re-deriving them
    from triples). At cluster scale this is the classic
    broadcast-PageRank shape for bounded vocabularies: O(E) streaming
    work per iteration, no per-iteration shuffle of the edge set.
    Nodes whose only co-occurrence is a self-loop have no edges and are
    absent (consistent with the rest of the suite). Returns a
    (node, rank) DataFrame, rank at iteration ``n_iters``.
    """
    import ray
    from ray.data.aggregate import Sum

    if edges is None:
        edges = _distinct_edges(triples_ds)
    deg = _edge_degrees(edges)
    if edges.count() > _graph_max_dict_edges():
        return _power_int(edges, deg, None, n_iters, scale)
    base = (15 * scale) // 100
    ranks = {n: scale for n in deg}

    for _ in range(n_iters):
        state_ref = ray.put((ranks, deg))

        def partial(t: pa.Table) -> pa.Table:
            r, d = ray.get(state_ref)
            a = t["a"].to_pandas()
            b = t["b"].to_pandas()
            # edge (a,b): a receives rank(b)//deg(b), b receives
            # rank(a)//deg(a) — computed vectorized via Series.map
            contrib_to_a = (b.map(r) // b.map(d)).astype("int64")
            contrib_to_b = (a.map(r) // a.map(d)).astype("int64")
            df = pd.DataFrame(
                {
                    "node": pd.concat([a, b], ignore_index=True),
                    "partial": pd.concat(
                        [contrib_to_a, contrib_to_b], ignore_index=True
                    ),
                }
            )
            g = df.groupby("node", as_index=False)["partial"].sum()
            return pa.table(
                {
                    "node": pa.array(g["node"], type=pa.string()),
                    "partial": pa.array(g["partial"], type=pa.int64()),
                }
            )

        sums = (
            edges.map_batches(partial, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("partial", alias_name="s"))
            .to_pandas()
        )
        # every node with an edge has >=1 neighbor, so the groupby
        # covers the full vocabulary — no dangling-node special case
        ranks = {
            n: base + (85 * int(s)) // 100
            for n, s in zip(sums["node"], sums["s"])
        }

    nodes = sorted(ranks)
    return pd.DataFrame({"node": nodes, "rank": [ranks[n] for n in nodes]}).astype(
        {"rank": "int64"}
    )


def personalized_pagerank(
    triples_ds,
    seeds: list | None = None,
    n_seeds: int = 5,
    n_iters: int = 3,
    scale: int = 10**12,
    edges=None,
):
    """Seed-teleport (personalized) PageRank — the standard
    entity-relatedness ranking for a KG: random walks restart at the
    SEED set instead of uniformly, so rank measures proximity to the
    seeds. Same integer recurrence discipline as :func:`pagerank` (every
    term is a deterministic per-edge int, sums commute, so the unrolled
    SQL oracle matches bit-for-bit):

        ppr_0(u)   = scale  if u in seeds else 0
        ppr_k+1(u) = [u in seeds] * (15*scale)//100
                     + (85 * SUM_{v in N(u)} (ppr_k(v) // deg(v))) // 100

    ``seeds=None`` picks the ``n_seeds`` lexicographically-first nodes
    (deterministic, like bfs_distances). Shapes identical to
    :func:`pagerank`: node-sized rank vector broadcast per iteration,
    edge Dataset streamed once per iteration, no per-iteration shuffle.
    Returns (node, rank) for every node with >=1 edge, zeros included.
    """
    import ray
    from ray.data.aggregate import Sum

    if edges is None:
        edges = _distinct_edges(triples_ds)
    deg = _edge_degrees(edges)
    if seeds is None:
        seeds = sorted(deg)[:n_seeds]
    seed_set = {s for s in seeds if s in deg}
    if edges.count() > _graph_max_dict_edges():
        return _power_int(edges, deg, seed_set, n_iters, scale)
    base = (15 * scale) // 100
    ranks = {n: (scale if n in seed_set else 0) for n in deg}

    for _ in range(n_iters):
        state_ref = ray.put((ranks, deg))

        def partial(t: pa.Table) -> pa.Table:
            r, d = ray.get(state_ref)
            a = t["a"].to_pandas()
            b = t["b"].to_pandas()
            contrib_to_a = (b.map(r) // b.map(d)).astype("int64")
            contrib_to_b = (a.map(r) // a.map(d)).astype("int64")
            df = pd.DataFrame(
                {
                    "node": pd.concat([a, b], ignore_index=True),
                    "partial": pd.concat(
                        [contrib_to_a, contrib_to_b], ignore_index=True
                    ),
                }
            )
            g = df.groupby("node", as_index=False)["partial"].sum()
            return pa.table(
                {
                    "node": pa.array(g["node"], type=pa.string()),
                    "partial": pa.array(g["partial"], type=pa.int64()),
                }
            )

        sums = (
            edges.map_batches(partial, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("partial", alias_name="s"))
            .to_pandas()
        )
        ranks = {
            n: (base if n in seed_set else 0) + (85 * int(s)) // 100
            for n, s in zip(sums["node"], sums["s"])
        }

    nodes = sorted(ranks)
    return pd.DataFrame({"node": nodes, "rank": [ranks[n] for n in nodes]}).astype(
        {"rank": "int64"}
    )


def _segment_pair_strips(ns, strip_pairs: int):
    """Yield the ordered pairs (ns[i], ns[j]), i<j, of one wedge
    segment in fixed-size STRIPS of at most ``max(strip_pairs, k-1)``
    pairs each — never materializing the full ``triu_indices(k)``
    index arrays. An at-cap hub (k = 10⁴ under the default RA hub cut)
    would otherwise allocate ~5×10⁷-element int64 index pairs (~1 GB
    transient) in one shot; strips bound the transient to ~strip_pairs
    elements while emitting exactly the same pairs in the same order.
    A single row's pairs (k-1) are never split, so one yield is at
    most ``max(strip_pairs, k-1)`` long."""
    import numpy as np

    k = len(ns)
    r = 0
    while r < k - 1:
        r2, budget = r, 0
        while r2 < k - 1 and budget + (k - 1 - r2) <= strip_pairs:
            budget += k - 1 - r2
            r2 += 1
        if r2 == r:
            r2 = r + 1  # one row alone exceeds the budget: emit it whole
        rows = np.arange(r, r2)
        counts = (k - 1) - rows
        total = int(counts.sum())
        starts = np.cumsum(np.concatenate(([0], counts[:-1])))
        seq = np.arange(total) - np.repeat(starts, counts)
        j = np.repeat(rows + 1, counts) + seq
        yield ns[np.repeat(rows, counts)], ns[j]
        r = r2


def link_prediction(
    triples_ds,
    max_center_degree: int | None = None,
    scale: int = 10**12,
    edges=None,
):
    """Resource-Allocation link prediction (Zhou, Lü & Zhang 2009) over
    the co-occurrence graph: for every NON-adjacent pair (u, w) with at
    least one common neighbor, the common-neighbor count and the
    integer-scaled RA score Σ_{v ∈ N(u)∩N(w)} scale // deg(v)
    (RA ≈ Adamic-Adar but with 1/deg instead of 1/log deg — exactly
    representable in integers, so the SQL oracle is hash-exact).

    Wedge centers above ``max_center_degree`` (default 10_000,
    ``KAZU_LP_MAX_CENTER_DEG`` env override) are EXCLUDED — that is part
    of the operator's contract, applied identically in the SQL oracle:
    a degree-D hub center contributes ~D²/2 candidate pairs each worth
    scale//D ≈ 0, i.e. the skew blowup of wedge enumeration buys no
    signal. This is the standard hub cut for RA/AA at web scale; the
    drop is loud in the contract, not silent.

    Shapes: wedges are generated PER HASH BUCKET of the center (full
    undirected neighborhood, sorted pairs — unlike the triangle path,
    which may degree-orient, every common neighbor must produce its
    wedge here) and PRE-COMBINED per (u, w) inside the bucket before
    leaving it (integer-exact ``np.add.reduceat`` over sorted int-coded
    pair keys), so the second exchange carries at most
    buckets × distinct-pairs rows rather than one row per raw wedge —
    the classic combiner cut, measured 112 s → seconds at 1.6M triples.
    The existing-edge veto is the e-marker union trick (pre-combined
    wedge rows and edge rows meet in ONE second hash exchange keyed on
    the pair — no join, no global sort, no per-group state). Output
    streams as a Dataset of (u, w, n_common, ra_score).
    """
    import os

    import numpy as np
    import ray

    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    if max_center_degree is None:
        max_center_degree = int(os.environ.get("KAZU_LP_MAX_CENTER_DEG", 10_000))
    strip_pairs = int(os.environ.get("KAZU_LP_STRIP_PAIRS", 4_000_000))

    if edges is None:
        edges = _distinct_edges(triples_ds)
    deg = _edge_degrees(edges)
    code, inv = _node_codes(deg)
    # per-code degree vector (node-sized): deg and scale//deg by code
    deg_by_code = np.zeros(len(inv), dtype=np.int64)
    for n, d in deg.items():
        deg_by_code[code[n]] = d
    code_ref = ray.put(code)
    degv_ref = ray.put(deg_by_code)
    inv_ref = ray.put(inv)
    n_codes = len(inv)

    def undirect(t: pa.Table) -> pa.Table:
        c = ray.get(code_ref)
        a = pa.array(t["a"].to_pandas().map(c), type=pa.int32())
        b = pa.array(t["b"].to_pandas().map(c), type=pa.int32())
        return pa.table(
            {
                "center": pa.concat_arrays([a, b]),
                "nbr": pa.concat_arrays([b, a]),
            }
        )

    und = edges.map_batches(undirect, batch_format="pyarrow")

    cap = max_center_degree

    def wedges_bucket(t: pa.Table) -> pa.Table:
        dv = ray.get(degv_ref)
        center = t["center"].to_numpy().astype(np.int64)
        nbr = t["nbr"].to_numpy().astype(np.int64)
        keep = dv[center] <= cap
        center, nbr = center[keep], nbr[keep]
        order = np.lexsort((nbr, center))
        center, nbr = center[order], nbr[order]
        starts = np.flatnonzero(np.concatenate(([True], center[1:] != center[:-1])))
        bounds = np.append(starts, len(center))
        u_parts, w_parts, ra_parts = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            k = e - s
            if k < 2:
                continue
            ns = nbr[s:e]  # sorted, so pairs come out u < w (code order)
            ra_val = scale // dv[center[s]]
            # strip-wise pair generation (no full triu_indices(k)
            # allocation — the at-cap hub transient is bounded by
            # KAZU_LP_STRIP_PAIRS instead of k²/2)
            for su, sw in _segment_pair_strips(ns, strip_pairs):
                u_parts.append(su)
                w_parts.append(sw)
                ra_parts.append(np.full(len(su), ra_val, dtype=np.int64))
        if not u_parts:
            return _LP_EMPTY
        # combiner: collapse this bucket's wedges per (u, w) BEFORE the
        # pair exchange. Sorted-key reduceat keeps the sums in int64
        # (bincount weights would round-trip through float64).
        key = np.concatenate(u_parts) * n_codes + np.concatenate(w_parts)
        ra = np.concatenate(ra_parts)
        order = np.argsort(key, kind="stable")
        ks, ras = key[order], ra[order]
        kstarts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        cn = np.diff(np.append(kstarts, len(ks)))
        ra_sum = np.add.reduceat(ras, kstarts)
        uk = ks[kstarts]
        return pa.table(
            {
                "u": pa.array((uk // n_codes).astype(np.int32)),
                "w": pa.array((uk % n_codes).astype(np.int32)),
                "cn": pa.array(cn.astype(np.int64)),
                "ra": pa.array(ra_sum),
                "e": pa.array(np.zeros(len(uk), dtype=np.int64)),
            }
        )

    wedge_rows = exchange_groups(
        und, ["center"], shuffle_parts(), wedges_bucket, _LP_EMPTY
    )

    def edge_marker(t: pa.Table) -> pa.Table:
        c = ray.get(code_ref)
        return pa.table(
            {
                "u": pa.array(t["a"].to_pandas().map(c), type=pa.int32()),
                "w": pa.array(t["b"].to_pandas().map(c), type=pa.int32()),
                "cn": pa.array([0] * t.num_rows, type=pa.int64()),
                "ra": pa.array([0] * t.num_rows, type=pa.int64()),
                "e": pa.array([1] * t.num_rows, type=pa.int64()),
            }
        )

    edge_rows = edges.map_batches(edge_marker, batch_format="pyarrow")

    def reduce_pairs_bucket(t: pa.Table) -> pa.Table:
        iv = ray.get(inv_ref)
        df = t.to_pandas()
        g = df.groupby(["u", "w"], sort=False).agg(
            n_common=("cn", "sum"), ra_score=("ra", "sum"), _edge=("e", "max")
        )
        g = g[(g["_edge"] == 0) & (g["n_common"] > 0)].reset_index()
        return pa.table(
            {
                "u": pa.array(iv[g["u"].to_numpy(np.int64)], type=pa.string()),
                "w": pa.array(iv[g["w"].to_numpy(np.int64)], type=pa.string()),
                "n_common": pa.array(g["n_common"].to_numpy(np.int64)),
                "ra_score": pa.array(g["ra_score"].to_numpy(np.int64)),
            }
        )

    return exchange_groups(
        wedge_rows.union(edge_rows),
        ["u", "w"],
        shuffle_parts(),
        reduce_pairs_bucket,
        _LP_OUT_EMPTY,
    )


_LP_EMPTY = pa.table(
    {
        "u": pa.array([], type=pa.int32()),
        "w": pa.array([], type=pa.int32()),
        "cn": pa.array([], type=pa.int64()),
        "ra": pa.array([], type=pa.int64()),
        "e": pa.array([], type=pa.int64()),
    }
)

_LP_OUT_EMPTY = pa.table(
    {
        "u": pa.array([], type=pa.string()),
        "w": pa.array([], type=pa.string()),
        "n_common": pa.array([], type=pa.int64()),
        "ra_score": pa.array([], type=pa.int64()),
    }
)


def bfs_distances(triples_ds, n_seeds: int = 5, max_hops: int = 3, edges=None):
    """Multi-source BFS distance (≤ ``max_hops``) from the ``n_seeds``
    lexicographically smallest nodes of the co-occurrence graph — the
    "distance from the core vocabulary" signal, and the general k-hop
    reachability primitive. Deterministic seed rule so the SQL oracle
    (the same Bellman-Ford relaxation unrolled ``max_hops`` times over
    the undirected edge list) reproduces it exactly.

    Shapes: the distance vector is NODE-sized (bounded, module
    docstring) — broadcast once per hop; each hop is ONE streaming pass
    over the edge Dataset emitting per-batch-combined relaxation
    partials, reduced by a node-sized ``groupby.min``. ``max_hops``
    passes total, edge set materialized once. Above the
    open-vocabulary threshold the int-coded fixed-edge-set form
    (:func:`_bfs_int`) runs instead — same relaxation on a numpy
    distance vector. Unreached nodes are absent from the output
    (node, dist)."""
    import ray
    from ray.data.aggregate import Min

    if edges is None:
        edges = _distinct_edges(triples_ds)
    deg = _edge_degrees(edges)
    seeds = sorted(deg)[:n_seeds]
    if edges.count() > _graph_max_dict_edges():
        return _bfs_int(edges, deg, seeds, max_hops)
    dist = {n: 0 for n in seeds}

    for _ in range(max_hops):
        dist_ref = ray.put(dist)

        def partial(t: pa.Table) -> pa.Table:
            d = ray.get(dist_ref)
            a = t["a"].to_pandas()
            b = t["b"].to_pandas()
            cand = pd.DataFrame(
                {
                    "node": pd.concat([a, b], ignore_index=True),
                    "dist": pd.concat(
                        [b.map(d), a.map(d)], ignore_index=True
                    )
                    + 1,
                }
            ).dropna()
            g = cand.groupby("node", as_index=False)["dist"].min()
            return pa.table(
                {
                    "node": pa.array(g["node"], type=pa.string()),
                    "dist": pa.array(g["dist"], type=pa.int64()),
                }
            )

        relaxed = (
            edges.map_batches(partial, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("dist", alias_name="dist"))
            .to_pandas()
        )
        new_dist = dict(dist)
        for n, dv in zip(relaxed["node"], relaxed["dist"]):
            if n not in new_dist or dv < new_dist[n]:
                new_dist[n] = int(dv)
        if new_dist == dist:
            break
        dist = new_dist

    nodes = sorted(dist)
    return pd.DataFrame({"node": nodes, "dist": [dist[n] for n in nodes]}).astype(
        {"dist": "int64"}
    )


def edge_embeddedness(triples_ds, edges=None):
    """Per-EDGE common-neighbor counts (embeddedness / tie strength —
    Granovetter-style strong-tie signal): for every distinct edge, the
    number of triangles it participates in. Same degree-oriented
    center-carrying wedge machinery as :func:`node_triangle_counts`
    (each triangle closes exactly once, O(m^1.5) wedges, no hub cap
    needed), except each closed wedge {center, a, b} credits its THREE
    edges (center,a), (center,b), (a,b) instead of its corners. Edges
    in no triangle report 0 (left join against the edge set via a
    0-partial row per edge). Streams as (a, b, n_common).

    The whole wedge/close path runs on dense INT32 node codes
    (:func:`_node_codes` — code order == string order, so orientation
    and min/max normalization agree with the string contract): wedge
    rows are the layer's largest exchange and 3 × int32 ships ~5×
    fewer bytes than 3 strings, with int-keyed groupbys to match;
    strings reappear only in the edge-sized decode at the output."""
    import numpy as np
    import ray

    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    if edges is None:
        edges = _distinct_edges(triples_ds)
    deg = _edge_degrees(edges)
    code, inv = _node_codes(deg)
    dcode = {code[n]: d for n, d in deg.items()}
    code_ref = ray.put(code)
    dcode_ref = ray.put(dcode)
    inv_ref = ray.put(inv)

    def orient(t: pa.Table) -> pa.Table:
        c = ray.get(code_ref)
        dc = ray.get(dcode_ref)
        a = t["a"].to_pandas().map(c).astype("int32")
        b = t["b"].to_pandas().map(c).astype("int32")
        da = a.map(dc)
        db = b.map(dc)
        fwd = (da < db) | ((da == db) & (a < b))
        return pa.table(
            {
                "src": pa.array(a.where(fwd, b), type=pa.int32()),
                "dst": pa.array(b.where(fwd, a), type=pa.int32()),
            }
        )

    oriented = edges.map_batches(orient, batch_format="pyarrow")

    def wedges_bucket(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy()
        dst = t["dst"].to_numpy()
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        starts = np.flatnonzero(np.concatenate(([True], src[1:] != src[:-1])))
        bounds = np.append(starts, len(src))
        a_parts, b_parts, c_parts = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            k = e - s
            if k < 2:
                continue
            i, j = np.triu_indices(k, k=1)
            ns = dst[s:e]
            a_parts.append(ns[i])
            b_parts.append(ns[j])
            c_parts.append(np.full(len(i), src[s], dtype=np.int32))
        if not a_parts:
            return _EE_WEDGE_EMPTY
        return pa.table(
            {
                "a": pa.array(np.concatenate(a_parts), type=pa.int32()),
                "b": pa.array(np.concatenate(b_parts), type=pa.int32()),
                "center": pa.array(np.concatenate(c_parts), type=pa.int32()),
            }
        )

    wedge_rows = exchange_groups(
        oriented, ["src"], shuffle_parts(), wedges_bucket, _EE_WEDGE_EMPTY
    )

    def edge_marker(t: pa.Table) -> pa.Table:
        c = ray.get(code_ref)
        return pa.table(
            {
                "a": pa.array(t["a"].to_pandas().map(c), type=pa.int32()),
                "b": pa.array(t["b"].to_pandas().map(c), type=pa.int32()),
                "center": pa.nulls(t.num_rows, type=pa.int32()),
            }
        )

    edge_rows = edges.map_batches(edge_marker, batch_format="pyarrow")

    def close_bucket(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        is_edge = df["center"].isna()
        e = df[is_edge][["a", "b"]].drop_duplicates()
        w = df[~is_edge].astype({"center": "int32"})
        closed = w.merge(e, on=["a", "b"])
        # every edge reports, triangle-free ones at 0
        frames = [e.assign(partial=0)]
        if not closed.empty:
            # closed wedge {center, a, b}: credit (a,b) here (it is
            # bucket-local); (center,a)/(center,b) go to the groupby as
            # normalized min/max pairs (code order == string order)
            frames.append(closed[["a", "b"]].assign(partial=1))
            for left, right in (("center", "a"), ("center", "b")):
                lo = closed[[left, right]].min(axis=1)
                hi = closed[[left, right]].max(axis=1)
                frames.append(pd.DataFrame({"a": lo, "b": hi, "partial": 1}))
        out = pd.concat(frames, ignore_index=True)
        g = out.groupby(["a", "b"], as_index=False)["partial"].sum()
        return pa.table(
            {
                "a": pa.array(g["a"], type=pa.int32()),
                "b": pa.array(g["b"], type=pa.int32()),
                "partial": pa.array(g["partial"], type=pa.int64()),
            }
        )

    partials = exchange_groups(
        wedge_rows.union(edge_rows), ["a", "b"], shuffle_parts(), close_bucket,
        _EE_PARTIAL_EMPTY,
    )

    def sum_decode_bucket(t: pa.Table) -> pa.Table:
        iv = ray.get(inv_ref)
        g = t.group_by(["a", "b"]).aggregate([("partial", "sum")])
        # select aggregate output BY NAME (positional rename is fragile
        # across pyarrow versions — see pair_doc_counts.count_bucket)
        return pa.table(
            {
                "a": pa.array(iv[g["a"].to_numpy()], type=pa.string()),
                "b": pa.array(iv[g["b"].to_numpy()], type=pa.string()),
                "n_common": g["partial_sum"].cast(pa.int64()),
            }
        )

    return exchange_groups(
        partials,
        ["a", "b"],
        shuffle_parts(),
        sum_decode_bucket,
        pa.table(
            {
                "a": pa.array([], type=pa.string()),
                "b": pa.array([], type=pa.string()),
                "n_common": pa.array([], type=pa.int64()),
            }
        ),
    )


_EE_WEDGE_EMPTY = pa.table(
    {
        "a": pa.array([], type=pa.int32()),
        "b": pa.array([], type=pa.int32()),
        "center": pa.array([], type=pa.int32()),
    }
)
_EE_PARTIAL_EMPTY = pa.table(
    {
        "a": pa.array([], type=pa.int32()),
        "b": pa.array([], type=pa.int32()),
        "partial": pa.array([], type=pa.int64()),
    }
)


def component_size_histogram(triples_ds):
    """Component-size distribution (size → number of components) — the
    fragmentation signal of the co-occurrence graph. One groupby over
    the node-sized component table from :func:`kg_components` (bounded,
    module docstring), so the histogram is at most max-size rows."""
    comp = kg_components(triples_ds)
    sizes = comp.groupby("component").size()
    hist = sizes.value_counts().sort_index()
    return pd.DataFrame(
        {"size": hist.index.astype("int64"), "n_components": hist.to_numpy()}
    ).astype({"n_components": "int64"})


def _graph_max_dict_edges() -> int:
    """Size-dispatch threshold (distinct undirected edges) between the
    string-keyed forms of the iterative kg graph ops (dict broadcasts —
    right for the bounded ontology vocabulary, where they beat the
    exchange's fixed floor) and the int-coded numpy forms below (the
    ``host_pagerank`` machinery — right for open-vocabulary graphs; the
    1M-host drill measured the dict forms 20-40× slower there because a
    10⁶-entry dict re-deserializes in every task and the driver re-hashes
    the node table every round). Set to 0 to force the int path."""
    import os

    return int(os.environ.get("KAZU_GRAPH_MAX_DICT_EDGES", "200000"))


def _hash_code_nodes(nodes: list, what: str):
    """Collision-checked salted 64-bit codes for a node vocabulary:
    returns (salt, order, sorted_hashes) where ``order`` permutes the
    (sorted) node list into hash order — a node's int code is its
    position in ``sorted_hashes``, so batches can self-encode from the
    string via hash+searchsorted and NOTHING string-keyed is ever
    broadcast (same discipline as ``components_labeled`` /
    ``host_pagerank_from_links``)."""
    arr = np.asarray(nodes, dtype=object)
    for salt in range(16):
        h = pd.util.hash_array(arr, hash_key=f"{salt:016d}")
        if len(np.unique(h)) == len(arr):
            order = np.argsort(h)
            return salt, order, h[order]
    raise RuntimeError(f"{what}: node hashing collided at all 16 salts")


def _encode_edges_ab(edges, salt: int, sorted_hashes: np.ndarray):
    """One-time int coding of a distinct (a, b) edge Dataset: each batch
    hashes its own endpoint strings and searchsorts into the broadcast
    hash table (zero-copy uint64 out of the object store). Materialized
    so every iteration of the caller re-scans int64 codes, not strings."""
    import ray

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
            {"s": pa.array(idx_of(t["a"])), "d": pa.array(idx_of(t["b"]))}
        )

    return edges.map_batches(encode, batch_format="pyarrow").materialize()


_INT_SUM_EMPTY = pa.table(
    {"code": pa.array([], type=pa.int64()), "c": pa.array([], type=pa.int64())}
)


def _reduce_codes(codes: np.ndarray, vals: np.ndarray, ufunc=np.add) -> pa.Table:
    """Per-batch combiner on int codes: sort + reduceat (emits only the
    codes PRESENT in the batch — a bincount would ship a node-sized
    vector per block). ``ufunc`` is the combining ufunc (``np.add`` for
    degree/rank partials, ``np.minimum`` for BFS relaxation)."""
    order = np.argsort(codes, kind="stable")
    cs, vs = codes[order], vals[order]
    starts = np.flatnonzero(np.concatenate(([True], cs[1:] != cs[:-1])))
    return pa.table(
        {"code": pa.array(cs[starts]), "c": pa.array(ufunc.reduceat(vs, starts))}
    )


def _agg_by_code(partials_ds, agg: str = "sum") -> pd.DataFrame:
    """code-keyed hash exchange combining per-batch partials (the
    ``_edge_degrees`` shape on int codes); ``agg`` is the pyarrow
    group_by aggregate name (``sum`` or ``min``)."""
    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    def bucket_agg(t: pa.Table) -> pa.Table:
        g = t.group_by("code").aggregate([("c", agg)])
        return pa.table(
            {"code": g["code"].cast(pa.int64()), "c": g[f"c_{agg}"].cast(pa.int64())}
        )

    return exchange_groups(
        partials_ds, ["code"], shuffle_parts(), bucket_agg, _INT_SUM_EMPTY
    ).to_pandas()


def _sum_by_code(partials_ds) -> pd.DataFrame:
    return _agg_by_code(partials_ds, "sum")


def _kcore_int(edges, deg: dict, k: int, max_rounds: int) -> pd.DataFrame:
    """Int-coded k-core peel for open-vocabulary graphs: nodes coded
    once (salted hash, collision-checked), edges int-coded once and kept
    FIXED — each round broadcasts one node-sized bool ALIVE mask (1 MB
    per 10⁶ nodes, zero-copy) and recomputes alive-induced degrees in a
    single vectorized edge pass + code-keyed exchange. No per-round
    string hashing, no per-round edge materialize, no dict broadcast —
    the 1M-host drill measured the string form at 558 s and this form
    ~20× faster on the same cascade."""
    import ray

    nodes = sorted(deg)
    n = len(nodes)
    salt, order, sorted_hashes = _hash_code_nodes(nodes, "kcore")
    sorted_nodes = np.asarray(nodes, dtype=object)[order]
    int_edges = _encode_edges_ab(edges, salt, sorted_hashes)

    empty = pd.DataFrame({"node": pd.Series([], dtype=object)}).assign(
        deg_in_core=pd.Series([], dtype="int64")
    )

    alive = np.ones(n, dtype=bool)
    rounds = 0
    while True:
        alive_ref = ray.put(alive)

        def partial(t: pa.Table, _ref=alive_ref) -> pa.Table:
            m = ray.get(_ref)
            s = t["s"].to_numpy()
            d = t["d"].to_numpy()
            keep = m[s] & m[d]
            if not keep.any():
                return _INT_SUM_EMPTY
            codes = np.concatenate([s[keep], d[keep]])
            return _reduce_codes(codes, np.ones(len(codes), dtype=np.int64))

        sums = _sum_by_code(
            int_edges.map_batches(partial, batch_format="pyarrow")
        )
        deg_vec = np.zeros(n, dtype=np.int64)
        if len(sums):
            deg_vec[sums["code"].to_numpy(np.int64)] = sums["c"].to_numpy(
                np.int64
            )
        new_alive = alive & (deg_vec >= k)
        if not new_alive.any():
            return empty
        if np.array_equal(new_alive, alive):
            sel = np.flatnonzero(alive)
            out = pd.DataFrame(
                {"node": sorted_nodes[sel], "deg_in_core": deg_vec[sel]}
            ).astype({"deg_in_core": "int64"})
            return out.sort_values("node", ignore_index=True)
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"kcore(k={k}) did not converge within {max_rounds} peel "
                "rounds — raise max_rounds (pathological chain graph?)"
            )
        alive = new_alive


def _power_int(
    edges, deg: dict, seed_set, n_iters: int, scale: int
) -> pd.DataFrame:
    """Int-coded power iteration shared by :func:`pagerank`
    (``seed_set=None`` — uniform teleport) and
    :func:`personalized_pagerank` (teleport confined to the seeds).
    Identical integer recurrence to the dict forms — same per-edge
    ``rank//deg`` terms, same int64 partial-sum envelope (the dict path
    sums in pandas int64 too) — with the iteration state held as flat
    int64 numpy vectors keyed by salted-hash codes: one node-sized
    zero-copy broadcast per iteration instead of a dict that every task
    re-deserializes (measured 242 s → ~20 s on the 1M-host drill). The
    driver-side rank update multiplies in exact Python ints and raises
    loudly if a rank leaves int64."""
    import ray

    nodes = sorted(deg)
    n = len(nodes)
    salt, order, sorted_hashes = _hash_code_nodes(nodes, "pagerank")
    sorted_nodes = np.asarray(nodes, dtype=object)[order]
    deg_vec = np.array([deg[x] for x in nodes], dtype=np.int64)[order]
    int_edges = _encode_edges_ab(edges, salt, sorted_hashes)

    base = (15 * scale) // 100
    if seed_set is None:
        base_vec = np.full(n, base, dtype=np.int64)
        rank = np.full(n, scale, dtype=np.int64)
    else:
        seed_mask = np.array([x in seed_set for x in nodes], dtype=bool)[order]
        base_vec = np.where(seed_mask, base, 0).astype(np.int64)
        rank = np.where(seed_mask, scale, 0).astype(np.int64)

    int64_max = 2**63 - 1
    deg_ref = ray.put(deg_vec)
    for _ in range(n_iters):
        rank_ref = ray.put(rank)

        def partial(t: pa.Table, _r=rank_ref, _d=deg_ref) -> pa.Table:
            r = ray.get(_r)  # zero-copy int64 vectors
            dv = ray.get(_d)
            s = t["s"].to_numpy()
            d = t["d"].to_numpy()
            if len(s) == 0:
                return _INT_SUM_EMPTY
            codes = np.concatenate([s, d])
            contrib = np.concatenate([r[d] // dv[d], r[s] // dv[s]])
            return _reduce_codes(codes, contrib)

        sums = _sum_by_code(
            int_edges.map_batches(partial, batch_format="pyarrow")
        )
        inflow = np.zeros(n, dtype=np.int64)
        if len(sums):
            inflow[sums["code"].to_numpy(np.int64)] = sums["c"].to_numpy(
                np.int64
            )
        upd = base_vec.astype(object) + (85 * inflow.astype(object)) // 100
        if any(int(v) > int64_max for v in upd):
            raise OverflowError(
                "pagerank rank exceeds int64 — lower `scale`"
            )
        rank = upd.astype(np.int64)

    out = pd.DataFrame({"node": sorted_nodes, "rank": rank}).astype(
        {"rank": "int64"}
    )
    return out.sort_values("node", ignore_index=True)


_BFS_INF = np.int64(2**62)


def _bfs_int(edges, deg: dict, seeds: list, max_hops: int) -> pd.DataFrame:
    """Int-coded multi-source BFS for open-vocabulary graphs — same
    relaxation as the dict form of :func:`bfs_distances`, with the
    frontier state held as ONE node-sized int64 distance vector
    (``_BFS_INF`` = unreached) broadcast zero-copy per hop, instead of a
    string-keyed dict that grows node-sized and re-deserializes in every
    task. Each hop: one vectorized pass over the fixed int-coded edge
    set emitting per-batch ``min``-combined relaxation partials, reduced
    by a code-keyed min exchange."""
    import ray

    nodes = sorted(deg)
    n = len(nodes)
    salt, order, sorted_hashes = _hash_code_nodes(nodes, "bfs")
    sorted_nodes = np.asarray(nodes, dtype=object)[order]
    int_edges = _encode_edges_ab(edges, salt, sorted_hashes)

    dist = np.full(n, _BFS_INF, dtype=np.int64)
    seed_h = pd.util.hash_array(
        np.asarray(seeds, dtype=object), hash_key=f"{salt:016d}"
    )
    dist[np.searchsorted(sorted_hashes, seed_h)] = 0

    for _ in range(max_hops):
        dist_ref = ray.put(dist)

        def partial(t: pa.Table, _ref=dist_ref) -> pa.Table:
            dv = ray.get(_ref)  # zero-copy int64 vector
            s = t["s"].to_numpy()
            d = t["d"].to_numpy()
            codes = np.concatenate([s, d])
            src = np.concatenate([dv[d], dv[s]])
            keep = src < _BFS_INF
            if not keep.any():
                return _INT_SUM_EMPTY
            return _reduce_codes(codes[keep], src[keep] + 1, np.minimum)

        relaxed = _agg_by_code(
            int_edges.map_batches(partial, batch_format="pyarrow"), "min"
        )
        new_dist = dist.copy()
        if len(relaxed):
            np.minimum.at(
                new_dist,
                relaxed["code"].to_numpy(np.int64),
                relaxed["c"].to_numpy(np.int64),
            )
        if np.array_equal(new_dist, dist):
            break
        dist = new_dist

    sel = dist < _BFS_INF
    out = pd.DataFrame({"node": sorted_nodes[sel], "dist": dist[sel]}).astype(
        {"dist": "int64"}
    )
    return out.sort_values("node", ignore_index=True)


def kcore(triples_ds, k: int = 4, max_rounds: int = 64, edges=None):
    """Nodes of the k-core of the co-occurrence graph — the standard
    dense-subgraph / influence filter (a node is in the k-core iff it
    keeps ≥ k neighbors after everyone with fewer is recursively
    peeled). Returns (node, deg_in_core) for the surviving nodes,
    sorted by node.

    Shapes: iterative peeling, each round one node-sized degree pass
    (:func:`_edge_degrees` — combiner-first, blocks × nodes partials)
    plus a survivor filter over the edge Dataset. The survivor set is
    broadcast as a SORTED salted-hash uint64 array (collision-checked
    against the full node table on the driver, zero-copy out of the
    object store) and each batch tests membership by hashing its own
    endpoint strings + ``searchsorted`` — nothing string-keyed is ever
    shipped, the same discipline as ``components_labeled``. Rounds to
    fixpoint are bounded by the peel depth (single digits on real
    graphs; a pathological path graph peels one node per round, hence
    the loud ``max_rounds`` guard). The edge Dataset shrinks
    monotonically, so later rounds cost less than the first.

    Size-dispatched (:func:`_graph_max_dict_edges`): above the cap the
    int-coded fixed-edge-set form (:func:`_kcore_int`) runs instead —
    same peel, same result, no per-round string hashing or edge
    materialize."""
    import ray

    if edges is None:
        edges = _distinct_edges(triples_ds)

    empty = pd.DataFrame({"node": pd.Series([], dtype=object)}).assign(
        deg_in_core=pd.Series([], dtype="int64")
    )

    if edges.count() > _graph_max_dict_edges():
        deg0 = _edge_degrees(edges)
        if not deg0:
            return empty
        return _kcore_int(edges, deg0, k, max_rounds)

    rounds = 0
    while True:
        deg = _edge_degrees(edges)
        if not deg:
            return empty
        drop = {n for n, d in deg.items() if d < k}
        if not drop:
            nodes = sorted(deg)
            return pd.DataFrame(
                {"node": nodes, "deg_in_core": [int(deg[n]) for n in nodes]}
            ).astype({"deg_in_core": "int64"})
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"kcore(k={k}) did not converge within {max_rounds} peel "
                "rounds — raise max_rounds (pathological chain graph?)"
            )
        survivors = [n for n in deg if n not in drop]
        if not survivors:
            return empty
        # salted-hash survivor membership: collision-check over ALL
        # current nodes so a dropped node can never collide into a
        # survivor slot
        all_nodes = np.asarray(list(deg), dtype=object)
        for salt in range(16):
            all_h = pd.util.hash_array(all_nodes, hash_key=f"{salt:016d}")
            if len(np.unique(all_h)) == len(all_nodes):
                break
        else:
            raise RuntimeError("kcore: node hashing collided at all 16 salts")
        surv_h = np.sort(
            pd.util.hash_array(np.asarray(survivors, dtype=object),
                               hash_key=f"{salt:016d}")
        )
        surv_ref = ray.put(surv_h)

        def filt(t: pa.Table, _salt=salt, _ref=surv_ref) -> pa.Table:
            sh = ray.get(_ref)

            def member(col) -> np.ndarray:
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                h = pd.util.hash_array(
                    col.to_pandas().to_numpy(), hash_key=f"{_salt:016d}"
                )
                idx = np.searchsorted(sh, h)
                idx_c = np.minimum(idx, len(sh) - 1)
                return (idx < len(sh)) & (sh[idx_c] == h)

            keep = member(t["a"]) & member(t["b"])
            return t.filter(pa.array(keep))

        edges = edges.map_batches(filt, batch_format="pyarrow").materialize()


def node_jaccard(triples_ds, threshold_ppm: int = 200_000, edges=None):
    """Entity similarity by neighbor-set Jaccard — the KG-side
    candidate generator for ontology alignment / entity merge review:
    pairs of nodes whose UNDIRECTED co-occurrence neighbor sets overlap
    with Jaccard ≥ ``threshold_ppm``. Two ids that are really the same
    concept (or a synonym pair the linker failed to merge) co-occur
    with near-identical neighbor sets — the node-level analogue of
    document near-dup, and the same statistic mirror-host detection
    computes over outlink sets.

    Implementation IS that machinery
    (:func:`kazu_ray.ops.web.host_outlink_jaccard`: three hash
    exchanges, intersection sizes riding along the edges, loud
    per-target hub cap ``KAZU_JACCARD_MAX_SRCS_PER_DST``) over the
    symmetrized edge view — emitting each distinct undirected edge in
    both directions makes a node's "outlink set" exactly its neighbor
    set. Returns (node_a, node_b, n_common, jaccard_ppm), node_a <
    node_b, integer ppm (hash-exact vs the SQL oracle)."""
    from kazu_ray.ops.web import host_outlink_jaccard

    if edges is None:
        edges = _distinct_edges(triples_ds)

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t["a"].to_pandas()
        b = t["b"].to_pandas()
        return pa.table(
            {
                "src_host": pa.array(
                    pd.concat([a, b], ignore_index=True), type=pa.string()
                ),
                "dst_host": pa.array(
                    pd.concat([b, a], ignore_index=True), type=pa.string()
                ),
            }
        )

    out = host_outlink_jaccard(
        edges.map_batches(both_dirs, batch_format="pyarrow"),
        threshold_ppm=threshold_ppm,
    )

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node_a": t["host_a"],
                "node_b": t["host_b"],
                "n_common": t["n_common"],
                "jaccard_ppm": t["jaccard_ppm"],
            }
        )

    return out.map_batches(rename, batch_format="pyarrow")


# --- label-propagation communities (Raghavan et al., Phys. Rev. E 2007,
# made deterministic: synchronous rounds, argmax tie -> lexmin label) ------


def _driver_lpa(edge_df: pd.DataFrame, rounds: int) -> pd.DataFrame:
    """Exact synchronous LPA on a driver-sized edge table — the
    reference math the distributed form must equal (and the
    bounded-ontology-vocabulary fast path)."""
    nbrs: dict = {}
    for a, b in zip(edge_df["a"], edge_df["b"]):
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    lbl = {n: n for n in nbrs}
    for _ in range(rounds):
        new = {}
        for n, ns in nbrs.items():
            counts: dict = {}
            for m in ns:
                lm = lbl[m]
                counts[lm] = counts.get(lm, 0) + 1
            new[n] = min(counts, key=lambda v: (-counts[v], v))
        if new == lbl:  # fixed point: every later round is identical
            break
        lbl = new
    nodes = sorted(lbl)
    return pd.DataFrame({"node": nodes, "community": [lbl[n] for n in nodes]})


_LPA_PARTIAL_EMPTY = pa.table(
    {
        "node": pa.array([], type=pa.int64()),
        "lbl": pa.array([], type=pa.int64()),
        "c": pa.array([], type=pa.int64()),
    }
)

_LPA_OUT_EMPTY = pa.table(
    {
        "node": pa.array([], type=pa.int64()),
        "lbl": pa.array([], type=pa.int64()),
    }
)


def _lpa_int(edges, deg: dict, rounds: int) -> pd.DataFrame:
    """Int-coded synchronous LPA for open-vocabulary graphs: nodes
    coded once to their STRING-SORT RANK (hash+searchsorted
    self-encoding composed with the rank permutation — code order ==
    label lexicographic order, so the argmax tie-break "lexmin label"
    is simply "min code"), edges int-coded once and re-scanned per
    round. Each round: the node-sized label vector broadcasts zero-copy
    (``ray.put`` numpy int64); ONE streaming edge pass emits per-batch
    (node, neighbor-label) count partials combined on a composite
    ``node*n + lbl`` key; a node-keyed hash exchange finishes the
    per-(node,label) sums and takes the per-node argmax in the bucket
    (max count, tie -> min label code). Early exit on the fixed point —
    identical to running the fixed ``rounds`` the SQL oracle unrolls."""
    import ray

    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    nodes_sorted = sorted(deg)
    n = len(nodes_sorted)
    if n >= 2**31:
        raise ValueError("label_propagation: composite int64 key needs n < 2^31")
    salt, order, sorted_hashes = _hash_code_nodes(nodes_sorted, "label_propagation")
    rank_of_hashpos = ray.put(order.astype(np.int64))
    enc = _encode_edges_ab(edges, salt, sorted_hashes)

    def to_rank(t: pa.Table) -> pa.Table:
        o = ray.get(rank_of_hashpos)
        return pa.table(
            {
                "s": pa.array(o[t["s"].to_numpy()]),
                "d": pa.array(o[t["d"].to_numpy()]),
            }
        )

    enc = enc.map_batches(to_rank, batch_format="pyarrow").materialize()
    lbl = np.arange(n, dtype=np.int64)

    def bucket_argmax(t: pa.Table) -> pa.Table:
        g = (
            t.to_pandas()
            .groupby(["node", "lbl"], as_index=False)["c"]
            .sum()
            .sort_values(["node", "c", "lbl"], ascending=[True, False, True])
            .drop_duplicates("node")
        )
        return pa.table(
            {
                "node": pa.array(g["node"].to_numpy(np.int64)),
                "lbl": pa.array(g["lbl"].to_numpy(np.int64)),
            }
        )

    for _ in range(rounds):
        lbl_ref = ray.put(lbl)

        def partial(t: pa.Table, _ref=lbl_ref) -> pa.Table:
            lv = ray.get(_ref)
            s = t["s"].to_numpy()
            d = t["d"].to_numpy()
            node = np.concatenate([s, d])
            nl = np.concatenate([lv[d], lv[s]])
            key, cnt = np.unique(node * n + nl, return_counts=True)
            return pa.table(
                {
                    "node": pa.array(key // n),
                    "lbl": pa.array(key % n),
                    "c": pa.array(cnt.astype(np.int64)),
                }
            )

        res = exchange_groups(
            enc.map_batches(partial, batch_format="pyarrow"),
            ["node"],
            shuffle_parts(),
            bucket_argmax,
            _LPA_OUT_EMPTY,
        ).to_pandas()
        new = lbl.copy()
        new[res["node"].to_numpy(np.int64)] = res["lbl"].to_numpy(np.int64)
        if np.array_equal(new, lbl):
            break
        lbl = new
    names = np.asarray(nodes_sorted, dtype=object)
    return pd.DataFrame({"node": names, "community": names[lbl]})


def label_propagation(triples_ds, rounds: int = 3, edges=None):
    """Community detection by deterministic synchronous label
    propagation over the undirected co-occurrence graph — the
    near-linear community pass (Raghavan et al. 2007) between
    connected components (too coarse) and modularity methods (not
    shuffle-friendly). Classic LPA breaks ties randomly and updates
    asynchronously; both are replaced by deterministic rules so the
    unrolled SQL oracle reproduces every round bit-for-bit:
    synchronous rounds, new label = the neighbor label with the
    highest count, ties -> lexicographically smallest label.

    Shapes: size-dispatched like the other iterative ops
    (:func:`kcore` / :func:`bfs_distances`) — driver dict form at or
    below ``KAZU_GRAPH_MAX_DICT_EDGES`` distinct edges, the int-coded
    streaming form (:func:`_lpa_int`) above it: node-sized label
    vector broadcast per round, one edge pass emitting per-batch count
    partials, one node-keyed hash exchange per round for the argmax.
    Returns (node, community) with community = a member node id (the
    usual LPA convention). Fixed ``rounds`` bounds work; early exit on
    the fixed point is output-identical."""
    if edges is None:
        edges = _distinct_edges(triples_ds)
    if edges.count() <= _graph_max_dict_edges():
        return _driver_lpa(edges.to_pandas(), rounds)
    return _lpa_int(edges, _edge_degrees(edges), rounds)


# --- deterministic random-walk corpus (node2vec/DeepWalk-style training
# export, Grover & Leskovec KDD'16 / Perozzi et al. KDD'14, with the
# random choice replaced by a DuckDB-reproducible hash rule) ---------------

_WALK_C_SEED = 1000003
_WALK_C_CUR = 998244353
_WALK_C_STEP = 4294967311
_U64_MASK = (1 << 64) - 1


def _md5_low64(s: str) -> int:
    """SECOND 8 bytes of md5 (little-endian) — identical to DuckDB's
    ``md5_number_lower``, the same sketch-hash rule as
    ``kazu_ray/ops/web.py::host_distinct_outlinks_kmv`` (at production
    scale the md5 would be swapped for a vectorized 64-bit hash; the
    walk algebra is hash-agnostic)."""
    import hashlib

    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:], "little")


def _walk_pick(seed_hv: int, cur_hv: int, step: int, deg: int) -> int:
    """Neighbor index for one walk step: a 64-bit LCG-style mix of the
    seed hash, the current-node hash and the step counter, mod degree.
    Both multipliers are < 2^30 so the DuckDB HUGEINT form of
    ``hv*C + ...`` never overflows int128; numpy uint64 wraparound and
    the explicit ``& _U64_MASK`` here compute the identical value."""
    return (
        (seed_hv * _WALK_C_SEED + cur_hv * _WALK_C_CUR + step * _WALK_C_STEP + 1)
        & _U64_MASK
    ) % deg


def _driver_walks(edge_df: pd.DataFrame, walk_len: int) -> pd.DataFrame:
    """Exact walk generation on a driver-sized edge table — the
    reference math for the distributed form (and the bounded-vocabulary
    fast path)."""
    nbrs: dict = {}
    for a, b in zip(edge_df["a"], edge_df["b"]):
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    for v in nbrs.values():
        v.sort()
    hv = {u: _md5_low64(u) for u in nbrs}
    seeds = sorted(nbrs)
    rows = [(s, 0, s) for s in seeds]
    cur = dict(zip(seeds, seeds))
    for t in range(1, walk_len + 1):
        for s in seeds:
            u = cur[s]
            ns = nbrs[u]
            v = ns[_walk_pick(hv[s], hv[u], t, len(ns))]
            cur[s] = v
            rows.append((s, t, v))
    out = pd.DataFrame(rows, columns=["seed", "step", "node"])
    return out.astype({"step": "int64"})


_WALK_FRONTIER_EMPTY = pa.table(
    {
        "node": pa.array([], type=pa.string()),
        "nbr": pa.array([], type=pa.string()),
        "seed": pa.array([], type=pa.string()),
        "seed_hv": pa.array([], type=pa.uint64()),
    }
)

_WALK_NODES_EMPTY = pa.table({"node": pa.array([], type=pa.string())})


def _walks_dist(edges, walk_len: int):
    """Distributed walk generation: the symmetrized adjacency Dataset
    is materialized once; each step is ONE node-keyed hash exchange
    over adjacency ∪ walker rows (walkers are NODE-scale — one per
    seed — so the exchange is dominated by the adjacency side, the
    same per-round edge-pass cost family as :func:`pagerank`). The
    bucket sees every neighbor of its nodes plus every walker standing
    on them, ranks neighbors by sort order, and moves each walker with
    the deterministic hash pick. Walks never leave the cluster; the
    result streams as (seed, step, node).

    Scale note: adjacency re-enters the exchange each step; pinning it
    in scatter-bucket actors across steps (the BSP-components trick,
    ``ops/dedup.py``) would ship it once — the profitable next step if
    walk_len grows past a handful."""
    import functools

    import ray.data as rd

    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    def sym(t: pa.Table) -> pa.Table:
        a = t["a"].to_pandas()
        b = t["b"].to_pandas()
        both = len(a) + len(b)
        return pa.table(
            {
                "node": pa.array(
                    pd.concat([a, b], ignore_index=True), type=pa.string()
                ),
                "nbr": pa.array(
                    pd.concat([b, a], ignore_index=True), type=pa.string()
                ),
                "seed": pa.array([None] * both, type=pa.string()),
                "seed_hv": pa.array(np.zeros(both, dtype=np.uint64)),
            }
        )

    adj = edges.map_batches(sym, batch_format="pyarrow").materialize()

    def endpoint_nodes(t: pa.Table) -> pa.Table:
        u = pa.concat_arrays(
            [t["a"].combine_chunks().cast(pa.string()),
             t["b"].combine_chunks().cast(pa.string())]
        )
        return pa.table({"node": u}).group_by(["node"]).aggregate([])

    nodes_ds = exchange_groups(
        edges.map_batches(endpoint_nodes, batch_format="pyarrow"),
        ["node"],
        shuffle_parts(),
        _batch_distinct(["node"]),
        _WALK_NODES_EMPTY,
    )

    def out0(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "seed": t["node"].cast(pa.string()),
                "step": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                "node": t["node"].cast(pa.string()),
            }
        )

    outs = [nodes_ds.map_batches(out0, batch_format="pyarrow")]
    frontier = None  # step-1 walkers are generated inside the bucket

    for t_step in range(1, walk_len + 1):

        def step_bucket(t: pa.Table, _t=t_step) -> pa.Table:
            df = t.to_pandas()
            is_adj = df["seed"].isna()
            adj_df = df[is_adj]
            lists = adj_df.groupby("node")["nbr"].agg(
                lambda s: np.sort(s.to_numpy(object))
            )
            if _t == 1:
                walkers = pd.DataFrame({"seed": lists.index.to_numpy(object)})
                walkers["node"] = walkers["seed"]
                walkers["seed_hv"] = np.array(
                    [_md5_low64(s) for s in walkers["seed"]], dtype=np.uint64
                )
            else:
                walkers = df[~is_adj]
            if not len(walkers):
                return _WALK_FRONTIER_EMPTY
            cur_hv = {u: _md5_low64(u) for u in walkers["node"].unique()}
            nxt = [
                lists[u][_walk_pick(int(shv), cur_hv[u], _t, len(lists[u]))]
                for u, shv in zip(walkers["node"], walkers["seed_hv"])
            ]
            k = len(nxt)
            return pa.table(
                {
                    "node": pa.array(nxt, type=pa.string()),
                    "nbr": pa.array([None] * k, type=pa.string()),
                    "seed": pa.array(walkers["seed"], type=pa.string()),
                    "seed_hv": pa.array(
                        walkers["seed_hv"].to_numpy(np.uint64)
                    ),
                }
            )

        feed = adj if frontier is None else adj.union(frontier)
        frontier = exchange_groups(
            feed, ["node"], shuffle_parts(), step_bucket, _WALK_FRONTIER_EMPTY
        ).materialize()

        def to_out(t: pa.Table, _t=t_step) -> pa.Table:
            return pa.table(
                {
                    "seed": t["seed"].cast(pa.string()),
                    "step": pa.array(np.full(t.num_rows, _t, dtype=np.int64)),
                    "node": t["node"].cast(pa.string()),
                }
            )

        outs.append(frontier.map_batches(to_out, batch_format="pyarrow"))
    return functools.reduce(lambda x, y: x.union(y), outs)


def random_walks(triples_ds, walk_len: int = 4, edges=None):
    """Deterministic random-walk corpus over the undirected
    co-occurrence graph — the node2vec/DeepWalk training-data export
    (one walk per node, ``walk_len`` steps; feed the (seed, step,
    node) sequences to a skip-gram embedder). The "random" choice is a
    reproducible hash rule: neighbors ranked by sort order, the step
    picks rank ``mix(md5low(seed), md5low(cur), step) % degree`` with
    ``md5_number_lower``-compatible hashing (:func:`_md5_low64`), so
    the SQL oracle replays every walk exactly and two runs — or an
    incremental re-run over unchanged graph regions — emit identical
    corpora. Seeding the mix with BOTH endpoints keeps co-located
    walkers divergent; a fresh corpus is one constant away.

    Size-dispatched like the other iterative ops: driver dict form at
    or below ``KAZU_GRAPH_MAX_DICT_EDGES`` distinct edges, the BSP
    bucket-actor form (:func:`_walks_bsp` — adjacency ships once,
    rounds exchange walker-sized messages) above it. The node-keyed
    exchange form (:func:`_walks_dist`) is kept as an independent
    formulation the tests hold equal to both."""
    if edges is None:
        edges = _distinct_edges(triples_ds)
    if edges.count() <= _graph_max_dict_edges():
        return _driver_walks(edges.to_pandas(), walk_len)
    return _walks_bsp(edges, walk_len)


# --- k-truss decomposition (Cohen 2008, "Trusses: cohesive subgraphs
# for social network analysis") ---------------------------------------------


def _driver_ktruss(edge_df: pd.DataFrame, k: int) -> pd.DataFrame:
    """Exact k-truss peel on a driver-sized edge table — the reference
    math for the distributed form (and the bounded-ontology-vocabulary
    fast path). Output = surviving (a, b) edges with their UNfiltered
    final in-truss support, so a non-converged run surfaces
    support < k-2 rows and fails an equality gate loudly (the kcore
    convention)."""
    adj: dict = {}
    edges = set()
    for a, b in zip(edge_df["a"], edge_df["b"]):
        edges.add((a, b))
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    need = k - 2
    sup: dict = {}
    while True:
        sup = {(a, b): len(adj[a] & adj[b]) for a, b in edges}
        drop = [e for e, s in sup.items() if s < need]
        if not drop:
            break
        for a, b in drop:
            edges.discard((a, b))
            adj[a].discard(b)
            adj[b].discard(a)
    rows = sorted(edges)
    return pd.DataFrame(
        {
            "a": [r[0] for r in rows],
            "b": [r[1] for r in rows],
            "support": pd.array(
                [sup[r] for r in rows], dtype="int64"
            ),
        }
    )


_TRUSS_SUP_EMPTY = pa.table(
    {
        "u": pa.array([], type=pa.int32()),
        "v": pa.array([], type=pa.int32()),
        "c": pa.array([], type=pa.int64()),
    }
)

_TRUSS_EDGE_EMPTY = pa.table(
    {
        "src": pa.array([], type=pa.int32()),
        "dst": pa.array([], type=pa.int32()),
        "s": pa.array([], type=pa.int64()),
    }
)


def _ktruss_int(edges, k: int, max_rounds: int):
    """Distributed k-truss peel over an int-coded oriented edge
    Dataset. Per round (the truss analogue of the kcore peel, with
    per-EDGE triangle support instead of per-node degree):

    1. wedge pass — the Suri-Vassilvitskii degree orientation from
       :func:`triangle_count` is computed ONCE from the original
       degrees (any fixed total order enumerates each triangle exactly
       once, so survivors keep their orientation as the graph
       shrinks); a src-keyed exchange emits each node's out-neighbor
       pairs in bounded strips (:func:`_segment_pair_strips`),
       CARRYING THE CENTER (support needs all three edges of a closing
       triangle, so wedges cannot pre-combine per pair the way the
       global count does);
    2. closing pass — wedges ∪ edge markers meet in a pair-keyed
       exchange; for each wedge whose pair is a live edge the bucket
       emits +1 support partials for (u,v), (c,u), (c,v), combined
       per bucket before anything moves;
    3. filter pass — support partials ∪ edge markers meet in a second
       pair-keyed exchange; the bucket sums partials and keeps edges
       with support ≥ k-2, emitting (src, dst, support).

    Early exit when no edge drops; at that fixed point the supports
    from the final round ARE the in-truss supports of the surviving
    set, so the emit needs no extra pass. Only node-sized state
    (degree/code tables) is ever broadcast; the edge set stays a
    Dataset end-to-end."""
    import os

    import ray

    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    deg = _edge_degrees(edges)
    code, inv = _node_codes(deg)
    dcode = {code[n]: d for n, d in deg.items()}
    code_ref = ray.put(code)
    dcode_ref = ray.put(dcode)
    n_codes = np.int64(len(inv))
    need = k - 2
    strip_pairs = int(os.environ.get("KAZU_LP_STRIP_PAIRS", 4_000_000))

    def orient(t: pa.Table) -> pa.Table:
        c = ray.get(code_ref)
        dc = ray.get(dcode_ref)
        a = t["a"].to_pandas().map(c).astype("int32")
        b = t["b"].to_pandas().map(c).astype("int32")
        da = a.map(dc)
        db = b.map(dc)
        fwd = (da < db) | ((da == db) & (a < b))
        return pa.table(
            {
                "src": pa.array(a.where(fwd, b), type=pa.int32()),
                "dst": pa.array(b.where(fwd, a), type=pa.int32()),
                "s": pa.array(np.zeros(len(a), dtype=np.int64)),
            }
        )

    cur = edges.map_batches(orient, batch_format="pyarrow").materialize()
    n_cur = cur.count()

    def wedges_bucket(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy().astype(np.int64)
        dst = t["dst"].to_numpy().astype(np.int64)
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        starts = np.flatnonzero(np.concatenate(([True], src[1:] != src[:-1])))
        bounds = np.append(starts, len(src))
        us, vs, cs = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            ns = dst[s:e]  # ascending (lexsort) -> u < v canonical
            for u_arr, v_arr in _segment_pair_strips(ns, strip_pairs):
                us.append(u_arr)
                vs.append(v_arr)
                cs.append(np.full(len(u_arr), src[s], dtype=np.int64))
        if not us:
            return _TRUSS_SUP_EMPTY
        return pa.table(
            {
                "u": pa.array(np.concatenate(us).astype(np.int32)),
                "v": pa.array(np.concatenate(vs).astype(np.int32)),
                "c": pa.array(np.concatenate(cs)),
            }
        )

    def edge_marker_uv(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy()
        dst = t["dst"].to_numpy()
        # c = -1: src < dst (degree orientation agrees with canonical);
        # c = -2: flipped — lets the filter pass re-emit the ORIGINAL
        # degree orientation, preserving the O(sqrt(m)) wedge bound
        # across rounds
        return pa.table(
            {
                "u": pa.array(np.minimum(src, dst), type=pa.int32()),
                "v": pa.array(np.maximum(src, dst), type=pa.int32()),
                "c": pa.array(
                    np.where(src < dst, -1, -2).astype(np.int64)
                ),
            }
        )

    def closing_bucket(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy().astype(np.int64)
        v = t["v"].to_numpy().astype(np.int64)
        c = t["c"].to_numpy()
        is_edge = c < 0
        live = np.zeros(0, dtype=np.int64)
        if is_edge.any():
            live = (u[is_edge] * n_codes + v[is_edge])
            live.sort()
        w = ~is_edge
        if not w.any() or not len(live):
            return _TRUSS_SUP_EMPTY
        wk = u[w] * n_codes + v[w]
        pos = np.searchsorted(live, wk)
        pos[pos == len(live)] = 0
        closed = live[pos] == wk
        if not closed.any():
            return _TRUSS_SUP_EMPTY
        cu, cv, cc = u[w][closed], v[w][closed], c[w][closed]
        # +1 for the closing pair (cu,cv) and the two center edges
        xs = np.concatenate([cu, np.minimum(cc, cu), np.minimum(cc, cv)])
        ys = np.concatenate([cv, np.maximum(cc, cu), np.maximum(cc, cv)])
        key = xs * n_codes + ys
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "u": pa.array((uk // n_codes).astype(np.int32)),
                "v": pa.array((uk % n_codes).astype(np.int32)),
                "c": pa.array(cnt.astype(np.int64)),
            }
        )

    def filter_bucket(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        is_edge = df["c"] < 0
        sup = (
            df[~is_edge]
            .groupby(["u", "v"], as_index=False)["c"]
            .sum()
            .set_index(["u", "v"])["c"]
        )
        ed = df[is_edge]
        if not len(ed):
            return _TRUSS_EDGE_EMPTY
        idx = pd.MultiIndex.from_arrays([ed["u"], ed["v"]])
        s = sup.reindex(idx, fill_value=0).to_numpy(np.int64)
        keep = s >= need
        u = ed["u"].to_numpy(np.int32)[keep]
        v = ed["v"].to_numpy(np.int32)[keep]
        fwd = ed["c"].to_numpy()[keep] == -1
        return pa.table(
            {
                "src": pa.array(np.where(fwd, u, v).astype(np.int32)),
                "dst": pa.array(np.where(fwd, v, u).astype(np.int32)),
                "s": pa.array(s[keep]),
            }
        )

    parts = shuffle_parts()
    for _ in range(max_rounds):
        wedge_rows = cur.map_batches(
            lambda t: t.select(["src", "dst"]), batch_format="pyarrow"
        )
        wedges = exchange_groups(
            wedge_rows, ["src"], parts, wedges_bucket, _TRUSS_SUP_EMPTY
        )
        markers = cur.map_batches(edge_marker_uv, batch_format="pyarrow")
        partials = exchange_groups(
            wedges.union(markers), ["u", "v"], parts, closing_bucket,
            _TRUSS_SUP_EMPTY,
        )
        # the filter pass re-keys on the CANONICAL pair; markers carry
        # the oriented edge through as (u,v,c=-1) rows
        nxt = exchange_groups(
            partials.union(markers), ["u", "v"], parts, filter_bucket,
            _TRUSS_EDGE_EMPTY,
        ).materialize()
        # the three chained exchanges emit ~3× the input's block count
        # per round (sort-form output blocks ride the union's); coalesce
        # back to a size-appropriate count or block-count growth turns
        # geometric and round cost explodes (measured 3× per round)
        from kazu_ray.ops.exchange import auto_partition_count

        target_blocks = max(parts, auto_partition_count(nxt.size_bytes()))
        if nxt.num_blocks() > 2 * target_blocks:
            nxt = nxt.repartition(target_blocks).materialize()
        n_nxt = nxt.count()
        if n_nxt == n_cur:
            cur = nxt
            break
        cur, n_cur = nxt, n_nxt

    inv_ref = ray.put(np.asarray(inv, dtype=object))

    def decode(t: pa.Table) -> pa.Table:
        iv = ray.get(inv_ref)
        # cur carries the degree orientation; canonicalize to a < b
        # (code order == string order) for the output contract
        src = t["src"].to_numpy()
        dst = t["dst"].to_numpy()
        return pa.table(
            {
                "a": pa.array(iv[np.minimum(src, dst)], type=pa.string()),
                "b": pa.array(iv[np.maximum(src, dst)], type=pa.string()),
                "support": t["s"].cast(pa.int64()),
            }
        )

    return cur.map_batches(decode, batch_format="pyarrow")


def ktruss(triples_ds, k: int = 4, max_rounds: int = 32, edges=None):
    """k-truss decomposition of the undirected co-occurrence graph —
    the edge-cohesion analogue of :func:`kcore` (Cohen 2008): the
    maximal subgraph in which every edge closes at least k-2 triangles
    WITHIN the subgraph. Stricter than k-core (a k-truss is always
    inside a (k-1)-core) and the standard dense-community / spam-farm
    detector on co-occurrence and web graphs.

    Returns the surviving (a, b) edges with their final in-truss
    support — unfiltered, so a hypothetical non-converged run emits
    support < k-2 rows and fails equality gates loudly rather than
    masking (the kcore convention). Size-dispatched like the other
    iterative ops: exact driver peel at or below
    ``KAZU_GRAPH_MAX_DICT_EDGES`` distinct edges, the per-round
    3-exchange wedge/closing/filter form (:func:`_ktruss_int`) above
    it."""
    if edges is None:
        edges = _distinct_edges(triples_ds)
    if edges.count() <= _graph_max_dict_edges():
        return _driver_ktruss(edges.to_pandas(), k)
    return _ktruss_int(edges, k, max_rounds)


# --- per-node neighborhood-size estimation (the HyperANF / ANF idea —
# Palmer et al. KDD'02, Boldi & Vigna WWW'11 — carried by KMV sketches
# so the estimate is DETERMINISTIC and SQL-replayable) ----------------------


def _driver_nbhood_kmv(edge_df: pd.DataFrame, hops: int, k: int) -> pd.DataFrame:
    """Exact KMV-sketch propagation on a driver-sized edge table — the
    reference math for the distributed form (and the bounded-vocabulary
    fast path)."""
    nbrs: dict = {}
    for a, b in zip(edge_df["a"], edge_df["b"]):
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    sk = {u: (_md5_low64(u),) for u in nbrs}
    for _ in range(hops):
        new = {}
        for u, ns in nbrs.items():
            merged = set(sk[u])
            for v in ns:
                merged.update(sk[v])
            new[u] = tuple(sorted(merged)[:k])
        sk = new
    nodes = sorted(sk)
    n_hashes = [len(sk[u]) for u in nodes]
    est = [
        n if n < k else (k - 1) * 2**64 // sk[u][-1]
        for u, n in zip(nodes, n_hashes)
    ]
    return pd.DataFrame(
        {
            "node": nodes,
            "n_hashes": pd.array(n_hashes, dtype="int64"),
            "est_size": pd.array(est, dtype="int64"),
        }
    )


_NBH_ROW_EMPTY = pa.table(
    {
        "node": pa.array([], type=pa.string()),
        "other": pa.array([], type=pa.string()),
        "hv": pa.array([], type=pa.uint64()),
    }
)

_NBH_OUT_EMPTY = pa.table(
    {
        "node": pa.array([], type=pa.string()),
        "n_hashes": pa.array([], type=pa.int64()),
        "est_size": pa.array([], type=pa.int64()),
    }
)


def _nbhood_kmv_dist(edges, hops: int, k: int, on_sketch=None, finalize=True):
    """Distributed KMV propagation: the sketch is a flat (node, hv)
    Dataset (≤ k rows per node); each hop is TWO node-keyed exchanges —
    a scatter pass co-locating every node's sketch with its adjacency
    rows and emitting each entry to every neighbor (plus a self-retain
    row), then a k-min pass keeping the k smallest distinct hashes per
    node. One finalize exchange computes (n_hashes, est_size). Nothing
    node-vocabulary-sized is ever broadcast; the per-round exchange
    volume is ≤ (2·|E| + |V|)·k rows. A degree-d hub emits d·k rows
    inside one scatter bucket — bounded by k· the same hub skew every
    edge pass in this layer already carries, and orders of magnitude
    below shipping the hub's true neighbor SET (the thing the sketch
    replaces).

    ``on_sketch(hop, sketch_ds)`` is called with the materialized
    sketch after init (hop 0) and after every hop —
    :func:`neighborhood_function` uses it to total per-hop estimates
    without a second propagation. ``finalize=False`` skips the
    per-node output pass (callback-only use)."""
    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    parts = shuffle_parts()

    def sym(t: pa.Table) -> pa.Table:
        a = t["a"].to_pandas()
        b = t["b"].to_pandas()
        both = len(a) + len(b)
        return pa.table(
            {
                "node": pa.array(
                    pd.concat([a, b], ignore_index=True), type=pa.string()
                ),
                "other": pa.array(
                    pd.concat([b, a], ignore_index=True), type=pa.string()
                ),
                "hv": pa.array(np.zeros(both, dtype=np.uint64)),
            }
        )

    adj = edges.map_batches(sym, batch_format="pyarrow").materialize()

    def init_sketch(t: pa.Table) -> pa.Table:
        nodes = t["node"].to_pylist()
        return pa.table(
            {
                "node": pa.array(nodes, type=pa.string()),
                "other": pa.array([None] * len(nodes), type=pa.string()),
                "hv": pa.array(
                    np.array([_md5_low64(n) for n in nodes], dtype=np.uint64)
                ),
            }
        )

    nodes_ds = exchange_groups(
        adj.map_batches(
            lambda t: t.select(["node"]).group_by(["node"]).aggregate([]),
            batch_format="pyarrow",
        ),
        ["node"],
        parts,
        _batch_distinct(["node"]),
        pa.table({"node": pa.array([], type=pa.string())}),
    )
    sketch = nodes_ds.map_batches(init_sketch, batch_format="pyarrow").materialize()

    def scatter_bucket(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        is_adj = df["other"].notna()
        sk = df[~is_adj]
        if not len(sk):
            return _NBH_ROW_EMPTY
        # each sketch entry of u goes to every neighbor of u, plus a
        # self-retain row
        sent = sk.merge(
            df[is_adj][["node", "other"]], on="node", how="inner"
        )
        out = pd.DataFrame(
            {
                "node": pd.concat(
                    [sent["other_y"], sk["node"]], ignore_index=True
                ),
                "hv": pd.concat([sent["hv"], sk["hv"]], ignore_index=True),
            }
        )
        # per-destination k-min COMBINER before the shuffle — lossless
        # (the k-min of a union equals the k-min of per-source k-mins)
        # but NOT free: on a low-degree graph each destination already
        # receives ~1 row per source bucket, so the sort+truncate just
        # burns CPU (measured 83 s → 160 s on the degree-8 drill graph
        # when applied unconditionally). Combine only when this
        # bucket's fan-in is hub-heavy enough that truncation actually
        # shrinks the exchange.
        if len(out) > 4 * k * out["node"].nunique():
            out = (
                out.drop_duplicates()
                .sort_values(["node", "hv"])
                .groupby("node")
                .head(k)
            )
        return pa.table(
            {
                "node": pa.array(out["node"], type=pa.string()),
                "other": pa.array([None] * len(out), type=pa.string()),
                "hv": pa.array(out["hv"].to_numpy(np.uint64)),
            }
        )

    def kmin_bucket(t: pa.Table) -> pa.Table:
        df = (
            t.to_pandas()[["node", "hv"]]
            .drop_duplicates()
            .sort_values(["node", "hv"])
            .groupby("node")
            .head(k)
        )
        return pa.table(
            {
                "node": pa.array(df["node"], type=pa.string()),
                "other": pa.array([None] * len(df), type=pa.string()),
                "hv": pa.array(df["hv"].to_numpy(np.uint64)),
            }
        )

    if on_sketch is not None:
        on_sketch(0, sketch)
    for hop in range(1, hops + 1):
        fanned = exchange_groups(
            sketch.union(adj), ["node"], parts, scatter_bucket, _NBH_ROW_EMPTY
        )
        sketch = exchange_groups(
            fanned, ["node"], parts, kmin_bucket, _NBH_ROW_EMPTY
        ).materialize()
        if on_sketch is not None:
            on_sketch(hop, sketch)
    if not finalize:
        return None

    def finalize_bucket(t: pa.Table) -> pa.Table:
        out_n, out_c, out_e = [], [], []
        df = t.to_pandas().sort_values(["node", "hv"])
        for node, g in df.groupby("node", sort=True):
            vals = g["hv"].to_numpy(np.uint64)
            n = len(vals)
            out_n.append(node)
            out_c.append(n)
            out_e.append(n if n < k else (k - 1) * 2**64 // int(vals[k - 1]))
        return pa.table(
            {
                "node": pa.array(out_n, type=pa.string()),
                "n_hashes": pa.array(out_c, type=pa.int64()),
                "est_size": pa.array(out_e, type=pa.int64()),
            }
        )

    return exchange_groups(
        sketch, ["node"], parts, finalize_bucket, _NBH_OUT_EMPTY
    )


def neighborhood_size_kmv(triples_ds, hops: int = 2, k: int = 8, edges=None):
    """Per-node ≤``hops``-hop neighborhood-size estimate over the
    undirected co-occurrence graph — the ANF / HyperANF question ("how
    big is each node's ball?", the centrality/spam signal exact BFS
    cannot answer per-node at web scale) carried by KMV sketches
    instead of HyperLogLog so the result is a deterministic integer the
    SQL oracle replays BIT-FOR-BIT: the per-node state is the k
    smallest ``md5_number_lower``-compatible hashes of the node ids
    seen so far (self at hop 0), each hop merges every neighbor's
    sketch (union + truncate — lossless for the k smallest), and the
    estimator is the textbook (k-1)·2⁶⁴ / h_(k) (Bar-Yossef et al.,
    RANDOM'02), EXACT below k entries. Returns (node, n_hashes,
    est_size).

    Size-dispatched like the other iterative ops: exact driver
    propagation at or below ``KAZU_GRAPH_MAX_DICT_EDGES`` distinct
    edges, the two-exchanges-per-hop flat-sketch form
    (:func:`_nbhood_kmv_dist`) above it."""
    if edges is None:
        edges = _distinct_edges(triples_ds)
    if edges.count() <= _graph_max_dict_edges():
        return _driver_nbhood_kmv(edges.to_pandas(), hops, k)
    return _nbhood_kmv_dist(edges, hops, k)


# --- entity-merge canonicalization (the KG-construction step after
# similarity candidates: cluster merge candidates, canonicalize every
# triple endpoint to its cluster's lexmin member, re-distinct) -------------


def entity_merge(triples_ds, threshold_ppm: int = 600_000, edges=None):
    """Entity canonicalization by neighbor-similarity merging — the
    resolution pass a KG-construction pipeline runs between linking and
    materialize: :func:`node_jaccard` proposes merge candidates (nodes
    whose co-occurrence neighborhoods overlap ≥ ``threshold_ppm``),
    :func:`components_labeled` closes them transitively into clusters
    labeled by their lexmin member, and one streaming pass rewrites
    every triple endpoint to its cluster's canonical id and re-counts
    the collapsed triples. Returns (subj, pred, obj,
    n_source_triples) — the canonical triple set with how many source
    rows merged into each.

    Shapes: the merge map is bounded by the CANDIDATE-PAIR contract
    (node_jaccard's similarity join is hub-capped and
    threshold-filtered — candidates are a vanishing fraction of the
    vocabulary, the same boundedness argument as the dedup layer's
    cluster-representative broadcast), so it collects driver-side and
    broadcasts once via ``ray.put``; the triples stream through one
    vectorized map + a combiner-first hash exchange for the re-count.
    Nothing corpus- or vocabulary-sized is collected."""
    import ray

    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    if edges is None:
        edges = _distinct_edges(triples_ds)
    cands = node_jaccard(None, threshold_ppm=threshold_ppm, edges=edges)
    labels = components_labeled(cands, a_col="node_a", b_col="node_b")
    lbl = labels.to_pandas()  # candidate-bounded (docstring contract)
    merge_map = {
        n: c for n, c in zip(lbl["node"], lbl["component"]) if n != c
    }
    map_ref = ray.put(merge_map)

    def rewrite_count(t: pa.Table) -> pa.Table:
        m = ray.get(map_ref)
        subj = t["subj"].to_pandas()
        obj = t["obj"].to_pandas()
        if m:
            subj = subj.map(m).fillna(subj)
            obj = obj.map(m).fillna(obj)
        g = (
            pd.DataFrame(
                {"subj": subj, "pred": t["pred"].to_pandas(), "obj": obj}
            )
            .groupby(["subj", "pred", "obj"], as_index=False)
            .size()
        )
        return pa.table(
            {
                "subj": pa.array(g["subj"], type=pa.string()),
                "pred": pa.array(g["pred"], type=pa.string()),
                "obj": pa.array(g["obj"], type=pa.string()),
                "n": pa.array(g["size"].to_numpy(np.int64)),
            }
        )

    def sum_bucket(t: pa.Table) -> pa.Table:
        g = t.group_by(["subj", "pred", "obj"]).aggregate([("n", "sum")])
        return pa.table(
            {
                "subj": g["subj"],
                "pred": g["pred"],
                "obj": g["obj"],
                "n_source_triples": g["n_sum"].cast(pa.int64()),
            }
        )

    return exchange_groups(
        triples_ds.map_batches(rewrite_count, batch_format="pyarrow"),
        ["subj", "pred", "obj"],
        shuffle_parts(),
        sum_bucket,
        pa.table(
            {
                "subj": pa.array([], type=pa.string()),
                "pred": pa.array([], type=pa.string()),
                "obj": pa.array([], type=pa.string()),
                "n_source_triples": pa.array([], type=pa.int64()),
            }
        ),
    )


def _driver_nbhood_function(edge_df: pd.DataFrame, max_hops: int, k: int) -> pd.DataFrame:
    """Exact per-hop neighborhood-function totals on a driver-sized
    edge table — one propagation, a snapshot total per hop."""
    nbrs: dict = {}
    for a, b in zip(edge_df["a"], edge_df["b"]):
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    sk = {u: (_md5_low64(u),) for u in nbrs}

    def total() -> int:
        return sum(
            len(v) if len(v) < k else (k - 1) * 2**64 // v[-1]
            for v in sk.values()
        )

    rows = [(0, total())]
    for t in range(1, max_hops + 1):
        new = {}
        for u, ns in nbrs.items():
            merged = set(sk[u])
            for v in ns:
                merged.update(sk[v])
            new[u] = tuple(sorted(merged)[:k])
        sk = new
        rows.append((t, total()))
    return pd.DataFrame(rows, columns=["hop", "sum_est_size"]).astype(
        {"hop": "int64", "sum_est_size": "int64"}
    )


def neighborhood_function(triples_ds, max_hops: int = 3, k: int = 8, edges=None):
    """The neighborhood function N(t) (Palmer et al. KDD'02 ANF /
    Boldi & Vigna HyperANF): for each hop t = 0..``max_hops``, the sum
    over all nodes of the estimated ≤t-hop ball size — the curve whose
    saturation point is the graph's effective diameter and whose shape
    separates expander-like from clustered webgraphs. Same
    deterministic KMV machinery as :func:`neighborhood_size_kmv`
    (exact below k, SQL-replayable estimator), ONE propagation with a
    per-hop total. Returns (hop, sum_est_size).

    Shapes: size-dispatched; the distributed form reuses
    :func:`_nbhood_kmv_dist` via its ``on_sketch`` hook — per hop, one
    extra node-keyed exchange computes bucket-local estimate sums and
    the driver adds up the bucket partials (a buckets-sized table)."""
    from ray.data.aggregate import Sum

    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    if edges is None:
        edges = _distinct_edges(triples_ds)
    if edges.count() <= _graph_max_dict_edges():
        return _driver_nbhood_function(edges.to_pandas(), max_hops, k)

    totals: dict[int, int] = {}

    def total_bucket(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["node", "hv"])
        s = 0
        for _node, g in df.groupby("node", sort=False):
            vals = g["hv"].to_numpy(np.uint64)
            n = len(vals)
            s += n if n < k else (k - 1) * 2**64 // int(vals[k - 1])
        return pa.table({"partial": pa.array([s], type=pa.int64())})

    def on_sketch(hop: int, sketch) -> None:
        agg = exchange_groups(
            sketch,
            ["node"],
            shuffle_parts(),
            total_bucket,
            pa.table({"partial": pa.array([], type=pa.int64())}),
        ).aggregate(Sum("partial", alias_name="s"))
        totals[hop] = int(agg["s"] or 0)

    _nbhood_kmv_dist(edges, max_hops, k, on_sketch=on_sketch, finalize=False)
    hops_sorted = sorted(totals)
    return pd.DataFrame(
        {
            "hop": pd.array(hops_sorted, dtype="int64"),
            "sum_est_size": pd.array(
                [totals[h] for h in hops_sorted], dtype="int64"
            ),
        }
    )


class _WalkBucket:
    """One hash bucket of the BSP random-walk engine: holds the sorted
    adjacency of every node hashing here for the WHOLE computation
    (shipped once), plus the walkers currently standing on its nodes.
    Each round it moves its walkers with the deterministic hash rule
    and pushes them pre-routed straight to the owning peer actors —
    per-round exchange volume is WALKER-sized (one row per seed), never
    the adjacency. Plain-Python class, wrapped by ``ray.remote`` at
    import (the ``_CCBucket`` pattern, ops/dedup.py)."""

    def __init__(self, idx: int, n_buckets: int):
        self.idx = idx
        self.n = n_buckets
        self._chunks: list = []
        self.received = 0
        self.inbox: list = []

    def add(self, table) -> int:
        self._chunks.append(table)
        self.received += table.num_rows
        return table.num_rows

    def received_rows(self) -> int:
        return self.received

    def seal(self) -> int:
        import numpy as np
        import pyarrow as pa

        self.out_seed: list = []
        self.out_step: list = []
        self.out_node: list = []
        if not self._chunks:
            self.node_arr = np.empty(0, dtype=object)
            self.offsets = np.zeros(1, dtype=np.int64)
            self.nbrs = np.empty(0, dtype=object)
            self.node_hv = np.empty(0, dtype=np.uint64)
            self.w_seed = np.empty(0, dtype=object)
            self.w_seed_hv = np.empty(0, dtype=np.uint64)
            self.w_cur_idx = np.empty(0, dtype=np.int64)
            return 0
        t = pa.concat_tables(self._chunks)
        self._chunks = []
        node = t["node"].to_pandas().to_numpy()
        nbr = t["nbr"].to_pandas().to_numpy()
        order = np.lexsort((nbr, node))
        node, self.nbrs = node[order], nbr[order]
        starts = np.flatnonzero(
            np.concatenate(([True], node[1:] != node[:-1]))
        )
        self.node_arr = node[starts]
        self.offsets = np.append(starts, len(node)).astype(np.int64)
        self.node_hv = np.array(
            [_md5_low64(s) for s in self.node_arr], dtype=np.uint64
        )
        # walkers init: one per own node, standing on its seed
        self.w_seed = self.node_arr.copy()
        self.w_seed_hv = self.node_hv.copy()
        self.w_cur_idx = np.arange(len(self.node_arr), dtype=np.int64)
        self.out_seed.append(self.node_arr)
        self.out_step.append(np.zeros(len(self.node_arr), dtype=np.int64))
        self.out_node.append(self.node_arr)
        return len(self.node_arr)

    def step(self, peers, t: int) -> list:
        import numpy as np
        import pyarrow as pa

        from kazu_ray.functions.hashing import bucket_ids

        if not len(self.w_seed):
            return []
        idx = self.w_cur_idx
        deg = (self.offsets[idx + 1] - self.offsets[idx]).astype(np.uint64)
        mix = (
            self.w_seed_hv * np.uint64(_WALK_C_SEED)
            + self.node_hv[idx] * np.uint64(_WALK_C_CUR)
            + np.uint64(t) * np.uint64(_WALK_C_STEP)
            + np.uint64(1)
        )
        pick = (mix % deg).astype(np.int64)
        nxt = self.nbrs[self.offsets[idx] + pick]
        self.out_seed.append(self.w_seed)
        self.out_step.append(np.full(len(nxt), t, dtype=np.int64))
        self.out_node.append(nxt)
        buckets = bucket_ids(pa.array(nxt, type=pa.string()), self.n)
        refs = []
        for j in np.unique(buckets):
            m = buckets == j
            refs.append(
                peers[int(j)].accept.remote(
                    pa.table(
                        {
                            "seed": pa.array(self.w_seed[m], type=pa.string()),
                            "seed_hv": pa.array(self.w_seed_hv[m]),
                            "cur": pa.array(nxt[m], type=pa.string()),
                        }
                    )
                )
            )
        self.w_seed = np.empty(0, dtype=object)
        self.w_seed_hv = np.empty(0, dtype=np.uint64)
        self.w_cur_idx = np.empty(0, dtype=np.int64)
        return refs

    def accept(self, table) -> int:
        self.inbox.append(table)
        return table.num_rows

    def fold(self) -> int:
        import numpy as np
        import pyarrow as pa

        if not self.inbox:
            return 0
        m = pa.concat_tables(self.inbox)
        self.inbox = []
        self.w_seed = m["seed"].to_pandas().to_numpy()
        self.w_seed_hv = m["seed_hv"].to_numpy(zero_copy_only=False).astype(
            np.uint64
        )
        cur = m["cur"].to_pandas().to_numpy()
        self.w_cur_idx = np.searchsorted(self.node_arr, cur).astype(np.int64)
        return len(self.w_seed)

    def result(self):
        import numpy as np
        import pyarrow as pa

        return pa.table(
            {
                "seed": pa.array(
                    np.concatenate(self.out_seed) if self.out_seed
                    else np.empty(0, dtype=object),
                    type=pa.string(),
                ),
                "step": pa.array(
                    np.concatenate(self.out_step) if self.out_step
                    else np.empty(0, dtype=np.int64)
                ),
                "node": pa.array(
                    np.concatenate(self.out_node) if self.out_node
                    else np.empty(0, dtype=object),
                    type=pa.string(),
                ),
            }
        )


import ray as _walk_ray_mod

_WALK_BUCKET_CLS = _walk_ray_mod.remote(num_cpus=0)(_WalkBucket)


def _walks_bsp(edges, walk_len: int):
    """Scale path for :func:`random_walks`: the adjacency ships ONCE
    into hash-bucket actors (the ``connected_components_distributed``
    BSP mechanics — feed/verify, peer-to-peer pushes, driver awaits the
    accept refs to avoid push-waits-on-push deadlock); each of the
    ``walk_len`` rounds moves one walker per seed directly between
    owning actors. Per-round exchange volume = |V| walker rows vs the
    exchange form's adjacency ∪ walkers re-shuffle — measured 35.3 s →
    5.6 s (6.3×) for 4 steps at 1M nodes / 4M edges. Output identical
    to :func:`_driver_walks` / :func:`_walks_dist`."""
    import ray as _ray
    import ray.data as rd

    from kazu_ray.functions.hashing import bucket_ids
    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import (
        auto_partition_count,
        feed_to_actors,
        reaped_actors,
    )

    n_buckets = shuffle_parts()
    try:
        from ray.data.dataset import MaterializedDataset

        if isinstance(edges, MaterializedDataset):
            n_buckets = max(
                n_buckets, auto_partition_count(2 * edges.size_bytes())
            )
    except ImportError:
        pass
    actors = [_WALK_BUCKET_CLS.remote(i, n_buckets) for i in range(n_buckets)]

    def sym(t: pa.Table) -> pa.Table:
        a = t["a"].to_pandas()
        b = t["b"].to_pandas()
        return pa.table(
            {
                "node": pa.array(
                    pd.concat([a, b], ignore_index=True), type=pa.string()
                ),
                "nbr": pa.array(
                    pd.concat([b, a], ignore_index=True), type=pa.string()
                ),
            }
        )

    directed = edges.map_batches(sym, batch_format="pyarrow")

    def _assign(batch: pa.Table):
        return pa.array(bucket_ids(batch["node"], n_buckets), type=pa.int32())

    with reaped_actors(actors):
        feed_to_actors(
            directed,
            n_buckets,
            _assign,
            lambda b, sub: actors[b].add.remote(sub),
            received_fn=lambda b: actors[b].received_rows.remote(),
        )
        _ray.get([a.seal.remote() for a in actors])
        for t_step in range(1, walk_len + 1):
            accept_refs = _ray.get(
                [a.step.remote(actors, t_step) for a in actors]
            )
            _ray.get([r for refs in accept_refs for r in refs])
            _ray.get([a.fold.remote() for a in actors])
        result_refs = [a.result.remote() for a in actors]
        _ray.wait(result_refs, num_returns=len(result_refs), fetch_local=False)
    return rd.from_arrow_refs(result_refs)
