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
result tables (doc counts, component labels) are therefore legitimate
broadcast/driver material, while everything keyed by (pair, doc) stays
in two-phase distributed aggregates.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def pair_doc_counts(triples_ds):
    """Association-strength ingredients per (subj, obj) pair: distinct
    supporting docs for the pair plus each endpoint's distinct-doc
    marginal — exactly the counts PMI / log-likelihood-ratio scoring
    needs, kept as INTEGERS so downstream can apply any scorer and the
    SQL oracle matches bit-for-bit (float log scores would drift with
    reduction order; NOTES.md #26).

    Shapes: pair support = two-phase distinct ((subj, obj, doc_id)
    groupby → (subj, obj) count) — no per-key distinct sets, so hub
    pairs never concentrate state; marginals reuse the salted node
    doc-count aggregate and come back node-sized (bounded, see module
    docstring), then broadcast-join onto the pair table via ``ray.put``.
    """
    import ray
    from ray.data.aggregate import Count

    from kazu_ray.stages.materialize import node_doc_counts_salted

    marginals = node_doc_counts_salted(triples_ds).to_pandas()
    node_docs = dict(zip(marginals["node"], marginals["n_docs"]))
    node_ref = ray.put(node_docs)

    pair_support = (
        triples_ds.groupby(["subj", "obj", "doc_id"])
        .aggregate(Count(alias_name="_one"))
        .map_batches(
            lambda t: t.select(["subj", "obj"]), batch_format="pyarrow"
        )
        .groupby(["subj", "obj"])
        .aggregate(Count(alias_name="n_docs_pair"))
    )

    def attach(batch: pa.Table) -> pa.Table:
        nd = ray.get(node_ref)
        subj = batch["subj"].to_pylist()
        obj = batch["obj"].to_pylist()
        return pa.table(
            {
                "subj": batch["subj"],
                "obj": batch["obj"],
                "n_docs_pair": pa.array(
                    batch["n_docs_pair"].to_pylist(), type=pa.int64()
                ),
                "n_docs_subj": pa.array([nd[s] for s in subj], type=pa.int64()),
                "n_docs_obj": pa.array([nd[o] for o in obj], type=pa.int64()),
            }
        )

    return pair_support.map_batches(attach, batch_format="pyarrow")


def kg_components(triples_ds):
    """Connected components of the undirected co-occurrence graph:
    (node, component) where the component label is the lexicographically
    smallest node it contains.

    The node set is bounded (module docstring), so nodes get dense int
    ids assigned in SORTED order on the driver — making int min-label
    equal string min-label — and the existing size-dispatched
    ``connected_components_auto`` (driver union-find below the pair
    bound, distributed min-label propagation above it,
    ``kazu_ray/ops/dedup.py:886``) does the clustering over the distinct
    edge set. Isolated nodes (self-co-occurrence only) label themselves.
    """
    import ray
    from ray.data.aggregate import Count

    from kazu_ray.ops.dedup import connected_components_auto

    edges = (
        triples_ds.groupby(["subj", "obj"])
        .aggregate(Count(alias_name="_one"))
        .map_batches(lambda t: t.select(["subj", "obj"]), batch_format="pyarrow")
        .materialize()
    )

    # dense sorted id assignment: node table is bounded, collect once
    edge_df = edges.to_pandas()
    nodes = sorted(set(edge_df["subj"]) | set(edge_df["obj"]))
    node_id = {n: i for i, n in enumerate(nodes)}
    id_ref = ray.put(node_id)

    def to_int_pairs(batch: pa.Table) -> pa.Table:
        ids = ray.get(id_ref)
        return pa.table(
            {
                "id_a": pa.array(
                    [ids[s] for s in batch["subj"].to_pylist()], type=pa.int64()
                ),
                "id_b": pa.array(
                    [ids[o] for o in batch["obj"].to_pylist()], type=pa.int64()
                ),
            }
        )

    int_pairs = edges.map_batches(to_int_pairs, batch_format="pyarrow")
    comp = connected_components_auto(int_pairs)
    comp_by_id = dict(zip(comp["doc_id"], comp["component"]))
    out = pd.DataFrame(
        {
            "node": nodes,
            "component": [
                nodes[comp_by_id.get(node_id[n], node_id[n])] for n in nodes
            ],
        }
    )
    return out


def pair_provenance(triples_ds, sample_k: int = 5):
    """Per-pair lineage: distinct supporting-doc count plus a bounded,
    deterministic sample of supporting doc ids (the first ``sample_k``
    in ascending order, comma-joined — a STRING so the result is
    hash-exact against the SQL oracle; list-typed columns compare
    unreliably across engines).

    Shapes: one two-phase distinct bounds the shuffle to unique
    (pair, doc) rows; the per-pair sort+head runs inside
    ``groupby.map_groups`` — per-group state is the pair's distinct doc
    set, and the emitted sample is capped at ``sample_k`` regardless of
    how hot the pair is."""
    import pandas as pd
    from ray.data.aggregate import Count

    distinct = (
        triples_ds.groupby(["subj", "obj", "doc_id"])
        .aggregate(Count(alias_name="_one"))
        .map_batches(
            lambda t: t.select(["subj", "obj", "doc_id"]), batch_format="pyarrow"
        )
    )

    def summarize(g: pd.DataFrame) -> pd.DataFrame:
        docs = sorted(g["doc_id"])
        return pd.DataFrame(
            {
                "subj": [g["subj"].iloc[0]],
                "obj": [g["obj"].iloc[0]],
                "n_docs": [len(docs)],
                "sample_docs": [",".join(docs[:sample_k])],
            }
        )

    out = distinct.groupby(["subj", "obj"]).map_groups(summarize, batch_format="pandas")

    def fix_types(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("n_docs"),
            "n_docs",
            t["n_docs"].cast(pa.int64()),
        )

    return out.map_batches(fix_types, batch_format="pyarrow")


def triangle_count(triples_ds):
    """Global triangle count of the undirected co-occurrence graph —
    the classic broadcast-adjacency pattern: orient every edge low→high
    (kills duplicate counting), broadcast the oriented adjacency (node
    vocabulary is bounded, module docstring), then one streaming pass
    over the edge set intersects successor lists. Each triangle
    {a<b<c} is found exactly once, at its (a,b) edge. Returns a 1-row
    (n_triangles,) table."""
    import ray
    from ray.data.aggregate import Count, Sum

    edges = (
        triples_ds.map_batches(
            lambda t: pa.table(
                {
                    "a": pa.compute.min_element_wise(t["subj"], t["obj"]),
                    "b": pa.compute.max_element_wise(t["subj"], t["obj"]),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="_one"))
        .map_batches(lambda t: t.select(["a", "b"]), batch_format="pyarrow")
        .materialize()
    )
    adj: dict[str, set] = {}
    for row in edges.take_all():
        if row["a"] != row["b"]:
            adj.setdefault(row["a"], set()).add(row["b"])
    adj_ref = ray.put(adj)

    def partial(batch: pa.Table) -> pa.Table:
        graph = ray.get(adj_ref)
        n = 0
        for a, b in zip(batch["a"].to_pylist(), batch["b"].to_pylist()):
            if a == b:
                continue
            sa, sb = graph.get(a), graph.get(b)
            if sa and sb:
                n += len(sa & sb)
        return pa.table({"partial": pa.array([n], type=pa.int64())})

    total = edges.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("partial", alias_name="n_triangles")
    )
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
