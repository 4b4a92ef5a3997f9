"""Graph-suite perf drill: run the KG pipeline ONCE over a bench-scale
corpus, materialize the triple Dataset, then time every graph operator
against it — isolating graph-op cost from the NLP pipeline (the driver
queries re-run the pipeline per query, which is correct for the gate
but useless for profiling the graph layer).

Usage: python scripts/graph_perf_drill.py [sf_dir] [pages_mult]
(defaults: /root/testdata/sf0.1, KAZU_BENCH_PAGES_MULT or 20)
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get("KAZU_BENCH_PAGES_MULT", "20")
    )
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from kazu_ray.ops import graph
    from kazu_ray.pipelines.kg import annotated_docs, broadcast_store
    from kazu_ray.sources.corpus import ensure_pages_parquet
    from kazu_ray.stages.materialize import explode_triples

    pages_dir = ensure_pages_parquet(sf, mult)
    store_ref = broadcast_store()
    t0 = time.time()
    triples = explode_triples(
        annotated_docs(sf, store_ref=store_ref, pages_dir=pages_dir)
    ).materialize()
    n = triples.count()
    print(f"pipeline+materialize: {time.time() - t0:.1f}s  ({n} triples)")

    # share ONE distinct-edge Dataset across the suite (the `edges=`
    # kwarg) — per-op _distinct_edges passes were the dominant fixed
    # cost left after the round-4 exchange work
    t0 = time.time()
    edges = graph._distinct_edges(triples)
    print(f"shared _distinct_edges: {time.time() - t0:.1f}s  ({edges.count()} edges)")

    ops = [
        ("pair_doc_counts", lambda: graph.pair_doc_counts(triples).count()),
        ("kg_components", lambda: len(graph.kg_components(triples))),
        ("component_size_histogram", lambda: len(graph.component_size_histogram(triples))),
        ("two_hop_path_counts", lambda: graph.two_hop_path_counts(triples, edges=edges).count()),
        ("triangle_count", lambda: int(graph.triangle_count(triples, edges=edges)["n_triangles"].iloc[0])),
        ("node_triangle_counts", lambda: graph.node_triangle_counts(triples, edges=edges).count()),
        ("edge_embeddedness", lambda: graph.edge_embeddedness(triples, edges=edges).count()),
        ("clustering_coefficient", lambda: int(graph.clustering_coefficient(triples, edges=edges)["coeff_ppm"].iloc[0])),
        ("pagerank", lambda: len(graph.pagerank(triples, edges=edges))),
        ("link_prediction", lambda: graph.link_prediction(triples, edges=edges).count()),
        ("bfs_distances", lambda: len(graph.bfs_distances(triples, edges=edges))),
        ("degree_histogram", lambda: graph.degree_histogram(triples).count()),
    ]
    for name, fn in ops:
        t0 = time.time()
        out = fn()
        print(f"{name:26s} {time.time() - t0:7.2f}s  result={out}")
    ray.shutdown()


if __name__ == "__main__":
    main()
