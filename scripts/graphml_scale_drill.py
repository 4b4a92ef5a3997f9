"""Graph-ML scale drill: run the round-5 iterative graph-ML ops —
label_propagation (LPA communities), random_walks (deterministic walk
corpus), ktruss — over a deterministic synthetic graph at a
forced-distributed scale, and at a smaller overlap scale assert each
distributed result EXACTLY equal to the size-dispatched driver form
(the same-math gate the other drills use).

The synthetic graph is a circular width-3 band (every node i links to
i+1, i+2, i+3 mod n — every band edge closes at least two triangles,
so the k=4 truss is the FULL band and the peel must prove it keeps 3n
edges) plus one multiplicative-hash noise edge per node (almost never
in a triangle — the peel must drop ~all of them).

Usage: python scripts/graphml_scale_drill.py [n_nodes] [overlap_nodes]
       (defaults 1_000_000 and 20_000)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_subj_obj(n: int):
    """Deterministic (subj, obj) edge Dataset: circular band i→i+1,
    i→i+2, i→i+3 (mod n) + hash noise i→(i*2654435761+1) % n."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    width = len(str(n))

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        s = np.concatenate([ids, ids, ids, ids])
        noise = (ids * 2654435761 + 1) % n
        d = np.concatenate(
            [(ids + 1) % n, (ids + 2) % n, (ids + 3) % n, noise]
        )
        keep = s != d
        fmt = lambda a: pd.Series(a).map(lambda i: f"v{i:0{width}d}")
        return pa.table(
            {
                "subj": pa.array(fmt(s[keep]), type=pa.string()),
                "obj": pa.array(fmt(d[keep]), type=pa.string()),
            }
        )

    return rd.range(n).map_batches(gen, batch_format="pyarrow")


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    overlap = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    import pandas as pd
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from kazu_ray.ops.graph import (
        _distinct_edges,
        ktruss,
        label_propagation,
        neighborhood_function,
        random_walks,
    )

    def norm_walks(x):
        if not isinstance(x, pd.DataFrame):
            x = x.to_pandas()
        if not len(x):
            x = pd.DataFrame({"seed": [], "step": [], "node": []})
        return (
            x[["seed", "step", "node"]]
            .sort_values(["seed", "step"])
            .reset_index(drop=True)
        )

    def norm_truss(x):
        if not isinstance(x, pd.DataFrame):
            x = x.to_pandas()
        if not len(x):
            return pd.DataFrame(
                {"a": pd.array([], dtype=object),
                 "b": pd.array([], dtype=object),
                 "support": pd.array([], dtype="int64")}
            )
        return x.sort_values(["a", "b"]).reset_index(drop=True)

    # --- equality gate at the overlap scale: driver vs forced-dist ---
    small = _distinct_edges(synth_subj_obj(overlap).materialize())
    os.environ.pop("KAZU_GRAPH_MAX_DICT_EDGES", None)
    want_lpa = label_propagation(None, edges=small)
    want_walks = norm_walks(random_walks(None, walk_len=2, edges=small))
    want_truss = norm_truss(ktruss(None, k=4, edges=small))
    want_nf = neighborhood_function(None, max_hops=2, edges=small)
    os.environ["KAZU_GRAPH_MAX_DICT_EDGES"] = "0"
    got_lpa = label_propagation(None, edges=small)
    got_walks = norm_walks(random_walks(None, walk_len=2, edges=small))
    got_truss = norm_truss(ktruss(None, k=4, edges=small))
    got_nf = neighborhood_function(None, max_hops=2, edges=small)
    assert got_nf.equals(want_nf.reset_index(drop=True)), (
        "neighborhood_function paths differ"
    )
    assert got_lpa.reset_index(drop=True).equals(
        want_lpa.reset_index(drop=True)
    ), "label_propagation paths differ"
    assert got_walks.equals(want_walks), "random_walks paths differ"
    assert got_truss.equals(want_truss), "ktruss paths differ"
    assert len(want_truss) >= 3 * overlap, "band truss unexpectedly peeled"
    print(
        f"overlap {overlap} nodes: EQUAL "
        f"(lpa {len(want_lpa)} nodes, walks {len(want_walks)} rows, "
        f"truss {len(want_truss)} edges)"
    )

    # --- timed forced-distributed legs at drill scale ---
    t0 = time.time()
    edges = _distinct_edges(synth_subj_obj(n_nodes).materialize())
    n_edges = edges.count()
    print(f"{n_nodes} nodes: {n_edges} distinct undirected edges "
          f"({time.time()-t0:.1f}s)")

    t0 = time.time()
    lpa = label_propagation(None, edges=edges)
    n_comm = lpa["community"].nunique()
    print(f"label_propagation(3 rounds): {len(lpa)} nodes, "
          f"{n_comm} communities, {time.time()-t0:.1f}s")

    t0 = time.time()
    walks = random_walks(None, walk_len=4, edges=edges)
    n_rows = walks.count() if not isinstance(walks, pd.DataFrame) else len(walks)
    print(f"random_walks(len 4): {n_rows} rows, {time.time()-t0:.1f}s")

    t0 = time.time()
    truss = ktruss(None, k=4, edges=edges)
    n_truss = truss.count() if not isinstance(truss, pd.DataFrame) else len(truss)
    print(f"ktruss(k=4): {n_truss} surviving edges, {time.time()-t0:.1f}s")

    t0 = time.time()
    nf = neighborhood_function(None, max_hops=2, k=8, edges=edges)
    print(f"neighborhood_function(2 hops, k=8): "
          f"{nf['sum_est_size'].tolist()}, {time.time()-t0:.1f}s")
    ray.shutdown()


if __name__ == "__main__":
    main()
